package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Document deduplication operators for large-scale corpus pipelines
  * (builder brief): exact, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design notes (the 100 TB contract):
  *  - exact dedup is one hash-shuffle on the fingerprint — the minimum
  *    possible; no sort, no window over the full data (we aggregate
  *    min(id) instead of row_number to keep it partial-aggregatable).
  *  - near-dup NEVER does the O(n²) self-join: MinHash banding shuffles
  *    on (band, signature-slice) so only probable-duplicate pairs meet,
  *    and candidate verification runs on that reduced set.
  *  - all hashing is xxhash64 / md5 (deterministic, seedable via
  *    literal mixing) — plans replay identically, no RNG state.
  */
object Dedup {

  /** Exact dedup: one representative row (min of `idCol`) per content
    * fingerprint. Returns (fingerprint, kept id, duplicate count).
    * Partial-aggregatable: map-side combine collapses duplicates before
    * the shuffle.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(TextFunctions.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_cnt"))

  /** Rows that survive exact dedup (keep-first-by-id semantics),
    * expressed as a window only over groups that actually collide.
    */
  def exactKeepFirst(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(TextFunctions.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** MinHash signature: array of `numHashes` minima of per-seed hashes
    * over the document's shingle set. Computed entirely inside one
    * projection (transform over seeds × aggregate over shingles) — no
    * explode, no shuffle; cost is O(shingles × hashes) per row.
    */
  def minhashSignature(textCol: Column, shingleSize: Int,
      numHashes: Int): Column = {
    val sh = array_distinct(TextFunctions.shingles(textCol, shingleSize))
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      seed =>
        aggregate(sh, lit(Long.MaxValue),
          (acc, s) => least(acc, xxhash64(seed, s))))
  }

  /** MinHash+LSH candidate pairs: band the signature (`bands` bands of
    * `numHashes/bands` rows), shuffle once on (band, banded slice),
    * emit intra-bucket pairs, then verify with true shingle-Jaccard and
    * keep pairs ≥ `threshold`.
    *
    * Output: (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withSig = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", minhashSignature(col("text"), shingleSize, numHashes))
    val banded = withSig.select(
      col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          slice(col("sig"), b * rows + 1, lit(rows)).as("slice")))).as("bb"))
      .select(col("id"), col("bb.band"), hash(col("bb.slice")).as("bucket"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val texts = df.select(col(idCol).as("id"), col(textCol).as("text"))
    val verified = cand
      .join(texts.withColumnRenamed("id", "id_a")
        .withColumnRenamed("text", "text_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b")
        .withColumnRenamed("text", "text_b"), "id_b")
      .withColumn("j", jaccardShingles(col("text_a"), col("text_b"), shingleSize))
      .filter(col("j") >= threshold)
    verified.select(col("id_a"), col("id_b"), round(col("j"), 6).as("jaccard"))
  }

  /** True Jaccard over distinct word shingles of two texts, computed
    * column-side (array_intersect / array_union).
    */
  def jaccardShingles(a: Column, b: Column, n: Int): Column = {
    val sa = array_distinct(TextFunctions.shingles(a, n))
    val sb = array_distinct(TextFunctions.shingles(b, n))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = size(array_union(sa, sb)).cast("double")
    when(uni === 0.0, lit(0.0)).otherwise(inter / uni)
  }

  /** All-pairs n-gram token Jaccard via token-inverted-index join —
    * the exact (non-approximate) near-dup reference path. Quadratic in
    * the worst case, so callers bound the input (the LSH variant is the
    * scale path). Output: (id_a, id_b, jaccard) for pairs ≥ threshold.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        explode(TextFunctions.tokenSet(col(textCol))).as("tok"))
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = toks.as("a").join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .withColumn("j",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("j") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("j"), 6).as("jaccard"))
  }

  /** 64-bit SimHash over the token multiset: for each bit position,
    * sum +1/-1 weighted by token-hash bit, then collapse the sign
    * vector to a Long. One explode + one groupBy (single shuffle).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$j")
    }
    val agg = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    agg.select(col(idCol), sig.cast(LongType).as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming` bits, blocked by
    * 16-bit signature chunks (a pair within k bits must share at least
    * one of k+1 chunks — pigeonhole), so no full cross join.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = simhash(df, idCol, textCol)
    val chunks = sigs.select(col(idCol).as("id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL).as("v"))): _*))
        .as("ck"))
    val cand = chunks.as("a").join(chunks.as("b"),
        col("a.ck.chunk") === col("b.ck.chunk") &&
        col("a.ck.v") === col("b.ck.v") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sa"), col("b.simhash").as("sb"))
      .distinct()
    cand.withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
