package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Train/test decontamination: find training documents that share
  * token n-grams with a benchmark/eval set (the GPT-3/PaLM
  * "13-gram overlap" procedure). A training corpus that contains the
  * eval set inflates benchmark scores — at 100 TB this check must be
  * a first-class corpus operator, not a driver-side loop.
  *
  * Design for scale: both sides explode to DISTINCT per-document
  * n-grams; the benchmark side is tiny by nature (eval suites are
  * thousands of rows, not billions) so it broadcasts, and the corpus
  * side streams through the join at scan speed — no corpus shuffle.
  * Only matched (doc, bench) pairs reach the counting aggregation,
  * which combines map-side. N-grams join as strings so the identical
  * computation is expressible in any engine (hash them to longs only
  * if a profiled deployment shows the broadcast map dominating).
  */
object Decontaminate {

  /** Distinct token `n`-grams of a text column as `array<string>`
    * (space-joined; fewer than `n` tokens → empty array). One compiled
    * pass per row ([[graft.functions.WordNgrams]] — the declarative
    * array_distinct∘transform∘slice formulation evaluated in the
    * interpreted HOF path and dominated the operator's runtime).
    */
  def ngramSet(textCol: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftExprBridge
    GraftExprBridge.column(graft.functions.WordNgrams(
      GraftExprBridge.expression(lower(textCol)), n))
  }

  /** (corpusId, benchId, n_shared) for every corpus document sharing
    * at least one token n-gram with a benchmark row. Column names in
    * the output: corpus id column, bench id column, `n_shared`.
    */
  def overlapPairs(corpus: DataFrame, corpusId: String, corpusText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int): DataFrame = {
    require(n > 0, s"n-gram size must be positive: $n")
    val cg = corpus.select(col(corpusId),
      explode(ngramSet(col(corpusText), n)).as("_ng"))
    val bg = bench.select(col(benchId),
      explode(ngramSet(col(benchText), n)).as("_ng"))
    cg.join(broadcast(bg), "_ng")
      .groupBy(col(corpusId), col(benchId))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The corpus minus every document that shares ≥ `minShared`
    * n-grams with the benchmark set (left-anti against the flagged
    * ids — the keep-side of the decontamination pass).
    */
  def decontaminate(corpus: DataFrame, corpusId: String, corpusText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int, minShared: Long = 1L): DataFrame = {
    val flagged = overlapPairs(corpus, corpusId, corpusText,
      bench, benchId, benchText, n)
      .filter(col("n_shared") >= minShared)
      .select(col(corpusId)).distinct()
    corpus.join(flagged, Seq(corpusId), "left_anti")
  }

  /** Span-level decontamination — remove the CONTAMINATED SPANS and
    * keep the document (the modern pipeline behavior, vs
    * [[decontaminate]]'s whole-document drop): every corpus token
    * covered by a case-insensitive `n`-token gram that also occurs in
    * the benchmark set is cut, and the survivors are rejoined in
    * order. Same positional-gram + trailing-coverage-window chain as
    * [[graft.operators.Dedup.dedupSpans]], with the duplicate test
    * replaced by membership in the benchmark's (distinct, broadcast)
    * gram set. Fully deterministic — the chain replays in SQL.
    *
    * Scale: grams stream straight through a broadcast semi-join
    * (benchmark sets are small by nature); the coverage window is
    * bounded by document length; the one corpus shuffle is the
    * per-document rebuild. Lazy like dedupSpans — the persisted token
    * base releases via `GraftSession.releaseCachedBlocks` (README
    * cache-lifecycle note).
    */
  def scrubSpans(corpus: DataFrame, corpusId: String, corpusText: String,
      bench: DataFrame, benchText: String, n: Int = 8): DataFrame = {
    require(n > 1, s"n-gram size must be > 1: $n")
    require(n <= 1024, s"n-gram size unreasonably large: $n")
    val base = corpus
      .select(col(corpusId).as("id"),
        TextFunctions.tokens(col(corpusText)).as("tk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toks = base.select(col("id"), posexplode(col("tk")))
      .withColumnRenamed("col", "tok")
    def gramsOf(tk: Column): Column =
      when(size(tk) >= n,
        transform(sequence(lit(0), size(tk) - n),
          i => md5(lower(array_join(slice(tk, i + lit(1), lit(n)), " ")))))
        .otherwise(array().cast("array<string>"))
    val grams = base.select(col("id"), posexplode(gramsOf(col("tk"))))
      .withColumnRenamed("col", "g")
    val benchGrams = bench.select(explode(gramsOf(
        TextFunctions.tokens(col(benchText)))).as("g"))
      .distinct()
    val hits = grams.join(broadcast(benchGrams), "g")
      .select(col("id"), col("pos"), lit(1).as("_hit"))
    val w = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(-(n - 1), Window.currentRow)
    val kept = toks.join(hits, Seq("id", "pos"), "left")
      .withColumn("_cov", max(coalesce(col("_hit"), lit(0))).over(w))
      .filter(col("_cov") === 0)
    val rebuilt = kept.groupBy("id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("text_scrubbed"))
    base.select(col("id")).join(rebuilt, Seq("id"), "left")
      .select(col("id").as(corpusId),
        coalesce(col("text_scrubbed"), lit("")).as("text_scrubbed"))
  }

  /** [[decontaminate]] with a Bloom-filter prefilter on the corpus
    * side — the same result, bit-for-bit, at a fraction of the join
    * traffic. The benchmark's distinct grams aggregate into an m-bit
    * Bloom bitmap (Catalyst's own `BloomFilterAggregate`, the
    * machinery behind Spark's runtime join filters); the corpus gram
    * stream probes it with the codegen'd `BloomFilterMightContain`
    * predicate, and only bloom-positive grams — the contaminated ones
    * plus an `fpp` sliver of false positives — reach the exact
    * broadcast join that assigns (doc, bench) pair counts. False
    * positives die in that join; Bloom filters have no false
    * negatives; so the output EQUALS [[decontaminate]]'s exactly and
    * shares its oracle.
    *
    * Why this matters at 100 TB: the exact path's broadcast map holds
    * every benchmark gram as a string (~50 B each — 10 M grams is a
    * 500 MB broadcast), while the bitmap holds ~10 BITS per gram at
    * fpp 1% (~12 MB for those same 10 M) — a ~400× smaller executor
    * footprint, so far larger decontamination sets stay broadcastable,
    * and the full string map is only materialized against the
    * prefiltered trickle instead of every corpus gram.
    */
  def bloomDecontaminate(corpus: DataFrame, corpusId: String,
      corpusText: String, bench: DataFrame, benchId: String,
      benchText: String, n: Int, minShared: Long = 1L,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftExprBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    require(n > 0, s"n-gram size must be positive: $n")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")
    val bg = bench.select(col(benchId),
      explode(ngramSet(col(benchText), n)).as("_ng"))
    val distinctGrams = bg.select("_ng").distinct()
    // The count is one job over the SMALL side (eval suites, not the
    // corpus) and sizes the bitmap; 64 bits floors the degenerate case.
    val est = distinctGrams.count()
    if (est == 0L) return corpus
    val numBits = math.max(64L,
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(est, fpp))
    val bloom = distinctGrams
      .select(GraftExprBridge.column(new BloomFilterAggregate(
          GraftExprBridge.expression(xxhash64(col("_ng"))),
          Literal(est), Literal(numBits)).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    val mightContain = GraftExprBridge.column(new BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftExprBridge.expression(xxhash64(col("_ng")))))
    val flagged = corpus
      .select(col(corpusId), explode(ngramSet(col(corpusText), n)).as("_ng"))
      .filter(mightContain)
      .join(broadcast(bg), "_ng")
      .groupBy(col(corpusId), col(benchId))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col(corpusId)).distinct()
    corpus.join(flagged, Seq(corpusId), "left_anti")
  }

  /** Cross-source n-gram overlap matrix — the corpus-AUDIT view of
    * contamination: for every pair of sources, the number of DISTINCT
    * token n-grams both contain. A mirror/scrape pair lights up before
    * any dedup runs; a benchmark leak shows as one source overlapping
    * everything. Output: (src_a, src_b, shared_ngrams), src_a < src_b.
    *
    * Scale: the gram stream reduces to DISTINCT (source, gram) rows
    * first (one shuffle, persisted so both self-join sides share the
    * evaluation); the join key is the gram, and per-gram fan-out is
    * bounded by the SOURCE-catalog size squared — sources are a small
    * set by nature, so candidates are O(distinct grams · |sources|²)
    * worst-case, not corpus². The matrix itself is |sources|² rows.
    */
  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"n-gram size must be positive: $n")
    val grams = df.select(col(srcCol).as("src"),
        explode(ngramSet(col(textCol), n)).as("_ng"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try grams.as("a").join(grams.as("b"),
        col("a._ng") === col("b._ng") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .localCheckpoint(true)
    finally grams.unpersist(false)
  }
}
