package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Byte-pair-encoding tokenizer TRAINING and ENCODING as corpus
  * operators (Sennrich et al. 2016 — the subword scheme behind
  * GPT-2/RoBERTa-era vocabularies). A training-data engine that
  * counts tokens needs the tokenizer itself to be derivable from the
  * corpus it curates.
  *
  * Scale design — the corpus is touched ONCE per call, and the merge
  * loop never touches Spark at all:
  *
  *  - [[learn]] first reduces the corpus to its word VOCABULARY
  *    (one map-side-combinable groupBy, capped at the weighted
  *    top-`maxVocab` — the same reduction sentencepiece/HF trainers
  *    perform), collects that bounded relation ONCE, and runs the
  *    classic position-indexed merge loop driver-side: sequences are
  *    doubly-linked node chains, pair occurrences post their left
  *    node, a TreeSet keyed (cnt DESC, lhs, rhs) serves winners —
  *    each round costs O(occurrences · log P), not a vocab rescan.
  *    30k merges are seconds of driver CPU and ZERO Spark jobs — the
  *    previous design paid one scheduler round-trip plus one
  *    checkpointed vocab copy PER merge round, which is exactly the
  *    shape that cannot reach a real 30k-merge vocabulary.
  *  - [[encode]] / [[encodeIds]] broadcast the (bounded) encoded
  *    vocab back to the corpus token stream — per-document piece
  *    counts / id sequences cost one scan + one broadcast join,
  *    with no per-round corpus work regardless of merge depth.
  *
  * Semantics are unchanged from the declarative form (and
  * [[applyMerge]] remains as the oracle-replayable Spark twin of one
  * application round): pair counting counts overlapping adjacent
  * occurrences weighted by word frequency; the winner tie-break is
  * `cnt DESC, lhs, rhs` under BINARY (UTF-8 byte) string order —
  * matching both Spark's UTF8String comparison and DuckDB's default
  * collation — and merge application is greedy left-to-right
  * non-overlap (`[a,a,a]` under merge `a a` yields `[aa, a]`).
  * Every step is deterministic, so the learned table replays in SQL:
  * unrolled gaps-and-islands CTEs at shallow depth, or the
  * lowest-rank-first recursive form against the merge table at any
  * depth (the two application orders provably agree for a table
  * learned from the same corpus: a merge's constituents always carry
  * lower ranks than the merges that consume them).
  */
object Bpe {

  /** Character symbols of a word — regexp form shared verbatim with
    * the SQL oracle (`regexp_extract_all(word, '.')`).
    */
  private def chars(c: org.apache.spark.sql.Column) =
    regexp_extract_all(c, lit("."), lit(0))

  /** (word, weight, syms) — the frequency-weighted word vocabulary
    * with initial character symbols. Lowercased whitespace tokens,
    * matching [[TextFunctions.tokens]] everywhere else.
    */
  def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("weight"))
      .withColumn("syms", chars(col("word")))

  /** One learned merge: rank (1-based), the pair, its concatenation,
    * and the weighted pair count at selection time. */
  final case class Merge(rank: Long, lhs: String, rhs: String,
      merged: String, weight: Long)

  /** The driver-side training artifact: the ordered merge table plus
    * the post-merge vocabulary (word → weight, final symbol pieces) —
    * both bounded by distinct-word count, never corpus size. */
  final case class Learned(merges: Vector[Merge],
      words: Vector[(String, Long, Vector[String])]) {
    /** Piece vocabulary with deterministic ids: rank by total
      * weighted frequency DESC, then piece ASC (binary order) —
      * frequency-ordered ids, the convention real tokenizers use. */
    lazy val pieces: Vector[(String, Long, Long)] = {
      val freq = mutable.HashMap.empty[String, Long]
      words.foreach { case (_, w, syms) =>
        syms.foreach(p => freq(p) = freq.getOrElse(p, 0L) + w) }
      freq.toVector
        .sortWith { case ((p1, f1), (p2, f2)) =>
          if (f1 != f2) f1 > f2 else utf8Compare(p1, p2) < 0 }
        .zipWithIndex.map { case ((p, f), i) => (p, f, i.toLong + 1) }
    }
  }

  /** Binary (UTF-8 byte, unsigned) string comparison — the order
    * Spark's UTF8String and DuckDB's default collation share. Java's
    * String.compareTo differs for supplementary code points, so the
    * driver-side loop must not use it.
    */
  private[operators] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Unicode code points of a word as strings — the in-memory twin of
    * the `regexp_extract_all(word, '.')` initial segmentation. */
  private def codePoints(w: String): mutable.ArrayBuffer[String] = {
    val out = new mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out
  }

  /** Train `rounds` merges from the corpus' word vocabulary. ONE
    * corpus aggregate + ONE bounded collect; all merge rounds run
    * driver-side with incremental pair bookkeeping. Stops early if
    * the vocabulary runs out of adjacent pairs.
    */
  def learnMerges(df: DataFrame, textCol: String, rounds: Int,
      maxVocab: Int = 1 << 20): Learned = {
    require(maxVocab > 0, s"maxVocab must be positive: $maxVocab")
    // the collect is BOUNDED twice over: by distinct-word count and,
    // for corpora whose type count outruns memory (100 TB web text is
    // ~10⁸ types), by the deterministic weighted top-maxVocab
    // (TakeOrderedAndProject — per-partition heaps, no global sort;
    // weight DESC, word ASC, the same total order as every cap here).
    // Training on the dominant types is what sentencepiece/HF trainers
    // do with their own vocab caps; [[encode]]/[[encodeIds]] still
    // cover EVERY word — unseen words encode through the merge table
    // ([[applyRanked]]), not the trained vocab.
    val rows = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("weight"))
      .orderBy(col("weight").desc, col("word"))
      .limit(maxVocab)
      .collect()
    runMerges(
      rows.map(r => (r.getString(0), r.getLong(1), codePoints(r.getString(0)))),
      rounds, glue = "")
  }

  /** PHRASE-level BPE: initial symbols are word TOKENS and the
    * pre-tokenization unit is the whole document, so merges discover
    * multi-word expressions ("order by", "group by order", …) —
    * collocation mining with the exact BPE objective. Same driver-side
    * loop over a bounded relation: the DISTINCT token sequences (one
    * corpus aggregate; identical documents weight the same sequence).
    * The sequence key is the space-joined token list — injective,
    * since tokens are whitespace-free by construction. Merged symbols
    * join their halves with a space, so every learned phrase is the
    * literal token subsequence it covers.
    */
  def learnPhraseMerges(df: DataFrame, textCol: String, rounds: Int,
      maxSequences: Int = 1 << 16): Learned = {
    require(maxSequences > 0, s"maxSequences must be positive: $maxSequences")
    // unlike the char-level word vocab, DISTINCT SEQUENCES ≈ distinct
    // documents — unbounded at 100 TB — so the training relation is
    // ALWAYS capped: the deterministic weighted top-maxSequences
    // (weight DESC, key ASC via TakeOrderedAndProject) carries the
    // dominant phrase statistics, the standard sampled-training
    // practice for collocation/phrase tables. [[encodePhrases]]
    // still encodes EVERY document exactly, via the merge table.
    val rows = df
      .select(TextFunctions.tokens(lower(col(textCol))).as("toks"))
      .filter(size(col("toks")) > 0)
      .groupBy(array_join(col("toks"), " ").as("seq_key"))
      .agg(count(lit(1)).as("weight"))
      .orderBy(col("weight").desc, col("seq_key"))
      .limit(maxSequences)
      .collect()
    runMerges(
      rows.map { r =>
        val key = r.getString(0)
        (key, r.getLong(1),
          mutable.ArrayBuffer.from(key.split(' ').toSeq))
      },
      rounds, glue = " ")
  }

  /** The shared in-memory merge loop over arbitrary symbol sequences.
    * `glue` joins the halves of a merged symbol ("" for char-level,
    * " " for phrase-level). Incremental pair bookkeeping: a TreeSet
    * ordered exactly like the winner query (cnt DESC, lhs, rhs binary
    * ASC) so each round's winner is a first() and each delta an
    * O(log P) remove/insert — rounds cost O(affected sequences), not
    * a rescan.
    */
  private def runMerges(seqs: Array[(String, Long, mutable.ArrayBuffer[String])],
      rounds: Int, glue: String): Learned = {
    require(rounds > 0, s"rounds must be positive: $rounds")
    val words = seqs.map { case (k, w, _) => (k, w) }

    // The classic position-indexed BPE trainer (the sentencepiece/HF
    // shape): symbols intern to Int ids, every sequence is a doubly
    // linked chain of nodes, and each pair occurrence is posted as its
    // LEFT node. A merge round then touches only its occurrences and
    // their immediate neighbors — O(occurrences · log P) — instead of
    // rescanning affected sequences (O(affected · len) took ~5 s for
    // 1024 merges over a 270k-symbol relation; this runs it in well
    // under a second). Postings use lazy invalidation: an entry is
    // valid iff its left node still carries lhs and its live right
    // neighbor carries rhs — node values only ever grow (a node dies
    // only as the right half of a merge), which also makes duplicate
    // valid entries impossible.
    val symId = mutable.HashMap.empty[String, Int]
    val symTab = mutable.ArrayBuffer.empty[String]
    val symBytes = mutable.ArrayBuffer.empty[Array[Byte]]
    def intern(sym: String): Int = symId.getOrElseUpdate(sym, {
      symTab += sym
      symBytes += sym.getBytes(StandardCharsets.UTF_8)
      symTab.length - 1
    })
    @inline def pk(a: Int, b: Int): Long = (a.toLong << 32) | (b.toLong & 0xffffffffL)

    // node arena: value (-1 = dead), prev/next (-1 = none), owning word
    val totalSymsL = seqs.iterator.map(_._3.length.toLong).sum
    require(totalSymsL < Int.MaxValue,
      s"training relation holds $totalSymsL symbols — beyond the arena " +
        "bound; lower maxVocab/maxSequences (the caps exist for this)")
    val totalSyms = totalSymsL.toInt
    val value = new Array[Int](totalSyms)
    val prevN = new Array[Int](totalSyms)
    val nextN = new Array[Int](totalSyms)
    val nodeWord = new Array[Int](totalSyms)
    val heads = new Array[Int](seqs.length)

    val counts = mutable.LongMap.empty[Long]
    val postings = mutable.LongMap.empty[mutable.ArrayBuffer[Int]]
    def cmpBytes(x: Array[Byte], y: Array[Byte]): Int = {
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
    // winner order: cnt DESC, lhs UTF-8 ASC, rhs UTF-8 ASC
    implicit val winnerOrder: Ordering[(Long, Long)] =
      new Ordering[(Long, Long)] {
        def compare(a: (Long, Long), b: (Long, Long)): Int = {
          if (a._1 != b._1) java.lang.Long.compare(b._1, a._1)
          else {
            val c = cmpBytes(symBytes((a._2 >>> 32).toInt),
              symBytes((b._2 >>> 32).toInt))
            if (c != 0) c
            else cmpBytes(symBytes(a._2.toInt), symBytes(b._2.toInt))
          }
        }
      }
    val order = mutable.TreeSet.empty[(Long, Long)]
    def addCount(p: Long, delta: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old != 0L) order.remove((old, p))
      val nw = old + delta
      if (nw != 0L) { counts(p) = nw; order.add((nw, p)) }
      else counts.remove(p)
    }
    def post(p: Long, leftNode: Int): Unit =
      postings.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += leftNode

    // build chains; accumulate counts hash-only, bulk-load the TreeSet
    var nid = 0
    seqs.indices.foreach { wi =>
      val s = seqs(wi)._3
      heads(wi) = nid
      var i = 0
      while (i < s.length) {
        value(nid) = intern(s(i))
        nodeWord(nid) = wi
        prevN(nid) = if (i == 0) -1 else nid - 1
        nextN(nid) = if (i == s.length - 1) -1 else nid + 1
        if (i + 1 < s.length) {
          val p = pk(intern(s(i)), intern(s(i + 1)))
          counts(p) = counts.getOrElse(p, 0L) + words(wi)._2
          post(p, nid)
        }
        nid += 1; i += 1
      }
    }
    counts.foreach { case (p, c) => order.add((c, p)) }

    val merges = Vector.newBuilder[Merge]
    var r = 1
    while (r <= rounds && order.nonEmpty) {
      val (cnt, pair) = order.head
      val lhsId = (pair >>> 32).toInt
      val rhsId = pair.toInt
      val lhs = symTab(lhsId)
      val rhs = symTab(rhsId)
      val merged = lhs + glue + rhs
      val mergedId = intern(merged)
      merges += Merge(r.toLong, lhs, rhs, merged, cnt)
      postings.remove(pair).foreach(_.foreach { l =>
        val rgt = nextN(l)
        // lazy validation: the site must still read (lhs, rhs)
        if (value(l) == lhsId && rgt >= 0 && value(rgt) == rhsId) {
          val w = words(nodeWord(l))._2
          val p = prevN(l)
          val n2 = nextN(rgt)
          addCount(pair, -w)
          if (p >= 0) {
            addCount(pk(value(p), lhsId), -w)
            addCount(pk(value(p), mergedId), w)
            post(pk(value(p), mergedId), p)
          }
          if (n2 >= 0) {
            addCount(pk(rhsId, value(n2)), -w)
            addCount(pk(mergedId, value(n2)), w)
            post(pk(mergedId, value(n2)), l)
          }
          value(l) = mergedId
          nextN(l) = n2
          if (n2 >= 0) prevN(n2) = l
          value(rgt) = -1
        }
      })
      r += 1
    }
    Learned(merges.result(),
      words.toVector.zipWithIndex.map { case ((w, wt), wi) =>
        val b = Vector.newBuilder[String]
        var n = heads(wi)
        while (n >= 0) { b += symTab(value(n)); n = nextN(n) }
        (w, wt, b.result())
      })
  }

  /** Pure in-memory char-level trainer over an explicit weighted word
    * list — the Spark-free entry the ScalaCheck equivalence property
    * sweeps (rank-order training state ≡ [[applyRanked]] encoding for
    * every trained word, on random corpora). */
  private[graft] def trainChars(words: Seq[(String, Long)],
      rounds: Int): Learned =
    runMerges(words.map { case (w, c) => (w, c, codePoints(w)) }.toArray,
      rounds, glue = "")

  /** Lowest-rank-first application of a learned merge table to one
    * symbol sequence — the HF-tokenizers encode algorithm, provably
    * equal to replaying merges in rank order for a table learned from
    * the same corpus (each merge's constituents carry lower ranks
    * than the merges consuming them; q_bpe_deep's oracle certifies
    * the equivalence empirically at 1024 merges). This is how inputs
    * OUTSIDE the capped training relation encode exactly: per row,
    * O(len · merges-applied) against a broadcast rank map — no
    * per-round corpus work, no driver involvement.
    */
  def applyRanked(syms: IndexedSeq[String],
      rank: scala.collection.Map[(String, String), Long],
      glue: String): IndexedSeq[String] = {
    val buf = mutable.ArrayBuffer.from(syms)
    var done = buf.length < 2
    while (!done) {
      var bestRank = Long.MaxValue
      var bestI = -1
      var i = 0
      while (i + 1 < buf.length) {
        val r = rank.getOrElse((buf(i), buf(i + 1)), Long.MaxValue)
        if (r < bestRank) { bestRank = r; bestI = i }
        i += 1
      }
      if (bestI < 0) done = true
      else {
        buf(bestI) = buf(bestI) + glue + buf(bestI + 1)
        buf.remove(bestI + 1)
        done = buf.length < 2
      }
    }
    buf.toIndexedSeq
  }

  /** The merge table as the broadcastable rank map [[applyRanked]]
    * consumes (pair-keyed — symbols may contain any character,
    * including the phrase-level glue space). */
  def rankMap(learned: Learned): Map[(String, String), Long] =
    learned.merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap

  /** Persist a trained tokenizer: the merge table under
    * `path/merges`, the encoded vocabulary under `path/vocab` — the
    * fit-once/serve-many split (train on the curation cluster once,
    * encode anywhere), the same shape as the persisted IVF-PQ index.
    * Both relations are training-relation-bounded parquet.
    */
  def saveLearned(spark: SparkSession, learned: Learned,
      path: String): Unit = {
    mergeTable(spark, learned)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        learned.words.map { case (w, wt, s) => Row(w, wt, s) },
        math.max(1, math.min(8, learned.words.size / 4096 + 1))),
      StructType(Seq(
        StructField("word", StringType, nullable = false),
        StructField("weight", LongType, nullable = false),
        StructField("syms", ArrayType(StringType, containsNull = false),
          nullable = false))))
      .write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** Load a [[saveLearned]] artifact. Round-trips exactly: merges in
    * rank order, vocabulary with its final symbol pieces, so
    * [[rankMap]] / [[encodedVocab]] / [[pieceVocab]] behave as if
    * freshly trained.
    */
  def loadLearned(spark: SparkSession, path: String): Learned = {
    val merges = spark.read.parquet(s"$path/merges")
      .orderBy("merge_rank").collect()
      .map(r => Merge(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toVector
    val words = spark.read.parquet(s"$path/vocab")
      .orderBy("word").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getSeq[String](2).toVector)).toVector
    Learned(merges, words)
  }

  private val mergeSchema = StructType(Seq(
    StructField("merge_rank", LongType, nullable = false),
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("weight", LongType, nullable = false)))

  /** The learned merge table as a DataFrame:
    * (merge_rank, lhs, rhs, merged, weight). */
  def mergeTable(spark: SparkSession, learned: Learned): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        learned.merges.map(m => Row(m.rank, m.lhs, m.rhs, m.merged, m.weight)), 1),
      mergeSchema)

  /** The first `rounds` BPE merges learned from the corpus:
    * (merge_rank, lhs, rhs, merged, weight). One corpus aggregate;
    * the loop itself runs driver-side over the bounded vocab.
    */
  def learn(df: DataFrame, textCol: String, rounds: Int): DataFrame =
    mergeTable(df.sparkSession, learnMerges(df, textCol, rounds))

  /** One merge round as a declarative Spark transform — the
    * gaps-and-islands greedy-non-overlap form. Kept as the
    * SQL-replayable twin of the in-memory loop (specs pin the two
    * against each other); `learn` itself no longer runs per-round
    * Spark jobs.
    */
  def applyMerge(v: DataFrame, lhs: String, rhs: String): DataFrame = {
    val byPos = Window.partitionBy("word").orderBy("pos")
    val ex = v.select(col("word"), col("weight"), posexplode(col("syms")))
      .withColumnRenamed("col", "sym")
      .withColumn("nxt", lead("sym", 1).over(byPos))
      .withColumn("raw",
        (col("sym") === lit(lhs) && col("nxt") === lit(rhs)).cast("int"))
      // consecutive raw matches (only possible when rhs == lhs) form an
      // island: pos - cumulative-match-count is constant inside it
      .withColumn("cum", sum("raw").over(byPos))
      .withColumn("island", when(col("raw") === 1, col("pos") - col("cum")))
    val islandStart = Window.partitionBy("word", "island")
    val marked = ex
      .withColumn("keep", col("raw") === 1 &&
        (col("pos") - min("pos").over(islandStart)) % 2 === 0)
      .withColumn("dropRight",
        coalesce(lag("keep", 1).over(byPos), lit(false)))
    marked.filter(!col("dropRight"))
      .withColumn("outSym",
        when(col("keep"), concat(col("sym"), col("nxt")))
          .otherwise(col("sym")))
      .groupBy("word", "weight")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("outSym")))),
        x => x.getField("outSym")).as("syms"))
  }

  /** The encoded vocabulary as a DataFrame (word, pieces:array) —
    * bounded, broadcast-joinable. */
  def encodedVocab(spark: SparkSession, learned: Learned): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        learned.words.map { case (w, _, s) => Row(w, s) },
        math.max(1, math.min(8, learned.words.size / 4096 + 1))),
      StructType(Seq(
        StructField("word", StringType, nullable = false),
        StructField("pieces", ArrayType(StringType, containsNull = false),
          nullable = false))))

  /** Per-document token and BPE-piece counts under the first `rounds`
    * learned merges: (id, n_tokens, n_pieces). The merges and the
    * encoded vocab are computed once (vocab-scale); the corpus pays
    * one scan, one broadcast join, one aggregate — at ANY merge depth.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      rounds: Int, maxVocab: Int = 1 << 20): DataFrame = {
    val learned = learnMerges(df, textCol, rounds, maxVocab)
    val spark = df.sparkSession
    val pieces = encodedVocab(spark, learned)
      .select(col("word"), size(col("pieces")).cast(LongType).as("_vp"))
    // unseen words (outside the capped training vocab) encode through
    // the broadcast merge table, row-locally — the trained-vocab join
    // stays the fast path and covers everything when the cap is moot.
    // The fallback memoizes per task: tail TYPES are many but tail
    // OCCURRENCES repeat, and O(len²) re-encodes per occurrence is
    // exactly the multiplier the cap was meant to avoid.
    val rk = spark.sparkContext.broadcast(rankMap(learned))
    val fallbackN = udf(new (String => Long) with Serializable {
      @transient private lazy val cache =
        new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
      def apply(w: String): Long = cache.computeIfAbsent(w,
        ww => applyRanked(codePoints(ww).toIndexedSeq, rk.value, "")
          .length.toLong)
    })
    df.select(col(idCol),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .join(broadcast(pieces), Seq("word"), "left")
      .withColumn("_np",
        when(col("_vp").isNotNull, col("_vp")).otherwise(fallbackN(col("word"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum("_np").as("n_pieces"))
  }

  /** The piece vocabulary as a DataFrame: (piece, freq, piece_id),
    * ids ranked (freq DESC, piece ASC) — bounded by learned-vocab
    * piece count. */
  def pieceVocab(spark: SparkSession, learned: Learned): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        learned.pieces.map { case (p, f, id) => Row(p, f, id) }, 1),
      StructType(Seq(
        StructField("piece", StringType, nullable = false),
        StructField("freq", LongType, nullable = false),
        StructField("piece_id", LongType, nullable = false))))

  /** Per-document token and PHRASE-piece counts under `rounds`
    * phrase-level merges (see [[learnPhraseMerges]]): (id, n_tokens,
    * n_pieces). Because the distinct token sequences ARE the training
    * relation, encoding is a broadcast join from the space-joined
    * sequence key to its post-merge length — one corpus scan at ANY
    * merge depth. This is the operator that demonstrates deep
    * (1000s-of-merges) training on the fixture corpus: its 31-word
    * char-level vocabulary provably exhausts at Σ(len−1) ≈ 107
    * merges, while the phrase universe supports ~Σ(doc_len−1) ≈ 26k.
    */
  def encodePhrases(df: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame = {
    val learned = learnPhraseMerges(df, textCol, rounds)
    val spark = df.sparkSession
    val lengths = spark.createDataFrame(
      spark.sparkContext.parallelize(
        learned.words.map { case (k, _, s) => Row(k, s.length.toLong) }, 1),
      StructType(Seq(
        StructField("seq_key", StringType, nullable = false),
        StructField("n_pieces", LongType, nullable = false))))
    // sequences outside the capped training relation encode through
    // the broadcast merge table (lowest-rank-first, the equivalence
    // q_bpe_deep's oracle certifies), so EVERY document is covered
    val rk = spark.sparkContext.broadcast(rankMap(learned))
    val fallbackN = udf((toks: scala.collection.Seq[String]) =>
      applyRanked(toks.toIndexedSeq, rk.value, " ").length.toLong)
    // (no memo here: distinct sequences rarely repeat — the key IS
    // the document)
    df.select(col(idCol),
        TextFunctions.tokens(lower(col(textCol))).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        size(col("toks")).cast(LongType).as("n_tokens"),
        array_join(col("toks"), " ").as("seq_key"))
      .join(broadcast(lengths), Seq("seq_key"), "left")
      .select(col(idCol), col("n_tokens"),
        when(col("n_pieces").isNotNull, col("n_pieces"))
          .otherwise(fallbackN(col("toks"))).as("n_pieces"))
  }

  /** Documents encoded to BPE piece-id SEQUENCES — the actual
    * curation→training handoff artifact: (id, pos, piece, piece_id)
    * with `pos` the 1-based position in the document's piece stream.
    * Corpus cost: one scan, two broadcast joins (word→pieces,
    * piece→id), one per-document window (bounded by document length).
    * Composes directly with [[Pack.packSequences]] /
    * `TextAnalysis.chunkTokens` for packed context windows.
    */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
      rounds: Int, maxVocab: Int = 1 << 20): DataFrame =
    encodeIdsWith(df, idCol, textCol, learnMerges(df, textCol, rounds, maxVocab))

  /** [[encodeIds]] under a FROZEN tokenizer — the fit-once half of
    * the handoff: `learned` comes from [[learnMerges]] on the
    * curation cluster (or [[loadLearned]] from its persisted
    * artifact), and encoding is the same one-scan + two-broadcast-
    * join projection at any merge depth, so any batch split of a
    * corpus encodes to exactly the union of its parts (the at-ingest
    * face [[graft.streaming.StreamBpe]] is built on this). */
  def encodeIdsWith(df: DataFrame, idCol: String, textCol: String,
      learned: Learned): DataFrame = {
    val spark = df.sparkSession
    val vocabDf = encodedVocab(spark, learned)
    val ids = pieceVocab(spark, learned).select("piece", "piece_id")
    // out-of-vocab words segment through the broadcast merge table;
    // their pieces may be outside the trained piece vocabulary and
    // carry id 0 (the OOV convention TextAnalysis.encodeIds uses)
    val rk = spark.sparkContext.broadcast(rankMap(learned))
    val fallbackPieces = udf(new (String => Seq[String]) with Serializable {
      @transient private lazy val cache =
        new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
      def apply(w: String): Seq[String] = cache.computeIfAbsent(w,
        ww => applyRanked(codePoints(ww).toIndexedSeq, rk.value, ""))
    })
    val byDoc = Window.partitionBy(idCol).orderBy(col("widx"), col("pidx"))
    df.select(col(idCol),
        posexplode(TextFunctions.tokens(lower(col(textCol)))))
      .withColumnRenamed("pos", "widx").withColumnRenamed("col", "word")
      .join(broadcast(vocabDf), Seq("word"), "left")
      .withColumn("_pieces",
        when(col("pieces").isNotNull, col("pieces"))
          .otherwise(fallbackPieces(col("word"))))
      .select(col(idCol), col("widx"), posexplode(col("_pieces")))
      .withColumnRenamed("pos", "pidx").withColumnRenamed("col", "piece")
      .withColumn("pos", row_number().over(byDoc).cast(LongType))
      .join(broadcast(ids), Seq("piece"), "left")
      .select(col(idCol), col("pos"), col("piece"),
        coalesce(col("piece_id"), lit(0L)).as("piece_id"))
  }
}
