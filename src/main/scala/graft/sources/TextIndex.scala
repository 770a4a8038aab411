package graft.sources

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted token index — the storage-layout answer to
  * "grep 100 TB": the reference answers every query with a scan
  * (BigQuery table scan per CLI call, `cli/cloudpelican-lsd.go`), which
  * is also our default grep path; for a corpus queried repeatedly, one
  * indexing pass amortizes into index-pruned lookups.
  *
  * Layout: (tok, id) rows partitioned by `bucket = pmod(hash(tok), B)`.
  * The bucket is a PARTITION column, and a lookup filters on
  * `bucket = pmod(hash(lit(token)), B)` — a foldable expression, so
  * Catalyst prunes to ONE of the B directories before any IO
  * (`PartitionFilters` in the scan node). Inside the bucket the `tok`
  * equality is an ordinary pushed parquet filter. A lookup therefore
  * reads ~1/B of the index regardless of corpus size; token postings
  * then semi-join the corpus on its id (at a deployment the corpus
  * side would be id-bucketed too, making the semi-join co-located).
  *
  * Tokens are lowercased whitespace tokens ([[TextFunctions.tokenSet]]
  * over `lower(text)`), so a lookup is WORD search (grep's `-w` face),
  * not substring search — the honest contract an inverted token index
  * can keep. Compose multiple tokens with [[lookupAll]] (AND).
  */
object TextIndex {

  /** One indexing pass: explode distinct lowercased tokens, co-locate
    * by bucket, write one file per bucket directory. The bucket count
    * is persisted alongside the data (`_graft_buckets`, ignored by
    * parquet readers) — a lookup MUST use the same modulus, and two
    * call sites repeating a constant is how postings silently vanish
    * (the wrong directory gets pruned).
    */
  def write(df: DataFrame, idCol: String, textCol: String, path: String,
      buckets: Int = 64): Unit = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    df.select(col(idCol).as("id"),
        explode(TextFunctions.tokenSet(lower(col(textCol)))).as("tok"))
      .withColumn("bucket", pmod(hash(col("tok")), lit(buckets)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    val marker = new org.apache.hadoop.fs.Path(path, "_graft_buckets")
    val fs = marker.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(marker, true)
    try out.write(buckets.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Build-once cache for repeated lookups in one JVM: the bench and
    * verify drivers invoke each query at least twice, and a lookup's
    * cost must be the LOOKUP (the round-7 artifact timed the 2.4 s
    * build + temp cleanup under the lookup query's name). First caller
    * per cache key pays one build into a stable temp path; everyone
    * after reads the same index. A directory left by a previous JVM is
    * rebuilt (mode=overwrite), not trusted — it may be a partial write.
    */
  private val builtIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def ensureIndex(df: DataFrame, idCol: String, textCol: String,
      cacheKey: String, buckets: Int = 64): String =
    builtIndexes.computeIfAbsent(cacheKey, _ => {
      // md5 of the key, not String.hashCode: two distinct keys with
      // colliding 32-bit hashes would share a directory and the second
      // build would silently overwrite the first key's live index
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(cacheKey.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val path = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"),
        "graft_index_" + digest).toString
      write(df, idCol, textCol, path, buckets)
      path
    })

  /** The bucket count the index at `path` was written with. */
  def bucketsOf(spark: SparkSession, path: String): Int = {
    val marker = new org.apache.hadoop.fs.Path(path, "_graft_buckets")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(marker)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
    finally in.close()
  }

  /** Posting list of one token: ids of documents containing it as a
    * whole (lowercased) token. Reads one bucket directory. `buckets ≤
    * 0` (the default) reads the modulus the index was written with.
    */
  def lookup(spark: SparkSession, path: String, token: String,
      buckets: Int = 0): DataFrame = {
    val b = if (buckets > 0) buckets else bucketsOf(spark, path)
    val t = token.toLowerCase(java.util.Locale.ROOT)
    spark.read.parquet(path)
      .filter(col("bucket") === pmod(hash(lit(t)), lit(b)) &&
        col("tok") === lit(t))
      .select("id")
  }

  /** AND of several tokens: intersect the posting lists (joins run
    * smallest-relation-first is left to AQE; lists are tiny relative
    * to the corpus by construction).
    */
  def lookupAll(spark: SparkSession, path: String, tokens: Seq[String],
      buckets: Int = 0): DataFrame = {
    require(tokens.nonEmpty, "tokens must not be empty")
    val b = if (buckets > 0) buckets else bucketsOf(spark, path)
    tokens.map(lookup(spark, path, _, b)).reduce(_.join(_, "id"))
  }

  /** Index-accelerated word grep: the corpus rows whose text contains
    * EVERY given token, resolved via posting-list semi-join instead of
    * a full-text scan.
    */
  def grepTokens(corpus: DataFrame, idCol: String, indexPath: String,
      tokens: Seq[String], buckets: Int = 0): DataFrame = {
    val ids = lookupAll(corpus.sparkSession, indexPath, tokens, buckets)
      .withColumnRenamed("id", idCol)
    corpus.join(ids, Seq(idCol), "left_semi")
  }

  // ---- positional index: PHRASE search, not just AND-of-words ----

  /** Positional index pass: (tok, id, pos) for EVERY token occurrence
    * (vs [[write]]'s distinct-token postings), same bucket layout and
    * marker. Costs the duplicate occurrences in index bytes; buys
    * phrase queries — AND-of-words can't distinguish "slow scan" from
    * "scan slow".
    */
  def writePositional(df: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int = 64): Unit = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    df.select(col(idCol).as("id"),
        posexplode(TextFunctions.tokens(lower(col(textCol)))))
      .withColumnRenamed("col", "tok")
      .withColumn("bucket", pmod(hash(col("tok")), lit(buckets)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    val marker = new org.apache.hadoop.fs.Path(path, "_graft_buckets")
    val fs = marker.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(marker, true)
    try out.write(buckets.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** [[ensureIndex]]'s build-once memoization for the positional
    * layout (the key space is shared — callers prefix the cache key,
    * and the two writers never race on one directory because the key
    * hash IS the directory name).
    */
  def ensurePositional(df: DataFrame, idCol: String, textCol: String,
      cacheKey: String, buckets: Int = 64): String =
    builtIndexes.computeIfAbsent("pos:" + cacheKey, _ => {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(("pos:" + cacheKey).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val path = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"),
        "graft_index_" + digest).toString
      writePositional(df, idCol, textCol, path, buckets)
      path
    })

  /** Start positions of a multi-token phrase: the i-th phrase token's
    * postings shift to `pos - i`, and a phrase occurrence is a (id,
    * start) present in EVERY shifted list — an equi-join chain on
    * (id, start), each leg reading one bucket directory. Output:
    * (id, start), one row per occurrence.
    *
    * Scale: each leg is a pruned ~1/B index read with the `tok`
    * equality pushed to parquet; the joins carry posting lists (corpus
    * frequency of one word), not the corpus, and AQE picks
    * broadcast/shuffle per leg by actual size.
    */
  def phraseStarts(spark: SparkSession, path: String, phrase: String,
      buckets: Int = 0): DataFrame = {
    val toks = phrase.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).toSeq
    require(toks.nonEmpty, "phrase must contain at least one token")
    val b = if (buckets > 0) buckets else bucketsOf(spark, path)
    toks.zipWithIndex.map { case (t, i) =>
      spark.read.parquet(path)
        .filter(col("bucket") === pmod(hash(lit(t)), lit(b)) &&
          col("tok") === lit(t))
        .select(col("id"), (col("pos") - i).as("start"))
    }.reduce(_.join(_, Seq("id", "start")))
  }

  /** Index-accelerated phrase grep: corpus rows whose text contains
    * the tokens of `phrase` CONSECUTIVELY (the `grep "a b"` face,
    * word-boundary semantics).
    */
  def grepPhrase(corpus: DataFrame, idCol: String, indexPath: String,
      phrase: String, buckets: Int = 0): DataFrame = {
    val ids = phraseStarts(corpus.sparkSession, indexPath, phrase, buckets)
      .select(col("id").as(idCol))
    corpus.join(ids, Seq(idCol), "left_semi")
  }
}
