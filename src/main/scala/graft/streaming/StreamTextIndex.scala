package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained inverted token index: the at-ingest face
  * of [[graft.sources.TextIndex]]. The reference's whole point is
  * querying a LIVE stream (`supervisor` keeps results continuously
  * up to date, `supervisor/filter_manager.go`); a batch-built index
  * would make a new document word-greppable only after a full
  * rebuild. Postings are a SET — the index of a union is the union
  * of postings — so ingest appends each micro-batch's own (tok, id)
  * delta and readers take DISTINCT; the historical corpus is never
  * rescanned.
  *
  * Layout matches the batch index exactly: rows partitioned by
  * `bucket = pmod(hash(tok), B)` with the modulus persisted in the
  * `_graft_buckets` marker, so a lookup prunes to ONE of B
  * directories (PartitionFilters) whether the index was built in one
  * pass or grown batch-by-batch. Deltas additionally carry their
  * `batch_id` for observability.
  *
  * Delivery: foreachBatch is at-least-once — but set semantics make
  * the index NATURALLY idempotent: a redelivered batch appends
  * duplicate (tok, id) rows and DISTINCT absorbs them, before OR
  * after a [[compact]] (unlike the counting [[StreamSketch]], which
  * needs a compaction watermark). Retries cost space until the next
  * compaction, never correctness.
  *
  * The index is APPEND-ONLY with respect to document content: set
  * union can add postings but never retract them, so re-ingesting a
  * MODIFIED document leaves its removed tokens matching it (grep
  * false positives on stale terms) — the standard inverted-index
  * limitation without a deletion log. Route updates through a
  * rebuild (TextIndex.write) or a fresh root.
  *
  * Parity contract: ingesting a corpus in ANY batch split, with any
  * number of interleaved compactions and redeliveries, yields the
  * same posting set as [[graft.sources.TextIndex.write]] over the
  * union — q_stream_text_index hash-checks a lookup against the
  * batch oracle; TextIndexSpec replays splits, retries, and a
  * mid-stream compaction.
  */
object StreamTextIndex {

  private def marker(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root, "_graft_buckets")

  /** The persisted bucket modulus, or −1 if the index does not exist
    * yet. */
  def bucketsOf(spark: SparkSession, root: String): Int = {
    val m = marker(spark, root)
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(m)) return -1
    val in = fs.open(m)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
    finally in.close()
  }

  private def writeMarker(spark: SparkSession, root: String,
      buckets: Int): Unit = {
    val m = marker(spark, root)
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(m, true)
    try out.write(buckets.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Append one micro-batch's posting delta. The FIRST batch fixes
    * the bucket modulus; later batches use the persisted one (two
    * call sites disagreeing on a constant is how postings silently
    * land in directories lookups prune away).
    */
  def upsertBatch(batch: DataFrame, idCol: String, textCol: String,
      root: String, batchId: Long, buckets: Int = 64): Unit = {
    val spark = batch.sparkSession
    val persisted = bucketsOf(spark, root)
    val b = if (persisted > 0) persisted else buckets
    require(b > 0, s"buckets must be positive: $b")
    batch.select(col(idCol).as("id"),
        explode(TextFunctions.tokenSet(lower(col(textCol)))).as("tok"))
      .withColumn("bucket", pmod(hash(col("tok")), lit(b)))
      .withColumn("batch_id", lit(batchId))
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(root)
    if (persisted <= 0) writeMarker(spark, root, b)
  }

  /** The merged posting set: one (tok, id, bucket) row per distinct
    * posting — the batch index's shape, so every
    * [[graft.sources.TextIndex]] consumer pattern applies. */
  def readIndex(spark: SparkSession, root: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(root)
    val exists =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    if (!exists) {
      import spark.implicits._
      return Seq.empty[(String, Long, Int)].toDF("tok", "id", "bucket")
    }
    spark.read.parquet(root).select("tok", "id", "bucket").distinct()
  }

  /** Posting list of one token: DISTINCT ids, read from one pruned
    * bucket directory (the `bucket =` predicate constant-folds into
    * PartitionFilters exactly as in the batch index). */
  def lookup(spark: SparkSession, root: String, token: String): DataFrame = {
    val b = bucketsOf(spark, root)
    require(b > 0, s"no index at $root")
    val t = token.toLowerCase(java.util.Locale.ROOT)
    spark.read.parquet(root)
      .filter(col("bucket") === pmod(hash(lit(t)), lit(b)) &&
        col("tok") === lit(t))
      .select("id").distinct()
  }

  /** AND of several tokens — intersect posting lists. */
  def lookupAll(spark: SparkSession, root: String,
      tokens: Seq[String]): DataFrame = {
    require(tokens.nonEmpty, "tokens must not be empty")
    tokens.map(lookup(spark, root, _)).reduce(_.join(_, "id"))
  }

  /** Index-accelerated word grep against the live index. */
  def grepTokens(corpus: DataFrame, idCol: String, root: String,
      tokens: Seq[String]): DataFrame = {
    val ids = lookupAll(corpus.sparkSession, root, tokens)
      .withColumnRenamed("id", idCol)
    corpus.join(ids, Seq(idCol), "left_semi")
  }

  /** Fold the accumulated deltas into one DISTINCT posting set per
    * bucket (batch_id −1): state returns to the batch index's size
    * regardless of how many batches (or retries) fed it. Same
    * crash contract as [[StreamDedup.compact]]: the merged set is
    * eagerly materialized before the directory is overwritten; the
    * bucket marker is rewritten after (the overwrite clears the
    * root), from the value read before.
    */
  def compact(spark: SparkSession, root: String): Unit = {
    val b = bucketsOf(spark, root)
    if (b <= 0) return // nothing ingested yet
    val merged = readIndex(spark, root)
      .withColumn("batch_id", lit(-1L))
      .localCheckpoint(true)
    merged.write.mode("overwrite").partitionBy("bucket").parquet(root)
    writeMarker(spark, root, b)
  }
}
