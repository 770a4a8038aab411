package graft.streaming

import graft.operators.Sketch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained count-min sketch: the at-ingest face of
  * [[graft.operators.Sketch]]. CMS is a MERGEABLE summary — the
  * sketch of a union is the cell-wise SUM of the sketches — so
  * ingest appends each micro-batch's own depth×width delta and
  * readers sum; the historical corpus is never rescanned and the
  * persisted state is O(batches · depth · width), independent of
  * corpus size (and [[compact]] collapses it back to depth×width).
  *
  * Parity contract: ingesting a corpus in ANY batch split yields
  * exactly [[Sketch.cmsSketch]] of the union — per-cell counts are
  * sums and sums associate. SketchSpec asserts the split replay;
  * q_stream_cms hash-checks it against the q_cms_sketch oracle.
  *
  * Delivery: foreachBatch is at-least-once — a retried micro-batch
  * can append its delta twice. Deltas carry their `batch_id`, and
  * readers keep one row per (batch_id, r, b) before summing, so a
  * retry costs space, not correctness (the same contract as
  * [[StreamDedup]]).
  */
object StreamSketch {

  /** Append one batch's sketch delta under `root`. Partitioned by
    * sketch row `r`: a point query that probes only some rows prunes
    * directories, and the layout keeps each append to `depth` small
    * files.
    *
    * Batches at or below the compaction watermark (see [[compact]])
    * are REJECTED as no-ops: after a compaction folds deltas into
    * batch_id −1, the (batch_id, r, b) dedup key can no longer absorb
    * a redelivery of a pre-compaction batch, so the watermark carries
    * the retry-safety contract across compactions.
    */
  def upsertBatch(batch: DataFrame, textCol: String, root: String,
      batchId: Long, depth: Int = 4, hexDigits: Int = 3): Unit = {
    val spark = batch.sparkSession
    val wm = readWatermark(spark, root)
    if (batchId <= wm) {
      // LOUD no-op: this is correct for a redelivery, but a genuinely
      // new batch can land here after a checkpoint reset restarts
      // Structured Streaming's batch ids at 0 — in which case its
      // counts would be silently lost. Batch ids must stay monotone
      // per root across checkpoint resets (reuse the checkpoint, or
      // start a fresh root).
      System.err.println(s"[stream-sketch] batch $batchId <= compaction " +
        s"watermark $wm at $root — treated as an at-least-once " +
        "redelivery and IGNORED; if this is a new batch after a " +
        "checkpoint reset, its counts are NOT ingested")
      return
    }
    Sketch.cmsSketch(batch, textCol, depth, hexDigits)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").partitionBy("r").parquet(root)
  }

  /** The highest batch_id folded into a compaction, −1 if never
    * compacted. Stored as a SIBLING of the root (`<root>_watermark`)
    * so the compaction's mode("overwrite") rewrite of the root cannot
    * delete it — which lets [[compact]] write it BEFORE the rewrite
    * for crash-safety.
    */
  def readWatermark(spark: SparkSession, root: String): Long = {
    val p = new org.apache.hadoop.fs.Path(root.stripSuffix("/") + "_watermark")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return -1L
    val in = fs.open(p)
    try new java.io.BufferedReader(new java.io.InputStreamReader(in))
      .readLine().trim.toLong
    finally in.close()
  }

  private def writeWatermark(spark: SparkSession, root: String,
      wm: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(root.stripSuffix("/") + "_watermark")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$wm\n".getBytes("UTF-8")) finally out.close()
  }

  /** The merged sketch over every ingested batch: one (r, b, cnt) row
    * per touched cell — the same shape [[Sketch.cmsSketch]] emits, so
    * [[Sketch.estimateTokens]] serves point queries against it
    * unchanged.
    */
  def readSketch(spark: SparkSession, root: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(root)
    val exists =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    if (!exists) {
      // nothing ingested yet: the empty sketch (estimates coalesce
      // to zero), not a read error
      import spark.implicits._
      return Seq.empty[(Int, String, Long)].toDF("r", "b", "cnt")
    }
    spark.read.parquet(root)
      // a retried append duplicates whole delta rows; cells are
      // unique per (batch_id, r, b) by construction, so keeping one
      // copy restores exactly-once counts
      .dropDuplicates("batch_id", "r", "b")
      .groupBy("r", "b").agg(sum("cnt").as("cnt"))
  }

  /** Rewrite the accumulated deltas as a single merged delta
    * (batch_id −1): state returns to O(depth × width). The merged
    * sketch is eagerly materialized (localCheckpoint) before the
    * source directory is overwritten — the same contract as
    * [[StreamDedup.compact]]; a crash mid-rewrite can lose the
    * sketch, so run compaction from the maintenance path that owns
    * a re-ingestable upstream, not from the ingest path.
    */
  def compact(spark: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the watermark: highest real batch folded by this compaction.
    // Written BEFORE the rewrite — if the rewrite crashes, the deltas
    // (still batch_id-keyed and dedupable) survive and the watermark
    // merely rejects redeliveries of batches those deltas already
    // hold, so counts stay exact on either side of the crash.
    val maxBatch =
      if (!fs.exists(p)) -1L
      else spark.read.parquet(root).agg(max("batch_id")).head() match {
        case r if r.isNullAt(0) => -1L
        case r => r.getLong(0)
      }
    val prior = readWatermark(spark, root)
    val merged = readSketch(spark, root)
      .withColumn("batch_id", lit(-1L))
      .localCheckpoint(true)
    writeWatermark(spark, root, math.max(maxBatch, prior))
    merged.write.mode("overwrite").partitionBy("r").parquet(root)
  }
}
