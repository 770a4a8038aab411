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
    */
  def upsertBatch(batch: DataFrame, textCol: String, root: String,
      batchId: Long, depth: Int = 4, hexDigits: Int = 3): Unit = {
    Sketch.cmsSketch(batch, textCol, depth, hexDigits)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").partitionBy("r").parquet(root)
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
    val merged = readSketch(spark, root)
      .withColumn("batch_id", lit(-1L))
      .localCheckpoint(true)
    merged.write.mode("overwrite").partitionBy("r").parquet(root)
  }
}
