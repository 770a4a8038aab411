package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained IVF-PQ index: the at-ingest face of the
  * [[Similarity.buildIvfPq]]/[[Similarity.queryIvfPqTable]] split.
  * The production ANN contract at 100 TB is "fit ONCE, serve many" —
  * and its corollary is that NEW vectors must become searchable
  * without a refit or a table rebuild: the persisted model (coarse
  * centroids + PQ codebooks in the `_meta` sidecar) is FROZEN, so an
  * arriving micro-batch only needs one projection (coarse-cell
  * argmin under the fixed centroids — [[Similarity.assignCells]] —
  * plus PQ encoding under the fixed codebooks) and an append into
  * its cell partitions. Queries are unchanged: the same
  * partition-pruned probed-cell read serves the base build and every
  * appended batch.
  *
  * Delivery: at-least-once. Appended rows carry their `batch_id`
  * (the base build writes −1), and because codes are DETERMINISTIC
  * under the frozen model, a retried batch appends byte-identical
  * rows — `queryIvfPqTable` keeps the LATEST batch's row per id, so
  * retries cost space until [[compact]], never correctness.
  * Re-ingesting an EXISTING id with a changed vector is latest-wins,
  * with one caveat: until the next [[compact]] (which dedups across
  * all cells), a vector that moved cells still serves from its old
  * cell when only that cell is probed. Treat updates as
  * eventually-consistent until compaction; deletions need a rebuild.
  *
  * Drift contract (the honest ANN caveat, stated rather than hidden):
  * appended vectors are quantized by the BASE corpus' model. If the
  * ingest distribution drifts far from the training distribution,
  * recall decays on the new mass — the standard IVF practice applies
  * (monitor per-cell fill; re-run buildIvfPq when imbalance crosses a
  * threshold, which [[cellStats]] exposes).
  */
object StreamIvfPq {

  /** Encode + append one micro-batch under the frozen model at
    * `path`. One scan of the batch; writes only the touched cell
    * partitions. */
  def upsertBatch(batch: DataFrame, idCol: String, vecCol: String,
      path: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val idx = Similarity.readIvfPqMeta(spark, path)
    val cells = Similarity.assignCells(batch, idCol, vecCol,
      idx.centroids, idx.scale)
    Similarity.pqEncode(batch, idCol, vecCol, idx.codebooks, idx.scale)
      .join(cells, Seq(idCol))
      .select(col(idCol), col("codes"), lit(batchId).as("batch_id"),
        col("cluster"))
      .write.mode("append").partitionBy("cluster").parquet(path)
  }

  /** Per-cell row counts — the fill-imbalance signal that tells an
    * operator when the frozen coarse quantizer has drifted from the
    * ingest distribution and a re-fit is due. Reads code rows only
    * (m bytes per vector), never vectors. */
  def cellStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy("cluster").agg(count(lit(1)).as("rows"))

  /** Fold retried-batch duplicates away and rewrite each cell
    * partition once (batch_id −1): the table returns to exactly one
    * row per id. The `_meta` sidecar is re-written after the
    * overwrite from the model read before it (same contract as
    * [[StreamTextIndex.compact]]). */
  def compact(spark: SparkSession, path: String): Unit = {
    val idx = Similarity.readIvfPqMeta(spark, path)
    val idCol = spark.read.parquet(path).columns.head
    // latest-wins PER ID ACROSS ALL CELLS (deterministic): this is the
    // point where a re-ingested id's older encoding — possibly in a
    // different cell partition — is actually removed
    val byId = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("batch_id").desc)
    val merged = spark.read.parquet(path)
      .withColumn("_rk", row_number().over(byId))
      .filter(col("_rk") === 1)
      .withColumn("batch_id", lit(-1L))
      .select(col(idCol), col("codes"), col("batch_id"), col("cluster"))
      .localCheckpoint(true)
    merged.write.mode("overwrite").partitionBy("cluster").parquet(path)
    Similarity.writeIvfPqMeta(spark, idx)
  }
}
