package graft.streaming

import graft.operators.{Bpe, Pack}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The curation→training handoff AT INGEST: micro-batches encode to
  * BPE piece-id sequences under a FROZEN tokenizer and append to a
  * live encoded table, which feeds packed context windows — the same
  * compose-at-ingest shape as the LM/quality gates
  * ([[LogPipeline.qualityGateStream]]) applied to the tokenizer.
  *
  * The tokenizer is fit ONCE ([[Bpe.learnMerges]] on the curation
  * cluster, persisted via [[Bpe.saveLearned]]) and every batch
  * encodes under [[Bpe.loadLearned]]'s frozen artifact — so encoding
  * is deterministic and batch-split-invariant: any split of a corpus
  * yields exactly the union's rows (q_stream_bpe_ids hash-checks
  * this against the one-shot [[Bpe.encodeIds]]). Per-document `pos`
  * is computed inside the document, so it never depends on what else
  * shared the batch.
  *
  * Delivery: at-least-once. Rows carry their `batch_id`; a retried
  * batch appends byte-identical rows (deterministic encode) and the
  * read rule keeps each document's NEWEST generation then distincts —
  * retries cost space until [[compact]], never correctness, and
  * re-ingesting a MODIFIED document under a higher batch id is
  * latest-wins, like [[StreamTextIndex]].
  */
object StreamBpe {

  /** Encode one micro-batch under the frozen tokenizer and append its
    * (id, pos, piece, piece_id, batch_id) rows. One scan of the
    * batch, two broadcast joins — no state read, no shuffle against
    * history. */
  def encodeBatch(batch: DataFrame, idCol: String, textCol: String,
      learned: Bpe.Learned, root: String, batchId: Long): Unit =
    BatchTimer.timed("bpe.encode") {
    Bpe.encodeIdsWith(batch, idCol, textCol, learned)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(root)
    // generation row LAST (the StreamTextIndex crash contract): a
    // crash above leaves the previous version fully served
    StreamState.appendGens(batch.select(col(idCol)), root, batchId)
  }

  /** DELETE documents from the live encoded table — the compliance
    * path a training-data store needs: one tombstone generation per
    * id ([[StreamState.appendGens]]), the document's pieces stop
    * serving from the next read, a later [[encodeBatch]] under a
    * higher batch id resurrects it, and [[compact]] physically
    * retires the dead rows (same race-proof guard as
    * [[StreamTextIndex.compactSnapshot]]). */
  def deleteDocs(ids: DataFrame, idCol: String, root: String,
      batchId: Long): Unit =
    BatchTimer.timed("bpe.delete") {
      StreamState.appendGens(ids.select(col(idCol)), root, batchId,
        del = true)
    }

  /** The live encoded table: each document's newest generation, one
    * row per (id, pos) — [[Bpe.encodeIds]]'s exact shape, so every
    * downstream consumer (packing, chunking, vocab stats) reads it
    * unchanged. The latest-wins rule is the broadcast generation-log
    * exclusion ([[StreamState.liveOnly]]) — free until an update
    * happens, NEVER a corpus-wide window over the token stream (that
    * window was the 22×-at-x100 scale killer this replaced); the
    * only remaining exchange is the (id, pos) retry dedup, which
    * [[compact]] makes a no-op-sized shuffle again. */
  def readEncoded(spark: SparkSession, root: String): DataFrame = {
    val df = spark.read.parquet(root)
    val idc = df.columns.head
    StreamState.liveOnly(df, root, idc)
      .drop("batch_id")
      .dropDuplicates(idc, "pos")
  }

  /** Fixed-budget context windows over the live piece stream:
    * [[Pack.packCounts]] on the per-document piece counts. The prefix
    * sum is global BY DESIGN (window ordinals depend on every earlier
    * document), so packing runs over the accumulated table at read
    * time — the encode cost stays per-batch, the pack cost is one
    * bounded two-phase prefix sum when shards are actually cut. */
  def packShards(spark: SparkSession, root: String,
      tokenBudget: Int): DataFrame = {
    val enc = readEncoded(spark, root)
    val idc = enc.columns.head
    Pack.packCounts(
      enc.groupBy(col(idc)).agg(count(lit(1)).as("n_tokens")),
      idc, tokenBudget)
  }

  /** Fold retries and superseded generations away: state returns to
    * one row per live (id, pos). MERGE-AND-RETIRE (see
    * [[StreamState]]): merged rows append from a snapshot, the
    * snapshot retires after, so an [[encodeBatch]] landing
    * mid-compaction is never erased. Kept rows preserve their batch
    * id (their document's generation) for the read rule. */
  def compact(spark: SparkSession, root: String): Unit = {
    compactSnapshot(spark, root, StreamState.listDataFiles(spark, root))
    StreamState.compactGenLog(spark, root)
  }

  private[graft] def compactSnapshot(spark: SparkSession, root: String,
      snapshot: Seq[String]): Unit = {
    if (snapshot.isEmpty) return
    val df = spark.read.parquet(snapshot: _*)
    val idc = df.columns.head
    val byId = org.apache.spark.sql.expressions.Window.partitionBy(idc)
    val newest = df.withColumn("_g", max("batch_id").over(byId))
      .filter(col("batch_id") === col("_g"))
    // physical retire of tombstoned documents — the StreamTextIndex
    // guard: drop only when the tombstone is at least the newest
    // IN-SNAPSHOT generation (monotone batch ids make that safe
    // beside a concurrent resurrection)
    val tombs = StreamState.tombstones(spark, root)
    val kept =
      if (tombs == null) newest
      else newest.join(
          broadcast(tombs.withColumnRenamed("id", idc)), Seq(idc), "left")
        .filter(col("_tomb").isNull || col("_tomb") < col("_g"))
    kept.select(df.columns.map(col): _*).distinct()
      .write.mode("append").parquet(root)
    StreamState.deleteFiles(spark, root, snapshot)
  }
}
