package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: documents are concatenated in a
  * deterministic global order (by `idCol`) and the token stream is cut
  * into fixed-`tokenBudget` context windows ("concat-and-chunk" — the
  * standard way training examples are formed from a tokenized corpus).
  * Each document is labeled with the window span it lands in.
  *
  * Scale design: the global prefix sum is computed in two phases —
  * range-repartition by id (so partition boundaries respect the global
  * order), a per-partition running sum, then per-partition totals
  * (tiny: one row per partition) are collected and turned into
  * exclusive partition offsets. No single-partition global window: the
  * naive `Window.orderBy(id)` with no partition key funnels the whole
  * corpus through ONE task, which is exactly the shape that dies at
  * 100 TB. Cost: one range shuffle + one hash shuffle on partition id.
  *
  * Output per document: (idCol, n_tokens, start_token, pack_first,
  * pack_last, pack_offset) — `pack_first`/`pack_last` are the first
  * and last window ordinals the document's tokens touch,
  * `pack_offset` its position inside the first window. Integer-exact,
  * so any SQL engine reproduces it from the same ordering.
  */
object Pack {

  def packSequences(df: DataFrame, idCol: String, textCol: String,
      tokenBudget: Int): DataFrame =
    packCounts(
      df.select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens")),
      idCol, tokenBudget)

  /** The same packing over a PRECOMPUTED per-document count relation
    * — the input must carry `idCol` and a count column named exactly
    * `n_tokens` (e.g. `Bpe.encodeIds(...).groupBy(id)
    * .agg(count(lit(1)).as("n_tokens"))`), which feeds BPE-piece
    * streams straight into fixed-budget context windows, ending the
    * pretrain pipeline at packed id sequences.
    */
  def packCounts(countedIn: DataFrame, idCol: String,
      tokenBudget: Int): DataFrame = {
    val df = countedIn
    require(tokenBudget > 0, s"tokenBudget must be positive: $tokenBudget")
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // localCheckpoint(eager): the per-row partition ids must be FROZEN
    // DATA before anything downstream reads them — range boundaries
    // come from sampling, so a lazily re-executed exchange can assign
    // boundary rows to different partitions across the totals job and
    // the window job (observed: off-by-one-document offsets).
    // Lifecycle: the checkpoint blocks are released by the
    // ContextCleaner once the returned plan is dereferenced; callers
    // holding many packed frames in one long-lived session should
    // materialize (write/collect) and drop them, or sweep
    // sparkContext.getPersistentRDDs and unpersist, as Bench does.
    val counted = df
      .select(col(idCol), col("n_tokens"))
      .repartitionByRange(parallelism, col(idCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    // phase 1: per-partition totals -> exclusive offsets (one row per
    // partition; collect is O(parallelism), not O(rows))
    val totals = counted.groupBy("_pid")
      .agg(sum(col("n_tokens")).as("_tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) =>
      (pid, acc + tot)
    }.init.zip(totals).map { case ((_, off), (pid, _)) => pid -> off }
    // The (pid → exclusive offset) relation is O(parallelism) rows;
    // broadcast-join it back onto the data. (The previous when-chain
    // over every partition id built an O(parallelism)-deep Column tree
    // — a Janino-hostile expression at thousands of partitions.)
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = broadcast(offsets.toSeq.toDF("_pid", "_poff"))
    // phase 2: partition-local running sum; start = global exclusive
    // prefix of this document's tokens
    val w = Window.partitionBy("_pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lastTok = col("start_token") +
      when(col("n_tokens") > 0, col("n_tokens") - 1).otherwise(lit(0))
    counted
      .join(offsetDf, Seq("_pid"))
      .withColumn("start_token", col("_poff") + sum(col("n_tokens")).over(w)
        - col("n_tokens"))
      .select(col(idCol), col("n_tokens"), col("start_token"),
        floor(col("start_token") / tokenBudget).as("pack_first"),
        floor(lastTok / tokenBudget).as("pack_last"),
        (col("start_token") % tokenBudget).as("pack_offset"))
  }
}
