package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session tuning so Verify/Bench/tests/demos all
  * run identical semantics.
  *
  *  - shuffle.partitions = cores (local mode; at cluster scale this is
  *    overridden by AQE coalescing anyway)
  *  - AQE on: runtime re-plan, skew-join splitting, partition coalesce
  *  - ANSI off: the engine's hash families (MinHash, rolling hashes)
  *    rely on wrapping 64-bit arithmetic, as any native hash engine
  *    does; ANSI overflow errors would reject them
  *  - UTC session timezone for oracle parity
  *  - FAIR scheduling: concurrent streaming queries (1 s results next
  *    to 10 s stats) each run in their own pool so a long stats
  *    micro-batch cannot starve the results cadence — single-query
  *    batch work is unaffected (one pool, FIFO within it)
  */
object GraftSession {
  def builder(cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")

  /** Run `start` with the thread-local scheduler pool set, so the
    * streaming query it launches lands its micro-batch jobs in `pool`
    * (StreamExecution threads inherit the property at query start).
    */
  def inPool[T](spark: SparkSession, pool: String)(start: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.scheduler.pool")
    sc.setLocalProperty("spark.scheduler.pool", pool)
    try start finally sc.setLocalProperty("spark.scheduler.pool", prev)
  }

  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(math.min(32, Runtime.getRuntime.availableProcessors()))

  /** Release every pinned storage block (persist + localCheckpoint
    * RDDs). The eager-LSH operators (Dedup.minhashLsh,
    * Similarity.lshPairs/buildIvf, Pack.packSequences) return
    * localCheckpoint'ed frames whose blocks the ContextCleaner frees
    * only after the frame is garbage-collected; a long-lived session
    * that keeps references accumulates pinned blocks. Call this between
    * logical units of work (Bench calls the equivalent sweep after
    * every query).
    */
  def releaseCachedBlocks(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

  /** Release ONE eagerly-`localCheckpoint`ed frame's executor blocks,
    * deterministically. `Dataset.unpersist` cannot (the CacheManager
    * never saw the checkpoint) and [[releaseCachedBlocks]] is a sweep
    * that would also drop blocks concurrent work still needs — this
    * unpersists exactly the RDDs the frame's own plan holds (a
    * checkpointed plan is a single `LogicalRDD` leaf). The per-batch
    * ingest paths ([[graft.streaming.StreamDedup]],
    * [[graft.streaming.StreamPretrain]]) call it after each
    * micro-batch's delta is consumed, so a long ingest never pins N
    * batches of materialized deltas waiting for a driver GC. */
  def releaseCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => ()
    }
}
