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
      .config("spark.ui.enabled", "false")

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
}
