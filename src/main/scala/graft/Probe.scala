package graft

/** Ad-hoc query profiler: time any SparkEntry query in isolation
  * (cold + warm) and print its formatted physical plan.
  *
  * Usage: runMain graft.Probe <queryName> [sfDir] [runs]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: Probe <queryName> [sfDir] [runs]"))
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.builder(GraftSession.defaultCores)
      .appName("probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; have: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    // absorb session-wide startup so run1 measures the query's own
    // cold cost (its codegen + IO), not the JVM's. Warm on sf0.001,
    // not `dir` — probe fixtures like the x10/x100 replicas carry only
    // the documents/embeddings tables.
    SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
