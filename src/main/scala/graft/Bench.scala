package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line per run (driver contract).
  *
  * Each query is forced through full evaluation with the noop sink
  * (a bare .count() lets Catalyst collapse projection-only plans to a
  * metadata count, which would under-report real work). A warmup pass
  * over a small query absorbs JVM/codegen startup so per-query numbers
  * measure the plan, not the JIT.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(GraftSession.defaultCores)
      .appName("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // Release storage the query left behind (localCheckpoint blocks
      // from the LSH operators) even when it fails: queries are
      // independent, and leaked blocks turn into GC pressure charged
      // to whatever runs next.
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
      finally spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(false))
    }

    // Warmup: exercise parquet reader, codegen, shuffle machinery once.
    SparkEntry.queries.get("q1_agg").foreach(run)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> run(fn)
    }

    // Fan-out throughput (BASELINE.md: ≥50k lines/s at sf0.1): lines =
    // the event stream rendered as log text, matched against the
    // standard registry.
    val fanoutRate = {
      import org.apache.spark.sql.functions._
      val lines = graft.sources.Tables.load(spark, sfDir, "events")
        .select(concat_ws(" ", col("event_type"), col("props")).as("_raw"))
      val filters = Seq(
        graft.model.FilterDef("f1", "errors", "error"),
        graft.model.FilterDef("f2", "clickview", "(click|view)"),
        graft.model.FilterDef("f3", "ci", "(?i)PURCHASE"),
        graft.model.FilterDef("f4", "re", "\"k\": [0-9]"))
      val n = lines.count()
      def pass(): Unit =
        graft.operators.FilterFanout.explodeMatches(lines, "_raw", filters)
          .write.format("noop").mode("overwrite").save()
      pass() // absorb codegen/JIT so the rate measures the operator
      val t0 = System.nanoTime()
      pass()
      n / ((System.nanoTime() - t0) / 1e9)
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"fanout_lines_per_sec":$fanoutRate%.0f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
