package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line per run (driver contract).
  *
  * Each query is forced through full evaluation with the noop sink
  * (a bare .count() lets Catalyst collapse projection-only plans to a
  * metadata count, which would under-report real work). A warmup pass
  * over a small query absorbs JVM/codegen startup so per-query numbers
  * measure the plan, not the JIT.
  *
  * Contention armor: a single timed pass on a shared box measures the
  * co-tenants as much as the engine (the round-3 artifact recorded a
  * 3.4× slowdown that a re-run on an idle machine showed was load, not
  * the plan). Two defenses:
  *  - every query runs TWICE and reports the min — a transient load
  *    spike must cover both passes to corrupt the number;
  *  - the JSON carries load telemetry: `availableProcessors`, the OS
  *    1-minute load average before and after the run, and `calib_sec` —
  *    a fixed single-threaded arithmetic workload timed at start and
  *    end. The calibration work never changes, so a contended run is
  *    self-evident from the artifact (calib_sec inflated / load ≫
  *    cores) without needing a re-run to adjudicate.
  */
object Bench {

  /** Fixed single-thread workload (~0.2 s idle): xorshift64* folded so
    * the loop can't be dead-code-eliminated. Same instruction count
    * every run — wall time scales with CPU contention only.
    */
  private def calibrate(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9e3779b97f4a7c15L
    var acc = 0L
    var i = 0
    while (i < 200000000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc += x * 0x2545f4914f6cdd1dL
      i += 1
    }
    if (acc == 42L) println("") // defeat DCE; never true in practice
    (System.nanoTime() - t0) / 1e9
  }

  private def loadAvg(): Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  /** Env var as Long with a default — a malformed value falls back to
    * the default instead of aborting the whole benchmark run.
    */
  private def envLong(name: String, default: Long): Long =
    sys.env.get(name).flatMap(s => scala.util.Try(s.trim.toLong).toOption)
      .getOrElse(default)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(GraftSession.defaultCores)
      .appName("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val loadBefore = loadAvg()
    val calibBefore = calibrate()

    def onePass(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // Release storage the query left behind (localCheckpoint blocks
      // from the LSH operators) even when it fails: queries are
      // independent, and leaked blocks turn into GC pressure charged
      // to whatever runs next.
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
      finally GraftSession.releaseCachedBlocks(spark)
    }

    // Best-of-2: min of two full evaluations. Cold-start cost (codegen,
    // parquet footer reads) is already absorbed by the warmup below, so
    // the min measures the plan under the LEAST co-tenant interference
    // of the two passes.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val a = onePass(fn)
      val b = onePass(fn)
      if (a < 0) b else if (b < 0) a else math.min(a, b)
    }

    // Warmup: exercise parquet reader, codegen, shuffle machinery once.
    SparkEntry.queries.get("q1_agg").foreach(onePass)

    // Streaming cadence (BASELINE.md: 1 s results / 10 s stats without
    // backlog) runs FIRST, right after warmup: measured per-trigger
    // latencies belong to the engine, not to the GC/co-tenant state the
    // 90-query sweep leaves behind (the calibration delta showed the
    // end of a bench run is its most contended moment). Disable with
    // SPARK_GRAFT_STREAM_SECS=0 for quick local loops. Default 130 s so
    // the 10 s stats leg accumulates ≥12 triggers — a p95 over 3
    // samples isn't a p95 (round-6 verdict).
    val streamSecs = envLong("SPARK_GRAFT_STREAM_SECS", 130L).toInt
    val streamJson =
      if (streamSecs <= 0) "null"
      else try StreamBench.run(spark,
        envLong("SPARK_GRAFT_STREAM_RATE", 20000L), streamSecs).json
      catch { case e: Throwable =>
        // a broken streaming path must be diagnosable from the run log,
        // not silently published as streaming:null
        System.err.println(s"[bench] StreamBench failed: $e")
        e.printStackTrace()
        "null"
      }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> run(fn)
    }

    // Fan-out throughput (BASELINE.md: ≥50k lines/s at sf0.1): lines =
    // the event stream rendered as log text, matched against the
    // standard registry. Best-of-2 after a JIT-absorbing warmup pass.
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
      def pass(): Double = {
        val t0 = System.nanoTime()
        graft.operators.FilterFanout.explodeMatches(lines, "_raw", filters)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      pass() // absorb codegen/JIT so the rate measures the operator
      n / math.min(pass(), pass())
    }

    val calibAfter = calibrate()
    val loadAfter = loadAvg()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val cores = Runtime.getRuntime.availableProcessors()
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"fanout_lines_per_sec":$fanoutRate%.0f,"streaming":$streamJson,"sf":"$sfDir","cores":$cores,"load_avg_before":$loadBefore%.2f,"load_avg_after":$loadAfter%.2f,"calib_sec_before":$calibBefore%.3f,"calib_sec_after":$calibAfter%.3f}"""
    println(line)
    // Also write the complete artifact to a file: the round driver's
    // stdout tail-scrape truncated 28 of 90 per-query numbers in
    // BENCH_r06 — a file the driver (or a human) picks up can't lose
    // the head of the line.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] full artifact written to $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] artifact write to $outPath failed: $e")
    }
    spark.stop()
  }
}
