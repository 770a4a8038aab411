package graft.streaming

import graft.model.FilterDef
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Runnable end-to-end streaming demo: documents fixture → text file
  * "log" → file-source stream → parse → fan-out → {parquet results
  * sink partitioned by (filter_id, date), windowed stats}. Prints a
  * summary line; exercises the same pipeline the streaming ingest
  * (SURVEY §3.1) uses, driven to completion on finite input.
  *
  * Usage: runMain graft.streaming.StreamDemo <sfDir> <workDir>
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, workDir) = args.take(2)
    val spark = graft.GraftSession.builder(4)
      .appName("graft-stream-demo").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Stage fixture docs as timestamped syslog-ish lines.
    val linesDir = s"$workDir/lines"
    Tables.load(spark, sfDir, "documents")
      .select(concat(
        lit("2025-07-20T11:"),
        lpad((col("doc_id") % 60).cast("string"), 2, "0"),
        lit(":00.000+00:00 host"), (col("doc_id") % 4).cast("string"),
        lit(" app: "), col("text")).as("value"))
      .coalesce(1).write.mode("overwrite").text(linesDir)

    val filters = Seq(
      FilterDef("f_spark", "spark", "spark"),
      FilterDef("f_joinmerge", "join_or_merge", "(join|merge)"),
      FilterDef("f_ci", "query_ci", "(?i)QUERY"))

    val stream = spark.readStream
      .schema("value STRING")
      .text(linesDir)
    val matched = LogPipeline.matches(LogPipeline.parse(stream, "value"), filters)

    val results = LogPipeline.resultsQuery(matched,
      s"$workDir/results", s"$workDir/ckpt_results",
      Trigger.ProcessingTime("1 second"))
    val stats = LogPipeline.statsQuery(matched, "demo_stats",
      stepSec = 60, Trigger.ProcessingTime("1 second"))
    results.processAllAvailable()
    stats.processAllAvailable()
    results.stop(); stats.stop()

    val written = spark.read.parquet(s"$workDir/results")
    val perFilter = written.groupBy("filter_id").count()
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(",")
    val statRows = spark.table("demo_stats").count()
    val partitions = written.select("filter_id", "date").distinct().count()
    println(s"STREAM_DEMO results_per_filter{$perFilter} stats_rows=$statRows partitions=$partitions")
    spark.stop()
  }
}
