package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming log-line sources (SURVEY §2.1 S1): every source yields a
  * single-column `value: string` frame that [[graft.streaming.LogPipeline.parse]]
  * consumes, so the pipeline is source-agnostic.
  */
object LogSources {

  /** Kafka topic of raw syslog lines — the reference's spout
    * (`storm/.../Main.java:95-103`: earliest offset, string scheme).
    * `maxOffsetsPerTrigger` is the backpressure control replacing
    * Storm's `maxSpoutPending` (`Main.java:164`).
    *
    * Requires the spark-sql-kafka connector on the classpath at
    * runtime (format resolution is by name — no compile-time dep).
    */
  def kafka(spark: SparkSession, bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Long = 100000): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()
      .select(col("value").cast("string").as("value"))

  /** Directory of text files (one log line per row) — the test/dev
    * source; also the rsyslog file-tail stand-in.
    */
  def textDir(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema("value STRING")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(path)

  /** Synthetic line generator at `rowsPerSecond` — the fake-data
    * generator (`tools/testing/fake-data-generator/main.go:36-42`,
    * `test <now>` lines) as a rate source.
    */
  def generator(spark: SparkSession, rowsPerSecond: Int = 10): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(concat(lit("test "), col("timestamp").cast("string")).as("value"))
}
