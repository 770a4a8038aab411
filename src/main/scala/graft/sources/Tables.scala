package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Columnar parquet scans give predicate pushdown + column pruning for
  * free; every operator in the engine reads through here so the scan
  * layer stays in one place (at cluster scale: swap for a partitioned
  * table catalog without touching operators).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    // read as a timestamp. Read nanos as long and truncate to micros
    // (integer DIV — no double round-trip, which would lose precision at
    // 1.7e18 ns magnitudes), matching DuckDB's ns→us truncation.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000L")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every fixture table as a temp view for `spark.sql`. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
