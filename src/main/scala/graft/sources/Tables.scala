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
    // `events.ts` has shipped under two parquet encodings across fixture
    // generations: TIMESTAMP(NANOS) — which Spark 4 only reads via
    // nanosAsLong, surfacing a LongType — and plain timestamp[us], which
    // reads natively as TIMESTAMP_NTZ. Adapt to whatever the footer says
    // instead of hard-coding one encoding:
    //   LongType  → nanos; truncate to micros with integer DIV (no double
    //               round-trip, which loses precision at 1.7e18 ns),
    //               matching DuckDB's ns→us truncation.
    //   NTZ       → cast to session-TZ timestamp; session TZ is pinned to
    //               UTC (GraftSession), so values are identical.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000L")))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw // already a session-TZ timestamp
      }
    } else if (name == "embeddings") {
      // Same drift class as events.ts (the round-8 lesson): pin the
      // element type HERE so a fixture regeneration that writes
      // array<double> (or a widened id) cannot break the many
      // driver-side getSeq[Float]/getLong reads downstream. float is
      // the contract the engine quantizes from; casting double→float
      // on an originally-float fixture is the identity.
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
      val vecFixed = raw.schema("embedding").dataType match {
        case ArrayType(FloatType, _) => raw
        case _ => raw.withColumn("embedding",
          col("embedding").cast("array<float>"))
      }
      vecFixed.schema("vec_id").dataType match {
        case LongType => vecFixed
        case _ => vecFixed.withColumn("vec_id", col("vec_id").cast("long"))
      }
    } else if (name == "documents") {
      // same contract pinning for the text fixture's integral columns
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.LongType
      Seq("doc_id", "n_chars").foldLeft(raw) { (df, c) =>
        if (!df.schema.fieldNames.contains(c) ||
          df.schema(c).dataType == LongType) df
        else df.withColumn(c, col(c).cast("long"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every fixture table as a temp view for `spark.sql`. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
