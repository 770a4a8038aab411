package graft.tools

import graft.operators.Scale
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Runnable demonstration of the scale utilities on the fixtures:
  * prints salted-vs-direct aggregation agreement and the bucketed-join
  * plan's exchange count. Usage: runMain graft.tools.ScaleDemo [sfDir]
  */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder(graft.GraftSession.defaultCores)
      .appName("scale-demo").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val events = Tables.load(spark, sfDir, "events")

    val direct = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedCount(events, Seq("event_type"), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"SALTED_EQUALS_DIRECT=${salted == direct} keys=${direct.size} total=${direct.values.sum}")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    Scale.writeBucketed(Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice")), "sd_orders", "k", 4)
    Scale.writeBucketed(Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity")), "sd_lineitem", "k", 4)
    val joined = Scale.bucketedJoin(spark, "sd_orders", "sd_lineitem", "k")
    val exchanges = joined.queryExecution.executedPlan.toString
      .split("Exchange").length - 1
    println(s"BUCKETED_JOIN_EXCHANGES=$exchanges rows=${joined.count()}")
    spark.sql("DROP TABLE sd_orders"); spark.sql("DROP TABLE sd_lineitem")
    spark.stop()
  }
}
