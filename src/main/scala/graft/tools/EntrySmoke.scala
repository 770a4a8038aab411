package graft.tools

import org.apache.spark.sql.SparkSession

/** Emulates the driver's t1 smoke: a VANILLA session (no GraftSession
  * tuning, ANSI default-on, no extensions) calling SparkEntry.entry.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    println(s"ENTRY_SMOKE rows=${df.count()} cols=${df.columns.mkString(",")}")
    spark.stop()
  }
}
