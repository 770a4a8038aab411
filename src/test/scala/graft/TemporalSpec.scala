package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {

  test("rangeJoin equals the naive BETWEEN join and never plans a nested loop") {
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), unix_timestamp(col("ts")).as("es"))
    val wins = ev
      .select((col("es") - pmod(col("es"), lit(86400L))).as("day")).distinct()
      .select((col("day") + 21600L).as("win_start"),
        (col("day") + 64800L).as("win_end"))

    val binned = Temporal.rangeJoin(ev, "es", wins, "win_start", "win_end",
        binSec = 3600)
      .select("event_id", "win_start")
    val naive = ev.join(wins,
        col("es") >= col("win_start") && col("es") <= col("win_end"))
      .select("event_id", "win_start")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    assert(binned.count() > 0, "fixture should have in-window events")

    // the selling point: a hash equi-join on the bin key, not the
    // nested loop Spark plans for a raw range predicate
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join fell back to a pair loop:\n$plan")
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"),
      "premise check: the raw range predicate should plan as a loop")
  }

  test("rangeJoin edges: boundary timestamps included, inverted intervals dropped") {
    import spark.implicits._
    val pts = Seq((1L, 100L), (2L, 200L), (3L, 150L), (4L, 99L))
      .toDF("id", "es")
    val iv = Seq((100L, 200L, "w1"), (500L, 400L, "bad"))
      .toDF("s", "e", "name")
    val got = Temporal.rangeJoin(pts, "es", iv, "s", "e", binSec = 50)
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "w1"), (2L, "w1"), (3L, "w1")))

    // a runaway interval (open-ended sentinel) fails fast with a named
    // error instead of driving sequence() into the array-size limit
    val runaway = Seq((0L, 9999999999L, "oops")).toDF("s", "e", "name")
    val err = intercept[Exception] {
      Temporal.rangeJoin(pts, "es", runaway, "s", "e", binSec = 1,
        maxBinsPerInterval = 1000).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("rangeJoin")), s"got: $err")
  }
}
