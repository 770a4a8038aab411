package graft

import graft.model.FilterDef
import graft.operators.FilterFanout
import org.apache.spark.sql.functions._

class FilterFanoutSpec extends SparkSpec {

  private val filters = Seq(
    FilterDef("f1", "errors", "error"),
    FilterDef("f2", "ci", "(?i)CHECKOUT"),
    FilterDef("f3", "re", "(100|200)"))

  test("multicast: one row per matching filter, non-matchers dropped (MatchBolt.java:193-200)") {
    import spark.implicits._
    val lines = Seq(
      "error in checkout 100", // matches all three
      "Checkout started",      // f2 only
      "nothing to see").toDF("_raw")
    val got = FilterFanout.explodeMatches(lines, "_raw", filters)
      .select("_raw", "filter_id").as[(String, String)].collect().toSet
    assert(got == Set(
      ("error in checkout 100", "f1"),
      ("error in checkout 100", "f2"),
      ("error in checkout 100", "f3"),
      ("Checkout started", "f2")))
  }

  test("fast paths agree with plain rlike on the fixture corpus (Filter.java:33-52)") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    // word fast path vs rlike
    val viaContains = docs.filter(FilterFanout.predicate(col("text"), "spark")).count()
    val viaRlike = docs.filter(col("text").rlike("spark")).count()
    assert(viaContains == viaRlike && viaContains > 0)
    // (?i) fast path vs rlike with embedded flag
    val ciFast = docs.filter(FilterFanout.predicate(col("text"), "(?i)SPARK")).count()
    val ciRlike = docs.filter(col("text").rlike("(?i)SPARK")).count()
    assert(ciFast == ciRlike && ciFast == viaRlike)
  }

  test("matchCounts aggregates per filter") {
    import spark.implicits._
    val lines = Seq("error a", "error b", "ok 100").toDF("_raw")
    val got = FilterFanout.matchCounts(lines, "_raw", filters)
      .as[(String, Long)].collect().toMap
    assert(got == Map("f1" -> 2L, "f3" -> 1L))
  }
}
