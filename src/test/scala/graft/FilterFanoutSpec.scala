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

  test("large-registry path (MultiRegexMatch) agrees with the inline path") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    // 40 filters: word, ci, regex, anchored variants
    val vocab = Seq("spark", "join", "merge", "query", "table", "scan",
      "batch", "stream", "filter", "window")
    val big = vocab.zipWithIndex.flatMap { case (w, i) => Seq(
      FilterDef(s"w$i", s"w$i", w),
      FilterDef(s"c$i", s"c$i", s"(?i)${w.toUpperCase}"),
      FilterDef(s"r$i", s"r$i", s"($w|xyz$i)"),
      FilterDef(s"a$i", s"a$i", s"^$w ")) }
    assert(big.size > FilterFanout.InlineRegistryLimit)
    val viaExpr = FilterFanout.explodeMatches(docs, "text", big)
      .select("doc_id", "filter_id").as[(Long, String)].collect().toSet
    // force the inline path by splitting into ≤16-filter chunks
    val viaInline = big.grouped(FilterFanout.InlineRegistryLimit).flatMap { chunk =>
      FilterFanout.explodeMatches(docs, "text", chunk)
        .select("doc_id", "filter_id").as[(Long, String)].collect()
    }.toSet
    assert(viaExpr == viaInline && viaExpr.nonEmpty)
  }

  test("matchCounts aggregates per filter") {
    import spark.implicits._
    val lines = Seq("error a", "error b", "ok 100").toDF("_raw")
    val got = FilterFanout.matchCounts(lines, "_raw", filters)
      .as[(String, Long)].collect().toMap
    assert(got == Map("f1" -> 2L, "f3" -> 1L))
  }
}
