package graft

import graft.operators.StatsRollup
import org.apache.spark.sql.functions._

class StatsRollupSpec extends SparkSpec {

  private lazy val events = graft.sources.Tables.load(spark, sfDir, "events")

  test("rollup buckets align to step and total count is preserved") {
    val rolled = StatsRollup.rollup(events, "ts", 3600, Seq("event_type"))
    val buckets = rolled.select("bucket_start").collect().map(_.getLong(0))
    assert(buckets.forall(_ % 3600 == 0))
    assert(rolled.agg(sum("cnt")).head().getLong(0) == events.count())
  }

  test("rerollup to coarser step preserves the sum (cli/supervisorcon.go:86-100)") {
    val fine = StatsRollup.rollup(events, "ts", 300, Seq("event_type"))
    val coarse = StatsRollup.rerollup(fine, "bucket_start", "cnt", 3600, Seq("event_type"))
    val direct = StatsRollup.rollup(events, "ts", 3600, Seq("event_type"))
    val a = coarse.orderBy("event_type", "bucket_start").collect().toSeq
    val b = direct.orderBy("event_type", "bucket_start").collect().toSeq
    assert(a == b)
  }

  test("gapFill produces a complete arithmetic sequence per key with zeros (cli/supervisorcon.go:103-114)") {
    val rolled = StatsRollup.rollup(events, "ts", 3600, Seq("event_type"))
    val filled = StatsRollup.gapFill(rolled, Seq("event_type"), stepSec = 3600)
    val bounds = rolled.agg(min("bucket_start"), max("bucket_start")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val expectedBuckets = (lo to hi by 3600).toSet
    val keys = rolled.select("event_type").distinct().count()
    assert(filled.count() == expectedBuckets.size * keys)
    val perKey = filled.groupBy("event_type")
      .agg(countDistinct("bucket_start").as("n")).collect()
    assert(perKey.forall(_.getLong(1) == expectedBuckets.size))
    // zero-filled rows exist and original counts survive
    assert(filled.agg(sum("cnt")).head().getLong(0) == events.count())
    assert(filled.filter(col("cnt") === 0).count() > 0)
  }

  test("windowFilter keeps only the trailing window") {
    val nowSec = events.agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    val kept = StatsRollup.windowFilter(events, "ts", 3600, nowSec)
    assert(kept.count() > 0)
    val minTs = kept.agg(min(unix_timestamp(col("ts")))).head().getLong(0)
    assert(minTs >= nowSec - 3600)
  }

  test("seriesCorrelation: co-moving pairs hit ±1, constants are 0, short overlap gated") {
    import spark.implicits._
    def series(fid: String, xs: Seq[Long]) =
      xs.zipWithIndex.map { case (x, i) => (fid, i.toLong * 60, x) }
    val up = (1L to 20L)
    val stats = (series("a", up) ++ series("b", up.map(_ * 3 + 5)) ++
      series("c", up.reverse) ++ series("flat", Seq.fill(20)(7L)) ++
      series("short", Seq(1L, 2L)))
      .toDF("filter_id", "bucket", "count")
    val got = StatsRollup.seriesCorrelation(stats)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got(("a", "b")) == 1.0)   // exact linear relation
    assert(got(("a", "c")) == -1.0)  // exact inverse
    assert(got(("a", "flat")) == 0.0 && got(("b", "flat")) == 0.0)
    // the 2-bucket series never reaches the minOverlap gate
    assert(!got.keySet.exists(p => p._1 == "short" || p._2 == "short"))
  }
}
