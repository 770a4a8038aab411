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

  test("exactQuantiles: value at rank ⌈q·n⌉, ties and odd sizes handled exactly") {
    val s = spark
    import s.implicits._
    // group g: 1..10 → p50 = 5, p90 = 9, p100 = 10; group h has ties
    val df = ((1 to 10).map(v => ("g", v.toLong)) ++
      Seq(("h", 3L), ("h", 3L), ("h", 7L))).toDF("grp", "v")
    val got = graft.operators.StatsRollup.exactQuantiles(df, "grp", "v",
        Seq("p50" -> 0.5, "p90" -> 0.9, "p100" -> 1.0))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got("g") == ((5L, 9L, 10L)))
    // h sorted: 3,3,7 → rank ⌈1.5⌉=2 → 3; ⌈2.7⌉=3 → 7; ⌈3⌉=3 → 7
    assert(got("h") == ((3L, 7L, 7L)))
  }

  test("approxQuantiles tracks the exact twin on the documents fixture") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exact = toMap(graft.operators.StatsRollup.exactQuantiles(
      docs, "lang", "n_chars", qs))
    val approx = toMap(graft.operators.StatsRollup.approxQuantiles(
      docs, "lang", "n_chars", qs))
    assert(exact.keySet == approx.keySet)
    // at accuracy 10000 on ≤ 500-row groups the sketch is near-exact;
    // allow one rank of slack via a 5% relative band
    exact.foreach { case (lang, (e50, e90, e99)) =>
      val (a50, a90, a99) = approx(lang)
      def close(e: Long, a: Long) =
        math.abs(e - a) <= math.max(1L, (e * 0.05).toLong)
      assert(close(e50, a50) && close(e90, a90) && close(e99, a99),
        s"$lang: exact=($e50,$e90,$e99) approx=($a50,$a90,$a99)")
    }
  }
}
