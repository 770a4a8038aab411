package graft

import graft.ml.Outliers

class OutlierSpec extends SparkSpec {

  private def series(values: Seq[Double], step: Long = 300): Seq[(String, Long, Double)] =
    values.zipWithIndex.map { case (v, i) => ("f1", 1700000000L + i * step, v) }

  test("flat series with a spike at the end is flagged") {
    implicit val s = spark
    import s.implicits._
    val flat = series(Seq.fill(30)(10.0) :+ 100.0 :+ 10.0) // spike in evaluated bucket (newest dropped)
    val stats = flat.toDF("filter_id", "bucket", "count")
    val got = Outliers.detect(stats,
      Outliers.Config(scoreThreshold = 0.4)).collect()
    assert(got.length == 1)
    assert(got.head.filter_id == "f1")
    assert(got.head.score > 0.4)
    assert(got.head.details.contains("normal"))
  }

  test("flat series without anomaly emits nothing") {
    implicit val s = spark
    import s.implicits._
    val stats = series(Seq.fill(32)(10.0)).toDF("filter_id", "bucket", "count")
    assert(Outliers.detect(stats, Outliers.Config(scoreThreshold = 0.4)).isEmpty)
  }

  test("voteScores: spike wins a member majority, flat series gets zero votes") {
    implicit val s = spark
    import s.implicits._
    val spike = series(Seq.fill(30)(10.0) :+ 100.0 :+ 10.0)
      .toDF("filter_id", "bucket", "count")
    val flagged = Outliers.voteScores(spike).collect()
    assert(flagged.length == 1)
    val row = flagged.head
    assert(row.getAs[Int]("votes") >= 2 && row.getAs[Int]("is_outlier") == 1)
    // every member score is already rounded to the 4-decimal grid
    Seq("s_normal", "s_interval", "s_random_walk", "s_moving_avg").foreach { c =>
      val v = row.getAs[Double](c)
      assert(math.abs(v * 10000 - math.round(v * 10000)) < 1e-9, c)
    }

    val flat = series(Seq.fill(32)(10.0)).toDF("filter_id", "bucket", "count")
    val calm = Outliers.voteScores(flat).collect()
    assert(calm.length == 1)
    assert(calm.head.getAs[Int]("votes") == 0 &&
      calm.head.getAs[Int]("is_outlier") == 0)

    // min-points gate carries over from detect's shared series prep
    val short = series(Seq.fill(5)(10.0) :+ 99.0)
      .toDF("filter_id", "bucket", "count")
    assert(Outliers.voteScores(short).isEmpty)
  }

  test("min-points gate: short series emits nothing (OutlierDetectionBolt.java:159-162)") {
    implicit val s = spark
    import s.implicits._
    val stats = series(Seq.fill(5)(10.0) :+ 99.0).toDF("filter_id", "bucket", "count")
    assert(Outliers.detect(stats, Outliers.Config(scoreThreshold = 0.1)).isEmpty)
  }

  test("individual analyzers score spikes higher than normal points") {
    val hist = (0 until 30).map(i => (1700000000L + i * 300L, 10.0 + (i % 3)))
    var voting = 0
    Outliers.defaultEnsemble.foreach { a =>
      val spikeScore = a.score(hist, 80.0)
      val normalScore = a.score(hist, 11.0)
      if (!spikeScore.isNaN || !normalScore.isNaN) {
        voting += 1
        assert(spikeScore > normalScore,
          s"${a.name}: spike $spikeScore !> normal $normalScore")
      }
    }
    // everything except the always-abstaining Noop must vote here
    assert(voting == Outliers.defaultEnsemble.size - 1)
  }

  test("madOutliers flags exactly the buckets beyond k MADs (driver-side reference)") {
    val s = spark
    import s.implicits._
    val series = Seq(
      (0L, 10L), (1L, 11L), (2L, 9L), (3L, 10L), (4L, 12L),
      (5L, 10L), (6L, 50L), (7L, 11L), (8L, 9L), (9L, 2L))
      .toDF("bucket_start", "cnt")
    val got = Outliers.madOutliers(series, "bucket_start", "cnt", k = 3.0)
      .select("bucket_start").as[Long].collect().toSet
    // reference: sorted cnts median, deviations, MAD
    val cnts = Seq(10L, 11L, 9L, 10L, 12L, 10L, 50L, 11L, 9L, 2L)
    def median(xs: Seq[Double]): Double = {
      val s0 = xs.sorted
      if (s0.size % 2 == 1) s0(s0.size / 2)
      else (s0(s0.size / 2 - 1) + s0(s0.size / 2)) / 2.0
    }
    val med = median(cnts.map(_.toDouble))
    val mad = median(cnts.map(c => math.abs(c - med)))
    val expect = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L)
      .zip(cnts).filter { case (_, c) => math.abs(c - med) > 3.0 * mad }
      .map(_._1).toSet
    assert(got == expect)
    assert(got.contains(6L)) // the 50-spike must be flagged
  }

  test("polyFit recovers an exact quadratic, leastSquares an exact plane") {
    val xs = (0 until 10).map(_.toDouble)
    val ys = xs.map(x => 2.0 + 3.0 * x - 0.5 * x * x)
    val c = Outliers.polyFit(xs, ys, 2).get
    assert(math.abs(c(0) - 2.0) < 1e-8)
    assert(math.abs(c(1) - 3.0) < 1e-8)
    assert(math.abs(c(2) + 0.5) < 1e-8)
    val rows = (0 until 12).map(i => Array(1.0, i.toDouble, (i % 4).toDouble))
    val beta0 = Array(5.0, -1.5, 2.0)
    val ys2 = rows.map(f => f.zip(beta0).map { case (a, b) => a * b }.sum)
    val beta = Outliers.leastSquares(rows, ys2).get
    beta0.zip(beta).foreach { case (e, g) => assert(math.abs(e - g) < 1e-8) }
    // singular system abstains rather than exploding
    assert(Outliers.leastSquares(Seq(Array(1.0, 2.0), Array(2.0, 4.0)), Seq(1.0, 2.0)).isEmpty)
  }
}
