package graft.ml

import graft.model.Outlier
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series outlier detection ensemble — the reference's M2 operator
  * (`storm/.../OutlierDetectionBolt.java:60-181`): per filter, take the
  * trailing 24 h of the stats series at 300 s resolution, drop the
  * (still-filling) newest bucket, require ≥ 10 points, run an analyzer
  * ensemble over it, and emit `(filter_id, ts, score, details)` for
  * buckets a majority of analyzers flag.
  *
  * Analyzers are fresh implementations of the standard techniques the
  * reference lists by name (normal/log-normal deviation, moving
  * average, linear-regression residuals, exponential smoothing).
  * Each scores only the NEWEST evaluated bucket (the reference checks
  * "is the current behavior anomalous", not history rewriting).
  */
object Outliers {

  /** One analyzer: given the historical series (bucket asc) and the
    * evaluation point, return an anomaly score in [0, 1], or
    * `Double.NaN` to abstain (abstaining analyzers are excluded from
    * the ensemble average instead of diluting it).
    */
  trait TimeseriesAnalyzer extends Serializable {
    def name: String
    /** @param history (bucket, value) points strictly before `at`
      * @param value   the value at the evaluated bucket
      */
    def score(history: Seq[(Long, Double)], value: Double): Double
  }

  private def clamp01(x: Double): Double = math.max(0.0, math.min(1.0, x))

  /** Deviation from the sample mean in σ units, scaled so 2σ→0.5, 4σ→1. */
  final class NormalDeviation extends TimeseriesAnalyzer {
    val name = "normal"
    def score(history: Seq[(Long, Double)], value: Double): Double = {
      val xs = history.map(_._2)
      val mu = xs.sum / xs.size
      val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / math.max(1, xs.size - 1))
      if (sd == 0) { if (value == mu) 0.0 else 1.0 }
      else clamp01(math.abs(value - mu) / sd / 4.0)
    }
  }

  /** NormalDeviation in log1p space (counts are right-skewed). */
  final class LogNormalDeviation extends TimeseriesAnalyzer {
    val name = "lognormal"
    private val inner = new NormalDeviation
    def score(history: Seq[(Long, Double)], value: Double): Double =
      inner.score(history.map { case (b, v) => (b, math.log1p(math.max(0, v))) },
        math.log1p(math.max(0, value)))
  }

  /** Residual vs the trailing-k moving average, in σ units of the
    * moving-average residuals.
    */
  final class MovingAverage(k: Int = 6) extends TimeseriesAnalyzer {
    val name = s"moving_avg_$k"
    def score(history: Seq[(Long, Double)], value: Double): Double = {
      val xs = history.map(_._2)
      if (xs.size < k) return 0.0
      val ma = xs.takeRight(k).sum / k
      val resids = xs.sliding(k + 1).collect {
        case w if w.size == k + 1 => w.last - w.init.sum / k
      }.toSeq
      if (resids.isEmpty) return 0.0
      val sd = math.sqrt(resids.map(r => r * r).sum / resids.size)
      if (sd == 0) { if (value == ma) 0.0 else 1.0 }
      else clamp01(math.abs(value - ma) / sd / 4.0)
    }
  }

  /** Least-squares linear fit over history; score = prediction residual
    * in σ units of the fit residuals.
    */
  final class LinearRegression extends TimeseriesAnalyzer {
    val name = "linear_regression"
    def score(history: Seq[(Long, Double)], value: Double): Double = {
      val n = history.size
      if (n < 3) return 0.0
      val xs = history.map(_._1.toDouble)
      val ys = history.map(_._2)
      val mx = xs.sum / n; val my = ys.sum / n
      val sxx = xs.map(x => (x - mx) * (x - mx)).sum
      if (sxx == 0) return 0.0
      val slope = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / sxx
      val icept = my - slope * mx
      val resids = xs.zip(ys).map { case (x, y) => y - (slope * x + icept) }
      val sd = math.sqrt(resids.map(r => r * r).sum / n)
      val atX = history.last._1.toDouble + (history.last._1 - history.head._1).toDouble / math.max(1, n - 1)
      val predicted = slope * atX + icept
      if (sd == 0) { if (value == predicted) 0.0 else 1.0 }
      else clamp01(math.abs(value - predicted) / sd / 4.0)
    }
  }

  /** Simple exponential smoothing (α) one-step forecast residual. */
  final class ExponentialSmoothing(alpha: Double = 0.3) extends TimeseriesAnalyzer {
    val name = "exp_smoothing"
    def score(history: Seq[(Long, Double)], value: Double): Double = {
      val xs = history.map(_._2)
      if (xs.size < 3) return 0.0
      var level = xs.head
      var sumSq = 0.0; var n = 0
      xs.tail.foreach { x =>
        sumSq += (x - level) * (x - level); n += 1
        level = alpha * x + (1 - alpha) * level
      }
      val sd = math.sqrt(sumSq / math.max(1, n))
      if (sd == 0) { if (value == level) 0.0 else 1.0 }
      else clamp01(math.abs(value - level) / sd / 4.0)
    }
  }

  /** Random-walk model: the forecast is the last observed value;
    * score = step residual in σ units of the historical steps
    * (reference lists RandomWalkRegression in its ensemble).
    */
  final class RandomWalk extends TimeseriesAnalyzer {
    val name = "random_walk"
    def score(history: Seq[(Long, Double)], value: Double): Double = {
      val xs = history.map(_._2)
      if (xs.size < 3) return 0.0
      val steps = xs.sliding(2).map(w => w(1) - w(0)).toSeq
      val sd = math.sqrt(steps.map(s => s * s).sum / steps.size)
      val resid = value - xs.last
      if (sd == 0) { if (resid == 0) 0.0 else 1.0 }
      else clamp01(math.abs(resid) / sd / 4.0)
    }
  }

  /** Time-bucket (seasonal) deviation: compare the value against
    * history points in the SAME bucket-of-period (e.g. same
    * time-of-day), in σ units of that sub-series — catches "normal at
    * noon, anomalous at 3am" patterns (reference's
    * TimeBucketSimpleRegression shape).
    */
  final class TimeBucketDeviation(periodSec: Long = 86400,
      bucketSec: Long = 3600) extends TimeseriesAnalyzer {
    val name = s"time_bucket_${periodSec}_$bucketSec"
    def score(history: Seq[(Long, Double)], value: Double): Double = {
      if (history.size < 6) return 0.0
      // the evaluated point's bucket = one step after the last history point
      val step = if (history.size >= 2)
        history.last._1 - history(history.size - 2)._1 else bucketSec
      val evalBucket = ((history.last._1 + step) % periodSec) / bucketSec
      val same = history.filter { case (b, _) => (b % periodSec) / bucketSec == evalBucket }
        .map(_._2)
      if (same.size < 3) return 0.0
      val mu = same.sum / same.size
      val sd = math.sqrt(same.map(x => (x - mu) * (x - mu)).sum /
        math.max(1, same.size - 1))
      if (sd == 0) { if (value == mu) 0.0 else 1.0 }
      else clamp01(math.abs(value - mu) / sd / 4.0)
    }
  }

  /** Always abstains — the ensemble's control analyzer (reference lists
    * a Noop analyzer first in `OutlierDetectionBolt.java:62`).
    */
  final class Noop extends TimeseriesAnalyzer {
    val name = "noop"
    def score(history: Seq[(Long, Double)], value: Double): Double = Double.NaN
  }

  /** Least-squares polynomial fit (degree 2) over history; score =
    * one-step-ahead prediction residual in σ units of the fit
    * residuals (reference's PolynomialRegression shape).
    */
  final class PolynomialRegression(degree: Int = 2) extends TimeseriesAnalyzer {
    val name = s"poly_regression_$degree"
    def score(history: Seq[(Long, Double)], value: Double): Double = {
      val n = history.size
      if (n < degree + 2) return Double.NaN
      val t0 = history.head._1.toDouble
      val span = math.max(1.0, (history.last._1 - history.head._1).toDouble)
      // normalize t to [0,1] so the normal equations stay conditioned
      val xs = history.map(h => (h._1 - t0) / span)
      val ys = history.map(_._2)
      val coefs = Outliers.polyFit(xs, ys, degree).getOrElse(return Double.NaN)
      def predict(x: Double): Double =
        coefs.zipWithIndex.map { case (c, p) => c * math.pow(x, p) }.sum
      val resids = xs.zip(ys).map { case (x, y) => y - predict(x) }
      val sd = math.sqrt(resids.map(r => r * r).sum / n)
      val step = span / math.max(1, n - 1)
      val predicted = predict(1.0 + step / span)
      if (sd == 0) { if (value == predicted) 0.0 else 1.0 }
      else clamp01(math.abs(value - predicted) / sd / 4.0)
    }
  }

  /** Interval band: the historical [min, max] range widened by a
    * margin; in-band values score 0, outside scores grow with the
    * excursion relative to the band width (reference's
    * IntervalInterceptor shape).
    */
  final class IntervalBand(margin: Double = 0.1) extends TimeseriesAnalyzer {
    val name = "interval"
    def score(history: Seq[(Long, Double)], value: Double): Double = {
      if (history.size < 5) return Double.NaN
      val xs = history.map(_._2)
      val lo = xs.min; val hi = xs.max
      val width = math.max(hi - lo, 1e-9)
      val bandLo = lo - margin * width
      val bandHi = hi + margin * width
      if (value >= bandLo && value <= bandHi) 0.0
      else {
        val excess = if (value > bandHi) value - bandHi else bandLo - value
        clamp01(excess / width)
      }
    }
  }

  /** One-class novelty detection: distance from the value to its
    * nearest historical observation, normalized by the history's
    * dispersion — a 1-D stand-in for the reference's OneClassSVM
    * (support of the training set = the observed values; novelty =
    * distance from that support).
    */
  final class OneClassNovelty extends TimeseriesAnalyzer {
    val name = "one_class"
    def score(history: Seq[(Long, Double)], value: Double): Double = {
      if (history.size < 5) return Double.NaN
      val xs = history.map(_._2)
      val mu = xs.sum / xs.size
      val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum /
        math.max(1, xs.size - 1))
      val dNearest = xs.map(x => math.abs(value - x)).min
      if (sd == 0) { if (dNearest == 0) 0.0 else 1.0 }
      else clamp01(dNearest / sd / 2.0)
    }
  }

  /** Multiple linear regression on [t, sin(2πt/day), cos(2πt/day)] —
    * trend plus daily seasonality; score = prediction residual in σ
    * units (reference's MultipleLinearRegression shape).
    */
  final class MultipleRegression(periodSec: Double = 86400.0)
      extends TimeseriesAnalyzer {
    val name = "multiple_regression"
    private def features(t: Double, t0: Double, span: Double): Array[Double] =
      Array(1.0, (t - t0) / span,
        math.sin(2 * math.Pi * t / periodSec),
        math.cos(2 * math.Pi * t / periodSec))
    def score(history: Seq[(Long, Double)], value: Double): Double = {
      val n = history.size
      if (n < 8) return Double.NaN
      val t0 = history.head._1.toDouble
      val span = math.max(1.0, (history.last._1 - history.head._1).toDouble)
      val rows = history.map(h => features(h._1.toDouble, t0, span))
      val ys = history.map(_._2)
      val beta = Outliers.leastSquares(rows, ys).getOrElse(return Double.NaN)
      def predict(f: Array[Double]): Double =
        f.zip(beta).map { case (a, b) => a * b }.sum
      val resids = rows.zip(ys).map { case (f, y) => y - predict(f) }
      val sd = math.sqrt(resids.map(r => r * r).sum / n)
      val step = span / math.max(1, n - 1)
      val predicted = predict(features(history.last._1 + step, t0, span))
      if (sd == 0) { if (value == predicted) 0.0 else 1.0 }
      else clamp01(math.abs(value - predicted) / sd / 4.0)
    }
  }

  /** Polynomial least squares via the normal equations; None when the
    * system is singular. Coefficients ascending by power.
    */
  private[graft] def polyFit(xs: Seq[Double], ys: Seq[Double],
      degree: Int): Option[Array[Double]] =
    leastSquares(xs.map(x => Array.tabulate(degree + 1)(p => math.pow(x, p))), ys)

  /** Solve min ‖Xβ − y‖² via XᵀX β = Xᵀy with Gaussian elimination
    * (partial pivoting). None when singular. Feature counts here are
    * tiny (≤ 4), history ≤ 288 points — driver-free, per-group cost.
    */
  private[graft] def leastSquares(rows: Seq[Array[Double]],
      ys: Seq[Double]): Option[Array[Double]] = {
    val k = rows.head.length
    val a = Array.ofDim[Double](k, k + 1)
    rows.zip(ys).foreach { case (f, y) =>
      var i = 0
      while (i < k) {
        var j = 0
        while (j < k) { a(i)(j) += f(i) * f(j); j += 1 }
        a(i)(k) += f(i) * y
        i += 1
      }
    }
    var col = 0
    while (col < k) {
      var p = col
      var r = col + 1
      while (r < k) { if (math.abs(a(r)(col)) > math.abs(a(p)(col))) p = r; r += 1 }
      if (math.abs(a(p)(col)) < 1e-12) return None
      val tmp = a(col); a(col) = a(p); a(p) = tmp
      r = 0
      while (r < k) {
        if (r != col) {
          val f = a(r)(col) / a(col)(col)
          var j = col
          while (j <= k) { a(r)(j) -= f * a(col)(j); j += 1 }
        }
        r += 1
      }
      col += 1
    }
    Some(Array.tabulate(k)(i => a(i)(k) / a(i)(i)))
  }

  /** The reference's full 12-analyzer ensemble surface
    * (`OutlierDetectionBolt.java:62-73`), re-derived: Noop,
    * normal/log-normal deviation, simple/polynomial/multiple
    * regression, moving average, interval band, random walk, one-class
    * novelty, time-bucket seasonality, exponential smoothing.
    */
  def defaultEnsemble: Seq[TimeseriesAnalyzer] = Seq(
    new Noop, new NormalDeviation, new LogNormalDeviation,
    new MovingAverage(6), new LinearRegression,
    new PolynomialRegression(2), new IntervalBand(0.1),
    new RandomWalk, new OneClassNovelty, new TimeBucketDeviation(),
    new MultipleRegression(), new ExponentialSmoothing(0.3))

  /** Distributed robust outlier flagging over a bucketed count series:
    * flag buckets whose |cnt − median| exceeds `k`× the median absolute
    * deviation. The DataFrame face of the ensemble's robust analyzers —
    * and, unlike the float ensemble, ENGINE-EXACT: medians of integer
    * counts land on the .5 grid (middle-pair average), deviations on
    * the .25 grid — all exactly representable doubles, so any SQL
    * engine flags the identical bucket set (the property q_outlier_mad
    * hash-checks). Two tiny aggregates broadcast back as scalars; the
    * series itself never shuffles.
    */
  def madOutliers(series: DataFrame, bucketCol: String, cntCol: String,
      k: Double = 3.0): DataFrame = {
    // The median/MAD/filter branches each re-derive their input, which
    // would re-run the upstream rollup (a corpus scan) four times —
    // checkpoint the bucket-level series (tiny: one row per bucket) so
    // the corpus is scanned once. Blocks are released by the
    // GraftSession.releaseCachedBlocks sweep like the other eager sites.
    val s = series.select(col(bucketCol), col(cntCol)).localCheckpoint(true)
    val med = s.agg(expr(s"percentile($cntCol, 0.5)").as("med"))
    val withDev = s.crossJoin(broadcast(med))
      .withColumn("dev", abs(col(cntCol) - col("med")))
    val mad = withDev.agg(expr("percentile(dev, 0.5)").as("mad"))
    withDev.crossJoin(broadcast(mad))
      .filter(col("dev") > lit(k) * col("mad"))
      .select(col(bucketCol), col(cntCol), col("med"), col("mad"))
  }

  final case class Config(
      resolutionSec: Long = 300,  // OutlierDetectionBolt.java:137
      windowSec: Long = 86400,    // :139
      minPoints: Int = 10,        // :160
      scoreThreshold: Double = 0.5,
      skipNewest: Boolean = true) // :140-141

  /** Series prep shared by [[detect]] and [[voteScores]]: re-bucket to
    * resolution, apply the trailing window, drop the still-filling
    * newest bucket, enforce minPoints; yields the evaluation point and
    * its strict history, or None when the series is too short.
    */
  private def evalPoint(raw: IndexedSeq[(String, Long, Double)],
      cfg: Config): Option[(Long, Double, IndexedSeq[(Long, Double)])] = {
    val maxB = raw.map(_._2).max
    val series = raw
      .filter { case (_, b, _) => b > maxB - cfg.windowSec }
      .groupBy { case (_, b, _) => b - b % cfg.resolutionSec }
      .map { case (b, rows) => (b, rows.map(_._3).sum) }
      .toIndexedSeq.sortBy(_._1)
    val trimmed = if (cfg.skipNewest && series.size > 1) series.init else series
    if (trimmed.size < cfg.minPoints) None
    else {
      val (evalBucket, evalValue) = trimmed.last
      Some((evalBucket, evalValue, trimmed.init))
    }
  }

  /** Detect outliers over a stats table (filter_id, bucket, count).
    * One shuffle on filter_id; per-filter series are bounded
    * (windowSec / resolutionSec points ≤ 288) so group memory is O(1).
    * Evaluates the newest retained bucket of each filter's series.
    */
  def detect(stats: DataFrame, cfg: Config = Config(),
      analyzers: Seq[TimeseriesAnalyzer] = defaultEnsemble)(
      implicit spark: SparkSession): Dataset[Outlier] = {
    import spark.implicits._
    stats.select(
        col("filter_id").cast("string"),
        col("bucket").cast("long"),
        col("count").cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (fid, it) =>
        evalPoint(it.toIndexedSeq, cfg) match {
          case None => Iterator.empty
          case Some((evalBucket, evalValue, history)) =>
          val scores = analyzers.map(a => a.name -> a.score(history, evalValue))
          val voting = scores.filterNot(_._2.isNaN)
          val avg = if (voting.isEmpty) 0.0
            else voting.map(_._2).sum / voting.size
          if (avg < cfg.scoreThreshold) Iterator.empty
          else {
            // abstaining analyzers render as null, not a fake 0 score
            val details = scores.map { case (n, sc) =>
              val v = if (sc.isNaN) "null"
                else "%.4f".formatLocal(java.util.Locale.ROOT, sc)
              s""""$n":$v""" }
              .mkString("{", ",", "}")
            Iterator.single(Outlier(fid, evalBucket, avg, details))
          }
        }
      }
  }

  /** The ensemble members whose scores an external SQL engine can
    * replay bit-stably: each is built from exact integer aggregates
    * (sums, min/max, lagged differences of counts) followed by
    * single-rounding IEEE divisions, so a 4-decimal rounding absorbs
    * the only order-sensitive step (the float sum of squared
    * residuals). The solver-dependent members (polynomial / multiple
    * regression via Gaussian elimination, seasonal bucketing,
    * smoothing recursions) are deliberately excluded — an "oracle"
    * that re-implemented the solver would not be an independent check.
    */
  def deterministicMembers: Seq[TimeseriesAnalyzer] = Seq(
    new NormalDeviation, new IntervalBand(0.1), new RandomWalk,
    new MovingAverage(6))

  /** The ensemble's DECISION surface, hash-checkable: run the same
    * per-filter grouping, windowing, and skip-newest evaluation as
    * [[detect]] over [[deterministicMembers]], emit each member's
    * score rounded to 4 decimals, the member vote count (rounded
    * score ≥ `voteThreshold`), and the majority decision. Votes are
    * compared on the ROUNDED scores so any engine replaying the
    * member formulas reaches the identical flagged set — the
    * ensemble analogue of what q_embed_ivf_q's integer quantization
    * does for IVF.
    *
    * Scale shape is [[detect]]'s: one shuffle on filter_id, bounded
    * per-group series, output = one row per filter.
    */
  def voteScores(stats: DataFrame, cfg: Config = Config(),
      voteThreshold: Double = 0.25, majority: Int = 2)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val members = deterministicMembers
    val scored = stats.select(
        col("filter_id").cast("string"),
        col("bucket").cast("long"),
        col("count").cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (fid, it) =>
        evalPoint(it.toIndexedSeq, cfg) match {
          case None => Iterator.empty
          case Some((evalBucket, evalValue, history)) =>
            // a NaN score is a member ABSTAINING (detect() filters
            // them out of its average); map it to 0.0 — Spark orders
            // NaN above every number, so a raw NaN would count as an
            // automatic vote AND diverge from any SQL replay of the
            // member formulas. Only reachable with minPoints below a
            // member's own history need (e.g. IntervalBand under 5).
            val s = members.map(_.score(history, evalValue))
              .map(v => if (v.isNaN) 0.0 else v)
            Iterator.single(graft.model.MemberScores(fid, evalBucket,
              s(0), s(1), s(2), s(3)))
        }
      }.toDF()
    val cols = Seq("s_normal", "s_interval", "s_random_walk", "s_moving_avg")
    val rounded = cols.foldLeft(scored)((d, c) => d.withColumn(c, round(col(c), 4)))
    val votes = cols.map(c => when(col(c) >= voteThreshold, 1).otherwise(0))
      .reduce(_ + _)
    rounded.withColumn("votes", votes)
      .withColumn("is_outlier",
        when(col("votes") >= majority, 1).otherwise(0))
  }
}
