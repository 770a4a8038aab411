package graft.operators

import graft.functions.LogFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Time-series rollup + display re-rollup + zero gap-fill — the
  * reference's stats path (secondly partial `RollupStatsBolt.java:79-99`,
  * minutely store `SupervisorStatsWriterBolt.java:124-146`, client
  * re-rollup/window/gap-fill `cli/supervisorcon.go:43-119`).
  *
  * In Spark the partial→final split is automatic (HashAggregate partial
  * on the map side), so one declarative `groupBy` replaces the
  * reference's three-hop merge. Gap-fill is `sequence`+`explode` over
  * the (tiny) bucket range cross-joined with the (tiny) key set — both
  * sides are broadcast-sized regardless of input scale, so the only
  * full-data pass is the aggregation itself.
  */
object StatsRollup {

  /** Tumbling-window counts: one row per (keys..., bucket_start).
    * `bucket = ts - ts % step` in epoch seconds — the intended
    * seconds-based semantics (SURVEY.md §1.1 units caveat).
    */
  def rollup(df: DataFrame, tsCol: String, stepSec: Long,
      keyCols: Seq[String], countCol: String = "cnt"): DataFrame = {
    val keys = keyCols.map(col) :+
      LogFunctions.bucket(col(tsCol), stepSec).as("bucket_start")
    df.groupBy(keys: _*).agg(count(lit(1)).as(countCol))
  }

  /** Keep only rows within the trailing window `[now - windowSec, now]`
    * — reference `cli/supervisorcon.go:59-83` (default window 86400 s).
    * `now` is passed explicitly for determinism.
    */
  def windowFilter(df: DataFrame, tsCol: String, windowSec: Long,
      nowEpochSec: Long): DataFrame =
    df.filter(unix_timestamp(col(tsCol)) >= lit(nowEpochSec - windowSec))

  /** Re-rollup an already-bucketed series to a coarser step and sum —
    * reference `cli/supervisorcon.go:86-100`.
    */
  def rerollup(stats: DataFrame, bucketCol: String, countCol: String,
      stepSec: Long, keyCols: Seq[String]): DataFrame = {
    val newBucket = (floor(col(bucketCol) / stepSec) * stepSec)
      .cast(LongType).as(bucketCol)
    stats.groupBy(keyCols.map(col) :+ newBucket: _*)
      .agg(sum(col(countCol)).as(countCol))
  }

  /** Zero-fill missing buckets between the global min and max bucket at
    * step `stepSec`, per key — reference `cli/supervisorcon.go:103-114`.
    *
    * The series and key relations are derived aggregates (a handful of
    * rows); Catalyst broadcasts them, so gap-fill adds no shuffle over
    * the stats table beyond one broadcast hash join.
    */
  def gapFill(stats: DataFrame, keyCols: Seq[String],
      bucketCol: String = "bucket_start", countCol: String = "cnt",
      stepSec: Long): DataFrame = {
    // bounds, keys, and the final join each re-derive `stats` — for a
    // rolled-up series that means re-running the upstream corpus scan
    // three times. Checkpoint the bucket-level series (tiny) so the
    // corpus is scanned once. (Streaming frames can't checkpoint; the
    // streaming pipeline has its own gap-fill-free stats path.)
    val statsOnce =
      if (stats.isStreaming) stats else stats.localCheckpoint(true)
    val bounds = statsOnce.agg(
      min(col(bucketCol)).as("lo"), max(col(bucketCol)).as("hi"))
    val series = bounds.select(
      explode(sequence(col("lo"), col("hi"), lit(stepSec))).as(bucketCol))
    val keys = statsOnce.select(keyCols.map(col): _*).distinct()
    val grid = keys.crossJoin(broadcast(series))
    grid.join(statsOnce, keyCols :+ bucketCol, "left")
      .withColumn(countCol, coalesce(col(countCol), lit(0L)))
      .select((keyCols :+ bucketCol :+ countCol).map(col): _*)
  }

  /** Full `stats <filter> [window W] [rollup R]` pipeline: window →
    * bucket → count → gap-fill (reference `cli/supervisorcon.go:43-119`;
    * defaults W=86400, R=60 per `cli/cloudpelican-lsd.go:794-798`).
    */
  def statsQuery(events: DataFrame, tsCol: String, keyCols: Seq[String],
      windowSec: Long = 86400, stepSec: Long = 60,
      nowEpochSec: Long): DataFrame = {
    val windowed = windowFilter(events, tsCol, windowSec, nowEpochSec)
    val rolled = rollup(windowed, tsCol, stepSec, keyCols)
    gapFill(rolled, keyCols, "bucket_start", "cnt", stepSec)
  }

  /** Pearson correlation between every pair of filters' count series —
    * "which alerts co-move": the series-similarity companion to the
    * outlier ensemble (a correlated pair firing together is one
    * incident, not two). Input is a stats table (filter_id, bucket,
    * count); output one row per unordered filter pair with ≥
    * `minOverlap` shared buckets.
    *
    * Engine-exact: every moment (n, Σx, Σy, Σxy, Σx², Σy²) is an exact
    * BIGINT aggregate of integer counts; the single double expression
    * assembling r is written with explicit association, so any SQL
    * engine reproduces the 6-decimal value bit-for-bit. Degenerate
    * (constant) series correlate as 0.
    *
    * Scale: one self-join on bucket — per-bucket fan-out is bounded by
    * the FILTER CATALOG squared (the [[graft.operators.Decontaminate]]
    * sourceOverlap contract), never by the corpus; the pair aggregate
    * is map-side combinable.
    */
  def seriesCorrelation(stats: DataFrame, minOverlap: Int = 10)
      : DataFrame = {
    val a = stats.select(col("filter_id").cast("string").as("filter_a"),
      col("bucket").cast("long").as("bucket"),
      col("count").cast("long").as("xa"))
    val b = stats.select(col("filter_id").cast("string").as("filter_b"),
      col("bucket").cast("long").as("bucket"),
      col("count").cast("long").as("xb"))
    val m = a.join(b, Seq("bucket"))
      .filter(col("filter_a") < col("filter_b"))
      .groupBy("filter_a", "filter_b")
      .agg(count(lit(1)).as("n"),
        sum(col("xa")).as("sx"), sum(col("xb")).as("sy"),
        sum(col("xa") * col("xb")).as("sxy"),
        sum(col("xa") * col("xa")).as("sxx"),
        sum(col("xb") * col("xb")).as("syy"))
      .filter(col("n") >= minOverlap)
    // moments cast to double BEFORE combining: Spark longs would wrap
    // where DuckDB widens to int128, so the portable contract is IEEE
    // doubles over exact integer-valued sums (bit-equal below 2⁵³,
    // identically-rounded beyond)
    def d(c: String) = col(c).cast("double")
    val cov = d("n") * d("sxy") - d("sx") * d("sy")
    val vx = d("n") * d("sxx") - d("sx") * d("sx")
    val vy = d("n") * d("syy") - d("sy") * d("sy")
    m.withColumn("corr",
        when(vx === 0.0 || vy === 0.0, lit(0.0))
          .otherwise(round(cov / (sqrt(vx) * sqrt(vy)), 6)))
      .select(col("filter_a"), col("filter_b"), col("n"), col("corr"))
  }

  /** EXACT per-group quantiles (type-1 / lower discrete: the value at
    * rank ⌈q·n⌉ of the ascending sort) — the distribution profile a
    * curation report reads off a corpus: median / p90 / p99 document
    * length per language, token counts per source, etc.
    *
    * Deterministic by construction: ranks come from one window sort
    * per group and only the VALUE at the target rank is emitted, so
    * ties between equal values cannot change the answer; ⌈q·n⌉ is
    * IEEE-double arithmetic both engines evaluate identically.
    *
    * Scale: the window sorts WITHIN each group after a hash shuffle
    * on the group key — per-partition memory is the largest group,
    * the correct exact-quantile cost. For corpus-wide percentiles at
    * 100 TB reach for [[approxQuantiles]] (mergeable sketch, no
    * per-group sort) and keep this as its audit twin on samples.
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0 && q <= 1 },
      s"quantile fractions must be in (0, 1], got $qs")
    val byGroup = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
    val ranked = df.select(col(groupCol), col(valueCol))
      .withColumn("_rn", row_number().over(byGroup.orderBy(col(valueCol))))
      .withColumn("_n", count(lit(1)).over(byGroup))
    val picks = qs.map { case (name, q) =>
      max(when(col("_rn") === ceil(lit(q) * col("_n")), col(valueCol)))
        .as(name)
    }
    ranked.groupBy(groupCol).agg(picks.head, picks.tail: _*)
  }

  /** Mergeable approximate quantiles ([[functions.percentile_approx]]
    * — Greenwald-Khanna sketch, one combinable aggregate, no per-group
    * sort): the 100 TB path [[exactQuantiles]] audits on samples.
    * `accuracy` trades sketch size for error (1/accuracy relative
    * rank error). Approximate by nature → spec-gated against the
    * exact twin, not oracle-hashed.
    */
  def approxQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(String, Double)], accuracy: Int = 10000): DataFrame = {
    val picks = qs.map { case (name, q) =>
      percentile_approx(col(valueCol), lit(q), lit(accuracy)).as(name)
    }
    df.groupBy(groupCol).agg(picks.head, picks.tail: _*)
  }
}
