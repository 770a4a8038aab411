package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join/window operators beyond the reference's surface
  * (builder brief: operators Spark lacks, built by composition first —
  * preference (a) in the custom-operator ladder).
  */
object Temporal {

  /** As-of (most-recent-prior) join: for every left row, attach the
    * columns of the latest right row with the same keys and
    * `right.ts <= left.ts`. Nulls when no prior right row exists.
    *
    * Built as union → single window pass (`last(_, ignoreNulls)` over
    * an unbounded-preceding frame), NOT a range join: one shuffle on
    * the keys, linear scan per partition — survives 100 TB where a
    * range/theta join would quadratically explode. Right rows sort
    * before left rows on ts ties, so an exactly-simultaneous right row
    * is visible to the left row (ASOF `>=` semantics).
    *
    * @param rightCols right columns to carry (renamed as given)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightCols: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val marked = "_is_left"
    val carry = "_carry"
    val outs = rightCols.values.toSeq.sorted
    val l = rightCols.values.foldLeft(left.withColumn(marked, lit(1))) {
      case (df, out) => df.withColumn(out, lit(null))
    }
    val r0 = right.select(
      (keyCols.map(col) :+ col(tsCol)) ++
        rightCols.map { case (in, out) => col(in).as(out) }.toSeq: _*)
    val r = leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
      .foldLeft(r0.withColumn(marked, lit(0))) {
        case (df, c) => df.withColumn(c, lit(null))
      }
    val unioned = l.select((leftCols ++ rightCols.values :+ marked).map(col): _*)
      .unionByName(r.select((leftCols ++ rightCols.values :+ marked).map(col): _*))
      // Carried columns travel as ONE struct (null on left rows): a
      // single last(ignoreNulls) then attaches exactly one right row
      // atomically — per-column fills could mix values from different
      // right rows when a tied row carries a null field. The struct is
      // also the (keys, ts) tiebreak, so the attached row is
      // deterministic across runs and partitionings.
      .withColumn(carry,
        when(col(marked) === 0, struct(outs.map(col): _*)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(marked), col(carry))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(carry, last(col(carry), ignoreNulls = true).over(w))
      .filter(col(marked) === 1)
      .select(leftCols.map(col) ++
        outs.map(out => col(s"$carry.$out").as(out)): _*)
  }

  /** Session windows: group rows into per-key sessions separated by
    * gaps ≥ `gapSec` (Spark's `session_window` semantics: a session
    * extends while the next event arrives strictly within the gap).
    * Output: keys + session ordinal + per-session aggregates.
    * One shuffle on the keys; session assignment is a prefix-sum
    * window, not a self-join.
    */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
      gapSec: Long, idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(idCol))
    // Fractional-second epoch (cast keeps microsecond precision) so the
    // gap test matches engines that don't truncate to whole seconds.
    val marked = df.withColumn("_gap",
        col(tsCol).cast("double") -
          lag(col(tsCol), 1).over(w).cast("double"))
      .withColumn("_new", when(col("_gap").isNull || col("_gap") >= gapSec, 1)
        .otherwise(0))
      .withColumn("session_seq",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    marked
      .groupBy((keyCols :+ "session_seq").map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(idCol)).as("first_id"),
        max(col(idCol)).as("last_id"))
  }

  /** Range (interval) join — every (point, interval) pair with
    * `start ≤ point ≤ end`, both in epoch seconds — via BIN EQUI-JOIN:
    * points map to `floor(ts / binSec)`, intervals explode to every
    * bin they cover, the sides meet on the bin key, and a residual
    * range filter keeps the true matches. Each matching pair meets in
    * exactly ONE bin (the point's own), so no dedup pass is needed.
    *
    * The point: Spark plans a raw `ON ts BETWEEN start AND end` as a
    * broadcast-nested-loop (small side) or a cartesian (big-big) —
    * O(|points|·|intervals|) either way. Binning turns it into a hash
    * equi-join whose cost is O(points + Σ interval spans / binSec +
    * matches), shuffled on the bin key with AQE skew handling —
    * the big-big-safe shape (PlanQualitySpec gates the nested loop
    * out). Pick `binSec` near the typical interval length: each
    * interval explodes to ~span/binSec rows (one exploded row per
    * covered bin), while an over-wide bin inflates the residual
    * filter's candidate set.
    */
  def rangeJoin(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binSec: Long, maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    require(binSec > 0, s"binSec must be positive: $binSec")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive: $maxBinsPerInterval")
    val p = points.withColumn("_bin",
      floor(col(tsCol) / binSec).cast("long"))
    val startBin = floor(col(startCol) / binSec).cast("long")
    val endBin = floor(col(endCol) / binSec).cast("long")
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      // fail FAST with a named error on a runaway interval (an
      // open-ended sentinel end, a unit mix-up): one such row would
      // otherwise drive sequence() into the array-size limit or an
      // executor OOM and kill the whole join
      .withColumn("_bin", explode(sequence(startBin,
        when(endBin - startBin < maxBinsPerInterval, endBin)
          .otherwise(raise_error(concat(
            lit(s"rangeJoin: interval spans >= $maxBinsPerInterval bins " +
              s"of $binSec s (start="), col(startCol),
            lit(", end="), col(endCol),
            lit("); widen binSec or raise maxBinsPerInterval")))
            .cast("long")))))
    p.join(iv, Seq("_bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bin")
  }
}
