package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over the corpus token stream (Cormode &
  * Muthukrishnan 2005) — the sketch path of frequency estimation that
  * pairs with the exact `TextAnalysis.topTokens` twin.
  *
  * Why a sketch at 100 TB: the exact token-count shuffle carries one
  * partial row per DISTINCT token per partition — web-scale corpora
  * have billions of distinct tokens (typos, ids, urls), so the exact
  * aggregate's shuffle grows with vocabulary. The CMS build explodes
  * each token into `depth` (row, bucket) cells and hash-aggregates;
  * with map-side combine every partition emits AT MOST depth × width
  * partial rows — the shuffle is CONSTANT in vocabulary size, and the
  * merged sketch (depth × width longs) broadcasts anywhere.
  *
  * Everything is engine-exact and replayable: buckets are hex
  * SUBSTRINGS of md5 (width = 16^hexDigits, so "mod width" is string
  * truncation — no bigint/hex conversion that another engine might
  * round differently), counts are BIGINT sums, and the estimate is an
  * integer `min` across depth rows. The classic CMS guarantee holds:
  * est(t) >= true(t) always (every occurrence of t lands in t's cell
  * in every row), and est(t) <= true(t) + eps·N with probability
  * 1 − delta for eps = e/width, delta = e^−depth.
  */
object Sketch {

  /** Bucket of `token` in sketch row `row`: hex chars
    * [row·digits, (row+1)·digits) of md5("c:token") — depth rows are
    * DISJOINT SLICES of one digest (md5's 128 bits fund up to
    * 32/hexDigits rows), so the build hashes each token ONCE instead
    * of once per row; width = 16^hexDigits. Measured on the dyadic
    * build (9 digests/token vs 33): q_hh_dyadic 6.4 s → 2.8 s at
    * sf0.1.
    */
  def cmsBucket(row: Int, token: Column, hexDigits: Int): Column =
    substring(md5(concat(lit("c:"), token)), 1 + row * hexDigits, hexDigits)

  /** Build the sketch: one row per touched (row, bucket) cell with its
    * BIGINT count. Cells never touched are absent (implicitly zero —
    * estimateTokens coalesces). One projection + one bounded hash
    * aggregate; the corpus never shuffles by token.
    */
  def cmsSketch(df: DataFrame, textCol: String, depth: Int,
      hexDigits: Int): DataFrame = {
    require(depth >= 1 && hexDigits >= 1 && depth * hexDigits <= 32,
      s"depth·hexDigits must fit one md5 digest: $depth × $hexDigits")
    val cells = array((0 until depth).map(r =>
      struct(lit(r).as("r"), cmsBucket(r, col("_tok"), hexDigits).as("b"))): _*)
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("_tok"))
      .select(explode(cells).as("_c"))
      .groupBy(col("_c.r").as("r"), col("_c.b").as("b"))
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Point-estimate each candidate token against a built sketch:
    * est = min over rows of the token's cell count. The sketch is
    * depth × width rows at most — broadcast it; candidates stream
    * through without shuffling (the groupBy key is the candidate id,
    * already distinct).
    */
  def estimateTokens(candidates: DataFrame, tokenCol: String,
      sketch: DataFrame, depth: Int, hexDigits: Int): DataFrame = {
    val probes = candidates.select(col(tokenCol).as("token"))
      .withColumn("_c", explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"),
          cmsBucket(r, col("token"), hexDigits).as("b"))): _*)))
      .select(col("token"), col("_c.r").as("r"), col("_c.b").as("b"))
    probes.join(broadcast(sketch), Seq("r", "b"), "left")
      .groupBy(col("token"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Heavy hitters through the sketch: distinct corpus tokens whose
    * CMS estimate reaches `threshold`. The candidate pass is one
    * distinct (the same shuffle class as the exact twin — the sketch's
    * win is point queries and pre-filtering: at scale the distinct
    * runs ONCE and the depth×width sketch then serves any number of
    * threshold/point queries without touching the corpus again).
    * Guarantee: the result is a SUPERSET of the true heavy hitters
    * (no false negatives — est >= true). For enumeration WITHOUT the
    * corpus-wide distinct, see [[dyadicHeavyHitters]].
    */
  def cmsHeavyHitters(df: DataFrame, textCol: String, depth: Int,
      hexDigits: Int, threshold: Long): DataFrame = {
    val sketch = cmsSketch(df, textCol, depth, hexDigits)
    val cand = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .distinct()
    estimateTokens(cand, "token", sketch, depth, hexDigits)
      .filter(col("est") >= threshold)
  }

  /** Number of hex digits of the dyadic token hash (32-bit universe). */
  val DyadicLevels: Int = 8

  /** One CMS per hash-prefix LEVEL, built in a single pass: every
    * token contributes its md5-hash prefixes of length 1..8 hex
    * digits, each sketched from disjoint slices of a per-level digest. Output
    * (lvl, r, b, cnt); at most levels × depth × width cells total.
    */
  def dyadicSketch(df: DataFrame, textCol: String, depth: Int,
      hexDigits: Int): DataFrame = {
    require(depth >= 1 && hexDigits >= 1 && depth * hexDigits <= 32,
      s"depth·hexDigits must fit one md5 digest: $depth × $hexDigits")
    // one digest per (level, token), MATERIALIZED before the cell
    // generator so each is computed exactly once and the depth rows
    // slice it — 9 md5s per token occurrence, not 1 + levels·depth
    // (the round-9 lambda-inlining lesson applied to projections)
    val cells = array((for {
      lvl <- 1 to DyadicLevels; r <- 0 until depth
    } yield struct(lit(lvl).as("lvl"), lit(r).as("r"),
      substring(col(s"_d$lvl"), 1 + r * hexDigits, hexDigits)
        .as("b"))): _*)
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("_tok"))
      .select(substring(md5(col("_tok")), 1, DyadicLevels).as("_h"))
      .select((1 to DyadicLevels).map(lvl =>
        md5(concat_ws(":", lit(lvl), substring(col("_h"), 1, lvl)))
          .as(s"_d$lvl")): _*)
      .select(explode(cells).as("_c"))
      .groupBy(col("_c.lvl").as("lvl"), col("_c.r").as("r"),
        col("_c.b").as("b"))
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Heavy-hitter enumeration with NO corpus-wide distinct — the
    * dyadic/hierarchical scheme (Cormode & Muthukrishnan 2005 §4.2)
    * carried over a 32-bit token-hash universe:
    *
    *  1. one scan builds the per-level prefix sketches
    *     ([[dyadicSketch]] — the shuffle is the bounded cell
    *     relation, NEVER keyed by token);
    *  2. the driver descends the 16-ary prefix tree, expanding only
    *     prefixes whose CMS estimate reaches `threshold` — a prefix's
    *     count is ≥ any token's below it, and CMS never
    *     underestimates, so every true heavy hitter's whole path
    *     survives; survivors per level ≤ 16 · (N/threshold + sketch
    *     error), independent of vocabulary;
    *  3. one more scan exact-counts ONLY tokens whose hash lands in a
    *     surviving leaf (broadcast semi-join — the groupBy now
    *     carries candidate tokens only).
    *
    * Because the final pass is exact, the output EQUALS the true
    * heavy-hitter set — the sketch machinery only prunes, never
    * decides. Driver state: the collected sketches (levels × depth ×
    * width cells) plus the frontier; both corpus-size-independent.
    */
  def dyadicHeavyHitters(df: DataFrame, textCol: String, depth: Int,
      hexDigits: Int, threshold: Long): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1: $threshold")
    val spark = df.sparkSession
    import spark.implicits._
    val cells = dyadicSketch(df, textCol, depth, hexDigits)
      .collect()
      .map(row => (row.getInt(0), row.getInt(1), row.getString(2)) ->
        row.getLong(3)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def est(lvl: Int, prefix: String): Long = {
      val digest = md5hex(s"$lvl:$prefix")
      (0 until depth).map { r =>
        cells.getOrElse(
          (lvl, r, digest.substring(r * hexDigits, (r + 1) * hexDigits)),
          0L)
      }.min
    }
    val hexAlphabet = "0123456789abcdef".map(_.toString)
    val leaves = (1 to DyadicLevels)
      .foldLeft(Seq("")) { (frontier, lvl) =>
        frontier.flatMap(p => hexAlphabet.map(p + _))
          .filter(est(lvl, _) >= threshold)
      }
    val heavy = broadcast(leaves.toDF("_h"))
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .withColumn("_h", substring(md5(col("token")), 1, DyadicLevels))
      .join(heavy, Seq("_h"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }
}
