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

  /** Bucket of `token` in sketch row `row`: the first `hexDigits`
    * hex chars of md5("row:token"). Independent rows come from the
    * salted digest; width = 16^hexDigits.
    */
  def cmsBucket(row: Int, token: Column, hexDigits: Int): Column =
    substring(md5(concat_ws(":", lit(row), token)), 1, hexDigits)

  /** Build the sketch: one row per touched (row, bucket) cell with its
    * BIGINT count. Cells never touched are absent (implicitly zero —
    * estimateTokens coalesces). One projection + one bounded hash
    * aggregate; the corpus never shuffles by token.
    */
  def cmsSketch(df: DataFrame, textCol: String, depth: Int,
      hexDigits: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16]: $depth")
    require(hexDigits >= 1 && hexDigits <= 8,
      s"hexDigits must be in [1,8]: $hexDigits")
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
    * (no false negatives — est >= true).
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
}
