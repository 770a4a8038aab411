package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis profile over a document table (builder brief:
  * language-ID, quality scoring, token counting, fingerprinting).
  * One projection — no shuffle, runs at scan speed.
  */
object TextAnalysis {

  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).as("n_chars"),
      TextFunctions.tokenCount(t).as("n_tokens"),
      TextFunctions.subwordCount(t).as("n_subwords"),
      round(TextFunctions.punctRatio(t), 6).as("punct_ratio"),
      round(TextFunctions.stopwordRatio(t), 6).as("stopword_ratio"),
      TextFunctions.qualityScoreScaled(t).as("quality"),
      TextFunctions.langId(t).as("lang_guess"),
      TextFunctions.fingerprint(t).as("fp"))
  }

  /** Corpus-wide heavy-hitter tokens: exact frequencies, top-k with a
    * deterministic tie order. Explode → one map-side-combinable
    * shuffle; the top-k is a TakeOrdered, not a full sort.
    */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Per-document top-k tokens by TF-IDF (score = tf · ln(N/df)).
    * Scores ship as floor-scaled integers (×10⁶) so ranking and
    * equality are engine-stable. Two shuffles (tf, then document
    * frequency) + a per-doc window — the df relation is tiny
    * (vocabulary-sized) and broadcast back onto tf.
    *
    * Cross-engine note: unlike the other floor-scaled oracles (which
    * floor algebraically exact values), this floors a transcendental.
    * Verified on the fixtures at every sf: the nearest score sits
    * ≥ 3.5e-4 scaled units (~10⁵ ulps) from a floor boundary and no
    * two distinct (tf, df) pairs collide within 1e-3, so 1-ulp libm
    * disagreement between engines cannot flip a floor or a rank.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val n = df.count()
    val toks = df.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df_t"))
    val scored = tf.join(broadcast(dfreq), "token")
      .withColumn("score_scaled",
        floor(lit(1e6) * col("tf") * log(lit(n.toDouble) / col("df_t")))
          .cast("bigint"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_scaled").desc, col("token"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df_t"),
        col("score_scaled"))
  }
}
