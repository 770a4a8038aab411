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

  /** Context-window chunking: split each document into fixed-size
    * token chunks with `overlap` tokens of context carried between
    * consecutive chunks (the standard pretraining/RAG windowing).
    * Pure per-row generator — explode of slices, no shuffle; chunk
    * count and boundaries are integer arithmetic, so the DuckDB
    * oracle reproduces them exactly.
    *
    * Output: (idCol, chunk_idx, n_chunk_tokens, chunk_text).
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got $overlap / $chunkSize")
    val step = chunkSize - overlap
    val toks = TextFunctions.tokens(col(textCol))
    // chunks cover starts 0, step, 2·step, … while start < n (≥1 chunk
    // for non-empty docs); empty docs produce no chunks
    val nChunks = when(size(toks) === 0, lit(0))
      .otherwise(floor((size(toks) - 1).cast("double") / step).cast("int") + 1)
    df.select(col(idCol), toks.as("_tk"), nChunks.as("_nc"))
      .filter(col("_nc") > 0)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("_nc") - 1),
          i => slice(col("_tk"), i * step + 1, lit(chunkSize)))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        size(col("col")).as("n_chunk_tokens"),
        concat_ws(" ", col("col")).as("chunk_text"))
  }

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
