package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
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
}
