package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character n-gram language-model quality scoring — the CCNet-style
  * "perplexity filter" of a training-data pipeline (Wenzek et al. 2019
  * score documents against a KenLM model and keep the low-perplexity
  * head; the same shape here with an add-one-smoothed char-trigram
  * model trained on a reference slice of the corpus itself).
  *
  * Everything is integer fixed-point so the result is ENGINE-EXACT:
  * each trigram's cost is floor(-ln(p) * 1e6) — one division and one
  * log per VOCABULARY entry (not per occurrence), floored onto the
  * micro-nat grid — and a document's score is an exact BIGINT sum of
  * those costs. The mean cost per trigram (the log-perplexity proxy)
  * is an integer division. No float ever crosses an aggregation.
  *
  * Scale shape (100 TB): training is one map-side-combinable count
  * aggregate over the reference slice; the cost table is bounded by
  * the charset cubed (≪ memory for any text corpus) and BROADCAST to
  * the scoring join, so the corpus itself never shuffles on gram —
  * the only corpus-wide movement is the per-(doc, gram) partial
  * aggregate feeding the per-doc sum, both combiner-friendly.
  */
object LangModel {

  /** Lowercased character trigrams of `c` (positions 1..len−2); empty
    * array below 3 chars. Codegen-friendly: sequence + transform +
    * substr, no UDF.
    */
  def charTrigrams(c: Column): Column = {
    val s = lower(c)
    when(length(s) >= 3,
      transform(sequence(lit(1), length(s) - 2), i => s.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))
  }

  /** Train the trigram model: (gram, c) counts over the reference
    * slice. One explode + one combiner-friendly aggregate.
    */
  def lmTrain(ref: DataFrame, textCol: String): DataFrame =
    ref.select(explode(charTrigrams(col(textCol))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c"))

  /** Score each document against a trained model: per-doc trigram
    * count `n_tri`, total cost `nll_micro` (micro-nats under add-one
    * smoothing: seen grams cost floor(-ln((c+1)/(total+V))·1e6),
    * unseen grams the V-denominator floor(-ln(1/(total+V))·1e6)), and
    * the integer mean `mean_nll_micro` — the log-perplexity proxy a
    * quality gate thresholds on. Documents shorter than 3 chars have
    * no trigrams and are absent from the output.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, scale: Long = 1000000L): DataFrame = {
    // one-row model summary, broadcast into the cost table
    val totals = model.agg(sum(col("c")).as("total"), count(lit(1)).as("v"))
    val denom = (col("total") + col("v")).cast("double")
    val costs = model.crossJoin(broadcast(totals))
      .select(col("gram"),
        floor(-log((col("c") + 1).cast("double") / denom) * scale)
          .as("cost"))
    val oov = totals.select(
      floor(-log(lit(1.0) / denom) * scale).as("oov_cost"))

    val docGrams = docs
      .select(col(idCol), explode(charTrigrams(col(textCol))).as("gram"))
      .groupBy(idCol, "gram").agg(count(lit(1)).as("n"))
    docGrams
      .join(broadcast(costs), Seq("gram"), "left")
      .crossJoin(broadcast(oov))
      .withColumn("cost", coalesce(col("cost"), col("oov_cost")))
      .groupBy(idCol)
      .agg(sum(col("n") * col("cost")).as("nll_micro"),
        sum(col("n")).as("n_tri"))
      .withColumn("mean_nll_micro", expr("nll_micro div n_tri"))
      .select(col(idCol), col("n_tri"), col("nll_micro"),
        col("mean_nll_micro"))
  }
}
