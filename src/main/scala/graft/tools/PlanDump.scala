package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dump `.explain("formatted")` for the INTERNAL stages the r16
  * optimization round touched — the per-batch/fit-time frames that a
  * query's final returned plan cannot show (they run as their own
  * driver-side jobs before or inside the scenario choreography).
  * Output goes to stdout; the round's plans/r16/ files are captured
  * from here on the before/after trees.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(GraftSession.defaultCores)
      .appName("plandump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"==== $label ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") > 0)
      .select(col("vec_id").as("doc_id"), col("embedding"))

    // 1. the classifier fit's gram stage (q_quality_classifier /
    //    q_quality_gate / every StreamPretrain fit)
    val labeled = docs.withColumn("_is",
      (col("lang") === "en").cast("int"))
    val feats = graft.operators.TextAnalysis
      .hashEmbed(labeled, "doc_id", "text", 2)
      .withColumnRenamed("doc_id", "_id")
    dump("LinearQuality.gramCells (fit's XtX stage)")(
      graft.ml.LinearQuality.gramCells(feats, 256))

    // 2. the fit-time per-lang threshold stage (every StreamPretrain
    //    fit): thresholds-only vs the former buckets+join-back
    val costs = graft.operators.LangModel.knCollectCosts(
      graft.operators.LangModel.knBigrams(
        docs.filter(col("lang") === "en"), "text"))
    val scored = graft.operators.LangModel
      .knScoreWith(docs, "doc_id", "text", costs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("mean_nll_micro"))
    dump("StreamPretrain.fit t1 stage (thresholds path)")(
      graft.operators.Curate.perplexityThresholds(scored, "lang",
        "mean_nll_micro"))

    // 3. the semantic-dedup gate's per-batch annotation (the cell
    //    assignment every StreamSemDedup.upsertBatch runs)
    val m = graft.streaming.StreamSemDedup.fit(emb, "doc_id",
      "embedding", k = 8, iterations = 2, threshold = 0.3)
    dump("StreamSemDedup.annotate (per-batch cell assignment)")(
      graft.streaming.StreamSemDedup.annotate(emb, "doc_id",
        "embedding", m))

    // 4. (r17) KN document scoring under frozen cost tables — the
    //    q_kn_quality core AND the ingest gate / fit scorer of every
    //    pretrain face
    dump("LangModel.knScoreWith (frozen-cost KN scoring)")(
      graft.operators.LangModel.knScoreWith(docs, "doc_id", "text",
        costs))

    // 5. (r17) the frozen decontamination gate's per-batch keep set
    //    (q_stream_pretrain_decon's most expensive frame)
    val grams = graft.operators.Decontaminate
      .ngramSet(col("text"), 8)
    val benchGrams = docs.filter(col("doc_id") % 23 === 7)
      .select(explode(grams).as("g")).distinct()
      .limit(5000).collect().map(_.getString(0)).toSeq
    dump("StreamPretrain.deconKeep (frozen decon gate)")(
      graft.streaming.StreamPretrain.deconKeep(docs, "doc_id", "text",
        graft.streaming.StreamPretrain.Decon(benchGrams, 8, 3L)))

    spark.stop()
  }
}
