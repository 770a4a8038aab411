package graft

import graft.operators.LangModel
import graft.sources.Tables
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("charTrigrams: sliding window, lowercased, empty below 3 chars") {
    val df = Seq("Abcd", "xy", "", "hello").toDF("t")
      .select(LangModel.charTrigrams(col("t")).as("g"))
    val got = df.collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("abc", "bcd"))
    assert(got(1).isEmpty && got(2).isEmpty)
    assert(got(3) == Seq("hel", "ell", "llo"))
  }

  test("lmScore: in-model text costs less per trigram than novel text") {
    val ref = Seq.tabulate(20)(i => (i, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val model = LangModel.lmTrain(ref, "text")
    val score = LangModel.lmScore(
      Seq((1, "the quick brown fox"), (2, "zzqx wvvj qqkk zzzz"))
        .toDF("doc_id", "text"),
      "doc_id", "text", model)
      .collect().map(r => r.getAs[Int]("doc_id") ->
        r.getAs[Long]("mean_nll_micro")).toMap
    // doc 1 is drawn from the model's own text; doc 2 is all-OOV
    assert(score(1) < score(2))
  }

  test("lmScore: cost arithmetic is the exact integer contract") {
    // model trained on one doc: "aaaa" -> trigrams aaa, aaa => c(aaa)=2
    val model = LangModel.lmTrain(Seq((1, "aaaa")).toDF("id", "text"), "text")
    // total=2, V=1 => seen cost floor(-ln(3/3)*1e6)=0,
    // OOV cost floor(-ln(1/3)*1e6)=1098612
    val got = LangModel.lmScore(
      Seq((1, "aaab")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().head
    // trigrams: aaa (seen, 0) + aab (OOV, 1098612); mean = 549306
    assert(got.getAs[Long]("n_tri") == 2L)
    assert(got.getAs[Long]("nll_micro") == 1098612L)
    assert(got.getAs[Long]("mean_nll_micro") == 549306L)
  }

  test("docCost/meanNllColumn: compiled per-row path equals the join-based lmScore exactly") {
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
    val model = LangModel.lmTrain(
      docs.filter(col("lang") === "en"), "text")
    val (costs, oov) = LangModel.collectCosts(model)

    val joined = LangModel.lmScore(docs, "doc_id", "text", model)
      .select("doc_id", "n_tri", "nll_micro", "mean_nll_micro")
    val perRow = docs.select(col("doc_id"),
        LangModel.docCost(col("text"), costs, oov).as("st"),
        LangModel.meanNllColumn(col("text"), costs, oov).as("mean_nll_micro"))
      .filter(col("st").isNotNull)
      .select(col("doc_id"), col("st.n_tri").as("n_tri"),
        col("st.nll_micro").as("nll_micro"), col("mean_nll_micro"))
    assert(joined.exceptAll(perRow).isEmpty && perRow.exceptAll(joined).isEmpty)

    // the packaged fast path (what q_lm_quality runs) is the same rows
    val packaged = LangModel.lmScoreCompiled(docs, "doc_id", "text", model)
    assert(joined.exceptAll(packaged).isEmpty &&
      packaged.exceptAll(joined).isEmpty)
  }

  test("lmScore: documents shorter than 3 chars are absent") {
    val model = LangModel.lmTrain(Seq((1, "abcdef")).toDF("id", "text"), "text")
    val out = LangModel.lmScore(
      Seq((1, "ab"), (2, "abc")).toDF("doc_id", "text"),
      "doc_id", "text", model)
    assert(out.collect().map(_.getAs[Int]("doc_id")).toSeq == Seq(2))
  }
}
