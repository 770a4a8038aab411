package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  private def corpus(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("featureBuckets hashes unigrams and adjacent bigrams into range") {
    import spark.implicits._
    val got = Seq(("a b c", 1)).toDF("t", "i")
      .select(Dsir.featureBuckets(col("t"), 16).as("b"))
      .collect().head.getSeq[Int](0)
    // 3 unigrams + 2 bigrams
    assert(got.length == 5)
    assert(got.forall(b => b >= 0 && b < 16))
    // deterministic across invocations
    val again = Seq(("a b c", 1)).toDF("t", "i")
      .select(Dsir.featureBuckets(col("t"), 16).as("b"))
      .collect().head.getSeq[Int](0)
    assert(got == again)
  }

  test("importanceWeights ranks target-looking docs above off-target docs") {
    val docs = corpus(
      (1L, "spark window table scan", "en"),
      (2L, "spark table window agg", "en"),
      (3L, "zzz qqq xxx yyy", "fr"),
      (4L, "spark window table agg", "fr"))
    val target = docs.filter(col("lang") === "en")
    val w = Dsir.importanceWeights(docs, "doc_id", "text", target,
        buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 4 shares the target's vocabulary, doc 3 shares none of it —
    // the importance weight must separate them
    assert(w(4L) > w(3L),
      s"target-like doc should outweigh off-target doc: $w")
    // docs IN the target slice score at least as high as the disjoint one
    assert(w(1L) > w(3L) && w(2L) > w(3L))
  }

  test("weights are exact integers consistent with a by-hand model") {
    // single doc, single token: one unigram feature; target = raw =
    // the whole corpus, so llr = floor(ln p)−floor(ln p) = 0 for its
    // bucket and logw must be exactly 0
    val docs = corpus((1L, "hello", "en"))
    val w = Dsir.importanceWeights(docs, "doc_id", "text", docs, buckets = 8)
      .collect()
    assert(w.length == 1)
    assert(w.head.getLong(1) == 1L) // n_feats
    assert(w.head.getLong(2) == 0L) // logw_micro
  }

  test("select returns k docs deterministically across runs") {
    val docs = corpus((1L to 20L).map(i => (i, s"tok$i spark table", "en")): _*)
    val a = Dsir.select(docs, "doc_id", "text", docs, k = 5, buckets = 64)
      .collect().map(_.getLong(0)).toSeq
    val b = Dsir.select(docs, "doc_id", "text", docs, k = 5, buckets = 64)
      .collect().map(_.getLong(0)).toSeq
    assert(a.length == 5)
    assert(a == b, "Gumbel resample must be deterministic across runs")
  }

  test("ratio table is dense and broadcast to the scoring join") {
    val docs = corpus((1L, "a b", "en"), (2L, "c d", "fr"))
    val ratio = Dsir.ratioTable(docs.filter(col("lang") === "en"), docs,
      "text", buckets = 32)
    assert(ratio.count() == 32, "table must be dense over all buckets")
    val plan = Dsir.importanceWeights(docs, "doc_id", "text",
        docs.filter(col("lang") === "en"), buckets = 32)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"ratio table should broadcast, corpus must not shuffle on gram:\n$plan")
  }
}
