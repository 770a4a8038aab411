package graft

import graft.ml.LinearQuality
import org.apache.spark.sql.functions._

/** Closed-form linear quality classifier: learnability, determinism,
  * ridge behavior, and the broadcast-scoring plan shape. */
class LinearQualitySpec extends SparkSpec {

  // separable corpus: "wiki-like" docs carry reference-y tokens,
  // "crawl-like" docs carry boilerplate tokens; shared filler both.
  private lazy val corpus = {
    import spark.implicits._
    val wiki = (1L to 40L).map(i =>
      (i, s"history of topic$i references citation needed see also", 1))
    val crawl = (41L to 80L).map(i =>
      (i, s"click here buy now subscribe cookie policy item$i", 0))
    (wiki ++ crawl).toDF("doc_id", "text", "label")
  }

  test("ridge fit separates a separable corpus at train time") {
    val scored = LinearQuality.fitScore(corpus, "doc_id", "text", "label")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val acc = corpus.collect().map { r =>
      val want = r.getInt(2) == 1
      if (scored(r.getLong(0)) == want) 1 else 0
    }.sum / 80.0
    assert(acc >= 0.95, s"train accuracy $acc — separable corpus must separate")
  }

  test("fit is deterministic: same corpus, same quantized weights") {
    val m1 = LinearQuality.fit(corpus, "doc_id", "text", "label")
    val m2 = LinearQuality.fit(corpus.repartition(7), "doc_id", "text", "label")
    assert(m1 == m2, "weights drifted across partitionings")
  }

  test("the bounded-sample fit contract: a sampled fit IS the fit of the sample") {
    // the 100 TB contract (fit cost plateaus at the sample while
    // scoring scans the corpus): sampling must be a pure
    // deterministic filter, nothing more — weight for weight
    val sampled = LinearQuality.fit(corpus, "doc_id", "text", "label",
      sampleFraction = 0.5)
    val ofSample = LinearQuality.fit(
      graft.operators.Scale.deterministicSample(corpus, "doc_id", 0.5),
      "doc_id", "text", "label")
    assert(sampled == ofSample, "sampled fit must equal fit of the sample")
    assert(sampled != LinearQuality.fit(corpus, "doc_id", "text", "label"),
      "the half-corpus sample must actually change the fit on this fixture")
    // partitioning-independent like the full fit
    assert(sampled == LinearQuality.fit(corpus.repartition(7), "doc_id",
      "text", "label", sampleFraction = 0.5))
    // and the sampled model still separates the separable corpus
    val scored = LinearQuality.score(corpus, "doc_id", "text", sampled)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val acc = corpus.collect().map { r =>
      if (scored(r.getLong(0)) == (r.getInt(2) == 1)) 1 else 0
    }.sum / 80.0
    assert(acc >= 0.9, s"sampled-fit train accuracy $acc")
  }

  test("heavier ridge shrinks weights toward the bias") {
    val loose = LinearQuality.fit(corpus, "doc_id", "text", "label", lambda = 1.0)
    val tight = LinearQuality.fit(corpus, "doc_id", "text", "label", lambda = 1e6)
    def l1(m: LinearQuality.Model) = m.weightsMicro.values.map(math.abs).sum
    assert(l1(tight) < l1(loose) / 10,
      s"lambda=1e6 should crush weights: ${l1(tight)} vs ${l1(loose)}")
    // at extreme regularization the score collapses to ~the label mean
    // (0.5 here) — the keep decision is then uniformly the bias side
    val scored = LinearQuality.score(corpus, "doc_id", "text", tight)
      .select("keep").distinct().count()
    assert(scored == 1L)
  }

  test("scoreColumn (the zero-shuffle streaming form) equals the join-path score exactly") {
    import spark.implicits._
    val m = LinearQuality.fit(corpus, "doc_id", "text", "label")
    val joined = LinearQuality.score(corpus, "doc_id", "text", m)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    val columnar = corpus.select(col("doc_id"),
        LinearQuality.scoreColumn(col("text"), m).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(columnar == joined)
    // the plan is one projection: no join, no aggregate-exchange
    val plan = corpus.select(LinearQuality.scoreColumn(col("text"), m))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"scoreColumn must be a pure projection:\n$plan")
    // and the streaming gate keeps exactly the rows score() keeps
    val kept = LinearQuality.score(corpus, "doc_id", "text", m)
      .filter(col("score_micro") >= m.scale / 2).select("doc_id")
      .as[Long].collect().toSet
    val gated = graft.streaming.LogPipeline.qualityGateStream(
        corpus.withColumnRenamed("text", "_raw"), m, m.scale / 2)
      .select("doc_id").as[Long].collect().toSet
    assert(gated == kept && gated.nonEmpty && gated.size < 80)
  }

  test("scoring plan: weights broadcast; empty docs still score the bias") {
    import spark.implicits._
    val m = LinearQuality.fit(corpus, "doc_id", "text", "label")
    val withEmpty = corpus.union(Seq((99L, "   ", 0)).toDF("doc_id", "text", "label"))
    val scored = LinearQuality.score(withEmpty, "doc_id", "text", m)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weight table should broadcast:\n$plan")
    val empty = scored.filter(col("doc_id") === 99L).collect()
    assert(empty.length == 1 && empty.head.getLong(1) == m.biasMicro)
  }
}
