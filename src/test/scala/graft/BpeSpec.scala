package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // classic BPE fixture: low×5, lower×2, newest×6, widest×3
  private lazy val classic = corpus(
    1L -> "low low low low low",
    2L -> "lower lower",
    3L -> "newest newest newest newest newest newest",
    4L -> "widest widest widest")

  test("learn reproduces the hand-computed merge sequence with deterministic tie-breaks") {
    val got = Bpe.learn(classic, "text", rounds = 4)
      .orderBy("merge_rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // round 1: (e,s) and (s,t) tie at 9 — lhs tie-break picks (e,s);
    // round 2: (es,t) 9; round 3: (l,o) vs (o,w) tie at 7 → (l,o);
    // round 4: (lo,w) 7 — merged symbols join later rounds' pairs
    assert(got.toSeq == Seq(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L),
      (4L, "lo", "w", "low", 7L)))
  }

  test("applyMerge is greedy left-to-right on runs of an identical pair") {
    import spark.implicits._
    val v = Seq(("aaaa", 1L), ("aaa", 1L), ("ba", 1L))
      .toDF("word", "weight")
      .withColumn("syms", split(col("word"), ""))
    val got = Bpe.applyMerge(v, "a", "a")
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(got("aaaa") == Seq("aa", "aa"))
    assert(got("aaa") == Seq("aa", "a"))
    assert(got("ba") == Seq("b", "a"))
  }

  test("learn stops early when no adjacent pairs remain") {
    val tiny = corpus(1L -> "ab ab")
    val got = Bpe.learn(tiny, "text", rounds = 5).collect()
    // one merge (a,b) exhausts the vocab (single-symbol words pair-less)
    assert(got.length == 1)
    assert(got.head.getString(3) == "ab")
  }

  test("encode counts pieces under the learned merges via one broadcast join") {
    val enc = Bpe.encode(classic, "doc_id", "text", rounds = 4)
    val got = enc.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // low → [low] (1 piece); lower → [low,e,r] (3); newest →
    // [n,e,w,est] (4); widest → [w,i,d,est] (4)
    assert(got(1L) == (5L, 5L))
    assert(got(2L) == (2L, 6L))
    assert(got(3L) == (6L, 24L))
    assert(got(4L) == (3L, 12L))
    val plan = enc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab pieces should broadcast-join the corpus tokens:\n$plan")
  }
}
