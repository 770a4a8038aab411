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

  test("deep learn reaches full-collapse depth with zero per-round Spark jobs") {
    // the classic fixture exhausts at 12 merges (every word one symbol);
    // ask for far more and count jobs: the whole learn must cost a
    // CONSTANT number of jobs (vocab agg + literal table), not O(rounds)
    val counter = new org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(counter)
    try {
      val got = Bpe.learn(classic, "text", rounds = 4096).collect()
      // listener events are async; settle before reading the counter
      var prev = -1; var spins = 0
      while (counter.jobs.get() != prev && spins < 30) {
        prev = counter.jobs.get(); Thread.sleep(100); spins += 1
      }
      // low(3)+lower(2, after low reused... ) — exact count: the vocab
      // {low, lower, newest, widest} fully collapses; each word of
      // length n costs n-1 merges minus shared prefixes learned once:
      // verify exhaustion (< 4096) and that every final word is a
      // single symbol via encode
      assert(got.length < 20 && got.length >= 10)
      assert(counter.jobs.get() <= 4,
        s"deep learn ran ${counter.jobs.get()} jobs — merge loop must not touch Spark")
    } finally spark.sparkContext.removeSparkListener(counter)
    val enc = Bpe.encode(classic, "doc_id", "text", rounds = 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // fully collapsed: pieces == tokens per doc
    assert(enc == Map(1L -> 5L, 2L -> 2L, 3L -> 6L, 4L -> 3L))
  }

  test("learnMerges matches the declarative applyMerge round-for-round") {
    // property pin: the in-memory greedy loop and the gaps-and-islands
    // Spark form stay in lockstep over several rounds on a fixture with
    // identical-symbol runs (the tricky overlap case)
    val runs = corpus(1L -> "aaaa aaa banana bananas", 2L -> "aa banana")
    val learned = Bpe.learnMerges(runs, "text", rounds = 5)
    var v = Bpe.vocab(runs, "text")
    learned.merges.foreach { m => v = Bpe.applyMerge(v, m.lhs, m.rhs) }
    val sparkSide = v.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toVector).toMap
    val memSide = learned.words.map { case (w, _, s) => w -> s }.toMap
    assert(sparkSide == memSide)
  }

  test("encodeIds emits per-document piece-id sequences with frequency-ranked ids") {
    val ids = Bpe.encodeIds(classic, "doc_id", "text", rounds = 4)
    val rows = ids.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // doc 2 = "lower lower" → pieces per word [lo, w, e, r] under
    // merges es, est, lo, low? — after 4 merges (es, est, lo, low):
    // lower → [low, e, r]
    val doc2 = rows.filter(_._1 == 2L).sortBy(_._2)
    assert(doc2.map(_._3).toSeq == Seq("low", "e", "r", "low", "e", "r"))
    assert(doc2.map(_._2).toSeq == (1L to 6L))
    // ids are dense 1..K and frequency-ranked: est (9 occurrences,
    // weighted) must rank above w
    val idOf = rows.map(t => t._3 -> t._4).toMap
    assert(idOf.values.toSet == (1L to idOf.size).toSet)
    assert(idOf("est") < idOf("w"))
    // piece sequence joins back to the same totals encode reports
    val totals = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val enc = Bpe.encode(classic, "doc_id", "text", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(totals == enc)
  }

  test("char-level learn sustains thousands of merges on a realistic vocabulary") {
    // deterministic synthetic vocabulary: 4000 distinct 8-12 char
    // "words" from md5 hex — the fixture corpus' 31-word vocabulary
    // can't exercise real merge depth, this can (bound Σ(len-1) ≈ 38k)
    import spark.implicits._
    val docs = (1L to 4000L).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      i -> h.take(8 + (i % 5).toInt)
    }.grouped(40).zipWithIndex
      .map { case (g, i) => (i.toLong, g.map(_._2).mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val learned = Bpe.learnMerges(docs, "text", rounds = 2048)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(learned.merges.length == 2048,
      s"expected 2048 merges, got ${learned.merges.length}")
    // ranks are dense and weights non-increasing is NOT guaranteed
    // (merges create new pairs), but every winner must have been the
    // max at selection: sanity-check monotone rank + positive counts
    assert(learned.merges.map(_.rank) == (1L to 2048L))
    assert(learned.merges.forall(_.weight > 0))
    assert(secs < 60.0, s"deep learn took $secs s — loop must be incremental")
  }

  test("phrase-level merges discover multi-word expressions and encode by broadcast join") {
    // "order by" dominates; then ("order by", "limit") chains the
    // learned symbol into a 3-gram phrase
    val docs = corpus(
      1L -> "select x order by y limit 10",
      2L -> "select y order by y limit 10",
      3L -> "delete where order by z",
      4L -> "order by q limit 10")
    val learned = Bpe.learnPhraseMerges(docs, "text", rounds = 2)
    assert(learned.merges.head.lhs == "order" &&
      learned.merges.head.rhs == "by" &&
      learned.merges.head.merged == "order by" &&
      learned.merges.head.weight == 4L)
    // round 2: pairs ("by"→gone); ("order by", "y")=2, ("y","limit")=2,
    // ("limit","10")=3 wins
    assert(learned.merges(1).merged == "limit 10" &&
      learned.merges(1).weight == 3L)
    val enc = Bpe.encodePhrases(docs, "doc_id", "text", rounds = 2)
    val rows = enc.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: 7 tokens → [select, x, "order by", y, "limit 10"] = 5 pieces
    assert(rows(1L) == (7L, 5L))
    assert(rows(3L) == (5L, 4L))
    assert(rows(4L) == (5L, 3L))
    val plan = enc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"phrase encode should broadcast-join the sequence lengths:\n$plan")
  }

  test("capped training still encodes every input exactly through the merge table") {
    // train on only the top-2 words by weight (newest×6, low×5): the
    // other words are OUTSIDE the training vocab and must encode via
    // the broadcast rank map (lowest-rank-first), not silently drop
    val learned = Bpe.learnMerges(classic, "text", rounds = 4, maxVocab = 2)
    assert(learned.words.map(_._1).toSet == Set("newest", "low"))
    val enc = Bpe.encode(classic, "doc_id", "text", rounds = 4, maxVocab = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every doc present; trained words use their learned state, unseen
    // words apply the same merges: merges from {newest:6, low:5} are
    // (e,s),(es,t),(n,e)? — verify by recomputation with applyRanked
    val rk = Bpe.rankMap(learned)
    def piecesOf(w: String): Long =
      Bpe.applyRanked(w.map(_.toString).toIndexedSeq, rk, "").length.toLong
    val expect = Map(
      1L -> (5L, 5L * piecesOf("low")),
      2L -> (2L, 2L * piecesOf("lower")),
      3L -> (6L, 6L * piecesOf("newest")),
      4L -> (3L, 3L * piecesOf("widest")))
    assert(enc == expect)
    // and the ids path emits full coverage with OOV pieces at id 0
    val ids = Bpe.encodeIds(classic, "doc_id", "text", rounds = 4, maxVocab = 2)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(ids.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
    val trainedPieces = learned.pieces.map(_._1).toSet
    assert(ids.forall { case (_, p, id) =>
      if (trainedPieces(p)) id > 0 else id == 0L })
  }

  test("phrase cap: sequences outside the sample encode exactly via the merge table") {
    val docs = corpus(
      1L -> "order by x limit 10",
      2L -> "order by x limit 10", // weight-2 winner sequence
      3L -> "select z order by y limit 10")
    val learned = graft.operators.Bpe.learnPhraseMerges(docs, "text",
      rounds = 2, maxSequences = 1)
    assert(learned.words.size == 1)
    val enc = Bpe.encodePhrases(docs, "doc_id", "text", rounds = 2)
    // default cap covers all; now force the capped learn through the
    // public encode path by checking doc 3 (unseen under cap=1) via
    // applyRanked directly
    val rk = Bpe.rankMap(learned)
    val d3 = Bpe.applyRanked(
      "select z order by y limit 10".split(' ').toIndexedSeq, rk, " ")
    // merges learned from "order by x limit 10": rank1 = most frequent
    // adjacent pair — all pairs weight 2, tie-break lexicographic:
    // ("10" has no right)... pairs: (order,by),(by,x),(x,limit),(limit,10)
    // tie at 2 → lhs binary asc: "by" < "limit" < "order" < "x" → (by,x)
    assert(learned.merges.head.merged == "by x")
    // doc 3 has no "by x" adjacency; second merge applies if present
    assert(d3.length <= 7 && d3.nonEmpty)
    assert(enc.count() == 3L)
  }

  test("saveLearned/loadLearned round-trips the tokenizer artifact exactly") {
    val learned = Bpe.learnMerges(classic, "text", rounds = 4)
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString + "/tok"
    Bpe.saveLearned(spark, learned, dir)
    val back = Bpe.loadLearned(spark, dir)
    assert(back.merges == learned.merges)
    assert(back.words.sortBy(_._1) == learned.words.sortBy(_._1))
    assert(back.pieces == learned.pieces)
    assert(Bpe.rankMap(back) == Bpe.rankMap(learned))
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
