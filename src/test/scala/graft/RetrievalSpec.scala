package graft

import graft.operators.{Retrieval, Similarity, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Hybrid lexical+vector retrieval: RRF fusion semantics, tower
  * equivalence under index pruning, and the k-bounded scale shape.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")
  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
  private lazy val queryVec = emb.filter(col("vec_id") === 0)
    .head().getSeq[Float](1).map(_.toDouble)
  private val tokens = Seq("spark", "table", "query")

  test("rrfFuse: hand-checkable fusion — ranks, floors, full-outer union, id tiebreak") {
    val a = Seq((1L, 100L), (2L, 90L), (3L, 80L)).toDF("id", "s1")
    val b = Seq((2L, 0.9), (4L, 0.8)).toDF("id", "s2")
    val got = Retrieval.rrfFuse("id", topN = 10, rrfK = 60,
        Seq(a -> "s1", b -> "s2"))
      .as[(Long, Long)].collect().toSeq
    def c(r: Int) = math.floor(1000000.0 / (60 + r)).toLong
    // id 2: rank 2 lexical + rank 1 vector; ids 1/3 lexical only; 4 vector only
    val expect = Seq(2L -> (c(2) + c(1)), 1L -> c(1), 4L -> c(2), 3L -> c(3))
      .sortBy { case (id, s) => (-s, id) }
    assert(got == expect, s"got $got expect $expect")
  }

  test("rrfFuse: an unbounded list fails LOUDLY before any window runs, naming the towers") {
    // the k-bounded contract is ENFORCED (the requireCorpusBounded
    // precedent, r13 verdict item 2): a caller fusing a frame past
    // maxListRows must get a message naming the bounded tower outputs,
    // never a silent one-task corpus sort. Tiny bound = cheap spec.
    val big = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("id", "s1")
    val e = intercept[IllegalArgumentException] {
      Retrieval.rrfFuse("id", topN = 10, rrfK = 60,
        Seq(big -> "s1"), maxListRows = 2L)
    }
    assert(e.getMessage.contains("rrfFuse"), e.getMessage)
    assert(e.getMessage.contains("bm25Rank"), e.getMessage)
    assert(e.getMessage.contains("single partition"), e.getMessage)
    // at or under the bound the fusion runs untouched
    assert(Retrieval.rrfFuse("id", topN = 10, rrfK = 60,
      Seq(big -> "s1"), maxListRows = 3L).count() == 3L)
  }

  test("hybridSearch: a doc in BOTH towers outranks equal single-tower ranks; output is fusion of the towers") {
    val out = Retrieval.hybridSearch(docs, "doc_id", "text",
        emb.filter(col("vec_id") > 0), "vec_id", "embedding",
        tokens, queryVec, topN = 20)
      .as[(Long, Long)].collect().toSeq
    assert(out.nonEmpty && out.size <= 20)
    // recompute the fusion from the towers independently
    val lex = TextAnalysis.bm25Rank(docs, "doc_id", "text", tokens, 50)
      .as[(Long, Long)].collect().toSeq
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val vec = Similarity.topKByQuery(emb.filter(col("vec_id") > 0),
        "vec_id", "embedding", queryVec, 50)
      .as[(Long, Double)].collect().toSeq
      .sortBy { case (id, c0) => (-c0, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    def c(r: Int) = math.floor(1000000.0 / (60 + r)).toLong
    val expect = (lex.keySet ++ vec.keySet).toSeq
      .map(id => id -> (lex.get(id).map(c).getOrElse(0L) +
        vec.get(id).map(c).getOrElse(0L)))
      .sortBy { case (id, s) => (-s, id) }.take(20)
    assert(out == expect)
    // the fused scores are strictly positive and descending
    assert(out.map(_._2).forall(_ > 0L))
    assert(out.map(_._2) == out.map(_._2).sorted.reverse)
  }

  test("Repl `hybrid` verb: lexical-seeded two-tower search renders rows deterministically") {
    val session = new graft.queries.Repl.Session(spark, sfDir,
      new graft.operators.FilterRegistry(None))
    val out = session.exec("hybrid spark table query")
    assert(out.trim.endsWith("row(s) shown"), out)
    val rows = out.linesIterator.toSeq.dropRight(1)
    assert(rows.nonEmpty, out)
    // three tab-separated fields: id, rrf_ppm, snippet
    assert(rows.forall(_.split("\t").length == 3), out)
    // deterministic: the same line renders identically
    assert(session.exec("hybrid spark table query") == out)
    assert(session.exec("hybrid").startsWith("ERR"), "usage error expected")
  }

  test("hybridRerank: exact re-rank of the tower-union candidates, never beyond them") {
    val corpus = emb.filter(col("vec_id") > 0)
    val out = Retrieval.hybridRerank(docs, "doc_id", "text",
        corpus, "vec_id", "embedding", tokens, queryVec, topN = 20)
      .as[(Long, Double)].collect().toSeq
    assert(out.nonEmpty && out.size <= 20)
    // candidates only: every id came from one of the towers
    val lexIds = TextAnalysis.bm25Rank(docs, "doc_id", "text", tokens, 50)
      .select("doc_id").as[Long].collect().toSet
    val vecIds = Similarity.topKByQuery(corpus, "vec_id", "embedding",
      queryVec, 50).select("vec_id").as[Long].collect().toSet
    assert(out.map(_._1).toSet.subsetOf(lexIds ++ vecIds))
    // exact scores, descending on the 6-decimal grid
    assert(out.map(_._2) == out.map(_._2).sorted.reverse)
    // and equals a hand-built re-rank over the same union
    val expect = Similarity.topKByQuery(
        corpus.join(broadcast((lexIds ++ vecIds).toSeq.toDF("vec_id")),
          Seq("vec_id"), "left_semi"),
        "vec_id", "embedding", queryVec, 20)
      .as[(Long, Double)].collect().toSeq
    assert(out == expect)
  }

  test("ANN hybrid: the bench's persisted-index serving shape equals the self-contained fit") {
    // the fits are deterministic, so build-once + table query must
    // serve the same fused rows the oracle-checked form produces
    val fresh = SparkEntry.queries("q_hybrid_search_ann")(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    val served = SparkEntry.benchQueries("q_hybrid_search_ann")(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    assert(served == fresh)
  }

  test("fit/serve split: every served bench twin equals its self-contained oracle form") {
    // the r14 bench twins time the serving scan against a per-JVM
    // cached fit; the fits are deterministic, so the rows must be
    // IDENTICAL to the self-contained forms Verify replays — any
    // drift here would mean the bench measures a different answer
    for (name <- Seq("q_embed_ivfpq_table", "q_embed_pq_codes",
        "q_embed_pca", "q_embed_pq_topk", "q_embed_pq_rerank")) {
      val fresh = SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      val served = SparkEntry.benchQueries(name)(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      assert(served == fresh, s"$name served twin drifted")
    }
  }

  test("hybridSearch with a TextIndex equals the scan path (posting pruning is lossless)") {
    val root = java.nio.file.Files
      .createTempDirectory("hybridix").toString + "/ix"
    graft.sources.TextIndex.write(docs, "doc_id", "text", root)
    val scan = Retrieval.hybridSearch(docs, "doc_id", "text",
        emb.filter(col("vec_id") > 0), "vec_id", "embedding",
        tokens, queryVec, topN = 20)
      .as[(Long, Long)].collect().toSeq
    val indexed = Retrieval.hybridSearch(docs, "doc_id", "text",
        emb.filter(col("vec_id") > 0), "vec_id", "embedding",
        tokens, queryVec, topN = 20, indexPath = Some(root))
      .as[(Long, Long)].collect().toSeq
    assert(indexed == scan)
  }
}
