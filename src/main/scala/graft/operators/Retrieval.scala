package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — the serving-side composition of the engine's
  * index investments (reference anchor: the CLI's `search` verb,
  * `cli/cloudpelican-lsd.go:322-348`, which serves one lexical path;
  * this is its two-tower successor): LEXICAL candidates (Okapi BM25,
  * optionally pruned by [[graft.sources.TextIndex]] posting lookups)
  * ∪ VECTOR candidates (exact cosine top-k, or IVF-PQ probes at index
  * scale), fused by reciprocal-rank fusion (Cormack et al., SIGIR'09):
  *
  *   rrf_ppm(d) = Σ_lists floor(10⁶ / (k + rank_list(d)))
  *
  * RRF is the standard score-free fusion — ranks, not raw scores, so
  * a BM25 micro-nat and a cosine never need a common scale. Both
  * contributions are floors of 10⁶/(k+r) with r ≤ the candidate list
  * length: integer-exact in IEEE double, replayed verbatim by the SQL
  * oracle.
  *
  * Scale shape: each tower returns a k-BOUNDED list (the towers
  * themselves are the scale paths — posting-pruned BM25 scoring is
  * O(matching postings), IVF-PQ probes are cell-pruned), so the rank
  * windows and the fusion join run on ≤ kLex + kVec rows — driver-
  * trivial at any corpus size. Nothing here touches the corpus beyond
  * what the towers already read.
  */
object Retrieval {

  /** Ceiling on each ranked list's row count: the rank windows below
    * are single-partition sorts, so the contract "each tower hands me
    * a k-bounded list" must be ENFORCED, not advisory — a caller
    * fusing an unbounded frame would otherwise get a silent one-task
    * corpus sort (the same failure class [[Similarity
    * .requireCorpusBounded]] closed for the compiled kNN paths, and
    * the r13 verdict's one named scale-killer). 2¹⁶ rows is far past
    * any real fusion depth and still milliseconds to window. */
  val defaultMaxListRows: Long = 1L << 16

  /** Fuse two ranked candidate frames by RRF. Each input must carry
    * (idCol, its score column); ranks are assigned over
    * (score desc, id asc) — the deterministic total order both
    * engines share. Output: (idCol, rrf_ppm), best first, id
    * tiebreak, at most `topN` rows. Each list is probed against
    * `maxListRows` BEFORE any window runs (LIMIT(max+1) count — the
    * probe is O(bound), and fails as a message, not a hung sort). */
  def rrfFuse(idCol: String, topN: Int, rrfK: Int,
      lists: Seq[(DataFrame, String)],
      maxListRows: Long = defaultMaxListRows): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(rrfK >= 1, s"rrfK must be >= 1: $rrfK")
    lists.zipWithIndex.foreach { case ((df, scoreCol), i) =>
      Similarity.requireBounded(df, maxListRows,
        s"rrfFuse list $i (score column '$scoreCol') rank-windows on " +
          "a single partition and",
        "Pass each tower's k-bounded top-k output (bm25Rank / " +
          "topKByQuery / queryIvfPqTable), never the raw corpus; or " +
          "raise maxListRows deliberately.")
    }
    val ranked = lists.zipWithIndex.map { case ((df, scoreCol), i) =>
      // the candidate frame is k-bounded — enforced above — so this
      // is a single-partition window over ≤ maxListRows rows, not a
      // corpus sort
      val w = Window.orderBy(col(scoreCol).desc, col(idCol))
      df.select(col(idCol), col(scoreCol))
        .withColumn(s"_r$i",
          floor(lit(1000000.0) / (lit(rrfK) + row_number().over(w)))
            .cast("long"))
        .select(col(idCol), col(s"_r$i"))
    }
    ranked.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
      .na.fill(0L)
      .withColumn("rrf_ppm",
        ranked.indices.map(i => col(s"_r$i")).reduce(_ + _))
      .orderBy(col("rrf_ppm").desc, col(idCol))
      .limit(topN)
      .select(col(idCol), col("rrf_ppm"))
  }

  /** The candidates-then-exact-re-rank composition (the classic
    * two-stage retrieval shape: cheap towers nominate, one exact
    * scorer decides): take the UNION of both towers' k-bounded
    * candidate ids and re-rank the whole union by exact cosine to the
    * query vector — so a document that only the lexical tower found
    * still gets a true vector score, and the final order is a single
    * comparable scale instead of fused ranks. Output:
    * (idCol, cos) best-first on the 6-decimal grid with id tiebreak,
    * at most `topN` rows. The re-rank reads only the ≤ kLex + kVec
    * candidate embeddings (broadcast semi-join — never the corpus). */
  def hybridRerank(docs: DataFrame, idCol: String, textCol: String,
      emb: DataFrame, embIdCol: String, vecCol: String,
      queryTokens: Seq[String], queryVec: Seq[Double],
      topN: Int = 20, kLex: Int = 50, kVec: Int = 50,
      indexPath: Option[String] = None): DataFrame = {
    val lex = indexPath match {
      case Some(p) => TextAnalysis.bm25RankIndexed(docs, idCol, textCol,
        p, queryTokens, kLex)
      case None => TextAnalysis.bm25Rank(docs, idCol, textCol,
        queryTokens, kLex)
    }
    val vec = Similarity.topKByQuery(emb, embIdCol, vecCol, queryVec, kVec)
    val cand = lex.select(col(idCol))
      .unionByName(vec.select(col(embIdCol).as(idCol)))
      .distinct()
    val candVecs = emb.select(col(embIdCol).as(idCol), col(vecCol))
      .join(broadcast(cand), Seq(idCol), "left_semi")
    Similarity.topKByQuery(candVecs, idCol, vecCol, queryVec, topN)
  }

  /** Hybrid lexical+vector search over a documents table and its
    * embedding sidecar. `indexPath` switches the lexical tower to the
    * posting-pruned serving shape ([[TextAnalysis.bm25RankIndexed]] —
    * equal output by construction); `queryVec` drives the exact
    * cosine top-k ([[Similarity.topKByQuery]]); swap in
    * [[Similarity.queryIvfPqTable]] candidates for the ANN serving
    * shape when an IVF-PQ table exists (same fused contract — RRF
    * only sees ranks). */
  def hybridSearch(docs: DataFrame, idCol: String, textCol: String,
      emb: DataFrame, embIdCol: String, vecCol: String,
      queryTokens: Seq[String], queryVec: Seq[Double],
      topN: Int = 20, kLex: Int = 50, kVec: Int = 50, rrfK: Int = 60,
      indexPath: Option[String] = None): DataFrame = {
    val lex = indexPath match {
      case Some(p) => TextAnalysis.bm25RankIndexed(docs, idCol, textCol,
        p, queryTokens, kLex)
      case None => TextAnalysis.bm25Rank(docs, idCol, textCol,
        queryTokens, kLex)
    }
    val vec = Similarity.topKByQuery(emb, embIdCol, vecCol, queryVec, kVec)
      .withColumnRenamed(embIdCol, idCol)
    rrfFuse(idCol, topN, rrfK,
      Seq(lex -> "bm25_micro", vec -> "cos"))
  }
}
