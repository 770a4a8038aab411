package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-centrality ranking for crawl curation: which sources sit at
  * the center of the content-syndication graph?
  *
  * Large-scale corpus pipelines weight crawl domains by link-graph
  * centrality (Common Crawl publishes harmonic/PageRank centrality per
  * domain and curation pipelines sample high-centrality hosts first).
  * The fixtures carry no hyperlinks, but near-duplicate CONTENT is its
  * own edge set: two sources that keep publishing near-identical
  * documents are syndication neighbors (mirror, scraper, or upstream
  * feed) — exactly the relation a curation pass wants to rank before
  * deciding which copy of a syndicate to keep. [[sourceRank]] builds
  * that graph from MinHash near-dup pairs and runs [[pageRank]] on it.
  *
  * The reference's analytics stack has no graph operator — this is one
  * of the builder-brief "operations a training-data pipeline needs"
  * beyond the reference surface (its closest analogue is the per-filter
  * hit ranking of `cli/stats.go`, a degree count, not a fixpoint).
  *
  * Integer-exact by construction: ranks live on a 2^20 fixed-point
  * grid and every update is BIGINT multiply + truncating division
  * (`DIV`), so the K-round fixpoint replays bit-identically in any
  * engine that evaluates the same arithmetic — no float accumulation
  * order to drift (the same replayability rule as
  * [[Curate.temperatureSample]] / [[Similarity]]'s quantized paths).
  *
  * Scale shape (100 TB contract): one iteration = one equi-join of the
  * rank relation against the edge relation (shuffle keyed on `src`,
  * broadcast when the node set is small) and one map-side-combinable
  * sum per destination. State per round is O(nodes) + O(edges) — at
  * web scale, millions of domains and pair-bounded edges — never
  * collected to the driver; the loop materializes each round with a
  * localCheckpoint to cut the exponential-lineage problem iterative
  * DataFrame algorithms otherwise hit.
  */
object GraphRank {

  /** Damped PageRank over a weighted digraph, on an integer grid.
    *
    * `edges`: (src, dst, w) with BIGINT-castable weight w > 0.
    * `nodes`: one column naming every node (isolated nodes included —
    * they receive only the teleport term).
    *
    * Update rule, all BIGINT with truncating division:
    * {{{
    *   contrib(v)  = Σ_{u→v} (r(u) * w(u,v)) DIV wtot(u)
    *   r'(v)       = (15 * scale) DIV 100 + (85 * contrib(v)) DIV 100
    * }}}
    * i.e. damping 0.85, teleport mass 0.15·scale per node. Dangling
    * nodes (no out-edges) simply don't redistribute — their mass
    * decays toward the teleport floor, which is deterministic and the
    * usual choice when ranks are compared, not summed to 1.
    *
    * Overflow bound: r ≤ scale · N_reachable and each product takes
    * ×85·w headroom — with scale = 2^20 that leaves ~2^23 of weighted
    * in-degree per node before BIGINT saturates at web-graph sizes;
    * callers with heavier graphs pass a smaller `scale`.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int = 5,
      scale: Long = 1L << 20): DataFrame = {
    require(iters >= 0, s"iters must be ≥ 0, got $iters")
    val nodeCol = nodes.columns.head
    val n = nodes.select(col(nodeCol).as("node")).distinct()
    // w ≤ 0 edges carry no mass in the update rule; dropping them here
    // keeps wtot consistent with the edges that actually contribute
    // (otherwise an all-zero-out-weight node divides by wtot = 0 —
    // NULL in Spark, an error in engines that raise on x DIV 0)
    val e = edges.select(col("src"), col("dst"),
        col("w").cast("long").as("w"))
      .filter(col("w") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val outw = e.groupBy("src").agg(sum("w").as("wtot"))
      val withTot = e.join(outw, "src")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        var r = n.withColumn("r", lit(scale))
        for (_ <- 0 until iters) {
          val contrib = withTot
            .join(r.withColumnRenamed("node", "src"), "src")
            .select(col("dst").as("node"),
              expr("(r * w) DIV wtot").as("c"))
            .groupBy("node").agg(sum("c").as("contrib"))
          r = n.join(contrib, Seq("node"), "left")
            .select(col("node"),
              (lit(15L * scale / 100L) +
                expr(s"(85 * coalesce(contrib, 0L)) DIV 100")).as("r"))
            .localCheckpoint(true)
        }
        r
      } finally withTot.unpersist(false)
    } finally e.unpersist(false)
  }

  /** Rank document sources by syndication centrality: near-dup pairs
    * (MinHash+LSH, [[Dedup.minhashLsh]]) crossing a source boundary
    * become symmetric weighted edges; [[pageRank]] runs `iters` damped
    * rounds over every source (including ones with no syndication
    * edges). Returns (source, rank) — rank on the `scale` fixed-point
    * grid, higher = more central in the copy graph.
    */
  def sourceRank(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, threshold: Double = 0.5, iters: Int = 5,
      scale: Long = 1L << 20): DataFrame = {
    val pairs = Dedup.minhashLsh(docs, idCol, textCol,
      threshold = threshold)
    val src = docs.select(col(idCol).as("_id"),
      col(sourceCol).as("_src"))
    val crossed = pairs
      .join(src.withColumnRenamed("_id", "id_a")
        .withColumnRenamed("_src", "sa"), "id_a")
      .join(src.withColumnRenamed("_id", "id_b")
        .withColumnRenamed("_src", "sb"), "id_b")
      .filter(col("sa") =!= col("sb"))
    val edges = crossed.select(col("sa").as("src"), col("sb").as("dst"))
      .unionAll(crossed.select(col("sb").as("src"), col("sa").as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val nodes = docs.select(col(sourceCol)).distinct()
    pageRank(edges, nodes, iters, scale)
      .select(col("node").as("source"), col("r").as("rank"))
  }
}
