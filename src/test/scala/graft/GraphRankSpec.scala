package graft

import graft.operators.GraphRank
import graft.sources.Tables
import org.apache.spark.sql.functions._

class GraphRankSpec extends SparkSpec {

  private val scale = 1L << 20
  private val teleport = 15L * scale / 100L

  test("pageRank: symmetric pair converges to equal ranks, isolated node to the teleport floor") {
    val s = spark
    import s.implicits._
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val nodes = Seq("a", "b", "z").toDF("node")
    val got = GraphRank.pageRank(edges, nodes, iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") == got("b")) // symmetry is preserved exactly
    assert(got("z") == teleport) // no in-edges → teleport term only
    assert(got("a") > got("z")) // recirculated mass beats the floor
  }

  test("pageRank: star center out-ranks its leaves and the fixpoint is replayable") {
    val s = spark
    import s.implicits._
    // undirected star: hub h ↔ leaves l1..l4
    val leaves = (1 to 4).map(i => s"l$i")
    val edges = leaves.flatMap(l => Seq(("h", l, 1L), (l, "h", 1L)))
      .toDF("src", "dst", "w")
    val nodes = ("h" +: leaves).toDF("node")
    def run() = GraphRank.pageRank(edges, nodes, iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = run()
    assert(leaves.forall(l => got("h") > got(l)))
    assert(leaves.map(got).distinct.size == 1) // leaves are symmetric
    assert(run() == got) // integer grid → bit-identical replay
  }

  test("pageRank: weighted edges split a node's mass proportionally") {
    val s = spark
    import s.implicits._
    // u sends 3/4 of its mass to v, 1/4 to w (weights 3 and 1)
    val edges = Seq(("u", "v", 3L), ("u", "w", 1L)).toDF("src", "dst", "w")
    val nodes = Seq("u", "v", "w").toDF("node")
    val got = GraphRank.pageRank(edges, nodes, iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // one round from uniform scale: contrib(v) = (scale*3) DIV 4, etc.
    assert(got("v") == teleport + 85L * (scale * 3L / 4L) / 100L)
    assert(got("w") == teleport + 85L * (scale * 1L / 4L) / 100L)
    assert(got("u") == teleport) // dangling-free but no in-edges
  }

  test("pageRank: zero-weight edges carry no mass and cannot divide by zero") {
    val s = spark
    import s.implicits._
    // u's only out-edges have w = 0 — it must behave as dangling, not
    // emit a NULL-division rank; the w=0 edge into v adds nothing
    val edges = Seq(("u", "v", 0L), ("a", "v", 1L)).toDF("src", "dst", "w")
    val nodes = Seq("u", "v", "a").toDF("node")
    val got = GraphRank.pageRank(edges, nodes, iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val clean = GraphRank.pageRank(
      Seq(("a", "v", 1L)).toDF("src", "dst", "w"), nodes, iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == clean) // zero-weight edges ≡ absent edges
  }

  test("sourceRank covers every source and rewards syndication centrality") {
    val docs = Tables.load(spark, sfDir, "documents")
    val ranks = GraphRank.sourceRank(docs, "doc_id", "text", "source",
      threshold = 0.5, iters = 5)
    val got = ranks.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nSources = docs.select("source").distinct().count()
    assert(got.size == nSources) // isolated sources still ranked
    assert(got.values.forall(_ >= teleport)) // floor holds everywhere
    // the fixture has cross-source near-dups, so someone must sit
    // above the teleport floor
    assert(got.values.max > teleport)
  }
}
