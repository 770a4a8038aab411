package graft

import graft.operators.Pack
import org.apache.spark.sql.functions._

/** Sequence packing: global-order prefix sum and window spans. */
class PackSpec extends SparkSpec {

  test("packSequences: contiguous global token stream, exact window spans") {
    val s = spark
    import s.implicits._
    // token counts 3, 5, 4, 0, 6 in id order; budget 4
    val docs = Seq(
      (1L, "a b c"),
      (2L, "d e f g h"),
      (3L, "i j k l"),
      (4L, "   "),
      (5L, "m n o p q r")).toDF("doc_id", "text")
    val got = Pack.packSequences(docs, "doc_id", "text", tokenBudget = 4)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // starts: 0, 3, 8, 12, 12 — exclusive prefix sums
    assert(got.toSeq == Seq(
      (1L, 3, 0L, 0L, 0L, 0L),   // tokens 0..2   -> window 0
      (2L, 5, 3L, 0L, 1L, 3L),   // tokens 3..7   -> windows 0-1, offset 3
      (3L, 4, 8L, 2L, 2L, 0L),   // tokens 8..11  -> window 2 exactly
      (4L, 0, 12L, 3L, 3L, 0L),  // empty doc sits at its start position
      (5L, 6, 12L, 3L, 4L, 0L))) // tokens 12..17 -> windows 3-4
  }

  test("packCounts packs BPE piece-id streams into fixed-budget context windows") {
    val s = spark
    import s.implicits._
    // the pretrain handoff: documents → BPE piece-id sequences →
    // per-doc piece counts → packed windows. Under 4 merges on the
    // classic fixture, piece counts per doc are 5, 6, 24, 12.
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest")).toDF("doc_id", "text")
    val ids = graft.operators.Bpe.encodeIds(docs, "doc_id", "text", rounds = 4)
    val counts = ids.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val got = Pack.packCounts(counts, "doc_id", tokenBudget = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // starts: 0, 5, 11, 35; windows of 8 pieces
    assert(got.toSeq == Seq(
      (1L, 5L, 0L, 0L, 0L, 0L),    // pieces 0..4   -> window 0
      (2L, 6L, 5L, 0L, 1L, 5L),    // pieces 5..10  -> windows 0-1
      (3L, 24L, 11L, 1L, 4L, 3L),  // pieces 11..34 -> windows 1-4
      (4L, 12L, 35L, 4L, 5L, 3L))) // pieces 35..46 -> windows 4-5
  }

  test("packSequences holds at shuffle.partitions=200 (offsets broadcast-joined, not a when-chain)") {
    val s = spark
    import s.implicits._
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "200")
    try {
      val docs = (1 to 2000)
        .map(i => (i.toLong, (1 to (i % 5 + 1)).map(j => s"w$j").mkString(" ")))
        .toDF("doc_id", "text")
      val got = Pack.packSequences(docs, "doc_id", "text", tokenBudget = 64)
        .orderBy("doc_id").select("doc_id", "start_token")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val expected = (1 to 2000).scanLeft(0L)((acc, i) => acc + (i % 5 + 1))
        .init.zipWithIndex.map { case (st, i) => ((i + 1).toLong, st) }
      assert(got.toSeq == expected)
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("packSequences: prefix sum is partitioning-independent") {
    val s = spark
    import s.implicits._
    // enough rows to span many range partitions; compare against the
    // single-partition truth
    val docs = (1 to 3000)
      .map(i => (i.toLong, (1 to (i % 7 + 1)).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Pack.packSequences(docs, "doc_id", "text", tokenBudget = 64)
      .orderBy("doc_id").select("doc_id", "start_token")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = (1 to 3000).scanLeft(0L)((acc, i) => acc + (i % 7 + 1))
      .init.zipWithIndex.map { case (st, i) => ((i + 1).toLong, st) }
    assert(got.toSeq == expected)
  }
}
