package graft

import graft.operators.Decontaminate
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("overlapPairs finds planted n-gram overlap and counts distinct shared n-grams") {
    val corpus = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "one two three four five six seven eight nine ten",
      3L -> "alpha beta gamma delta epsilon zeta eta theta different tail")
    val bench = docs(
      100L -> "ALPHA beta gamma delta epsilon zeta eta theta iota kappa")
      .select(col("doc_id").as("bench_id"), col("text").as("phrase"))
    val got = Decontaminate.overlapPairs(
        corpus, "doc_id", "text", bench, "bench_id", "phrase", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1 shares all three 8-grams of the bench row (case-folded),
    // doc 3 shares exactly the first one, doc 2 shares none
    assert(got == Set((1L, 100L, 3L), (3L, 100L, 1L)))
  }

  test("sourceOverlap counts distinct shared n-grams per source pair, ordered pairs only") {
    import spark.implicits._
    val corpus = Seq(
      ("mirror_a", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      ("mirror_a", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      ("mirror_b", "ALPHA beta gamma delta epsilon zeta eta theta iota kappa"),
      ("clean", "one two three four five six seven eight nine ten"))
      .toDF("source", "text")
    val got = Decontaminate.sourceOverlap(corpus, "source", "text", n = 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // the mirror pair shares all three case-folded 8-grams, counted
    // once despite mirror_a holding two copies; clean shares nothing
    assert(got == Set(("mirror_a", "mirror_b", 3L)))
  }

  test("documents shorter than n tokens produce no n-grams (no descending sequence)") {
    val corpus = docs(1L -> "only three tokens", 2L -> "")
    val bench = docs(9L -> "only three tokens")
      .select(col("doc_id").as("bench_id"), col("text").as("phrase"))
    assert(Decontaminate.overlapPairs(
      corpus, "doc_id", "text", bench, "bench_id", "phrase", 8).count() == 0)
  }

  test("decontaminate drops flagged docs and keeps the rest") {
    val corpus = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "one two three four five six seven eight nine ten",
      3L -> "clean document with no benchmark overlap at all here")
    val bench = docs(7L -> "alpha beta gamma delta epsilon zeta eta theta")
      .select(col("doc_id").as("bench_id"), col("text").as("phrase"))
    val kept = Decontaminate.decontaminate(
        corpus, "doc_id", "text", bench, "bench_id", "phrase", 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("scrubSpans cuts the contaminated span, keeps the rest, case-insensitively") {
    // 16 tokens: the bench 8-gram sits at positions 4..11 (uppercased
    // in the corpus — matching must fold case, output must keep it).
    // A hit START at 4 covers exactly the 8 span tokens via the
    // trailing window, so the lead-in (0..3) and tail (12..15) survive.
    val corpus = docs(
      1L -> ("lead1 lead2 lead3 lead4 ALPHA beta gamma delta epsilon " +
        "zeta eta THETA tail1 tail2 tail3 tail4"),
      2L -> "totally unrelated text with nothing shared at all whatsoever",
      3L -> "short")
    val bench = docs(
        100L -> "alpha beta gamma delta epsilon zeta eta theta")
      .select(col("text").as("phrase"))
    val got = Decontaminate.scrubSpans(corpus, "doc_id", "text",
        bench, "phrase", 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "lead1 lead2 lead3 lead4 tail1 tail2 tail3 tail4")
    assert(got(2L) == "totally unrelated text with nothing shared at all whatsoever")
    assert(got(3L) == "short")
    // a full-copy document dissolves entirely
    val full = docs(9L -> "alpha beta gamma delta epsilon zeta eta theta")
    assert(Decontaminate.scrubSpans(full, "doc_id", "text", bench,
      "phrase", 8).collect().map(_.getString(1)).toSeq == Seq(""))
  }

  test("bloomDecontaminate equals exact decontaminate, including at minShared > 1") {
    val corpus = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "one two three four five six seven eight nine ten",
      3L -> "alpha beta gamma delta epsilon zeta eta theta different tail",
      4L -> "clean document with no benchmark overlap at all here")
    val bench = docs(7L -> "ALPHA beta gamma delta epsilon zeta eta theta iota kappa")
      .select(col("doc_id").as("bench_id"), col("text").as("phrase"))
    for (minShared <- Seq(1L, 2L)) {
      val exact = Decontaminate.decontaminate(corpus, "doc_id", "text",
          bench, "bench_id", "phrase", 8, minShared)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val bloomed = Decontaminate.bloomDecontaminate(corpus, "doc_id", "text",
          bench, "bench_id", "phrase", 8, minShared)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(bloomed == exact, s"minShared=$minShared")
    }
    // doc 3 shares exactly one 8-gram: dropped at minShared=1, kept at 2
    assert(Decontaminate.bloomDecontaminate(corpus, "doc_id", "text",
        bench, "bench_id", "phrase", 8, minShared = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L, 3L, 4L))
  }

  test("bloomDecontaminate with an empty or too-short benchmark keeps the whole corpus") {
    val corpus = docs(1L -> "a b c d e f g h i j")
    val bench = docs(9L -> "too short")
      .select(col("doc_id").as("bench_id"), col("text").as("phrase"))
    assert(Decontaminate.bloomDecontaminate(corpus, "doc_id", "text",
      bench, "bench_id", "phrase", 8).count() == 1)
  }

  test("bloom prefilter plan probes the bitmap predicate, not a first join") {
    val corpus = docs(1L -> "a b c d e f g h i j")
    val bench = docs(9L -> "a b c d e f g h")
      .select(col("doc_id").as("bench_id"), col("text").as("phrase"))
    val plan = Decontaminate.bloomDecontaminate(
        corpus, "doc_id", "text", bench, "bench_id", "phrase", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"corpus grams should probe the bloom bitmap before any join:\n$plan")
  }

  test("decontamination plan broadcasts the benchmark side") {
    val corpus = docs(1L -> "a b c d e f g h i j")
    val bench = docs(9L -> "a b c d e f g h")
      .select(col("doc_id").as("bench_id"), col("text").as("phrase"))
    val plan = Decontaminate.overlapPairs(
      corpus, "doc_id", "text", bench, "bench_id", "phrase", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"benchmark side should broadcast:\n$plan")
  }
}
