package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

class RegexFastPathSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("word-only rlike is rewritten to Contains in the optimized plan") {
    val plan = docs.filter(col("text").rlike("spark"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Contains"), s"no Contains in:\n$plan")
    assert(!plan.contains("RLIKE"), s"RLIKE survived:\n$plan")
  }

  test("(?i)word rlike becomes Contains(lower(x), word)") {
    val plan = docs.filter(col("text").rlike("(?i)SPARK"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Contains") && plan.contains("lower"),
      s"missing fast path in:\n$plan")
    assert(!plan.contains("RLIKE"))
  }

  test("real regex patterns are left untouched") {
    val plan = docs.filter(col("text").rlike("(join|merge)"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("RLIKE"), s"regex wrongly rewritten:\n$plan")
  }

  test("rewrite preserves results (word + ci word vs regex semantics)") {
    val viaRule = docs.filter(col("text").rlike("spark")).count()
    val viaContains = docs.filter(col("text").contains("spark")).count()
    assert(viaRule == viaContains && viaRule > 0)
    val ci = docs.filter(col("text").rlike("(?i)SPARK")).count()
    assert(ci == viaRule)
  }

  test("^word rlike is rewritten to StartsWith; word$ is NOT (trailing-terminator semantics)") {
    import spark.implicits._
    val p1 = docs.filter(col("text").rlike("^key"))
      .queryExecution.optimizedPlan.toString
    assert(p1.contains("StartsWith") && !p1.contains("RLIKE"),
      s"anchored prefix not rewritten:\n$p1")
    val p2 = docs.filter(col("text").rlike("(?i)^KEY"))
      .queryExecution.optimizedPlan.toString
    assert(p2.contains("StartsWith") && p2.contains("lower") &&
      !p2.contains("RLIKE"), s"ci anchored prefix not rewritten:\n$p2")
    // equivalence on real data
    val viaRule = docs.filter(col("text").rlike("^key")).count()
    val viaStarts = docs.filter(col("text").startsWith("key")).count()
    assert(viaRule == viaStarts && viaRule > 0)
    // `$` must stay a regex: Java's $ also matches before a trailing
    // line terminator, which EndsWith does not
    val p3 = docs.filter(col("text").rlike("key$"))
      .queryExecution.optimizedPlan.toString
    assert(p3.contains("RLIKE"), s"suffix anchor wrongly rewritten:\n$p3")
    val tricky = Seq("x key", "x key\n").toDF("t")
    assert(tricky.filter(col("t").rlike("key$")).count() == 2L)
  }

  test("applies to SQL-string queries too (rule is session-global)") {
    docs.createOrReplaceTempView("rfp_docs")
    val df = spark.sql("SELECT * FROM rfp_docs WHERE text RLIKE 'merge'")
    assert(df.queryExecution.optimizedPlan.toString.contains("Contains"))
    assert(df.count() > 0)
  }
}
