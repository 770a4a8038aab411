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

  test("applies to SQL-string queries too (rule is session-global)") {
    docs.createOrReplaceTempView("rfp_docs")
    val df = spark.sql("SELECT * FROM rfp_docs WHERE text RLIKE 'merge'")
    assert(df.queryExecution.optimizedPlan.toString.contains("Contains"))
    assert(df.count() > 0)
  }
}
