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

  test("(?i) subject-side fold deviation is exactly Unicode-vs-ASCII, pinned") {
    import spark.implicits._
    // Kelvin sign U+212A lower-cases to 'k': the rewrite
    // Contains(lower(t), "kelvin") matches it, Java's ASCII-only (?i)
    // does not — the documented ASCII-subject assumption. The rewrite
    // agrees with the UNICODE_CASE regex `(?iu)` on the same fixture,
    // so the deviation is precisely "(?i) behaves as (?iu)".
    // via parquet, not a local Seq: ConvertToLocalRelation would
    // otherwise evaluate the ORIGINAL RLike before the rewrite runs
    val dir = java.nio.file.Files.createTempDirectory("rfp-kelvin").toString
    val kelvinRow = "\u212Aelvin sign" // KELVIN SIGN + "elvin sign"
    val rows = Seq("pure ascii kelvin", "SHOUTY KELVIN", kelvinRow)
    rows.toDF("t").write.mode("overwrite").parquet(dir)
    val tricky = spark.read.parquet(dir)
    val p = tricky.filter(col("t").rlike("(?i)kelvin"))
      .queryExecution.optimizedPlan.toString
    assert(p.contains("Contains") && !p.contains("RLIKE"),
      s"ci rewrite did not apply:\n$p")
    val viaRule = tricky.filter(col("t").rlike("(?i)kelvin"))
      .as[String].collect().toSet
    assert(viaRule == rows.toSet) // lower() folds U+212A -> 'k'
    // ground truths, regex-evaluated OUTSIDE the session (no rewrite)
    def re(flags: String) = java.util.regex.Pattern.compile(flags + "kelvin")
    val asciiCi = rows.filter(s => re("(?i)").matcher(s).find()).toSet
    val unicodeCi = rows.filter(s => re("(?iu)").matcher(s).find()).toSet
    assert(asciiCi == Set("pure ascii kelvin", "SHOUTY KELVIN"),
      "fixture no longer exercises the ASCII-only fold")
    assert(viaRule == unicodeCi,
      "rewrite must coincide with (?iu) Unicode-case semantics")
  }

  test("applies to SQL-string queries too (rule is session-global)") {
    docs.createOrReplaceTempView("rfp_docs")
    val df = spark.sql("SELECT * FROM rfp_docs WHERE text RLIKE 'merge'")
    assert(df.queryExecution.optimizedPlan.toString.contains("Contains"))
    assert(df.count() > 0)
  }
}
