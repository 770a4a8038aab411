package graft

import graft.queries.GrepQL
import org.apache.spark.sql.functions._

class GrepQLSpec extends SparkSpec {
  import GrepQL._

  test("canonical pipeline parses (reference cli/resources/tests/grep_sql.sh)") {
    val p = parse(
      """cat errors | grep -v 404 | grep -i checkout | grep -e "(100|200)" | grep -v -i -e 404""")
    assert(p.source == "errors")
    assert(p.greps == Seq(
      GrepCmd("404", inverse = true),
      GrepCmd("checkout", caseInsensitive = true),
      GrepCmd("(100|200)", regex = true),
      GrepCmd("404", inverse = true, caseInsensitive = true, regex = true)))
    assert(p.sortDesc.isEmpty && p.limit.isEmpty)
  }

  test("grep→SQL translation matches reference shape (cli/grepsql.go:2-3)") {
    val p = parse("""cat errors | grep -v 404 | grep -i checkout | grep -e "(100|200)"""")
    val sql = p.toSql("results", "_raw")
    assert(sql ==
      "SELECT _raw FROM results WHERE NOT _raw LIKE '%404%' ESCAPE '\\' " +
      "AND lower(_raw) LIKE lower('%checkout%') ESCAPE '\\' " +
      "AND regexp_matches(_raw, '(100|200)')")
  }

  test("sort / head / limit stages") {
    assert(parse("cat x | sort").sortDesc.contains(false))
    assert(parse("cat x | sort -r").sortDesc.contains(true))
    assert(parse("cat x | sort - r").sortDesc.contains(true))
    assert(parse("cat x | head").limit.contains(10))
    assert(parse("cat x | limit 42").limit.contains(42))
  }

  test("pipes inside quoted patterns survive") {
    val p = parse("""cat x | grep -e "(a|b)" | grep 'c|d'""")
    assert(p.greps.map(_.pattern) == Seq("(a|b)", "c|d"))
  }

  test("malformed pipelines throw") {
    intercept[IllegalArgumentException](parse("grep x"))
    intercept[IllegalArgumentException](parse("cat x | grep"))
    intercept[IllegalArgumentException](parse("cat x | frobnicate y"))
    intercept[IllegalArgumentException](parse("cat x | limit"))
  }

  test("compile applies predicates / sort / limit on a DataFrame") {
    import spark.implicits._
    val df = Seq("checkout ok 100", "CHECKOUT fail 404", "other 200", "Checkout 200")
      .toDF("_raw")
    val got = parse("""cat t | grep -v 404 | grep -i checkout | grep -e "(100|200)"""")
      .compile(df, "_raw").as[String].collect().toSet
    assert(got == Set("checkout ok 100", "Checkout 200"))
    val sorted = parse("cat t | sort -r | limit 2").compile(df, "_raw")
      .as[String].collect().toSeq
    assert(sorted == Seq("other 200", "checkout ok 100"))
  }
}
