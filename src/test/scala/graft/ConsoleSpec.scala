package graft

import graft.queries.Console
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

class ConsoleSpec extends SparkSpec {

  private object Cat extends Console.Catalog {
    def resolve(s: SparkSession, name: String): DataFrame = name match {
      case "docs" => Tables.load(s, sfDir, "documents")
        .select(col("text").as("_raw"), col("doc_id").as("id"))
      case "ev" => Tables.load(s, sfDir, "events")
        .select(col("event_type").as("_raw"), col("ts"), col("event_id").as("id"))
      case other => fail(s"unknown $other")
    }
  }

  test("select with where-regex and limit (cli/cloudpelican-lsd.go:455-491)") {
    val cmd = Console.parse("select * from docs where 'spark' limit 5")
    assert(cmd == Console.Select("docs", Some("spark"), Some(5), tail = false))
    val got = Console.compile(cmd, Cat, spark).collect()
    assert(got.length == 5)
    assert(got.forall(_.getString(0).contains("spark")))
  }

  test("quoted where-regex may contain keywords like 'limit'") {
    val cmd = Console.parse("select * from docs where 'rate limit exceeded' limit 3")
    assert(cmd == Console.Select("docs", Some("rate limit exceeded"), Some(3),
      tail = false))
    // and executes without error (empty result is fine — pattern is rare)
    Console.compile(cmd, Cat, spark).count()
  }

  test("tail rewrites to last-N by id (cli/cloudpelican-lsd.go:250-259)") {
    val cmd = Console.parse("tail ev")
    assert(cmd == Console.Select("ev", None, Some(10), tail = true))
    val got = Console.compile(cmd, Cat, spark).count()
    assert(got == 10)
  }

  test("stats parses window/rollup durations and gap-fills") {
    val cmd = Console.parse("stats ev window 1d rollup 2h")
    assert(cmd == Console.Stats("ev", 86400L, 7200L))
    val df = Console.compile(cmd, Cat, spark)
    val buckets = df.select("bucket_start").collect().map(_.getLong(0)).sorted
    assert(buckets.forall(_ % 7200 == 0))
    // complete arithmetic series (gap-fill)
    assert(buckets.zip(buckets.tail).forall { case (a, b) => b - a == 7200 })
  }

  test("count emits COUNT(1) (F15)") {
    val got = Console.compile(Console.parse("count docs"), Cat, spark)
      .head().getLong(0)
    assert(got == 500)
  }

  test("cat pipeline routes through GrepQL") {
    val got = Console.compile(
      Console.parse("cat docs | grep -i SPARK | limit 7"), Cat, spark).count()
    assert(got == 7)
  }

  test("unknown verb rejected") {
    intercept[IllegalArgumentException](Console.parse("drop table docs"))
  }

  test("search: raw SQL with catalog-resolved FROM (cli/cloudpelican-lsd.go:322-348)") {
    val cmd = Console.parse(
      "search SELECT count(*) AS n FROM docs WHERE _raw LIKE '%spark%'")
    assert(cmd.asInstanceOf[Console.Search].sources == Seq("docs"))
    val n = Console.compile(cmd, Cat, spark).head().getLong(0)
    // agrees with the grep path over the same source
    val viaGrep = Console.compile(
      Console.parse("cat docs | grep spark"), Cat, spark).count()
    assert(n == viaGrep && n > 0)
    // multi-source search joins two catalog names
    val joined = Console.compile(Console.parse(
      "search SELECT count(*) AS n FROM docs d JOIN ev e ON d.id = e.id"),
      Cat, spark).head().getLong(0)
    assert(joined > 0)
  }
}
