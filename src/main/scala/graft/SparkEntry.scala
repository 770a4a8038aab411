package graft

import graft.functions.{LogFunctions, TextFunctions}
import graft.model.FilterDef
import graft.operators.{FilterFanout, StatsRollup, Tail}
import graft.queries.GrepQL
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — every implemented operator from SURVEY.md §2 is
  * exposed as a named query with (where SQL-expressible) a DuckDB
  * oracle that must hash-match.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Canonical filter registry used by fan-out queries (shape per
    * reference `supervisor/filter_manager.go:49-57`; patterns chosen to
    * exercise the word fast-path, the (?i) fast-path, and real regex —
    * reference `Filter.java:33-52`).
    */
  private val registry = Seq(
    FilterDef("f_word", "spark_word", "spark"),
    FilterDef("f_ci", "spark_ci", "(?i)SPARK"),
    FilterDef("f_re", "join_or_merge", "(join|merge)"),
    FilterDef("f_anchor", "starts_the", "^the "))

  private def registryValuesSql: String =
    registry.map(f => s"('${f.id}', '${f.regex}')").mkString(", ")

  /** SQL fragment: the 25-word error lexicon test over a column —
    * mirrors [[LogFunctions.containsErrorWord]] for the oracle.
    */
  private def errorLexiconSql(col: String): String =
    LogFunctions.ErrorWords
      .map(w => s"lower($col) LIKE '%$w%'").mkString("(", " OR ", ")")

  // ---------------------------------------------------------------------
  // Query definitions: (name, spark plan, optional DuckDB oracle SQL)
  // ---------------------------------------------------------------------

  private type Q = (SparkSession, String) => DataFrame

  private def defs: Seq[(String, Q, Option[String])] = Seq(

    // --- GrepQL surface (SURVEY §2.2 P4-P6, §2.6 O1-O3, §2.11 #1-4) ---
    qGrep("q_grep_like", "cat documents | grep spark"),
    qGrep("q_grep_ci_inv", "cat documents | grep -v batch | grep -i SPARK"),
    qGrep("q_grep_regex", "cat documents | grep -e \"(join|merge)\""),
    qGrep("q_grep_pipeline",
      "cat documents | grep -v batch | grep -i SPARK | grep -e \"(join|merge)\" | sort | limit 50"),
    qGrep("q_grep_sort_desc", "cat documents | grep query | sort -r | limit 25"),

    // --- tail / cursor / count (O4, O5, F15) ---
    ("q_tail_lastn",
      (s: SparkSession, dir: String) =>
        Tail.lastN(t(s, dir, "events"), 50, Seq("event_id"))
          .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"),
            col("event_type")),
      Some("""SELECT event_id, epoch_ms(ts) AS ts_ms, event_type
             |FROM events ORDER BY event_id DESC LIMIT 50""".stripMargin)),
    ("q_cursor_offset",
      (s: SparkSession, dir: String) =>
        Tail.afterOffset(t(s, dir, "events"), "event_id", 900)
          .select("event_id", "event_type"),
      Some("SELECT event_id, event_type FROM events WHERE event_id > 900")),
    ("q_count",
      (s: SparkSession, dir: String) =>
        t(s, dir, "events").agg(count(lit(1)).as("cnt")),
      Some("SELECT count(1) AS cnt FROM events")),

    // --- stats rollup + gap-fill (A1-A4, §2.11 #6) ---
    ("q_stats_rollup",
      (s: SparkSession, dir: String) => {
        val ev = t(s, dir, "events")
        val rolled = StatsRollup.rollup(ev, "ts", 3600, Seq("event_type"))
        StatsRollup.gapFill(rolled, Seq("event_type"), stepSec = 3600)
      },
      Some("""WITH counts AS (
             |  SELECT event_type,
             |         CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_start,
             |         count(*) AS cnt
             |  FROM events GROUP BY 1, 2),
             |bounds AS (SELECT min(bucket_start) AS lo, max(bucket_start) AS hi FROM counts),
             |series AS (SELECT CAST(unnest(generate_series(b.lo, b.hi, 3600)) AS BIGINT) AS bucket_start
             |           FROM bounds b),
             |keys AS (SELECT DISTINCT event_type FROM events)
             |SELECT k.event_type, s.bucket_start, COALESCE(c.cnt, 0) AS cnt
             |FROM keys k CROSS JOIN series s
             |LEFT JOIN counts c
             |  ON c.event_type = k.event_type AND c.bucket_start = s.bucket_start""".stripMargin)),
    ("q_stats_window",
      (s: SparkSession, dir: String) => {
        val ev = t(s, dir, "events")
        val nowSec = ev.agg(max(unix_timestamp(col("ts")))).head().getLong(0)
        val windowed = StatsRollup.windowFilter(ev, "ts", 172800, nowSec)
        StatsRollup.rollup(windowed, "ts", 21600, Seq("event_type"))
      },
      Some("""WITH now_s AS (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS n FROM events)
             |SELECT event_type,
             |       CAST(floor(epoch(ts)/21600)*21600 AS BIGINT) AS bucket_start,
             |       count(*) AS cnt
             |FROM events, now_s
             |WHERE floor(epoch(ts)) >= n - 172800
             |GROUP BY 1, 2""".stripMargin)),

    // --- error lexicon series (M1 deterministic half, §2.11 #7) ---
    ("q_error_series",
      (s: SparkSession, dir: String) => {
        val ev = t(s, dir, "events")
          .filter(LogFunctions.containsErrorWord(col("event_type")))
        StatsRollup.rollup(ev, "ts", 3600, Seq.empty)
          .withColumn("metric", lit(2))
      },
      Some(s"""SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_start,
              |       count(*) AS cnt, 2 AS metric
              |FROM events WHERE ${errorLexiconSql("event_type")}
              |GROUP BY 1""".stripMargin)),

    // --- filter fan-out (P2/P3, §2.3 broadcast NL join, §2.11 #9) ---
    ("q_filter_fanout",
      (s: SparkSession, dir: String) =>
        FilterFanout.explodeMatches(t(s, dir, "documents"), "text", registry)
          .select("filter_id", "doc_id"),
      Some(s"""SELECT f.filter_id, d.doc_id
              |FROM documents d
              |JOIN (VALUES $registryValuesSql) f(filter_id, regex)
              |  ON regexp_matches(d.text, f.regex)""".stripMargin)),
    ("q_filter_match_counts",
      (s: SparkSession, dir: String) =>
        FilterFanout.matchCounts(t(s, dir, "documents"), "text", registry),
      Some(s"""SELECT f.filter_id, count(1) AS matches
              |FROM documents d
              |JOIN (VALUES $registryValuesSql) f(filter_id, regex)
              |  ON regexp_matches(d.text, f.regex)
              |GROUP BY 1""".stripMargin)),

    // --- daily partition routing (F6/S6, §2.11 #10) ---
    ("q_date_partition",
      (s: SparkSession, dir: String) =>
        t(s, dir, "events")
          .groupBy(LogFunctions.dateSuffix(col("ts")).as("date"))
          .agg(count(lit(1)).as("cnt")),
      Some("""SELECT strftime(ts, '%Y_%m_%d') AS date, count(*) AS cnt
             |FROM events GROUP BY 1""".stripMargin)),

    // --- relational surface: aggregation (A5/A6 free built-ins) ---
    ("q1_agg",
      (s: SparkSession, dir: String) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum("l_quantity").cast("bigint").as("sum_qty"),
            sum(round(col("l_extendedprice") * 100).cast("bigint"))
              .as("sum_base_cents"),
            count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             |       count(*) AS cnt
             |FROM lineitem GROUP BY 1, 2""".stripMargin))
  )

  private def qGrep(name: String, pipeline: String): (String, Q, Option[String]) = {
    val parsed = GrepQL.parse(pipeline)
    ((name,
      (s: SparkSession, dir: String) =>
        parsed.compile(t(s, dir, "documents"), "text", tieBreak = Seq("doc_id"))
          .select("doc_id", "text"),
      Some(parsed.toSql("documents", "text",
        extraCols = Seq("doc_id"), tieBreak = Seq("doc_id")))))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_grep_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (n, q, _) => n -> q }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
