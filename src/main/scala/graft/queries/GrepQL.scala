package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The user-facing grep-pipeline query language of the reference CLI
  * (`cli/grepsql.go:29-198`, canonical example `cli/resources/tests/
  * grep_sql.sh:1`):
  *
  *   cat errors | grep -v 404 | grep -i checkout | grep -e "(100|200)" | sort | head
  *
  * The reference translates this to a BigQuery SQL string and ships it
  * over HTTP; here it compiles directly to a Catalyst plan (predicates
  * land in the parquet scan as pushed filters), and — for the oracle —
  * to an equivalent ANSI/DuckDB SQL string via [[GrepPipeline.toSql]].
  *
  * Grammar (per `cli/grepsql.go:104-143`):
  *   pipeline := cat <name> ( '|' stage )*
  *   stage    := grep [-v] [-i] [-e] <pattern>   -- AND-ed predicates
  *             | sort [ - r ]                    -- ORDER BY raw ASC|DESC
  *             | head                            -- LIMIT 10
  *             | limit <n>
  */
object GrepQL {

  final case class GrepCmd(
      pattern: String,
      inverse: Boolean = false,
      caseInsensitive: Boolean = false,
      regex: Boolean = false) {

    /** Catalyst predicate for this grep over `raw`
      * (reference `cli/grepsql.go:29-59`). */
    def predicate(raw: Column): Column = {
      val base =
        if (regex) {
          val p = if (caseInsensitive) s"(?i)$pattern" else pattern
          raw.rlike(p)
        } else if (caseInsensitive) {
          lower(raw).contains(pattern.toLowerCase(java.util.Locale.ROOT))
        } else raw.contains(pattern)
      if (inverse) !base else base
    }

    /** DuckDB-runnable SQL predicate, mirroring the reference's
      * grep→SQL translation (`cli/grepsql.go:44-58`). Non-regex greps
      * are LITERAL substring tests on the Spark side, so LIKE
      * metacharacters (% _ \) are escaped with an ESCAPE clause to
      * keep both sides equivalent.
      */
    def toSql(rawCol: String): String = {
      val esc = pattern.replace("'", "''")
      def likeEsc = esc.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
      val base =
        if (regex) {
          val p = if (caseInsensitive) s"(?i)$esc" else esc
          s"regexp_matches($rawCol, '$p')"
        } else if (caseInsensitive) {
          s"lower($rawCol) LIKE lower('%$likeEsc%') ESCAPE '\\'"
        } else s"$rawCol LIKE '%$likeEsc%' ESCAPE '\\'"
      if (inverse) s"NOT $base" else base
    }
  }

  final case class GrepPipeline(
      source: String,
      greps: Seq[GrepCmd],
      sortDesc: Option[Boolean], // None = no sort; Some(false)=ASC
      limit: Option[Int]) {

    /** Compile onto a DataFrame whose `rawCol` holds the log line.
      * Sort is by the raw text, matching the reference
      * (`cli/grepsql.go:186-188` sorts `_raw`, not ts); `tieBreak`
      * columns make the order total for oracle determinism.
      */
    def compile(df: DataFrame, rawCol: String,
        tieBreak: Seq[String] = Nil): DataFrame = {
      val filtered = greps.foldLeft(df)((d, g) => d.filter(g.predicate(col(rawCol))))
      val sorted = sortDesc match {
        case Some(desc) =>
          val key = if (desc) col(rawCol).desc else col(rawCol).asc
          val ties = tieBreak.map(c => if (desc) col(c).desc else col(c).asc)
          filtered.orderBy(key +: ties: _*)
        case None => filtered
      }
      limit.fold(sorted)(sorted.limit)
    }

    /** Emit the equivalent SQL (DuckDB dialect) over `table`/`rawCol` —
      * shape per `cli/grepsql.go:161-198`. */
    def toSql(table: String, rawCol: String, extraCols: Seq[String] = Nil,
        tieBreak: Seq[String] = Nil): String = {
      val cols = (extraCols :+ rawCol).distinct.mkString(", ")
      val where =
        if (greps.isEmpty) ""
        else " WHERE " + greps.map(_.toSql(rawCol)).mkString(" AND ")
      val order = sortDesc match {
        case Some(desc) =>
          val dir = if (desc) "DESC" else "ASC"
          val keys = (rawCol +: tieBreak).map(c => s"$c $dir").mkString(", ")
          s" ORDER BY $keys"
        case None => ""
      }
      val lim = limit.fold("")(n => s" LIMIT $n")
      s"SELECT $cols FROM $table$where$order$lim"
    }
  }

  /** Split on `|` outside single/double quotes (patterns like
    * `"(100|200)"` must survive — reference tokenizes with
    * text/scanner, `cli/grepsql.go:61-103`).
    */
  private def splitStages(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    s.foreach { ch =>
      if (quote != 0) { if (ch == quote) quote = 0; cur += ch }
      else if (ch == '"' || ch == '\'') { quote = ch; cur += ch }
      else if (ch == '|') { out += cur.result(); cur.clear() }
      else cur += ch
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Tokenize one stage, honoring quoted patterns. */
  private def tokenize(stage: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    stage.foreach { ch =>
      if (quote != 0) { if (ch == quote) quote = 0 else cur += ch }
      else if (ch == '"' || ch == '\'') quote = ch
      else if (ch.isWhitespace) { if (cur.nonEmpty) { out += cur.result(); cur.clear() } }
      else cur += ch
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }

  /** Parse a full pipeline string. Throws IllegalArgumentException on
    * malformed input (reference validates similarly and errors).
    */
  def parse(input: String): GrepPipeline = {
    val stages = splitStages(input)
    require(stages.nonEmpty, "empty pipeline")
    val head0 = tokenize(stages.head)
    require(head0.length == 2 && head0.head == "cat",
      s"pipeline must start with 'cat <name>': ${stages.head}")
    val source = head0(1)

    var greps = Vector.empty[GrepCmd]
    var sortDesc: Option[Boolean] = None
    var limit: Option[Int] = None

    stages.tail.foreach { st =>
      val toks = tokenize(st)
      toks.head match {
        case "grep" =>
          var inverse = false; var ci = false; var re = false
          val rest = toks.tail
          val flagToks = rest.takeWhile(_.startsWith("-"))
          flagToks.foreach {
            case "-v" => inverse = true
            case "-i" => ci = true
            case "-e" => re = true
            case f    => throw new IllegalArgumentException(s"unknown grep flag $f")
          }
          val pat = rest.drop(flagToks.length)
          require(pat.nonEmpty, s"grep needs a pattern: $st")
          greps :+= GrepCmd(pat.mkString(" "), inverse, ci, re)
        case "sort" =>
          // `sort - r` / `sort -r` → DESC (reference `cli/grepsql.go:104-111`)
          sortDesc = Some(toks.tail.exists(t => t == "r" || t == "-r"))
        case "head"  => limit = Some(10)
        case "limit" =>
          require(toks.length == 2, s"limit needs a count: $st")
          limit = Some(toks(1).toInt)
        case other => throw new IllegalArgumentException(s"unknown stage: $other")
      }
    }
    GrepPipeline(source, greps, sortDesc, limit)
  }
}
