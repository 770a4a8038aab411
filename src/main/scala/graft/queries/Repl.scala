package graft.queries

import graft.operators.{FilterFanout, FilterRegistry}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interactive console — the reference CLI's REPL
  * (`cli/cloudpelican-lsd.go:176-303`) over the Spark engine.
  *
  * Supported verbs: the [[Console]] query surface plus filter
  * management (`supervisor/supervisor.go:416-448` API equivalents):
  *
  *   create filter <name> <regex>
  *   show filters
  *   show stats <filter>      (durable stats table, when configured)
  *   remove filter <name>
  *   maintain [root]          (TTL + compaction, [[graft.streaming.Maintenance]])
  *   hybrid <token> [token...] (two-tower lexical∪vector retrieval,
  *                              [[graft.operators.Retrieval]])
  *   history / clearhistory / save / clearsession
  *                            (session conveniences,
  *                             `cli/cloudpelican-lsd.go:204-220`)
  *   cat/select/tail/stats/count ...
  *   quit
  *
  * Reads stdin line-by-line, prints result rows (up to 20) — designed
  * to be driven by a human or a pipe.
  *
  * Usage: runMain graft.queries.Repl <sfDir> [registryPath] [statsPath]
  */
object Repl {

  /** Metric-2 (error) series for the stats chart: the same
    * window/rollup pipeline over the rows the error lexicon labels as
    * errors — the batch face of the classifier's metric-2 counters
    * (`cli/stats.go:69-90` draws them as `*` over the `o` series).
    * Empty when the source has no error-labeled rows.
    */
  private[graft] def errorSeries(base: DataFrame,
      st: Console.Stats): Seq[(Long, Long)] = {
    if (!base.columns.contains("ts") || !base.columns.contains("_raw"))
      return Seq.empty
    val isErr = graft.functions.LogFunctions.ErrorWords
      .map(w => lower(col("_raw")).contains(lit(w)))
      .reduce(_ || _)
    // pin `now` the same way Console.compile does so both series share
    // bucket alignment
    val now = base.agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    val errBase = base.filter(isErr)
    if (errBase.isEmpty) return Seq.empty
    graft.operators.StatsRollup
      .statsQuery(errBase, "ts", Seq.empty, st.windowSec, st.rollupSec, now)
      .orderBy("bucket_start").collect()
      .map(r => (r.getAs[Long]("bucket_start"), r.getAs[Long]("cnt")))
      .toSeq
  }

  /** One-shot command session shared by the interactive loop and the
    * Slack gateway ([[SlackGateway]]): executes a single console line
    * and returns the rendered output — the same contract as the
    * reference CLI's `-e` flag (`cli/cloudpelican-lsd.go:118-131`),
    * which the Slack handler shells out to
    * (`supervisor/supervisor.go:155-160`).
    */
  final class Session(spark: SparkSession, sfDir: String,
      val registry: FilterRegistry, statsPath: Option[String] = None,
      sessionPath: Option[String] = None) {

    // Command history — the reference console's session conveniences
    // (`cli/cloudpelican-lsd.go:204-220`, `consoleAddHistory` at
    // :669-682: every line appends, FIFO-purged at 100; `history`
    // prints numbered; `clearhistory` empties; `save` persists the
    // session; `clearsession` wipes session state). Our session state
    // is the history plus the registry's TEMP filters; named filters
    // persist through the registry's own path, exactly as the
    // reference keeps filters supervisor-side while session/history
    // live in the CLI's conf file.
    private val history = scala.collection.mutable.ArrayBuffer.empty[String]
    private val HistoryMax = 100 // consoleAddHistory's max
    sessionPath.foreach { p =>
      val f = new java.io.File(p)
      if (f.isFile) {
        // Files.readAllLines closes the handle; keep only the NEWEST
        // HistoryMax entries so an oversized (hand-edited) session
        // file cannot exceed the documented 100-entry FIFO bound
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(f.toPath,
            java.nio.charset.StandardCharsets.UTF_8)
          .asScala.filter(_.nonEmpty).takeRight(HistoryMax)
          .foreach(history += _)
      }
    }
    private def addHistory(cmd: String): Unit = {
      history += cmd
      if (history.length > HistoryMax) history.remove(0)
    }
    private def saveSession(): Unit = sessionPath.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (history.mkString("\n") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

    // The results "table": fixture docs as matched lines, fanned out
    // over the registered filters on demand (batch stand-in for the
    // streaming results store).
    def catalog: Console.Catalog = new Console.Catalog {
      def resolve(s: SparkSession, name: String): DataFrame = {
        val docs = Tables.load(s, sfDir, "documents")
          .select(col("text").as("_raw"), col("doc_id").as("id"))
        registry.byName(name) match {
          case Some(f) =>
            docs.filter(FilterFanout.predicate(col("_raw"), f.regex))
          case None if name == "docs" => docs
          case None if name == "ev" =>
            // the event stream as a stats-capable source (ts column)
            Tables.load(s, sfDir, "events")
              .select(col("event_type").as("_raw"), col("ts"),
                col("event_id").as("id"))
          case None =>
            throw new IllegalArgumentException(s"no filter named '$name'")
        }
      }
    }

    /** Execute one console line, returning its printed form. Errors
      * render as `ERR <message>` like the interactive loop.
      */
    def exec(t: String): String = {
      val out = new StringBuilder
      try {
        val lower = t.toLowerCase(java.util.Locale.ROOT)
        addHistory(t.trim) // every line, like _handleConsole:202
        if (lower == "history") {
          // printHistory (:663-667): numbered from 0
          history.zipWithIndex.foreach { case (cmd, i) =>
            out ++= s"$i $cmd\n"
          }
        } else if (lower == "clearhistory") {
          history.clear()
          saveSession()
          out ++= "Cleared history\n"
        } else if (lower == "save") {
          // save (:709-713): persist the session state
          if (sessionPath.isEmpty)
            out ++= "ERR no session file configured for this session\n"
          else { saveSession(); out ++= "Saved session\n" }
        } else if (lower == "clearsession") {
          // clearSession (:684-692): wipe session state — here the
          // history and the registry's TEMP filters (named filters
          // persist through the registry path, like the reference
          // keeps them supervisor-side)
          history.clear()
          registry.list().filter(_.temp).foreach(f => registry.drop(f.id))
          saveSession()
          out ++= "Cleared session\n"
        } else if (lower.startsWith("create filter ")) {
          val rest = t.drop("create filter ".length).split("\\s+", 2)
          val f = registry.create(rest(0), rest(1))
          out ++= s"filter created: ${f.name} (${f.id})\n"
        } else if (lower == "show filters") {
          registry.list().foreach(f =>
            out ++= s"${f.name}\t${f.regex}\t${f.id}\n")
          out ++= s"${registry.list().size} filter(s)\n"
        } else if (lower.startsWith("show stats ")) {
          // the reference CLI's stats chart over the supervisor's
          // PERSISTED store (BoltDB series, `cli/stats.go:59-201`) —
          // reads the durable parquet stats table, metric-1 as `o`
          // and metric-2 (classifier errors) as `*`
          statsPath match {
            case None =>
              out ++= "ERR no durable stats table configured for this session\n"
            case Some(p) =>
              val name = t.drop("show stats ".length).trim
              val fid = registry.byName(name).map(_.id).getOrElse(name)
              val rows = graft.streaming.LogPipeline.readStatsTable(spark, p)
                .filter(col("filter_id") === fid)
                .orderBy("bucket").collect()
              def series(m: Int) = rows.filter(_.getAs[Int]("metric") == m)
                .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("cnt"))).toSeq
              out ++= Chart.render(series(1), series(2))
          }
        } else if (lower == "maintain" || lower.startsWith("maintain ")) {
          // one-verb upkeep: TTL + compaction over a pipeline root
          // (results + stats tables) — `maintain <root>`, or bare
          // `maintain` when a durable stats table is configured (its
          // parent is the root by convention)
          val arg = t.drop("maintain".length).trim
          // hadoop Path, not java.io.File: File.getParent mangles URI
          // paths (s3a://bucket/pipe/stats -> s3a:/bucket/pipe) and is
          // null for a bare relative segment
          val root =
            if (arg.nonEmpty) Some(arg)
            else statsPath.flatMap(p => Option(
              new org.apache.hadoop.fs.Path(p).getParent).map(_.toString))
          root match {
            case None =>
              out ++= "ERR maintain <pipeline-root> (no durable tables configured)\n"
            case Some(r) =>
              out ++= graft.streaming.Maintenance.run(spark, r).render
          }
        } else if (lower == "hybrid" || lower.startsWith("hybrid ")) {
          // hybrid retrieval verb (the CLI `search` verb's two-tower
          // successor, cli/cloudpelican-lsd.go:322-348): BM25 lexical
          // tower over the query tokens ∪ cosine vector tower seeded
          // by the TOP LEXICAL HIT's embedding ("more like the best
          // match" — one-document pseudo-relevance feedback), fused by
          // RRF (graft.operators.Retrieval). Deterministic end to end.
          val toks = t.drop("hybrid".length).trim
            .split("\\s+").toSeq.filter(_.nonEmpty)
            .map(_.toLowerCase(java.util.Locale.ROOT))
          if (toks.isEmpty) out ++= "ERR hybrid <token> [token...]\n"
          else {
            val docs = Tables.load(spark, sfDir, "documents")
            // vec_id 0 is the fixture's reserved QUERY pseudo-vector
            // everywhere in this codebase — it must not enter the
            // corpus tower (it would rank a foreign vector and eat a
            // rank slot)
            val emb = Tables.load(spark, sfDir, "embeddings")
              .filter(col("vec_id") > 0)
            // ONE lexical tower serves both the seed and the fusion —
            // bm25Rank runs its own corpus-stats aggregate, so
            // computing it twice would double the verb's corpus passes
            val lex = graft.operators.TextAnalysis.bm25Rank(
                docs, "doc_id", "text", toks, topN = 50)
              .localCheckpoint(true)
            try {
              // seed = the BEST lexical hit that has an embedding (a
              // corpus can embed only a subset; the verb must not die
              // on a text-only top hit)
              val seedRows = lex
                .join(emb.select(col("vec_id").as("doc_id"),
                  col("embedding")), "doc_id")
                .orderBy(col("bm25_micro").desc, col("doc_id"))
                .limit(1).collect()
              if (seedRows.isEmpty) out ++= "0 row(s) shown\n"
              else {
                {
                  val qv = seedRows.head.getAs[scala.collection.Seq[Float]]("embedding")
                    .map(_.toDouble).toSeq
                  val vec = graft.operators.Similarity.topKByQuery(
                      emb, "vec_id", "embedding", qv, 50)
                    .withColumnRenamed("vec_id", "doc_id")
                  val hits = graft.operators.Retrieval.rrfFuse(
                      "doc_id", topN = 10, rrfK = 60,
                      Seq(lex -> "bm25_micro", vec -> "cos"))
                    .join(docs.select(col("doc_id"),
                      substring(col("text"), 1, 60).as("_snippet")), "doc_id")
                    .orderBy(col("rrf_ppm").desc, col("doc_id"))
                    .collect()
                  hits.foreach(r =>
                    out ++= s"${r.getLong(0)}\t${r.getLong(1)}\t${r.getString(2)}\n")
                  out ++= s"${hits.length} row(s) shown\n"
                }
              }
            } finally graft.GraftSession.releaseCheckpoint(lex)
          }
        } else if (lower.startsWith("remove filter ")) {
          val name = t.drop("remove filter ".length).trim
          registry.byName(name) match {
            case Some(f) =>
              registry.drop(f.id); out ++= s"filter removed: $name\n"
            case None => out ++= s"ERR no filter named '$name'\n"
          }
        } else {
          // unknown select/tail target with a WHERE regex (or the
          // reference's `stream:default`) auto-creates a temp filter
          val known = (n: String) =>
            n == "docs" || n == "ev" || registry.byName(n).isDefined
          val cmd = Console.autoCreateTemp(Console.parse(t), registry, known)
          val df = Console.compile(cmd, catalog, spark)
          cmd match {
            case st: Console.Stats =>
              // render the ASCII chart like the reference CLI —
              // metric-1 (match) as `o` and metric-2 (error) as `*`
              // drawn together (cli/stats.go:69-90)
              val series = df.orderBy("bucket_start").collect()
                .map(r => (r.getAs[Long]("bucket_start"), r.getAs[Long]("cnt")))
              val errSeries = errorSeries(catalog.resolve(spark, st.source), st)
              out ++= Chart.render(series.toSeq, errSeries)
            case _ =>
              val rows = df.limit(20).collect()
              rows.foreach(r => out ++= r.toSeq.mkString("\t") + "\n")
              out ++= s"${rows.length} row(s) shown\n"
          }
        }
      } catch {
        case e: Exception => out ++= s"ERR ${e.getMessage}\n"
      }
      out.result()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val regPath = args.lift(1)
    val spark = graft.GraftSession.builder(4).appName("graft-repl").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val session = new Session(spark, sfDir, new FilterRegistry(regPath),
      statsPath = args.lift(2), sessionPath = args.lift(3))

    val in = scala.io.Source.stdin.getLines()
    print("> "); System.out.flush()
    for (line <- in.takeWhile(l => l.trim != "quit" && l.trim != "exit")) {
      val t = line.trim
      if (t.nonEmpty) print(session.exec(t))
      print("> "); System.out.flush()
    }
    println("bye")
    spark.stop()
  }
}
