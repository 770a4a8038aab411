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
  *   remove filter <name>
  *   cat/select/tail/stats/count ...
  *   quit
  *
  * Reads stdin line-by-line, prints result rows (up to 20) — designed
  * to be driven by a human or a pipe.
  *
  * Usage: runMain graft.queries.Repl <sfDir> [registryPath]
  */
object Repl {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val regPath = args.lift(1)
    val spark = graft.GraftSession.builder(4).appName("graft-repl").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val registry = new FilterRegistry(regPath)

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

    val in = scala.io.Source.stdin.getLines()
    print("> "); System.out.flush()
    for (line <- in.takeWhile(l => l.trim != "quit" && l.trim != "exit")) {
      val t = line.trim
      if (t.nonEmpty) {
        try {
          val lower = t.toLowerCase(java.util.Locale.ROOT)
          if (lower.startsWith("create filter ")) {
            val rest = t.drop("create filter ".length).split("\\s+", 2)
            val f = registry.create(rest(0), rest(1))
            println(s"filter created: ${f.name} (${f.id})")
          } else if (lower == "show filters") {
            registry.list().foreach(f =>
              println(s"${f.name}\t${f.regex}\t${f.id}"))
            println(s"${registry.list().size} filter(s)")
          } else if (lower.startsWith("remove filter ")) {
            val name = t.drop("remove filter ".length).trim
            registry.byName(name) match {
              case Some(f) => registry.drop(f.id); println(s"filter removed: $name")
              case None => println(s"ERR no filter named '$name'")
            }
          } else {
            val cmd = Console.parse(t)
            val df = Console.compile(cmd, catalog, spark)
            cmd match {
              case _: Console.Stats =>
                // render the ASCII chart like the reference CLI
                val series = df.orderBy("bucket_start").collect()
                  .map(r => (r.getAs[Long]("bucket_start"), r.getAs[Long]("cnt")))
                print(Chart.render(series.toSeq))
              case _ =>
                val rows = df.limit(20).collect()
                rows.foreach(r => println(r.toSeq.mkString("\t")))
                println(s"${rows.length} row(s) shown")
            }
          }
        } catch {
          case e: Exception => println(s"ERR ${e.getMessage}")
        }
      }
      print("> "); System.out.flush()
    }
    println("bye")
    spark.stop()
  }
}
