package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Fixture-drift canary (round-8 lesson: a regenerated events.parquet
  * silently vanished 26 queries from the artifact): the run dumps every
  * fixture's footer schema to fixture_schemas.json BEFORE the query loop,
  * records every query that threw in failed_queries.json, and ends with a
  * loud stderr summary — the artifact can no longer under-report without
  * a trace.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd+ args: restrict to named queries (local iteration;
    // the driver always passes exactly two)
    val sfDir = args(0)
    val outDir = args(1)
    val only = args.drop(2).toSet
    val spark = GraftSession.builder(GraftSession.defaultCores)
      .appName("graft-verify").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    // Canary 1: fixture schemas as read through the engine's own scan
    // layer (Tables.load), so an encoding drift shows up here the same
    // round it bites. A table that fails to load records its error.
    val schemaJson = graft.sources.Tables.names.map { n =>
      val body =
        try graft.sources.Tables.load(spark, sfDir, n).schema.fields
          .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
        catch { case e: Throwable => s"LOAD FAILED: ${e.getMessage}" }
      s"${q(n)}: ${q(body)}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/fixture_schemas.json"), schemaJson)

    val failed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name -> String.valueOf(e.getMessage).take(500)
      }
      // free localCheckpoint blocks between queries (see Bench.run)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // Data-dependent oracle overrides (LM cost literals) are built HERE,
    // where sfDir is known; a failed build keeps the static entry so the
    // query still gets checked, just under the weaker contract.
    val oracles = SparkEntry.oracleSql ++ SparkEntry.oracleSqlDynamic.flatMap {
      case (k, build) =>
        try Some(k -> build(spark, sfDir))
        catch { case e: Throwable =>
          System.err.println(
            s"[verify] dynamic oracle $k failed (${e.getMessage}); static fallback")
          None
        }
    }
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // Canary 2: the failed-query ledger. An empty object is the green
    // path; anything else is a headline in the artifact AND on stderr.
    val failedJson = failed
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/failed_queries.json"), failedJson)
    if (failed.nonEmpty) {
      System.err.println(
        s"[verify] *** ${failed.size} of ${selected.size} queries run " +
          s"FAILED and wrote no parquet: ${failed.map(_._1).mkString(", ")} ***")
    } else
      System.err.println(s"[verify] all queries wrote output")
    spark.stop()
  }
}
