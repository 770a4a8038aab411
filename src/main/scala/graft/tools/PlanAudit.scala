package graft.tools

/** Print formatted physical plans for headline queries — the
  * scale-review loop (pushdown / broadcast / codegen inspection).
  * Usage: runMain graft.tools.PlanAudit [sfDir] [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Seq(
      "q_grep_pipeline", "q1_agg", "q_join_agg", "q_join_5way",
      "q_topk_orders", "q_filter_fanout", "q_stats_rollup", "q_semi_join",
      "q_dedup_exact", "q_embed_topk")
    val spark = graft.GraftSession.builder(4).appName("plan-audit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
