package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the pretrain scenarios' phases (r16 round
  * work; not part of the bench surface). */
object FitProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "plain"
    val spark = GraftSession.builder(GraftSession.defaultCores)
      .appName("fitprobe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fitprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm
    graft.SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val SP = graft.streaming.StreamPretrain
    if (which == "folddist") {
      // r15 VERDICT item 4: the distributed label-fold fallback's
      // decade factor, measured next to the driver union-find's. Runs
      // the exact q_dedup_clusters_incr three-batch ingest at the
      // base fixture and at a 10x ScaleProbe replica, once per engine
      // (maxPairs=0 forces the distributed fold on every
      // post-first-batch batch; the default bound takes the driver
      // union-find path).
      val x10 = java.nio.file.Files.createTempDirectory("fold_x10").toString
      println("[fitprobe] generating x10 documents replica...")
      ScaleProbe.generateDocs(spark, dir, x10, 10)
      def fold(label: String, d: String, maxPairs: Long): Unit = {
        val ds = graft.sources.Tables.load(spark, d, "documents")
        val root = java.nio.file.Files
          .createTempDirectory("folddist").toString
        val cfg = graft.streaming.StreamDedup.Config(threshold = 0.5)
        time(label) {
          (0 until 3).foreach { k =>
            graft.GraftSession.releaseCheckpoint(
              graft.streaming.StreamDedup.upsertBatchWithLabels(
                ds.filter(col("doc_id") % 3 === k), "doc_id", "text",
                root, cfg, maxPairs = maxPairs))
          }
        }
        GraftSession.releaseCachedBlocks(spark)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(root))
          .sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      }
      // warm each code path once at the small fixture before timing
      fold("warmup uf sf0.001", "/root/testdata/sf0.001",
        graft.operators.Dedup.defaultMaxDeltaPairs)
      fold("warmup dist sf0.001", "/root/testdata/sf0.001", 0L)
      fold("union-find 3-batch ingest @sf0.1", dir,
        graft.operators.Dedup.defaultMaxDeltaPairs)
      fold("union-find 3-batch ingest @x10", x10,
        graft.operators.Dedup.defaultMaxDeltaPairs)
      fold("distributed 3-batch ingest @sf0.1", dir, 0L)
      fold("distributed 3-batch ingest @x10", x10, 0L)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(x10))
        .sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      spark.stop(); return
    }
    if (which == "fitparts") {
      for (pass <- 1 to 2) {
        println(s"[fitprobe] ===== fitparts pass $pass =====")
        val m = time("LinearQuality.fit")(graft.ml.LinearQuality.fit(
          docs.withColumn("_is", (col("lang") === "en").cast("int")),
          "doc_id", "text", "_is"))
        val costs = time("knCollectCosts")(
          graft.operators.LangModel.knCollectCosts(
            graft.operators.LangModel.knBigrams(
              docs.filter(col("lang") === "en"), "text")))
        time("learnMerges")(
          graft.operators.Bpe.learnMerges(docs, "text", 6))
        val gk = graft.operators.TextAnalysis.gopherRules(docs, "doc_id",
          "text", stopWords = Seq("the", "a"))
          .filter(col("keep")).select("doc_id")
        val lk = graft.ml.LinearQuality.score(docs, "doc_id", "text", m)
          .filter(col("keep")).select("doc_id")
        val dk = graft.operators.Dedup.exactKeepFirst(docs, "doc_id",
          "text").select("doc_id")
        val surv = docs.join(gk, "doc_id").join(lk, "doc_id")
          .join(dk, "doc_id")
        val scored = time("knScore chain")(
          graft.operators.LangModel.knScoreWith(surv, "doc_id", "text",
            costs)
          .join(surv.select(col("doc_id"), col("lang")), "doc_id")
          .select(col("doc_id"), col("lang"), col("mean_nll_micro")))
        time("perplexityBuckets+collect")(
          graft.operators.Curate.perplexityBuckets(scored, "lang",
            "mean_nll_micro")
          .filter(col("bucket") === "head")
          .groupBy("lang").agg(max("mean_nll_micro").as("_t1"))
          .collect())
        graft.GraftSession.releaseCachedBlocks(spark)
      }
      spark.stop(); return
    }
    for (pass <- 1 to 2) {
      println(s"[fitprobe] ===== pass $pass ($which) =====")
      val root = java.nio.file.Files
        .createTempDirectory("fitprobe").toString + "/pipe"
      val fz = time("fit")(SP.fit(docs, "doc_id", "text", "lang"))
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      val b0 = docs.filter(col("doc_id") * 3 <= maxId)
      val b1 = docs.filter(col("doc_id") * 3 > maxId &&
        col("doc_id") * 3 <= maxId * 2)
      val b2 = docs.filter(col("doc_id") * 3 > maxId * 2)
      val near =
        if (which == "near")
          Some(graft.streaming.StreamDedup.Config(threshold = 0.5))
        else None
      def drain(label: String): Unit = {
        val byKind = graft.streaming.BatchTimer.stop()
          .groupBy(_.kind).toSeq.sortBy(_._1)
          .map { case (k, xs) =>
            f"$k=${xs.map(_.value).sum}%.2f(n=${xs.size})"
          }
        println(s"[fitprobe]   $label batches: ${byKind.mkString(" ")}")
      }
      graft.streaming.BatchTimer.start()
      time("ingest b0")(SP.ingestBatch(b0, "doc_id", "text", "lang",
        "source", fz, root, 0L, nearDup = near))
      drain("b0")
      graft.streaming.BatchTimer.start()
      time("ingest b1")(SP.ingestBatch(b1, "doc_id", "text", "lang",
        "source", fz, root, 1L, nearDup = near))
      drain("b1")
      graft.streaming.BatchTimer.start()
      time("ingest b1 retry")(SP.ingestBatch(b1, "doc_id", "text", "lang",
        "source", fz, root, 1L, nearDup = near))
      drain("b1r")
      graft.streaming.BatchTimer.start()
      time("ingest b2")(SP.ingestBatch(b2, "doc_id", "text", "lang",
        "source", fz, root, 2L, nearDup = near))
      drain("b2")
      time("packedShards")(SP.packedShards(spark, root, 512)
        .write.format("noop").mode("overwrite").save())
      GraftSession.releaseCachedBlocks(spark)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(root).getParent)
        .sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    }
    spark.stop()
  }
}
