package graft

import graft.operators.Scale
import graft.sources.Tables
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  private lazy val events = Tables.load(spark, sfDir, "events")

  test("salted count equals direct count for every key") {
    val direct = events.groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedCount(events, Seq("event_type"), saltBuckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salted sum equals direct sum") {
    val direct = events.groupBy("event_type")
      .agg(sum(round(col("value") * 100).cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedSum(
        events.withColumn("cents", round(col("value") * 100).cast("long")),
        Seq("event_type"), "cents", saltBuckets = 8, sumCol = "s")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("bloom-pruned join equals plain join; bloom prunes before the shuffle") {
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    val smallOrders = Tables.load(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 300000).select("o_orderkey")
    val pruned = Scale.bloomPrunedJoin(lineitem, "l_orderkey",
        smallOrders, "o_orderkey", expectedKeys = 1 << 14, fpp = 0.01)
      .select("l_orderkey", "l_linenumber")
    val plain = lineitem.join(smallOrders,
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber")
    assert(pruned.collect().toSet == plain.collect().toSet)
    // the might_contain filter sits on the big side of the plan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom filter in plan:\n$plan")
    // and the bloom genuinely prunes: surviving rows ≈ matches, far
    // fewer than the full table (1% fpp slack)
    val bloom = Scale.buildKeyBloom(smallOrders, "o_orderkey", 1 << 14, 0.01)
    val survivors = lineitem
      .filter(Scale.bloomMightContain(bloom, col("l_orderkey"))).count()
    val matches = plain.count()
    val total = lineitem.count()
    assert(survivors >= matches)
    assert(survivors <= matches + (total * 0.02).toLong,
      s"bloom barely pruned: $survivors of $total for $matches matches")
  }

  test("bloom-pruned join resolves same-named key columns on both sides") {
    val s = spark
    import s.implicits._
    val big = (1L to 100L).map(i => (i % 10, i)).toDF("key", "v")
    val small = Seq(1L, 3L).toDF("key")
    val got = Scale.bloomPrunedJoin(big, "key", small, "key")
      .select(col("v")).collect().map(_.getLong(0)).toSet
    val expected = (1L to 100L).filter(i => i % 10 == 1 || i % 10 == 3).toSet
    assert(got == expected)
  }

  test("deterministic sample: stable, monotone-nested, near the requested rate") {
    val orders = Tables.load(spark, sfDir, "orders")
    val n = orders.count().toDouble
    val s10 = Scale.deterministicSample(orders, "o_orderkey", 0.1)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val s10again = Scale.deterministicSample(orders, "o_orderkey", 0.1)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(s10 == s10again) // no RNG: identical row set every run
    assert(math.abs(s10.size / n - 0.1) < 0.03, s"rate ${s10.size / n}")
    val s25 = Scale.deterministicSample(orders, "o_orderkey", 0.25)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s25)) // threshold sampling nests monotonically
    // fraction 1.0 is exact: keeps EVERY row, including any whose md5
    // bucket is the boundary value ffffffff (ADVICE r2)
    assert(Scale.deterministicSample(orders, "o_orderkey", 1.0).count() == n.toLong)
  }

  test("hash split is disjoint, exhaustive, and close to the weights") {
    val orders = Tables.load(spark, sfDir, "orders")
    val n = orders.count().toDouble
    val counts = Scale.hashSplit(orders, "o_orderkey",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == n.toLong) // exhaustive partition
    assert(math.abs(counts("train") / n - 0.8) < 0.05)
    assert(math.abs(counts("val") / n - 0.1) < 0.04)
  }

  test("bucketed join plan has no shuffle exchange on either side") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Scale.writeBucketed(
        Tables.load(spark, sfDir, "orders")
          .select(col("o_orderkey").as("k"), col("o_totalprice")),
        "b_orders", "k", 4)
      Scale.writeBucketed(
        Tables.load(spark, sfDir, "lineitem")
          .select(col("l_orderkey").as("k"), col("l_quantity")),
        "b_lineitem", "k", 4)
      val joined = Scale.bucketedJoin(spark, "b_orders", "b_lineitem", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it is correct
      val expected = Tables.load(spark, sfDir, "lineitem")
        .join(Tables.load(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("stratifiedSample caps every stratum and is deterministic") {
    val docs = Tables.load(spark, sfDir, "documents")
    val sampled = Scale.stratifiedSample(docs, Seq("lang", "source"), "doc_id", 2)
    val perGroup = sampled.groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(2))
    assert(perGroup.nonEmpty && perGroup.forall(_ <= 2))
    // groups with >= 2 docs contribute exactly 2
    val groupSizes = docs.groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sampledSizes = sampled.groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    groupSizes.foreach { case (g, n) =>
      assert(sampledSizes.getOrElse(g, 0L) == math.min(n, 2L), s"group $g")
    }
    // deterministic: same ids on a re-run
    val ids1 = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Scale.stratifiedSample(docs, Seq("lang", "source"), "doc_id", 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("shuffleShards: a reproducible permutation — disjoint shards, dense ranks, stable across partitioning") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id")
    val out = Scale.shuffleShards(docs, "doc_id", nShards = 4)
      .select("doc_id", "shard", "pos")
      .as[(Long, Int, Int)].collect()
    assert(out.length == docs.count())
    // every row in exactly one shard, shards cover 0..3
    assert(out.map(_._2).distinct.sorted.toSeq == Seq(0, 1, 2, 3))
    // positions are dense 1..n_s inside each shard
    out.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq,
        s"shard $sh ranks not dense")
    }
    // re-run under a different partitioning: identical permutation
    val again = Scale.shuffleShards(docs.repartition(7), "doc_id", 4)
      .select("doc_id", "shard", "pos")
      .as[(Long, Int, Int)].collect()
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
    // a different salt is a different permutation
    val salted = Scale.shuffleShards(docs, "doc_id", 4, salt = "epoch2")
      .select("doc_id", "shard", "pos")
      .as[(Long, Int, Int)].collect()
    assert(salted.sortBy(_._1).toSeq != out.sortBy(_._1).toSeq)
  }

  test("topKPerKey: equals the window formulation, both directions") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars")
    Seq(true, false).foreach { desc =>
      val got = Scale.topKPerKey(docs, Seq("source"), "n_chars", k = 3,
          desc = desc, tieCols = Seq("doc_id"))
        .select("doc_id", "source").as[(Long, String)].collect().toSet
      val ordCol = if (desc) col("n_chars").desc else col("n_chars").asc
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(ordCol, col("doc_id"))
      val expect = docs.withColumn("_rk", row_number().over(w))
        .filter(col("_rk") <= 3)
        .select("doc_id", "source").as[(Long, String)].collect().toSet
      assert(got == expect, s"desc=$desc")
    }
  }

  test("topKPerKey plan: custom partial/final execs with the exchange between them") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars")
    val p = Scale.topKPerKey(docs, Seq("source"), "n_chars", 5,
        tieCols = Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyFinal"), s"final exec missing:\n$p")
    assert(p.contains("TopKPerKeyPartial"), s"partial exec missing:\n$p")
    val finalIdx = p.indexOf("TopKPerKeyFinal")
    val exchIdx = p.indexOf("Exchange hashpartitioning")
    val partialIdx = p.indexOf("TopKPerKeyPartial")
    assert(finalIdx < exchIdx && exchIdx < partialIdx,
      s"exchange not between final and partial:\n$p")
    assert(!p.contains("Window"), s"fell back to a window plan:\n$p")
  }

  test("topKPerKey: the shuffle carries at most k rows per (key, partition), not the data") {
    import spark.implicits._
    val s = spark
    val written = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null && t.taskMetrics.shuffleWriteMetrics != null)
          written.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    s.sparkContext.addSparkListener(listener)
    val parts = 8
    try {
      // one hot key, 100k rows spread over 8 partitions: the window
      // formulation would shuffle all 100k; the partial heaps must cut
      // that to ≤ k · partitions
      val df = s.range(0, 100000)
        .select(lit("hot").as("key"), col("id"))
        .repartition(parts)
      val out = Scale.topKPerKey(df, Seq("key"), "id", k = 5,
        tieCols = Seq("id"))
      assert(out.count() == 5L)
      var prev = -1L; var spins = 0
      while (written.get() != prev && spins < 30) {
        prev = written.get(); Thread.sleep(100); spins += 1
      }
    } finally s.sparkContext.removeSparkListener(listener)
    // repartition(8) itself writes 100k records; the top-k exchange
    // adds at most k·parts. Bound the TOTAL well below 2× the data:
    assert(written.get() <= 100000L + 5L * parts + 1000L,
      s"${written.get()} shuffle records — partial heaps not bounding the exchange")
  }

  test("topKPerKey: near-unique keys stay exact under a tiny partial-memory cap") {
    import spark.implicits._
    // 20k distinct keys, 3 rows each, k=2, partial cap of 256 held
    // rows: the partial pass must flush-and-reset ~hundreds of times
    // (bounded memory) and the sort-based final must still emit the
    // exact per-key top-2 — the keepBestPerCluster cardinality regime
    // that an unbounded per-key heap map would OOM on at scale
    val n = 20000
    val df = spark.range(0, n * 3L)
      .select((col("id") % n).as("key"), col("id").as("v"))
      .repartition(8)
    val got = graft.operators.Scale.topKPerKey(df, Seq("key"), "v", k = 2,
      desc = true, tieCols = Seq("v"), maxHeldRows = 256)
    // exact oracle: top-2 v per key are key+2n and key+n
    assert(got.count() == 2L * n)
    val agg = got.groupBy("key")
      .agg(sum("v").as("sv"), count(lit(1)).as("c"))
      .filter(col("sv") =!= col("key") * 2 + 3L * n || col("c") =!= 2)
      .count()
    assert(agg == 0L, "sort-based final lost exactness under flushing partials")
  }

  test("topKPerKey fails loudly on an ambiguous column name") {
    import spark.implicits._
    val a = Seq((1L, 2L)).toDF("k", "v")
    val b = Seq((1L, 3L)).toDF("k", "v")
    val joined = a.join(b, a("k") === b("k"))
    intercept[org.apache.spark.sql.AnalysisException] {
      graft.operators.Scale.topKPerKey(joined, Seq("k"), "v", k = 1)
    }
  }
}
