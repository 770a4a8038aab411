package graft

import graft.functions.TextFunctions
import graft.operators.{Curate, Scale}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class CurateSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  private lazy val scored = docs.select(col("doc_id"),
    col("n_chars").as("score"),
    TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))

  test("token-budget selection keeps exactly the global greedy prefix") {
    val budget = 2000L
    val kept = Curate.selectByTokenBudget(scored, "doc_id", "n_tokens",
        "score", budget)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("cum_tokens")))
      .sortBy(_._2)
    // reference: driver-side greedy over the full order
    val all = scored.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, s, _) => (-s, id) }
    var cum = 0L
    val expected = all.iterator.map { case (id, _, n) =>
      cum += n; (id, cum)
    }.takeWhile(_._2 <= budget).toSeq
    assert(kept.toSeq == expected)
    // cumulative bound holds and the NEXT doc would not have fit
    assert(kept.last._2 <= budget)
    val nextCum = all.drop(kept.length).headOption.map(_._3 + kept.last._2)
    nextCum.foreach(nc => assert(nc > budget))
  }

  test("token-budget selection is stable across partitioning") {
    val budget = 2000L
    val a = Curate.selectByTokenBudget(scored, "doc_id", "n_tokens",
      "score", budget).collect().map(_.getLong(0)).toSet
    val b = Curate.selectByTokenBudget(scored.repartition(13), "doc_id",
      "n_tokens", "score", budget).collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("mixture balance equalizes domains to the smallest token mass") {
    val withTok = docs.select(col("doc_id"), col("lang"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val domTotals = withTok.groupBy("lang")
      .agg(sum("n_tokens").as("tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minTok = domTotals.values.min
    val kept = Curate.mixtureBalance(withTok, "lang", "doc_id", "n_tokens")

    // the smallest domain is kept whole
    val minLangs = domTotals.filter(_._2 == minTok).keySet
    val keptPerDom = kept.groupBy("lang")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    minLangs.foreach { l =>
      assert(keptPerDom(l)._1 == domTotals(l),
        s"smallest domain $l must be kept in full")
    }
    // every kept row obeys the per-domain md5 threshold rule
    val rows = kept.select("doc_id", "lang", "keep_frac").collect()
    rows.foreach { r =>
      val frac = r.getDouble(2)
      if (frac < 1.0) {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(r.getLong(0).toString
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
        val bucket = java.lang.Long.parseLong(hex.substring(0, 8), 16)
        assert(bucket < math.floor(frac * 4294967296.0).toLong,
          s"row ${r.getLong(0)} kept despite bucket over threshold")
      }
    }
    // kept token mass per oversized domain lands near the target
    // (±2^-32 rate slack is invisible here; use a loose statistical
    // bound: within 50% of min on the tiny fixture, exact containment
    // is what the oracle checks at sf0.01)
    domTotals.keys.filterNot(minLangs).foreach { l =>
      val keptTok = keptPerDom.get(l).map(_._1).getOrElse(0L)
      assert(keptTok <= domTotals(l), s"$l kept more than it has")
    }
  }

  test("mixture balance is deterministic and engine-portable (threshold in-plan)") {
    val withTok = docs.select(col("doc_id"), col("lang"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val a = Curate.mixtureBalance(withTok, "lang", "doc_id", "n_tokens")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curate.mixtureBalance(withTok.repartition(7), "lang", "doc_id",
        "n_tokens")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("mixture target: binding domain kept whole, unlisted domains dropped, ratios hold") {
    val withTok = docs.select(col("doc_id"), col("lang"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val weights = Seq("en" -> 400000L, "de" -> 200000L, "fr" -> 200000L,
      "es" -> 100000L) // zh intentionally unlisted
    val domTotals = withTok.groupBy("lang")
      .agg(sum("n_tokens").as("tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Curate.mixtureTarget(withTok, "lang", "doc_id", "n_tokens",
      weights)
    val keptPerDom = kept.groupBy("lang").agg(sum("n_tokens").as("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // unlisted domain is dropped entirely
    assert(!keptPerDom.contains("zh"), s"zh not dropped: $keptPerDom")
    // the binding domain (min dom_tokens / weight) is kept in full
    val wMap = weights.toMap
    val binding = wMap.keys.minBy(l => domTotals(l).toDouble / wMap(l))
    assert(keptPerDom(binding) == domTotals(binding),
      s"binding domain $binding must be whole: ${keptPerDom(binding)} vs ${domTotals(binding)}")
    // kept mass never exceeds the domain's supply, and the realized
    // ratios sit near the target (loose bound — per-doc md5 sampling)
    wMap.keys.foreach(l => assert(keptPerDom.getOrElse(l, 0L) <= domTotals(l)))
    val perWeightUnit = wMap.keys.map(l => keptPerDom(l).toDouble / wMap(l))
    assert(perWeightUnit.max / perWeightUnit.min < 1.6,
      s"kept-per-weight spread too wide: $keptPerDom")
    // partition-invariant (threshold computed in-plan)
    val again = Curate.mixtureTarget(withTok.repartition(7), "lang",
        "doc_id", "n_tokens", weights)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("mixture target: a zero-token listed domain is kept whole and never zeroes the others") {
    import spark.implicits._
    // 'empty' supplies no tokens: it must not drive the binding min to
    // zero (which would silently drop every other domain's documents)
    val rows = Seq((1L, "a", 100L), (2L, "a", 100L), (3L, "b", 50L),
      (4L, "empty", 0L), (5L, "empty", 0L))
      .toDF("doc_id", "dom", "n_tokens")
    val kept = Curate.mixtureTarget(rows, "dom", "doc_id", "n_tokens",
        Seq("a" -> 500000L, "b" -> 500000L, "empty" -> 100000L))
      .select("doc_id", "dom").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // b binds (50 tokens per 500k weight vs a's 200): b kept whole,
    // a downsampled by rule, empty's token-less docs kept whole
    assert(kept.count(_._2 == "b") == 1)
    assert(kept.count(_._2 == "empty") == 2,
      s"zero-token domain must be kept whole: ${kept.toSeq}")
    // a is downsampled by the md5 rule (keep_frac 0.25 here) — the
    // pre-fix behavior dropped ALL of a (keep_frac 0.0, thr 00000000)
    assert(kept.count(_._2 == "a") <= 2)
  }

  test("top-p by score keeps ceil(p*N) rows plus threshold ties, nothing below") {
    val withScore = scored.select(col("doc_id"), col("score"))
    val n = withScore.count()
    val kept = Curate.keepTopByScore(withScore, "score", keepPpm = 250000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val target = (n * 250000L + 999999L) / 1000000L
    assert(kept.length >= target)
    val thr = kept.map(_._2).min
    // nothing below the threshold is kept, and every row at/above it is
    val all = withScore.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.forall(_._2 >= thr))
    assert(kept.toSet == all.filter(_._2 >= thr).toSet)
    // removing the threshold's tie-group drops below the target
    assert(all.count(_._2 > thr) < target)
  }

  test("shard export: every doc lands in exactly one shard, token sums bounded, deterministic") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val nShards = Curate.writeShards(docs, "doc_id", "text",
      tokensPerShard = 4000, path = dir)
    assert(nShards > 1, "fixture should span multiple shards")
    val back = spark.read.parquet(dir)
    // exactly-once membership
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    // per-shard token sums bounded by budget + max single-doc overhang
    val tokSums = back
      .withColumn("_nt", TextFunctions.tokenCount(col("text")).cast("long"))
      .groupBy("shard").agg(sum("_nt").as("tok"))
      .collect().map(r => r.getAs[Number]("shard").longValue() -> r.getLong(1))
      .toMap
    val maxDoc = docs.select(TextFunctions.tokenCount(col("text")).cast("long"))
      .collect().map(_.getLong(0)).max
    tokSums.foreach { case (sh, tok) =>
      assert(tok <= 4000L + maxDoc, s"shard $sh holds $tok tokens")
    }
    // every shard except possibly the last is at least nominally filled
    val last = tokSums.keys.max
    tokSums.filter(_._1 != last).foreach { case (sh, tok) =>
      assert(tok >= 4000L - maxDoc, s"shard $sh underfilled at $tok")
    }
    // deterministic: a second export reproduces identical membership
    val dir2 = java.nio.file.Files.createTempDirectory("shards2").toString
    Curate.writeShards(docs.repartition(7), "doc_id", "text", 4000, dir2)
    val a = back.select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue())).toSet
    val b = spark.read.parquet(dir2).select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue())).toSet
    assert(a == b)
  }

  test("budget and top-p selections are monotone: larger budgets keep supersets") {
    val budgets = Seq(500L, 2000L, 8000L)
    val keptByBudget = budgets.map(b =>
      Curate.selectByTokenBudget(scored, "doc_id", "n_tokens", "score", b)
        .collect().map(_.getLong(0)).toSet)
    keptByBudget.sliding(2).foreach { case Seq(small, large) =>
      assert(small.subsetOf(large),
        s"smaller budget kept ${small.diff(large).size} rows the larger lost")
    }
    val ppms = Seq(100000L, 300000L, 700000L)
    val keptByPpm = ppms.map(p =>
      Curate.keepTopByScore(scored.select(col("doc_id"), col("score")),
        "score", p).collect().map(_.getLong(0)).toSet)
    keptByPpm.sliding(2).foreach { case Seq(small, large) =>
      assert(small.subsetOf(large))
    }
  }

  test("budget selection and mixture hold at shuffle.partitions=200") {
    val s = spark
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "200")
    try {
      val budget = 2000L
      val kept200 = Curate.selectByTokenBudget(scored, "doc_id", "n_tokens",
        "score", budget).collect().map(_.getLong(0)).toSet
      val withTok = docs.select(col("doc_id"), col("lang"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      val mix200 = Curate.mixtureBalance(withTok, "lang", "doc_id", "n_tokens")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      s.conf.set("spark.sql.shuffle.partitions", prev)
      val keptDefault = Curate.selectByTokenBudget(scored, "doc_id",
        "n_tokens", "score", budget).collect().map(_.getLong(0)).toSet
      val mixDefault = Curate.mixtureBalance(withTok, "lang", "doc_id",
        "n_tokens").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept200 == keptDefault)
      assert(mix200 == mixDefault)
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("budget selection prunes partitions past the budget before the window") {
    // plan shape: the pruning filter on the broadcast offset sits below
    // the window — assert no window over a partition whose offset
    // exceeds the budget by checking the filter exists in the plan
    val out = Curate.selectByTokenBudget(scored, "doc_id", "n_tokens",
      "score", 2000L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "expected a window for the running sum")
    assert(plan.toLowerCase.contains("broadcast"),
      s"offsets must broadcast-join, not shuffle:\n$plan")
  }

  test("temperatureSample flattens domains: scarce kept whole, rich downsampled, deterministic") {
    val s = spark
    import s.implicits._
    // big: 400 rows, small: 20. T=2, keepFrac=0.5 →
    // q ∝ sqrt(n); keep_frac(small) = 0.5·420·√20/(√400+√20)/20 ≈ 1.92
    // → capped at 1 (kept whole); keep_frac(big) ≈ 0.43.
    val df = ((1 to 400).map(i => (i.toLong, "big")) ++
      (401 to 420).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val got = graft.operators.Curate
      .temperatureSample(df, "source", "doc_id")
    val kept = got.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 20L, s"scarce domain not kept whole: $kept")
    // md5 keep is Bernoulli(0.429)-shaped over 400 ids — allow wide slack
    assert(kept("big") > 120 && kept("big") < 230,
      s"rich domain not ~43% downsampled: $kept")
    // the uncapped fraction survives in the output for the kept rows
    val fr = got.filter(col("source") === "big")
      .select("keep_frac").distinct().collect()
    assert(fr.length == 1 && math.abs(fr(0).getDouble(0) - 0.4293) < 0.01)
    // deterministic: a second run keeps the identical id set
    val again = graft.operators.Curate
      .temperatureSample(df, "source", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("perplexity buckets: value terciles per group, boundary ties share a bucket") {
    import spark.implicits._
    // group a: scores 1..9 → t1=3, t2=6; group b: all equal → all head
    val in = ((1 to 9).map(i => ("a", i.toLong, i.toLong)) ++
      (20 to 23).map(i => ("b", i.toLong, 7L))).toDF("g", "id", "s")
    val out = Curate.perplexityBuckets(in, "g", "s")
      .select("g", "id", "bucket").as[(String, Long, String)].collect()
    val a = out.filter(_._1 == "a").map(r => r._2 -> r._3).toMap
    assert((1L to 3L).forall(a(_) == "head"))
    assert((4L to 6L).forall(a(_) == "middle"))
    assert((7L to 9L).forall(a(_) == "tail"))
    assert(out.filter(_._1 == "b").forall(_._3 == "head"))

    // boundary tie: mass heaped ON the threshold value stays together
    val tied = Seq(("c", 1L, 5L), ("c", 2L, 5L), ("c", 3L, 5L),
      ("c", 4L, 9L)).toDF("g", "id", "s")
    val tb = Curate.perplexityBuckets(tied, "g", "s")
      .select("id", "bucket").as[(Long, String)].collect().toMap
    // t1 = t2 = 5 (the tied value absorbs both tercile points), so the
    // remaining value falls past the middle band entirely
    assert(Seq(1L, 2L, 3L).forall(tb(_) == "head") && tb(4L) == "tail")

    // the corpus itself must not sort/shuffle: label side is one
    // broadcast join over the histogram thresholds
    val plan = Curate.perplexityBuckets(in, "g", "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"thresholds must broadcast:\n$plan")
  }

  test("curriculum: strides interleave domains proportionally and rank best-first") {
    val out = Curate.curriculum(docs, "source", "doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // within a domain, rank follows n_chars desc (doc_id tiebreak)
    val chars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.groupBy(_._2).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_._3)
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(chars(a._1) > chars(b._1) ||
            (chars(a._1) == chars(b._1) && a._1 < b._1),
            s"rank order broken between ${a._1} and ${b._1}")
        case _ =>
      }
      // stride strictly increases with rank inside a domain and stays
      // on the 2^40 grid
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a._4 < b._4)
        case _ =>
      }
      assert(rs.forall(r => r._4 >= 0 && r._4 < (1L << 40)))
    }
    // proportional spread: in the half of the epoch below stride 2^39,
    // each domain lands half its documents (±1 from grid quantization)
    val half = 1L << 39
    out.groupBy(_._2).foreach { case (dom, rs) =>
      val below = rs.count(_._4 < half)
      assert(math.abs(below - rs.length / 2.0) <= 1.0,
        s"domain $dom: $below of ${rs.length} in the first half-epoch")
    }
  }

  test("curriculum plan: one domain-window shuffle plus a broadcast of counts") {
    val plan = Curate.curriculum(docs, "source", "doc_id", "n_chars")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-domain counts must broadcast:\n$plan")
    // no global (empty-partition) window: every Window node partitions
    // by the domain column
    assert(!plan.contains("Window [") ||
      !plan.split("\n").exists(l => l.contains("windowspecdefinition()") ||
        (l.contains("Window") && l.contains("ORDER BY") && !l.contains("source"))),
      s"global window detected:\n$plan")
  }
}
