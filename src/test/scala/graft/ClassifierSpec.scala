package graft

import graft.ml.{BayesModel, ErrorClassifier}

class ClassifierSpec extends SparkSpec {

  test("bayes learns and classifies deterministically") {
    var m = BayesModel.empty(1000)
    (1 to 60).foreach { i =>
      m = m.learn("error", Seq("disk", "failure", s"id$i"))
      m = m.learn("regular", Seq("request", "served", s"id$i"))
    }
    assert(m.classify(Seq("disk", "failure")).contains("error"))
    assert(m.classify(Seq("request", "served")).contains("regular"))
    // rerunning the same sequence yields the same model
    var m2 = BayesModel.empty(1000)
    (1 to 60).foreach { i =>
      m2 = m2.learn("error", Seq("disk", "failure", s"id$i"))
      m2 = m2.learn("regular", Seq("request", "served", s"id$i"))
    }
    assert(m.featureCount == m2.featureCount && m.categoryCount == m2.categoryCount)
  }

  test("memory window forgets oldest samples (Classifier.java:32,380-394)") {
    var m = BayesModel.empty(10)
    (1 to 10).foreach(i => m = m.learn("a", Seq(s"w$i")))
    assert(m.categoryCount("a") == 10)
    m = m.learn("b", Seq("new"))
    assert(m.memory.size == 10)
    assert(m.categoryCount.getOrElse("a", 0L) == 9L) // w1 forgotten
    assert(!m.featureCount("a").contains("w1"))
  }

  test("step: lexicon labeling drives training, classify gated on minTrained (ErrorClassifierBolt.java:96-99)") {
    val cfg = ErrorClassifier.Config(fullTrainCount = 1000, sampleEvery = 25,
      minTrained = 10, memoryCapacity = 100)
    var st = ErrorClassifier.State.empty(cfg.memoryCapacity)
    var preds = Vector.empty[String]
    val msgs = (1 to 9).flatMap(i => Seq(s"request ok $i", s"disk error $i"))
    msgs.foreach { msg =>
      val (next, p) = ErrorClassifier.step(st, msg, cfg)
      st = next; preds :+= p
    }
    assert(preds.take(9).forall(_ == "")) // below minTrained → no prediction
    assert(preds.drop(10).forall(_.nonEmpty))
    val (_, errPred) = ErrorClassifier.step(st, "disk error 99", cfg)
    val (_, okPred) = ErrorClassifier.step(st, "request ok 99", cfg)
    assert(errPred == "error" && okPred == "regular")
  }

  test("sampling continues after the full-train phase (gate on seen, not trained)") {
    val cfg = ErrorClassifier.Config(fullTrainCount = 10, sampleEvery = 5,
      minTrained = 1, memoryCapacity = 1000)
    var st = ErrorClassifier.State.empty(cfg.memoryCapacity)
    (1 to 100).foreach { i =>
      st = ErrorClassifier.step(st, s"message number $i", cfg)._1
    }
    // 10 full-train + every 5th of the remaining 90 seen (seen 10,15,...,95)
    assert(st.seen == 100)
    assert(st.model.trained == 10 + 18,
      s"training froze: trained=${st.model.trained}")
  }

  test("train-on-sample + broadcast scoring: stateless full pass agrees on clear cases") {
    implicit val s = spark
    import s.implicits._
    val rows = ((1 to 300).map(i => ("f1", i.toLong,
        if (i % 2 == 0) s"disk error $i" else s"request ok $i")))
      .toDF("filter_id", "ord", "_raw")
    val models = ErrorClassifier.trainModels(rows.filter($"ord" <= 100))
    assert(models.contains("f1") && models("f1").trained == 100)
    val scored = ErrorClassifier.scoreBroadcast(rows, models).collect()
    assert(scored.length == 300)
    val errs = scored.filter(_._raw.contains("error"))
    val oks = scored.filter(_._raw.contains("ok"))
    assert(errs.count(_.predicted == "error") > errs.length * 0.9)
    assert(oks.count(_.predicted == "regular") > oks.length * 0.9)
    // unknown filter → empty prediction, no crash
    val other = ErrorClassifier.scoreBroadcast(
      Seq(("nope", 1L, "disk error")).toDF("filter_id", "ord", "_raw"), models)
      .collect()
    assert(other.head.predicted == "")
  }

  test("classifyBatch matches the sequential reference fold under heavy skew") {
    implicit val s = spark
    import s.implicits._
    // one dominant filter (50× the others) — the shape that OOM'd the
    // old group-materializing formulation at scale
    val rows = (1 to 4000).map(i => ("big", i.toLong,
        if (i % 3 == 0) s"disk error $i" else s"request ok $i")) ++
      (1 to 80).map(i => ("s1", i.toLong, s"write failure $i")) ++
      (1 to 80).map(i => ("s2", i.toLong, s"served fine $i"))
    val cfg = ErrorClassifier.Config(minTrained = 50)
    val got = ErrorClassifier.classifyBatch(
        rows.toDF("filter_id", "ord", "_raw"), cfg)
      .collect().map(c => (c.filter_id, c.ord) -> c.predicted).toMap
    assert(got.size == rows.size)
    rows.groupBy(_._1).foreach { case (fid, rs) =>
      var st = ErrorClassifier.State.empty(cfg.memoryCapacity)
      rs.sortBy(_._2).foreach { case (_, ord, raw) =>
        val (next, p) = ErrorClassifier.step(st, raw, cfg)
        st = next
        assert(got((fid, ord)) == p, s"diverged at ($fid, $ord)")
      }
    }
  }

  test("foldSortedPartition streams one-in-one-out (no group materialization)") {
    val cfg = ErrorClassifier.Config(minTrained = 10)
    var consumed = 0
    val src = Iterator.tabulate(1000000) { i =>
      consumed += 1; ("f", i.toLong, s"msg $i")
    }
    val out = ErrorClassifier.foldSortedPartition(src, cfg)
    out.next()
    assert(consumed <= 2,
      s"fold pulled $consumed input rows before emitting the first output")
  }

  test("foldSortedPartition resets state at filter boundaries") {
    val cfg = ErrorClassifier.Config(minTrained = 5)
    val rows = (1 to 20).map(i => ("f1", i.toLong,
        if (i % 2 == 0) s"disk error $i" else s"request ok $i")) ++
      (1 to 3).map(i => ("f2", i.toLong, s"disk error $i"))
    val out = ErrorClassifier.foldSortedPartition(rows.iterator, cfg).toVector
    // f1 has trained past minTrained by its end; f2 must start cold
    assert(out.filter(_.filter_id == "f1").takeRight(3).forall(_.predicted.nonEmpty))
    assert(out.filter(_.filter_id == "f2").forall(_.predicted == ""),
      "state leaked across the filter boundary")
  }

  test("quantized decision surface agrees with the float classifier") {
    implicit val s = spark
    import s.implicits._
    // trained models are frozen; scoreQuantized replaces the float
    // product argmax with an integer micro-nat argmin. At 1e6 scale a
    // decision flip needs two categories within ~1e-6 nats — far below
    // any real separation on this data — so the surfaces must agree
    // row-for-row.
    val rows = ((1 to 150).map(i => ("f1", i.toLong,
        if (i % 3 == 0) s"disk error $i" else s"request ok $i")) ++
      (1 to 150).map(i => ("f2", i.toLong, s"all fine $i")))
      .toDF("filter_id", "ord", "_raw")
    val models = ErrorClassifier.trainModels(rows)
    val costs = ErrorClassifier.decisionCosts(models)
    val float = ErrorClassifier.scoreBroadcast(rows, models).collect()
      .map(c => (c.filter_id, c.ord) -> c.predicted).toMap
    val quant = ErrorClassifier.scoreQuantized(rows, costs).collect()
    assert(quant.length == 300)
    val disagree = quant.filter(c => float((c.filter_id, c.ord)) != c.predicted)
    assert(disagree.isEmpty,
      s"quantized vs float disagree on ${disagree.length} rows, e.g. " +
        disagree.take(3).map(c => s"(${c.filter_id},${c.ord})").mkString(", "))
  }

  test("classifyBatch: per-filter isolation and ord-ordered processing") {
    implicit val s = spark
    import s.implicits._
    val rows = ((1 to 120).map(i => ("f1", i.toLong, s"disk error $i")) ++
      (1 to 120).map(i => ("f2", i.toLong, s"all fine $i")))
      .toDF("filter_id", "ord", "_raw")
    val out = ErrorClassifier.classifyBatch(rows,
      ErrorClassifier.Config(minTrained = 50)).collect()
    assert(out.length == 240)
    val f1 = out.filter(_.filter_id == "f1")
    assert(f1.filter(_.predicted == "error").length > 50)
    val f2 = out.filter(_.filter_id == "f2")
    assert(f2.forall(_.predicted != "error"))
  }
}
