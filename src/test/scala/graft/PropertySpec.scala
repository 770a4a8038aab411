package graft

import graft.ml.BayesModel
import graft.queries.GrepQL
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property suite for the engine's pure kernels — the
  * invariants example-based specs can't sweep.
  */
object GraftProperties extends Properties("graft") {

  // --- duration literals (F8) ---
  property("parseDuration inverts unit multiplication") = Prop.forAll(
    Gen.chooseNum(0L, 1000000L), Gen.oneOf("s" -> 1L, "m" -> 60L, "h" -> 3600L, "d" -> 86400L)) {
    case (n, (suffix, mult)) =>
      graft.functions.LogFunctions.parseDuration(s"$n$suffix") == n * mult
  }

  // --- bucket arithmetic (F7): bucket <= ts < bucket + step ---
  property("bucket bounds") = Prop.forAll(
    Gen.chooseNum(0L, 4102444800L), Gen.chooseNum(1L, 86400L)) { (ts, step) =>
      val bucket = ts - ts % step
      bucket % step == 0 && bucket <= ts && ts < bucket + step
  }

  // --- GrepQL: parse never crashes on grammar-valid pipelines and
  //     preserves stage structure ---
  private val word = for {
    n <- Gen.chooseNum(1, 10)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString
  private val grepStage = for {
    v <- Gen.oneOf(true, false)
    i <- Gen.oneOf(true, false)
    e <- Gen.oneOf(true, false)
    p <- word
  } yield (s"grep ${if (v) "-v " else ""}${if (i) "-i " else ""}${if (e) "-e " else ""}$p",
    GrepQL.GrepCmd(p, v, i, e))

  property("grep pipeline parse preserves structure") = Prop.forAll(
    word, Gen.listOfN(3, grepStage), Gen.chooseNum(1, 500)) { (src, stages, n) =>
      val input = (s"cat $src" +: stages.map(_._1) :+ s"limit $n").mkString(" | ")
      val parsed = GrepQL.parse(input)
      parsed.source == src &&
        parsed.greps == stages.map(_._2) &&
        parsed.limit.contains(n)
  }

  // --- Bayes memory window: bounded state, counts consistent ---
  private val sample = for {
    cat <- Gen.oneOf("error", "regular")
    toks <- Gen.listOfN(4, word)
  } yield (cat, toks)

  property("bayes memory stays bounded and counts sum to window size") =
    Prop.forAll(Gen.listOfN(60, sample)) { samples =>
      val cap = 25
      val m = samples.foldLeft(BayesModel.empty(cap)) {
        case (model, (cat, toks)) => model.learn(cat, toks)
      }
      m.memory.size == math.min(cap, samples.size) &&
        m.categoryCount.values.sum == m.memory.size &&
        m.trained == samples.size
    }

  // --- rollup/re-rollup invariant: coarser buckets preserve totals ---
  property("re-bucketing preserves counts") = Prop.forAll(
    Gen.listOfN(50, Gen.chooseNum(0L, 100000L)), Gen.chooseNum(1L, 50L)) {
      (tss, k) =>
        val fine = tss.groupBy(ts => ts - ts % 10).view.mapValues(_.size.toLong).toMap
        val coarseFromFine = fine.groupBy { case (b, _) => b - b % (10 * k) }
          .view.mapValues(_.values.sum).toMap
        val coarseDirect = tss.groupBy(ts => ts - ts % (10 * k))
          .view.mapValues(_.size.toLong).toMap
        coarseFromFine == coarseDirect &&
          fine.values.sum == tss.size
  }

  // --- minhash signature estimate approximates true jaccard ---
  property("minhash estimate tracks true jaccard") = Prop.forAllNoShrink(
    Gen.chooseNum(20, 60), Gen.chooseNum(0, 40), Gen.chooseNum(1L, Long.MaxValue)) {
      (common, extra, seed) =>
        // two synthetic shingle-hash sets with known overlap
        def h(i: Long) = {
          var z = (seed + i) * 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z ^ (z >>> 31)
        }
        val shared = (0 until common).map(i => h(i)).toArray
        val a = shared ++ (0 until extra).map(i => h(1000 + i))
        val b = shared ++ (0 until extra).map(i => h(2000 + i))
        val trueJ = common.toDouble / (common + 2 * extra)
        // signature via the same family as MinHashSignature64
        val numHashes = 128
        def sig(hs: Array[Long]): Array[Long] =
          Array.tabulate(numHashes) { i =>
            val A = 0x9E3779B97F4A7C15L * (2L * i + 1) | 1L
            val B = 0xBF58476D1CE4E5B9L * (i + 1)
            hs.map(x => (x * A) ^ B).min
          }
        val est = sig(a).zip(sig(b)).count { case (x, y) => x == y }.toDouble / numHashes
        math.abs(est - trueJ) < 0.2 // 128 hashes → σ ≈ 0.044; 4.5σ bound
  }

  // --- curriculum stride key (r10): the overflow-safe step-first
  //     quantization keeps every key on the 2^40 grid, strictly
  //     monotone in rank, at ANY domain size up to 2^39 ---
  property("curriculum stride: bounded, monotone, overflow-free at any domain size") =
    Prop.forAll(Gen.chooseNum(1L, 1L << 39), Gen.chooseNum(0L, 1L << 39)) {
      (n, rRaw) =>
        val r = rRaw % n + 1 // rank in 1..n
        def stride(rank: Long): Long =
          (2 * rank - 1) * (1099511627776L / (2 * n))
        val s = stride(r)
        val inGrid = s >= 0 && s < (1L << 40)
        val monotone = r == n || stride(r + 1) > s
        inGrid && monotone
  }

  // --- Kneser–Ney rationals (r10): over a random bigram count table,
  //     the emitted numerators partition the denominator exactly —
  //     per-context mass sums to 1 including unseen-continuation
  //     backoff (the algebra knBigrams implements, swept over random
  //     counts instead of one fixture) ---
  property("KN rational mass partitions the denominator for random count tables") =
    Prop.forAll(Gen.nonEmptyListOf(for {
      w1 <- Gen.chooseNum(0, 5); w2 <- Gen.chooseNum(0, 5)
      c <- Gen.chooseNum(1L, 50L)
    } yield ((w1, w2), c))) { raw =>
      val c12 = raw.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      val nBi = BigInt(c12.size)
      val c1 = c12.groupBy(_._1._1).map { case (w, m) => w -> BigInt(m.values.sum) }
      val n1fw = c12.groupBy(_._1._1).map { case (w, m) => w -> BigInt(m.size) }
      val ncw = c12.groupBy(_._1._2).map { case (w, m) => w -> BigInt(m.size) }
      c12.keys.map(_._1).forall { w1 =>
        val den = 4 * c1(w1) * nBi
        val seen = c12.collect { case ((a, b), c) if a == w1 =>
          (BigInt(4 * c - 3).max(0)) * nBi + 3 * n1fw(w1) * ncw(b) }.sum
        val seenRight = c12.keys.collect { case (a, b) if a == w1 => b }.toSet
        val unseen = ncw.collect {
          case (w2, n) if !seenRight.contains(w2) => 3 * n1fw(w1) * n }.sum
        seen + unseen == den
      }
  }

  // --- BPE: rank-order training state == lowest-rank-first encoding ---
  // The theorem every deep-merge oracle and the OOV fallback rely on:
  // replaying the learned merge table lowest-rank-first over a trained
  // word's characters must land on EXACTLY the training loop's final
  // state for that word — for any corpus, any weights, any depth.
  property("BPE applyRanked reproduces the trained state on random corpora") = {
    val word = for {
      n <- Gen.chooseNum(1, 8)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val corpus = for {
      ws <- Gen.nonEmptyListOf(word).map(_.distinct.take(12))
      weights <- Gen.listOfN(ws.length, Gen.chooseNum(1L, 9L))
      rounds <- Gen.chooseNum(1, 24)
    } yield (ws.zip(weights), rounds)
    Prop.forAllNoShrink(corpus) { case (words, rounds) =>
      val learned = graft.operators.Bpe.trainChars(words, rounds)
      val rk = graft.operators.Bpe.rankMap(learned)
      learned.words.forall { case (w, _, syms) =>
        graft.operators.Bpe.applyRanked(
          w.map(_.toString).toIndexedSeq, rk, "") == syms
      }
    }
  }
}
