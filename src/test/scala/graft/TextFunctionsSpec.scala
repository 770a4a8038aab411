package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {

  private def one(raw: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(raw).toDF("x").select(c).head().get(0)
  }

  test("tokens/shingles: whitespace split, n-gram windows, short-doc fallback") {
    assert(one("a  b   c", tokens(col("x"))) == Seq("a", "b", "c"))
    assert(one("a b c d", shingles(col("x"), 3)) == Seq("a b c", "b c d"))
    assert(one("a b", shingles(col("x"), 3)) == Seq("a b")) // shorter than n
    assert(one("abcd", charShingles(col("x"), 3)) == Seq("abc", "bcd"))
    assert(one("ab", charShingles(col("x"), 3)) == Seq("ab"))
  }

  test("subword count: letter runs, digit runs, punct marks (RE2-compatible)") {
    assert(one("hello world42, ok!", subwordCount(col("x"))) == 6)
    // hello | world | 42 | , | ok | !
  }

  test("rolling hash: deterministic, normalization-invariant, content-sensitive") {
    val a = one("Hello,  World!", rollingHash64(col("x"))).asInstanceOf[Long]
    val b = one("hello world", rollingHash64(col("x"))).asInstanceOf[Long]
    assert(a == b) // casefold + punct-strip + whitespace-collapse
    val c = one("hello worlds", rollingHash64(col("x"))).asInstanceOf[Long]
    assert(a != c)
    assert(a == one("Hello,  World!", rollingHash64(col("x"))).asInstanceOf[Long])
  }

  test("fingerprint md5 matches the same normalization") {
    assert(one("Hello,  World!", fingerprint(col("x"))) ==
      one("hello world", fingerprint(col("x"))))
  }

  test("langId picks marker-dominant language; 'und' without markers") {
    assert(one("the cat and the dog is here", langId(col("x"))) == "en")
    assert(one("der hund und die katze ist nicht da", langId(col("x"))) == "de")
    assert(one("zzz qqq xxx", langId(col("x"))) == "und")
  }

  test("langIdTrigram classifies sentences in each profiled language; 'und' otherwise") {
    assert(one("the weather of the morning is making things good", langIdTrigram(col("x"))) == "en")
    assert(one("ich verstehe nicht warum der versuch schon wieder gescheitert ist", langIdTrigram(col("x"))) == "de")
    assert(one("el gobierno ha presentado los resultados del estudio con la comision", langIdTrigram(col("x"))) == "es")
    assert(one("le directeur avait fait une erreur dans les travaux", langIdTrigram(col("x"))) == "fr")
    assert(one("zzz qqq xxx", langIdTrigram(col("x"))) == "und")
    assert(one("", langIdTrigram(col("x"))) == "und")
  }

  test("trigramScore counts non-overlapping occurrences exactly") {
    import spark.implicits._
    // " th", "the", "he " each occur once in " the "; profile sums add up
    val got = Seq("the").toDF("x")
      .select(trigramScore(col("x"), Seq(" th", "the", "he ")).as("s"))
      .head().getDouble(0)
    assert(got == 3.0)
    // repeated grams count every occurrence: " ab ab ab " has three "ab "
    val rep = Seq("ab ab ab").toDF("x")
      .select(trigramScore(col("x"), Seq("ab ")).as("s")).head().getDouble(0)
    assert(rep == 3.0)
  }

  test("quality scaled score is monotone in obvious quality signals") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and runs far away to the hills " * 3
    val bad = "@#$% ^&*! ~~ ||"
    val scores = Seq(good, bad).toDF("x")
      .select(qualityScoreScaled(col("x"))).collect().map(_.getLong(0))
    assert(scores(0) > scores(1))
    assert(scores.forall(s => s >= 0 && s <= 10000))
  }

  test("repetitionProfile: duplicate token/bigram fractions and top-token share") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam"),            // all dup, one token dominates
      (2L, "all tokens here are unique now"), // no repetition
      (3L, "")                                // empty: all metrics 0
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .repetitionProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: 4 tokens, 3 dups -> 750000 ppm; 3 bigrams, 2 dups -> 666666;
    // top token 4/4 -> 1000000
    assert(got(1L) == ((4, 750000L, 666666L, 1000000L)))
    // doc 2: 6 unique tokens, 5 unique bigrams, top share 1/6 -> 166666
    assert(got(2L) == ((6, 0L, 0L, 166666L)))
    assert(got(3L) == ((0, 0L, 0L, 0L)))
  }

  test("redact scrubs emails, hex ids and digit runs in rule order") {
    import spark.implicits._
    val df = Seq((1L,
      "reach me at jane.doe+x@corp.example.org ref 0123456789abcdef00 pin 123 card 98765432"))
      .toDF("id", "text")
    val out = graft.operators.TextAnalysis
      .redact(df, "text", graft.operators.TextAnalysis.DefaultRedactions)
      .head().getString(2)
    assert(out == "reach me at <EMAIL> ref <HEX> pin 123 card <NUM>")
  }

  test("chunkTokens: fixed windows with overlap, full coverage, exact tail") {
    import spark.implicits._
    val doc = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = graft.operators.TextAnalysis
      .chunkTokens(doc, "doc_id", "text", chunkSize = 4, overlap = 1)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_chunk_tokens", "chunk_text")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    // 10 tokens, step 3: starts 0,3,6 -> sizes 4,4,4; start 9 would be
    // a pure suffix of chunk 2 (zero new tokens) and must NOT appear
    assert(chunks.map(_._1).toSeq == Seq(0, 1, 2))
    assert(chunks.map(_._2).toSeq == Seq(4, 4, 4))
    assert(chunks(0)._3 == "t1 t2 t3 t4")
    assert(chunks(1)._3 == "t4 t5 t6 t7") // 1-token overlap carried
    assert(chunks(2)._3 == "t7 t8 t9 t10") // full coverage to the last token
    // empty docs produce no chunks
    val none = graft.operators.TextAnalysis
      .chunkTokens(Seq((2L, "")).toDF("doc_id", "text"), "doc_id", "text", 4, 1)
    assert(none.count() == 0)
  }

  test("chunkTokens: no zero-new-token trailing chunk at overlap boundaries") {
    import spark.implicits._
    // the ADVICE r2 repro: 30 tokens, chunkSize 32, overlap 8 -> exactly
    // one chunk (the old formula emitted a second, pure-suffix chunk)
    def nChunks(n: Int, size: Int, ov: Int): Seq[(Int, Int)] = {
      val doc = Seq((1L, (1 to n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
      graft.operators.TextAnalysis.chunkTokens(doc, "doc_id", "text", size, ov)
        .orderBy("chunk_idx").select("chunk_idx", "n_chunk_tokens")
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    }
    assert(nChunks(30, 32, 8) == Seq((0, 30)))
    assert(nChunks(32, 32, 8) == Seq((0, 32)))
    // 33 tokens: second chunk carries 8 overlap + 1 new token
    assert(nChunks(33, 32, 8) == Seq((0, 32), (1, 9)))
    // 56 = 32 + 24: start 24 would end exactly at the overlap boundary
    assert(nChunks(56, 32, 8) == Seq((0, 32), (1, 32)))
    // 57: a third... no — starts 0,24; start 48 adds token 57 (9-token chunk)
    assert(nChunks(57, 32, 8) == Seq((0, 32), (1, 32), (2, 9)))
    // every token is still covered: last chunk always reaches token n
    assert(nChunks(100, 32, 8).map(_._2).sum >= 100)
  }

  test("gopherRules: verdict catches each violation class, passes clean text") {
    val s = spark
    import s.implicits._
    val good = ("good", ("the word " * 30).trim) // 60 words, stops present
    val short = ("short", "the a few words only")
    val longWords = ("longw",
      "the word " + (Seq.fill(60)("extraordinarily").mkString(" ")))
    val symbols = ("sym", "the word " + (Seq.fill(60)("ok###").mkString(" ")))
    val bullets = ("bul", "the word\n" + Seq.fill(9)("- item").mkString("\n"))
    val noAlpha = ("num", "the word " + (Seq.fill(60)("12345").mkString(" ")))
    val noStops = ("nostop", Seq.fill(60)("word").mkString(" "))
    val df = Seq(good, short, longWords, symbols, bullets, noAlpha, noStops)
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .gopherRules(df, "doc_id", "text", minWords = 10,
        stopWords = Seq("the", "word"))
      .collect().map(r => r.getString(0) -> r.getBoolean(r.length - 1)).toMap
    assert(got == Map("good" -> true, "short" -> false, "longw" -> false,
      "sym" -> false, "bul" -> false, "num" -> false, "nostop" -> false),
      got.toString)
  }

  test("bm25Rank: tf saturation, length normalization, idf ordering, rare-term wins") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "cat dog"),                       // short: one hit each term
      (2L, "cat cat cat cat dog zebra"),     // repeats + the rare term
      (3L, "cat " + Seq.fill(60)("filler").mkString(" ")), // long doc, one hit
      (4L, "no matching terms at all here"),
      (5L, "zebra only"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bm25Rank(df, "doc_id", "text",
        Seq("cat", "zebra"), topN = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val rank = got.map(_._1)
    val score = got.toMap
    assert(!score.contains(4L)) // zero matches → filtered
    // zebra (df=2) out-idfs cat (df=3): doc 2 holds both and wins
    assert(rank.head == 2L)
    // length normalization: doc 3's single cat in 61 tokens scores
    // below doc 1's single cat in 2 tokens
    assert(score(1L) > score(3L))
    // determinism: exact rerun equality
    val again = graft.operators.TextAnalysis.bm25Rank(df, "doc_id",
        "text", Seq("cat", "zebra"), topN = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.toSeq == again.toSeq)
  }

  test("bm25RankIndexed equals the scan path exactly (pruning is lossless)") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val idx = java.nio.file.Files.createTempDirectory("bm25idx").toString
    try {
      graft.sources.TextIndex.write(docs, "doc_id", "text", idx)
      val q = Seq("spark", "table", "query")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val scan = rows(graft.operators.TextAnalysis.bm25Rank(
        docs, "doc_id", "text", q, topN = 50))
      val indexed = rows(graft.operators.TextAnalysis.bm25RankIndexed(
        docs, "doc_id", "text", idx, q, topN = 50))
      assert(scan.nonEmpty && scan == indexed)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(idx))
        .sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("bm25Stats: a token-less corpus fails with a message, not an NPE") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "   "), (2L, "")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.bm25Stats(df, "text", Seq("a"))
    }
    assert(e.getMessage.contains("no tokens"))
  }

  test("bm25Stats: integer idf literals positive, avgdl exact") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "x y"))
      .toDF("doc_id", "text")
    val (n, avgdl, idfs) = graft.operators.TextAnalysis.bm25Stats(
      df, "text", Seq("a", "x", "zz"))
    assert(n == 3)
    assert(avgdl == (8L * 1000000L) / 3L) // floor((4+2+2)·1e6 / 3)
    // Lucene idf: ln(1 + (N−df+0.5)/(df+0.5)) — positive even at df=N
    assert(idfs.values.forall(_ > 0))
    assert(idfs("zz") > idfs("x") && idfs("x") > idfs("a")) // rarity order
  }

  test("vocabBuild/encodeIds: rank order, min-count floor, OOV encodes to 0") {
    import spark.implicits._
    val df = Seq((1L, "b a b c b a d"), (2L, "a c a")).toDF("doc_id", "text")
    // counts: a=4 b=3 c=2 d=1
    val vocab = graft.operators.TextAnalysis.vocabBuild(df, "text",
      maxSize = 3, minCount = 2L)
    val v = vocab.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v == Map("a" -> (1L, 4L), "b" -> (2L, 3L), "c" -> (3L, 2L)))
    val enc = graft.operators.TextAnalysis.encodeIds(df, "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 1 = b a b c b a d -> 2 1 2 3 2 1 0
    assert((1 to 7).map(p => enc((1L, p.toLong))) ==
      Seq(2L, 1L, 2L, 3L, 2L, 1L, 0L))
    assert((1 to 3).map(p => enc((2L, p.toLong))) == Seq(1L, 3L, 1L))
  }

  test("vocabBuild: rank ties break on token; maxSize truncates the tail") {
    import spark.implicits._
    val df = Seq((1L, "x y x y z")).toDF("doc_id", "text")
    val v = graft.operators.TextAnalysis.vocabBuild(df, "text", maxSize = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("x" -> 1L, "y" -> 2L)) // tie x/y -> token order; z cut
  }

  test("hashEmbed: exact signed counts against a local md5 recomputation") {
    import spark.implicits._
    val df = Seq((1L, "a b a c"), (2L, "b b")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.hashEmbed(df, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def cellsOf(toks: Seq[String]): Map[String, Long] =
      toks.groupBy(t => md5hex("b:" + t).take(2))
        .map { case (b, ts) =>
          b -> ts.map(t =>
            if (md5hex("s:" + t).charAt(0) <= '7') 1L else -1L).sum }
        .filter(_._2 != 0L)
    val expect = Map(1L -> cellsOf(Seq("a", "b", "a", "c")),
      2L -> cellsOf(Seq("b", "b")))
      .flatMap { case (id, m) => m.map { case (b, v) => (id, b) -> v } }
    assert(got == expect)
  }

  test("hashEmbed: inner products track raw TF inner products on the fixture") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents").limit(40)
    val hashed = graft.operators.TextAnalysis.hashEmbed(docs, "doc_id", "text", 2)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => r.getString(1) -> r.getLong(2)).toMap }
    val raw = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(lower(col("text"))).as("tk"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).groupBy(identity).view.mapValues(_.size.toLong).toMap)
      .toMap
    def dotH(a: Map[String, Long], b: Map[String, Long]): Long =
      a.keySet.intersect(b.keySet).toSeq.map(k => a(k) * b(k)).sum
    def dotR(a: Map[String, Long], b: Map[String, Long]): Long =
      a.keySet.intersect(b.keySet).toSeq.map(k => a(k) * b(k)).sum
    val ids = hashed.keys.toSeq.sorted.take(12)
    val ratios = for {
      i <- ids; j <- ids if i < j
      r = dotR(raw(i), raw(j)) if r > 0
    } yield dotH(hashed(i), hashed(j)).toDouble / r
    assert(ratios.nonEmpty)
    val mean = ratios.sum / ratios.length
    // 256 buckets over a 31-token vocabulary: collisions are rare, the
    // estimator should sit near 1 on average
    assert(mean > 0.8 && mean < 1.2, f"mean dot ratio $mean%.3f")
  }
}
