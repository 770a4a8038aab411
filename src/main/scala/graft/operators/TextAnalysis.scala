package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis profile over a document table (builder brief:
  * language-ID, quality scoring, token counting, fingerprinting).
  * One projection — no shuffle, runs at scan speed.
  */
object TextAnalysis {

  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).as("n_chars"),
      TextFunctions.tokenCount(t).as("n_tokens"),
      TextFunctions.subwordCount(t).as("n_subwords"),
      round(TextFunctions.punctRatio(t), 6).as("punct_ratio"),
      round(TextFunctions.stopwordRatio(t), 6).as("stopword_ratio"),
      TextFunctions.qualityScoreScaled(t).as("quality"),
      TextFunctions.langId(t).as("lang_guess"),
      TextFunctions.fingerprint(t).as("fp"))
  }

  /** Corpus health report: per-group document counts, token mass,
    * median quality, and mean length — the dashboard a curation
    * pipeline reads BEFORE choosing budgets/mixtures/gates. One
    * map-side-combinable aggregate over one projection; group
    * cardinality (lang × source) bounds the output. All statistics
    * replay exactly in SQL: counts and sums are integers, the mean is
    * one IEEE division, and the median interpolates two integers
    * (`percentile` ≡ `quantile_cont`), rounded to the engine's
    * standard 6 decimals.
    */
  def corpusReport(df: DataFrame, textCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must not be empty")
    val t = col(textCol)
    df.select(groupCols.map(col) ++ Seq(
        TextFunctions.tokenCount(t).cast("long").as("_tok"),
        TextFunctions.qualityScoreScaled(t).as("_q"),
        length(t).cast("long").as("_len")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_tok")).as("n_tokens"),
        round(expr("percentile(_q, 0.5)"), 6).as("med_quality"),
        round(avg(col("_len")), 6).as("mean_chars"))
  }

  /** Gopher's default stop-word rule list (Rae et al. 2021, §A1.1.2:
    * "contains at least two of the following English words"). */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality rules (Rae et al. 2021, §A1.1.2) as one scan-speed
    * projection: per-document rule counters plus the composite `keep`
    * verdict. Every threshold is evaluated in INTEGER arithmetic
    * (ratio bounds become cross-multiplied ppm comparisons), so the
    * whole gate replays bit-exactly in any engine — no float ever
    * decides a document's fate.
    *
    * Rules: word count in [minWords, maxWords]; mean word length in
    * [minMeanLen, maxMeanLen] (3·n ≤ chars ≤ 10·n); symbol-to-word
    * ratio (`#` chars + `...` runs) ≤ maxSymbolPpm; bullet-starting
    * lines ≤ maxBulletPpm of lines; ellipsis-ending lines ≤
    * maxEllipsisPpm; words containing an alphabetic char ≥
    * minAlphaPpm; ≥ minStopHits DISTINCT stop-list words present.
    * The stop list is a parameter (Gopher's English eight by default)
    * so the rule stays meaningful on non-English or synthetic corpora.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanLen: Long = 3, maxMeanLen: Long = 10,
      maxSymbolPpm: Long = 100000, maxBulletPpm: Long = 100000,
      maxEllipsisPpm: Long = 300000, minAlphaPpm: Long = 800000,
      stopWords: Seq[String] = GopherStopWords,
      minStopHits: Long = 2): DataFrame = {
    val t = col(textCol)
    val ws = filter(split(t, "\\s+"), w => length(w) > 0)
    val ls = split(t, "\n")
    val lws = transform(ws, w => lower(w))
    val stopArr = array(stopWords.map(lit): _*)
    df.select(
        col(idCol),
        size(ws).cast("long").as("n_words"),
        coalesce(aggregate(ws, lit(0L), (acc, w) => acc + length(w)),
          lit(0L)).as("word_chars"),
        ((length(t) - length(replace(t, lit("#"), lit("")))) +
          (length(t) - length(replace(t, lit("..."), lit("")))) / 3)
          .cast("long").as("n_symbols"),
        size(ls).cast("long").as("n_lines"),
        size(filter(ls, l => trim(l).like("- %") || trim(l).like("* %") ||
          trim(l).like("• %"))).cast("long").as("n_bullet"),
        size(filter(ls, l => trim(l).like("%...")))
          .cast("long").as("n_ellipsis"),
        size(filter(ws, w => w.rlike("[A-Za-z]")))
          .cast("long").as("n_alpha"),
        size(filter(stopArr, s => exists(lws, w => w === s)))
          .cast("long").as("n_stop"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("word_chars") >= lit(minMeanLen) * col("n_words") &&
          col("word_chars") <= lit(maxMeanLen) * col("n_words") &&
          col("n_symbols") * lit(1000000L) <=
            lit(maxSymbolPpm) * col("n_words") &&
          col("n_bullet") * lit(1000000L) <=
            lit(maxBulletPpm) * col("n_lines") &&
          col("n_ellipsis") * lit(1000000L) <=
            lit(maxEllipsisPpm) * col("n_lines") &&
          col("n_alpha") * lit(1000000L) >=
            lit(minAlphaPpm) * col("n_words") &&
          col("n_stop") >= minStopHits)
  }

  /** Corpus-wide heavy-hitter tokens: exact frequencies, top-k with a
    * deterministic tie order. Explode → one map-side-combinable
    * shuffle; the top-k is a TakeOrdered, not a full sort.
    */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Context-window chunking: split each document into fixed-size
    * token chunks with `overlap` tokens of context carried between
    * consecutive chunks (the standard pretraining/RAG windowing).
    * Pure per-row generator — explode of slices, no shuffle; chunk
    * count and boundaries are integer arithmetic, so the DuckDB
    * oracle reproduces them exactly.
    *
    * Output: (idCol, chunk_idx, n_chunk_tokens, chunk_text).
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got $overlap / $chunkSize")
    val step = chunkSize - overlap
    val toks = TextFunctions.tokens(col(textCol))
    // chunks cover starts 0, step, 2·step, … but only starts that add at
    // least one token beyond the carried overlap (start + overlap < n):
    // nChunks = 1 + ceil(max(0, n - chunkSize) / step). Integer-exact so
    // the DuckDB oracle reproduces it; empty docs produce no chunks.
    val nChunks = when(size(toks) === 0, lit(0))
      .otherwise(lit(1) +
        ((greatest(size(toks) - chunkSize, lit(0)) + (step - 1)) / step)
          .cast("int"))
    df.select(col(idCol), toks.as("_tk"), nChunks.as("_nc"))
      .filter(col("_nc") > 0)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("_nc") - 1),
          i => slice(col("_tk"), i * step + 1, lit(chunkSize)))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        size(col("col")).as("n_chunk_tokens"),
        concat_ws(" ", col("col")).as("chunk_text"))
  }

  /** Gopher-style repetition metrics per document — the standard
    * pretraining quality gates for boilerplate/spam: fraction of
    * duplicate tokens, fraction of duplicate bigrams, and the share of
    * the single most frequent token. Fractions ship floor-scaled to
    * parts-per-million BIGINTs so thresholding and the oracle compare
    * are engine-exact.
    *
    * The per-row metrics are one projection (no shuffle); the
    * mode-token share is an explode → two map-side-combinable
    * aggregations keyed by the doc id — at 100 TB the shuffle carries
    * (doc, distinct-token) pairs, bounded by document vocabulary, not
    * corpus size.
    */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = TextFunctions.tokens(lower(col(textCol)))
    def ppm(num: Column, den: Column): Column =
      when(den === 0, lit(0L))
        .otherwise(floor(num.cast("double") * 1000000d / den.cast("double"))
          .cast("bigint"))
    val bigrams = when(size(col("_tk")) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(col("_tk")) - 1),
        i => concat_ws(" ", slice(col("_tk"), i, lit(2)))))
    val perRow = df
      .select(col(idCol), tk.as("_tk"))
      .withColumn("_bg", bigrams)
      .select(col(idCol),
        col("_tk"),
        size(col("_tk")).as("n_tokens"),
        ppm(size(col("_tk")) - size(array_distinct(col("_tk"))),
          size(col("_tk"))).as("dup_token_ppm"),
        ppm(size(col("_bg")) - size(array_distinct(col("_bg"))),
          size(col("_bg"))).as("dup_bigram_ppm"))
    val topShare = perRow
      .select(col(idCol), explode(col("_tk")).as("_t"))
      .groupBy(col(idCol), col("_t")).agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol)).agg(max(col("_c")).as("_top"))
    perRow.drop("_tk")
      .join(topShare, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("dup_token_ppm"),
        col("dup_bigram_ppm"),
        ppm(coalesce(col("_top"), lit(0L)), col("n_tokens"))
          .as("top_token_ppm"))
  }

  /** Pattern redaction (PII scrubbing shape): apply `rules` —
    * (regex, replacement) pairs — in order to the text column. Pure
    * projection, codegen'd regexp_replace chain, no shuffle; the
    * patterns must be RE2-compatible so the identical rule list runs
    * in any engine.
    */
  def redact(df: DataFrame, textCol: String,
      rules: Seq[(String, String)], outCol: String = "redacted"): DataFrame =
    df.withColumn(outCol,
      rules.foldLeft(col(textCol)) { case (c, (pat, rep)) =>
        regexp_replace(c, pat, rep)
      })

  /** The default scrub list: emails, long digit runs, hex ids. */
  val DefaultRedactions: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "[0-9a-fA-F]{16,}" -> "<HEX>",
    "[0-9]{4,}" -> "<NUM>")

  /** Per-document top-k tokens by TF-IDF (score = tf · ln(N/df)).
    * Scores ship as floor-scaled integers (×10⁶) so ranking and
    * equality are engine-stable. Two shuffles (tf, then document
    * frequency) + a per-doc window — the df relation is tiny
    * (vocabulary-sized) and broadcast back onto tf.
    *
    * Cross-engine note: unlike the other floor-scaled oracles (which
    * floor algebraically exact values), this floors a transcendental.
    * Verified on the fixtures at every sf: the nearest score sits
    * ≥ 3.5e-4 scaled units (~10⁵ ulps) from a floor boundary and no
    * two distinct (tf, df) pairs collide within 1e-3, so 1-ulp libm
    * disagreement between engines cannot flip a floor or a rank.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val n = df.count()
    val toks = df.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df_t"))
    val scored = tf.join(broadcast(dfreq), "token")
      .withColumn("score_scaled",
        floor(lit(1e6) * col("tf") * log(lit(n.toDouble) / col("df_t")))
          .cast("bigint"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_scaled").desc, col("token"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df_t"),
        col("score_scaled"))
  }
}
