package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al. 2023, DSIR) —
  * pick raw-corpus documents whose hashed-n-gram distribution looks
  * like a TARGET slice, by importance weight under a pair of bag-of-
  * hashed-ngram models. The published recipe behind "select web data
  * that resembles Wikipedia/books" pretraining mixes, as a pair of
  * corpus operators.
  *
  * Everything is deterministic and engine-exact, so the whole chain
  * (featurize → fit both models → weigh → resample) replays in DuckDB:
  *
  *  - features are lowercased whitespace unigrams + adjacent bigrams,
  *    hashed into `buckets` by the first 4 hex chars of md5 — an
  *    engine-neutral hash (Spark's `hash()` would not replay);
  *  - the per-bucket log-likelihood ratio is integer micro-nats:
  *    floor(ln((c+1)/(tot+B))·1e6) of each model separately, then a
  *    BIGINT difference — the [[LangModel]] fixed-point discipline, so
  *    no float crosses an aggregation;
  *  - a document's log-weight is the exact BIGINT dot product of its
  *    bucket counts with the ratio table;
  *  - resampling replaces RNG with the md5 trick used everywhere else
  *    in this engine ([[Scale.deterministicSample]]): the Gumbel noise
  *    g = −ln(−ln(u)) draws u from the doc id's md5, floored onto the
  *    same micro-nat grid, so "sample ∝ exp(logw)" becomes an integer
  *    top-k that two engines rank identically.
  *
  * Scale shape (100 TB): both model fits are map-side-combinable count
  * aggregates; the ratio table is bounded by `buckets` (≤ 65,536 —
  * the 4-hex-char hash space) and BROADCAST to the scoring join, so
  * the corpus never shuffles on gram. Scoring is one scan + one
  * per-(doc, bucket) partial aggregate; selection is a top-k
  * (TakeOrdered per-partition heap), not a global sort.
  */
object Dsir {

  /** Micro-nat fixed-point scale — shared with [[LangModel]]. */
  val Scale = 1000000L

  /** Hashed feature buckets of a text column: unigram + bigram tokens,
    * each mapped to `pmod(int(md5[0:4]), buckets)`. Pure
    * `functions._` composition — codegen-friendly, and the md5 hash
    * replays bit-for-bit in any engine (4 hex chars = 16 bits, so the
    * parse stays well inside integer range on both sides).
    */
  def featureBuckets(c: Column, buckets: Int): Column =
    gramBuckets(TextFunctions.tokens(lower(c)), buckets)

  /** [[featureBuckets]] over an already-built tokens array. Bigrams
    * come from `zip_with(slice, slice)` — NOT an index-lambda with
    * `element_at(tokens, i)`, which inlines the whole tokenization
    * into the per-element lambda and turns gram extraction O(tokens²)
    * per document (measured: the index form cost q_dsir_weights 16.5 s
    * at sf0.1; this form 100× less gram-extraction work on long docs).
    */
  def gramBuckets(toks: Column, buckets: Int): Column = {
    require(buckets > 0 && buckets <= 65536,
      s"buckets must be in 1..65536 (the 4-hex-char hash space): $buckets")
    val bigrams = when(size(toks) >= 2,
      zip_with(slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    transform(concat(toks, bigrams),
      g => (conv(substring(md5(g), 1, 4), 16, 10).cast("long")
        % buckets).cast("int"))
  }

  /** Per-bucket feature counts of a corpus slice: (bucket, c). One
    * explode + one combiner-friendly aggregate; tokens materialize in
    * a projection BEFORE the generator so the tokenizer runs a
    * constant number of times per row.
    */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int): DataFrame =
    df.select(TextFunctions.tokens(lower(col(textCol))).as("_toks"))
      .select(explode(gramBuckets(col("_toks"), buckets)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))

  /** The importance-ratio table: (bucket, llr_micro) for every bucket
    * 0..B−1, where llr_micro = floor(ln p_target·1e6) −
    * floor(ln p_raw·1e6) under add-one smoothing. Buckets unseen in
    * either slice take that slice's smoothed floor — the table is
    * DENSE (exactly `buckets` rows), which is what makes it broadcast
    * state rather than a join against the corpus vocabulary.
    */
  def ratioTable(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int): DataFrame = {
    val spark = target.sparkSession
    val all = spark.range(buckets).select(col("id").cast("int").as("bucket"))
    // each side's corpus scan runs ONCE: the counts relation is bounded
    // by `buckets`, so checkpoint it and derive the totals from the
    // materialized counts instead of a second scan. The two eager
    // checkpoints are independent scans of different slices — run them
    // on concurrent driver threads (guide §2.6) so the target scan
    // rides the raw scan's tail instead of queuing behind it.
    var ct: DataFrame = null
    var cr: DataFrame = null
    graft.streaming.StreamState.inParallel(
      () => ct = bucketCounts(target, textCol, buckets)
        .withColumnRenamed("c", "ct").localCheckpoint(true),
      () => cr = bucketCounts(raw, textCol, buckets)
        .withColumnRenamed("c", "cr").localCheckpoint(true))
    def costMicro(cnt: Column, tot: Column): Column =
      floor(log((cnt + 1).cast("double") /
        (tot + lit(buckets)).cast("double")) * Scale).cast("long")
    all.join(ct, Seq("bucket"), "left")
      .join(cr, Seq("bucket"), "left")
      .na.fill(0L, Seq("ct", "cr"))
      // single-row totals broadcast-cross-join cleanly (scalar state)
      .crossJoin(broadcast(ct.agg(sum("ct").as("t_tot"))))
      .crossJoin(broadcast(cr.agg(sum("cr").as("r_tot"))))
      .select(col("bucket"),
        (costMicro(col("ct"), col("t_tot")) -
          costMicro(col("cr"), col("r_tot"))).as("llr_micro"))
  }

  /** Per-document importance weight under the fitted pair of models:
    * (idCol, n_feats, logw_micro) — logw_micro the exact BIGINT sum of
    * bucket-count × llr_micro. The ratio table is collected (bounded
    * by `buckets`) and broadcast through a join so the corpus-side
    * plan is scan → per-(doc,bucket) combine → per-doc sum.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, buckets: Int = 4096): DataFrame = {
    val ratio = ratioTable(target, docs, textCol, buckets)
    docs.select(col(idCol),
        TextFunctions.tokens(lower(col(textCol))).as("_toks"))
      .select(col(idCol), explode(gramBuckets(col("_toks"), buckets))
        .as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("n"))
      .join(broadcast(ratio), "bucket")
      .groupBy(col(idCol))
      .agg(sum("n").as("n_feats"),
        sum(col("n") * col("llr_micro")).as("logw_micro"))
  }

  /** Deterministic Gumbel key for importance RESAMPLING: u strictly in
    * (0, 1) from the first 8 md5 hex chars of `salt:id` (+0.5 keeps u
    * off BOTH endpoints, so −ln(−ln u) can never hit ±Inf), floored
    * onto the micro-nat grid. Sampling without replacement ∝
    * exp(logw) is then the integer top-k of logw_micro + gumbel_micro
    * (the Gumbel-max trick), which two engines rank identically.
    */
  def gumbelMicro(id: Column, salt: String): Column = {
    val u = (conv(substring(md5(concat(lit(salt + ":"),
      id.cast("string"))), 1, 8), 16, 10).cast("double") + 0.5) / 4294967296.0
    floor(-log(-log(u)) * Scale).cast("long")
  }

  /** DSIR selection: the `k` documents sampled without replacement
    * with probability ∝ their importance weight, via the Gumbel-max
    * top-k over [[importanceWeights]]. Output (idCol, logw_micro,
    * key_micro), deterministic across runs and engines.
    */
  def select(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, k: Int, buckets: Int = 4096,
      salt: String = "dsir"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    importanceWeights(docs, idCol, textCol, target, buckets)
      .withColumn("key_micro",
        col("logw_micro") + gumbelMicro(col(idCol), salt))
      .select(col(idCol), col("logw_micro"), col("key_micro"))
      .orderBy(col("key_micro").desc, col(idCol))
      .limit(k)
  }
}
