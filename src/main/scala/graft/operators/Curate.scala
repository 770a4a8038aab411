package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation operators for training-data assembly: select the
  * best documents up to a token budget, and rebalance a corpus to a
  * target domain mixture. Both are deterministic (no RNG) and
  * integer/IEEE-exact, so any SQL engine reproduces the kept set
  * bit-for-bit — the property a reproducible data pipeline needs.
  */
object Curate {

  /** Budgeted selection: order documents by (scoreCol desc, idCol) and
    * keep the prefix whose cumulative token count stays within
    * `tokenBudget` — "take the highest-quality documents until the
    * budget is spent", the standard corpus-assembly shape.
    *
    * Scale design mirrors [[Pack.packSequences]]: a global window over
    * `ORDER BY score DESC` would funnel 100 TB through one task, so the
    * prefix sum is two-phase — range-repartition on the global order,
    * per-partition totals (one row per partition) collected into
    * exclusive offsets, then a partition-local running sum. On top of
    * that, partitions whose exclusive offset already exceeds the budget
    * are pruned BEFORE the window runs: the expensive part costs
    * O(selected prefix), not O(corpus).
    *
    * Output: (idCol, scoreCol, tokensCol, cum_tokens), cum_tokens
    * inclusive. Ties on the score break by idCol, so the kept set is
    * total-order stable.
    */
  def selectByTokenBudget(df: DataFrame, idCol: String, tokensCol: String,
      scoreCol: String, tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive: $tokenBudget")
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // Freeze partition assignment before both downstream jobs read the
    // ids (range boundaries come from sampling — same rationale as
    // Pack.packSequences; see the lifecycle note there).
    val ranged = df
      .select(col(idCol), col(scoreCol), col(tokensCol).cast("long").as(tokensCol))
      .repartitionByRange(parallelism, col(scoreCol).desc, col(idCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = ranged.groupBy("_pid")
      .agg(sum(col(tokensCol)).as("_tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) =>
      (pid, acc + tot)
    }.init.zip(totals).map { case ((_, off), (pid, _)) => pid -> off }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = broadcast(offsets.toSeq.toDF("_pid", "_poff"))
    val w = Window.partitionBy("_pid").orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(offsetDf, Seq("_pid"))
      // partition prune: a partition whose exclusive offset is already
      // past the budget cannot contribute a kept row
      .filter(col("_poff") < tokenBudget)
      .withColumn("cum_tokens", col("_poff") + sum(col(tokensCol)).over(w))
      .filter(col("cum_tokens") <= tokenBudget)
      .select(col(idCol), col(scoreCol), col(tokensCol), col("cum_tokens"))
  }

  /** Exact top-fraction selection by score: keep the rows whose
    * `scoreCol` is at or above the threshold that captures at least
    * `keepPpm` parts-per-million of the corpus (ties at the threshold
    * are all kept, so the rule is deterministic with no ordering
    * dependence). The fraction ships as an integer ppm so the target
    * count `ceil(N·ppm/10^6)` is exact integer arithmetic in any
    * engine — no float quantile, no approx sketch.
    *
    * Scale design: the threshold comes from a score HISTOGRAM
    * (`groupBy(score)`, one map-side-combinable aggregate), and the
    * running-count window runs over that histogram — cardinality of
    * distinct scores (≤10001 for the floor-scaled quality score), not
    * corpus rows — so the single-partition window is safe at any
    * corpus size. The threshold then broadcast-joins back as a scalar.
    */
  def keepTopByScore(df: DataFrame, scoreCol: String,
      keepPpm: Long): DataFrame = {
    require(keepPpm > 0 && keepPpm <= 1000000L,
      s"keepPpm must be in (0, 1000000]: $keepPpm")
    // df is evaluated exactly twice (histogram pass + the final filter
    // pass) — persist upstream if the input is expensive to recompute.
    // Both the running count and the total come out of ONE window pass
    // over the histogram, so no extra scan or join for N.
    val hist = df.groupBy(col(scoreCol)).agg(count(lit(1)).as("_c"))
    val wCum = Window.orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("_cc", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(wAll))
    // threshold = the LARGEST score whose at-or-above count reaches the
    // target (every lower score also qualifies — max picks the tightest)
    val thr = cum
      .filter(col("_cc") >= expr(s"(_n * ${keepPpm}L + 999999L) div 1000000L"))
      .agg(max(col(scoreCol)).as("_thr"))
    df.crossJoin(broadcast(thr))
      .filter(col(scoreCol) >= col("_thr"))
      .drop("_thr")
  }

  /** Token-balanced shard export — the output side of the pipeline: a
    * curated corpus written as `shard=N/` parquet partitions where each
    * shard holds ~`tokensPerShard` tokens of documents in id order.
    * Shard assignment is [[Pack.packSequences]]'s global prefix sum
    * (a document belongs to the shard its FIRST token lands in, so a
    * shard's token sum is bounded by `tokensPerShard` + one document's
    * overhang) — deterministic, so re-running the export reproduces
    * byte-identical shard membership. Returns the shard count.
    *
    * Scale: the prefix sum is the two-phase Pack shape; the write is
    * one pass partitioned by shard — downstream trainers read
    * shard-pruned paths.
    */
  def writeShards(df: DataFrame, idCol: String, textCol: String,
      tokensPerShard: Int, path: String): Long = {
    require(tokensPerShard > 0, s"tokensPerShard must be positive: $tokensPerShard")
    val shards = Pack.packSequences(df, idCol, textCol, tokensPerShard)
      .select(col(idCol), col("pack_first").as("shard"))
    df.join(shards, Seq(idCol))
      // co-locate each shard before the partitioned write: without
      // this every task holds rows of many shards and emits one file
      // per (task, shard) — a small-file explosion that at cluster
      // scale floods the namenode and at any scale slows the commit.
      // One exchange buys one file per shard.
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    df.sparkSession.read.parquet(path)
      .select("shard").distinct().count()
  }

  /** Per-shard manifest of a written shard export — the data-card /
    * reproducibility record a training run pins its inputs to: doc
    * count, token mass, id range, and a deterministic content
    * fingerprint per shard (BIGINT sum of each member id's 32-bit md5
    * bucket — order-free, so any execution plan produces the same
    * value, and engine-replayable, so an external auditor recomputes
    * it from the source table). Reads the partitioned layout BACK from
    * disk: the manifest describes the artifact, not the plan that
    * produced it — a truncated or re-written shard shows up as a
    * fingerprint mismatch. One combinable aggregate, output bounded by
    * shard count.
    */
  def shardManifest(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, textCol: String): DataFrame =
    spark.read.parquet(path)
      .select(col(idCol), col(textCol), col("shard").cast("long").as("shard"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.TextFunctions.tokenCount(col(textCol))
          .cast("long")).as("n_tokens"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"),
        sum(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long")).as("id_fp"))

  /** Mixture balancing: deterministically downsample every domain to
    * the token count of the smallest domain, so all domains carry equal
    * token weight (the "uniform mixture" rebalance; feed a pre-filtered
    * frame to hit any other target ratio). Per-domain keep fraction is
    * min(1, min_domain_tokens / domain_tokens); rows are kept by the
    * same md5-threshold rule as [[Scale.deterministicSample]], with the
    * threshold computed IN-PLAN (`format_string("%08x", …)`) from the
    * domain aggregate — both the fraction arithmetic (IEEE double) and
    * the hex compare reproduce exactly in any engine.
    *
    * Cost at scale: one map-side-combinable aggregate over the corpus
    * (domain cardinality rows), a broadcast join of that tiny relation,
    * and a scan-level filter — no data shuffle of the corpus itself.
    * The input is persisted (MEMORY_AND_DISK) so the totals pass and
    * the main pass share ONE evaluation — a computed tokens column
    * (e.g. `tokenCount(text)`) must not tokenize the corpus twice.
    * Pass a narrow projection (id, domain, tokens + carried columns),
    * not the raw corpus with its text payload; the cache is released
    * by [[graft.GraftSession.releaseCachedBlocks]] between queries.
    *
    * Output: input row + (domain token total, keep fraction) —
    * `dom_tokens`, `keep_frac` — for auditability.
    */
  def mixtureBalance(df: DataFrame, domainCol: String, idCol: String,
      tokensCol: String): DataFrame = {
    val input = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one row per domain — checkpoint so the min-branch doesn't re-run
    // the corpus aggregate (corpus scans: 1 for the totals + 1 main pass,
    // and the main pass reads the cache the totals pass populated)
    val perDom = input.groupBy(col(domainCol))
      .agg(sum(col(tokensCol)).cast("long").as("dom_tokens"))
      .localCheckpoint(true)
    val minTok = perDom.agg(min(col("dom_tokens")).as("_min_tok"))
    val ann = perDom.crossJoin(minTok)
      // a domain with zero total tokens would make the ratio 0/0 = NaN;
      // keeping such a (weightless) domain whole is the harmless choice
      .withColumn("keep_frac", when(col("dom_tokens") === 0, lit(1.0))
        .otherwise(
          least(lit(1.0), col("_min_tok").cast("double") / col("dom_tokens").cast("double"))))
      .withColumn("_thr", format_string("%08x",
        floor(col("keep_frac") * lit(4294967296.0)).cast("long")))
      .drop("_min_tok")
    input.join(broadcast(ann), domainCol)
      .filter(col("keep_frac") >= 1.0 ||
        Scale.sampleBucket(col(idCol)) < col("_thr"))
      .drop("_thr")
  }

  /** Temperature-based domain sampling — the multilingual pretraining
    * rule (sample domain d ∝ (n_d/N)^(1/T); Conneau & Lample 2019,
    * XLM-R): keep_frac_d = min(1, keepFrac · N · q_d / n_d) with
    * q_d = n_d^(1/T) / Σ_e n_e^(1/T), flattening the domain
    * distribution so low-resource domains keep more of their mass.
    * Rows are kept by the engine's deterministic md5-threshold rule.
    *
    * `temperature` is restricted to powers of two so the exponent is
    * REPEATED sqrt — IEEE-correctly-rounded in every engine, unlike
    * pow/exp/ln (the round-8 oracle lesson: transcendentals diverge
    * across engine builds). The per-domain root then QUANTIZES to an
    * integer grid (`floor(rt · 2^20)` as BIGINT) before the Σ over
    * domains, so the prefix sum is integer-exact — an engine free to
    * combine window aggregates tree-wise (segment trees, partial
    * combines) cannot drift an ulp from Spark's sequential fold and
    * flip a `floor(keep_frac · 2^32)` boundary row (round-9 ADVICE).
    * Only the final keep-fraction division happens in float, each step
    * one IEEE op in a fixed association. Same scale shape as
    * [[mixtureBalance]]: one map-side-combinable aggregate, broadcast
    * threshold join, corpus unshuffled; same caching contract.
    * Output: input row + (dom_n, keep_frac).
    */
  def temperatureSample(df: DataFrame, domainCol: String, idCol: String,
      temperature: Int = 2, keepFrac: Double = 0.5): DataFrame = {
    require(temperature >= 2 && Integer.bitCount(temperature) == 1,
      s"temperature must be a power of two >= 2 (exponent = repeated " +
        s"sqrt keeps the oracle transcendental-free): $temperature")
    require(keepFrac > 0 && keepFrac <= 1,
      s"keepFrac must be in (0, 1]: $keepFrac")
    val roots = Integer.numberOfTrailingZeros(temperature)
    val input = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perDom = input.groupBy(col(domainCol))
      .agg(count(lit(1)).cast("long").as("dom_n"))
      .localCheckpoint(true)
    def root(c: Column): Column = (1 to roots).foldLeft(c)((x, _) => sqrt(x))
    val wDom = Window.orderBy(domainCol)
    // quantize the root to a 2^20 integer grid BEFORE summing: the
    // prefix sum is then exact in any engine regardless of how it
    // associates the window aggregate
    val cum = perDom
      .withColumn("_rti",
        floor(root(col("dom_n").cast("double")) * lit(1048576.0))
          .cast("long"))
      .withColumn("_cum", sum(col("_rti")).over(wDom))
    val tot = cum.agg(max(col("_cum")).as("_S"),
      sum(col("dom_n")).cast("double").as("_N"))
    val ann = cum.crossJoin(broadcast(tot))
      .withColumn("keep_frac",
        least(lit(1.0), lit(keepFrac) * col("_N")
          * col("_rti").cast("double") / col("_S").cast("double")
          / col("dom_n").cast("double")))
      .withColumn("_thr", format_string("%08x",
        floor(col("keep_frac") * lit(4294967296.0)).cast("long")))
      .select(col(domainCol), col("dom_n"), col("keep_frac"), col("_thr"))
    input.join(broadcast(ann), domainCol)
      .filter(col("keep_frac") >= 1.0 ||
        Scale.sampleBucket(col(idCol)) < col("_thr"))
      .drop("_thr")
  }

  /** TARGET-ratio mixture (the DoReMi-style generalization of
    * [[mixtureBalance]]'s uniform rule): downsample domains so kept
    * token mass lands in the given proportions — `weightsPpm` are
    * integer parts-per-million-style weights (only ratios matter; they
    * need not sum to 10^6). The achievable total is bound by the
    * scarcest domain relative to its weight: with r_d = dom_tokens_d /
    * w_d, keep_frac_d = min(1, min_e(r_e) · w_d / dom_tokens_d). Rows
    * are kept by the same md5-threshold rule as [[mixtureBalance]];
    * every arithmetic step is plain IEEE double on integer inputs, so
    * an external engine evaluating the same expressions reproduces the
    * kept set exactly. Domains absent from `weightsPpm` are DROPPED
    * (explicit targeting); a weight must be positive.
    *
    * Same scale shape as [[mixtureBalance]]: input persisted once, one
    * map-side-combinable aggregate, broadcast threshold join, no
    * corpus shuffle — and the same CACHING contract: the lazy result
    * holds a MEMORY_AND_DISK cache of the input; long-lived sessions
    * sweep with [[graft.GraftSession.releaseCachedBlocks]] between
    * invocations. Output: input row + (dom_tokens, keep_frac).
    */
  def mixtureTarget(df: DataFrame, domainCol: String, idCol: String,
      tokensCol: String, weightsPpm: Seq[(String, Long)]): DataFrame = {
    require(weightsPpm.nonEmpty, "weightsPpm must not be empty")
    require(weightsPpm.forall(_._2 > 0),
      s"weights must be positive: $weightsPpm")
    require(weightsPpm.map(_._1).distinct.size == weightsPpm.size,
      s"duplicate domain in weights: $weightsPpm")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weightsPpm.toDF(domainCol, "_w")
    val input = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perDom = input.groupBy(col(domainCol))
      .agg(sum(col(tokensCol)).cast("long").as("dom_tokens"))
      .join(broadcast(w), domainCol) // inner: unlisted domains drop out
      .localCheckpoint(true)
    // a listed domain with ZERO tokens must not drive the min to 0 and
    // silently zero every other domain's keep fraction — it supplies
    // no token mass, is kept whole by the dom_tokens=0 branch below,
    // and is excluded from the binding-ratio min
    val minR = perDom.filter(col("dom_tokens") > 0).agg(
      min(col("dom_tokens").cast("double") / col("_w").cast("double"))
        .as("_minr"))
    val ann = perDom.crossJoin(minR)
      .withColumn("keep_frac", when(col("dom_tokens") === 0, lit(1.0))
        .otherwise(least(lit(1.0),
          col("_minr") * col("_w").cast("double") /
            col("dom_tokens").cast("double"))))
      .withColumn("_thr", format_string("%08x",
        floor(col("keep_frac") * lit(4294967296.0)).cast("long")))
      .drop("_minr", "_w")
    input.join(broadcast(ann), domainCol)
      .filter(col("keep_frac") >= 1.0 ||
        Scale.sampleBucket(col(idCol)) < col("_thr"))
      .drop("_thr")
  }

  /** CCNet-style head/middle/tail split (Wenzek et al. 2019 bucket a
    * corpus by per-language LM perplexity terciles and train on the
    * "head"): label every document with the tercile of its integer LM
    * score within its language. Thresholds are VALUES, not row ranks —
    * t1 = the smallest score whose cumulative count reaches n/3, t2
    * likewise at 2n/3 — so ties at a boundary land in one bucket and
    * the labeling replays exactly in SQL.
    *
    * Scale: one map-side-combinable (group, score) histogram over the
    * corpus (bounded by distinct integer scores per group), a window
    * over that small histogram, and a broadcast threshold join back —
    * the corpus itself never sorts or shuffles, unlike the textbook
    * `ntile() OVER (PARTITION BY lang ORDER BY score)` which funnels
    * each language through one task.
    *
    * Output: the input plus a `bucket` column ('head' ≤ t1 < 'middle'
    * ≤ t2 < 'tail').
    */
  def perplexityBuckets(scored: DataFrame, groupCol: String,
      scoreCol: String): DataFrame = {
    val thr = perplexityThresholds(scored, groupCol, scoreCol)
    scored.join(broadcast(thr), Seq(groupCol))
      .withColumn("bucket",
        when(col(scoreCol) <= col("_t1"), lit("head"))
          .when(col(scoreCol) <= col("_t2"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("_t1", "_t2")
  }

  /** [[perplexityBuckets]]' tercile thresholds alone: one (group,
    * score) histogram pass over `scored`, no join back. For a caller
    * that only needs the per-group boundary values — e.g. freezing
    * head thresholds at fit time — this evaluates `scored` ONCE,
    * where the full bucket labeling evaluates it twice (histogram +
    * join-back sides). t1 is by construction an ATTAINED score (the
    * smallest score whose cumulative count reaches n/3), so
    * max(score | score <= t1) = t1 — the head-bucket max equals the
    * threshold itself. Output: (groupCol, _t1, _t2). */
  def perplexityThresholds(scored: DataFrame, groupCol: String,
      scoreCol: String): DataFrame = {
    val hist = scored.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("_c"))
    val wCum = Window.partitionBy(groupCol).orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("_cc", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(wAll))
    cum.groupBy(col(groupCol)).agg(
      min(when(col("_cc") * 3 >= col("_n"), col(scoreCol))).as("_t1"),
      min(when(col("_cc") * 3 >= col("_n") * 2, col(scoreCol))).as("_t2"))
  }

  /** Curriculum interleave — the deterministic epoch ORDER a trainer
    * reads the mixed corpus in: every domain's documents spread evenly
    * through the epoch in proportion to the domain's size (stride
    * scheduling: the r-th document of a domain with n docs lands at
    * phase (2r−1)/(2n) of the epoch), with documents WITHIN a domain
    * ordered by descending `scoreCol` so each domain contributes its
    * best documents first — easy-first curriculum per domain, no
    * domain ever batched into one contiguous run.
    *
    * The phase is quantized onto a 2^40 integer grid with BIGINT floor
    * division — `stride = (2r−1) · (2^40 div (2n))` — so the ordering
    * key is engine-exact AND overflow-safe at any domain size: the
    * per-domain step `2^40 div (2n)` is computed FIRST, so the product
    * is bounded by 2^40 even when a domain holds billions of documents
    * (the naive `((2r−1)·2^40) div (2n)` overflows 64 bits past ~2^22
    * docs/domain). Quantization error vs the exact phase is < 2r/2^40
    * of the epoch — sub-ulp until a single domain nears 2^39 docs.
    * Output: (idCol, domainCol, dom_rank, stride);
    * the curriculum itself is `ORDER BY stride, domainCol, dom_rank`,
    * a range-partitioned sort a cluster executes without any
    * single-task global window (callers wanting a materialized ordinal
    * compose the Pack two-phase prefix-sum shape over that sort).
    *
    * Scale shape: one hash shuffle on domain for the in-domain rank
    * window, one broadcast of per-domain counts. No global window.
    */
  def curriculum(df: DataFrame, domainCol: String, idCol: String,
      scoreCol: String): DataFrame = {
    val perDom = df.groupBy(col(domainCol))
      .agg(count(lit(1)).cast("long").as("dom_n"))
    val wDom = Window.partitionBy(domainCol)
      .orderBy(col(scoreCol).desc, col(idCol))
    df.select(col(idCol), col(domainCol), col(scoreCol))
      .withColumn("dom_rank", row_number().over(wDom).cast("long"))
      .join(broadcast(perDom), Seq(domainCol))
      .withColumn("stride", expr(
        "(2 * dom_rank - 1) * (1099511627776 div (2 * dom_n))"))
      .select(col(idCol), col(domainCol), col("dom_rank"), col("stride"))
  }
}
