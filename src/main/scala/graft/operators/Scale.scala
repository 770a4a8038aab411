package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities for skew and co-location — the knobs a 1000-executor
  * deployment turns that local[32] never needs, kept as first-class
  * operators so plans are written scale-correct from the start.
  */
object Scale {

  /** Two-stage salted aggregation for skewed keys (SURVEY §4 "hotspot
    * avoidance"): stage 1 aggregates on (key, salt) — spreading a hot
    * key over `saltBuckets` reducers — stage 2 merges the partials on
    * the key alone. Correct for any commutative merge; exposed for
    * count/sum which cover the engine's rollup shapes.
    *
    * AQE's skew-join handling covers joins; this covers groupBy where
    * a single filter_id/event_type dominates the stream (the
    * reference's shuffleGrouping comment, `storm/.../Main.java:106`).
    */
  def saltedCount(df: DataFrame, keyCols: Seq[String],
      saltBuckets: Int, countCol: String = "cnt"): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    val partial = salted
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_partial"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum("_partial").as(countCol))
  }

  /** Salted sum — same two-stage shape for sum aggregates. */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltBuckets: Int, sumCol: String = "sum"): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    val partial = salted
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol)).as("_partial"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum("_partial").as(sumCol))
  }

  /** Write a table bucketed+sorted on its join key so repeated joins
    * on that key shuffle NEITHER side (SortMergeJoin reads co-located
    * buckets). This is the batch-layer answer to "the same join runs
    * every hour at 100 TB" — pay the shuffle once at write time.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — shuffle-free when
    * both were written with [[writeBucketed]] and compatible bucket
    * counts.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Deterministic hash sample: keep a row iff the first 8 hex chars
    * of md5(key) fall below `fraction` of the hex space. No RNG, no
    * seed state — the same row set on every run, every engine, every
    * cluster size (the property a reproducible training pipeline
    * needs; rate accuracy is ±2⁻³² of the requested fraction).
    */
  def deterministicSample(df: DataFrame, keyCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction in [0,1]: $fraction")
    // fraction 1.0 is an exact boundary users expect to be total; the
    // strict '<' against a clamped "ffffffff" threshold would drop rows
    // whose bucket is exactly ffffffff, so keep-everything is a no-op.
    if (fraction >= 1.0) df
    else df.filter(sampleBucket(col(keyCol)) < lit(hexThreshold(fraction)))
  }

  /** Deterministic train/validation/test split: label each row by
    * where md5(key) lands among the cumulative weight thresholds.
    * Disjoint, exhaustive, reproducible — and expressible as the same
    * CASE chain in any SQL engine.
    */
  def hashSplit(df: DataFrame, keyCol: String,
      weights: Seq[(String, Double)], labelCol: String = "split"): DataFrame = {
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val cums = weights.scanLeft(0.0)(_ + _._2).tail
    val bucket = sampleBucket(col(keyCol))
    val chain = weights.init.zip(cums.init).foldRight(
      lit(weights.last._1)) { case (((name, _), cum), elseCol) =>
      when(bucket < lit(hexThreshold(cum)), lit(name)).otherwise(elseCol)
    }
    df.withColumn(labelCol, chain)
  }

  /** Deterministic global shuffle into training shards: every row gets
    * a `shard` (equal slice of the md5 hex space — [[hashSplit]] with
    * uniform weights) and a `pos` (its rank within the shard by full
    * md5 order, id tiebreak). Together they define a reproducible
    * random permutation of the corpus — the training-order primitive:
    * re-running the pipeline, on any engine, yields byte-identical
    * shard membership AND intra-shard order, so a training run can be
    * resumed or replicated exactly. The salt gives each epoch/run its
    * own permutation.
    *
    * Scale: one shuffle on `shard` (each holds ~n/nShards rows) and a
    * per-shard sort — pick nShards so a shard fits an executor's sort
    * buffer (at 100 TB that's just "more shards", the same knob as
    * output file count). No global sort ever runs.
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "shuffle"): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val h = md5(concat_ws(":", lit(salt), col(idCol).cast("string")))
    val bucket = substring(col("_h"), 1, 8)
    val chain = (0 until nShards - 1).foldRight(
      lit(nShards - 1): Column) { case (i, els) =>
      when(bucket < lit(hexThreshold((i + 1).toDouble / nShards)),
        lit(i)).otherwise(els)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("_h"), col(idCol))
    df.withColumn("_h", h)
      .withColumn("shard", chain)
      .withColumn("pos", row_number().over(w))
      .drop("_h")
  }

  /** Stratified deterministic sample: keep at most `perGroup` rows per
    * stratum, chosen by md5(id) order (with the id itself as the final
    * tiebreak), so the kept set is stable across runs, partitionings,
    * and engines. The corpus-curation shape "N documents per
    * (language, source)" — one shuffle on the stratum keys, a
    * rank-limit per partition, no sort of the full data.
    */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String],
      idCol: String, perGroup: Int): DataFrame = {
    require(perGroup > 0, s"perGroup must be positive: $perGroup")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(sampleBucket(col(idCol)), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= perGroup)
      .drop("_rk")
  }

  /** First 8 hex chars of md5 — a uniform 32-bit bucket as a hex
    * string, comparable lexicographically in every engine.
    */
  def sampleBucket(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** `fraction` of the 32-bit hex space as an 8-char lower-hex string. */
  def hexThreshold(fraction: Double): String =
    f"${math.min(0xFFFFFFFFL, (fraction * 4294967296.0).toLong)}%08x"

  /** Serialized bloom filter over a table's (integral) join-key column
    * — one distributed aggregate over the small side.
    */
  def buildKeyBloom(small: DataFrame, keyCol: String,
      expectedKeys: Long = 1L << 20, fpp: Double = 0.01): Array[Byte] = {
    val bf = small.stat.bloomFilter(col(keyCol).cast("long"), expectedKeys, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership test against a serialized key bloom — the
    * native `BloomFilterMightContain` expression Spark's own runtime
    * row-level filtering injects, applied explicitly.
    */
  def bloomMightContain(bloomBytes: Array[Byte], key: Column): Column = {
    import org.apache.spark.sql.GraftExprBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    GraftExprBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      GraftExprBridge.expression(key.cast("long"))))
  }

  /** Bloom-pruned join: filter the big side by a bloom of the small
    * side's keys BEFORE the join shuffle, then join exactly. At 100 TB
    * the bloom (~1.2 MB per million keys at 1% fpp) ships as a plan
    * literal and kills ~99% of non-matching rows at the scan, so the
    * shuffle moves only (matches + fpp·misses); false positives are
    * removed by the exact join, so results are identical to a plain
    * join. For multi-GB small sides prefer [[writeBucketed]].
    */
  def bloomPrunedJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, expectedKeys: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    val bytes = buildKeyBloom(small, smallKey, expectedKeys, fpp)
    // alias both sides so same-named key columns resolve unambiguously
    big.filter(bloomMightContain(bytes, col(bigKey))).as("_bloom_big")
      .join(small.as("_bloom_small"),
        col(s"_bloom_big.$bigKey") === col(s"_bloom_small.$smallKey"))
  }

  /** Exact top-`k` rows per key through the custom partial/final
    * physical operator ([[graft.plans.TopKPerKeyNode]]): bounded
    * per-key heaps run INSIDE each input partition first, so the
    * shuffle carries at most k rows per (key, partition) — where the
    * window-function formulation (`row_number().over(...) <= k`)
    * ships and sorts the whole corpus. The order must be made TOTAL
    * by `tieCols` (ascending) after `orderCol`, so the result is
    * deterministic under any partitioning.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      k: Int, desc: Boolean = true, tieCols: Seq[String] = Nil,
      maxHeldRows: Int = graft.plans.TopKHeaps.maxHeldRows): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
    require(keyCols.nonEmpty, "keyCols must not be empty")
    if (k <= 0) return df.limit(0) // top-0 is empty, not an error
    val analyzed = df.queryExecution.analyzed
    // resolve through Dataset.col — session-conf-aware (case
    // sensitivity) and FAILS on ambiguity, where a name scan over
    // analyzed.output would silently bind the first of two same-named
    // columns after a join
    def attr(name: String) =
      org.apache.spark.sql.GraftExprBridge.expression(df.col(name)) match {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => a
      case other => throw new IllegalArgumentException(
        s"column $name did not resolve to an attribute of the input: $other")
    }
    val ordering =
      SortOrder(attr(orderCol), if (desc) Descending else Ascending) +:
        tieCols.map(c => SortOrder(attr(c), Ascending))
    org.apache.spark.sql.GraftPlanBridge.ofRows(df.sparkSession,
      graft.plans.TopKPerKeyNode(keyCols.map(attr), ordering, k, analyzed,
        maxHeldRows))
  }
}
