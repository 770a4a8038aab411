package graft.ml

import graft.functions.LogFunctions
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Per-filter online error classification — the reference's M1 operator
  * (`storm/.../ErrorClassifierBolt.java:39-105`): heuristically label
  * each message via the 25-word error lexicon, train a per-filter
  * naive-Bayes model (all of the first `fullTrainCount` samples, then
  * every `sampleEvery`-th), and once ≥ `minTrained` samples are seen,
  * classify each message; "error" classifications emit metric-2
  * counters.
  *
  * Batch form: `groupByKey(filter_id)` + `flatMapGroups` — one shuffle
  * on filter_id (the reference's fieldsGrouping), then a sequential
  * fold per filter, mirroring the stream order via an explicit sort
  * inside the group. State never leaves the executor.
  */
object ErrorClassifier {

  val ErrorCategory = "error"
  val RegularCategory = "regular"

  final case class Config(
      fullTrainCount: Long = 10000, // ErrorClassifierBolt.java:69
      sampleEvery: Long = 25,       // "
      minTrained: Long = 100,       // ErrorClassifierBolt.java:96
      memoryCapacity: Int = 1000)   // Classifier.java:32

  final case class Classified(
      filter_id: String, ord: Long, _raw: String, predicted: String)

  def tokenize(msg: String): Seq[String] =
    msg.split("\\s+").toSeq.filter(_.nonEmpty)

  def lexiconLabel(msg: String): String = {
    val l = msg.toLowerCase(java.util.Locale.ROOT)
    if (LogFunctions.ErrorWords.exists(l.contains)) ErrorCategory
    else RegularCategory
  }

  /** Classifier state: the model plus a count of ALL messages seen.
    * The sampling gate must run on messages seen, not samples trained —
    * gating on `model.trained` would freeze training permanently once
    * `trained` passes `fullTrainCount` off the sampling phase.
    */
  final case class State(model: BayesModel, seen: Long)
  object State {
    def empty(memoryCapacity: Int): State =
      State(BayesModel.empty(memoryCapacity), 0L)
  }

  /** Fold one message through the state: maybe-train (all of the first
    * `fullTrainCount` messages, then every `sampleEvery`-th seen),
    * classify once ≥ `minTrained` samples are trained.
    */
  def step(state: State, msg: String, cfg: Config): (State, String) = {
    val features = tokenize(msg)
    val shouldTrain = state.seen < cfg.fullTrainCount ||
      state.seen % cfg.sampleEvery == 0
    val model =
      if (shouldTrain) state.model.learn(lexiconLabel(msg), features)
      else state.model
    val predicted =
      if (model.trained >= cfg.minTrained) model.classify(features).getOrElse("")
      else ""
    (State(model, state.seen + 1), predicted)
  }

  /** Streaming per-filter fold over a partition whose rows arrive
    * clustered by filter_id and sorted by ord within each filter (the
    * secondary-sort contract [[classifyBatch]] establishes). State
    * resets at each filter boundary; one row in, one row out — nothing
    * is materialized, so a single dominant filter_id costs memory
    * O(model), not O(rows).
    */
  def foldSortedPartition(it: Iterator[(String, Long, String)],
      cfg: Config): Iterator[Classified] = {
    var curFid: String = null
    var state: State = null
    it.map { case (fid, ord, raw) =>
      if (fid != curFid) { curFid = fid; state = State.empty(cfg.memoryCapacity) }
      val (next, predicted) = step(state, raw, cfg)
      state = next
      Classified(fid, ord, raw, predicted)
    }
  }

  /** Batch classification: rows (filter_id, ord, _raw) → one
    * `Classified` per row, processed in `ord` order per filter.
    *
    * Secondary sort, not group materialization: hash-repartition on
    * filter_id (the reference's fieldsGrouping), sort each partition by
    * (filter_id, ord) — Spark's external sorter spills, so a skewed
    * filter never has to fit in memory — then stream the fold with
    * [[foldSortedPartition]]. The earlier `flatMapGroups` formulation
    * buffered an entire filter's rows per group; one dominant filter at
    * 100× data meant executor OOM.
    */
  def classifyBatch(rows: DataFrame, cfg: Config = Config())(
      implicit spark: SparkSession): Dataset[Classified] = {
    import spark.implicits._
    rows.select(
        col("filter_id").cast("string"),
        col("ord").cast("long"),
        col("_raw").cast("string"))
      .repartition(col("filter_id"))
      .sortWithinPartitions(col("filter_id"), col("ord"))
      .as[(String, Long, String)]
      .mapPartitions(it => foldSortedPartition(it, cfg))
  }

  /** Fit per-filter models on a (bounded) sample collected to the
    * driver — the train/apply split for 100 TB scoring: training state
    * is small (lexicon-labeled counts over ≤ sampleRows rows per
    * filter), the full-corpus pass is a stateless broadcast map.
    */
  def trainModels(sample: DataFrame, cfg: Config = Config()): Map[String, BayesModel] = {
    import org.apache.spark.sql.functions.col
    sample.select(
        col("filter_id").cast("string"),
        col("ord").cast("long"),
        col("_raw").cast("string"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (fid, rows) =>
        var model = BayesModel.empty(cfg.memoryCapacity)
        rows.sortBy(_.getLong(1)).foreach { r =>
          val msg = r.getString(2)
          model = model.learn(lexiconLabel(msg), tokenize(msg))
        }
        fid -> model
      }
  }

  /** Per-filter integer decision surface derived from a frozen model:
    * every probability the classifier multiplies is mapped ONCE, on the
    * driver, to a micro-nat cost `floor(-ln p · scale)` — priors and
    * per-(category, feature) costs — so the decision becomes an exact
    * integer argmin that replays identically in any engine (the same
    * move [[graft.operators.LangModel]] made for LM scoring after the
    * float-product form proved oracle-hostile). Features unknown to a
    * model cost `(0.5)/(1+0)` in EVERY category and therefore cannot
    * change the argmin; they are omitted from the table and skipped at
    * scoring time on both sides.
    */
  final case class FilterCosts(
      priors: Map[String, Long],               // category -> cost
      feats: Map[String, Map[String, Long]])   // feature -> category -> cost

  def decisionCosts(models: Map[String, BayesModel],
      scale: Long = 1000000L): Map[String, FilterCosts] =
    models.map { case (fid, m) =>
      val total = m.categoryCount.values.sum.toDouble
      val priors = m.categoryCount.map { case (c, n) =>
        c -> math.floor(-math.log(n.toDouble / total) * scale).toLong
      }
      val known = m.featureCount.valuesIterator.flatMap(_.keysIterator).toSet
      val feats = known.iterator.map { f =>
        f -> m.categoryCount.keysIterator.map { c =>
          c -> math.floor(-math.log(m.featureProbability(f, c)) * scale).toLong
        }.toMap
      }.toMap
      fid -> FilterCosts(priors, feats)
    }

  /** Classify rows under the quantized decision surface: cost(category)
    * = prior + Σ per-occurrence feature costs, predicted = argmin, ties
    * to the lexicographically LARGER category (mirroring the float
    * classifier's maxBy-(score, name) rule). Stateless broadcast map —
    * the same zero-shuffle 100 TB shape as [[scoreBroadcast]], with the
    * decision itself engine-exact.
    */
  def scoreQuantized(rows: DataFrame, costs: Map[String, FilterCosts])(
      implicit spark: SparkSession): Dataset[Classified] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(costs)
    rows.select(
        col("filter_id").cast("string"),
        col("ord").cast("long"),
        col("_raw").cast("string"))
      .as[(String, Long, String)]
      .map { case (fid, ord, raw) =>
        val predicted = bc.value.get(fid).flatMap { fc =>
          val toks = tokenize(raw)
          val totals = fc.priors.map { case (c, p) =>
            c -> toks.foldLeft(p) { (acc, f) =>
              acc + fc.feats.get(f).map(_(c)).getOrElse(0L)
            }
          }
          totals.reduceLeftOption { (a, b) =>
            if (b._2 < a._2 || (b._2 == a._2 && b._1 > a._1)) b else a
          }.map(_._1)
        }.getOrElse("")
        Classified(fid, ord, raw, predicted)
      }
  }

  /** Score rows with frozen broadcast models — no shuffle, no state:
    * one map over the scan. Rows for filters without a model get an
    * empty prediction.
    */
  def scoreBroadcast(rows: DataFrame, models: Map[String, BayesModel])(
      implicit spark: SparkSession): Dataset[Classified] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val bc = spark.sparkContext.broadcast(models)
    rows.select(
        col("filter_id").cast("string"),
        col("ord").cast("long"),
        col("_raw").cast("string"))
      .as[(String, Long, String)]
      .map { case (fid, ord, raw) =>
        val predicted = bc.value.get(fid)
          .flatMap(_.classify(tokenize(raw))).getOrElse("")
        Classified(fid, ord, raw, predicted)
      }
  }

}
