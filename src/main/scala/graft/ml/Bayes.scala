package graft.ml

import scala.collection.immutable.Queue

/** Minimal naive-Bayes text classifier with a bounded sliding memory —
  * the behavioral contract of the reference's vendored classifier
  * (`storm/.../de/daslaboratorium/machinelearning/classifier/
  * Classifier.java:32,141-394`, `BayesClassifier.java:29-106`):
  * learn/forget over a FIFO window of `memoryCapacity` samples,
  * feature probability = Laplace-ish weighted average
  * `(weight·assumedProb + count·empirical) / (weight + count)`,
  * category score = prior × ∏ feature probabilities, classify = argmax.
  *
  * Fresh implementation in immutable Scala (persistent maps + queue);
  * deterministic given sample order — no RNG anywhere, unlike the
  * reference's 1/25 `Random` sampling (`ErrorClassifierBolt.java:69`),
  * which we replace with modulo sampling so replays are identical.
  */
final case class BayesModel(
    memoryCapacity: Int,
    featureCount: Map[String, Map[String, Long]], // category -> feature -> n
    categoryCount: Map[String, Long],
    memory: Queue[(String, Seq[String])],
    trained: Long) {

  private val smoothingWeight = 1.0
  private val assumedProb = 0.5

  def learn(category: String, features: Seq[String]): BayesModel = {
    val withNew = add(category, features, +1)
      .copy(memory = memory.enqueue((category, features)),
        trained = trained + 1)
    if (withNew.memory.size > memoryCapacity) {
      val ((oldCat, oldFeats), rest) = withNew.memory.dequeue
      withNew.add(oldCat, oldFeats, -1).copy(memory = rest)
    } else withNew
  }

  private def add(category: String, features: Seq[String], d: Long): BayesModel = {
    val catFeats = featureCount.getOrElse(category, Map.empty)
    val updated = features.foldLeft(catFeats) { (m, f) =>
      val n = m.getOrElse(f, 0L) + d
      if (n <= 0) m - f else m.updated(f, n)
    }
    val catN = categoryCount.getOrElse(category, 0L) + d
    copy(
      featureCount =
        if (updated.isEmpty) featureCount - category
        else featureCount.updated(category, updated),
      categoryCount =
        if (catN <= 0) categoryCount - category
        else categoryCount.updated(category, catN))
  }

  private def totalSamples: Long = categoryCount.values.sum

  /** P(feature | category) with weighted-average smoothing. */
  def featureProbability(feature: String, category: String): Double = {
    val catN = categoryCount.getOrElse(category, 0L)
    val empirical =
      if (catN == 0) 0.0
      else featureCount.getOrElse(category, Map.empty)
        .getOrElse(feature, 0L).toDouble / catN
    val totalF = featureCount.valuesIterator
      .map(_.getOrElse(feature, 0L)).sum.toDouble
    (smoothingWeight * assumedProb + totalF * empirical) /
      (smoothingWeight + totalF)
  }

  /** Unnormalized P(category | features) = prior × ∏ P(f|c). */
  def score(features: Seq[String], category: String): Double = {
    val total = totalSamples
    if (total == 0) return 0.0
    val prior = categoryCount.getOrElse(category, 0L).toDouble / total
    features.foldLeft(prior)((p, f) => p * featureProbability(f, category))
  }

  /** Highest-scoring category (ties broken by category name for
    * determinism); None when untrained.
    */
  def classify(features: Seq[String]): Option[String] =
    if (categoryCount.isEmpty) None
    else Some(categoryCount.keysIterator.toSeq.sorted
      .map(c => (c, score(features, c)))
      .maxBy { case (c, s) => (s, c) }._1)
}

object BayesModel {
  def empty(memoryCapacity: Int = 1000): BayesModel =
    BayesModel(memoryCapacity, Map.empty, Map.empty, Queue.empty, 0L)
}
