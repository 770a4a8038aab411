package graft

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
  private lazy val query: Seq[Double] =
    emb.filter(col("vec_id") === 0).head().getSeq[Float](1).map(_.toDouble)

  test("brute-force top-k is ordered desc and matches a locally computed ranking") {
    import spark.implicits._
    val got = Similarity.topKByQuery(emb.filter(col("vec_id") > 0),
      "vec_id", "embedding", query, 10).as[(Long, Double)].collect()
    assert(got.length == 10)
    assert(got.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
    // local ground truth
    val all = emb.filter(col("vec_id") > 0)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    def cos(v: Seq[Float]): Double = {
      val d = v.map(_.toDouble)
      val dot = d.zip(query).map { case (a, b) => a * b }.sum
      dot / (math.sqrt(d.map(x => x * x).sum) * math.sqrt(query.map(x => x * x).sum))
    }
    val truth = all.map { case (id, v) => (id, cos(v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
    assert(got.map(_._1).toSeq == truth)
  }

  test("IVF probe achieves reasonable recall vs brute force") {
    import spark.implicits._
    val base = emb.filter(col("vec_id") > 0)
    val idx = Similarity.buildIvf(base, "vec_id", "embedding", nCells = 8)
    // every vector lands in exactly one cell
    assert(idx.assigned.count() == base.count())
    val ivf = Similarity.queryIvf(idx, "vec_id", "embedding", query, k = 20, nprobe = 4)
      .as[(Long, Double)].collect().map(_._1).toSet
    val brute = Similarity.topKByQuery(base, "vec_id", "embedding", query, 20)
      .as[(Long, Double)].collect().map(_._1).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall@20 = $recall (random fixture vectors scatter across cells)")
    assert(ivf.size == 20)
  }

  test("written IVF table probes read only the probed cell partitions") {
    import spark.implicits._
    val base = emb.filter(col("vec_id") > 0)
    val idx = Similarity.buildIvf(base, "vec_id", "embedding", nCells = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/index"
    Similarity.writeIvf(idx, dir)
    // physically partitioned by cell
    val cells = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName)
    assert(cells.length == idx.centroids.length)
    val probed = Similarity.queryIvfTable(spark, dir, idx.centroids,
      "vec_id", "embedding", query, k = 20, nprobe = 3)
    // partition pruning reaches the scan
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters")(1).take(120).contains("cell"),
      s"no partition pruning:\n$plan")
    // and results agree with the in-memory probe of the same index
    val fromTable = probed.as[(Long, Double)].collect().map(_._1).toSeq
    val inMemory = Similarity.queryIvf(idx, "vec_id", "embedding", query,
      k = 20, nprobe = 3).as[(Long, Double)].collect().map(_._1).toSeq
    assert(fromTable == inMemory)
  }

  test("LSH pairs are exact-verified: every returned pair has cos >= threshold") {
    import spark.implicits._
    val pairs = Similarity.lshPairs(emb, "vec_id", "embedding",
      nTables = 4, planesPerTable = 6, threshold = 0.25)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b, c) => a < b && c >= 0.25 })
  }
}
