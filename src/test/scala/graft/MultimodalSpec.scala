package graft

import graft.multimodal.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.syntheticMediaTable(Tables.load(spark, sfDir, "documents"))

  test("media table has the binary+meta schema contract") {
    val sch = media.schema
    assert(sch("media").dataType.typeName == "binary")
    val metaFields = sch("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .map(f => (f.name, f.dataType))
    assert(metaFields == Multimodal.MediaMetaType.map(f => (f.name, f.dataType)))
  }

  test("feature extraction: one fixed-dim vector per row, deterministic") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(f1.length == media.count())
    assert(f1.forall(_.getSeq[Float](1).length == 16))
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(f1.map(_.toString).sorted.sameElements(f2.map(_.toString).sorted))
  }

  test("metadata-only projection prunes the binary column at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("mm").toString
    media.write.mode("overwrite").parquet(dir)
    val plan = Multimodal.metaProfile(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("media#") || !plan.split("ReadSchema")(1).contains("media"),
      s"binary column not pruned:\n$plan")
  }

  test("media transforms stay inside the SQL plan (no ExistingRDD scan-break)") {
    Seq(
      "features" -> Multimodal.extractFeatures(media),
      "resize" -> Multimodal.resizeMedia(media, 64, 48),
      "frames" -> Multimodal.sampleFrameRows(media, 4)
    ).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("ExistingRDD"),
        s"$name breaks the plan at an RDD scan:\n$plan")
      assert(plan.contains("MapPartitions") || plan.contains("SerializeFromObject"),
        s"$name lost its typed-transform node:\n$plan")
    }
  }

  test("resize rewrites payload and metadata to the target dimensions") {
    val resized = Multimodal.resizeMedia(media, 64, 48)
    // names + types match the contract (nullability differs: the typed
    // transform proves media_id/meta non-null, which is strictly tighter)
    assert(resized.schema.map(f => (f.name, f.dataType.typeName)) ==
      Multimodal.MediaSchema.map(f => (f.name, f.dataType.typeName)))
    val metaFields = resized.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .map(f => (f.name, f.dataType))
    assert(metaFields == Multimodal.MediaMetaType.map(f => (f.name, f.dataType)))
    val rows = resized.select(length(col("media")),
      col("meta.width"), col("meta.height")).distinct().collect()
    assert(rows.length == 1)
    assert(rows.head.getInt(0) == 48 && rows.head.getInt(1) == 64 &&
      rows.head.getInt(2) == 48)
  }

  test("frame sampling fans out ≤ n rows per media, partition-local") {
    val frames = Multimodal.sampleFrameRows(media, 4)
    val perMedia = frames.groupBy("media_id").count().collect()
    assert(perMedia.forall(_.getLong(1) <= 4))
    assert(frames.count() > media.count()) // genuine fan-out on this fixture
    // generator shape: no shuffle anywhere in the lineage
    // "Shuffled" catches both ShuffledRDD (RDD API) and ShuffledRowRDD (SQL)
    val lineage = frames.rdd.toDebugString
    assert(!lineage.contains("Shuffled"),
      s"frame fan-out shuffles:\n$lineage")
  }

  test("resize/frames oracle preconditions hold in the fixture (non-null ASCII text)") {
    // q_multimodal_resize / q_multimodal_frames oracles equate bytes
    // with characters and md5 over cycled text — sound only while every
    // document is non-null, non-empty, pure-ASCII. Pin that here so a
    // fixture regeneration surfaces as a clear failure, not oracle drift.
    val docs = Tables.load(spark, sfDir, "documents")
    val bad = docs.filter(col("text").isNull || length(col("text")) === 0 ||
      length(col("text")) =!= octet_length(col("text"))).count()
    assert(bad == 0, s"$bad documents violate the byte≡char oracle assumptions")
  }

  test("stub codec is pure: same bytes → same features") {
    val b = "hello world".getBytes("UTF-8")
    assert(Multimodal.StubCodec.decodeImage(b, 8).toSeq ==
      Multimodal.StubCodec.decodeImage(b, 8).toSeq)
    assert(Multimodal.StubCodec.sampleFrames(b, 3).length == 3)
  }
}
