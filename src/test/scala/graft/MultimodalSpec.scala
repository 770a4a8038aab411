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

  test("PNG codec: encode→decode round trip is pixel-exact against the generating formula") {
    val id = 12345L
    val (w, h) = (23, 17)
    val img = Multimodal.ImageCodec.decode(
      Multimodal.ImageCodec.renderPng(id, w, h))
    assert(img.getWidth == w && img.getHeight == h)
    for (x <- 0 until w; y <- 0 until h) {
      val p = img.getRGB(x, y)
      assert(((p >> 16) & 0xFF) == Multimodal.ImageCodec.r(id, x, y), s"($x,$y) R")
      assert(((p >> 8) & 0xFF) == Multimodal.ImageCodec.g(id, x, y), s"($x,$y) G")
      assert((p & 0xFF) == Multimodal.ImageCodec.b(id, x, y), s"($x,$y) B")
    }
  }

  test("PNG codec: nearest-neighbor resize maps exactly the indices the oracle replays") {
    val id = 7L
    val src = Multimodal.ImageCodec.decode(
      Multimodal.ImageCodec.renderPng(id, 20, 14))
    val out = Multimodal.ImageCodec.resizeNearest(src, 8, 6)
    for (x2 <- 0 until 8; y2 <- 0 until 6) {
      val (sx, sy) = (x2 * 20 / 8, y2 * 14 / 6)
      assert((out.getRGB(x2, y2) & 0xFFFFFF) == (src.getRGB(sx, sy) & 0xFFFFFF),
        s"($x2,$y2) should be src($sx,$sy)")
    }
  }

  test("PNG decode profile: distributed decode sums equal the formula; payload never shuffles") {
    // a pushed filter, not limit(): a global limit inserts the one
    // shuffle this gate exists to forbid in the decode path itself
    val png = Multimodal.pngMediaTable(
      Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 40))
    val prof = Multimodal.decodeProfile(png)
    val rows = prof.collect()
    assert(rows.length == 40)
    rows.foreach { row =>
      val id = row.getLong(0)
      val (w, h) = ((16 + id % 16).toInt, (12 + id % 8).toInt)
      assert(row.getInt(1) == w && row.getInt(2) == h)
      var rs = 0L
      for (x <- 0 until w; y <- 0 until h)
        rs += Multimodal.ImageCodec.r(id, x, y)
      assert(row.getLong(3) == rs, s"id=$id r_sum")
    }
    val lineage = prof.rdd.toDebugString
    assert(!lineage.contains("Shuffled"), s"decode shuffles:\n$lineage")
  }

  test("GIF codec: sequence encode → frame-iterated decode is pixel-exact per frame") {
    val id = 4242L
    val (w, h, nf) = (21, 15, 4)
    val frames = Multimodal.GifCodec.decodeFrames(
      Multimodal.GifCodec.renderGif(id, w, h, nf))
    assert(frames.length == nf)
    frames.foreach { case (f, fw, fh, sum) =>
      assert(fw == w && fh == h, s"frame $f dims")
      var want = 0L
      for (x <- 0 until w; y <- 0 until h)
        want += Multimodal.GifCodec.lum(id, f, x, y)
      assert(sum == want, s"frame $f lum_sum")
    }
    // frames really differ (the demux isn't re-serving frame 0)
    assert(frames.map(_._4).distinct.length > 1)
  }

  test("GIF frame profile: distributed demux matches the formula; payload never shuffles") {
    val gif = Multimodal.gifMediaTable(
      Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 30))
    val prof = Multimodal.gifFrameProfile(gif)
    val rows = prof.collect()
    // 2 + id%3 frames per doc
    val wantRows = (0 until 30).map(id => 2 + id % 3).sum
    assert(rows.length == wantRows)
    rows.foreach { row =>
      val id = row.getLong(0); val f = row.getInt(1)
      val (w, h) = ((16 + id % 16).toInt, (12 + id % 8).toInt)
      assert(row.getInt(2) == w && row.getInt(3) == h)
      var want = 0L
      for (x <- 0 until w; y <- 0 until h)
        want += Multimodal.GifCodec.lum(id, f, x, y)
      assert(row.getLong(4) == want, s"id=$id frame=$f lum_sum")
    }
    val lineage = prof.rdd.toDebugString
    assert(!lineage.contains("Shuffled"), s"gif demux shuffles:\n$lineage")
  }
}
