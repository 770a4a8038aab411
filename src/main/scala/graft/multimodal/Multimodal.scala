package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder brief): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs as partition-local batch transforms.
  *
  * The Spark-side contract — schema, partitioning, batch shape — is
  * real and tested; the codec itself is STUBBED with a deterministic
  * fake (media libs are not in this container). Swap
  * [[StubCodec.decodeImage]] for a real decoder without touching any
  * plumbing.
  *
  * Scale notes: media bytes never pass through a shuffle here — all
  * transforms are `mapPartitions`-shaped projections; metadata-only
  * plans prune the binary column at the parquet scan (explain shows
  * ReadSchema without `media`).
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media", BinaryType),
    StructField("meta", MediaMetaType)))

  /** Deterministic fake codec — stands in for libjpeg/ffmpeg etc.
    * Every output is a pure function of the payload bytes, so tests
    * and plan replays are stable.
    */
  object StubCodec {
    /** STUB: "decode" = byte histogram folded into a fixed-size float
      * feature vector (stands in for a real pixel decode + embed).
      */
    def decodeImage(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
      val v = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { v(i % dim) += (bytes(i) & 0xFF) / 255.0f; i += 1 }
      if (bytes.length > 0) { var j = 0; while (j < dim) { v(j) /= bytes.length; j += 1 } }
      v
    }

    /** STUB: frame sampling = split payload into `n` equal byte slices
      * (stands in for video frame extraction at timestamps).
      */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (bytes.isEmpty || n <= 0) return Seq.empty
      val step = math.max(1, bytes.length / n)
      (0 until math.min(n, bytes.length)).map { i =>
        bytes.slice(i * step, math.min(bytes.length, i * step + step))
      }
    }

    /** STUB: resize = proportional re-bucket of the byte histogram.
      * Empty payloads yield an all-zero output.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](math.max(1, (w.toLong * h / 64).toInt))
      if (bytes.isEmpty) return out
      var i = 0
      while (i < out.length) { out(i) = bytes(i % bytes.length); i += 1 }
      out
    }
  }

  /** Build a media table from the documents fixture: payload = utf-8
    * bytes of the text (deterministic stand-in for real image bytes),
    * metadata derived from doc fields. Shows the schema contract.
    */
  def syntheticMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("fake/raw").as("format"),
        (length(col("text")) % 1024).cast(IntegerType).as("width"),
        (col("n_chars") % 768).cast(IntegerType).as("height"),
        (col("n_chars") * 10).cast(LongType).as("duration_ms")).as("meta"))

  /** Feature extraction: partition-local batched decode → fixed-dim
    * float vector per row. Batch shape matches what a columnar
    * (Arrow-style) UDF would see: the iterator is consumed in chunks
    * so a real codec can amortize per-batch setup.
    *
    * Typed `Dataset.mapPartitions`, not `.rdd`: the transform stays a
    * SQL-plan node (MapPartitions between Serialize/Deserialize), so
    * upstream column pruning and downstream optimization still apply —
    * an RDD hop would sever the plan at an ExistingRDD scan.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16,
      batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch codec setup would go here (model load, etc.)
          batch.iterator.map { case (id, m) =>
            val bytes = Option(m).getOrElse(Array.emptyByteArray)
            (id, StubCodec.decodeImage(bytes, dim))
          }
        }
      }
      .toDF("media_id", "features")
  }

  /** Metadata-only projection — must prune the binary column at scan
    * (verified by MultimodalSpec via the physical plan's ReadSchema).
    */
  def metaProfile(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("meta.format").as("format"),
      (col("meta.width") * col("meta.height")).as("pixels"),
      col("meta.duration_ms"))

  /** Resize transform: partition-local binary→binary projection (no
    * shuffle); metadata is rewritten to the target dimensions. Swap
    * [[StubCodec.resize]] for a real scaler without touching the
    * plumbing.
    */
  def resizeMedia(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, m) =>
        (id, StubCodec.resize(Option(m).getOrElse(Array.emptyByteArray), w, h))
      })
      .toDF("media_id", "media")
      // metadata is plan-side: constant per the target dimensions, so it
      // never rides through the codec closure
      .withColumn("meta", struct(
        lit("fake/raw").as("format"), lit(w).as("width"),
        lit(h).as("height"), lit(0L).as("duration_ms")))
  }

  /** Frame sampling: one output row per sampled frame — the generator
    * (UDTF) shape of media decode. Partition-local fan-out; at scale
    * the row count multiplies by ≤ `n` with no shuffle.
    */
  def sampleFrameRows(media: DataFrame, n: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, m) =>
        val bytes = Option(m).getOrElse(Array.emptyByteArray)
        StubCodec.sampleFrames(bytes, n).zipWithIndex.map { case (f, i) =>
          (id, i, f)
        }
      }
      .toDF("media_id", "frame_idx", "frame")
  }
}
