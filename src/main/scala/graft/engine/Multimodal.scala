package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque binary payloads with typed metadata, processed per-partition in
  * batches.
  *
  * The actual media codecs are NOT available in this container, so the
  * decode step is a clearly-marked deterministic STUB (`fakeDecode`) — the
  * Spark-side contract is real and tested: schema, partition-batched
  * processing, frame sampling explosion, feature extraction shape, and
  * metadata propagation. Swapping `fakeDecode` for a real decoder changes
  * no plumbing.
  */
object Multimodal {

  final case class MediaMeta(
      width: Int, height: Int, channels: Int, sampleRate: Int, durationMs: Long)

  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeature(
      media_id: Long, kind: String, feature: Array[Float], n_bytes: Int)

  final case class Frame(
      media_id: Long, frame_idx: Int, payload: Array[Byte])

  private val Kinds = Vector("image", "audio", "video")

  /** Deterministic synthetic media table. */
  def generate(spark: SparkSession, n: Long, partitions: Int = 16): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val kind = Kinds((i % 3).toInt)
      val len = 256 + (graft.synth.Pages.mix(i) & 0x3ff).toInt
      val payload = new Array[Byte](len)
      var j = 0
      var h = graft.synth.Pages.mix(i * 7 + 1)
      while (j < len) {
        h = graft.synth.Pages.mix(h)
        payload(j) = (h & 0xff).toByte
        j += 1
      }
      val meta = kind match {
        case "image" => MediaMeta(64 + (i % 64).toInt, 64 + (i % 48).toInt, 3, 0, 0L)
        case "audio" => MediaMeta(0, 0, 1, 16000, 1000L + (i % 9000))
        case _ => MediaMeta(320, 240, 3, 0, 2000L + (i % 28000))
      }
      MediaRow(i, kind, payload, meta)
    }
  }

  /** STUB decode: where a real image/audio decoder would run. Produces a
    * deterministic per-channel byte-mean "pixel summary" so downstream
    * stages have stable values to verify against. */
  def fakeDecode(payload: Array[Byte], channels: Int): Array[Float] = {
    val ch = math.max(1, channels)
    val sums = new Array[Long](ch)
    val counts = new Array[Long](ch)
    var i = 0
    while (i < payload.length) {
      sums(i % ch) += payload(i) & 0xff
      counts(i % ch) += 1
      i += 1
    }
    Array.tabulate(ch)(c => if (counts(c) == 0) 0f else (sums(c).toDouble / counts(c)).toFloat)
  }

  /** Feature extraction over partition-sized batches (mapPartitions, the
    * Scala analogue of mapInPandas batches): decode stub + a fixed-width
    * hash-projected embedding. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val decoded = fakeDecode(m.payload, math.max(1, m.meta.channels))
        val feat = new Array[Float](dim)
        var i = 0
        while (i < m.payload.length) {
          feat(((m.payload(i) & 0xff) + i) % dim) += (m.payload(i) & 0xff) / 255f
          i += 1
        }
        // blend in the decoded channel means so the stub output depends on
        // the "decode" stage (keeps the dependency chain honest)
        decoded.indices.foreach(c => feat(c % dim) += decoded(c))
        MediaFeature(m.media_id, m.kind, feat, m.payload.length)
      }
    }
  }

  /** Frame sampling for video payloads: every `stride`-th 64-byte chunk
    * becomes a "frame" row (flatMap explosion — the generator shape). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.payload.grouped(64).zipWithIndex.collect {
        case (chunk, idx) if idx % stride == 0 => Frame(m.media_id, idx, chunk)
      }
    }
  }

  /** Metadata-only resize: payload passthrough (stub for a real resampler),
    * pure column ops on the struct. */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val scale = when(greatest(w, h) > maxSide,
      lit(maxSide).cast("double") / greatest(w, h).cast("double")).otherwise(lit(1.0))
    media
      .withColumn("meta", struct(
        (w * scale).cast("int").as("width"),
        (h * scale).cast("int").as("height"),
        col("meta.channels").as("channels"),
        col("meta.sampleRate").as("sampleRate"),
        col("meta.durationMs").as("durationMs")))
  }
}
