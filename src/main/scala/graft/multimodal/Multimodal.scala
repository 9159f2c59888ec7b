package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A decoded media batch row: typed metadata beside the opaque payload. */
case class MediaRecord(
    media_id: Long,
    media_type: String, // "image" | "audio" | "video"
    content: Array[Byte],
    meta: Map[String, String])

case class MediaFeatures(
    media_id: Long,
    media_type: String,
    width: Int,
    height: Int,
    n_frames: Int,
    features: Array[Float])

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches via
  * `mapPartitions` (the Scala analog of `mapInPandas` — one iterator per
  * partition, records streamed, never materialized whole).
  *
  * The actual decoders are STUBS (no image/audio libraries in this
  * container): [[FakeCodec]] derives deterministic dimensions/features from
  * the bytes, so schema, batch shape, partitioning, and the executor-side
  * batching logic are all real and tested, and swapping in a real decoder is
  * a one-function change.
  */
object Multimodal {

  /** STUB decoder — deterministic fake standing in for e.g. a JPEG decode.
    * Real implementation would go through javax.imageio / ffmpeg here.
    */
  object FakeCodec {
    /** Fake frame sizes — shared by [[FakeCodec.frameCount]] and the Column
      * form in [[Multimodal.sampleFrames]]; a real decoder replaces both.
      */
    val VideoBytesPerFrame = 4096
    val AudioBytesPerFrame = 1024

    def decodeDims(content: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(content)
      (64 + math.floorMod(h, 512), 64 + math.floorMod(h >> 9, 512))
    }

    /** Fake feature extractor: 16 deterministic floats from byte statistics
      * (a stand-in for a CNN embedding). Streams over the payload once.
      */
    def features(content: Array[Byte], dim: Int = 16): Array[Float] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < content.length) {
        acc(i % dim) += (content(i) & 0xff)
        i += 1
      }
      val n = math.max(content.length / dim, 1)
      acc.map(a => a.toFloat / (255f * n))
    }

    def frameCount(mediaType: String, content: Array[Byte]): Int = mediaType match {
      case "video" => 1 + content.length / VideoBytesPerFrame
      case "audio" => 1 + content.length / AudioBytesPerFrame
      case _       => 1
    }
  }

  /** Decode + feature-extract over partition batches. The work runs where the
    * data lives; output carries only fixed-width features + metadata, so a
    * downstream shuffle moves O(16 floats) per record, not the payload.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h) = FakeCodec.decodeDims(m.content)
        MediaFeatures(m.media_id, m.media_type, w, h,
          FakeCodec.frameCount(m.media_type, m.content),
          FakeCodec.features(m.content))
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th fake frame index,
    * capped at `maxFrames` — the batch-shape contract of a real
    * frame-sampler (one output row per sampled frame).
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int, maxFrames: Int): DataFrame = {
    val mm = media.toDF()
    mm.filter(col("media_type") === "video")
      .withColumn("n_frames",
        (lit(1) + floor(length(col("content")) / FakeCodec.VideoBytesPerFrame)).cast("int"))
      .withColumn("frame_idx",
        explode(slice(sequence(lit(0), col("n_frames") - 1, lit(stride)), 1, maxFrames)))
      .select("media_id", "frame_idx", "n_frames")
  }

  /** Synthesize a media table from the documents corpus (payload = utf-8
    * bytes) — the test fixture: real binary column, fake media.
    */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("content"),
        map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))
      .as[MediaRecord]
  }
}
