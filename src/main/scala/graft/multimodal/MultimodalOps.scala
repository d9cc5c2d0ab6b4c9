package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling: media as opaque binary
  * columns with typed metadata, plus the Spark-side plumbing of a decode /
  * feature-extraction stage.
  *
  * ALL THREE modalities have real codec paths: IMAGE via [[ImageOps]]
  * (JDK `javax.imageio`), AUDIO via [[AudioOps]] (JDK
  * `javax.sound.sampled`, WAV/PCM), VIDEO via [[VideoOps]] (RIFF/AVI
  * container parse + MJPEG/BI_RGB frame codecs). All run through this
  * same batched pipeline shape. The stub below remains only as the
  * shape-contract for codecs the JVM does not ship (H.264/VP9/AV1 video,
  * MP3/AAC audio): a deterministic fake that consumes real bytes and
  * produces a real feature row, keeping the Spark-level contract — binary
  * schema, one iterator pass per partition, frame-offset arithmetic,
  * narrow output — tested. Swapping it for a JNI/FFmpeg call changes one
  * function body, not the pipeline.
  */
object MultimodalOps {

  /** A decoded-media feature row (what a real extractor would emit). */
  final case class MediaFeature(
      media_id: Long, n_bytes: Int, head_hash: Long, n_frames: Int)

  /** View any (id, utf8-payload) frame as a media table: binary payload +
    * metadata struct. In production the binary column comes straight from
    * the source (parquet BYTE_ARRAY / blob store); the semantics here are
    * identical. */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("media"),
      struct(
        length(col(payloadCol).cast("binary")).as("n_bytes"),
        lit("application/octet-stream").as("content_type")).as("meta"))

  /** Frame count for fixed-size frame sampling with stride (pure column
    * arithmetic — pushable, codegen'd). */
  def frameCount(nBytes: org.apache.spark.sql.Column, frameSize: Int,
      stride: Int): org.apache.spark.sql.Column =
    when(nBytes >= frameSize,
      ((nBytes - frameSize) / stride).cast("int") + 1).otherwise(lit(0))

  /** Slice the binary payload into sampled frames (binary substrings). */
  def sampleFrames(media: org.apache.spark.sql.Column, frameSize: Int,
      stride: Int): org.apache.spark.sql.Column =
    when(length(media) >= frameSize,
      transform(
        sequence(lit(0), ((length(media) - frameSize) / stride).cast("int")),
        i => media.substr(i * stride + 1, lit(frameSize))))
      .otherwise(array())

  /** STUB decode + feature extraction, batched over partitions.
    *
    * Deterministic fake standing in for the real codec: reads the payload
    * bytes, "decodes" them into (byte length, 64-bit hash of the first 64
    * bytes, frame count). The mapPartitions shape is the real contract: a
    * single iterator pass per partition, so a real decoder can amortize
    * native context setup across the batch.
    */
  def decodeStub(df: DataFrame, frameSize: Int = 64,
      stride: Int = 48): Dataset[MediaFeature] = {
    val rows = df.select(col("media_id"), col("media"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    rows.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val head = bytes.take(64)
        // ??? real decoder goes here; deterministic stand-in below
        var h = 1125899906842597L
        var i = 0
        while (i < head.length) { h = 31 * h + head(i); i += 1 }
        val frames =
          if (bytes.length >= frameSize) (bytes.length - frameSize) / stride + 1
          else 0
        MediaFeature(id, bytes.length, h, frames)
      }
    }(Encoders.product[MediaFeature])
  }
}
