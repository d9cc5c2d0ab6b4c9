package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** REAL audio decode / feature-extract over binary media columns, using the
  * JDK's bundled `javax.sound.sampled` WAV/PCM codec (pure JVM, present on
  * every executor; no native libraries) — the audio analog of [[ImageOps]],
  * replacing the decode stub for audio payloads. Video remains the one
  * stubbed modality ([[MultimodalOps.decodeStub]]): the JVM ships no video
  * codec.
  *
  * Scale design mirrors [[ImageOps.decodeImages]]: decode runs in
  * `mapPartitions` — one iterator pass per partition, no per-row codec
  * setup, narrow typed output. An undecodable or unsupported payload yields
  * a `decoded = false` row rather than an exception, so corrupt media at
  * 100 TB is data to quarantine, not a job failure.
  */
object AudioOps {

  /** Decoded-audio features. Integer-exact on PCM integer samples, so the
    * whole set is oracle-able in SQL: header fields prove the container
    * parse, `n_samples`/`sum_sample`/`peak` prove the sample decode. */
  final case class AudioFeature(
      media_id: Long, decoded: Boolean, sample_rate: Int, channels: Int,
      n_samples: Long, sum_sample: Long, peak: Int)

  /** Decode each binary payload as a WAV (16-bit signed PCM — what the JDK
    * codec and every PCM export tool emit) and extract [[AudioFeature]].
    * Samples are summed across channels; `peak` is the max absolute sample.
    * Non-WAV bytes, compressed encodings, and non-16-bit depths all land on
    * `decoded = false` rows. */
  def decodeAudio(df: DataFrame, idCol: String = "media_id",
      mediaCol: String = "media"): Dataset[AudioFeature] = {
    val rows = df.select(col(idCol).cast("long"), col(mediaCol).cast("binary"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    rows.mapPartitions { it =>
      it.map { case (id, bytes) =>
        try {
          val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
                fmt.getSampleSizeInBits != 16)
              AudioFeature(id, decoded = false, 0, 0, 0L, 0L, 0)
            else {
              val data = ais.readAllBytes()
              val big = fmt.isBigEndian
              val n = data.length / 2
              var sum = 0L
              var peak = 0
              var i = 0
              while (i < n) {
                val lo = data(2 * i) & 0xff
                val hi = data(2 * i + 1) & 0xff
                val v = (if (big) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
                sum += v
                val a = math.abs(v)
                if (a > peak) peak = a
                i += 1
              }
              AudioFeature(id, decoded = true, fmt.getSampleRate.toInt,
                fmt.getChannels, n.toLong / fmt.getChannels, sum, peak)
            }
          } finally ais.close()
        } catch {
          case _: Exception => AudioFeature(id, decoded = false, 0, 0, 0L, 0L, 0)
        }
      }
    }(Encoders.product[AudioFeature])
  }

  /** Deterministic 16-bit mono PCM test signal (sample `i` of clip `id` is
    * `((id*31 + i*7) mod 65536) - 32768`), REALLY encoded to WAV bytes with
    * `AudioSystem.write`. A genuine RIFF/WAVE container round-trip stands
    * between this closed form and the decoded features, so a hash match on
    * the decode query certifies the codec path end-to-end — the audio
    * analog of [[ImageOps.syntheticPng]]. */
  def syntheticWav(id: Long, nSamples: Int, sampleRate: Float = 8000f): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (((id * 31 + i.toLong * 7) % 65536L) - 32768L).toInt
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }
}
