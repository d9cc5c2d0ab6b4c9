package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Near-duplicate AUDIO detection: WAV/PCM decode → 64-bit energy-delta
  * fingerprint → the shared [[Banded64]] engine. The fingerprint is the
  * classic robust-audio-hash shape (Haitsma–Kalker reduced to one band):
  * split the clip into 65 equal windows, bit i = "window i+1 is louder
  * than window i" — integer-exact on PCM (energy = Σ|sample| as a long),
  * invariant to playback gain direction changes smaller than a window, and
  * engine-reproducible. */
object AudioDedup {

  /** 64-bit energy-delta fingerprint of 16-bit PCM samples. Clips shorter
    * than 65 windows of 8 samples fingerprint to 0 (too short to pair
    * meaningfully — like empty-text docs in the text paths). */
  def fingerprint64(samples: Array[Int]): Long = {
    val w = samples.length / 65
    if (w < 8) return 0L
    val energy = new Array[Long](65)
    var i = 0
    while (i < 65) {
      var e = 0L
      var j = i * w
      val end = j + w
      while (j < end) { e += math.abs(samples(j)); j += 1 }
      energy(i) = e
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (energy(b + 1) > energy(b)) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Pairs of decodable clips whose fingerprints are within `maxHamming`
    * bits. Same batched decode shape as [[AudioOps.decodeAudio]]; corrupt
    * or non-PCM payloads drop out (never fail the job). */
  def nearDupPairs(df: DataFrame, maxHamming: Int = 3,
      idCol: String = "media_id", mediaCol: String = "media",
      maxBucket: Int = 10000, strictBuckets: Boolean = false): DataFrame = {
    val rows = df.select(col(idCol).cast("long"), col(mediaCol).cast("binary"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    val hashed = rows.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val s = AudioDedup.pcmSamples(bytes)
        if (s == null) None else Some((id, fingerprint64(s)))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .toDF("media_id", "fp")
    Banded64.pairs(hashed, maxHamming, maxBucket, strictBuckets)
  }

  /** Decode a WAV payload to 16-bit PCM samples; null when undecodable. */
  private[graft] def pcmSamples(bytes: Array[Byte]): Array[Int] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) null
        else {
          val data = ais.readAllBytes()
          val big = fmt.isBigEndian
          val n = data.length / 2
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            val lo = data(2 * i) & 0xff
            val hi = data(2 * i + 1) & 0xff
            out(i) = (if (big) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
            i += 1
          }
          out
        }
      } finally ais.close()
    } catch { case _: Exception => null }

  /** Deterministic fingerprint-cluster clip: 65 windows of 64 constant-
    * amplitude samples whose loudness walk encodes the splitmix64 word of
    * `clusterId` with the first `variant` bits flipped — so
    * `fingerprint64` IS the (variant-flipped) word, hamming between
    * variants equals their id distance, and the TRUE pair set is
    * computable from ids alone (the audio analog of
    * [[ImageOps.syntheticClusterPng]]). REALLY encoded to WAV bytes. */
  def syntheticClusterWav(clusterId: Long, variant: Int): Array[Byte] = {
    var z = clusterId + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    val word = z ^ (z >>> 31)
    val amps = new Array[Int](65)
    amps(0) = 300
    var b = 0
    while (b < 64) {
      val bit = (((word >>> b) & 1L) == 1L) ^ (b < variant)
      amps(b + 1) = amps(b) + (if (bit) 3 else -3)
      b += 1
    }
    val n = 65 * 64
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = amps(i / 64)
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }
}
