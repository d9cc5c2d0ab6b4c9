package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.multimodal.AudioDedup

/** Banded energy-fingerprint audio near-dup: the fingerprint-equals-word
  * construction, planted-cluster exactness, and robustness edges. */
class AudioDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("the cluster fixture's fingerprint encodes the word: hamming == variant distance") {
    val fps = (0 until 4).map { v =>
      AudioDedup.fingerprint64(
        AudioDedup.pcmSamples(AudioDedup.syntheticClusterWav(11L, v)))
    }
    for (i <- 0 until 4; j <- i + 1 until 4)
      assert(java.lang.Long.bitCount(fps(i) ^ fps(j)) === j - i, s"variants $i,$j")
  }

  test("finds exactly the planted within-cluster pairs with exact hamming") {
    val n = 40L // 10 clusters of 4
    val media = (0L until n).map(id =>
      (id, AudioDedup.syntheticClusterWav(id / 4, (id % 4).toInt)))
      .toDF("media_id", "media")
    val got = AudioDedup.nearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val want = (for {
      c <- 0L until n / 4
      i <- 0 until 4
      j <- i + 1 until 4
    } yield (c * 4 + i, c * 4 + j) -> (j - i)).toMap
    assert(got === want)
  }

  test("corrupt payloads and too-short clips are excluded, never failures") {
    val media = Seq(
      (0L, AudioDedup.syntheticClusterWav(0L, 0)),
      (1L, AudioDedup.syntheticClusterWav(0L, 1)),
      (2L, "not audio at all".getBytes("UTF-8"))).toDF("media_id", "media")
    val pairs = AudioDedup.nearDupPairs(media).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((0L, 1L)))
    assert(AudioDedup.fingerprint64(Array(1, 2, 3)) === 0L, "short clip -> zero fp")
  }
}
