package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.multimodal.AudioOps

/** The real-codec audio path: JDK `javax.sound.sampled` WAV encode→decode
  * through the batched Spark pipeline, with integer-exact expectations. */
class AudioOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def mediaDf(ids: Seq[Long]) =
    ids.map(id => (id, AudioOps.syntheticWav(id, (400 + id % 257).toInt)))
      .toDF("media_id", "media")

  test("WAV round-trip is sample-exact: decoded features match the closed form") {
    val ids = 0L until 20L
    val got = AudioOps.decodeAudio(mediaDf(ids))
      .collect().map(f => f.media_id -> f).toMap
    ids.foreach { id =>
      val n = (400 + id % 257).toInt
      val samples = (0 until n).map(i => (((id * 31 + i.toLong * 7) % 65536L) - 32768L).toInt)
      val f = got(id)
      assert(f.decoded, s"id=$id failed to decode")
      assert(f.sample_rate === 8000 && f.channels === 1)
      assert(f.n_samples === n.toLong, s"id=$id")
      assert(f.sum_sample === samples.map(_.toLong).sum, s"id=$id")
      assert(f.peak === samples.map(math.abs).max, s"id=$id")
    }
  }

  test("the WAV bytes are a genuine RIFF/WAVE container") {
    val bytes = AudioOps.syntheticWav(7, 100)
    assert(new String(bytes.take(4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
  }

  test("undecodable payloads are explicit rows, not failures") {
    val df = Seq(
      (1L, AudioOps.syntheticWav(1, 50)),
      (2L, "definitely not audio".getBytes("UTF-8"))).toDF("media_id", "media")
    val out = AudioOps.decodeAudio(df).collect().map(f => f.media_id -> f.decoded).toMap
    assert(out(1L) && !out(2L))
  }

  test("decode is a batched narrow pipeline: no shuffle in the plan") {
    val plan = AudioOps.decodeAudio(mediaDf(0L until 8L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
