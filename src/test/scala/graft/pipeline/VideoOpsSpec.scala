package graft.pipeline

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.multimodal.VideoOps

/** The real-codec video path: RIFF/AVI container parse plus BI_RGB-DIB and
  * MJPEG frame decode through the batched Spark pipeline. */
class VideoOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Closed-form luminance of pattern frame `f`, pixel `(x,y)` of clip `id`. */
  private def v(id: Long, x: Int, y: Int, f: Int): Long =
    (((id * 31 + x * 7 + y * 13 + f * 101) % 256) + 256) % 256

  private def sumLuma(id: Long, w: Int, h: Int, f: Int): Long =
    (for (x <- 0 until w; y <- 0 until h) yield v(id, x, y, f)).sum

  test("DIB AVI round-trip is pixel-exact: every frame matches the closed form") {
    val ids = 0L until 12L
    val df = ids.map { id =>
      (id, VideoOps.syntheticAvi(id, (8 + id % 9).toInt, (8 + id % 7).toInt,
        (2 + id % 4).toInt, 40000L, mjpeg = false))
    }.toDF("media_id", "media")
    val got = VideoOps.decodeVideoFrames(df).collect()
      .map(r => (r.media_id, r.frame_idx) -> r).toMap
    ids.foreach { id =>
      val (w, h, nf) = ((8 + id % 9).toInt, (8 + id % 7).toInt, (2 + id % 4).toInt)
      (0 until nf).foreach { f =>
        val r = got((id, f))
        assert(r.decoded && r.width === w && r.height === h)
        assert(r.n_frames === nf && r.us_per_frame === 40000L)
        assert(r.sum_luma === sumLuma(id, w, h, f), s"id=$id frame=$f")
      }
      assert(!got.contains((id, nf)), s"id=$id: phantom frame past n_frames")
    }
  }

  test("MJPEG frames extracted from the container decode identically to the raw JPEG bytes") {
    // The same parser, the lossy codec: container extraction is proven by
    // comparing against ImageIO applied directly to a standalone JPEG of
    // the identical pattern (same encoder, same bytes-in => same pixels).
    val id = 5L
    val (w, h, nf) = (16, 12, 3)
    val avi = VideoOps.syntheticAvi(id, w, h, nf, 40000L, mjpeg = true)
    val got = VideoOps.decodeVideoFrames(Seq((id, avi)).toDF("media_id", "media"))
      .collect().sortBy(_.frame_idx)
    assert(got.length === nf && got.forall(_.decoded))
    got.foreach { r =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val p = v(id, x, y, r.frame_idx).toInt
        img.setRGB(x, y, (p << 16) | (p << 8) | p)
      }
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      val direct = ImageIO.read(new ByteArrayInputStream(bos.toByteArray))
      var expect = 0L
      for (x <- 0 until w; y <- 0 until h) {
        val rgb = direct.getRGB(x, y)
        expect += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
      }
      assert(r.width === w && r.height === h)
      assert(r.sum_luma === expect, s"frame=${r.frame_idx}")
    }
  }

  test("everyK frame sampling decodes exactly frames 0, k, 2k, ...") {
    val id = 3L
    val avi = VideoOps.syntheticAvi(id, 10, 8, 7, 40000L, mjpeg = false)
    val got = VideoOps.decodeVideoFrames(
      Seq((id, avi)).toDF("media_id", "media"), everyK = 3)
      .collect().map(_.frame_idx).sorted
    assert(got.toSeq === Seq(0, 3, 6))
  }

  test("corrupt and truncated payloads are explicit rows, not failures") {
    val good = VideoOps.syntheticAvi(1L, 8, 8, 2, 40000L, mjpeg = false)
    val df = Seq(
      (1L, good),
      (2L, "definitely not a video".getBytes("UTF-8")),
      (3L, good.take(20)), // RIFF magic but truncated before any frame
      (4L, Array.empty[Byte])).toDF("media_id", "media")
    val out = VideoOps.decodeVideoFrames(df).collect()
      .groupBy(_.media_id).map { case (k, rs) => k -> rs.forall(_.decoded) }
    assert(out(1L) === true && out(2L) === false)
    assert(out(3L) === false && out(4L) === false)
  }

  test("the AVI bytes are a genuine RIFF/AVI container") {
    val bytes = VideoOps.syntheticAvi(7L, 8, 8, 2, 40000L, mjpeg = false)
    assert(new String(bytes.take(4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "AVI ")
  }

  test("decode is a batched narrow pipeline: no shuffle in the plan") {
    val df = (0L until 8L).map { id =>
      (id, VideoOps.syntheticAvi(id, 8, 8, 2, 40000L, mjpeg = false))
    }.toDF("media_id", "media")
    val plan = VideoOps.decodeVideoFrames(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
