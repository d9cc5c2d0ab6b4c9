package graft.pipeline

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.multimodal.ImageOps

/** The real-codec image path: JDK `ImageIO` PNG encode→decode through the
  * batched Spark pipeline, with integer-exact expectations. */
class ImageOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def mediaDf(ids: Seq[Long]) =
    ids.map(id => (id, ImageOps.syntheticPng(id, (8 + id % 9).toInt, (8 + id % 7).toInt)))
      .toDF("media_id", "media")

  test("PNG round-trip is pixel-exact: decoded sums match the closed form") {
    val ids = 0L until 20L
    val got = ImageOps.decodeImages(mediaDf(ids))
      .collect().map(f => f.media_id -> f).toMap
    ids.foreach { id =>
      val (w, h) = ((8 + id % 9).toInt, (8 + id % 7).toInt)
      val expect = (for { x <- 0 until w; y <- 0 until h }
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      val f = got(id)
      assert(f.decoded && f.width === w && f.height === h)
      assert(f.sum_luma === expect, s"id=$id")
    }
  }

  test("undecodable payloads are explicit rows, not failures") {
    val df = Seq(
      (1L, ImageOps.syntheticPng(1, 10, 10)),
      (2L, "definitely not a png".getBytes("UTF-8"))).toDF("media_id", "media")
    val out = ImageOps.decodeImages(df).collect().map(f => f.media_id -> f.decoded).toMap
    assert(out(1L) && !out(2L))
  }

  test("aHash: identical images collide; a perturbed copy stays within a few bits") {
    def hash(bytes: Array[Byte]) =
      ImageOps.aHash(ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    val a = hash(ImageOps.syntheticPng(5, 16, 14))
    val b = hash(ImageOps.syntheticPng(5, 16, 14))
    assert(a === b)
    // same pattern, one-pixel-shifted sampling: visually near-identical
    val img = ImageIO.read(new java.io.ByteArrayInputStream(ImageOps.syntheticPng(5, 16, 14)))
    img.setRGB(0, 0, 0xffffff) // flip one pixel
    val c = ImageOps.aHash(img)
    assert(java.lang.Long.bitCount(a ^ c) <= 4,
      s"one-pixel edit moved ${java.lang.Long.bitCount(a ^ c)} bits")
    // a different pattern id is far away
    val d = hash(ImageOps.syntheticPng(99, 16, 14))
    assert(java.lang.Long.bitCount(a ^ d) > 4)
  }

  test("thumbnails re-encode to decodable PNGs of the requested size") {
    val out = ImageOps.thumbnails(mediaDf(0L until 5L), size = 4).collect()
    assert(out.length === 5)
    out.foreach { t =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(t.thumb))
      assert(img !== null)
      assert(img.getWidth === 4 && img.getHeight === 4)
    }
  }

  test("decode is a batched narrow pipeline: no shuffle in the plan") {
    val plan = ImageOps.decodeImages(mediaDf(0L until 8L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
