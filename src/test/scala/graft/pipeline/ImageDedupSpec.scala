package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.multimodal.{ImageDedup, ImageOps}

/** Banded aHash image near-dup: planted-cluster exactness, the
  * aHash-equals-pattern-word construction, and corrupt-media tolerance. */
class ImageDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("the cluster fixture's aHash is the pattern word: hamming == variant distance") {
    val imgs = (0 until 4).map(v =>
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        ImageOps.syntheticClusterPng(7L, v))))
    val hashes = imgs.map(ImageOps.aHash)
    for (i <- 0 until 4; j <- i + 1 until 4)
      assert(java.lang.Long.bitCount(hashes(i) ^ hashes(j)) === j - i,
        s"variants $i,$j")
  }

  test("finds exactly the planted within-cluster pairs with exact hamming") {
    val n = 48L // 12 clusters of 4
    val media = (0L until n).map(id =>
      (id, ImageOps.syntheticClusterPng(id / 4, (id % 4).toInt)))
      .toDF("media_id", "media")
    val got = ImageDedup.nearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val want = (for {
      c <- 0L until n / 4
      i <- 0 until 4
      j <- i + 1 until 4
    } yield (c * 4 + i, c * 4 + j) -> (j - i)).toMap
    assert(got === want)
  }

  test("corrupt images are excluded, never failures") {
    val media = Seq(
      (0L, ImageOps.syntheticClusterPng(0L, 0)),
      (1L, ImageOps.syntheticClusterPng(0L, 1)),
      (2L, "not an image".getBytes("UTF-8"))).toDF("media_id", "media")
    val pairs = ImageDedup.nearDupPairs(media).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((0L, 1L)))
  }

  test("identical images pair at hamming 0 through the exact-collapse path") {
    val bytes = ImageOps.syntheticClusterPng(3L, 0)
    val media = Seq((10L, bytes), (11L, bytes), (12L, bytes))
      .toDF("media_id", "media")
    val got = ImageDedup.nearDupPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((10L, 11L, 0), (10L, 12L, 0), (11L, 12L, 0)))
  }
}
