package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** REAL image decode / feature-extract / resize over binary media columns,
  * using the JDK's bundled `javax.imageio` codecs (PNG/JPEG/BMP/GIF — pure
  * JVM, present on every executor; no native libraries). This replaces the
  * r2 decode stub for image payloads; [[MultimodalOps.decodeStub]] remains
  * the shape-contract for codecs the JVM does not ship (video/audio).
  *
  * Scale design: decode runs in `mapPartitions` — one iterator pass per
  * partition, no per-row session setup, output is a narrow typed row. An
  * undecodable payload yields a row with `decoded = false` rather than an
  * exception or a dropped row, so corrupt media at 100 TB is data, not a
  * job failure (count it, quarantine it, keep going).
  */
object ImageOps {

  /** Decoded-image features: dimensions, integer luminance sum (exact —
    * oracle-able in SQL), and a 64-bit average-hash fingerprint for
    * near-dup dedup over images. */
  final case class ImageFeature(
      media_id: Long, decoded: Boolean, width: Int, height: Int,
      sum_luma: Long, ahash: Long)

  /** Luminance of a packed sRGB pixel — ITU-R BT.601 integer form
    * (exact: (299 R + 587 G + 114 B) / 1000, all integer math). */
  @inline private[multimodal] def luma(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** Decode each binary payload with ImageIO and extract [[ImageFeature]].
    * Batched per partition; decode failures are explicit rows. */
  def decodeImages(df: DataFrame, idCol: String = "media_id",
      mediaCol: String = "media"): Dataset[ImageFeature] = {
    val rows = df.select(col(idCol).cast("long"), col(mediaCol).cast("binary"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    rows.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val img =
          try ImageIO.read(new ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null) ImageFeature(id, decoded = false, 0, 0, 0L, 0L)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += luma(img.getRGB(x, y)); x += 1 }
            y += 1
          }
          ImageFeature(id, decoded = true, w, h, sum, aHash(img))
        }
      }
    }(Encoders.product[ImageFeature])
  }

  /** 64-bit average hash: mean-pool to 8×8 (explicit integer block means —
    * deterministic on every JVM, unlike Graphics2D rendering), then one bit
    * per cell: above-global-mean. Hamming distance ≤ a few bits ⇒ visually
    * near-identical — the image analog of SimHash for dedup banding. */
  def aHash(img: BufferedImage): Long = {
    val cells = pool(img, 8, 8)
    val mean = cells.map(_.toLong).sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (cells(i) > mean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Mean-pool the image's luminance onto a gw×gh grid (integer, exact). */
  private def pool(img: BufferedImage, gw: Int, gh: Int): Array[Int] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](gw * gh)
    var gy = 0
    while (gy < gh) {
      val y0 = gy * h / gh; val y1 = math.max((gy + 1) * h / gh, y0 + 1)
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw; val x1 = math.max((gx + 1) * w / gw, x0 + 1)
        var sum = 0L; var n = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) { sum += luma(img.getRGB(x, y)); n += 1; x += 1 }
          y += 1
        }
        out(gy * gw + gx) = if (n == 0) 0 else (sum / n).toInt
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** Resize (mean-pool downscale) and re-encode as PNG — the thumbnail
    * stage of a media pipeline, emitted as a binary column again so it can
    * flow to any sink. */
  final case class Thumb(media_id: Long, thumb: Array[Byte])

  def thumbnails(df: DataFrame, size: Int, idCol: String = "media_id",
      mediaCol: String = "media"): Dataset[Thumb] = {
    val rows = df.select(col(idCol).cast("long"), col(mediaCol).cast("binary"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    rows.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val img =
          try ImageIO.read(new ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null) None
        else {
          val cells = pool(img, size, size)
          val small = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < cells.length) {
            val v = cells(i)
            small.setRGB(i % size, i / size, (v << 16) | (v << 8) | v)
            i += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(small, "png", bos)
          Some(Thumb(id, bos.toByteArray))
        }
      }
    }(Encoders.product[Thumb])
  }

  /** Deterministic cluster-pattern image whose aHash IS a known 64-bit
    * word: each 8×8 cell paints solid 210 (bit 1) or 40 (bit 0) per the
    * splitmix64 word of `clusterId`, with the first `variant` cells
    * flipped — cells sit ≥ ~80 luma away from any achievable global mean,
    * so the mean-threshold bits are exact by construction and
    * `hamming(aHash(c,i), aHash(c,j)) = |i-j|` while distinct clusters
    * differ in ~32 bits. The generator behind the image near-dup oracle:
    * the TRUE pair set is computable from ids alone. */
  def syntheticClusterPng(clusterId: Long, variant: Int): Array[Byte] = {
    var z = clusterId + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    val word = z ^ (z >>> 31)
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    var cell = 0
    while (cell < 64) {
      val bit = (((word >>> cell) & 1L) == 1L) ^ (cell < variant)
      val v = if (bit) 210 else 40
      val (cx, cy) = (cell % 8, cell / 8)
      var dy = 0
      while (dy < 4) {
        var dx = 0
        while (dx < 4) {
          img.setRGB(cx * 4 + dx, cy * 4 + dy, (v << 16) | (v << 8) | v)
          dx += 1
        }
        dy += 1
      }
      cell += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic grayscale test pattern (pixel (x,y) of image `id` has
    * luminance `(id*31 + x*7 + y*13) mod 256`), REALLY encoded to PNG
    * bytes. Gives the engine a corpus of genuine images whose decoded
    * features are integer-predictable — the corpus generator behind the
    * driver-verified decode query. */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (((id * 31 + x * 7 + y * 13) % 256) + 256).toInt % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
