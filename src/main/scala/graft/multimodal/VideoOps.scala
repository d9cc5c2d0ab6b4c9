package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** REAL video decode / frame-sample over binary media columns: a genuine
  * RIFF/AVI container parser with two real frame codecs — MJPEG (each frame
  * is a JPEG, decoded by the JDK's `javax.imageio`) and uncompressed
  * 24-bit DIB (`BI_RGB`, decoded by direct pixel arithmetic). MJPEG-AVI is
  * a real interchange format (motion-JPEG capture hardware, scientific
  * cameras), so with this the video modality joins image ([[ImageOps]])
  * and audio ([[AudioOps]]) as a real codec path; only non-JVM codecs
  * (H.264/VP9/AV1) remain behind [[MultimodalOps.decodeStub]]'s
  * shape-contract.
  *
  * Scale design mirrors the other media ops: one `mapPartitions` pass, no
  * per-row codec setup, and — video-specific — frames are decoded one at a
  * time while walking the container, so peak memory per task is one payload
  * plus ONE decoded frame, never `n_frames` of them. Frame sampling
  * (`everyK`) skips the JPEG/DIB decode entirely for unsampled frames; the
  * container walk only reads chunk headers. Corrupt or unsupported payloads
  * yield a single `decoded = false` row instead of failing the job.
  */
object VideoOps {

  /** One sampled, decoded frame. `n_frames` / `us_per_frame` come from the
    * AVI main header (proving the container parse); `width`/`height`/
    * `sum_luma` come from the decoded pixels (proving the frame codec).
    * `sum_luma` is integer-exact (BT.601, same formula as [[ImageOps]]),
    * so DIB-coded fixtures are oracle-able in closed form. */
  final case class VideoFrame(
      media_id: Long, decoded: Boolean, frame_idx: Int, n_frames: Int,
      us_per_frame: Long, width: Int, height: Int, sum_luma: Long)

  private def failRow(id: Long): VideoFrame =
    VideoFrame(id, decoded = false, -1, 0, 0L, 0, 0, 0L)

  /** Decode every `everyK`-th frame of each AVI payload (frame 0, k, 2k,
    * …). Output is one row per SAMPLED frame — the frame-sample stage of a
    * video pipeline, fused with decode so skipped frames cost only a chunk
    * header read. */
  def decodeVideoFrames(df: DataFrame, everyK: Int = 1,
      idCol: String = "media_id", mediaCol: String = "media"): Dataset[VideoFrame] = {
    require(everyK >= 1, s"decodeVideoFrames: everyK must be >= 1, got $everyK")
    val rows = df.select(col(idCol).cast("long"), col(mediaCol).cast("binary"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    rows.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        try {
          val frames = parseAvi(id, bytes, everyK)
          if (frames.isEmpty) Seq(failRow(id)) else frames
        } catch { case _: Exception => Seq(failRow(id)) }
      }
    }(Encoders.product[VideoFrame])
  }

  // ------------------------------------------------------------ container

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Walk the RIFF tree: header fields from `avih`/`strf`, then decode the
    * sampled `..db`/`..dc` chunks inside the `movi` list one at a time. */
  private def parseAvi(id: Long, b: Array[Byte], everyK: Int): Seq[VideoFrame] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return Seq.empty
    val end = math.min(b.length.toLong, 8L + u32(b, 4)).toInt

    var usPerFrame = 0L
    var nFrames = 0
    var mjpeg = false // else uncompressed BI_RGB DIB
    var dibW = 0
    var dibH = 0
    val out = Seq.newBuilder[VideoFrame]
    var frameIdx = 0

    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var o = from
      while (o + 8 <= to) {
        val cid = fourcc(b, o)
        val sz = u32(b, o + 4).toInt
        val body = o + 8
        if (sz < 0 || body + sz > to) return // truncated: keep parsed frames
        if (cid == "LIST" && sz >= 4) {
          val ltype = fourcc(b, body)
          walk(body + 4, body + sz, inMovi || ltype == "movi")
        } else if (cid == "avih" && sz >= 40) {
          usPerFrame = u32(b, body)
          nFrames = u32(b, body + 16).toInt
        } else if (cid == "strf" && sz >= 40) {
          // BITMAPINFOHEADER: frame geometry for raw streams, and
          // biCompression: 0 = BI_RGB (raw DIB), 'MJPG' = motion JPEG.
          dibW = u32(b, body + 4).toInt
          dibH = u32(b, body + 8).toInt
          mjpeg = fourcc(b, body + 16) == "MJPG"
        } else if (inMovi && cid.length == 4 &&
            (cid.endsWith("db") || cid.endsWith("dc"))) {
          if (frameIdx % everyK == 0) {
            decodeFrame(id, b, body, sz, frameIdx, nFrames, usPerFrame,
              mjpeg, dibW, dibH).foreach(out += _)
          }
          frameIdx += 1
        }
        o = body + sz + (sz & 1) // chunks are word-aligned
      }
    }
    walk(12, end, inMovi = false)
    out.result()
  }

  // --------------------------------------------------------- frame codecs

  private def decodeFrame(id: Long, b: Array[Byte], off: Int, len: Int,
      idx: Int, nFrames: Int, usPerFrame: Long, mjpeg: Boolean,
      dibW: Int, dibH: Int): Option[VideoFrame] = {
    if (mjpeg) {
      val img = ImageIO.read(new ByteArrayInputStream(b, off, len))
      if (img == null) return None
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { sum += ImageOps.luma(img.getRGB(x, y)); x += 1 }
        y += 1
      }
      Some(VideoFrame(id, decoded = true, idx, nFrames, usPerFrame,
        img.getWidth, img.getHeight, sum))
    } else {
      // Raw 24-bit bottom-up BI_RGB rows (geometry from `strf`, as per the
      // AVI spec), each row padded to a 4-byte boundary.
      if (dibW <= 0 || dibH <= 0) return None
      val stride = ((dibW * 3 + 3) / 4) * 4
      if (stride.toLong * dibH > len) return None
      var sum = 0L
      var y = 0
      while (y < dibH) {
        val row = off + (dibH - 1 - y) * stride // bottom-up
        var x = 0
        while (x < dibW) {
          val bB = b(row + x * 3) & 0xff
          val g = b(row + x * 3 + 1) & 0xff
          val r = b(row + x * 3 + 2) & 0xff
          sum += (299 * r + 587 * g + 114 * bB) / 1000
          x += 1
        }
        y += 1
      }
      Some(VideoFrame(id, decoded = true, idx, nFrames, usPerFrame,
        dibW, dibH, sum))
    }
  }

  // ------------------------------------------------------------- fixtures

  private def le32(bos: ByteArrayOutputStream, v: Long): Unit = {
    bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
    bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
  }
  private def cc(bos: ByteArrayOutputStream, s: String): Unit =
    bos.write(s.getBytes("US-ASCII"))
  private def chunk(bos: ByteArrayOutputStream, id: String, body: Array[Byte]): Unit = {
    cc(bos, id); le32(bos, body.length.toLong); bos.write(body)
    if ((body.length & 1) == 1) bos.write(0)
  }
  private def list(bos: ByteArrayOutputStream, ltype: String, body: Array[Byte]): Unit = {
    cc(bos, "LIST"); le32(bos, body.length + 4L); cc(bos, ltype); bos.write(body)
  }

  /** Deterministic grayscale test pattern, frame `f` pixel `(x,y)` having
    * luminance `(id*31 + x*7 + y*13 + f*101) mod 256`, REALLY packed into
    * a standards-shaped RIFF/AVI container (`avih` + `strl` + `movi`).
    * `mjpeg = false` writes BI_RGB DIB frames — integer-exact, so the
    * decode query's oracle derives `sum_luma` from the same closed form.
    * `mjpeg = true` writes real JPEG frames via `ImageIO` (lossy, so
    * suite-verified against direct ImageIO decode rather than SQL). */
  def syntheticAvi(id: Long, w: Int, h: Int, nFrames: Int,
      usPerFrame: Long, mjpeg: Boolean): Array[Byte] = {
    val frames = (0 until nFrames).map { f =>
      if (mjpeg) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = (((id * 31 + x * 7 + y * 13 + f * 101) % 256) + 256).toInt % 256
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val fb = new ByteArrayOutputStream()
        ImageIO.write(img, "jpg", fb)
        fb.toByteArray
      } else {
        val stride = ((w * 3 + 3) / 4) * 4
        val fb = new ByteArrayOutputStream(stride * h)
        var y = h - 1 // bottom-up
        while (y >= 0) {
          var i = 0
          var x = 0
          while (x < w) {
            val v = (((id * 31 + x * 7 + y * 13 + f * 101) % 256) + 256).toInt % 256
            fb.write(v); fb.write(v); fb.write(v) // B G R
            i += 3; x += 1
          }
          while (i < stride) { fb.write(0); i += 1 }
          y -= 1
        }
        fb.toByteArray
      }
    }

    val avih = new ByteArrayOutputStream()
    le32(avih, usPerFrame); le32(avih, 0L); le32(avih, 0L); le32(avih, 0L)
    le32(avih, nFrames.toLong); le32(avih, 0L); le32(avih, 1L); le32(avih, 0L)
    le32(avih, w.toLong); le32(avih, h.toLong)
    (0 until 4).foreach(_ => le32(avih, 0L))

    val strh = new ByteArrayOutputStream()
    cc(strh, "vids"); cc(strh, if (mjpeg) "MJPG" else "DIB ")
    le32(strh, 0L); le32(strh, 0L); le32(strh, 0L)
    le32(strh, 1L); le32(strh, 1000000L / math.max(usPerFrame, 1L)) // scale/rate
    le32(strh, 0L); le32(strh, nFrames.toLong); le32(strh, 0L)
    le32(strh, 0xffffffffL); le32(strh, 0L)
    le32(strh, 0L); le32(strh, (h.toLong << 16) | w.toLong) // rcFrame

    val strf = new ByteArrayOutputStream()
    le32(strf, 40L); le32(strf, w.toLong); le32(strf, h.toLong)
    strf.write(1); strf.write(0); strf.write(24); strf.write(0)
    if (mjpeg) cc(strf, "MJPG") else le32(strf, 0L)
    le32(strf, 0L); le32(strf, 0L); le32(strf, 0L); le32(strf, 0L); le32(strf, 0L)

    val strl = new ByteArrayOutputStream()
    chunk(strl, "strh", strh.toByteArray)
    chunk(strl, "strf", strf.toByteArray)

    val hdrl = new ByteArrayOutputStream()
    chunk(hdrl, "avih", avih.toByteArray)
    list(hdrl, "strl", strl.toByteArray)

    val movi = new ByteArrayOutputStream()
    frames.foreach(fr => chunk(movi, if (mjpeg) "00dc" else "00db", fr))

    val riffBody = new ByteArrayOutputStream()
    list(riffBody, "hdrl", hdrl.toByteArray)
    list(riffBody, "movi", movi.toByteArray)

    val out = new ByteArrayOutputStream()
    cc(out, "RIFF"); le32(out, riffBody.size + 4L); cc(out, "AVI ")
    riffBody.writeTo(out)
    out.toByteArray
  }
}
