package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRow, MediaFeatures}

/** The multimodal mapPartitions plumbing: REAL header decode for the
  * uncompressed containers (BMP/WAV), stub fallback for codec formats. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decodeBmp parses real BMP bytes: dimensions round-trip the writer") {
    for ((w, h) <- Seq((1, 1), (640, 480), (1920, 1080), (3, 7))) {
      val bytes = Multimodal.makeBmp(w, h)
      assert(Multimodal.decodeBmp(bytes) === Some((w, h)), s"${w}x$h")
      // dispatch picks the REAL parse for BMP, not the stub
      assert(Multimodal.decodeImage(bytes) === ((w, h)))
    }
    // top-down BMP (negative height) decodes to the same pixel dimensions
    val td = Multimodal.makeBmp(320, 200)
    val buf = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -200)
    assert(Multimodal.decodeBmp(td) === Some((320, 200)))
    // non-BMP bytes are None, never a garbage parse
    assert(Multimodal.decodeBmp("not an image".getBytes("UTF-8")) === None)
    assert(Multimodal.decodeBmp(Array[Byte]('B', 'M')) === None)
  }

  test("decodeWav parses real RIFF/WAVE bytes: rate, channels, duration") {
    val wav = Multimodal.makeWav(44100, 2, 16, nFrames = 22050)
    val info = Multimodal.decodeWav(wav).get
    assert(info.sampleRate === 44100)
    assert(info.channels === 2)
    assert(info.bitsPerSample === 16)
    assert(info.nFrames === 22050L)
    assert(info.durationMs === 500L)
    // mono 8-bit at 8 kHz, 2 s
    val lo = Multimodal.decodeWav(Multimodal.makeWav(8000, 1, 8, 16000)).get
    assert(lo.durationMs === 2000L && lo.channels === 1)
    // a TRUNCATED data chunk reports the frames actually present and a
    // corrupt chunk size terminates instead of looping
    val cut = wav.take(wav.length - 44100) // drop half the sample bytes
    val cutInfo = Multimodal.decodeWav(cut).get
    assert(cutInfo.nFrames === (22050L * 4 - 44100) / 4)
    val corrupt = wav.clone()
    java.nio.ByteBuffer.wrap(corrupt).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, -1) // data size = 0xFFFFFFFF
    assert(Multimodal.decodeWav(corrupt).map(_.sampleRate) === Some(44100))
    // non-WAV bytes are None
    assert(Multimodal.decodeWav("RIFFxxxxJUNK".getBytes("US-ASCII") ++
      new Array[Byte](40)) === None)
  }

  test("checksum is deterministic, order-sensitive, in [0, P)") {
    val a = "abc".getBytes("UTF-8"); val b = "acb".getBytes("UTF-8")
    assert(Multimodal.checksum(a) === Multimodal.checksum("abc".getBytes("UTF-8")))
    assert(Multimodal.checksum(a) !== Multimodal.checksum(b))
    assert(Multimodal.checksum(a) === 96354L) // matches the SQL poly hash
  }

  test("thumbDims preserves aspect and caps the long side") {
    assert(Multimodal.thumbDims(100, 50) === ((100, 50)))          // under cap: untouched
    assert(Multimodal.thumbDims(256, 128) === ((128, 64)))         // landscape
    assert(Multimodal.thumbDims(128, 512) === ((32, 128)))         // portrait
    val (w, h) = Multimodal.thumbDims(1921, 3)
    assert(w === 128 && h >= 1)                                    // rounding floor is 1
  }

  test("resizeBmp really moves pixels: gradient round-trips through the downsample") {
    // paint a deterministic gradient into a 256x64 bottom-up BMP
    val (w, h) = (256, 64)
    val src = Multimodal.makeBmp(w, h)
    val srcRow = (w * 3 + 3) / 4 * 4
    def paint(img: Array[Byte], topDown: Boolean): Unit =
      for (ly <- 0 until h; x <- 0 until w) { // ly = logical row from top
        val storageY = if (topDown) ly else h - 1 - ly
        val o = 54 + storageY * srcRow + x * 3
        img(o) = (x % 251).toByte; img(o + 1) = (ly % 241).toByte
        img(o + 2) = ((x + ly) % 239).toByte
      }
    paint(src, topDown = false)
    val out = Multimodal.resizeBmp(src, maxSide = 128).get
    assert(Multimodal.decodeBmp(out) === Some(Multimodal.thumbDims(w, h, 128)))
    val (tw, th) = Multimodal.thumbDims(w, h, 128)
    val dstRow = (tw * 3 + 3) / 4 * 4
    // every output pixel equals its nearest-neighbor source pixel
    for (y <- 0 until th; x <- 0 until tw) {
      val lyTop = th - 1 - y
      val sx = (x.toLong * w / tw).toInt
      val sly = (lyTop.toLong * h / th).toInt
      val o = 54 + y * dstRow + x * 3
      assert(out(o) === (sx % 251).toByte && out(o + 1) === (sly % 241).toByte &&
        out(o + 2) === ((sx + sly) % 239).toByte, s"pixel ($x,$y)")
    }
    // a TOP-DOWN source with the same logical pixels resizes to identical bytes
    val td = Multimodal.makeBmp(w, h)
    java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(22, -h)
    paint(td, topDown = true)
    assert(java.util.Arrays.equals(Multimodal.resizeBmp(td, 128).get, out),
      "row order must not change the resized image")
    // under-cap images pass through with identical pixels; junk is None
    val small = Multimodal.makeBmp(100, 50)
    assert(Multimodal.decodeBmp(Multimodal.resizeBmp(small, 128).get) === Some((100, 50)))
    assert(Multimodal.resizeBmp("not an image".getBytes("UTF-8"), 128) === None)
    // truncated pixel data must be rejected, not read out of bounds
    assert(Multimodal.resizeBmp(src.take(1000), 128) === None)
    // hostile header: a width near 2^31 must fail the Long-math bounds
    // check, not overflow the row stride into a negative that reads wild
    val hostile = Multimodal.makeBmp(4, 4)
    java.nio.ByteBuffer.wrap(hostile).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 0x7FFFFFF0)
    assert(Multimodal.resizeBmp(hostile, 128) === None)
    // width AND height hostile: stride × height overflows even a Long
    // product — the division-form bound must still reject, not crash
    val hostile2 = Multimodal.makeBmp(4, 4)
    java.nio.ByteBuffer.wrap(hostile2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 0x7FFFFFF0).putInt(22, 0x7FFFFFF0)
    assert(Multimodal.resizeBmp(hostile2, 128) === None)
  }

  test("frameOffsets samples evenly, in range, first frame included") {
    assert(Multimodal.frameOffsets(10, 4) === Seq(0, 2, 5, 7))
    assert(Multimodal.frameOffsets(3, 8) === Seq(0, 1, 2))         // k >= n: all frames
    val off = Multimodal.frameOffsets(1000, 7)
    assert(off.head === 0 && off.forall(i => i >= 0 && i < 1000) && off.distinct === off)
  }

  test("extractFeatures runs partition-batched and keeps one row per media object") {
    import spark.implicits._
    val media = (1L to 20L)
      .map(i => MediaRow(i, if (i % 2 == 0) "image/png" else "audio/ogg",
        s"payload-$i".getBytes("UTF-8")))
      .toDS().repartition(3)
    val feats: Seq[MediaFeatures] = Multimodal.extractFeatures(media).collect().toSeq
    assert(feats.length === 20)
    assert(feats.map(_.doc_id).sorted === (1L to 20L))
    feats.foreach { f =>
      assert(f.n_bytes === s"payload-${f.doc_id}".length.toLong)
      assert(f.checksum === Multimodal.checksum(s"payload-${f.doc_id}".getBytes("UTF-8")))
      assert(f.width >= 64 && f.height >= 48)
      assert(f.thumb_w <= 128 && f.thumb_h <= 128)
      // decode stub is deterministic: same payload, same dims
      val (w, h) = Multimodal.decodeImageStub(s"payload-${f.doc_id}".getBytes("UTF-8"))
      assert((f.width, f.height) === ((w, h)))
    }
  }

  test("extractFeatures really decodes BMP payloads in the distributed path") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "image/bmp", Multimodal.makeBmp(640, 480)),
      MediaRow(2L, "image/bmp", Multimodal.makeBmp(1920, 1080)),
      MediaRow(3L, "image/png", "not-a-bmp".getBytes("UTF-8"))).toDS().repartition(2)
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.doc_id -> f).toMap
    assert((feats(1L).width, feats(1L).height) === ((640, 480)))
    assert((feats(2L).width, feats(2L).height) === ((1920, 1080)))
    assert((feats(2L).thumb_w, feats(2L).thumb_h) === ((128, 72)))
    // the non-BMP row fell through to the labeled stub, not a crash
    val (sw, sh) = Multimodal.decodeImageStub("not-a-bmp".getBytes("UTF-8"))
    assert((feats(3L).width, feats(3L).height) === ((sw, sh)))
  }

  test("decodeImageDims parses REAL PNG/JPEG/GIF bytes via the JDK codecs") {
    for (fmt <- Seq("png", "jpg", "gif"); (w, h) <- Seq((1, 1), (640, 480), (33, 7))) {
      val bytes = Multimodal.makeImage(w, h, fmt)
      assert(Multimodal.decodeImageDims(bytes) === Some((w, h)), s"$fmt ${w}x$h")
      // dispatch picks the REAL codec parse, not the stub
      assert(Multimodal.decodeImage(bytes) === ((w, h)), s"$fmt dispatch")
    }
    // junk bytes are None, never a garbage parse — and the stub arm of
    // the dispatch is reached only for them
    assert(Multimodal.decodeImageDims("not an image".getBytes("UTF-8")) === None)
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")) ===
      Multimodal.decodeImageStub("not an image".getBytes("UTF-8")))
  }

  test("decodePng parses real encoder bytes without a codec, adversarial-safe") {
    for ((w, h) <- Seq((1, 1), (640, 480), (1920, 1080), (33, 7))) {
      val bytes = Multimodal.makeImage(w, h, "png")
      assert(Multimodal.decodePng(bytes) === Some((w, h)), s"${w}x$h")
      // the byte parser agrees with the JDK reader on identical bytes
      assert(Multimodal.decodePng(bytes) === Multimodal.decodeImageDims(bytes))
    }
    // signature without a valid IHDR: rejected, not garbage-parsed
    val sigOnly = Multimodal.makeImage(4, 4, "png").take(12) ++
      "XXXXXXXXXXXX".getBytes("US-ASCII")
    assert(Multimodal.decodePng(sigOnly) === None)
    assert(Multimodal.decodePng(Multimodal.makeImage(4, 4, "png").take(20)) === None)
    assert(Multimodal.decodePng("not an image".getBytes("UTF-8")) === None)
    // JPEG bytes are not claimed by the PNG parser
    assert(Multimodal.decodePng(Multimodal.makeImage(8, 8, "jpg")) === None)
  }

  test("decodeJpeg walks real SOF markers without a codec, adversarial-safe") {
    for ((w, h) <- Seq((1, 1), (640, 480), (1920, 1080), (33, 7))) {
      val bytes = Multimodal.makeImage(w, h, "jpg")
      assert(Multimodal.decodeJpeg(bytes) === Some((w, h)), s"${w}x$h")
      assert(Multimodal.decodeJpeg(bytes) === Multimodal.decodeImageDims(bytes))
    }
    // truncation mid-walk, SOI alone, desynced bytes: None, never garbage
    val jpg = Multimodal.makeImage(64, 64, "jpg")
    assert(Multimodal.decodeJpeg(jpg.take(4)) === None)
    assert(Multimodal.decodeJpeg(Array[Byte](0xff.toByte, 0xd8.toByte)) === None)
    assert(Multimodal.decodeJpeg("not an image".getBytes("UTF-8")) === None)
    // a segment whose declared length runs past the buffer terminates
    val trunc = jpg.take(24)
    assert(Multimodal.decodeJpeg(trunc) === None ||
      Multimodal.decodeJpeg(trunc) === Multimodal.decodeImageDims(trunc))
    // PNG bytes are not claimed by the JPEG parser
    assert(Multimodal.decodeJpeg(Multimodal.makeImage(8, 8, "png")) === None)
  }

  test("resizeImageIO really moves pixels: PNG gradient survives the downsample") {
    val (w, h) = (256, 64)
    val png = Multimodal.makeImage(w, h, "png")
    val out = Multimodal.resizeImageIO(png, maxSide = 128).get
    val (tw, th) = Multimodal.thumbDims(w, h, 128)
    assert(Multimodal.decodeImageDims(out) === Some((tw, th)))
    assert(out.length < png.length, "downsample must actually shrink the payload")
    // PNG out is lossless: every output pixel equals its nearest-neighbor
    // source pixel from makeImage's gradient
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    for (y <- 0 until th; x <- 0 until tw) {
      val sx = (x.toLong * w / tw).toInt; val sy = (y.toLong * h / th).toInt
      val expected = ((sx % 251) << 16) | ((sy % 241) << 8) | ((sx + sy) % 239)
      assert((img.getRGB(x, y) & 0xffffff) === expected, s"pixel ($x,$y)")
    }
    // JPEG decodes through the same path (pixels are codec-approximate,
    // dimensions are exact); junk is None
    val jpg = Multimodal.makeImage(300, 200, "jpg")
    val jout = Multimodal.resizeImageIO(jpg, 128).get
    assert(Multimodal.decodeImageDims(jout) === Some(Multimodal.thumbDims(300, 200, 128)))
    assert(Multimodal.resizeImageIO("junk".getBytes("UTF-8"), 128) === None)
  }

  test("resizeThumbs shrinks PNG/JPEG and respects the declared mime over byte sniff") {
    import spark.implicits._
    val bmpBytes = Multimodal.makeBmp(640, 480)
    val media = Seq(
      MediaRow(1L, "image/png", Multimodal.makeImage(640, 480, "png")),
      MediaRow(2L, "image/jpeg", Multimodal.makeImage(512, 256, "jpg")),
      // declared audio: payload sniffs as a valid BMP but the label wins —
      // the pass must not mutate a payload the caller says isn't an image
      MediaRow(3L, "audio/wav", bmpBytes)).toDS().repartition(2)
    val out = Multimodal.resizeThumbs(media).collect().map(r => r.doc_id -> r).toMap
    assert(Multimodal.decodeImageDims(out(1L).payload) === Some((128, 96)))
    assert(out(1L).mime === "image/png")
    assert(Multimodal.decodeImageDims(out(2L).payload) === Some((128, 64)))
    assert(out(2L).mime === "image/png", "re-encoded thumbnails are retagged PNG")
    assert(java.util.Arrays.equals(out(3L).payload, bmpBytes),
      "non-image mime passes through untouched even when bytes sniff as BMP")
  }

  test("resizeThumbs really shrinks BMP payloads in the distributed path") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "image/bmp", Multimodal.makeBmp(640, 480)),
      MediaRow(2L, "image/bmp", Multimodal.makeBmp(96, 64)),
      MediaRow(3L, "image/png", "not-a-bmp".getBytes("UTF-8"))).toDS().repartition(2)
    val out = Multimodal.resizeThumbs(media).collect().map(r => r.doc_id -> r).toMap
    assert(Multimodal.decodeBmp(out(1L).payload) === Some((128, 96)))
    assert(out(1L).payload.length < Multimodal.makeBmp(640, 480).length,
      "downsample must actually shrink the payload")
    assert(Multimodal.decodeBmp(out(2L).payload) === Some((96, 64))) // under cap
    assert(java.util.Arrays.equals(out(3L).payload, "not-a-bmp".getBytes("UTF-8")),
      "codec formats pass through untouched")
  }

  test("makePngHeader: 45 deterministic bytes both our parser and the JDK reader accept") {
    for ((w, h) <- Seq((1, 1), (300, 200), (65535, 1), (17, 4093))) {
      val bytes = Multimodal.makePngHeader(w, h)
      assert(bytes.length === 45, s"${w}x$h size")
      assert(Multimodal.decodePng(bytes) === Some((w, h)), s"${w}x$h")
      // the header-only file is genuine PNG structure: the JDK's codec
      // reader parses the same dimensions from it (header-only read)
      assert(Multimodal.decodeImageDims(bytes) === Some((w, h)), s"${w}x$h imageio")
      assert(Multimodal.decodeImage(bytes) === ((w, h)))
    }
    // CRC is real: a flipped IHDR byte breaks the stored checksum
    val crc = new java.util.zip.CRC32()
    val b = Multimodal.makePngHeader(8, 8)
    crc.update(b, 12, 17)
    assert(java.nio.ByteBuffer.wrap(b, 29, 4).getInt === crc.getValue.toInt)
  }

  test("makeJpegHeader: 15 deterministic bytes the SOF marker walk decodes") {
    for ((w, h) <- Seq((1, 1), (320, 240), (65535, 65535))) {
      val bytes = Multimodal.makeJpegHeader(w, h)
      assert(bytes.length === 15, s"${w}x$h size")
      assert(Multimodal.decodeJpeg(bytes) === Some((w, h)), s"${w}x$h")
      assert(Multimodal.decodeImage(bytes) === ((w, h)))
    }
    // no silent BMP/PNG claim of the JPEG header bytes
    assert(Multimodal.decodeBmp(Multimodal.makeJpegHeader(5, 5)) === None)
    assert(Multimodal.decodePng(Multimodal.makeJpegHeader(5, 5)) === None)
  }

  test("l_media_decode end-to-end: decoded columns equal the writer arithmetic") {
    // the REAL query over the sf0.001 corpus: payloads are constructed
    // and then re-parsed distributed; every decoded field must equal the
    // doc_id formula the oracle replays
    val rows = SparkEntry.queries("l_media_decode")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length > 0)
    def opt(r: org.apache.spark.sql.Row, c: String): Option[Long] =
      if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getLong(r.fieldIndex(c)))
    for (r <- rows) {
      val id = r.getLong(r.fieldIndex("doc_id"))
      val mime = r.getString(r.fieldIndex("mime"))
      val nb = r.getLong(r.fieldIndex("n_bytes"))
      (id % 4) match {
        case 0 =>
          assert(mime === "image/png" && nb === 45L)
          assert(opt(r, "width") === Some(id % 300 + 1) &&
            opt(r, "height") === Some(id % 200 + 1))
        case 1 =>
          val (w, hh) = (id % 40 + 1, id % 30 + 1)
          assert(mime === "image/bmp" && nb === 54L + (w * 3 + 3) / 4 * 4 * hh)
          assert(opt(r, "width") === Some(w) && opt(r, "height") === Some(hh))
        case 2 =>
          val (rate, ch, fr) = (8000 + (id % 5) * 1000, 1 + id % 2, id % 500 + 1)
          assert(mime === "audio/wav" && nb === 44L + fr * ch * 2)
          assert(opt(r, "sample_rate") === Some(rate) && opt(r, "channels") === Some(ch))
          assert(opt(r, "duration_ms") === Some(fr * 1000L / rate))
          assert(opt(r, "width") === None && opt(r, "height") === None)
        case _ =>
          assert(mime === "image/jpeg" && nb === 15L)
          assert(opt(r, "width") === Some(id % 320 + 1) &&
            opt(r, "height") === Some(id % 240 + 1))
      }
    }
  }
}
