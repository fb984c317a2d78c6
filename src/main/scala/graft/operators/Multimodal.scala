package graft.operators

import org.apache.spark.sql.Dataset

/** Multimodal ingest plumbing (extension layer; north_star "multimodal
  * columns"). Media travels as an opaque `binary` payload + mime tag; the
  * decode / feature-extract / resize / frame-sample steps run via
  * `mapPartitions` so a real decoder handle is initialized ONCE per
  * partition and reused across its rows — the Spark-side shape that
  * matters at 100 TB (payload bytes never shuffle; features are extracted
  * next to the scan and only the small feature rows travel on).
  *
  * Decode is REAL for everything a stock JVM can parse: BMP and WAV by
  * direct byte parsing (DIB header / RIFF chunk walk — [[decodeBmp]],
  * [[decodeWav]], plus an actual nearest-neighbor pixel resize,
  * [[resizeBmp]]), and PNG / JPEG / GIF through JDK 17's built-in
  * `javax.imageio` readers (the `java.desktop` module ships those codecs
  * — zero external dependencies): header-only dimension reads for the
  * feature scan ([[decodeImageDims]]) and a full decode → downsample →
  * lossless re-encode for the thumbnail pass ([[resizeImageIO]]).
  * Only formats the JVM genuinely cannot decode (video, compressed
  * audio) fall back to a clearly deterministic fake behind the same
  * seam: linking a real codec there touches nothing else.
  */
object Multimodal {

  /** One media object: opaque payload + mime tag (cf. LlmOps l_multimodal,
    * which keeps the same shape fully relational for the oracle). */
  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

  /** Per-object extracted features — the only thing that leaves the scan. */
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                           checksum: Long, width: Int, height: Int,
                           thumb_w: Int, thumb_h: Int)

  /** Audio features from a WAV header — duration math, no sample decode. */
  case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                     nFrames: Long) {
    def durationMs: Long =
      if (sampleRate <= 0) 0L else nFrames * 1000L / sampleRate
  }

  /** Rolling content checksum (same polynomial family as LlmOps hashes). */
  def checksum(payload: Array[Byte]): Long =
    payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** REAL BMP decode: "BM" magic, then the DIB header at offset 14 —
    * BITMAPINFOHEADER-family (header size >= 40: int32 width at 18, int32
    * height at 22, negative height = top-down row order) or the ancient
    * BITMAPCOREHEADER (size 12: uint16 fields). Returns None for anything
    * that is not a well-formed BMP — the caller, not the parser, decides
    * what a non-decodable payload means. */
  def decodeBmp(payload: Array[Byte]): Option[(Int, Int)] = {
    if (payload.length < 26 || payload(0) != 'B' || payload(1) != 'M') return None
    val dibSize = i32le(payload, 14)
    if (dibSize == 12) { // BITMAPCOREHEADER: uint16 width/height
      val w = u16le(payload, 18); val h = u16le(payload, 20)
      if (w > 0 && h > 0) Some((w, h)) else None
    } else if (dibSize >= 40 && payload.length >= 26) {
      val w = i32le(payload, 18)
      val h = math.abs(i32le(payload, 22)) // negative = top-down, same pixels
      if (w > 0 && h > 0) Some((w, h)) else None
    } else None
  }

  /** REAL WAV decode: RIFF/WAVE container walk — "fmt " chunk carries
    * channels / sample rate / block align, "data" chunk's size over block
    * align is the frame count. Odd-sized chunks are padded to even per the
    * RIFF spec. No sample decoding — the header math IS the audio
    * metadata a training pipeline filters on (rate, channels, duration). */
  def decodeWav(payload: Array[Byte]): Option[WavInfo] = {
    def tag(o: Int) = new String(payload, o, 4, "US-ASCII")
    if (payload.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    // Long offset: a corrupt/huge chunk size must walk OFF the end and
    // terminate, never wrap an int into an infinite loop
    var off = 12L
    var rate = 0; var chans = 0; var bits = 0; var blockAlign = 0
    var dataBytes = -1L
    while (off + 8 <= payload.length) {
      val o = off.toInt
      val id = tag(o)
      val size = i32le(payload, o + 4).toLong & 0xffffffffL
      // the chunk's own declared size must cover the PCM fmt block (16
      // bytes): a short fmt chunk would otherwise read the next chunk's
      // header bytes as plausible-garbage channels/blockAlign
      if (id == "fmt " && size >= 16 && off + 24 <= payload.length) {
        chans = u16le(payload, o + 10)
        rate = i32le(payload, o + 12)
        blockAlign = u16le(payload, o + 20)
        bits = u16le(payload, o + 22)
      } else if (id == "data") {
        // size may exceed what's present (truncated file): trust the bytes
        dataBytes = math.min(size, payload.length - off - 8)
      }
      off += 8 + size + (size & 1) // RIFF chunks pad to even
    }
    if (rate > 0 && chans > 0 && blockAlign > 0 && dataBytes >= 0)
      Some(WavInfo(rate, chans, bits, dataBytes / blockAlign))
    else None
  }

  /** REAL PNG header decode by direct byte parsing — no codec, no
    * imageio: the 8-byte signature, then the MANDATORY first chunk must
    * be IHDR (PNG spec §5.6), whose first two fields are width/height as
    * big-endian uint32 at offsets 16/20. The length field of the IHDR
    * chunk must be 13 (spec-fixed), which rejects byte soup that merely
    * starts with the signature. */
  def decodePng(payload: Array[Byte]): Option[(Int, Int)] = {
    if (payload.length < 24) return None
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if ((payload(i) & 0xff) != sig(i)) return None; i += 1 }
    def i32be(o: Int): Int =
      ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
        ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)
    if (i32be(8) != 13) return None // IHDR data length is spec-fixed
    if (payload(12) != 'I' || payload(13) != 'H' ||
        payload(14) != 'D' || payload(15) != 'R') return None
    val w = i32be(16); val h = i32be(20)
    if (w > 0 && h > 0) Some((w, h)) else None
  }

  /** REAL JPEG header decode by direct byte parsing — a marker walk from
    * SOI to the first frame header (SOF0 baseline, SOF2 progressive, and
    * the rest of the SOFn family except the non-frame C4/C8/CC markers),
    * where height/width sit at payload offsets +5/+7 as big-endian
    * uint16. Standalone markers (RST, TEM) have no length field; every
    * other segment is skipped by its declared length; fill 0xFF bytes
    * before a marker are legal padding. Returns None on desync,
    * truncation, or SOS/EOI before any SOF — the caller decides what a
    * non-decodable payload means. */
  def decodeJpeg(payload: Array[Byte]): Option[(Int, Int)] = {
    if (payload.length < 4 ||
        (payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 1 < payload.length) {
      if ((payload(i) & 0xff) != 0xff) return None // marker desync
      // skip fill bytes: any run of FFs collapses to one marker prefix
      while (i + 1 < payload.length && (payload(i + 1) & 0xff) == 0xff) i += 1
      if (i + 1 >= payload.length) return None
      val m = payload(i + 1) & 0xff
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // TEM / RSTn: standalone
      else if (m == 0xd9 || m == 0xda) return None // EOI / SOS before any SOF
      else {
        if (i + 3 >= payload.length) return None
        val len = ((payload(i + 2) & 0xff) << 8) | (payload(i + 3) & 0xff)
        if (len < 2) return None
        val isSof = (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (i + 8 >= payload.length || len < 7) return None
          val h = ((payload(i + 5) & 0xff) << 8) | (payload(i + 6) & 0xff)
          val w = ((payload(i + 7) & 0xff) << 8) | (payload(i + 8) & 0xff)
          return if (w > 0 && h > 0) Some((w, h)) else None
        }
        i += 2 + len
      }
    }
    None
  }

  /** Deterministic FAKE for formats with no shipped codec (video frames,
    * compressed audio art, ...): dimensions derived from the content
    * checksum. Clearly labeled — real decode for these means linking a
    * codec at this exact seam. */
  def decodeImageStub(payload: Array[Byte]): (Int, Int) = {
    val cs = checksum(payload)
    (64 + (cs % 1024).toInt, 48 + ((cs / 1024) % 768).toInt)
  }

  /** REAL header-only dimension read for the codec formats the JDK ships
    * readers for (PNG / JPEG / GIF / BMP, `java.desktop`'s imageio SPIs).
    * `reader.getWidth/getHeight` parse only the header — no pixel decode,
    * no full-image allocation — which is the right cost model for a
    * dims-only feature scan over 100 TB of media: bytes are read once,
    * a few dozen header bytes are touched, and the payload never expands
    * to pixels. Returns None for bytes no installed reader claims. */
  def decodeImageDims(payload: Array[Byte]): Option[(Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    if (iis == null) return None
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val w = r.getWidth(0); val h = r.getHeight(0)
          if (w > 0 && h > 0) Some((w, h)) else None
        } catch { case _: java.io.IOException => None }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** Image decode dispatch: our own byte parsers first — BMP, PNG (IHDR),
    * JPEG (SOF marker walk) — each a few dozen header bytes with the
    * adversarial-input guards in-line; the JDK's imageio readers cover
    * whatever remains (GIF, exotic SPI formats); stub fallback only for
    * genuinely codec-less formats. MultimodalSpec cross-checks the byte
    * parsers against the imageio readers on real encoder output. */
  def decodeImage(payload: Array[Byte]): (Int, Int) =
    decodeBmp(payload)
      .orElse(decodePng(payload))
      .orElse(decodeJpeg(payload))
      .orElse(decodeImageDims(payload))
      .getOrElse(decodeImageStub(payload))

  /** Resize step's aspect-preserving target math (the pixel work would
    * live in the codec; this is the part the pipeline owns). */
  def thumbDims(w: Int, h: Int, maxSide: Int = 128): (Int, Int) = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    if (w <= maxSide && h <= maxSide) (w, h)
    else if (w >= h) (maxSide, math.max(1, math.round(h.toDouble * maxSide / w).toInt))
    else (math.max(1, math.round(w.toDouble * maxSide / h).toInt), maxSide)
  }

  /** REAL pixel resize for the container a pure JVM can handle codec-free:
    * nearest-neighbor downsample of an uncompressed 24bpp
    * BITMAPINFOHEADER BMP to [[thumbDims]], honoring 4-byte row padding
    * and both row orders (positive height = bottom-up storage, negative =
    * top-down; the output is always bottom-up, the writer's convention).
    * Returns None for any other pixel format — palette, 32bpp, RLE and
    * the compressed containers belong to the codec seam. */
  def resizeBmp(payload: Array[Byte], maxSide: Int = 128): Option[Array[Byte]] = {
    if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M') return None
    if (i32le(payload, 14) < 40) return None
    val w = i32le(payload, 18)
    val hRaw = i32le(payload, 22)
    val h = math.abs(hRaw)
    val bpp = u16le(payload, 28)
    val compression = i32le(payload, 30)
    val dataOff = i32le(payload, 10)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0 || dataOff < 54) return None
    // Long stride math in DIVISION form: a hostile width overflows an int
    // stride, and width AND height together overflow even srcRowL * h in
    // Long (≈1.4e19 wraps negative and would slip past a product-form
    // bound) — dividing by h instead cannot overflow
    val srcRowL = (w.toLong * 3 + 3) / 4 * 4
    if (srcRowL > (payload.length - dataOff).toLong / h) return None
    val srcRow = srcRowL.toInt // fits: the payload bound above caps it
    val (tw, th) = thumbDims(w, h, maxSide)
    val out = makeBmp(tw, th)
    val dstRow = (tw * 3 + 3) / 4 * 4
    var y = 0
    while (y < th) {
      // logical row counted from the TOP, mapped nearest-neighbor into the
      // source, then each side converted to its own storage order
      val lyTop = th - 1 - y // out is bottom-up: storage row y is this logical row
      val sLogical = (lyTop.toLong * h / th).toInt
      val sStorage = if (hRaw > 0) h - 1 - sLogical else sLogical
      val srcBase = dataOff + sStorage * srcRow
      val dstBase = 54 + y * dstRow
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * w / tw).toInt
        val so = srcBase + sx * 3
        val po = dstBase + x * 3
        out(po) = payload(so); out(po + 1) = payload(so + 1); out(po + 2) = payload(so + 2)
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  /** REAL pixel resize for the JDK-decodable codec formats (PNG / JPEG /
    * GIF): full `ImageIO.read` decode, the SAME nearest-neighbor index
    * math as [[resizeBmp]] (logical rows from the top, `x*w/tw` source
    * mapping), re-encoded as PNG. PNG out regardless of input format is
    * deliberate: it is lossless (the sampled pixels survive the
    * round-trip bit-exactly, so tests can assert on them), while a
    * JPEG re-encode would re-quantize — thumbnail fidelity silently
    * dependent on encoder version. Returns None for undecodable bytes. */
  def resizeImageIO(payload: Array[Byte], maxSide: Int = 128): Option[Array[Byte]] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
    val (w, h) = (img.getWidth, img.getHeight)
    val (tw, th) = thumbDims(w, h, maxSide)
    val out = new java.awt.image.BufferedImage(
      tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * h / th).toInt
      var x = 0
      while (x < tw) {
        out.setRGB(x, y, img.getRGB((x.toLong * w / tw).toInt, sy))
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(out, "png", baos)) None
    else Some(baos.toByteArray)
  }

  /** PNG/JPEG writer fixtures via the same JDK encoders the readers pair
    * with — lets tests round-trip [[decodeImageDims]] / [[resizeImageIO]]
    * on REAL codec bytes without any external image library. The pixel
    * fill is a deterministic gradient so resize tests can assert on
    * sampled values. */
  def makeImage(w: Int, h: Int, format: String): Array[Byte] = {
    require(w > 0 && h > 0)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x % 251) << 16) | ((y % 241) << 8) | ((x + y) % 239))
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, baos),
      s"no JDK encoder for format '$format'")
    baos.toByteArray
  }

  /** Per-object DECODED metadata (the l_media_decode row's shape): image
    * fields null for audio and vice versa — whatever the real parsers
    * extracted from the payload bytes, never echoed from the metadata. */
  case class MediaDecoded(doc_id: Long, mime: String, n_bytes: Long,
                          width: Option[Long], height: Option[Long],
                          sample_rate: Option[Long], channels: Option[Long],
                          duration_ms: Option[Long])

  /** Minimal spec-valid PNG *header* writer — signature + IHDR (13-byte
    * data, correct CRC32) + IEND, 45 bytes total, fully deterministic
    * byte math (no encoder): the dimension metadata is genuine PNG
    * structure that [[decodePng]] AND the JDK's imageio header reader
    * both parse, while pixel data (IDAT) stays at the codec seam. The
    * real-encoder round-trip fixture is [[makeImage]]; this one exists
    * for oracle rows, where payload SIZE must be an arithmetic fact an
    * independent engine can replay (encoder output length is not). */
  def makePngHeader(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val b = java.nio.ByteBuffer.allocate(45) // big-endian by default
    b.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13) // IHDR data length, spec-fixed
    b.put("IHDR".getBytes("US-ASCII"))
    b.putInt(w).putInt(h)
    b.put(8.toByte).put(2.toByte) // bit depth 8, color type 2 (truecolor)
    b.put(0.toByte).put(0.toByte).put(0.toByte) // compression, filter, interlace
    val crc = new java.util.zip.CRC32()
    crc.update(b.array(), 12, 17) // chunk type + data
    b.putInt(crc.getValue.toInt)
    b.putInt(0)
    b.put("IEND".getBytes("US-ASCII"))
    val crc2 = new java.util.zip.CRC32()
    crc2.update("IEND".getBytes("US-ASCII"))
    b.putInt(crc2.getValue.toInt)
    b.array()
  }

  /** Minimal spec-valid JPEG *frame header* writer — SOI + SOF0 with the
    * real height/width fields (big-endian at +5/+7), 15 bytes,
    * deterministic byte math: exactly the marker walk [[decodeJpeg]]
    * performs, entropy-coded data stays at the codec seam. Same oracle
    * rationale as [[makePngHeader]]. */
  def makeJpegHeader(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff)
    val b = java.nio.ByteBuffer.allocate(15)
    b.putShort(0xffd8.toShort) // SOI
    b.putShort(0xffc0.toShort) // SOF0 (baseline)
    b.putShort(11)             // segment length: len(2)+precision(1)+h(2)+w(2)+nc(1)+comp(3)
    b.put(8.toByte)            // sample precision
    b.putShort(h.toShort).putShort(w.toShort)
    b.put(1.toByte)            // one component
    b.put(1.toByte).put(0x11.toByte).put(0.toByte) // id, 1x1 sampling, qtable
    b.array()
  }

  /** Frame-sample plan for video: k evenly spaced frame indices in
    * [0, nFrames) — first frame always included, never duplicated. */
  def frameOffsets(nFrames: Int, k: Int): Seq[Int] = {
    require(nFrames > 0 && k > 0)
    if (k >= nFrames) 0 until nFrames
    else (0 until k).map(i => (i.toLong * nFrames / k).toInt).distinct
  }

  /** Minimal valid BMP writer (BITMAPINFOHEADER, 24bpp, no pixel data
    * beyond zero padding) — lets tests and fixtures round-trip the REAL
    * parser without any image library. */
  def makeBmp(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val rowBytes = (w * 3 + 3) / 4 * 4
    val pixelBytes = rowBytes * h
    val size = 54 + pixelBytes
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(pixelBytes).putInt(2835).putInt(2835).putInt(0).putInt(0)
    b.array()
  }

  /** Minimal valid PCM WAV writer (header + silent frames) — the REAL
    * parser's round-trip fixture. */
  def makeWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
              nFrames: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataBytes = nFrames * blockAlign
    val b = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(channels.toShort).putInt(sampleRate)
    b.putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
    b.putShort(bitsPerSample.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    b.array()
  }

  /** Partition-batched thumbnail pass: payload → payload. Gated on the
    * DECLARED type first — only rows whose mime starts with `image/` are
    * touched, so a payload
    * that merely sniffs like a BMP but is labeled audio/video is never
    * silently mutated (the caller's label wins over magic bytes).
    * Decodable images are REALLY downsampled: BMP by our byte parser
    * ([[resizeBmp]], output stays BMP), PNG/JPEG/GIF via the JDK codecs
    * ([[resizeImageIO]], output is PNG — mime is retagged to match).
    * Undecodable image rows pass through untouched behind the same seam.
    * Payloads still never shuffle — the resize runs next to the scan and
    * the smaller bytes travel on. */
  def resizeThumbs(media: Dataset[MediaRow], maxSide: Int = 128): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (!r.mime.startsWith("image/")) r
        else resizeBmp(r.payload, maxSide) match {
          case Some(p) => r.copy(payload = p)
          case None => resizeImageIO(r.payload, maxSide) match {
            case Some(p) => r.copy(mime = "image/png", payload = p)
            case None    => r
          }
        }
      }
    }
  }

  /** The partition-batched extract: one decoder init per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // A real codec/session handle would be created HERE, once per
      // partition, and reused until the iterator drains.
      rows.map { r =>
        val (w, h) = decodeImage(r.payload)
        val (tw, th) = thumbDims(w, h)
        MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong,
          checksum(r.payload), w, h, tw, th)
      }
    }
  }
}
