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
  * The byte-level decoding is STUBBED — this container ships no image/
  * audio/video codecs — behind deterministic fakes that derive plausible
  * dimensions from the payload content. The dataflow (schema, typed
  * Dataset API, partition-batch shape, per-partition init point) is real;
  * swapping `decodeImageStub` for an actual codec touches nothing else.
  */
object Multimodal {

  /** One media object: opaque payload + mime tag (cf. LlmOps l_multimodal,
    * which keeps the same shape fully relational for the oracle). */
  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

  /** Per-object extracted features — the only thing that leaves the scan. */
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                           checksum: Long, width: Int, height: Int,
                           thumb_w: Int, thumb_h: Int)

  /** Rolling content checksum (same polynomial family as LlmOps hashes). */
  def checksum(payload: Array[Byte]): Long =
    payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)

  /** STUB image decode — a real implementation would parse the container
    * header (PNG IHDR / JPEG SOF) or hand bytes to a codec. Deterministic
    * fake: dimensions derived from the content checksum. */
  def decodeImageStub(payload: Array[Byte]): (Int, Int) = {
    val cs = checksum(payload)
    (64 + (cs % 1024).toInt, 48 + ((cs / 1024) % 768).toInt)
  }

  /** Resize step's aspect-preserving target math (the pixel work would
    * live in the codec; this is the part the pipeline owns). */
  def thumbDims(w: Int, h: Int, maxSide: Int = 128): (Int, Int) = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    if (w <= maxSide && h <= maxSide) (w, h)
    else if (w >= h) (maxSide, math.max(1, math.round(h.toDouble * maxSide / w).toInt))
    else (math.max(1, math.round(w.toDouble * maxSide / h).toInt), maxSide)
  }

  /** Frame-sample plan for video: k evenly spaced frame indices in
    * [0, nFrames) — first frame always included, never duplicated. */
  def frameOffsets(nFrames: Int, k: Int): Seq[Int] = {
    require(nFrames > 0 && k > 0)
    if (k >= nFrames) 0 until nFrames
    else (0 until k).map(i => (i.toLong * nFrames / k).toInt).distinct
  }

  /** The partition-batched extract: one decoder init per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // A real codec/session handle would be created HERE, once per
      // partition, and closed when the iterator drains.
      rows.map { r =>
        val (w, h) = decodeImageStub(r.payload)
        val (tw, th) = thumbDims(w, h)
        MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong,
          checksum(r.payload), w, h, tw, th)
      }
    }
  }
}
