package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRow, MediaFeatures}

/** The multimodal mapPartitions plumbing: stubbed decode, real dataflow. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

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
}
