package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: the stub featurizer's contract (shape, determinism,
  * edge cases) and the distributed decode path's schema.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("stubDecodeFeatures: fixed width, deterministic, full byte coverage") {
    val bytes = Array.tabulate(100)(i => i.toByte)
    val f1 = Multimodal.stubDecodeFeatures(bytes, 8)
    val f2 = Multimodal.stubDecodeFeatures(bytes, 8)
    assert(f1.length == 8)
    assert(f1.toSeq == f2.toSeq)
    // stripe means of 0..99 are increasing
    assert(f1.toSeq == f1.sorted.toSeq)
  }

  test("stubDecodeFeatures: empty payload -> zero vector, not a crash") {
    assert(Multimodal.stubDecodeFeatures(Array.emptyByteArray, 4).toSeq ==
      Seq(0f, 0f, 0f, 0f))
  }

  test("stubDecodeFeatures: payload shorter than dim still yields dim") {
    assert(Multimodal.stubDecodeFeatures(Array[Byte](1, 2), 8).length == 8)
  }

  test("sampleFrames: one row per sampled pseudo-frame, typed schema") {
    val media = Seq((1L, Array.tabulate(100)(_.toByte)))
      .toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(media, "payload",
      frameSize = 10, stride = 3).collect()
    // 10 frames, strides 0,3,6,9 -> 4 sampled
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_.getAs[Array[Byte]](2).length == 10))
  }

  test("sampleFrames: trailing partial frame is emitted (ceil division)") {
    val media = Seq((1L, Array.tabulate(25)(_.toByte)))
      .toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(media, "payload",
      frameSize = 10, stride = 1).collect().sortBy(_.getInt(1))
    // ceil(25/10) = 3 frames: 10 + 10 + 5 trailing bytes
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(frames.map(_.getAs[Array[Byte]](2).length).toSeq == Seq(10, 10, 5))
  }

  test("resizeFeatures: average-pool down and zero-pad up") {
    val df = Seq((1L, Seq(2f, 4f, 6f, 8f))).toDF("doc_id", "features")
    val down = Multimodal.resizeFeatures(df, "features", from = 4, to = 2)
      .head().getSeq[Float](1)
    assert(down == Seq(3f, 7f)) // avg(2,4), avg(6,8)
    val up = Multimodal.resizeFeatures(df, "features", from = 4, to = 6)
      .head().getSeq[Float](1)
    assert(up == Seq(2f, 4f, 6f, 8f, 0f, 0f))
  }

  test("decodeToFeatures: distributed schema is (doc_id, features[dim])") {
    val media = Seq((1L, "hello".getBytes), (2L, "world!".getBytes))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeToFeatures(media, "payload", 4)
    assert(out.schema.fieldNames.toSeq == Seq("doc_id", "features"))
    val rows = out.orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getSeq[Float](1).length == 4))
    // matches the local stub exactly (no serialization drift)
    assert(rows(0).getSeq[Float](1) ==
      Multimodal.stubDecodeFeatures("hello".getBytes, 4).toSeq)
  }
}
