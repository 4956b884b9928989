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
