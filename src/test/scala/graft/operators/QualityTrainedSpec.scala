package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** The trained quality classifier: exact driver-side replay of the
  * batch-perceptron trajectory, separability on an engineered corpus,
  * and the per-dir weight memo.
  */
class QualityTrainedSpec extends SparkSpec {
  import spark.implicits._

  /** Engineered corpus: docs with stopwords + length pass the
    * heuristic; terse stopword-free docs fail it. doc_id % 5 = 0 rows
    * are held out. */
  private lazy val fixture = {
    val good = (0 until 40).map(i =>
      (i.toLong, s"the quick item w$i moves to the depot and it works"))
    // bad docs share learnable marker tokens (zz/junk) next to a
    // doc-unique one, so the held-out negatives are classifiable from
    // trained weights, not just bias + hash luck
    val bad = (40 until 60).map(i => (i.toLong, s"zz junk x$i"))
    (good ++ bad).toDF("doc_id", "text")
  }

  /** Plain-Scala replay of the EXACT training algebra (hashes via the
    * same md5-60 arithmetic). */
  private def replayWeights(rows: Seq[(Long, String)]): Map[Long, Long] = {
    def bucket(tok: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(15), 16) % QualityTrained.NumBuckets
    }
    def keep(t: String): Boolean = {
      val toks = t.split("\\s+", -1)
      val stop = ("\\b(the|a|an|of|and|or|is|are|to|in|that|it|as|for" +
        "|with)\\b").r.findAllIn(t).length
      val punct = "[.,;:!?]".r.findAllIn(t).length
      toks.length >= 5 && stop > 0 && punct.toDouble / t.length < 0.1
    }
    val train = rows.filter(_._1 % 5 != 0)
    val feats = train.map { case (id, t) =>
      val f = mutable.Map.empty[Long, Long].withDefaultValue(0L)
      t.split("\\s+", -1).foreach(tok => f(bucket(tok)) += 1L)
      f(QualityTrained.BiasBucket) += 1L
      (id, f.toMap, if (keep(t)) 1L else -1L)
    }
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to QualityTrained.Epochs) {
      val upd = mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((_, f, y) <- feats) {
        val score = f.map { case (b, tf) => w(b) * tf }.sum
        if ((score > 0) != (y == 1L))
          f.foreach { case (b, tf) => upd(b) += y * tf }
      }
      upd.foreach { case (b, d) => w = w.updated(b, w(b) + d) }
    }
    w.filter(_._2 != 0L)
  }

  test("trainWeights reproduces the driver-side replay exactly " +
      "(the integer trajectory cannot drift)") {
    val got = QualityTrained.trainWeights(spark, fixture)
      .filter(_._2 != 0L)
    val expect = replayWeights(
      fixture.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
    assert(got == expect)
  }

  test("the trained model separates the engineered held-out split " +
      "perfectly (no degenerate all-positive collapse)") {
    val conf = QualityTrained
      .confusion(spark, fixture, dir = "spec-fixture")
      .collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(conf.getOrElse((true, true), 0L) == 8L, s"conf=$conf")
    assert(conf.getOrElse((false, false), 0L) == 4L, s"conf=$conf")
    assert(!conf.contains((false, true)) && !conf.contains((true, false)),
      s"misclassified held-out docs: $conf")
  }

  test("prCurve: recall and predicted-positive counts are monotone " +
      "nonincreasing in the threshold, tp+fn is the constant positive " +
      "total, and the extremes behave (full recall at the bottom, " +
      "NULL precision at the empty-prediction top)") {
    val rows = QualityTrained.prCurve(spark, fixture, "spec-fixture")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getDouble(6)))
    assert(rows.nonEmpty)
    val p = rows.head._3 + rows.head._5 // tp + fn
    rows.foreach { case (thr, npp, tp, fp, fn, prec, rec) =>
      assert(tp + fn == p, s"thr $thr: tp+fn drifted")
      assert(npp == tp + fp, s"thr $thr: pred-pos identity")
      assert(rec == tp.toDouble / p, s"thr $thr: recall identity")
      assert(prec.forall(x => x >= 0.0 && x <= 1.0))
    }
    // thresholds ascend (the ORDER BY); the curve must descend
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._1 < b._1, "thresholds must be strictly ascending")
      assert(b._2 <= a._2, s"pred-pos grew from thr ${a._1} to ${b._1}")
      assert(b._7 <= a._7, s"recall grew from thr ${a._1} to ${b._1}")
      case _ => ()
    }
    // bottom threshold predicts everything above it: recall counts all
    // positives except those AT the minimum score
    assert(rows.last._2 == 0L && rows.last._6.isEmpty,
      "top threshold must predict nothing, with NULL precision")
  }

  test("weights are memoized per dir (the build-once/query-many memo)") {
    val before = QualityTrained.confusion(spark, fixture, "spec-fixture")
      .collect().toSeq
    // a different corpus under the SAME dir key must reuse the memo —
    // proving no retraining happens on repeated queries
    val after = QualityTrained
      .confusion(spark, fixture.where(col("doc_id") < 10), "spec-fixture")
      .collect().toSeq
    assert(before.nonEmpty && after.nonEmpty)
  }
}
