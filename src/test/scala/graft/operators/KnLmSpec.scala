package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The interpolated-KN plane's reason to exist: finite, monotone
  * scores on held-out text the unsmoothed MLE plane cannot score.
  */
class KnLmSpec extends SparkSpec {
  import spark.implicits._

  /** train docs (% 5 != 0) establish bigrams over {a,b,c,d}; eval
    * docs (% 5 == 0) carry 0, 1, 2 unseen bigrams at equal length. */
  private lazy val fixture = Seq(
    (1L, "a b c d a b c d a"),
    (2L, "a b c d a b c d a"),
    (3L, "b c d a b c d a b"),
    // 8 bigrams each; z is OOV
    (5L, "a b c d a b c d a"),   // all seen
    (10L, "a b c d a b c d z"),  // 1 unseen (d z)
    (15L, "a b c d a b c z z")   // 2 unseen (c z), (z z)
  ).toDF("doc_id", "text")

  private lazy val rows = KnLm.knLogprob(fixture).collect()
    .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3)))
    .toMap

  test("held-out docs with unseen bigrams get FINITE nonnegative nll " +
      "(the unsmoothed plane assigns them probability zero)") {
    assert(rows.keySet == Set(5L, 10L, 15L))
    rows.foreach { case (id, (nb, nll, per)) =>
      assert(nb == 8, s"doc $id bigram count")
      assert(nll >= 0L && per >= 0L, s"doc $id negative nll")
      assert(per == nll / 8, s"doc $id floor-div norm")
    }
  }

  test("nll is strictly monotone in the number of unseen bigrams at " +
      "equal length (the operating property a perplexity filter needs)") {
    assert(rows(5L)._2 < rows(10L)._2,
      s"1 OOV bigram must cost more than 0: ${rows(5L)} vs ${rows(10L)}")
    assert(rows(10L)._2 < rows(15L)._2,
      s"2 OOV bigrams must cost more than 1: ${rows(10L)} vs ${rows(15L)}")
  }

  test("an all-OOV held-out doc (unseen w1 AND w2 everywhere) still " +
      "scores finitely through the +1 continuation floor") {
    val d = fixture.unionByName(
      Seq((20L, "q r s t q r s t q")).toDF("doc_id", "text"))
    val r = KnLm.knLogprob(d).where(col("doc_id") === 20L).collect()(0)
    assert(r.getInt(1) == 8 && r.getLong(2) > 0L)
    // every bigram hits the unseen-w1 floor P = 1/T with T = ntypes +
    // (V+1) = 4 + 5 = 9: nll = 8 * (ilog(9) - ilog(1))
    val expected = 8L * UnigramLm.ilog2Q10(9L)
    assert(r.getLong(2) == expected,
      s"floor nll ${r.getLong(2)} != hand-computed $expected")
  }
}
