package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integration pins for the composed corpus-preparation pipeline —
  * a hand-computed fixture where EVERY stage drops a specific known
  * document, so a stage-boundary bug (filter order, column contract,
  * survivor rule) moves a pinned number; plus algebraic cross-stage
  * invariants on the real sf0.001 corpus.
  */
class PrepareSpec extends SparkSpec {
  import spark.implicits._

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  /** Fixture: 12 docs, one engineered casualty per stage.
    *  - lang aa: 1 (120 uniq tokens, keeps), 2 (EXACTLY doc1's first
    *    50 tokens — fully deleted by ExactSubstr, drops at stage 2),
    *    3/4 (low n_chars, gated out at stage 1)
    *  - lang bb: 5 (30 tokens, keeps), 6 (verbatim COPY of 5 — near-dup
    *    J=1.0, drops at stage 3), 7/8 gated out
    *  - lang cc: 9 (train, shares a 7-token phrase = 3 rare 5-grams
    *    with eval doc 20 — flagged, drops at stage 4), 20 (eval split
    *    doc_id % 10 = 0, leaves the train corpus at stage 4),
    *    13/14 gated out */
  private lazy val fixture = {
    val shared = "q1 q2 q3 q4 q5 q6 q7"
    Seq(
      (1L, "aa", 1000L, toks("t", 120)),
      (2L, "aa", 900L, toks("t", 50)),
      (3L, "aa", 10L, "x1 x2"),
      (4L, "aa", 10L, "x3 x4"),
      (5L, "bb", 1000L, toks("v", 30)),
      (6L, "bb", 900L, toks("v", 30)),
      (7L, "bb", 10L, "x5 x6"),
      (8L, "bb", 10L, "x7 x8"),
      (9L, "cc", 1000L, s"w1 w2 $shared w3 w4"),
      (20L, "cc", 900L, s"y1 y2 $shared y3 y4"),
      (13L, "cc", 10L, "x9 x10"),
      (14L, "cc", 10L, "x11 x12")
    ).toDF("doc_id", "lang", "n_chars", "text")
  }

  test("fullPrepare: every stage drops exactly its engineered casualty") {
    val rows = Prepare.fullPrepare(fixture).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.getString(3)))).toMap
    assert(rows("0_input")._1 == 12L)
    // gate keeps the top ceil(4/2)=2 per lang by (n_chars desc, doc_id)
    assert(rows("1_quality_gate")._1 == 6L)
    // doc2 is one duplicated 50-window; doc1's first occurrence wins,
    // doc2 empties and drops; every other doc is untouched
    assert(rows("2_exact_substr")._1 == 5L)
    assert(rows("2_exact_substr")._2 == (120 + 30 + 30 + 11 + 11).toLong)
    // doc6 is a verbatim copy of doc5: Jaccard 1.0 >= 0.9, keep-min
    assert(rows("3_near_dup")._1 == 4L)
    // doc9 shares 3 distinct rare 5-grams with eval doc 20 -> flagged;
    // the eval doc itself leaves the train corpus
    assert(rows("4_decontaminate")._1 == 2L)
    assert(rows("4_decontaminate")._2 == (120 + 30).toLong)
    // pack: (120+1) + (30+1) = 152 tokens -> 1 chunk; manifest is
    // doc1@0, doc5@121
    val (nChunks, packTokens, digest) = rows("5_pack")
    assert(nChunks == 1L && packTokens == 152L)
    val expectedDigest = java.security.MessageDigest.getInstance("MD5")
      .digest("1:0,5:121".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(digest.contains(expectedDigest),
      s"manifest digest drifted: $digest vs $expectedDigest")
  }

  test("fullPrepare: an empty pack stage yields NULL digest/count " +
      "(DuckDB string_agg-over-zero-rows parity, r10 advice)") {
    // every doc_id % 10 == 0: the whole surviving corpus is eval split,
    // so the train/pack stages are empty — Spark must mirror DuckDB's
    // NULL (string_agg/SUM over zero rows), not md5('')
    val allEval = Seq(
      (10L, "aa", 1000L, toks("e", 30)),
      (20L, "aa", 900L, toks("f", 30))
    ).toDF("doc_id", "lang", "n_chars", "text")
    val row = Prepare.fullPrepare(allEval)
      .where(col("stage") === "5_pack").collect()(0)
    assert(row.isNullAt(3), s"empty pack stage must have NULL digest: $row")
    assert(row.isNullAt(1) && row.isNullAt(2),
      s"empty pack stage must have NULL count/tokens: $row")
  }

  test("fullPrepare: cross-stage invariants hold on the real corpus") {
    val rows = Prepare
      .fullPrepare(graft.Tables.load(spark, sfDir, "documents"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val stages = Seq("0_input", "1_quality_gate", "2_exact_substr",
      "3_near_dup", "4_decontaminate")
    // survivor counts and token totals are monotone nonincreasing
    for (Seq(a, b) <- stages.sliding(2)) {
      assert(rows(b)._1 <= rows(a)._1, s"$b grew docs vs $a")
      assert(rows(b)._2 <= rows(a)._2, s"$b grew tokens vs $a")
    }
    // packing adds exactly one separator token per surviving doc and
    // the chunk count is the exact ceiling
    val (nFinal, tokFinal) = rows("4_decontaminate")
    val (nChunks, tokPacked) = (rows("5_pack")._1, rows("5_pack")._2)
    assert(tokPacked == tokFinal + nFinal)
    assert(nChunks ==
      (tokPacked + Packing.SeqLen - 1) / Packing.SeqLen)
    assert(nFinal > 0, "fixture corpus must survive the pipeline")
  }
}
