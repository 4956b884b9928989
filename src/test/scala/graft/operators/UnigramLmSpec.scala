package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM training: the exact fixed-point log, a full plain-Scala
  * replay of the seed → Viterbi-EM → prune trajectory on the real
  * corpus, and segmentation behavior on a crafted corpus with a
  * dominant subword.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("ilog2Q10: exact on powers of two, within 2 q10 ulps of real " +
      "log2 everywhere sampled, and monotone") {
    for (e <- 0 to 40)
      assert(UnigramLm.ilog2Q10(1L << e) == e * 1024L)
    val rnd = new scala.util.Random(3)
    var prev = -1L
    for (m <- (1L to 2000L) ++ Seq.fill(200)(rnd.nextLong(1L << 42) + 1)) {
      val got = UnigramLm.ilog2Q10(m)
      val ref = 1024.0 * math.log(m.toDouble) / math.log(2.0)
      assert(math.abs(got - ref) <= 2.0, s"m=$m got=$got ref=$ref")
    }
    for (m <- 1L to 5000L) {
      val v = UnigramLm.ilog2Q10(m)
      assert(v >= prev, s"non-monotone at $m")
      prev = v
    }
  }

  /** Independent plain-Scala implementation of the whole train loop —
    * same spec (seed, scores, DP tie-breaks, prune, floor), written
    * against collections, no Spark. */
  private def replay(texts: Seq[String])
      : (Seq[(String, Long, Long)], Seq[Long]) = {
    val L = UnigramLm.MaxPieceLen
    val words = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
    val wf = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val subCnt = collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for ((w, f) <- wf; l <- 1 to L; i <- 0 to w.length - l)
      subCnt(w.substring(i, i + l)) += f
    val chars = subCnt.keys.filter(_.length == 1).toSeq
    val multi = subCnt.filter(_._1.length > 1).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(UnigramLm.TopK).map(_._1)
    var pieces: Seq[(String, Long)] =
      (chars ++ multi).map(p => p -> subCnt(p)).sortBy(_._1)
    val lls = Seq.newBuilder[Long]
    def vit(w: String, sc: Map[String, Long]): (Long, Int, String) = {
      val best = Array.fill[(Long, Int, String)](w.length + 1)(null)
      best(0) = (0L, 0, "")
      for (j <- 1 to w.length) {
        val cands = for {
          i <- math.max(0, j - L) until j
          piece = w.substring(i, j)
          s <- sc.get(piece)
          (ps, pn, pp) = best(i)
        } yield (ps + s, pn + 1, if (pp == "") piece else pp + " " + piece)
        best(j) = cands.minBy { case (s, n, p) => (-s, n, p) }
      }
      best(w.length)
    }
    for (_ <- 1 to UnigramLm.EmIters) {
      val t = pieces.map(_._2).sum
      val sc = pieces.map { case (p, c) =>
        p -> UnigramLm.scoreQ10(c, t) }.toMap
      val segs = wf.map { case (w, f) => (w, f, vit(w, sc)) }
      lls += segs.map { case (_, f, (s, _, _)) => f * s }.sum
      val cm = collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      for ((_, f, (_, _, path)) <- segs; p <- path.split(" "))
        cm(p) += f
      pieces = pieces.flatMap { case (p, _) =>
        val c = cm(p)
        if (p.length == 1) Some(p -> math.max(c, 1L))
        else if (c > 0) Some(p -> c) else None
      }
    }
    val tF = pieces.map(_._2).sum
    (pieces.map { case (p, c) => (p, c, UnigramLm.scoreQ10(c, tF)) },
      lls.result())
  }

  test("text_unigram_lm: full plain-Scala replay on the real corpus — " +
      "final vocab, counts, scores, and both likelihood totals match") {
    val texts = graft.Tables.load(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0)).toSeq
    val (expPieces, expLls) = replay(texts)
    val got = graft.SparkEntry.queries("text_unigram_lm")(spark, sfDir)
      .collect()
    val gotPieces = got.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotPieces == expPieces.sortBy(_._1))
    assert(got.forall(r => r.getLong(3) == expLls.head &&
      r.getLong(4) == expLls(1)))
    // the trajectory is non-trivial on this corpus: multi-char pieces
    // survive and likelihood moved between iterations
    assert(gotPieces.exists(_._1.length > 1),
      "no multi-char piece survived — EM was vacuous")
  }

  test("text_unigram_tokenize: driver replay — per-doc word counts, " +
      "piece totals, and the in-order piece-stream md5 all match a " +
      "plain-Scala Viterbi under the trained final scores") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val texts = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val (pieces, _) = replay(texts.map(_._2))
    val tF = pieces.map(_._2).sum
    val sc = pieces.map { case (p, c, _) =>
      p -> UnigramLm.scoreQ10(c, tF) }.toMap
    val L = UnigramLm.MaxPieceLen
    def vit(w: String): (Int, String) = {
      val best = Array.fill[(Long, Int, String)](w.length + 1)(null)
      best(0) = (0L, 0, "")
      for (j <- 1 to w.length) {
        val cands = for {
          i <- math.max(0, j - L) until j
          piece = w.substring(i, j)
          s <- sc.get(piece)
          (ps, pn, pp) = best(i)
        } yield (ps + s, pn + 1, if (pp == "") piece else pp + " " + piece)
        best(j) = cands.minBy { case (s, n, p) => (-s, n, p) }
      }
      (best(w.length)._2, best(w.length)._3)
    }
    val expect = texts.map { case (id, t) =>
      val words = t.split("\\s+").filter(_.nonEmpty)
      val segs = words.map(vit)
      id -> ((words.length.toLong, segs.map(_._1.toLong).sum,
        md5hex(segs.map(_._2).mkString(" "))))
    }.toMap
    val got = graft.SparkEntry.queries("text_unigram_tokenize")(
        spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expect)
    // segmentation is non-trivial: some word maps to > 1 piece AND
    // some word maps to a single multi-char piece
    assert(expect.values.map(_._2).sum > 0)
  }

  test("crafted corpus: a dominant repeated subword is learned and " +
      "used by the Viterbi segmentation; EM does not decrease the " +
      "likelihood") {
    val docs = (Seq.fill(50)("abab cdcd abab") ++ Seq("xy zq"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (pieces, lls) = UnigramLm.train(docs.select(col("text")))
    val byPiece = pieces.map(p => p._1 -> p._2).toMap
    // 'abab' (or at least 'ab') must survive pruning with a real count
    assert(byPiece.contains("abab") || byPiece.contains("ab"),
      s"dominant subword lost: $pieces")
    assert(lls(1) >= lls(0),
      s"EM decreased the likelihood on a separable corpus: $lls")
    // chars never pruned, even unused ones get the floor count
    for (c <- Seq("a", "b", "c", "d", "x", "y", "z", "q"))
      assert(byPiece.contains(c), s"char $c pruned")
  }
}
