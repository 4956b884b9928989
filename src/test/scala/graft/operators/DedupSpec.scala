package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup operators: recall of the approximate methods against exact
  * Jaccard ground truth on a controlled corpus, plus determinism and
  * survivor rules.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Small corpus with engineered near-duplicates: pairs (1,2) and (3,4)
    * are near-identical, 5..10 are mutually distinct. */
  private lazy val corpus: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank now"),
    (3L, "pack my box with five dozen liquor jugs before the long winter comes"),
    (4L, "pack my box with five dozen liquor jugs before the long winter ends"),
    (5L, "completely different text about spark and distributed query engines"),
    (6L, "a totally unrelated sentence mentioning databases and storage layers"),
    (7L, "yet another unique document discussing compilers and type systems"),
    (8L, "orthogonal content on sailing boats across the northern atlantic sea"),
    (9L, "final standalone entry about mountain hiking trails and weather"),
    (10L, "the quick brown fox jumps over the lazy dog near the river bank today"))
    .toDF("doc_id", "text")

  /** Exact word-bigram Jaccard >= threshold, brute force. */
  private def exactPairs(threshold: Double): Set[(Long, Long)] = {
    val rows = corpus.collect().map(r => r.getLong(0) -> {
      val t = r.getString(1).split("\\s+")
      if (t.length >= 2) t.sliding(2).map(_.mkString(" ")).toSet
      else Set(t.mkString(" "))
    })
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= threshold
    } yield (ia, ib)).toSet
  }

  test("minhash LSH finds all high-Jaccard pairs (recall = 1 here) and " +
      "estimates within 0.2 of exact") {
    val got = Dedup.minhashPairs(corpus, numHashes = 64, bands = 16,
        minEst = 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expect = exactPairs(0.7)
    assert(expect.subsetOf(got.keySet),
      s"missed pairs: ${expect -- got.keySet}")
    // identical docs 1 and 10 must estimate 1.0
    assert(got((1L, 10L)) == 1.0)
  }

  test("crossCorpusPairs: finds every engineered cross-side near-dup, " +
      "emits ONLY new-x-old pairs, and ignores same-side dups") {
    // old corpus: 1, 3, 5, 6 — new batch: 2 (near-dup of 1), 4 (of 3),
    // 7..9 (unique), 10 (identical to 1); 7-9 also deliberately lack
    // any old-side partner
    val old = corpus.where(col("doc_id").isin(1L, 3L, 5L, 6L))
    val fresh = corpus.where(col("doc_id").isin(2L, 4L, 7L, 8L, 9L, 10L))
    val got = Dedup.crossCorpusPairs(fresh, old, numHashes = 64,
        bands = 16, minEst = 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((2L, 1L), (4L, 3L), (10L, 1L)),
      s"cross-side pairs: $got")
    assert(got((10L, 1L)) == 1.0, "identical cross-side pair estimates 1.0")
    // survivors after the anti-join = the genuinely new documents
    val kept = Dedup.dropNearDuplicates(fresh,
        Dedup.crossCorpusPairs(fresh, old, 64, 16, 0.6)
          .select(col("doc_old").as("doc_a"), col("doc_new").as("doc_b")))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(7L, 8L, 9L), s"survivors: $kept")
  }

  test("crossCorpusPairs cache lifecycle: the harness clear-between-" +
      "queries policy leaves zero pinned RDD blocks, and consecutive " +
      "calls never accumulate cached signature frames") {
    // the Scaladoc'd policy (Dedup.scala crossCorpusPairs) as an
    // enforced contract, not a comment: each call pins its two
    // signature frames; clearCache() must release BOTH, and a second
    // call after a clear must not see (or grow) the first call's blocks
    val old = corpus.where(col("doc_id").isin(1L, 3L, 5L, 6L))
    val fresh = corpus.where(col("doc_id").isin(2L, 4L, 7L, 8L, 9L, 10L))
    def cachedBlocks: Int =
      spark.sparkContext.getPersistentRDDs.size
    // delta-based, not absolute-zero: the shared test session may carry
    // pinned blocks from OTHER operators' by-design memoization (CC
    // labels, merge tables) that clearCache legitimately leaves alone —
    // the contract under test is that crossCorpusPairs' own caches are
    // fully released, i.e. the count returns to baseline
    spark.catalog.clearCache()
    val base = cachedBlocks
    Dedup.crossCorpusPairs(fresh, old, 64, 16, 0.6).collect()
    val afterFirst = cachedBlocks
    assert(afterFirst > base, "signature frames should be pinned mid-query")
    spark.catalog.clearCache()
    assert(cachedBlocks <= base,
      "clearCache must release every signature cache of call 1")
    Dedup.crossCorpusPairs(fresh, old, 64, 16, 0.6).collect()
    assert(cachedBlocks <= afterFirst,
      "a second call after a clear must not accumulate beyond one call's " +
        "footprint")
    spark.catalog.clearCache()
    assert(cachedBlocks <= base,
      "clearCache must release every signature cache of call 2")
  }

  test("pipeline_paragraph_dedup: exact driver replay of corpus-wide " +
      "first-occurrence-wins over 16-token windows (cross-doc and " +
      "intra-doc copies both drop; md5 of the reassembled survivors " +
      "matches; NULL when nothing survives)") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = graft.SparkEntry.queries("pipeline_paragraph_dedup")(
        spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3)))).toMap
    val docsL = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[String]
    val expect = docsL.map { case (id, text) =>
      val paras = text.split("\\s+").grouped(16)
        .map(_.mkString(" ")).toSeq
      val kept = paras.filter(p => seen.add(p))
      id -> ((paras.size.toLong, kept.size.toLong,
        if (kept.isEmpty) null else md5hex(kept.mkString(" "))))
    }.toMap
    assert(got == expect)
    // the dedup is real on this corpus: at least one paragraph must
    // repeat (else the operator was exercised on an all-unique corpus)
    assert(expect.values.map(_._1).sum > expect.values.map(_._2).sum,
      "fixture has no duplicate paragraphs — replay proves nothing")
  }

  test("exactSubstrSpans: spans equal the brute-force union of ALL " +
      "duplicated substrings of length >= L (the window-union " +
      "equivalence), on a corpus with cross-doc, intra-doc, adjacent-" +
      "island and full-doc duplicates") {
    val L = 5
    val crafted = Seq(
      // docs 1/2 share the 6-token run "c d e f g h" mid-document
      (1L, "a b c d e f g h i j k l"),
      (2L, "x y c d e f g h z w q r"),
      // doc 3 repeats "p q r s t u" intra-doc, back to back: two
      // duplicated regions whose coverage touches -> ONE removal span
      (3L, "p q r s t u p q r s t u v"),
      // doc 4: wholly unique
      (4L, "m n o aa bb cc dd ee ff gg"),
      // docs 5/6 identical end to end -> full-span coverage
      (5L, "one two three four five six seven eight"),
      (6L, "one two three four five six seven eight"),
      // doc 7: TWO separated duplicated runs (each shared with doc 8)
      // with a unique gap wider than one token -> two islands
      (7L, "c d e f g h u1 u2 u3 u4 p q r s t u"),
      (8L, "zz c d e f g h yy ww")
    ).toDF("doc_id", "text")

    val got = Dedup.exactSubstrSpans(crafted, minLen = L)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

    // brute force, independent of any hashing: every substring of every
    // length m >= L, occurrence-counted corpus-wide by exact token-seq
    // equality; covered positions = union over duplicated substrings;
    // spans = merged maximal intervals of covered positions
    val toks = crafted.collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq)
      .sortBy(_._1)
    val allSubs = scala.collection.mutable.Map
      .empty[Seq[String], Int].withDefaultValue(0)
    for ((_, ts) <- toks; m <- L to ts.length; i <- 0 to ts.length - m)
      allSubs(ts.slice(i, i + m)) += 1
    val expect = toks.flatMap { case (id, ts) =>
      val covered = (for {
        m <- L to ts.length
        i <- 0 to ts.length - m
        if allSubs(ts.slice(i, i + m)) > 1
        pos <- i until i + m
      } yield pos).toSet
      // merge into maximal intervals
      val sorted = covered.toSeq.sorted
      val spans = sorted.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p)                          => (p, p) :: acc
      }.reverse
      spans.map { case (s, e) => (id, s.toLong, e.toLong, (e - s + 1).toLong) }
    }
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq == expect.toSeq,
      s"got=${got.toSeq}\nexpect=${expect.toSeq}")
    // the fixture exercises every regime
    val byDoc = got.groupBy(_._1)
    assert(byDoc(3L).map(t => (t._2, t._3)).toSeq == Seq((0L, 11L)),
      "touching duplicated regions must merge into one removal span")
    assert(byDoc(5L).head._4 == 8L && byDoc(6L).head._4 == 8L,
      "identical docs must be covered end to end")
    assert(byDoc(7L).length == 2,
      "separated duplicated runs must stay two islands")
    assert(!byDoc.contains(4L), "a unique doc has no spans")
  }

  test("pipeline_exact_substr: driver replay on the real corpus — " +
      "window-union + island merge recomputed in plain Scala") {
    val L = Dedup.ExactSubstrMinLen
    val got = graft.SparkEntry.queries("pipeline_exact_substr")(
        spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val toks = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq)
      .sortBy(_._1)
    val counts = scala.collection.mutable.Map
      .empty[Seq[String], Int].withDefaultValue(0)
    for ((_, ts) <- toks; i <- 0 to ts.length - L)
      counts(ts.slice(i, i + L)) += 1
    val expect = toks.flatMap { case (id, ts) =>
      val dupP = (0 to ts.length - L)
        .filter(i => counts(ts.slice(i, i + L)) > 1)
      val islands = dupP.foldLeft(List.empty[List[Int]]) {
        case (cur :: rest, p) if p <= cur.head + L => (p :: cur) :: rest
        case (acc, p)                              => List(p) :: acc
      }.reverse.map(_.reverse)
      islands.map(ps => (id, ps.head.toLong, (ps.last + L - 1).toLong,
        (ps.last + L - ps.head).toLong, ps.size.toLong))
    }
    assert(got == expect.toSeq)
    assert(got.nonEmpty, "corpus has no >=50-token duplicated substrings " +
      "— the replay proves nothing")
  }

  test("exactSubstrRemoval: first occurrence survives, later copies' " +
      "spans delete; full-doc duplicate removes end to end; plain-" +
      "Scala replay of counts and cleaned-text md5 on the real corpus") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // crafted: doc 2 is an exact copy of doc 1 (L=5 windows all dup,
    // doc 1 wins everywhere); doc 3 shares only a 6-token run with
    // doc 1 -> loses exactly positions 2..7; doc 4 unique
    val crafted = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "x y c d e f g h z w"),
      (4L, "m n o p q r s t u v")
    ).toDF("doc_id", "text")
    val got = Dedup.exactSubstrRemoval(crafted, minLen = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3)))
    assert(got(0) == ((1L, 10L, 0L, md5hex("a b c d e f g h i j"))),
      s"winner doc must keep everything: ${got(0)}")
    assert(got(1) == ((2L, 10L, 10L, null)),
      s"full-copy doc must be fully removed with NULL md5: ${got(1)}")
    assert(got(2) == ((3L, 10L, 6L, md5hex("x y z w"))),
      s"partial overlap removes exactly the shared span: ${got(2)}")
    assert(got(3)._3 == 0L && got(3)._4 == md5hex("m n o p q r s t u v"))

    // real-corpus replay at L = 50
    val L = Dedup.ExactSubstrMinLen
    val toks = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq)
      .sortBy(_._1)
    val firstSeen = scala.collection.mutable.Map[Seq[String], (Long, Int)]()
    val counts = scala.collection.mutable.Map[Seq[String], Int]()
      .withDefaultValue(0)
    for ((id, ts) <- toks; i <- 0 to ts.length - L) {
      val w = ts.slice(i, i + L)
      counts(w) += 1
      if (!firstSeen.contains(w)) firstSeen(w) = (id, i)
    }
    val expect = toks.map { case (id, ts) =>
      val rm = (for {
        i <- 0 to ts.length - L
        w = ts.slice(i, i + L)
        if counts(w) > 1 && firstSeen(w) != ((id, i))
        pos <- i until i + L
      } yield pos).toSet
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !rm.contains(i) => t }
      id -> ((ts.length.toLong, rm.size.toLong,
        if (kept.isEmpty) null else md5hex(kept.mkString(" "))))
    }.toMap
    val real = graft.SparkEntry.queries("pipeline_exact_substr_removal")(
        spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3)))).toMap
    assert(real == expect)
    assert(expect.values.exists(_._2 > 0),
      "corpus has no removals — replay proves nothing")
  }

  test("exactSubstrIncremental: equals full-corpus removal restricted " +
      "to the new batch; old always wins; new-internal copies fall to " +
      "the first-occurrence rule") {
    val all = Seq(
      (1L, "a b c d e f g h i j"),      // old
      (10L, "a b c d e f g h i j"),     // new, copies ONLY old text
      (11L, "p q r s t u v w x y"),     // new, first of a new-side pair
      (12L, "p q r s t u v w x y"),     // new, loses to 11
      (13L, "m n o k l z a2 b2 c2 d2")  // new, unique
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), if (r.isNullAt(3)) null else r.getString(3))).toSeq
    val inc = rows(Dedup.exactSubstrIncremental(
      all.where(col("doc_id") >= 10), all.where(col("doc_id") < 10),
      minLen = 5))
    val full = rows(Dedup.exactSubstrRemoval(all, minLen = 5)
      .where(col("doc_id") >= 10))
    assert(inc == full, s"incremental != full-restricted:\n$inc\n$full")
    val byId = inc.map(t => t._1 -> t).toMap
    assert(byId(10L)._3 == 10L && byId(10L)._4 == null,
      "old-only duplicate must be fully removed via the old index")
    assert(byId(11L)._3 == 0L, "the new-side first occurrence survives")
    assert(byId(12L)._3 == 10L && byId(12L)._4 == null,
      "the new-side later copy is fully removed")
    assert(byId(13L)._3 == 0L, "unique new doc untouched")
  }

  test("containmentPairs: a short doc fully quoted inside a long one " +
      "scores containment 1.0 while symmetric Jaccard misses it; " +
      "brute-force replay on the real corpus") {
    val big = (1 to 30).map(i => s"w$i").mkString(" ")
    val sub = (6 to 21).map(i => s"w$i").mkString(" ")     // ⊂ big
    val other = (100 to 115).map(i => s"x$i").mkString(" ")
    val crafted = Seq((1L, big), (2L, sub), (3L, other))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(crafted).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    // doc 2's 9 windows all appear in doc 1 -> containment 1.0
    assert(got((2L, 1L)) == 1000000L, s"subset pair missed: $got")
    // ...while Jaccard(2,1) over the same kind of sets is far below
    // any dedup threshold — the asymmetric relation is the point
    val jac = Dedup.prefixJaccardPairs(crafted, tNum = 9, tDen = 10)
      .collect()
    assert(!jac.exists(r => Set(r.getLong(0), r.getLong(1)) == Set(1L, 2L)),
      "Jaccard at 0.9 must NOT pair the subset docs (that blindness " +
        "is what containment exists to fix)")
    // the reverse direction is sub-threshold: only 9 of big's 23
    // windows are covered (9/23 < 1/2)
    assert(!got.contains((1L, 2L)), s"asymmetry violated: $got")

    // real-corpus brute force at L=8, t=1/2
    val toks = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split("\\s+").toSeq.sliding(8).map(_.mkString(" "))
          .toSet)
      .filter(_._2.forall(_.split("\\s+").length == 8))
    val expect = (for {
      (ia, sa) <- toks; (ib, sb) <- toks if ia != ib
      inter = sa.intersect(sb).size
      if 2L * inter >= sa.size
    } yield (ia, ib) -> (inter * 1000000L / sa.size)).toMap
    val real = graft.SparkEntry.queries("dedup_containment")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4))
      .toMap
    assert(real == expect)
    assert(real.nonEmpty, "corpus has no containment pairs — replay " +
      "proves nothing")
  }

  /** Bigram-shingle sets, the [[Dedup.shingles]] definition. */
  private def shingleSet(text: String): Set[String] = {
    val t = text.split("\\s+")
    if (t.length >= 2) t.sliding(2).map(_.mkString(" ")).toSet
    else Set(t.mkString(" "))
  }

  /** All-pairs exact shingle Jaccard >= tNum/tDen with values —
    * the quadratic ground truth prefixJaccardPairs must reproduce. */
  private def bruteJaccard(rows: Seq[(Long, String)], tNum: Int, tDen: Int)
      : Map[(Long, Long), Double] = {
    val sets = rows.map { case (id, t) => id -> shingleSet(t) }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = sa.intersect(sb).size
      if inter.toLong * tDen >= tNum.toLong * (sa.size + sb.size - inter)
    } yield (ia, ib) ->
      inter.toDouble / (sa.size + sb.size - inter)).toMap
  }

  test("prefixJaccardPairs: pair set AND values equal the all-pairs " +
      "ground truth on the engineered corpus (no candidate lost to the " +
      "prefix or length filters)") {
    val got = Dedup.prefixJaccardPairs(corpus, tNum = 6, tDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val expect = bruteJaccard(corpus.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq, 6, 10)
    assert(got == expect, s"got=$got expect=$expect")
    // the threshold actually bites: sub-threshold near-pairs exist
    assert(expect.nonEmpty && expect.size <
      corpus.count() * (corpus.count() - 1) / 2)
  }

  test("prefixJaccardPairs property: equals the all-pairs brute force " +
      "on seeded random corpora across thresholds (no pair ever lost " +
      "to the prefix, length, or positional filters)") {
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    for (seed <- Seq(5, 23); (tn, td) <- Seq((9, 10), (7, 10), (5, 10))) {
      val rnd = new scala.util.Random(seed)
      val rows = (0L until 30L).map(i =>
        i -> Seq.fill(20)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val df = rows.toDF("doc_id", "text")
      val got = Dedup.prefixJaccardPairs(df, tNum = tn, tDen = td)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      val expect = bruteJaccard(rows, tn, td)
      assert(got == expect,
        s"seed=$seed t=$tn/$td: got ${got.size} expect ${expect.size} " +
          s"missing=${expect.keySet -- got.keySet} " +
          s"extra=${got.keySet -- expect.keySet}")
    }
  }

  test("dedup_jaccard_prefix: driver replay against the all-pairs brute " +
      "force on the real corpus at t = 0.9") {
    val got = graft.SparkEntry.queries("dedup_jaccard_prefix")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val rows = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val expect = bruteJaccard(rows, 9, 10)
    assert(got == expect)
    assert(got.nonEmpty, "corpus has no J >= 0.9 pairs — replay proves " +
      "nothing")
  }

  test("simhash pairs: identical docs at hamming 0; distinct docs never " +
      "pair at hamming <= 3") {
    val got = Dedup.simhashPairs(corpus, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got.get((1L, 10L)).contains(0), s"identical pair: $got")
    val distinctIds = Set(5L, 6L, 7L, 8L, 9L)
    assert(got.keySet.forall { case (a, b) =>
      !(distinctIds.contains(a) && distinctIds.contains(b))
    })
  }

  test("simhash fingerprints: near-dups are closer in hamming than " +
      "unrelated docs") {
    val fps = Dedup.simhash128(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ham(a: Long, b: Long) =
      java.lang.Long.bitCount(fps(a)._1 ^ fps(b)._1) +
        java.lang.Long.bitCount(fps(a)._2 ^ fps(b)._2)
    assert(ham(1L, 10L) == 0)               // identical text
    assert(ham(1L, 2L) < ham(1L, 5L))       // one-word edit vs unrelated
    assert(ham(3L, 4L) < ham(3L, 8L))
  }

  test("md5 scheme preserves banding semantics: identical docs pair at " +
      "estimate 1.0, near-dups are found, with 60-bit non-negative hashes") {
    val got = Dedup.minhashPairs(corpus, numHashes = 16, bands = 4,
        minEst = 0.6, scheme = Dedup.md5Scheme).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.get((1L, 10L)).contains(1.0), s"identical pair: $got")
    val sigs = Dedup.minhashSignatures(corpus, 16, Dedup.md5Scheme)
      .collect().flatMap(_.getSeq[Long](1))
    assert(sigs.forall(s => s >= 0 && s < (1L << 60)),
      "md5-scheme slot hashes must stay in the non-negative 60-bit range " +
        "DuckDB replicates")
  }

  test("md5 simhash twin: identical docs at hamming 0; fingerprints stay " +
      "in the non-negative 60-bit range DuckDB replicates") {
    val got = Dedup.simhash60Md5Pairs(corpus, maxId = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got.get((1L, 10L)).contains(0), s"identical pair: $got")
  }

  test("minhash is deterministic across runs") {
    def run() = Dedup.minhashPairs(corpus, 64, 16, 0.5).collect().toSeq
    assert(run() == run())
  }

  test("minhash signatures are invariant under repartitioning (min is " +
      "order-insensitive)") {
    def sigs(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashSignatures(df, 32).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val a = sigs(corpus)
    val b = sigs(corpus.repartition(7))
    assert(a == b)
  }

  test("simhash128 is invariant under repartitioning (bit sums are " +
      "order-insensitive)") {
    def fps(df: DataFrame) = Dedup.simhash128(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fps(corpus) == fps(corpus.repartition(7)))
  }

  test("exactKeepMin keeps exactly the min-id row per duplicate group") {
    val out = Dedup.exactKeepMin(corpus, col("text"), col("doc_id"))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L) && !ids.contains(10L))
    assert(out.count() == 9) // 10 docs, one exact-dup pair collapsed
  }

  test("exactKeepMin emits a single survivor even when ids tie") {
    val tied = Seq((1L, "same text"), (1L, "same text"), (2L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exactKeepMin(tied, col("text"), col("doc_id"))
    assert(out.count() == 2,
      "duplicate ids in one group must still collapse to one survivor")
  }

  test("exact dedup drops full duplicates") {
    assert(Dedup.exact(corpus, Seq("text")).count() == 9)
  }

  test("connectedComponents: transitive closure over disjoint groups") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 10L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      8L -> 8L, 9L -> 8L, 10L -> 8L))
  }

  test("connectedComponents: converges on a long chain (multi-iteration " +
      "label propagation)") {
    // path 0-1-2-...-12: min label must travel the full diameter
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 13 && got.values.forall(_ == 0L),
      s"all chain nodes must label 0: $got")
  }

  test("connectedComponents property: agrees with union-find on seeded " +
      "random graphs") {
    val rnd = new scala.util.Random(123)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(25)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = parent.keys.map(k => k -> find(k)).toMap
      assert(got == expect, s"trial $trial: got=$got expect=$expect")
    }
  }

  test("connectedComponents pointerJump: a 40-node chain converges within " +
      "O(log n) rounds where plain propagation exceeds the same maxIter") {
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(chain, maxIter = 10,
        pointerJump = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 41 && got.values.forall(_ == 0L),
      s"all chain nodes must label 0: $got")
    // the same budget with jumping disabled must fail loudly, not
    // mislabel (autoJumpAfter > maxIter turns the auto-switch off)
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 10, autoJumpAfter = 11)
    }
  }

  test("connectedComponents auto-switches to pointer jumping when the " +
      "graph outlives the near-clique fast path") {
    // diameter 120 >> maxIter 20: plain propagation can't converge, so
    // success in 20 rounds proves the auto-switch engaged
    val chain = (0L until 120L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(chain, maxIter = 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 121 && got.values.forall(_ == 0L),
      s"all chain nodes must label 0: $got")
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 20, autoJumpAfter = 21)
    }
  }

  test("connectedComponents pointerJump property: agrees with union-find " +
      "on seeded random graphs") {
    val rnd = new scala.util.Random(321)
    for (trial <- 1 to 2) {
      val edges = Seq.fill(25)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"),
          pointerJump = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = parent.keys.map(k => k -> find(k)).toMap
      assert(got == expect, s"trial $trial: got=$got expect=$expect")
    }
  }

  test("connectedComponents agrees with brute-force closure on the " +
      "engineered corpus's exact pairs") {
    val pairs = Dedup.exactJaccardPairs(corpus, maxId = 100, threshold = 0.6)
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: union-find over the same pairs
    val es = pairs.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = parent.keys.map(k => k -> find(k)).toMap
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("dropNearDuplicates keeps min-id survivors of near-dup pairs") {
    val ids = Dedup.dropNearDuplicates(corpus, minEst = 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(10L), "exact dup of doc 1 must drop")
    assert(ids.contains(1L), "min-id survivor must stay")
    assert(Set(5L, 6L, 7L, 8L, 9L).subsetOf(ids), "distinct docs stay")
  }

  test("dedup_source_overlap: exact replay of the pairwise token-set " +
      "Jaccard matrix; every source pair present exactly once") {
    val got = graft.SparkEntry.queries("dedup_source_overlap")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val sets = graft.Tables.load(spark, sfDir, "documents")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
      .groupBy(_._1)
      .map { case (src, rows) =>
        // split limit -1: Spark/DuckDB regex-split semantics (trailing
        // empties kept), matching the query's tokenization exactly
        src -> rows.flatMap(_._2.split("\\s+", -1)).toSet
      }
    val srcs = sets.keys.toSeq.sorted
    val expect = (for {
      (a, ia) <- srcs.zipWithIndex; b <- srcs.drop(ia + 1)
      inter = (sets(a) & sets(b)).size.toLong if inter > 0
      na = sets(a).size.toLong; nb = sets(b).size.toLong
    } yield (a, b) ->
      (inter, na, nb, inter * 1000000L / (na + nb - inter))).toMap
    assert(got == expect)
    // on this corpus every source pair shares at least one token, so
    // the matrix is the full C(S,2)
    assert(got.size == srcs.size * (srcs.size - 1) / 2)
  }

  test("minhashPairsAgainstSigs (r15, the streaming near-dup stage): " +
      "equals minhashPairs restricted to the new side — one banding " +
      "algebra, so stream and batch can never bucket differently — " +
      "and the pair plan stays within its exchange budget") {
    import spark.implicits._
    // 60-token docs with per-doc vocab; engineered near-pairs: 100 is
    // a one-token edit of old doc 3, 101 an exact copy of old doc 7,
    // 104 a one-token edit of NEW doc 103 (the within-batch case)
    def toks(id: Long) = (0 until 60).map(j => s"d${id}w$j")
    def text(ts: Seq[String]) = ts.mkString(" ")
    val old = (0L until 10L).map(id => (id, text(toks(id))))
    val fresh = Seq(
      (100L, text(toks(3).dropRight(1) :+ "edited")),
      (101L, text(toks(7))),
      (102L, text(toks(102L))),
      (103L, text(toks(103L))),
      (104L, text(toks(103L).dropRight(1) :+ "edited")))
    val allDf = (old ++ fresh).toDF("doc_id", "text")
    val freshDf = fresh.toDF("doc_id", "text")
    spark.catalog.clearCache()
    val pairs = graft.operators.Dedup.minhashPairsAgainstSigs(
      graft.operators.Dedup.minhashSignatures(allDf),
      graft.operators.Dedup.minhashSignatures(freshDf))
    // collect() executes THIS dataset's own QueryExecution so the
    // shuffle metrics below land on the measured plan (the
    // PlanBudgetSpec discipline)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.operators.Dedup.minhashPairs(allDf)
      .where(col("doc_b") >= 100L)
      .select(col("doc_b"), col("doc_a"))
      .as[(Long, Long)].collect().toSet
    assert(got == want, s"sig-level and doc-level pair sets diverged: " +
      s"$got vs $want")
    assert(Set((100L, 3L), (101L, 7L), (104L, 103L)).subsetOf(got),
      s"every engineered near-pair must surface (cross-side AND " +
        s"within-batch): $got")
    assert(!got.exists(_._1 == 102L), s"the unique doc pairs with " +
      s"nothing: $got")
    // exchange budget (measured 2 at spec scale — small sides
    // broadcast; the ceiling leaves room for the shuffle-join form
    // while still catching an all-pairs or corpus-window creep):
    // band explode + candidate equijoin + two sig re-attach joins
    val m = graft.Metrics.shuffleSummary(pairs)
    info(s"minhashPairsAgainstSigs: $m")
    assert(m.exchanges <= 8,
      s"the streaming near-dup pair plan grew a shuffle: $m")

    // r16: the PRE-BANDED path (what the durable stream runs against
    // its persisted band table) is pair-identical — banding once at
    // signing time and storing rows changes nothing but the read cost
    val sigAll = graft.operators.Dedup.minhashSignatures(allDf)
      .localCheckpoint()
    val sigNew = graft.operators.Dedup.minhashSignatures(freshDf)
      .localCheckpoint()
    val cand = graft.operators.Dedup.minhashCandidatesBanded(
      graft.operators.Dedup.bandedSignatures(sigAll),
      graft.operators.Dedup.bandedSignatures(sigNew))
    val banded = graft.operators.Dedup
      .minhashPairsFromCandidates(cand, sigNew, sigAll)
      .select("doc_new", "doc_old")
      .as[(Long, Long)].collect().toSet
    assert(banded == got,
      s"pre-banded and re-banding paths diverged: $banded vs $got")
  }

  test("near-dup threshold constants are SHARED between the batch " +
      "queries and the streaming stage (r15 verdict #4): one named " +
      "definition, pinned here — a drifted default would silently " +
      "change the continuous corpus while every parity fixture still " +
      "passed, since fixtures sit far from the threshold") {
    // the values the registered pipeline_drop_near_dups family and
    // crawlPrepareStream both inherit (neither passes overrides)
    assert(graft.operators.Dedup.NearDupNumHashes == 64)
    assert(graft.operators.Dedup.NearDupBands == 16)
    assert(graft.operators.Dedup.NearDupMinEst == 0.8)
    // and the banding invariant they must satisfy
    assert(graft.operators.Dedup.NearDupNumHashes %
      graft.operators.Dedup.NearDupBands == 0)
  }

  test("SKEW GUARD (r17): on an engineered boilerplate corpus — one " +
      "(band, bh) shared by thousands of docs — the guarded candidate " +
      "join produces EXACTLY the unguarded pairs while the largest " +
      "post-salt group shrinks to ~hotGroup/salts, and cold keys " +
      "bypass the salted path untouched") {
    // synthetic banded tables (the guard operates on (doc_id, band,
    // bh) rows directly): 2000 index docs share ONE hot band hash —
    // the boilerplate cluster — plus scattered cold keys
    val hotOld = (0L until 2000L).map(i => (i, 0, 777L))
    val coldOld = (0L until 200L).map(i => (i, 1, 1000L + i % 50))
    val bandedOld = (hotOld ++ coldOld).toDF("doc_id", "band", "bh")
    val hotNew = (2000L until 2040L).map(i => (i, 0, 777L))
    val coldNew = (2000L until 2040L).map(i => (i, 1, 1000L + i % 50))
    val bandedNew = (hotNew ++ coldNew).toDF("doc_id", "band", "bh")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val threshold = 100
    val salts = 8
    val want = pairs(graft.operators.Dedup
      .minhashCandidatesBanded(bandedOld, bandedNew))
    val got = pairs(graft.operators.Dedup
      .minhashCandidatesBandedGuarded(bandedOld, bandedNew,
        hotThreshold = threshold, salts = salts))
    assert(got == want,
      s"the guard must never change pair output: ${got.size} vs " +
        s"${want.size}")
    assert(want.size >= 2000 * 40,
      "the fixture must actually be quadratic on the hot key")
    // THE skew pin: the hot key's post-salt groups are bounded by
    // ~hotGroup/salts (2× slack for hash non-uniformity), vs the
    // single 2000-row group the unguarded shuffle would build
    val groupSizes = bandedOld
      .where(col("band") === 0 && col("bh") === 777L)
      .withColumn("__salt",
        pmod(xxhash64(col("doc_id")), lit(salts)).cast("int"))
      .groupBy("__salt").count().as[(Int, Long)].collect().toMap
    assert(groupSizes.size == salts,
      s"every salt must receive work: $groupSizes")
    assert(groupSizes.values.max <= 2L * 2000L / salts,
      s"max post-salt group must shrink to ~1/salts: $groupSizes")
    // default threshold (4096) classifies this fixture as cold — the
    // guarded join still equals the unguarded one (pure passthrough)
    assert(pairs(graft.operators.Dedup
      .minhashCandidatesBandedGuarded(bandedOld, bandedNew)) == want)
  }
}
