package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Text-analysis queries: hand-computed expectations on tiny inputs, run
  * through the same registered query entry points the driver uses.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("text_stats: schema and hand-checked row") {
    val df = run("text_stats")
    assert(df.columns.toSeq ==
      Seq("doc_id", "n_tokens", "n_types", "n_letters", "avg_tok_len"))
    val r = df.head()
    assert(r.getInt(1) >= r.getInt(2), "types cannot exceed tokens")
  }

  test("text_langid labels an obviously-English and a German sentence") {
    import org.apache.spark.sql.functions._
    val tiny = Seq(
      (1L, "the cat is a friend of the dog and the bird"),
      (2L, "der hund und die katze das ist gut"),
      (3L, "zzz qqq 123")).toDF("doc_id", "text")
    val out = TextAnalysis.langid(tiny).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
  }

  test("qualityScore: hand-computed ratios and keep label") {
    val tiny = Seq(
      (1L, "the cat sat on a mat with it"),   // 8 tokens, stopwords, no punct
      (2L, "x! y! z!")).toDF("doc_id", "text") // 3 tokens, punct-heavy
    val out = TextAnalysis.qualityScore(tiny).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Int]("n_tokens") == 8)
    assert(r1.getAs[Int]("n_stopwords") == 4) // the, a, with, it
    assert(r1.getAs[Int]("n_punct") == 0)
    assert(r1.getAs[Boolean]("keep"))
    val r2 = out(2L)
    assert(r2.getAs[Int]("n_punct") == 3)
    assert(!r2.getAs[Boolean]("keep")) // too short, no stopwords, puncty
  }

  test("q_approx_distinct: HLL estimate within 5% of exact") {
    import org.apache.spark.sql.functions._
    val exact = graft.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    run("q_approx_distinct").collect().foreach { r =>
      val rf = r.getString(0); val approx = r.getLong(1)
      val e = exact(rf)
      assert(math.abs(approx - e).toDouble / e < 0.05,
        s"$rf: approx $approx vs exact $e")
    }
  }

  test("text_fingerprint: identical normalized text => identical digest") {
    val df = run("text_fingerprint")
    assert(df.columns.toSeq == Seq("doc_id", "fp", "norm_len"))
    assert(df.count() > 0)
  }

  test("bigramRows is short-doc-safe: empty and 1-token docs produce no " +
      "rows instead of an ANSI array-index error") {
    val tiny = Seq((1L, ""), (2L, "solo"), (3L, "two words"),
      (4L, "a b a b")).toDF("doc_id", "text")
    val occ = TextAnalysis.bigramRows(tiny, distinctPerDoc = false)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(!occ.exists(r => r._1 == 1L || r._1 == 2L),
      "sub-2-token docs must contribute nothing")
    assert(occ.count(_._1 == 3L) == 1 && occ.count(_._1 == 4L) == 3)
    val dist = TextAnalysis.bigramRows(tiny, distinctPerDoc = true)
      .collect().filter(_.getLong(0) == 4L).map(_.getString(1)).sorted
    assert(dist.toSeq == Seq("a b", "b a"))
  }

  test("text_tokens_bpeish counts character classes correctly on a " +
      "hand-computed line") {
    val tiny = Seq((1L, "Abc de-12 f!")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeishTokens(tiny).head()
    // lower: "abc de-12 f!" => alpha runs: abc, de, f = 3; num runs: 12 = 1;
    // other (non-alnum, non-space): '-','!' = 2
    assert(r.getInt(1) == 3 && r.getInt(2) == 1 && r.getInt(3) == 2)
  }

  test("text_char_entropy: golden values — uniform string hits " +
      "log2(alphabet), single-char string is 0 bits") {
    val rows = graft.SparkEntry.queries("text_char_entropy")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nDistinct = r.getLong(2).toDouble
      val ent = r.getDouble(3)
      // 0 <= H <= log2(n_distinct), the information-theoretic bounds
      assert(ent >= 0 && ent <= math.log(nDistinct) / math.log(2) + 1e-9,
        s"doc ${r.getLong(0)}: entropy $ent out of bounds")
    }
    // hand-built docs: "aaaa" -> 0 bits; "abab" -> exactly 1 bit
    val tiny = Seq((1L, "aaaa"), (2L, "abab")).toDF("doc_id", "text")
    val freq = tiny
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .where(col("ch") =!= "")
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("cnt"))
      .collect().groupBy(_.getLong(0))
    def h(cnts: Seq[Long]): Double = {
      val n = cnts.sum.toDouble
      -cnts.map(c => c / n * math.log(c / n)).sum / math.log(2)
    }
    assert(h(freq(1L).map(_.getLong(2)).toSeq) == 0.0)
    assert(math.abs(h(freq(2L).map(_.getLong(2)).toSeq) - 1.0) < 1e-12)
  }

  test("pipeline_strip_stopwords: kept+dropped = token count, clean_text " +
      "is the in-order subsequence of non-stopword tokens") {
    val rows = run("pipeline_strip_stopwords").collect()
    assert(rows.nonEmpty)
    // independent replay: recompute docfreq and the threshold driver-side
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val nDocs = docs.length
    // split with limit -1: Spark SQL's split / DuckDB's
    // string_split_regex keep trailing empty tokens; Java's default
    // limit 0 drops them, which would diverge on trailing whitespace
    val docfreq = docs.flatMap { case (_, t) => t.split("\\s+", -1).distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.length }
    def stop(tok: String) = docfreq(tok) * 10 >= nDocs * 8
    val byId = docs.toMap
    rows.foreach { r =>
      val (id, nKept, nDropped, clean) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))
      val toks = byId(id).split("\\s+", -1)
      assert(nKept + nDropped == toks.length, s"doc $id: count mismatch")
      val expected = toks.filterNot(stop).mkString(" ")
      assert(clean == expected, s"doc $id: reassembly diverges")
    }
    // the filter must actually fire on this corpus, and not degenerate
    // to dropping everything (both are corpus-level, not per-doc: a
    // single doc made entirely of stopwords legitimately keeps nothing)
    assert(rows.exists(_.getInt(2) > 0), "no stopwords were stripped")
    assert(rows.exists(_.getInt(1) > 0), "every document lost every token")
  }

  test("text_bigram_logprob: driver-side LM replay agrees, scores are " +
      "negative log-probs bounded by the vocabulary information content") {
    val rows = run("text_bigram_logprob").collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val allBigrams = docs.flatMap { case (id, t) =>
      // limit -1 matches Spark SQL / DuckDB split semantics (trailing
      // empty tokens kept)
      val toks = t.split("\\s+", -1)
      toks.sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1)))
    }
    val c2 = allBigrams.groupBy(b => (b._2, b._3)).map { case (k, xs) =>
      k -> xs.length }
    val c1 = allBigrams.groupBy(_._2).map { case (k, xs) => k -> xs.length }
    val byDoc = allBigrams.groupBy(_._1)
    rows.foreach { r =>
      val (id, n, avg) = (r.getLong(0), r.getInt(1), r.getDouble(2))
      val bs = byDoc(id)
      assert(n == bs.length, s"doc $id: bigram count mismatch")
      val replay = bs.map { case (_, a, b) =>
        math.log(c2((a, b)).toDouble / c1(a)) / math.log(2)
      }.sum / bs.length
      // engines fold the log terms in different orders; the repo rounds
      // to 4 decimals for display, so allow one ulp at that precision
      assert(math.abs(replay - avg) <= 1e-4 + 1e-9,
        s"doc $id: avg_logp $avg vs replay $replay")
      assert(avg <= 0.0, s"doc $id: a log-probability must be <= 0")
    }
  }

  test("stripCorpusStopwords / bigramLogprob: edge-case corpora " +
      "(trailing whitespace, empty text, single tokens, all-stopword " +
      "docs) agree with a limit(-1)-split driver replay") {
    // hand-built corpus hitting the seams: trailing space (SQL split
    // keeps the empty token), empty text (one empty token), 1-token doc
    // (no bigrams), a doc made entirely of the dominant token
    val corpus = Seq(
      (1L, "x xx y"), (2L, "x z "), (3L, ""), (4L, "x"),
      (5L, "x x x"), (6L, "x w y x"))
      .toDF("doc_id", "text")
    val n = 6
    val docfreq = Seq("x xx y", "x z ", "", "x", "x x x", "x w y x")
      .flatMap(_.split("\\s+", -1).distinct)
      .groupBy(identity).map { case (t, xs) => t -> xs.size }
    def stop(t: String) = docfreq(t) * 2 >= n * 1 // num=1, den=2: df>=50%
    val stripped = TextAnalysis.stripCorpusStopwords(corpus, 1, 2)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(stripped.keySet == (1L to 6L).toSet)
    for ((id, text) <- Seq(1L -> "x xx y", 2L -> "x z ", 3L -> "",
        4L -> "x", 5L -> "x x x", 6L -> "x w y x")) {
      val toks = text.split("\\s+", -1)
      val kept = toks.filterNot(stop)
      val (nk, nd, clean) = stripped(id)
      assert(nk == kept.length && nd == toks.length - kept.length,
        s"doc $id counts")
      assert(clean == kept.mkString(" "), s"doc $id: '$clean'")
    }
    // doc 5 is all-x (dominant token): correctly loses everything
    assert(stripped(5L)._1 == 0 && stripped(5L)._3 == "")

    val lm = TextAnalysis.bigramLogprob(corpus).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // docs 3 ("" -> one empty token) and 4 (one token) have no bigrams
    assert(lm.keySet == Set(1L, 2L, 5L, 6L))
    val allBg = Seq("x xx y", "x z ", "x x x", "x w y x")
      .map(_.split("\\s+", -1)).flatMap(t => t.sliding(2).map(p => (p(0), p(1))))
    val c2 = allBg.groupBy(identity).map { case (k, v) => k -> v.size }
    val c1 = allBg.groupBy(_._1).map { case (k, v) => k -> v.size }
    for ((id, text) <- Seq(1L -> "x xx y", 2L -> "x z ", 5L -> "x x x",
        6L -> "x w y x")) {
      val bs = text.split("\\s+", -1).sliding(2).map(p => (p(0), p(1))).toSeq
      val replay = bs.map { b =>
        math.log(c2(b).toDouble / c1(b._1)) / math.log(2) }.sum / bs.size
      val (nb, avg) = lm(id)
      assert(nb == bs.size, s"doc $id bigram count")
      assert(math.abs(avg - replay) <= 1e-4 + 1e-9, s"doc $id: $avg vs $replay")
    }
  }

  test("text_top_tokens_by_lang: two-phase top-K equals the naive " +
      "single-window rank, and ranks are contiguous from 1") {
    val rows = run("text_top_tokens_by_lang").collect()
    assert(rows.nonEmpty)
    // naive single-window form over the same counts
    val naive = graft.Tables.load(spark, sfDir, "documents")
      .select(col("lang"), explode(split(col("text"), "\\s+")).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("n").desc, col("tok"))))
      .where(col("rnk") <= 10)
      .select("lang", "tok", "n", "rnk")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    val got = rows.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getInt(3))).toSet
    assert(got == naive, "two-phase top-K diverges from the naive form")
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length),
        s"$lang: ranks not contiguous")
    }
  }

  test("docKeywords: plain-Scala tf/df reconstruction agrees on a " +
      "synthetic corpus; df cap drops corpus-wide tokens") {
    import spark.implicits._
    // "the"/"common" in every doc (df=10 > 0.9·10) → capped out;
    // "half" in 5 docs → kept; uniq$i per-doc → kept with top tf
    val corpus = (0L until 10L).map { i =>
      val half = if (i < 5) " half" else ""
      (i, s"the common$half uniq$i uniq$i uniq$i the")
    }
    val d = corpus.toDF("doc_id", "text").repartition(3)
    val got = TextAnalysis.docKeywords(d, k = 3)
      .orderBy("doc_id", "rk")
      .select("doc_id", "rk", "tok", "tf", "df")
      .as[(Long, Int, String, Long, Long)].collect()
    // reconstruct: tf per (doc, tok), df per tok, cap, rank
    val tf = corpus.flatMap { case (i, t) =>
      t.split("\\s+").groupBy(identity).map { case (w, o) =>
        (i, w, o.length.toLong) }
    }
    val df_ = tf.groupBy(_._2).map { case (w, rs) => w -> rs.size.toLong }
    val n = corpus.size.toLong
    val exp = tf.filter { case (_, w, _) => df_(w) * 10 <= n * 9 }
      .groupBy(_._1).toSeq.flatMap { case (id, rs) =>
        rs.sortBy { case (_, w, c) => (-c, df_(w), w) }.take(3)
          .zipWithIndex.map { case ((_, w, c), j) =>
            (id, j + 1, w, c, df_(w)) }
      }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == exp)
    assert(!got.exists(r => r._3 == "the" || r._3 == "common"),
      "corpus-wide token survived the cap")
    // per-doc unique token (tf=3) outranks the shared "half" (tf=1)
    assert(got.filter(_._1 == 0L).map(_._3).toSeq == Seq("uniq0", "half"))
    assert(got.filter(_._1 == 9L).map(_._3).toSeq == Seq("uniq9"))
  }

  test("rareNgramIndex equals the naive groupBy form on a seeded corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val words = Seq("a", "b", "c", "d", "e")
    val corpus = (0L until 60L).map { i =>
      (i, (0 to 3 + rnd.nextInt(8))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }
    val d = corpus.toDF("doc_id", "text").repartition(5)
    val got = TextAnalysis.rareNgramIndex(d, n = 3, maxDf = 4)
      .as[(String, Long, String)].collect().sortBy(_._1).toSeq
    // naive reconstruction
    val pairs = corpus.flatMap { case (id, t) =>
      val a = t.split("\\s+")
      a.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
        .map((g: String) => (g, id))
    }
    val exp = pairs.groupBy(_._1).toSeq.collect {
      case (g, rs) if rs.size <= 4 =>
        (g, rs.size.toLong, rs.map(_._2).sorted.mkString(" "))
    }.sortBy(_._1)
    assert(got == exp)
  }

  test("rareNgramIndex: the Zipf-head drop engages above MinHotCount " +
      "and never loses a rare gram") {
    import spark.implicits._
    // 4500 docs sharing one gram (>= the 4096 hot floor -> dropped
    // before the posting shuffle); every 900th doc adds a rare gram
    val corpus = (0L until 4500L).map { i =>
      val rare = if (i % 900 == 0) s" uniq${i / 900} tail gram" else ""
      (i, s"hot head gram$rare")
    }
    val d = corpus.toDF("doc_id", "text").repartition(8)
    val got = TextAnalysis.rareNgramIndex(d, n = 3, maxDf = 5)
      .as[(String, Long, String)].collect()
    assert(!got.exists(_._1 == "hot head gram"))
    // each doc with the rare suffix contributes 4 distinct grams
    // (sliding over 6 tokens), each df=1 except "tail gram" pieces
    val uniq0 = got.filter(_._1.startsWith("uniq0"))
    assert(uniq0.nonEmpty && uniq0.forall(_._3 == "0"))
    assert(got.forall(_._2 <= 5))
  }

  test("pipeline_feature_hash: buckets bounded, per-doc tf mass equals " +
      "the doc's token count, equal tokens collide deterministically") {
    val rows = SparkEntry.queries("pipeline_feature_hash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._2 >= 0 && r._2 < 1024))
    val mass = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val tokCounts = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mass == tokCounts,
      "hashing must conserve token mass (no token lost or double-counted)")
    // determinism: the same literal token hashes to the same bucket in a
    // fresh frame (the property downstream models rely on across runs)
    import spark.implicits._
    val b = Seq((1L, "alpha alpha beta"), (2L, "alpha"))
      .toDF("doc_id", "text")
    val fh = b.select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
          % 1024).as("bucket"))
      .groupBy("doc_id", "bucket").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val alphaBuckets = fh.filter(_._3 == 2) // doc 1's double "alpha"
    assert(alphaBuckets.length == 1 &&
      fh.exists(r => r._1 == 2L && r._2 == alphaBuckets.head._2))
  }

  test("text_gopher_rules: keep is the AND of the four gates, every " +
      "gate both fires and fails on a hostile corpus, wlen replay") {
    // the registered corpus satisfies g_wlen/g_sym wholesale, so gate
    // discrimination is asserted on a hand-built corpus instead
    val hostile = Seq(
      (1L, ("the a of " + Seq.fill(30)("word").mkString(" "))), // keeps
      (2L, "the a"),                                   // too few words
      (3L, Seq.fill(30)("ab").mkString(" ")),          // words too short
      (4L, ("the a " + Seq.fill(30)("### ...").mkString(" "))), // symbols
      (5L, Seq.fill(30)("word").mkString(" ")))        // no stopwords
      .toDF("doc_id", "text")
    val rows = TextAnalysis.gopherRules(hostile).collect()
    val byId = rows.map(r => r.getLong(0) ->
      (r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
        r.getBoolean(9))).toMap
    assert(byId(1L) == ((true, true, true, true, true)))
    assert(!byId(2L)._1 && !byId(2L)._5)
    assert(!byId(3L)._2 && !byId(3L)._5)
    assert(!byId(4L)._3 && !byId(4L)._5)
    assert(!byId(5L)._4 && !byId(5L)._5)
    // registered corpus: keep == AND of gates, exact wlen arithmetic
    val reg = run("text_gopher_rules").collect()
    assert(reg.forall(r => r.getBoolean(9) ==
      (r.getBoolean(5) && r.getBoolean(6) && r.getBoolean(7) &&
        r.getBoolean(8))))
    assert(reg.exists(r => r.getBoolean(9)) &&
      reg.exists(r => !r.getBoolean(9)), "corpus not discriminated")
  }

  test("pipeline_dsir_weights: token mass conserves and the en slice " +
      "outweighs the rest (importance weighting points at the target)") {
    val rows = run("pipeline_dsir_weights").collect()
    val d = graft.Tables.load(spark, sfDir, "documents")
    val totalToks = d.select(size(split(col("text"), "\\s+")).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == totalToks)
    // per-token mean importance, en vs rest
    val langs = d.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def meanPerTok(p: String => Boolean) = {
      val rs = rows.filter(r => p(langs(r.getLong(0))))
      rs.map(_.getLong(2)).sum.toDouble / rs.map(_.getLong(1)).sum
    }
    assert(meanPerTok(_ == "en") > meanPerTok(_ != "en"),
      "en documents should carry higher importance under an en target")
  }

  test("text_dup_spans: exact driver replay of duplicated 8-token-window " +
      "coverage (corpus-wide counts, interval union of overlapping " +
      "windows); fixture actually contains duplicated spans") {
    val got = run("text_dup_spans").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val docsL = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+"))
    val counts = scala.collection.mutable.Map.empty[String, Int]
        .withDefaultValue(0)
    for ((_, ts) <- docsL; p <- 0 to ts.length - 8)
      counts(ts.slice(p, p + 8).mkString(" ")) += 1
    val expect = docsL.map { case (id, ts) =>
      val covered = (for {
        p <- 0 to ts.length - 8
        if counts(ts.slice(p, p + 8).mkString(" ")) > 1
        pos <- p to p + 7
      } yield pos).toSet
      id -> ((ts.length.toLong, covered.size.toLong,
        covered.size.toLong * 1000000L / ts.length))
    }.toMap
    assert(got == expect)
    assert(expect.values.exists(_._2 > 0),
      "fixture has no duplicated spans — replay proves nothing")
    assert(expect.values.exists(v => v._2 < v._1),
      "every token duplicated — coverage union untested")
  }

  test("text_langid_confusion: cell counts conserve the corpus, row " +
      "masses floor-sum to one million, and the matrix agrees with " +
      "text_langid's per-doc predictions exactly") {
    val cells = run("text_langid_confusion").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val d = graft.Tables.load(spark, sfDir, "documents")
    assert(cells.values.map(_._1).sum == d.count())
    cells.groupBy(_._1._1).foreach { case (_, g) =>
      val ppm = g.values.map(_._2).sum
      assert(ppm <= 1000000L && ppm > 1000000L - g.size)
    }
    // cross-query consistency: aggregate text_langid's per-doc labels
    // against ground truth and compare cell-for-cell
    val truth = d.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = run("text_langid").collect()
      .map(r => (truth(r.getLong(0)), r.getString(5)))
    val replay = perDoc.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    assert(cells.view.mapValues(_._1).toMap == replay)
  }

  test("text_vocab_coverage: exact driver replay of the Zipf-head " +
      "coverage curve; monotone in cutoff and bounded by the total") {
    val got = run("text_vocab_coverage").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == Set(10, 100, 1000))
    val toks = graft.Tables.load(spark, sfDir, "documents")
      .select("text").collect().flatMap(_.getString(0).split("\\s+"))
    val counts = toks.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case (t, n) => (-n, t) }
    val total = counts.map(_._2).sum
    for ((cutoff, (covered, tot, ppm)) <- got) {
      val expect = counts.take(cutoff).map(_._2).sum
      assert(tot == total && covered == expect &&
        ppm == covered * 1000000L / total,
        s"cutoff $cutoff: got ($covered, $tot, $ppm), expect $expect")
    }
    assert(got(10)._1 <= got(100)._1 && got(100)._1 <= got(1000)._1)
    // the synthetic vocab is small (top-1000 covers it all at sf0.001);
    // the top-10 point must still be a strict subset or the curve is
    // degenerate and the ranking untested
    assert(got(10)._1 < total,
      "top-10 covering everything — fixture vocab too small to test")
  }

  test("count-min estimates are one-sided and the est>=tau candidate " +
      "set is a bounded SUPERSET of the true hot set on a Zipf corpus") {
    // Zipf-ish corpus: token z_k appears floor(2000/k) times, 200 ranks
    val rows = for (k <- 1 to 200; _ <- 1 to (2000 / k)) yield s"z$k"
    val toks = rows.toDF("tok")
    val cells = TextAnalysis.cmsCells(toks)
    val truth = toks.groupBy("tok").agg(count(lit(1)).as("n"))
    val est = TextAnalysis.cmsEstimates(truth.select("tok"), cells)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = truth.collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap
    // structural one-sidedness: every bucket sum contains the token's
    // own occurrences, so est >= true for EVERY token
    for ((t, n) <- exact)
      assert(est(t) >= n, s"$t: est ${est(t)} < true $n")
    // candidate generation at the true top-20 threshold: the est>=tau
    // set must contain every truly-hot token (follows from
    // one-sidedness) and stay bounded (collisions at 4x1024 cells are
    // rare), never degenerating to the whole vocabulary
    val tau = exact.values.toSeq.sortBy(-_).take(20).min
    val trueHot = exact.collect { case (t, n) if n >= tau => t }.toSet
    val cand = est.collect { case (t, e) if e >= tau => t }.toSet
    assert(trueHot.subsetOf(cand),
      s"missed hot tokens: ${trueHot -- cand}")
    assert(cand.size <= trueHot.size * 3 && cand.size < exact.size,
      s"candidate set degenerated: ${cand.size} of ${exact.size}")
  }

  test("canonicalization: two non-NFC-equal encodings of one text dedup " +
      "together ONLY through the canonical path") {
    val precomposed = "caf\u00e9 rocks"          // é as U+00E9
    val decomposed = "cafe\u0301 rocks"          // e + combining U+0301
    val punct = "caf\u00e9,  rocks!!"            // same text, dirty form
    val d = Seq((1L, precomposed), (2L, decomposed), (3L, punct),
      (4L, "unrelated text"))
      .toDF("doc_id", "text")
    // raw exact dedup misses all three: they hash apart
    val rawKept = Dedup.exactKeepMin(d, col("text"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rawKept == Set(1L, 2L, 3L, 4L),
      s"raw dedup should keep all (no two texts byte-equal): $rawKept")
    // through the canonical front, all three collapse onto doc 1
    val canonKept = Dedup.exactKeepMin(d,
        TextAnalysis.canonicalCol(), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(canonKept == Set(1L, 4L),
      s"canonical dedup should keep the min copy + the stranger: $canonKept")
    // and the composable form feeds the shingle/window builders
    val canon = TextAnalysis.canonicalized(d)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(canon(1L) == canon(2L) && canon(2L) == canon(3L))
    assert(canon(1L) == "caf\u00e9 rocks")
  }

  test("nfc_normalize: ASCII fast path is identity, non-NFC input " +
      "composes, SQL registration works with codegen") {
    import graft.functions.NfcNormalize
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = UTF8String.fromString("plain ascii")
    assert(NfcNormalize.nfc(ascii) eq ascii)   // no copy on the fast path
    assert(NfcNormalize.nfc(UTF8String.fromString("cafe\u0301")).toString
      == "caf\u00e9")
    // already-NFC non-ASCII: returned unchanged
    val nfc = UTF8String.fromString("caf\u00e9")
    assert(NfcNormalize.nfc(nfc) eq nfc)
    val out = spark.sql(
      "SELECT nfc_normalize('cafe\u0301') AS c").collect()(0).getString(0)
    assert(out == "caf\u00e9")
  }

  test("bloom-pruned decontamination: identical pairs, and the bloom " +
      "filter provably shrinks the gram stream entering the attach") {
    // engineered corpus: 200 train docs of doc-unique grams (nothing
    // to find), 3 train docs quoting the eval doc's phrase, 1 eval doc
    val phrase = "alpha beta gamma delta epsilon zeta eta"
    // train ids avoid the % 10 = 0 eval split (else they pass the
    // gate outright and dilute the measured prune)
    val train = (1 to 200).map(i =>
      (i * 10L + 1, s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g"))
    val leaky = Seq(3L, 7L, 9L).map(i => (i, s"intro $phrase outro"))
    val evalDoc = Seq((20L, s"heading $phrase closing"))
    val d = (train ++ leaky ++ evalDoc).toDF("doc_id", "text")
    spark.catalog.clearCache()
    val plainRows = TextAnalysis.decontaminatePairs(d)
      .orderBy("train_doc", "eval_doc").collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    val bloom = TextAnalysis
      .decontaminateBloomPairs(d, dirKey = "spec-bloom-fixture")
      .orderBy("train_doc", "eval_doc")
    val bloomRows = bloom.collect().map(_.toSeq).toSeq
    // losslessness: exact same pairs out of both plans
    assert(bloomRows == plainRows && bloomRows.nonEmpty,
      s"bloom=$bloomRows plain=$plainRows")
    assert(bloomRows.map(_.head).toSet == Set(3L, 7L, 9L))
    // the prune is REAL, measured at the operator that does it (the
    // q_zorder_prune numFiles discipline — shuffle totals cannot see
    // it here because the rarity attach broadcasts at spec scale):
    // the might_contain filter's own output is a sliver of the full
    // gram stream, because the 600 doc-unique train grams miss the
    // eval-slice bloom
    val filters = graft.Metrics.executedNodes(bloom).collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("might_contain") => f
    }
    assert(filters.nonEmpty, "bloom filter node missing from the plan")
    val kept = filters.map(_.metrics("numOutputRows").value).max
    val total = TextAnalysis.ngramRows(d, 5, distinctPerDoc = true).count()
    info(s"gram stream: $total total, $kept past the bloom")
    assert(kept * 10 <= total,
      s"bloom kept $kept of $total gram rows — pruning did nothing")
  }

  test("multi-suite decon (r16): restricted to one suite the " +
      "suite-attributed flag equals the single-plane flag, and a doc " +
      "quoting TWO suites reports both attributions") {
    val pa = "alpha beta gamma delta epsilon zeta eta"
    val pb = "one two three four five six seven"
    val evals = Seq(
      (1000L, "suite_a", s"heading $pa closing"),
      (2000L, "suite_b", s"heading $pb closing"))
      .toDF("doc_id", "eval_suite", "text")
    val train = Seq(
      (3L, s"intro $pa outro"),               // suite_a leak
      (7L, s"intro $pb outro"),               // suite_b leak
      (9L, s"first $pa then also $pb after"), // BOTH suites
      (11L, "u1 u2 u3 u4 u5 u6 u7 u8"))       // clean
      .toDF("doc_id", "text")
    val plane = TextAnalysis.deconPlaneSuites(evals)
    val got = TextAnalysis.deconFlaggedSuites(train, plane)
      .as[(Long, String)].collect().toSet
    assert(got == Set((3L, "suite_a"), (7L, "suite_b"),
      (9L, "suite_a"), (9L, "suite_b")), s"$got")
    // one-suite restriction == the single-plane flag
    val oneSuite = TextAnalysis.deconPlaneSuites(
      evals.where(col("eval_suite") === "suite_a"))
    val viaSuites = TextAnalysis.deconFlaggedSuites(train, oneSuite)
      .select("doc_id").as[Long].collect().toSet
    val viaSingle = TextAnalysis.deconFlagged(train,
      TextAnalysis.deconPlane(
        evals.where(col("eval_suite") === "suite_a")
          .select("doc_id", "text")))
      .as[Long].collect().toSet
    assert(viaSuites == viaSingle && viaSingle == Set(3L, 9L),
      s"suites=$viaSuites single=$viaSingle")
  }

  test("gramBloom (r18 advice): the sized geometry builds in a " +
      "FORKED session — the calling session's bloom caps are " +
      "neither consulted nor mutated, so a concurrent query can " +
      "never observe raised caps or interleave a set/restore") {
    import spark.implicits._
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val saved = spark.conf.getOption(bitsKey)
    try {
      // a cap that would clamp the build to ~4 KB IF consulted
      spark.conf.set(bitsKey, (1L << 15).toString)
      val grams = (0 until 2000).map(i => s"gram_$i").toDF("g")
        .localCheckpoint()
      val bf = TextAnalysis.gramBloom(grams)
      // sized geometry: 2000 grams floor at 2^20 bits = 128 KB
      assert(bf.length > 100000,
        s"bloom clamped to ${bf.length} bytes — the build consulted " +
          "the calling session's caps")
      assert(spark.conf.get(bitsKey) == (1L << 15).toString,
        "the calling session's conf must never be touched")
    } finally saved match {
      case Some(v) => spark.conf.set(bitsKey, v)
      case None => spark.conf.unset(bitsKey)
    }
  }
}
