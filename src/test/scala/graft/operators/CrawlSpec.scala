package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The raw-crawl ingestion front end: framing round trips, the
  * length-prefixed-beats-delimiter property, resync-on-corruption
  * (the seeded-corruption discipline of the RIFF/AVI codecs), and the
  * HTML→text strip contract rule by rule.
  */
class CrawlSpec extends SparkSpec {
  import spark.implicits._

  private val recs = Seq(
    (1L, "https://a.example.org/1", "<p>one two three four five</p>"),
    (2L, "https://a.example.org/2", "<p>alpha beta gamma delta</p>"),
    (3L, "https://b.example.org/3", "<p>red green blue cyan magenta</p>"))

  test("well-formed archive round trips exactly") {
    val parsed = Crawl.parseArchive(Crawl.encodeArchive(recs))
    assert(parsed == recs)
  }

  test("a payload CONTAINING the record sentinel parses as ONE intact " +
      "record (length-prefixed framing, not delimiter splitting)") {
    val trap = (5L, "https://t.example.org/5",
      s"<p>before before before before</p>\n${Crawl.Sentinel}" +
        "id: 999\nurl: x\nlen: 0\n\n\n<p>after after after after</p>")
    val parsed = Crawl.parseArchive(Crawl.encodeArchive(Seq(recs.head, trap)))
    assert(parsed == Seq(recs.head, trap),
      "declared length must carry the walk OVER embedded sentinel bytes")
  }

  test("a truncated final payload (len overruns EOF) drops that record " +
      "and keeps every earlier one") {
    val bytes = Crawl.encodeArchive(recs)
    val cut = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 10)
    assert(Crawl.parseArchive(cut) == recs.dropRight(1))
  }

  test("a lying len lands mid-text, fails the record-boundary check, " +
      "and the parser resyncs to the NEXT record") {
    val s = new String(Crawl.encodeArchive(recs),
      java.nio.charset.StandardCharsets.US_ASCII)
    // shrink record 2's declared length (its payload is 29 bytes):
    // the payload no longer ends on a newline boundary -> rejected,
    // resync recovers record 3
    val lied = s.replaceFirst("len: 29", "len: 11")
    assert(s != lied, "fixture layout changed; update the lied length")
    val parsed = Crawl.parseArchive(
      lied.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    assert(parsed == Seq(recs(0), recs(2)))
  }

  test("a corrupted sentinel skips just that record; later records " +
      "are recovered by resync") {
    val bytes = Crawl.encodeArchive(recs)
    val s = new String(bytes, java.nio.charset.StandardCharsets.US_ASCII)
    // first sentinel after the magic belongs to record 1
    val at = s.indexOf(Crawl.Sentinel)
    bytes(at) = 'X'
    assert(Crawl.parseArchive(bytes) == recs.drop(1))
  }

  test("a garbage header block (no blank line within the cap) skips " +
      "the record without consuming the rest of the file") {
    val good = Crawl.encodeArchive(Seq(recs.head))
    val noBlank = (Crawl.FileMagic + Crawl.Sentinel +
      "id: 7\nurl: u\nlen: 4\n" + ("x" * 64)) // headers never terminate
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val glued = noBlank ++ java.util.Arrays.copyOfRange(good,
      Crawl.FileMagic.length, good.length)
    assert(Crawl.parseArchive(glued) == Seq(recs.head))
  }

  test("seeded byte-flip fuzz: the parser never throws on corrupted " +
      "archives and never emits more records than were written") {
    val base = Crawl.encodeArchive(recs)
    val rnd = new scala.util.Random(0xC0FFEE)
    (1 to 200).foreach { _ =>
      val mutated = base.clone()
      (1 to 1 + rnd.nextInt(6)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      val parsed = Crawl.parseArchive(mutated) // must not throw
      assert(parsed.size <= recs.size)
    }
  }

  test("a file without the archive magic yields no records") {
    assert(Crawl.parseArchive("PKjunkjunk".getBytes) == Nil)
    assert(Crawl.parseArchive(Array.emptyByteArray) == Nil)
  }

  test("htmlToText: block strip, tag strip, entity order, and the " +
      "boilerplate line rule, each against an engineered target") {
    val html = Seq(
      "<html>",
      "<head><title>Doc 9</title>",
      "<style>body { color: #000; }</style>",
      "<script>var s = \"</hi>\"; var x = 1 < 2;</script>",
      "</head><body>",
      "<nav>Home | About | Contact</nav>",
      "<!-- meta -->",
      "<p>alpha beta gamma delta &amp; epsilon &lt;raw&gt; zeta</p>",
      "<p>double escape &amp;lt; stays literal here okay</p>",
      "<p>tiny line</p>",
      "<div>Copyright 2026 example.org</div>",
      "</body></html>").mkString("\n")
    val out = Seq((9L, "u", html)).toDF("doc_id", "url", "html")
      .select(Crawl.htmlToText(col("html")).as("text"))
      .collect()(0).getString(0)
    assert(out ==
      "alpha beta gamma delta & epsilon <raw> zeta " +
        "double escape &lt; stays literal here okay",
      s"got: $out")
  }

  test("pipeline_crawl_prepare: the crawl front feeds the full corpus " +
      "prep — stage 0 counts every archived record, the chain is " +
      "monotone, and a packed corpus survives") {
    val rows = graft.SparkEntry
      .queries("pipeline_crawl_prepare")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val nDocs = graft.Tables.load(spark, sfDir, "documents").count()
    assert(rows("0_input") == nDocs,
      "every archived record must reach the pipeline input")
    assert(rows("1_canonicalize") == nDocs)
    val stages = Seq("1_canonicalize", "2_quality_gate",
      "3_exact_substr", "4_near_dup", "5_decontaminate")
    for (Seq(a, b) <- stages.sliding(2))
      assert(rows(b) <= rows(a), s"$b grew docs vs $a")
    assert(rows("5_decontaminate") > 0 && rows("6_pack") > 0,
      "a training corpus must survive the crawl-rooted pipeline")
  }

  test("mm_warc_media: survivors extracted from the media archives " +
      "equal mm_image_dedup's direct-plane survivors (the crawl round " +
      "trip preserves the signature plane exactly)") {
    val viaArchive = graft.SparkEntry
      .queries("mm_warc_media")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val direct = graft.SparkEntry
      .queries("mm_image_dedup")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(viaArchive == direct,
      "archive-extracted pixels must reproduce the direct dHash plane")
  }

  test("parseArchives distributes one segment per task and the " +
      "composed query equals a direct per-doc recompute") {
    Crawl.writeArchives(spark, sfDir)
    val got = Crawl.extractText(
        Crawl.parseArchives(spark, s"${Crawl.FixtureRoot}/*.garc"))
      .orderBy("doc_id")
      .select("doc_id", "text").as[(Long, String)].collect()
    val want = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .orderBy("doc_id").collect()
      .map { r =>
        val clean = r.getString(1).replaceAll("[^\\x20-\\x7e]", "")
        val words = clean.trim.split("\\s+").filter(_.nonEmpty)
        val paras = words.grouped(12).map(_.toSeq)
          .filter(_.count(_.matches("[A-Za-z]+")) >= Crawl.MinContentWords)
          .map(_.mkString(" "))
        ((r.getLong(0),
          ("alpha beta gamma delta & epsilon <raw> zeta" +: paras.toSeq)
            .mkString(" ")))
      }
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"doc ${w._1}") }
  }
}
