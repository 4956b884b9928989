package graft.operators

import graft.{Metrics, SparkSpec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** The Zipf-skew story of the token-keyed joins, proven rather than
  * asserted in comments (round-7 verdict task #2).
  *
  * FINDING, pinned by the first test: AQE's `OptimizeSkewedJoin` can
  * NEVER mitigate these joins. The rule pattern-matches a join whose
  * children are sort-over-shuffle-read directly, and a docfreq/count
  * side always carries its final HashAggregate between the sort and the
  * shuffle read — so even with the hot partition measured 6x over the
  * skew threshold, no `skew=true` appears. "Left to AQE" (the round-6
  * comment) was therefore wrong at vocab-beyond-broadcast scale, and
  * the operators now mitigate explicitly:
  *
  *   - `stripCorpusStopwords` needs no join at all — its drop set is
  *     bounded by mean doc length at ANY corpus size, so the occurrence
  *     stream never shuffles on the token key (asserted below);
  *   - `bigramLogprob` / `text_common_bigrams` /
  *     `pipeline_decontaminate` route their count attaches through
  *     [[Skew.hotSaltedJoin]], which spreads the bounded hot-key set
  *     across salt buckets (asserted below: equality with the plain
  *     join AND multi-partition spread of the hot key).
  */
class TokenJoinSkewSpec extends SparkSpec {

  /** Hot-key corpus: every doc is dominated by "the" (and therefore the
    * bigram "the the"), plus unique tail tokens per doc so the join
    * keys aren't degenerate. */
  private def hotCorpus(s: SparkSession, nDocs: Int): DataFrame = {
    import s.implicits._
    (1 to nDocs).map { i =>
      (i.toLong, Array.fill(40)("the").mkString(" ") + s" u$i tail$i")
    }.toDF("doc_id", "text").repartition(8)
  }

  /** Forced-shuffle session mirroring the vocab-beyond-broadcast regime,
    * with skew thresholds far BELOW the measured hot partition so
    * OptimizeSkewedJoin would engage if it structurally could. */
  private def shuffleJoinSession(): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s
  }

  test("FINDING: OptimizeSkewedJoin cannot fire on an aggregate-fed " +
      "docfreq join, however skewed the stream side (why explicit " +
      "salting exists)") {
    val s = shuffleJoinSession()
    // the round-6 shape: occurrence stream joined to its own docfreq
    // aggregate on the Zipf key
    val toks = hotCorpus(s, 3000).select(col("doc_id"),
      posexplode(split(col("text"), "\\s+")).as(Seq("pos", "tok")))
    val dfreq = toks.groupBy("tok").agg(countDistinct("doc_id").as("df"))
    val joined = toks.join(dfreq, "tok")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    joined.collect()
    val skewed = Metrics.executedNodes(joined).collect {
      case j: SortMergeJoinExec if j.isSkewJoin    => j
      case j: ShuffledHashJoinExec if j.isSkewJoin => j
    }
    val smj = Metrics.executedNodes(joined).collect {
      case j: SortMergeJoinExec => j; case j: ShuffledHashJoinExec => j
    }
    assert(smj.nonEmpty, "control: the join must be a shuffle join here")
    assert(skewed.isEmpty,
      "AQE skew split fired on an aggregate-fed join — Spark lifted the " +
        "structural limitation; the explicit salting in the token " +
        "operators can be revisited")
  }

  test("stripCorpusStopwords: the occurrence stream never shuffles on " +
      "the token key — the drop test is a broadcast probe (no tok-keyed " +
      "exchange even when nothing can broadcast implicitly)") {
    val s = shuffleJoinSession()
    val out = TextAnalysis.stripCorpusStopwords(hotCorpus(s, 2000), 8, 10)
    out.collect()
    val m = Metrics.shuffleSummary(out)
    info(s"strip on hot corpus: $m")
    // spread (round-robin) + docfreq aggregate exchanges + the doc_id
    // rebuild: the hot token's ~80k occurrence rows must not ride any
    // of them as raw (pos, tok) rows keyed by tok. The docfreq
    // aggregate's exchanges carry partial-aggregated (tok[, doc_id])
    // rows — bounded per key per mapper — so total shuffled records
    // stay a small multiple of the corpus row count, nowhere near the
    // 80k+ occurrence explosion a tok-keyed stream shuffle would ship.
    assert(m.recordsWritten < 40000,
      s"occurrence stream appears to shuffle on tok: $m")
    // and the hot token's work lands on multiple tasks downstream
    val spreadParts = out.select(spark_partition_id().as("p"))
      .distinct().count()
    assert(spreadParts > 1)
  }

  test("bigramLogprob: hotSaltedJoin spreads the hot bigram across " +
      "shuffle partitions under forced-shuffle confs, and the result " +
      "equals the plain-join form") {
    val s = shuffleJoinSession()
    val d = hotCorpus(s, 1500)
    val out = TextAnalysis.bigramLogprob(d)
    val got = out.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet

    // naive plain-join reference (the oracle semantics)
    val bg = d.select(col("doc_id"),
      explode(expr("transform(sequence(0, size(split(text, '\\\\s+'))-2), " +
        "i -> concat(split(text, '\\\\s+')[i], ' ', " +
        "split(text, '\\\\s+')[i+1]))")).as("g"))
    val cnt2 = bg.groupBy("g").agg(count(lit(1)).as("n2"))
    val cnt1 = cnt2.groupBy(substring_index(col("g"), " ", 1).as("w1"))
      .agg(sum("n2").cast("long").as("n1"))
    val want = bg.join(cnt2, "g")
      .join(cnt1, substring_index(col("g"), " ", 1) === col("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        round(sum(log(col("n2") / col("n1").cast("double")) / log(lit(2d)))
          / count(lit(1)), 4).as("avg_logp_r"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == want, "hotSaltedJoin changed the result")

    // the hot bigram's big-side rows span several partitions inside the
    // salted join (the naive join serializes them into one)
    val toksOf = TextAnalysis.bigramLogprob(d) // fresh plan for the probe
    toksOf.collect()
    val salted = Skew.hotSaltedJoin(
      bg, cnt2, "g",
      cnt2.where(col("n2") > 1000).select("g"), col("doc_id"))
    val parts = salted.where(col("g") === "the the")
      .select(spark_partition_id().as("p")).distinct().count()
    assert(parts > 1,
      s"hot bigram must spread across partitions, got $parts")
    val plainParts = bg.join(cnt2, "g").where(col("g") === "the the")
      .select(spark_partition_id().as("p")).distinct().count()
    assert(plainParts == 1,
      "control: the unsalted shuffle join co-locates the hot bigram")
  }

  test("hotSaltedJoin: equality with the plain join across hot-set " +
      "choices (empty, partial, all keys) and key types") {
    val s = spark
    import s.implicits._
    val big = ((1 to 5000).map(i => ("hot", i)) ++
      (1 to 500).map(i => (s"k${i % 40}", i))).toDF("key", "v")
    val small = (Seq("hot") ++ (0 until 40).map(i => s"k$i"))
      .zipWithIndex.toDF("key", "meta")
    val want = big.join(small, "key").select("key", "v", "meta")
      .collect().toSet
    for (hot <- Seq(
        small.where(lit(false)).select("key"),          // nothing hot
        small.where(col("key") === "hot").select("key"), // the hot key
        small.select("key"))) {                          // everything hot
      val got = Skew.hotSaltedJoin(big, small, "key", hot, col("v"))
        .select("key", "v", "meta").collect().toSet
      assert(got == want)
    }
  }

  test("default regime: the vocab-sized count sides still broadcast " +
      "end-to-end (sanity on the registered-query path at toy scale)") {
    val d = hotCorpus(spark, 400)
    assert(TextAnalysis.stripCorpusStopwords(d, 8, 10).count() == 400)
    assert(TextAnalysis.bigramLogprob(d).count() == 400)
  }
}
