package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two per-stratum sampling operators must (a) return exactly what
  * the naive single-window-per-stratum form returns — that form IS the
  * oracle semantics — while (b) never pushing a whole stratum through
  * one task: the stratum key is low-cardinality (~5 langs), so at the
  * 100 TB target a `Window.partitionBy(lang)` is a single-partition sort
  * of ~20 TB. SkewSpec-style spread asserts pin the parallel shape.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  /** Hot-stratum fixture: one stratum dominating + a tail, score ties on
    * purpose (score = i % 7) so the median cut lands inside a tie group. */
  private def fixture(n: Int): DataFrame =
    ((1 to n).map(i => (i.toLong, s"text body $i", "hot", i % 7)) ++
      (1 to 41).map(i => (100000L + i, s"tail $i", s"s${i % 3}", i % 5)))
      .toDF("doc_id", "text", "lang", "n_chars")

  /** The naive forms the judge's oracle SQL encodes — used as the
    * semantic reference the scale-safe forms must match exactly. */
  private def naiveSample(d: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(md5(col("text")), col("doc_id"))
    d.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select(col("lang"), col("doc_id"), col("rn"))
  }

  private def naiveTopHalf(d: DataFrame): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id"))
    val cw = Window.partitionBy("lang")
    d.withColumn("rnk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(cw))
      .where(col("rnk") * 2 <= col("n") + 1)
      .select("lang", "doc_id", "n_chars")
  }

  test("stratifiedSample: two-phase top-K equals the single-window form " +
      "(hot stratum, several partition layouts)") {
    for (parts <- Seq(1, 3, 8)) {
      val d = fixture(2000).repartition(parts)
      val got = Sampling.stratifiedSample(d, "lang", 20)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val want = naiveSample(d, 20)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want, s"mismatch at $parts input partitions")
      assert(got.count(_._1 == "hot") == 20)
    }
  }

  test("stratifiedSample: k larger than some strata keeps whole stratum") {
    val d = fixture(5) // strata s0..s2 have ~14 rows, hot has 5
    val got = Sampling.stratifiedSample(d, "lang", 50)
    assert(got.count() == d.count())
  }

  test("topHalfByScore: histogram split equals the single-window rank " +
      "form, including boundary ties and 1-row strata") {
    val d = fixture(1001) // odd hot stratum; heavy ties at every score
      .unionByName(Seq((999999L, "solo", "zz", 3))
        .toDF("doc_id", "text", "lang", "n_chars"))
    val got = Sampling.topHalfByScore(d, "lang", "n_chars")
      .select("lang", "doc_id", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val want = naiveTopHalf(d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
    assert(got.count(_._1 == "zz") == 1, "1-row stratum keeps its row")
    assert(got.count(_._1 == "hot") == 501, "odd stratum keeps (n+1)/2")
  }

  test("topHalfByScore: all-ties stratum cuts inside the tie group by doc_id") {
    val d = (1 to 10).map(i => (i.toLong, s"t$i", "en", 42))
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = Sampling.topHalfByScore(d, "lang", "n_chars")
      .select("doc_id").as[Long].collect().toSet
    assert(got == (1L to 5L).toSet)
  }

  test("rankQuantiles: exact rank-k values from the histogram equal a " +
      "local sorted-rank replay, heavy ties included") {
    val d = fixture(1001)
    val got = Sampling.rankQuantiles(d, "lang", "n_chars",
        Seq(("q1", 1, 4), ("med", 2, 4), ("q3", 3, 4)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val local = d.select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1).map { case (lang, rows) =>
        val sorted = rows.map(_._2).sorted
        val n = sorted.length
        def at(q: Int) = sorted(((q * n + 3) / 4) - 1)
        lang -> ((n.toLong, at(1), at(2), at(3)))
      }
    assert(got == local)
  }

  test("seeded property: all three per-stratum operators equal their " +
      "naive forms on random corpora (skew, ties, tiny strata)") {
    for (seed <- Seq(11, 42, 77)) {
      val rnd = new scala.util.Random(seed)
      val nStrata = 1 + rnd.nextInt(6)
      val rows = (0 until 300 + rnd.nextInt(700)).map { i =>
        // zipf-ish stratum sizes + heavy score ties
        val s = s"s${(math.sqrt(rnd.nextInt(nStrata * nStrata)).toInt)}"
        (i.toLong, s"doc $i ${rnd.nextInt(1000)}", s,
          rnd.nextInt(1 + rnd.nextInt(12)))
      } :+ ((999999L, "solo", "lonely", 5)) // 1-row stratum always present
      val d = rows.toDF("doc_id", "text", "lang", "n_chars")
        .repartition(1 + rnd.nextInt(7))

      val k = 1 + rnd.nextInt(40)
      val sGot = Sampling.stratifiedSample(d, "lang", k).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val sWant = naiveSample(d, k).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(sGot == sWant, s"stratifiedSample mismatch seed=$seed k=$k")

      val hGot = Sampling.topHalfByScore(d, "lang", "n_chars")
        .select("lang", "doc_id", "n_chars").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val hWant = naiveTopHalf(d).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(hGot == hWant, s"topHalfByScore mismatch seed=$seed")

      val qGot = Sampling.rankQuantiles(d, "lang", "n_chars",
          Seq(("q1", 1, 4), ("med", 2, 4), ("q3", 3, 4))).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
      val qWant = rows.groupBy(_._3).map { case (lang, rs) =>
        val sorted = rs.map(_._4).sorted
        val n = sorted.length
        def at(q: Int) = sorted(((q * n + 3) / 4) - 1)
        lang -> ((n.toLong, at(1), at(2), at(3)))
      }
      assert(qGot == qWant, s"rankQuantiles mismatch seed=$seed")
    }
  }

  test("pipeline_apply_mix: resampled counts respect the weight algebra " +
      "(floor(w)..ceil(w) copies; no dups when downsampling; full " +
      "coverage when upsampling)") {
    val weights = graft.SparkEntry.queries("pipeline_mix_weights")(
        spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val out = graft.SparkEntry.queries("pipeline_apply_mix")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out.keySet == weights.keySet)
    for ((src, (nOut, nUnique)) <- out) {
      val (nDocs, w) = weights(src)
      assert(nOut >= math.floor(w).toLong * nDocs &&
        nOut <= math.ceil(w).toLong * nDocs,
        s"$src: n_out $nOut outside [floor(w)*n, ceil(w)*n] for w=$w n=$nDocs")
      if (w <= 1.0) assert(nOut == nUnique,
        s"$src: downsampling must never duplicate ($nOut != $nUnique)")
      if (w >= 1.0) assert(nUnique == nDocs,
        s"$src: upsampling must keep every doc ($nUnique != $nDocs)")
    }
    // deterministic: a second run is byte-identical
    val again = graft.SparkEntry.queries("pipeline_apply_mix")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(again == out)
  }

  test("histogram operators reject a continuous (double) score loudly — " +
      "the cardinality contract that keeps the histogram metadata-sized") {
    // a double quality score: every row distinct, so the (stratum, score)
    // histogram would be corpus-sized and the rank window a serial sort
    val d = (1 to 100).map(i => (i.toLong, s"t$i", "en", i / 7.0))
      .toDF("doc_id", "text", "lang", "score")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.topHalfByScore(d, "lang", "score")
    }
    assert(e1.getMessage.contains("Bucketize"))
    val e2 = intercept[IllegalArgumentException] {
      Sampling.rankQuantiles(d, "lang", "score", Seq(("med", 2, 4)))
    }
    assert(e2.getMessage.contains("Bucketize"))

    // the documented recipe — caller-bucketized long score — is accepted
    // and equals the naive rank form on the bucketized values
    val b = d.withColumn("score", floor(col("score") * 1000).cast("long"))
    val got = Sampling.topHalfByScore(b, "lang", "score")
      .select("doc_id").as[Long].collect().toSet
    val w = Window.partitionBy("lang")
      .orderBy(col("score").desc, col("doc_id"))
    val want = b.withColumn("rnk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .where(col("rnk") * 2 <= col("n") + 1)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
  }

  /** The NTILE semantics ntileByScore must reproduce exactly. */
  private def naiveNtile(d: DataFrame, k: Int): DataFrame =
    d.withColumn("bucket",
      ntile(k).over(Window.orderBy(col("n_chars"), col("doc_id"))))

  test("ntileByScore: histogram buckets equal the global NTILE window " +
      "form — boundary-straddling ties, n % k in {0,1,2}, n < k, and a " +
      "tie group spanning more than one bucket") {
    // heavy ties (score = i % 5 over 3..9 rows per score) so tile cuts
    // land INSIDE tie groups and the within-group doc_id rank decides
    for (n <- Seq(2, 3, 6, 7, 8, 30, 31, 32, 1001); k <- Seq(3, 4)) {
      val d = (1 to n).map(i => (i.toLong, s"t$i", "en", i % 5))
        .toDF("doc_id", "text", "lang", "n_chars")
      val got = Sampling.ntileByScore(d, "n_chars", "doc_id", k)
        .select("doc_id", "bucket")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val want = naiveNtile(d, k).select("doc_id", "bucket")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(got == want, s"ntileByScore mismatch at n=$n k=$k")
    }
    // one giant tie group spanning ALL buckets: every row scores 7, so
    // the single boundary group straddles both tercile cuts and the
    // bucket is decided purely by the doc_id tie rank
    val allTies = (1 to 10).map(i => (i.toLong, s"t$i", "en", 7))
      .toDF("doc_id", "text", "lang", "n_chars")
    val gotT = Sampling.ntileByScore(allTies, "n_chars", "doc_id", 3)
      .select("doc_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val wantT = naiveNtile(allTies, 3).select("doc_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(gotT == wantT)
    assert(gotT(4L) == 1 && gotT(5L) == 2 && gotT(8L) == 3,
      "ties split 4/3/3 by doc_id rank inside the group")
  }

  test("ntileByScore: seeded property vs the NTILE window, and the " +
      "continuous-score contract rejects loudly") {
    for (seed <- Seq(5, 23, 91)) {
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(900)
      val d = (1 to n)
        .map(i => (i.toLong, s"d$i", "en", rnd.nextInt(1 + rnd.nextInt(9))))
        .toDF("doc_id", "text", "lang", "n_chars")
        .repartition(1 + rnd.nextInt(7))
      val k = 2 + rnd.nextInt(5)
      val got = Sampling.ntileByScore(d, "n_chars", "doc_id", k)
        .select("doc_id", "bucket")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val want = naiveNtile(d, k).select("doc_id", "bucket")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(got == want, s"seed=$seed n=$n k=$k")
    }
    val dd = (1 to 20).map(i => (i.toLong, s"t$i", "en", i / 3.0))
      .toDF("doc_id", "text", "lang", "score")
    val e = intercept[IllegalArgumentException] {
      Sampling.ntileByScore(dd, "score", "doc_id", 3)
    }
    assert(e.getMessage.contains("Bucketize"))
  }

  test("per-stratum work spans multiple partitions (the 100 TB shape): " +
      "no single task owns a stratum") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val d = s.createDataFrame(fixture(4000).rdd, fixture(1).schema)

    // phase 1 of the quota sample: the hot stratum's partial sorts land
    // on many tasks (salted key), where the naive window uses exactly one
    val phase1Spread = Sampling.partialTopK(
        d.select(col("lang"), col("doc_id"), md5(col("text")).as("__h")),
        "lang", Seq(col("__h"), col("doc_id")), 20, Sampling.FanOut)
      .where(col("lang") === "hot")
      .select(spark_partition_id().as("p")).distinct().count()
    assert(phase1Spread > 1,
      s"salted partial top-K must spread the hot stratum, got $phase1Spread")

    val naiveSpread = naiveSample(d, 20).where(col("lang") === "hot")
      .select(spark_partition_id().as("p")).distinct().count()
    assert(naiveSpread == 1, "naive window serializes the stratum (control)")

    // median split: the bulk path shuffles on (stratum, score), so the
    // hot stratum's kept rows flow through multiple tasks
    val splitSpread = Sampling.topHalfByScore(d, "lang", "n_chars")
      .where(col("lang") === "hot")
      .select(spark_partition_id().as("p")).distinct().count()
    assert(splitSpread > 1,
      s"histogram median split must spread the hot stratum, got $splitSpread")

    // ntileByScore's degenerate case (r14): an ALL-TIES corpus is one
    // boundary score group straddling every cut — the r13 per-group
    // window serialized the whole corpus through one task; the
    // two-phase range-segment rank spreads it while staying exactly
    // equal to the NTILE window (the equality tests above)
    val allTies = {
      import s.implicits._
      (1L to 4000L).map(i => (i, s"t$i", "en", 7))
        .toDF("doc_id", "text", "lang", "n_chars")
    }
    val tieSpread = Sampling.ntileByScore(allTies, "n_chars", "doc_id", 3)
      .select(spark_partition_id().as("p")).distinct().count()
    assert(tieSpread > 1,
      s"all-ties ntileByScore must spread the tie group, got $tieSpread")
    val gotTie = Sampling.ntileByScore(allTies, "n_chars", "doc_id", 3)
      .select("doc_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert((1L to 4000L).forall(i =>
        gotTie(i) == (if (i <= 1334) 1 else if (i <= 2667) 2 else 3)),
      "all-ties buckets must still split 1334/1333/1333 by doc_id rank")
  }

  test("pipeline_mix_temperature: alpha=0.5 boosts low-resource languages " +
      "(per-doc share strictly higher for smaller langs), shares sum to " +
      "~1e6, micro-units replay exactly") {
    val rows = graft.SparkEntry.queries("pipeline_mix_temperature")(
        spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length > 1)
    rows.foreach { case (_, n, micro, _) =>
      assert(micro == math.floor(math.sqrt(n.toDouble) * 1e6).toLong) }
    val total = rows.map(_._3).sum
    rows.foreach { case (_, _, micro, ppm) =>
      assert(ppm == micro * 1000000L / total) }
    // floor drift keeps the sum just under 1e6, never over
    val sumPpm = rows.map(_._4).sum
    assert(sumPpm <= 1000000L && sumPpm >= 1000000L - rows.length)
    // temperature flattening: per-doc sampling mass decreases with size
    val byN = rows.sortBy(_._2).toSeq
    for (pair <- byN.sliding(2) if pair.size == 2 &&
        pair(0)._2 < pair(1)._2) {
      val (small, large) = (pair(0), pair(1))
      assert(small._4.toDouble / small._2 > large._4.toDouble / large._2,
        s"alpha=0.5 must favor ${small._1} per-doc over ${large._1}")
    }
  }
}
