package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Event analytics: structural checks at sf0.001 (value-level checks are
  * the DuckDB oracle's job; here we assert invariants the oracle can't).
  */
class EventOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_window_rank: at most 3 rows per user, ranks contiguous from 1") {
    val rows = run("q_window_rank").collect()
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val ranks = rs.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to ranks.size) && ranks.size <= 3)
    }
  }

  test("q_sessionize: session count is between 1 and event count") {
    val rows = run("q_sessionize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sessions = r.getLong(1); val events = r.getLong(2)
      assert(sessions >= 1 && sessions <= events,
        s"user ${r.getLong(0)}: $sessions sessions of $events events")
    }
  }

  test("q_lag_gap: first event per user has null gap, others non-negative") {
    val df = run("q_lag_gap")
    val byUser = df.collect().groupBy(_.getLong(0))
    byUser.values.foreach { rs =>
      assert(rs.count(_.isNullAt(2)) == 1, "exactly one first event")
      rs.filterNot(_.isNullAt(2)).foreach(r => assert(r.getLong(2) >= 0))
    }
  }

  test("q_hour_window totals match ungrouped totals (no row lost to " +
      "windowing)") {
    val n = run("q_hour_window").agg(sum("n")).head().getLong(0)
    val total = graft.Tables.load(spark, sfDir, "events").count()
    assert(n == total)
  }

  test("q_forward_fill: filled equals the user's most recent purchase " +
      "value (independent Scala replay)") {
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp))").as("us"),
        col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
    val expect = ev.groupBy(_._1).iterator.flatMap { case (_, rs) =>
      var lastV: Option[Double] = None
      rs.sortBy(r => (r._2, r._3)).iterator.map { r =>
        if (r._4 == "purchase") lastV = Some(r._5)
        r._3 -> lastV
      }
    }.toMap
    val got = run("q_forward_fill").collect()
    assert(got.length == ev.length)
    got.foreach { r =>
      val e = expect(r.getLong(0))
      if (r.isNullAt(3)) assert(e.isEmpty, s"event ${r.getLong(0)}")
      else assert(e.contains(r.getDouble(3)), s"event ${r.getLong(0)}")
    }
  }

  test("q_rolling_1h: frame matches an independent per-user replay " +
      "(tied seconds share a frame; count AND exact-cents sum)") {
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp)) " +
        "div 1000000").as("s"), col("event_id"),
        graft.Cols.cents(col("value")).as("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = ev.groupBy(_._1).iterator.flatMap { case (_, rs) =>
      rs.iterator.map { r =>
        val frame = rs.filter(o => o._2 >= r._2 - 3600 && o._2 <= r._2)
        r._3 -> ((frame.length, frame.map(_._4).sum))
      }
    }.toMap
    run("q_rolling_1h").collect().foreach { r =>
      val (n, cSum) = expect(r.getLong(0))
      assert(r.getLong(2) == n,
        s"event ${r.getLong(0)}: n_1h ${r.getLong(2)} != $n")
      assert(r.getDouble(3) == cSum / 100.0,
        s"event ${r.getLong(0)}: spend_1h ${r.getDouble(3)} != ${cSum / 100.0}")
    }
  }

  test("q_calendar_fill: contiguous daily spine, zero-filled gaps, " +
      "totals preserved") {
    val rows = run("q_calendar_fill")
      .select(col("day").cast("string"), col("n")).collect()
      .map(r => (java.time.LocalDate.parse(r.getString(0)), r.getLong(1)))
    val days = rows.map(_._1)
    assert(days.zip(days.tail).forall { case (a, b) => b == a.plusDays(1) },
      "spine has gaps")
    val total = graft.Tables.load(spark, sfDir, "orders").count()
    assert(rows.map(_._2).sum == total, "order count not preserved")
    assert(rows.exists(_._2 == 0), "no zero-filled day at sf0.001")
  }

  test("q_cohort_retention: week-0 cell per cohort covers the cohort's " +
      "users; matrix users never exceed the cohort size") {
    val rows = run("q_cohort_retention").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val week0 = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    // every cohort has its week-0 row (a user is active in their own
    // first week by definition)
    assert(rows.map(_._1).distinct.forall(week0.contains))
    // retention can never exceed the cohort's size
    rows.foreach { case (c, off, n) =>
      assert(n <= week0(c), s"cohort $c week $off: $n > ${week0(c)}")
    }
    // total users = sum of cohort sizes (each user in exactly one cohort)
    val users = graft.Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(week0.values.sum == users)
  }

  test("q_cdc_upsert: last-writer-wins vs a naive in-memory replay " +
      "(tombstoned keys absent, payload from the final version)") {
    val events = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    // naive replay: sort each user's changelog, last row wins
    val expect = events.groupBy(_._1).flatMap { case (u, es) =>
      val last = es.maxBy(e => (e._4, e._2))
      if (last._3 == "error") None
      else Some(u -> (last._5, es.map(_._4).max, es.length.toLong))
    }
    val got = run("q_cdc_upsert").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect.toMap)
  }

  test("q_scd2: intervals chain per user (valid_to = next valid_from), " +
      "exactly one open current row, statuses actually change") {
    val byUser = run("q_scd2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.values.foreach { rs0 =>
      val rs = rs0.sortBy(_._3)
      // chained: each interval closes exactly where the next opens
      rs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"gap/overlap at user ${a._1}")
          assert(a._2 != b._2, "consecutive intervals with equal status")
        case _ =>
      }
      assert(rs.count(_._4.isEmpty) == 1, "exactly one current row")
      assert(rs.last._4.isEmpty, "the open row is the latest")
    }
  }

  test("q_rolling_active_users equals a naive per-day set replay; " +
      "wau >= dau always") {
    val ud = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000")
          .as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = ud.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val allWDays = byDay.keySet.flatMap(d => (d to d + 6))
    val expect = allWDays.map { wd =>
      val win = (wd - 6 to wd).flatMap(byDay.get).flatten.toSet
      wd -> (byDay.getOrElse(wd, Set.empty).size.toLong, win.size.toLong)
    }.toMap
    val got = run("q_rolling_active_users").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect)
    got.values.foreach { case (dau, wau) => assert(wau >= dau) }
  }

  test("q_concurrent_sessions equals a serial sweep-line replay " +
      "(closed intervals: an instant session peaks at 1)") {
    val spans = EventOps.sessionSpans(
        graft.Tables.load(spark, sfDir, "events"), 30)
      .select(unix_micros(col("s_start").cast("timestamp")),
        unix_micros(col("s_end").cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pts = spans.flatMap { case (s, e) => Seq((s, 1L), (e + 1, -1L)) }
      .sortBy(p => (p._1, p._2))
    var conc = 0L
    val peaks = scala.collection.mutable.Map[Long, Long]()
    pts.foreach { case (us, d) =>
      conc += d
      val day = us / 86400000000L
      peaks(day) = math.max(peaks.getOrElse(day, Long.MinValue), conc)
    }
    val got = run("q_concurrent_sessions").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == peaks.toMap)
    // sanity: some day actually has overlap at sf0.001
    assert(got.values.max >= 1L)
  }

  test("q_funnel_stages: strict ordering semantics on crafted sequences " +
      "(out-of-order clicks never count; ties don't advance)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // build the same plan the registered query uses, over a crafted frame
    def funnel(rows: Seq[(Long, String, Long)]) = {
      val w = Window.partitionBy("user_id")
      rows.toDF("user_id", "event_type", "us")
        .withColumn("t1",
          min(when(col("event_type") === "view", col("us"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("us") > col("t1"),
            col("us"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("us") > col("t2"),
            col("us"))).over(w))
        .groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    }
    val got = funnel(Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // full
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 20L),  // click
      // BEFORE view: stage stalls at 1 (purchase needs a click after t1)
      (3L, "view", 10L), (3L, "click", 10L),  // tie: strict > rejects
      (4L, "purchase", 1L), (4L, "error", 2L), // no view at all: stage 0
      (5L, "view", 1L), (5L, "click", 2L), (5L, "purchase", 2L),
      // purchase tied WITH click: strict > rejects → stage 2
      (5L, "purchase", 9L))) // later purchase rescues stage 3
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L))))
    assert(got(2L) == ((Some(10L), None, None)))
    assert(got(3L) == ((Some(10L), None, None)))
    assert(got(4L) == ((None, None, None)))
    assert(got(5L) == ((Some(1L), Some(2L), Some(9L))))
    // registered query: stage histogram is monotone non-increasing in
    // the funnel sense (stage n reachable only through stage n-1)
    val reg = run("q_funnel_stages").collect()
    val byStage = reg.groupBy(_.getInt(4)).view.mapValues(_.length).toMap
    assert(reg.forall(r => (0 to 3).contains(r.getInt(4))))
    assert(byStage.keySet.nonEmpty)
    reg.foreach { r =>
      if (r.getInt(4) >= 2) assert(!r.isNullAt(1) && !r.isNullAt(2))
      if (r.getInt(4) == 3) assert(!r.isNullAt(3))
    }
  }

  test("q_markov_transitions: transition mass conserves (sum = events - " +
      "users) and per-row probabilities floor-sum to one million") {
    val rows = run("q_markov_transitions").collect()
    val ev = graft.Tables.load(spark, sfDir, "events")
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    // each user with k events contributes exactly k-1 transitions
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers)
    // floor-division ppm: each row loses < 1 ppm, so a from_type with t
    // targets sums into (1e6 - t, 1e6]
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ppm = rs.map(_.getLong(3)).sum
      assert(ppm <= 1000000L && ppm > 1000000L - rs.length,
        s"ppm mass $ppm over ${rs.length} targets")
    }
  }

  test("q_funnel_latency: replays exactly from q_funnel_stages' " +
      "converted users (counts, interpolated percentiles, max)") {
    val r = run("q_funnel_latency").head()
    val conv = run("q_funnel_stages").collect()
      .filter(_.getInt(4) == 3)
      .map(row => (row.getLong(1), row.getLong(2), row.getLong(3)))
    assert(r.getLong(0) == conv.length && conv.nonEmpty)
    def pct(xs: Seq[Long], q: Double): Double = {
      val s = xs.sorted
      val pos = q * (s.length - 1)
      val lo = s(pos.toInt)
      val hi = s(math.ceil(pos).toInt)
      lo + (hi - lo) * (pos - pos.toInt)
    }
    val total = conv.map { case (t1, _, t3) => t3 - t1 }.toSeq
    // ulp tolerance: the engines agree bit-for-bit with each other
    // (hash-pinned); this replay's interpolation associates differently
    def close(a: Double, b: Double) =
      math.abs(a - b) <= math.abs(b) * 1e-12
    assert(close(r.getDouble(1), pct(conv.map(c => c._2 - c._1).toSeq, 0.5)))
    assert(close(r.getDouble(2), pct(conv.map(c => c._3 - c._2).toSeq, 0.5)))
    assert(close(r.getDouble(3), pct(total, 0.5)))
    assert(close(r.getDouble(4), pct(total, 0.9)))
    assert(r.getLong(5) == total.max)
  }

  test("q_time_weighted_avg: exact driver replay of the step-function " +
      "hold; TWA bounded by the user's value range") {
    val got = run("q_time_weighted_avg").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got.nonEmpty)
    val evs = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expect = evs.groupBy(_._1).flatMap { case (uid, g) =>
      val s = g.sortBy(e => (e._3, e._2))
      val span = s.last._3 - s.head._3
      if (span <= 0) None else {
        val num = s.sliding(2).collect { case Array(a, b) =>
          math.round(a._4 * 100) * (b._3 - a._3) }.sum
        Some(uid -> ((s.length.toLong, span, num / span)))
      }
    }
    assert(got == expect.toMap)
    // the hold average must lie within the held values' cent range
    for ((uid, (_, _, twa)) <- got) {
      val vs = evs.filter(_._1 == uid).map(e => math.round(e._4 * 100))
      assert(twa >= vs.min - 1 && twa <= vs.max,
        s"user $uid: TWA $twa outside [${vs.min}, ${vs.max}]")
    }
  }
}
