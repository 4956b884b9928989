package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** As-of join semantics on a hand-computed case: inclusive match,
  * latest-at-or-before selection, per-key isolation, unmatched drop.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("matches latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, 100L, ts("10:00:00")),  // after r@09:00 and r@09:30 -> 09:30
      (1L, 101L, ts("09:30:00")),  // exactly at r@09:30 -> inclusive match
      (1L, 102L, ts("08:00:00")),  // before any right -> dropped
      (2L, 200L, ts("10:00:00")),  // other key -> its own right row
      (3L, 300L, ts("10:00:00")))  // key with no right rows -> dropped
      .toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 900L, ts("09:00:00"), "a"),
      (1L, 901L, ts("09:30:00"), "b"),
      (2L, 902L, ts("09:59:00"), "c"))
      .toDF("user_id", "rid", "ts", "tag")

    val out = AsOfJoin.asOf(left, right, key = "user_id", leftTs = "ts",
        rightTs = "ts", payload = Seq("tag"), rightOrder = Seq("rid"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Timestamp]("asof_ts"), r.getAs[String]("asof_tag")))
      .toMap

    assert(out.keySet == Set(100L, 101L, 200L))
    assert(out(100L) == (ts("09:30:00"), "b"))
    assert(out(101L) == (ts("09:30:00"), "b")) // inclusive <=
    assert(out(200L) == (ts("09:59:00"), "c"))
  }

  test("property: agrees with a brute-force oracle on seeded random data") {
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 5) {
      val leftRows = Seq.tabulate(60)(i =>
        (rnd.nextInt(5).toLong, i.toLong, ts(f"${10 + rnd.nextInt(4)}%02d:${rnd.nextInt(60)}%02d:00")))
      val rightRows = Seq.tabulate(40)(i =>
        (rnd.nextInt(5).toLong, (1000 + i).toLong,
          ts(f"${10 + rnd.nextInt(4)}%02d:${rnd.nextInt(60)}%02d:00"), s"t$i"))
      val left = leftRows.toDF("user_id", "event_id", "ts")
      val right = rightRows.toDF("user_id", "rid", "ts", "tag")
      val got = AsOfJoin.asOf(left, right, "user_id", "ts", "ts",
          Seq("tag"), Seq("rid")).collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("asof_tag"))
        .toMap
      val expect = leftRows.flatMap { case (u, eid, lts) =>
        val cands = rightRows.filter(r => r._1 == u && !r._3.after(lts))
        if (cands.isEmpty) None
        else {
          // latest ts; ties -> largest rid (rightOrder asc, last wins)
          val best = cands.maxBy(r => (r._3.getTime, r._2))
          Some(eid -> best._4)
        }
      }.toMap
      assert(got == expect, s"mismatch: got=$got expect=$expect")
    }
  }

  test("NULL payload field in the matched right row stays NULL (no " +
      "stale backfill from an older right row)") {
    val left = Seq((1L, 10L, ts("12:00:00"))).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 1L, ts("10:00:00"), Option("old-tag"), Option("old-note")),
      // matched row: tag is NULL, note present — output must take BOTH
      // fields from this row, not mix old-tag with new-note
      (1L, 2L, ts("11:00:00"), Option.empty[String], Option("new-note")))
      .toDF("user_id", "rid", "ts", "tag", "note")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "ts",
      Seq("tag", "note"), Seq("rid")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Timestamp]("asof_ts") == ts("11:00:00"))
    assert(out.head.getAs[String]("asof_tag") == null,
      "NULL in the matched row must not backfill from an earlier row")
    assert(out.head.getAs[String]("asof_note") == "new-note")
  }

  test("right rows with NULL timestamp never match (NULL <= ts is " +
      "never true)") {
    val left = Seq((1L, 10L, ts("12:00:00"))).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 1L, Option.empty[Timestamp], "ghost"), // NULL ts: must not match
      (2L, 2L, Option(ts("11:00:00")), "other-key"))
      .toDF("user_id", "rid", "ts", "tag")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "ts",
      Seq("tag"), Seq("rid")).collect()
    assert(out.isEmpty,
      s"NULL-ts right row must not produce a match: ${out.toSeq}")
  }

  test("tie between right rows at the same instant resolves to the last " +
      "in rightOrder") {
    val left = Seq((1L, 10L, ts("12:00:00"))).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 1L, ts("11:00:00"), "first"),
      (1L, 2L, ts("11:00:00"), "second"))
      .toDF("user_id", "rid", "ts", "tag")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "ts",
      Seq("tag"), Seq("rid")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("asof_tag") == "second")
  }
}
