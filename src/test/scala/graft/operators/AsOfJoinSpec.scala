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
