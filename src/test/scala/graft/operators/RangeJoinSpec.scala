package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bin-bucketed range join vs a brute-force cross-join oracle, including
  * the bin-boundary edge cases the bucketing must not miss.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches brute force exactly, including bin-boundary pairs") {
    // timestamps engineered around the 100-unit bin edges
    val left = Seq(
      (1L, 10L, 100L), (1L, 11L, 199L), (1L, 12L, 250L),
      (2L, 20L, 300L))
      .toDF("user_id", "event_id", "us")
    val right = Seq(
      (1L, 90L, 1L),    // far below: only pairs within 100 of it
      (1L, 91L, 99L),   // one below 10's bin
      (1L, 92L, 201L),  // bin above 11, within 100
      (2L, 93L, 399L),  // within 100 of 20
      (3L, 94L, 300L))  // different user: never matches
      .toDF("user_id", "event_id", "us")

    val got = RangeJoin.timeProximityJoin(left, right, "user_id",
        col("us"), col("us"), windowUs = 100L, payload = Seq("event_id"))
      .select(col("event_id"), col("r_event_id"), col("dt_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val expect = (for {
      (lu, le, lus) <- Seq((1L, 10L, 100L), (1L, 11L, 199L), (1L, 12L, 250L),
        (2L, 20L, 300L))
      (ru, re, rus) <- Seq((1L, 90L, 1L), (1L, 91L, 99L), (1L, 92L, 201L),
        (2L, 93L, 399L), (3L, 94L, 300L))
      if lu == ru && math.abs(lus - rus) <= 100
    } yield (le, re, lus - rus)).toSet

    assert(got == expect)
    assert(expect.contains((10L, 91L, 1L)), "boundary pair must exist")
    assert(expect.contains((11L, 92L, -2L)), "cross-bin pair must exist")
  }

  test("property: agrees with brute force on seeded random timestamps") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val window = 50L + rnd.nextInt(200)
      val leftRows = Seq.tabulate(80)(i =>
        (rnd.nextInt(4).toLong, i.toLong, rnd.nextInt(2000).toLong))
      val rightRows = Seq.tabulate(80)(i =>
        (rnd.nextInt(4).toLong, (500 + i).toLong, rnd.nextInt(2000).toLong))
      val got = RangeJoin.timeProximityJoin(
          leftRows.toDF("user_id", "event_id", "us"),
          rightRows.toDF("user_id", "event_id", "us"),
          "user_id", col("us"), col("us"), window, Seq("event_id"))
        .select("event_id", "r_event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = (for {
        (lu, le, lus) <- leftRows
        (ru, re, rus) <- rightRows
        if lu == ru && math.abs(lus - rus) <= window
      } yield (le, re)).toSet
      assert(got == expect, s"trial $trial window=$window")
    }
  }

  test("duplicate right rows both appear (no over-dedup)") {
    val left = Seq((1L, 1L, 50L)).toDF("user_id", "event_id", "us")
    val right = Seq((1L, 7L, 40L), (1L, 7L, 40L))
      .toDF("user_id", "event_id", "us")
    val n = RangeJoin.timeProximityJoin(left, right, "user_id",
      col("us"), col("us"), 100L, Seq("event_id")).count()
    assert(n == 2)
  }
}
