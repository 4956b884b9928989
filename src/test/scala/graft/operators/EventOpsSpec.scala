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
}
