package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Post-execution plan observability: per-query shuffle volumes read
  * straight off the executed plan's SQLMetrics — the numbers an operator
  * of a 1000-executor job actually watches (a plan that "works" but
  * shuffles the corpus twice shows up here, not in row counts).
  *
  * Usage: run an action on the DataFrame, then call [[shuffleSummary]] on
  * the SAME DataFrame instance (metrics live on its executed plan).
  * `graft.Explain --run <query>` executes the audited plan and prints
  * this summary; tests assert on it directly (MetricsSpec).
  */
object Metrics {

  final case class ShuffleSummary(exchanges: Int, recordsWritten: Long,
      bytesWritten: Long)

  /** All physical nodes including those hidden inside AQE's re-planned
    * stages (`collect` on an adaptive plan stops at stage boundaries —
    * without unwrapping, every post-AQE Exchange is invisible) and inside
    * cached subplans (`InMemoryTableScanExec` is a leaf whose
    * `relation.cachedPlan` holds the exchanges that populate the cache —
    * without descending, every shuffle behind a `.cache()` is invisible
    * and a query's measured volume understates what actually ran). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec        => Seq(s.plan)
      case m: InMemoryTableScanExec => Seq(m.relation.cachedPlan)
      case other                    => other.children
    }
    p +: children.flatMap(allNodes)
  }

  /** Every executed-plan node, with AQE stages and cached subplans
    * unwrapped — the same walk [[shuffleSummary]] uses, exposed so specs
    * can assert on plan SHAPE (e.g. "this join ran with skew=true",
    * "this side broadcast") rather than only on exchange counts. */
  def executedNodes(df: DataFrame): Seq[SparkPlan] =
    allNodes(df.queryExecution.executedPlan)

  /** Total shuffle write across every distinct exchange in the executed
    * plan. Call AFTER an action; metrics on an unexecuted plan are zero.
    *
    * Exchanges are deduped by CANONICALIZED plan, not node identity: a
    * cached subplan scanned from two branches reaches `allNodes` twice
    * but its populating shuffle is one plan node — and, separately,
    * AQE's query-stage reuse is BEST-EFFORT under concurrent stage
    * submission, so two physically distinct copies of the same exchange
    * occasionally both materialize in one run (observed: the cached
    * bigram-count aggregate flipping a measured count 7 → 8 with zero
    * source change). The budget specs exist to catch plan regressions —
    * a refactor adding a NEW shuffle — so the count and volume reflect
    * the distinct shuffles the PLAN contains; per canonical group we
    * take the max copy's metrics (racing copies write the same data). */
  def shuffleSummary(df: DataFrame): ShuffleSummary = {
    val nodes = allNodes(df.queryExecution.executedPlan)
    val groups = nodes.collect { case e: ShuffleExchangeLike => e }
      .foldLeft(Vector.empty[ShuffleExchangeLike]) { (acc, e) =>
        if (acc.exists(_ eq e)) acc else acc :+ e
      }
      .groupBy(_.canonicalized)
    def metric(e: SparkPlan, name: String): Long =
      e.metrics.get(name).map(_.value).getOrElse(0L)
    def maxOf(name: String): Long =
      groups.values.map(_.map(metric(_, name)).max).sum
    ShuffleSummary(
      exchanges = groups.size,
      recordsWritten = maxOf("shuffleRecordsWritten"),
      bytesWritten = maxOf("shuffleBytesWritten"))
  }
}
