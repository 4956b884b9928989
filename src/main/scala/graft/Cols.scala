package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Column helpers shared by the query inventory.
  *
  * Money aggregation pattern: doubles are converted to integer cents
  * (`round(x*100)` — for positive values Spark's HALF_UP and DuckDB's
  * half-away-from-zero agree, and the binary double is never an exact
  * half), summed exactly as BIGINT, and divided back by 100.0. This makes
  * Spark and DuckDB results bit-identical regardless of aggregation
  * order — double-sum association drift and decimal rounding-mode
  * divergence are both avoided. The SQL mirror is [[Cols.sqlMoneySum]];
  * keep the two in sync.
  */
object Cols {
  /** Exact integer cents of a positive monetary double column. */
  def cents(c: Column): Column = round(c * 100).cast(LongType)

  /** Order-insensitive, engine-exact SUM of a monetary double column. */
  def moneySum(c: Column): Column = sum(cents(c)) / lit(100.0)

  /** DuckDB mirror of [[moneySum]] for oracle SQL. */
  def sqlMoneySum(e: String): String =
    s"CAST(SUM(CAST(ROUND(($e)*100) AS BIGINT)) AS BIGINT)/100.0"
}
