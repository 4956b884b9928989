package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering keys and the
  * per-file min/max manifest a layout-aware writer produces.
  *
  * Why this is an engine feature and not an afterthought: at 100 TB the
  * scan cost of a selective query is decided by FILE SKIPPING — parquet
  * row-group pruning over per-file min/max stats — and skipping on two
  * columns at once requires the rows to be CLUSTERED in both dimensions.
  * Sorting by (a, b) gives perfect pruning on `a` and none on `b`;
  * interleaving the bits of both keys (the Z-order curve) bounds the
  * min/max range of BOTH columns in every file. The production write is
  * `df.repartitionByRange($"zval").sortWithinPartitions($"zval")` +
  * per-file stats collection; the registered query materializes the
  * deterministic part — the curve value and the per-bucket manifest —
  * with fixed-radix buckets instead of sampled range boundaries, because
  * range-sampling is nondeterministic and would break the oracle (the
  * manifest algebra is identical either way).
  *
  * The 16+16→32-bit interleave is a fold of shift/mask built-ins —
  * whole-stage-codegen'd integer ops, no UDF (a custom Catalyst
  * expression would buy nothing: the unrolled chain already lives inside
  * one codegen stage).
  */
object Layout {

  /** Morton-interleave two 16-bit values: x occupies even bit positions,
    * y odd. Inputs are masked to 16 bits so hostile/overflowing keys
    * degrade to bucket aliasing, never to a wrong-sign long. */
  def zorder16(x: Column, y: Column): Column = {
    val xm = x.bitwiseAND(lit(0xFFFFL))
    val ym = y.bitwiseAND(lit(0xFFFFL))
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(
          shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** DuckDB mirror of [[zorder16]] — the same unrolled shift/mask
    * arithmetic as SQL text, kept adjacent so the two stay in sync. */
  def sqlZorder16(x: String, y: String): String = {
    val xm = s"($x & 65535)"
    val ym = s"($y & 65535)"
    (0 until 16).flatMap { i =>
      Seq(s"((($xm >> $i) & 1) << ${2 * i})",
        s"((($ym >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")
  }

  /** Per-file manifest of a Z-order layout of `orders` on
    * (o_custkey, order-day): file id = zval >> shift, with each file's
    * row count and min/max of BOTH dimensions — the stats a skipping
    * scan consults. Narrow ranges in both columns across all files is
    * the Z-order property itself, which the spec asserts against the
    * 1-D sort counterexample. */
  def zorderManifest(orders: DataFrame, shift: Int): DataFrame = {
    orders
      .select(col("o_custkey").as("ck"),
        expr("unix_micros(cast(o_orderdate as timestamp))" +
          " div 86400000000").as("day"))
      .withColumn("zval", zorder16(col("ck"), col("day")))
      .withColumn("file_id", shiftright(col("zval"), shift))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("ck").as("min_ck"), max("ck").as("max_ck"),
        min("day").as("min_day"), max("day").as("max_day"))
      .orderBy("file_id")
  }

  private val ManifestShift = 20

  val queries: Seq[Q] = Seq(

    // ---- Z-order layout manifest: one keyed aggregate over the
    //      codegen'd interleave — budget 2 (agg + output sort). ----
    Q("q_zorder_manifest", Some(
      s"""WITH z AS (SELECT
         |    (${sqlZorder16("o_custkey",
             "(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000)")})
         |      AS zval,
         |    o_custkey AS ck,
         |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day
         |  FROM orders)
         |SELECT zval >> $ManifestShift AS file_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  MIN(ck) AS min_ck, MAX(ck) AS max_ck,
         |  MIN(day) AS min_day, MAX(day) AS max_day
         |FROM z GROUP BY file_id ORDER BY file_id""".stripMargin)) {
      (s, dir) =>
      zorderManifest(Tables.load(s, dir, "orders"), ManifestShift)
    })
}
