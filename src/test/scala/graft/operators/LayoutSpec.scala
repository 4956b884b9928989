package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: golden curve values, mask hygiene, and the actual
  * skipping property — every file bounds BOTH dimensions — asserted
  * against the 1-D sort counterexample on a synthetic grid. */
class LayoutSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  private def z(x: Long, y: Long): Long = {
    import spark.implicits._
    Seq((x, y)).toDF("x", "y")
      .select(Layout.zorder16(col("x"), col("y"))).head().getLong(0)
  }

  test("zorder16 golden values: bit positions interleave exactly") {
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)      // x occupies even bits
    assert(z(0, 1) == 2L)      // y occupies odd bits
    assert(z(3, 0) == 5L)      // 0b101
    assert(z(0, 3) == 10L)     // 0b1010
    assert(z(0xFFFFL, 0) == 0x55555555L)
    assert(z(0, 0xFFFFL) == 0xAAAAAAAAL)
    assert(z(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
  }

  test("zorder16 masks to 16 bits: overflowing keys alias, never " +
      "corrupt the curve") {
    assert(z(65536L + 3L, 7L) == z(3L, 7L))
    assert(z(3L, 65536L + 7L) == z(3L, 7L))
  }

  test("z-order files bound BOTH dimensions where a 1-D sort bounds " +
      "only one (the file-skipping property)") {
    import spark.implicits._
    // uniform 256x256 grid; file = zval >> 8 → each file is a 16x16 tile
    val grid = (for (x <- 0 until 256; y <- 0 until 256)
      yield (x.toLong, y.toLong)).toDF("x", "y").repartition(8)
    val files = grid
      .withColumn("f", shiftright(Layout.zorder16(col("x"), col("y")), 8))
      .groupBy("f")
      .agg(max("x") - min("x"), max("y") - min("y"), count(lit(1)))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(files.length == 256)
    // every z-order file spans exactly a 16x16 tile in BOTH dims
    assert(files.forall { case (dx, dy, n) =>
      dx == 15L && dy == 15L && n == 256L })
    // counterexample: files cut from the x-sorted order bound x tightly
    // but leave y unbounded (the full 0..255 range) — sorting cannot
    // give two-column skipping
    val sorted = grid
      .withColumn("f", (col("x") * 256 + col("y")).divide(256).cast("long"))
      .groupBy("f").agg(max("y") - min("y"))
      .collect().map(_.getLong(1))
    assert(sorted.forall(_ == 255L))
  }

  test("q_zorder_manifest equals a plain-Scala replay of the manifest " +
      "algebra (interleave, shift, per-file stats)") {
    def interleave(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val rows = graft.Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))" +
          " div 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = rows
      .map { case (ck, day) =>
        (interleave(ck & 0xFFFFL, day & 0xFFFFL) >> 20, ck, day) }
      .groupBy(_._1).view.mapValues { g =>
        (g.size.toLong, g.map(_._2).min, g.map(_._2).max,
          g.map(_._3).min, g.map(_._3).max)
      }.toMap
    val got = Layout.zorderManifest(
        graft.Tables.load(spark, sfDir, "orders"), 20)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == expect)
  }

  test("q_zorder_prune: manifest-kept files are a strict subset, the " +
      "skipped files are NEVER opened (scan numFiles drops), and the " +
      "pruned answer equals the full scan") {
    def scanMetrics(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      df.collect()
      val scans = collect(df.queryExecution.executedPlan) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      val files = scans.map(_.metrics("numFiles").value).sum
      val bytes = scans.map(_.metrics("filesSize").value).sum
      (files, bytes)
    }
    val path = Layout.writeZorderLayout(spark, sfDir)
    val keep = Layout.zorderKeepIds(spark, sfDir)
    val allIds = spark.read.parquet(path).select("file_id").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(keep.toSet.subsetOf(allIds))
    assert(keep.size < allIds.size,
      s"box must not touch every file (keep=$keep of $allIds)")
    val box = col("ck").between(Layout.PruneCkLo, Layout.PruneCkHi) &&
      col("day").between(Layout.PruneDayLo, Layout.PruneDayHi)
    val pruned = spark.read.parquet(path)
      .where(col("file_id").isin(keep: _*) && box)
      .agg(count(lit(1)), sum(graft.Cols.cents(col("o_totalprice"))))
    val full = spark.read.parquet(path).where(box)
      .agg(count(lit(1)), sum(graft.Cols.cents(col("o_totalprice"))))
    // partition filter reaches the file index, not a post-scan filter
    val scanStr = collect(pruned.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head.toString
    assert(scanStr.contains("PartitionFilters") &&
      scanStr.contains("file_id"),
      s"file_id filter not pushed to the file index:\n$scanStr")
    val (pf, pb) = scanMetrics(pruned)
    val (ff, fb) = scanMetrics(full)
    assert(pf < ff, s"pruned scan read $pf files vs full $ff — no skip")
    assert(pb < fb, s"pruned scan read $pb bytes vs full $fb")
    assert(pruned.collect().toSeq.map(_.toSeq) ==
      full.collect().toSeq.map(_.toSeq),
      "pruning changed the answer — the keep set is not lossless")
  }
}
