package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader only surfaces as a raw nanosecond LongType (via
  * `spark.sql.legacy.parquet.nanosAsLong`). [[events]] normalizes it back to
  * a microsecond TimestampType with exact integer arithmetic (`div 1000`,
  * never double division — 2024 epoch-nanos exceed 2^53).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Spread rows across the session's full parallelism before an
    * explode/heavy-projection stage: a small single-file parquet arrives
    * as ONE scan partition (file < maxPartitionBytes), which would
    * serialize all downstream CPU work onto a single core; at 100 TB the
    * scan is already wide and this slim-row shuffle is noise. With
    * `keys`, spread by hash of those columns so a downstream per-key
    * aggregate reuses the partitioning instead of adding a second
    * exchange of the (much wider) exploded rows. */
  def spread(df: DataFrame, keys: Column*): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (keys.isEmpty) df.repartition(n) else df.repartition(n, keys: _*)
  }

  /** ns-long `ts` → TimestampType(µs); floor semantics match DuckDB's
    * `epoch_us` truncation on the same values. */
  private def normalizeTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
}
