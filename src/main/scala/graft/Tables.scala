package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** ns-long `ts` → TimestampType(µs); floor semantics match DuckDB's
    * `epoch_us` truncation on the same values. */
  private def normalizeTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
}
