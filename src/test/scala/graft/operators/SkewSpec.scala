package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join correctness: same result as the plain join, with the hot
  * key's rows actually spread across salt buckets.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data, and spreads the " +
      "hot key") {
    // 10k rows of one hot key + a uniform tail
    val left = ((1 to 10000).map(i => ("hot", i)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i))).toDF("key", "lv")
    val right = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.toDF("key", "rv")

    val plain = left.join(right, "key")
      .select("key", "lv", "rv").collect().toSet
    val salted = Skew.saltedJoin(left, right, "key", salt = 8)
      .select("key", "lv", "rv").collect().toSet
    assert(salted == plain)

    // the scatter actually uses multiple buckets for the hot key
    val buckets = left.where(col("key") === "hot")
      .withColumn("__salt",
        pmod(xxhash64(col("key"), col("lv")), lit(8)))
      .select("__salt").distinct().count()
    assert(buckets == 8)
  }

  test("saltedJoin spreads the hot key across shuffle partitions where " +
      "the plain join serializes it into one") {
    // force a shuffle join (no broadcast) so partition placement is the
    // thing under test; AQE off to keep the partitioning observable
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    import s.implicits._
    val left = ((1 to 10000).map(i => ("hot", i)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i))).toDF("key", "lv")
    val right = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.toDF("key", "rv")

    val saltedParts = Skew.saltedJoin(left, right, "key", salt = 8)
      .where(col("key") === "hot")
      .select(spark_partition_id().as("p")).distinct().count()
    val plainParts = left.join(right, "key")
      .where(col("key") === "hot")
      .select(spark_partition_id().as("p")).distinct().count()
    assert(plainParts == 1, "unsalted shuffle join must co-locate the hot key")
    assert(saltedParts > 1,
      s"salted join must spread the hot key, got $saltedParts partition(s)")
  }
}
