package graft

import org.apache.spark.sql.functions._

/** The exact-cents money aggregation must be order-insensitive (the whole
  * point: double sums associate differently across partitionings; cents
  * sums cannot).
  */
class ColsSpec extends SparkSpec {
  import spark.implicits._

  test("moneySum is identical across partitionings and row orders") {
    val values = (1 to 10000).map(i => (i % 997) * 0.01 + (i % 13) * 10.07)
    def total(partitions: Int, seq: Seq[Double]): Double =
      spark.createDataset(seq).repartition(partitions).toDF("v")
        .agg(Cols.moneySum(col("v")).as("s"))
        .head().getDouble(0)
    val t1 = total(1, values)
    assert(total(7, values) == t1)
    assert(total(32, scala.util.Random.shuffle(values)) == t1)
  }

  test("cents follows the binary double, the same one DuckDB sees") {
    val out = Seq(0.005, 0.015, 1.005).toDF("v")
      .select(Cols.cents(col("v")).as("c")).as[Long].collect().toSeq
    // 0.005*100 and 0.015*100 land above the half (0.5000000000000001,
    // 1.5000000000000002) => 1, 2; 1.005*100 lands below
    // (100.49999999999999) => 100. What matters is Spark and DuckDB agree
    // on the identical binary double — exactness, not decimal intuition.
    assert(out == Seq(1L, 2L, 100L))
  }
}
