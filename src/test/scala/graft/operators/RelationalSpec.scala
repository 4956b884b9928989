package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Relational inventory: structural invariants the DuckDB oracle can't
  * express (the oracle already pins values cell-exact at sf0.01).
  */
class RelationalSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q18_large_orders: every survivor's quantity replays from raw " +
      "lineitem and clears the threshold") {
    val rows = run("q18_large_orders").collect()
    assert(rows.nonEmpty)
    val got = rows.map(r => r.getLong(2) -> r.getDouble(5)).toMap
    val truth = Tables.load(spark, sfDir, "lineitem")
      .where(col("l_orderkey").isin(got.keys.toSeq: _*))
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (k, q) =>
      assert(q > 300.0, s"order $k qty $q below threshold")
      assert(truth(k) == q, s"order $k replay ${truth(k)} != $q")
    }
    // top-100 ordering: totalprice descending
    val prices = rows.map(_.getDouble(4))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q13_order_count_dist: the distribution conserves both customers " +
      "and orders") {
    val rows = run("q13_order_count_dist").collect()
    val nCust = Tables.load(spark, sfDir, "customer").count()
    val nOrd = Tables.load(spark, sfDir, "orders").count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == nOrd)
  }

  test("q14_promo_revenue: promo share is a valid fraction of the total " +
      "in exact ppm") {
    val r = run("q14_promo_revenue").collect()(0)
    val (promo, total, ppm) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(promo >= 0 && promo <= total)
    assert(ppm == promo * 1000000L / total)
  }

  test("q17_small_qty_revenue: every qualifying row replays the 5·n·qty " +
      "< sum cross-multiplication from raw lineitem") {
    val line = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
      .where(col("p_brand") === "Brand#23")
    val stats = line.groupBy("l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("qs"),
        count(lit(1)).as("n"))
    val manual = line
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(stats, Seq("l_partkey"))
      .where(col("l_quantity").cast("long") * 5 * col("n") < col("qs"))
      .agg(count(lit(1))).collect()(0).getLong(0)
    assert(run("q17_small_qty_revenue").collect()(0).getLong(1) == manual)
  }

  test("q22_idle_customers: survivors clear the positive-balance average " +
      "and have no orders after the cutoff") {
    val total = run("q22_idle_customers").collect().map(_.getLong(1)).sum
    val cust = Tables.load(spark, sfDir, "customer")
    val bal = cust.where(col("c_acctbal") > 0.0)
      .agg(sum(round(col("c_acctbal") * 100).cast("long")).as("s"),
        count(lit(1)).as("cnt"))
      .select(expr("s DIV cnt")).collect()(0).getLong(0)
    val manual = cust
      .where(round(col("c_acctbal") * 100).cast("long") > bal)
      .join(Tables.load(spark, sfDir, "orders")
          .where(col("o_orderdate") >= lit("2000-01-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(total == manual && total > 0)
  }

  test("q7_nation_volume: only the filtered nation pair appears, in both " +
      "directions, and revenue is positive") {
    // sf0.01: at sf0.001 the 2/625 nation-pair filter has no survivors.
    val rows = SparkEntry.queries("q7_nation_volume")(spark, sf01Dir).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_1", "NATION_2"), ("NATION_2", "NATION_1"))))
    assert(rows.forall(_.getDouble(3) > 0))
  }
}
