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
}
