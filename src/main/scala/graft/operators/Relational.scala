package graft.operators

import graft.{Cols, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query inventory over the TPC-H-ish synthetic tables:
  * aggregation, joins (broadcast / shuffle / semi / anti), rollup, top-k,
  * set ops, string / math / JSON scalar functions. Everything is a
  * declarative DataFrame plan — filters and projections reach the parquet
  * scan, partial aggregation is automatic, and Catalyst/AQE pick join
  * strategies from stats (we only hint `broadcast` for the genuinely tiny
  * dimensions `region`/`nation`, which stay broadcast-able at any scale).
  */
object Relational {
  import Cols._

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val revenue = "l_extendedprice*(1-l_discount)"

  val queries: Seq[Q] = Seq(

    // ---- TPC-H Q1 shape: scan-heavy grouped aggregation ----
    Q("q1_pricing_summary", Some(
      s"""SELECT l_returnflag, l_linestatus,
         |  SUM(l_quantity) AS sum_qty,
         |  ${sqlMoneySum("l_extendedprice")} AS sum_base_price,
         |  ${sqlMoneySum(revenue)} AS sum_disc_price,
         |  ${sqlMoneySum(s"($revenue)*(1+l_tax)")} AS sum_charge,
         |  SUM(l_quantity)/COUNT(*) AS avg_qty,
         |  (${sqlMoneySum("l_extendedprice")})/COUNT(*) AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin)) { (s, dir) =>
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("2000-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          moneySum(rev).as("sum_disc_price"),
          moneySum(rev * (lit(1) + col("l_tax"))).as("sum_charge"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"),
          (moneySum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- TPC-H Q3 shape: join + group + top-k ----
    Q("q3_top_unshipped", Some(
      s"""SELECT o_orderkey, revenue, o_orderdate FROM (
         |  SELECT o_orderkey, o_orderdate, ${sqlMoneySum(revenue)} AS revenue
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment = 'BUILDING'
         |    AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
         |    AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
         |  GROUP BY o_orderkey, o_orderdate)
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)) { (s, dir) =>
      val cust = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders").where(col("o_orderdate") < lit("1998-07-01"))
      val line = t(s, dir, "lineitem").where(col("l_shipdate") > lit("1998-07-01"))
      line.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate")
    },

    // ---- TPC-H Q5 shape: 6-way join, broadcast dims ----
    Q("q5_region_revenue", Some(
      s"""SELECT n_name, ${sqlMoneySum(revenue)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)) { (s, dir) =>
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1999-01-01"))
      t(s, dir, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---- TPC-H Q10 shape: returned-item revenue per customer, top 20.
    //      Big-big join shuffles on the order key, nation broadcasts,
    //      and the global top-20 is TakeOrderedAndProject (per-partition
    //      heads merged on the driver — never a full sort). ----
    Q("q10_returned_items", Some(
      s"""SELECT c_custkey, c_name, ${sqlMoneySum(revenue)} AS revenue,
         |  n_name
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)) {
      (s, dir) =>
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1995-10-01") &&
          col("o_orderdate") < lit("1996-01-01"))
      t(s, dir, "lineitem").where(col("l_returnflag") === "R")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // ---- TPC-H Q18 shape: large-volume orders. The classic
    //      HAVING-subquery form re-joins raw lineitem and re-aggregates;
    //      here the per-order quantity aggregate is computed ONCE and
    //      joined directly (one row per qualifying order, so the second
    //      aggregate is provably redundant). Scale: one keyed lineitem
    //      aggregate, the >threshold survivor set is a tiny fraction
    //      (p99.9 of order volume), and AQE broadcast-joins it against
    //      orders/customer from runtime stats. ----
    Q("q18_large_orders", Some(
      """WITH big AS (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        |             FROM lineitem GROUP BY l_orderkey
        |             HAVING SUM(l_quantity) > 300)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  sum_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin)) { (s, dir) =>
      val big = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("sum_qty"))
        .where(col("sum_qty") > 300)
      big
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
          "o_totalprice", "sum_qty")
        .orderBy(col("o_totalprice").desc, col("o_orderdate"),
          col("o_orderkey"))
        .limit(100)
    },

    // ---- data profiler: per-column null and distinct counts over
    //      orders in ONE pass (one expand aggregate — the multi-column
    //      distinct counts share a single scan and exchange), reshaped
    //      by stack() on the 1-row result. What a quality dashboard or
    //      schema-drift monitor runs per partition-load at scale. ----
    Q("q_data_profile", Some(
      """SELECT 'o_custkey' AS col_name,
        |  CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_null,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct
        |FROM orders
        |UNION ALL SELECT 'o_orderdate',
        |  CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) FROM orders
        |UNION ALL SELECT 'o_orderkey',
        |  CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
        |UNION ALL SELECT 'o_orderpriority',
        |  CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders
        |UNION ALL SELECT 'o_orderstatus',
        |  CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders
        |UNION ALL SELECT 'o_totalprice',
        |  CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) FROM orders
        |ORDER BY col_name""".stripMargin)) { (s, dir) =>
      val cols = Seq("o_custkey", "o_orderdate", "o_orderkey",
        "o_orderpriority", "o_orderstatus", "o_totalprice")
      val aggs = count(lit(1)).as("n") +:
        cols.flatMap(c => Seq(count(col(c)).as(s"c_$c"),
          countDistinct(col(c)).as(s"d_$c")))
      val one = t(s, dir, "orders").agg(aggs.head, aggs.tail: _*)
      val stackArgs = cols.map(c =>
        s"'$c', n - c_$c, d_$c").mkString(", ")
      one.select(expr(
          s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct)"))
        .orderBy("col_name")
    },

    // ---- semi / anti joins ----
    Q("q_semi_join", Some(
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").where(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")
    },

    Q("q_anti_join", Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },

    // ---- uncorrelated scalar subquery, through the SQL entry path (the
    //      one inventory query exercising spark.sql + the parser; the
    //      threshold is computed in exact integer cents with DIV so both
    //      engines agree bit-for-bit — avg-of-doubles would put
    //      borderline rows at the mercy of summation order) ----
    Q("q_scalar_subquery", Some(
      """SELECT o_orderpriority, COUNT(*) AS n_above
        |FROM orders
        |WHERE CAST(ROUND(o_totalprice*100) AS BIGINT) >
        |  (SELECT SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) // COUNT(*)
        |   FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)) {
      (s, dir) =>
        t(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql(
          """SELECT o_orderpriority, COUNT(*) AS n_above
            |FROM orders_v
            |WHERE CAST(ROUND(o_totalprice*100) AS BIGINT) >
            |  (SELECT SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) DIV COUNT(*)
            |   FROM orders_v)
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // ---- conditional aggregation: count_if / FILTER clause ----
    Q("q_conditional_agg", Some(
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  COUNT(*) FILTER (WHERE l_discount = 0) AS n_nodisc,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count_if(col("l_quantity") > 25).as("n_big"),
            count_if(col("l_discount") === 0).as("n_nodisc"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
    },

    // ---- null semantics: nullif/coalesce derivation + null-safe
    //      equality (<=> / IS NOT DISTINCT FROM) + COUNT(col) skipping
    //      nulls (the base tables are null-free, so nulls are derived) ----
    Q("q_null_semantics", Some(
      """SELECT COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS st,
        |  COUNT(*) AS n,
        |  COUNT(NULLIF(o_orderpriority, '1-URGENT')) AS n_nonurgent,
        |  CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'O')
        |                     IS NOT DISTINCT FROM NULL
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_nulled
        |FROM orders GROUP BY st ORDER BY st""".stripMargin)) { (s, dir) =>
      val nulled = nullif(col("o_orderstatus"), lit("O"))
      t(s, dir, "orders")
        .groupBy(coalesce(nulled, lit("OPEN")).as("st"))
        .agg(
          count(lit(1)).as("n"),
          count(nullif(col("o_orderpriority"), lit("1-URGENT")))
            .as("n_nonurgent"),
          sum(when(nulled <=> lit(null), 1).otherwise(0)).cast("long")
            .as("n_nulled"))
        .orderBy("st")
    },

    // ---- left outer join: preserved-side rows with no match surface as
    //      NULLs; COUNT(col) counts only matches ----
    Q("q_left_join", Some(
      """SELECT n_name, COUNT(s_suppkey) AS n_supp
        |FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)) { (s, dir) =>
      t(s, dir, "nation")
        .join(t(s, dir, "supplier"),
          col("s_nationkey") === col("n_nationkey"), "left")
        .groupBy("n_name")
        .agg(count(col("s_suppkey")).as("n_supp"))
        .orderBy("n_name")
    },

    // ---- full outer join: classify each custkey by which side(s) have
    //      it. The sides are deliberately asymmetric subsets (custkey
    //      divisible by 3 vs by 2) so all three outcomes — matched,
    //      left-only NULL-extension, right-only NULL-extension — actually
    //      occur (the raw tables are referentially intact, which would
    //      degenerate the outer join to inner) ----
    Q("q_full_outer_join", Some(
      """SELECT CASE WHEN c_custkey IS NULL THEN 'order_only'
        |            WHEN n_orders IS NULL THEN 'customer_only'
        |            ELSE 'both' END AS side,
        |       COUNT(*) AS n
        |FROM (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0) c
        |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders
        |           FROM orders WHERE o_custkey % 2 = 0
        |           GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey
        |GROUP BY side ORDER BY side""".stripMargin)) { (s, dir) =>
      val cust = t(s, dir, "customer")
        .where(col("c_custkey") % 3 === 0).select("c_custkey")
      val perCust = t(s, dir, "orders")
        .where(col("o_custkey") % 2 === 0)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      cust
        .join(perCust, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          when(col("c_custkey").isNull, "order_only")
            .when(col("n_orders").isNull, "customer_only")
            .otherwise("both").as("side"))
        .groupBy("side").agg(count(lit(1)).as("n"))
        .orderBy("side")
    },

    // ---- max_by / min_by (argmax aggregates): richest/poorest customer
    //      per nation. Ordering key is the (acctbal, custkey) struct so
    //      ties on acctbal break deterministically; the oracle mirrors
    //      with a window (DuckDB's arg_max has no struct-key form) ----
    Q("q_argmax", Some(
      """SELECT nk, MAX(CASE WHEN rnd = 1 THEN c_name END) AS richest,
        |       MAX(CASE WHEN rna = 1 THEN c_name END) AS poorest
        |FROM (
        |  SELECT c_nationkey AS nk, c_name,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey DESC) AS rnd,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal ASC, c_custkey ASC) AS rna
        |  FROM customer)
        |GROUP BY nk ORDER BY nk""".stripMargin)) { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nk"))
        .agg(
          max_by(col("c_name"),
            struct(col("c_acctbal"), col("c_custkey"))).as("richest"),
          min_by(col("c_name"),
            struct(col("c_acctbal"), col("c_custkey"))).as("poorest"))
        .orderBy("nk")
    },

    // ---- salted skew join: orders (salted fact) ⋈ customer (replicated
    //      dim) through Skew.saltedJoin — salting is result-invariant, so
    //      a plain SQL join is the oracle. The plan assert that the salt
    //      actually spreads a hot key across partitions lives in
    //      SkewSpec; this entry proves the operator end-to-end on real
    //      tables. ----
    Q("q_skew_join", Some(
      s"""SELECT c_nationkey AS nationkey, COUNT(*) AS n_orders,
         |  ${sqlMoneySum("o_totalprice")} AS sum_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_nationkey ORDER BY nationkey""".stripMargin)) { (s, dir) =>
      // project BEFORE salting: the scatter hashes every column of its
      // input, so salting the raw table would pull all 6 order columns
      // into the scan and defeat column pruning (ReadSchema stays
      // 2-wide this way — verified in PLANS.md)
      val orders = t(s, dir, "orders")
        .select(col("o_custkey").as("custkey"), col("o_totalprice"))
      val cust = t(s, dir, "customer")
        .withColumnRenamed("c_custkey", "custkey")
        .select("custkey", "c_nationkey")
      Skew.saltedJoin(orders, cust, "custkey", salt = 8)
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("nationkey")
    },

    // ---- rollup (grouping sets) ----
    Q("q_rollup", Some(
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       COUNT(*) AS n, SUM(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin)) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")
    },

    // ---- cube (full grouping-set lattice) ----
    Q("q_cube", Some(
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       COUNT(*) AS n, SUM(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin)) { (s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")
    },

    // ---- exact percentiles (interpolated, on exact integer cents) ----
    Q("q_percentiles", Some(
      """SELECT l_returnflag,
        |  quantile_cont(CAST(ROUND(l_extendedprice*100) AS BIGINT), 0.5)/100.0
        |    AS p50,
        |  quantile_cont(CAST(ROUND(l_extendedprice*100) AS BIGINT), 0.9)/100.0
        |    AS p90,
        |  CAST(MAX(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0
        |    AS mx
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)) {
      (s, dir) =>
        val c = cents(col("l_extendedprice"))
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg((percentile(c, lit(0.5)) / 100.0).as("p50"),
            (percentile(c, lit(0.9)) / 100.0).as("p90"),
            (max(c) / 100.0).as("mx"))
          .orderBy("l_returnflag")
    },

    // ---- quantile sketch (the scale path for percentiles). Same
    //      discipline as q_approx_distinct: the exact interpolated
    //      percentile hash-matches the oracle, and approx_ok asserts the
    //      KLL-style sketch (percentile_approx) landed within 2% — the
    //      oracle demands TRUE, so a broken sketch fails the gate. ----
    Q("q_approx_percentile", Some(
      """SELECT l_returnflag,
        |  quantile_cont(CAST(ROUND(l_extendedprice*100) AS BIGINT), 0.5)/100.0
        |    AS p50_exact,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)) {
      (s, dir) =>
        val c = cents(col("l_extendedprice"))
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg((percentile(c, lit(0.5)) / 100.0).as("p50_exact"),
            (percentile_approx(c, lit(0.5), lit(10000)) / 100.0).as("p50_approx"))
          .withColumn("approx_ok",
            abs(col("p50_approx") - col("p50_exact")) /
              col("p50_exact") <= 0.02)
          .select("l_returnflag", "p50_exact", "approx_ok")
          .orderBy("l_returnflag")
    },

    // ---- pivot (wide aggregation) ----
    Q("q_pivot", Some(
      """SELECT l_returnflag,
        |  CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS F,
        |  CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS O
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O"))
        .orderBy("l_returnflag")
    },

    // ---- date-part extraction ----
    Q("q_date_parts", Some(
      """SELECT o_orderkey,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
        |  CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS d,
        |  CAST(EXTRACT(hour FROM o_orderdate) AS INTEGER) AS h,
        |  CAST(o_orderdate AS DATE) + INTERVAL 30 DAY =
        |    CAST(o_orderdate AS DATE) + 30 AS add_consistent
        |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin)) { (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        hour(col("o_orderdate")).as("h"),
        (date_add(col("o_orderdate").cast("date"), 30) ===
          col("o_orderdate").cast("date").plus(expr("INTERVAL 30 DAY")))
          .as("add_consistent"))
        .orderBy("o_orderkey").limit(1000)
    },

    // ---- explicit grouping sets (beyond rollup/cube) ----
    Q("q_grouping_sets", Some(
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY rf, ls""".stripMargin)) { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
          |       COALESCE(l_linestatus, 'ALL') AS ls,
          |       COUNT(*) AS n
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          |ORDER BY rf, ls""".stripMargin)
    },

    // ---- extended window functions ----
    Q("q_window_funcs", Some(
      """SELECT o_orderkey,
        |  CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
        |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
        |  CAST(PERCENT_RANK() OVER w AS DOUBLE) AS prnk,
        |  CAST(CUME_DIST() OVER w AS DOUBLE) AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_orderkey"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"))
        .orderBy("o_orderkey")
    },

    // ---- correlated scalar subquery (Catalyst decorrelation) ----
    Q("q_corr_subquery", Some(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice)
        |                          FROM orders o2
        |                          WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)) { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders_cs")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM orders_cs o
          |WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice)
          |                          FROM orders_cs o2
          |                          WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // ---- union all + aggregation over the union ----
    Q("q_union_all", Some(
      """SELECT side, COUNT(*) AS n FROM (
        |  SELECT 'cust' AS side, c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT 'supp' AS side, s_nationkey AS nk FROM supplier)
        |GROUP BY side ORDER BY side""".stripMargin)) { (s, dir) =>
      t(s, dir, "customer").select(lit("cust").as("side"),
          col("c_nationkey").as("nk"))
        .unionAll(t(s, dir, "supplier").select(lit("supp").as("side"),
          col("s_nationkey").as("nk")))
        .groupBy("side").agg(count(lit(1)).as("n"))
        .orderBy("side")
    },

    // ---- array functions: collect, sort, slice, stringify ----
    Q("q_array_funcs", Some(
      """SELECT c_nationkey AS nk,
        |  COUNT(*) AS n_cust,
        |  array_to_string(list_sort(list(c_custkey))[1:5], ',') AS first5
        |FROM customer GROUP BY c_nationkey ORDER BY nk""".stripMargin)) {
      (s, dir) =>
        t(s, dir, "customer")
          .groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_cust"),
            array_join(slice(array_sort(collect_list(col("c_custkey"))),
              1, 5), ",").as("first5"))
          .orderBy("nk")
    },

    // ---- HLL sketch: approximate distinct counting (the scale path for
    //      count-distinct). Sketch estimates are engine-specific, so the
    //      sketch itself can't hash-match DuckDB — instead the query
    //      emits the exact count (oracle-checked) plus `approx_ok`, the
    //      claim that Spark's HLL landed within 5% of exact; the oracle
    //      demands TRUE, so a broken sketch now FAILS the gate instead of
    //      going unchecked. ----
    Q("q_approx_distinct", Some(
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(*) AS n,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          // rsd 0.01 so the 5% gate sits at ~5 sigma — the default rsd
          // of 0.05 would make a one-sigma (routine) estimate breach the
          // gate on roughly a third of (data, group) combinations
          .agg(countDistinct(col("l_partkey")).as("exact_parts"),
            count(lit(1)).as("n"),
            approx_count_distinct(col("l_partkey"), 0.01).as("approx"))
          .withColumn("approx_ok",
            abs(col("approx") - col("exact_parts")).cast("double") /
              col("exact_parts") <= 0.05)
          .select("l_returnflag", "exact_parts", "n", "approx_ok")
          .orderBy("l_returnflag")
    },

    // ---- order-by + limit (top-k, TakeOrderedAndProject) ----
    Q("q_topk_orders", Some(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)) { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    // ---- set operations ----
    Q("q_except_nations", Some(
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin)) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    Q("q_intersect_nations", Some(
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin)) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    // ---- scalar string functions ----
    Q("q_string_funcs", Some(
      """SELECT p_partkey,
        |  UPPER(p_name) AS name_up,
        |  CAST(LENGTH(p_name) AS INTEGER) AS name_len,
        |  CAST(SUBSTR(p_brand, 7) AS INTEGER) AS brand_no,
        |  SPLIT_PART(p_type, ' ', 1) AS type_head,
        |  LPAD(CAST(p_size AS VARCHAR), 3, '0') AS size_pad,
        |  CONCAT(p_brand, ':', p_type) AS brand_type,
        |  REPLACE(p_name, ' ', '_') AS name_snake
        |FROM part ORDER BY p_partkey""".stripMargin)) { (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_up"),
        length(col("p_name")).as("name_len"),
        substring(col("p_brand"), 7, 16).cast("int").as("brand_no"),
        substring_index(col("p_type"), " ", 1).as("type_head"),
        lpad(col("p_size").cast("string"), 3, "0").as("size_pad"),
        concat_ws(":", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"))
        .orderBy("p_partkey")
    },

    // ---- scalar math functions (IEEE-exact ops only, so the oracle
    //      hash-matches bit-for-bit) ----
    Q("q_math_funcs", Some(
      """SELECT p_partkey,
        |  SQRT(p_retailprice) AS price_sqrt,
        |  CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
        |  CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
        |  p_size * p_size AS size_sq,
        |  p_size % 7 AS size_mod,
        |  ABS(p_size - 25) AS size_absdev
        |FROM part ORDER BY p_partkey""".stripMargin)) { (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        sqrt(col("p_retailprice")).as("price_sqrt"),
        floor(col("p_retailprice")).as("price_floor"),
        ceil(col("p_retailprice")).as("price_ceil"),
        (col("p_size") * col("p_size")).as("size_sq"),
        (col("p_size") % 7).as("size_mod"),
        abs(col("p_size") - 25).as("size_absdev"))
        .orderBy("p_partkey")
    },

    // ---- ordered string aggregation (listagg / string_agg) ----
    // collect_list order is partition-dependent, so the list is sorted
    // before joining — the only deterministic form at any parallelism.
    Q("q_string_agg", Some(
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)) { (s, dir) =>
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(array_join(array_sort(collect_list("n_name")), ",")
            .as("nations"),
          count(lit(1)).as("n"))
        .orderBy("r_name")
    },

    // ---- EXISTS / NOT EXISTS correlated predicates (decorrelated by
    //      Catalyst into semi/anti joins) ----
    Q("q_exists_subquery", Some(
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice < 10000)
        |ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("customer_ex")
      t(s, dir, "orders").createOrReplaceTempView("orders_ex")
      s.sql(
        """SELECT c_custkey FROM customer_ex c
          |WHERE EXISTS (SELECT 1 FROM orders_ex o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_totalprice > 400000)
          |  AND NOT EXISTS (SELECT 1 FROM orders_ex o
          |                  WHERE o.o_custkey = c.c_custkey
          |                    AND o.o_totalprice < 10000)
          |ORDER BY c_custkey""".stripMargin)
    },

    // ---- value-picking window functions over explicit ROWS frames ----
    // (q_range_frame covers RANGE; this pins first/last/nth semantics,
    // where last_value needs the UNBOUNDED FOLLOWING frame to mean
    // "partition last" rather than "current row".)
    Q("q_first_last_window", Some(
      """SELECT o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER (
        |    PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS last_price,
        |  nth_value(o_totalprice, 3) OVER w AS third_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin)) { (s, dir) =>
      val byDate = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val w = byDate.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val wAll = byDate.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, dir, "orders").select(
        col("o_orderkey"),
        first("o_totalprice").over(w).as("first_price"),
        last("o_totalprice").over(wAll).as("last_price"),
        nth_value(col("o_totalprice"), 3).over(w).as("third_price"))
        .orderBy("o_orderkey")
    },

    // ---- bitwise aggregates ----
    Q("q_bitwise_agg", Some(
      """SELECT l_returnflag,
        |  CAST(bit_and(l_orderkey) AS BIGINT) AS k_and,
        |  CAST(bit_or(l_orderkey) AS BIGINT) AS k_or,
        |  CAST(bit_xor(l_orderkey) AS BIGINT) AS k_xor,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(bit_and(col("l_orderkey")).as("k_and"),
          bit_or(col("l_orderkey")).as("k_or"),
          bit_xor(col("l_orderkey")).as("k_xor"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // ---- correlation/covariance moments, exactly ----
    // The five sufficient statistics of corr/covar as exact BIGINT sums
    // (quantity <= 50 and whole-dollar prices keep every sum far inside
    // 2^63 at any sf) — the fp corr() itself is pinned by a spec against
    // these moments, while the oracle stays bit-exact.
    Q("q_corr_moments", Some(
      """SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
        |  CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
        |  CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
        |    AS BIGINT) AS sxx,
        |  CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT)
        |    * CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)
        |    * CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)) { (s, dir) =>
      val x = col("l_quantity").cast("long")
      val y = round(col("l_extendedprice")).cast("long")
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"),
          sum(x * y).as("sxy"))
        .orderBy("l_returnflag")
    },

    // ---- null-on-error arithmetic (try_* family) ----
    // try_divide yields NULL where the divisor hits zero instead of
    // failing the job under ANSI semantics — the behavior a long pipeline
    // over dirty data wants. IEEE double division is deterministic, so
    // the non-null quotients hash-match without rounding.
    Q("q_try_arith", Some(
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity = 50 THEN NULL
        |       ELSE l_extendedprice / (l_quantity - 50) END AS div_to_cap,
        |  CASE WHEN l_quantity = 1 THEN NULL
        |       ELSE l_extendedprice / (l_quantity - 1) END AS div_from_one
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)) { (s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          try_divide(col("l_extendedprice"), col("l_quantity") - 50)
            .as("div_to_cap"),
          try_divide(col("l_extendedprice"), col("l_quantity") - 1)
            .as("div_from_one"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- regexp_extract_all as a generator-ish scalar ----
    // (`get` is the OOB-null element accessor — element_at throws under
    // ANSI when a doc has no match.)
    Q("q_regexp_extract_all", Some(
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\bs[a-z]+')) AS INTEGER)
        |    AS n_s_words,
        |  regexp_extract_all(text, '\bs[a-z]+')[1] AS first_s_word
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      val hits = regexp_extract_all(col("text"), lit("\\bs[a-z]+"), lit(0))
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        size(hits).as("n_s_words"),
        get(hits, lit(0)).as("first_s_word"))
        .orderBy("doc_id")
    },

    // ---- unpivot (wide -> long): per-nation entity counts melted to
    //      (nation, metric, cnt) rows via Dataset.unpivot — the Spark
    //      relational form of melt; the oracle states the same reshape as
    //      plain-ANSI UNION ALL. Both join sides pre-aggregate to 25 rows
    //      before the melt, so the wide frame is broadcast-tiny. ----
    Q("q_unpivot", Some(
      """WITH w AS (
        |  SELECT n.n_name,
        |    (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey)
        |      AS customers,
        |    (SELECT COUNT(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
        |      AS suppliers
        |  FROM nation n)
        |SELECT n_name, 'customers' AS metric, customers AS cnt FROM w
        |UNION ALL
        |SELECT n_name, 'suppliers' AS metric, suppliers AS cnt FROM w
        |ORDER BY n_name, metric""".stripMargin)) { (s, dir) =>
      val cust = t(s, dir, "customer").groupBy("c_nationkey")
        .agg(count(lit(1)).as("customers"))
      val supp = t(s, dir, "supplier").groupBy("s_nationkey")
        .agg(count(lit(1)).as("suppliers"))
      t(s, dir, "nation")
        .join(cust, col("n_nationkey") === col("c_nationkey"), "left")
        .join(supp, col("n_nationkey") === col("s_nationkey"), "left")
        .select(col("n_name"), coalesce(col("customers"), lit(0L)).as("customers"),
          coalesce(col("suppliers"), lit(0L)).as("suppliers"))
        .unpivot(Array(col("n_name")),
          Array(col("customers"), col("suppliers")), "metric", "cnt")
        .orderBy("n_name", "metric")
    },

    // ---- fixed-bound histogram (data profiling): bucket arithmetic is
    //      spelled out as identical double ops in both engines (the
    //      built-in width_bucket's internal formula is engine-specific at
    //      boundary ulps, so the oracle-exact form owns the math). One
    //      scan, one 20-group aggregate. ----
    Q("q_histogram", Some(
      s"""WITH h AS (SELECT
         |  CAST(FLOOR((o_totalprice - 0) * 20 / 600000.0) AS BIGINT)
         |    AS bucket, o_totalprice
         |  FROM orders WHERE o_totalprice >= 0 AND o_totalprice < 600000)
         |SELECT bucket, CAST(bucket * 30000.0 AS DOUBLE) AS lo,
         |  CAST((bucket+1) * 30000.0 AS DOUBLE) AS hi,
         |  COUNT(*) AS n, ${sqlMoneySum("o_totalprice")} AS sum_price
         |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin)) { (s, dir) =>
      val bucket = floor((col("o_totalprice") - lit(0)) * lit(20)
        / lit(600000.0)).cast("long")
      t(s, dir, "orders")
        .where(col("o_totalprice") >= 0 && col("o_totalprice") < 600000)
        .select(bucket.as("bucket"), col("o_totalprice"))
        .groupBy("bucket")
        .agg((col("bucket") * lit(30000.0)).as("lo"),
          ((col("bucket") + 1) * lit(30000.0)).as("hi"),
          count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("bucket")
    },

    // ---- TPC-H Q6 shape: single-table forecast-revenue filter + global
    //      aggregate. The whole predicate reaches the parquet scan
    //      (PushedFilters on shipdate/discount/quantity), partial sums
    //      combine map-side, and one row crosses the final exchange.
    //      Revenue is exact integer cents so summation order is moot. ----
    Q("q6_forecast_revenue", Some(
      s"""SELECT ${sqlMoneySum("l_extendedprice*l_discount")} AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24""".stripMargin)) { (s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(moneySum(col("l_extendedprice") * col("l_discount"))
          .as("revenue"), count(lit(1)).as("n"))
    },

    // ---- TPC-H Q7 shape: cross-nation shipping volume between a named
    //      nation pair, by ship year. The two nation lookups are the SAME
    //      tiny broadcast table joined twice under different aliases (one
    //      via supplier, one via customer); the big fact joins shuffle on
    //      their keys; the pair filter prunes 623/625 nation combinations
    //      before the fact rows ever widen. ----
    Q("q7_nation_volume", Some(
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
         |  ${sqlMoneySum(revenue)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)) { (s, dir) =>
      val n1 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation")))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("n1_key"))
        .join(n2, col("c_nationkey") === col("n2_key"))
        .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // ---- TPC-H Q13 shape: customer order-count distribution. A left
    //      outer join (zero-order customers must survive with count 0),
    //      then two cascading aggregates — the first keyed on c_custkey,
    //      the second on the tiny count domain. COUNT(o_orderkey), not
    //      COUNT(*): the null row of an orderless customer must not
    //      count. ----
    Q("q13_order_count_dist", Some(
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)) {
      (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // ---- TPC-H Q14 shape: promo revenue share. One part-keyed join
    //      (part is a dimension — broadcast at any scale where it fits,
    //      AQE decides), conditional + total sums in the same aggregate
    //      (one scan), and the share reported in exact integer parts-per-
    //      million via BIGINT div so neither engine's float division
    //      order matters. ----
    Q("q14_promo_revenue", Some(
      s"""SELECT
         |  CAST(SUM(CASE WHEN p_type = 'PROMO'
         |    THEN CAST(ROUND(($revenue)*100) AS BIGINT) ELSE 0 END)
         |    AS BIGINT) AS promo_cents,
         |  CAST(SUM(CAST(ROUND(($revenue)*100) AS BIGINT)) AS BIGINT)
         |    AS total_cents,
         |  CAST(SUM(CASE WHEN p_type = 'PROMO'
         |      THEN CAST(ROUND(($revenue)*100) AS BIGINT) ELSE 0 END)
         |    * 1000000 // SUM(CAST(ROUND(($revenue)*100) AS BIGINT))
         |    AS BIGINT) AS promo_ppm
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin)) {
      (s, dir) =>
      val cts = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-09-01") &&
          col("l_shipdate") < lit("1996-10-01"))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", cts).otherwise(0L))
            .as("promo_cents"),
          sum(cts).as("total_cents"))
        .select(col("promo_cents"), col("total_cents"),
          expr("promo_cents * 1000000 DIV total_cents").as("promo_ppm"))
    },

    // ---- TPC-H Q17 shape: small-quantity revenue for one brand. The
    //      per-part average-quantity "correlated subquery" is ONE keyed
    //      aggregate over lineitem joined back to the fact (AQE
    //      broadcasts the 2k-part aggregate); the 0.2×avg comparison is
    //      rearranged to integer cross-multiplication (5·n·qty < sum) so
    //      no division ulp can flip a boundary row in either engine. ----
    Q("q17_small_qty_revenue", Some(
      s"""WITH a AS (SELECT l_partkey AS a_partkey,
         |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
         |    COUNT(*) AS n FROM lineitem GROUP BY l_partkey)
         |SELECT ${sqlMoneySum("l_extendedprice")} AS small_qty_revenue,
         |  COUNT(*) AS n_rows
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN a ON l_partkey = a_partkey
         |WHERE p_brand = 'Brand#23'
         |  AND CAST(l_quantity AS BIGINT) * 5 * n < qty_sum""".stripMargin)) {
      (s, dir) =>
      val line = t(s, dir, "lineitem")
      val avgQ = line.groupBy(col("l_partkey").as("a_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("qty_sum"),
          count(lit(1)).as("n"))
      line
        .join(t(s, dir, "part").where(col("p_brand") === "Brand#23"),
          col("l_partkey") === col("p_partkey"))
        .join(avgQ, col("l_partkey") === col("a_partkey"))
        .where(col("l_quantity").cast("long") * 5 * col("n") < col("qty_sum"))
        .agg(moneySum(col("l_extendedprice")).as("small_qty_revenue"),
          count(lit(1)).as("n_rows"))
    },

    // ---- TPC-H Q19 shape: disjunctive brand/size/quantity predicates.
    //      Catalyst can't push the OR-of-ANDs below the join, but the
    //      common bounds (size ≤ 15, quantity ≤ 30) ARE pushed to both
    //      scans as weaker conjuncts; the join stays a plain partkey
    //      equijoin with the residual disjunction as a post-join filter. ----
    Q("q19_disjunct_revenue", Some(
      s"""SELECT ${sqlMoneySum(revenue)} AS revenue, COUNT(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |        AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |        AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin)) { (s, dir) =>
      val branch1 = col("p_brand") === "Brand#12" &&
        col("p_size").between(1, 5) && col("l_quantity").between(1, 11)
      val branch2 = col("p_brand") === "Brand#23" &&
        col("p_size").between(1, 10) && col("l_quantity").between(10, 20)
      val branch3 = col("p_brand") === "Brand#15" &&
        col("p_size").between(1, 15) && col("l_quantity").between(20, 30)
      t(s, dir, "lineitem").where(col("l_quantity").between(1, 30))
        .join(t(s, dir, "part").where(col("p_size").between(1, 15)),
          col("l_partkey") === col("p_partkey"))
        .where(branch1 || branch2 || branch3)
        .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n"))
    },

    // ---- TPC-H Q22 shape: well-funded customers gone idle. The
    //      above-average-balance threshold is an uncorrelated scalar
    //      aggregate in exact integer cents (// both sides), the
    //      "no recent orders" is a left-anti join against the date-pruned
    //      order scan, and the report groups by nation (the schema has no
    //      phone country code). Negative balances: ROUND is half-away-
    //      from-zero in both engines and binary doubles never land on an
    //      exact half, so cents stay bit-identical. ----
    Q("q22_idle_customers", Some(
      """WITH bal AS (SELECT SUM(CAST(ROUND(c_acctbal*100) AS BIGINT))
        |      // COUNT(*) AS avg_cents
        |    FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM customer
        |WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) >
        |    (SELECT avg_cents FROM bal)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)) { (s, dir) =>
      val cust = t(s, dir, "customer")
      // Exact integer division (DIV), not double division + truncate — a
      // double quotient one ulp under an integer would shift the
      // threshold by a cent against DuckDB's //.
      val avgCents = cust.where(col("c_acctbal") > 0.0)
        .agg(sum(cents(col("c_acctbal"))).as("s"), count(lit(1)).as("cnt"))
        .select(expr("s DIV cnt").as("avg_cents"))
        .collect()(0).getLong(0)
      cust
        .where(cents(col("c_acctbal")) > avgCents)
        .join(t(s, dir, "orders")
            .where(col("o_orderdate") >= lit("2000-01-01")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum(cents(col("c_acctbal"))).cast("long").as("total_cents"))
        .orderBy("c_nationkey")
    },

    // ---- TPC-H Q4 shape: order-priority count gated on EXISTS — the
    //      decorrelation benchmark. "Late" is adapted to the reduced
    //      schema (no commit/receipt dates): a lineitem shipped > 30
    //      days after its order date. The EXISTS becomes a left-semi
    //      join with a non-equi residual; both date filters reach the
    //      scans, and the semi join shuffles on the order key only. ----
    Q("q4_priority_late", Some(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)) {
      (s, dir) =>
      t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-04-01"))
        .join(t(s, dir, "lineitem"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >
              col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // ---- TPC-H Q8 shape: market share — the supplier-nation slice of
    //      regional revenue per year, in exact integer ppm (the q14
    //      convention: both engines divide the same exact cent sums, so
    //      no float share ever crosses the hash). Nation joined TWICE
    //      under aliases (customer side routes region membership,
    //      supplier side routes the share predicate); both dims + region
    //      broadcast. One wide join tree → one 2-group aggregate. ----
    Q("q8_market_share", Some {
      val cts = s"CAST(ROUND(($revenue)*100) AS BIGINT)"
      s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         |  CAST(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN $cts ELSE 0 END)
         |    AS BIGINT) AS nation_cents,
         |  CAST(SUM($cts) AS BIGINT) AS total_cents,
         |  CAST(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN $cts ELSE 0 END)
         |    * 1000000 // SUM($cts) AS BIGINT) AS share_ppm
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN region ON cn.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1 ORDER BY o_year""".stripMargin }) { (s, dir) =>
      val cts = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
      val cn = broadcast(t(s, dir, "nation")).as("cn")
      val sn = broadcast(t(s, dir, "nation")).as("sn")
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").where(col("p_type") === "ECONOMY"),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders")
            .where(col("o_orderdate") >= lit("1996-01-01") &&
              col("o_orderdate") < lit("1998-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(cn, col("c_nationkey") === col("cn.n_nationkey"))
        .join(broadcast(t(s, dir, "region").where(col("r_name") === "ASIA")),
          col("cn.n_regionkey") === col("r_regionkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(sn, col("s_nationkey") === col("sn.n_nationkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("sn.n_name") === "NATION_3", cts).otherwise(0L))
            .as("nation_cents"),
          sum(cts).as("total_cents"))
        .select(col("o_year"), col("nation_cents"), col("total_cents"),
          expr("nation_cents * 1000000 DIV total_cents").as("share_ppm"))
        .orderBy("o_year")
    },

    // ---- TPC-H Q15 shape: top supplier by quarterly revenue via the
    //      revenue "view" + scalar-max subquery. The view is one keyed
    //      cent aggregate; the scalar max rides back as a broadcast
    //      1-row join (no driver sync), and the equality compare runs
    //      on exact BIGINT cents so ties reproduce identically. ----
    Q("q15_top_supplier", Some {
      val cts = s"CAST(ROUND(($revenue)*100) AS BIGINT)"
      s"""WITH rev AS (SELECT l_suppkey,
         |    CAST(SUM($cts) AS BIGINT) AS total_cents
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_cents,
         |  total_cents/100.0 AS total_revenue
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_cents = (SELECT MAX(total_cents) FROM rev)
         |ORDER BY s_suppkey""".stripMargin }) { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy("l_suppkey")
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("total_cents"))
      val mx = rev.agg(max("total_cents").as("mx"))
      rev.join(broadcast(mx), col("total_cents") === col("mx"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_cents"),
          (col("total_cents") / lit(100.0)).as("total_revenue"))
        .orderBy("s_suppkey")
    },

    // ---- TPC-H Q21 shape: suppliers who alone held up multi-supplier
    //      orders. The classic form is EXISTS + NOT-EXISTS on the same
    //      fact; here both correlations collapse into ONE per-order
    //      aggregate (distinct suppliers, distinct LATE suppliers, and
    //      the late supplier's id when unique) — same answer, one
    //      order-keyed exchange instead of two correlated re-scans, and
    //      the shape AQE can't mis-plan. "Late" is the q4 adaptation
    //      (> 60 days after order date). Top-10 is TakeOrdered. ----
    Q("q21_waiting_supplier", Some(
      """WITH ol AS (SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |per AS (SELECT l_orderkey,
        |    COUNT(DISTINCT l_suppkey) AS n_supp,
        |    COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
        |    MAX(CASE WHEN late THEN l_suppkey END) AS late_supp
        |  FROM ol GROUP BY l_orderkey)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM per JOIN supplier ON s_suppkey = late_supp
        |WHERE n_supp > 1 AND n_late = 1
        |GROUP BY s_name ORDER BY numwait DESC, s_name
        |LIMIT 10""".stripMargin)) { (s, dir) =>
      val late = col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 60 DAYS")
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders").where(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"), late.as("late"))
        .groupBy("l_orderkey")
        .agg(countDistinct("l_suppkey").as("n_supp"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"),
          max(when(col("late"), col("l_suppkey"))).as("late_supp"))
        .where(col("n_supp") > 1 && col("n_late") === 1)
        .join(broadcast(t(s, dir, "supplier")),
          col("late_supp") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(10)
    })
}
