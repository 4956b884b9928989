package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** The 100 TB co-located join story, proven on the physical plan: two
  * tables bucketed + sorted on the join key produce a sort-merge join
  * with ZERO shuffle exchanges. This is the upgrade path documented in
  * SCALE.md for the fact-fact joins (lineitem x orders on orderkey).
  */
class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("bucketed tables join without any shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // the in-memory catalog forgets tables between JVMs but their files
    // persist; clear stale locations so saveAsTable can recreate them
    for (t <- Seq("li_bucketed", "ord_bucketed")) {
      val dir = java.nio.file.Paths.get("/tmp/graft-test-warehouse", t)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderdate")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    // hint the merge join: at test scale the dim fits the broadcast
    // threshold and Spark would (also shuffle-free, but not the point
    // here) broadcast it
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderdate")
      .agg(sum("l_extendedprice").as("s"))

    joined.collect() // force execution so AQE finalizes the plan
    val plan = joined.queryExecution.executedPlan
    val exchanges = collect(plan) { case e: ShuffleExchangeExec => e }
    // the only allowed exchange is the one for the groupBy on a
    // different key; the JOIN itself must not shuffle either side
    val joinNodes = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joinNodes.nonEmpty, s"expected a sort-merge join:\n$plan")
    val shufflesUnderJoin = joinNodes.flatMap(j => collect(j) {
      case e: ShuffleExchangeExec => e
    })
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join must not shuffle its inputs:\n$plan")
  }
}
