package graft

import org.apache.spark.sql.functions._

/** Shuffle observability: the metrics the plan audit reads must reflect
  * real exchange activity — including exchanges AQE hides inside query
  * stages — and stay zero where the plan genuinely has no shuffle.
  */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("shuffleSummary counts exchanges and records through AQE stages") {
    val df = (1 to 1000).map(i => (i % 7, i)).toDF("k", "v")
      .repartition(4)
      .groupBy("k").agg(sum("v").as("s"))
    df.collect()
    val m = Metrics.shuffleSummary(df)
    assert(m.exchanges >= 2, s"repartition + groupBy: $m") // both shuffle
    assert(m.recordsWritten >= 1000,
      s"the repartition alone writes all 1000 rows: $m")
    assert(m.bytesWritten > 0)
  }

  test("a narrow plan reports zero shuffles") {
    val df = (1 to 100).toDF("v").where(col("v") > 10)
      .select((col("v") * 2).as("w"))
    df.collect()
    val m = Metrics.shuffleSummary(df)
    assert(m == Metrics.ShuffleSummary(0, 0L, 0L), s"got $m")
  }

  test("the scale-safe stratified sample moves only slim survivor rows " +
      "through its final exchange (metrics-level spread evidence)") {
    val docs = Tables.load(spark, sfDir, "documents")
    val sampled = graft.operators.Sampling
      .stratifiedSample(docs, "lang", 20)
    sampled.collect()
    val m = Metrics.shuffleSummary(sampled)
    assert(m.exchanges >= 2, s"two-phase top-K shuffles twice: $m")
    // phase-2 + output sort only ever carry <= k*fanOut rows per stratum
    // plus phase-1's full (slim) corpus — far below corpus x 2
    val corpus = docs.count()
    assert(m.recordsWritten < corpus * 2,
      s"records written ${m.recordsWritten} vs corpus $corpus")
  }
}
