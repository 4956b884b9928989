package graft
import org.apache.spark.sql.SparkSession

/** Plan audit tool: `runMain graft.Explain <query…>` prints each query's
  * formatted physical plan; `runMain graft.Explain --run <query…>` also
  * executes it against a noop sink and prints measured shuffle volumes
  * (exchanges / records / bytes via [[Metrics.shuffleSummary]]) — the
  * plan you'd want AND the volumes proving it. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (run, names) = args.partition(_ == "--run")
    for (n <- names) {
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.1")
      df.explain("formatted")
      if (run.nonEmpty) {
        // execute THIS DataFrame's own QueryExecution: df.write would
        // build a fresh one and the metrics would land on that copy
        df.queryExecution.toRdd.foreach(_ => ())
        println(s"measured: ${Metrics.shuffleSummary(df)}")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
