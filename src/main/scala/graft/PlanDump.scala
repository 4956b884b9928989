package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** PLANS.md generator: `runMain graft.PlanDump <sfDir> <outFile>
  * [name…]` writes one compact plan-shape entry per query (default: every
  * registered query) — the `.explain("formatted")` tree plus the
  * deduplicated scan-pushdown lines, the evidence PLANS.md's audit
  * discipline reads (exchanges, broadcasts, PushedFilters, pruned
  * ReadSchema). Node-detail bodies are omitted; reproduce any entry in
  * full with `runMain graft.Explain <name>`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    for (n <- names.sorted) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val formatted = df.queryExecution.explainString(FormattedMode)
      val lines = formatted.linesIterator.toSeq
      val tree = lines.takeWhile(_.trim.nonEmpty)
      val push = lines.filter(l =>
          l.contains("PushedFilters") || l.contains("ReadSchema"))
        .map(_.trim).distinct
        .map(l => if (l.length > 160) l.take(157) + "..." else l)
      sb ++= s"## $n\n\n```\n${tree.mkString("\n")}\n```\n"
      if (push.nonEmpty)
        sb ++= s"\n```\n${push.mkString("\n")}\n```\n"
      sb ++= "\n"
      spark.catalog.clearCache()
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"[plandump] wrote ${names.size} entries to $outFile")
    spark.stop()
  }
}
