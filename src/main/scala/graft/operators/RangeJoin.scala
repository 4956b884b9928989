package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval / range join on time proximity — the other join Spark has no
  * native operator for (an inequality-only condition plans as a
  * BroadcastNestedLoopJoin: |L|x|R| work, a non-starter at scale).
  *
  * Scale path: quantize both sides to `window`-sized bins, equijoin on
  * (key, bin) with the left side exploded to its bin and both adjacent
  * bins, then filter the exact |lts - rts| <= window predicate. Every
  * true match is within one bin of its partner (|Δt| <= window ⇒ bin
  * difference ∈ {-1, 0, 1}), so recall is exact; cost is a 3x left
  * replication through a hash equijoin instead of a cross product.
  */
object RangeJoin {

  /** Pairs of (left, right) rows with the same `key` whose microsecond
    * timestamps differ by at most `windowUs`. Output: left columns +
    * right payload columns (renamed `r_<name>`) + `dt_us` (lts - rts).
    *
    * @param leftUs  left epoch-microseconds column
    * @param rightUs right epoch-microseconds column
    */
  def timeProximityJoin(left: DataFrame, right: DataFrame, key: String,
      leftUs: Column, rightUs: Column, windowUs: Long,
      payload: Seq[String]): DataFrame = {
    val l = left.withColumn("__lus", leftUs)
      .withColumn("__bin", explode(array(
        (leftUs.cast("long") / windowUs).cast("long") - 1,
        (leftUs.cast("long") / windowUs).cast("long"),
        (leftUs.cast("long") / windowUs).cast("long") + 1)))
    val r = right.select(
      (col(key) +: payload.map(c => col(c).as(s"r_$c"))) :+
        rightUs.as("__rus") :+
        (rightUs.cast("long") / windowUs).cast("long").as("__bin"): _*)
    // each true pair matches exactly once: the join bin is the right
    // row's single bin, and only one left replica carries it
    l.join(r, Seq(key, "__bin"))
      .where(abs(col("__lus") - col("__rus")) <= windowUs)
      .drop("__bin")
      .withColumn("dt_us", col("__lus") - col("__rus"))
      .drop("__lus", "__rus")
  }
}
