package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * composed from built-ins per the preference order (compose > custom
  * plan): for each left row, attach the latest right row whose timestamp
  * is <= the left timestamp, per key.
  *
  * Implementation is the single-shuffle union trick: tag both sides,
  * union, range-partition by key and sort by (ts, side) within the key,
  * then carry the last non-null right payload forward with a running
  * `last(_, ignoreNulls)` window. Cost = ONE shuffle of (|L|+|R|) slim
  * rows + a partition-local sort — contrast with a naive range join
  * (|L|x|R| per key) or an equi-join + filter + re-aggregate (two
  * shuffles). At 100 TB both sides stream through the same sort-merge
  * machinery as any window query; skewed keys follow the same salting
  * playbook as any windowed op.
  *
  * Right rows sort BEFORE left rows at equal timestamps, giving inclusive
  * (<=) semantics, and ties between right rows resolve to the one latest
  * in `rightOrder` (deterministic).
  */
object AsOfJoin {

  /** @param left       left relation
    * @param right      right relation
    * @param key        equi-join key column name (same name both sides)
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param payload    right columns to attach (emitted as `asof_<name>`)
    * @param rightOrder extra right-side tie-break columns (ascending)
    * @return left rows that have a match, with `asof_ts` (matched right
    *         timestamp) and the `asof_<payload>` columns attached
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, leftTs: String,
      rightTs: String, payload: Seq[String],
      rightOrder: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    // ONE struct column carries (matched ts, payload...) together with a
    // single last(ignoreNulls) — carrying each payload column through its
    // own window would let a NULL payload field in the matched right row
    // backfill from an OLDER right row, silently mixing fields of
    // different rows in one output row.
    val packType = StructType(
      StructField("__asof_ts", right.schema(rightTs).dataType) +:
        payload.map(c => StructField(c, right.schema(c).dataType)))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__pack", lit(null).cast(packType))
    val tieBreaks = rightOrder.map(c => col(c))
    // A right row with a NULL timestamp can never satisfy `rightTs <=
    // leftTs` — drop it up front. (NULLs sort FIRST ascending, and the
    // struct pack of such a row would be non-null, so without this
    // filter a NULL-ts row could masquerade as an earliest match.)
    val r0 = right
      .where(col(rightTs).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__pack", struct(
        col(rightTs).as("__asof_ts") +: payload.map(c => col(c)): _*))
    val rAligned = leftCols.foldLeft(r0)((d, c) =>
      if (r0.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val lWithTies = rightOrder.foldLeft(l)((d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val cols = (leftCols.filterNot(_ == key) ++ Seq(key, "__ts", "__side",
      "__pack") ++ rightOrder).distinct
    val unioned = lWithTies.select(cols.map(col): _*)
      .unionByName(rAligned.select(cols.map(col): _*))
    val w = Window.partitionBy(key)
      .orderBy(col("__ts").asc +: col("__side").asc +: tieBreaks: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__m", last(col("__pack"), ignoreNulls = true).over(w))
    carried
      .where(col("__side") === 1 && col("__m").isNotNull)
      .select((leftCols.map(col) :+
        col("__m").getField("__asof_ts").as("asof_ts")) ++
        payload.map(c => col("__m").getField(c).as(s"asof_$c")): _*)
  }
}
