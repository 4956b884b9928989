package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities. AQE's skew-join splitting covers most
  * hot-key cases at runtime; explicit salting remains the tool when a
  * single join key dominates so heavily that even split partitions
  * bottleneck, or when AQE is disabled (deterministic-layout paths).
  *
  * `saltedJoin` replicates the (small) right side `salt` times and
  * scatters the left side uniformly across the replicas: the hot key's
  * rows spread over `salt` tasks instead of one. Classic trade —
  * |R| x salt extra shuffle volume for |L|/salt per-task bound.
  */
object Skew {

  /** Inner equi-join of `left` and `right` on `key`, with the left side
    * salted across `salt` buckets. Result columns = left ++ right
    * (minus right's join key).
    *
    * Project `left` down to the columns you need BEFORE calling: the
    * deterministic scatter hashes every left column, so an unprojected
    * table drags its full width into the scan (defeating column
    * pruning). Uniformity doesn't need row uniqueness — hash collisions
    * just co-locate a few rows. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // deterministic scatter: hash of the whole left row modulo salt —
    // uniform without a nondeterministic rand() (restart-safe)
    val leftSalted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salt)))
    val replicas = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    leftSalted.join(replicas, Seq(key, "__salt")).drop("__salt")
  }
}
