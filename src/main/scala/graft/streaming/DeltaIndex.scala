package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch-DELTA persistence for the durable streaming indexes (r15 —
  * the r14 verdict's one remaining scale-killer): the previous layout
  * rewrote the WHOLE accumulated index as `idx_<batchId>` every
  * micro-batch — exactly-once-correct, but O(index) bytes written per
  * batch and O(index · batches) total write amplification, which at a
  * production crawl (billions of seen URLs / span digests) means the
  * continuous pipeline eventually does nothing but rewrite state.
  *
  * The delta layout keeps the SAME batch-id keying and therefore the
  * same exactly-once argument, but each batch persists only its OWN
  * contribution:
  *
  *   - `delta_<j>` — batch j's new keys (committed with a _SUCCESS
  *     marker; an idempotent overwrite on replay);
  *   - `base_<j>`  — a COMPACTION: the full distinct state through
  *     batch j, written by the batch that finds `compactEvery`
  *     deltas accumulated above the newest base (also batch-id-keyed,
  *     also an idempotent overwrite).
  *
  * A batch reads the newest committed `base_<p>` below its own id
  * (or the caller's initial state when none exists) unioned with
  * every committed `delta_<j>`, p < j < its id. Its own partial
  * writes from a crashed attempt are excluded by the strict `< id`
  * filter, so a replayed batch recomputes byte-identical output,
  * delta, and (if it compacts) base — the proven idempotence pattern
  * carries over verbatim.
  *
  * Cost per batch: O(batch) delta bytes, plus O(index) once every
  * `compactEvery` batches — amortized O(batch + index/compactEvery)
  * instead of O(index). Deltas need NOT be disjoint from earlier
  * state: every consumer is duplicate-insensitive (the substr clean
  * distincts its digest index internally; the URL seen-set is the
  * right side of a left_anti; signature deltas are disjoint by the
  * id-ordering contract), and compaction's `.distinct()` re-dedups
  * the on-disk state. Disk stays O(index): compaction REAPS state
  * below the PREVIOUS base, which no replay can ever read again
  * (replays only touch the newest in-flight batch, whose read set is
  * the previous base plus the deltas above it).
  *
  * All directory operations go through the Hadoop FileSystem API
  * resolved from the index dir's own scheme (r15 — previously a
  * local-FS `java.io.File` walk), so the SAME code runs against
  * local disk in the specs and against HDFS/S3A durable storage on a
  * cluster; `indexDir` may carry any scheme Spark's Hadoop conf
  * knows. */
private[streaming] object DeltaIndex {

  /** Default compaction cadence: one O(index) fold per 16 batches
    * bounds the read-side union at ≤ 16 delta dirs while keeping
    * amortized write cost at index/16 per batch. */
  val CompactEvery: Int = 16

  private def fs(indexDir: String, spark: SparkSession): FileSystem =
    new Path(indexDir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Committed (id, path) entries `prefix`-keyed under `indexDir`
    * with id < `beforeBatch`, ascending. A dir without _SUCCESS (a
    * crashed write) is invisible; a missing index root is simply
    * empty (first batch of a fresh stream). */
  private def committed(indexDir: String, prefix: String,
      beforeBatch: Long, spark: SparkSession): Seq[(Long, Path)] = {
    val root = new Path(indexDir)
    val f = fs(indexDir, spark)
    val entries =
      if (!f.exists(root)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else f.listStatus(root)
    entries.toIndexedSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(prefix) &&
        f.exists(new Path(st.getPath, "_SUCCESS")))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix(prefix).toLong).toOption
        .filter(_ < beforeBatch).map(_ -> st.getPath))
      .sortBy(_._1)
  }

  /** The state visible to batch `beforeBatch`: newest committed base
    * below it (or `fallback`) plus every committed delta above that
    * base — a MULTISET (deltas may repeat base/earlier-delta keys;
    * see the object Scaladoc). Also returns the delta-chain length,
    * which drives the caller's compaction decision — derived from
    * committed dirs only, so a replayed batch decides identically. */
  def read(indexDir: String, beforeBatch: Long, fallback: => DataFrame,
      spark: SparkSession): (DataFrame, Int) = {
    val deltas0 = committed(indexDir, "delta_", beforeBatch, spark)
    val (baseDf, deltas) =
      committed(indexDir, "base_", beforeBatch, spark).lastOption match {
        case Some((bid, dir)) =>
          (spark.read.parquet(dir.toString),
            deltas0.filter(_._1 > bid))
        case None => (fallback, deltas0)
      }
    val df = if (deltas.isEmpty) baseDf
      else baseDf.unionAll(
        spark.read.parquet(deltas.map(_._2.toString): _*))
    (df, deltas.size)
  }

  /** The FULL accumulated committed state — what a downstream
    * consumer (or a fresh run seeding from the same dir) reads.
    * Multiset semantics as in [[read]]. */
  def readAll(indexDir: String, fallback: => DataFrame,
      spark: SparkSession): DataFrame =
    read(indexDir, Long.MaxValue, fallback, spark)._1

  /** Persist batch `batchId`'s contribution: idempotently overwrite
    * `delta_<batchId>` with `delta` (O(batch) bytes), and — when the
    * committed delta chain reaches `compactEvery` — fold `state` (the
    * frame [[read]] returned to this batch) plus the just-written
    * delta into `base_<batchId>`, then reap everything below the
    * PREVIOUS base. The delta is read back from its own committed
    * parquet for the fold, so the fold is a disk union, not a
    * recompute. */
  def commit(delta: DataFrame, state: DataFrame, indexDir: String,
      batchId: Long, deltasAboveBase: Int,
      compactEvery: Int = CompactEvery): Unit = {
    val spark = delta.sparkSession
    delta.write.mode("overwrite").parquet(s"$indexDir/delta_$batchId")
    if (deltasAboveBase + 1 >= compactEvery) {
      state.unionAll(
          spark.read.parquet(s"$indexDir/delta_$batchId"))
        .distinct()
        .write.mode("overwrite").parquet(s"$indexDir/base_$batchId")
      // ids below the PREVIOUS base are unreachable from any replay
      // (a replay of THIS batch reads that base + the deltas above
      // it) — reap them so disk stays O(index), not O(index·batches)
      committed(indexDir, "base_", batchId, spark).lastOption.foreach {
        case (p, _) =>
          val f = fs(indexDir, spark)
          (committed(indexDir, "base_", p, spark) ++
            committed(indexDir, "delta_", p, spark))
            .foreach { case (_, dir) => f.delete(dir, true) }
      }
    }
  }
}
