package graft.mapreduce

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions.col

/** Generic MapReduce job API — capability parity with the reference's
  * `otus::PrefixFindRunner` (reference src/mapreduce.hpp:21-81), re-expressed
  * Spark-first:
  *
  *   - user mapper `String => IterableOnce[(K, V)]` is the reference's
  *     flatMap-shaped `mapper_func_type` (src/mapreduce.hpp:26);
  *   - user reducer `Iterator[(K, V)] => R` is the ordered streaming
  *     reducer (`reducer_func_type`, src/mapreduce.hpp:27) — it sees each
  *     partition's pairs in ascending key order, with all equal keys
  *     co-located, exactly the shuffle guarantees spec'd in
  *     reference description/homework/mapreduce.h:39-46;
  *   - `merge` folds the R per-partition results into the job result, the
  *     reference's final aggregate (src/runner.cpp:68-76, which hard-codes
  *     boolean AND; here it is pluggable so the lecture tasks run through
  *     the same framework, per description/homework/mapreduce.h:9-10).
  *
  * Everything the reference hand-builds — line-aligned byte-range splits
  * (src/mapreduce.cpp:111-137), the external K-way merge shuffle
  * (src/mapreduce.cpp:139-189), key-boundary alignment
  * (src/mapreduce.cpp:191-261) — is Spark's FileScan + Exchange
  * (RangePartitioner) + SortExec; no custom machinery. The reference's
  * client-reducer data race (function-local statics shared across reducer
  * threads, src/main.cpp:76-77) is structurally impossible here: each
  * partition's reducer gets its own iterator.
  *
  * Scale note: `repartitionByRange` samples keys to build contiguous,
  * roughly-equal, non-overlapping ranges — the same three guarantees the
  * reference spec demands — and spills via UnsafeExternalSorter, so the
  * reference's external-memory constraint (mapreduce.h:16-20) holds at any
  * data size.
  */
final class MapReduceJob[K, V, R](
    mappers: Int,
    reducers: Int,
    mapper: String => IterableOnce[(K, V)],
    reducer: Iterator[(K, V)] => R,
    merge: (R, R) => R)(
    implicit kvEnc: Encoder[(K, V)], rEnc: Encoder[R])
    extends Serializable {

  /** Run over an in-memory/derived Dataset of lines. */
  def run(lines: Dataset[String]): R = {
    val m = mapper // avoid capturing `this` in task closures
    val r = reducer
    val perPartition = lines
      .repartition(mappers)                        // M map tasks (runner.cpp:14-29)
      .flatMap(m(_))                               // user mapper (mapreduce.cpp:31)
      .repartitionByRange(reducers, col("_1"))     // shuffle (mapreduce.cpp:139-189)
      .sortWithinPartitions("_1")                  // sorted runs (mapreduce.cpp:32-33)
      .mapPartitions(it => Iterator.single(r(it))) // reduce (mapreduce.cpp:59-109)
    perPartition.collect().reduce(merge)           // aggregate (runner.cpp:68-76)
  }

  /** Run over a newline-delimited text file — the reference's only source
    * (reference src/mapreduce.cpp:19,26-29). Spark's text reader does the
    * line-aligned byte-range splitting (O1) natively.
    */
  def run(spark: SparkSession, inputPath: String): R = {
    import spark.implicits._
    run(spark.sparkContext.textFile(inputPath, mappers).toDS())
  }

  /** Run with the reference's file-layout sinks (O12, reference
    * src/runner.cpp:18-19,45-47,65-78): under `outDir`,
    *
    *   - `mapper/part-*` — the M sorted pre-shuffle runs as
    *     `"key value"` text (reference mapper/map.N.txt format,
    *     src/mapreduce.cpp:51); written only when `debug` (the files are
    *     an inter-"node" transport in the reference, pure I/O overhead
    *     here — the real shuffle is Spark's);
    *   - `reducer/reduce.N.txt` — one formatted result per reduce
    *     partition (reference reducer/reduce.N.txt);
    *   - `result.txt` — the merged job result.
    *
    * Returns the merged result like [[run]].
    */
  def runWithSinks(spark: SparkSession, inputPath: String, outDir: String,
      debug: Boolean = false)(format: R => String): R = {
    import spark.implicits._
    val m = mapper
    val r = reducer
    val lines = spark.sparkContext.textFile(inputPath, mappers).toDS()
    val mapped = lines.repartition(mappers).flatMap(m(_))
    if (debug) {
      mapped.sortWithinPartitions("_1")
        .map { case (k, v) => s"$k $v" }(Encoders.STRING)
        .write.mode("overwrite").text(s"$outDir/mapper")
    }
    val perPartition = mapped
      .repartitionByRange(reducers, col("_1"))
      .sortWithinPartitions("_1")
      .mapPartitions(it => Iterator.single(r(it)))
      .collect()
    val dir = java.nio.file.Paths.get(outDir, "reducer")
    java.nio.file.Files.createDirectories(dir)
    perPartition.zipWithIndex.foreach { case (res, i) =>
      java.nio.file.Files.writeString(dir.resolve(s"reduce.$i.txt"), format(res))
    }
    val result = perPartition.reduce(merge)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "result.txt"), format(result))
    result
  }
}

object MapReduceJob {

  /** STREAMING-reduce job: the same map → range-shuffle → sorted-run
    * pipeline as [[MapReduceJob.run]], but the reduce partition emits an
    * output stream that remains a distributed Dataset instead of a
    * collect()ed per-partition value. This is the scale path when the
    * reduce result is data-sized (e.g. a vocabulary of word counts);
    * only jobs whose result is a bounded summary belong in [[run]]'s
    * driver-side merge. Deliberately NOT a method on [[MapReduceJob]]:
    * a streaming job has no `reducer`/`merge`, and forcing callers to
    * supply dummies whose `run()` would compute something different is
    * a trap. Shuffle guarantees (equal keys co-located, ascending key
    * order within each partition) are identical.
    */
  def streaming[K, V, O](mappers: Int, reducers: Int,
      mapper: String => IterableOnce[(K, V)])(
      streamReducer: Iterator[(K, V)] => Iterator[O])(
      lines: Dataset[String])(
      implicit kvEnc: Encoder[(K, V)], oEnc: Encoder[O]): Dataset[O] =
    lines
      .repartition(mappers)
      .flatMap(mapper(_))
      .repartitionByRange(reducers, col("_1"))
      .sortWithinPartitions("_1")
      .mapPartitions(streamReducer)

  /** Boolean-AND job — the exact shape of the reference's
    * `PrefixFindRunner::run` (bool reducer outputs AND-folded,
    * reference src/runner.cpp:73-78).
    */
  def boolAnd[K](mappers: Int, reducers: Int)(
      mapper: String => IterableOnce[(K, Int)])(
      reducer: Iterator[(K, Int)] => Boolean)(
      implicit kvEnc: Encoder[(K, Int)]): MapReduceJob[K, Int, Boolean] = {
    implicit val bEnc: Encoder[Boolean] = Encoders.scalaBoolean
    new MapReduceJob[K, Int, Boolean](mappers, reducers, mapper, reducer, _ && _)
  }
}
