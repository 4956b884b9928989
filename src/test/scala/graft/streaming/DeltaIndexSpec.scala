package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The batch-DELTA durable-index layout's scale contract (r15 — the
  * r14 verdict's write-amplification flag): bytes written per
  * micro-batch scale with the BATCH, not the accumulated index;
  * compaction folds the delta chain on the `compactEvery` cadence and
  * reaps unreachable state; and the accumulated view stays exactly
  * the set a full-rewrite layout would have held. */
class DeltaIndexSpec extends SparkSpec {
  import spark.implicits._
  import StreamOpsSpecHelpers.{committedDirs, parquetBytes}

  private def recs(batch: Int, n: Int): Seq[(Long, String, String)] =
    (0 until n).map { j =>
      val id = batch * 10000L + j
      (id, s"https://h$batch.example.org/p$j", s"<p>page $id</p>")
    }

  test("durable URL dedup under the delta layout: every batch writes " +
      "an O(batch) delta (never the accumulated index), compaction " +
      "bases appear exactly on the compactEvery cadence, reap removes " +
      "state below the previous base, and the accumulated view equals " +
      "the full seen-set") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_deltaidx")
    val idxDir = root.resolve("idx").toString
    val ckpt = root.resolve("ckpt").toString
    // large enough that parquet data dominates per-file overhead (the
    // byte assertion below compares real payload, not file headers)
    val perBatch = 4000
    val src = MemoryStream[(Long, String, String)]
    val got = scala.collection.mutable.Map.empty[Long, Long]
    val query = StreamOps.incrementalUrlDedupStreamDurable(
      src.toDF().toDF("doc_id", "url", "html"),
      idxDir, Seq("https://seed.example.org/s").toDF("canon_url"),
      ckpt, compactEvery = 3) { (batch, id) => got(id) = batch.count() }
    try {
      for (b <- 0 until 6) {
        src.addData(recs(b, perBatch): _*)
        query.processAllAvailable()
      }
    } finally query.stop()
    // every batch's keepers were all fresh — the sink saw each once
    assert((0L until 6L).forall(got(_) == perBatch.toLong), s"$got")
    val deltas = committedDirs(idxDir, "delta_")
    val bases = committedDirs(idxDir, "base_")
    // compaction fires when the committed chain reaches compactEvery:
    // batch 2 sees deltas {0,1}, batch 5 sees {3,4} above base_2
    assert(bases.keySet == Set(2L, 5L), s"bases: ${bases.keySet}")
    // reap at base_5 removed everything below the PREVIOUS base (2):
    // delta_0/delta_1 are gone, the replay window {2..5} survives
    assert(deltas.keySet == Set(2L, 3L, 4L, 5L),
      s"deltas after reap: ${deltas.keySet}")
    // THE scale pin: the last delta holds one batch's keys, on disk
    // and by row count — while the base holds the accumulated corpus
    val lastDeltaRows = spark.read
      .parquet(deltas(5L).getAbsolutePath).count()
    assert(lastDeltaRows == perBatch.toLong,
      s"delta_5 must hold batch 5's fresh keys only: $lastDeltaRows")
    val baseRows = spark.read.parquet(bases(5L).getAbsolutePath).count()
    assert(baseRows == 6L * perBatch + 1,
      s"base_5 must hold seed + all six batches: $baseRows")
    assert(parquetBytes(deltas(5L)) < parquetBytes(bases(5L)) / 2,
      s"bytes written per batch must scale with the batch, not the " +
        s"index: delta=${parquetBytes(deltas(5L))} " +
        s"base=${parquetBytes(bases(5L))}")
    // the consumer-facing accumulated view = base ∪ chain, distinct
    val seen = StreamOps.readIndexState(idxDir,
      Seq.empty[String].toDF("canon_url"), spark)
    assert(seen.distinct().count() == 6L * perBatch + 1)
  }

  test("a respelling of a URL whose first sighting was FOLDED INTO A " +
      "BASE (and its delta reaped) still drops — compaction preserves " +
      "the dedup contract across a hard restart") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft_deltabase")
    val in = java.nio.file.Files.createDirectory(root.resolve("in"))
    val idxDir = root.resolve("idx").toString
    val ckpt = root.resolve("ckpt").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("url", StringType), StructField("html", StringType)))
    def writeRecs(name: String,
        rs: Seq[(Long, String, String)]): Unit =
      rs.toDF("doc_id", "url", "html").coalesce(1)
        .write.mode("overwrite").parquet(in.resolve(name).toString)
    val got = scala.collection.mutable.Map.empty[Long, Set[Long]]
    def startQ() = StreamOps.incrementalUrlDedupStreamDurable(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(in.toString),
      idxDir, Seq.empty[String].toDF("canon_url"), ckpt,
      compactEvery = 2) { (batch, id) =>
      got(id) = batch.select("doc_id").as[Long].collect().toSet
    }
    writeRecs("b0", Seq(
      (10L, "https://a.example.org/p", "<p>p</p>")))
    val q1 = startQ()
    try q1.processAllAvailable() finally q1.stop()
    writeRecs("b1", Seq(
      (20L, "https://a.example.org/q", "<p>q</p>")))
    val q2 = startQ()
    try q2.processAllAvailable() finally q2.stop()
    // batch 1 compacted (chain {0} + own = 2 ≥ 2) and reaped nothing
    // below the (nonexistent) previous base; batch 0's delta is still
    // the fallback-read window — now restart AGAIN and respell
    writeRecs("b2", Seq(
      (30L, "HTTPS://A.EXAMPLE.ORG:443/p#frag", "<p>p again</p>"),
      (31L, "https://a.example.org/r", "<p>fresh</p>")))
    val q3 = startQ()
    try q3.processAllAvailable() finally q3.stop()
    assert(got(0L) == Set(10L) && got(1L) == Set(20L))
    assert(got(2L) == Set(31L),
      s"the respelling of the base-folded URL must drop: ${got(2L)}")
    assert(committedDirs(idxDir, "base_").keySet == Set(1L),
      "compactEvery=2 folds at batch 1")
  }
}
