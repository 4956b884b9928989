package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing + deterministic global shuffle: the distributed
  * two-phase prefix sum must equal the naive single-window serial form
  * on arbitrary corpora (that naive form IS the DuckDB oracle's shape),
  * stay a dense permutation for the shuffle, and keep its shards
  * genuinely distributed.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def naivePack(rows: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    // (doc_id, text) -> (n_tokens, tok_start), docs in doc_id order
    var off = 0L
    rows.sortBy(_._1).map { case (id, text) =>
      val n = text.split("\\s+", -1).length.toLong + 1L
      val r = id -> ((n, off)); off += n; r
    }.toMap
  }

  test("packSequences equals the naive serial concat on seeded random " +
      "corpora with sparse, skewed doc_ids") {
    for (seed <- Seq(5, 23, 77)) {
      val rnd = new scala.util.Random(seed)
      var id = 0L
      val rows = (1 to 120 + rnd.nextInt(80)).map { _ =>
        id += 1L + rnd.nextInt(997) // sparse ids → skewed range shards
        (id, (0 to rnd.nextInt(12)).map(_ => "w" * (1 + rnd.nextInt(5)))
          .mkString(" "))
      }
      val exp = naivePack(rows)
      val got = Packing.packSequences(
          rows.toDF("doc_id", "text").repartition(7))
        .select("doc_id", "n_tokens", "tok_start")
        .as[(Long, Long, Long)].collect()
      assert(got.length == rows.length, s"seed=$seed row count")
      for ((d, n, st) <- got)
        assert(exp(d) == ((n, st)), s"seed=$seed doc=$d")
    }
  }

  test("packSequences on the real corpus: chunks tile the concatenated " +
      "token stream with no gaps or overlaps") {
    val rows = graft.SparkEntry.queries("pipeline_pack_sequences")(
        spark, sfDir)
      .select("doc_id", "n_tokens", "tok_start", "chunk_first",
        "chunk_last", "n_chunks")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.head._3 == 0L)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._2, s"gap before doc ${b._1}")
    case _ => ()
    }
    for ((d, n, st, cf, cl, nc) <- rows) {
      assert(cf == st / Packing.SeqLen, s"doc $d chunk_first")
      assert(cl == (st + n - 1) / Packing.SeqLen, s"doc $d chunk_last")
      assert(nc == cl - cf + 1, s"doc $d n_chunks")
    }
  }

  test("globalShuffle is a dense 0-based permutation with round-robin " +
      "shards, deterministic across runs") {
    val q = graft.SparkEntry.queries("pipeline_global_shuffle")
    val a = q(spark, sfDir).as[(Long, Long, Long)].collect()
    val b = q(spark, sfDir).as[(Long, Long, Long)].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._2).sorted.toSeq == a.indices.map(_.toLong))
    assert(a.map(_._1).distinct.length == a.length)
    for ((_, pos, shard) <- a)
      assert(shard == pos % Packing.NumShards)
    // the hash order must not be the identity order (it IS a shuffle)
    assert(a.sortBy(_._2).map(_._1).toSeq != a.map(_._1).sorted.toSeq)
  }

  test("prefix-sum shards are genuinely distributed (no single-shard " +
      "serialization on either sharding scheme)") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val hexShards = docs
      .select(Packing.hexPrefixShard(md5(col("text"))).as("s"))
      .distinct().count()
    assert(hexShards > 8, s"hex sharding collapsed: $hexShards shards")
    // range sharding over the dense doc_id space spreads likewise:
    // recompute the same expression packSequences uses
    val n = docs.count()
    val rangeShards = docs
      .select(expr(s"doc_id div ((${n - 1} + 32) div 32)").as("s"))
      .distinct().count()
    assert(rangeShards > 8, s"range sharding collapsed: $rangeShards")
  }

  test("chunkManifest covers every chunk exactly once and agrees with " +
      "the per-doc chunk spans") {
    val pack = graft.SparkEntry.queries("pipeline_pack_sequences")(
        spark, sfDir)
      .select("doc_id", "chunk_first", "chunk_last", "n_chunks")
      .as[(Long, Long, Long, Long)].collect()
    val man = graft.SparkEntry.queries("pipeline_chunk_manifest")(
        spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    // dense chunk ids from 0, every chunk covered
    assert(man.map(_._1).toSeq == (0L until man.length.toLong))
    // coverage conservation: each doc appears in exactly its span
    assert(man.map(_._2).sum == pack.map(_._4).sum)
    // doc ranges are contiguous across adjacent chunks (the stream has
    // no seams): the first doc of chunk c+1 is the last doc of chunk c
    // (boundary-crossing doc) or the next doc after it (exact cut)
    man.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._3 == a._4 || b._3 == a._4 + 1,
          s"seam between chunk ${a._1} and ${b._1}")
      case _ => ()
    }
  }

  test("curriculumPack equals the naive serial form under heavy score " +
      "ties (tie-groups share a shard, order stays total via doc_id)") {
    for (seed <- Seq(11, 59)) {
      val rnd = new scala.util.Random(seed)
      // only 3 distinct doc lengths → massive score ties across shards
      val rows = (0L until 150L).map { i =>
        (i, Seq("aa", "bbbb bbbb", "cc cc cc")(rnd.nextInt(3)))
      }
      var off = 0L
      val exp = rows.map { case (id, t) =>
        (t.length.toLong, id, t.split("\\s+", -1).length.toLong + 1L)
      }.sortBy { case (s, id, _) => (s, id) }.map { case (s, id, n) =>
        val r = (id, s, n, off); off += n; r
      }
      val got = Packing.curriculumPack(rows.toDF("doc_id", "text")
          .repartition(6))
        .select("doc_id", "score", "n_tokens", "tok_start")
        .as[(Long, Long, Long, Long)].collect()
        .sortBy(r => (r._2, r._1)).toSeq
      assert(got == exp, s"seed=$seed")
    }
  }

  test("packSequences handles a single-doc and a single-shard corpus") {
    val one = Seq((42L, "a b c")).toDF("doc_id", "text")
    val r = Packing.packSequences(one)
      .select("doc_id", "n_tokens", "tok_start", "n_chunks")
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((42L, 4L, 0L, 1L)))
  }

  test("pipeline_pack_boundaries: one boundary per doc inside [0, 2048), " +
      "offsets replay from the packed frame, and boundaries tile each " +
      "chunk in doc order") {
    val b = graft.SparkEntry.queries("pipeline_pack_boundaries")(
        spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val packed = graft.SparkEntry.queries("pipeline_pack_sequences")(
        spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(b.length == packed.size, "exactly one boundary per document")
    b.foreach { case (chunk, off, doc, _) =>
      val (tokStart, chunkFirst) = packed(doc)
      assert(off >= 0 && off < 2048)
      assert(chunk == chunkFirst && off == tokStart % 2048,
        s"doc $doc boundary ($chunk, $off) != packed ($chunkFirst, " +
          s"${tokStart % 2048})")
    }
    // within a chunk, later docs start at strictly later offsets
    b.groupBy(_._1).values.foreach { g =>
      val byDoc = g.sortBy(_._3).map(_._2)
      assert(byDoc.sorted.toSeq == byDoc.toSeq,
        "in-chunk boundaries must be monotone in doc order")
    }
  }
}
