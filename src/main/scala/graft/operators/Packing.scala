package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch assembly: sequence packing (concat-then-chunk) and
  * deterministic global shuffle — the last mile between a filtered
  * corpus and an actual training run.
  *
  * Both are ORDER-dependent whole-corpus computations, which naively
  * need a single global sort + running total (one task owns the whole
  * corpus). The primitive underneath is [[globalPrefixSum]]: a
  * distributed two-phase prefix sum in the classic scan-then-offset
  * shape — per-shard running sums in parallel, plus a metadata-sized
  * cumulative offset per shard. Shards are derived from the ORDER KEY'S
  * VALUE (explicit range arithmetic), never from `spark_partition_id`
  * or `repartitionByRange`'s sampled boundaries, so shard assignment is
  * a pure deterministic function of the row and the two phases can
  * never disagree about which shard a row is in (no cache/recompute
  * hazard, no sampling nondeterminism).
  *
  * Reference scope: the reference engine (CityAplons/otus-cpp-11) has
  * no training-prep stage; these extend the engine along the
  * north-star LLM-pipeline axis like Dedup/Sampling do.
  */
object Packing {

  /** Tokens per packed training sequence (the context length). */
  val SeqLen = 2048L

  /** Round-robin training shard count for the global shuffle. */
  val NumShards = 16L

  /** Internal prefix-sum fan-out: how many order-contiguous shards the
    * corpus is cut into (2^[[FanBits]]). More shards = more
    * parallelism; offsets stay metadata-sized (one row per shard). */
  private val FanBits = 5
  private val Fan = 1L << FanBits

  /** Global (inclusive) prefix sum of `valueCol` over the total order
    * `orderCols`, distributed: adds `psCol` to `df`.
    *
    * `shardCol` MUST be a monotone coarsening of the order: for rows a
    * ≤ b under `orderCols`, shard(a) ≤ shard(b). Callers derive it from
    * the leading order key's value ([[rangeShard]] / [[hexPrefixShard]])
    * — that monotonicity is what lets per-shard sums compose into the
    * global sum. `orderCols` must be a total order (unique key last) or
    * the per-row prefix sums are nondeterministic within ties.
    *
    * Plan shape: (1) per-shard totals — one keyed corpus aggregate;
    * (2) exclusive cumulative offsets over the ≤ [[Fan]] shard totals —
    * a single-partition window on METADATA-sized input (the
    * `Sampling.topHalfByScore` cum discipline); (3) broadcast the
    * offsets back and window-sum within each shard. Only (1) and (3)
    * touch corpus-scale rows, both keyed by the shard. The input is
    * re-evaluated by both phases — keep it a slim deterministic
    * projection (the callers pass (key, count) pairs, never bodies). */
  def globalPrefixSum(df: DataFrame, shardCol: Column,
      orderCols: Seq[Column], valueCol: Column, psCol: String): DataFrame = {
    val keyed = df.withColumn("__shard", shardCol)
    val offsets = keyed.groupBy("__shard")
      .agg(sum(valueCol).as("__t"))
      .withColumn("__off",
        coalesce(sum(col("__t")).over(Window.orderBy(col("__shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__shard"), col("__off"))
    val w = Window.partitionBy(col("__shard")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.join(broadcast(offsets), "__shard")
      .withColumn(psCol, sum(valueCol).over(w) + col("__off"))
      .drop("__shard")
  }

  /** Shard for a lowercase-hex hash order key (md5): the first 8 hex
    * chars as a 32-bit value, cut into [[Fan]] equal ranges by exact
    * bit shift (never double division). Hex lexicographic order equals
    * numeric order, so the prefix is a monotone coarsening of the full
    * hash order. */
  def hexPrefixShard(hexCol: Column): Column =
    shiftright(conv(substring(hexCol, 1, 8), 16, 10).cast("long"),
      32 - FanBits)

  /** Per-doc packed-sequence assignment at [[SeqLen]] tokens: every
    * document's token count (+1 EOS), its start offset in the single
    * concatenated corpus token stream (docs in doc_id order), and the
    * range of training chunks it lands in — `chunk = offset div SeqLen`
    * over the concatenated stream, the standard concat-then-chunk
    * packing. A doc crossing a chunk boundary spans `n_chunks` > 1. */
  def packSequences(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      (size(split(col("text"), "\\s+")) + 1).cast("long").as("n_tokens"))
    val bounds = docs.agg(min(col("doc_id")).as("__lo"),
      max(col("doc_id")).as("__hi"))
    // order-contiguous range shards from the KEY VALUE — exact integer
    // arithmetic (`div`, never double `/`), ceil width so shard < Fan;
    // the 1-row bounds frame is the allow-listed constant broadcast
    val sharded = toks.crossJoin(broadcast(bounds))
      .withColumn("__shard",
        expr(s"(doc_id - __lo) div ((__hi - __lo + $Fan) div $Fan)"))
      .drop("__lo", "__hi")
    val ps = globalPrefixSum(sharded, col("__shard"), Seq(col("doc_id")),
      col("n_tokens"), "__ps")
    ps.select(col("doc_id"), col("n_tokens"),
        (col("__ps") - col("n_tokens")).as("tok_start"))
      .withColumn("chunk_first", expr(s"tok_start div $SeqLen"))
      .withColumn("chunk_last",
        expr(s"(tok_start + n_tokens - 1) div $SeqLen"))
      .withColumn("n_chunks",
        col("chunk_last") - col("chunk_first") + lit(1L))
  }

  /** Curriculum-ordered packing: [[packSequences]]' concat-then-chunk,
    * but with documents ordered by (quality score asc, doc_id) instead
    * of doc_id — short/low-score docs first, the standard
    * easy-to-hard curriculum schedule. Exercises [[globalPrefixSum]]
    * under a DATA-DEPENDENT order key: shards derive from the score's
    * value range, which is a monotone coarsening of the (score,
    * doc_id) total order (equal scores share a shard — score skew
    * costs parallelism there, never correctness). Score = n_chars,
    * the engine's integer quality proxy (the `pipeline_quality_filter`
    * convention). */
  def curriculumPack(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      length(col("text")).cast("long").as("score"),
      (size(split(col("text"), "\\s+")) + 1).cast("long").as("n_tokens"))
    val bounds = toks.agg(min(col("score")).as("__lo"),
      max(col("score")).as("__hi"))
    val sharded = toks.crossJoin(broadcast(bounds))
      .withColumn("__shard",
        expr(s"(score - __lo) div ((__hi - __lo + $Fan) div $Fan)"))
      .drop("__lo", "__hi")
    val ps = globalPrefixSum(sharded, col("__shard"),
      Seq(col("score"), col("doc_id")), col("n_tokens"), "__ps")
    ps.select(col("doc_id"), col("score"), col("n_tokens"),
        (col("__ps") - col("n_tokens")).as("tok_start"))
      .withColumn("chunk_first", expr(s"tok_start div $SeqLen"))
      .withColumn("chunk_last",
        expr(s"(tok_start + n_tokens - 1) div $SeqLen"))
  }

  /** Per-chunk manifest — the inverse view of [[packSequences]], what a
    * training data loader actually reads: for every [[SeqLen]]-token
    * chunk of the concatenated stream, how many documents cover it and
    * the covering doc_id range. Explode fan-out per doc is its own
    * chunk span (bounded by doc length / SeqLen + 1), then one keyed
    * count — no join. */
  def chunkManifest(docs: DataFrame): DataFrame =
    packSequences(docs)
      .select(col("doc_id"),
        explode(sequence(col("chunk_first"), col("chunk_last")))
          .as("chunk_id"))
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("doc_first"), max("doc_id").as("doc_last"))

  /** Deterministic global shuffle: every doc's position in a
    * pseudo-random total order (md5 of the doc id + a fixed salt — the
    * seed is explicit and reproducible run-over-run), plus a
    * round-robin training-shard assignment `pos % NumShards`. The
    * position is a 0-based dense permutation: rank = prefix sum of 1s
    * under the hash order, distributed via [[hexPrefixShard]]. */
  def globalShuffle(docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      md5(concat(col("doc_id").cast("string"), lit("#shuffle"))).as("__h"))
      .withColumn("__one", lit(1L))
    val ps = globalPrefixSum(keyed, hexPrefixShard(col("__h")),
      Seq(col("__h"), col("doc_id")), col("__one"), "__ps")
    ps.select(col("doc_id"), (col("__ps") - 1L).as("pos"))
      .withColumn("shard", pmod(col("pos"), lit(NumShards)))
  }

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "documents")

  val queries: Seq[Q] = Seq(

    // ---- sequence packing: concat-then-chunk over the doc_id-ordered
    //      corpus. The oracle's single ordered window IS the naive
    //      serial form; the Spark side must reproduce it exactly from
    //      the two-phase sharded prefix sum. ----
    Q("pipeline_pack_sequences", Some(s"""
      |WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(text, '\\s+')) + 1 AS BIGINT)
      |      AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |      AS BIGINT) AS tok_start
      |  FROM t)
      |SELECT doc_id, n_tokens, tok_start,
      |  CAST(tok_start // $SeqLen AS BIGINT) AS chunk_first,
      |  CAST((tok_start + n_tokens - 1) // $SeqLen AS BIGINT) AS chunk_last,
      |  CAST((tok_start + n_tokens - 1) // $SeqLen
      |    - tok_start // $SeqLen + 1 AS BIGINT) AS n_chunks
      |FROM c ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      packSequences(docs(s, dir)).orderBy("doc_id")
    },

    // ---- curriculum schedule: same packing algebra under the
    //      (score, doc_id) order — the prefix sum sharded by a
    //      data-dependent key's value range. ----
    Q("pipeline_curriculum_pack", Some(s"""
      |WITH t AS (
      |  SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS score,
      |    CAST(len(string_split_regex(text, '\\s+')) + 1 AS BIGINT)
      |      AS n_tokens
      |  FROM documents)
      |SELECT doc_id, score, n_tokens,
      |  CAST(SUM(n_tokens) OVER (ORDER BY score, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |    AS BIGINT) AS tok_start,
      |  CAST((SUM(n_tokens) OVER (ORDER BY score, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
      |    // $SeqLen AS BIGINT) AS chunk_first,
      |  CAST((SUM(n_tokens) OVER (ORDER BY score, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
      |    // $SeqLen AS BIGINT) AS chunk_last
      |FROM t ORDER BY score, doc_id""".stripMargin)) { (s, dir) =>
      curriculumPack(docs(s, dir)).orderBy("score", "doc_id")
    },

    // ---- the loader-side inverse of the packing: per-chunk doc
    //      coverage (a chunk crossing many short docs vs one long doc
    //      is visible here — the batch-composition diagnostic). ----
    Q("pipeline_chunk_manifest", Some(s"""
      |WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(text, '\\s+')) + 1 AS BIGINT)
      |      AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |    SUM(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |      AS tok_start
      |  FROM t),
      |x AS (
      |  SELECT doc_id,
      |    unnest(range(CAST(tok_start // $SeqLen AS BIGINT),
      |      CAST((tok_start + n_tokens - 1) // $SeqLen + 1 AS BIGINT)))
      |      AS chunk_id
      |  FROM c)
      |SELECT chunk_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  MIN(doc_id) AS doc_first, MAX(doc_id) AS doc_last
      |FROM x GROUP BY chunk_id ORDER BY chunk_id""".stripMargin)) {
      (s, dir) => chunkManifest(docs(s, dir)).orderBy("chunk_id")
    },

    // ---- deterministic global shuffle + round-robin shard manifest:
    //      a dense 0-based permutation under an explicit content-free
    //      hash order (reproducible; no RNG state). ----
    Q("pipeline_global_shuffle", Some(s"""
      |WITH h AS (
      |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '#shuffle') AS hh
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(ROW_NUMBER() OVER (ORDER BY hh, doc_id) - 1 AS BIGINT) AS pos,
      |  CAST((ROW_NUMBER() OVER (ORDER BY hh, doc_id) - 1) % $NumShards
      |    AS BIGINT) AS shard
      |FROM h ORDER BY pos""".stripMargin)) { (s, dir) =>
      globalShuffle(docs(s, dir)).orderBy("pos")
    },

    // ---- attention-boundary map: for every document, the chunk it
    //      STARTS in and its in-chunk token offset — exactly what a
    //      training loader reads to build block-diagonal attention
    //      masks over packed sequences (tokens before a boundary must
    //      not attend across it). A pure projection off the
    //      packSequences algebra (same two-phase prefix sum underneath);
    //      all BIGINT, `%`/`div` never promote. ----
    Q("pipeline_pack_boundaries", Some(s"""
      |WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(text, '\\s+')) + 1 AS BIGINT)
      |      AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |      AS BIGINT) AS tok_start
      |  FROM t)
      |SELECT CAST(tok_start // $SeqLen AS BIGINT) AS chunk_id,
      |  CAST(tok_start % $SeqLen AS BIGINT) AS boundary_off,
      |  doc_id, n_tokens
      |FROM c ORDER BY chunk_id, boundary_off""".stripMargin)) { (s, dir) =>
      packSequences(docs(s, dir))
        .select(expr(s"tok_start div $SeqLen").as("chunk_id"),
          expr(s"tok_start % $SeqLen").as("boundary_off"),
          col("doc_id"), col("n_tokens"))
        .orderBy("chunk_id", "boundary_off")
    })
}
