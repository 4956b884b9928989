package graft

import graft.mapreduce.Lecture
import graft.operators.{Bpe, Crawl, Dedup, EventOps, KnLm, Layout, Multimodal, NbLangid, Packing, Prepare, QualityTrained, Relational, Sampling, Similarity, Sources, TextAnalysis, TextRank, UnigramLm}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full inventory lives in per-module `queries: Seq[Q]` registries so
  * each Spark implementation sits next to its DuckDB oracle SQL.
  */
object SparkEntry {

  val inventory: Seq[Q] =
    Lecture.queries ++ Relational.queries ++ EventOps.queries ++
      Dedup.queries ++ Similarity.queries ++ TextAnalysis.queries ++
      Bpe.queries ++ Multimodal.queries ++ Sampling.queries ++
      Packing.queries ++ Layout.queries ++ TextRank.queries ++
      Sources.queries ++ UnigramLm.queries ++ NbLangid.queries ++
      Prepare.queries ++ QualityTrained.queries ++ Crawl.queries ++
      KnLm.queries ++ graft.streaming.StreamQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * (The 6-way broadcast-dim join — exercises scan, join, agg, sort.) */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (xxhash64-based LSH/SimHash, stubbed decoders) → rows-only check. */
  def oracleSql: Map[String, String] =
    inventory.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** BENCH-ONLY timed measurements — additions to the bench metric's
    * `queries` map (additive per the driver contract), never dumped by
    * Verify and never oracle-compared: write-path costs the declared
    * read queries deliberately exclude (r18 verdict task 7 — the
    * versioned-chain seed/commit/fold sequence had no benchmark once
    * `stream_resolve_pruned`'s fixture memoized). */
  val benchOnly: Map[String, (SparkSession, String) => DataFrame] =
    Map("stream_ingest_commit" ->
      ((s: SparkSession, dir: String) =>
        graft.streaming.StreamQueries.ingestCommitBench(s, dir)))
}
