package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond scoring and dedup: deterministic stratified sampling, corpus
  * balance reporting, length histograms, and quantile-based quality
  * filtering. Everything is windowed/grouped integer math — no RNG (a
  * cluster re-run must pick the same sample, so "random" is a hash
  * order), no floating-point aggregation, every query oracle-checked.
  *
  * Scale notes: each query is one shuffle on its natural key (`lang` /
  * histogram bucket). Per-stratum windows parallelize across strata —
  * the partition-by key is the parallelism unit, same discipline as
  * `pipeline_pack_bins`. Nothing here collects to the driver.
  */
object Sampling {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Deterministic stratified sample: `perStratum` docs per stratum,
    * ranked by (md5(text), doc_id) — a content hash as the shuffle-stable
    * "random" order, so the sample is reproducible run-over-run and
    * engine-over-engine (the seed is the corpus itself). */
  def stratifiedSample(d: DataFrame, stratumCol: String, perStratum: Int)
      : DataFrame = {
    val w = Window.partitionBy(stratumCol)
      .orderBy(md5(col("text")), col("doc_id"))
    d.withColumn("rn", row_number().over(w))
      .where(col("rn") <= perStratum)
      .select(col(stratumCol), col("doc_id"), col("rn"))
  }

  /** Per-stratum top-fraction filter on an integer score column: keeps
    * rows whose rank from the top satisfies `2*rank <= n+1` (the top half
    * including the median element) — exact integer logic, no percentile
    * interpolation to drift between engines. */
  def topHalfByScore(d: DataFrame, stratumCol: String, scoreCol: String)
      : DataFrame = {
    val w = Window.partitionBy(stratumCol)
      .orderBy(col(scoreCol).desc, col("doc_id"))
    val cw = Window.partitionBy(stratumCol)
    d.withColumn("rnk", row_number().over(w))
      .withColumn("n_in_stratum", count(lit(1)).over(cw))
      .where(col("rnk") * 2 <= col("n_in_stratum") + 1)
  }

  val queries: Seq[Q] = Seq(

    // ---- deterministic per-language quota sample (stratified) ----
    // The standard corpus-mixing move: cap each language at a fixed
    // budget. Hash-ordered, so the same 20 docs come back at any
    // parallelism, any engine.
    Q("pipeline_stratified_sample", Some(
      """SELECT lang, doc_id,
        |  CAST(rn AS INTEGER) AS rn
        |FROM (SELECT lang, doc_id,
        |        ROW_NUMBER() OVER (PARTITION BY lang
        |          ORDER BY md5(text), doc_id) AS rn
        |      FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin)) { (s, dir) =>
      stratifiedSample(docs(s, dir), "lang", 20)
        .orderBy("lang", "rn")
    },

    // ---- corpus balance report: doc/char counts + integer permille ----
    // (1000*n) div total is exact in both engines; the DuckDB window SUM
    // promotes to HUGEINT, so every computed column casts back to BIGINT.
    Q("pipeline_lang_balance", Some(
      """SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |  CAST((COUNT(*) * 1000) // (SUM(COUNT(*)) OVER ()) AS BIGINT)
        |    AS doc_permille
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)) {
      (s, dir) =>
      docs(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("n_chars"))
        .withColumn("total_docs",
          sum("n_docs").over(Window.partitionBy()))
        // `div` (integer division) exists only as a SQL operator; the
        // double `/` would round-trip through fp and risk ulp drift
        .withColumn("doc_permille", expr("(n_docs * 1000) div total_docs"))
        .select("lang", "n_docs", "n_chars", "doc_permille")
        .orderBy("lang")
    },

    // ---- token-count histogram (curriculum / packing planner input) ----
    Q("pipeline_token_histogram", Some(
      """SELECT CAST(len(string_split_regex(text, '\s+')) // 16 AS BIGINT)
        |    AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT)
        |    AS n_tokens
        |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin)) {
      (s, dir) =>
      val nTokens = size(split(col("text"), "\\s+"))
      docs(s, dir)
        .select(nTokens.cast("long").as("nt"))
        .select(expr("nt div 16").as("bucket"), col("nt"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
        .orderBy("bucket")
    },

    // ---- per-language median-split quality filter ----
    // Keep the top half (by n_chars, doc_id-tiebroken) of every language:
    // rank-based, so the cut is exact where percentile interpolation
    // would be engine-dependent.
    Q("pipeline_quality_filter", Some(
      """SELECT lang, doc_id, n_chars
        |FROM (SELECT lang, doc_id, n_chars,
        |        ROW_NUMBER() OVER (PARTITION BY lang
        |          ORDER BY n_chars DESC, doc_id) AS rnk,
        |        COUNT(*) OVER (PARTITION BY lang) AS n_in_stratum
        |      FROM documents)
        |WHERE rnk * 2 <= n_in_stratum + 1
        |ORDER BY lang, doc_id""".stripMargin)) { (s, dir) =>
      topHalfByScore(docs(s, dir), "lang", "n_chars")
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    },

    // ---- domain-mix reweighting: compute the per-source sampling
    //      weight that moves the corpus toward a uniform source mix,
    //      capped at 2x upsampling (the DoReMi-style "mixture weights"
    //      pre-pass, computed from corpus counts, no RNG). Two tiny
    //      aggregates + a broadcast of one total row; the expected doc
    //      budget is floored to integer so every column but the display
    //      ratios is exact. ----
    Q("pipeline_mix_weights", Some(
      """WITH a AS (SELECT source, COUNT(*) AS n_docs FROM documents
        |           GROUP BY source),
        |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
        |        COUNT(*) AS n_sources FROM a)
        |SELECT source, n_docs,
        |  ROUND(n_docs / CAST(total AS DOUBLE), 6) AS share_r,
        |  ROUND(LEAST(CAST(total AS DOUBLE) / (n_sources * n_docs), 2.0), 6)
        |    AS weight_r,
        |  CAST(FLOOR(n_docs * LEAST(CAST(total AS DOUBLE)
        |    / (n_sources * n_docs), 2.0)) AS BIGINT) AS exp_docs
        |FROM a, t ORDER BY source""".stripMargin)) { (s, dir) =>
      val a = docs(s, dir).groupBy("source").agg(count(lit(1)).as("n_docs"))
      val t = a.agg(sum("n_docs").cast("long").as("total"),
        count(lit(1)).as("n_sources"))
      val weight = least(col("total").cast("double")
        / (col("n_sources") * col("n_docs")), lit(2.0))
      a.crossJoin(broadcast(t))
        .select(col("source"), col("n_docs"),
          round(col("n_docs") / col("total").cast("double"), 6).as("share_r"),
          round(weight, 6).as("weight_r"),
          floor(col("n_docs") * weight).cast("long").as("exp_docs"))
        .orderBy("source")
    })
}
