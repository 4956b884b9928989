package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Smoothed bigram language model — interpolated Kneser-Ney, the model
  * class CCNet's actual perplexity filter uses (the unsmoothed planes
  * `text_bigram_logprob` / `text_lm_doclogprob` assign unseen events
  * probability zero, so they cannot score held-out text at all; a
  * deployable filter MUST smooth). Reference note: no counterpart —
  * pure extension surface (the reference reads plain text only,
  * /root/reference/src/mapreduce.cpp:19).
  *
  * INTEGER-EXACT smoothing (the [[UnigramLm]]/[[NbLangid]] q10
  * discipline): with discount D = 1/2 carried in DOUBLED counts, every
  * interpolated Kneser-Ney probability is a ratio of integers —
  *
  *   seen pair:      P = [(2·c12 − 1)·T + N1p(w1)·(Nc(w2)+1)]
  *                       / (2·c1·T)
  *   seen w1 only:   P = N1p(w1)·(Nc(w2)+1) / (2·c1·T)
  *   unseen w1:      P = (Nc(w2)+1) / T
  *
  * where c12/c1 are train bigram/unigram counts, N1p(w1) = distinct
  * continuations of w1 (the discount mass λ(w1)·2c1 = N1p), Nc(w2) =
  * distinct LEFT contexts of w2 (the Kneser-Ney continuation count —
  * "how many contexts has w2 completed", not "how often"), and
  * T = ntypes + V + 1 normalizes the (+1)-floored continuation
  * distribution (the +1 bucket absorbs OOV w2, keeping every
  * numerator ≥ 1). Algebra in the proof obligations: P ≤ 1 always
  * (2c12−1 ≤ 2c1−2N1p+1 per continuation, N1p·(Nc+1) ≤ N1p·T), so
  * per-bigram nll = ilog(den) − ilog(num) ≥ 0 by floor monotonicity —
  * the q10 log2 runs as the same 10-step shift/square chain in both
  * engines ([[NbLangid.withIlog]] table-level here, the unrolled CTE
  * chain in the mirror), with the loud 2^43 domain guard in both.
  *
  * Scale shape: counts are vocabulary-plane aggregates (c2 one row
  * per bigram TYPE); the fixed-point log runs on the DISTINCT
  * eval-bigram-type plane — never per corpus token — and the scored
  * table attaches back to eval occurrences via [[Skew.hotSaltedJoin]]
  * (Zipf-headed bigrams hold one row per occurrence, the corpus-plane
  * attach discipline), followed by one per-doc aggregate. The scalar
  * (ntypes, V+1) totals ride a 1-row broadcast. Headroom: den =
  * 2·c1·T must stay < 2^43 — ~8.8e12, far past sf0.1 (measured ~1e11)
  * but a guard a web-scale run would hit; the documented escape is
  * splitting the log over the factors (ilog(2c1) + ilog(T), one extra
  * ulp) or widening the mantissa — the loud error() is the contract
  * that the switch cannot be forgotten. */
object KnLm {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Per-held-out-doc negative log-likelihood under the train-split
    * (doc_id % 5 ≠ 0) interpolated-KN bigram model: (doc_id,
    * n_bigrams, nll_q10, nll_per_bigram_q10). */
  def knLogprob(d: DataFrame): DataFrame = {
    val bg = TextAnalysis.bigramRows(d, distinctPerDoc = false)
    val train = bg.where(col("doc_id") % 5 =!= 0)
    val ev = bg.where(col("doc_id") % 5 === 0)
    // vocabulary-plane model tables; c2 cached (feeds c1, nc, totals
    // and the hot set — the bigramLogprob clear-between-queries policy)
    val c2 = train.groupBy("g")
      .agg(count(lit(1)).cast("long").as("n2")).cache()
    val c1 = c2.groupBy(substring_index(col("g"), " ", 1).as("w1"))
      .agg(sum("n2").cast("long").as("n1"),
        count(lit(1)).cast("long").as("n1p"))
    val nc = c2.groupBy(substring_index(col("g"), " ", -1).as("w2"))
      .agg(count(lit(1)).cast("long").as("ncont"))
    val tot = c2.agg(count(lit(1)).cast("long").as("__ntypes"),
      (countDistinct(substring_index(col("g"), " ", -1)) + 1L)
        .cast("long").as("__v1"))
    // score on the DISTINCT eval type plane (vocab-sized), logs never
    // touch the occurrence stream; shuffle_hash pins determinism (the
    // cached-frame broadcast-flip hazard documented at bigramLogprob)
    val et = ev.select("g").distinct()
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .withColumn("w2", substring_index(col("g"), " ", -1))
    val attached = et
      .join(c2.hint("shuffle_hash"), Seq("g"), "left")
      .join(c1.hint("shuffle_hash"), Seq("w1"), "left")
      .join(nc.hint("shuffle_hash"), Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("t", col("__ntypes") + col("__v1"))
      .withColumn("ncp", coalesce(col("ncont"), lit(0L)) + 1L)
      .withColumn("m",
        when(col("n1").isNull, col("ncp"))
          .when(col("n2").isNull, col("n1p") * col("ncp"))
          .otherwise((col("n2") * 2L - 1L) * col("t") +
            col("n1p") * col("ncp")))
      .withColumn("den",
        when(col("n1").isNull, col("t"))
          .otherwise(col("n1") * 2L * col("t")))
    val sc = NbLangid.withIlog(
      NbLangid.withIlog(attached, "m", "ilog_num")
        .withColumn("m2", col("den")), "m2", "ilog_den")
      .select(col("g"), (col("ilog_den") - col("ilog_num")).as("nll"))
    // the corpus-plane attach: Zipf-headed bigrams salt (hot set from
    // the TRAIN counts — a perf hint only, correctness is unconditional)
    val tt = c2.agg(sum("n2").cast("long").as("__t"))
    val hot = c2.crossJoin(broadcast(tt))
      .where(col("n2") >= greatest(expr(s"__t div ${Skew.HotKeyFanout}"),
        lit(Skew.MinHotCount)))
      .select("g")
    Skew.hotSaltedJoin(ev, sc, "g", hot, col("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        sum("nll").cast("long").as("nll_q10"))
      .withColumn("nll_per_bigram_q10",
        expr("nll_q10 div n_bigrams").cast("long"))
  }

  /** Mirror: the same split/counts/KN algebra, with the q10 chains
    * unrolled per plane ([[NbLangid.sqlIlog]]) — num first (carrying
    * den), then den (carrying ilog_num). */
  private def sqlKnLogprob: String =
    s"""WITH tb AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |    i -> toks[i] || ' ' || toks[i+1])) AS g
       |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS toks
       |        FROM documents WHERE doc_id % 5 <> 0)
       |  WHERE len(toks) >= 2),
       |eb AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |    i -> toks[i] || ' ' || toks[i+1])) AS g
       |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS toks
       |        FROM documents WHERE doc_id % 5 = 0)
       |  WHERE len(toks) >= 2),
       |c2 AS MATERIALIZED (SELECT g, CAST(COUNT(*) AS BIGINT) AS n2
       |  FROM tb GROUP BY g),
       |c1 AS MATERIALIZED (SELECT string_split(g, ' ')[1] AS w1,
       |    CAST(SUM(n2) AS BIGINT) AS n1,
       |    CAST(COUNT(*) AS BIGINT) AS n1p
       |  FROM c2 GROUP BY 1),
       |nc AS MATERIALIZED (SELECT string_split(g, ' ')[2] AS w2,
       |    CAST(COUNT(*) AS BIGINT) AS ncont
       |  FROM c2 GROUP BY 1),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntypes,
       |    CAST(COUNT(DISTINCT string_split(g, ' ')[2]) + 1 AS BIGINT)
       |      AS v1
       |  FROM c2),
       |et AS MATERIALIZED (SELECT DISTINCT g FROM eb),
       |sc0 AS (SELECT et.g,
       |    CASE WHEN c1.w1 IS NULL THEN COALESCE(nc.ncont, 0) + 1
       |      WHEN c2.n2 IS NULL
       |        THEN c1.n1p * (COALESCE(nc.ncont, 0) + 1)
       |      ELSE (2 * c2.n2 - 1) * (tot.ntypes + tot.v1) +
       |        c1.n1p * (COALESCE(nc.ncont, 0) + 1) END AS m,
       |    CASE WHEN c1.w1 IS NULL THEN tot.ntypes + tot.v1
       |      ELSE 2 * c1.n1 * (tot.ntypes + tot.v1) END AS den
       |  FROM et LEFT JOIN c2 ON et.g = c2.g
       |    LEFT JOIN c1 ON string_split(et.g, ' ')[1] = c1.w1
       |    LEFT JOIN nc ON string_split(et.g, ' ')[2] = nc.w2
       |    CROSS JOIN tot),
       |${NbLangid.sqlIlog("sc0", "iln", "g, den")},
       |scd AS (SELECT g, ilog AS ilog_num, den AS m FROM iln),
       |${NbLangid.sqlIlog("scd", "ild", "g, ilog_num")},
       |sc AS MATERIALIZED (SELECT g,
       |    CAST(ilog - ilog_num AS BIGINT) AS nll FROM ild)
       |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
       |  CAST(SUM(nll) AS BIGINT) AS nll_q10,
       |  CAST(SUM(nll) // COUNT(*) AS BIGINT) AS nll_per_bigram_q10
       |FROM eb JOIN sc USING (g)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Seq[Q] = Seq(

    // ---- the CCNet filter plane, properly smoothed: held-out docs
    //      scored under the train split's interpolated-KN bigram
    //      model — finite nll for EVERY doc, unseen bigrams included,
    //      in q10 log2 units with the floor-div per-bigram norm on
    //      the positive nll (Spark div == DuckDB //). ----
    Q("text_kn_logprob", Some(sqlKnLogprob)) { (s, dir) =>
      knLogprob(docs(s, dir)).orderBy("doc_id")
    })
}
