package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank (Mihalcea & Tarau 2004): PageRank over the word
  * co-occurrence graph — the graph-centrality flavor of keyword
  * extraction (complementing `text_doc_keywords`' tf-idf flavor), and
  * the repo's demonstration that ITERATIVE graph algorithms stay
  * oracle-able: every arithmetic step is integer (ranks in 1e6 fixed
  * point, damping 0.85 as ×85 //100, per-edge floor division), so after
  * any fixed number of iterations both engines hold bit-identical
  * ranks — the DuckDB oracle is the same recurrence UNROLLED into one
  * CTE per iteration.
  *
  * Scale shape: the corpus-scale work is exactly one pass (the
  * adjacent-pair count aggregate, map-side partials); every iteration
  * after that runs on the VOCAB plane (edges ≤ vocab², in practice
  * ~avg-degree·vocab) — the same corpus-once/vocab-iterate discipline
  * as `text_bigram_logprob`'s count planes. Vocab-plane joins are
  * pinned shuffle-hash for the same reason documented there: at
  * web-corpus vocabulary the rank side outgrows broadcast, and AQE's
  * skew split cannot fire on aggregate-fed joins (see [[Skew]]); the
  * per-key fan of the rank attach is a token's distinct-neighbor count
  * (vocab-bounded), not its corpus frequency, so the plain
  * shuffle-hash join holds at scale.
  */
object TextRank {

  /** Undirected co-occurrence edge list with out-weights: one
    * (w1, w2, e, wd) row per directed edge — both directions of every
    * adjacent-token pair, e = co-occurrence count, wd = w1's total
    * out-weight. The explode-of-array shape evaluates the bigram
    * subtree once (the union alternative evaluates it per branch). */
  def cooccurrenceEdges(d: DataFrame): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val pairs = Tables.spread(d, col("doc_id"))
      .where(size(toks) >= 2)
      .select(col("doc_id"), toks.as("toks"))
      .select(explode(expr(
        "flatten(transform(sequence(0, size(toks) - 2), i -> " +
          "array(struct(toks[i] as w1, toks[i+1] as w2), " +
          "struct(toks[i+1] as w1, toks[i] as w2))))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val edges = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("e"))
    val wdeg = edges.groupBy("w1").agg(sum("e").cast("long").as("wd"))
    edges.join(wdeg.hint("shuffle_hash"), "w1")
  }

  /** `iters` rounds of damped rank flow from a uniform 1e6 start:
    * r'(v) = 150000 + (85 · Σ_u (e(u,v)·r(u)) // wd(u)) // 100.
    * Integer end to end — deterministic engine-over-engine. Returns
    * (tok, rank_x1m). The edge frame is `.cache()`d (referenced by the
    * start ranks and every iteration) under the same
    * clear-between-queries policy as the MinHash signature caches. */
  def textrank(d: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val ew = cooccurrenceEdges(d).cache()
    var r = ew.select(col("w1")).distinct()
      .select(col("w1"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      r = ew.join(r.hint("shuffle_hash"), "w1")
        .select(col("w2"), expr("(e * r) div wd").as("term"))
        .groupBy("w2")
        .agg(expr("150000 + (85 * sum(term)) div 100").as("r"))
        .select(col("w2").as("w1"), col("r"))
    }
    r.select(col("w1").as("tok"), col("r").as("rank_x1m"))
      .orderBy("tok")
  }

  private def oracleSql(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""r$k AS (SELECT ew.w2 AS w1,
         |    CAST(150000 + (85 * SUM((ew.e * r${k - 1}.r) // ew.wd))
         |      // 100 AS BIGINT) AS r
         |  FROM ew JOIN r${k - 1} ON ew.w1 = r${k - 1}.w1
         |  GROUP BY ew.w2)""".stripMargin
    }.mkString(",\n")
    s"""WITH tk AS (SELECT doc_id, string_split_regex(text, '\\s+')
       |    AS toks FROM documents),
       |bgf AS (SELECT unnest(list_transform(range(1, len(toks)),
       |    i -> toks[i] || ' ' || toks[i+1])) AS g
       |  FROM tk WHERE len(toks) >= 2),
       |dp AS (SELECT string_split(g, ' ')[1] AS w1,
       |    string_split(g, ' ')[2] AS w2 FROM bgf
       |  UNION ALL
       |  SELECT string_split(g, ' ')[2], string_split(g, ' ')[1]
       |  FROM bgf),
       |e AS (SELECT w1, w2, COUNT(*) AS e FROM dp GROUP BY w1, w2),
       |d AS (SELECT w1, CAST(SUM(e) AS BIGINT) AS wd FROM e
       |  GROUP BY w1),
       |ew AS (SELECT e.w1, e.w2, e.e, d.wd FROM e JOIN d USING (w1)),
       |r0 AS (SELECT w1, CAST(1000000 AS BIGINT) AS r FROM d),
       |$iterCtes
       |SELECT w1 AS tok, r AS rank_x1m FROM r$iters
       |ORDER BY tok""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    // ---- see object scaladoc; 3 iterations (TextRank converges fast
    //      on small-diameter word graphs; the oracle unrolls the same
    //      count) ----
    Q("text_textrank_int", Some(oracleSql(3))) { (s, dir) =>
      textrank(Tables.load(s, dir, "documents"), iters = 3)
    })
}
