package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond scoring and dedup: deterministic stratified sampling, corpus
  * balance reporting, length histograms, and quantile-based quality
  * filtering. Everything is windowed/grouped integer math — no RNG (a
  * cluster re-run must pick the same sample, so "random" is a hash
  * order), no floating-point aggregation, every query oracle-checked.
  *
  * Scale notes: a stratum key like `lang` has ~5 values, so a naive
  * `Window.partitionBy(lang)` serializes each stratum's full sort
  * through one task — fine at sf0.1, a 20 TB single-partition sort at
  * the 100 TB target. Both per-stratum operators here therefore avoid
  * full-stratum windows: the quota sample is a two-phase top-K (salted
  * partial top-K, then a final rank over the ≤ K·fanOut survivors) and
  * the median split routes the bulk of the data through a keyed
  * aggregation, running an exact rank only over the score histogram and
  * the boundary-score ties. Nothing here collects to the driver.
  */
object Sampling {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Salt fan-out for two-phase per-stratum top-K: phase 1 runs over
    * (stratum, xxhash64(doc_id) mod FanOut) so each stratum's partial
    * sort spreads across up to FanOut tasks, independent of stratum
    * cardinality. Raise for bigger clusters — correctness is invariant. */
  val FanOut = 64

  /** Phase 1 of the two-phase top-K: per (stratum, salt-bucket) partial
    * top-`k` in `orderCols` order. The global per-stratum top-k is a
    * subset of the union of bucket top-ks (each element of the true
    * top-k lands in SOME bucket and is top-k there too), so phase 2 only
    * ever ranks ≤ k·fanOut rows per stratum. `saltCol` is any column
    * that spreads rows evenly (defaults to doc_id for document frames;
    * token frames salt on the token — correctness only needs
    * determinism, not uniformity). */
  private[operators] def partialTopK(d: DataFrame, stratumCol: String,
      orderCols: Seq[Column], k: Int, fanOut: Int,
      saltCol: Column = col("doc_id")): DataFrame = {
    val salted = d.withColumn("__salt",
      pmod(xxhash64(saltCol), lit(fanOut)))
    val w = Window.partitionBy(col(stratumCol), col("__salt"))
      .orderBy(orderCols: _*)
    salted.withColumn("__prn", row_number().over(w))
      .where(col("__prn") <= k)
      .drop("__salt", "__prn")
  }

  /** Deterministic stratified sample: `perStratum` docs per stratum,
    * ranked by (md5(text), doc_id) — a content hash as the shuffle-stable
    * "random" order, so the sample is reproducible run-over-run and
    * engine-over-engine (the seed is the corpus itself).
    *
    * Two-phase for scale: the salted partial top-K bounds what reaches
    * the final per-stratum rank to ≤ perStratum·FanOut rows, so no task
    * ever sorts a whole stratum (SkewSpec-style spread assert in
    * SamplingSpec). Result is identical to the single-window form. */
  def stratifiedSample(d: DataFrame, stratumCol: String, perStratum: Int)
      : DataFrame = {
    val keyed = d.select(col(stratumCol), col("doc_id"),
      md5(col("text")).as("__h"))
    val survivors = partialTopK(keyed, stratumCol,
      Seq(col("__h"), col("doc_id")), perStratum, FanOut)
    val w = Window.partitionBy(stratumCol)
      .orderBy(col("__h"), col("doc_id"))
    survivors.withColumn("rn", row_number().over(w))
      .where(col("rn") <= perStratum)
      .select(col(stratumCol), col("doc_id"), col("rn"))
  }

  /** Cardinality contract shared by [[topHalfByScore]] and
    * [[rankQuantiles]]: the scale story of both operators is that the
    * `(stratum, score)` histogram is METADATA-sized, which holds for
    * integral scores (len/count-style signals have bounded distinct
    * values) but silently fails for a continuous double score — every
    * row's score is distinct, the histogram is corpus-sized, and the
    * cumulative window over it becomes the per-stratum serial sort the
    * design exists to avoid. Enforced loudly at the API boundary:
    * continuous scores must be bucketized FIRST (e.g.
    * `floor(score * 1000).cast("long")` — the caller picks the
    * resolution, which IS the histogram-size bound), then passed here. */
  private def requireHistogramScore(d: DataFrame, scoreCol: String)
      : Unit = {
    import org.apache.spark.sql.types._
    val dt = d.schema(scoreCol).dataType
    val ok = dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
        BooleanType => true
      case _ => false
    }
    require(ok,
      s"$scoreCol is ${dt.simpleString}: histogram-quantile operators " +
        "require a bounded-cardinality (integral) score column — a " +
        "continuous score makes the (stratum, score) histogram " +
        "corpus-sized and its rank window a serial stratum sort. " +
        "Bucketize first, e.g. floor(score * 1000) cast to long.")
  }

  /** Per-stratum top-fraction filter on an integer score column: keeps
    * rows whose rank from the top satisfies `2*rank <= n+1` (the top half
    * including the median element) — exact integer logic, no percentile
    * interpolation to drift between engines.
    *
    * Score-cardinality contract: see [[requireHistogramScore]] —
    * integral scores only; bucketize continuous scores first.
    *
    * Scale shape: the bulk data passes only through a map-side-combined
    * `groupBy(stratum, score)` histogram and a semi join back; the exact
    * rank runs (a) over the histogram (|strata| × |distinct scores| rows
    * — metadata-sized) to find each stratum's boundary score, and (b) by
    * doc_id over just the boundary-score ties, the residual serial unit
    * (vastly smaller than a stratum). Equivalent to, and hash-matching,
    * the single-window rank form. */
  def topHalfByScore(d: DataFrame, stratumCol: String, scoreCol: String)
      : DataFrame = {
    requireHistogramScore(d, scoreCol)
    val hist = d.groupBy(col(stratumCol), col(scoreCol))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(stratumCol).orderBy(col(scoreCol).desc)
    // cached: both the keep-all branch and the boundary branch derive
    // from this frame, and without the cache each re-runs the full-data
    // histogram aggregate (two corpus scans instead of one at 100 TB);
    // it is metadata-sized (|strata| x |distinct scores|). Verify/Bench
    // clear per-query caches between runs.
    val cum = hist
      .withColumn("__cum", sum("__c").over(wCum))
      .withColumn("__n", sum("__c").over(Window.partitionBy(stratumCol)))
      .withColumn("__k", expr("(__n + 1) div 2"))
      .withColumn("__before", col("__cum") - col("__c"))
      .cache()
    // score groups entirely inside the top half: keep every row
    val fullKeep = cum.where(col("__cum") <= col("__k"))
      .select(col(stratumCol), col(scoreCol))
    // the one score group per stratum straddling the cut: keep the first
    // (k - before) ties by doc_id — same order the single-window rank uses
    val boundary = cum
      .where(col("__before") < col("__k") && col("__cum") > col("__k"))
      .select(col(stratumCol), col(scoreCol),
        (col("__k") - col("__before")).as("__m"))
    val keptFull = d.join(fullKeep, Seq(stratumCol, scoreCol), "left_semi")
    val wTie = Window.partitionBy(col(stratumCol), col(scoreCol))
      .orderBy(col("doc_id"))
    val keptTies = d
      .join(broadcast(boundary), Seq(stratumCol, scoreCol))
      .withColumn("__trn", row_number().over(wTie))
      .where(col("__trn") <= col("__m"))
      .drop("__trn", "__m")
    keptFull.unionByName(keptTies)
  }

  /** NTILE's bucket-of-rank arithmetic as a column expression: with `n`
    * rows and `k` tiles, ascending 1-based rank `rk` lands in bucket
    *
    *   rk ≤ (q+1)·r  →  (rk + q) div (q+1)          (q = n div k,
    *   otherwise     →  r + (rk − (q+1)·r + q − 1) div q    r = n mod k)
    *
    * — the first r tiles carry q+1 rows, the rest q (the SQL-standard
    * NTILE split both engines implement). The n < k edge (q = 0) falls
    * entirely into the first branch (rk ≤ n = 1·r), so the else-branch
    * q division never evaluates (CASE is lazy per row in both engines). */
  private def ntileBucket(rk: String, n: String, k: Int): Column =
    expr(
      s"""CASE WHEN $rk <= (($n div $k) + 1) * ($n % $k)
         |  THEN CAST(($rk + ($n div $k)) div (($n div $k) + 1) AS INT)
         |  ELSE CAST(($n % $k) +
         |    ($rk - (($n div $k) + 1) * ($n % $k) + ($n div $k) - 1)
         |      div ($n div $k) AS INT)
         |END""".stripMargin)

  /** EXACT global NTILE(`k`) over ascending (`scoreCol`, `idCol`)
    * WITHOUT a corpus-sized single-partition window — the tercile
    * machinery of the perplexity gate ([[KnLm.pplGate]],
    * `pipeline_ppl_buckets*`). Returns every row of `d` plus `bucket`
    * (INT, 1-based), row-for-row equal to
    * `ntile(k) OVER (ORDER BY scoreCol, idCol)` (SamplingSpec pins the
    * equality on boundary-straddling tie groups, n % k ∈ {0,1,2}, and
    * n < k).
    *
    * Scale shape (the [[topHalfByScore]] discipline, globalized): the
    * doc plane passes ONE map-side-combined (score → count) histogram
    * aggregate and broadcast equijoins back — never a sort. The
    * cumulative ranks and the [[ntileBucket]] arithmetic run on the
    * METADATA-sized histogram (the [[requireHistogramScore]] contract
    * bounds its cardinality — integral scores only); score groups whose
    * first and last global ranks land in the SAME bucket attach it by
    * equijoin, rank-free, and the only per-row ranking is by `idCol`
    * WITHIN the ≤ k−1 boundary score groups that straddle a tile cut.
    *
    * Bounded boundary rank (r14): the tie rank inside a boundary score
    * group is itself two-phase — boundary rows range-partition into
    * [[FanOut]] ordered (`scoreCol`, `idCol`) segments, the per-(segment,
    * score) counts (≤ FanOut·(k−1) rows) yield each segment's rank
    * offset within its group, and the per-row window ranks only ONE
    * segment's slice of a group. The degenerate all-ties corpus (every
    * row one score) therefore spreads across FanOut tasks instead of
    * serializing through one (SamplingSpec pins equality on exactly
    * that corpus, plus the >1-partition spread).
    *
    * NULL scores are EXCLUDED from the output (the histogram groups
    * them but the bucket attach is an inner equijoin — a NULL key never
    * matches), whereas a raw NTILE window would rank them; callers gate
    * on non-null score planes (the perplexity scores are total), so the
    * exclusion is the contract, not a bug. The histogram cache lives
    * only until the two metadata-sized branch frames checkpoint —
    * released before the corpus-plane joins run (no leaked cache per
    * invocation in a long-lived driver). */
  def ntileByScore(d: DataFrame, scoreCol: String, idCol: String,
      k: Int): DataFrame = {
    requireHistogramScore(d, scoreCol)
    val hist = d.groupBy(col(scoreCol)).agg(count(lit(1)).as("__c"))
    // cached across the two branch materializations below (the
    // topHalfByScore precedent — one corpus histogram pass, not two);
    // histogram-sized, and unpersisted once both branches checkpoint
    val cum = hist
      .withColumn("__cum", sum("__c").over(Window.orderBy(col(scoreCol))))
      .withColumn("__n", sum("__c").over(Window.partitionBy()))
      .withColumn("__before", col("__cum") - col("__c"))
      .withColumn("__rk1", col("__before") + lit(1L))
      .withColumn("__blo", ntileBucket("__rk1", "__n", k))
      .withColumn("__bhi", ntileBucket("__cum", "__n", k))
      .cache()
    val interior = cum.where(col("__blo") === col("__bhi"))
      .select(col(scoreCol), col("__blo").as("bucket"))
      .localCheckpoint()
    val boundary = cum.where(col("__blo") =!= col("__bhi"))
      .select(col(scoreCol), col("__before"), col("__n"))
      .localCheckpoint()
    cum.unpersist()
    val inRows = d.join(broadcast(interior), Seq(scoreCol))
    // two-phase boundary rank: ordered range segments + metadata-sized
    // segment offsets + a per-(segment, score) local window. The
    // segment id `__p` is partition-layout-DEPENDENT and feeds two
    // consumers (the segOff aggregate and the bRows join), so the
    // ranged frame is pinned by localCheckpoint (r15 advice): both
    // branches must read the IDENTICAL materialized range layout —
    // relying on Spark's exchange-reuse to unify two sampled range
    // exchanges would misalign offsets if reuse ever failed to fire.
    val ranged = d.join(broadcast(boundary), Seq(scoreCol))
      .repartitionByRange(FanOut, col(scoreCol), col(idCol))
      .withColumn("__p", spark_partition_id())
      .localCheckpoint()
    val segOff = ranged.groupBy(col("__p"), col(scoreCol))
      .agg(count(lit(1)).as("__sc"))
      .withColumn("__off",
        sum("__sc").over(Window.partitionBy(scoreCol).orderBy("__p")) -
          col("__sc"))
      .select(col("__p"), col(scoreCol), col("__off"))
    val wLoc = Window.partitionBy(col("__p"), col(scoreCol))
      .orderBy(col(idCol))
    val bRows = ranged
      .join(broadcast(segOff), Seq("__p", scoreCol))
      .withColumn("__grk",
        col("__before") + col("__off") + row_number().over(wLoc))
      .withColumn("bucket", ntileBucket("__grk", "__n", k))
      .drop("__grk", "__before", "__n", "__p", "__off")
    inRows.unionByName(bRows)
  }

  /** EXACT rank-based quantiles per stratum WITHOUT a full-stratum sort:
    * the value at ascending (score, doc_id)-rank ceil(q·n/d) for each
    * requested q/d. Bulk data passes one map-side-combined
    * (stratum, score) histogram aggregate; the rank arithmetic runs on
    * the metadata-sized histogram (same discipline as
    * [[topHalfByScore]], generalized from the median to any quantile —
    * and unlike `approx_percentile` there is no sketch error for the
    * oracle to disagree with). Ties only permute equal scores, so the
    * rank-k VALUE is tie-order-independent and engine-exact.
    *
    * Score-cardinality contract: see [[requireHistogramScore]] —
    * integral scores only; bucketize continuous scores first. */
  def rankQuantiles(d: DataFrame, stratumCol: String, scoreCol: String,
      quantiles: Seq[(String, Int, Int)]): DataFrame = {
    requireHistogramScore(d, scoreCol)
    val hist = d.groupBy(col(stratumCol), col(scoreCol))
      .agg(count(lit(1)).as("__c"))
    val wAsc = Window.partitionBy(stratumCol).orderBy(col(scoreCol).asc)
    val cum = hist
      .withColumn("__cum", sum("__c").over(wAsc))
      .withColumn("__n", sum("__c").over(Window.partitionBy(stratumCol)))
    val aggs = quantiles.map { case (name, num, den) =>
      // k = ceil(num*n/den); the quantile is the least score whose
      // cumulative count reaches k
      val k = expr(s"($num * __n + ${den - 1}) div $den")
      min(when(col("__cum") >= k, col(scoreCol))).as(name)
    }
    cum.groupBy(col(stratumCol))
      .agg(first("__n").as("n"), aggs: _*)
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
    },

    // ---- temperature-scaled sampling shares, alpha = 0.5 (the
    //      multilingual upsampling of mBERT/XLM-R: share_l proportional
    //      to n_l^alpha, boosting low-resource languages). Hash-exact
    //      float discipline: SQRT is correctly rounded IEEE on both
    //      engines, so the per-lang micro-unit floor(sqrt(n)*1e6) is
    //      bit-deterministic, and the normalization runs on the BIGINT
    //      micro-units (order-free SUM, integer DIV ppm) — the one
    //      float op is per-row, never accumulated. Metadata-sized
    //      throughout (one keyed count + a <=|langs|-row window). ----
    Q("pipeline_mix_temperature", Some(
      """WITH a AS (SELECT lang, COUNT(*) AS n_docs FROM documents
        |           GROUP BY lang),
        |m AS (SELECT lang, n_docs,
        |        CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000000)
        |          AS BIGINT) AS micro
        |      FROM a)
        |SELECT lang, n_docs, micro,
        |  CAST(micro * 1000000 // (SELECT SUM(micro) FROM m) AS BIGINT)
        |    AS share_ppm
        |FROM m ORDER BY lang""".stripMargin)) { (s, dir) =>
      val m = docs(s, dir).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
        .select(col("lang"), col("n_docs"),
          floor(sqrt(col("n_docs").cast("double")) * 1e6).cast("long")
            .as("micro"))
      val t = m.agg(sum("micro").cast("long").as("__t"))
      m.crossJoin(broadcast(t))
        .select(col("lang"), col("n_docs"), col("micro"),
          expr("micro * 1000000 DIV __t").as("share_ppm"))
        .orderBy("lang")
    },

    // ---- exact per-language score quartiles (curriculum planner /
    //      quality-threshold input). The oracle states the semantics
    //      naively (rank-k value over a per-stratum window); the Spark
    //      side computes the identical values from the score histogram
    //      — one corpus aggregate, no stratum-wide sort anywhere. ----
    Q("pipeline_score_quantiles", Some(
      """SELECT lang, CAST(MAX(n) AS BIGINT) AS n,
        |  MAX(CASE WHEN rk = (1*n + 3) // 4 THEN n_chars END) AS q1_chars,
        |  MAX(CASE WHEN rk = (2*n + 3) // 4 THEN n_chars END) AS med_chars,
        |  MAX(CASE WHEN rk = (3*n + 3) // 4 THEN n_chars END) AS q3_chars
        |FROM (SELECT lang, n_chars,
        |        ROW_NUMBER() OVER (PARTITION BY lang
        |          ORDER BY n_chars, doc_id) AS rk,
        |        COUNT(*) OVER (PARTITION BY lang) AS n
        |      FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin)) { (s, dir) =>
      rankQuantiles(docs(s, dir), "lang", "n_chars",
        Seq(("q1_chars", 1, 4), ("med_chars", 2, 4), ("q3_chars", 3, 4)))
        .orderBy("lang")
    },

    // ---- apply the mix weights: deterministic weighted resampling ----
    // The MATERIALIZATION step after `pipeline_mix_weights`: every doc
    // emits floor(w) copies plus one more iff its content-hash uniform
    // falls under frac(w) — so a source with weight 1.4 keeps every doc
    // and duplicates a deterministic 40%. The uniform is the first 4
    // md5 hex chars of (text, doc_id) compared lexicographically against
    // the hex-encoded threshold floor(frac(w)*65536): fixed-width hex
    // compare IS numeric compare, and both engines spell it with the
    // same string functions — no RNG, restart-stable, engine-exact.
    // Scale: per-source weights are a tiny broadcast; the explode is a
    // narrow per-row generator (≤ ceil(w) ≤ 2 rows out per doc).
    Q("pipeline_apply_mix", Some(
      """WITH a AS (SELECT source, COUNT(*) AS n_docs FROM documents
        |           GROUP BY source),
        |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
        |        COUNT(*) AS n_sources FROM a),
        |w AS (SELECT source, LEAST(CAST(total AS DOUBLE)
        |        / (n_sources * n_docs), 2.0) AS wt FROM a, t),
        |d AS (SELECT doc_id, dd.source,
        |        CAST(FLOOR(wt) AS INTEGER) +
        |        CASE WHEN upper(substr(md5(text || '|' ||
        |                 CAST(doc_id AS VARCHAR)), 1, 4)) <
        |               upper(lpad(to_hex(CAST(FLOOR((wt - FLOOR(wt))
        |                 * 65536) AS BIGINT)), 4, '0'))
        |             THEN 1 ELSE 0 END AS copies
        |      FROM documents dd JOIN w ON dd.source = w.source),
        |e AS (SELECT doc_id, source
        |      FROM d, UNNEST(generate_series(1, copies)))
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_out,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_unique
        |FROM e GROUP BY source ORDER BY source""".stripMargin)) {
      (s, dir) =>
      val a = docs(s, dir).groupBy("source").agg(count(lit(1)).as("n_docs"))
      val t = a.agg(sum("n_docs").cast("long").as("total"),
        count(lit(1)).as("n_sources"))
      val w = a.crossJoin(broadcast(t))
        .select(col("source"), least(col("total").cast("double")
          / (col("n_sources") * col("n_docs")), lit(2.0)).as("wt"))
      val tHex = upper(lpad(hex(floor((col("wt") - floor(col("wt")))
        * 65536).cast("long")), 4, "0"))
      val uHex = upper(substring(md5(concat(col("text"), lit("|"),
        col("doc_id").cast("string"))), 1, 4))
      docs(s, dir).join(broadcast(w), "source")
        .withColumn("copies", floor(col("wt")).cast("int") +
          when(uHex < tHex, 1).otherwise(0))
        // array_repeat, not sequence(1, copies): Spark's sequence steps
        // BACKWARD when start > stop, so copies=0 would emit 2 rows
        .select(col("doc_id"), col("source"),
          explode(array_repeat(lit(1), col("copies"))).as("__one"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_out"),
          countDistinct("doc_id").as("n_unique"))
        .orderBy("source")
    })
}
