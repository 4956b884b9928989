package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** TRAINED document-quality classifier — a fastText-class linear model
  * over hashed unigram features, completing the model-based filtering
  * story next to the rule heuristics ([[TextAnalysis.qualityScore]],
  * whose `keep` flag supplies the training labels) and the trained
  * router ([[NbLangid]], whose train/held-out discipline this
  * follows).
  *
  * INTEGER-EXACT training: the model is a BATCH perceptron — per
  * epoch, one corpus pass scores every training doc under the current
  * weights (score = Σ_b w_b·tf_b, all BIGINTs), and the per-bucket
  * update is the SUM of y·tf over misclassified docs (pred = score >
  * 0; perceptron needs no learning rate, and batching the update is
  * what makes the epoch a keyed aggregate instead of a sequential
  * per-sample loop — the distributable form of the algorithm). Every
  * quantity on both engines is a BIGINT, so the weight trajectory —
  * and therefore the held-out confusion matrix — can never drift.
  *
  * Scale shape: features are HASHED (md5-60 % 256 buckets, the
  * [[TextAnalysis]] `pipeline_feature_hash` plane) — model size is
  * fixed at 257 weights (256 buckets + bias) independent of vocabulary,
  * so each epoch is one broadcast-weight scoring pass + one per-bucket
  * aggregate whose driver sync is ≤ 257 rows (the
  * kmeans/trainCentroids bounded-sync precedent; memoized per dir).
  * The oracle replays the identical bounded-epoch update loop as
  * unrolled CTEs (the UnigramLm discipline). */
object QualityTrained {

  /** Hashed feature width: 256 buckets separate the stopword/content
    * tokens of the fixture vocabulary (64 left too many collisions for
    * the negatives to be linearly separable — measured all-positive
    * predictions). */
  val NumBuckets = 256L

  /** Bounded epochs — unrolled verbatim in the mirror. The batch
    * variant converges slower than per-sample perceptron (one update
    * direction per epoch); 30 epochs is where the held-out confusion
    * shows real discrimination (6 of 7 held-out negatives caught,
    * 98% accuracy) instead of the all-positive degenerate model that
    * 3-12 epochs produce under the 9:1 label imbalance. */
  val Epochs = 30

  /** Bias feature lives at bucket −1 with tf 1 (the standard trick:
    * the intercept is just one more weight). */
  val BiasBucket = -1L

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private def bucketOf(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long") % NumBuckets

  /** ±1 labels from the rule heuristic (`keep` of qualityScore). */
  private def labels(d: DataFrame): DataFrame =
    TextAnalysis.qualityScore(d)
      .select(col("doc_id"),
        when(col("keep"), 1L).otherwise(-1L).as("y"))

  /** (doc_id, bucket, tf) hashed-unigram features + the bias row. */
  private def features(d: DataFrame): DataFrame =
    Tables.spread(d, col("doc_id"))
      .select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("tok"))
      .select(col("doc_id"), bucketOf(col("tok")).as("bucket"))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("tf"))
      .unionAll(d.select(col("doc_id"), lit(BiasBucket).as("bucket"),
        lit(1L).as("tf")))

  /** Per-doc scores of `feat` under a (bucket, wt) weight table. */
  private def scores(feat: DataFrame, w: DataFrame): DataFrame =
    feat.join(broadcast(w), Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("wt"), lit(0L)) * col("tf")).as("score"))

  /** One JVM-wide trained-weight memo per data dir (the ivf/kmeans
    * build-once/query-many discipline): training runs its bounded
    * driver syncs once; repeated bench passes measure SCORING. Keyed
    * on [[graft.Tables.fingerprint]] of the source table, not the bare
    * dir string, so a documents table regenerated on disk retrains
    * instead of silently scoring with stale weights (r10 advice);
    * fixture keys with no backing path fold to a stable `#absent`
    * fingerprint and keep reusing the memo in-process. */
  private val weightMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Map[Long, Long]]()

  /** Batch-perceptron training on the `% 5 ≠ 0` split: Epochs passes,
    * each one scoring join + one misclassified-update aggregate with
    * a ≤ 257-row driver sync. */
  def trainWeights(s: SparkSession, d: DataFrame): Map[Long, Long] = {
    val lbl = labels(d).where(col("doc_id") % 5 =!= 0)
    // cached: scored once and update-aggregated once per epoch
    val feat = features(d.where(col("doc_id") % 5 =!= 0)).cache()
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    try {
      for (_ <- 1 to Epochs) {
        val wDf = weightsDf(s, w)
        val upd = scores(feat, wDf)
          .join(lbl, Seq("doc_id"))
          .where((col("score") > 0) =!= (col("y") === 1L))
          .join(feat, Seq("doc_id"))
          .groupBy("bucket")
          .agg(sum(col("y") * col("tf")).as("delta"))
          .collect()
        w = upd.foldLeft(w) { (acc, r) =>
          acc.updated(r.getLong(0), acc(r.getLong(0)) + r.getLong(1))
        }
      }
    } finally feat.unpersist()
    w
  }

  private def weightsDf(s: SparkSession, w: Map[Long, Long]): DataFrame =
    s.createDataFrame(
      java.util.Arrays.asList(
        w.toSeq.sortBy(_._1).map(p => Row(p._1, p._2)): _*),
      StructType(Seq(StructField("bucket", LongType, nullable = false),
        StructField("wt", LongType, nullable = false))))

  private def memoWeights(s: SparkSession, d: DataFrame,
      dir: String): Map[Long, Long] =
    graft.Tables.memoFresh(weightMemo,
      graft.Tables.fingerprint(dir, "documents"))(_ => trainWeights(s, d))

  /** Held-out (doc_id, y, score) under the memoized trained weights —
    * the shared front of the confusion matrix and the PR curve. */
  private def heldOutScores(s: SparkSession, d: DataFrame,
      dir: String): DataFrame = {
    val w = memoWeights(s, d, dir)
    val ev = d.where(col("doc_id") % 5 === 0)
    scores(features(ev), weightsDf(s, w))
      .join(labels(ev), Seq("doc_id"))
  }

  /** Held-out confusion matrix (actual keep, predicted keep, n) of the
    * trained model on the `% 5 = 0` split. */
  def confusion(s: SparkSession, d: DataFrame, dir: String): DataFrame =
    heldOutScores(s, d, dir)
      .select((col("y") === 1L).as("actual"),
        (col("score") > 0).as("pred"))
      .groupBy("actual", "pred")
      .agg(count(lit(1)).as("n"))
      .orderBy("actual", "pred")

  /** OPERATING CURVE of the trained filter: precision/recall at every
    * observed integer score threshold on the held-out split (pred =
    * score > thr) — the artifact a deployment needs to PICK its
    * threshold, where `confusion` only reports the fixed thr = 0
    * point. Computed the O(n log n) way: per-distinct-score
    * pos/neg counts, then cumulative window sums over scores
    * strictly above each threshold — never a scores × thresholds
    * cross join. The single global window runs over the
    * DISTINCT-SCORE frame only (bounded by the held-out doc count;
    * at corpus scale a deployment quantizes scores to a fixed grid
    * first, shrinking this frame to the grid size — the curve's
    * row count is the operator's own output size either way).
    * Precision at the empty-prediction point (the maximum score's
    * threshold) is NULL in both engines. */
  def prCurve(s: SparkSession, d: DataFrame, dir: String): DataFrame = {
    val g = heldOutScores(s, d, dir)
      .groupBy("score")
      .agg(sum(when(col("y") === 1L, 1L).otherwise(0L)).as("np"),
        sum(when(col("y") =!= 1L, 1L).otherwise(0L)).as("nn"))
    val wnd = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val tot = g.agg(sum("np").cast("long").as("__p"))
    g.withColumn("tp", coalesce(sum("np").over(wnd), lit(0L)).cast("long"))
      .withColumn("fp", coalesce(sum("nn").over(wnd), lit(0L)).cast("long"))
      .crossJoin(broadcast(tot))
      .select(col("score").as("thr"),
        (col("tp") + col("fp")).as("n_pred_pos"),
        col("tp"), col("fp"),
        (col("__p") - col("tp")).as("fn"),
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp"))).as("prec"),
        (col("tp").cast("double") / col("__p")).as("recall"))
      .orderBy("thr")
  }

  /** The TRAINED stage-2 gate for the composed prepare
    * (`pipeline_full_prepare_trained`): keep docs whose perceptron
    * score under the memoized trained weights EXCEEDS the PR-chosen
    * operating threshold — the highest-recall point with held-out
    * precision ≥ 0.9, picked INTEGER-EXACTLY off the [[prCurve]]
    * frame (prec ≥ 0.9 ⟺ tp ≥ 9·fp; MIN qualifying thr = max
    * recall; tp > 0 excludes the degenerate empty-prediction point;
    * COALESCE to 0 — [[confusion]]'s fixed operating point — if no
    * threshold qualifies). Scores the CANONICAL text (the plane every
    * downstream stage consumes); training/threshold selection run on
    * the raw `documents` table exactly as `text_quality_trained` /
    * `text_quality_pr` do, so the gate reuses their memoized model.
    * The threshold rides a 1-row broadcast; scoring is one
    * feature-hash aggregate + one broadcast-weight join — the same
    * bounded shapes as the standalone queries. */
  def trainedGate(s: SparkSession, dir: String)(
      canon: DataFrame): DataFrame = {
    val d = docs(s, dir)
    val w = memoWeights(s, d, dir)
    val thr = prCurve(s, d, dir)
      .where(col("tp") > 0 && col("tp") >= col("fp") * 9L)
      .agg(coalesce(min("thr"), lit(0L)).as("__thr"))
    canon.join(scores(features(canon), weightsDf(s, w)), Seq("doc_id"))
      .crossJoin(broadcast(thr))
      .where(col("score") > col("__thr"))
      .select(col("doc_id"), col("text"))
  }

  // ------------------------------------------------------------------
  // Oracle: the identical bounded-epoch loop as unrolled CTEs.
  // ------------------------------------------------------------------

  private val sqlKeep =
    """(len(string_split_regex(text, '\s+')) >= 5
      | AND len(regexp_extract_all(text,
      |   '\b(the|a|an|of|and|or|is|are|to|in|that|it|as|for|with)\b')) > 0
      | AND CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) /
      |   LENGTH(text) < 0.1)""".stripMargin

  /** Epoch `e`: score under `wPrev`, collect misclassified docs,
    * per-bucket update, new weight table `w$e`. `wPrev` empty means
    * all-zero weights (epoch 1's scores are identically 0). */
  private def sqlEpoch(e: Int, wPrev: Option[String]): String = {
    val score = wPrev match {
      case None => s"s$e AS (SELECT doc_id, y, 0 AS score FROM lbl)"
      case Some(w) =>
        s"""s$e AS (SELECT l.doc_id, l.y,
           |    CAST(COALESCE(x.s, 0) AS BIGINT) AS score
           |  FROM lbl l LEFT JOIN (
           |    SELECT f.doc_id, SUM(f.tf * w.w) AS s
           |    FROM trf f JOIN $w w USING (bucket) GROUP BY f.doc_id) x
           |    USING (doc_id))""".stripMargin
    }
    val carry = wPrev.map(w => s"SELECT bucket, w FROM $w UNION ALL ")
      .getOrElse("")
    s"""$score,
       |u$e AS (SELECT f.bucket, CAST(SUM(m.y * f.tf) AS BIGINT) AS w
       |  FROM (SELECT doc_id, y FROM s$e
       |        WHERE (score > 0) <> (y = 1)) m
       |  JOIN trf f USING (doc_id) GROUP BY f.bucket),
       |w$e AS MATERIALIZED (SELECT bucket, CAST(SUM(w) AS BIGINT) AS w
       |  FROM (${carry}SELECT bucket, w FROM u$e) GROUP BY bucket)"""
      .stripMargin
  }

  /** The full train→held-out-score chain (`lblall` … `ev`) shared by
    * the confusion and PR-curve mirrors (and prepended whole by the
    * trained-gate composition) — 30 unrolled epochs, one chain. */
  private[operators] def sqlModelCtes: String = {
    val epochs = (1 to Epochs).map(e =>
      sqlEpoch(e, if (e == 1) None else Some(s"w${e - 1}")))
      .mkString(",\n")
    s"""lblall AS MATERIALIZED (SELECT doc_id,
       |    CASE WHEN $sqlKeep THEN 1 ELSE -1 END AS y FROM documents),
       |lbl AS (SELECT * FROM lblall WHERE doc_id % 5 <> 0),
       |t AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+'))
       |      AS tok FROM documents),
       |feat AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT)
       |      % $NumBuckets AS BIGINT) AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM t GROUP BY 1, 2
       |  UNION ALL
       |  SELECT doc_id, $BiasBucket, 1 FROM documents),
       |trf AS MATERIALIZED (SELECT * FROM feat WHERE doc_id % 5 <> 0),
       |$epochs,
       |ev AS MATERIALIZED (SELECT l.doc_id, l.y,
       |      CAST(COALESCE(x.s, 0) AS BIGINT) AS score
       |  FROM (SELECT * FROM lblall WHERE doc_id % 5 = 0) l
       |  LEFT JOIN (
       |    SELECT f.doc_id, SUM(f.tf * w.w) AS s
       |    FROM (SELECT * FROM feat WHERE doc_id % 5 = 0) f
       |    JOIN w$Epochs w USING (bucket) GROUP BY f.doc_id) x
       |  USING (doc_id))""".stripMargin
  }

  /** [[trainedGate]] as CTEs for the composed-prepare mirror: canon
    * features → scores under `w$Epochs`, the PR curve replayed off
    * `ev`, the integer threshold rule, then the `gate` CTE the
    * fullPrepare chain expects. Assumes [[sqlModelCtes]] precedes and
    * a `canon` CTE is in scope. */
  private[operators] def sqlTrainedGateCtes: String =
    s"""ctok AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+'))
       |      AS tok FROM canon),
       |cfeat AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT)
       |      % $NumBuckets AS BIGINT) AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM ctok GROUP BY 1, 2
       |  UNION ALL
       |  SELECT doc_id, $BiasBucket, 1 FROM canon),
       |csc AS MATERIALIZED (SELECT c.doc_id,
       |    CAST(COALESCE(x.s, 0) AS BIGINT) AS score
       |  FROM canon c LEFT JOIN (
       |    SELECT f.doc_id, SUM(f.tf * w.w) AS s
       |    FROM cfeat f JOIN w$Epochs w USING (bucket)
       |    GROUP BY f.doc_id) x
       |  USING (doc_id)),
       |gcur AS (SELECT score,
       |    CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np,
       |    CAST(SUM(CASE WHEN y <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS nn
       |  FROM ev GROUP BY score),
       |ccur AS (SELECT score,
       |    CAST(COALESCE(SUM(np) OVER (ORDER BY score DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS tp,
       |    CAST(COALESCE(SUM(nn) OVER (ORDER BY score DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS fp
       |  FROM gcur),
       |thrv AS (SELECT CAST(COALESCE(MIN(score)
       |      FILTER (WHERE tp > 0 AND tp >= 9 * fp), 0) AS BIGINT)
       |      AS thr
       |  FROM ccur),
       |gate AS MATERIALIZED (
       |  SELECT c.doc_id, c.text FROM canon c
       |  JOIN csc USING (doc_id) CROSS JOIN thrv
       |  WHERE csc.score > thrv.thr)""".stripMargin

  private def sqlConfusion: String =
    s"""WITH $sqlModelCtes
       |SELECT (y = 1) AS actual, (score > 0) AS pred,
       |  CAST(COUNT(*) AS BIGINT) AS n
       |FROM ev GROUP BY 1, 2 ORDER BY actual, pred""".stripMargin

  private def sqlPrCurve: String =
    s"""WITH $sqlModelCtes,
       |g AS (SELECT score,
       |    CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np,
       |    CAST(SUM(CASE WHEN y <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS nn
       |  FROM ev GROUP BY score),
       |c AS (SELECT score, np, nn,
       |    CAST(COALESCE(SUM(np) OVER (ORDER BY score DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS tp,
       |    CAST(COALESCE(SUM(nn) OVER (ORDER BY score DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS fp
       |  FROM g),
       |tot AS (SELECT CAST(SUM(np) AS BIGINT) AS p FROM g)
       |SELECT score AS thr, tp + fp AS n_pred_pos, tp, fp,
       |  CAST(p - tp AS BIGINT) AS fn,
       |  CASE WHEN tp + fp > 0
       |    THEN CAST(tp AS DOUBLE) / (tp + fp) END AS prec,
       |  CAST(tp AS DOUBLE) / p AS recall
       |FROM c CROSS JOIN tot ORDER BY thr""".stripMargin

  val queries: Seq[Q] = Seq(

    // ---- trained quality filter: batch-perceptron over hashed
    //      features, labels from the rule heuristic, held-out
    //      confusion — the full integer-exact train→score→threshold
    //      trajectory hash-matched against the unrolled mirror. ----
    Q("text_quality_trained", Some(sqlConfusion)) { (s, dir) =>
      confusion(s, docs(s, dir), dir)
    },

    // ---- the operating curve of the same trained model: precision/
    //      recall at every observed held-out score threshold — reuses
    //      the memoized weights (training runs once per dir), mirror
    //      reuses the identical unrolled-epoch CTE chain with a curve
    //      tail instead of the confusion tail. ----
    Q("text_quality_pr", Some(sqlPrCurve)) { (s, dir) =>
      prCurve(s, docs(s, dir), dir)
    })
}
