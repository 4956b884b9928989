package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** AQE parity sweep (round-8 verdict task #5): Spark 4 runs ADAPTIVE
  * execution by default, and every harness session (Verify, Bench, the
  * shared test session) inherits that default — so the production
  * configuration the 100 TB story assumes is the one the oracle already
  * checks. What nothing proved until now is the other direction: that
  * results and plan hygiene SURVIVE toggling AQE, i.e. that no query's
  * answer depends on runtime re-planning (broadcast-threshold
  * flip-flops, coalesced shuffle partitions, skew splits) in either
  * direction. This sweep runs the bench top-10 heaviest queries plus
  * the round-9 additions under two sibling sessions — adaptive
  * explicitly ON and explicitly OFF — and asserts cell-exact result
  * equality (doubles compared by IEEE bit pattern, the driver's hash
  * discipline) plus the PlanHygieneSpec no-NL-join rule under BOTH
  * settings.
  */
class AqeParitySpec extends SparkSpec with AdaptiveSparkPlanHelper {

  /** Bench top-10 by round-8 cost + the round-9 operator additions. */
  private val sweep = Seq(
    "emb_power_iteration_int", "text_bpe_merges", "pipeline_decontaminate",
    "text_bigram_logprob", "ann_ivfpq_rerank_int", "pipeline_paragraph_dedup",
    "pipeline_drop_near_dups", "ann_pq_adc_int", "dedup_ngram_jaccard",
    "dedup_simhash",
    // round-9 additions
    "pipeline_exact_substr", "emb_kmeans_converged", "dedup_jaccard_prefix",
    "q_zorder_prune", "text_unigram_lm", "text_unigram_tokenize",
    "pipeline_exact_substr_removal", "ann_hamming_mih", "text_nb_langid",
    "dedup_containment",
    // round-10 additions
    "mm_image_dedup", "pipeline_full_prepare", "q_heavy_hitters",
    "text_canonicalize", "text_quality_trained",
    "pipeline_decontaminate_bloom", "dedup_jaccard_prefix3",
    "mm_audio_dedup", "mm_video_dedup", "mm_image_cluster",
    "text_lm_doclogprob",
    // round-11 additions
    "q_warc_extract", "mm_image_dedup_resized", "mm_pair_dedup",
    "text_kn_logprob", "text_common_bigrams_cms", "text_quality_pr",
    "pipeline_crawl_prepare", "text_kn3_logprob",
    "pipeline_ppl_buckets", "mm_warc_media", "mm_audio_dedup_pooled",
    // round-12 additions
    "q_warc_extract_gz", "pipeline_full_prepare_trained",
    "text_kn5_logprob", "pipeline_ppl_buckets_kn5",
    "mm_video_dedup_pooled", "pipeline_warc_prepare",
    "q_warc_url_dedup", "q_warc_wet_roundtrip", "pipeline_url_prepare",
    "pipeline_full_prepare_ppl",
    // round-13 additions
    "text_kn5_logprob_ref", "text_scrub_lines",
    "pipeline_crawl_prepare_langid",
    "mm_warc_media_audio", "mm_warc_media_video",
    "pipeline_full_prepare_ppl_ref",
    // round-14 additions
    "q_warc_domain_filter", "pipeline_full_prepare_ppl_refd")

  /** Canonical cell: doubles/floats by bit pattern (-0.0 != +0.0, any
    * NaN equal — exactly tools/check.py's cells_equal). */
  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq.map {
      case d: Double => java.lang.Double.doubleToLongBits(d)
      case f: Float  => java.lang.Float.floatToIntBits(f)
      case x => x
    }).sortBy(_.mkString("\u0000"))

  /** Queries in the allowed-quadratic sets mirror PlanHygieneSpec. */
  private val allowedNl = Set("dedup_ngram_jaccard", "pipeline_drop_near_dups",
    "emb_kmeans_converged", "pipeline_exact_substr", "dedup_jaccard_prefix",
    "dedup_jaccard_prefix3",
    "pipeline_decontaminate", "text_bigram_logprob", "pipeline_paragraph_dedup",
    "text_unigram_tokenize", "pipeline_exact_substr_removal",
    "text_nb_langid", "dedup_containment", "text_lm_doclogprob",
    // the pack stage's 1-row min/max bounds broadcast (packSequences)
    "pipeline_full_prepare",
    // the 1-row grand-total broadcast feeding the tolerance gate
    "q_heavy_hitters",
    // the unpruned variant's hot-key-cutoff total broadcast
    "pipeline_decontaminate_bloom",
    // round-11 1-row-total broadcasts (PlanHygieneSpec's list)
    "text_kn_logprob", "text_quality_pr", "mm_pair_dedup",
    "text_kn3_logprob", "pipeline_ppl_buckets",
    // the pack-stage bounds row, as pipeline_full_prepare
    "pipeline_crawl_prepare",
    // round-12 1-row-total broadcasts (PlanHygieneSpec's list)
    "pipeline_full_prepare_trained", "text_kn5_logprob",
    "pipeline_ppl_buckets_kn5", "pipeline_warc_prepare",
    // the pack-stage bounds row, via the URL-dedup front
    "pipeline_url_prepare",
    // the pack bounds row + the kn5 chain's 1-row totals
    "pipeline_full_prepare_ppl",
    // round-13: the kn5 chain's 1-row totals under the ref-trained model
    "text_kn5_logprob_ref",
    // the NB router's 1-row vocab frame + fan-out + the pack bounds row
    "pipeline_crawl_prepare_langid",
    // the pack bounds row + the kn5 chain's 1-row totals
    "pipeline_full_prepare_ppl_ref",
    // r14: the same 1-row totals + the decon stage's grand-total row
    "pipeline_full_prepare_ppl_refd")

  test("bench top-10 + round-9 queries: identical results and clean " +
      "plans with AQE ON and OFF") {
    val on = spark.newSession()
    on.conf.set("spark.sql.adaptive.enabled", "true")
    val off = spark.newSession()
    off.conf.set("spark.sql.adaptive.enabled", "false")
    for (name <- sweep) {
      val fn = SparkEntry.queries(name)
      on.catalog.clearCache(); off.catalog.clearCache()
      // construct AND execute one mode fully before the other: queries
      // with a write-fixture construction step (q_zorder_prune)
      // overwrite their input files each construction
      val dOn = fn(on, sfDir)
      val rOn = canon(dOn)
      val dOff = fn(off, sfDir)
      val rOff = canon(dOff)
      assert(rOn == rOff, s"$name: AQE on/off results diverge " +
        s"(${rOn.size} vs ${rOff.size} rows)")
      for ((df, mode) <- Seq(dOn -> "on", dOff -> "off")
           if !allowedNl(name)) {
        val bad = collect(df.queryExecution.executedPlan) {
          case j: BroadcastNestedLoopJoinExec => j.getClass.getSimpleName
          case j: CartesianProductExec        => j.getClass.getSimpleName
        }
        assert(bad.isEmpty,
          s"$name: NL/cartesian join appeared with AQE $mode: $bad")
      }
    }
  }
}
