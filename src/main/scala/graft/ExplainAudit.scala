package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted physical plans for plan-shape auditing. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q02_filter_pushdown", "q04_broadcast_snowflake", "q09_global_topk",
      "q03_join_agg", "x30_cosine_topk", "q01_pricing_summary",
      // round-3 shapes worth re-auditing by default: banded near-dup joins
      // (no nested loops), fenced verify stages, decorrelated subqueries.
      // (NOT x90/x14: connected components runs eager label-propagation
      // jobs at DataFrame-construction time — auditing them executes the
      // heaviest pipeline in the repo, not just plans it.)
      "x13_ngram_jaccard", "x32_embedding_neardup", "q39_exists_correlated",
      // round-5 shapes: broadcast probe/eval sides, per-shard windows
      "x36_multiprobe_lsh", "x50_pack_sequences", "x51_decontaminate",
      // round-6 shapes: chunk-dedup shuffle, broadcast scale/LM models,
      // quantized-scan top-k pruning (WindowGroupLimit before exchange)
      "x55_chunk_dedup", "x56_unigram_surprisal", "x37_int8_topk", "x38_pq_topk",
      // round-7 shapes: banded interval overlap (no inequality join),
      // cross-set admission banding, prefix-filter postings join,
      // broadcast-stats gates, multi-vector MaxSim reduction order
      // (NOT x63/x64: graph queries run eager localCheckpoint jobs at
      // construction — auditing them executes the full trade join.)
      "x62_interval_overlap", "x17_incremental_neardup", "x18_setjoin_prefix",
      "x85_temperature_mixture", "x86_maxsim_topk", "q48_mad_outliers",
      // late-round-7 shapes: rank-offset SN equi-join (no per-block cross
      // product), single-pass COO featurizer (window nnz, one Generate)
      // (NOT x20/x65/x66/x67: eager localCheckpoint at construction, like x63.)
      "x29_sorted_neighborhood", "x21_feature_hashing", "q51_ivm_agg",
      // round-8 shapes: two-round PRF over SHARED postings subplans (the
      // static plan prints the duplicates — runtime reuse is AQE's stage
      // cache, measured by ReuseAudit), delta-rule IVM join terms, and the
      // distinct-gram novelty join (TF-IDF-family two-shuffle shape).
      "x84_prf_expansion", "q52_ivm_join", "x97_ngram_novelty",
      // late-round-8 shapes: basket self-join pair mining (broadcast
      // scalar + 25-row count sides), keyed lag window + tiny normalizer,
      // exact-moment baselines broadcast back onto the stream, stateless
      // hash featurizers with 64-row broadcast models, fixed-point DCG
      // over the shared postings frame, min-max window fusion arms
      // (NOT x69/x77: eager localCheckpoint fixpoints, like x63 —
      // per-round plans audited by GraphPlanAudit instead.)
      "q56_association_rules", "q57_markov_transitions", "q59_seasonal_anomaly",
      "q60_cusum_changepoint", "x98_dsir_weights", "x99_quality_classifier",
      "x87_ndcg_eval", "x78_hybrid_weighted",
      // final round-8 shapes: one shared user-keyed sort for the double
      // lag (q66), per-(label,half) posexplode aggregation with 5-row
      // centroid join (x73), constant-frame digit/anon audits
      "q66_event_trigrams", "x73_embedding_drift", "q64_benford",
      // round-9 shapes: composed IVF-PQ (broadcast centroids+codebook+
      // query tables, pruned candidate ADC aggregation), exact-moment
      // stats tests (rank windows, distinct-value-spine cumulative
      // windows, tiny aggregate frames for the pairwise Mann-Kendall)
      // (NOT x110: localCheckpoint at construction, like x63.)
      "x109_ivfpq_topk", "q75_welch_ttest", "q76_mann_kendall",
      "q77_spearman", "q78_hampel", "q79_mann_whitney", "q80_ks_test",
      // round-9 shapes: fenced+reuse-point CDC chunking (one Generate, one
      // doc_id exchange serving both consumers), multiprobe pool with
      // broadcast probes anti-joined against the banded near-dup set,
      // vocab-bounded BPE/Zipf aggregates, zone-map metadata frames
      // (NOT x118: rides the eager components fixpoint, like x14.)
      "x122_cdc_chunks", "x119_hard_negatives", "x120_bpe_pairs",
      "x121_zipf_fit", "q92_zonemap_skip", "x117_stream_topk_parity",
      // late-round-9 shapes: array-local rule panel / span builder (zero
      // exchange except sort), map-only JL projection with broadcast
      // anchor audit, two-round Rocchio (broadcast q/q2 sides), one-pass
      // ANALYZE + CBO audit aggregates, scene-cut keyframe filter
      // (NOT x127: eager components gate at construction, like x14.)
      "x123_gopher_gate", "x126_span_corruption", "x125_jl_projection",
      "x129_rocchio_dense", "q93_analyze_stats", "q94_join_card_est",
      "x128_keyframes",
      // round-10 shapes: WindowGroupLimit-before-exchange lateral top-k,
      // single-stack DQ profile (ONE scan + ONE anti-join — the union
      // form re-ran the aggregate five times), decimal A/B predicate over
      // two tiny aggregate frames, span-keyed boilerplate join, map-only
      // PII scrubber, histogram×ranges stats-only estimation, banded
      // frame/window alignment join (no inequality nested loop), one
      // user-keyed sort shared by turn window + conversation fold
      // (NOT q100/q101/x161/x162: eager localCheckpoint at construction,
      // like x63 — q100's delta terms are audited via the q52 IVM shape.)
      "q102_lateral_topk", "q103_dq_suite", "q104_ab_significance",
      "x158_boilerplate_dedup", "x159_pii_redact",
      "x163_histogram_selectivity", "x164_av_align", "x165_chat_assembly",
      // final-session shapes: broadcast-model calibration rollup, one-row
      // stats costing frames, cogroup (one exchange per side), FS field
      // rollup over the SN candidate join, vocab-bounded isqrt allocation,
      // doc-keyed TextTiling joins, map-only ICT slices, NAAJ semantics,
      // banded forecast lags, kNN vote tail, arm-eval tails over the
      // audited retrieval plans
      // (NOT q105/x161/x162/x177/q100/q101: eager localCheckpoint at
      // construction; NOT x167/x168/x172: real streaming runs / temp-file
      // writes at construction.)
      "x166_calibration_ece", "q106_quantile_sketch_bound",
      "q107_join_order_cost", "q108_decimal_parity", "q109_dataset_card",
      "q110_forecast_backtest", "q111_null_aware_antijoin",
      "x169_knn_eval", "x170_fusion_eval", "x171_cogroup_reconcile",
      "x173_linkage_weights", "x174_negative_sampling",
      "x175_topic_segments", "x176_ict_pairs",
      // round-11 shapes: two-phase histogram rank drill (broadcast picks
      // probed into the bucket scan), grid-pruned skyline (every nested
      // loop a tiny-frame broadcast — staircase survivors / 1-row audits),
      // pooled-rank normalization join, 16-coalition Shapley lattice,
      // census-side order statistics, census set-op arithmetic
      // (NOT x262/x263/x273/x289: eager localCheckpoint at construction,
      // like x63; NOT x259/x268/x281: eager trained-weight loops.)
      "x260_histogram_select", "x261_skyline_grid",
      "x266_quantile_normalize", "x276_shapley_attribution",
      "x280_median_ci", "x284_avi_audit", "x285_ks_test",
      "x287_bag_setops", "x288_null_semantics",
      // round-13 shapes: census-pivot rank tests (tiny windows over
      // value censuses), unrounded argmin/argmax candidates over prefix
      // sums, one-pair-scan two-window filtered ANN, dynamic-gap session
      // aggregation, postings lag window, broadcast boundary audit
      // (NOT x314: eager localCheckpoint at construction, like x63;
      // NOT x317: typed mapGroups plan is trivial; NOT x319/x323: real
      // streaming runs at construction.)
      "x310_kruskal_wallis", "x313_jonckheere", "x315_changepoint_binseg",
      "x316_filtered_ann", "x318_dynamic_gap_sessions", "x325_energy_distance",
      "x326_gini_stump", "x327_pass_at_k", "x328_postings_compression",
      "x329_range_boundaries")
    names.foreach { n =>
      println(s"\n===== $n =====")
      Registry.byName(n).fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
