package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit: queries whose scale story depends on a join being
  * keyed (hash/sort-merge/broadcast-hash) must never plan a cartesian
  * product or a broadcast nested-loop join — at 100 TB those are the
  * difference between one shuffle and an unbounded pair blowup. The
  * warehouse queries additionally self-assert (zero-Exchange / DPP) inside
  * their own bodies; this spec covers the rest of the catalog's join-shaped
  * newcomers. q50/q18 are exempt BY DESIGN (documented exact verifier /
  * the cross-join operator itself). */
class PlanAuditSpec extends AnyFunSuite with SparkFixture {

  private val audited = Seq(
    "q197_rag_chunks", "q199_gram_span_dedup", "q203_prefix_jaccard_join",
    "q200_session_window_batch", "q201_map_hofs", "q202_ewma_micro",
    "q207_label_propagation", "q210_twap", "q211_bigram_lm",
    "q212_batch_merge", "q198_recursive_cte",
    // round 5: every join-shaped newcomer
    "q228_kcore", "q229_geo_nn_grid", "q231_semantic_dedup",
    "q241_mutual_info", "q242_js_divergence", "q244_seasonal_decompose",
    "q245_snapshot_diff", "q248_cuped", "q252_spine_gaps",
    "q254_pmi_collocations", "q255_incremental_sessions",
    "q258_retention_decay", "q259_ngram_novelty", "q261_oov_rate",
    // round 6: every join-shaped newcomer
    "q302_fifo_allocation", "q303_eb_shrinkage", "q304_logrank_test",
    "q305_bh_fdr", "q306_cem_matching", "q307_clustering_coeff",
    "q308_kwic_concordance", "q309_simpson_detector", "q310_apportionment",
    "q313_inclusion_deps", "q315_mi_feature_rank", "q316_expectations",
    "q319_huber_irls", "q320_skyline", "q321_cohens_kappa", "q322_exact_auc",
    "q323_mix_waterfill", "q325_control_chart", "q328_restatement_audit",
    "q330_rfm_segmentation", "q331_quarantine_parse", "q332_customer360",
    "q333_power_mde", "q334_rendezvous_shards", "q335_log2_histogram",
    // round 7: every join-shaped newcomer
    "q347_huber_approx_scale", "q348_fellegi_sunter_em", "q349_curation_lsh",
    "q350_url_canonicalize", "q351_k_anonymity", "q353_containment_decontam",
    "q354_heaps_law", "q355_doc_pagerank", "q356_curriculum_manifest",
    "q357_token_calibration", "q358_dominant_supplier",
    "q360_anisotropy_audit", "q361_neyman_allocation", "q362_market_share",
    "q363_retention_audit", "q364_scd2_merge", "q365_contrastive_negatives",
    "q366_tokenizer_fertility", "q368_lambda_parity",
    "q371_minhash_signatures", "q372_minhash_banded",
    "q376_cdc_apply", "q377_nfc_normalize",
    // round 8 (driver round 5): every join-shaped newcomer
    "q378_explode_outer", "q379_join_hints", "q380_hash_collision_audit",
    "q381_bucketed_batches", "q382_matryoshka_recall",
    "q383_int8_quant_audit", "q384_mojibake_audit", "q385_delta_neardup_lsh",
    "q386_davies_bouldin", "q387_ann_recall_eval", "q388_asof_native",
    "q389_temperature_mixing", "q390_vocab_coverage", "q391_split_leakage",
    "q393_embedding_drift", "q394_content_checksum",
    // round 9 (driver round 5, second wave): every join-shaped newcomer
    "q401_sinkhorn_mixture", "q402_grid_dbscan", "q403_bradley_terry",
    "q404_calibration_ece", "q405_lag_xcorr", "q406_percentile_selection",
    "q407_offpolicy_eval", "q408_conformal_coverage", "q409_boruvka_msf",
    "q410_shapley_attribution", "q411_systematic_sample",
    "q412_sequential_obf", "q413_cluster_coherence", "q414_blocking_quality",
    "q415_kfold_cv", "q416_mann_kendall", "q417_maxsim_retrieval",
    "q418_rank_biased_overlap", "q419_single_link_cut",
    "q420_retrieval_metrics", "q421_jackknife_ratio",
    "q422_quantile_treatment_effect", "q423_capture_recapture",
    "q424_good_turing", "q425_brier_decomposition", "q426_delong_auc_ci",
    // round-10 newcomers: q428 joins two 4096-row sketches + key censuses;
    // q429's rounds are window+groupBy only (no joins); q427 is scan+census
    "q427_luhn_pii", "q428_cms_join_size", "q429_prefix_doubling_spans",
    "q430_wordpiece_greedy", "q431_ipf_raking",
    "q432_negative_sampling", "q433_distinct_n", "q434_consistent_ring",
    // round-11 newcomers (q449 is a streaming replay — audited by its
    // oracle, not plan shape; q442 materializes eagerly under its flag)
    "q435_kneser_ney", "q436_ses_backtest", "q437_rouge_lcs",
    "q438_platt_scaling", "q440_poisson_regression", "q441_nb_dispersion",
    "q443_dtw_matrix", "q444_sax_words", "q445_periodogram",
    "q446_hits", "q447_rake_keyphrases", "q448_tdigest_quantiles",
    "q450_theil_sen", "q451_hodges_lehmann",
    "q452_join_ivm", "q453_bitemporal_asof", "q454_ccnet_buckets",
    "q455_two_level_dedup", "q456_t_closeness",
    "q460_kruskal_wallis", "q461_mcnemar", "q462_brown_forsythe",
    "q463_sft_transcripts", "q464_cache_reuse", "q465_sampled_join_estimate",
    "q467_hill_estimator",
    // round-6 newcomers: q468 census + key-derived noise projection; q469
    // keyed two-phase cumsums + 1-row global-mean broadcast; q470 keyed
    // two-phase ranks + 1-row min-class broadcast
    "q468_dp_release", "q469_target_encoding", "q470_balanced_downsample",
    // round-10 session: q471 customer-keyed windows only; q472's lattice
    // counts are within-order self-joins + broadcast prunes; q473 is
    // TakeOrdered + 1-row broadcasts; q474's convolutions are banded
    // priority-keyed self-joins (calendar-bounded, q436's class); q475
    // rides priority-keyed windows over the daily census; q476 is the
    // bounded block equi-join + block-keyed window; q477 is a census +
    // TakeOrderedAndProject + codegen sketch probe
    "q471_interval_union", "q472_apriori_rules", "q473_kmv_set_ops",
    "q474_brown_des", "q475_page_hinkley", "q476_damerau_closest_pairs",
    "q477_heavy_change",
    // q478: checkpointed daily census + four join-free pyramid hash-aggs
    "q478_haar_energy",
    // q479/q480: q155's message-passing shape (checkpointed edges/labels,
    // one co-partitioned join + hash-agg per round; WL's digest is the
    // 64-bucket two-level fold)
    "q479_personalized_pagerank", "q480_wl_fingerprint",
    // q481: checkpointed sparse edges + star-closure + bucket hash-aggs;
    // q482: q476's block equi-join + block-keyed argmin window + the
    // id-keyed mutuality self-join on the checkpointed best table
    "q481_graph_profile", "q482_mutual_nn",
    // q483: q45's capped pair machinery + two broadcast source joins +
    // one (source, source) hash-agg
    "q483_cross_source_matrix",
    // q484: one codegen projection over the scan — no join, no window
    "q484_magic_sniff")

  // These broadcast-crossjoin ONE-ROW aggregates (scalar totals / θ / the
  // vocab size) — the standard scalar-broadcast pattern, bounded by
  // construction; the BNLJ build side can never grow with the data.
  private val scalarBroadcastExempt = Set(
    "q211_bigram_lm", "q241_mutual_info", "q242_js_divergence",
    "q248_cuped", "q254_pmi_collocations",
    "q303_eb_shrinkage", "q304_logrank_test", "q305_bh_fdr",
    "q306_cem_matching", "q308_kwic_concordance", "q309_simpson_detector",
    "q310_apportionment", "q319_huber_irls", "q321_cohens_kappa",
    "q323_mix_waterfill", "q325_control_chart", "q330_rfm_segmentation",
    "q334_rendezvous_shards", "q347_huber_approx_scale",
    "q348_fellegi_sunter_em", "q361_neyman_allocation",
    "q365_contrastive_negatives",
    // q382/q387: bounded probe sets (<10 rows) broadcast-crossjoined
    // against the corpus — q48's documented exact-audit shape; q386/q389/
    // q390: 1-row or label-sized aggregate broadcasts
    "q382_matryoshka_recall", "q386_davies_bouldin", "q387_ann_recall_eval",
    "q389_temperature_mixing", "q390_vocab_coverage",
    // round-9 scalar/census broadcasts: 1-row totals (q404/q411/q413/q414),
    // ≤20-row π vectors + 1-row normalizers (q403), the 7-row lag × spine
    // and 6-row rank × bin-census non-equi probes (q405/q406), the 4×16
    // literal subset lattice (q410), the 5-look census (q412)
    "q403_bradley_terry", "q404_calibration_ece", "q405_lag_xcorr",
    "q406_percentile_selection", "q410_shapley_attribution",
    "q411_systematic_sample", "q412_sequential_obf",
    "q413_cluster_coherence", "q414_blocking_quality",
    // q415: 1-row/5-row census broadcasts; q416: day-census pair sweep +
    // scalar broadcasts; q417: 24-row probe-token broadcast (q48's shape)
    "q415_kfold_cv", "q416_mann_kendall", "q417_maxsim_retrieval",
    // q418/q420: 3/10-probe broadcast probes + depth-grid censuses
    "q418_rank_biased_overlap", "q420_retrieval_metrics",
    // q421: 16-bucket census broadcasts; q422: two 1-row arm summaries
    "q421_jackknife_ratio", "q422_quantile_treatment_effect",
    // q423-q426: 1-row catch/census-count broadcasts only
    "q423_capture_recapture", "q424_good_turing",
    "q425_brier_decomposition", "q426_delong_auc_ci",
    // q428: 1-row exact/estimate/total aggregates crossjoined into the
    // single report row — the sketches themselves join hash-keyed
    "q428_cms_join_size",
    // q430: 1-row token-total broadcast gates the vocab threshold;
    // q431: 1-row corpus-total / target-total broadcasts
    "q430_wordpiece_greedy", "q431_ipf_raking",
    // q432: 1-row mass-total broadcast (the coin->word lookup itself is
    // an equi join on the bucket id); q434: the 40/48-row vnode ring is
    // the documented bounded broadcast probe (q48's shape)
    "q432_negative_sampling", "q434_consistent_ring",
    // round-11: q435 1-row bigram-total; q438/q440 1-row Newton parameter
    // frames; q443 5x5 series-census pair sweep; q445 1-row moments + 4-row
    // period grid; q446 1-row L1 normalizers
    "q435_kneser_ney", "q438_platt_scaling", "q440_poisson_regression",
    "q443_dtw_matrix", "q445_periodogram", "q446_hits",
    // q450: 1-row fit broadcast + the 90-row census pair sweep; q451: the
    // day-census pair sweep (equi on type, non-equi residual); q456: the
    // 10-row global-decile census crossjoin
    "q450_theil_sen", "q451_hodges_lehmann", "q456_t_closeness",
    // q454: q132's 1-row token-total broadcast
    "q454_ccnet_buckets",
    // q460/q462: 1-row grand-total / k-count broadcasts; q467: the 3-row
    // k-grid joined to the top-201 census (bounded non-equi probe)
    "q460_kruskal_wallis", "q462_brown_forsythe", "q467_hill_estimator",
    // q469/q470: 1-row global-mean / min-class-size broadcasts
    "q469_target_encoding", "q470_balanced_downsample",
    // q472: the 1-row basket-total n gates every support floor; q473: the
    // 1-row θ and count summaries of the 256-row sketch; q480: the 1-row
    // 64-bucket digest broadcast into the per-round report row
    "q472_apriori_rules", "q473_kmv_set_ops", "q480_wl_fingerprint",
    // q481: 1-row vertex/edge/component summaries broadcast into the
    // four-row summary section
    "q481_graph_profile")

  // Queries whose partition-less windows ride a NON-aggregated input that is
  // nonetheless BOUNDED by construction — each justified here, the
  // scalarBroadcastExempt pattern applied to windows:
  //  - q403: the rank window rides the ≤20-row source census, but the census
  //    is localCheckpoint'ed (iterative Bradley–Terry fit), which TRUNCATES
  //    the plan — the upstream aggregate is invisible to this walker, not
  //    absent (Eda.scala, the `w` frame).
  private val boundedWindowExempt: Set[String] = Set("q403_bradley_terry")

  // CATALOG-WIDE two-phase-window audit (round-5 verdict prescription #1,
  // generalizing the original q297/q328 assertion): ANY partition-less
  // WindowExec in an audited query's plan must sit over an AGGREGATED
  // (census/bins-sized) input, never over a raw corpus-sized scan — the
  // single-task-funnel shape that q97's machinery (now TwoPhase.scala)
  // exists to kill. The two-phase rewrites keep exactly one partition-less
  // window each: the bins-sized offsets prefix, which sits over a hash-agg
  // and therefore passes the over-aggregate rule by construction.
  test("audited queries plan no partition-less window over a non-aggregated input") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val names = (audited ++ Seq(
      "q297_disorder_audit", "q328_restatement_audit",
      // the ten round-5 `weak` sites, now riding TwoPhase
      "q175_decile_lift", "q192_null_ordering", "q271_lorenz_deciles",
      "q278_rrf_fusion", "q284_mann_whitney", "q289_layout_locality",
      "q306_cem_matching", "q330_rfm_segmentation",
      "q356_curriculum_manifest", "q365_contrastive_negatives"
    )).distinct.filterNot(boundedWindowExempt)
    import org.apache.spark.sql.execution.{TakeOrderedAndProjectExec, GlobalLimitExec, CollectLimitExec}
    // a partition-less window is scale-safe when its input is either
    // AGGREGATED (census/bins-sized) or LIMIT-BOUNDED (top-k selection via
    // TakeOrderedAndProject per-partition heaps — q467's shape)
    def bounded(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collect {
        case a: BaseAggregateExec => a: Any
        case t: TakeOrderedAndProjectExec => t
        case g: GlobalLimitExec => g
        case c: CollectLimitExec => c
      }.nonEmpty
    val violations = for {
      name <- names
      plan = SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan
      w <- plan.collect { case w: WindowExec => w }
      if w.partitionSpec.isEmpty
      if !bounded(w.child)
    } yield name
    assert(violations.isEmpty,
      s"partition-less Window over a non-aggregated (corpus-sized) input — " +
        s"the single-task funnel q97 exists to kill — in: " +
        violations.distinct.mkString(", "))
  }

  test("audited queries plan no cartesian product and no broadcast nested loop") {
    for (name <- audited) {
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.sparkPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!scalarBroadcastExempt(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin")
    }
  }
}
