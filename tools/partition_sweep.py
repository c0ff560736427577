"""Parallelism-independence sweep: run a family of declared queries at
sf0.1 under spark.sql.shuffle.partitions in {8, 32, 128} and assert the
RESULTS are bit-identical across settings.

Every scale claim in this repo ultimately rests on the plans being
correct under ANY parallelism — a 1000-executor cluster picks partition
counts this laptop never sees. Two disciplines make that true and this
sweep tests both empirically:

- determinism: md5-family hashes, exact-integer/decimal aggregation,
  quantized doubles, unique-key window orders. If any operator leaked
  float-accumulation order or partition-dependent randomness, its
  canonical row-hash would differ between 8 and 128 shuffle partitions.
- plan shape: per-setting wall time should move smoothly (more
  partitions = more scheduling overhead at this data size, more
  parallelism at cluster size), never change the answer.

The family deliberately spans the operator zoo: relational agg, shuffle
+ broadcast joins, partitioned window, exact + LSH dedup, sketches,
distributed CDF stats, ANN recall gate, sharded packing, keyset
pagination, and the full-table checksum (the most canonicalization-
sensitive query in the registry).

Usage: python tools/partition_sweep.py [sf_dir]
Prints one JSON line per setting + a final summary line.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_compare import _canon  # canonical row normalization

QUERIES = [
    "q20_pricing_summary",
    "q21_broadcast_join",
    "q22_multiway_join",
    "q163_window_position",
    "q40_exact_dedup",
    "q42_minhash_lsh",
    "q151_bloom_filter",
    "q175_ks_test",
    "q48_knn_brute",
    "q84_sequence_packing",
    "q197_keyset_pagination",
    "q143_table_checksum",
    # round 5b: grouped CDF rank stats, degree-capped pair scoring,
    # per-fold grouped AUC, simulated-watermark replay
    "q225_percent_rank_dist",
    "q222_adamic_adar",
    "q228_kfold_auc",
    "q229_watermark_late_audit",
    # round 6: basket-bounded pair rules, bitmap set algebra,
    # cell-blocked spatial join, integer KN smoothing, Theil-Sen
    # median-of-slopes, histogram-trick stump search, banded LSH
    # tuning (order-deterministic band signatures), md5-seeded DP
    # release (the most portability-sensitive new surfaces)
    "q243_market_basket",
    "q244_bitmap_audience",
    "q246_grid_spatial_join",
    "q247_kneser_ney",
    "q249_theil_sen",
    "q253_decision_stumps",
    "q263_dp_quantile",
    "q264_lsh_tuning",
    # round 7: the iterative fixpoint closure, HRW argmax packing,
    # weighted distributed CDF, salted two-phase top-k merge, the
    # unrolled V-optimal DP (metadata argmin packing), the conformal
    # order statistic, and the probe-broadcast MaxSim rerank — the
    # surfaces whose determinism disciplines are newest
    "q277_recursive_closure",
    "q280_hrw_shards",
    "q290_weighted_median",
    "q301_two_phase_topk",
    "q294_vopt_histogram",
    "q302_conformal_interval",
    "q299_maxsim_retrieval",
    # round 7b: TPC-H join shapes (AQE-sensitive plans), exact 2x/4x
    # integer medians under cohort windows, the two-phase vocab
    # coverage merge, bit-level bloom reconstruction, and the
    # dedup-survivorship chi-square (IEEE-only double arithmetic)
    "q316_shipping_priority",
    "q319_volume_customers",
    "q329_seasonal_mad_anomalies",
    "q334_ngram_coverage",
    "q325_bloom_fpp_audit",
    "q332_dedup_retention_bias",
    # round 8: the nonparametric stat family (exact-median deviations,
    # integer rank correlations, the lag-sign runs test), zone-map
    # skipping audit, cluster design effect, the HLL error curve,
    # Gopher gate census, SimHash banded Hamming census, the
    # fixed-panel hubness audit, and the TPC-H semi/anti shapes
    # (LeftSemi/LeftAnti decorrelation under AQE re-planning)
    "q335_brown_forsythe",
    "q336_spearman",
    "q337_kendall_tau",
    "q338_runs_test",
    "q339_zonemap_skipping",
    "q340_design_effect",
    "q341_hll_error_curve",
    "q342_gopher_gates",
    "q343_simhash_hamming_census",
    "q311_hubness_audit",
    "q344_priority_waiting_semi",
    "q345_supplier_cnt_anti",
    "q346_waiting_supplier",
    # round 8: the experimentation/calibration family (build-time
    # literal spines, integer DP folds, bounded greedy replays) plus
    # the retrieval-fusion and linear-algebra surfaces — the newest
    # determinism disciplines (z-scale BH ranks, UCB/MMR argmax
    # tie-breaks, Viterbi struct folds, power-iteration sign-split
    # renormalization, midrank doubling at k groups)
    "q347_bh_fdr",
    "q352_rrf_fusion",
    "q353_facility_location",
    "q355_mmr_rerank",
    "q356_dirichlet_ql",
    "q358_ratio_delta_method",
    "q360_distinct_n_diversity",
    "q362_viterbi_decode",
    "q365_kruskal_wallis",
    "q368_join_skew_audit",
    "q370_pca_power_iteration",
    # round 9a: the round-8 tail the earlier sweeps didn't reach —
    # quantized-entropy identities, lag self-joins, driver-pinned
    # bounded DPs, fixed-grid CDF windows, level-exploded block sums,
    # the degree-ordered wedge join (AQE re-plans it at different
    # partition counts), and the fan-out census/q-q/lag/retention four
    "q371_conditional_entropy",
    "q372_granger_lagged",
    "q373_dtw_alignment",
    "q374_distribution_drift",
    "q375_wasserstein1",
    "q376_haar_energy",
    "q377_trending_terms",
    "q378_triangle_count",
    "q379_qq_table",
    "q380_conversion_lag",
    "q381_retention_matrix",
    # round 9b: this round's new surfaces — decorrelated threshold/
    # argmin joins (broadcast-aggregate plans AQE may flip), the
    # prefix-sum JT statistic, the mask-grid Shapley join, blocked
    # mutual-argmax, the pair-literal KL fan-out, and the moment-
    # broadcast influence scan
    "q382_small_order_revenue",
    "q383_dominant_supplier",
    "q384_min_cost_supplier",
    "q385_cochran_q",
    "q386_jonckheere_trend",
    "q387_theil_u",
    "q388_cramers_v",
    "q389_shapley_attribution",
    "q390_reciprocal_best_match",
    "q391_source_divergence_matrix",
    "q392_ols_influence",
    "q393_partial_correlation",
    "q394_mann_kendall",
    "q395_capture_recapture",
    "q396_gumbel_extremes",
    # round 9c: TPC-H shape completion (single-scan pushdown, fact-fact
    # exchange, scalar-subquery broadcast) + the survival/causal/
    # basket/graph/layout batch — ordered ln-sum windows (q407),
    # floor-quantized block gaps (q410), bounded pair fan-outs
    # (q411/q412/q414), the integer-rank PageRank fixpoint (q413,
    # summation-order-free BY CONSTRUCTION — this sweep is the proof),
    # and the arithmetic Morton interleave (q415)
    "q397_forecast_revenue",
    "q398_volume_shipping",
    "q399_product_profit",
    "q401_customer_distribution",
    "q403_top_supplier",
    "q404_important_stock",
    "q406_sales_opportunity",
    "q407_kaplan_meier",
    "q408_nelson_aalen",
    "q409_did_estimator",
    "q410_cem_att",
    "q411_market_basket",
    "q412_butterfly_count",
    "q413_pagerank_cosupply",
    "q414_item_item_cf",
    "q415_zorder_layout",
    "q416_rfm_segments",
    # round 9d: arm-partitioned at-risk windows, integer Qini/Gini/HHI
    # curves, the doc-keyed skip-gram join, per-mille ECDF windows,
    # dyadic EWMA sums (exact-by-construction — the sweep proves it),
    # and the CUSUM running-extremum identity
    "q417_logrank_test",
    "q418_qini_curve",
    "q419_gini_revenue",
    "q420_hhi_market",
    "q421_benford_audit",
    "q422_skipgram_pairs",
    "q423_cvm_binned",
    "q424_ewma_chart",
    "q425_mahalanobis_outliers",
    "q426_cusum_drift",
    # round 9e: phase-literal spectral sums, quartile-broadcast fences,
    # the hour-domain lag join, the all-integer decomposition, the
    # anchor-panel mining join, and the hashed-shingle containment gate
    "q427_periodogram",
    "q428_tukey_outliers",
    "q429_ljung_box",
    "q430_classical_decomposition",
    "q431_triplet_margin",
    "q432_containment_pairs",
    # round 9f: md5 feature buckets, broadcast-stats encoding, cohort
    # pivots, the triangle-support explode (AQE-sensitive wedge join),
    # and the full recsys-eval DAG (temporal split + user-partitioned
    # top-5 + integer NDCG)
    "q433_feature_hashing_audit",
    "q434_loo_target_encoding",
    "q435_nrr_cohorts",
    "q436_edge_support",
    "q437_cf_holdout_eval",
    # round 9g: user-partitioned credit windows, the gap-trick phrase
    # segmentation, unrolled remove-max rounds, and the argmax
    # continuation join
    "q438_ushape_attribution",
    "q439_rake_keyphrases",
    "q440_generalized_esd",
    "q441_bigram_next_token",
    # round 9h: frequency-of-frequency census, broadcast-prior
    # shrinkage, decimal-moment OLS, and the three-detector ensemble
    "q442_chao1_richness",
    "q443_eb_shrinkage",
    "q444_price_elasticity",
    "q445_anomaly_consensus",
    # round 9i: stratum moments, the first-occurrence prefix trick,
    # zero-kept spine grids, day-domain lag joins, distinct-count ppm
    "q446_neyman_allocation",
    "q447_heaps_law",
    "q448_burstiness",
    "q449_seasonal_naive_mase",
    "q450_dau_stickiness",
    # round 9j: map-side regex counts, contingency pair counting, the
    # confusion-matrix rollup
    "q451_tokenizer_fertility",
    "q452_adjusted_rand",
    "q453_multiclass_prf",
    # round 9j-9p (this session): exact-decimal moment aggregates, the
    # 2U1 rank identity on the bucketed prefix, histogram cross-product
    # weighted medians, min_by/max_by composite keys, per-task ppm
    # quantization, symmetrized coincidence matrices, nano-quantized
    # per-row calibration terms, day-spine integer prefixes (PACF /
    # R/S / Page-Hinkley / spectral probes), degree-ordered per-node
    # triangles, rec-list metrics on bit-identical cosines, the
    # pair-free anisotropy identity, the distributed Gram build, FD /
    # key profiling panels, nano-quantized inequality terms, and the
    # interpolated normal-CDF literal table
    "q454_effect_sizes",
    "q455_cliffs_delta",
    "q456_hodges_lehmann",
    "q457_bowker_symmetry",
    "q458_pass_at_k",
    "q459_krippendorff_alpha",
    "q460_spiegelhalter_z",
    "q461_fairness_audit",
    "q462_pacf_closed",
    "q463_hurst_rs",
    "q464_page_hinkley",
    "q465_spectral_entropy",
    "q466_local_clustering",
    "q467_link_prediction",
    "q468_rec_coverage",
    "q469_intra_list_diversity",
    "q470_anisotropy",
    "q471_good_turing",
    "q472_calinski_harabasz",
    "q473_participation_ratio",
    "q474_fd_discovery",
    "q475_candidate_keys",
    "q476_atkinson_index",
    "q477_theil_decomposition",
    "q478_welch_anova",
    "q479_tost_equivalence",
    "q480_posthoc_power",
    "q481_fieller_ratio_ci",
    # round 9 final batches: integer span accounting, DECIMAL-
    # normalized mixture weights, the order-statistic identity under
    # per-user windows, prophecy projection, panel rank windows,
    # contingency pair collapse, KM-derived parametrics, equal-mass
    # binning on the value domain, and the per-user transition chain
    "q482_span_corruption_stats",
    "q483_mixture_temperature",
    "q484_best_of_n",
    "q485_spearman_brown",
    "q486_kendall_w",
    "q487_page_trend",
    "q488_goodman_kruskal_gamma",
    "q489_cochran_armitage",
    "q490_weibull_fit",
    "q491_adaptive_ece",
    "q492_rmst",
    "q493_markov_entropy_rate",
    # round 9 curve batch: checkpoint-once conditional-grid curves,
    # broadcast probe semi-joins, value-domain equal-mass binning
    "q494_dedup_threshold_curve",
    "q495_quality_tradeoff_curve",
    "q496_overlap_curve",
    "q497_length_bias_audit",
    # round 9 causal/index batch: cluster-level day means, two-sided
    # exact-moment OLS, segmented day-spine fits, DECIMAL basket sums
    "q498_switchback_analysis",
    "q499_regression_discontinuity",
    "q500_interrupted_time_series",
    "q501_price_index",
    # round 9 advisor batch: checkpoint-shared gap/CDF tables,
    # deterministic top-k heads, schema-arithmetic probes
    "q502_session_gap_curve",
    "q503_topk_stability",
    "q504_winsor_sensitivity",
    "q505_shuffle_advisor",
    # round 9 streaming batch: dyadic decayed-count state (the merge
    # itself is the order-independence proof; the sweep re-checks it)
    "q506_stream_decayed_counts",
    # round 9 inference batch: grid-shared index builds, per-user
    # split windows, bounded step-down scans, CDF-derived medians
    "q507_bm25_parameter_curve",
    "q508_paired_ttest",
    "q509_holm_bonferroni",
    "q510_moods_median",
    # round 10: day-domain lag moments, the 72-vnode broadcast ring,
    # and the dual TakeOrdered-50 rank join
    "q511_ar2_forecast",
    "q512_consistent_hash_rebalance",
    "q513_rank_biased_overlap",
    "q514_dedup_storage_savings",
    # round 11: pair-keyed corpus shuffle + broadcast MM iterations,
    # TTR preference pairing, exact-CDF curriculum cuts, md5-seeded
    # cartography regions
    "q515_bradley_terry_ranking",
    "q516_preference_pair_audit",
    "q517_curriculum_phases",
    "q518_dataset_cartography",
    # round 11b: bounded-integer drift SMD (shift-before-floor-div
    # discipline) and the mapInPandas int64 Gram accumulation — both
    # must be exact under any batch/partition split
    "q519_embedding_drift_audit",
    "q520_embedding_gram_audit",
    # round 11c: HLL register algebra — register max/harmonic sums are
    # order-independent integers; the sketch must be bit-identical
    # under any shuffle of the shingle stream
    "q521_hll_set_algebra",
]

SETTINGS = [8, 32, 128]


def result_hash(df) -> tuple[str, int]:
    rows = [r.asDict(recursive=True) for r in df.collect()]
    canon = _canon(rows)
    h = hashlib.md5(repr(canon).encode()).hexdigest()
    return h, len(rows)


def main() -> int:
    # --from qNNN / --from=qNNN: sweep only list entries >= that name
    # (supplemental passes for a new tail without re-running the whole
    # family). Unknown --flags fail fast rather than being silently
    # dropped into the sf_dir positional.
    start = None
    positional = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--from="):
            start = a.split("=", 1)[1]
        elif a == "--from":
            if i + 1 >= len(argv):
                print("--from requires a query name", file=sys.stderr)
                return 2
            i += 1
            start = argv[i]
        elif a.startswith("--"):
            print(f"unrecognized flag: {a}", file=sys.stderr)
            return 2
        else:
            positional.append(a)
        i += 1
    sf_dir = positional[0] if positional else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from tytodb_spark.session import checkpoint_scope, get_spark
    from tytodb_spark import queries as Q

    spark = get_spark()
    available = [q for q in QUERIES if q in Q.REGISTRY]
    if start:
        available = [q for q in available if q >= start]
    # warm the Python worker pool + parquet footer cache so the first
    # setting isn't charged for process spin-up
    spark.conf.set("spark.sql.shuffle.partitions", str(SETTINGS[0]))
    Q.REGISTRY[available[0]].fn(spark, sf_dir).collect()

    results: dict[str, dict[int, tuple[str, int, float]]] = {q: {} for q in available}
    for parts in SETTINGS:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        times = {}
        for q in available:
            t0 = time.time()
            # janitor: chained localCheckpoints are never reclaimed by
            # the ContextCleaner (session.py) — release per query or a
            # 3-setting full sweep triples the accumulation
            with checkpoint_scope(spark):
                h, n = result_hash(Q.REGISTRY[q].fn(spark, sf_dir))
            dt = time.time() - t0
            results[q][parts] = (h, n, dt)
            times[q] = round(dt, 2)
        print(json.dumps({"shuffle_partitions": parts, "sec": times}), flush=True)

    bad = []
    for q, per in results.items():
        hashes = {h for h, _, _ in per.values()}
        if len(hashes) != 1:
            bad.append(q)
    summary = {
        "invariant": not bad,
        "violations": bad,
        "queries": {
            q: {
                "rows": per[SETTINGS[0]][1],
                "sec": {p: round(per[p][2], 2) for p in SETTINGS},
            }
            for q, per in results.items()
        },
    }
    print(json.dumps(summary), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
