"""Generate PLANS.md: formatted physical plans for headline queries with
shuffle/broadcast/codegen/pushdown summaries — the ".explain and
iterate" evidence trail.

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from tfl_realtime_lakehouse_spark.queries import REGISTRY  # noqa: E402
from tfl_realtime_lakehouse_spark.session import get_spark  # noqa: E402

HEADLINERS = [
    "fct_headways",
    "q1_pricing_summary",
    "q5_region_revenue",
    "range_join_events_per_order_week",
    "asof_last_error_before_click",
    "ngram_jaccard_pairs",
    "events_sessionization",
    "embedding_cosine_topk",
    # round-2 additions: the de-broadcast fixes and the distributed tiers
    "embedding_ann_lsh",
    "embedding_neardup_blocked",
    "minhash_lsh_candidates",
    "multimodal_decode_dims",
    # round-2 wave 2: cluster resolution + training-pipeline ops
    "dedup_cluster_resolution",
    "contamination_check",
    "sequence_packing",
    "text_repetition_filter",
    "embedding_quantize",
    "embedding_ann_pq",
    "q15_top_supplier",
    "bm25_search",
    # round-2 session-4: runtime filters, temporal directions, analytics
    "join_bloom_pruned_semi",
    "asof_nearest_error",
    "events_multires_rollup",
    "events_funnel_steps",
    "events_cohort_retention",
    "common_span_pairs",
    "sessions_active_per_hour",
    "events_winsorized_stats",
    # round-2 session-6: time-series analytics + zero-shuffle rewrites
    "events_gapfill_locf",
    "events_counter_rate",
    "events_ewma_hourly",
    "events_rate_anomaly",
    "events_reservoir_sample",
    "multimodal_audio_meta",
    # round-3: graph, spatial, CDC, sketch + projection additions
    "graph_triangle_count",
    "spatial_grid_eps_join",
    "cdc_apply_changes",
    # round-3 session-2: bounded-wedge graph similarity, iterative
    # selection, interval/sequence analytics, variant shredding
    "graph_neighbor_jaccard",
    "embedding_mmr_select",
    "embedding_kcenter_coreset",
    "events_interval_merge",
    "events_sequence_pattern",
    "text_tfidf_topterms",
    "agg_kmv_sketch",
    "scalar_variant_props",
    "anomaly_top_contributors",
    # round-3 session-2 wave 5: verified LSH, survival, forecasting,
    # drift, k-core
    "embedding_ann_lsh_verified",
    "events_survival_curve",
    "events_holt_forecast",
    "docs_length_drift_ks",
    "graph_kcore_members",
    "graph_hits_hubs_authorities",
    "vl_training_export_manifest",
    "embedding_random_projection",
    "knn_label_vote",
    "skew_salted_agg",
    "agg_quantile_sketch",
    "events_rolling_7d_actives",
    "events_markov_transitions",
    "multimodal_audio_frames",
    # round-3 wave 2: graph/community, warehouse maintenance, pipelines
    "graph_label_propagation",
    "basket_part_affinity",
    "training_corpus_build",
    "incremental_rollup_maintenance",
    "events_hopping_rollup",
    "dq_integrity_audit",
    "events_mad_outliers",
    "dedup_normalized_docs",
    "events_equidepth_histogram",
    # round-4: the quantile scale fix (collect_list -> value-histogram
    # cumulative select; HashAggregate with map-side combine, no
    # ObjectHashAggregate buffer growth with group size) and the
    # verifiable-PCA projection (map-only fold, zero shuffle)
    "agg_quantile_per_group",
    "embedding_pca_project",
    "bpe_train_tokenize",
    # round-4 wave 2: layout, record linkage, sparse similarity,
    # monitoring, incremental-view algebra
    "layout_zorder_distribution",
    "fuzzy_dedup_part_names",
    "entity_resolution_parts",
    "text_tfidf_cosine_pairs",
    "events_psi_drift",
    "incremental_join_maintenance",
    "events_last_touch_attribution",
    "kmv_audience_overlap",
    # round-5: codec pipelines (map-only Arrow), capped-leg fusion,
    # incremental-dedup tiers, sketch rollup, container round-trip
    "multimodal_jpeg_pixel_stats",
    "multimodal_gif_pixel_stats",
    "retrieval_rrf_fusion",
    "dedup_incremental_new_batch",
    "dedup_incremental_minhash_probe",
    "events_kmv_trailing_distinct",
    "events_theilsen_trend",
    "text_duplicate_chunk_ratio",
    "docs_warc_roundtrip",
    "embedding_matryoshka_eval",
    "training_curriculum_order",
    "scalar_luhn_card_audit",
    # round-6 wave: curation/eval analytics
    "sample_uncertainty_margin",
    "eval_conformal_thresholds",
    "docs_source_quality_profile",
    "text_pii_cooccurrence",
    "eval_packing_efficiency",
    "layout_partition_skew_audit",
    # round-7 wave: bounded fuzzy mode + corpus audits
    "fuzzy_name_pair_counts",
    "docs_cross_source_overlap",
    "embedding_set_diversity",
    "graph_modularity_lpa",
    "embedding_centroid_drift",
    # round-8 wave: approximation-quality + infra queries
    "embedding_ann_recall_eval",
    "dedup_minhash_estimate_error",
    "eval_pairwise_bradley_terry",
    "table_column_stats_profile",
    "events_abtest_cuped",
    # round-8 second wave
    "events_poisson_bootstrap_ci",
    "dedup_lsh_threshold_sweep",
    "embedding_lsh_bucket_balance",
    "events_uplift_by_decile",
    "doc_winnowing_fingerprints",
    # round-9 wave 10
    "embedding_ann_ivf_recall_eval",
    "embedding_ann_pq_recall_eval",
    "embedding_ann_ndcg_eval",
    "events_srm_check",
    "events_did_estimator",
    "docs_tar_shard_manifest",
]


def summarize(plan: str) -> str:
    ex = len(re.findall(r"\bExchange hashpartitioning", plan))
    bc = len(re.findall(r"\bBroadcastExchange", plan))
    partial = "yes" if re.search(r"\bpartial_(sum|count|min|max|avg)", plan) else "n/a"
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed_n = sum(1 for p in pushed if p.strip())
    return (
        f"shuffle exchanges: {ex} · broadcast exchanges: {bc} · "
        f"map-side partial aggregation: {partial} · scans with pushed filters: {pushed_n}"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        f"Generated by `python tools/explain_plans.py {sf_dir}` "
        "(regenerate after plan-affecting changes).",
        "",
    ]
    for name in HEADLINERS:
        df = REGISTRY[name].fn(spark, sf_dir)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        executed = df._jdf.queryExecution().executedPlan().toString()
        out.append(f"## {name}")
        out.append("")
        out.append(REGISTRY[name].doc)
        out.append("")
        out.append(f"**{summarize(executed)}**")
        out.append("")
        out.append("```")
        # keep the operator tree, trim the verbose per-node field dumps
        tree = formatted.split("\n\n")[0]
        out.append(tree)
        out.append("```")
        out.append("")
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
