"""Scale smoke: multiply the sf0.1 fixtures ~Nx (key-offset copies,
FK-consistent) into /tmp and run headline queries against the result.

This is NOT the correctness gate (oracles run at sf0.01); it is the
evidence pass for SCALE.md — the same plans must hold, not OOM, and
scale roughly linearly when the fact tables grow 10x. Dimension keys
are offset per copy so join fan-outs stay realistic (each copy is a
disjoint key universe except region/nation, which stay shared dims);
document texts get a per-copy suffix token, so the corpus gains
NEAR-duplicates across copies — a deliberate stress for the dedup
family's candidate generation.

Usage:
    python3 tools/scale_smoke.py [--mult 10] [--out /tmp/sf_scale] \
        [--src /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

QUERIES_TO_RUN = [
    "tpch_q1_pricing_summary",
    "tpch_q3_order_revenue",
    "tpch_q5_regional_revenue",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "events_moment_stats",
    "events_sliding_window",
    "events_funnel_conversion",
    "events_cohort_retention",
    "join_asof_purchase_last_click",
    "scd2_customer_value_history",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_quality_score",
    "text_repetition_metrics",
    "contamination_ngram_overlap",
    "corpus_sequence_pack",
    "weather_enrich",
    "geo_grid_cell_stats",
    "join_geo_nearest_station",
    "geo_radius_filter",
    "events_transition_matrix",
    "events_anomaly_zscore",
    "events_rolling_corr",
    "dedup_edit_distance",
    "embed_kmeans_assign",
    "embed_kmeans_update",
    "corpus_split_assign",
    "corpus_source_divergence",
    "text_bigram_pmi",
    "dedup_chunk_level",
    "basket_brand_lift",
    "graph_pagerank_brands",
    "embed_pq_encode",
    "embed_power_iteration_pc1",
    "corpus_weighted_sample",
    "events_type_dow_chisq",
    "events_funnel_latency",
    "events_time_rollup",
    "events_value_ewma",
    "events_anomaly_mad",
    "events_trailing_distinct_users",
    "graph_triangle_brands",
    "sql_recursive_brand_reach",
    "events_variant_extract",
    "sql_window_functions",
    "sql_array_functions",
    "corpus_perplexity_unigram",
    "dedup_rate_by_source",
    "join_asof_purchase_next_click",
    "orders_yoy_priority_growth",
    "multimodal_phash_neardup",
    "events_cusum_drift",
    "events_gini_binned",
    "corpus_rendezvous_shards",
    "privacy_t_closeness",
    "events_holt_trend",
    "events_dow_seasonality",
    "orders_rfm_segments",
    "sql_agg_functions",
    "sql_join_null_semantics",
    "events_session_paths",
    "events_acf_daily",
    "events_key_skew_profile",
    "events_interarrival_stats",
    "embed_silhouette_labels",
    "embed_norm_stats",
    "dedup_minhash_estimate_error",
    "join_asof_cogrouped_pandas",
    "corpus_chunk_windows",
    "dedup_prefix_filter_jaccard",
    "dedup_minhash_band_tuning",
    "dedup_band_tuning_sampled",
    "embed_semdedup_prune",
    "embed_pq_adc_search",
    "embed_ivfpq_search",
    "dedup_graph_degree_profile",
    "corpus_split_leakage",
    "events_json_schema_profile",
    "events_user_entropy",
    "events_user_features",
    "events_gini_concentration",
    "events_markov_eval",
    "events_survival_km",
    "events_bootstrap_ci",
    "events_holt_winters",
    "join_asof_nearest_click",
    "join_session_overlap",
    "orders_cohort_ltv",
    "orders_backlog_sweepline",
    "lineitem_returns_pchart",
    "supplier_concentration_hhi",
    "embed_centroid_drift",
    "embed_norm_stats",
    "embed_silhouette_labels",
    "embed_ivf_nprobe_matrix",
    "multimodal_exact_dupes",
    "sql_pipe_syntax_daily_revenue",
    "events_periodogram",
    "events_value_anova",
    "orders_benford_screen",
    "events_did_analysis",
    "events_ab_conversion_ztest",
    "events_table_diff",
    "text_langid_confusion",
    "part_price_index_laspeyres",
    "orders_fiscal_445_revenue",
    "events_holt_backtest",
    "corpus_decontaminate",
    "retrieval_rrf_fusion",
    "corpus_cluster_split",
    "embed_sq8_quantize",
    "embed_sq8_recall",
    "dedup_duplicated_spans",
    "events_cms_frequency",
    "lineitem_bloom_join_prune",
    "embed_binary_quantize_recall",
    "embed_nndescent_knn",
    "embed_semdedup_resplit",
    "embed_hard_negatives",
    "corpus_curriculum_order",
]

#: per-table (key column -> offset-base column source); offsets are
#: i * (max(key)+1) per copy i, keeping FK chains consistent per copy
_OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_SHARED_DIMS = ["region", "nation"]

#: key -> which table's key domain it offsets against
_DOMAIN = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def build(spark, src: str, out: str, mult: int) -> None:
    from pyspark.sql import functions as F

    from weather_bigdata_project_spark import tables

    bases = {}
    for tbl, key in set(_DOMAIN.values()):
        df = tables.load(spark, src, tbl)
        bases[(tbl, key)] = df.agg(F.max(key)).collect()[0][0] + 1

    for tbl in _SHARED_DIMS:
        tables.load(spark, src, tbl).write.mode("overwrite").parquet(
            f"{out}/{tbl}.parquet"
        )
    for tbl, keys in _OFFSETS.items():
        df = tables.load(spark, src, tbl)
        copies = []
        for i in range(mult):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + i * bases[_DOMAIN[k]])
            if tbl == "documents" and i > 0:
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copy{i}"))
                )
            copies.append(c)
        allc = copies[0]
        for c in copies[1:]:
            allc = allc.unionByName(c)
        if tbl == "events":
            # events.ts must survive as TIMESTAMP(NANOS)-free parquet;
            # loader already normalized to timestamp_ntz — write as-is
            pass
        allc.write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sf_scale")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    from weather_bigdata_project_spark import registry
    from weather_bigdata_project_spark.session import get_spark

    registry.load()
    spark = get_spark("scale-smoke")

    if not args.skip_build:
        t0 = time.time()
        build(spark, args.src, args.out, args.mult)
        print(f"# built {args.mult}x fixtures in {time.time()-t0:.1f}s",
              file=sys.stderr)

    times = {}
    for name in QUERIES_TO_RUN:
        t0 = time.time()
        registry.QUERIES[name](spark, args.out).write.format("noop").mode(
            "overwrite"
        ).save()
        times[name] = round(time.time() - t0, 2)
        print(f"# {name}: {times[name]}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "scale_smoke_wall",
                "mult": args.mult,
                "value": round(sum(times.values()), 2),
                "unit": "sec",
                "queries": times,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
