"""Partition-order independence: SCALE.md / registry claim that every
cross-row double aggregation is computed from exact integer units, so
results cannot depend on partitioning. Prove it: run the
double-aggregating queries under very different shuffle layouts and
require bit-identical results."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from weather_bigdata_project_spark import registry
from weather_bigdata_project_spark.registry import QUERIES

registry.load()

# queries whose outputs involve doubles aggregated across rows
SENSITIVE = [
    "weather_city_stats",
    "weather_global_stats",
    "events_hourly_window",
    "tpch_q1_pricing_summary",
    "tpch_q5_regional_revenue",
    "window_moving_avg_events",
    "text_quality_score",
    "dedup_ngram_jaccard",
    "corpus_filter_pipeline",
    # this session's double-heavy additions
    "events_moment_stats",
    "events_spearman_corr",
    "lineitem_corr_matrix",
    "ml_linreg_normal_eq",
    "events_stl_decompose",
    "events_holt_gridsearch",
    "events_value_twap",
    "geo_idw_interpolation",
    "corpus_perplexity_bigram",
    "events_seasonality_strength",
    "events_retention_halflife",
    "events_rate_shrinkage_eb",
    "events_feature_mi_screen",
    "weather_gumbel_return_levels",
    "events_bass_diffusion",
    "part_price_dispersion",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(repr(r[c]) for c in cols) for r in df.select(*cols).collect()
    )


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_partitioning(spark, name):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _canon(QUERIES[name](spark, SF_SMOKE))
        spark.conf.set("spark.sql.shuffle.partitions", "43")
        b = _canon(QUERIES[name](spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert a == b, f"{name} depends on partitioning"
