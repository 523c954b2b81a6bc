"""Query registry: every operator from SURVEY.md §2 (+ extensions) as a
(name -> Spark callable, name -> DuckDB oracle SQL) pair.

Conventions (driver contract, __spark_entry__.py):
- each callable: (spark, sf_dir) -> DataFrame;
- every computed column aliased identically in Spark and oracle SQL;
- ordering never matters (driver hash is order-insensitive) but LIMIT
  queries use a total order (unique tie-break key) so both engines pick
  the same rows;
- doubles that aggregate across rows are rounded at the output edge in
  BOTH engines so partition-order float noise cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# DuckDB widens SUM(BIGINT) to HUGEINT (int128). The driver's compare
# fetches oracle results through Arrow/pandas, where HUGEINT lands as
# float64 — so an all-integer column hashes as "687.0" against Spark's
# "687" and the value-hash fails even though every value is identical
# (round-1 evidence: weather_degree_days / weather_comfort_dwell were
# the only sampled queries with HUGEINT outputs and the only hash
# misses). Every oracle whose result would carry a HUGEINT column is
# wrapped with `* REPLACE (CAST(col AS BIGINT) AS col)` at registration;
# tests/test_check_oracle_harness.py scans all oracles at sf0.001 and
# fails if a new query reintroduces a HUGEINT/DECIMAL output column.
_ORACLE_BIGINT_COLS: dict[str, tuple[str, ...]] = {
    "corpus_sequence_pack": ("seq_id", "seq_offset"),
    "corpus_shard_balance": ("n_tokens", "n_chars"),
    "corpus_split_assign": ("total_chars",),
    "corpus_split_leakage": ("n_leaks",),
    "corpus_token_budget": ("cum_tokens",),
    "customer_record_linkage": ("n_true",),
    "dedup_chunk_level": ("n_dup_chunks",),
    "dedup_simhash": ("hamming",),
    "embed_kmeans_assign": ("sum_d_u",),
    "embed_kmeans_update": ("s_u",),
    "embed_lsh_buckets": ("bucket",),
    "embed_norm_stats": ("n_nonfinite",),
    "embed_pq_encode": ("err_u",),
    "events_ab_conversion_ztest": ("c1", "c2"),
    "events_funnel_conversion": (
        "viewed", "clicked_after_view", "full_funnel",
    ),
    "events_json_extract": ("sum_k",),
    "events_key_skew_profile": ("n_events",),
    "events_markov_eval": ("n_correct",),
    "events_pivot_daily_types": (
        "click", "error", "purchase", "signup", "view",
    ),
    "events_user_entropy": ("n_events",),
    "events_value_anova": ("n_rows",),
    "geo_grid_cell_stats": ("sum_temp",),
    "geo_zorder_cells": ("sum_temp",),
    "weather_pressure_tendency": ("sum_d3_cpa",),
    "grouping_sets_lineitem": ("sum_qty",),
    "join_geo_nearest_station": ("sum_d_ukm",),
    "join_session_overlap": ("sid1", "sid2"),
    "lineitem_returns_pchart": ("r",),
    "ml_logreg_gd": ("n_correct",),
    "orders_backlog_sweepline": ("open_orders",),
    "profile_lineitem_columns": ("null_returnflag", "null_quantity"),
    "sql_agg_functions": ("busy_days", "latest_v_c", "earliest_v_c"),
    "sql_window_functions": (
        "v_c", "prev_c", "next_c", "top_c", "bottom_c", "third_c",
    ),
    "text_fingerprint": ("fingerprint",),
    "text_inverted_index": ("total_tf",),
    "tpch_q12_priority_by_returnflag": (
        "high_line_count", "low_line_count",
    ),
    "tpch_q18_large_volume_orders": ("sum_qty",),
    "weather_comfort_dwell": ("dwell_us",),
    "weather_degree_days": ("hdd_c", "cdd_c"),
}


def _normalize_oracle(name: str, sql: str) -> str:
    cols = _ORACLE_BIGINT_COLS.get(name)
    if not cols:
        return sql
    repl = ", ".join(f'CAST("{c}" AS BIGINT) AS "{c}"' for c in cols)
    return f"SELECT * REPLACE ({repl}) FROM ({sql}) _typed"


def query(name: str, oracle: str | None = None):
    """Register a query; `oracle=None` => driver does rows-only check."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = _normalize_oracle(name, oracle)
        return fn

    return deco


# import for registration side effects (order = SURVEY §2 order).
# Deferred into a function so `registry` itself is cycle-free: query
# modules do `from ..registry import query` at import time, which must
# not re-enter these imports while a sibling module is half-initialized.
_LOADED = False

# The driver's correctness gate compares a bounded SAMPLE of queries()
# in dict order. Registration order is module-import order, so the
# natural prefix clusters one family (round 1 sampled only weather_*);
# round 2 fronted a hand-picked "showcase", which the round-2 advisor
# correctly flagged as builder-curated sampling (the gate could only
# ever see known-good queries). Both are replaced by a CONTENT-NEUTRAL
# deterministic order: queries sort by md5 of their name. That
# interleaves every family pseudo-randomly, is reproducible by any
# observer, involves no curation — a regression in ANY registered query
# has the same chance of landing in the driver's bounded sample. Full
# coverage remains tests/test_oracle_parity.py (every query, every run).


def _hash_order() -> None:
    import hashlib

    order = sorted(
        QUERIES, key=lambda n: hashlib.md5(n.encode()).hexdigest()
    )
    for d in (QUERIES, ORACLES):
        snap = dict(d)
        d.clear()
        for n in order:
            if n in snap:
                d[n] = snap[n]


def load() -> None:
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    from .queries import weather  # noqa: F401
    from .queries import analytics  # noqa: F401
    from .queries import relational  # noqa: F401
    from .queries import advanced  # noqa: F401
    from .queries import tpch_extra  # noqa: F401
    from .queries import tpch_rest  # noqa: F401
    from .queries import stats  # noqa: F401
    from .queries import behavior  # noqa: F401
    from .queries import reshape  # noqa: F401
    from .queries import timeseries  # noqa: F401
    from .queries import warehouse  # noqa: F401
    from .queries import dedup  # noqa: F401
    from .queries import similarity  # noqa: F401
    from .queries import text  # noqa: F401
    from .queries import retrieval  # noqa: F401
    from .queries import ml  # noqa: F401
    from .queries import nonparam  # noqa: F401
    from .queries import pyexec  # noqa: F401
    from .queries import curation  # noqa: F401
    from .queries import geo  # noqa: F401
    from .queries import jsonops  # noqa: F401
    from .queries import multimodal  # noqa: F401
    from .queries import privacy  # noqa: F401
    from .queries import sketches  # noqa: F401
    from .queries import spark4  # noqa: F401
    from .queries import webingest  # noqa: F401
    from .queries import pipeline  # noqa: F401  (composes the above)

    _hash_order()
