"""Edge-case robustness guards for hazards the fixture-driven oracle
parity can't see: degenerate inputs (constant reference columns),
at-scale integer overflow (orderkeys beyond the test SF), and
completeness contracts (every user present in per-user verdict tables).

Each test here pins a failure mode a round-3 review flagged as latent:
the query is green on fixtures but would silently mis-answer (not
error) on the shape of data a 100 TB corpus actually contains.
"""

from __future__ import annotations

import duckdb

from weather_bigdata_project_spark.queries.ml import _KF_FOLD, _STU_TRAIN
from weather_bigdata_project_spark.queries.jsonops import _DIFF_H
from weather_bigdata_project_spark.queries.warehouse import _drift_sql
from weather_bigdata_project_spark.registry import QUERIES, load

from tests.conftest import SF_SMOKE

load()


# --- LCG hash keys stay BIGINT-safe at any key scale ------------------------

def test_fold_hashes_no_overflow_at_100tb_keys():
    """DuckDB raises on BIGINT overflow (Spark would wrap silently), so
    evaluating each LCG fold/split/bucket hash on keys far beyond any
    SF — 1e13 orderkeys is ~100 TB of lineitem — proves the reduced
    form can never diverge between engines at scale."""
    con = duckdb.connect()
    for expr, binds in [
        (_KF_FOLD, "SELECT 9000000000000::BIGINT AS l_orderkey, "
                   "7::BIGINT AS l_linenumber"),
        (_STU_TRAIN, "SELECT 9000000000000::BIGINT AS l_orderkey, "
                     "7::BIGINT AS l_linenumber"),
        (_DIFF_H, "SELECT 9000000000000::BIGINT AS event_id"),
    ]:
        got = con.execute(f"SELECT {expr} FROM ({binds})").fetchone()[0]
        assert got is not None


def test_fold_hash_parity_spark_duckdb_huge_keys(spark):
    """The reduced fold hash must agree across engines on keys > 2^33
    (where the unreduced form overflowed)."""
    keys = [(2**33 + 5, 1), (10**13, 4), (8_400_000_017, 7)]
    df = spark.createDataFrame(
        keys, "l_orderkey long, l_linenumber long"
    )
    got = sorted(
        r[0] for r in df.selectExpr(f"{_KF_FOLD} AS f").collect()
    )
    con = duckdb.connect()
    want = sorted(
        con.execute(
            f"SELECT {_KF_FOLD} FROM (SELECT ?::BIGINT AS l_orderkey, "
            "?::BIGINT AS l_linenumber)",
            [k, l],
        ).fetchone()[0]
        for k, l in keys
    )
    assert got == want


# --- PSI degenerate reference range -----------------------------------------

def _drift_rows(rows):
    return {r["col"]: r for r in rows}


def test_dq_schema_drift_constant_reference_flags_null_psi(spark):
    """A constant-valued reference column has no bin width: the PSI must
    come back NULL (unmeasurable, like the user_id row), never a
    silently 'stable' 0 from a single collapsed bucket."""
    spark.createDataFrame(
        [
            # reference half (ts < 2024-01-16): constant value
            ("2024-01-10 00:00:00", 5.0, "click", 1),
            ("2024-01-11 00:00:00", 5.0, "view", 2),
            ("2024-01-12 00:00:00", 5.0, "click", 3),
            # current half: varied values
            ("2024-01-20 00:00:00", 1.0, "click", 1),
            ("2024-01-21 00:00:00", 9.0, "purchase", 2),
        ],
        "ts_s string, value double, event_type string, user_id long",
    ).selectExpr(
        "CAST(ts_s AS TIMESTAMP) AS ts", "value", "event_type", "user_id"
    ).createOrReplaceTempView("drift_const_ref")

    rows = _drift_rows(
        r.asDict()
        for r in spark.sql(_drift_sql("drift_const_ref")).collect()
    )
    assert rows["value"]["psi"] is None
    assert rows["value"]["drift"] is None
    # the categorical column is unaffected by the numeric guard
    assert rows["event_type"]["psi"] is not None


def test_dq_schema_drift_constant_reference_duckdb_agrees(spark):
    """The degenerate-range guard is shared SQL text: DuckDB must return
    the same NULL verdict (and not error on the NULLIF'd division)."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE drift_const_ref AS "
        "SELECT * FROM (VALUES "
        "(TIMESTAMP '2024-01-10 00:00:00', 5.0, 'click', 1), "
        "(TIMESTAMP '2024-01-11 00:00:00', 5.0, 'view', 2), "
        "(TIMESTAMP '2024-01-20 00:00:00', 1.0, 'click', 1), "
        "(TIMESTAMP '2024-01-21 00:00:00', 9.0, 'purchase', 2)"
        ") t(ts, value, event_type, user_id)"
    )
    rows = {
        r[0]: r
        for r in con.execute(_drift_sql("drift_const_ref")).fetchall()
    }
    assert rows["value"][5] is None  # psi
    assert rows["value"][6] is None  # drift
    assert rows["event_type"][5] is not None


# --- bot detection covers every user -----------------------------------------

def test_bot_detection_full_user_frame(spark):
    """The verdict table must contain EVERY distinct user: single-event
    users (no gaps, rules can't fire) appear with NULL rule inputs and
    bot = false rather than vanishing."""
    out = QUERIES["events_bot_detection"](spark, SF_SMOKE).collect()
    n_users = (
        spark.read.parquet(SF_SMOKE + "/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(out) == n_users
    singles = [r for r in out if r.n_events == 1]
    for r in singles:
        assert r.fast_share is None and r.gap_cv is None
        assert r.bot is False
