"""Gate on the committed shuffle-growth ledger (SHUFFLE_LEDGER.json).

The ledger (tools/shuffle_ledger.py) records, for every headline query,
shuffle volume at two SFs and the derived growth exponent. These tests
fail if any query's committed exponent exceeds its declared bound — the
plan-level regression signal for "a refactor reintroduced a quadratic
shuffle" that wall-clock benchmarks on a noisy box cannot give.

One live test also drives the stage-diff extractor itself on a known
shuffling query, so extractor rot (Spark API drift, status-store lag)
can't silently turn the ledger into zeros that trivially pass.
"""

from __future__ import annotations

import json
import os

import pytest

from tools.shuffle_ledger import (
    BOUNDS,
    BYTES_FLOOR,
    DEFAULT_BOUND,
    EXTENDED,
    FLAT_CAP,
    measure,
)
from bench import HEADLINE
from weather_bigdata_project_spark.registry import QUERIES, load

from tests.conftest import SF_SMOKE

load()

_LEDGER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SHUFFLE_LEDGER.json",
)


@pytest.fixture(scope="module")
def ledger():
    if not os.path.exists(_LEDGER):
        pytest.skip("SHUFFLE_LEDGER.json not generated yet")
    with open(_LEDGER) as f:
        return json.load(f)


def test_ledger_covers_headline(ledger):
    missing = [n for n in HEADLINE if n not in ledger["queries"]]
    assert not missing, f"headline queries missing from ledger: {missing}"


def test_ledger_covers_extended_suite(ledger):
    """Round-5 extension: the 30 shuffle-heaviest non-headline queries
    are gated too — the ledger must keep covering them (>= 80 total)."""
    missing = [n for n in EXTENDED if n not in ledger["queries"]]
    assert not missing, f"extended queries missing from ledger: {missing}"
    assert ledger["n_queries"] >= 80


def test_no_query_exceeds_declared_exponent(ledger):
    bad = {}
    for name, ent in ledger["queries"].items():
        bound = BOUNDS.get(name, DEFAULT_BOUND)
        e = ent["exponent_bytes"]
        if e is not None:
            if e > bound:
                bad[name] = (e, bound)
        else:
            # sub-floor at the small SF: absolute cap instead
            if ent["big"]["shuffle_write_bytes"] > FLAT_CAP:
                bad[name] = ("flat-cap", ent["big"]["shuffle_write_bytes"])
    assert not bad, f"shuffle growth exceeded declared bounds: {bad}"


def test_ledger_not_trivially_empty(ledger):
    """At least half the headline suite must show real shuffle volume at
    the big SF — an all-zeros ledger means the extractor broke, not that
    the engine stopped shuffling."""
    nonzero = [
        n
        for n, ent in ledger["queries"].items()
        if ent["big"]["shuffle_write_bytes"] > 0
    ]
    assert len(nonzero) >= len(ledger["queries"]) // 2


def test_input_bytes_prove_pruned_scans(ledger):
    """Scan volume must grow, and roughly linearly: a query whose
    input_bytes exponent blows past ~1.3 re-reads data it should prune
    or reuse."""
    for name, ent in ledger["queries"].items():
        e_in = ent.get("exponent_input_bytes")
        if e_in is not None and ent["small"]["input_bytes"] >= BYTES_FLOOR:
            assert e_in <= 1.5, (name, e_in)


def test_extractor_reports_real_shuffles(spark):
    """Live guard: the stage-diff extractor must see nonzero shuffle
    bytes for a groupBy query and count its side-job stages."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm, gw = sc._jvm, sc._gateway
    got = measure(
        spark,
        QUERIES["weather_city_stats"],
        SF_SMOKE,
        store,
        jvm,
        gw,
    )
    assert got["shuffle_write_bytes"] > 0
    assert got["shuffle_write_records"] > 0
    assert got["input_bytes"] > 0
    assert got["n_stages"] >= 2
    assert got["peak_task_shuffle_write_bytes"] > 0


def test_segment_exponents_recorded(ledger):
    """3-point ledgers must carry per-segment exponents; the verdict
    segment (largest SFs) must match exponent_bytes, so the gate always
    reads the regime closest to scale, not the fixed-cost-dominated
    small end."""
    if len(ledger.get("sfs", [])) < 3:
        pytest.skip("2-point ledger")
    for name, ent in ledger["queries"].items():
        segs = ent.get("exponent_bytes_segments")
        assert segs is not None and len(segs) == len(ledger["sfs"]) - 1
        assert segs[-1] == ent["exponent_bytes"]


def test_heavy_stage_skew_bounded(ledger):
    """The heaviest stage's max-task/avg-task shuffle-write ratio is the
    partition that outgrows its peers at scale. Salting/AQE keep the
    measured suite <= 3; gate at 6 so noise can't flake but a genuinely
    skewed key (ratio 10-100x) fails."""
    for name, ent in ledger["queries"].items():
        skew = ent["big"].get("heavy_stage_skew")
        if skew is not None and ent["big"]["shuffle_write_bytes"] > BYTES_FLOOR:
            assert skew <= 6.0, (name, skew)
