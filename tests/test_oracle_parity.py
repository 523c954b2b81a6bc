"""The correctness gate, as a test: every queries() entry with an oracle
must match DuckDB exactly at sf0.001 (fast); the driver re-runs the same
comparison at sf0.01."""

from __future__ import annotations

import sys

import pytest

import os

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entry  # noqa: E402
from tools.check_oracle import compare, duck_connect  # noqa: E402
from tests.conftest import SF_SMOKE  # noqa: E402

QS = entry.queries()
ORACLES = entry.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QS))
def test_query_matches_oracle(spark, duck, name):
    df = QS[name](spark, SF_SMOKE)
    if name not in ORACLES:
        assert len(df.take(1)) >= 0  # rows-only: must execute
        return
    problems = compare(name, df, ORACLES[name], duck)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) == 26
