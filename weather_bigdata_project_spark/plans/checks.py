"""Physical-plan quality checks — the SCALE.md guarantees as assertable
predicates. Used by tests/test_plans.py so a regression that silently
drops predicate pushdown, widens a scan, or drags Python into a hot path
fails CI, not a 100 TB run.

All checks parse `explain("formatted")` output (stable operator names
since Spark 3.x) rather than poking at JVM internals.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(plan: str) -> list[str]:
    """Every non-empty PushedFilters list in the plan's scans."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.append(m.group(1))
    return out


def read_schemas(plan: str) -> list[str]:
    return [m.group(1) for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan)]


def assert_no_python(plan: str) -> None:
    """Hot paths must stay JVM-side: no row-at-a-time or Arrow Python
    evaluation operators anywhere in the plan."""
    bad = [
        op
        for op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        if op in plan
    ]
    assert not bad, f"Python execution in hot path: {bad}"


def assert_pushdown(plan: str, fragment: str) -> None:
    """A filter fragment (column name or literal) must reach a scan's
    PushedFilters — i.e., not be evaluated post-scan only."""
    assert any(
        fragment in f for f in pushed_filters(plan)
    ), f"{fragment!r} not pushed to any scan; pushed={pushed_filters(plan)}"


def assert_scan_pruned(plan: str, absent_column: str) -> None:
    """Column pruning: `absent_column` must not appear in any ReadSchema."""
    for s in read_schemas(plan):
        assert absent_column not in s, (
            f"scan reads {absent_column!r} it does not need: struct<{s}>"
        )


def assert_broadcast_join(plan: str, min_count: int = 1) -> None:
    assert plan.count("BroadcastHashJoin") >= min_count, (
        f"expected >= {min_count} BroadcastHashJoin in plan"
    )


def assert_no_cartesian(plan: str) -> None:
    assert "CartesianProduct" not in plan, "unbounded cartesian product"


def assert_no_nested_loop(plan: str) -> None:
    """Stricter than assert_no_cartesian: also rejects broadcast
    nested-loop joins. Use on operators whose non-equi condition is
    SUPPOSED to have been rewritten into an equi join (band joins);
    deliberate broadcast-NLJ ops (brute-force ANN) skip this."""
    assert_no_cartesian(plan)
    assert "BroadcastNestedLoopJoin" not in plan, (
        "nested-loop join — a non-equi condition failed to compile to a "
        "hash/sort-merge join"
    )


def count_exchanges(plan: str) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges — those
    move only the small side)."""
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))


def assert_max_shuffles(plan: str, n: int) -> None:
    got = count_exchanges(plan)
    assert got <= n, f"plan has {got} shuffle exchanges, budget is {n}"
