"""Cross-engine-deterministic scalar expression helpers.

Rule discovered by the oracle harness: Spark's ROUND(x, k>0) on DOUBLE
goes through BigDecimal.valueOf (shortest decimal string) while DuckDB
rounds the binary value — at exact .xx5 boundaries they disagree. ROUND at
scale 0 is always consistent (both engines apply ties-away-from-zero to
the same IEEE double). So: never emit ROUND(x, k>0) in a shared snippet;
scale, round at 0, unscale.
"""

from __future__ import annotations


def rnd(expr: str, k: int) -> str:
    """ROUND(expr, k) with bit-identical Spark/DuckDB behavior."""
    scale = f"1e{k}"
    return f"(CAST(ROUND(({expr}) * {scale}) AS DOUBLE) / {scale})"


def cents(col: str) -> str:
    """Exact integer cents for an exactly-2-decimal double column —
    makes cross-row SUMs order-insensitive (exact integer arithmetic)."""
    return f"CAST(ROUND(({col}) * 100.0e0) AS BIGINT)"


def money(sum_cents: str) -> str:
    """Integer cents back to a display double (exact: c/100 has <=2
    decimals, so no rounding boundary exists)."""
    return f"(CAST({sum_cents} AS DOUBLE) / 100.0e0)"
