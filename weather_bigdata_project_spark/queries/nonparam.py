"""Nonparametric / rank-based inference over the events stream.

The reference's statistical surface is mean/min/max/std
(ref:streamlit/app.py:333-338,396-405). The parametric extensions
(t-test, ANOVA, chi-square — `stats.py`, `timeseries.py`) all assume
distributional shape; this module adds the rank-based battery an analyst
reaches for when that assumption is suspect: Mann-Whitney U (rank-sum),
the two-sample Kolmogorov-Smirnov distance, and Spearman rank
correlation.

Shared design: every test reduces the row stream to a per-distinct-value
contingency frame FIRST (one hash aggregate, map-side combined — the
number of distinct cent-values is bounded by the value domain, not the
row count), then computes ranks from *cumulative counts* over that small
frame with a single window pass. Average ranks over ties are kept exact
by carrying DOUBLED ranks (2*rank is always an integer even when the
tie-averaged rank is x.5), so every cross-row sum in the pipeline is an
exact BIGINT and partition-order-insensitive; each test statistic is then
ONE float evaluation over a handful of exact integer scalars, snapped
before the hash compare. At 100 TB the same shape holds: the only
shuffle is the distinct-value aggregate (domain-bounded), the window runs
over thousands of rows, not billions.

The statistical SQL text from the contingency frame onward is IDENTICAL
on Spark and DuckDB — only the source prelude differs (ns->us timestamp
fixup + weekend predicate spelling: Spark `weekday(ts) >= 5`, DuckDB
`isodow(ts) >= 6`, both meaning Saturday/Sunday).

BIGINT headroom: doubled ranks are <= 2n+1, so Sxx-style sums stay under
4n^3 — int64-safe to n ~ 1.3e6 rows; past that the accumulators move to
DECIMAL(38,0)/HUGEINT with the same plan shape (cross-scalar products are
already evaluated in DOUBLE in both engines, identical expression text,
one deterministic IEEE evaluation per statistic).
"""

from __future__ import annotations

from .. import tables
from ..functions.exprs import rnd
from ..registry import query

#: exact integer cents of the 2-decimal value column
_V = "CAST(ROUND(value * 100.0e0) AS BIGINT)"

_SPARK_WKND = "CASE WHEN weekday(ts) >= 5 THEN 1 ELSE 0 END"
_DUCK_WKND = "CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END"


def _grouped_vals(src: str, wknd: str) -> str:
    """CTE chain: rows -> (value, weekend) -> per-distinct-value counts
    with the cumulative count of strictly-smaller values (cprev)."""
    return (
        f"vals AS (SELECT {_V} AS v, CAST({wknd} AS BIGINT) AS g FROM {src}), "
        "agg AS (SELECT v, COUNT(*) AS c, SUM(g) AS c1 FROM vals GROUP BY v), "
        "rk AS (SELECT v, c, c1, COALESCE(SUM(c) OVER (ORDER BY v "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cprev "
        "FROM agg)"
    )


# --- Mann-Whitney U (Wilcoxon rank-sum), weekend vs weekday ---------------

# r1_2 = sum over weekend rows of DOUBLED average ranks: a value tied c
# times after cprev smaller rows has average rank cprev + (c+1)/2, i.e.
# doubled rank 2*cprev + c + 1 — integer always. tie_t = sum(c^3 - c)
# feeds the tie-corrected variance.
_MW_TAIL = (
    "s AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, "
    "CAST(SUM(c) - SUM(c1) AS BIGINT) AS n2, "
    "CAST(SUM(c1 * (2 * cprev + c + 1)) AS BIGINT) AS r1_2, "
    "CAST(SUM(c * c * c - c) AS BIGINT) AS tie_t FROM rk) "
    "SELECT n1, n2, "
    "CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / 2.0e0 AS u1, "
    + rnd(
        "(CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / 2.0e0 "
        " - CAST(n1 AS DOUBLE) * n2 / 2.0e0) / "
        "sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0e0 * "
        "((n1 + n2 + 1) - CAST(tie_t AS DOUBLE) / "
        "((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2 - 1))))",
        6,
    )
    + " AS z_u FROM s"
)


@query(
    "events_mannwhitney_u",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        + _grouped_vals("events_t", _DUCK_WKND)
        + ", " + _MW_TAIL
    ),
)
def events_mannwhitney_u(spark, sf_dir):
    """Mann-Whitney U: do weekend event values stochastically dominate
    weekday ones? Rank-sum over the combined sample with exact
    tie-averaged ranks (doubled-rank trick keeps every sum BIGINT) and
    the tie-corrected normal approximation z. One domain-bounded hash
    aggregate + one small window pass; the row stream is never sorted."""
    tables.load(spark, sf_dir, "events").createOrReplaceTempView("np_events")
    return spark.sql(
        "WITH " + _grouped_vals("np_events", _SPARK_WKND) + ", " + _MW_TAIL
    )


# --- two-sample Kolmogorov-Smirnov distance -------------------------------

# D = max_x |F1(x) - F2(x)| kept exact as max |cum1*n2 - cum2*n1| over
# the distinct-value frame (integer cross-products; division happens
# once, at the end).
_KS_TAIL = (
    "cum AS (SELECT v, SUM(c1) OVER (ORDER BY v) AS cum1, "
    "SUM(c - c1) OVER (ORDER BY v) AS cum2 FROM rk), "
    "tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, "
    "CAST(SUM(c) - SUM(c1) AS BIGINT) AS n2 FROM rk), "
    "d AS (SELECT MAX(ABS(CAST(cum1 * n2 - cum2 * n1 AS BIGINT))) AS dnum "
    "FROM cum CROSS JOIN tot) "
    "SELECT n1, n2, "
    + rnd("CAST(dnum AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)", 6)
    + " AS ks_d, "
    + rnd(
        "CAST(dnum AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2) * "
        "sqrt(CAST(n1 AS DOUBLE) * n2 / (CAST(n1 AS DOUBLE) + n2))",
        6,
    )
    + " AS ks_lambda FROM d CROSS JOIN tot"
)


@query(
    "events_ks_weekend",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        + _grouped_vals("events_t", _DUCK_WKND)
        + ", " + _KS_TAIL
    ),
)
def events_ks_weekend(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov distance between weekend and weekday
    value distributions. The sup-norm of the ECDF gap is computed as an
    exact integer max over the distinct-value frame (|cum1*n2 - cum2*n1|
    — no per-row float ECDFs to disagree about); ks_lambda is the
    normalized statistic the asymptotic Kolmogorov distribution takes.
    Same two-pass shape as Mann-Whitney: domain-bounded aggregate, then
    a window over thousands of distinct values."""
    tables.load(spark, sf_dir, "events").createOrReplaceTempView("np_events")
    return spark.sql(
        "WITH " + _grouped_vals("np_events", _SPARK_WKND) + ", " + _KS_TAIL
    )


# --- Spearman rank correlation (value vs hour-of-day) ---------------------

_H = "CAST(hour(ts) AS BIGINT)"


def _spearman_sql(src: str) -> str:
    """Full statement: doubled tie-averaged ranks for both variables come
    from two domain-bounded rank frames joined back to the row stream;
    Pearson on the doubled ranks (scale factors cancel) is five exact
    BIGINT sums + one float formula."""
    return (
        f"WITH vals AS (SELECT {_V} AS v, {_H} AS h FROM {src}), "
        "rv AS (SELECT v, 2 * COALESCE(SUM(c) OVER (ORDER BY v "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS rv2 "
        "FROM (SELECT v, COUNT(*) AS c FROM vals GROUP BY v)), "
        "rh AS (SELECT h, 2 * COALESCE(SUM(c) OVER (ORDER BY h "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS rh2 "
        "FROM (SELECT h, COUNT(*) AS c FROM vals GROUP BY h)), "
        "joined AS (SELECT rv2, rh2 FROM vals "
        "JOIN rv USING (v) JOIN rh USING (h)), "
        "s AS (SELECT COUNT(*) AS n, SUM(rv2) AS sx, SUM(rh2) AS sy, "
        "SUM(rv2 * rv2) AS sxx, SUM(rh2 * rh2) AS syy, "
        "SUM(rv2 * rh2) AS sxy FROM joined) "
        "SELECT CAST(n AS BIGINT) AS n, "
        + rnd(
            "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / "
            "(sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * "
            "sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))",
            6,
        )
        + " AS spearman_rho FROM s"
    )


@query(
    "events_spearman_corr",
    oracle=(
        "WITH "
        + tables.EVENTS_ORACLE_CTE
        + ", "
        + _spearman_sql("events_t")[len("WITH ") :]
    ),
)
def events_spearman_corr(spark, sf_dir):
    """Spearman rank correlation between event value and hour-of-day —
    the monotonic-association twin of events_moment_stats' Pearson r.
    Tie-averaged ranks for each variable come from domain-bounded rank
    frames (distinct cent-values / 24 hours) broadcast-joined back to the
    rows; the correlation itself is Pearson on doubled ranks, five exact
    BIGINT sums in one map-combined aggregate. rank(hour) has huge ties —
    exactly the case the tie-averaging handles."""
    tables.load(spark, sf_dir, "events").createOrReplaceTempView("np_events")
    return spark.sql(_spearman_sql("np_events"))
