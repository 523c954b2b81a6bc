"""Reshape + distribution operators over the events stream: pivot /
unpivot (wide<->long), exact interpolated percentiles, and a funnel
conversion — the dashboard shapes one step past the reference's
group-by tables (ref:streamlit/app.py:333-360 computes only long-format
per-city aggregates; a real dashboard pivots them wide and reads
quantiles off distributions).

Scale notes:
- pivot with an EXPLICIT value list avoids the distinct-discovery scan
  of the pivot column (never call pivot without values at scale). The
  physical plan is two-phase: a partial-combined aggregate on
  (key, pivot-value) — the only exchange that sees fact-row volume —
  then the PivotFirst aggregate over that already-reduced frame;
- unpivot/melt is a narrow Expand (rows x k, no shuffle);
- exact percentiles need the whole group's values; fine per
  low-cardinality group (5 event types). The 100 TB path for
  high-cardinality groups is approx_percentile (t-digest sketch,
  mergeable partials) — `weather_city_boxstats` shows that form;
- the funnel is two hash aggregates (per-user conditional mins, then a
  global conditional count) — never a self-join per stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import tables
from ..functions.exprs import money, rnd
from ..registry import query

_TYPES = ["click", "error", "purchase", "signup", "view"]


# --- pivot: long -> wide ------------------------------------------------------
@query(
    "events_pivot_daily_types",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + " "
        "SELECT CAST(ts AS DATE) AS day, "
        + ", ".join(
            f"SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS {t}"
            for t in _TYPES
        )
        + " FROM events_t GROUP BY day"
    ),
)
def events_pivot_daily_types(spark, sf_dir):
    """Daily event counts pivoted wide, one column per event type. The
    explicit value list means no distinct scan to discover columns (and
    a statically known schema); the plan is the two-phase pivot — the
    (day, type) aggregate carries the fact volume through ONE exchange,
    the PivotFirst aggregate reshapes the day x 5 frame. Missing
    (day, type) cells are 0, not null, to match the conditional-sum
    oracle."""
    ev = tables.load(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", _TYPES)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _TYPES]
    )


# --- unpivot: wide -> long ----------------------------------------------------
@query(
    "events_unpivot_daily_types",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + " "
        "SELECT CAST(ts AS DATE) AS day, event_type, "
        "COUNT(*) AS n FROM events_t GROUP BY day, event_type"
    ),
)
def events_unpivot_daily_types(spark, sf_dir):
    """melt/unpivot: the wide daily pivot back to long form via
    `DataFrame.unpivot` (an Expand — narrow, zero additional shuffle on
    top of the pivot's aggregate). Zero cells are dropped to mirror the
    long-form groupBy the oracle runs; the pivot->unpivot round trip is
    exactly the long aggregate."""
    wide = events_pivot_daily_types(spark, sf_dir)
    return (
        wide.unpivot("day", _TYPES, "event_type", "n")
        .filter(F.col("n") > 0)
        .select("day", "event_type", "n")
    )


# --- exact interpolated percentiles -------------------------------------------
_QS = [0.25, 0.5, 0.75, 0.95]
_QNAMES = ["p25", "p50", "p75", "p95"]


@query(
    "events_exact_percentiles",
    oracle=(
        "SELECT event_type, "
        + ", ".join(
            rnd(f"quantile_cont(value, {q}e0)", 4) + f" AS {n}"
            for q, n in zip(_QS, _QNAMES)
        )
        + " FROM events GROUP BY event_type"
    ),
)
def events_exact_percentiles(spark, sf_dir):
    """Exact linear-interpolated percentiles of value per event type
    (Spark `percentile` == DuckDB `quantile_cont`: both index the sorted
    run at (n-1)*q and interpolate). All four quantiles come from ONE
    percentile(array(...)) aggregate — one sort per group, one shuffle.
    Exact percentiles buffer the group's values; right here groups are
    the 5 event types. At 100 TB / high-cardinality groups use
    approx_percentile (mergeable t-digest partials, no buffering) —
    `weather_city_boxstats` demonstrates that form. Output edges ride
    rnd(4) so the interpolation's last-ulp noise can't flip the hash."""
    ev = tables.load(spark, sf_dir, "events")
    qarr = ", ".join(f"{q}e0" for q in _QS)
    agg = ev.groupBy("event_type").agg(
        F.expr(f"percentile(value, array({qarr}))").alias("qs")
    )
    return agg.select(
        "event_type",
        *[
            F.expr(rnd(f"qs[{i}]", 4)).alias(n)
            for i, n in enumerate(_QNAMES)
        ],
    )


# --- funnel conversion ---------------------------------------------------------
@query(
    "events_funnel_conversion",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "u AS (SELECT user_id, "
        "MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view, "
        "MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click, "
        "MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy "
        "FROM events_t GROUP BY user_id) "
        "SELECT COUNT(*) AS n_users, "
        "SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS viewed, "
        "SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS clicked_after_view, "
        "SUM(CASE WHEN t_buy > t_click AND t_click > t_view THEN 1 ELSE 0 END) "
        "AS full_funnel FROM u"
    ),
)
def events_funnel_conversion(spark, sf_dir):
    """view -> click -> purchase funnel: per-user first-touch times from
    ONE conditional-min aggregate, then a 1-row conditional count. Two
    hash aggregates, no self-joins (the naive funnel joins the event
    table once per stage); NULL comparisons drop non-converting users in
    both engines identically. At 100 TB the per-user frame is the only
    shuffle and it is user-cardinality, not event-cardinality."""
    ev = tables.load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    one = F.lit(1)
    zero = F.lit(0)
    return u.agg(
        F.count(one).alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), one).otherwise(zero)).alias(
            "viewed"
        ),
        F.sum(
            F.when(F.col("t_click") > F.col("t_view"), one).otherwise(zero)
        ).alias("clicked_after_view"),
        F.sum(
            F.when(
                (F.col("t_buy") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                one,
            ).otherwise(zero)
        ).alias("full_funnel"),
    )


# --- funnel conversion latency -------------------------------------------

#: exact integer latency (whole seconds) between funnel stages,
#: timezone-independent in both engines
_LAT_SPARK = (
    "CAST(timestampdiff(SECOND, t_view, t_buy) AS BIGINT)"
)
_LAT_DUCK = "CAST(epoch_us(t_buy - t_view) // 1000000 AS BIGINT)"

_FLAT_QS = [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95")]


@query(
    "events_funnel_latency",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "u AS (SELECT user_id, "
        "MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view, "
        "MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click, "
        "MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy "
        "FROM events_t GROUP BY user_id), "
        f"lat AS (SELECT {_LAT_DUCK} AS lat_s FROM u "
        "WHERE t_click > t_view AND t_buy > t_click) "
        "SELECT COUNT(*) AS n_converted, "
        + ", ".join(
            rnd(f"quantile_cont(lat_s, {q}e0)", 4) + f" AS {n}"
            for q, n in _FLAT_QS
        )
        + " FROM lat"
    ),
)
def events_funnel_latency(spark, sf_dir):
    """Time-to-convert distribution: exact interpolated percentiles of
    the view->purchase latency over fully-converted users. The per-user
    conditional-min aggregate is the same single pass the funnel query
    uses (no per-stage self-joins); latencies are exact integer seconds
    (NTZ arithmetic — timezone-independent), and the percentile runs as
    ONE percentile(array) aggregate over the already-user-cardinality
    frame."""
    ev = tables.load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_buy"),
    )
    lat = u.filter(
        (F.col("t_click") > F.col("t_view"))
        & (F.col("t_buy") > F.col("t_click"))
    ).select(F.expr(_LAT_SPARK).alias("lat_s"))
    qarr = ", ".join(f"{q}e0" for q, _ in _FLAT_QS)
    agg = lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.expr(f"percentile(lat_s, array({qarr}))").alias("qs"),
    )
    return agg.select(
        "n_converted",
        *[
            F.expr(rnd(f"qs[{i}]", 4)).alias(n)
            for i, (_, n) in enumerate(_FLAT_QS)
        ],
    )


# --- multi-granularity time rollup ---------------------------------------


@query(
    "events_time_rollup",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "base AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS wk, "
        "CAST(ts AS DATE) AS day, hour(ts) AS hr, "
        "CAST(ROUND(value * 100.0e0) AS BIGINT) AS v_c FROM events_t) "
        "SELECT wk, day, hr, COUNT(*) AS n, "
        f"{money('SUM(v_c)')} AS total_value, "
        "GROUPING(wk) AS g_wk, GROUPING(day) AS g_day, "
        "GROUPING(hr) AS g_hr "
        "FROM base GROUP BY GROUPING SETS ((wk), (wk, day), "
        "(wk, day, hr), ())"
    ),
)
def events_time_rollup(spark, sf_dir):
    """Multi-granularity time rollup: event counts and exact-cents value
    totals at week, day, hour, and grand-total levels in ONE pass via
    GROUPING SETS — the Expand operator replicates each row once per
    level before a single hash-agg, so the fact table is scanned once
    where the dashboard's per-granularity queries would scan it four
    times. GROUPING() markers disambiguate the levels (a NULL day at
    the week level vs a genuine NULL)."""
    ev = tables.load(spark, sf_dir, "events")
    base = ev.selectExpr(
        "CAST(date_trunc('week', ts) AS DATE) AS wk",
        "CAST(ts AS DATE) AS day",
        "hour(ts) AS hr",
        "CAST(ROUND(value * 100.0e0) AS BIGINT) AS v_c",
    )
    base.createOrReplaceTempView("events_time_rollup_v")
    return spark.sql(
        "SELECT wk, day, hr, COUNT(*) AS n, "
        f"{money('SUM(v_c)')} AS total_value, "
        "GROUPING(wk) AS g_wk, GROUPING(day) AS g_day, "
        "GROUPING(hr) AS g_hr "
        "FROM events_time_rollup_v GROUP BY GROUPING SETS ((wk), "
        "(wk, day), (wk, day, hr), ())"
    )


@query(
    "events_funnel_strict",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "v AS (SELECT user_id, MIN(ts) AS t_v FROM events_t "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "c AS (SELECT e.user_id, MIN(e.ts) AS t_c FROM events_t e "
        "JOIN v ON e.user_id = v.user_id "
        "WHERE e.event_type = 'click' AND e.ts > v.t_v "
        "GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, MIN(e.ts) AS t_p FROM events_t e "
        "JOIN c ON e.user_id = c.user_id "
        "WHERE e.event_type = 'purchase' AND e.ts > c.t_c "
        "GROUP BY e.user_id) "
        "SELECT (SELECT COUNT(*) FROM v) AS viewed, "
        "(SELECT COUNT(*) FROM c) AS clicked_after_view, "
        "(SELECT COUNT(*) FROM p) AS purchased_after_click"
    ),
)
def events_funnel_strict(spark, sf_dir):
    """STRICT ordered funnel: stage N's anchor is the first event after
    the user's stage-N-1 anchor — first click AFTER the first view,
    first purchase AFTER that click. This differs from
    events_funnel_conversion's first-touch comparison (there, a user
    whose only clicks precede their first view but who clicked after a
    later view is miscounted — strict chaining cannot be expressed by
    comparing global first-touch times).

    Shape: each stage is one conditional scan + a user-cardinality
    min-aggregate joined to the previous stage's anchors; stage joins
    are user-keyed (the same single shuffle key end-to-end, so AQE
    reuses the partitioning). At 100 TB stage frames shrink
    monotonically — the funnel property itself bounds the work."""
    # each stage frame is read twice (the next stage's join AND the
    # final count), so unpersisted the chain cascade-recomputed its
    # predecessors — 5 fact scans measured in the round-7 audit; the
    # frames are user-cardinality, so persisting them is the cheap side
    from ..operators.textops import materialize as _mat

    ev = tables.load(spark, sf_dir, "events")
    v = _mat(
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_v"))
    )
    c = _mat(
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_v"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_c"))
    )
    p = _mat(
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_c"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_p"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("viewed"))
        .join(c.agg(F.count(F.lit(1)).alias("clicked_after_view")))
        .join(p.agg(F.count(F.lit(1)).alias("purchased_after_click")))
    )
