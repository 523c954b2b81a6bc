"""Time-series operators over the events stream: calendar gap-filling,
forward-fill (last observation carried forward), and cohort retention.

The reference's dashboard draws its time series straight from whatever
rows exist (ref:streamlit/app.py:243-251 sorts and plots observed
points) — days with no data silently vanish from the chart. These
operators make the calendar explicit: a generated per-group date spine,
zero-filled or forward-filled metrics, and the cohort-retention matrix
every product dashboard wants next.

Scale notes:
- the spine is generated from each group's OWN [min, max] day via
  `sequence()` + explode — spine size is bounded by calendar days x
  groups, never by fact rows, and it is built from the already-reduced
  daily aggregate (pinned via lazy localCheckpoint because two
  consumers hang off it — Catalyst has no common-subplan sharing);
- forward-fill is `last(ignorenulls)` over a per-group ordered window:
  one exchange on the group key, state = one value;
- cohort retention is two hash aggregates + one join, all on the
  distinct (user, day) frame — user-cardinality, not event-cardinality.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .. import tables
from ..functions.exprs import money, rnd
from ..operators.textops import materialize
from ..registry import query

#: shared oracle CTEs: daily per-type counts/value and the date spine
_DAILY_CTE = (
    tables.EVENTS_ORACLE_CTE + ", "
    "c AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n, "
    "SUM(CAST(ROUND(value * 100.0e0) AS BIGINT)) AS v_c "
    "FROM events_t GROUP BY event_type, CAST(ts AS DATE)), "
    "b AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 "
    "FROM c GROUP BY event_type), "
    "s AS (SELECT event_type, CAST(unnest(generate_series("
    "CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) "
    "AS DATE) AS day FROM b)"
)


def _daily(spark, sf_dir):
    """(event_type, day, n, v_c): per-type daily count + exact-cents
    value sum — the reduced frame everything below derives from."""
    ev = tables.load(spark, sf_dir, "events")
    return materialize(
        ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(ROUND(value * 100.0e0) AS BIGINT)")).alias(
                "v_c"
            ),
        )
    )


def _spined(spark, sf_dir):
    """Daily frame left-joined onto each type's full calendar spine."""
    c = _daily(spark, sf_dir)
    spine = (
        c.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    return spine.join(c, ["event_type", "day"], "left")


@query(
    "events_daily_gapfill",
    oracle=(
        "WITH " + _DAILY_CTE + " "
        "SELECT s.event_type, s.day, COALESCE(c.n, 0) AS n "
        "FROM s LEFT JOIN c ON s.event_type = c.event_type "
        "AND s.day = c.day"
    ),
)
def events_daily_gapfill(spark, sf_dir):
    """Calendar gap-filling: every (type, day) in each type's observed
    range appears, zero-filled where no events landed. The spine comes
    from the reduced daily aggregate, so no operator after the first
    groupBy ever sees fact-row volume; the spine<->daily join is
    dimension-sized and AQE broadcasts it."""
    out = _spined(spark, sf_dir)
    return out.select(
        "event_type", "day", F.coalesce("n", F.lit(0)).alias("n")
    )


@query(
    "events_daily_value_ffill",
    oracle=(
        "WITH " + _DAILY_CTE + " "
        "SELECT event_type, day, "
        f"{money('filled_c')} AS filled_value FROM ("
        "SELECT s.event_type, s.day, "
        "LAST_VALUE(c.v_c IGNORE NULLS) OVER ("
        "PARTITION BY s.event_type ORDER BY s.day "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_c "
        "FROM s LEFT JOIN c ON s.event_type = c.event_type "
        "AND s.day = c.day)"
    ),
)
def events_daily_value_ffill(spark, sf_dir):
    """Forward-fill: each type's daily value total, with gap days
    carrying the last observed total (last-observation-carried-forward).
    `last(ignorenulls)` over an ordered per-type window — one exchange
    on event_type, O(1) window state; the fill never touches the fact
    table, only the spined daily frame. Sums ride exact cents; the
    first spine day is each type's min observed day, so no leading
    nulls."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = _spined(spark, sf_dir).withColumn(
        "filled_c", F.last("v_c", ignorenulls=True).over(w)
    )
    return out.select(
        "event_type", "day", F.expr(money("filled_c")).alias("filled_value")
    )


@query(
    "events_cohort_retention",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
        "FROM events_t), "
        "f AS (SELECT user_id, MIN(day) AS cohort FROM act GROUP BY user_id) "
        "SELECT cohort, (day - cohort) AS day_offset, "
        "COUNT(DISTINCT act.user_id) AS n_active "
        "FROM act JOIN f ON act.user_id = f.user_id "
        "GROUP BY cohort, day_offset"
    ),
)
def events_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each later active day offset. Everything runs on the distinct
    (user, day) frame; the cohort label is a MIN window over the user
    partition on that same frame (round 9 — the old cohort aggregate +
    join-back consumed a pinned copy of the frame twice: one persist,
    one extra user-keyed exchange, one join, all gone; measured
    2.8 s -> 0.7 s interleaved at sf0.1, identical rows). The classic
    dashboard query the reference's pandas layer cannot express
    without a quadratic loop."""
    from pyspark.sql import Window

    ev = tables.load(spark, sf_dir, "events")
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id")
    return (
        act.withColumn("cohort", F.min("day").over(w))
        .groupBy(
            "cohort", F.datediff("day", "cohort").alias("day_offset")
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# --- behavioral transition matrix ----------------------------------------


@query(
    "events_transition_matrix",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "p AS (SELECT user_id, event_type AS to_type, "
        "LAG(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS from_type FROM events_t) "
        "SELECT from_type, to_type, COUNT(*) AS n_transitions, "
        "COUNT(DISTINCT user_id) AS n_users "
        "FROM p WHERE from_type IS NOT NULL GROUP BY from_type, to_type"
    ),
)
def events_transition_matrix(spark, sf_dir):
    """First-order Markov transition counts over each user's event
    sequence: (from_type -> to_type) with transition and distinct-user
    counts. One exchange on user_id for the lag window (state = one
    row), then a hash-agg whose key space is |types|^2 — the shuffle
    after the window moves per-partition partials only. The (ts,
    event_id) order key is total, so the lag is deterministic under any
    partitioning."""
    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        "user_id",
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    )
    return (
        p.filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# --- rolling anomaly detection -------------------------------------------
# Both rolling operators compute their statistics from EXACT integer
# window sums (v_c cents are BIGINT; sums of <=14 of them are far below
# 2^53, so every addition order yields the same double). The float
# division/sqrt then runs on bit-identical inputs in both engines — no
# stddev()/corr() builtin is used, because Welford-style streaming
# updates differ across engines in the last ulp.

_Z_WIN = (
    "OVER (PARTITION BY event_type ORDER BY day "
    "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"
)

#: z-score of today's value against the trailing 7-day window, from
#: exact sums: var_samp = (Sxx - Sx^2/k) / (k-1).
_Z_EXPR = (
    "CASE WHEN k >= 3 AND mn <> mx THEN "
    + rnd(
        "(CAST(v_c AS DOUBLE) - CAST(sx AS DOUBLE) / k) / "
        "SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
        " / k) / (k - 1))",
        3,
    )
    + " END"
)

_ZSCORE_ORACLE = (
    "WITH " + _DAILY_CTE + ", "
    "wst AS (SELECT event_type, day, v_c, "
    f"COUNT(*) {_Z_WIN} AS k, "
    f"SUM(v_c) {_Z_WIN} AS sx, "
    f"SUM(v_c * v_c) {_Z_WIN} AS sxx, "
    f"MIN(v_c) {_Z_WIN} AS mn, "
    f"MAX(v_c) {_Z_WIN} AS mx "
    "FROM c) "
    f"SELECT event_type, day, {money('v_c')} AS day_value, "
    f"{_Z_EXPR} AS zscore, "
    f"COALESCE(ABS({_Z_EXPR}) > 2.5e0, FALSE) AS is_anomaly "
    "FROM wst"
)


@query("events_anomaly_zscore", oracle=_ZSCORE_ORACLE)
def events_anomaly_zscore(spark, sf_dir):
    """Daily-value anomaly flags: each (type, day) total scored against
    its own trailing 7-day window; |z| > 2.5 flags the day. Runs on the
    reduced daily frame — one exchange on event_type, window state is
    7 rows — so the fact table is touched exactly once by the daily
    aggregate. The reference hard-codes global thresholds
    (ref:spark-apps/weather_streaming.py:127-136); this is the
    self-calibrating upgrade."""
    c = _daily(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    st = c.select(
        "event_type",
        "day",
        "v_c",
        F.count(F.lit(1)).over(w).alias("k"),
        F.sum("v_c").over(w).alias("sx"),
        F.sum(F.expr("v_c * v_c")).over(w).alias("sxx"),
        F.min("v_c").over(w).alias("mn"),
        F.max("v_c").over(w).alias("mx"),
    )
    return st.select(
        "event_type",
        "day",
        F.expr(money("v_c")).alias("day_value"),
        F.expr(_Z_EXPR).alias("zscore"),
        F.expr(f"COALESCE(ABS({_Z_EXPR}) > 2.5e0, FALSE)").alias(
            "is_anomaly"
        ),
    )


_C_WIN = (
    "OVER (PARTITION BY event_type ORDER BY day "
    "ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)"
)

#: Pearson r of (daily count, daily value) from exact integer sums:
#: r = (k*Sxy - Sx*Sy) / sqrt((k*Sxx - Sx^2) * (k*Syy - Sy^2))
_CORR_EXPR = (
    "CASE WHEN k >= 3 AND mnx <> mxx AND mny <> mxy THEN "
    + rnd(
        "(k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / SQRT((k * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *"
        " CAST(sx AS DOUBLE)) * (k * CAST(syy AS DOUBLE) -"
        " CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))",
        4,
    )
    + " END"
)

_ROLLCORR_ORACLE = (
    "WITH " + _DAILY_CTE + ", "
    "wst AS (SELECT event_type, day, "
    f"COUNT(*) {_C_WIN} AS k, "
    f"SUM(n) {_C_WIN} AS sx, "
    f"SUM(v_c) {_C_WIN} AS sy, "
    f"SUM(n * n) {_C_WIN} AS sxx, "
    f"SUM(v_c * v_c) {_C_WIN} AS syy, "
    f"SUM(n * v_c) {_C_WIN} AS sxy, "
    f"MIN(n) {_C_WIN} AS mnx, MAX(n) {_C_WIN} AS mxx, "
    f"MIN(v_c) {_C_WIN} AS mny, MAX(v_c) {_C_WIN} AS mxy "
    "FROM c) "
    f"SELECT event_type, day, {_CORR_EXPR} AS rolling_corr FROM wst"
)


@query("events_rolling_corr", oracle=_ROLLCORR_ORACLE)
def events_rolling_corr(spark, sf_dir):
    """Trailing 14-day Pearson correlation between each type's daily
    event count and daily value total — does volume drive value? Same
    exact-sum doctrine as the z-score: six integer window sums, one
    shared float formula; degenerate windows (constant series, <3 days)
    yield NULL instead of engine-dependent NaN."""
    c = _daily(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-13, 0)
    )
    st = c.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(w).alias("k"),
        F.sum("n").over(w).alias("sx"),
        F.sum("v_c").over(w).alias("sy"),
        F.sum(F.expr("n * n")).over(w).alias("sxx"),
        F.sum(F.expr("v_c * v_c")).over(w).alias("syy"),
        F.sum(F.expr("n * v_c")).over(w).alias("sxy"),
        F.min("n").over(w).alias("mnx"),
        F.max("n").over(w).alias("mxx"),
        F.min("v_c").over(w).alias("mny"),
        F.max("v_c").over(w).alias("mxy"),
    )
    return st.select(
        "event_type", "day", F.expr(_CORR_EXPR).alias("rolling_corr")
    )


# --- per-type OLS trend ---------------------------------------------------

#: x = epoch day (exact int), y = daily value in whole currency units
#: (cents/100, rounded — keeps y^2 sums inside BIGINT at any realistic
#: SF). All five sums are exact integers; the closed-form OLS then runs
#: identical IEEE double ops in both engines. Integer differences
#: (k*Sxx - Sx^2 etc.) are computed IN BIGINT, so the classic
#: catastrophic-cancellation of naive one-pass OLS never happens.
#: datediff spelling differs (Spark: datediff(end, start); DuckDB:
#: datediff('day', start, end)) — each engine gets its own projection,
#: both producing the same exact epoch-day integer.
_OLS_PROJ_DUCK = (
    "SELECT event_type, "
    "CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS x, "
    "CAST(ROUND(CAST(v_c AS DOUBLE) / 100.0e0) AS BIGINT) AS y"
)

_OLS_EXPR_SLOPE = (
    "CASE WHEN k >= 2 AND (k * sxx - sx * sx) <> 0 THEN "
    + rnd(
        "CAST(k * sxy - sx * sy AS DOUBLE) / CAST(k * sxx - sx * sx AS DOUBLE)",
        6,
    )
    + " END"
)
_OLS_EXPR_R2 = (
    "CASE WHEN k >= 2 AND (k * sxx - sx * sx) <> 0 "
    "AND (k * syy - sy * sy) <> 0 THEN "
    + rnd(
        "(CAST(k * sxy - sx * sy AS DOUBLE) * CAST(k * sxy - sx * sy AS DOUBLE))"
        " / (CAST(k * sxx - sx * sx AS DOUBLE) * CAST(k * syy - sy * sy AS DOUBLE))",
        6,
    )
    + " END"
)

_OLS_ORACLE = (
    "WITH " + _DAILY_CTE + ", "
    "xy AS (" + _OLS_PROJ_DUCK + " FROM c), "
    "ols AS (SELECT event_type, COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy, "
    "SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy "
    "FROM xy GROUP BY event_type) "
    f"SELECT event_type, k AS n_days, {_OLS_EXPR_SLOPE} AS slope_per_day, "
    f"{_OLS_EXPR_R2} AS r2 FROM ols"
)


@query("events_value_trend_ols", oracle=_OLS_ORACLE)
def events_value_trend_ols(spark, sf_dir):
    """Least-squares trend of each type's daily value total: slope
    (currency units per day) and fit quality r^2, in closed form from
    five exact integer sums over the reduced daily frame. One
    |types|-key aggregate after the daily rollup — the regression
    itself adds zero shuffles, and the integer-difference formulation
    sidesteps the cancellation that makes naive one-pass OLS unstable."""
    c = _daily(spark, sf_dir)
    xy = c.select(
        "event_type",
        F.expr("CAST(datediff(day, DATE '1970-01-01') AS BIGINT)").alias("x"),
        F.expr("CAST(ROUND(CAST(v_c AS DOUBLE) / 100.0e0) AS BIGINT)").alias(
            "y"
        ),
    )
    s = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    return s.select(
        "event_type",
        F.col("k").alias("n_days"),
        F.expr(_OLS_EXPR_SLOPE).alias("slope_per_day"),
        F.expr(_OLS_EXPR_R2).alias("r2"),
    )


# --- activity profile & per-group top-k ----------------------------------


@query(
    "events_hour_profile",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + " "
        "SELECT (isodow(ts) - 1) AS dow, hour(ts) AS hod, "
        "COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users "
        "FROM events_t GROUP BY 1, 2"
    ),
)
def events_hour_profile(spark, sf_dir):
    """Activity heatmap by (day-of-week, hour-of-day): event and
    distinct-user counts per cell. Narrow date-part projection + one
    hash-agg over a fixed 168-cell key space — partial aggregation
    collapses before the exchange at any scale. Day-of-week is pinned
    to Monday=0 in both engines (Spark weekday == DuckDB isodow-1);
    the session-timezone-independent NTZ timestamp keeps the cells
    identical under hostile sessions."""
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.select(
            F.expr("weekday(ts)").alias("dow"),
            F.hour("ts").alias("hod"),
            "user_id",
        )
        .groupBy("dow", "hod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "events_top_days_per_type",
    oracle=(
        "WITH " + _DAILY_CTE + ", "
        "r AS (SELECT event_type, day, v_c, ROW_NUMBER() OVER ("
        "PARTITION BY event_type ORDER BY v_c DESC, day) AS rnk FROM c) "
        f"SELECT event_type, day, rnk, {money('v_c')} AS day_value "
        "FROM r WHERE rnk <= 3"
    ),
)
def events_top_days_per_type(spark, sf_dir):
    """Top-3 revenue days per event type — the per-group top-k pattern.
    Runs on the reduced daily frame; the rank window compiles to
    WindowGroupLimit, so each partition keeps a 3-row heap per group
    BEFORE the exchange — the shuffle never carries more than
    3 x |types| x partitions rows regardless of history length. Ties
    break on the day, so the pick is total-ordered in both engines."""
    c = _daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.desc("v_c"), "day")
    return (
        c.select(
            "event_type", "day", "v_c",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .select(
            "event_type", "day", "rnk",
            F.expr(money("v_c")).alias("day_value"),
        )
    )


# --- EWMA smoothing (recursive state, exact snapped fold) ------------------

#: alpha = 0.2 as an exact IEEE literal; state rides integer nano-units
#: and snaps (ROUND at scale 0 — the cross-engine-safe rounding, see
#: functions/exprs.py) after every step, so the left fold is bit-equal
#: in Spark and DuckDB despite being a float recursion.
_EWMA_STEP = "CAST(ROUND(0.2e0 * {x} + 0.8e0 * {s}) AS BIGINT)"

_EWMA_ORACLE = (
    "WITH RECURSIVE " + _DAILY_CTE + ", "
    "xs AS (SELECT event_type, day, "
    "CAST(ROUND(v_c * 1.0e7 / n) AS BIGINT) AS x, "
    "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i "
    "FROM c), "
    "r AS (SELECT event_type, day, i, x AS s FROM xs WHERE i = 1 "
    "UNION ALL SELECT x.event_type, x.day, x.i, "
    + _EWMA_STEP.format(x="x.x", s="r.s")
    + " FROM xs x JOIN r ON x.event_type = r.event_type "
    "AND x.i = r.i + 1) "
    "SELECT event_type, day, CAST(s AS DOUBLE) / 1.0e9 AS ewma FROM r"
)


@query("events_value_ewma", oracle=_EWMA_ORACLE)
def events_value_ewma(spark, sf_dir):
    """Exponentially-weighted moving average (alpha=0.2) of each type's
    daily mean value — the recursive-state smoother every monitoring
    dashboard wants (the reference plots raw observed points only,
    ref:streamlit/app.py:243-251).

    EWMA is inherently sequential IN TIME but embarrassingly parallel
    ACROSS series: the fold runs in-row over each type's collected
    daily series (`aggregate` HOF — Flink's keyed-process shape,
    pandas' groupby().ewm), so the only shuffle is the groupBy that
    built the daily frame. Series length is calendar-bounded (days),
    never fact-bounded, so the collected array stays tiny at any data
    scale. State snaps to integer nanos after every step; the oracle
    is a recursive CTE running the identical recursion — bit-equal.
    """
    c = _daily(spark, sf_dir)
    xs = c.select(
        "event_type",
        "day",
        F.expr("CAST(ROUND(v_c * 1.0e7 / n) AS BIGINT)").alias("x"),
    )
    step = _EWMA_STEP.format(x="e.x", s="element_at(acc, -1).s")
    fold = (
        "aggregate(sort_array(xs), "
        "CAST(array() AS ARRAY<STRUCT<day: DATE, s: BIGINT>>), "
        "(acc, e) -> concat(acc, array(named_struct("
        "'day', e.day, "
        "'s', CASE WHEN size(acc) = 0 THEN e.x ELSE " + step + " END))))"
    )
    return (
        xs.groupBy("event_type")
        .agg(F.expr("collect_list(struct(day, x))").alias("xs"))
        .select("event_type", F.explode(F.expr(fold)).alias("e"))
        .select(
            "event_type",
            F.col("e.day").alias("day"),
            F.expr("CAST(e.s AS DOUBLE) / 1.0e9").alias("ewma"),
        )
    )


# --- robust anomaly detection: median / MAD --------------------------------


@query(
    "events_anomaly_mad",
    oracle=(
        "WITH " + _DAILY_CTE + ", "
        "m AS (SELECT event_type, 2.0e0 * quantile_cont(n, 0.5e0) AS med2 "
        "FROM c GROUP BY event_type), "
        "d AS (SELECT c.event_type, c.day, c.n, "
        "ABS(2.0e0 * c.n - m.med2) AS d2 "
        "FROM c JOIN m ON c.event_type = m.event_type), "
        "md AS (SELECT event_type, 2.0e0 * quantile_cont(d2, 0.5e0) "
        "AS mad4 FROM d GROUP BY event_type) "
        "SELECT d.event_type, d.day, d.n, "
        "(2.0e0 * d.d2 > 3.0e0 * md.mad4) AS is_anomaly "
        "FROM d JOIN md ON d.event_type = md.event_type"
    ),
)
def events_anomaly_mad(spark, sf_dir):
    """Robust anomaly flags on daily event counts: a day is anomalous
    when its count sits more than 3 MADs from the per-type median —
    the outlier-resistant twin of `events_anomaly_zscore` (one wild
    day cannot drag the threshold the way it drags a mean/stddev).

    Exactness doctrine: counts are integers, so 2x the interpolated
    median ((a+b)/2 doubled = a+b) is an integer-valued double, as is
    every |2n - med2| deviation and its doubled median; the flag
    compares exactly-representable doubles — no rounding boundary
    exists in either engine. Two dimension-sized aggregate+broadcast
    joins over the reduced daily frame; the fact table is scanned
    once."""
    c = _daily(spark, sf_dir)
    m = c.groupBy("event_type").agg(
        F.expr("2.0e0 * percentile(n, 0.5e0)").alias("med2")
    )
    d = c.join(F.broadcast(m), "event_type").select(
        "event_type",
        "day",
        "n",
        F.expr("ABS(2.0e0 * n - med2)").alias("d2"),
    )
    md = d.groupBy("event_type").agg(
        F.expr("2.0e0 * percentile(d2, 0.5e0)").alias("mad4")
    )
    return d.join(F.broadcast(md), "event_type").select(
        "event_type",
        "day",
        "n",
        F.expr("2.0e0 * d2 > 3.0e0 * mad4").alias("is_anomaly"),
    )


# --- trailing-window distinct users (sliding COUNT DISTINCT) ---------------


@query(
    "events_trailing_distinct_users",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
        "FROM events_t), "
        "b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM du), "
        "x AS (SELECT user_id, CAST(unnest(generate_series("
        "CAST(day AS TIMESTAMP), CAST(day AS TIMESTAMP) + INTERVAL 6 DAY, "
        "INTERVAL 1 DAY)) AS DATE) AS day FROM du) "
        "SELECT x.day, COUNT(DISTINCT user_id) AS trailing_users "
        "FROM x CROSS JOIN b WHERE x.day BETWEEN b.d0 AND b.d1 "
        "GROUP BY x.day"
    ),
)
def events_trailing_distinct_users(spark, sf_dir):
    """Trailing-7-day distinct active users per day (the WAU curve) —
    COUNT(DISTINCT) over a sliding window, which SQL window frames
    cannot express (no DISTINCT in window aggregates in either engine).

    The spine-explode rewrite: each (user, day) observation is fanned
    to the <=7 window-end days it participates in, then one hash-agg
    per day distinct-counts users. Fan-out factor = window length (a
    constant), input is the already-distinct (user, day) frame (user x
    day cardinality, not event cardinality), so at 100 TB this is
    7x a dimension-sized frame — versus the naive per-day self-join
    which re-scans the fact table per window day. The bounds row is a
    broadcast single-row cross join, pruning spine days beyond the
    observed range."""
    ev = tables.load(spark, sf_dir, "events")
    du = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    b = du.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    x = du.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, date_add(day, 6), interval 1 day)")
        ).alias("day"),
    )
    return (
        x.join(F.broadcast(b))
        .filter(F.col("day").between(F.col("d0"), F.col("d1")))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("trailing_users"))
    )


# --- weekly seasonality index ---------------------------------------------


@query(
    "events_dow_seasonality",
    oracle=(
        "WITH " + _DAILY_CTE + ", "
        "d AS (SELECT event_type, dayofweek(day) + 1 AS dow, "
        "SUM(n) AS s_d, COUNT(*) AS days_d FROM c "
        "GROUP BY event_type, dayofweek(day) + 1), "
        "t AS (SELECT event_type, SUM(n) AS s_t, COUNT(*) AS days_t "
        "FROM c GROUP BY event_type) "
        "SELECT d.event_type, d.dow, "
        + rnd(
            "CAST(d.s_d AS DOUBLE) * t.days_t / t.s_t / d.days_d", 6
        )
        + " AS seasonal_index "
        "FROM d JOIN t ON d.event_type = t.event_type"
    ),
)
def events_dow_seasonality(spark, sf_dir):
    """Weekly seasonality index per event type: mean daily count on
    each day-of-week divided by the type's overall mean daily count
    (1.0 = flat; >1 = that weekday over-indexes) — the decomposition a
    forecasting pipeline runs before de-seasonalizing. All inputs are
    exact integer sums off the reduced daily frame; the index is one
    left-associated double expression snapped at 1e-6, identical in
    both engines. Day-of-week numbering is NOT portable — Spark's
    dayofweek is 1=Sunday, DuckDB's is 0=Sunday — so the oracle pins
    +1 explicitly (the same class of trap as list_position's
    null-vs-0, recorded in the F17+ battery)."""
    c = _daily(spark, sf_dir)
    d = c.groupBy(
        "event_type", F.dayofweek("day").alias("dow")
    ).agg(F.sum("n").alias("s_d"), F.count(F.lit(1)).alias("days_d"))
    t = c.groupBy("event_type").agg(
        F.sum("n").alias("s_t"), F.count(F.lit(1)).alias("days_t")
    )
    return d.join(F.broadcast(t), "event_type").select(
        "event_type",
        "dow",
        F.expr(
            rnd("CAST(s_d AS DOUBLE) * days_t / s_t / days_d", 6)
        ).alias("seasonal_index"),
    )


# --- CUSUM drift detection -------------------------------------------------

#: one-sided CUSUM in integer nano-units: s_i = max(0, s_{i-1} + x_i -
#: mu - k), alarm when s crosses h = 5*mu. With counts and a snapped
#: integer target the whole recursion is EXACT integer arithmetic —
#: no float appears anywhere, so cross-engine equality is structural.
_CUSUM_STEP = "GREATEST(CAST(0 AS BIGINT), {s} + {x} * 1000000000 - {mu} - {k})"

_CUSUM_ORACLE = (
    "WITH RECURSIVE " + _DAILY_CTE + ", "
    "m AS (SELECT event_type, "
    "CAST(ROUND(SUM(n) * 1.0e9 / COUNT(*)) AS BIGINT) AS mu_n "
    "FROM c GROUP BY event_type), "
    "xs AS (SELECT c.event_type, c.day, c.n, m.mu_n, "
    "CAST(m.mu_n // 4 AS BIGINT) AS k_n, "
    "ROW_NUMBER() OVER (PARTITION BY c.event_type ORDER BY c.day) AS i "
    "FROM c JOIN m ON c.event_type = m.event_type), "
    "r AS (SELECT event_type, day, i, mu_n, k_n, "
    + _CUSUM_STEP.format(s="CAST(0 AS BIGINT)", x="n", mu="mu_n", k="k_n")
    + " AS s FROM xs WHERE i = 1 "
    "UNION ALL SELECT x.event_type, x.day, x.i, x.mu_n, x.k_n, "
    + _CUSUM_STEP.format(s="r.s", x="x.n", mu="x.mu_n", k="x.k_n")
    + " FROM xs x JOIN r ON x.event_type = r.event_type "
    "AND x.i = r.i + 1) "
    "SELECT event_type, day, CAST(s AS DOUBLE) / 1.0e9 AS cusum, "
    "(s > 5 * mu_n) AS drift_alarm FROM r"
)


@query("events_cusum_drift", oracle=_CUSUM_ORACLE)
def events_cusum_drift(spark, sf_dir):
    """One-sided CUSUM drift detector on daily event counts: the
    running excess over (per-type mean + k) that a monitoring pipeline
    alarms on when a sustained upward shift accumulates — unlike the
    z-score/MAD flags (single-day outliers), CUSUM integrates small
    persistent drifts until they cross h = 5x the mean.

    Same execution shape as events_value_ewma (sequential in time,
    parallel across types, in-row fold over the collected daily
    series), but the recursion is PURE integer arithmetic — counts in
    nano-units against a snapped integer target — so no rounding step
    exists at all and the oracle's recursive CTE matches structurally.
    """
    c = _daily(spark, sf_dir)
    m = c.groupBy("event_type").agg(
        F.expr(
            "CAST(ROUND(SUM(n) * 1.0e9 / COUNT(*)) AS BIGINT)"
        ).alias("mu_n")
    )
    xs = c.join(F.broadcast(m), "event_type").select(
        "event_type",
        "day",
        "n",
        "mu_n",
        F.expr("CAST(mu_n DIV 4 AS BIGINT)").alias("k_n"),
    )
    step = _CUSUM_STEP.format(s="element_at(acc, -1).s", x="e.n", mu="mu_n", k="k_n")
    first = _CUSUM_STEP.format(s="CAST(0 AS BIGINT)", x="e.n", mu="mu_n", k="k_n")
    fold = (
        "aggregate(sort_array(xs), "
        "CAST(array() AS ARRAY<STRUCT<day: DATE, s: BIGINT>>), "
        "(acc, e) -> concat(acc, array(named_struct("
        "'day', e.day, "
        f"'s', CASE WHEN size(acc) = 0 THEN {first} ELSE {step} END))))"
    )
    return (
        xs.groupBy("event_type", "mu_n", "k_n")
        .agg(F.expr("collect_list(struct(day, n))").alias("xs"))
        .select(
            "event_type", "mu_n",
            F.explode(F.expr(fold)).alias("e"),
        )
        .select(
            "event_type",
            F.col("e.day").alias("day"),
            F.expr("CAST(e.s AS DOUBLE) / 1.0e9").alias("cusum"),
            F.expr("e.s > 5 * mu_n").alias("drift_alarm"),
        )
    )


# --- Holt linear-trend smoothing (two-state recursion) ---------------------

#: Holt's double exponential smoothing, alpha=0.2, beta=0.1, both exact
#: IEEE literals; level and trend ride integer nano-units and snap
#: (ROUND at 0) after every step. Two state variables thread the fold —
#: the pattern that generalizes the single-state EWMA/CUSUM recursions.
_HOLT_L = "CAST(ROUND(0.2e0 * {x} + 0.8e0 * ({l} + {b})) AS BIGINT)"
_HOLT_B = "CAST(ROUND(0.1e0 * ({l1} - {l}) + 0.9e0 * {b}) AS BIGINT)"

_HOLT_ORACLE = (
    "WITH RECURSIVE " + _DAILY_CTE + ", "
    "xs AS (SELECT event_type, day, "
    "CAST(ROUND(v_c * 1.0e7 / n) AS BIGINT) AS x, "
    "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i "
    "FROM c), "
    "nn AS (SELECT event_type, MAX(i) AS imax FROM xs GROUP BY event_type), "
    # anchor needs two points: l1 = x1, b1 = x2 - x1
    "r AS (SELECT a.event_type, a.day, a.i, a.x AS l, "
    "b2.x - a.x AS b FROM xs a JOIN xs b2 "
    "ON a.event_type = b2.event_type AND a.i = 1 AND b2.i = 2 "
    "UNION ALL SELECT x.event_type, x.day, x.i, "
    + _HOLT_L.format(x="x.x", l="r.l", b="r.b") + ", "
    + _HOLT_B.format(
        l1=_HOLT_L.format(x="x.x", l="r.l", b="r.b"), l="r.l", b="r.b"
    )
    + " FROM xs x JOIN r ON x.event_type = r.event_type "
    "AND x.i = r.i + 1) "
    "SELECT event_type, day, "
    "CAST(l AS DOUBLE) / 1.0e9 AS level, "
    "CAST(b AS DOUBLE) / 1.0e9 AS trend, "
    "CAST(l + b AS DOUBLE) / 1.0e9 AS forecast_next FROM r"
)


@query("events_holt_trend", oracle=_HOLT_ORACLE)
def events_holt_trend(spark, sf_dir):
    """Holt's linear-trend (double exponential) smoothing of each
    type's daily mean value: level + trend state per step and the
    one-step-ahead forecast (level + trend) — what a capacity-planning
    dashboard draws as the dotted projection line. Generalizes the
    EWMA fold to TWO state variables threaded through the same in-row
    snapped recursion (struct accumulator); the oracle's recursive CTE
    carries both columns. Anchor: l1 = x1, b1 = x2 - x1 (types with a
    single observed day have no defined trend and drop out via the
    two-point anchor join — same in both engines)."""
    c = _daily(spark, sf_dir)
    xs = c.select(
        "event_type",
        "day",
        F.expr("CAST(ROUND(v_c * 1.0e7 / n) AS BIGINT)").alias("x"),
    )
    lstep = _HOLT_L.format(
        x="e.x", l="element_at(acc, -1).l", b="element_at(acc, -1).b"
    )
    bstep = _HOLT_B.format(
        l1=lstep, l="element_at(acc, -1).l", b="element_at(acc, -1).b"
    )
    fold = (
        "aggregate(slice(sort_array(xs), 2, size(xs)), "
        "CAST(array(named_struct("
        "'day', sort_array(xs)[0].day, "
        "'l', sort_array(xs)[0].x, "
        "'b', sort_array(xs)[1].x - sort_array(xs)[0].x)) "
        "AS ARRAY<STRUCT<day: DATE, l: BIGINT, b: BIGINT>>), "
        "(acc, e) -> concat(acc, array(named_struct("
        f"'day', e.day, 'l', {lstep}, 'b', {bstep}))))"
    )
    return (
        xs.groupBy("event_type")
        .agg(F.expr("collect_list(struct(day, x))").alias("xs"))
        .filter(F.expr("size(xs) >= 2"))
        .select("event_type", F.explode(F.expr(fold)).alias("e"))
        .select(
            "event_type",
            F.col("e.day").alias("day"),
            F.expr("CAST(e.l AS DOUBLE) / 1.0e9").alias("level"),
            F.expr("CAST(e.b AS DOUBLE) / 1.0e9").alias("trend"),
            F.expr("CAST(e.l + e.b AS DOUBLE) / 1.0e9").alias(
                "forecast_next"
            ),
        )
    )


# --- gaps and islands: consecutive-day activity streaks --------------------


@query(
    "events_user_streaks",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
        "FROM events_t), "
        "grp AS (SELECT user_id, day, day - CAST(ROW_NUMBER() OVER ("
        "PARTITION BY user_id ORDER BY day) AS INTEGER) AS island "
        "FROM du), "
        "runs AS (SELECT user_id, COUNT(*) AS run_len "
        "FROM grp GROUP BY user_id, island), "
        "best AS (SELECT user_id, MAX(run_len) AS best_streak "
        "FROM runs GROUP BY user_id) "
        "SELECT best_streak, COUNT(*) AS n_users FROM best "
        "GROUP BY best_streak"
    ),
)
def events_user_streaks(spark, sf_dir):
    """Longest consecutive-day activity streak per user, reported as a
    distribution — the gaps-and-islands pattern (the day-grain sibling
    of timestamp sessionization): day minus its per-user row_number is
    constant exactly within a run of consecutive days, so one window +
    two hash-aggs find every island without self-joins or recursion.

    All arithmetic is date-minus-integer (exact); the only exchange is
    the user_id window partition, then island/user aggregates reuse
    user-keyed partitioning. Input is the distinct (user, day) frame —
    user x day cardinality, never event cardinality."""
    ev = tables.load(spark, sf_dir, "events")
    du = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    grp = du.select(
        "user_id",
        "day",
        F.expr(
            "date_sub(day, CAST(ROW_NUMBER() OVER ("
            "PARTITION BY user_id ORDER BY day) AS INT))"
        ).alias("island"),
    )
    runs = grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    best = runs.groupBy("user_id").agg(
        F.max("run_len").alias("best_streak")
    )
    return best.groupBy("best_streak").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# --- Holt-Winters additive seasonal smoothing (three-state recursion) -------

#: alpha=0.2 level, beta=0.1 trend, gamma=0.3 season, period m=7; all
#: state in integer nano-units, snapped (ROUND at 0) after every step.
#: {sj} is the season slot for the CURRENT observation; {l1} the freshly
#: computed level (inlined where referenced — the recomputation is the
#: same IEEE expression, so snapping keeps both engines identical).
_HW_L = "CAST(ROUND(0.2e0 * ({x} - {sj}) + 0.8e0 * ({l} + {b})) AS BIGINT)"
_HW_B = "CAST(ROUND(0.1e0 * ({l1} - {l}) + 0.9e0 * {b}) AS BIGINT)"
_HW_S = "CAST(ROUND(0.3e0 * ({x} - {l1}) + 0.7e0 * {sj}) AS BIGINT)"
_HW_M = 7


def _hw_oracle() -> str:
    j = f"((x.i - 1) % {_HW_M}) + 1"
    sj = f"r.s[{j}]"
    l1 = _HW_L.format(x="x.x", sj=sj, l="r.l", b="r.b")
    b1 = _HW_B.format(l1=l1, l="r.l", b="r.b")
    s1 = _HW_S.format(x="x.x", l1=l1, sj=sj)
    jo = f"((i - 1) % {_HW_M}) + 1"
    jn = f"(i % {_HW_M}) + 1"
    return (
        "WITH RECURSIVE " + _DAILY_CTE + ", "
        "xs AS (SELECT event_type, day, "
        "CAST(ROUND(v_c * 1.0e7 / n) AS BIGINT) AS x, "
        "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i "
        "FROM c), "
        "i0 AS (SELECT event_type, "
        f"CAST(ROUND(SUM(CASE WHEN i <= {_HW_M} THEN x END) / {_HW_M}.0e0)"
        " AS BIGINT) AS l0, MAX(i) AS imax FROM xs GROUP BY event_type), "
        "anchor AS (SELECT xs.event_type, MAX(xs.day) AS day, "
        f"{_HW_M} AS i, i0.l0 AS l, CAST(0 AS BIGINT) AS b, "
        "list(xs.x - i0.l0 ORDER BY xs.i) AS s "
        f"FROM xs JOIN i0 USING (event_type) WHERE xs.i <= {_HW_M} "
        f"AND i0.imax > {_HW_M} GROUP BY xs.event_type, i0.l0), "
        "r AS (SELECT * FROM anchor "
        "UNION ALL SELECT x.event_type, x.day, x.i, "
        f"{l1} AS l, {b1} AS b, "
        f"list_concat(list_concat(list_slice(r.s, 1, {j} - 1), [{s1}]), "
        f"list_slice(r.s, {j} + 1, {_HW_M})) AS s "
        "FROM xs x JOIN r ON x.event_type = r.event_type "
        "AND x.i = r.i + 1) "
        "SELECT event_type, day, "
        "CAST(l AS DOUBLE) / 1.0e9 AS level, "
        "CAST(b AS DOUBLE) / 1.0e9 AS trend, "
        f"CAST(s[{jo}] AS DOUBLE) / 1.0e9 AS season, "
        f"CAST(l + b + s[{jn}] AS DOUBLE) / 1.0e9 AS forecast_next "
        f"FROM r WHERE i > {_HW_M}"
    )


@query("events_holt_winters", oracle=_hw_oracle())
def events_holt_winters(spark, sf_dir):
    """Holt-Winters ADDITIVE seasonal smoothing (period 7) of each
    type's daily mean value: level + trend + a seven-slot seasonal
    state threaded through one in-row snapped fold — the recursion
    family's summit (EWMA: one state; CUSUM: one integer state; Holt:
    two; here: nine, two scalars plus the season array), and the model
    the weekly cycle events_dow_seasonality MEASURES actually wants
    fitted. Anchor: level = mean of the first week, trend = 0, season
    slot j = x_j - level; recursion starts at day 8; forecast_next adds
    the NEXT day's season slot. The oracle's recursive CTE carries the
    seasonal LIST through list_slice surgery — bit-equal to the Spark
    transform() update because every component snaps to integer
    nano-units after every step. Types with <= 7 observed days have no
    anchored season and drop out in both engines."""
    c = _daily(spark, sf_dir)
    xs = c.select(
        "event_type",
        "day",
        F.expr("CAST(ROUND(v_c * 1.0e7 / n) AS BIGINT)").alias("x"),
    )
    # 0-based inside Spark lambdas: element_at is 1-based, transform
    # index k is 0-based; i rides in the accumulator struct
    j1 = f"((element_at(acc, -1).i + 1 - 1) % {_HW_M}) + 1"  # 1-based slot
    sj = f"element_at(element_at(acc, -1).s, {j1})"
    l1 = _HW_L.format(x="e.x", sj=sj, l="element_at(acc, -1).l",
                      b="element_at(acc, -1).b")
    b1 = _HW_B.format(l1=l1, l="element_at(acc, -1).l",
                      b="element_at(acc, -1).b")
    s1 = _HW_S.format(x="e.x", l1=l1, sj=sj)
    week = f"slice(sort_array(xs), 1, {_HW_M})"
    l0 = (
        "CAST(ROUND(aggregate(" + week + ", CAST(0 AS BIGINT), "
        f"(a, e) -> a + e.x) / {_HW_M}.0e0) AS BIGINT)"
    )
    fold = (
        f"aggregate(slice(sort_array(xs), {_HW_M} + 1, size(xs)), "
        "CAST(array(named_struct("
        f"'day', sort_array(xs)[{_HW_M} - 1].day, "
        f"'i', {_HW_M}, "
        f"'l', {l0}, "
        "'b', CAST(0 AS BIGINT), "
        f"'s', transform({week}, e -> e.x - {l0}))) "
        "AS ARRAY<STRUCT<day: DATE, i: INT, l: BIGINT, b: BIGINT, "
        "s: ARRAY<BIGINT>>>), "
        "(acc, e) -> concat(acc, array(named_struct("
        "'day', e.day, "
        "'i', element_at(acc, -1).i + 1, "
        f"'l', {l1}, "
        f"'b', {b1}, "
        f"'s', transform(element_at(acc, -1).s, (v, k) -> "
        f"IF(k = {j1} - 1, {s1}, v))))))"
    )
    jo = f"((e.i - 1) % {_HW_M}) + 1"
    jn = f"(e.i % {_HW_M}) + 1"
    return (
        xs.groupBy("event_type")
        .agg(F.expr("collect_list(struct(day, x))").alias("xs"))
        .filter(F.expr(f"size(xs) > {_HW_M}"))
        .select("event_type", F.explode(F.expr(fold)).alias("e"))
        .filter(F.expr(f"e.i > {_HW_M}"))
        .select(
            "event_type",
            F.col("e.day").alias("day"),
            F.expr("CAST(e.l AS DOUBLE) / 1.0e9").alias("level"),
            F.expr("CAST(e.b AS DOUBLE) / 1.0e9").alias("trend"),
            F.expr(
                f"CAST(element_at(e.s, {jo}) AS DOUBLE) / 1.0e9"
            ).alias("season"),
            F.expr(
                f"CAST(e.l + e.b + element_at(e.s, {jn}) AS DOUBLE) "
                "/ 1.0e9"
            ).alias("forecast_next"),
        )
    )


# --- Holt forecast backtest ------------------------------------------------

#: APE term in integer 1e-6 units: forecast f = l + h*b (nano-units)
#: vs actual x (nano-units), both exact integers at evaluation time
_APE_U = (
    "CAST(ROUND(ABS(CAST({f} AS DOUBLE) - {x}) / CAST({x} AS DOUBLE) "
    "* 1.0e6) AS BIGINT)"
)

_BACKTEST_ORACLE = (
    "WITH RECURSIVE " + _DAILY_CTE + ", "
    "xs AS (SELECT event_type, day, "
    "CAST(ROUND(v_c * 1.0e7 / n) AS BIGINT) AS x, "
    "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i "
    "FROM c), "
    "nn AS (SELECT event_type, MAX(i) AS imax, "
    "GREATEST(2, (4 * MAX(i)) // 5) AS cut FROM xs GROUP BY event_type), "
    "r AS (SELECT a.event_type, a.i, a.x AS l, b2.x - a.x AS b "
    "FROM xs a JOIN xs b2 "
    "ON a.event_type = b2.event_type AND a.i = 1 AND b2.i = 2 "
    "UNION ALL SELECT x.event_type, x.i, "
    + _HOLT_L.format(x="x.x", l="r.l", b="r.b") + ", "
    + _HOLT_B.format(
        l1=_HOLT_L.format(x="x.x", l="r.l", b="r.b"), l="r.l", b="r.b"
    )
    + " FROM xs x JOIN r ON x.event_type = r.event_type "
    "AND x.i = r.i + 1 "
    "JOIN nn ON nn.event_type = x.event_type AND x.i <= nn.cut), "
    "st AS (SELECT r.event_type, r.l, r.b, nn.cut, nn.imax FROM r "
    "JOIN nn ON nn.event_type = r.event_type AND r.i = nn.cut), "
    "te AS (SELECT xs.event_type, xs.i - st.cut AS h, xs.x, "
    "st.l + (xs.i - st.cut) * st.b AS f "
    "FROM xs JOIN st ON st.event_type = xs.event_type "
    "AND xs.i > st.cut) "
    "SELECT event_type, COUNT(*) AS n_test, "
    + rnd(
        "CAST(SUM(" + _APE_U.format(f="f", x="x") + ") AS DOUBLE) "
        "/ (1.0e4 * COUNT(*))",
        4,
    )
    + " AS mape_pct FROM te GROUP BY event_type"
)


@query("events_holt_backtest", oracle=_BACKTEST_ORACLE)
def events_holt_backtest(spark, sf_dir):
    """Forecast BACKTEST for the Holt linear-trend model: fit on the
    first 80% of each type's daily series, freeze the (level, trend)
    state at the cutoff, project the multi-step forecast l + h*b across
    the held-out tail, and report per-type MAPE — the out-of-sample
    loop-closer for the smoothing family (events_holt_trend FITS; this
    answers 'how wrong is it h days out'), same eval discipline as
    events_markov_eval. The train fold carries ONLY the running
    (l, b) struct (no history array — O(1) fold state); the holdout
    join is per-type state broadcast onto the test rows; APE terms
    snap to 1e-6 integer units before the exact mean."""
    c = _daily(spark, sf_dir)
    xs = c.select(
        "event_type",
        "day",
        F.expr("CAST(ROUND(v_c * 1.0e7 / n) AS BIGINT)").alias("x"),
    )
    lstep = _HOLT_L.format(x="e.x", l="acc.l", b="acc.b")
    bstep = _HOLT_B.format(l1=lstep, l="acc.l", b="acc.b")
    cut = "GREATEST(2, (4 * size(xs)) DIV 5)"
    fold = (
        f"aggregate(slice(sort_array(xs), 2, {cut} - 1), "
        "named_struct("
        "'l', sort_array(xs)[0].x, "
        "'b', sort_array(xs)[1].x - sort_array(xs)[0].x), "
        "(acc, e) -> named_struct("
        f"'l', {lstep}, 'b', {bstep}))"
    )
    st = (
        xs.groupBy("event_type")
        .agg(F.expr("collect_list(struct(day, x))").alias("xs"))
        .filter(F.expr(f"size(xs) > {cut}"))
        .select(
            "event_type",
            F.expr(f"{fold}.l").alias("l"),
            F.expr(f"{fold}.b").alias("b"),
            F.expr(cut).alias("cut"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    xi = xs.withColumn("i", F.row_number().over(w))
    te = xi.join(F.broadcast(st), "event_type").filter(
        F.col("i") > F.col("cut")
    ).select(
        "event_type",
        "x",
        (F.col("l") + (F.col("i") - F.col("cut")) * F.col("b")).alias("f"),
    )
    return te.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.expr(
            rnd(
                "CAST(SUM(" + _APE_U.format(f="f", x="x") + ") AS DOUBLE)"
                " / (1.0e4 * COUNT(*))",
                4,
            )
        ).alias("mape_pct"),
    )


# --- classical seasonal decomposition (trend / seasonal / residual) -------

def _stl_core(src: str, dow: str) -> str:
    """CTE chain of the decomposition up to per-weekday seasonal values
    (shared by the decomposition output and the ESD anomaly screen)."""
    return (
        "daily AS (SELECT CAST(ts AS DATE) AS d, "
        "SUM(CAST(ROUND(value * 100.0e0) AS BIGINT)) AS y "
        f"FROM {src} GROUP BY CAST(ts AS DATE)), "
        "tr AS (SELECT d, y, "
        "SUM(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)"
        " AS t7, "
        "COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)"
        " AS c7 FROM daily), "
        f"core AS (SELECT d, {dow} AS k, y, t7, 7 * y - t7 AS dn "
        "FROM tr WHERE c7 = 7), "
        "dw AS (SELECT k, SUM(dn) AS s_num, COUNT(*) AS s_cnt "
        "FROM core GROUP BY k), "
        "sb AS (SELECT SUM(CAST(s_num AS DOUBLE) / (7.0e0 * s_cnt)) "
        "/ COUNT(*) AS sbar FROM dw), "
        "seas AS (SELECT k, CAST(s_num AS DOUBLE) / (7.0e0 * s_cnt) - sbar"
        " AS s FROM dw CROSS JOIN sb)"
    )


def _stl_sql(src: str, dow: str) -> str:
    """Shared decomposition text from the daily frame onward. `dow` is the
    engine's 0=Monday day-of-week spelling (the only dialect difference).

    Exactness: daily totals are integer cents; the centered 7-day trend is
    carried as its integer numerator t7 (value = t7/7), so the detrended
    series has exact integer numerator dn = 7*y - t7. Per-weekday seasonal
    means and their grand-centering then run ONCE over a 7-row frame in
    DOUBLE with identical expression text — one deterministic IEEE
    evaluation per weekday, snapped at the output edge."""
    return (
        _stl_core(src, dow)
        + " SELECT d, CAST(y AS DOUBLE) / 100.0e0 AS daily_total, "
        + rnd("CAST(t7 AS DOUBLE) / 700.0e0", 4)
        + " AS trend, "
        + rnd("s / 100.0e0", 4)
        + " AS seasonal, "
        + rnd(
            "CAST(y AS DOUBLE) / 100.0e0 - CAST(t7 AS DOUBLE) / 700.0e0"
            " - s / 100.0e0",
            4,
        )
        + " AS residual FROM core JOIN seas USING (k)"
    )


@query(
    "events_stl_decompose",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        + _stl_sql("events_t", "(isodow(d) - 1)")
    ),
)
def events_stl_decompose(spark, sf_dir):
    """Classical additive decomposition of the daily revenue series —
    trend (centered 7-day moving average), weekly seasonal (per-weekday
    mean of the detrended series, grand-centered), residual. The
    statsmodels `seasonal_decompose` capability the reference's pandas
    layer would reach for, expressed as: one map-combined daily
    aggregate (the only row-cardinality shuffle), one window pass over
    the day frame (domain-bounded — days, not events), a 7-row seasonal
    aggregate broadcast back. Interior days only (full 7-day window),
    so the decomposition identity holds exactly on every output row."""
    tables.load(spark, sf_dir, "events").createOrReplaceTempView("ts_events")
    return spark.sql("WITH " + _stl_sql("ts_events", "weekday(d)"))


# --- Theil-Sen robust trend --------------------------------------------------

def _theilsen_sql(src: str) -> str:
    """Shared text: daily totals -> indexed frame -> all-pairs slopes ->
    lower-median pick. Slopes are one float division per pair of exact
    integers (identical IEEE both engines); the median is a rank pick
    (lower median — no averaging, so no second float op), totally
    ordered by (slope, i, j) for a deterministic choice among equal
    slopes."""
    return (
        "daily AS (SELECT CAST(ts AS DATE) AS d, "
        "SUM(CAST(ROUND(value * 100.0e0) AS BIGINT)) AS y "
        f"FROM {src} GROUP BY CAST(ts AS DATE)), "
        "idx AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, y FROM daily), "
        "pairs AS (SELECT a.i AS i, b.i AS j, "
        "CAST(b.y - a.y AS DOUBLE) / (b.i - a.i) AS slope "
        "FROM idx a JOIN idx b ON b.i > a.i), "
        "ranked AS (SELECT slope, ROW_NUMBER() OVER "
        "(ORDER BY slope, i, j) AS rn, COUNT(*) OVER () AS np FROM pairs) "
        "SELECT (SELECT COUNT(*) FROM idx) AS n_days, "
        "CAST(np AS BIGINT) AS n_pairs, "
        + rnd("slope / 100.0e0", 4)
        + " AS theilsen_slope_dollars_per_day "
        "FROM ranked WHERE rn = CAST(floor((np + 1) / 2.0e0) AS BIGINT)"
    )


@query(
    "events_theilsen_trend",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        + _theilsen_sql("events_t")
    ),
)
def events_theilsen_trend(spark, sf_dir):
    """Theil-Sen estimator of the daily-revenue trend: the median of all
    pairwise slopes — robust to ~29% outlier days, where the OLS slope
    (events_value_trend_ols) is pulled by any single spike. The pair
    enumeration is over the DAILY frame (days^2 pairs, domain-bounded —
    never fact-row pairs), so the self-join is a few-MB broadcast at any
    event volume; the only row-cardinality work is the one daily
    aggregate."""
    tables.load(spark, sf_dir, "events").createOrReplaceTempView("ts_events")
    return spark.sql("WITH " + _theilsen_sql("ts_events"))


# --- single-changepoint detection by SSE reduction ---------------------------

def _cpt_sql(src: str) -> str:
    """Shared text: prefix sums of daily cents and squared cents make
    each candidate split's two-segment SSE a closed-form float over
    exact integers; argmax by (reduction DESC, day ASC) — both engines
    evaluate bit-identical doubles from identical integer inputs, so the
    ordering agrees. Squared-cents prefix sums ride DECIMAL(38,0)
    (daily-total^2 exceeds int64 headroom once daily revenue passes
    ~3e9 cents)."""
    return (
        "daily AS (SELECT CAST(ts AS DATE) AS d, "
        "SUM(CAST(ROUND(value * 100.0e0) AS BIGINT)) AS y "
        f"FROM {src} GROUP BY CAST(ts AS DATE)), "
        "pre AS (SELECT d, ROW_NUMBER() OVER (ORDER BY d) AS t, "
        "SUM(CAST(y AS DECIMAL(38,0))) OVER (ORDER BY d) AS p, "
        "SUM(CAST(y AS DECIMAL(38,0)) * y) OVER (ORDER BY d) AS q, "
        "COUNT(*) OVER () AS n, "
        "SUM(CAST(y AS DECIMAL(38,0))) OVER () AS ptot, "
        "SUM(CAST(y AS DECIMAL(38,0)) * y) OVER () AS qtot FROM daily), "
        "cand AS (SELECT d, t, "
        "CAST(qtot AS DOUBLE) - CAST(ptot AS DOUBLE) * ptot / n "
        "- ((CAST(q AS DOUBLE) - CAST(p AS DOUBLE) * p / t) "
        "+ ((CAST(qtot AS DOUBLE) - q) "
        "- (CAST(ptot AS DOUBLE) - p) * (CAST(ptot AS DOUBLE) - p) "
        "/ (n - t))) AS reduction, "
        "CAST(p AS DOUBLE) / (100.0e0 * t) AS left_mean, "
        "(CAST(ptot AS DOUBLE) - p) / (100.0e0 * (n - t)) AS right_mean, "
        "CAST(qtot AS DOUBLE) - CAST(ptot AS DOUBLE) * ptot / n AS sst "
        "FROM pre WHERE t < n) "
        "SELECT d AS split_day, "
        + rnd("sst / 1.0e4", 2) + " AS sst_dollars2, "
        + rnd("reduction / 1.0e4", 2) + " AS sse_reduction_dollars2, "
        + rnd("left_mean", 2) + " AS left_mean_dollars, "
        + rnd("right_mean", 2) + " AS right_mean_dollars "
        "FROM cand ORDER BY reduction DESC, d ASC LIMIT 1"
    )


@query(
    "events_changepoint_sse",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", " + _cpt_sql("events_t")
    ),
)
def events_changepoint_sse(spark, sf_dir):
    """Single-changepoint detection on daily revenue: the split that
    maximally reduces two-segment SSE vs the global fit (binary
    segmentation's first step / CUSUM's offline twin — events_cusum_drift
    is the online form). Prefix sums over the day frame make every
    candidate split O(1), the whole scan of candidates one window pass;
    daily aggregation is again the only row-cardinality shuffle. Left /
    right segment means document WHAT changed at the detected break."""
    tables.load(spark, sf_dir, "events").createOrReplaceTempView("ts_events")
    return spark.sql("WITH " + _cpt_sql("ts_events"))


# --- Holt smoothing grid search (self-evaluation doctrine) ----------------

#: one smoothing step + running one-step-ahead squared error, shared
#: shape between the Spark fold and the oracle's recursive CTE. State
#: rides (level, trend, sse) — level/trend in snapped 1e9-units, the
#: error snapped to milli-dollars BEFORE squaring so the running sum
#: stays well inside BIGINT (md^2 ~ 1e12 for a $1000 miss).
_HG_L = "CAST(ROUND({a} * {x} + (1.0e0 - {a}) * ({l} + {b})) AS BIGINT)"
_HG_B = (
    "CAST(ROUND({bt} * ({l1} - {l}) + (1.0e0 - {bt}) * {b}) AS BIGINT)"
)
_HG_E = "CAST(ROUND(({l} + {b} - {x}) / 1.0e6) AS BIGINT)"

_HG_GRID = "(VALUES (0.2e0, 0.1e0), (0.5e0, 0.1e0), (0.8e0, 0.1e0), (0.5e0, 0.3e0))"


def _hg_oracle() -> str:
    lstep = _HG_L.format(a="r.alpha", x="x.x", l="r.l", b="r.b")
    bstep = _HG_B.format(bt="r.beta", l1=lstep, l="r.l", b="r.b")
    estep = _HG_E.format(l="r.l", b="r.b", x="x.x")
    return (
        "WITH RECURSIVE " + _DAILY_CTE + ", "
        "xs AS (SELECT event_type, day, "
        "CAST(ROUND(v_c * 1.0e7 / n) AS BIGINT) AS x, "
        "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i "
        "FROM c), "
        f"grid(alpha, beta) AS {_HG_GRID}, "
        "nn AS (SELECT event_type, MAX(i) AS imax FROM xs "
        "GROUP BY event_type), "
        "r AS (SELECT a.event_type, g.alpha, g.beta, a.i, a.x AS l, "
        "b2.x - a.x AS b, CAST(0 AS BIGINT) AS s "
        "FROM xs a JOIN xs b2 ON a.event_type = b2.event_type "
        "AND a.i = 1 AND b2.i = 2 CROSS JOIN grid g "
        "UNION ALL SELECT x.event_type, r.alpha, r.beta, x.i, "
        f"{lstep}, {bstep}, r.s + {estep} * {estep} "
        "FROM xs x JOIN r ON x.event_type = r.event_type "
        "AND x.i = r.i + 1) "
        "SELECT event_type, alpha, beta, sse_dollars2, "
        "CASE WHEN RANK() OVER (PARTITION BY event_type "
        "ORDER BY s, alpha, beta) = 1 THEN 1 ELSE 0 END AS is_best "
        "FROM (SELECT r.event_type, r.alpha, r.beta, r.s, "
        "CAST(r.s AS DOUBLE) / 1.0e6 AS sse_dollars2 "
        "FROM r JOIN nn ON r.event_type = nn.event_type "
        "AND r.i = nn.imax) t"
    )


@query("events_holt_gridsearch", oracle=_hg_oracle())
def events_holt_gridsearch(spark, sf_dir):
    """Holt smoothing-parameter grid search, measured: one-step-ahead
    SSE of four (alpha, beta) configs per event type, best flagged.
    The self-evaluation doctrine applied to forecasting — you price the
    smoothing constants on the actual series BEFORE trusting the
    projection (events_holt_backtest then validates the winner
    out-of-sample). Each config is the same in-row snapped fold as
    events_holt_trend with the error accumulated as a third state
    component, so the whole 4-config grid is ONE aggregate over the
    grid-crossed daily frame (days x 4 rows, domain-bounded) — no
    per-config rescans of the fact table."""
    c = _daily(spark, sf_dir)
    xs = c.select(
        "event_type",
        "day",
        F.expr("CAST(ROUND(v_c * 1.0e7 / n) AS BIGINT)").alias("x"),
    )
    grid = spark.sql(f"SELECT * FROM {_HG_GRID} AS grid(alpha, beta)")
    lstep = _HG_L.format(a="alpha", x="e.x", l="acc.l", b="acc.b")
    bstep = _HG_B.format(bt="beta", l1=lstep, l="acc.l", b="acc.b")
    estep = _HG_E.format(l="acc.l", b="acc.b", x="e.x")
    fold = (
        "aggregate(slice(sort_array(xs), 2, size(xs)), "
        "CAST(named_struct("
        "'l', sort_array(xs)[0].x, "
        "'b', sort_array(xs)[1].x - sort_array(xs)[0].x, "
        "'s', 0) AS STRUCT<l: BIGINT, b: BIGINT, s: BIGINT>), "
        "(acc, e) -> named_struct("
        f"'l', {lstep}, 'b', {bstep}, 's', acc.s + {estep} * {estep}))"
    )
    folded = (
        xs.groupBy("event_type")
        .agg(F.expr("collect_list(struct(day, x))").alias("xs"))
        .filter(F.expr("size(xs) >= 2"))
        .join(F.broadcast(grid))
        .select(
            "event_type",
            "alpha",
            "beta",
            F.expr(fold + ".s").alias("s"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("s", "alpha", "beta")
    return folded.select(
        "event_type",
        "alpha",
        "beta",
        F.expr("CAST(s AS DOUBLE) / 1.0e6").alias("sse_dollars2"),
        F.when(F.rank().over(w) == 1, F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_best"),
    )

# --- robust anomaly screen on the deseasonalized residuals -----------------

def _esd_sql(src: str, dow: str) -> str:
    """Shared text: STL core -> integer micro-unit residuals -> robust
    (median/MAD) z-scores -> days with |z| > 3. Medians are lower-median
    rank picks over the day frame (total order: value then day), so no
    float averaging exists anywhere before the one z formula."""
    return (
        _stl_core(src, dow) + ", "
        "res AS (SELECT d, CAST(ROUND((CAST(y AS DOUBLE) / 100.0e0 "
        "- CAST(t7 AS DOUBLE) / 700.0e0 - s / 100.0e0) * 1.0e6) AS BIGINT)"
        " AS ru FROM core JOIN seas USING (k)), "
        "mr AS (SELECT ru AS med_u FROM ("
        "SELECT ru, ROW_NUMBER() OVER (ORDER BY ru, d) AS rn, "
        "COUNT(*) OVER () AS n FROM res) t "
        "WHERE rn = CAST(floor((n + 1) / 2.0e0) AS BIGINT)), "
        "dev AS (SELECT d, ru, "
        "ABS(ru - (SELECT med_u FROM mr)) AS du FROM res), "
        "mad AS (SELECT du AS mad_u FROM ("
        "SELECT du, ROW_NUMBER() OVER (ORDER BY du, d) AS rn, "
        "COUNT(*) OVER () AS n FROM dev) t "
        "WHERE rn = CAST(floor((n + 1) / 2.0e0) AS BIGINT)), "
        "z AS (SELECT d, ru, "
        "0.6745e0 * (ru - (SELECT med_u FROM mr)) "
        "/ (SELECT mad_u FROM mad) AS zz FROM res) "
        "SELECT d AS day, "
        "(CAST(ru AS DOUBLE) / 1.0e6) AS residual, "
        + rnd("zz", 4) + " AS robust_z, "
        "CASE WHEN ABS(zz) > 3.0e0 THEN 1 ELSE 0 END AS is_anomaly "
        "FROM z ORDER BY ABS(zz) DESC, d LIMIT 5"
    )


@query(
    "events_seasonal_esd",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        + _esd_sql("events_t", "(isodow(d) - 1)")
    ),
)
def events_seasonal_esd(spark, sf_dir):
    """Seasonal-robust anomaly screen (Twitter S-H-ESD shape): remove
    trend + weekly seasonality via the shared STL core, then rank days
    by residual robust z-score (median/MAD, 0.6745 consistency factor):
    top-5 shown, |z| > 3 flagged — catches anomalies raw z-scores miss
    on sloped or weekly-patterned data and refuses the false positives
    they raise every weekend. Residuals snap to integer micro-units;
    both medians are deterministic lower-median rank picks; the one
    float z formula runs on exact integers. Same plan skeleton as the
    decomposition: one row-cardinality daily aggregate, then day-frame
    windows."""
    tables.load(spark, sf_dir, "events").createOrReplaceTempView("ts_events")
    return spark.sql("WITH " + _esd_sql("ts_events", "weekday(d)"))


# --- hierarchical forecast reconciliation ---------------------------------

def _fr_oracle() -> str:
    lstep = _HOLT_L.format(x="x.x", l="r.l", b="r.b")
    bstep = _HOLT_B.format(l1=lstep, l="r.l", b="r.b")
    return (
        "WITH RECURSIVE " + tables.EVENTS_ORACLE_CTE + ", "
        "c AS (SELECT event_type, CAST(ts AS DATE) AS day, "
        "SUM(CAST(ROUND(value * 100.0e0) AS BIGINT)) AS x "
        "FROM events_t GROUP BY event_type, CAST(ts AS DATE)), "
        "u AS (SELECT event_type, day, x FROM c "
        "UNION ALL SELECT 'TOTAL' AS event_type, day, SUM(x) AS x "
        "FROM c GROUP BY day), "
        "xs AS (SELECT event_type, day, x, ROW_NUMBER() OVER "
        "(PARTITION BY event_type ORDER BY day) AS i FROM u), "
        "nn AS (SELECT event_type, MAX(i) AS imax FROM xs "
        "GROUP BY event_type), "
        "r AS (SELECT a.event_type, a.i, a.x AS l, b2.x - a.x AS b "
        "FROM xs a JOIN xs b2 ON a.event_type = b2.event_type "
        "AND a.i = 1 AND b2.i = 2 "
        f"UNION ALL SELECT x.event_type, x.i, {lstep}, {bstep} "
        "FROM xs x JOIN r ON x.event_type = r.event_type "
        "AND x.i = r.i + 1), "
        "fin AS (SELECT r.event_type, r.l + r.b AS f FROM r "
        "JOIN nn ON r.event_type = nn.event_type AND r.i = nn.imax), "
        "base AS (SELECT event_type, f FROM fin "
        "WHERE event_type <> 'TOTAL') "
        "SELECT event_type, "
        "CAST(f AS DOUBLE) / 100.0e0 AS base_forecast, "
        "CAST(CAST(ROUND(CAST(f AS DOUBLE) "
        "* (SELECT f FROM fin WHERE event_type = 'TOTAL') "
        "/ (SELECT SUM(f) FROM base)) AS BIGINT) AS DOUBLE) / 100.0e0 "
        "AS reconciled_forecast, "
        + rnd("CAST(f AS DOUBLE) / (SELECT SUM(f) FROM base)", 6)
        + " AS share FROM base"
    )


@query("events_forecast_reconcile", oracle=_fr_oracle())
def events_forecast_reconcile(spark, sf_dir):
    """Hierarchical forecast reconciliation (top-down proportional): Holt
    one-step forecasts for every event type AND the total series, then
    each type's forecast is rescaled so the hierarchy is coherent
    (children sum to the parent — base forecasts never do, because each
    smoothing ran independently). The aggregate-planning discipline on
    top of events_holt_trend: capacity is provisioned off the TOTAL
    forecast while per-type plans must add up to it. One daily
    aggregate, a types+1-group snapped fold, and two scalar broadcasts;
    forecasts stay integer cents so the reconciliation rounding is the
    only non-integer step."""
    ev = tables.load(spark, sf_dir, "events")
    c = materialize(
        ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
            F.sum(
                F.expr("CAST(ROUND(value * 100.0e0) AS BIGINT)")
            ).alias("x")
        )
    )
    u = c.unionByName(
        c.groupBy("day").agg(F.sum("x").alias("x")).select(
            F.lit("TOTAL").alias("event_type"), "day", "x"
        )
    )
    lstep = _HOLT_L.format(
        x="e.x", l="acc.l", b="acc.b"
    )
    bstep = _HOLT_B.format(l1=lstep, l="acc.l", b="acc.b")
    fold = (
        "aggregate(slice(sort_array(xs), 2, size(xs)), "
        "CAST(named_struct('l', sort_array(xs)[0].x, "
        "'b', sort_array(xs)[1].x - sort_array(xs)[0].x) "
        "AS STRUCT<l: BIGINT, b: BIGINT>), "
        f"(acc, e) -> named_struct('l', {lstep}, 'b', {bstep}))"
    )
    fin = materialize(
        u.groupBy("event_type")
        .agg(F.expr("collect_list(struct(day, x))").alias("xs"))
        .filter(F.expr("size(xs) >= 2"))
        .select(
            "event_type", F.expr(fold + ".l + " + fold + ".b").alias("f")
        )
    )
    tot = fin.filter(F.col("event_type") == "TOTAL").select(
        F.col("f").alias("ft")
    )
    base = fin.filter(F.col("event_type") != "TOTAL")
    sb = base.agg(F.sum("f").alias("sf"))
    return (
        base.join(F.broadcast(tot))
        .join(F.broadcast(sb))
        .select(
            "event_type",
            F.expr("CAST(f AS DOUBLE) / 100.0e0").alias("base_forecast"),
            F.expr(
                "CAST(CAST(ROUND(CAST(f AS DOUBLE) * ft / sf) AS BIGINT) "
                "AS DOUBLE) / 100.0e0"
            ).alias("reconciled_forecast"),
            F.expr(rnd("CAST(f AS DOUBLE) / sf", 6)).alias("share"),
        )
    )


# --- time-weighted average over irregular samples --------------------------

def _twap_sql(src: str, epoch: str) -> str:
    """Shared text: per-type step-function integral of value over time.
    Each observation holds its value until the next one (lead); the
    integral sums cents x held-microseconds as exact DECIMAL(38,0)
    (duration ~1e11 us x 1e4 cents per term kills int64 fast), and the
    TWAP is one float division per type at the edge. `epoch` is the
    engine's epoch-microseconds spelling (Spark timestampdiff /
    DuckDB epoch_us) — the only dialect difference."""
    return (
        f"obs AS (SELECT event_type, {epoch} AS t_us, "
        "CAST(ROUND(value * 100.0e0) AS BIGINT) AS v_c "
        f"FROM {src}), "
        "held AS (SELECT event_type, v_c, "
        "LEAD(t_us) OVER (PARTITION BY event_type "
        "ORDER BY t_us, v_c) - t_us AS dur_us FROM obs), "
        "s AS (SELECT event_type, "
        "SUM(CAST(v_c * dur_us AS DECIMAL(38,0))) AS wsum, "
        "SUM(CAST(dur_us AS DECIMAL(38,0))) AS tsum, "
        "COUNT(dur_us) AS n_intervals FROM held "
        "WHERE dur_us IS NOT NULL GROUP BY event_type) "
        "SELECT event_type, CAST(n_intervals AS BIGINT) AS n_intervals, "
        + rnd("CAST(wsum AS DOUBLE) / (CAST(tsum AS DOUBLE) * 100.0e0)", 4)
        + " AS twap, "
        + rnd("CAST(tsum AS DOUBLE) / 8.64e10", 2)
        + " AS span_days FROM s"
    )


@query(
    "events_value_twap",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + " , "
        + _twap_sql("events_t", "epoch_us(ts)")
    ),
)
def events_value_twap(spark, sf_dir):
    """Time-weighted average value per event type — the correct mean for
    IRREGULARLY sampled series (finance TWAP, IoT sensor state): each
    observation's value is weighted by how long it was the latest one
    (step-function integral via lead), so burst periods stop dominating
    the way they do in the row-weighted mean (events_moment_stats shows
    that one; the gap between the two numbers IS the sampling-bias
    measurement). One window on the type partition, exact
    cents x microseconds products in DECIMAL(38,0), one division per
    type. The (t_us, v_c) tie-break makes duplicate-timestamp ordering
    total, so zero-duration ties contribute nothing in both engines."""
    tables.load(spark, sf_dir, "events").createOrReplaceTempView("ts_events")
    return spark.sql(
        "WITH "
        + _twap_sql(
            "ts_events",
            "timestampdiff(MICROSECOND, "
            "to_timestamp_ntz('1970-01-01 00:00:00'), ts)",
        )
    )


# --- seasonal / trend strength (forecastability diagnostics) ---------------

def _strength_sql(src: str, dow: str) -> str:
    """Hyndman's strength measures off the shared STL core:
    F_seasonal = max(0, 1 - Var(R)/Var(S+R)), F_trend = max(0,
    1 - Var(R)/Var(T+R)). Components snap to integer micro-units per
    day; the four variances are exact-integer moment sums over the day
    frame with ONE float formula each."""
    comp = (
        "comp AS (SELECT CAST(ROUND((CAST(y AS DOUBLE) / 100.0e0 "
        "- CAST(t7 AS DOUBLE) / 700.0e0 - s / 100.0e0) * 1.0e6) AS BIGINT)"
        " AS r_u, "
        "CAST(ROUND((CAST(t7 AS DOUBLE) / 700.0e0) * 1.0e6) AS BIGINT)"
        " AS t_u, "
        "CAST(ROUND((s / 100.0e0) * 1.0e6) AS BIGINT) AS s_u "
        "FROM core JOIN seas USING (k))"
    )
    var = (
        "(CAST(SUM(CAST({x} AS DECIMAL(38,0)) * {x}) AS DOUBLE) "
        "- CAST(SUM(CAST({x} AS DECIMAL(38,0))) AS DOUBLE) "
        "* CAST(SUM(CAST({x} AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*)) "
        "/ (COUNT(*) - 1)"
    )
    vr = var.format(x="r_u")
    vsr = var.format(x="(s_u + r_u)")
    vtr = var.format(x="(t_u + r_u)")
    return (
        _stl_core(src, dow) + ", " + comp + ", "
        "m AS (SELECT COUNT(*) AS n_days, "
        f"{vr} AS v_r, {vsr} AS v_sr, {vtr} AS v_tr FROM comp) "
        "SELECT CAST(n_days AS BIGINT) AS n_days, "
        + rnd("GREATEST(0.0e0, 1.0e0 - v_r / v_sr)", 6)
        + " AS seasonal_strength, "
        + rnd("GREATEST(0.0e0, 1.0e0 - v_r / v_tr)", 6)
        + " AS trend_strength FROM m"
    )


@query(
    "events_seasonality_strength",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        + _strength_sql("events_t", "(isodow(d) - 1)")
    ),
)
def events_seasonality_strength(spark, sf_dir):
    """Hyndman's seasonal and trend strength of the daily revenue series
    (0 = none, ->1 = dominant), computed from the shared STL core — the
    one-number forecastability diagnostic that decides whether the
    weekly model (events_dow_seasonality, Holt-Winters) is worth its
    state or plain Holt suffices. Components snap to micro-units per
    day; variances are exact DECIMAL moment sums over the day frame."""
    tables.load(spark, sf_dir, "events").createOrReplaceTempView("ts_events")
    return spark.sql("WITH " + _strength_sql("ts_events", "weekday(d)"))


# --- DAU / WAU / MAU stickiness --------------------------------------------

@query(
    "events_dau_mau_stickiness",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
        "FROM events_t), "
        "b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM du), "
        "dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du "
        "GROUP BY day), "
        "w AS (SELECT x.day, COUNT(DISTINCT user_id) AS wau FROM "
        "(SELECT user_id, CAST(unnest(generate_series("
        "CAST(day AS TIMESTAMP), CAST(day AS TIMESTAMP) + INTERVAL 6 DAY,"
        " INTERVAL 1 DAY)) AS DATE) AS day FROM du) x CROSS JOIN b "
        "WHERE x.day BETWEEN b.d0 AND b.d1 GROUP BY x.day), "
        "m AS (SELECT x.day, COUNT(DISTINCT user_id) AS mau FROM "
        "(SELECT user_id, CAST(unnest(generate_series("
        "CAST(day AS TIMESTAMP), CAST(day AS TIMESTAMP) + INTERVAL 29 DAY,"
        " INTERVAL 1 DAY)) AS DATE) AS day FROM du) x CROSS JOIN b "
        "WHERE x.day BETWEEN b.d0 AND b.d1 GROUP BY x.day) "
        "SELECT dau.day, dau.dau, w.wau, m.mau, "
        + rnd("CAST(dau.dau AS DOUBLE) / m.mau", 6)
        + " AS stickiness FROM dau JOIN w ON w.day = dau.day "
        "JOIN m ON m.day = dau.day"
    ),
)
def events_dau_mau_stickiness(spark, sf_dir):
    """The product-analytics headline curve: per-day DAU, trailing-7-day
    WAU, trailing-30-day MAU, and DAU/MAU stickiness (what fraction of
    the monthly audience shows up on a given day). Sliding
    COUNT(DISTINCT) cannot ride a window frame, so WAU/MAU reuse the
    spine-explode rewrite (events_trailing_distinct_users): constant
    fan-out over the already-distinct user x day frame, one hash-agg
    per horizon, three day-cardinality joins. Early days carry partial
    trailing windows by construction — the same convention every
    dashboard uses."""
    ev = tables.load(spark, sf_dir, "events")
    du = materialize(
        ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    )
    b = du.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    dau = du.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))

    def trail(n, name):
        return (
            du.select(
                "user_id",
                F.explode(
                    F.expr(
                        f"sequence(day, date_add(day, {n - 1}), "
                        "interval 1 day)"
                    )
                ).alias("day"),
            )
            .join(F.broadcast(b))
            .filter(F.col("day").between(F.col("d0"), F.col("d1")))
            .groupBy("day")
            .agg(F.countDistinct("user_id").alias(name))
        )

    return (
        dau.join(trail(7, "wau"), "day")
        .join(trail(30, "mau"), "day")
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            F.expr(rnd("CAST(dau AS DOUBLE) / mau", 6)).alias(
                "stickiness"
            ),
        )
    )


# --- Croston's method (intermittent demand) --------------------------------

#: smoothing alpha = 0.1; state in integer 1e6-units, snapped per step
_CR_Z = "CAST(ROUND(0.1e0 * ({q} * 1000000) + 0.9e0 * {z}) AS BIGINT)"
_CR_P = "CAST(ROUND(0.1e0 * ({g} * 1000000) + 0.9e0 * {p}) AS BIGINT)"
_CR_PARTS = 50  # deterministic study set: partkeys 1..50


def _croston_oracle() -> str:
    zstep = _CR_Z.format(q="x.q", z="r.z")
    pstep = _CR_P.format(g="(x.day - r.day)", p="r.p")
    return (
        "WITH RECURSIVE occ AS (SELECT l_partkey AS pk, "
        "CAST(l_shipdate AS DATE) AS day, "
        "SUM(CAST(l_quantity AS BIGINT)) AS q FROM lineitem "
        f"WHERE l_partkey <= {_CR_PARTS} "
        "GROUP BY l_partkey, CAST(l_shipdate AS DATE)), "
        "xs AS (SELECT pk, day, q, ROW_NUMBER() OVER "
        "(PARTITION BY pk ORDER BY day) AS i FROM occ), "
        "nn AS (SELECT pk, MAX(i) AS imax FROM xs GROUP BY pk), "
        # anchor at the second occurrence: z from occ1 demand smoothed
        # with occ2, p from the first observed gap
        "r AS (SELECT b.pk, b.day, b.i, "
        + _CR_Z.format(q="b.q", z="(a.q * 1000000)")
        + " AS z, (b.day - a.day) * 1000000 AS p "
        "FROM xs a JOIN xs b ON a.pk = b.pk AND a.i = 1 AND b.i = 2 "
        f"UNION ALL SELECT x.pk, x.day, x.i, {zstep}, {pstep} "
        "FROM xs x JOIN r ON x.pk = r.pk AND x.i = r.i + 1) "
        "SELECT r.pk AS partkey, CAST(nn.imax AS BIGINT) "
        "AS n_demand_days, "
        "CAST(r.z AS DOUBLE) / 1.0e6 AS smoothed_size, "
        "CAST(r.p AS DOUBLE) / 1.0e6 AS smoothed_interval_days, "
        + rnd("CAST(r.z AS DOUBLE) / r.p", 6)
        + " AS croston_rate_per_day "
        "FROM r JOIN nn ON r.pk = nn.pk AND r.i = nn.imax"
    )


@query("events_croston_intermittent", oracle=_croston_oracle())
def events_croston_intermittent(spark, sf_dir):
    """Croston's method on intermittent part demand (partkeys 1-50):
    separate exponential smoothing of nonzero demand SIZE and of the
    INTERVAL between demand days, forecast = size/interval per day —
    the estimator that stays unbiased exactly where plain smoothing
    collapses on sparse series (the XYZ 'Z' class this pairs with).
    Per-part snapped two-state folds (1e6-unit integers, two-occurrence
    anchor) over collected occurrence lists; the oracle is the
    recursive-CTE twin, bit-equal per step like the Holt family."""
    li = tables.load(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") <= _CR_PARTS
    )
    occ = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.to_date("l_shipdate").alias("day"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
    zstep = _CR_Z.format(q="e.q", z="acc.z")
    pstep = _CR_P.format(g="datediff(e.day, acc.day)", p="acc.p")
    anchor_z = _CR_Z.format(
        q="sort_array(xs)[1].q", z="(sort_array(xs)[0].q * 1000000)"
    )
    fold = (
        "aggregate(slice(sort_array(xs), 3, size(xs)), "
        "CAST(named_struct("
        "'day', sort_array(xs)[1].day, "
        f"'z', {anchor_z}, "
        "'p', CAST(datediff(sort_array(xs)[1].day, sort_array(xs)[0].day)"
        " AS BIGINT) * 1000000) "
        "AS STRUCT<day: DATE, z: BIGINT, p: BIGINT>), "
        f"(acc, e) -> named_struct('day', e.day, 'z', {zstep}, "
        f"'p', {pstep}))"
    )
    return (
        occ.groupBy("pk")
        .agg(F.expr("collect_list(struct(day, q))").alias("xs"))
        .filter(F.expr("size(xs) >= 2"))
        .select(
            F.col("pk").alias("partkey"),
            F.expr("CAST(size(xs) AS BIGINT)").alias("n_demand_days"),
            F.expr(fold).alias("st"),
        )
        .select(
            "partkey",
            "n_demand_days",
            F.expr("CAST(st.z AS DOUBLE) / 1.0e6").alias("smoothed_size"),
            F.expr("CAST(st.p AS DOUBLE) / 1.0e6").alias(
                "smoothed_interval_days"
            ),
            F.expr(rnd("CAST(st.z AS DOUBLE) / st.p", 6)).alias(
                "croston_rate_per_day"
            ),
        )
    )


# --- interrupted time series (segmented regression) ------------------------

def _its_sql(src: str) -> str:
    """Shared text: daily totals indexed 1..n, break at the midpoint
    index, exact-integer OLS moment sums per segment, closed-form
    level/slope for each side and the discontinuity at the break —
    the segmented-regression read of an intervention, with
    events_changepoint_sse finding WHERE and this measuring WHAT
    changed in trend terms."""
    fit = (
        "(CAST(n{s} AS DOUBLE) * sxy{s} - CAST(sx{s} AS DOUBLE) * sy{s})"
        " / (CAST(n{s} AS DOUBLE) * sxx{s} - CAST(sx{s} AS DOUBLE)"
        " * sx{s})"
    )
    mean = "(CAST(sy{s} AS DOUBLE) / n{s})"
    xbar = "(CAST(sx{s} AS DOUBLE) / n{s})"
    return (
        "daily AS (SELECT CAST(ts AS DATE) AS d, "
        "SUM(CAST(ROUND(value * 100.0e0) AS BIGINT)) AS y "
        f"FROM {src} GROUP BY CAST(ts AS DATE)), "
        "idx AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS t, y, "
        "COUNT(*) OVER () AS n FROM daily), "
        "seg AS (SELECT t, y, CASE WHEN 2 * t <= n THEN 1 ELSE 2 END "
        "AS s, CAST(FLOOR(n / 2.0e0) AS BIGINT) AS t0 FROM idx), "
        "m AS (SELECT MAX(t0) AS t0, "
        "SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS n1, "
        "SUM(CASE WHEN s = 1 THEN t ELSE 0 END) AS sx1, "
        "SUM(CASE WHEN s = 1 THEN y ELSE 0 END) AS sy1, "
        "SUM(CASE WHEN s = 1 THEN t * t ELSE 0 END) AS sxx1, "
        "SUM(CASE WHEN s = 1 THEN t * y ELSE 0 END) AS sxy1, "
        "SUM(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS n2, "
        "SUM(CASE WHEN s = 2 THEN t ELSE 0 END) AS sx2, "
        "SUM(CASE WHEN s = 2 THEN y ELSE 0 END) AS sy2, "
        "SUM(CASE WHEN s = 2 THEN t * t ELSE 0 END) AS sxx2, "
        "SUM(CASE WHEN s = 2 THEN t * y ELSE 0 END) AS sxy2 FROM seg), "
        "f AS (SELECT t0, "
        + fit.format(s="1") + " AS b1, " + fit.format(s="2") + " AS b2, "
        + mean.format(s="1") + " - " + fit.format(s="1") + " * "
        + xbar.format(s="1") + " AS a1, "
        + mean.format(s="2") + " - " + fit.format(s="2") + " * "
        + xbar.format(s="2") + " AS a2 FROM m) "
        "SELECT CAST(t0 AS BIGINT) AS break_day_index, "
        + rnd("b1 / 100.0e0", 4) + " AS pre_slope_dollars_per_day, "
        + rnd("b2 / 100.0e0", 4) + " AS post_slope_dollars_per_day, "
        + rnd("(b2 - b1) / 100.0e0", 4) + " AS slope_change, "
        + rnd(
            "((a2 + b2 * (t0 + 1)) - (a1 + b1 * (t0 + 1))) / 100.0e0", 2
        )
        + " AS level_change_at_break FROM f"
    )


@query(
    "events_interrupted_timeseries",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", " + _its_sql("events_t")
    ),
)
def events_interrupted_timeseries(spark, sf_dir):
    """Interrupted time-series (segmented regression) around the series
    midpoint: separate exact-sum OLS fits before and after the break,
    reporting pre/post slopes, the slope change, and the level
    discontinuity at the break evaluated from both fits — the
    regression framing of an intervention that events_did_analysis
    answers with a control group and events_changepoint_sse locates
    from the data. One daily aggregate, one index window, a single
    11-scalar moment row, closed forms."""
    tables.load(spark, sf_dir, "events").createOrReplaceTempView(
        "ts_events"
    )
    return spark.sql("WITH " + _its_sql("ts_events"))


# --- peak-to-average load ratio --------------------------------------------

@query(
    "events_peak_to_average",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "hr AS (SELECT CAST(ts AS DATE) AS day, hour(ts) AS h, "
        "COUNT(*) AS n FROM events_t GROUP BY 1, 2), "
        "d AS (SELECT day, SUM(n) AS dn, MAX(n) AS peak_h FROM hr "
        "GROUP BY day), "
        "t AS (SELECT COUNT(*) AS n_days, SUM(dn) AS tot, "
        "MAX(dn) AS peak_day FROM d), "
        "hp AS (SELECT MAX(hn) AS peak_hour FROM "
        "(SELECT SUM(n) AS hn FROM hr GROUP BY h) x) "
        "SELECT CAST(t.n_days AS BIGINT) AS n_days, "
        + rnd("CAST(t.tot AS DOUBLE) / t.n_days", 2)
        + " AS avg_daily_events, "
        "CAST(t.peak_day AS BIGINT) AS peak_day_events, "
        + rnd("CAST(t.peak_day AS DOUBLE) * t.n_days / t.tot", 4)
        + " AS day_peak_to_avg, "
        + rnd(
            "CAST((SELECT peak_hour FROM hp) AS DOUBLE) * 24.0e0 "
            "* t.n_days / t.tot",
            4,
        )
        + " AS hour_peak_to_avg FROM t"
    ),
)
def events_peak_to_average(spark, sf_dir):
    """Peak-to-average ratios at two grains: the busiest day vs the
    average day and the busiest hour-of-day slot vs the average hour —
    the two numbers capacity provisioning runs on (a PAR of 2 means
    half the fleet idles off-peak; autoscaling ROI is exactly this
    gap). One (day x hour) aggregate feeds both grains; every ratio is
    exact integers into one snapped division."""
    tables.load(spark, sf_dir, "events").createOrReplaceTempView(
        "ts_events"
    )
    return spark.sql(
        "WITH hr AS (SELECT CAST(ts AS DATE) AS day, hour(ts) AS h, "
        "COUNT(*) AS n FROM ts_events GROUP BY 1, 2), "
        "d AS (SELECT day, SUM(n) AS dn, MAX(n) AS peak_h FROM hr "
        "GROUP BY day), "
        "t AS (SELECT COUNT(*) AS n_days, SUM(dn) AS tot, "
        "MAX(dn) AS peak_day FROM d), "
        "hp AS (SELECT MAX(hn) AS peak_hour FROM "
        "(SELECT SUM(n) AS hn FROM hr GROUP BY h) x) "
        "SELECT CAST(t.n_days AS BIGINT) AS n_days, "
        + rnd("CAST(t.tot AS DOUBLE) / t.n_days", 2)
        + " AS avg_daily_events, "
        "CAST(t.peak_day AS BIGINT) AS peak_day_events, "
        + rnd("CAST(t.peak_day AS DOUBLE) * t.n_days / t.tot", 4)
        + " AS day_peak_to_avg, "
        + rnd(
            "CAST((SELECT peak_hour FROM hp) AS DOUBLE) * 24.0e0 "
            "* t.n_days / t.tot",
            4,
        )
        + " AS hour_peak_to_avg FROM t"
    )


# --- rolling median (robust trailing smoother) -----------------------------

_RMED_BODY = (
    "SELECT event_id, event_type, "
    "{q}(CAST(ROUND(value * 100.0e0) AS BIGINT), 0.5e0) OVER ("
    "PARTITION BY event_type ORDER BY ts, event_id "
    "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0e0 "
    "AS rolling_median FROM {src}"
)


@query(
    "events_rolling_median",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + " "
        + _RMED_BODY.format(q="quantile_cont", src="events_t")
    ),
)
def events_rolling_median(spark, sf_dir):
    """Trailing 7-reading MEDIAN of value per event type — the robust
    smoother that ignores a spike the same window's moving AVERAGE
    (window_moving_avg_events) chases; the pair is the classic
    robust-vs-efficient trade, queryable side by side. A percentile
    AGGREGATE over a moving row frame: one exchange on event_type,
    O(frame) state per row, no self-join. The median runs on exact
    integer cents (ties at .5 cents are exact halves in doubles), so
    Spark's percentile() and DuckDB's quantile_cont() — both the
    continuous/interpolating estimator — return bit-identical values;
    (ts, event_id) makes the frame's row membership a total order in
    both engines. At 100 TB this shuffles each type's rows once; a
    skewed type salts into sub-partitions with a 6-row overlap stitch
    (the documented sliding-window recipe)."""
    tables.load(spark, sf_dir, "events").createOrReplaceTempView(
        "rm_events"
    )
    return spark.sql(_RMED_BODY.format(q="percentile", src="rm_events"))


# --- seasonal-naive backtest + MASE -----------------------------------------

def _snaive_sql(src: str, dow: str) -> str:
    """Shared text over a (event_type, day, v_c) daily frame: 80/20
    rank split per type, seasonal-naive prediction (latest train value
    on the same weekday), test MAE, in-sample naive-1 MAE, and MASE.
    `dow` is the engine's 1-based day-of-week spelling (Spark
    `dayofweek(day)`, DuckDB `dayofweek(day) + 1`). Every window is
    per-type (calendar-bounded); all error sums are exact cents."""
    return (
        f"r AS (SELECT event_type, day, v_c, {dow} AS dw, "
        "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rk, "
        "COUNT(*) OVER (PARTITION BY event_type) AS nd "
        f"FROM {src}), "
        "tr AS (SELECT * FROM r "
        "WHERE rk <= CAST(FLOOR(0.8e0 * nd) AS BIGINT)), "
        "te AS (SELECT * FROM r "
        "WHERE rk > CAST(FLOOR(0.8e0 * nd) AS BIGINT)), "
        "sn AS (SELECT event_type, dw, v_c AS v_pred FROM ("
        "SELECT event_type, dw, v_c, ROW_NUMBER() OVER ("
        "PARTITION BY event_type, dw ORDER BY day DESC) AS rr FROM tr) z "
        "WHERE rr = 1), "
        "nv AS (SELECT event_type, v_c - LAG(v_c) OVER ("
        "PARTITION BY event_type ORDER BY day) AS dlt FROM tr), "
        "nm AS (SELECT event_type, SUM(ABS(dlt)) AS s_abs, "
        "COUNT(dlt) AS n_d FROM nv GROUP BY event_type), "
        "tn AS (SELECT event_type, COUNT(*) AS n_train FROM tr "
        "GROUP BY event_type), "
        "ev AS (SELECT te.event_type, COUNT(*) AS n_test, "
        "SUM(CASE WHEN sn.v_pred IS NULL THEN 1 ELSE 0 END) "
        "AS n_unpredicted, "
        "SUM(CASE WHEN sn.v_pred IS NOT NULL "
        "THEN ABS(te.v_c - sn.v_pred) ELSE 0 END) AS s_err, "
        "SUM(CASE WHEN sn.v_pred IS NOT NULL THEN 1 ELSE 0 END) "
        "AS n_pred "
        "FROM te LEFT JOIN sn ON sn.event_type = te.event_type "
        "AND sn.dw = te.dw GROUP BY te.event_type) "
        # LEFT JOINs from ev: a type whose train split is empty (e.g.
        # nd = 1: floor(0.8*1) = 0 puts every row in test) has no tn/nm
        # row — it must surface as n_train = 0 with NULL metrics, not
        # vanish from the verdict table (round-4 ADVICE)
        "SELECT ev.event_type, "
        "CAST(COALESCE(tn.n_train, 0) AS BIGINT) AS n_train, "
        "CAST(ev.n_test AS BIGINT) AS n_test, "
        "CAST(ev.n_unpredicted AS BIGINT) AS n_unpredicted, "
        "CAST(ev.s_err AS DOUBLE) / "
        "(100.0e0 * NULLIF(ev.n_pred, 0)) AS mae_snaive, "
        "CAST(nm.s_abs AS DOUBLE) / "
        "(100.0e0 * NULLIF(nm.n_d, 0)) AS mae_naive1_insample, "
        + rnd(
            "CAST(ev.s_err AS DOUBLE) * nm.n_d / "
            "NULLIF(CAST(nm.s_abs AS DOUBLE) * ev.n_pred, 0.0e0)",
            4,
        )
        + " AS mase "
        "FROM ev LEFT JOIN tn ON tn.event_type = ev.event_type "
        "LEFT JOIN nm ON nm.event_type = ev.event_type"
    )


@query(
    "events_snaive_mase_backtest",
    oracle=(
        "WITH " + _DAILY_CTE + ", "
        + _snaive_sql("c", "dayofweek(day) + 1")
    ),
)
def events_snaive_mase_backtest(spark, sf_dir):
    """Seasonal-naive backtest with MASE — the forecasting floor and
    the scale-free metric (Hyndman & Koehler 2006) every fitted model
    must beat: predict each held-out day's value by the latest TRAIN
    value on the same weekday, and report the test MAE divided by the
    in-sample naive-1 MAE (MASE < 1 = better than persistence;
    events_holt_backtest's MAPE can't compare across types whose
    scales differ — MASE can). 80/20 rank split per type, per-type
    windows only (calendar-bounded), exact cents error sums, and test
    weekdays never seen in training are counted (n_unpredicted)
    rather than silently dropped. The Holt model earns its keep only
    where its error beats this query's mae_snaive."""
    _daily(spark, sf_dir).createOrReplaceTempView("snv_daily")
    return spark.sql(
        "WITH " + _snaive_sql("snv_daily", "dayofweek(day)")
    )
