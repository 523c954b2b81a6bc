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
from ..functions.exprs import money
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
    (user, day) frame — pinned, because both the cohort aggregate and
    the retention join consume it; the join and both aggregates are
    user-cardinality. The classic dashboard query the reference's
    pandas layer cannot express without a quadratic loop."""
    ev = tables.load(spark, sf_dir, "events")
    act = materialize(
        ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    )
    f = act.groupBy("user_id").agg(F.min("day").alias("cohort"))
    return (
        act.join(f, "user_id")
        .groupBy(
            "cohort", F.datediff("day", "cohort").alias("day_offset")
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
