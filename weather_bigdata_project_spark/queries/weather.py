"""Weather-pipeline queries: the reference's entire streaming ETL surface
as batch-checkable queries (M0 of SURVEY.md §7).

Covers SURVEY §2: S2/S4/S5 (wire synthesis + parse), P1-P6 (casts, drops,
projections, alert filter), F1-F8 (all scalar derivations), T-path parity
(the same `enrich` fns run under Structured Streaming in
`streaming/jobs.py`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import weather_domain as wd
from ..registry import query


@query("weather_enrich", oracle=wd.oracle_enriched_select())
def weather_enrich(spark, sf_dir):
    """Flagship: wire -> cast -> enrich, the reference's full record
    (ref:spark-apps/weather_streaming.py:59-142)."""
    return wd.enriched_frame(spark, sf_dir)


@query("weather_alerts", oracle=wd.oracle_alerts_select())
def weather_alerts(spark, sf_dir):
    """P6 inequality filter + P5 narrow projection
    (ref:spark-apps/weather_streaming.py:183-192)."""
    return wd.alerts_frame(spark, sf_dir)


@query(
    "weather_console_view",
    oracle=(
        f"WITH {wd.oracle_enriched_cte()} "
        "SELECT event_id, timestamp_dt, city_name, temperature, humidity, "
        "pressure, heat_index, dew_point, wind_chill, comfort_level, "
        "alert_type FROM enriched"
    ),
)
def weather_console_view(spark, sf_dir):
    """P4: the 10-column console projection
    (ref:spark-apps/weather_streaming.py:149-160)."""
    return wd.enriched_frame(spark, sf_dir).select(
        "event_id", "timestamp_dt", "city_name", "temperature", "humidity",
        "pressure", "heat_index", "dew_point", "wind_chill", "comfort_level",
        "alert_type",
    )


# --- degree days ----------------------------------------------------------

_DD_BASE = 18  # base temperature, deg C


@query(
    "weather_degree_days",
    oracle=(
        f"WITH {wd.oracle_enriched_cte()}, "
        "daily AS (SELECT city_name, CAST(timestamp_dt AS DATE) AS day, "
        "CAST(ROUND(CAST(SUM(CAST(temperature AS BIGINT)) AS DOUBLE) "
        "/ COUNT(temperature) * 100.0e0) AS BIGINT) "
        "AS t_c FROM enriched WHERE temperature IS NOT NULL "
        "GROUP BY city_name, CAST(timestamp_dt AS DATE)) "
        "SELECT city_name, COUNT(*) AS n_days, "
        f"SUM(CASE WHEN t_c < {_DD_BASE * 100} THEN {_DD_BASE * 100} - t_c "
        "ELSE 0 END) AS hdd_c, "
        f"SUM(CASE WHEN t_c > {_DD_BASE * 100} THEN t_c - {_DD_BASE * 100} "
        "ELSE 0 END) AS cdd_c "
        "FROM daily GROUP BY city_name"
    ),
)
def weather_degree_days(spark, sf_dir):
    """Heating/cooling degree days per city (base 18 °C) — the standard
    energy-sector weather aggregate the reference's dashboard lacks.
    The daily mean is an exact BIGINT temperature sum divided once
    (never a float AVG — partial-agg order would leak in), snapped to
    centi-degrees; the seasonal HDD/CDD sums are then exact integer
    arithmetic: order-insensitive, engine-identical. Two hash-aggs,
    both keyed well below fact volume."""
    e = wd.enriched_frame(spark, sf_dir)
    daily = (
        e.filter(F.col("temperature").isNotNull())
        .groupBy(
            "city_name", F.to_date("timestamp_dt").alias("day")
        )
        .agg(
            F.expr(
                "CAST(ROUND(CAST(SUM(CAST(temperature AS BIGINT)) AS DOUBLE)"
                " / COUNT(temperature) * 100.0e0) AS BIGINT)"
            ).alias("t_c")
        )
    )
    b = _DD_BASE * 100
    return daily.groupBy("city_name").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(
            F.expr(f"CASE WHEN t_c < {b} THEN {b} - t_c ELSE 0 END")
        ).alias("hdd_c"),
        F.sum(
            F.expr(f"CASE WHEN t_c > {b} THEN t_c - {b} ELSE 0 END")
        ).alias("cdd_c"),
    )
