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
