"""Property-based tests (hypothesis): the enrichment formulas evaluated
by Catalyst must equal an INDEPENDENT pure-Python implementation of the
reference semantics (ref:spark-apps/weather_streaming.py:81-142) on
arbitrary inputs — not just the fixture value ranges."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from weather_bigdata_project_spark import weather_domain as wd

# --- pure-Python reference semantics --------------------------------------


def _round_half_up(x: float) -> int:
    return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def py_dew_point(t: int, h: int) -> int:
    return _round_half_up(t - ((100 - h) / 5.0))


def py_heat_index(t: int, h: int, w: float) -> int:
    if t >= 27:
        return _round_half_up(t + 0.33 * h - 0.70 * w - 4.00)
    return t


def py_wind_chill(t: int, w: float) -> int:
    if t <= 10 and w > 4.8:
        return _round_half_up(
            13.12 + 0.6215 * t - 11.37 * math.pow(w, 0.16)
            + 0.3965 * t * math.pow(w, 0.16)
        )
    return t


def py_comfort(t: int, h: int) -> str:
    if 18 <= t <= 24 and 30 <= h <= 60:
        return "Comfortable"
    if t > 30:
        return "Very Hot"
    if t < 10:
        return "Cold"
    if h > 80:
        return "Humid"
    return "Moderate"


def py_alert(t: int, w: float, p: int) -> str:
    if t > 40 or t < 0:
        return "EXTREME_TEMPERATURE"
    if w > 50:
        return "HIGH_WIND"
    if p < 980 or p > 1040:
        return "PRESSURE_ANOMALY"
    return "NORMAL"


ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-40, max_value=60),      # temperature
        st.integers(min_value=0, max_value=100),       # humidity
        st.integers(min_value=900, max_value=1100),    # pressure
        # one-decimal wind keeps float repr exact in both engines
        st.integers(min_value=0, max_value=700).map(lambda x: x / 10.0),
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS)
def test_enrichment_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        [(t, h, p, w, "clear sky") for t, h, p, w in rows],
        "temperature INT, humidity INT, pressure INT, "
        "wind_speed_num DOUBLE, weather_description STRING",
    )
    got = wd.enrich(df).collect()
    for r, (t, h, p, w) in zip(got, rows):
        assert r.dew_point == py_dew_point(t, h), (t, h)
        assert r.heat_index == py_heat_index(t, h, w), (t, h, w)
        assert r.wind_chill == py_wind_chill(t, w), (t, w)
        assert r.comfort_level == py_comfort(t, h), (t, h)
        assert r.alert_type == py_alert(t, w, p), (t, w, p)
