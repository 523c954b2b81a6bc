"""Unit tests for the enrichment formulas (SURVEY §5 item 3): golden row
verified against the reference's real lake output
(ref:spark-output/weather_enriched/part-00000-45813c51-*.json:1)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from weather_bigdata_project_spark import weather_domain as wd


def _wire_row(**over):
    base = {
        "date": "2025-10-28 14:31:46",
        "weather_description": "overcast clouds",
        "latitude": "33.5928",
        "pression": "1014",
        "humidité": "69",
        "feels_like": "22.74",
        "city_name": "Casablanca",
        "local_time": "2025-10-28 15:31:46",
        "min_temp": "23.1",
        "wind_speed": "5.14",
        "température": "22.96",
        "max_temp": "23.5",
        "timestamp": "1761661906",
        "longitude": "-7.6192",
    }
    base.update(over)
    return Row(**base)


def _run(spark, rows):
    df = spark.createDataFrame(rows)
    return wd.enrich(wd.cast_wire(df)).collect()


def test_golden_lake_row(spark):
    """Input (t=23, h=69, w=5.14, p=1014, 'overcast clouds') must
    reproduce the reference's observed output record exactly
    (FIXTURES.md §A2 golden row)."""
    [r] = _run(spark, [_wire_row()])
    assert r.temperature == 23
    assert r.humidity == 69
    assert r.pressure == 1014
    assert r.dew_point == 17
    assert r.heat_index == 23  # t<27 => passthrough
    assert r.wind_chill == 23  # t>10 => passthrough
    assert r.weather_category == "Cloudy"
    assert r.comfort_level == "Moderate"
    assert r.alert_type == "NORMAL"
    assert r.event_time == "2025-10-28 14:31:46"


def test_hot_humid_heat_index(spark):
    [r] = _run(spark, [_wire_row(température="35.0", humidité="85", wind_speed="2.0")])
    # 35 + 0.33*85 - 0.70*2 - 4 = 57.65 -> 58
    assert r.heat_index == 58
    assert r.comfort_level == "Very Hot"
    assert r.weather_category == "Cloudy"


def test_wind_chill_formula(spark):
    [r] = _run(spark, [_wire_row(température="0.0", wind_speed="20.0")])
    # 13.12 + 0 - 11.37*20^0.16 + 0 = -5.22... -> -5
    assert r.wind_chill == -5
    assert r.comfort_level == "Cold"


def test_alert_priority_order(spark):
    """EXTREME_TEMPERATURE outranks HIGH_WIND outranks PRESSURE_ANOMALY
    (when-chain order, ref:spark-apps/weather_streaming.py:137-142)."""
    [r] = _run(
        spark,
        [_wire_row(température="45.0", wind_speed="60.0", pression="950")],
    )
    assert (r.is_extreme_temp, r.is_high_wind, r.is_pressure_anomaly) == (
        True, True, True,
    )
    assert r.alert_type == "EXTREME_TEMPERATURE"


def test_like_chain_order(spark):
    """'clear' wins before 'cloud'; 'mist' falls through to Other."""
    rows = [
        _wire_row(weather_description="clear sky"),
        _wire_row(weather_description="thunderstorm"),
        _wire_row(weather_description="mist"),
    ]
    cats = {r.weather_description: r.weather_category for r in _run(spark, rows)}
    assert cats == {
        "clear sky": "Clear",
        "thunderstorm": "Stormy",
        "mist": "Other",
    }


def test_dirty_cast_null_semantics(spark):
    """Non-numeric wire values cast to null, never error (the reference's
    non-ANSI cast; we use try_cast so ANSI sessions behave the same)."""
    [r] = _run(spark, [_wire_row(température="N/A", pression="")])
    assert r.temperature is None
    assert r.pressure is None
    assert r.dew_point is None
    assert r.heat_index is None
    assert r.alert_type == "NORMAL"  # null flags -> False -> NORMAL


def test_approx_distinct_error_bound(spark):
    """HLL++ sketch (rsd=0.02) must land within 5x the configured
    relative error of the exact per-group cardinality."""
    from weather_bigdata_project_spark.registry import QUERIES
    from tests.conftest import SF_SMOKE

    rows = QUERIES["events_approx_distinct_users"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_users - r.exact_users) <= max(
            2, 0.1 * r.exact_users
        ), (r.event_type, r.approx_users, r.exact_users)


def test_pandas_udf_haversine_matches_jvm_twin(spark):
    """The Arrow pandas_udf haversine must agree with the JVM expression
    twin EXACTLY after the micro-km snap, on the fixture coordinates —
    the same snap-absorbs-libm-ulp argument the geo oracles rest on."""
    from weather_bigdata_project_spark import weather_domain as wd
    from weather_bigdata_project_spark.functions.udfs import (
        haversine_ukm_pandas,
    )
    from weather_bigdata_project_spark.queries.geo import _hav_ukm

    e = wd.enriched_frame(spark, SF_SMOKE).select("event_id", "lat", "lon")
    both = e.select(
        "event_id",
        F.expr(
            _hav_ukm("lat", "lon", "33.5731e0", "-7.5898e0")
        ).alias("jvm"),
        haversine_ukm_pandas(
            F.col("lat"), F.col("lon"),
            F.lit(33.5731), F.lit(-7.5898),
        ).alias("py"),
    )
    assert both.filter(F.col("jvm") != F.col("py")).count() == 0


def test_udtf_chunker_matches_jvm_twin(spark):
    """The Python UDTF chunker and the in-row JVM transform emit the
    same (doc_id, pos, chunk, n_tokens) rows."""
    from weather_bigdata_project_spark.functions.udfs import (
        ChunkTokens,
        chunk_tokens_jvm,
    )
    from weather_bigdata_project_spark.operators import textops as T

    docs = T.docs(spark, SF_SMOKE).select("doc_id", "text").limit(50)
    spark.udtf.register("chunk_tokens", ChunkTokens)
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        "SELECT d.doc_id, c.pos, c.chunk, c.n_tokens "
        "FROM udtf_docs d, LATERAL chunk_tokens(d.text, 10) c"
    )
    want = chunk_tokens_jvm(docs, "text", 10).select(
        "doc_id", "pos", "chunk", "n_tokens"
    )
    assert got.count() == want.count()
    assert got.subtract(want).count() == 0
    assert want.subtract(got).count() == 0


def test_hll_sketch_union_mergeable(spark):
    """Datasketches HLL (hll_sketch_agg / hll_union_agg): per-day
    sketches unioned must estimate the global cardinality within the
    sketch's error envelope — THE property that makes sketch columns
    pre-aggregable in a 100 TB rollup (store one sketch per partition,
    merge at query time; never rescan raw data for a distinct count)."""
    from weather_bigdata_project_spark import tables
    from tests.conftest import SF_SMOKE

    ev = tables.load(spark, SF_SMOKE, "events")
    ev.createOrReplaceTempView("hll_events")
    [r] = spark.sql(
        "WITH daily AS (SELECT CAST(ts AS DATE) AS day, "
        "hll_sketch_agg(user_id) AS s FROM hll_events GROUP BY day) "
        "SELECT hll_sketch_estimate(hll_union_agg(s)) AS merged, "
        "(SELECT hll_sketch_estimate(hll_sketch_agg(user_id)) "
        "FROM hll_events) AS global_est, "
        "(SELECT COUNT(DISTINCT user_id) FROM hll_events) AS exact "
        "FROM daily"
    ).collect()
    # default lgConfigK=12 -> ~1.6% rsd; allow 5 sigma on both paths
    for est in (r.merged, r.global_est):
        assert abs(est - r.exact) <= max(2, 0.08 * r.exact), r


def test_percentile_approx_error_bound_vs_exact(spark):
    """The documented scale swap (exact percentile -> percentile_approx
    at 100 TB, see weather_temp_equidepth) is only safe if the sketch's
    rank error is actually bounded: with accuracy=1000 the approximate
    quartiles of the lineitem price column must each sit within 0.5% of
    the true rank."""
    from weather_bigdata_project_spark import tables
    from tests.conftest import SF_SMOKE

    li = tables.load(spark, SF_SMOKE, "lineitem").select("l_extendedprice")
    n = li.count()
    [r] = li.agg(
        F.expr(
            "percentile_approx(l_extendedprice, array(0.25e0, 0.5e0, "
            "0.75e0), 1000)"
        ).alias("ap"),
    ).collect()
    for q, approx in zip((0.25, 0.5, 0.75), r["ap"]):
        rank = li.filter(F.col("l_extendedprice") <= approx).count()
        assert abs(rank / n - q) <= 0.005, (q, approx, rank / n)
