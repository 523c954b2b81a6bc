"""Geospatial operators over the enriched weather frame: grid-cell
aggregation, nearest-station assignment (haversine), and radius search.

The reference carries lat/lon on every observation (cast battery,
ref:spark-apps/weather_streaming.py:69-70) but never computes with them —
the dashboard only plots raw points. These operators add the spatial
analytics a weather lake actually needs.

Scale design:
- grid-cell stats: the cell id is pure narrow arithmetic on the scan;
  one hash-agg shuffle whose key cardinality is the cell count (bounded
  by the territory, not the data) — per-partition partials keep bytes
  moved proportional to cells x partitions at 100 TB;
- nearest-station: stations are a per-city aggregate (8 rows). Instead
  of a row x station shuffle join + per-row re-aggregate, the station
  list is collapsed to ONE array row broadcast to every task; the argmin
  is a narrow `array_min(transform(...))` over that array — ZERO
  shuffles on the observation side, O(|stations|) work per row. The
  classic cross-join-then-groupBy(event_id) plan would shuffle
  |rows| x |stations| — this one moves nothing;
- radius filter: narrow filter; at 100 TB a lat/lon bounding-box
  pre-filter (min/max comparable to parquet column stats) would skip
  whole row groups before any trig runs.

Cross-engine determinism: station centroids use the exact-integer idiom
(sum of ROUND(coord*1e4) BIGINTs, one final division) so no float-sum
order noise exists; haversine distances are snapped to integer
micro-km (ROUND(d*1e6)) before any argmin/compare/aggregate, so a
last-ulp libm difference between the JVM and DuckDB cannot flip a
winner or a filter edge; ties break on city name in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import weather_domain as wd
from ..functions.exprs import rnd
from ..operators.textops import materialize
from ..registry import query

#: mean-earth-radius haversine, engine-neutral SQL (RADIANS/SIN/COS/
#: ASIN/SQRT/POW are identical syntax in Spark SQL and DuckDB).
def _hav(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        "(2.0e0 * 6371.0e0 * ASIN(SQRT("
        f"POW(SIN(RADIANS(({lat2}) - ({lat1})) / 2.0e0), 2.0e0) + "
        f"COS(RADIANS({lat1})) * COS(RADIANS({lat2})) * "
        f"POW(SIN(RADIANS(({lon2}) - ({lon1})) / 2.0e0), 2.0e0))))"
    )


#: distance in integer micro-km: exact to compare/sum across engines
def _hav_ukm(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"CAST(ROUND({_hav(lat1, lon1, lat2, lon2)} * 1.0e6) AS BIGINT)"
    )


# --- grid-cell aggregation ------------------------------------------------

_CELL = "CAST(FLOOR({c} * 2.0e0) AS INTEGER)"  # 0.5-degree cells

_GRID_ORACLE = f"""
WITH {wd.oracle_enriched_cte()}
SELECT {_CELL.format(c='lat')} AS cell_lat,
       {_CELL.format(c='lon')} AS cell_lon,
       COUNT(*) AS n_obs,
       COUNT(temperature) AS n_temp,
       SUM(CAST(temperature AS BIGINT)) AS sum_temp,
       CAST(SUM(CAST(temperature AS BIGINT)) AS DOUBLE)
         / COUNT(temperature) AS avg_temp
FROM enriched
GROUP BY 1, 2
"""


@query("geo_grid_cell_stats", oracle=_GRID_ORACLE)
def geo_grid_cell_stats(spark, sf_dir):
    """0.5-degree grid-cell climatology: per-cell observation count and
    mean temperature. Cell id is narrow arithmetic; the aggregate's key
    space is the territory's cell count, so the single shuffle moves
    per-partition partials only. The average derives from an exact
    BIGINT sum (temperature is already integer), so it is identical
    across engines and partition orders."""
    e = wd.enriched_frame(spark, sf_dir)
    return (
        e.select(
            F.expr(_CELL.format(c="lat")).alias("cell_lat"),
            F.expr(_CELL.format(c="lon")).alias("cell_lon"),
            "temperature",
        )
        .groupBy("cell_lat", "cell_lon")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.count("temperature").alias("n_temp"),
            F.sum(F.col("temperature").cast("bigint")).alias("sum_temp"),
            F.expr(
                "CAST(SUM(CAST(temperature AS BIGINT)) AS DOUBLE)"
                " / COUNT(temperature)"
            ).alias("avg_temp"),
        )
    )


# --- nearest-station assignment ------------------------------------------

_STATIONS_CTE = """
obs AS (SELECT event_id, city_name, lat, lon FROM enriched),
st AS (
  SELECT city_name AS station_city,
         CAST(SUM(CAST(ROUND(lat * 1.0e4) AS BIGINT)) AS DOUBLE)
           / (1.0e4 * COUNT(*)) AS s_lat,
         CAST(SUM(CAST(ROUND(lon * 1.0e4) AS BIGINT)) AS DOUBLE)
           / (1.0e4 * COUNT(*)) AS s_lon
  FROM obs GROUP BY city_name
)"""

_NEAREST_ORACLE = f"""
WITH {wd.oracle_enriched_cte()},
{_STATIONS_CTE},
d AS (
  SELECT obs.event_id, obs.city_name, st.station_city,
         {_hav_ukm('obs.lat', 'obs.lon', 'st.s_lat', 'st.s_lon')} AS d_ukm
  FROM obs CROSS JOIN st
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY event_id ORDER BY d_ukm, station_city) AS rk
  FROM d
)
SELECT city_name, station_city AS nearest_station,
       COUNT(*) AS n_obs,
       SUM(d_ukm) AS sum_d_ukm,
       CAST(SUM(d_ukm) AS DOUBLE) / (1.0e6 * COUNT(*)) AS avg_dist_km
FROM r WHERE rk = 1
GROUP BY city_name, station_city
"""


@query("join_geo_nearest_station", oracle=_NEAREST_ORACLE)
def join_geo_nearest_station(spark, sf_dir):
    """Assign every observation to its haversine-nearest station
    (stations = per-city centroids) and summarize the confusion matrix
    label-city x nearest-station.

    Two passes, zero shuffles on the fact side: (1) the station
    aggregate (8 rows — station count is bounded by the city dimension,
    not the data) is collected as EXACT integers (sum-of-snapped-coords
    + count, the same idiom the oracle uses, so centroid doubles are
    bit-identical); (2) the probe inlines those integers as literals
    into a flat `array_min(array(struct(d_0, c_0), ...))` — every
    station's COS(RADIANS(s_lat)) constant-folds at plan time, and the
    per-row work is a codegen'd scalar chain, not an interpreted
    per-element `transform` lambda (measured ~3x on the sf0.1 probe).
    The 8-row collect follows the iterative-algorithm precedent
    (PageRank / power iteration: tiny state to the driver, data stays
    distributed); a >128-station input falls back to the broadcast
    array + transform plan, which is the right shape when the station
    list stops being literal-sized. Struct ordering gives the
    (distance, city) tie-break in both paths."""
    # pinned: both the station aggregate and the probe side consume it,
    # and Catalyst has no common-subplan sharing — without the pin the
    # wire synthesis (the most expensive scalar chain in the repo) runs
    # twice.
    e = materialize(
        wd.enriched_frame(spark, sf_dir).select(
            "event_id", "city_name", "lat", "lon"
        )
    )
    st = e.groupBy("city_name").agg(
        F.expr("SUM(CAST(ROUND(lat * 1.0e4) AS BIGINT))").alias("sl_lat"),
        F.expr("SUM(CAST(ROUND(lon * 1.0e4) AS BIGINT))").alias("sl_lon"),
        F.count(F.lit(1)).alias("n"),
    )
    st_rows = st.collect()
    if len(st_rows) <= 128:
        elems = []
        for r in st_rows:
            s_lat = f"(CAST({int(r['sl_lat'])} AS DOUBLE) / (1.0e4 * {int(r['n'])}))"
            s_lon = f"(CAST({int(r['sl_lon'])} AS DOUBLE) / (1.0e4 * {int(r['n'])}))"
            city = r["city_name"].replace("'", "''")
            elems.append(
                f"struct({_hav_ukm('lat', 'lon', s_lat, s_lon)} AS d_ukm, "
                f"'{city}' AS station_city)"
            )
        best = e.select(
            "city_name",
            F.expr(
                "array_min(array(" + ", ".join(elems) + "))"
            ).alias("best"),
        )
    else:  # station list beyond literal size: broadcast array + HOF
        stc = st.select(
            F.col("city_name").alias("station_city"),
            F.expr("CAST(sl_lat AS DOUBLE) / (1.0e4 * n)").alias("s_lat"),
            F.expr("CAST(sl_lon AS DOUBLE) / (1.0e4 * n)").alias("s_lon"),
        )
        stations = stc.agg(
            F.sort_array(
                F.collect_list(F.struct("station_city", "s_lat", "s_lon"))
            ).alias("stations")
        )
        best = (
            e.join(F.broadcast(stations))  # 1-row broadcast: stays narrow
            .select(
                "city_name",
                F.expr(
                    "array_min(transform(stations, s -> struct("
                    + _hav_ukm("lat", "lon", "s.s_lat", "s.s_lon")
                    + " AS d_ukm, s.station_city AS station_city)))"
                ).alias("best"),
            )
        )
    return best.groupBy(
        "city_name",
        F.col("best.station_city").alias("nearest_station"),
    ).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("best.d_ukm").alias("sum_d_ukm"),
        F.expr(
            "CAST(SUM(best.d_ukm) AS DOUBLE) / (1.0e6 * COUNT(*))"
        ).alias("avg_dist_km"),
    )


# --- radius search --------------------------------------------------------

#: Casablanca city center; 250 km search radius
_CTR_LAT, _CTR_LON, _RADIUS_UKM = "33.5731e0", "-7.5898e0", 250_000_000

_RADIUS_ORACLE = f"""
WITH {wd.oracle_enriched_cte()},
d AS (
  SELECT event_id, city_name, temperature, alert_type,
         {_hav_ukm('lat', 'lon', _CTR_LAT, _CTR_LON)} AS d_ukm
  FROM enriched
)
SELECT event_id, city_name, temperature, alert_type,
       CAST(d_ukm AS DOUBLE) / 1.0e6 AS dist_km
FROM d WHERE d_ukm <= {_RADIUS_UKM}
"""


@query("geo_radius_filter", oracle=_RADIUS_ORACLE)
def geo_radius_filter(spark, sf_dir):
    """All observations within 250 km (haversine) of Casablanca's
    center. Narrow filter — no shuffle at any scale; the integer
    micro-km snap makes the boundary identical across engines. At
    100 TB, precede with the bounding-box inequality (lat/lon BETWEEN)
    so parquet min/max stats skip far-away row groups before trig."""
    e = wd.enriched_frame(spark, sf_dir)
    d = e.select(
        "event_id", "city_name", "temperature", "alert_type",
        F.expr(
            _hav_ukm("lat", "lon", _CTR_LAT, _CTR_LON)
        ).alias("d_ukm"),
    )
    return d.filter(F.col("d_ukm") <= _RADIUS_UKM).select(
        "event_id", "city_name", "temperature", "alert_type",
        F.expr("CAST(d_ukm AS DOUBLE) / 1.0e6").alias("dist_km"),
    )


# --- inverse-distance-weighted field interpolation -------------------------

def _idw_sql(src: str) -> str:
    """Shared text from the enriched relation: stations = exact-integer
    per-city centroids + milli-degree mean temps; grid points = centers
    of occupied 0.5-degree cells; weights = relative inverse-square
    distance snapped to integer parts-per-1e9 of the NEAREST station's
    weight (w_rel = (d_min/d)^2 — bounded (0,1], so one snap holds both
    near and far stations; absolute 1/d^2 spans 13 orders of magnitude
    and cannot ride a single integer scale). Every cross-row sum is
    exact BIGINT; each weight is one identical IEEE evaluation."""
    return (
        f"obs AS (SELECT lat, lon, temperature, city_name FROM {src}), "
        "st AS (SELECT city_name AS station_city, "
        "CAST(SUM(CAST(ROUND(lat * 1.0e4) AS BIGINT)) AS DOUBLE) "
        "/ (1.0e4 * COUNT(*)) AS s_lat, "
        "CAST(SUM(CAST(ROUND(lon * 1.0e4) AS BIGINT)) AS DOUBLE) "
        "/ (1.0e4 * COUNT(*)) AS s_lon, "
        "CAST(ROUND(CAST(SUM(CAST(temperature AS BIGINT)) AS DOUBLE) "
        "* 1000.0e0 / COUNT(temperature)) AS BIGINT) AS t_mdeg "
        "FROM obs GROUP BY city_name), "
        "cells AS (SELECT DISTINCT "
        + _CELL.format(c="lat") + " AS cell_lat, "
        + _CELL.format(c="lon") + " AS cell_lon FROM obs), "
        "pts AS (SELECT cell_lat, cell_lon, "
        "(cell_lat + 0.5e0) / 2.0e0 AS g_lat, "
        "(cell_lon + 0.5e0) / 2.0e0 AS g_lon FROM cells), "
        "d AS (SELECT cell_lat, cell_lon, station_city, t_mdeg, "
        "GREATEST("
        + _hav_ukm("g_lat", "g_lon", "s_lat", "s_lon")
        + ", 1) AS d_ukm FROM pts CROSS JOIN st), "
        "dm AS (SELECT cell_lat, cell_lon, MIN(d_ukm) AS d_min "
        "FROM d GROUP BY cell_lat, cell_lon), "
        "wts AS (SELECT d.cell_lat, d.cell_lon, d.t_mdeg, "
        "CAST(ROUND(1.0e9 * (CAST(dm.d_min AS DOUBLE) / d.d_ukm) "
        "* (CAST(dm.d_min AS DOUBLE) / d.d_ukm)) AS BIGINT) AS wu "
        "FROM d JOIN dm ON d.cell_lat = dm.cell_lat "
        "AND d.cell_lon = dm.cell_lon) "
        "SELECT cell_lat, cell_lon, "
        "CAST(SUM(CASE WHEN wu > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_stations_used, "
        "(CAST(ROUND((CAST(SUM(wu * t_mdeg) AS DOUBLE) "
        "/ (1000.0e0 * SUM(wu))) * 1e3) AS DOUBLE) / 1e3) AS idw_temp "
        "FROM wts GROUP BY cell_lat, cell_lon"
    )


@query(
    "geo_idw_interpolation",
    oracle=(
        "WITH " + wd.oracle_enriched_cte() + ", " + _idw_sql("enriched")
    ),
)
def geo_idw_interpolation(spark, sf_dir):
    """Inverse-distance-weighted temperature field: interpolate each
    occupied 0.5-degree cell center from ALL station means with 1/d^2
    weights — the gridded-product step between point observations
    (geo_grid_cell_stats averages only a cell's own points) and a map
    layer. The station frame is dimension-sized so the cells-x-stations
    cross join is broadcast and bounded by territory, never by events;
    weights snap to integer ppb relative to the nearest station so the
    weighted sums are exact BIGINTs at any partition layout."""
    wd.enriched_frame(spark, sf_dir).createOrReplaceTempView(
        "idw_enriched"
    )
    return spark.sql("WITH " + _idw_sql("idw_enriched"))


# --- cross-city temperature correlation matrix -----------------------------

def _citycorr_sql() -> str:
    """Shared text from the enriched relation: per-(city, day) mean
    temperature snapped to integer milli-degrees, self-join on day for
    city pairs (a < b), exact-integer Pearson sums per pair. Cities x
    days everywhere — the fact table is touched once."""
    return (
        "cd AS (SELECT city_name, CAST(timestamp_dt AS DATE) AS day, "
        "CAST(ROUND(CAST(SUM(CAST(temperature AS BIGINT)) AS DOUBLE) "
        "* 1000.0e0 / COUNT(temperature)) AS BIGINT) AS t_mdeg "
        "FROM enriched WHERE temperature IS NOT NULL "
        "GROUP BY city_name, CAST(timestamp_dt AS DATE)), "
        "pr AS (SELECT a.city_name AS city1, b.city_name AS city2, "
        "a.t_mdeg AS x, b.t_mdeg AS y FROM cd a JOIN cd b "
        "ON a.day = b.day AND a.city_name < b.city_name), "
        "s AS (SELECT city1, city2, COUNT(*) AS n, SUM(x) AS sx, "
        "SUM(y) AS sy, SUM(x * x) AS sxx, SUM(y * y) AS syy, "
        "SUM(x * y) AS sxy FROM pr GROUP BY city1, city2) "
        "SELECT city1, city2, CAST(n AS BIGINT) AS n_shared_days, "
        + rnd(
            "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / "
            "(SQRT(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * "
            "SQRT(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))",
            6,
        )
        + " AS temp_correlation FROM s WHERE n > 1"
    )


@query(
    "weather_city_correlation",
    oracle=(
        "WITH " + wd.oracle_enriched_cte() + ", " + _citycorr_sql()
    ),
)
def weather_city_correlation(spark, sf_dir):
    """Which cities' temperatures move together: Pearson correlation of
    daily mean temperature between every city pair over their shared
    days — the teleconnection/similar-climate matrix a forecaster uses
    to borrow strength across stations (and the input to clustering
    stations for shared models). Day-grain reduction first, so the
    pair self-join is cities x days, never observations; daily means
    snap to milli-degrees and the correlation runs on exact integer
    moment sums."""
    wd.enriched_frame(spark, sf_dir).createOrReplaceTempView("enriched")
    return spark.sql("WITH " + _citycorr_sql())


# --- Z-order (Morton) spatial clustering key -------------------------------

_ZBITS = 10  # 10 bits per axis -> 20-bit Morton code, 1024x1024 grid


def _zquant(col: str, lo: float, hi: float) -> str:
    """Quantize a coordinate to [0, 2^_ZBITS) — engine-neutral SQL."""
    n = 1 << _ZBITS
    return (
        f"LEAST(GREATEST(CAST(FLOOR((({col}) - {lo}.0e0) / "
        f"{hi - lo}.0e0 * {n}.0e0) AS BIGINT), 0), {n - 1})"
    )


def _morton(qlat: str, qlon: str) -> str:
    """Bit-interleave two quantized axes into one Morton code using only
    FLOOR/division/modulo/multiply-by-power-of-two — the portable subset
    Spark SQL and DuckDB evaluate identically (no dialect-specific shift
    operators). 2*_ZBITS unrolled terms of narrow integer arithmetic."""
    terms = []
    for i in range(_ZBITS):
        p = 1 << i
        terms.append(
            f"((CAST(FLOOR(({qlat}) / {p}.0e0) AS BIGINT) % 2) "
            f"* {2 * 4 ** i})"
        )
        terms.append(
            f"((CAST(FLOOR(({qlon}) / {p}.0e0) AS BIGINT) % 2) "
            f"* {4 ** i})"
        )
    return "(" + " + ".join(terms) + ")"


_Z_CELL_SQL = (
    "q AS (SELECT "
    + _morton(_zquant("lat", -90, 90), _zquant("lon", -180, 180))
    + " AS z, temperature FROM enriched), "
    # top 5 interleaved levels = z div 4^5: a 32x32 coarse grid whose
    # cells are CONTIGUOUS Morton ranges (the data-skipping property)
    "c AS (SELECT CAST(FLOOR(z / 1024.0e0) AS BIGINT) AS zcell, z, "
    "temperature FROM q) "
    "SELECT zcell, COUNT(*) AS n_obs, "
    "MIN(z) AS z_min, MAX(z) AS z_max, "
    "SUM(CAST(temperature AS BIGINT)) AS sum_temp "
    "FROM c GROUP BY zcell"
)


@query(
    "geo_zorder_cells",
    oracle=(
        "WITH " + wd.oracle_enriched_cte() + ", " + _Z_CELL_SQL
    ),
)
def geo_zorder_cells(spark, sf_dir):
    """Z-ORDER (Morton) spatial clustering key: lat/lon quantized to a
    1024x1024 grid and bit-interleaved into one BIGINT, aggregated to
    the 32x32 coarse level with each cell's Morton RANGE (z_min/z_max).
    This is the key Delta/Iceberg `OPTIMIZE ZORDER BY` sorts files by:
    a 1-D sort on z gives 2-D locality, so parquet min/max stats on ONE
    column skip row groups for any lat AND lon box predicate — the
    100 TB answer to spatial filtering without a spatial index. The
    code is 2x10 unrolled narrow integer terms (no UDF, no shuffle
    before the bounded 1024-cell aggregate); z_min/z_max per cell being
    tight, disjoint ranges is exactly the property that makes the
    file-level skipping work, demonstrated here engine-identically.
    Extends SURVEY §2's geo surface (the reference plots raw lat/lon,
    ref:streamlit/app.py:243-245, but never computes with them)."""
    wd.enriched_frame(spark, sf_dir).createOrReplaceTempView("enriched")
    return spark.sql("WITH " + _Z_CELL_SQL)


# --- IDW leave-one-out cross-validation -------------------------------------

def _idw_loocv_sql(src: str) -> str:
    """Shared text: same station frame and snapped relative inverse-
    square weights as _idw_sql, but each station is predicted from the
    OTHERS (a <> b pair frame, stations^2 — dimension-bounded) and the
    error against its own observed mean closes the loop. The final row
    set is per-station plus exact milli-degree absolute errors."""
    return (
        f"obs AS (SELECT lat, lon, temperature, city_name FROM {src}), "
        "st AS (SELECT city_name AS station_city, "
        "CAST(SUM(CAST(ROUND(lat * 1.0e4) AS BIGINT)) AS DOUBLE) "
        "/ (1.0e4 * COUNT(*)) AS s_lat, "
        "CAST(SUM(CAST(ROUND(lon * 1.0e4) AS BIGINT)) AS DOUBLE) "
        "/ (1.0e4 * COUNT(*)) AS s_lon, "
        "CAST(ROUND(CAST(SUM(CAST(temperature AS BIGINT)) AS DOUBLE) "
        "* 1000.0e0 / COUNT(temperature)) AS BIGINT) AS t_mdeg "
        "FROM obs GROUP BY city_name), "
        "d AS (SELECT a.station_city, a.t_mdeg AS t_true, "
        "b.t_mdeg AS t_nbr, GREATEST("
        + _hav_ukm("a.s_lat", "a.s_lon", "b.s_lat", "b.s_lon")
        + ", 1) AS d_ukm "
        "FROM st a JOIN st b ON a.station_city <> b.station_city), "
        "dm AS (SELECT station_city, MIN(d_ukm) AS d_min "
        "FROM d GROUP BY station_city), "
        "wts AS (SELECT d.station_city, d.t_true, d.t_nbr, "
        "CAST(ROUND(1.0e9 * (CAST(dm.d_min AS DOUBLE) / d.d_ukm) "
        "* (CAST(dm.d_min AS DOUBLE) / d.d_ukm)) AS BIGINT) AS wu "
        "FROM d JOIN dm ON d.station_city = dm.station_city), "
        "pr AS (SELECT station_city, MAX(t_true) AS t_true_mdeg, "
        "CAST(ROUND(CAST(SUM(wu * t_nbr) AS DOUBLE) / SUM(wu)) "
        "AS BIGINT) AS t_pred_mdeg, "
        "CAST(SUM(CASE WHEN wu > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_neighbors FROM wts GROUP BY station_city) "
        "SELECT station_city, n_neighbors, "
        "CAST(t_true_mdeg AS DOUBLE) / 1000.0e0 AS t_observed, "
        "CAST(t_pred_mdeg AS DOUBLE) / 1000.0e0 AS t_predicted, "
        "CAST(ABS(t_pred_mdeg - t_true_mdeg) AS DOUBLE) / 1000.0e0 "
        "AS abs_error, "
        "CAST(ROUND(CAST(SUM(ABS(t_pred_mdeg - t_true_mdeg)) OVER () "
        "AS DOUBLE) / COUNT(*) OVER ()) AS DOUBLE) / 1000.0e0 "
        "AS loocv_mae FROM pr"
    )


@query(
    "geo_idw_loocv",
    oracle=(
        "WITH " + wd.oracle_enriched_cte() + ", "
        + _idw_loocv_sql("enriched")
    ),
)
def geo_idw_loocv(spark, sf_dir):
    """Leave-one-out cross-validation of the IDW temperature field: hold
    each station out, predict its mean from the OTHERS with the same
    snapped relative inverse-square weights as geo_idw_interpolation,
    and report per-station absolute error plus the pooled LOOCV MAE —
    the number that tells you whether the interpolated map
    (geo_idw_interpolation) can be trusted between stations, and which
    station's neighborhood the model fails in (an isolated station
    with a big error means 'add a sensor there', not 'the map is
    fine'). The pair frame is stations^2 — dimension-bounded, never
    event-bounded — and every cross-row sum is an exact BIGINT; the
    fact table is touched exactly once for the station aggregate. The
    global MAE window runs over the station frame (bounded by the
    station domain)."""
    wd.enriched_frame(spark, sf_dir).createOrReplaceTempView(
        "idwcv_enriched"
    )
    return spark.sql("WITH " + _idw_loocv_sql("idwcv_enriched"))
