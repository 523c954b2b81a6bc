"""Table loaders for the driver's parquet fixtures (TESTDATA.md).

All loads are plain `spark.read.parquet` — columnar, vectorized, predicate
pushdown + column pruning apply (the reference's lake was JSON-lines read
row-at-a-time in pandas, ref:streamlit/app.py:72-99; parquet is the single
biggest planned speedup recorded in SURVEY.md §4).

`events.parquet` carries parquet TIMESTAMP(NANOS) which Spark's reader
rejects outright; we read nanos as long (runtime conf) and convert to
timestamp_ntz(micros) with integer `div` (truncation — matches DuckDB's
TIMESTAMP_NS -> TIMESTAMP cast). The conversion is a cheap narrow
projection over a still-vectorized scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: DuckDB CTE that normalizes events.ts (TIMESTAMP_NS) to microsecond
#: precision exactly the way the Spark loader does (truncating integer
#: division). Prepend to any oracle SQL that touches `events.ts`.
EVENTS_ORACLE_CTE = (
    "events_t AS (SELECT event_id, "
    "make_timestamp(epoch_ns(ts) // 1000) AS ts, "
    "user_id, event_type, value, props FROM events)"
)


#: (applicationId, sf_dir, name) -> DataFrame. DataFrames are immutable
#: logical plans, so reuse is free; the memo skips the file listing +
#: footer schema read that spark.read.parquet repeats per call (tens of
#: ms each — real money across a 35-query benchmark sweep). Keyed by
#: applicationId so a new session never sees a stale plan.
_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; events gets its ns->us timestamp fixup."""
    tune(spark)
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key in _CACHE:
        return _CACHE[key]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, "
                "to_timestamp_ntz('1970-01-01 00:00:00'))"
            ),
        )
    _CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
