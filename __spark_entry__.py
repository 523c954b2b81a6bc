"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over `weather_bigdata_project_spark.registry`, which holds one
entry per implemented operator from SURVEY.md §2 plus the extension
surface (dedup / similarity / text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weather_bigdata_project_spark import registry  # noqa: E402

registry.load()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The full reference pipeline (wire parse -> cast battery -> derived
    meteorology -> classification -> anomaly flags -> alert routing),
    ref:spark-apps/weather_streaming.py:59-142.
    """
    return registry.QUERIES["weather_enrich"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() entry (keys absent
    here get the driver's weaker rows-only check)."""
    return dict(registry.ORACLES)
