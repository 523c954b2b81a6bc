"""Query registry: every operator from SURVEY.md §2 (+ extensions) as a
(name -> Spark callable, name -> DuckDB oracle SQL) pair.

Conventions (driver contract, __spark_entry__.py):
- each callable: (spark, sf_dir) -> DataFrame;
- every computed column aliased identically in Spark and oracle SQL;
- ordering never matters (driver hash is order-insensitive) but LIMIT
  queries use a total order (unique tie-break key) so both engines pick
  the same rows;
- doubles that aggregate across rows are rounded at the output edge in
  BOTH engines so partition-order float noise cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; `oracle=None` => driver does rows-only check."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# import for registration side effects (order = SURVEY §2 order).
# Deferred into a function so `registry` itself is cycle-free: query
# modules do `from ..registry import query` at import time, which must
# not re-enter these imports while a sibling module is half-initialized.
_LOADED = False


def load() -> None:
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    from .queries import weather  # noqa: F401
    from .queries import analytics  # noqa: F401
    from .queries import relational  # noqa: F401
    from .queries import advanced  # noqa: F401
    from .queries import tpch_extra  # noqa: F401
    from .queries import tpch_rest  # noqa: F401
    from .queries import stats  # noqa: F401
    from .queries import behavior  # noqa: F401
    from .queries import reshape  # noqa: F401
    from .queries import timeseries  # noqa: F401
    from .queries import warehouse  # noqa: F401
    from .queries import dedup  # noqa: F401
    from .queries import similarity  # noqa: F401
    from .queries import text  # noqa: F401
    from .queries import retrieval  # noqa: F401
    from .queries import ml  # noqa: F401
    from .queries import nonparam  # noqa: F401
    from .queries import pyexec  # noqa: F401
    from .queries import curation  # noqa: F401
    from .queries import geo  # noqa: F401
    from .queries import jsonops  # noqa: F401
    from .queries import multimodal  # noqa: F401
    from .queries import spark4  # noqa: F401
    from .queries import pipeline  # noqa: F401  (composes the above)
