"""Python-boundary execution surface: Spark 4 Python UDTF (LATERAL
table function), Arrow-vectorized pandas UDF, and mapInArrow — each
oracle-GATED so the plumbing (schemas, Arrow batch transfer, LATERAL
correlation) is verified exactly, not just smoke-tested.

Doctrine (SCALE.md): UDFs are the slow path — every production operator
in this repo stays JVM-side. These three queries exist because a real
pipeline sometimes cannot avoid Python (a tokenizer from a Python
package, a custom C extension behind pyarrow); when that day comes, the
batch shape, null behavior, and type mapping of each escape hatch must
already be pinned. Each query deliberately computes something the JVM
path ALSO computes elsewhere, so its DuckDB oracle is exact:

- `corpus_chunk_udtf` == `corpus_chunk_windows` (JVM HOF twin);
- `text_token_stats_arrow` ~ `text_token_stats` (JVM split/size twin);
- `events_mapinarrow_value_cents` == a trivial SQL projection.

Per-row Python cost is amortized by Arrow batches (10-100x over
row-at-a-time pickling); the UDTF runs under
`spark.sql.execution.pythonUDTF.arrow.enabled=true`.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string type
# hints against module globals (PEP 563 is in force here)
from pyspark.sql import functions as F

from .. import tables
from ..functions.exprs import rnd
from ..operators import textops as T
from ..registry import query
from .curation import _CHUNK_WIN_ORACLE, _WIN_S, _WIN_W

# --- Python UDTF: sliding-window chunker ----------------------------------


@query("corpus_chunk_udtf", oracle=_CHUNK_WIN_ORACLE)
def corpus_chunk_udtf(spark, sf_dir):
    """The `corpus_chunk_windows` chunker re-expressed as a Spark 4
    Python UDTF applied via LATERAL — one UDTF eval per document emits
    its overlapping windows. Same output, same oracle as the JVM HOF
    version; the point is pinning the UDTF surface: per-row fan-out
    through Arrow, BIGINT/STRING type mapping, LATERAL correlation
    against a real table. Still zero shuffles — the UDTF is a narrow
    Generate over the scan; only the executor<->Python hop (absent from
    the HOF twin) is new, which is exactly what a genuinely-Python
    chunker (sentencepiece, spaCy) would pay."""
    from pyspark.sql.functions import udtf

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    @udtf(returnType="win_idx BIGINT, window_text STRING, n_tokens BIGINT")
    class ChunkWindows:
        def eval(self, text: str):
            toks = text.split(" ")
            n = len(toks)
            for w, i in enumerate(range(0, n, _WIN_S)):
                piece = toks[i : i + _WIN_W]
                yield w, " ".join(piece), len(piece)

    spark.udtf.register("chunk_windows_udtf", ChunkWindows)
    T.docs(spark, sf_dir).createOrReplaceTempView("pyexec_docs")
    return spark.sql(
        "SELECT d.doc_id, c.win_idx, c.window_text, c.n_tokens "
        "FROM pyexec_docs d, LATERAL chunk_windows_udtf(d.text) c"
    )


# --- Arrow-vectorized pandas UDF: token counting --------------------------


@query(
    "text_token_stats_arrow",
    oracle=(
        "SELECT doc_id, "
        "len(string_split(text, ' ')) AS n_tokens, "
        "len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+')) "
        "AS n_regex_tokens FROM documents"
    ),
)
def text_token_stats_arrow(spark, sf_dir):
    """Token counting through an Arrow-batched `pandas_udf` — the
    vectorized escape hatch (pandas .str ops on whole Arrow batches,
    never per-row pickling). Exact-match twin of the JVM
    `text_token_stats` path; integer outputs make parity trivial. The
    plan shows ArrowEvalPython — allowed HERE by design, and the reason
    this query is not in the hot-path roster."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def n_tokens(s: pd.Series) -> pd.Series:
        return s.str.split(" ").str.len().astype("int64")

    @pandas_udf("bigint")
    def n_regex_tokens(s: pd.Series) -> pd.Series:
        return s.str.count("[a-zA-Z]+|[0-9]+").astype("int64")

    return T.docs(spark, sf_dir).select(
        "doc_id",
        n_tokens("text").alias("n_tokens"),
        n_regex_tokens("text").alias("n_regex_tokens"),
    )


# --- mapInArrow: batch-native pass ----------------------------------------


@query(
    "events_mapinarrow_value_cents",
    oracle=(
        "SELECT event_id, CAST(ROUND(value * 100.0e0) AS BIGINT) "
        "AS value_cents FROM events"
    ),
)
def events_mapinarrow_value_cents(spark, sf_dir):
    """Exact-cents projection through `mapInArrow` — the zero-copy
    batch-native escape hatch (pyarrow.compute on RecordBatches, no
    pandas conversion). The kernel (round half-away, cast) mirrors the
    engine-wide `cents` idiom bit-for-bit, so the oracle is exact. This
    is the template for binary-columnar kernels (image decode lives on
    the same API in operators/multimodal.py); here the kernel is
    deliberately trivial so parity checks the PLUMBING: Arrow schema
    mapping, batch iteration, column replacement."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = tables.load(spark, sf_dir, "events").select("event_id", "value")

    def kernel(batches):
        for b in batches:
            cents = pc.cast(
                pc.round(
                    pc.multiply(b.column("value"), pa.scalar(100.0)),
                    ndigits=0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("event_id"), cents],
                names=["event_id", "value_cents"],
            )

    return ev.mapInArrow(
        kernel, "event_id BIGINT, value_cents BIGINT"
    )


# --- grouped-aggregate pandas UDF: 10%-trimmed mean -----------------------

_TRIM_ORACLE = (
    "WITH " + tables.EVENTS_ORACLE_CTE + ", "
    "r AS (SELECT event_type, "
    "CAST(ROUND(value * 100.0e0) AS BIGINT) AS v_c, "
    "ROW_NUMBER() OVER (PARTITION BY event_type "
    "ORDER BY value, event_id) AS rn, "
    "COUNT(*) OVER (PARTITION BY event_type) AS n FROM events_t), "
    "kept AS (SELECT event_type, v_c, n, "
    "CAST(FLOOR(0.1e0 * n) AS BIGINT) AS k FROM r "
    "WHERE rn > CAST(FLOOR(0.1e0 * n) AS BIGINT) "
    "AND rn <= n - CAST(FLOOR(0.1e0 * n) AS BIGINT)) "
    "SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_total, "
    "CAST(COUNT(*) AS BIGINT) AS n_kept, "
    + rnd("CAST(SUM(v_c) AS DOUBLE) / (100.0e0 * COUNT(*))", 4)
    + " AS trimmed_mean FROM kept GROUP BY event_type"
)


@query("events_trimmed_mean_pandas", oracle=_TRIM_ORACLE)
def events_trimmed_mean_pandas(spark, sf_dir):
    """GROUPED_AGG pandas UDF surface: per-type 10%-trimmed mean of
    value computed by an Arrow-batched pandas aggregation (sort, drop
    floor(0.1 n) from each tail, mean) — the fourth Python-boundary
    shape next to scalar pandas UDF / mapInArrow / UDTF. The trimmed
    SET is a deterministic multiset (value-order trim), so the DuckDB
    oracle reproduces it exactly with rank windows and an exact-cents
    mean; the UDF mean is computed from integer cents (exact int sum,
    one double division) so both engines round the SAME exact value —
    no float-noise flake at a rnd(4) boundary. Scale note: the
    whole group's values ship to Python per key — the JVM rank-window
    twin in the oracle IS the production plan; this query pins the
    escape hatch's semantics for the day a pandas-only estimator is
    genuinely required."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        s = v.sort_values().reset_index(drop=True)
        k = int(len(s) // 10)
        kept = s.iloc[k : len(s) - k] if len(s) - 2 * k > 0 else s
        # exact integer-cents sum, ONE double division — bit-identical
        # to the oracle's CAST(SUM(v_c) AS DOUBLE)/(100*n), so the
        # rnd(4) snap sees the same exact value in both engines
        cents = int((kept * 100.0).round().astype("int64").sum())
        return float(cents) / (100.0 * len(kept))

    ev = tables.load(spark, sf_dir, "events")
    # a GROUPED_AGG pandas UDF cannot share an agg with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — counts come from a second tiny
    # aggregate joined on the group key
    tm = ev.groupBy("event_type").agg(
        trimmed_mean(F.col("value")).alias("tm_raw")
    )
    cnt = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_total"))
    out = tm.join(F.broadcast(cnt), "event_type")
    return out.selectExpr(
        "event_type",
        "CAST(n_total AS BIGINT) AS n_total",
        "CAST(n_total - 2 * CAST(FLOOR(0.1e0 * n_total) AS BIGINT) "
        "AS BIGINT) AS n_kept",
        rnd("tm_raw", 4) + " AS trimmed_mean",
    )
