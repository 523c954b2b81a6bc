"""The sanctioned Python-execution patterns, demonstrated and fenced.

Doctrine (SCALE.md): the hot path is JVM-only — every operator family in
this engine compiles to Catalyst expressions, and tests/test_plans.py
fails if a Python eval node appears in their plans. When Python is
genuinely required (native libraries, per-record logic Spark can't
express), these are the TWO acceptable shapes:

- `@pandas_udf` — Arrow-batched, vectorized numpy inside: ~10-100x the
  throughput of a row-at-a-time `F.udf` (each row of a Python UDF pays
  pickle + interpreter dispatch; a pandas UDF amortizes both over a
  columnar batch);
- `@udtf` (Spark 4 Python user-defined TABLE function) — one input row
  to N output rows with per-row Python state, the lateral-view shape.

Both exist here as working references with JVM twins proving result
parity — so a contributor reaching for Python can copy the right
pattern, and the review question is always "why not the JVM twin?".
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import LongType

#: JVM twin (queries/geo.py builds the same expression): micro-km
#: haversine — the pandas UDF must agree exactly AFTER the integer snap
#: (numpy libm and JVM trig differ in the last ulp; the snap absorbs it,
#: same argument the geo family's oracle parity rests on).


@pandas_udf(LongType())
def haversine_ukm_pandas(
    lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series
) -> pd.Series:
    """Vectorized haversine in integer micro-km. Arrow ships the four
    double columns as one batch; numpy does the trig column-at-a-time —
    no per-row Python. Use ONLY where a native library forces Python;
    the JVM expression twin wins otherwise (codegen, no IPC)."""
    import numpy as np

    p1, p2 = np.radians(lat1.to_numpy()), np.radians(lat2.to_numpy())
    dphi = p2 - p1
    dlmb = np.radians(lon2.to_numpy() - lon1.to_numpy())
    a = (
        np.sin(dphi / 2.0) ** 2
        + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2.0) ** 2
    )
    d = 2.0 * 6371.0 * np.arcsin(np.sqrt(a))
    return pd.Series(np.round(d * 1.0e6).astype("int64"))


@udtf(returnType="pos INT, chunk STRING, n_tokens INT")
class ChunkTokens:
    """Python UDTF: split a text into fixed-width token chunks, one
    output row per chunk — the lateral-view shape with per-row Python.
    The JVM twin is the in-row transform in queries/dedup.py
    (dedup_chunk_level); this class exists as the pattern reference for
    cases where the chunker is a real tokenizer library."""

    def eval(self, text: str, width: int):
        if text is None:
            return
        toks = text.split(" ")
        for i in range(0, len(toks), width):
            part = toks[i : i + width]
            yield (i // width, " ".join(part), len(part))


def chunk_tokens_jvm(df, text_col: str, width: int):
    """The JVM twin of ChunkTokens: same (pos, chunk, n_tokens) rows
    from a narrow in-row transform + posexplode. Prefer this."""
    grams = (
        f"transform(sequence(0, CAST((size(split({text_col}, ' ')) "
        f"+ {width} - 1) div {width} AS INT) - 1), "
        f"i -> named_struct("
        f"'chunk', array_join(slice(split({text_col}, ' '), "
        f"i * {width} + 1, {width}), ' '), "
        f"'n_tokens', size(slice(split({text_col}, ' '), "
        f"i * {width} + 1, {width}))))"
    )
    return df.select(
        "*", F.posexplode(F.expr(grams)).alias("pos", "c")
    ).select(
        "*", F.col("c.chunk").alias("chunk"),
        F.col("c.n_tokens").alias("n_tokens"),
    ).drop("c")
