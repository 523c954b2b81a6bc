"""corpus_span_corruption: the T5 denoising invariant — splicing each
target span back over its sentinel in the input must reconstruct the
original document exactly, for every document. This is the property
that makes the op usable as a training-objective generator (a masking
defect that happened to produce plausible-looking strings would still
break reconstruction)."""

from __future__ import annotations

import re

from weather_bigdata_project_spark import registry
from tests.conftest import SF_SMOKE


def _reconstruct(inputs: str, targets: str) -> str:
    spans: dict[int, list[str]] = {}
    cur = None
    for tok in targets.split(" "):
        m = re.fullmatch(r"<extra_id_(\d+)>", tok)
        if m:
            cur = int(m.group(1))
            spans[cur] = []
        else:
            spans[cur].append(tok)
    out: list[str] = []
    for tok in inputs.split(" "):
        m = re.fullmatch(r"<extra_id_(\d+)>", tok)
        if m:
            out.extend(spans[int(m.group(1))])
        else:
            out.append(tok)
    return " ".join(out)


def test_span_corruption_reconstructs_every_document(spark):
    rows = registry.QUERIES["corpus_span_corruption"](
        spark, SF_SMOKE
    ).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert len(rows) == len(docs)
    n_with_mask = 0
    for r in rows:
        assert _reconstruct(r.inputs, r.targets) == docs[r.doc_id], r.doc_id
        # the final sentinel closes the target (T5 convention)
        assert r.targets.endswith(f"<extra_id_{r.n_windows}>")
        # bookkeeping: masked tokens counted = tokens missing from input
        n_in = len(r.inputs.split(" ")) - r.n_windows  # minus sentinels
        assert n_in + r.n_masked == r.n_tokens
        if r.n_masked:
            n_with_mask += 1
    # the masking actually fires on this corpus (not vacuously green)
    assert n_with_mask > len(rows) * 0.5


def test_span_corruption_is_deterministic(spark):
    q = registry.QUERIES["corpus_span_corruption"]
    a = {r.doc_id: (r.inputs, r.targets) for r in q(spark, SF_SMOKE).collect()}
    b = {r.doc_id: (r.inputs, r.targets) for r in q(spark, SF_SMOKE).collect()}
    assert a == b


def test_cdc_chunks_are_shift_robust(spark):
    """The property that justifies CDC over fixed-frame chunking:
    prepending one token must leave every chunk beyond the first
    boundary IDENTICAL (content-defined boundaries), whereas all
    fixed 10-token frames shift. Also: cut arithmetic covers every
    token exactly once, in order."""
    from weather_bigdata_project_spark.queries.dedup import (
        _cdc_chunks_spark,
    )

    base = " ".join(f"tok{i % 23}x{i % 7}" for i in range(120))
    shifted = "INSERTED " + base
    df = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r.chs
        for r in df.selectExpr(
            "doc_id", _cdc_chunks_spark() + " AS chs"
        ).collect()
    }
    a, b = rows[1], rows[2]
    # lossless cover, order preserved
    assert " ".join(a) == base and " ".join(b) == shifted
    # content-defined: the chunk SETS agree beyond the edited prefix
    shared = set(a) & set(b)
    assert a[-1] in shared and len(shared) >= len(a) - 2
    # fixed frames would share nothing: every 10-token frame of
    # `shifted` differs from every 10-token frame of `base`
    toks_a, toks_b = base.split(" "), shifted.split(" ")
    fa = {" ".join(toks_a[i:i + 10]) for i in range(0, len(toks_a), 10)}
    fb = {" ".join(toks_b[i:i + 10]) for i in range(0, len(toks_b), 10)}
    assert not fa & fb
