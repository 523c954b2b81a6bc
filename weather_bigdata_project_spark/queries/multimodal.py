"""Multimodal column queries (binary payload plumbing, SURVEY north-star
extension)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import multimodal as M
from ..operators import textops as T
from ..registry import query


@query(
    "multimodal_binary_meta",
    oracle=(
        "SELECT doc_id, octet_length(encode(text)) AS byte_len, "
        "sha256(text) AS sha256_hex FROM documents"
    ),
)
def multimodal_binary_meta(spark, sf_dir):
    """Typed metadata over an opaque binary column: byte length + content
    hash. The parquet scan prunes the binary column when only metadata is
    selected — at 100 TB this is the difference between a metadata query
    reading gigabytes or petabytes."""
    return M.with_binary_payload(T.docs(spark, sf_dir)).select(
        "doc_id", "byte_len", "sha256_hex"
    )


@query("multimodal_decode_features")  # no SQL oracle: Pandas-UDF pipeline
def multimodal_decode_features(spark, sf_dir):
    """Arrow-batched decode/feature-extract via mapInPandas (decode kernel
    stubbed — see operators/multimodal.py). Driver records rows-only; unit
    tests assert the deterministic fake output shape and values."""
    return M.decode_media(M.with_binary_payload(T.docs(spark, sf_dir)))


@query("multimodal_resize")  # no SQL oracle: Pandas-UDF resample kernel
def multimodal_resize(spark, sf_dir):
    """Aspect-preserving resize: geometry JVM-side, resample as an
    Arrow-vectorized pandas_udf (stubbed — operators/multimodal.py).
    Unit tests pin the deterministic output."""
    return M.resize_media(
        M.decode_media(M.with_binary_payload(T.docs(spark, sf_dir)))
    )


@query("multimodal_frame_sample")  # no SQL oracle: derives from decode stub
def multimodal_frame_sample(spark, sf_dir):
    """Stride-2 frame sampling: sequence+explode selects frame indices
    JVM-side; only sampled frames would ever reach a real decoder."""
    return M.sample_frames(
        M.decode_media(M.with_binary_payload(T.docs(spark, sf_dir))), stride=2
    )


@query(
    "multimodal_feature_agg",
    oracle=None,  # depends on the stubbed decode; checked by unit tests
)
def multimodal_feature_agg(spark, sf_dir):
    """Post-decode analytics: average first-feature per frame-count band —
    the downstream consumer shape (features -> grouped stats)."""
    dec = M.decode_media(M.with_binary_payload(T.docs(spark, sf_dir)))
    return (
        dec.select(
            "n_frames", F.element_at(F.col("feature"), 1).alias("f0")
        )
        .groupBy("n_frames")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "(CAST(SUM(CAST(ROUND(f0 * 1000000.0e0) AS BIGINT)) AS DOUBLE)"
                " / (1000000.0e0 * COUNT(*)))"
            ).alias("avg_f0"),
        )
    )


@query("multimodal_phash_neardup")  # no SQL oracle: pandas_udf hash kernel
def multimodal_phash_neardup(spark, sf_dir):
    """Perceptual-hash near-dup pairs over the binary media column
    (stub pHash kernel, real LSH-band plumbing — see
    operators/multimodal.py phash_neardup_pairs). Driver records
    rows-only; the banding/verify math is unit-tested in
    tests/test_multimodal.py."""
    b = M.with_binary_payload(T.docs(spark, sf_dir))
    return M.phash_neardup_pairs(b)


@query(
    "multimodal_exact_dupes",
    oracle=(
        "SELECT sha256(text) AS sha256_hex, "
        "COUNT(*) AS n_copies, MIN(doc_id) AS canonical_id, "
        "MAX(doc_id) AS max_dup_id "
        "FROM documents GROUP BY sha256(text) HAVING COUNT(*) >= 2"
    ),
)
def multimodal_exact_dupes(spark, sf_dir):
    """Exact-bytes dedup over the opaque binary payload: group by the
    content hash, keep groups with >= 2 copies, elect the lowest doc_id
    canonical. This is byte-identical asset dedup (re-uploaded images,
    mirrored audio) — the multimodal twin of dedup_exact, and the ONE
    multimodal query that is fully oracle-checkable because hashing
    needs no decode kernel. The payload is hashed once in-row (the scan
    never ships bytes past the hash projection); the aggregate's keys
    are digest-cardinality. At 100 TB run it as the first pass before
    any perceptual near-dup (multimodal_phash_neardup) — exact dupes
    are the cheap majority of waste."""
    b = M.with_binary_payload(T.docs(spark, sf_dir))
    return (
        b.groupBy("sha256_hex")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_id"),
            F.max("doc_id").alias("max_dup_id"),
        )
        .filter(F.col("n_copies") >= 2)
    )


@query("multimodal_audio_segments")  # no SQL oracle: pandas_udf kernel
def multimodal_audio_segments(spark, sf_dir):
    """Audio VAD segmentation over the binary payload column: JVM-side
    fixed-rate framing (20 ms / 640 B) and gaps-and-islands segment
    merge around ONE Arrow-batched energy kernel (stubbed — see
    operators/multimodal.py). The silence-trim pass an audio curation
    pipeline runs before paying for ASR; driver records rows-only, the
    deterministic kernel + segment assembly are unit-tested in
    tests/test_multimodal.py."""
    return M.audio_voiced_segments(
        M.with_binary_payload(T.docs(spark, sf_dir))
    )
