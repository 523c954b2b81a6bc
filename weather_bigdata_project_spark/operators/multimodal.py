"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched Pandas functions
(`mapInPandas`) — the only operator family where Python executes at
runtime, and it does so vectorized per Arrow batch, never per row.

The container has no image/audio libraries, so the *decode* kernel is a
deterministic stub (clearly marked below); everything around it — schema,
binary synthesis, batch iteration, partition behavior, output typing —
is the real Spark plumbing a production decode would use (swap
`_decode_stub` for a PIL/ffmpeg call behind the same signature).

At 100 TB: binary payloads dominate I/O, so (a) metadata-only queries
must prune the binary column at the parquet scan (columnar => free),
(b) decode runs `mapInPandas` with `spark.sql.execution.arrow
.maxRecordsPerBatch` sized so a batch of decoded frames fits executor
memory, (c) repartition by content-size bands before decode to avoid
stragglers on mixed payload sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

DECODED_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("byte_len", Ty.LongType()),
        Ty.StructField("width", Ty.IntegerType()),
        Ty.StructField("height", Ty.IntegerType()),
        Ty.StructField("n_frames", Ty.IntegerType()),
        Ty.StructField("feature", Ty.ArrayType(Ty.DoubleType())),
    ]
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque binary column (utf-8 payload bytes) + typed
    metadata — the shape a real image/audio table has: (id, content:
    binary, media_type, byte_len, sha)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.encode(F.col("text"), "utf-8")).alias("byte_len"),
        F.sha2(F.encode(F.col("text"), "utf-8"), 256).alias("sha256_hex"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int, list[float]]:
    """STUB — stands in for the real decoder (PIL.Image.open /
    torchaudio.load / pyav frame sampling), which is not installable in
    this container. Deterministic fake derived from payload bytes so
    tests are stable. A real deployment replaces ONLY this function."""
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0
    width = 16 + checksum % 64
    height = 16 + (checksum // 64) % 64
    n_frames = 1 + n % 8
    feature = [float((checksum + i * 31) % 97) / 97.0 for i in range(8)]
    return width, height, n_frames, feature


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Serialize raw RGB bytes as a binary PPM (P6) image — the real,
    spec-compliant wire format (netpbm): ASCII header 'P6\\n<w> <h>\\n
    255\\n' followed by w*h*3 raw bytes. Used by tests to synthesize
    genuine image payloads the real decoder below parses."""
    assert len(pixels) == width * height * 3
    return f"P6\n{width} {height}\n255\n".encode("ascii") + pixels


def _parse_p6(payload: bytes):
    """Parse a binary PPM (P6) payload into (width, height, pixel
    ndarray): magic, whitespace/comment-tolerant header, maxval check,
    then the raw RGB plane via numpy. Raises ValueError on a non-PPM
    payload — a real decoder fails loudly, it does not hash garbage.
    Shared by the decode-stats kernel and the real resize kernel."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # tokenize header: magic, width, height, maxval; '#' starts a
    # comment running to end-of-line (netpbm spec)
    toks, i, n = [], 2, len(payload)
    while len(toks) < 3 and i < n:
        c = payload[i:i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < n and payload[i:i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            toks.append(payload[i:j])
            i = j
    if len(toks) < 3:
        raise ValueError("truncated PPM header")
    width, height, maxval = (int(t) for t in toks)
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    i += 1  # single whitespace after maxval, per spec
    want = width * height * 3
    raw = payload[i:i + want]
    if len(raw) < want:
        raise ValueError("truncated PPM pixel plane")
    return width, height, np.frombuffer(raw, dtype=np.uint8).reshape(
        height, width, 3
    )


def _decode_ppm(payload: bytes) -> tuple[int, int, int, list[float]]:
    """REAL image decode: the P6 parser above + a feature vector
    (8 doubles, all single IEEE ops over exact integer sums so it is
    deterministic): mean R, mean G, mean B, mean gray, min gray,
    max gray, aspect ratio, fill ratio (pixels present / declared)."""
    width, height, px = _parse_p6(payload)
    sums = px.sum(axis=(0, 1), dtype="int64")  # exact per-channel
    npx = width * height
    gray = px.astype("int64").sum(axis=2)  # 3x gray, exact
    feature = [
        float(sums[0]) / npx,
        float(sums[1]) / npx,
        float(sums[2]) / npx,
        float(gray.sum()) / (3.0 * npx),
        float(gray.min()) / 3.0,
        float(gray.max()) / 3.0,
        float(width) / height,
        1.0,
    ]
    return width, height, 1, feature


_DECODE_KERNELS = {"stub": _decode_stub, "ppm": _decode_ppm}


def decode_batches(
    it: Iterator[pd.DataFrame], kernel: str = "stub"
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one decoded batch out.
    Vectorized transfer; per-batch Python cost amortized."""
    decode = _DECODE_KERNELS[kernel]
    for pdf in it:
        rows = []
        for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
            payload = bytes(content) if content is not None else b""
            width, height, n_frames, feature = decode(payload)
            rows.append(
                (int(doc_id), len(payload), width, height, n_frames, feature)
            )
        yield pd.DataFrame(
            rows, columns=[f.name for f in DECODED_SCHEMA.fields]
        )


def decode_media(binary_df: DataFrame, kernel: str = "stub") -> DataFrame:
    """Distributed decode/feature-extract over the binary column.
    kernel='stub' is the deterministic oracle path; kernel='ppm' runs
    the REAL netpbm P6 parser + numpy feature extraction over genuine
    image payloads (same mapInPandas plumbing, schema, and batching)."""
    return binary_df.select("doc_id", "content").mapInPandas(
        lambda it: decode_batches(it, kernel=kernel),
        schema=DECODED_SCHEMA,
    )


def resize_media(decoded: DataFrame, thumb_w: int = 32, thumb_h: int = 32) -> DataFrame:
    """Resize: aspect-preserving geometry (scale factor, output dims) is
    pure column arithmetic — stays JVM-side in whole-stage codegen. Only
    the resample crosses into Python, as an Arrow-vectorized scalar
    pandas_udf. This variant operates in FEATURE space (one IEEE
    multiply per element — the deterministic oracle path for the
    stub-decoded chain); the REAL pixel resample is `resize_ppm` below,
    a genuine average-pool over decoded P6 pixels behind the same Arrow
    batching, oracle-gated by byte arithmetic."""
    import pyspark.sql.functions as Fn

    @Fn.pandas_udf("array<double>")
    def _resample(feature: pd.Series, scale: pd.Series) -> pd.Series:
        # feature-space rescale — deterministic, vectorized per Arrow
        # batch. A single IEEE multiply per element: bit-exact in any
        # engine, which is what lets the DuckDB oracle hash-check this
        # Pandas-UDF pipeline end-to-end (no decimal rounding — Python
        # round() is banker's, SQL ROUND is not). Real pixel path:
        # resize_ppm below.
        return pd.Series(
            [
                [v * s for v in f] if f is not None else None
                for f, s in zip(feature, scale)
            ]
        )

    geo = decoded.select(
        "doc_id",
        "width",
        "height",
        F.expr(
            f"least(CAST({thumb_w} AS DOUBLE) / width, "
            f"CAST({thumb_h} AS DOUBLE) / height)"
        ).alias("scale"),
        "feature",
    ).select(
        "doc_id",
        "width",
        "height",
        F.expr("CAST(ROUND(width * scale) AS INT)").alias("thumb_w"),
        F.expr("CAST(ROUND(height * scale) AS INT)").alias("thumb_h"),
        "scale",
        "feature",
    )
    return geo.select(
        "doc_id", "width", "height", "thumb_w", "thumb_h",
        _resample("feature", "scale").alias("thumb_feature"),
    )


def sample_frames(decoded: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling: every `stride`-th frame index. Index selection is
    pure relational (sequence + posexplode — JVM-side, no Python at all);
    a real video pipeline would then decode ONLY the sampled indices in a
    mapInPandas kernel (pyav seek), which is what makes stride sampling a
    100 TB win — the skipped frames are never decoded. Here the per-frame
    feature lookup stands in for that decode."""
    return (
        decoded.select(
            "doc_id",
            "n_frames",
            F.expr(f"explode(sequence(0, n_frames - 1, {stride}))").alias(
                "frame_idx"
            ),
            "feature",
        )
        .select(
            "doc_id",
            "n_frames",
            "frame_idx",
            F.expr(
                "element_at(feature, 1 + frame_idx % 8)"
            ).alias("frame_feature"),
        )
    )


def _phash_stub(payload: bytes) -> int:
    """STUB — stands in for a real perceptual hash (pHash/dHash over
    decoded, resized pixels). Deterministic 64-bit signature from 64
    payload windows' parities, which is locality-sensitive the way a
    real pHash is: a small payload edit flips only the bits of the
    windows it touches. A real deployment replaces ONLY this function
    (PIL decode -> 8x8 DCT -> median threshold, same int64 out)."""
    bits = 0
    n = len(payload)
    for i in range(64):
        w = payload[i * 4:(i + 1) * 4]
        if (sum(w) + i) % 2 if n else i % 2:
            bits |= 1 << i
    # keep it in signed-int64 range for the BIGINT column
    return bits - (1 << 64) if bits >= (1 << 63) else bits


#: orthonormal 32x32 DCT-II basis, built once per executor process and
#: reused across Arrow batches (module-level lazy singleton)
_DCT_BASIS = None


def _dct_basis():
    global _DCT_BASIS
    if _DCT_BASIS is None:
        import numpy as np

        n = 32
        k = np.arange(n).reshape(-1, 1)
        x = np.arange(n).reshape(1, -1)
        m = np.cos(np.pi * (2 * x + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0, :] = np.sqrt(1.0 / n)
        _DCT_BASIS = m
    return _DCT_BASIS


def _phash_dct_batch(contents) -> "pd.Series":
    """REAL pHash math, batched over one Arrow batch: payload bytes ->
    32x32 grayscale plane (tile/truncate to 1024 bytes — the only
    stubbed step is this byte->pixel mapping, standing in for a PIL
    decode the container can't run) -> 2-D DCT-II via two matmuls ->
    top-left 8x8 low-frequency block -> median threshold (DC excluded
    from the median, classic pHash) -> 64-bit signature. All numpy,
    one (n, 32, 32) tensor per batch — no per-row Python loops beyond
    the byte unpack."""
    import numpy as np

    n = len(contents)
    planes = np.zeros((n, 32, 32), dtype=np.float64)
    for i, c in enumerate(contents):
        b = bytes(c) if c is not None else b""
        if not b:
            continue
        reps = -(-1024 // len(b))
        arr = np.frombuffer((b * reps)[:1024], dtype=np.uint8)
        planes[i] = arr.reshape(32, 32).astype(np.float64)
    m = _dct_basis()
    coefs = np.einsum("ij,njk,lk->nil", m, planes, m)
    low = coefs[:, :8, :8].reshape(n, 64)
    med = np.median(low[:, 1:], axis=1, keepdims=True)
    bits = (low > med).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    packed = (bits * weights).sum(axis=1, dtype=np.uint64)
    return pd.Series(packed.astype(np.int64))


#: fixed-point scale for the oracle-gated DCT basis: 2^16 keeps the
#: worst-case coefficient |c| <= 32 * (32*255*2^14) * 2^14 < 2^47 —
#: comfortably inside both int64 and the 2^53 exact-double window the
#: DuckDB oracle's aggregates pass through.
_DCT_INT_SCALE = 1 << 16

#: integer-snapped low-frequency DCT basis rows (8 x 32), built once:
#: B[u, x] = round(M[u, x] * 2^16) where M is the orthonormal DCT-II
#: basis above. Only the first 8 rows are needed for the 8x8
#: low-frequency block, which keeps the oracle's literal table small.
#: Built in pure Python (math.cos) so BOTH the Spark kernel and the
#: DuckDB oracle's literal table come from the SAME integers — no
#: cross-library float question can exist.
_DCT_BASIS_INT: list[list[int]] | None = None


def _dct_basis_int() -> list[list[int]]:
    global _DCT_BASIS_INT
    if _DCT_BASIS_INT is None:
        import math

        s0 = math.sqrt(1.0 / 32)
        s = math.sqrt(2.0 / 32)
        _DCT_BASIS_INT = [
            [
                round(
                    (
                        s0
                        if u == 0
                        else math.cos(math.pi * (2 * x + 1) * u / 64) * s
                    )
                    * _DCT_INT_SCALE
                )
                for x in range(32)
            ]
            for u in range(8)
        ]
    return _DCT_BASIS_INT


def _phash_dct_int_batch(contents) -> "pd.Series":
    """Oracle-gated variant of :func:`_phash_dct_batch`: the same pHash
    pipeline (tile bytes to a 32x32 plane, 2-D DCT-II, 8x8
    low-frequency block, DC-excluded median threshold) but with the
    DCT basis snapped to integer micro-units (round(M * 2^16)) so every
    coefficient is EXACT int64 arithmetic — a DuckDB oracle reproduces
    the 64-bit signature bit-for-bit from the raw bytes with the same
    integer literals (the tree's standard micro-unit trick, round-8
    verdict task 3). The float kernel stays for parity with textbook
    pHash; this one trades ~2^-16 basis quantization (irrelevant to a
    DEFINED signature) for cross-engine bit-equality."""
    import numpy as np

    n = len(contents)
    planes = np.zeros((n, 32, 32), dtype=np.int64)
    for i, c in enumerate(contents):
        b = bytes(c) if c is not None else b""
        if not b:
            continue
        reps = -(-1024 // len(b))
        arr = np.frombuffer((b * reps)[:1024], dtype=np.uint8)
        planes[i] = arr.reshape(32, 32).astype(np.int64)
    b8 = np.asarray(_dct_basis_int(), dtype=np.int64)  # (8, 32)
    # c[n, u, v] = sum_{x,y} B[u,x] * plane[x,y] * B[v,y] — all int64
    t = np.einsum("ux,nxy->nuy", b8, planes)  # |t| < 2^32
    coefs = np.einsum("nuy,vy->nuv", t, b8)  # |c| < 2^47
    low = coefs.reshape(n, 64)
    # DC-excluded median of 63 ints = sorted[31], exact in both engines
    med = np.sort(low[:, 1:], axis=1)[:, 31:32]
    bits = (low > med).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    packed = (bits * weights).sum(axis=1, dtype=np.uint64)
    return pd.Series(packed.astype(np.int64))


def phash_media(binary_df: DataFrame, kernel: str = "stub") -> DataFrame:
    """(doc_id, phash BIGINT): Arrow-vectorized pandas_udf over the
    binary column — the only Python step; everything downstream
    (banding, candidate join, Hamming verify) is JVM-side.

    kernel='stub' (default): deterministic byte-parity signature,
    reproducible in DuckDB byte arithmetic — the oracle path.
    kernel='dct': the real 32x32-DCT/median pHash math (numpy, batched)
    behind the identical signature and output schema — proof the
    plumbing runs a genuine kernel, not only the stub.
    kernel='dct_int': the same real DCT math with the basis snapped to
    integer micro-units — bit-reproducible by a DuckDB oracle, so the
    REAL kernel (not only the stub) is hash-gated end to end."""
    import pyspark.sql.functions as Fn

    if kernel == "dct":

        @Fn.pandas_udf("bigint")
        def _ph(content: pd.Series) -> pd.Series:
            return _phash_dct_batch(list(content))

    elif kernel == "dct_int":

        @Fn.pandas_udf("bigint")
        def _ph(content: pd.Series) -> pd.Series:
            return _phash_dct_int_batch(list(content))

    else:

        @Fn.pandas_udf("bigint")
        def _ph(content: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    _phash_stub(bytes(c) if c is not None else b"")
                    for c in content
                ]
            )

    return binary_df.select("doc_id", _ph("content").alias("phash"))


def phash_neardup_pairs(
    binary_df: DataFrame, max_hamming: int = 6, kernel: str = "stub"
) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over a binary media column:
    band the 64-bit signature into 4 x 16-bit keys (any pair within
    Hamming distance <= 6 of a real pHash usually collides on >=1 full
    band; same equi-join trick as MinHash-LSH and SimHash), equi-join
    candidates on (band, band_bits), then verify the exact distance
    with bit_count(XOR) — a single JVM intrinsic.

    At 100 TB: candidates are near-linear in dup density (never the
    O(n^2) pair space), the join keys are 12-byte ints, and the binary
    payloads are read ONCE by the hash kernel and never shuffled.

    Round 10: the 16-byte/doc signature frame is PINNED before banding
    — the band self-join consumes `bands` on both sides, and without
    the pin each side re-derived the whole upstream chain, i.e. the
    Python pHash kernel (the one Arrow boundary in this family) ran
    TWICE over every payload (guide §2.4's double-consumption hazard,
    same fix as the round-9 wave-2 dedup sites)."""
    from .textops import materialize

    ph = materialize(phash_media(binary_df, kernel=kernel))
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"CAST(shiftrightunsigned(phash, {16 * b}) "
                            "& 65535 AS INT)"
                        ).alias("band_bits"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "phash", F.col("bk.band"), F.col("bk.band_bits"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("a.phash").alias("ph1"),
            F.col("b.doc_id").alias("doc2"),
            F.col("b.phash").alias("ph2"),
        )
        .distinct()
    )
    return cand.select(
        "doc1",
        "doc2",
        F.expr("bit_count(ph1 ^ ph2)").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


# --- audio: fixed-rate framing + energy VAD segments ----------------------

#: "PCM" framing constants, sized to the synthetic corpus (docs are a
#: few hundred bytes): 64-byte frames standing in for 20 ms windows. A
#: production 16 kHz/16-bit pipeline uses 640 bytes — only these
#: constants change, the plan shape is identical.
AUDIO_FRAME_BYTES = 64
AUDIO_FRAME_MS = 20
#: energy gate in mean-byte-value units — the corpus median is ~94.4,
#: so roughly half the frames are "voiced" and runs merge non-trivially
AUDIO_VAD_THRESHOLD = 94.0


def frame_audio(binary_df: DataFrame) -> DataFrame:
    """Fixed-rate audio framing, entirely JVM-side: frame count from the
    byte length, frame index via sequence+posexplode, frame payload via
    binary substring. Only complete frames are kept (a real pipeline
    pads or drops the tail the same way). No Python runs here — the
    expensive kernel below sees exactly one 640-byte slice per frame,
    never the whole payload per frame (the per-frame-slice projection is
    what keeps a 1-hour file from being re-shipped 180k times)."""
    return binary_df.select(
        "doc_id",
        F.expr(
            f"CAST(byte_len / {AUDIO_FRAME_BYTES} AS INT)"
        ).alias("n_frames"),
        "content",
    ).filter(F.col("n_frames") > 0).select(
        # the n_frames > 0 guard matters: Spark's sequence(0, -1) counts
        # DOWN (yields [0, -1]) rather than returning empty
        "doc_id",
        "n_frames",
        F.expr("explode(sequence(0, n_frames - 1))").alias("frame_idx"),
        F.expr(
            f"substring(content, frame_idx * {AUDIO_FRAME_BYTES} + 1, "
            f"{AUDIO_FRAME_BYTES})"
        ).alias("frame_bytes"),
    )


def _frame_energy_stub(b: bytes) -> float:
    """STUB — stands in for real short-time energy / RMS over decoded
    PCM samples (numpy: mean(abs(int16 view))). Deterministic mean byte
    value keeps the plumbing testable without audio libs; swap the body
    for the numpy kernel behind the same signature."""
    return float(sum(b)) / len(b) if b else 0.0


def _frame_energy_fft_batch(frames) -> "pd.Series":
    """REAL spectral kernel, batched: rfft over each frame's byte
    signal; the reported energy is the DC magnitude / n — mathematically
    the frame mean, so the VAD threshold calibrated on the stub applies
    unchanged, while the execution path is a genuine numpy FFT over a
    padded (n_frames, frame_len) tensor (what a real spectral-feature
    extractor does per Arrow batch)."""
    import numpy as np

    n = len(frames)
    if n == 0:
        return pd.Series([], dtype=float)
    lens = [len(b) if b is not None else 0 for b in frames]
    width = max(max(lens), 1)
    sig = np.zeros((n, width), dtype=np.float64)
    for i, b in enumerate(frames):
        if b:
            sig[i, : len(b)] = np.frombuffer(bytes(b), dtype=np.uint8)
    spec = np.fft.rfft(sig, axis=1)
    dc = np.abs(spec[:, 0])
    out = np.where(
        np.array(lens) > 0, dc / np.maximum(np.array(lens), 1), 0.0
    )
    return pd.Series(out)


def audio_frame_energy(frames: DataFrame, kernel: str = "stub") -> DataFrame:
    """Arrow-vectorized energy kernel over the framed audio (the one
    Python stage, batched by Arrow — same contract as decode_media).
    kernel='stub' is the byte-mean oracle path; kernel='fft' runs the
    real numpy rfft per batch (DC term, numerically the same value)."""
    from pyspark.sql.functions import pandas_udf

    if kernel == "fft":

        @pandas_udf("double")
        def _energy(fb: pd.Series) -> pd.Series:
            return _frame_energy_fft_batch(list(fb))

    else:

        @pandas_udf("double")
        def _energy(fb: pd.Series) -> pd.Series:
            return fb.map(_frame_energy_stub)

    return frames.withColumn("energy", _energy("frame_bytes")).drop(
        "frame_bytes"
    )


def audio_voiced_segments(
    binary_df: DataFrame,
    threshold: float = AUDIO_VAD_THRESHOLD,
    kernel: str = "stub",
) -> DataFrame:
    """Energy-gated voice-activity segments: frames above the threshold,
    merged into maximal consecutive runs by gaps-and-islands (frame_idx
    minus per-doc row_number is constant within a run — one window, no
    self-joins), reported with millisecond spans and the run's mean
    energy (micro-snapped so the cross-frame sum is exact). JVM windowing
    around the single Arrow kernel — the standard shape for a 100 TB
    audio curation pass (silence trimming before expensive ASR)."""
    from pyspark.sql import Window

    voiced = audio_frame_energy(
        frame_audio(binary_df), kernel=kernel
    ).filter(F.col("energy") > threshold)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    isl = voiced.withColumn(
        "island", F.col("frame_idx") - F.row_number().over(w)
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("frame_idx").alias("first_frame"),
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(
                F.expr("CAST(ROUND(energy * 1.0e6) AS BIGINT)")
            ).alias("e_u"),
        )
        .select(
            "doc_id",
            (F.col("first_frame") * AUDIO_FRAME_MS).alias("start_ms"),
            (
                (F.col("first_frame") + F.col("n_frames")) * AUDIO_FRAME_MS
            ).alias("end_ms"),
            "n_frames",
            F.expr(
                "CAST(e_u AS DOUBLE) / (1.0e6 * n_frames)"
            ).alias("mean_energy"),
        )
    )


# --- REAL pixel resize / block-mean embedding over decoded PPM -------------

RESIZED_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("width", Ty.IntegerType()),
        Ty.StructField("height", Ty.IntegerType()),
        Ty.StructField("thumb_w", Ty.IntegerType()),
        Ty.StructField("thumb_h", Ty.IntegerType()),
        Ty.StructField("embedding", Ty.ArrayType(Ty.DoubleType())),
    ]
)


def _resize_ppm_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL pixel resample, batched: parse each P6 payload with the
    genuine netpbm decoder, then 2x average-pool the (3x-)gray plane —
    an exact box-filter downscale whose output doubles ARE the image's
    block-mean embedding (the standard cheap visual descriptor). Each
    pooled value is an integer sum of 4 gray values (each itself
    R+G+B, exact int64) divided once by 12.0 — a single IEEE division,
    reproducible bit-for-bit by byte arithmetic in any engine. Dims
    must be even (the synthesis fixes 8x6); a real deployment pads."""
    import numpy as np

    cols = [f.name for f in RESIZED_SCHEMA.fields]
    for pdf in it:
        rows = []
        for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
            payload = bytes(content) if content is not None else b""
            w, h, px = _parse_p6(payload)
            if w % 2 or h % 2:
                raise ValueError("resize kernel needs even dims")
            gray = px.astype(np.int64).sum(axis=2)  # 3x gray, exact
            pooled = (
                gray.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))
                / 12.0
            )
            rows.append(
                (int(doc_id), w, h, w // 2, h // 2,
                 [float(v) for v in pooled.reshape(-1)])
            )
        yield pd.DataFrame(rows, columns=cols)


def resize_ppm(binary_df: DataFrame) -> DataFrame:
    """Distributed REAL resize/embed over P6 payloads: one Arrow-batched
    mapInPandas stage (same plumbing as decode_media), emitting the
    half-resolution block-mean embedding in row-major order. This is
    the real-kernel replacement for the feature-space rescale in
    resize_media — genuine decoded pixels in, genuine pooled pixels
    out."""
    return binary_df.select("doc_id", "content").mapInPandas(
        _resize_ppm_batch, schema=RESIZED_SCHEMA
    )


# --- REAL audio decode: RIFF/WAVE (PCM) -------------------------------------

#: fixed synthesis geometry: 8 kHz / 8-bit / mono, 256-sample data chunk
WAV_DATA_BYTES = 256
WAV_SAMPLE_RATE = 8000
#: the constant 44-byte canonical header those sizes imply (RIFF size =
#: 44 + 256 - 8 = 292); hex so Spark can emit it as an X'..' literal
WAV_HEADER_HEX = (
    "524946462401000057415645666D7420100000000100010040"
    "1F0000401F0000010008006461746100010000"
)

WAV_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("sample_rate", Ty.IntegerType()),
        Ty.StructField("bits_per_sample", Ty.IntegerType()),
        Ty.StructField("n_samples", Ty.LongType()),
        Ty.StructField("mean_amp", Ty.DoubleType()),
        Ty.StructField("min_amp", Ty.DoubleType()),
        Ty.StructField("max_amp", Ty.DoubleType()),
        Ty.StructField("rms_amp", Ty.DoubleType()),
    ]
)


def _decode_wav(payload: bytes):
    """REAL audio container decode: RIFF magic, WAVE form type, then the
    spec's chunk walk (id + u32le size, word-aligned) collecting `fmt `
    (PCM layout via struct) and `data` (the PCM plane). Validates
    PCM/8-bit/mono and the declared RIFF size before touching samples —
    a real decoder fails loudly on a malformed container. Stats are
    exact integer sums with single IEEE divisions (and one SQRT), so a
    byte-arithmetic oracle reproduces them bit-for-bit."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    riff_size = struct.unpack("<I", payload[4:8])[0]
    if riff_size != len(payload) - 8:
        raise ValueError("RIFF size field disagrees with payload length")
    fmt, data, pos = None, None, 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + sz]
        if len(body) < sz:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned (RIFF spec)
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or bits != 8 or channels != 1:
        raise ValueError("only PCM 8-bit mono supported")
    import math

    s = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    n = len(s)
    return (
        int(sample_rate),
        int(bits),
        n,
        float(s.sum()) / n,
        float(s.min()),
        float(s.max()),
        # math.sqrt, NEVER ** 0.5: Python's pow() is not correctly
        # rounded and disagrees with IEEE sqrt (= DuckDB SQRT) by one
        # ulp on some inputs (fuzz seeds 505/606 each found one such
        # payload among 500)
        math.sqrt(float((s * s).sum()) / n),
    )


def decode_wav(binary_df: DataFrame) -> DataFrame:
    """Distributed REAL WAV decode: Arrow-batched mapInPandas over the
    binary column — same plumbing contract as decode_media."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WAV_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                rows.append((int(doc_id),) + _decode_wav(payload))
            yield pd.DataFrame(rows, columns=cols)

    return binary_df.select("doc_id", "content").mapInPandas(
        _batches, schema=WAV_SCHEMA
    )


# --- REAL video container: YUV4MPEG2 (Y4M) frame splitting ------------------

#: fixed synthesis geometry: 8x6 C444 (Y,U,V planes each 48 bytes ->
#: 144 bytes/frame), 3 frames per clip
Y4M_W, Y4M_H, Y4M_FRAMES = 8, 6, 3
Y4M_HEADER = f"YUV4MPEG2 W{Y4M_W} H{Y4M_H} F25:1 Ip A1:1 C444\n"
Y4M_FRAME_MARKER_HEX = "4652414D450A"  # b"FRAME\n"

Y4M_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("width", Ty.IntegerType()),
        Ty.StructField("height", Ty.IntegerType()),
        Ty.StructField("n_frames", Ty.IntegerType()),
        Ty.StructField("frame_idx", Ty.IntegerType()),
        Ty.StructField("y_mean", Ty.DoubleType()),
        Ty.StructField("y_min", Ty.DoubleType()),
        Ty.StructField("y_max", Ty.DoubleType()),
    ]
)


def _y4m_y_planes(payload: bytes):
    """REAL video-container demux: parse the YUV4MPEG2 stream header
    (space-separated W/H/C tags; colorspace defaults to C420 per spec),
    then walk FRAME sections — each a 'FRAME[ params]\\n' line followed
    by exactly one frame of planar YUV — yielding each frame's Y plane
    as an int64 numpy array. The frame count is DISCOVERED by the
    walk, never assumed. Raises on a malformed stream."""
    import numpy as np

    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    c = "420"
    for tag in payload[:nl].decode("ascii").split(" ")[1:]:
        if tag.startswith("W"):
            w = int(tag[1:])
        elif tag.startswith("H"):
            h = int(tag[1:])
        elif tag.startswith("C"):
            c = tag[1:]
    if not w or not h:
        raise ValueError("Y4M header missing W or H")
    if c.startswith("444"):
        frame_bytes = w * h * 3
    elif c.startswith("422"):
        frame_bytes = w * h * 2
    elif c.startswith("420"):
        frame_bytes = w * h * 3 // 2
    else:
        raise ValueError(f"unsupported colorspace C{c}")
    planes, pos = [], nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos:pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME marker")
        data = payload[fnl + 1:fnl + 1 + frame_bytes]
        if len(data) < frame_bytes:
            raise ValueError("truncated frame")
        planes.append(
            np.frombuffer(data[:w * h], dtype=np.uint8).astype(np.int64)
        )
        pos = fnl + 1 + frame_bytes
    return w, h, planes


def _y4m_frames(payload: bytes):
    """Per-frame Y-plane stats off the real demux (:func:`_y4m_y_planes`)."""
    w, h, planes = _y4m_y_planes(payload)
    frames = [
        (float(y.sum()) / (w * h), float(y.min()), float(y.max()))
        for y in planes
    ]
    return w, h, frames


#: shot-boundary decision threshold, in mean-abs-Y-diff units per pixel
#: (integer-exact: the kernel compares mad_sum >= THRESH * n_pixels, so
#: no float ever enters the decision). 28 splits the synthetic tiled-
#: text corpus near 50/50; a natural-video deployment would tune it
#: against labeled cuts — the DECISION STRUCTURE (consecutive-frame
#: Y-plane difference + threshold + running shot id) is the operator.
Y4M_SHOT_THRESH = 28

Y4M_SHOT_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("frame_idx", Ty.IntegerType()),
        Ty.StructField("mad_sum", Ty.LongType()),
        Ty.StructField("is_boundary", Ty.BooleanType()),
        Ty.StructField("shot_id", Ty.IntegerType()),
    ]
)


def split_y4m_shots(binary_df: DataFrame) -> DataFrame:
    """Shot-boundary detection over Y4M payloads — the scene-cut pass a
    video curation pipeline runs BEFORE frame sampling (sampling inside
    one static shot wastes the clip's diversity; sampling per shot is
    the standard recipe): demux with the real container walker
    (:func:`_y4m_y_planes`), score each consecutive frame pair by the
    SUM of absolute Y-plane differences (an exact integer — the
    classic pixel-domain cut detector), declare a boundary when it
    crosses ``Y4M_SHOT_THRESH`` per pixel, and number shots by the
    running boundary count. One Arrow-batched mapInPandas stage; a
    clip's frames are sequential inside its row, so the running shot
    id needs no window and payload bytes are never shuffled."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = [f.name for f in Y4M_SHOT_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                w, h, planes = _y4m_y_planes(payload)
                ypix = w * h
                shot = 1
                for idx, y in enumerate(planes):
                    if idx == 0:
                        rows.append((int(doc_id), 0, None, False, 1))
                        continue
                    mad = int(np.abs(y - planes[idx - 1]).sum())
                    boundary = mad >= Y4M_SHOT_THRESH * ypix
                    if boundary:
                        shot += 1
                    rows.append(
                        (int(doc_id), idx, mad, bool(boundary), shot)
                    )
            out = pd.DataFrame(rows, columns=cols)
            # frame 0 carries a NULL mad_sum: keep the column integral
            # (object/float NaN would fail the LongType Arrow cast)
            out["mad_sum"] = out["mad_sum"].astype("Int64")
            yield out

    return binary_df.select("doc_id", "content").mapInPandas(
        _batches, schema=Y4M_SHOT_SCHEMA
    )


def split_y4m_frames(binary_df: DataFrame) -> DataFrame:
    """Distributed REAL frame splitting: Arrow-batched mapInPandas over
    Y4M payloads, one output row per demuxed frame. The per-frame-row
    shape is what a real pipeline feeds the sampled-decode stage
    (sample_frames) — here the demux itself is the genuine kernel."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in Y4M_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                w, h, frames = _y4m_frames(payload)
                for idx, (ym, yl, yh) in enumerate(frames):
                    rows.append(
                        (int(doc_id), w, h, len(frames), idx, ym, yl, yh)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return binary_df.select("doc_id", "content").mapInPandas(
        _batches, schema=Y4M_SCHEMA
    )


# --- REAL image codec, oracle-gated: baseline JPEG (ITU T.81) ----------------
#
# The container has no PIL/libturbojpeg binding, but nothing about
# baseline JPEG needs one: the full pipeline — Huffman entropy coding,
# DC prediction, byte stuffing, dequantization, 2-D IDCT, level shift —
# is implemented here in numpy, with a matching encoder so tests and
# queries can synthesize genuine streams. The oracle trick that makes
# the ENTROPY+TRANSFORM chain hash-gateable (JPEG is lossy in general,
# so no SQL twin could reproduce arbitrary decodes): images whose every
# 8x8 block is CONSTANT, quantized with DC step 8, round-trip
# LOSSLESSLY — FDCT of a flat block of value b is the single DC
# coefficient 8*(b-128), which /8 quantizes to the exact integer b-128,
# and the DC-only IDCT returns (b-128)+128 = b at every pixel, no
# rounding anywhere. A DuckDB oracle can therefore predict every
# decoded byte by pure byte arithmetic while the Spark side runs the
# REAL decoder: a bug in the Huffman tables, the DC predictor, byte
# unstuffing, dequant, or IDCT normalization changes the decoded value
# and fails the driver hash.

#: quantization table: DC step 8 (the lossless-flat-block choice
#: documented above); AC steps 16 (exercised by the round-trip tests,
#: not the flat-block oracle path, where every AC is 0)
JPEG_QTABLE = [8] + [16] * 63

#: zig-zag order (ITU T.81 Figure A.6): zigzag[k] = raster index of the
#: k-th coefficient in transmission order
JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: canonical Huffman tables (any spec-valid DHT works — the decoder
#: reads whatever the stream declares; these are deliberately simple):
#: DC: 12 category symbols, all 4-bit codes. AC: EOB + ZRL + (run 0-3,
#: size 1-10), all 6-bit codes.
JPEG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
JPEG_DC_VALS = list(range(12))
JPEG_AC_VALS = (
    [0x00, 0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
JPEG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(JPEG_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _dct_mat():
    import numpy as np

    n = 8
    k = np.arange(n)
    mat = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
    mat *= np.sqrt(2.0 / n)
    mat[0, :] = np.sqrt(1.0 / n)
    return mat  # orthonormal: X = M s M^T, s = M^T X M


def _huff_codes(bits, vals):
    """Canonical JPEG Huffman code assignment (ITU T.81 Annex C):
    {symbol: (code, length)}."""
    codes, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _put_block(w, zz, prev_dc: int, dcc, acc_) -> int:
    """Entropy-encode one zig-zagged quantized block (shared by the
    grayscale and color encoders): DC category + difference bits, then
    (run, size) AC run-length symbols with ZRL/EOB. Returns the new DC
    predictor for this block's component."""
    diff = int(zz[0]) - prev_dc
    prev_dc = int(zz[0])
    cat = _category(diff)
    w.put(*dcc[cat])
    if cat:
        v = diff if diff > 0 else diff + (1 << cat) - 1
        w.put(v, cat)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k] != 0), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            if run == 16:
                w.put(*acc_[0xF0])  # ZRL
                run = 0
            continue
        size = _category(v)
        sym = (run << 4) | size
        if sym not in acc_:
            raise ValueError(
                f"coefficient needs AC symbol {sym:#x} outside "
                "the declared table"
            )
        w.put(*acc_[sym])
        w.put(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        w.put(*acc_[0x00])  # EOB
    return prev_dc


def encode_jpeg_gray(width: int, height: int, pixels: bytes) -> bytes:
    """REAL baseline JPEG encoder, single-component (grayscale), no
    subsampling: level shift, orthonormal FDCT, quantization by
    JPEG_QTABLE, zig-zag, DC prediction, (run, size) AC run-length
    coding with ZRL/EOB, canonical Huffman, byte stuffing. Dimensions
    must be multiples of 8 (no edge replication — synthesis controls
    the geometry)."""
    import numpy as np

    assert width % 8 == 0 and height % 8 == 0
    assert len(pixels) == width * height
    m = _dct_mat()
    q = np.array(JPEG_QTABLE, dtype=np.int64)[
        np.argsort(np.array(JPEG_ZIGZAG))
    ].reshape(8, 8)
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    dcc = _huff_codes(JPEG_DC_BITS, JPEG_DC_VALS)
    acc_ = _huff_codes(JPEG_AC_BITS, JPEG_AC_VALS)
    w = _BitWriter()
    prev_dc = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            s = img[by:by + 8, bx:bx + 8].astype(np.float64) - 128.0
            coef = m @ s @ m.T
            zq = np.rint(coef / q).astype(np.int64)
            zz = zq.reshape(-1)[JPEG_ZIGZAG]
            prev_dc = _put_block(w, zz, prev_dc, dcc, acc_)
    body = w.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(
            2, "big"
        ) + payload

    dqt = seg(0xDB, bytes([0]) + bytes(JPEG_QTABLE))
    sof = seg(
        0xC0,
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(JPEG_DC_BITS) + bytes(JPEG_DC_VALS)
        + bytes([0x10]) + bytes(JPEG_AC_BITS) + bytes(JPEG_AC_VALS),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + body + b"\xff\xd9"


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy data exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy data")
                self.pos += 1  # unstuff
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode(reader, table):
    """table: {(code, length): symbol} walked one bit at a time."""
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _read_block(reader, dct, act, prev_dc: int):
    """Entropy-decode one block (shared by the grayscale and color
    decoders): DC category/difference, AC run-length with ZRL/EOB.
    Returns (new prev_dc, zig-zag-order int64 coefficient vector)."""
    import numpy as np

    zz = np.zeros(64, dtype=np.int64)
    cat = _huff_decode(reader, dct)
    diff = _extend(reader.bits(cat), cat) if cat else 0
    prev_dc += diff
    zz[0] = prev_dc
    k = 1
    while k < 64:
        sym = _huff_decode(reader, act)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0xF
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(reader.bits(size), size)
        k += 1
    return prev_dc, zz


def decode_jpeg_gray(payload: bytes):
    """REAL baseline JPEG decoder, single-component grayscale: marker
    walk (DQT/DHT/SOF0/SOS read from the STREAM, never assumed),
    canonical Huffman decode with byte unstuffing, DC prediction,
    dequantization, orthonormal 2-D IDCT, level shift, clamp. Returns
    (width, height, uint8 ndarray). Fails loudly on anything outside
    the baseline single-component contract (progressive SOF2, color,
    subsampling, restart intervals, truncation) — a real decoder does
    not hash garbage."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    qsel = 0
    entropy = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(payload):
            raise ValueError("truncated segment header")
        seglen = int.from_bytes(payload[pos:pos + 2], "big")
        seg = payload[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment body")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(
                    seg[i + 1:i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                codes = _huff_codes(bits, vals)
                huff[(tc, th)] = {
                    (c, ln): sym for sym, (c, ln) in codes.items()
                }
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            if seg[5] != 1:
                raise ValueError("only single-component (gray) supported")
            if seg[7] != 0x11:
                raise ValueError("subsampling unsupported")
            qsel = seg[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            dc_sel, ac_sel = seg[2] >> 4, seg[2] & 0xF
            entropy = payload[pos + seglen:]
            # entropy runs to EOI; find the trailing FF D9
            eoi = entropy.rfind(b"\xff\xd9")
            if eoi < 0:
                raise ValueError("no EOI after scan")
            entropy = entropy[:eoi]
            pos += seglen
            break
        pos += seglen
    if width is None or entropy is None:
        raise ValueError("missing SOF or SOS")
    if width % 8 or height % 8:
        raise ValueError("dimensions must be block-aligned here")
    q = qt[qsel]
    dct = huff[(0, dc_sel)]
    act = huff[(1, ac_sel)]
    m = _dct_mat()
    inv_zz = np.argsort(np.array(JPEG_ZIGZAG))
    reader = _BitReader(entropy)
    img = np.zeros((height, width), dtype=np.uint8)
    prev_dc = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            prev_dc, zz = _read_block(reader, dct, act, prev_dc)
            coef = (zz * q)[inv_zz].reshape(8, 8).astype(np.float64)
            blk = m.T @ coef @ m
            img[by:by + 8, bx:bx + 8] = np.clip(
                np.rint(blk) + 128.0, 0, 255
            ).astype(np.uint8)
    return width, height, img


# --- color JPEG: YCbCr + 4:2:0 chroma subsampling (round-8 verdict #5) ------
#
# Same oracle doctrine as the grayscale codec, extended to color: the
# color transform uses libjpeg's scaled-INTEGER arithmetic (jccolor.c /
# jdcolor.c constants, FIX(x) = round(x * 2^16)), so Y/Cb/Cr and the
# reconstructed R'G'B' are exact integer functions of the input bytes —
# a DuckDB oracle reproduces them with the same 16.16 fixed-point
# division. Images built from FLAT 16x16-px MCUs stay lossless through
# the whole chain: flat luma/chroma blocks quantize losslessly (DC step
# 8), 2x2 chroma averaging of equal values is exact, and replicate
# upsampling of a flat plane is exact — so decoded RGB equals the
# closed-form int transform round-trip of the input color, predictable
# byte-for-byte without running any codec.

#: 16.16 fixed-point color constants (libjpeg FIX values)
_FIX_YR, _FIX_YG, _FIX_YB = 19595, 38470, 7471
_FIX_CB_R, _FIX_CB_G, _FIX_CB_B = 11059, 21709, 32768
_FIX_CR_R, _FIX_CR_G, _FIX_CR_B = 32768, 27439, 5329
_FIX_R_CR = 91881      # 1.40200
_FIX_B_CB = 116130     # 1.77200
_FIX_G_CB = 22554      # 0.34414
_FIX_G_CR = 46802      # 0.71414
_CBCR_BIAS = (128 << 16) + (1 << 15) - 1  # CBCR_OFFSET + ONE_HALF - 1


def rgb_to_ycbcr_int(r, g, b):
    """Forward color transform, libjpeg scaled-integer form: exact on
    ints (numpy arrays or Python scalars); >> on int64 is an arithmetic
    (floor) shift, and every numerator here is non-negative anyway."""
    y = (_FIX_YR * r + _FIX_YG * g + _FIX_YB * b + (1 << 15)) >> 16
    cb = (-_FIX_CB_R * r - _FIX_CB_G * g + _FIX_CB_B * b
          + _CBCR_BIAS) >> 16
    cr = (_FIX_CR_R * r - _FIX_CR_G * g - _FIX_CR_B * b
          + _CBCR_BIAS) >> 16
    return y, cb, cr


def ycbcr_to_rgb_int(y, cb, cr):
    """Inverse color transform (jdcolor.c): floor-shift arithmetic on
    possibly-negative numerators (Python/numpy >> floors — the DuckDB
    twin adds a 2^31 bias so its // division sees a non-negative
    numerator), then clamp to [0, 255]."""
    r = y + ((_FIX_R_CR * (cr - 128) + (1 << 15)) >> 16)
    b = y + ((_FIX_B_CB * (cb - 128) + (1 << 15)) >> 16)
    g = y + ((-_FIX_G_CB * (cb - 128) - _FIX_G_CR * (cr - 128)
              + (1 << 15)) >> 16)
    clamp = lambda v: min(255, max(0, v))  # noqa: E731
    try:
        return clamp(r), clamp(g), clamp(b)
    except (TypeError, ValueError):  # numpy arrays
        import numpy as np

        return (np.clip(r, 0, 255), np.clip(g, 0, 255),
                np.clip(b, 0, 255))


def encode_jpeg_color(width: int, height: int, rgb: bytes) -> bytes:
    """REAL baseline color JPEG encoder: RGB -> YCbCr (scaled-integer
    transform above), 4:2:0 chroma subsampling (2x2 rounded average,
    (sum + 2) >> 2), interleaved MCU entropy coding (per 16x16-px MCU:
    4 Y blocks raster order, then Cb, Cr — each component with its own
    DC predictor), two DQT tables (0 luma / 1 chroma, both the
    flat-block-lossless JPEG_QTABLE), shared canonical Huffman tables.
    Dimensions must be multiples of 16 (full MCUs — synthesis controls
    the geometry); `rgb` is H x W x 3 interleaved bytes."""
    import numpy as np

    if width % 16 or height % 16:
        raise ValueError("dimensions must be multiples of 16")
    if len(rgb) != width * height * 3:
        raise ValueError("rgb byte count disagrees with geometry")
    m = _dct_mat()
    q = np.array(JPEG_QTABLE, dtype=np.int64)[
        np.argsort(np.array(JPEG_ZIGZAG))
    ].reshape(8, 8)
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    r = px[:, :, 0].astype(np.int64)
    g = px[:, :, 1].astype(np.int64)
    b = px[:, :, 2].astype(np.int64)
    yp, cbp, crp = rgb_to_ycbcr_int(r, g, b)
    # 4:2:0 — rounded 2x2 mean; exact on flat 2x2 neighborhoods
    sub = lambda p: (  # noqa: E731
        p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2
    ) >> 2
    cbs, crs = sub(cbp), sub(crp)
    dcc = _huff_codes(JPEG_DC_BITS, JPEG_DC_VALS)
    acc_ = _huff_codes(JPEG_AC_BITS, JPEG_AC_VALS)
    w = _BitWriter()
    prev = {"y": 0, "cb": 0, "cr": 0}

    def put(plane, r0, c0, key):
        s = plane[r0:r0 + 8, c0:c0 + 8].astype(np.float64) - 128.0
        zq = np.rint((m @ s @ m.T) / q).astype(np.int64)
        prev[key] = _put_block(
            w, zq.reshape(-1)[JPEG_ZIGZAG], prev[key], dcc, acc_
        )

    for my in range(0, height, 16):
        for mx in range(0, width, 16):
            for dy in (0, 8):
                for dx in (0, 8):
                    put(yp, my + dy, mx + dx, "y")
            put(cbs, my // 2, mx // 2, "cb")
            put(crs, my // 2, mx // 2, "cr")
    body = w.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(
            2, "big"
        ) + payload

    dqt = seg(
        0xDB,
        bytes([0]) + bytes(JPEG_QTABLE) + bytes([1]) + bytes(JPEG_QTABLE),
    )
    sof = seg(
        0xC0,
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(JPEG_DC_BITS) + bytes(JPEG_DC_VALS)
        + bytes([0x10]) + bytes(JPEG_AC_BITS) + bytes(JPEG_AC_VALS),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + body + b"\xff\xd9"


def decode_jpeg_color(payload: bytes):
    """REAL baseline color JPEG decoder: marker walk (both DQT tables,
    DHT, 3-component SOF0 with sampling factors, SOS selections — all
    read from the STREAM), interleaved-MCU entropy decode with
    per-component DC predictors, dequantization + orthonormal IDCT per
    block, 2x replicate chroma upsampling, scaled-integer YCbCr -> RGB,
    clamp. Returns (width, height, uint8 H x W x 3 ndarray). Fails
    loudly (ValueError) outside the 4:2:0 three-component baseline
    contract — grayscale streams belong to decode_jpeg_gray, and a
    real decoder does not hash garbage."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    comps = None  # [(comp_id, h, v, tq)]
    sels = None   # {comp_id: (dc_sel, ac_sel)}
    entropy = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(payload):
            raise ValueError("truncated segment header")
        seglen = int.from_bytes(payload[pos:pos + 2], "big")
        seg = payload[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment body")
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(
                    seg[i + 1:i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                codes = _huff_codes(bits, vals)
                huff[(tc, th)] = {
                    (c, ln): sym for sym, (c, ln) in codes.items()
                }
                i += 17 + nv
        elif marker == 0xC0:
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            if seg[5] != 3:
                raise ValueError("only three-component (YCbCr) here")
            comps = []
            for c in range(3):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            if (comps[0][1], comps[0][2]) != (2, 2) or any(
                (c[1], c[2]) != (1, 1) for c in comps[1:]
            ):
                raise ValueError("only 4:2:0 sampling supported")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:
            if seg[0] != 3:
                raise ValueError("scan must cover all three components")
            sels = {}
            for c in range(3):
                cid, t = seg[1 + 2 * c], seg[2 + 2 * c]
                sels[cid] = (t >> 4, t & 0xF)
            if comps is None or {c[0] for c in comps} != set(sels):
                raise ValueError("SOS components disagree with SOF")
            entropy = payload[pos + seglen:]
            eoi = entropy.rfind(b"\xff\xd9")
            if eoi < 0:
                raise ValueError("no EOI after scan")
            entropy = entropy[:eoi]
            pos += seglen
            break
        pos += seglen
    if width is None or comps is None or entropy is None or sels is None:
        raise ValueError("missing SOF or SOS")
    if width % 16 or height % 16:
        raise ValueError("dimensions must be MCU-aligned here")
    m = _dct_mat()
    inv_zz = np.argsort(np.array(JPEG_ZIGZAG))
    reader = _BitReader(entropy)
    yp = np.zeros((height, width), dtype=np.int64)
    cbs = np.zeros((height // 2, width // 2), dtype=np.int64)
    crs = np.zeros((height // 2, width // 2), dtype=np.int64)
    prev = {c[0]: 0 for c in comps}

    def read_into(plane, r0, c0, cid, tq):
        dct = huff[(0, sels[cid][0])]
        act = huff[(1, sels[cid][1])]
        prev[cid], zz = _read_block(reader, dct, act, prev[cid])
        coef = (zz * qt[tq])[inv_zz].reshape(8, 8).astype(np.float64)
        blk = m.T @ coef @ m
        plane[r0:r0 + 8, c0:c0 + 8] = np.clip(
            np.rint(blk) + 128.0, 0, 255
        ).astype(np.int64)

    y_id, y_tq = comps[0][0], comps[0][3]
    cb_id, cb_tq = comps[1][0], comps[1][3]
    cr_id, cr_tq = comps[2][0], comps[2][3]
    for my in range(0, height, 16):
        for mx in range(0, width, 16):
            for dy in (0, 8):
                for dx in (0, 8):
                    read_into(yp, my + dy, mx + dx, y_id, y_tq)
            read_into(cbs, my // 2, mx // 2, cb_id, cb_tq)
            read_into(crs, my // 2, mx // 2, cr_id, cr_tq)
    cbp = np.repeat(np.repeat(cbs, 2, axis=0), 2, axis=1)
    crp = np.repeat(np.repeat(crs, 2, axis=0), 2, axis=1)
    r, g, b = ycbcr_to_rgb_int(yp, cbp, crp)
    img = np.stack([r, g, b], axis=2).astype(np.uint8)
    return width, height, img


#: flat-MCU color geometry: 2x2 MCUs = 32x32 px, 3 tiled doc bytes per
#: MCU (its flat RGB color) -> 12 payload bytes per image
JCOL_MW, JCOL_MH = 2, 2

JPEG_COLOR_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("width", Ty.IntegerType()),
        Ty.StructField("height", Ty.IntegerType()),
        Ty.StructField("mcu_idx", Ty.IntegerType()),
        Ty.StructField("r_in", Ty.IntegerType()),
        Ty.StructField("g_in", Ty.IntegerType()),
        Ty.StructField("b_in", Ty.IntegerType()),
        Ty.StructField("y", Ty.IntegerType()),
        Ty.StructField("cb", Ty.IntegerType()),
        Ty.StructField("cr", Ty.IntegerType()),
        Ty.StructField("r_out", Ty.IntegerType()),
        Ty.StructField("g_out", Ty.IntegerType()),
        Ty.StructField("b_out", Ty.IntegerType()),
    ]
)


def jpeg_color_roundtrip_mcus(binary_df: DataFrame) -> DataFrame:
    """Synthesize a flat-MCU color image from each doc's payload bytes
    (3 bytes per 16x16 MCU = its RGB color), encode with the REAL
    color encoder, decode with the REAL color decoder, and emit one
    row per MCU carrying the input color, the encoder's Y/Cb/Cr, and
    the decoded RGB. The stage fails loudly if any decoded MCU is not
    flat — a codec defect can't hide in an aggregate. Arrow-batched
    mapInPandas; payload bytes never leave the task."""
    import numpy as np

    w, h = JCOL_MW * 16, JCOL_MH * 16
    nm = JCOL_MW * JCOL_MH

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in JPEG_COLOR_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                bs = bytes(content)
                if len(bs) < 3 * nm:
                    raise ValueError("payload under 3 bytes per MCU")
                img = np.zeros((h, w, 3), dtype=np.uint8)
                mcus = []
                for j in range(nm):
                    rr, gg, bb = bs[3 * j], bs[3 * j + 1], bs[3 * j + 2]
                    my, mx = (j // JCOL_MW) * 16, (j % JCOL_MW) * 16
                    img[my:my + 16, mx:mx + 16] = (rr, gg, bb)
                    mcus.append((rr, gg, bb))
                stream = encode_jpeg_color(w, h, img.tobytes())
                gw, gh, out = decode_jpeg_color(stream)
                for j, (rr, gg, bb) in enumerate(mcus):
                    my, mx = (j // JCOL_MW) * 16, (j % JCOL_MW) * 16
                    tile = out[my:my + 16, mx:mx + 16]
                    first = tile[0, 0]
                    if not (tile == first).all():
                        raise ValueError(
                            "decoded MCU not flat: codec defect"
                        )
                    yy, cc, rr2 = rgb_to_ycbcr_int(rr, gg, bb)
                    rows.append(
                        (
                            int(doc_id), gw, gh, j,
                            rr, gg, bb,
                            int(yy), int(cc), int(rr2),
                            int(first[0]), int(first[1]), int(first[2]),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return binary_df.select("doc_id", "content").mapInPandas(
        _batches, schema=JPEG_COLOR_SCHEMA
    )


#: flat-block oracle-path geometry: 32x24 gray = 4x3 blocks, 12 tiled
#: doc bytes per image
JPEG_BW, JPEG_BH = 4, 3

JPEG_BLOCKS_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("width", Ty.IntegerType()),
        Ty.StructField("height", Ty.IntegerType()),
        Ty.StructField("block_idx", Ty.IntegerType()),
        Ty.StructField("val", Ty.IntegerType()),
    ]
)


def jpeg_roundtrip_blocks(binary_df: DataFrame) -> DataFrame:
    """Encode each doc's 12 tiled bytes as a REAL 32x24 flat-block
    baseline JPEG, decode it back with the REAL decoder, and emit each
    block's decoded value — one Arrow-batched mapInPandas stage, both
    codec halves executing genuinely per row. With DC quant step 8 the
    flat-block pipeline is exactly lossless (module docstring), so the
    DuckDB oracle predicts every output from the raw tiled bytes; any
    defect in Huffman coding, DC prediction, byte (un)stuffing,
    dequant, or IDCT normalization changes a value and fails the
    hash."""
    import numpy as np

    w, h = JPEG_BW * 8, JPEG_BH * 8

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in JPEG_BLOCKS_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                blk = bytes(content) if content is not None else b""
                if len(blk) < JPEG_BW * JPEG_BH:
                    raise ValueError("payload too short to tile blocks")
                pix = np.repeat(
                    np.frombuffer(
                        blk[: JPEG_BW * JPEG_BH], dtype=np.uint8
                    ).reshape(JPEG_BH, JPEG_BW),
                    8,
                    axis=0,
                ).repeat(8, axis=1)
                stream = encode_jpeg_gray(w, h, pix.tobytes())
                gw, gh, img = decode_jpeg_gray(stream)
                for r in range(JPEG_BH):
                    for c in range(JPEG_BW):
                        rows.append(
                            (
                                int(doc_id),
                                gw,
                                gh,
                                r * JPEG_BW + c,
                                int(img[r * 8, c * 8]),
                            )
                        )
            yield pd.DataFrame(rows, columns=cols)

    return binary_df.select("doc_id", "content").mapInPandas(
        _batches, schema=JPEG_BLOCKS_SCHEMA
    )


# --- REAL image codec, oracle-gated: PNG (RFC 2083) --------------------------
#
# PNG completes the image-format triad next to PPM (raw) and baseline
# JPEG (lossy transform coding): chunked container with CRC-32
# integrity, DEFLATE compression (python's built-in zlib — no external
# dependency), and the five per-scanline prediction filters. Unlike
# JPEG, EVERY PNG path is lossless, so the oracle needs no special
# geometry: the encoder below filters scanline r with filter r % 5
# (None, Sub, Up, Average, Paeth — all five exercised on every image)
# and a correct decoder must invert all of them plus the zlib stream
# and the chunk CRCs to reproduce the original bytes exactly.

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import zlib

    return (
        len(payload).to_bytes(4, "big")
        + tag
        + payload
        + (zlib.crc32(tag + payload) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """REAL PNG encoder, 8-bit grayscale, non-interlaced: scanline r is
    filtered with type r % 5, so every image exercises None, Sub, Up,
    Average, and Paeth; the filtered stream is DEFLATE-compressed and
    wrapped in CRC'd IHDR/IDAT/IEND chunks."""
    import zlib

    assert len(pixels) == width * height
    out = bytearray()
    prev = bytes(width)
    for r in range(height):
        row = pixels[r * width:(r + 1) * width]
        ft = r % 5
        out.append(ft)
        for x in range(width):
            a = row[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if x else 0
            if ft == 0:
                v = row[x]
            elif ft == 1:
                v = row[x] - a
            elif ft == 2:
                v = row[x] - b
            elif ft == 3:
                v = row[x] - (a + b) // 2
            else:
                v = row[x] - _paeth(a, b, c)
            out.append(v & 0xFF)
        prev = row
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 0, 0, 0, 0])  # 8-bit gray, deflate, adaptive, none
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 9))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_gray(payload: bytes):
    """REAL PNG decoder, 8-bit grayscale: signature check, chunk walk
    with CRC-32 verification on every chunk, IHDR contract enforcement
    (8-bit gray, non-interlaced), multi-IDAT concatenation, zlib
    inflate, and per-scanline unfiltering of all five filter types.
    Returns (width, height, uint8 ndarray); fails loudly on anything
    outside the contract — corrupt CRC, color/16-bit/interlaced images,
    truncated or oversized pixel streams."""
    import zlib

    import numpy as np

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width = 8, None
    idat = bytearray()
    ended = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated chunk header")
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if len(body) != ln or pos + 12 + ln > len(payload):
            raise ValueError("truncated chunk body")
        crc = int.from_bytes(payload[pos + 8 + ln:pos + 12 + ln], "big")
        if (zlib.crc32(tag + body) & 0xFFFFFFFF) != crc:
            raise ValueError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            bit_depth, color, comp, filt, interlace = body[8:13]
            if (bit_depth, color) != (8, 0):
                raise ValueError("only 8-bit grayscale supported")
            if comp or filt:
                raise ValueError("unknown compression/filter method")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            ended = True
            break
        pos += 12 + ln
    if width is None or not ended:
        raise ValueError("missing IHDR or IEND")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (width + 1):
        raise ValueError("pixel stream length mismatch")
    img = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.int64)
    for r in range(height):
        line = raw[r * (width + 1):(r + 1) * (width + 1)]
        ft, data = line[0], line[1:]
        if ft > 4:
            raise ValueError(f"invalid filter type {ft}")
        row = np.zeros(width, dtype=np.int64)
        for x in range(width):
            a = int(row[x - 1]) if x else 0
            b = int(prev[x])
            c = int(prev[x - 1]) if x else 0
            if ft == 0:
                v = data[x]
            elif ft == 1:
                v = data[x] + a
            elif ft == 2:
                v = data[x] + b
            elif ft == 3:
                v = data[x] + (a + b) // 2
            else:
                v = data[x] + _paeth(a, b, c)
            row[x] = v & 0xFF
        img[r] = row.astype(np.uint8)
        prev = row
    return width, height, img


#: oracle-path geometry: 8x8 gray, 64 tiled doc bytes per image —
#: 8 scanlines exercise every filter type at least once (r % 5)
PNG_W, PNG_H = 8, 8

PNG_PIXELS_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("width", Ty.IntegerType()),
        Ty.StructField("height", Ty.IntegerType()),
        Ty.StructField("pos", Ty.IntegerType()),
        Ty.StructField("val", Ty.IntegerType()),
    ]
)


def png_roundtrip_pixels(binary_df: DataFrame) -> DataFrame:
    """Encode each doc's 64 tiled bytes as a REAL 8x8 grayscale PNG
    (every scanline filter type exercised), decode it back, and emit
    every pixel — one Arrow-batched mapInPandas stage. PNG is lossless,
    so the DuckDB oracle predicts each output from the raw tiled bytes;
    any defect in chunk CRCs, the zlib stream, or any of the five
    filter reconstructions changes a pixel and fails the hash."""
    import numpy as np  # noqa: F401  (decoder dependency, imported lazily)

    n = PNG_W * PNG_H

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PNG_PIXELS_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                pix = bytes(content) if content is not None else b""
                if len(pix) < n:
                    raise ValueError("payload too short to tile pixels")
                stream = encode_png_gray(PNG_W, PNG_H, pix[:n])
                gw, gh, img = decode_png_gray(stream)
                flat = img.reshape(-1)
                for p in range(n):
                    rows.append(
                        (int(doc_id), gw, gh, p, int(flat[p]))
                    )
            yield pd.DataFrame(rows, columns=cols)

    return binary_df.select("doc_id", "content").mapInPandas(
        _batches, schema=PNG_PIXELS_SCHEMA
    )


# --- REAL video container, oracle-gated: MJPEG-in-AVI (RIFF) -----------------
#
# Motion-JPEG in an AVI container is the simplest REAL compressed-video
# format: every frame is an independent baseline JPEG inside a RIFF
# chunk tree ('RIFF/AVI ' -> LIST hdrl (avih, LIST strl (strh MJPG,
# strf BITMAPINFOHEADER)) -> LIST movi ('00dc' frame chunks,
# word-aligned) -> idx1 index). The WAV decoder already proved the RIFF
# chunk walk and the JPEG codec the per-frame entropy/transform chain;
# this composes the two into an end-to-end compressed-video decode with
# no new dependency — retiring most of the "compressed video needs
# pyav" caveat (what still needs a real codec library is inter-frame
# prediction, H.264-class). Flat-8x8-block frames round-trip losslessly
# through the JPEG path (module note above encode_jpeg_gray), so a
# DuckDB oracle predicts every decoded block of every frame by byte
# arithmetic while the Spark side runs the genuine container walk and
# entropy decode.

MJPEG_FRAMES = 3
MJPEG_FPS = 10


def _riff_chunk(tag: bytes, payload: bytes) -> bytes:
    # the size field counts the UNPADDED payload; the pad byte that
    # word-aligns the next chunk is outside it (RIFF spec)
    pad = b"\x00" if len(payload) & 1 else b""
    return tag + len(payload).to_bytes(4, "little") + payload + pad


def _riff_list(form: bytes, payload: bytes) -> bytes:
    return _riff_chunk(b"LIST", form + payload)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = MJPEG_FPS,
    fourcc: bytes = b"MJPG",
) -> bytes:
    """REAL AVI (RIFF) writer for a video stream: avih + strh
    ('vids'/fourcc) + strf (BITMAPINFOHEADER, biCompression=fourcc),
    the movi list with one word-aligned '00dc' chunk per frame, and
    the idx1 index whose offsets use the from-'movi'-fourcc convention
    (first chunk at offset 4). Default fourcc 'MJPG' (byte-identical
    output to the original MJPEG-only writer); the MC P-frame codec
    below registers its streams as 'MC88' (AVI fourcc space is open)."""
    import struct

    n = len(frames)
    maxbuf = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<10I4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        maxbuf * fps,      # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # AVIF_HASINDEX
        n,                 # dwTotalFrames
        0, 1,              # dwInitialFrames, dwStreams
        maxbuf,            # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,        # dwReserved
    )
    strh = struct.pack(
        "<4s4sI2HI5I2I4H",
        b"vids", fourcc,
        0, 0, 0, 0,        # flags, priority, language, initialFrames
        1, fps,            # dwScale / dwRate = frame period
        0, n,              # dwStart, dwLength (frames)
        maxbuf, 0xFFFFFFFF, 0,  # bufSize, quality, sampleSize
        0, 0, width, height,    # rcFrame
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40, width, height, 1, 24,
        int.from_bytes(fourcc, "little"),  # biCompression (LE fourcc)
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(
            b"strl",
            _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf),
        ),
    )
    movi_payload = b""
    index = []
    for f in frames:
        index.append((4 + len(movi_payload), len(f)))
        movi_payload += _riff_chunk(b"00dc", f)
    movi = _riff_list(b"movi", movi_payload)
    idx1 = _riff_chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<3I", 0x10, off, sz)
            for off, sz in index
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _riff_walk(payload: bytes, pos: int, end: int):
    """Yield (tag, form|None, data_start, data_len) for each chunk in
    [pos, end); LIST chunks report their form and their PAYLOAD span so
    callers can recurse. Enforces word alignment and bounds."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated RIFF chunk header")
        tag = payload[pos:pos + 4]
        sz = int.from_bytes(payload[pos + 4:pos + 8], "little")
        data = pos + 8
        if data + sz > end:
            raise ValueError(f"RIFF chunk {tag!r} overruns its parent")
        if tag == b"LIST":
            if sz < 4:
                raise ValueError("LIST chunk too short for a form")
            yield tag, payload[data:data + 4], data + 4, sz - 4
        else:
            yield tag, None, data, sz
        pos = data + sz + (sz & 1)


def parse_avi_mjpeg(payload: bytes, fourcc: bytes = b"MJPG"):
    """REAL AVI walker: verify the RIFF envelope and 'AVI ' form, parse
    avih (frame count, geometry, single stream), check the stream
    headers declare 'vids'/fourcc with a matching BITMAPINFOHEADER,
    collect the movi '00dc' frame chunks (word-aligned), and verify
    every idx1 entry points at the chunk it indexes. Returns (width,
    height, [frame_bytes]). Fails loudly on any structural lie — a
    size field that disagrees, a frame count mismatch, an index entry
    pointing elsewhere, or (for 'MJPG') a frame that is not a JPEG
    stream."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF payload")
    if int.from_bytes(payload[4:8], "little") != len(payload) - 8:
        raise ValueError("RIFF size field disagrees with payload length")
    if payload[8:12] != b"AVI ":
        raise ValueError("RIFF form is not 'AVI '")

    width = height = total = None
    frames: list[bytes] = []
    index: list[tuple[int, int]] = []
    movi_chunks: list[tuple[int, int]] = []
    for tag, form, start, sz in _riff_walk(payload, 12, len(payload)):
        if tag == b"LIST" and form == b"hdrl":
            saw_stream = False
            for t2, f2, s2, z2 in _riff_walk(payload, start, start + sz):
                if t2 == b"avih":
                    if z2 < 40:
                        raise ValueError("avih too short")
                    fields = struct.unpack("<10I", payload[s2:s2 + 40])
                    total = fields[4]
                    if fields[6] != 1:
                        raise ValueError("expected exactly one stream")
                    width, height = fields[8], fields[9]
                elif t2 == b"LIST" and f2 == b"strl":
                    for t3, _f3, s3, z3 in _riff_walk(
                        payload, s2, s2 + z2
                    ):
                        if t3 == b"strh":
                            fcc_type = payload[s3:s3 + 4]
                            handler = payload[s3 + 4:s3 + 8]
                            if fcc_type != b"vids":
                                raise ValueError(
                                    f"stream type {fcc_type!r} != vids"
                                )
                            if handler != fourcc:
                                raise ValueError(
                                    f"handler {handler!r} != {fourcc!r}"
                                )
                            saw_stream = True
                        elif t3 == b"strf":
                            if z3 < 40:
                                raise ValueError("strf too short")
                            bi = struct.unpack(
                                "<I2i2HI", payload[s3:s3 + 20]
                            )
                            if bi[5] != int.from_bytes(
                                fourcc, "little"
                            ):
                                raise ValueError(
                                    f"biCompression is not {fourcc!r}"
                                )
                            if (bi[1], bi[2]) != (width, height):
                                raise ValueError(
                                    "strf geometry disagrees with avih"
                                )
            if not saw_stream:
                raise ValueError("hdrl carries no vids stream header")
        elif tag == b"LIST" and form == b"movi":
            movi_data = start  # offset 4 in idx1 convention = start
            for t2, _f2, s2, z2 in _riff_walk(payload, start, start + sz):
                if t2 != b"00dc":
                    raise ValueError(f"unexpected movi chunk {t2!r}")
                frame = payload[s2:s2 + z2]
                if fourcc == b"MJPG" and frame[:2] != b"\xff\xd8":
                    raise ValueError("frame chunk is not a JPEG stream")
                frames.append(frame)
                movi_chunks.append((s2 - 8 - (movi_data - 4), z2))
        elif tag == b"idx1":
            if sz % 16:
                raise ValueError("idx1 size not a multiple of 16")
            for k in range(sz // 16):
                e = start + 16 * k
                fcc = payload[e:e + 4]
                if fcc != b"00dc":
                    raise ValueError(f"idx1 entry fourcc {fcc!r}")
                _flags, off, esz = struct.unpack(
                    "<3I", payload[e + 4:e + 16]
                )
                index.append((off, esz))
    if total is None:
        raise ValueError("missing avih header")
    if len(frames) != total:
        raise ValueError(
            f"avih declares {total} frames, movi holds {len(frames)}"
        )
    if index != movi_chunks:
        raise ValueError("idx1 disagrees with the movi chunk layout")
    return width, height, frames


MJPEG_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("frame_idx", Ty.IntegerType()),
        Ty.StructField("n_frames", Ty.IntegerType()),
        Ty.StructField("width", Ty.IntegerType()),
        Ty.StructField("height", Ty.IntegerType()),
        Ty.StructField("block_idx", Ty.IntegerType()),
        Ty.StructField("val", Ty.IntegerType()),
    ]
)


def mjpeg_avi_roundtrip(binary_df: DataFrame) -> DataFrame:
    """Encode MJPEG_FRAMES flat-block frames from each doc's tiled
    bytes as REAL baseline JPEGs, mux them into a REAL AVI container,
    demux + decode it all back, and emit every frame's decoded block
    values — one Arrow-batched stage running the full compressed-video
    chain (container walk, index verification, per-frame entropy
    decode) genuinely per row."""
    import numpy as np

    nblk = JPEG_BW * JPEG_BH
    w, h = JPEG_BW * 8, JPEG_BH * 8

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in MJPEG_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                blk = bytes(content) if content is not None else b""
                if len(blk) < MJPEG_FRAMES * nblk:
                    raise ValueError("payload too short to tile frames")
                jpegs = []
                for f in range(MJPEG_FRAMES):
                    pix = np.repeat(
                        np.frombuffer(
                            blk[f * nblk:(f + 1) * nblk], dtype=np.uint8
                        ).reshape(JPEG_BH, JPEG_BW),
                        8,
                        axis=0,
                    ).repeat(8, axis=1)
                    jpegs.append(encode_jpeg_gray(w, h, pix.tobytes()))
                avi = encode_avi_mjpeg(jpegs, w, h)
                gw, gh, back = parse_avi_mjpeg(avi)
                for fi, stream in enumerate(back):
                    dw, dh, img = decode_jpeg_gray(stream)
                    if (dw, dh) != (gw, gh):
                        raise ValueError(
                            "frame geometry disagrees with container"
                        )
                    for r in range(JPEG_BH):
                        for c in range(JPEG_BW):
                            rows.append(
                                (
                                    int(doc_id), fi, len(back), gw, gh,
                                    r * JPEG_BW + c,
                                    int(img[r * 8, c * 8]),
                                )
                            )
            yield pd.DataFrame(rows, columns=cols)

    return binary_df.select("doc_id", "content").mapInPandas(
        _batches, schema=MJPEG_SCHEMA
    )


# --- REAL image codec, oracle-gated: GIF87a with genuine LZW -----------------
#
# GIF completes the entropy-coder family with the one genuinely
# different algorithm the tree lacked: PPM is raw bytes, JPEG is
# transform + canonical Huffman, PNG is LZ77 + Huffman via zlib — GIF
# is DICTIONARY coding (LZW: the code table is built online from the
# data itself, no statistics pass, variable 9->12-bit codes packed
# LSB-first). Unlike JPEG's flat-block-only lossless gate, GIF is
# lossless on EVERY input, so the oracle gates the full codec on
# arbitrary content. No external analogue in the reference (its media
# handling is a pandas dashboard, ref:streamlit/app.py); format per
# the public GIF87a specification.

GIF_SIG87 = b"GIF87a"
GIF_SIG89 = b"GIF89a"
_GIF_MAX_CODE = 1 << 12  # LZW code table cap (12-bit codes), per spec


class _LSBBitWriter:
    """LSB-first bit packer (GIF's LZW byte order — the OPPOSITE of
    JPEG's MSB-first Huffman packing above)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


def _lzw_compress(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits an initial CLEAR, grows the code width
    when the next free code would not fit, resets the table with a
    CLEAR when it reaches 4096 entries, and terminates with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LSBBitWriter()

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    w.put(clear, width)
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        w.put(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        # width grows when the JUST-ASSIGNED code is the first that
        # needs one more bit (decoder mirrors this exactly)
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == _GIF_MAX_CODE:
            w.put(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        w.put(table[prefix], width)
    w.put(eoi, width)
    return w.flush()


def _lzw_decompress(blob: bytes, min_code_size: int, n_expected: int) -> bytes:
    """GIF-variant LZW decode: CLEAR/EOI handling, the KwKwK case
    (code == next free code), width growth mirrored with the encoder,
    and loud failure on codes beyond the table."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    acc = nbits = pos = 0

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= len(blob):
                raise ValueError("LZW stream ended before EOI")
            acc |= blob[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("first code after CLEAR out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        # at len(table) == 4096 a spec-conformant encoder's next code
        # is CLEAR, which the top of the loop consumes via reset()
    if len(out) != n_expected:
        raise ValueError(
            f"LZW pixel count {len(out)} != expected {n_expected}"
        )
    return bytes(out)


def encode_gif_gray(width: int, height: int, pixels: bytes) -> bytes:
    """REAL GIF87a encoder, 8-bit grayscale: logical screen descriptor,
    a 256-entry global color table with entry i = (i, i, i) (so pixel
    bytes ARE palette indexes), one image descriptor, and genuine LZW
    image data in length-prefixed sub-blocks."""
    assert len(pixels) == width * height
    out = bytearray()
    out += GIF_SIG87
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0xF7)  # GCT present, 8-bit color resolution, 256 entries
    out.append(0)  # background color index
    out.append(0)  # pixel aspect ratio: unspecified
    for i in range(256):
        out += bytes([i, i, i])
    out.append(0x2C)  # image separator
    out += (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0)  # no local color table, not interlaced
    out.append(8)  # LZW minimum code size
    blob = _lzw_compress(pixels, 8)
    for i in range(0, len(blob), 255):
        part = blob[i:i + 255]
        out.append(len(part))
        out += part
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif_gray(payload: bytes):
    """REAL GIF decoder for the 8-bit grayscale contract: signature
    check (87a or 89a), screen-descriptor parse, global color table
    read with a grayness check on every used entry, extension-block
    skipping (sub-block walk — 89a files carry these), image-descriptor
    contract enforcement (no local table, not interlaced), sub-block
    reassembly, and genuine LZW decode. Returns (width, height, uint8
    ndarray); fails loudly on anything outside the contract."""
    import numpy as np

    if payload[:6] not in (GIF_SIG87, GIF_SIG89):
        raise ValueError("not a GIF (bad signature)")
    if len(payload) < 13:
        raise ValueError("truncated screen descriptor")
    packed = payload[10]
    if not packed & 0x80:
        raise ValueError("missing global color table")
    gct_n = 2 << (packed & 0x07)
    pos = 13
    gct = payload[pos:pos + 3 * gct_n]
    if len(gct) != 3 * gct_n:
        raise ValueError("truncated global color table")
    pos += 3 * gct_n
    while True:
        if pos >= len(payload):
            raise ValueError("no image descriptor before EOF")
        intro = payload[pos]
        pos += 1
        if intro == 0x21:  # extension: label byte + sub-blocks
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated extension")
                ln = payload[pos]
                pos += 1
                if ln == 0:
                    break
                pos += ln
        elif intro == 0x2C:
            break
        elif intro == 0x3B:
            raise ValueError("trailer before any image")
        else:
            raise ValueError(f"unknown block introducer {intro:#x}")
    if pos + 9 > len(payload):
        raise ValueError("truncated image descriptor")
    iw = int.from_bytes(payload[pos + 4:pos + 6], "little")
    ih = int.from_bytes(payload[pos + 6:pos + 8], "little")
    ipacked = payload[pos + 8]
    if ipacked & 0x80:
        raise ValueError("local color table unsupported")
    if ipacked & 0x40:
        raise ValueError("interlaced GIF unsupported")
    pos += 9
    if pos >= len(payload):
        raise ValueError("missing LZW minimum code size")
    min_code = payload[pos]
    pos += 1
    if not 2 <= min_code <= 8:
        raise ValueError(f"invalid LZW minimum code size {min_code}")
    blob = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated image data")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            break
        blob += payload[pos:pos + ln]
        if len(payload) < pos + ln:
            raise ValueError("truncated image sub-block")
        pos += ln
    idx = _lzw_decompress(bytes(blob), min_code, iw * ih)
    img = np.zeros(iw * ih, dtype=np.uint8)
    for i, ix in enumerate(idx):
        if 3 * ix + 2 >= len(gct):
            raise ValueError(f"palette index {ix} beyond color table")
        r, g, b = gct[3 * ix], gct[3 * ix + 1], gct[3 * ix + 2]
        if not (r == g == b):
            raise ValueError("non-grayscale palette entry used")
        img[i] = r
    return iw, ih, img.reshape(ih, iw)


#: oracle-path geometry: 10x6 gray, 60 tiled doc bytes per image —
#: distinct from PNG's 8x8 so a swapped codec cannot alias the gate
GIF_W, GIF_H = 10, 6

GIF_PIXELS_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("width", Ty.IntegerType()),
        Ty.StructField("height", Ty.IntegerType()),
        Ty.StructField("pos", Ty.IntegerType()),
        Ty.StructField("val", Ty.IntegerType()),
    ]
)


def gif_roundtrip_pixels(binary_df: DataFrame) -> DataFrame:
    """Encode each doc's 60 tiled bytes as a REAL 10x6 grayscale GIF87a
    (genuine LZW: online dictionary, variable LSB-first code widths),
    decode it back, and emit every pixel — one Arrow-batched
    mapInPandas stage. GIF is lossless on ALL inputs, so the DuckDB
    oracle predicts each output from the raw tiled bytes; any defect
    in the LZW table growth, the bit packer, sub-block framing, or the
    palette round-trip changes a pixel and fails the hash."""
    import numpy as np  # noqa: F401  (decoder dependency, imported lazily)

    n = GIF_W * GIF_H

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in GIF_PIXELS_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                pix = bytes(content) if content is not None else b""
                if len(pix) < n:
                    raise ValueError("payload too short to tile pixels")
                stream = encode_gif_gray(GIF_W, GIF_H, pix[:n])
                gw, gh, img = decode_gif_gray(stream)
                flat = img.reshape(-1)
                for p in range(n):
                    rows.append(
                        (int(doc_id), gw, gh, p, int(flat[p]))
                    )
            yield pd.DataFrame(rows, columns=cols)

    return binary_df.select("doc_id", "content").mapInPandas(
        _batches, schema=GIF_PIXELS_SCHEMA
    )


# --- REAL audio codec, oracle-gated: IMA ADPCM in a WAV container ------------
#
# The audio mirror of the JPEG/GIF work: a genuine COMPRESSED audio
# codec (4 bits per 16-bit sample) with real container plumbing, no
# new dependency. IMA/DVI ADPCM per the public IMA specification:
# adaptive delta quantization over an 89-entry step table, 4-bit codes
# (sign + 3 magnitude bits), per-block state headers; stored as
# WAVE_FORMAT_IMA_ADPCM (tag 0x0011) with the mandatory fact chunk.
# The oracle gate rides a STAIRCASE signal: sample diffs are chosen as
# exactly the deltas the decoder reconstructs for a fixed driving
# nibble pattern (simulated at import from the constant tables), so
# the round-trip is exactly lossless and DuckDB predicts every decoded
# sample as base + OFFSETS[pos] without running a codec — unlike a
# flat-only gate this exercises nonzero nibbles of both signs, step
# index growth/decay, nibble packing order, and the second block's
# verbatim header. General lossy inputs are pinned by the unit battery.

ADPCM_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
ADPCM_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _adpcm_reconstruct(step: int, code: int) -> int:
    """Decoder-side delta for a 4-bit code's 3 magnitude bits (the
    spec's bit-serial approximation of (mag + 0.5) * step / 4)."""
    delta = step >> 3
    if code & 4:
        delta += step
    if code & 2:
        delta += step >> 1
    if code & 1:
        delta += step >> 2
    return delta


def _adpcm_encode_sample(diff: int, step: int) -> int:
    """Greedy magnitude quantization (the spec's reference encoder)."""
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    return code


def _adpcm_step(predictor: int, index: int, code: int) -> tuple[int, int]:
    """Shared state transition: apply code to (predictor, index)."""
    delta = _adpcm_reconstruct(ADPCM_STEP_TABLE[index], code)
    predictor = predictor - delta if code & 8 else predictor + delta
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + ADPCM_INDEX_TABLE[code & 7]))
    return predictor, index


ADPCM_DATA_BYTES = 16  # per block: 32 nibbles
ADPCM_BLOCK_SAMPLES = 1 + 2 * ADPCM_DATA_BYTES  # verbatim header + nibbles
ADPCM_BLOCKS = 2
ADPCM_N_SAMPLES = ADPCM_BLOCKS * ADPCM_BLOCK_SAMPLES  # 66
ADPCM_SAMPLE_RATE = 8000
#: the verbatim jump encoded into block 2's header (exercises the
#: header parse: a mis-read predictor shifts every block-2 sample)
_ADPCM_BLOCK2_JUMP = 500

#: fixed driving nibbles, sign-mirrored so the staircase stays bounded:
#: block 1 exercises every magnitude (0-7) in both signs and walks the
#: step index from 0 up to 64 (most of the table's range); block 2
#: rides only decrementing codes (0-3, both signs) at those LARGE
#: steps, decaying the index back to 32 — so the gate covers growth,
#: decay, and big-step deltas without ever nearing the int16 clamps
#: (clamping would break the exact-losslessness the oracle relies on)
_ADPCM_DRIVE1 = (
    [4, 12, 5, 13, 6, 14, 1, 9, 0, 8, 2, 10, 7, 15, 3, 11] * 2
)[:2 * ADPCM_DATA_BYTES]
_ADPCM_DRIVE2 = ([0, 8, 1, 9, 2, 10, 3, 11] * 4)[:2 * ADPCM_DATA_BYTES]


def _adpcm_plan() -> list[int]:
    """Simulate the codec over the driving nibbles ONCE at import,
    yielding the per-position absolute offsets OFFSETS[0..65] of the
    staircase signal (relative to the per-doc base). Because each
    offset diff is exactly a reconstructable delta at its state, the
    greedy encoder reproduces the driving code (delta map injective
    and monotone for every table step) and the round-trip is exactly
    lossless; tests assert this end to end."""
    offs = [0]
    pred, idx = 0, 0
    for code in _ADPCM_DRIVE1:
        pred, idx = _adpcm_step(pred, idx, code)
        offs.append(pred)
    # block 2: header sample stored verbatim (any value), index carries
    pred2 = offs[-1] + _ADPCM_BLOCK2_JUMP
    offs.append(pred2)
    pred = pred2
    for code in _ADPCM_DRIVE2:
        pred, idx = _adpcm_step(pred, idx, code)
        offs.append(pred)
    assert len(offs) == ADPCM_N_SAMPLES
    assert max(abs(v) for v in offs) < 20000  # int16 headroom vs base
    return offs


ADPCM_OFFSETS = _adpcm_plan()


def encode_wav_ima(samples: list[int]) -> bytes:
    """REAL IMA-ADPCM WAV writer (mono, tag 0x0011): fmt chunk with
    cbSize=2 + samplesPerBlock, the mandatory fact chunk, and
    fixed-size blocks — 4-byte state header (predictor int16 LE, step
    index, reserved) + low-nibble-first packed codes."""
    import struct

    n = len(samples)
    block_align = 4 + ADPCM_DATA_BYTES
    assert n % ADPCM_BLOCK_SAMPLES == 0
    data = bytearray()
    idx = 0
    i = 0
    while i < n:
        pred = samples[i]
        i += 1
        data += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for _ in range(2 * ADPCM_DATA_BYTES):
            diff = samples[i] - pred
            code = _adpcm_encode_sample(
                diff, ADPCM_STEP_TABLE[idx]
            )
            pred, idx = _adpcm_step(pred, idx, code)
            nibbles.append(code)
            i += 1
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            data.append(lo | (hi << 4))
    byte_rate = (
        ADPCM_SAMPLE_RATE * block_align + ADPCM_BLOCK_SAMPLES - 1
    ) // ADPCM_BLOCK_SAMPLES
    fmt = struct.pack(
        "<HHIIHHHH",
        0x0011, 1, ADPCM_SAMPLE_RATE, byte_rate,
        block_align, 4, 2, ADPCM_BLOCK_SAMPLES,
    )
    fact = struct.pack("<I", n)
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"fact" + len(fact).to_bytes(4, "little") + fact
        + b"data" + len(data).to_bytes(4, "little") + bytes(data)
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav_ima(payload: bytes) -> tuple[int, list[int]]:
    """REAL IMA-ADPCM WAV reader: RIFF envelope + declared-size check,
    word-aligned chunk walk, fmt contract enforcement (tag 0x0011,
    mono, 4-bit, samplesPerBlock consistent with blockAlign), fact
    cross-check, then per-block state-header parse and nibble decode.
    Returns (sample_rate, samples); fails loudly off-contract."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    declared = int.from_bytes(payload[4:8], "little")
    if declared != len(payload) - 8:
        raise ValueError("RIFF size disagrees with payload")
    pos, fmt, fact_n, data = 12, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        ln = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            fmt = body
        elif tag == b"fact":
            fact_n = int.from_bytes(body[:4], "little")
        elif tag == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None or fact_n is None:
        raise ValueError("missing fmt/fact/data chunk")
    if len(fmt) < 20:
        # keep the failure-type contract uniform: a short fmt chunk
        # would raise struct.error from unpack, not the ValueError
        # every other off-contract path raises (round-8 ADVICE)
        raise ValueError("truncated fmt chunk")
    (tag16, ch, rate, _br, block_align, bits, cb, spb) = struct.unpack(
        "<HHIIHHHH", fmt[:20]
    )
    if tag16 != 0x0011:
        raise ValueError(f"not IMA ADPCM (format tag {tag16:#x})")
    if ch != 1 or bits != 4 or cb != 2:
        raise ValueError("only mono 4-bit IMA ADPCM supported")
    if spb != 1 + 2 * (block_align - 4):
        raise ValueError("samplesPerBlock inconsistent with blockAlign")
    if len(data) % block_align:
        raise ValueError("data chunk not block-aligned")
    samples: list[int] = []
    for b0 in range(0, len(data), block_align):
        pred, idx, reserved = struct.unpack(
            "<hBB", data[b0:b0 + 4]
        )
        if reserved or idx > 88:
            raise ValueError("corrupt block state header")
        samples.append(pred)
        for byte in data[b0 + 4:b0 + block_align]:
            for code in (byte & 0x0F, byte >> 4):
                pred, idx = _adpcm_step(pred, idx, code)
                samples.append(pred)
    if len(samples) != fact_n:
        raise ValueError("fact sample count disagrees with data")
    return rate, samples


ADPCM_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("sample_rate", Ty.IntegerType()),
        Ty.StructField("n_samples", Ty.IntegerType()),
        Ty.StructField("n_bytes", Ty.IntegerType()),
        Ty.StructField("pos", Ty.IntegerType()),
        Ty.StructField("val", Ty.IntegerType()),
    ]
)


def adpcm_roundtrip_samples(binary_df: DataFrame) -> DataFrame:
    """Build each doc's staircase signal from its base byte, encode it
    as a REAL IMA-ADPCM WAV, decode it back through the full container
    walk, and emit every sample — one Arrow-batched mapInPandas stage.
    The staircase construction makes the lossy codec exactly lossless
    (module note), so the DuckDB oracle predicts val = base +
    OFFSETS[pos] from the raw byte; a defect in the step tables, the
    nibble packing, the state clamps, or either block header changes
    a sample and fails the hash."""
    offs = ADPCM_OFFSETS

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in ADPCM_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                if not b:
                    raise ValueError("payload too short for a base byte")
                base = (b[0] - 128) * 64
                sig = [base + o for o in offs]
                wav = encode_wav_ima(sig)
                rate, back = decode_wav_ima(wav)
                if back != sig:
                    raise ValueError(
                        "staircase round-trip lost samples"
                    )
                for p, v in enumerate(back):
                    rows.append(
                        (
                            int(doc_id), rate, len(back), len(wav),
                            p, int(v),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return binary_df.select("doc_id", "content").mapInPandas(
        _batches, schema=ADPCM_SCHEMA
    )


# --- REAL inter-frame video: motion-compensated P-frames (MC88) --------------
#
# The last honest video caveat was inter-frame PREDICTION — "H.264-class
# needs pyav". The algorithmic core of every inter-frame codec since
# H.261 is implementable with what is already in this tree: exhaustive
# block motion search against the previously RECONSTRUCTED frame,
# per-block motion vectors, and a transform-coded residual — here the
# residual image rides the in-tree baseline-JPEG path, so the whole
# P-frame chain (search -> MV coding -> prediction -> residual
# transform/entropy -> drift-free reconstruction) is genuine. Streams
# are MPEG-style GOPs (one JPEG I-frame + P-frames) muxed into the REAL
# AVI container under the private fourcc 'MC88' (AVI fourcc space is
# open; the wire format is documented here, not borrowed). What still
# needs a codec library is bitstream compatibility with H.26x, not the
# motion-compensation loop itself.

MC_FOURCC = b"MC88"
MC_SEARCH = 8  # exhaustive +/-8 px search window, step 1
MC_FRAMES = 3  # I + 2 P
MC_BW, MC_BH = JPEG_BW, JPEG_BH  # 4x3 blocks = 32x24 px


def _mc_block_search(ref, target, r, c, search=MC_SEARCH):
    """Exhaustive SAD search for target block (r, c) over ref within
    +/-search px (clamped in-bounds). Deterministic: ties broken by
    smallest (SAD, dy, dx). Returns (dy, dx, pred_block)."""
    import numpy as np

    h, w = ref.shape
    y0, x0 = r * 8, c * 8
    tgt = target[y0:y0 + 8, x0:x0 + 8].astype(np.int64)
    best = None
    for dy in range(-search, search + 1):
        y = y0 + dy
        if y < 0 or y + 8 > h:
            continue
        for dx in range(-search, search + 1):
            x = x0 + dx
            if x < 0 or x + 8 > w:
                continue
            sad = int(
                np.abs(ref[y:y + 8, x:x + 8].astype(np.int64) - tgt).sum()
            )
            key = (sad, dy, dx)
            if best is None or key < best[0]:
                best = (key, ref[y:y + 8, x:x + 8])
    (sad, dy, dx), pred = best
    return dy, dx, pred


def _mc_motion_field(ref, tgt, search=MC_SEARCH):
    """Vectorized exhaustive motion search: one numpy pass per offset
    scores EVERY valid block at once (reshape to (nr, 8, nc, 8), sum
    the 8x8 axes), iterating offsets in (dy, dx) ascending with
    strict-< updates — so ties resolve to the smallest (sad, dy, dx)
    exactly like the per-block reference search (_mc_block_search;
    equivalence is unit-tested). Returns (mvs int array (nr, nc, 2),
    pred image). ~300x faster than per-block Python loops — the
    difference between a 40 s and a timed-out sf1-shape pass."""
    import numpy as np

    h, w = ref.shape
    nr, nc = h // 8, w // 8
    best_sad = np.full((nr, nc), np.iinfo(np.int64).max, dtype=np.int64)
    mvs = np.zeros((nr, nc, 2), dtype=np.int64)
    pred = np.zeros((h, w), dtype=np.uint8)
    refi = ref.astype(np.int64)
    tgti = tgt.astype(np.int64)
    for dy in range(-search, search + 1):
        # valid block rows: 0 <= r*8+dy and r*8+dy+8 <= h
        rlo = max(0, (-dy + 7) // 8)
        rhi = min(nr - 1, (h - 8 - dy) // 8)
        if rlo > rhi:
            continue
        for dx in range(-search, search + 1):
            clo = max(0, (-dx + 7) // 8)
            chi = min(nc - 1, (w - 8 - dx) // 8)
            if clo > chi:
                continue
            sub_r = refi[
                rlo * 8 + dy:(rhi + 1) * 8 + dy,
                clo * 8 + dx:(chi + 1) * 8 + dx,
            ]
            sub_t = tgti[rlo * 8:(rhi + 1) * 8, clo * 8:(chi + 1) * 8]
            sad = (
                np.abs(sub_r - sub_t)
                .reshape(rhi - rlo + 1, 8, chi - clo + 1, 8)
                .sum(axis=(1, 3))
            )
            win = sad < best_sad[rlo:rhi + 1, clo:chi + 1]
            if win.any():
                blk = best_sad[rlo:rhi + 1, clo:chi + 1]
                blk[win] = sad[win]
                mv = mvs[rlo:rhi + 1, clo:chi + 1]
                mv[win] = (dy, dx)
    for r in range(nr):
        for c in range(nc):
            dy, dx = int(mvs[r, c, 0]), int(mvs[r, c, 1])
            pred[r * 8:r * 8 + 8, c * 8:c * 8 + 8] = ref[
                r * 8 + dy:r * 8 + dy + 8, c * 8 + dx:c * 8 + dx + 8
            ]
    return mvs, pred


def encode_mc_video(frames) -> bytes:
    """REAL motion-compensated encoder: frame 0 as a baseline-JPEG
    I-frame; each later frame as a P-frame — per 8x8 block an
    exhaustive SAD motion search against the previously RECONSTRUCTED
    frame (never the source: reconstruction is what the decoder has,
    so prediction drift is zero by construction), MVs stored biased by
    +MC_SEARCH (one byte per component), residual shifted to +128 and
    coded through the in-tree JPEG path. Returns the AVI ('MC88')
    stream."""
    import numpy as np

    h, w = frames[0].shape
    payloads = [b"I" + encode_jpeg_gray(w, h, frames[0].tobytes())]
    _, _, recon = decode_jpeg_gray(payloads[0][1:])
    for f in frames[1:]:
        field, preds = _mc_motion_field(recon, f)
        mvs = bytearray()
        for r in range(h // 8):
            for c in range(w // 8):
                mvs.append(int(field[r, c, 0]) + MC_SEARCH)
                mvs.append(int(field[r, c, 1]) + MC_SEARCH)
        res = f.astype(np.int64) - preds.astype(np.int64)
        res_img = np.clip(res + 128, 0, 255).astype(np.uint8)
        payloads.append(
            b"P" + bytes(mvs) + encode_jpeg_gray(w, h, res_img.tobytes())
        )
        _, _, res_back = decode_jpeg_gray(payloads[-1][1 + len(mvs):])
        recon = np.clip(
            preds.astype(np.int64) + res_back.astype(np.int64) - 128,
            0, 255,
        ).astype(np.uint8)
    return encode_avi_mjpeg(payloads, w, h, fourcc=MC_FOURCC)


def decode_mc_video(payload: bytes):
    """REAL motion-compensated decoder: AVI walk (fourcc-checked),
    I-frame JPEG decode, then per P-frame the MV table parse and
    motion-compensated reconstruction recon = pred(MV over previous
    reconstruction) + (residual - 128), clamped. Fails loudly on a bad
    frame tag, an out-of-range MV, or a geometry lie."""
    import numpy as np

    w, h, chunks = parse_avi_mjpeg(payload, fourcc=MC_FOURCC)
    nblk = (h // 8) * (w // 8)
    frames = []
    recon = None
    for i, ch in enumerate(chunks):
        tag = ch[:1]
        if i == 0:
            if tag != b"I":
                raise ValueError("first frame is not an I-frame")
            dw, dh, recon = decode_jpeg_gray(ch[1:])
            if (dw, dh) != (w, h):
                raise ValueError("I-frame geometry disagrees with AVI")
        else:
            if tag != b"P":
                raise ValueError(f"frame {i} is not a P-frame")
            mvs = ch[1:1 + 2 * nblk]
            if len(mvs) != 2 * nblk:
                raise ValueError("truncated MV table")
            dw, dh, res = decode_jpeg_gray(ch[1 + 2 * nblk:])
            if (dw, dh) != (w, h):
                raise ValueError("residual geometry disagrees with AVI")
            out = np.zeros((h, w), dtype=np.int64)
            k = 0
            for r in range(h // 8):
                for c in range(w // 8):
                    dy = mvs[2 * k] - MC_SEARCH
                    dx = mvs[2 * k + 1] - MC_SEARCH
                    k += 1
                    y, x = r * 8 + dy, c * 8 + dx
                    if y < 0 or y + 8 > h or x < 0 or x + 8 > w:
                        raise ValueError("motion vector out of bounds")
                    out[r * 8:r * 8 + 8, c * 8:c * 8 + 8] = (
                        recon[y:y + 8, x:x + 8].astype(np.int64)
                        + res[r * 8:r * 8 + 8, c * 8:c * 8 + 8].astype(
                            np.int64
                        )
                        - 128
                    )
            recon = np.clip(out, 0, 255).astype(np.uint8)
        frames.append(recon)
    return w, h, frames


MC_SCHEMA = MJPEG_SCHEMA  # same row shape: per (doc, frame, block)


def mc_video_roundtrip(binary_df: DataFrame) -> DataFrame:
    """Build each doc's block-scrolling 3-frame scene from 6 tiled
    bytes (frame k block (r, c) = byte[2r + (c + k) % 2] — every P
    target block has an exact same-row match at dx = +/-8, inside the
    search window), run the FULL inter-frame chain (I-frame JPEG,
    exhaustive motion search, MV coding, residual JPEG, drift-free
    reconstruction) through mux AND demux, and emit every decoded
    block — one Arrow-batched mapInPandas stage. By construction the
    residual is zero, the residual image is flat 128 (JPEG-lossless),
    and the reconstruction is exact, so the DuckDB oracle predicts
    every block value closed-form from the raw bytes; general lossy
    motion is pinned by the unit battery."""
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in MC_SCHEMA.fields]
        h, w = MC_BH * 8, MC_BW * 8
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                if len(b) < 6:
                    raise ValueError("payload too short for the scene")
                frames = []
                for k in range(MC_FRAMES):
                    fr = np.zeros((h, w), dtype=np.uint8)
                    for r in range(MC_BH):
                        for c in range(MC_BW):
                            fr[
                                r * 8:r * 8 + 8, c * 8:c * 8 + 8
                            ] = b[2 * r + (c + k) % 2]
                    frames.append(fr)
                stream = encode_mc_video(frames)
                gw, gh, back = decode_mc_video(stream)
                for fi, img in enumerate(back):
                    if not (img == frames[fi]).all():
                        raise ValueError(
                            f"P-frame chain lost frame {fi}"
                        )
                    for r in range(MC_BH):
                        for c in range(MC_BW):
                            rows.append(
                                (
                                    int(doc_id), fi, len(back), gw, gh,
                                    r * MC_BW + c,
                                    int(img[r * 8, c * 8]),
                                )
                            )
            yield pd.DataFrame(rows, columns=cols)

    return binary_df.select("doc_id", "content").mapInPandas(
        _batches, schema=MC_SCHEMA
    )


# --- LZ77 sliding-window codec ----------------------------------------------

#: window / lookahead / minimum match of the in-tree LZ77: the
#: DEFLATE-family parameters scaled to gate-sized payloads. Tokens are
#: (offset, length) matches — self-overlap allowed, the RLE trick —
#: or single literals; greedy longest match, ties to the SMALLEST
#: offset (nearest), the deterministic policy both the oracle's
#: closed-form token count and the unit battery pin.
LZ_WINDOW = 32
LZ_LOOKAHEAD = 15
LZ_MIN_MATCH = 3


def lz77_encode(data: bytes) -> list[tuple]:
    """Greedy LZ77 over a sliding window: at each position take the
    longest match of the lookahead against the previous LZ_WINDOW
    bytes (matches may overlap their own output — offset < length is
    legal and decodes byte-by-byte), emit ('M', offset, length) when
    >= LZ_MIN_MATCH else ('L', byte). Nearest offset wins ties."""
    i, n, out = 0, len(data), []
    while i < n:
        best_len = 0
        best_off = 0
        maxlen = min(LZ_LOOKAHEAD, n - i)
        for off in range(1, min(LZ_WINDOW, i) + 1):
            k = 0
            while k < maxlen and data[i + k] == data[i - off + k % off]:
                k += 1
            if k > best_len:  # strict: nearest offset wins ties
                best_len, best_off = k, off
        if best_len >= LZ_MIN_MATCH:
            out.append(("M", best_off, best_len))
            i += best_len
        else:
            out.append(("L", data[i]))
            i += 1
    return out


def lz77_decode(tokens: list[tuple]) -> bytes:
    """Inverse: literals append; matches copy byte-by-byte from
    `offset` back — the sequential copy is what makes self-overlapping
    (RLE-style) matches decode correctly. Fails loudly (ValueError) on
    an offset past the start or an unknown token kind."""
    buf = bytearray()
    for t in tokens:
        if t[0] == "L":
            buf.append(t[1])
        elif t[0] == "M":
            _, off, ln = t
            if off < 1 or off > len(buf):
                raise ValueError("match offset out of range")
            for _ in range(ln):
                buf.append(buf[-off])
        else:
            raise ValueError(f"unknown token kind {t[0]!r}")
    return bytes(buf)


LZ77_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("orig_len", Ty.LongType()),
        Ty.StructField("n_literals", Ty.IntegerType()),
        Ty.StructField("n_matches", Ty.IntegerType()),
        Ty.StructField("comp_len", Ty.LongType()),
        Ty.StructField("decoded_md5", Ty.StringType()),
        Ty.StructField("decoded_ok", Ty.BooleanType()),
    ]
)


def lz77_roundtrip(df: DataFrame) -> DataFrame:
    """Arrow-batched LZ77 encode -> decode over a `content` string
    column; one row per document. comp_len is the serialized token
    stream size (2 bytes per literal, 3 per match); decoded_md5 hashes
    the decoder's output so the oracle gates full-content equality
    without ever running a codec."""
    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in LZ77_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                data = (content or "").encode("utf-8")
                toks = lz77_encode(data)
                dec = lz77_decode(toks)
                n_lit = sum(1 for t in toks if t[0] == "L")
                n_mat = len(toks) - n_lit
                rows.append(
                    (
                        int(doc_id),
                        len(data),
                        n_lit,
                        n_mat,
                        2 * n_lit + 3 * n_mat,
                        hashlib.md5(dec).hexdigest(),
                        dec == data,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", "content").mapInPandas(
        _batches, schema=LZ77_SCHEMA
    )


# --- DEFLATE (RFC 1951): fixed-Huffman encoder + full inflate ------------
#
# The capstone of the compression family: LZ77 (sliding-window matching,
# above) feeds canonical Huffman entropy coding (the JPEG codec's class)
# to produce an actual RFC 1951 bitstream. Conformance is EXTERNAL both
# directions: our encoder's output is decoded by zlib (an independent,
# canonical implementation), and our inflate decodes zlib's own raw
# streams — including dynamic-Huffman blocks — back to the source bytes.

#: length symbol table, RFC 1951 3.2.5: (base_length, extra_bits) for
#: symbols 257..285.
_DEFLATE_LEN = [
    (3, 0), (4, 0), (5, 0), (6, 0), (7, 0), (8, 0), (9, 0), (10, 0),
    (11, 1), (13, 1), (15, 1), (17, 1), (19, 2), (23, 2), (27, 2),
    (31, 2), (35, 3), (43, 3), (51, 3), (59, 3), (67, 4), (83, 4),
    (99, 4), (115, 4), (131, 5), (163, 5), (195, 5), (227, 5), (258, 0),
]

#: distance symbol table: (base_dist, extra_bits) for symbols 0..29.
_DEFLATE_DIST = [
    (1, 0), (2, 0), (3, 0), (4, 0), (5, 1), (7, 1), (9, 2), (13, 2),
    (17, 3), (25, 3), (33, 4), (49, 4), (65, 5), (97, 5), (129, 6),
    (193, 6), (257, 7), (385, 7), (513, 8), (769, 8), (1025, 9),
    (1537, 9), (2049, 10), (3073, 10), (4097, 11), (6145, 11),
    (8193, 12), (12289, 12), (16385, 13), (24577, 13),
]


def _canonical_codes(lengths: list[int]) -> list[tuple[int, int]]:
    """RFC 1951 3.2.2 canonical Huffman assignment: (code, nbits) per
    symbol; symbols with length 0 get (0, 0) and are unused."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for bits in range(1, max_len + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    out = []
    for ln in lengths:
        if ln == 0:
            out.append((0, 0))
        else:
            out.append((next_code[ln], ln))
            next_code[ln] += 1
    return out


def _fixed_lit_lengths() -> list[int]:
    """Fixed literal/length code lengths, RFC 1951 3.2.6."""
    return [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8


_FIXED_LIT_CODES = _canonical_codes(_fixed_lit_lengths())
_FIXED_DIST_CODES = _canonical_codes([5] * 30)


class _DefBitWriter:
    """DEFLATE bit packing: integers LSB-first, Huffman codes MSB-first
    (so the code is emitted bit-reversed relative to its numeric form)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.bit = 0
        self.acc = 0

    def write_bits(self, value: int, nbits: int) -> None:
        for i in range(nbits):
            self.acc |= ((value >> i) & 1) << self.bit
            self.bit += 1
            if self.bit == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.bit = 0

    def write_code(self, code: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.write_bits((code >> i) & 1, 1)

    def align(self) -> None:
        if self.bit:
            self.buf.append(self.acc)
            self.acc = 0
            self.bit = 0

    def getvalue(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _length_symbol(ln: int) -> tuple[int, int, int]:
    """(symbol, extra_bits, extra_value) for a match length 3..258."""
    for i in range(len(_DEFLATE_LEN) - 1, -1, -1):
        base, extra = _DEFLATE_LEN[i]
        if ln >= base:
            return 257 + i, extra, ln - base
    raise ValueError(f"bad match length {ln}")


def _dist_symbol(dist: int) -> tuple[int, int, int]:
    """(symbol, extra_bits, extra_value) for a distance 1..32768."""
    for i in range(len(_DEFLATE_DIST) - 1, -1, -1):
        base, extra = _DEFLATE_DIST[i]
        if dist >= base:
            return i, extra, dist - base
    raise ValueError(f"bad distance {dist}")


#: encoder matching parameters: full DEFLATE ranges.
DEFLATE_WINDOW = 32768
DEFLATE_MIN_MATCH = 3
DEFLATE_MAX_MATCH = 258


def _deflate_tokens(data: bytes) -> list[tuple]:
    """Greedy hash-chain LZ77 at DEFLATE's parameters: longest match
    wins, NEAREST distance breaks ties (deterministic; also the
    cheapest distance code). Self-overlapping matches legal."""
    n = len(data)
    head: dict[bytes, list[int]] = {}
    out: list[tuple] = []
    i = 0
    while i < n:
        best_len = 0
        best_dist = 0
        if i + DEFLATE_MIN_MATCH <= n:
            key = data[i : i + 3]
            cand = head.get(key)
            if cand:
                lo = i - DEFLATE_WINDOW
                maxlen = min(DEFLATE_MAX_MATCH, n - i)
                for j in reversed(cand):  # nearest first
                    if j < lo:
                        break
                    k = 3
                    while k < maxlen and data[i + k] == data[j + k % (i - j) if j + k >= i else j + k]:
                        k += 1
                    if k > best_len:
                        best_len, best_dist = k, i - j
                        if k == maxlen:
                            break
        if best_len >= DEFLATE_MIN_MATCH:
            out.append(("M", best_dist, best_len))
            end = i + best_len
            while i < end:
                if i + 3 <= n:
                    head.setdefault(data[i : i + 3], []).append(i)
                i += 1
        else:
            out.append(("L", data[i]))
            if i + 3 <= n:
                head.setdefault(data[i : i + 3], []).append(i)
            i += 1
    return out


def _fixed_block_bits(tokens: list[tuple]) -> int:
    """Exact bit cost of one fixed-Huffman block holding `tokens`
    (header + symbols + EOB)."""
    bits = 3 + _FIXED_LIT_CODES[256][1]
    for t in tokens:
        if t[0] == "L":
            bits += _FIXED_LIT_CODES[t[1]][1]
        else:
            _, dist, ln = t
            sym, extra, _ = _length_symbol(ln)
            bits += _FIXED_LIT_CODES[sym][1] + extra
            dsym, dextra, _ = _dist_symbol(dist)
            bits += _FIXED_DIST_CODES[dsym][1] + dextra
    return bits


def deflate_fixed_encode(data: bytes) -> bytes:
    """RFC 1951 raw-deflate encoder: greedy LZ77 tokens entropy-coded
    in ONE fixed-Huffman block (BTYPE=01), unless stored blocks
    (BTYPE=00, 5-byte header per <=65535-byte chunk) are strictly
    smaller — the incompressible-input guard real encoders apply. The
    output decodes with `zlib.decompress(out, wbits=-15)` (conformance
    pinned by the unit battery AND inside the gated query)."""
    tokens = _deflate_tokens(data)
    fixed_bits = _fixed_block_bits(tokens)
    n_chunks = max(1, (len(data) + 65534) // 65535)
    stored_bytes = 5 * n_chunks + len(data)
    if (fixed_bits + 7) // 8 >= stored_bytes:
        w = _DefBitWriter()
        pos = 0
        n = len(data)
        first = True
        while first or pos < n:
            first = False
            chunk = data[pos : pos + 65535]
            pos += len(chunk)
            w.write_bits(1 if pos >= n else 0, 1)
            w.write_bits(0, 2)  # BTYPE=00
            w.align()
            ln = len(chunk)
            w.write_bits(ln, 16)
            w.write_bits(ln ^ 0xFFFF, 16)
            w.buf.extend(chunk)
        return w.getvalue()
    w = _DefBitWriter()
    w.write_bits(1, 1)  # BFINAL
    w.write_bits(1, 2)  # BTYPE=01 fixed
    for t in tokens:
        if t[0] == "L":
            code, nb = _FIXED_LIT_CODES[t[1]]
            w.write_code(code, nb)
        else:
            _, dist, ln = t
            sym, extra, ev = _length_symbol(ln)
            code, nb = _FIXED_LIT_CODES[sym]
            w.write_code(code, nb)
            if extra:
                w.write_bits(ev, extra)
            dsym, dextra, dev = _dist_symbol(dist)
            dcode, dnb = _FIXED_DIST_CODES[dsym]
            w.write_code(dcode, dnb)
            if dextra:
                w.write_bits(dev, dextra)
    code, nb = _FIXED_LIT_CODES[256]
    w.write_code(code, nb)
    return w.getvalue()


class _DefBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated deflate stream")
        b = (self.data[self.pos] >> self.bit) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.read_bit() << i
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _HuffTree:
    """Canonical-Huffman decoder: walks (first_code, first_symbol_index)
    per bit length — O(max_len) per symbol, no table blowup."""

    def __init__(self, lengths: list[int]) -> None:
        max_len = max(lengths) if lengths else 0
        self.counts = [0] * (max_len + 1)
        for ln in lengths:
            if ln:
                self.counts[ln] += 1
        self.symbols = []
        for bits in range(1, max_len + 1):
            for sym, ln in enumerate(lengths):
                if ln == bits:
                    self.symbols.append(sym)
        self.max_len = max_len

    def decode(self, r: _DefBitReader) -> int:
        code = 0
        first = 0
        index = 0
        for bits in range(1, self.max_len + 1):
            code |= r.read_bit()
            count = self.counts[bits]
            if code - first < count:
                return self.symbols[index + (code - first)]
            index += count
            first = (first + count) << 1
            code <<= 1
        raise ValueError("invalid huffman code")


#: code-length-code transmission order, RFC 1951 3.2.7.
_CLC_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15]


def inflate(data: bytes) -> bytes:
    """Full RFC 1951 inflate: stored (00), fixed (01), and
    dynamic-Huffman (10) blocks — the decoder side is COMPLETE, so it
    round-trips zlib's own raw streams (dynamic blocks included), not
    just our fixed-block encoder. Fails loudly (ValueError) on bad
    BTYPE, LEN/NLEN mismatch, over-subscribed code, or a distance past
    the start of output."""
    r = _DefBitReader(data)
    out = bytearray()
    while True:
        bfinal = r.read_bit()
        btype = r.read_bits(2)
        if btype == 0:
            r.align()
            if r.pos + 4 > len(data):
                raise ValueError("truncated stored header")
            ln = data[r.pos] | (data[r.pos + 1] << 8)
            nlen = data[r.pos + 2] | (data[r.pos + 3] << 8)
            if ln ^ nlen != 0xFFFF:
                raise ValueError("stored LEN/NLEN mismatch")
            r.pos += 4
            if r.pos + ln > len(data):
                raise ValueError("truncated stored block")
            out.extend(data[r.pos : r.pos + ln])
            r.pos += ln
        elif btype in (1, 2):
            if btype == 1:
                lit_tree = _HuffTree(_fixed_lit_lengths())
                dist_tree = _HuffTree([5] * 30)
            else:
                hlit = r.read_bits(5) + 257
                hdist = r.read_bits(5) + 1
                hclen = r.read_bits(4) + 4
                clc_len = [0] * 19
                for i in range(hclen):
                    clc_len[_CLC_ORDER[i]] = r.read_bits(3)
                clc_tree = _HuffTree(clc_len)
                lens: list[int] = []
                while len(lens) < hlit + hdist:
                    sym = clc_tree.decode(r)
                    if sym < 16:
                        lens.append(sym)
                    elif sym == 16:
                        if not lens:
                            raise ValueError("repeat with no previous length")
                        lens.extend([lens[-1]] * (3 + r.read_bits(2)))
                    elif sym == 17:
                        lens.extend([0] * (3 + r.read_bits(3)))
                    else:
                        lens.extend([0] * (11 + r.read_bits(7)))
                if len(lens) != hlit + hdist:
                    raise ValueError("code length overrun")
                lit_tree = _HuffTree(lens[:hlit])
                dist_tree = _HuffTree(lens[hlit:])
            while True:
                sym = lit_tree.decode(r)
                if sym == 256:
                    break
                if sym < 256:
                    out.append(sym)
                    continue
                if sym > 285:
                    raise ValueError(f"bad length symbol {sym}")
                base, extra = _DEFLATE_LEN[sym - 257]
                ln = base + (r.read_bits(extra) if extra else 0)
                dsym = dist_tree.decode(r)
                if dsym > 29:
                    raise ValueError(f"bad distance symbol {dsym}")
                dbase, dextra = _DEFLATE_DIST[dsym]
                dist = dbase + (r.read_bits(dextra) if dextra else 0)
                if dist > len(out):
                    raise ValueError("distance past start of output")
                for _ in range(ln):
                    out.append(out[-dist])
        else:
            raise ValueError(f"bad BTYPE {btype}")
        if bfinal:
            return bytes(out)


DEFLATE_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("orig_len", Ty.LongType()),
        Ty.StructField("decoded_md5", Ty.StringType()),
        Ty.StructField("own_roundtrip_ok", Ty.BooleanType()),
        Ty.StructField("zlib_decodes_ours", Ty.BooleanType()),
        Ty.StructField("we_decode_zlib", Ty.BooleanType()),
        Ty.StructField("compressed_smaller", Ty.BooleanType()),
    ]
)


def deflate_conformance(df: DataFrame) -> DataFrame:
    """Arrow-batched DEFLATE conformance frame over a `content` string
    column: encode with OUR fixed-Huffman encoder, decode three ways —
    our inflate, zlib's inflate of OUR stream, and our inflate of
    ZLIB's raw stream (level 6, dynamic blocks) — one row per doc. The
    md5 gates content equality; the three booleans pin cross-
    implementation conformance INSIDE the driver-hashed frame.
    zlib's compressed size is implementation-defined and deliberately
    kept out of the gated columns."""
    import hashlib
    import zlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in DEFLATE_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                data = (content or "").encode("utf-8")
                enc = deflate_fixed_encode(data)
                dec = inflate(enc)
                zdec = zlib.decompress(enc, -15)
                zc = zlib.compressobj(6, zlib.DEFLATED, -15)
                zraw = zc.compress(data) + zc.flush()
                rows.append(
                    (
                        int(doc_id),
                        len(data),
                        hashlib.md5(dec).hexdigest(),
                        dec == data,
                        zdec == data,
                        inflate(zraw) == data,
                        len(enc) < len(data),
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", "content").mapInPandas(
        _batches, schema=DEFLATE_SCHEMA
    )


# --- Block-sorting compression (BWT -> MTF -> zero-RLE) ------------------
#
# The bzip2-class pipeline: Burrows-Wheeler block sort groups equal
# context bytes, move-to-front turns locality into small integers, and
# run-length coding collapses the resulting zero runs. Unlike the other
# codec gates, the FORWARD transform here is independently recomputed by
# the DuckDB oracle (rotation sort expressed relationally over the hex
# payload), not just round-tripped.

BWT_BLOCK = 64


def bwt_encode(data: bytes) -> tuple[int, bytes]:
    """Burrows-Wheeler transform of one block: sort all rotations
    (ties broken by start offset, matching the oracle's ORDER BY rot,
    j), emit the last column + the rank of the original rotation."""
    n = len(data)
    if n == 0:
        raise ValueError("empty BWT block")
    dd = data + data
    rots = sorted(range(n), key=lambda j: (dd[j : j + n], j))
    last = bytes(data[(j - 1) % n] for j in rots)
    return rots.index(0), last


def bwt_decode(index: int, last: bytes) -> bytes:
    """Inverse BWT via LF-mapping: stable-sort the last column to get
    the first column, walk the permutation n steps from `index`."""
    n = len(last)
    if not 0 <= index < n:
        raise ValueError("BWT index out of range")
    # lf[i] = position in first column of last[i]'s occurrence
    counts = [0] * 256
    for b in last:
        counts[b] += 1
    starts = [0] * 256
    s = 0
    for v in range(256):
        starts[v] = s
        s += counts[v]
    seen = [0] * 256
    lf = [0] * n
    for i, b in enumerate(last):
        lf[i] = starts[b] + seen[b]
        seen[b] += 1
    out = bytearray()
    p = index
    for _ in range(n):
        out.append(last[p])
        p = lf[p]
    return bytes(reversed(out))


def mtf_encode(data: bytes) -> list[int]:
    """Move-to-front over the full 0..255 alphabet."""
    alpha = list(range(256))
    out = []
    for b in data:
        i = alpha.index(b)
        out.append(i)
        if i:
            alpha.pop(i)
            alpha.insert(0, b)
    return out

def mtf_decode(codes: list[int]) -> bytes:
    alpha = list(range(256))
    out = bytearray()
    for i in codes:
        if not 0 <= i < 256:
            raise ValueError("MTF code out of range")
        b = alpha[i]
        out.append(b)
        if i:
            alpha.pop(i)
            alpha.insert(0, b)
    return bytes(out)


def rle_zero_encode(codes: list[int]) -> list[tuple]:
    """Collapse maximal zero runs to ('Z', run_len); nonzero codes pass
    through as ('C', code) — the post-MTF RLE stage (bzip2's RUNA/RUNB
    without the entropy coder)."""
    out: list[tuple] = []
    i = 0
    n = len(codes)
    while i < n:
        if codes[i] == 0:
            j = i
            while j < n and codes[j] == 0:
                j += 1
            out.append(("Z", j - i))
            i = j
        else:
            out.append(("C", codes[i]))
            i += 1
    return out

def rle_zero_decode(tokens: list[tuple]) -> list[int]:
    out: list[int] = []
    for t in tokens:
        if t[0] == "Z":
            if t[1] < 1:
                raise ValueError("empty zero run")
            out.extend([0] * t[1])
        elif t[0] == "C":
            if t[1] == 0:
                raise ValueError("literal zero outside a run")
            out.append(t[1])
        else:
            raise ValueError(f"unknown RLE token {t[0]!r}")
    return out


BWT_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("block_len", Ty.IntegerType()),
        Ty.StructField("bwt_index", Ty.IntegerType()),
        Ty.StructField("bwt_md5", Ty.StringType()),
        Ty.StructField("mtf_zero_count", Ty.IntegerType()),
        Ty.StructField("n_zero_runs", Ty.IntegerType()),
        Ty.StructField("rle_len", Ty.IntegerType()),
        Ty.StructField("roundtrip_ok", Ty.BooleanType()),
    ]
)


def bwt_pipeline(df: DataFrame) -> DataFrame:
    """Arrow-batched BWT -> MTF -> zero-RLE over the first BWT_BLOCK
    bytes of `content`, plus the full inverse chain; one row per doc.
    bwt_md5 hashes the lowercase-hex last column so the oracle's
    relational rotation sort gates the forward transform byte-exactly."""
    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in BWT_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                data = (content or "").encode("utf-8")[:BWT_BLOCK]
                idx, last = bwt_encode(data)
                codes = mtf_encode(last)
                toks = rle_zero_encode(codes)
                back = bwt_decode(idx, mtf_decode(rle_zero_decode(toks)))
                nz = sum(1 for c in codes if c == 0)
                runs = sum(1 for t in toks if t[0] == "Z")
                rows.append(
                    (
                        int(doc_id),
                        len(data),
                        idx,
                        hashlib.md5(last.hex().encode()).hexdigest(),
                        nz,
                        runs,
                        (len(codes) - nz) + 2 * runs,
                        back == data,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", "content").mapInPandas(
        _batches, schema=BWT_SCHEMA
    )
