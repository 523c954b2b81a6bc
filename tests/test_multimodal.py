"""Multimodal plumbing tests: binary synthesis, Arrow-batch decode stub,
metadata pruning."""

from __future__ import annotations

import hashlib

from tests.conftest import SF_SMOKE
from weather_bigdata_project_spark.operators import multimodal as M
from weather_bigdata_project_spark.operators import textops as T


def test_binary_payload_and_hash(spark):
    docs = T.docs(spark, SF_SMOKE).limit(5)
    rows = {r.doc_id: r for r in M.with_binary_payload(docs).collect()}
    for r0 in docs.collect():
        r = rows[r0.doc_id]
        payload = r0.text.encode("utf-8")
        assert bytes(r.content) == payload
        assert r.byte_len == len(payload)
        assert r.sha256_hex == hashlib.sha256(payload).hexdigest()


def test_decode_stub_deterministic(spark):
    binary = M.with_binary_payload(T.docs(spark, SF_SMOKE).limit(20))
    dec = M.decode_media(binary)
    rows = {r.doc_id: r for r in dec.collect()}
    assert len(rows) == 20
    # recompute the deterministic fake driver-side
    for r0 in binary.collect():
        w, h, nf, feat = M._decode_stub(bytes(r0.content))
        r = rows[r0.doc_id]
        assert (r.width, r.height, r.n_frames) == (w, h, nf)
        assert r.byte_len == r0.byte_len
        assert [round(x, 9) for x in r.feature] == [round(x, 9) for x in feat]
        assert len(r.feature) == 8


def test_resize_geometry_and_stub(spark):
    """Aspect-preserving geometry computed JVM-side; stub resample scales
    each feature by the same factor."""
    dec = M.decode_media(
        M.with_binary_payload(T.docs(spark, SF_SMOKE).limit(10))
    )
    out = {r.doc_id: r for r in M.resize_media(dec, 32, 32).collect()}
    for r in dec.collect():
        t = out[r.doc_id]
        scale = min(32.0 / r.width, 32.0 / r.height)
        assert t.thumb_w == int(round(r.width * scale))
        assert t.thumb_h == int(round(r.height * scale))
        assert max(t.thumb_w, t.thumb_h) <= 32
        # stub resample is a single IEEE multiply (bit-exact, which is
        # what lets the DuckDB oracle hash-gate the full pipeline)
        assert t.thumb_feature == [v * scale for v in r.feature]


def test_frame_sampling_stride(spark):
    """sequence+explode yields exactly ceil(n_frames/stride) frames, the
    even indices, each with its deterministic feature."""
    dec = M.decode_media(
        M.with_binary_payload(T.docs(spark, SF_SMOKE).limit(10))
    )
    frames = M.sample_frames(dec, stride=2).collect()
    by_doc = {}
    for fr in frames:
        by_doc.setdefault(fr.doc_id, []).append(fr)
    for r in dec.collect():
        got = sorted(by_doc[r.doc_id], key=lambda x: x.frame_idx)
        assert [g.frame_idx for g in got] == list(range(0, r.n_frames, 2))
        for g in got:
            assert g.frame_feature == r.feature[g.frame_idx % 8]


def test_label_pca_matches_numpy(spark):
    """applyInPandas PCA must equal the same numpy computation done
    driver-side on identically-sorted input."""
    import numpy as np

    from weather_bigdata_project_spark.registry import QUERIES
    from weather_bigdata_project_spark import tables

    got = {
        r.label: r
        for r in QUERIES["embed_label_pca"](spark, SF_SMOKE).collect()
    }
    emb = tables.load(spark, SF_SMOKE, "embeddings").collect()
    by_label = {}
    for r in sorted(emb, key=lambda r: r.vec_id):
        by_label.setdefault(r.label, []).append(r.embedding)
    assert set(got) == set(by_label)
    for label, vecs in by_label.items():
        X = np.stack([np.array(v, dtype=np.float64) for v in vecs])
        Xc = X - X.mean(axis=0)
        C = (Xc.T @ Xc) / max(len(X) - 1, 1)
        w, v = np.linalg.eigh(C)
        top = v[:, -1]
        nz = np.nonzero(top)[0]
        if len(nz) and top[nz[0]] < 0:
            top = -top
        r = got[label]
        assert r.n_vectors == len(X)
        assert r.evr == round(float(w[-1] / w.sum()), 6)
        assert list(r.pc0) == [round(float(t), 6) for t in top]


def test_metadata_query_prunes_binary(spark):
    """Selecting only metadata must not carry the binary column through
    the plan (column pruning — the 100 TB I/O guarantee)."""
    meta = M.with_binary_payload(T.docs(spark, SF_SMOKE)).select(
        "doc_id", "byte_len"
    )
    plan = meta._jdf.queryExecution().optimizedPlan().toString()
    assert "sha256_hex" not in plan


def test_phash_neardup_banding_and_verify(spark):
    """pHash near-dup plumbing: identical payloads pair at distance 0;
    a one-window edit lands within the Hamming threshold; pairs are
    canonical (doc1 < doc2, no self-pairs); and everything the band
    join emits is verified by the exact bit_count distance."""
    from weather_bigdata_project_spark.operators import multimodal as M

    base = "the quick brown fox jumps over the lazy dog " * 8
    # +1 on one byte flips that window's parity (a case flip is +-32 on
    # each byte — even — and would NOT change a parity hash)
    edited = "uhe" + base[3:]
    rows = [
        (1, base),
        (2, base),          # exact duplicate of 1
        (3, edited),        # near duplicate of 1
        (4, "completely different payload " * 10),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    b = M.with_binary_payload(docs)
    got = {
        (r["doc1"], r["doc2"]): r["hamming"]
        for r in M.phash_neardup_pairs(b, max_hamming=6).collect()
    }
    assert got[(1, 2)] == 0                     # exact dup collides at 0
    assert (1, 3) in got and 1 <= got[(1, 3)] <= 6  # near dup within band
    for (d1, d2), h in got.items():
        assert d1 < d2 and 0 <= h <= 6
    assert (1, 4) not in got and (2, 4) not in got

    # kernel is deterministic and locality-sensitive: the stub phash of
    # base vs edited differs in at most a couple of window bits
    ph = {
        r["doc_id"]: r["phash"]
        for r in M.phash_media(b).collect()
    }
    assert ph[1] == ph[2]
    assert bin((ph[1] ^ ph[3]) & ((1 << 64) - 1)).count("1") <= 2


def test_audio_vad_segments_match_python_reference(spark):
    """Audio framing + energy VAD: Spark's segment assembly must equal a
    pure-Python reference on a constructed corpus — loud/quiet frame
    runs engineered from high/low byte values. Also pins: tail bytes
    that do not fill a frame are dropped, and docs shorter than one
    frame vanish entirely."""
    from weather_bigdata_project_spark.operators import multimodal as M

    fb = M.AUDIO_FRAME_BYTES
    loud, quiet = "z" * fb, " " * fb  # byte 122 vs 32
    # doc 1: loud loud quiet loud  -> segments [0,2) and [3,4)
    # doc 2: quiet quiet           -> no segments
    # doc 3: loud + half-frame tail (dropped) -> segment [0,1)
    rows = [
        (1, loud + loud + quiet + loud),
        (2, quiet + quiet),
        (3, loud + "z" * (fb // 2)),
        (4, "z" * (fb - 1)),  # shorter than one frame: no rows at all
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    segs = M.audio_voiced_segments(M.with_binary_payload(docs)).collect()
    got = {
        (r["doc_id"], r["start_ms"]): (r["end_ms"], r["n_frames"],
                                       r["mean_energy"])
        for r in segs
    }
    ms = M.AUDIO_FRAME_MS
    assert got[(1, 0)] == (2 * ms, 2, 122.0)
    assert got[(1, 3 * ms)] == (4 * ms, 1, 122.0)
    assert got[(3, 0)] == (ms, 1, 122.0)
    assert len(segs) == 3  # docs 2 and 4 contribute nothing


# --- the REAL DCT pHash kernel (round-4: non-stub kernel executing) ---------

def test_phash_dct_batch_matches_naive_dct():
    """The batched einsum DCT must equal the textbook per-image
    M @ X @ M.T DCT-II, bit for bit through the median threshold."""
    import numpy as np

    rng = [bytes([(i * 37 + j) % 256 for j in range(300 + i * 91)])
           for i in range(5)]
    got = M._phash_dct_batch(rng)
    m = M._dct_basis()
    for i, b in enumerate(rng):
        reps = -(-1024 // len(b))
        plane = np.frombuffer((b * reps)[:1024], dtype=np.uint8)
        plane = plane.reshape(32, 32).astype(np.float64)
        coefs = m @ plane @ m.T
        low = coefs[:8, :8].reshape(64)
        med = np.median(low[1:])
        bits = 0
        for k in range(64):
            if low[k] > med:
                bits |= 1 << k
        want = bits - (1 << 64) if bits >= (1 << 63) else bits
        assert int(got.iloc[i]) == want


def test_phash_dct_kernel_runs_in_spark(spark):
    """The non-stub kernel must execute end-to-end through the same
    Arrow-batched plumbing as the stub: identical output schema,
    deterministic across runs, non-degenerate hash distribution."""
    binary = M.with_binary_payload(T.docs(spark, SF_SMOKE).limit(40))
    stub = M.phash_media(binary, kernel="stub")
    real = M.phash_media(binary, kernel="dct")
    assert stub.schema == real.schema
    r1 = sorted((r.doc_id, r.phash) for r in real.collect())
    r2 = sorted((r.doc_id, r.phash) for r in real.collect())
    assert r1 == r2
    hashes = {h for _, h in r1}
    assert len(hashes) > 1, "degenerate: every payload hashed alike"
    # driver-side reference agrees with the distributed run
    ref = M._phash_dct_batch(
        [bytes(r.content) for r in binary.orderBy("doc_id").collect()]
    )
    want = sorted(zip(
        (r.doc_id for r in binary.orderBy("doc_id").collect()),
        (int(x) for x in ref),
    ))
    assert r1 == want


def test_phash_dct_neardup_pipeline(spark):
    """Full near-dup pipeline on the REAL kernel: exact duplicates must
    collide at Hamming 0; the banded candidate join and bit_count verify
    run unchanged."""
    docs = T.docs(spark, SF_SMOKE).select("doc_id", "text").limit(10)
    # duplicate every payload under a shifted doc_id => known dup pairs
    dup = docs.selectExpr("doc_id + 1000000 AS doc_id", "text")
    binary = M.with_binary_payload(docs.union(dup))
    pairs = M.phash_neardup_pairs(binary, max_hamming=0, kernel="dct")
    got = {(r.doc1, r.doc2) for r in pairs.collect()}
    want = {(r.doc_id, r.doc_id + 1000000) for r in docs.collect()}
    assert want <= got  # every planted dup found (plus any true DCT ties)


def test_audio_fft_kernel_matches_stub_and_runs(spark):
    """The rfft kernel's DC/n equals the stub's byte mean (Parseval's
    DC term IS the mean), so the full VAD pipeline must produce the
    same segments through a genuine FFT execution path."""
    import numpy as np

    # driver-side identity on adversarial frames
    frames = [bytes([7] * 64), bytes(range(64)), b"", bytes([255, 0] * 32)]
    got = M._frame_energy_fft_batch(frames)
    want = [M._frame_energy_stub(b) for b in frames]
    assert np.allclose(list(got), want, atol=1e-9)

    binary = M.with_binary_payload(T.docs(spark, SF_SMOKE).limit(15))
    seg_stub = sorted(
        map(tuple, M.audio_voiced_segments(binary).collect())
    )
    seg_fft = sorted(
        map(tuple, M.audio_voiced_segments(binary, kernel="fft").collect())
    )
    assert len(seg_fft) == len(seg_stub)
    for a, b in zip(seg_stub, seg_fft):
        assert a[:4] == b[:4]  # doc_id, start_ms, end_ms, n_frames
        assert abs(a[4] - b[4]) < 1e-6  # mean_energy within float noise


def test_ppm_decoder_real_image_roundtrip(spark):
    """REAL decode path: synthesize genuine binary PPM (P6) images —
    gradients, constants, a comment-bearing header — run them through
    the same mapInPandas plumbing with kernel='ppm', and check the
    parsed geometry and exact-integer channel statistics against the
    known pixel planes. A corrupt payload must raise, not hash."""
    import numpy as np
    import pytest

    imgs = {}
    rng_dims = [(1, 8, 6), (2, 5, 5), (3, 16, 2)]
    for doc_id, w, h in rng_dims:
        px = np.arange(w * h * 3, dtype=np.int64) % 256
        px = ((px * (doc_id * 37 + 11)) % 256).astype(np.uint8)
        imgs[doc_id] = (w, h, px.tobytes())
    # one image with a header comment (spec-allowed)
    w, h = 4, 3
    px = np.full(w * h * 3, 200, dtype=np.uint8).tobytes()
    payload4 = (b"P6\n# synthetic test image\n4 3\n255\n" + px)
    imgs[4] = (w, h, px)

    rows = [
        (d, bytearray(M.encode_ppm(w, h, p)))
        for d, (w, h, p) in imgs.items()
        if d != 4
    ] + [(4, bytearray(payload4))]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r.doc_id: r for r in M.decode_media(df, kernel="ppm").collect()}
    assert set(got) == set(imgs)
    for d, (w, h, p) in imgs.items():
        r = got[d]
        assert (r.width, r.height, r.n_frames) == (w, h, 1)
        arr = np.frombuffer(p, dtype=np.uint8).reshape(h, w, 3)
        npx = w * h
        sums = arr.sum(axis=(0, 1), dtype=np.int64)
        assert r.feature[0] == float(sums[0]) / npx
        assert r.feature[1] == float(sums[1]) / npx
        assert r.feature[2] == float(sums[2]) / npx
        gray = arr.astype(np.int64).sum(axis=2)
        assert r.feature[4] == float(gray.min()) / 3.0
        assert r.feature[5] == float(gray.max()) / 3.0
        assert r.feature[6] == float(w) / h

    # real decoders fail loudly on garbage
    with pytest.raises(ValueError):
        M._decode_ppm(b"not an image at all")
    with pytest.raises(ValueError):
        M._decode_ppm(M.encode_ppm(2, 2, bytes(12))[:-5])  # truncated


def test_wav_decoder_real_container_roundtrip(spark):
    """The RIFF/WAVE parser must walk real containers (including extra
    chunks and word-aligned padding, which the fixed-offset shortcut a
    fake parser would take gets wrong) and fail loudly on malformed
    ones."""
    import struct

    import numpy as np
    import pytest

    def wav(data: bytes, extra: bytes = b"") -> bytes:
        # genuine constructor, independent of the module's constant
        # header: fmt chunk, optional extra chunk BEFORE data, data
        fmt = b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8
        )
        dat = b"data" + struct.pack("<I", len(data)) + data
        if len(data) & 1:
            dat += b"\x00"  # word-align (RIFF spec)
        body = b"WAVE" + fmt + extra + dat
        return b"RIFF" + struct.pack("<I", len(body)) + body

    import math

    data = bytes((i * 7) % 256 for i in range(33))  # odd length -> pad
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    sr, bits, n, mean, lo, hi, rms = M._decode_wav(wav(data, extra))
    s = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    assert (sr, bits, n) == (8000, 8, 33)
    assert mean == float(s.sum()) / 33
    assert (lo, hi) == (float(s.min()), float(s.max()))
    # math.sqrt (IEEE-correct, = DuckDB SQRT), never ** 0.5 (libm pow,
    # off by one ulp on some inputs — fuzz seeds 505/606)
    assert rms == math.sqrt(float((s * s).sum()) / 33)

    for bad in (
        b"RIFX" + wav(data)[4:],            # wrong magic
        wav(data)[:16],                     # truncated
        wav(data)[:4] + b"\xff\xff\xff\xff" + wav(data)[8:],  # bad size
    ):
        with pytest.raises(ValueError):
            M._decode_wav(bad)
    # 16-bit PCM is out of contract -> loud refusal, not garbage stats
    fmt16 = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + fmt16 + b"data" + struct.pack("<I", 4) + bytes(4)
    with pytest.raises(ValueError):
        M._decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_y4m_demux_discovers_frames_and_colorspace(spark):
    """The Y4M demux must derive the frame size from the colorspace tag
    (C420 default per spec), discover the frame count by walking the
    stream, tolerate FRAME-line parameters, and fail on truncation."""
    import numpy as np
    import pytest

    w, h = 4, 2
    f1 = bytes(range(w * h * 3))
    f2 = bytes(reversed(range(w * h * 3)))
    stream = (
        f"YUV4MPEG2 W{w} H{h} F30000:1001 Ip A1:1 C444\n".encode()
        + b"FRAME\n" + f1
        + b"FRAME Xsomeparam\n" + f2  # params on the FRAME line are legal
    )
    gw, gh, frames = M._y4m_frames(stream)
    assert (gw, gh, len(frames)) == (w, h, 2)
    for got, raw in zip(frames, (f1, f2)):
        y = np.frombuffer(raw[: w * h], dtype=np.uint8).astype(np.int64)
        assert got == (
            float(y.sum()) / (w * h), float(y.min()), float(y.max())
        )

    # C420 default: frame is w*h*3/2 bytes
    s420 = f"YUV4MPEG2 W{w} H{h}\n".encode() + b"FRAME\n" + bytes(12)
    assert len(M._y4m_frames(s420)[2]) == 1

    for bad in (
        b"NOTY4M W4 H2\nFRAME\n" + bytes(24),
        f"YUV4MPEG2 W{w} H{h} C444\n".encode() + b"FRAME\n" + f1[:-1],
        f"YUV4MPEG2 W{w} H{h} C444\n".encode() + b"BLAME\n" + f1,
        b"YUV4MPEG2 C444\nFRAME\n",  # missing W/H
    ):
        with pytest.raises(ValueError):
            M._y4m_frames(bad)


def test_y4m_shot_boundaries_hand_computed(spark):
    """Shot-boundary kernel vs a hand-built 4-frame clip: frame 1
    repeats frame 0 (static — no cut), frame 2 flips every Y byte by
    the maximum (cut), frame 3 nudges one pixel by 1 (below any sane
    threshold — no cut). Exact integer mads, shot ids 1,1,2,2; frame
    0's mad is NULL and never a boundary."""
    w, h = M.Y4M_W, M.Y4M_H
    ypix, fb = w * h, w * h * 3
    y0 = bytes((7,) * ypix)
    y2 = bytes((255 - 7,) * ypix)
    y3 = bytes((255 - 7,) * (ypix - 1) + (255 - 8,))
    uv = bytes(2 * ypix)
    frames = [y0 + uv, y0 + uv, y2 + uv, y3 + uv]
    assert all(len(f) == fb for f in frames)
    stream = M.Y4M_HEADER.encode() + b"".join(
        b"FRAME\n" + f for f in frames
    )
    df = spark.createDataFrame(
        [(1, bytearray(stream))], "doc_id long, content binary"
    )
    rows = {
        r.frame_idx: r
        for r in M.split_y4m_shots(df).collect()
    }
    assert len(rows) == 4
    assert rows[0].mad_sum is None and not rows[0].is_boundary
    assert rows[0].shot_id == 1
    assert rows[1].mad_sum == 0 and not rows[1].is_boundary
    assert rows[1].shot_id == 1
    assert rows[2].mad_sum == (255 - 14) * ypix
    assert rows[2].is_boundary and rows[2].shot_id == 2
    assert rows[3].mad_sum == 1 and not rows[3].is_boundary
    assert rows[3].shot_id == 2


def test_jpeg_codec_battery(spark):
    """The real baseline-JPEG codec: flat-block losslessness (the
    oracle-gated property), general round-trip within the quantization
    error bound, an AC-coefficient path (non-flat blocks force (run,
    size) symbols and ZRL handling), DC prediction across blocks, and
    loud refusals of everything outside the baseline-gray contract."""
    import numpy as np
    import pytest

    # flat blocks: exactly lossless (DC quant step 8, module note)
    base = (np.arange(12, dtype=np.uint8).reshape(3, 4) * 19 + 3)
    flat = np.repeat(base, 8, axis=0).repeat(8, axis=1)
    s = M.encode_jpeg_gray(32, 24, flat.tobytes())
    w, h, img = M.decode_jpeg_gray(s)
    assert (w, h) == (32, 24) and (img == flat).all()

    # general content: error bounded by half the worst quant step
    # (q_AC = 16 -> per-coefficient error <= 8; empirical max is far
    # lower, assert a safe envelope)
    rng = np.random.default_rng(7)
    r = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    _, _, img2 = M.decode_jpeg_gray(M.encode_jpeg_gray(32, 24, r.tobytes()))
    assert int(np.abs(img2.astype(int) - r.astype(int)).max()) <= 64

    # a single 8x8 block with one AC coefficient: decode must equal the
    # independent numpy reconstruction of the dequantized spectrum
    m = M._dct_mat()
    grad = np.tile(np.arange(8, dtype=np.uint8) * 30, (8, 1))
    s3 = M.encode_jpeg_gray(8, 8, grad.tobytes())
    _, _, img3 = M.decode_jpeg_gray(s3)
    coef = m @ (grad.astype(float) - 128.0) @ m.T
    q = np.array(M.JPEG_QTABLE, dtype=np.int64)[
        np.argsort(np.array(M.JPEG_ZIGZAG))
    ].reshape(8, 8)
    ref = np.clip(
        np.rint(m.T @ (np.rint(coef / q) * q) @ m) + 128.0, 0, 255
    ).astype(np.uint8)
    assert (img3 == ref).all()

    # loud refusals: truncation, progressive SOF2, color, bad magic
    with pytest.raises(ValueError):
        M.decode_jpeg_gray(s[:-4])  # EOI gone
    prog = s.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        M.decode_jpeg_gray(prog)
    with pytest.raises(ValueError):
        M.decode_jpeg_gray(b"\x89PNG" + s[4:])
    # 3-component SOF: rebuild the SOF payload by hand
    i = s.find(b"\xff\xc0")
    seglen = int.from_bytes(s[i + 2:i + 4], "big")
    color_sof = (
        s[:i]
        + b"\xff\xc0" + (8 + 9).to_bytes(2, "big")
        + bytes([8]) + (24).to_bytes(2, "big") + (32).to_bytes(2, "big")
        + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
        + s[i + 2 + seglen:]
    )
    with pytest.raises(ValueError):
        M.decode_jpeg_gray(color_sof)


def test_png_codec_battery(spark):
    """The real PNG codec: exact round-trip through all five scanline
    filters, CRC verification, and loud refusals of corrupt/unsupported
    streams."""
    import numpy as np
    import pytest

    rng = np.random.default_rng(3)
    pix = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    s = M.encode_png_gray(8, 8, pix.tobytes())
    w, h, img = M.decode_png_gray(s)
    assert (w, h) == (8, 8) and (img == pix).all()

    # gradient + constant images stress Sub/Up/Average/Paeth branches
    for arr in (
        np.tile(np.arange(8, dtype=np.uint8) * 31, (8, 1)),
        np.full((8, 8), 200, dtype=np.uint8),
        np.arange(64, dtype=np.uint8).reshape(8, 8) * 4,
    ):
        _, _, got = M.decode_png_gray(
            M.encode_png_gray(8, 8, arr.tobytes())
        )
        assert (got == arr).all()

    # corrupt one IDAT byte -> the chunk CRC must catch it loudly
    idat_at = s.find(b"IDAT")
    bad = bytearray(s)
    bad[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        M.decode_png_gray(bytes(bad))

    with pytest.raises(ValueError):
        M.decode_png_gray(b"\x89PNJ" + s[4:])  # bad signature
    with pytest.raises(ValueError):
        M.decode_png_gray(s[:-13])  # IEND gone

    # 16-bit / color / interlaced IHDRs must be refused (rebuild the
    # IHDR chunk with a patched field + fresh CRC)
    import zlib as _z

    def patch_ihdr(byte_idx, value):
        body = bytearray(s[16:16 + 13])
        body[byte_idx] = value
        chunk = (
            (13).to_bytes(4, "big") + b"IHDR" + bytes(body)
            + (_z.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF).to_bytes(
                4, "big"
            )
        )
        return s[:8] + chunk + s[8 + 25:]

    for idx, val in ((8, 16), (9, 2), (12, 1)):
        with pytest.raises(ValueError):
            M.decode_png_gray(patch_ihdr(idx, val))


def test_resize_ppm_is_exact_box_filter(spark):
    """The real resize kernel's pooled values must equal the hand
    box-filter over genuinely decoded pixels, through the full Spark
    mapInPandas stage."""
    import numpy as np

    px = bytes((i * 13) % 256 for i in range(8 * 6 * 3))
    df = spark.createDataFrame(
        [(1, bytearray(M.encode_ppm(8, 6, px)))],
        "doc_id long, content binary",
    )
    (r,) = M.resize_ppm(df).collect()
    assert (r.width, r.height, r.thumb_w, r.thumb_h) == (8, 6, 4, 3)
    arr = np.frombuffer(px, dtype=np.uint8).reshape(6, 8, 3)
    gray = arr.astype(np.int64).sum(axis=2)
    want = gray.reshape(3, 2, 4, 2).sum(axis=(1, 3)) / 12.0
    assert list(r.embedding) == [float(v) for v in want.reshape(-1)]


def test_mjpeg_avi_battery(spark):
    """The MJPEG-in-AVI container chain: mux/demux identity over real
    JPEG frames, word-alignment of odd-length chunks, and loud
    refusals of every structural lie the walker guards against."""
    import numpy as np
    import pytest

    frames = []
    for f in range(M.MJPEG_FRAMES):
        base = (np.arange(12, dtype=np.uint8).reshape(3, 4) + f * 11)
        pix = np.repeat(base, 8, axis=0).repeat(8, axis=1)
        frames.append(M.encode_jpeg_gray(32, 24, pix.tobytes()))
    avi = M.encode_avi_mjpeg(frames, 32, 24)
    w, h, back = M.parse_avi_mjpeg(avi)
    assert (w, h) == (32, 24) and back == frames
    # odd-length frames force the pad path; the recovered bytes must
    # be the unpadded originals
    assert any(len(f) & 1 for f in frames)

    import struct

    def patched(pat, rep):
        assert pat in avi
        return avi.replace(pat, rep, 1)

    with pytest.raises(ValueError):
        M.parse_avi_mjpeg(b"XXXX" + avi[4:])          # bad magic
    with pytest.raises(ValueError):
        M.parse_avi_mjpeg(avi[:-2])                    # size field lie
    with pytest.raises(ValueError):
        M.parse_avi_mjpeg(patched(b"AVI ", b"WAVE"))   # wrong form
    with pytest.raises(ValueError):
        M.parse_avi_mjpeg(patched(b"MJPG", b"H264"))   # wrong handler
    with pytest.raises(ValueError):
        M.parse_avi_mjpeg(patched(b"vids", b"auds"))   # wrong type
    # avih frame-count lie: dwTotalFrames is at avih payload offset 16
    i = avi.find(b"avih") + 8 + 16
    lied = avi[:i] + struct.pack("<I", 99) + avi[i + 4:]
    with pytest.raises(ValueError):
        M.parse_avi_mjpeg(lied)
    # idx1 offset lie: bump the first entry's offset
    j = avi.rfind(b"idx1") + 8 + 8
    lied2 = avi[:j] + struct.pack("<I", 12345) + avi[j + 12:]
    with pytest.raises(ValueError):
        M.parse_avi_mjpeg(lied2)
    # a frame chunk that is not a JPEG stream
    k = avi.find(b"00dc", avi.find(b"movi")) + 8
    lied3 = avi[:k] + b"\x00\x00" + avi[k + 2:]
    with pytest.raises(ValueError):
        M.parse_avi_mjpeg(lied3)


def test_gif_codec_battery(spark):
    """The real GIF87a/LZW codec: exact round-trip on arbitrary and
    adversarial inputs (code-width growth, 4096-entry dictionary reset,
    the KwKwK case, multi-sub-block streams), plus loud refusals of
    out-of-contract streams."""
    import numpy as np
    import pytest

    rng = np.random.default_rng(11)
    pix = rng.integers(0, 256, 60, dtype=np.uint8).tobytes()
    s = M.encode_gif_gray(10, 6, pix)
    w, h, img = M.decode_gif_gray(s)
    assert (w, h) == (10, 6) and img.tobytes() == pix
    assert s[:6] == b"GIF87a" and s[-1] == 0x3B

    # width growth past 9/10/11 bits + dictionary reset at 4096 codes:
    # 10000 random pixels create ~5000 fresh codes and cross the cap
    big = rng.integers(0, 256, 10000, dtype=np.uint8).tobytes()
    _, _, got = M.decode_gif_gray(M.encode_gif_gray(100, 100, big))
    assert got.tobytes() == big

    # KwKwK: a strict 2-symbol alternation forces code == next_code
    alt = bytes([1, 2] * 500)
    _, _, got = M.decode_gif_gray(M.encode_gif_gray(50, 20, alt))
    assert got.tobytes() == alt

    # compressible input actually compresses (dictionary coding works)
    flat = bytes([9] * 10000)
    assert len(M.encode_gif_gray(100, 100, flat)) < len(flat) // 10

    # an 89a stream with an extension block before the image must
    # decode identically (extension sub-block skipping)
    img_at = s.find(b"\x2c", 13 + 768)
    ext = bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0])  # GCE + terminator
    s89 = b"GIF89a" + s[6:img_at] + ext + s[img_at:]
    _, _, got = M.decode_gif_gray(s89)
    assert got.tobytes() == pix

    # refusals
    with pytest.raises(ValueError, match="signature"):
        M.decode_gif_gray(b"GIF88a" + s[6:])
    with pytest.raises(ValueError, match="local color table"):
        bad = bytearray(s)
        bad[img_at + 9] |= 0x80
        M.decode_gif_gray(bytes(bad))
    with pytest.raises(ValueError, match="interlaced"):
        bad = bytearray(s)
        bad[img_at + 9] |= 0x40
        M.decode_gif_gray(bytes(bad))
    with pytest.raises(ValueError, match="minimum code size"):
        bad = bytearray(s)
        bad[img_at + 10] = 13
        M.decode_gif_gray(bytes(bad))
    with pytest.raises(ValueError):
        M.decode_gif_gray(s[:-8])  # truncated image data
    with pytest.raises(ValueError, match="grayscale"):
        bad = bytearray(s)
        # corrupt the green channel of the first USED palette entry
        bad[13 + 3 * pix[0] + 1] ^= 0x55
        M.decode_gif_gray(bytes(bad))
    # trailer before any image
    with pytest.raises(ValueError, match="trailer"):
        M.decode_gif_gray(s[:13 + 768] + b"\x3b")

    # the full Spark stage: tiled-byte prediction == decoded pixels
    df = spark.createDataFrame(
        [(5, bytearray(pix))], "doc_id long, content binary"
    )
    rows = M.gif_roundtrip_pixels(df).collect()
    assert len(rows) == 60
    assert all(r.val == pix[r.pos] for r in rows)


def test_adpcm_codec_battery(spark):
    """The real IMA-ADPCM codec + WAV container: staircase exactness,
    reference state-machine equality on arbitrary signals, 4x
    compression arithmetic, and loud refusals of corrupt containers."""
    import math

    import numpy as np
    import pytest

    # staircase exactness across the base range (the oracle contract)
    for base in (-8192, -77, 0, 8128):
        sig = [base + o for o in M.ADPCM_OFFSETS]
        rate, back = M.decode_wav_ima(M.encode_wav_ima(sig))
        assert rate == M.ADPCM_SAMPLE_RATE and back == sig

    # arbitrary lossy signal: decode must equal an independent
    # re-simulation of the spec state machine over the packed nibbles
    rng = np.random.default_rng(23)
    sig = [int(v) for v in rng.integers(-20000, 20000, M.ADPCM_N_SAMPLES)]
    wav = M.encode_wav_ima(sig)
    _, got = M.decode_wav_ima(wav)
    data_at = wav.find(b"data") + 8
    ba = 4 + M.ADPCM_DATA_BYTES
    ref = []
    for b0 in range(data_at, data_at + 2 * ba, ba):
        pred = int.from_bytes(wav[b0:b0 + 2], "little", signed=True)
        idx = wav[b0 + 2]
        ref.append(pred)
        for byte in wav[b0 + 4:b0 + ba]:
            for code in (byte & 0x0F, byte >> 4):
                pred, idx = M._adpcm_step(pred, idx, code)
                ref.append(pred)
    assert got == ref

    # compression arithmetic: 66 16-bit samples (132 bytes of PCM)
    # in 2*(4+16)=40 payload bytes + 60 bytes of container
    assert len(wav) == 100

    # lossy-but-sane: a slow ramp tracks within one max step
    ramp = [i * 30 for i in range(M.ADPCM_N_SAMPLES)]
    _, rb = M.decode_wav_ima(M.encode_wav_ima(ramp))
    assert max(abs(a - b) for a, b in zip(ramp, rb)) < 200

    # refusals
    with pytest.raises(ValueError, match="RIFF"):
        M.decode_wav_ima(b"RIFX" + wav[4:])
    with pytest.raises(ValueError, match="disagrees"):
        M.decode_wav_ima(wav + b"\x00")  # declared size now wrong
    with pytest.raises(ValueError, match="format tag"):
        bad = bytearray(wav)
        bad[wav.find(b"fmt ") + 8] = 0x01  # PCM tag
        M.decode_wav_ima(bytes(bad))
    with pytest.raises(ValueError, match="state header"):
        bad = bytearray(wav)
        bad[data_at + 3] = 7  # reserved byte must be zero
        M.decode_wav_ima(bytes(bad))
    with pytest.raises(ValueError, match="fact"):
        bad = bytearray(wav)
        fact_at = wav.find(b"fact") + 8
        bad[fact_at] = M.ADPCM_N_SAMPLES + 1
        M.decode_wav_ima(bytes(bad))

    # the full Spark stage: every sample equals base + OFFSETS[pos]
    df = spark.createDataFrame(
        [(9, bytearray(b"K"))], "doc_id long, content binary"
    )
    rows = M.adpcm_roundtrip_samples(df).collect()
    base = (ord("K") - 128) * 64
    assert len(rows) == M.ADPCM_N_SAMPLES
    assert all(r.val == base + M.ADPCM_OFFSETS[r.pos] for r in rows)
    assert rows[0].n_bytes == 100


def test_mc_pframe_codec_battery(spark):
    """The real motion-compensated inter-frame codec: SAD search
    optimality, decoder==encoder-reconstruction self-consistency on
    arbitrary scenes, translation losslessness, MV bias/bounds, and
    loud container/stream refusals."""
    import numpy as np
    import pytest

    h, w = M.MC_BH * 8, M.MC_BW * 8

    def scene(b, k):
        fr = np.zeros((h, w), dtype=np.uint8)
        for r in range(M.MC_BH):
            for c in range(M.MC_BW):
                fr[r * 8:r * 8 + 8, c * 8:c * 8 + 8] = b[
                    2 * r + (c + k) % 2
                ]
        return fr

    b6 = bytes([10, 200, 55, 140, 90, 250])
    frames = [scene(b6, k) for k in range(3)]
    s = M.encode_mc_video(frames)
    gw, gh, back = M.decode_mc_video(s)
    assert (gw, gh) == (w, h)
    assert all((x == f).all() for x, f in zip(back, frames))

    # static scene: MVs must all decode to (0,0)-biased bytes and the
    # chain stays lossless
    st = [frames[0]] * 3
    ss = M.encode_mc_video(st)
    _, _, sb = M.decode_mc_video(ss)
    assert all((x == frames[0]).all() for x in sb)

    # SUB-BLOCK translation (not block-aligned — what fixed-frame MJPEG
    # cannot express): a static left block + a region scrolling 3 px
    # right. Flat source blocks keep the I-frame lossless; every moving
    # block finds its exact source at dx=-3, the static one at dx=0,
    # so the whole P-frame is lossless with NON-aligned motion.
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 256, (M.MC_BH, M.MC_BW), dtype=np.uint8)
    f0 = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    f1 = f0.copy()
    f1[:, 8:] = f0[:, 5:w - 3]
    _, _, tb = M.decode_mc_video(M.encode_mc_video([f0, f1]))
    assert (tb[0] == f0).all() and (tb[1] == f1).all()

    # arbitrary scenes: decoder output must equal the encoder's OWN
    # reconstruction chain (drift-free self-consistency), which we
    # re-derive independently from the wire bytes
    rf = [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(3)]
    stream = M.encode_mc_video(rf)
    _, _, got = M.decode_mc_video(stream)
    _, _, chunks = M.parse_avi_mjpeg(stream, fourcc=M.MC_FOURCC)
    _, _, recon = M.decode_jpeg_gray(chunks[0][1:])
    nblk = M.MC_BW * M.MC_BH
    for i, ch in enumerate(chunks[1:], start=1):
        mvs = ch[1:1 + 2 * nblk]
        _, _, res = M.decode_jpeg_gray(ch[1 + 2 * nblk:])
        out = np.zeros((h, w), dtype=np.int64)
        k = 0
        for r in range(M.MC_BH):
            for c in range(M.MC_BW):
                dy, dx = mvs[2 * k] - M.MC_SEARCH, mvs[2 * k + 1] - M.MC_SEARCH
                k += 1
                y, x = r * 8 + dy, c * 8 + dx
                out[r * 8:r * 8 + 8, c * 8:c * 8 + 8] = (
                    recon[y:y + 8, x:x + 8].astype(np.int64)
                    + res[r * 8:r * 8 + 8, c * 8:c * 8 + 8] - 128
                )
        recon = np.clip(out, 0, 255).astype(np.uint8)
        assert (got[i] == recon).all()

    # vectorized field == per-block reference search, every block of a
    # random frame pair (tie-breaks included)
    field, predimg = M._mc_motion_field(rf[0], rf[1])
    for r in range(M.MC_BH):
        for c in range(M.MC_BW):
            rdy, rdx, rpred = M._mc_block_search(rf[0], rf[1], r, c)
            assert (int(field[r, c, 0]), int(field[r, c, 1])) == (rdy, rdx)
            assert (
                predimg[r * 8:r * 8 + 8, c * 8:c * 8 + 8] == rpred
            ).all()

    # SAD optimality: the chosen vector's SAD is <= every in-bounds
    # candidate's for a spot-checked block
    dy, dx, pred = M._mc_block_search(rf[0], rf[1], 1, 2)
    tgt = rf[1][8:16, 16:24].astype(np.int64)
    best = int(np.abs(pred.astype(np.int64) - tgt).sum())
    for ddy in range(-M.MC_SEARCH, M.MC_SEARCH + 1):
        for ddx in range(-M.MC_SEARCH, M.MC_SEARCH + 1):
            y, x = 8 + ddy, 16 + ddx
            if 0 <= y <= h - 8 and 0 <= x <= w - 8:
                sad = int(
                    np.abs(
                        rf[0][y:y + 8, x:x + 8].astype(np.int64) - tgt
                    ).sum()
                )
                assert best <= sad

    # refusals
    with pytest.raises(ValueError, match="I-frame"):
        k = s.find(b"00dc") + 8
        M.decode_mc_video(s[:k] + b"P" + s[k + 1:])
    with pytest.raises(ValueError):  # fourcc mismatch vs MJPG walker
        M.parse_avi_mjpeg(s)
    mjpg = M.encode_avi_mjpeg(
        [b"\xff\xd8fake"], w, h
    )
    with pytest.raises(ValueError):  # MC walker refuses MJPG stream
        M.decode_mc_video(mjpg)

    # the full Spark stage: every block equals the oracle arithmetic
    df = spark.createDataFrame(
        [(3, bytearray(b6))], "doc_id long, content binary"
    )
    rows = M.mc_video_roundtrip(df).collect()
    assert len(rows) == 3 * nblk
    for r in rows:
        br, bc = divmod(r.block_idx, M.MC_BW)
        assert r.val == b6[2 * br + (bc + r.frame_idx) % 2]


# --- round-9: color JPEG (YCbCr + 4:2:0) -------------------------------------

def test_color_transform_pair_properties():
    """The scaled-integer color transforms: outputs in range for the
    full 8-bit cube (sampled grid), gray maps to (v, 128, 128), and
    the round trip is near-identity (libjpeg's fixed-point error is
    at most 2 counts per channel)."""
    for r in range(0, 256, 17):
        for g in range(0, 256, 17):
            for b in range(0, 256, 17):
                y, cb, cr = M.rgb_to_ycbcr_int(r, g, b)
                assert 0 <= y <= 255 and 0 <= cb <= 255 and 0 <= cr <= 255
                r2, g2, b2 = M.ycbcr_to_rgb_int(y, cb, cr)
                assert abs(r2 - r) <= 2 and abs(g2 - g) <= 2
                assert abs(b2 - b) <= 2
    for v in range(0, 256, 5):
        y, cb, cr = M.rgb_to_ycbcr_int(v, v, v)
        assert (cb, cr) == (128, 128)
        assert abs(y - v) <= 1


def test_jpeg_color_codec_battery():
    """The real color codec: flat-MCU losslessness (the oracle-gated
    property, exercising MCU interleave + three DC predictors), the
    subsample/upsample path on general content (Y is never
    subsampled: its error stays inside the quantization envelope
    regardless of chroma activity), and loud refusals of everything
    outside the 4:2:0 three-component contract."""
    import numpy as np
    import pytest

    # four distinct flat MCUs: decoded RGB must equal the closed-form
    # integer transform round-trip, every pixel
    colors = [(200, 30, 60), (10, 250, 90), (0, 0, 255), (128, 128, 128)]
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    for j, c in enumerate(colors):
        my, mx = (j // 2) * 16, (j % 2) * 16
        img[my:my + 16, mx:mx + 16] = c
    s = M.encode_jpeg_color(32, 32, img.tobytes())
    w, h, out = M.decode_jpeg_color(s)
    assert (w, h) == (32, 32)
    for j, c in enumerate(colors):
        my, mx = (j // 2) * 16, (j % 2) * 16
        tile = out[my:my + 16, mx:mx + 16]
        want = M.ycbcr_to_rgb_int(*M.rgb_to_ycbcr_int(*c))
        assert (tile == want).all(), (c, want, tile[0, 0])

    # general content: the luma plane (never subsampled) must stay
    # inside the gray codec's quantization envelope even when chroma
    # varies inside every 2x2 neighborhood
    rng = np.random.default_rng(11)
    noisy = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    _, _, out2 = M.decode_jpeg_color(M.encode_jpeg_color(32, 32, noisy.tobytes()))
    y_in = M.rgb_to_ycbcr_int(
        noisy[:, :, 0].astype(np.int64),
        noisy[:, :, 1].astype(np.int64),
        noisy[:, :, 2].astype(np.int64),
    )[0]
    y_out = M.rgb_to_ycbcr_int(
        out2[:, :, 0].astype(np.int64),
        out2[:, :, 1].astype(np.int64),
        out2[:, :, 2].astype(np.int64),
    )[0]
    assert int(np.abs(y_out - y_in).max()) <= 80  # quant + color round

    # subsample is a rounded mean: flat 2x2 chroma cells are exact
    flat22 = np.zeros((32, 32, 3), dtype=np.uint8)
    flat22[:, :] = (77, 150, 20)
    s22 = M.encode_jpeg_color(32, 32, flat22.tobytes())
    _, _, o22 = M.decode_jpeg_color(s22)
    want22 = M.ycbcr_to_rgb_int(*M.rgb_to_ycbcr_int(77, 150, 20))
    assert (o22 == want22).all()

    # refusals, both directions + geometry + sampling contract
    with pytest.raises(ValueError):
        M.decode_jpeg_gray(s)  # gray walker refuses 3-component SOF
    gray = M.encode_jpeg_gray(32, 24, bytes(range(256)) * 3)
    with pytest.raises(ValueError):
        M.decode_jpeg_color(gray)  # color walker refuses 1-component
    with pytest.raises(ValueError):
        M.encode_jpeg_color(24, 32, b"\0" * (24 * 32 * 3))  # not %16
    with pytest.raises(ValueError):
        M.decode_jpeg_color(s[:-4])  # truncation
    i = s.find(b"\xff\xc0")
    bad = bytearray(s)
    # SOF payload: [prec, H, H, W, W, ncomp, cid1, hv1, tq1, ...] — the
    # Y sampling byte hv1 sits at payload offset 7 (absolute i + 11)
    bad[i + 11] = 0x21  # Y sampling 2x1 -> 4:2:2, unsupported
    with pytest.raises(ValueError, match="4:2:0"):
        M.decode_jpeg_color(bytes(bad))
    bad2 = bytearray(s)
    bad2[i + 10] = 9  # unknown component id: SOS/SOF disagreement
    with pytest.raises(ValueError, match="disagree"):
        M.decode_jpeg_color(bytes(bad2))


def test_jpeg_color_roundtrip_stage(spark):
    """The Spark stage end-to-end: every MCU row equals the driver-side
    closed form, and the in-kernel flatness check passes on real
    codec output."""
    payload = bytes([200, 30, 60, 10, 250, 90, 0, 0, 255, 5, 5, 5])
    df = spark.createDataFrame(
        [(9, bytearray(payload))], "doc_id long, content binary"
    )
    rows = sorted(
        M.jpeg_color_roundtrip_mcus(df).collect(),
        key=lambda r: r.mcu_idx,
    )
    assert len(rows) == 4
    for j, r in enumerate(rows):
        rgb = tuple(payload[3 * j:3 * j + 3])
        y, cb, cr = M.rgb_to_ycbcr_int(*rgb)
        want = M.ycbcr_to_rgb_int(y, cb, cr)
        assert (r.r_in, r.g_in, r.b_in) == rgb
        assert (r.y, r.cb, r.cr) == (y, cb, cr)
        assert (r.r_out, r.g_out, r.b_out) == want
        assert (r.width, r.height) == (32, 32)


# --- round-9: integer-snapped DCT pHash (oracle-gated real kernel) -----------

def test_phash_dct_int_matches_naive_int_dct():
    """The batched integer-basis pHash must equal a per-image textbook
    computation with the same integer basis, bit for bit — and the
    basis itself must be the pure-Python table (no numpy float in its
    construction)."""
    import numpy as np

    b8 = np.asarray(M._dct_basis_int(), dtype=np.int64)
    assert b8.shape == (8, 32)
    # DC row is constant sqrt(1/32) * 2^16
    assert len(set(b8[0].tolist())) == 1
    payloads = [bytes([(i * 53 + j) % 256 for j in range(200 + i * 77)])
                for i in range(6)] + [b""]
    got = M._phash_dct_int_batch(payloads)
    for i, p in enumerate(payloads):
        if p:
            reps = -(-1024 // len(p))
            plane = np.frombuffer((p * reps)[:1024], dtype=np.uint8)
            plane = plane.reshape(32, 32).astype(np.int64)
        else:
            plane = np.zeros((32, 32), dtype=np.int64)
        low = (b8 @ plane @ b8.T).reshape(64)
        med = np.sort(low[1:])[31]
        bits = 0
        for k in range(64):
            if low[k] > med:
                bits |= 1 << k
        want = bits - (1 << 64) if bits >= (1 << 63) else bits
        assert int(got.iloc[i]) == want


def test_phash_dct_int_kernel_in_spark(spark):
    """The oracle-gated integer kernel through the Arrow plumbing:
    deterministic, schema-identical to the stub, planted exact dupes
    collide at Hamming 0 through the banded pipeline."""
    binary = M.with_binary_payload(T.docs(spark, SF_SMOKE).limit(30))
    real = M.phash_media(binary, kernel="dct_int")
    r1 = sorted((r.doc_id, r.phash) for r in real.collect())
    ref = M._phash_dct_int_batch(
        [bytes(r.content) for r in binary.orderBy("doc_id").collect()]
    )
    want = sorted(zip(
        (r.doc_id for r in binary.orderBy("doc_id").collect()),
        (int(x) for x in ref),
    ))
    assert r1 == want
    assert len({h for _, h in r1}) > 1

    docs = T.docs(spark, SF_SMOKE).select("doc_id", "text").limit(8)
    dup = docs.selectExpr("doc_id + 1000000 AS doc_id", "text")
    binary2 = M.with_binary_payload(docs.union(dup))
    pairs = M.phash_neardup_pairs(binary2, max_hamming=0, kernel="dct_int")
    got = {(r.doc1, r.doc2) for r in pairs.collect()}
    want2 = {(r.doc_id, r.doc_id + 1000000) for r in docs.collect()}
    assert want2 <= got


def test_decode_wav_ima_truncated_fmt_raises_valueerror():
    """A fmt chunk shorter than the 20-byte IMA layout must raise the
    contract ValueError, not struct.error (round-8 ADVICE: uniform
    failure-type contract)."""
    import pytest

    # minimal RIFF/WAVE with an 8-byte fmt, a fact, and an empty data
    fmt = b"\x11\x00\x01\x00\x40\x1f\x00\x00"  # 8 bytes only
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"fact" + (4).to_bytes(4, "little") + (0).to_bytes(4, "little")
        + b"data" + (0).to_bytes(4, "little")
    )
    payload = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
    with pytest.raises(ValueError, match="truncated fmt"):
        M.decode_wav_ima(payload)


# --- Goertzel tone detection ------------------------------------------------


def _gz_python(samples):
    """Plain two-register integer Goertzel at 2cos(w)=1 — the unpacked
    reference the packed-BIGINT fold must reproduce exactly."""
    s1 = s2 = 0
    for x in samples:
        s1, s2 = x + s1 - s2, s1
    return s1, s2, s1 * s1 + s2 * s2 - s1 * s2


def _gz_samples(doc_id):
    import hashlib

    out = []
    for i in range(96):
        if doc_id % 2 == 0:
            a = 500 + doc_id % 500
            out.append(a if i % 6 < 3 else -a)
        else:
            h = hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()
            out.append(int(h[:15], 16) % 2001 - 1000)
    return out


def test_goertzel_packed_fold_matches_reference():
    from weather_bigdata_project_spark.queries.multimodal import (
        _GZ_B as B,
        _GZ_M as M,
    )

    for doc_id in [0, 1, 2, 3, 17, 496, 499]:
        samples = _gz_samples(doc_id)
        # the packed fold, evaluated with Python integers (same
        # floor-division semantics as Spark div / DuckDB // on
        # nonnegative packed values)
        acc = B * M + B  # pack(0, 0)
        for x_s in samples:
            x = (x_s + B) * M + B
            s1 = acc // M - B
            s2 = acc % M - B
            xs = x // M - B
            acc = (xs + s1 - s2 + B) * M + (s1 + B)
        s1, s2 = acc // M - B, acc % M - B
        r1, r2, power = _gz_python(samples)
        assert (s1, s2) == (r1, r2), doc_id
        # state never leaves the packing range
        assert abs(s1) < B and abs(s2) < B


def test_goertzel_resonance_separates_tone_from_noise():
    for doc_id in range(0, 200):
        samples = _gz_samples(doc_id)
        _, _, power = _gz_python(samples)
        energy = sum(x * x for x in samples)
        if doc_id % 2 == 0:
            # exactly 4096/96 = 42.67x, amplitude-invariant
            assert power * 96 == 4096 * energy, doc_id
        else:
            assert power <= 32 * energy, doc_id  # noise: ~Exp(1) tail


def test_goertzel_power_matches_dft_bin():
    """|X_16|^2 from the recurrence equals the brute-force DFT bin
    (C=1 is exact, so the identity holds in floats to rounding)."""
    import cmath

    samples = _gz_samples(42)  # tone doc
    _, _, power = _gz_python(samples)
    x16 = sum(
        s * cmath.exp(-2j * cmath.pi * 16 * i / 96)
        for i, s in enumerate(samples)
    )
    assert abs(abs(x16) ** 2 - power) / power < 1e-9


def test_goertzel_query_detects_all(spark):
    from weather_bigdata_project_spark.queries.multimodal import (
        multimodal_goertzel_tone,
    )

    rows = multimodal_goertzel_tone(spark, SF_SMOKE).collect()
    assert len(rows) >= 100
    for r in rows:
        assert r.tone_detected == r.is_tone, r
        s = _gz_samples(r.doc_id)
        _, _, p = _gz_python(s)
        assert r.bin_power == p
        assert r.total_energy == sum(x * x for x in s)


def test_lz77_roundtrip_battery():
    """The LZ77 kernel on the inputs that break naive encoders:
    arbitrary random bytes, RLE runs (self-overlapping matches,
    offset < length), window-boundary matches, sub-min-match tails,
    and the empty string — every one must round-trip exactly; the
    structured case pins the greedy token accounting the oracle
    predicts closed-form."""
    import random

    from weather_bigdata_project_spark.operators.multimodal import (
        LZ_LOOKAHEAD,
        LZ_MIN_MATCH,
        LZ_WINDOW,
        lz77_decode,
        lz77_encode,
    )

    rng = random.Random(42)
    cases = [
        b"",
        b"a",
        b"ab",
        b"a" * 200,                      # pure RLE: offset-1 overlap
        b"abc" * 40,                     # the oracle's periodic shape
        b"xyz" + b"q" * LZ_WINDOW + b"xyz",  # match evicted by window
        bytes(rng.randrange(256) for _ in range(500)),
        bytes(rng.randrange(3) for _ in range(500)),  # match-dense
    ]
    for c in cases:
        toks = lz77_encode(c)
        assert lz77_decode(toks) == c
        for t in toks:  # every match respects the declared params
            if t[0] == "M":
                assert 1 <= t[1] <= LZ_WINDOW
                assert LZ_MIN_MATCH <= t[2] <= LZ_LOOKAHEAD
    # structured accounting: 3 literals then period-3 matches of 15
    toks = lz77_encode(b"abc" * 11)
    assert [t for t in toks if t[0] == "L"] == [
        ("L", ord("a")), ("L", ord("b")), ("L", ord("c"))
    ]
    assert [t for t in toks if t[0] == "M"] == [("M", 3, 15), ("M", 3, 15)]
    # window eviction: the second 'xyz' is > 32 bytes past the first,
    # so it must re-emit literals, never a match
    toks = lz77_encode(b"xyz" + b"q" * LZ_WINDOW + b"xyz")
    assert toks[-3:] == [
        ("L", ord("x")), ("L", ord("y")), ("L", ord("z"))
    ]
    # decoder fails loudly off contract
    import pytest

    with pytest.raises(ValueError):
        lz77_decode([("M", 5, 3)])
    with pytest.raises(ValueError):
        lz77_decode([("X", 0)])


def test_deflate_zlib_conformance_battery():
    """RFC 1951 battery: our fixed-Huffman encoder must be decodable
    by zlib (external arbiter), and our inflate must decode zlib's own
    raw level-6 streams (dynamic-Huffman blocks) — plus edge shapes:
    empty input, single byte, full-range literals (both the 8-bit and
    9-bit fixed code halves), max-length matches, window-scale runs,
    incompressible random bytes (stored-block fallback), and
    match-dense small alphabets."""
    import random
    import zlib

    from weather_bigdata_project_spark.operators.multimodal import (
        deflate_fixed_encode,
        inflate,
    )

    rng = random.Random(1951)
    cases = [
        b"",
        b"a",
        b"abc" * 100,
        bytes(range(256)) * 5,  # exercises 9-bit literal codes
        bytes(rng.randrange(256) for _ in range(10000)),  # stored path
        b"x" * 70000,  # >65535: multi-chunk stored bound, 258-cap matches
        b"hello world " * 30,
        bytes(rng.randrange(4) for _ in range(5000)),
    ]
    for c in cases:
        enc = deflate_fixed_encode(c)
        assert zlib.decompress(enc, -15) == c
        assert inflate(enc) == c
        zc = zlib.compressobj(6, zlib.DEFLATED, -15)
        raw = zc.compress(c) + zc.flush()
        assert inflate(raw) == c
    # stored fallback actually engages on incompressible input
    incompressible = bytes(rng.randrange(256) for _ in range(2000))
    assert len(deflate_fixed_encode(incompressible)) == 2000 + 5
    # repetitive input compresses
    assert len(deflate_fixed_encode(b"ab" * 1000)) < 50


def test_inflate_fails_loudly_off_contract():
    import pytest

    from weather_bigdata_project_spark.operators.multimodal import (
        _DefBitWriter,
        inflate,
    )

    with pytest.raises(ValueError):
        inflate(b"")  # truncated header
    w = _DefBitWriter()
    w.write_bits(1, 1)
    w.write_bits(3, 2)  # BTYPE=11 reserved
    with pytest.raises(ValueError):
        inflate(w.getvalue())
    # stored LEN/NLEN mismatch
    bad = bytes([0b000, 0x05, 0x00, 0x00, 0x00]) + b"hello"
    with pytest.raises(ValueError):
        inflate(bad)


def test_bwt_mtf_rle_battery():
    """Block-sorting chain: forward/inverse BWT (textbook 'banana' →
    'nnbaaa' idx 3), MTF/RLE inverses, and full-chain round-trips on
    edge shapes (single byte, all-equal, periodic with tied rotations,
    random, zero bytes)."""
    import random

    from weather_bigdata_project_spark.operators.multimodal import (
        bwt_decode,
        bwt_encode,
        mtf_decode,
        mtf_encode,
        rle_zero_decode,
        rle_zero_encode,
    )

    idx, last = bwt_encode(b"banana")
    assert last == b"nnbaaa" and idx == 3
    rng = random.Random(9)
    cases = [
        b"a",
        b"aaaaaaaa",  # all rotations tie — j tie-break path
        b"abcabcabc",
        b"\x00" * 10,
        bytes(rng.randrange(256) for _ in range(64)),
        bytes(rng.randrange(3) for _ in range(64)),
    ]
    for c in cases:
        idx, last = bwt_encode(c)
        assert bwt_decode(idx, last) == c
        codes = mtf_encode(last)
        assert mtf_decode(codes) == last
        toks = rle_zero_encode(codes)
        assert rle_zero_decode(toks) == codes
    import pytest

    with pytest.raises(ValueError):
        bwt_encode(b"")
    with pytest.raises(ValueError):
        bwt_decode(5, b"abc")
    with pytest.raises(ValueError):
        rle_zero_decode([("C", 0)])
    with pytest.raises(ValueError):
        rle_zero_decode([("Z", 0)])
