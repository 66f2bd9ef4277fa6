"""Baseline JPEG codec (functions/jpeg_numpy — clean-room ITU-T T.81,
VERDICT r11 item 3) and its wiring through the media family: encode ->
decode round trips at every supported layout, honest capability
guards, and hash equality across formats (the property image_dedup's
mixed-format fixtures lean on)."""

import numpy as np
import pytest

from python_ctd_spark.functions.jpeg_numpy import decode_jpeg, encode_jpeg


def _gradient(h=24, w=40):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 5) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)


def test_round_trip_q100_is_idct_rounding_only():
    """quality=100 keeps every quantizer at 1, so encode->decode error
    is IDCT rounding only — a couple of counts per sample even on
    random noise (the worst case for DCT energy spread)."""
    rng = np.random.default_rng(7)
    img = _gradient()
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=100)), img)
    noise = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=100))
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 3


def test_round_trip_grayscale_odd_dims():
    """1-component JPEG; H/W not multiples of 8 (edge-replicated pad
    must crop back exactly)."""
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (13, 21)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=100))
    assert out.shape == (13, 21, 1)
    assert np.abs(out[..., 0].astype(int) - g.astype(int)).max() <= 2


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("dri", [0, 3])
def test_round_trip_sampling_and_restart_layouts(subsampling, dri):
    """The decoder's general sampling-factor path (4:2:0 MCUs = 2x2 Y
    blocks + chroma) and the DRI/RSTn restart machinery, exercised at
    lossy quality: bounded mean error, exact shape."""
    img = _gradient(30, 45)
    blob = encode_jpeg(
        img, quality=90, subsampling=subsampling, restart_interval=dri
    )
    out = decode_jpeg(blob)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4.0
    # restart markers really are in the stream when requested
    assert (b"\xff\xd0" in blob or b"\xff\xd1" in blob) == bool(dri)


@pytest.mark.parametrize("sub", ["444", "420"])
def test_progressive_decodes_bit_identical_to_baseline(sub):
    """Progressive (SOF2, spectral selection + successive
    approximation: interleaved DC first/refine, per-component AC bands
    at Al=1 refined to Al=0, EOB runs) carries the SAME quantized
    coefficients as baseline, so decode must match the baseline decode
    bit-for-bit — at any quality, with and without restart markers.
    The 41x23 seed-7 noise image is the regression pin for the
    ZRL-with-interleaved-history correction-bit ordering bug found
    while building the encoder (T.81 G.1.2.3's subtlest corner)."""
    rng = np.random.default_rng(7)
    for img in (rng.integers(0, 256, (41, 23, 3), dtype=np.uint8),
                _gradient(18, 49)):
        for q in (100, 80):
            ref = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
            for dri in (0, 3):
                out = decode_jpeg(encode_jpeg(
                    img, quality=q, subsampling=sub,
                    progressive=True, restart_interval=dri))
                assert np.array_equal(out, ref), (q, dri)
    # progressive q=100 on a DCT-friendly image: exact round trip
    g = _gradient(16, 16)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, quality=100, progressive=True)), g)


def test_multi_scan_sequential_decodes_all_components():
    """ADVICE r12 (medium): a LEGAL baseline file with one SOS per
    component must decode every scan — the r12 decoder returned after
    the first SOS, silently yielding a grayscale-ish image.  Also
    covers the non-interleaved block grid (component-own dims, not the
    MCU-padded grid) and per-scan restart intervals."""
    rng = np.random.default_rng(123)
    img = rng.integers(0, 256, (18, 49, 3), dtype=np.uint8)  # the bug pin:
    # 420 chroma grid ceil(25/8)=4 blocks — a floor here loses column 48
    for sub in ("444", "420"):
        ref = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
        for dri in (0, 2):
            out = decode_jpeg(encode_jpeg(
                img, quality=85, subsampling=sub,
                interleave=False, restart_interval=dri))
            assert np.array_equal(out, ref), (sub, dri)
    # the color actually survives (the r12 symptom was channel loss)
    red = np.zeros((16, 16, 3), np.uint8)
    red[..., 0] = 200
    out = decode_jpeg(encode_jpeg(red, quality=95, interleave=False))
    assert out[..., 0].mean() > 150 and out[..., 2].mean() < 80


def test_progressive_stress_matrix():
    """Randomized cross-check over shapes/qualities/layouts: the
    progressive and per-component-sequential encodings always decode
    bit-identical to the interleaved baseline (same coefficients, so
    any difference is a scan-path bug)."""
    rng = np.random.default_rng(42)
    for t in range(12):
        shape = (int(rng.integers(8, 60)), int(rng.integers(8, 60)))
        if t % 2:
            shape += (3,)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        q = int(rng.integers(40, 101))
        sub = "420" if (t % 3 == 0 and img.ndim == 3) else "444"
        dri = int(rng.integers(0, 4))
        ref = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        prog = decode_jpeg(encode_jpeg(
            img, quality=q, subsampling=sub, progressive=True,
            restart_interval=dri))
        seq = decode_jpeg(encode_jpeg(
            img, quality=q, subsampling=sub, interleave=False,
            restart_interval=dri))
        assert np.array_equal(prog, ref), (t, shape, q, sub, dri)
        assert np.array_equal(seq, ref), (t, shape, q, sub, dri)


def test_guards_are_loud():
    """Honest capability edges: lossless (SOF3) and non-JPEG bytes
    raise ValueError, never return garbage — and a BASELINE stream
    mislabeled as progressive (SOF2) is rejected for its
    sequential-only scan params rather than decoded silently wrong."""
    img = _gradient(8, 8)
    blob = bytearray(encode_jpeg(img, quality=90))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless)
    with pytest.raises(ValueError, match="lossless|arithmetic"):
        decode_jpeg(bytes(blob))
    blob[sof + 1] = 0xC2  # SOF2 label on a full-band sequential scan
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(img)[:40])  # truncated headers


def test_ahash_identical_across_formats():
    """The cross-format near-dup property the mixed image_dedup
    fixtures rely on: the fixture raster hashes IDENTICALLY from its
    pre-encode pixels, its PNG blob, and its q=100 JPEG blob."""
    from python_ctd_spark.functions.image_hash import ahash64, make_image_blob
    from python_ctd_spark.functions.png_numpy import decode_png

    for doc_id in (0, 7, 123):
        png_blob, px = make_image_blob(doc_id)
        jpg_blob = encode_jpeg(px, quality=100)
        want = ahash64(px)
        assert ahash64(decode_png(png_blob)[:, :, 0]) == want
        assert ahash64(decode_jpeg(jpg_blob)[:, :, 0]) == want


def test_image_ahash_operator_mixed_formats(spark):
    """image_ahash dispatches PNG/JPEG per blob inside one Arrow pass
    and both formats of the same raster collide to one hash."""
    import pandas as pd

    from python_ctd_spark.functions.image_hash import make_image_blob
    from python_ctd_spark.operators.media_dedup import image_ahash

    rows = []
    for i in range(6):
        blob, px = make_image_blob(i)
        rows.append((i * 2, bytearray(blob)))
        rows.append((i * 2 + 1, bytearray(encode_jpeg(px, quality=100))))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "blob"])
    )
    out = image_ahash(df).toPandas().sort_values("id").reset_index(drop=True)
    assert len(out) == 12
    for i in range(6):
        assert out.loc[2 * i, "ahash"] == out.loc[2 * i + 1, "ahash"]


def test_resize_and_featurize_jpeg(spark):
    """The multimodal plumbing accepts JPEG blobs end-to-end: real
    resize emits a PNG thumbnail, decode_and_featurize tags the format
    and folds decoded pixels (not bytes)."""
    import pandas as pd

    from python_ctd_spark.functions.media_features import feature_fold
    from python_ctd_spark.operators.multimodal import (
        decode_and_featurize, resize_image,
    )

    img = _gradient(16, 16)
    blob = encode_jpeg(img, quality=100)
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "blob": [bytearray(blob)]})
    )
    rz = resize_image(df, target_w=4, target_h=4).toPandas()
    assert bytes(rz.loc[0, "resized"])[:4] == b"\x89PNG"
    ft = decode_and_featurize(df, n_features=4).toPandas()
    assert ft.loc[0, "format"] == "jpeg"
    want = feature_fold(
        decode_jpeg(blob).astype(np.float64).ravel(), 4
    )
    assert np.allclose(np.array(ft.loc[0, "feat"]), want)


def test_malformed_table_refs_raise_valueerror_not_keyerror():
    """The documented error contract is ValueError for ALL malformed
    input: a scan naming an undefined Huffman table (internally a
    KeyError) and a truncated DQT (internally IndexError/struct.error)
    must both convert."""
    img = _gradient(8, 8)
    blob = bytearray(encode_jpeg(img, quality=90))
    sos = blob.find(b"\xff\xda")
    blob[sos + 6] = 0x33  # scan selects DC table 3 / AC table 3 (undefined)
    with pytest.raises(ValueError, match="malformed JPEG|Huffman"):
        decode_jpeg(bytes(blob))
    dqt = bytes(encode_jpeg(img))[:25]  # cut inside the DQT segment
    with pytest.raises(ValueError):
        decode_jpeg(dqt)


def test_decode_table_cache_is_bounded():
    from python_ctd_spark.functions import jpeg_numpy as j

    j._DECODE_TABLE_CACHE.clear()
    for i in range(j._DECODE_TABLE_CACHE_MAX + 10):
        bits = [0] * 16
        bits[7] = 1
        j._decode_table_cached(bits, [i % 256])
    assert len(j._DECODE_TABLE_CACHE) <= j._DECODE_TABLE_CACHE_MAX


def test_fill_bytes_before_markers_are_skipped():
    """Self-review r13: T.81 B.1.1.2 allows any number of 0xFF fill
    bytes before a marker — a multi-scan file with fill before its
    second SOS must decode every scan (the resumption previously read
    the fill as the marker id and silently dropped scans 2..n)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    for kw in ({"interleave": False}, {"progressive": True}):
        blob = encode_jpeg(img, quality=90, **kw)
        ref = decode_jpeg(blob)
        # insert fill bytes before EVERY SOS after the first
        parts = blob.split(b"\xff\xda")
        stuffed = parts[0] + b"\xff\xda" + (b"\xff\xff\xff\xda").join(
            parts[1:]
        )
        assert stuffed != blob
        out = decode_jpeg(stuffed)
        assert np.array_equal(out, ref), kw
