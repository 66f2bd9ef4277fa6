"""Perceptual image hashing + banded Hamming join (media dedup family).

The fixture/kernel contract: flipping pooled cell ``c`` of a
full-contrast fixture image flips exactly bit ``c`` of the hash; the
banded join is LOSSLESS for Hamming <= bands-1 (checked against a
brute-force all-pairs scan); and the Spark path must reproduce the
source-pixel hashes through the real PNG decoder.
"""

import itertools

import numpy as np
from pyspark.sql import functions as F
import pandas as pd
import pytest

from python_ctd_spark.functions.image_hash import (
    GROUP_SIZE,
    _flip_cells,
    ahash64,
    make_image_blob,
)
from python_ctd_spark.functions.png_numpy import decode_png


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_ahash_bit_semantics():
    """Cell i of the full-contrast raster maps to exactly bit i."""
    base = make_image_blob(0)[1]
    h0 = ahash64(base)
    for c in [0, 7, 13, 63]:
        px = base.copy().reshape(8, 2, 8, 2)
        px[c // 8, :, c % 8, :] = 255 - px[c // 8, 0, c % 8, 0]  # flip one cell
        hc = ahash64(px.reshape(16, 16))
        assert _ham(h0, hc) == 1
        assert (h0 ^ hc) & ((1 << 64) - 1) == 1 << c


def test_ahash_input_validation():
    with pytest.raises(ValueError, match="multiples"):
        ahash64(np.zeros((15, 16)))
    with pytest.raises(ValueError, match="channels"):
        ahash64(np.zeros((16, 16, 3)))
    with pytest.raises(ValueError, match="64-bit"):
        ahash64(np.zeros((16, 16)), hash_size=4)
    # (H, W, 1) grayscale accepted — the decode_png output shape
    assert ahash64(make_image_blob(3)[1][:, :, None]) == ahash64(
        make_image_blob(3)[1]
    )


def test_fixture_round_trip_and_group_structure():
    """decode(encode(px)) hashes to the source hash; within-group
    Hamming equals the flip-set symmetric difference; cross-group
    hashes stay far outside the near-dup band."""
    hashes = {}
    for d in range(2 * GROUP_SIZE):
        blob, px = make_image_blob(d)
        dec = decode_png(blob)
        assert np.array_equal(dec[:, :, 0], px)
        hashes[d] = ahash64(dec)
        assert hashes[d] == ahash64(px)
    for v in range(GROUP_SIZE):
        expect = len(
            set(_flip_cells(0)) ^ set(_flip_cells(v))
        )  # flip set symmetric difference
        assert _ham(hashes[0], hashes[v]) == expect
    # group bases are md5-independent
    assert _ham(hashes[0], hashes[GROUP_SIZE]) > 10


def test_ahash_pairs_lossless_vs_brute_force(spark):
    """The banded equi-join finds EXACTLY the pairs an all-pairs scan
    finds at Hamming <= 3 (pigeonhole), on a corpus with planted
    near-dups, exact dups, and md5-random distractors."""
    from python_ctd_spark.operators.media_dedup import ahash_pairs

    hs = {d: ahash64(make_image_blob(d)[1]) for d in range(5 * GROUP_SIZE)}
    df = spark.createDataFrame(
        pd.DataFrame({"id": list(hs), "ahash": pd.Series(list(hs.values()), dtype="int64")})
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in ahash_pairs(df, max_hamming=3).collect()
    }
    want = {
        (a, b, _ham(hs[a], hs[b]))
        for a, b in itertools.combinations(sorted(hs), 2)
        if _ham(hs[a], hs[b]) <= 3
    }
    assert got == want
    assert len(want) > 50  # the fixture actually plants a dense band


def test_ahash_pairs_validation(spark):
    from python_ctd_spark.operators.media_dedup import ahash_pairs

    df = spark.createDataFrame(pd.DataFrame({"id": [1], "ahash": [0]}))
    with pytest.raises(ValueError, match="divide"):
        ahash_pairs(df, bands=5)
    with pytest.raises(ValueError, match="pigeonhole"):
        ahash_pairs(df, max_hamming=4, bands=4)


def test_image_ahash_spark_matches_kernel(spark):
    """The mapInPandas decode+hash pass reproduces the kernel hashes and
    reports decoded geometry."""
    from python_ctd_spark.operators.media_dedup import image_ahash

    rows = [(d, make_image_blob(d)[0]) for d in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    out = image_ahash(df).toPandas().set_index("id")
    for d in range(8):
        assert out.loc[d, "ahash"] == ahash64(make_image_blob(d)[1])
        assert out.loc[d, "height"] == 16 and out.loc[d, "width"] == 16


def test_to_gray_drops_alpha():
    """Two visually identical images that differ only in alpha must
    hash identically (transparency is not brightness); RGB averages
    the color channels only."""
    from python_ctd_spark.operators.media_dedup import _to_gray

    gray = make_image_blob(0)[1].astype(np.float64)
    rgb = np.stack([gray, gray, gray], axis=2)
    rgba_opaque = np.concatenate([rgb, np.full((16, 16, 1), 255.0)], axis=2)
    rgba_border = rgba_opaque.copy()
    rgba_border[0, :, 3] = 0.0  # transparent top row
    la = np.stack([gray, np.zeros_like(gray)], axis=2)
    h_ref = ahash64(gray)
    for px in (rgb, rgba_opaque, rgba_border, la, gray[:, :, None]):
        assert ahash64(_to_gray(px)) == h_ref


def test_image_pairs_to_clusters_composition(spark):
    """ahash pairs feed dedup.connected_components unchanged — image
    near-dup CLUSTERS compose from the same machinery as text clusters.
    Exact-dup variants of one group (variants 0/4/8/12 share an empty
    flip set) plus their 1-3-bit neighbors all land in one component
    per fixture group."""
    from python_ctd_spark.operators.dedup import connected_components
    from python_ctd_spark.operators.media_dedup import ahash_pairs

    hs = {d: ahash64(make_image_blob(d)[1]) for d in range(3 * GROUP_SIZE)}
    df = spark.createDataFrame(
        pd.DataFrame(
            {"id": list(hs), "ahash": pd.Series(list(hs.values()), dtype="int64")}
        )
    )
    pairs = ahash_pairs(df, max_hamming=3)
    comp = connected_components(pairs).toPandas()
    lab = dict(zip(comp.node, comp.label))
    # every fixture group is one component whose canonical label is the
    # group's lowest participating id (groups never bridge: cross-group
    # Hamming is ~32)
    for node, label in lab.items():
        assert node // GROUP_SIZE == label // GROUP_SIZE
    # the hamming<=3 graph within a group is connected through the base
    # variants, so all participating ids of a group share one label
    import collections

    by_group = collections.defaultdict(set)
    for node, label in lab.items():
        by_group[node // GROUP_SIZE].add(label)
    assert all(len(v) == 1 for v in by_group.values()), by_group


def test_resize_then_ahash_arbitrary_size(spark):
    """Arbitrary-size images hash after the REAL thumbnail pass:
    resize_image(fake=False) box-means any raster to 16x16, whose blob
    then flows through image_ahash — the documented path for inputs
    whose sides aren't multiples of hash_size."""
    from python_ctd_spark.functions.png_numpy import encode_png_gray
    from python_ctd_spark.operators.media_dedup import image_ahash
    from python_ctd_spark.operators.multimodal import resize_image

    # a 17x23 gradient — indivisible by 8, so direct hashing raises
    px = ((np.add.outer(np.arange(17) * 11, np.arange(23) * 7)) % 256).astype(
        np.uint8
    )
    with pytest.raises(ValueError, match="multiples"):
        ahash64(px.astype(np.float64))
    df = spark.createDataFrame([(0, encode_png_gray(px))], "id long, blob binary")
    small = resize_image(df, target_w=16, target_h=16, fake=False).select(
        "id", F.col("resized").alias("blob")
    )
    out = image_ahash(small, id_col="id").toPandas()
    assert out.loc[0, "height"] == 16 and out.loc[0, "width"] == 16
    assert out.loc[0, "ahash"] != 0  # a real, nontrivial fingerprint


def test_banded_pairs_bands1_exact_dup_config(spark):
    """bands=1 / max_hamming=0 is the legitimate exact-dup config: the
    single 64-bit block must not overflow the long literal, and the
    join finds exactly the equal-hash pairs (including a hash with the
    sign bit set)."""
    from python_ctd_spark.operators.media_dedup import ahash_pairs

    neg = -(1 << 63) + 5  # sign bit exercised
    rows = pd.DataFrame({"id": [1, 2, 3, 4], "ahash": [neg, neg, 7, 8]})
    df = spark.createDataFrame(rows)
    got = ahash_pairs(df, max_hamming=0, bands=1).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in got] == [(1, 2, 0)]


# -- audio fingerprint (frame-energy hash) -----------------------------


def test_energy_hash_scale_invariance_and_guard():
    from python_ctd_spark.functions.audio_hash import energy_hash64

    rng = np.arange(1280)
    a = (((rng * 37 + 11) % 4001) - 2000).astype(np.float64)
    assert energy_hash64(a) == energy_hash64(a * 2.0) == energy_hash64(a * 0.25)
    b = (((rng * rng * 13 + 7) % 4001) - 2000).astype(np.float64)
    ham = bin((energy_hash64(a) ^ energy_hash64(b)) & ((1 << 64) - 1)).count("1")
    assert ham > 10  # different material lands far apart
    import pytest as _pt

    with _pt.raises(ValueError, match=">= 64"):
        energy_hash64(np.zeros(63))


def test_audio_fingerprint_pipeline(spark):
    """WAV blobs round-trip through the real codec into fingerprints; a
    gain-doubled copy collides exactly, and the SAME banded join that
    serves text/images finds the duplicate pair (hash_col='afp')."""
    from python_ctd_spark.functions.audio_hash import energy_hash64
    from python_ctd_spark.functions.wav_numpy import encode_wav
    from python_ctd_spark.operators.media_dedup import (
        ahash_pairs,
        audio_fingerprint,
    )

    t = np.arange(960)
    base = (((t * 131 + t * t * 7) % 8001) - 4000).astype(np.int16)
    other = (((t * 17 + 3) % 8001) - 4000).astype(np.int16)
    rows = [
        (0, encode_wav(base, rate=8000)),
        (1, encode_wav((base * 2).astype(np.int16), rate=8000)),  # gain x2
        (2, encode_wav(other, rate=8000)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    fp = audio_fingerprint(df)
    out = fp.toPandas().set_index("id")
    assert out.loc[0, "afp"] == energy_hash64(base.astype(np.float64))
    assert out.loc[0, "afp"] == out.loc[1, "afp"]  # scale-invariant
    assert out.loc[0, "n_samples"] == 960 and out.loc[0, "rate"] == 8000
    pairs = ahash_pairs(fp, max_hamming=0, bands=1, hash_col="afp").collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]


def test_gif_frame_hashes(spark):
    """GIF frames hash individually through the real decoder; an exact
    re-encode shares every frame hash, and the hashes equal ahash64 of
    the composited source frames."""
    from python_ctd_spark.functions.gif_numpy import decode_gif
    from python_ctd_spark.functions.media_fixtures import make_media_blob
    from python_ctd_spark.operators.media_dedup import _to_gray, gif_frame_hashes

    gid = 1  # make_media_blob: doc_id % 3 == 1 -> GIF
    fmt, blob, _src = make_media_blob(gid)
    assert fmt == "gif"
    df = spark.createDataFrame([(0, blob), (1, blob)], "doc_id long, blob binary")
    out = gif_frame_hashes(df).toPandas()
    assert sorted(out.frame_idx[out.id == 0]) == [0, 1]
    a = out[out.id == 0].sort_values("frame_idx").ahash.tolist()
    b = out[out.id == 1].sort_values("frame_idx").ahash.tolist()
    assert a == b  # same blob -> same per-frame hashes
    frames, _ = decode_gif(blob)
    want = [ahash64(_to_gray(fr)) for fr in frames]
    assert a == want
    assert set(out.height) == {8} and set(out.width) == {8}
