"""audio_dedup / gif_dedup driver-row machinery (VERDICT r11 item 5):
fixture codecs round-trip exactly, fingerprints equal their planted
bit patterns, and the per-id-pair frame-match aggregate keeps exactly
the pairs the exhaustive definition keeps."""

import numpy as np
import pandas as pd

from python_ctd_spark.functions.media_dedup_fixtures import (
    GIF_FRAMES,
    audio_fixture_bits,
    gif_fixture_frames,
    make_audio_blob,
    make_gif_blob,
)


def test_audio_fixture_round_trip_and_planted_bits():
    """int16 square waves round-trip bit-exactly through the WAV codec
    and the energy hash recovers EXACTLY the planted 64 bits (the
    <=3-flip margin argument)."""
    from python_ctd_spark.functions.audio_hash import energy_hash64
    from python_ctd_spark.functions.image_hash import pack_bits64
    from python_ctd_spark.functions.wav_numpy import decode_wav

    for doc_id in (0, 1, 17, 250):
        blob, samples = make_audio_blob(doc_id)
        decoded, rate = decode_wav(blob)
        assert rate == 8000
        assert np.array_equal(decoded.astype(np.int16), samples)
        want = pack_bits64(audio_fixture_bits(doc_id))
        assert energy_hash64(decoded) == want


def test_audio_within_group_hamming_is_flip_symdiff():
    """ids 16 and 17 share a base; their fingerprint Hamming distance
    equals the symmetric difference of the variant flip sets."""
    from python_ctd_spark.functions.media_dedup_fixtures import _flips

    b16 = audio_fixture_bits(16)
    b17 = audio_fixture_bits(17)
    sym = set(_flips("aud-flip", 0)) ^ set(_flips("aud-flip", 1))
    assert int((b16 != b17).sum()) == len(sym)


def test_gif_fixture_round_trip():
    """Two-color palette GIFs round-trip exactly through the stdlib
    codec — per-frame hashes of the decode equal those of the source."""
    from python_ctd_spark.functions.gif_numpy import decode_gif
    from python_ctd_spark.functions.image_hash import ahash64

    for doc_id in (0, 5, 33):
        blob, src = make_gif_blob(doc_id)
        frames, _delays = decode_gif(blob)
        assert len(frames) == GIF_FRAMES == len(src)
        for got, want in zip(frames, src):
            assert np.array_equal(got, want)
            assert ahash64(got.astype(np.float64).mean(axis=2)) == ahash64(
                want.astype(np.float64).mean(axis=2)
            )


def test_gif_near_dup_pairs_exact_semantics(spark):
    """The per-id-pair aggregate on a hand-built frame-hash table:
    full match kept, half match kept at min_match_frac=0.5, a hash
    match at MISALIGNED frame indexes does not count, and disjoint
    animations emit nothing."""
    from python_ctd_spark.operators.media_dedup import gif_near_dup_pairs

    h0, h1 = 0xFF, 0xFF0000  # 16 bits apart from each other
    rows = [
        # id 0: the reference 2-frame animation
        (0, 0, h0), (0, 1, h1),
        # id 1: both frames within 1 bit -> frac 1.0
        (1, 0, h0 ^ 1), (1, 1, h1 ^ 2),
        # id 2: frame 0 matches, frame 1 far -> frac 0.5
        (2, 0, h0), (2, 1, 0x3C3C3C3C00000000),
        # id 3: both frames far from everything -> no row
        (3, 0, 0x5555000011110000), (3, 1, 0x0000AAAA0000CCCC),
        # id 4: matches id 0's hashes but at SWAPPED indexes -> no row
        (4, 0, h1), (4, 1, h0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "frame_idx", "ahash"])
    )
    got = (
        gif_near_dup_pairs(df, max_hamming=3, min_match_frac=0.5)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert [tuple(r) for r in got[["id_a", "id_b", "n_matched"]].values] == [
        (0, 1, 2), (0, 2, 1), (1, 2, 1),
    ]
    assert got.match_frac.tolist() == [1.0, 0.5, 0.5]
    # raising the threshold drops the half-matches
    strict = gif_near_dup_pairs(df, max_hamming=3, min_match_frac=0.9)
    assert [tuple(r) for r in strict.select("id_a", "id_b").collect()] == [(0, 1)]


def test_gif_near_dup_pairs_matches_exhaustive_on_fixtures(spark):
    """Driver-row semantics end-to-end over real fixture blobs for 64
    ids (4 groups): the banded packed-key path equals the exhaustive
    same-frame-index all-pairs definition."""
    from python_ctd_spark.functions.image_hash import ahash64
    from python_ctd_spark.operators.media_dedup import (
        gif_frame_hashes, gif_near_dup_pairs, synthesize_gif_blobs,
    )

    ids = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(64))})
    )
    frames = gif_frame_hashes(synthesize_gif_blobs(ids))
    got = {
        (r.id_a, r.id_b): (r.n_matched, r.match_frac)
        for r in gif_near_dup_pairs(frames, 3, min_match_frac=0.5).collect()
    }
    # exhaustive reference from pre-encode rasters
    hashes = {
        d: [
            ahash64(fr.astype(np.float64).mean(axis=2))
            for fr in gif_fixture_frames(d)
        ]
        for d in range(64)
    }
    want = {}
    for a in range(64):
        for b in range(a + 1, 64):
            m = sum(
                1
                for fa, fb in zip(hashes[a], hashes[b])
                if bin((fa ^ fb) & ((1 << 64) - 1)).count("1") <= 3
            )
            if m / GIF_FRAMES >= 0.5:
                want[(a, b)] = (m, round(m / GIF_FRAMES, 6))
    assert got == want
    assert len(want) > 10  # groups of 16 with <=3-bit variants pair up


def test_gif_near_dup_pairs_rejects_oversized_ids(spark):
    """Packed-key bounds are LOUD: an md5-scale doc_id (>= 2^43) or a
    negative id must raise, not overflow into wrong pairs."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from python_ctd_spark.operators.media_dedup import gif_near_dup_pairs

    df = spark.createDataFrame(
        pd.DataFrame({"id": [1 << 60, 3], "frame_idx": [0, 0],
                      "ahash": [1, 2]})
    )
    with pytest.raises(SparkRuntimeException, match="2\\^43"):
        gif_near_dup_pairs(df).collect()


def test_decode_quarantine_path(spark):
    """VERDICT r12 item 3: with strict=False every media fingerprinter
    turns an undecodable blob into a quarantine ROW (error set, hash
    NULL) instead of a dead 100 TB job — mirroring the WARC reader's
    record-granular quarantine — while the strict default still
    raises, and the downstream banded joins exclude quarantined ids by
    key semantics."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from python_ctd_spark.functions.image_hash import make_image_blob
    from python_ctd_spark.functions.jpeg_numpy import encode_jpeg
    from python_ctd_spark.operators.media_dedup import (
        ahash_pairs,
        audio_fingerprint,
        gif_frame_hashes,
        gif_near_dup_pairs,
        image_ahash,
    )

    _, px = make_image_blob(0)
    good_png, _ = make_image_blob(2)
    good_prog = encode_jpeg(px, quality=100, progressive=True)
    arith = bytearray(encode_jpeg(px, quality=100))
    arith[arith.find(b"\xff\xc0") + 1] = 0xC9  # SOF9: arithmetic coding
    imgs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "blob": [good_prog, bytes(arith), good_png,
                     b"\xff\xd8garbage"],
        })
    )
    out = image_ahash(imgs, strict=False).toPandas().set_index("id")
    assert out.loc[0, "error"] is None and out.loc[2, "error"] is None
    assert "arithmetic" in out.loc[1, "error"]
    assert out.loc[3, "error"] and pd.isna(out.loc[3, "ahash"])
    # quarantined ids never reach the banded join
    pairs = ahash_pairs(image_ahash(imgs, strict=False), max_hamming=3)
    ids = {i for r in pairs.collect() for i in (r.id_a, r.id_b)}
    assert 1 not in ids and 3 not in ids
    # strict default still raises (executor-side -> PythonException;
    # whichever bad blob a partition hits first surfaces)
    with pytest.raises(PythonException, match="ValueError"):
        image_ahash(imgs).collect()

    wav, _ = make_audio_blob(5)
    auds = spark.createDataFrame(
        pd.DataFrame({"doc_id": [5, 6], "blob": [wav, b"RIFFnope"]})
    )
    a = audio_fingerprint(auds, strict=False).toPandas().set_index("id")
    assert a.loc[5, "error"] is None and not pd.isna(a.loc[5, "afp"])
    assert a.loc[6, "error"] and pd.isna(a.loc[6, "afp"])
    with pytest.raises(PythonException):
        audio_fingerprint(auds).collect()

    gif, _ = make_gif_blob(7)
    gifs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7, 8], "blob": [gif, b"GIF89a\x00"]})
    )
    g = gif_frame_hashes(gifs, strict=False).toPandas()
    good = g[g.id == 7]
    assert len(good) == GIF_FRAMES and good.error.isna().all()
    bad = g[g.id == 8]
    assert len(bad) == 1 and bad.error.notna().all()
    assert bad.frame_idx.isna().all()
    # the packed-key join must not trip its id-bounds raise_error on
    # the quarantine row's NULL frame_idx
    gif_near_dup_pairs(gif_frame_hashes(gifs, strict=False)).collect()
    with pytest.raises(PythonException):
        gif_frame_hashes(gifs).collect()
