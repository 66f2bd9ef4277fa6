"""Motion-JPEG AVI codec (functions/avi_numpy — clean-room RIFF/AVI
walk over the repo's own JPEG codec) and its wiring through the video
operators: round trips, honest codec gates, and the video near-dup
path reusing the GIF aggregate unchanged."""

import numpy as np
import pandas as pd
import pytest

from python_ctd_spark.functions.avi_numpy import decode_avi, encode_avi_mjpeg


def _frames(k=4, h=16, w=24):
    return [
        (np.add.outer(np.arange(h) * (i + 1), np.arange(w)) % 256)
        .astype(np.uint8)[..., None]
        .repeat(3, -1)
        for i in range(k)
    ]


def test_round_trip_q100_exact():
    """quality=100 MJPEG frames decode back bit-exact for DCT-friendly
    rasters; fps survives the avih microseconds field."""
    frames = _frames()
    got, fps = decode_avi(encode_avi_mjpeg(frames, fps=12.5, quality=100))
    assert fps == 12.5 and len(got) == len(frames)
    for g, f in zip(got, frames):
        assert np.array_equal(g, f)


def test_codec_gates_are_loud():
    """Non-AVI blobs, non-MJPEG fourccs (named in the message), and
    frameless containers all raise ValueError."""
    blob = bytearray(encode_avi_mjpeg(_frames(2), quality=90))
    i = blob.find(b"vidsMJPG")
    blob[i + 4 : i + 8] = b"H264"
    with pytest.raises(ValueError, match="H264"):
        decode_avi(bytes(blob))
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="no video frame"):
        decode_avi(b"RIFF\x04\x00\x00\x00AVI ")


def test_video_near_dup_reproduces_gif_fixture_groups(spark):
    """video_frame_hashes over MJPEG muxes of the GIF fixture rasters
    feeds gif_near_dup_pairs UNCHANGED and reproduces the exact planted
    group structure — the 'each codec is an adapter, never a new
    engine' design claim, proven end-to-end."""
    from python_ctd_spark.operators.media_dedup import (
        gif_frame_hashes,
        gif_near_dup_pairs,
        synthesize_gif_blobs,
        synthesize_video_blobs,
        video_frame_hashes,
    )

    ids = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(32))}))
    via_avi = {
        (r.id_a, r.id_b): (r.n_matched, r.match_frac)
        for r in gif_near_dup_pairs(
            video_frame_hashes(synthesize_video_blobs(ids)), 3,
            min_match_frac=0.5,
        ).collect()
    }
    via_gif = {
        (r.id_a, r.id_b): (r.n_matched, r.match_frac)
        for r in gif_near_dup_pairs(
            gif_frame_hashes(synthesize_gif_blobs(ids)), 3,
            min_match_frac=0.5,
        ).collect()
    }
    assert via_avi == via_gif and len(via_avi) > 0


def test_video_quarantine_and_frame_sample(spark):
    """strict=False quarantines an undecodable video as one row; real
    frame_sample emits every_n-th MJPEG frame as raw RGB bytes."""
    from python_ctd_spark.operators.media_dedup import video_frame_hashes
    from python_ctd_spark.operators.multimodal import frame_sample

    frames = _frames(6, h=8, w=8)
    good = encode_avi_mjpeg(frames, quality=100)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2],
                      "blob": [good, b"RIFF\x04\x00\x00\x00AVI "]})
    )
    out = video_frame_hashes(df, strict=False).toPandas()
    assert len(out[out.id == 1]) == 6
    assert out[out.id == 1].error.isna().all()
    bad = out[out.id == 2]
    assert len(bad) == 1 and bad.error.notna().all()

    sampled = frame_sample(
        df.filter("doc_id = 1"), id_col="doc_id", every_n=2
    ).toPandas()
    assert list(sampled.frame_idx) == [0, 2, 4]
    for k, row in zip((0, 2, 4), sampled.itertuples()):
        assert bytes(row.frame) == frames[k].tobytes()
