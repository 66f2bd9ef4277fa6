"""Pure-NumPy GIF decoder tests: round-trips (single frame, animation,
interlace, 256 colors), LZW code-width growth against a hand-built
stream, transparency/disposal compositing, malformed input, and the
Spark-side real decode paths (frame_sample / decode_and_featurize)."""

import numpy as np
import pandas as pd
import pytest

from python_ctd_spark.functions.gif_numpy import (
    _BitWriter,
    _lzw_decode,
    decode_gif,
    encode_gif,
)


def _quantized(rng, h, w, levels=4, scale=60):
    return (rng.randint(0, levels, (h, w, 1)).repeat(3, axis=2) * scale).astype(
        np.uint8
    )


def test_roundtrip_single_frame():
    rng = np.random.RandomState(0)
    f = _quantized(rng, 5, 7)
    frames, delays = decode_gif(encode_gif([f]))
    assert len(frames) == 1 and delays == [0]
    np.testing.assert_array_equal(frames[0], f)


def test_roundtrip_animation_with_delays():
    rng = np.random.RandomState(1)
    a = _quantized(rng, 6, 4)
    b = _quantized(rng, 6, 4)
    frames, delays = decode_gif(encode_gif([a, b], delays_cs=[10, 25]))
    assert delays == [10, 25]
    np.testing.assert_array_equal(frames[0], a)
    np.testing.assert_array_equal(frames[1], b)


def test_roundtrip_interlaced():
    rng = np.random.RandomState(2)
    f = _quantized(rng, 11, 5)  # odd height exercises all 4 passes
    frames, _ = decode_gif(encode_gif([f], interlace=True))
    np.testing.assert_array_equal(frames[0], f)


def test_roundtrip_256_colors():
    rng = np.random.RandomState(3)
    f = rng.randint(0, 256, (16, 16, 1)).repeat(3, axis=2).astype(np.uint8)
    frames, _ = decode_gif(encode_gif([f]))
    np.testing.assert_array_equal(frames[0], f)


def test_lzw_code_width_growth():
    """Hand-built stream for pixel run 0,0,0,0,0,0 with min_code_size=2:
    CLEAR, 0, 6 (=00), 7 (=000) — the decoder's table crosses 2^3 after
    code 6, so code 7 must be read at FOUR bits.  Exercises the width
    growth the uncompressed test encoder never emits."""
    w = _BitWriter()
    w.write(4, 3)   # CLEAR
    w.write(0, 3)   # -> (0,)
    w.write(6, 3)   # -> (0,0); table reaches 8 == 2^3 -> width 4
    w.write(7, 4)   # -> (0,0,0) read at the grown width
    w.write(5, 4)   # END
    out = _lzw_decode(w.tobytes(), 2, 6)
    assert out == [0, 0, 0, 0, 0, 0]


def test_transparency_keeps_canvas_pixel():
    """A pixel whose index is marked transparent must NOT overwrite the
    canvas: the composed frame shows what was under it (here the
    background fill, which GIF initializes from the background color)."""
    a = np.zeros((1, 2, 3), np.uint8)
    a[0, 0] = [10, 10, 10]
    a[0, 1] = [20, 20, 20]
    b = np.full((1, 2, 3), 10, np.uint8)
    # np.unique palette order: (10,)->0, (20,)->1; bg color index 0
    blob = encode_gif([a, b], transparent_index=1)
    frames, _ = decode_gif(blob)
    # frame 0's second pixel (palette idx 1) is transparent -> the
    # background (palette 0 = 10) shows through
    assert frames[0][0, 0].tolist() == [10, 10, 10]
    assert frames[0][0, 1].tolist() == [10, 10, 10]
    np.testing.assert_array_equal(frames[1], b)
    # without the transparency flag the same pixel lands opaque
    frames2, _ = decode_gif(encode_gif([a, b]))
    assert frames2[0][0, 1].tolist() == [20, 20, 20]


def test_disposal_restore_background():
    a = np.full((1, 1, 3), 60, np.uint8)
    b = np.full((1, 1, 3), 120, np.uint8)
    frames, _ = decode_gif(encode_gif([a, b], disposal=2))
    np.testing.assert_array_equal(frames[0], a)
    np.testing.assert_array_equal(frames[1], b)


def test_malformed_inputs_raise():
    with pytest.raises(ValueError, match="GIF8"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    good = encode_gif([np.zeros((2, 2, 3), np.uint8)])
    with pytest.raises(ValueError):
        decode_gif(good[:-8])  # truncated mid-stream


def test_frame_sample_real_gif_through_spark(spark):
    rng = np.random.RandomState(5)
    fr = [_quantized(rng, 4, 3) for _ in range(5)]
    blob = encode_gif(fr)
    from python_ctd_spark.operators.multimodal import decode_and_featurize, frame_sample

    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "blob": [bytearray(blob)]})
    )
    out = frame_sample(df, every_n=2, fake=False).toPandas().sort_values("frame_idx")
    assert out.frame_idx.tolist() == [0, 2, 4]
    for k, row in zip([0, 2, 4], out.itertuples()):
        np.testing.assert_array_equal(
            np.frombuffer(row.frame, np.uint8).reshape(4, 3, 3), fr[k]
        )
    feats = decode_and_featurize(df, fake=False).toPandas()
    assert feats.iloc[0]["format"] == "gif"
    # features are means over the real pixel stream
    allpix = np.concatenate([f.astype(np.float64).ravel() for f in fr])
    expect = [float(c.mean()) for c in np.array_split(allpix, 8)]
    np.testing.assert_allclose(feats.iloc[0]["feat"], expect)
    # non-GIF blob on the real path stays honestly stubbed
    raw = spark.createDataFrame(pd.DataFrame({"id": [1], "blob": [bytearray(b"xx")]}))
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg|GIF"):
        frame_sample(raw, fake=False).collect()


def test_frame_rect_outside_screen_is_labeled():
    """A descriptor rect past the logical screen must raise the
    decoder's labeled diagnostic, not a raw numpy broadcast error."""
    import struct

    frame = np.zeros((4, 4, 3), dtype=np.uint8)
    frame[1, 2] = [200, 10, 10]
    blob = bytearray(encode_gif([frame]))
    desc = struct.pack("<HHHH", 0, 0, 4, 4)
    at = blob.find(b"\x2c" + desc)
    assert at >= 0, "image descriptor not found in encoded GIF"
    blob[at + 1 : at + 9] = struct.pack("<HHHH", 2, 0, 4, 4)  # shift right
    with pytest.raises(ValueError, match="frame rect outside logical screen"):
        decode_gif(bytes(blob))
