"""Pure-NumPy PNG decoder tests: round-trips, every filter type with
hand-computed expectations, palette expansion, and malformed input."""

import struct
import zlib

import numpy as np
import pytest

from python_ctd_spark.functions.png_numpy import _SIGNATURE, decode_png, encode_png_gray


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def _png(width, height, color, raw, extra=b""):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_roundtrip_gray_and_rgb():
    rng = np.random.RandomState(0)
    gray = rng.randint(0, 256, (5, 7), dtype=np.uint8)
    got = decode_png(encode_png_gray(gray))
    np.testing.assert_array_equal(got[:, :, 0], gray)
    rgb = rng.randint(0, 256, (4, 3, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png_gray(rgb)), rgb)


def test_filter_sub():
    # gray 1x4, filter 1 (Sub): recon[i] = line[i] + recon[i-1]
    raw = bytes([1, 10, 5, 250, 3])
    got = decode_png(_png(4, 1, 0, raw))
    assert got[0, :, 0].tolist() == [10, 15, (15 + 250) % 256, ((15 + 250) % 256 + 3) % 256]


def test_filter_up():
    # 2 rows gray 3 wide: row0 filter 0, row1 filter 2 (Up)
    raw = bytes([0, 1, 2, 3]) + bytes([2, 10, 20, 254])
    got = decode_png(_png(3, 2, 0, raw))
    assert got[1, :, 0].tolist() == [11, 22, (3 + 254) % 256]


def test_filter_average():
    # row0 filter 0 = [100, 8]; row1 filter 3: recon = x + (left+up)//2
    raw = bytes([0, 100, 8]) + bytes([3, 6, 4])
    got = decode_png(_png(2, 2, 0, raw))
    # row1[0]: 6 + (0+100)//2 = 56 ; row1[1]: 4 + (56+8)//2 = 36
    assert got[1, :, 0].tolist() == [56, 36]


def test_filter_paeth():
    # row0 filter 0 = [50, 60]; row1 filter 4
    raw = bytes([0, 50, 60]) + bytes([4, 5, 7])
    got = decode_png(_png(2, 2, 0, raw))
    # row1[0]: a=0,b=50,c=0 -> p=50 pa=50 pb=0 -> b=50 ; 5+50=55
    # row1[1]: a=55,b=60,c=50 -> p=65 pa=10 pb=5 pc=15 -> b=60 ; 7+60=67
    assert got[1, :, 0].tolist() == [55, 67]


def test_palette():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    raw = bytes([0, 0, 1, 2])  # one row of indices
    got = decode_png(_png(3, 1, 3, raw, extra=_chunk(b"PLTE", pal)))
    assert got.shape == (1, 3, 3)
    assert got[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]


def test_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    gray = np.zeros((2, 2), dtype=np.uint8)
    blob = bytearray(encode_png_gray(gray))
    # corrupt IHDR bit depth (offset: 8 sig + 4 len + 4 type + 8 w/h)
    blob[8 + 8 + 8] = 16
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(blob))


def test_decode_and_featurize_real_png(spark):
    """fake=False end-to-end: true pixel features for PNG blobs through
    the Arrow-batched mapInPandas stage."""
    import pandas as pd

    from python_ctd_spark.operators.multimodal import decode_and_featurize

    rng = np.random.RandomState(1)
    imgs = [rng.randint(0, 256, (6, 6), dtype=np.uint8) for _ in range(3)]
    rows = [(i, bytearray(encode_png_gray(img))) for i, img in enumerate(imgs)]
    df = spark.createDataFrame(rows, "id long, blob binary")
    got = (
        decode_and_featurize(df, n_features=4, fake=False)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert got["format"].tolist() == ["png"] * 3
    for i, img in enumerate(imgs):
        arr = img.astype(np.float64).ravel()
        exp = [float(c.mean()) for c in np.array_split(arr, 4)]
        assert got.loc[i, "feat"] == pytest.approx(exp)


def test_decode_and_featurize_real_rejects_non_png(spark):
    from py4j.protocol import Py4JJavaError

    from python_ctd_spark.operators.multimodal import decode_and_featurize

    df = spark.createDataFrame([(0, bytearray(b"RIFFxxxx"))], "id long, blob binary")
    with pytest.raises(Exception, match="PNG only|NotImplementedError"):
        decode_and_featurize(df, fake=False).collect()


def test_resize_area_box_means_and_upscale():
    from python_ctd_spark.functions.png_numpy import resize_area

    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1).repeat(3, axis=2)
    out = resize_area(img, 2, 2)
    assert out[:, :, 0].tolist() == [[2, 4], [10, 12]]
    # uneven ratio: boxes partition the source exactly (no pixel lost)
    img2 = np.ones((5, 7, 3), np.uint8) * 100
    assert (resize_area(img2, 2, 3) == 100).all()
    # upscale -> nearest neighbor, shape honored
    assert resize_area(img, 8, 6).shape == (8, 6, 3)
    with pytest.raises(ValueError):
        resize_area(img, 0, 4)


def test_resize_image_real_png_through_spark(spark):
    import pandas as pd

    from python_ctd_spark.functions.png_numpy import decode_png, encode_png_gray
    from python_ctd_spark.operators.multimodal import resize_image

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "blob": [bytearray(encode_png_gray(img))]})
    )
    out = resize_image(df, target_w=4, target_h=4, fake=False).toPandas()
    got = decode_png(bytes(out.iloc[0]["resized"]))
    assert got.shape == (4, 4, 3)
    # every 2x2 source box averaged exactly
    expect = img.reshape(4, 2, 4, 2, 3).mean(axis=(1, 3))
    np.testing.assert_array_equal(got, np.rint(expect).astype(np.uint8))
    # non-PNG on the real path stays honestly stubbed
    raw = spark.createDataFrame(pd.DataFrame({"id": [1], "blob": [bytearray(b"zz")]}))
    with pytest.raises(Exception, match="NotImplementedError|PNG|PIL"):
        resize_image(raw, fake=False).collect()


def test_resize_image_real_gray_alpha_png(spark):
    """resize_image(fake=False) on a color-type-4 (gray+alpha) PNG:
    decode yields (H, W, 2); the resize path must drop the alpha plane
    and emit a decodable grayscale PNG instead of dying on the encoder's
    channel map (ADVICE r5)."""
    import pandas as pd

    from python_ctd_spark.operators.multimodal import resize_image

    h, w = 8, 8
    rng = np.random.default_rng(4)
    ga = rng.integers(0, 256, size=(h, w, 2), dtype=np.uint8)
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(h))
    blob = _png(w, h, 4, raw)
    assert decode_png(blob).shape == (h, w, 2)
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "blob": [bytearray(blob)]})
    )
    out = resize_image(df, target_w=4, target_h=4, fake=False).toPandas()
    got = decode_png(bytes(out.iloc[0]["resized"]))
    assert got.shape == (4, 4, 1)


def test_adam7_interlaced_round_trip():
    """Adam7 interlacing (spec §8.2, r13): seven filtered sub-images on
    the pass lattice decode to the identical pixels as the sequential
    layout — including the degenerate shapes where trailing passes are
    empty (1x1, single-column) — and a bogus interlace method is loud."""
    import numpy as np
    import pytest

    from python_ctd_spark.functions.png_numpy import (
        decode_png, encode_png_gray,
    )

    rng = np.random.default_rng(4)
    for shape in [(16, 16), (13, 21), (7, 5, 3), (1, 1), (9, 1, 3),
                  (2, 3), (33, 47, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        blob = encode_png_gray(img, interlace=True)
        out = decode_png(blob)
        want = img[..., None] if img.ndim == 2 else img
        assert np.array_equal(out, want), shape
        # the header really says Adam7 (byte 28 of the stream is the
        # IHDR interlace field)
        assert blob[28] == 1
    bad = bytearray(encode_png_gray(rng.integers(0, 256, (4, 4),
                                                 dtype=np.uint8)))
    bad[28] = 7  # IHDR interlace byte
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bytes(bad))


def test_corrupt_idat_raises_valueerror_not_zlib_error():
    """ADVICE r13: one flipped IDAT byte must surface as ValueError —
    the module's single error type, the one image_ahash's strict=False
    quarantine catches — never a raw zlib.error."""
    rng = np.random.default_rng(11)
    blob = bytearray(
        encode_png_gray(rng.integers(0, 256, (8, 8), dtype=np.uint8))
    )
    idx = bytes(blob).index(b"IDAT") + 8  # first byte of the deflate body
    blob[idx] ^= 0xFF
    with pytest.raises(ValueError, match="IDAT"):
        decode_png(bytes(blob))
