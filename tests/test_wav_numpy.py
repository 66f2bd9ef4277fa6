"""PCM WAV decode: round-trip exactness, channel mixdown, the Spark
decode path (cf. multimodal plumbing in operators/multimodal.py)."""

import io
import wave

import numpy as np
import pandas as pd
import pytest

from python_ctd_spark.functions.wav_numpy import decode_wav, encode_wav


def test_roundtrip_int16_exact():
    samples = np.array([0, 1000, -1000, 32767, -32768, 12345], dtype=np.int64)
    blob = encode_wav(samples, rate=16000, width=2)
    got, rate = decode_wav(blob)
    assert rate == 16000
    np.testing.assert_array_equal(got, samples.astype(np.float64))


def test_8bit_recentered():
    # 8-bit WAV stores unsigned; decode re-centers so silence is 0
    samples = np.array([0, 127, -128, 64], dtype=np.int64)
    got, _ = decode_wav(encode_wav(samples, width=1))
    np.testing.assert_array_equal(got, samples.astype(np.float64))


def test_stereo_mixdown():
    left = np.array([100, 200, 300], dtype="<i2")
    right = np.array([300, 0, -100], dtype="<i2")
    inter = np.empty(6, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(inter.tobytes())
    got, _ = decode_wav(buf.getvalue())
    np.testing.assert_array_equal(got, [200.0, 100.0, 100.0])


def test_junk_raises():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFjunkWAVEnot-a-real-file")


def test_decode_and_featurize_real_wav(spark):
    """fake=False really decodes WAV blobs: chunk-mean features over the
    decoded mono samples, computed identically here in NumPy."""
    from python_ctd_spark.operators.multimodal import decode_and_featurize

    rng = np.random.default_rng(7)
    rows = []
    for i in range(3):
        s = rng.integers(-3000, 3000, size=50 + 13 * i)
        rows.append((i, bytearray(encode_wav(s, width=2))))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "blob"]))
    got = (
        decode_and_featurize(df, n_features=4, fake=False)
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    assert list(got["format"]) == ["wav"] * 3
    for i in range(3):
        samples, _ = decode_wav(bytes(rows[i][1]))
        want = [float(c.mean()) for c in np.array_split(samples, 4)]
        assert got.loc[i, "feat"] == pytest.approx(want)


def test_g711_mulaw_alaw_roundtrip():
    """Companded telephony WAVs (format codes 7/6) expand through the
    manual RIFF walk + audioop; error bounded by G.711 quantization."""
    from python_ctd_spark.functions.wav_numpy import decode_wav_any, encode_wav_g711

    t = (np.arange(0, 2000, dtype=np.int16) * 11 - 11000).astype(np.int16)
    for ulaw in (True, False):
        got, rate = decode_wav_any(encode_wav_g711(t, rate=16000, ulaw=ulaw))
        assert rate == 16000 and len(got) == len(t)
        err = np.abs(got - t.astype(np.float64))
        assert (err <= np.abs(t) * 0.05 + 64).all()
    # PCM still routes through the fast path
    from python_ctd_spark.functions.wav_numpy import encode_wav

    got, _ = decode_wav_any(encode_wav(t, rate=8000, width=2))
    np.testing.assert_array_equal(got, t.astype(np.float64))
    with pytest.raises(ValueError):
        decode_wav_any(b"RIFFxxxxWAVEjunk")


def test_g711_luts_match_audioop_reference():
    """The clean-room G.711 expansion LUTs (ITU-T segment layout, no
    audioop — Python 3.13 removed it) reproduce the stdlib audioop
    expansion byte-for-byte while it still exists to compare against."""
    audioop = pytest.importorskip("audioop")
    from python_ctd_spark.functions.wav_numpy import _g711_tables

    ul, al = _g711_tables()
    ref_u = np.frombuffer(audioop.ulaw2lin(bytes(range(256)), 2), dtype="<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(bytes(range(256)), 2), dtype="<i2")
    np.testing.assert_array_equal(ul, ref_u)
    np.testing.assert_array_equal(al, ref_a)


def test_ima_adpcm_roundtrip_and_gates():
    """IMA/DVI ADPCM (format code 17): block-header predictor + step
    index, 4-bit nibbles low-first; decode(encode(x)) tracks within the
    codec's quantization (a ~4-bit codec — bounded relative error, no
    drift across block boundaries since each block header resyncs)."""
    from python_ctd_spark.functions.wav_numpy import (
        decode_wav_any, encode_wav_ima,
    )

    x = (np.sin(np.arange(1010) / 7.0) * 12000).astype(np.int16)
    got, rate = decode_wav_any(encode_wav_ima(x, rate=22050))
    assert rate == 22050
    assert got.size == x.size  # 2 blocks of 505, no pad spill
    err = np.abs(got - x.astype(np.float64))
    assert err.max() <= 600  # quantization, not divergence
    # block resync: error does not grow in the second block
    assert err[505:].max() <= err[:505].max() + 100
    # random-walk stress: relative error stays codec-bounded
    rng = np.random.default_rng(5)
    w = np.cumsum(rng.standard_normal(2020) * 300).clip(-30000, 30000)
    w = w.astype(np.int16)
    got, _ = decode_wav_any(encode_wav_ima(w))
    rel = np.abs(got[: w.size] - w).max() / (np.abs(w).max() + 1)
    assert rel < 0.08
    # unknown format codes stay loudly gated
    from python_ctd_spark.functions.wav_numpy import _wav_container

    with pytest.raises(ValueError, match="format code 85"):
        decode_wav_any(_wav_container(85, 1, 8000, 16, 2, b"\x00\x00"))


def test_ima_partial_final_block_no_phantom_tail():
    """Self-review r13: the fact chunk bounds the decode — a sample
    count that is not a block multiple must come back EXACTLY, not
    padded with decoded zero-nibbles."""
    from python_ctd_spark.functions.wav_numpy import (
        decode_wav_any, encode_wav_g711, encode_wav_ima,
    )

    x = (np.sin(np.arange(1000) / 9.0) * 9000).astype(np.int16)
    got, _ = decode_wav_any(encode_wav_ima(x))
    assert got.size == x.size
    g, _ = decode_wav_any(encode_wav_g711(x))
    assert g.size == x.size


def test_audio_fingerprint_accepts_compressed_wav(spark):
    """Self-review r13: audio dedup must accept the same WAV surface as
    decode_and_featurize — a G.711 blob fingerprints instead of killing
    the job under the strict default."""
    import pandas as pd

    from python_ctd_spark.functions.wav_numpy import encode_wav_g711
    from python_ctd_spark.operators.media_dedup import audio_fingerprint

    x = (np.sin(np.arange(4096) / 5.0) * 15000).astype(np.int16)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "blob": [encode_wav_g711(x)]})
    )
    out = audio_fingerprint(df).toPandas()
    assert out.loc[0, "error"] is None and not pd.isna(out.loc[0, "afp"])
    assert out.loc[0, "n_samples"] == 4096


def test_malformed_wav_error_contract_is_valueerror():
    """ADVICE r13: a truncated WAV raises EOFError from stdlib wave and
    a short fmt chunk would hit struct.error in _parse_riff — both must
    surface as ValueError, the one type audio_fingerprint's
    strict=False quarantine catches, or one malformed blob in a dirty
    archive kills the whole job."""
    import struct

    from python_ctd_spark.functions.wav_numpy import decode_wav_any

    fmt8 = struct.pack("<HHI", 1, 1, 8000)  # 8-byte fmt chunk
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt8)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
    )
    with pytest.raises(ValueError):
        decode_wav_any(blob)
    # truncated fact chunk (declared 4 bytes, body empty) + short data
    blob2 = (
        b"RIFF" + struct.pack("<I", 24) + b"WAVE"
        + b"fact" + struct.pack("<I", 4)
    )
    with pytest.raises(ValueError):
        decode_wav_any(blob2)


def test_truncated_wav_quarantines_not_kills(spark):
    """The ADVICE r13 scenario end-to-end: the EOFError-shaped blob
    flows through audio_fingerprint(strict=False) as a quarantine row
    next to a good row, instead of killing the task."""
    import struct

    import pandas as pd

    from python_ctd_spark.operators.media_dedup import audio_fingerprint

    fmt8 = struct.pack("<HHI", 1, 1, 8000)
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt8)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
    )
    good = encode_wav((np.sin(np.arange(256) / 3.0) * 9000).astype(np.int16))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "blob": [bad, good]})
    )
    out = audio_fingerprint(df, strict=False).toPandas().set_index("id")
    assert out.loc[1, "error"] and pd.isna(out.loc[1, "afp"])
    assert out.loc[2, "error"] is None and not pd.isna(out.loc[2, "afp"])
