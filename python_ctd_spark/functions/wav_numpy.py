"""Pure stdlib+NumPy WAV (RIFF/PCM) decoding — no librosa/soundfile in
this environment.

PCM WAV is fully decodable with the stdlib ``wave`` module + a dtype
view: frame bytes -> integer samples -> float64 mono mixdown.  This
removes the ``fake=True`` asterisk from the *audio* path of
:mod:`python_ctd_spark.operators.multimodal`, the same way
``png_numpy`` did for images; compressed audio (mp3/ogg/aac) and video
stay honestly codec-gated.

Supported: 8-bit unsigned, 16/32-bit signed little-endian PCM, any
channel count (channels average into a mono track — the layout feature
extraction wants).  Decoding is O(samples) with vectorized NumPy ops.
"""

from __future__ import annotations

import io
import wave

import numpy as np

_DTYPES = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV blob to ``(mono_samples, sample_rate)``.

    ``mono_samples`` is float64 in the source integer range (8-bit input
    is re-centered around 0 — the format stores it unsigned); multi-
    channel input averages down to mono.  Raises ``ValueError`` on
    non-PCM or unsupported sample widths, mirroring ``decode_png``'s
    contract of loud failure over silent garbage.
    """
    try:
        with wave.open(io.BytesIO(data)) as w:
            n_ch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
    except wave.Error as e:  # non-PCM compression codes, truncated header
        raise ValueError(f"not a decodable PCM WAV: {e}") from e
    if width not in _DTYPES:
        raise ValueError(f"unsupported PCM sample width {width} (want 1/2/4)")
    arr = np.frombuffer(raw, dtype=_DTYPES[width]).astype(np.float64)
    if width == 1:
        arr -= 128.0
    if n_ch > 1:
        arr = arr[: (arr.size // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return arr, rate


def encode_wav(samples: np.ndarray, rate: int = 8000, width: int = 2) -> bytes:
    """Encode integer samples to a mono PCM WAV blob (test-fixture
    helper; the inverse of :func:`decode_wav` for mono input)."""
    dt = _DTYPES[width]
    arr = np.asarray(samples)
    if width == 1:
        arr = (arr + 128).astype(dt)
    else:
        arr = arr.astype(dt)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def _parse_riff(data: bytes):
    """Minimal RIFF/WAVE chunk walk for the formats the stdlib ``wave``
    module refuses (format codes other than PCM): returns
    ``(fmt_code, n_channels, rate, bits, data_bytes)``."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            code, n_ch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            fmt = (code, n_ch, rate, bits)
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    return (*fmt, payload)


def decode_wav_any(data: bytes) -> tuple[np.ndarray, int]:
    """:func:`decode_wav` plus the companded telephony formats:
    G.711 mu-law (format code 7) and A-law (6) expand to linear 16-bit
    via the stdlib ``audioop`` (present through Python 3.12) before the
    usual float64 mono mixdown.  Everything else defers to
    :func:`decode_wav`'s PCM path."""
    try:
        return decode_wav(data)
    except ValueError:
        pass
    code, n_ch, rate, _bits, payload = _parse_riff(data)
    if code not in (6, 7):
        raise ValueError(f"unsupported WAV format code {code}")
    try:
        import audioop
    except ImportError as e:  # Python >= 3.13 removed it
        raise ValueError("audioop unavailable for G.711 expansion") from e
    lin = audioop.ulaw2lin(payload, 2) if code == 7 else audioop.alaw2lin(payload, 2)
    arr = np.frombuffer(lin, dtype="<i2").astype(np.float64)
    if n_ch > 1:
        arr = arr[: (arr.size // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return arr, rate


def encode_wav_g711(samples: np.ndarray, rate: int = 8000, ulaw: bool = True) -> bytes:
    """Test-fixture encoder: int16 mono samples -> mu-law/A-law WAV."""
    import audioop
    import struct

    pcm = np.asarray(samples).astype("<i2").tobytes()
    payload = audioop.lin2ulaw(pcm, 2) if ulaw else audioop.lin2alaw(pcm, 2)
    code = 7 if ulaw else 6
    fmt = struct.pack("<HHIIHH", code, 1, rate, rate, 1, 8)
    out = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out
