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
