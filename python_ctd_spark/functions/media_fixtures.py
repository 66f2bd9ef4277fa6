"""Deterministic media-blob fixtures shared by the Spark query
``multimodal_real_decode`` and its kernel-golden oracle
(``tools/make_golden.py``).

Each ``doc_id`` maps to exactly one blob (PNG / GIF / WAV round-robin)
whose content is a pure function of the id, built with the repo's own
stdlib encoders (:mod:`.png_numpy`, :mod:`.gif_numpy`,
:mod:`.wav_numpy`).  The builder returns the *pre-encode* sample array
alongside the blob, so the oracle computes expected features from the
source signal while the Spark side must round-trip the blob through the
real decoders (``decode_and_featurize(fake=False)``) to match — a
hard end-to-end check on the codecs, not just the plumbing.

All three codecs are lossless for these inputs (8-bit gray PNG,
<=256-color full-canvas GIF frames, 16-bit PCM WAV), so the decoded
arrays are byte-identical to the sources and the float64 feature means
match bit-for-bit with no rounding on either side.
"""

from __future__ import annotations

import numpy as np

from .gif_numpy import encode_gif
from .media_features import feature_fold
from .png_numpy import encode_png_gray
from .wav_numpy import encode_wav

FORMATS = ("png", "gif", "wav")


def make_media_blob(doc_id: int) -> tuple[str, bytes, np.ndarray]:
    """Return ``(format, blob, source_samples_float64)`` for one id.

    ``source_samples_float64`` is exactly what
    ``decode_and_featurize(fake=False)``'s decode step yields for the
    blob, flattened in decode order: gray pixel raster for PNG,
    concatenated full-canvas RGB frame rasters for GIF, float64 PCM
    samples for WAV.
    """
    d = int(doc_id)
    fmt = FORMATS[d % 3]
    if fmt == "png":
        h, w = 9, 12
        px = ((d * 31 + np.arange(h * w) * 7) % 256).astype(np.uint8).reshape(h, w)
        # decode_png returns (h, w, 1); ravel order matches the 2-D raster
        return fmt, encode_png_gray(px), px.astype(np.float64).ravel()
    if fmt == "gif":
        # two full-canvas 8x8 frames over a 4-color palette (global color
        # table stays tiny; draw-over disposal makes frame 2 exactly its
        # own raster on the composited canvas)
        pal = np.array(
            [
                [(d * 17 + j * 41) % 256, (d * 29 + j * 53) % 256, (d * 7 + j * 11) % 256]
                for j in range(4)
            ],
            dtype=np.uint8,
        )
        idx0 = (np.add.outer(np.arange(8), np.arange(8)) + d) % 4
        frames = [pal[idx0], pal[(idx0 + 1) % 4]]
        src = np.concatenate([f.astype(np.float64).ravel() for f in frames])
        return fmt, encode_gif(frames, delays_cs=[5, 5]), src
    # wav: 120 deterministic int16 samples; decode_wav yields float64
    t = np.arange(120)
    samples = (((d * 7919 + t * t * 31 + t * 101) % 20011) - 10005).astype(np.int16)
    return fmt, encode_wav(samples, rate=8000, width=2), samples.astype(np.float64)


def expected_features(src: np.ndarray, n_features: int) -> list[float]:
    """The exact feature fold ``decode_and_featurize`` applies to the
    decoded array.  Thin alias over the canonical definition in
    :mod:`.media_features` (production code depends on that neutral
    module, never on this fixture module)."""
    return feature_fold(src, n_features)
