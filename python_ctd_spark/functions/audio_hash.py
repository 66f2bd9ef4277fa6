"""Audio perceptual fingerprint: a 64-bit frame-energy signature.

The audio analog of :func:`.image_hash.ahash64`: split the mono sample
stream into 64 equal-length frames, take each frame's mean power, and
set bit ``i`` when frame ``i``'s power exceeds the mean power across
frames.  The comparison is against the clip's own mean, so the hash is
invariant under amplitude scaling — EXACTLY for power-of-two gains
(scaling is then lossless in float64), and up to float rounding ties
otherwise (a frame whose power sits within ~1 ulp of the cross-frame
mean can flip under e.g. a 1.1x gain; near-ties are where any
threshold hash is fragile, and the Hamming band absorbs them).
Re-encoded or volume-normalized copies of a clip collide or land a
bit or two apart, while different material lands ~32 bits apart.
Packed by :func:`.image_hash.pack_bits64` into the same signed int64
shape as the image/text hashes so the shared banded Hamming join
(:func:`..operators.dedup.banded_hamming_pairs`) serves all three
modalities.
"""

from __future__ import annotations

import numpy as np

from .image_hash import pack_bits64

N_FRAMES = 64


def energy_hash64(samples: np.ndarray) -> int:
    """64-bit frame-energy fingerprint of a mono sample stream.

    Frames are the 64 equal slices of the first ``64 * (n // 64)``
    samples (the sub-frame tail is ignored — it cannot fill a frame).
    Needs at least 64 samples; raises below that (a fingerprint of
    near-empty audio is noise, and dedup must fail loudly —
    ``decode_png``'s contract).
    """
    x = np.asarray(samples, dtype=np.float64).ravel()
    n = x.shape[0]
    if n < N_FRAMES:
        raise ValueError(f"need >= {N_FRAMES} samples, got {n}")
    flen = n // N_FRAMES
    frames = x[: N_FRAMES * flen].reshape(N_FRAMES, flen)
    power = (frames * frames).mean(axis=1)
    return pack_bits64(power > power.mean())
