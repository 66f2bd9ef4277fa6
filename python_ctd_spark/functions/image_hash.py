"""Perceptual image hashing (average-hash) + the deterministic image
fixture shared by the Spark query ``image_dedup`` and its kernel-golden
oracle (``tools/make_golden.py``).

aHash is the standard cheap perceptual fingerprint: mean-pool the
grayscale image to ``hash_size x hash_size`` cells, threshold each cell
against the pooled mean, pack the bits row-major into a 64-bit integer.
Two images whose hashes sit within a small Hamming distance are
near-duplicates under global brightness/contrast-preserving edits —
the image twin of SimHash on text, and deliberately packed into the
SAME signed-int64 shape so the banded Hamming join
(:mod:`..operators.media_dedup`) works identically.

The fixture mirrors :mod:`.media_fixtures`: every ``doc_id`` maps to
exactly one 16x16 grayscale PNG whose content is a pure function of the
id.  Ids share a base pattern in groups of :data:`GROUP_SIZE`; each
variant flips up to 3 of the 64 pooled cells with full contrast, so
within-group hashes sit a few bits apart (true near-dups) while
cross-group hashes are md5-independent (expected Hamming ~32).  The
builder returns the *pre-encode* pixel raster alongside the blob, so
the golden oracle hashes the source pixels while the Spark side must
round-trip the blob through the real PNG decoder to match.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .png_numpy import encode_png_gray

#: ids d and d' share a base pattern iff d // GROUP_SIZE == d' // GROUP_SIZE
GROUP_SIZE = 16

#: fixture geometry: 16x16 pixels = 8x8 pooled cells of 2x2
_SIDE = 16

_LO, _HI = 40, 200


def pack_bits64(bits) -> int:
    """Pack 64 booleans (bit ``i`` -> position ``i``) into a SIGNED
    int64 — bit 63 wraps to the sign bit so the value round-trips
    through an int64 column exactly.  The load-bearing packing shared
    by every modality's fingerprint (image aHash here, the audio
    frame-energy hash in :mod:`.audio_hash`) so all of them feed the
    one banded Hamming join."""
    val = 0
    for i in range(64):
        if bits[i]:
            val |= 1 << i
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def ahash64(gray: np.ndarray, hash_size: int = 8) -> int:
    """Average-hash of a 2-D grayscale array as a SIGNED 64-bit int.

    Mean-pool to ``hash_size x hash_size`` (the input sides must be
    multiples of ``hash_size`` — at pipeline scale, resize first with
    ``operators.multimodal.resize_image``), threshold each cell against
    the mean of the pooled grid (strict ``>``), pack bits row-major
    (cell ``i`` -> bit ``i``).  Bit 63 wraps to the sign bit so the
    value round-trips through an int64 column exactly.
    """
    if hash_size * hash_size != 64:
        raise ValueError(f"only 64-bit hashes supported, got hash_size={hash_size}")
    g = np.asarray(gray, dtype=np.float64)
    if g.ndim == 3:
        if g.shape[2] != 1:
            raise ValueError(f"expected grayscale, got {g.shape[2]} channels")
        g = g[:, :, 0]
    h, w = g.shape
    if h % hash_size or w % hash_size:
        raise ValueError(
            f"image sides ({h}x{w}) must be multiples of hash_size={hash_size}"
        )
    bh, bw = h // hash_size, w // hash_size
    pooled = g.reshape(hash_size, bh, hash_size, bw).mean(axis=(1, 3))
    return pack_bits64((pooled > pooled.mean()).ravel())


def _base_bits(group: int) -> np.ndarray:
    """64 deterministic ~uniform bits for a group's base pattern (md5 of
    the group id — independent across groups, so cross-group Hamming
    concentrates at ~32 and never lands inside a near-dup band)."""
    dig = hashlib.md5(f"img-base:{group}".encode()).digest()
    by = np.frombuffer(dig[:8], dtype=np.uint8)
    return ((by[:, None] >> np.arange(8)) & 1).ravel().astype(bool)


def _flip_cells(variant: int) -> list[int]:
    """Up to 3 cell indices this variant flips (md5-placed; collisions
    just mean fewer flips).  variant 0 flips nothing — the group base."""
    n = variant % 4
    return list(
        {
            int.from_bytes(
                hashlib.md5(f"img-flip:{variant}:{i}".encode()).digest()[:4], "big"
            )
            % 64
            for i in range(n)
        }
    )


def make_image_blob(doc_id: int) -> tuple[bytes, np.ndarray]:
    """Return ``(png_blob, source_pixels_uint8)`` for one id.

    The raster is 64 full-contrast 2x2 cells (``_LO``/``_HI``), so every
    flip moves the pooled cell across any threshold the <=3 flipped
    cells can shift the mean by (<=7.5 gray levels vs an 80-level
    margin) — within-group Hamming distances are exactly the symmetric
    difference of the variants' flip sets.
    """
    d = int(doc_id)
    bits = _base_bits(d // GROUP_SIZE).copy()
    for c in _flip_cells(d % GROUP_SIZE):
        bits[c] = ~bits[c]
    cells = np.where(bits, _HI, _LO).astype(np.uint8).reshape(8, 8)
    px = np.repeat(np.repeat(cells, _SIDE // 8, axis=0), _SIDE // 8, axis=1)
    return encode_png_gray(px), px
