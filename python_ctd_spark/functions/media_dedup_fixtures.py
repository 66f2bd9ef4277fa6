"""Deterministic audio/GIF near-dup fixtures — the other-modality
twins of :func:`.image_hash.make_image_blob`, backing the registered
``audio_dedup`` / ``gif_dedup`` driver rows and their kernel-golden
oracles (tools/make_golden.py computes expected fingerprints from the
PRE-ENCODE material these functions also return, so the driver row's
green proves the full codec round trip AND the banded join's
pigeonhole losslessness).

Same group/variant bit design as the image fixture, under
modality-specific md5 salts: ids share a 64-bit base pattern in groups
of :data:`GROUP_SIZE`; each variant flips <= 3 bits, so within-group
fingerprint Hamming distances are exactly the symmetric difference of
the flip sets and cross-group distances concentrate at ~32 (never
inside the near-dup band).
"""

from __future__ import annotations

import hashlib

import numpy as np

from .audio_hash import N_FRAMES
from .image_hash import GROUP_SIZE, _HI, _LO

#: samples per energy frame in the audio fixture (total 64 * 16 = 1024)
_FRAME_LEN = 16

#: frames per fixture GIF (two-frame animations keep the per-id-pair
#: match aggregate non-trivial without bloating the driver row)
GIF_FRAMES = 2


def _bits(salt: str, key: str) -> np.ndarray:
    """64 deterministic ~uniform bits (md5 of salt:key)."""
    dig = hashlib.md5(f"{salt}:{key}".encode()).digest()
    by = np.frombuffer(dig[:8], dtype=np.uint8)
    return ((by[:, None] >> np.arange(8)) & 1).ravel().astype(bool)


def _flips(salt: str, variant: int) -> list[int]:
    """Up to 3 bit indices this variant flips (variant 0 = the base)."""
    n = variant % 4
    return list(
        {
            int.from_bytes(
                hashlib.md5(f"{salt}:{variant}:{i}".encode()).digest()[:4],
                "big",
            )
            % 64
            for i in range(n)
        }
    )


def audio_fixture_bits(doc_id: int) -> np.ndarray:
    d = int(doc_id)
    bits = _bits("aud-base", str(d // GROUP_SIZE)).copy()
    for c in _flips("aud-flip", d % GROUP_SIZE):
        bits[c] = ~bits[c]
    return bits


def make_audio_blob(doc_id: int) -> tuple[bytes, np.ndarray]:
    """Return ``(wav_blob, source_samples_int16)`` for one id.

    Each of the 64 energy frames is a +-amplitude square wave — loud
    (:data:`..image_hash._HI`) where the id's bit pattern is set, quiet
    (``_LO``) elsewhere.  Frame powers are then two well-separated
    constants, so <= 3 flipped frames move the mean power by far less
    than the gap and ``energy_hash64`` recovers exactly the planted
    bits; int16 amplitudes make the WAV round trip bit-exact."""
    from .wav_numpy import encode_wav

    bits = audio_fixture_bits(doc_id)
    amps = np.where(bits, _HI, _LO).astype(np.int16)
    wave = np.tile(
        np.array([1, -1] * (_FRAME_LEN // 2), dtype=np.int16), (N_FRAMES, 1)
    )
    samples = (wave * amps[:, None]).ravel()
    return encode_wav(samples, rate=8000), samples


def gif_fixture_frames(doc_id: int) -> list[np.ndarray]:
    """The PRE-ENCODE (16, 16, 3) uint8 frames for one id: per-frame
    base patterns (so the two frames of one animation differ), one
    variant flip set applied to EVERY frame (so within-group per-frame
    Hamming distances equal the flip-set symmetric difference at every
    frame index)."""
    d = int(doc_id)
    group, variant = d // GROUP_SIZE, d % GROUP_SIZE
    flips = _flips("gif-flip", variant)
    frames = []
    for f in range(GIF_FRAMES):
        bits = _bits("gif-base", f"{group}:{f}").copy()
        for c in flips:
            bits[c] = ~bits[c]
        cells = np.where(bits, _HI, _LO).astype(np.uint8).reshape(8, 8)
        gray = np.repeat(np.repeat(cells, 2, axis=0), 2, axis=1)
        frames.append(np.repeat(gray[:, :, None], 3, axis=2))
    return frames


def make_gif_blob(doc_id: int) -> tuple[bytes, list[np.ndarray]]:
    """Return ``(gif_blob, source_frames)`` for one id (animated GIF89a
    through the repo's stdlib encoder; palette round trip is exact)."""
    from .gif_numpy import encode_gif

    frames = gif_fixture_frames(doc_id)
    return encode_gif(frames, delays_cs=[10] * len(frames)), frames
