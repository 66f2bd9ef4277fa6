"""Pure stdlib+NumPy PNG decoding — no PIL in this environment.

PNG is the one raster format fully decodable with ``zlib`` + array math:
chunk walk -> IDAT inflate -> per-scanline un-filter (the five filter
types of the PNG spec §9) -> (H, W, C) uint8 array.  This removes the
``fake=True`` asterisk from the image path of
:mod:`python_ctd_spark.operators.multimodal`; JPEG/audio/video stay
honestly codec-gated.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA); both non-interlaced and Adam7-interlaced
(spec §8.2 — seven filtered sub-images placed on the pixel lattice,
r13) layouts.  Un-filtering is O(pixels) with per-scanline NumPy ops
(Sub and Paeth carry a sequential dependency along the line, walked
per byte; fine for the feature-extraction batch sizes this backs).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


#: Adam7 pass lattice: (x_start, y_start, x_step, y_step) per pass
#: (PNG spec §8.2 — published reference material)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter(raw: bytes, off: int, height: int, stride: int,
              ch: int) -> tuple[np.ndarray, int]:
    """Reconstruct ``height`` scanlines of ``stride`` bytes starting at
    ``raw[off]`` (each prefixed by its filter-type byte, spec §9);
    returns ``(array, next_offset)`` so Adam7 passes chain through one
    inflate buffer."""
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.intp)
    for y in range(height):
        if off + 1 + stride > len(raw):
            raise ValueError("decompressed size mismatch")
        ftype = raw[off]
        line = np.frombuffer(raw[off + 1 : off + 1 + stride], dtype=np.uint8).astype(
            np.intp
        )
        off += 1 + stride
        if ftype == 0:  # None
            recon = line
        elif ftype == 1:  # Sub
            recon = line.copy()
            for i in range(ch, stride):
                recon[i] = (recon[i] + recon[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            recon = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            recon = line.copy()
            for i in range(stride):
                left = recon[i - ch] if i >= ch else 0
                recon[i] = (recon[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = line.copy()
            for i in range(stride):
                left = int(recon[i - ch]) if i >= ch else 0
                up = int(prev[i])
                ul = int(prev[i - ch]) if i >= ch else 0
                recon[i] = (recon[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    return out, off


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to an (H, W, C) uint8 array
    (non-interlaced or Adam7).

    Raises ``ValueError`` on malformed input or unsupported shapes
    (bit depth != 8).
    """
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (8 only)")
    if interlace not in (0, 1):
        raise ValueError(f"unknown interlace method {interlace}")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported color type {color}")
    ch = _CHANNELS[color]

    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # bit-rot in a crawled blob must surface as the module's ONE
        # error type (ADVICE r13): a raw zlib.error would escape the
        # ValueError-only strict=False quarantine in media_dedup and
        # kill the task the quarantine exists to survive
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    stride = width * ch
    if interlace == 0:
        if len(raw) != height * (stride + 1):
            raise ValueError("decompressed size mismatch")
        out, _ = _unfilter(raw, 0, height, stride, ch)
        img = out.reshape(height, width, ch)
    else:
        # Adam7: seven independently-filtered sub-images, placed on
        # the (y0 + ky*dy, x0 + kx*dx) lattice; empty passes are
        # absent from the stream
        img = np.zeros((height, width, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(width - x0) // dx) if width > x0 else 0
            ph = -(-(height - y0) // dy) if height > y0 else 0
            if pw == 0 or ph == 0:
                continue
            sub, off = _unfilter(raw, off, ph, pw * ch, ch)
            img[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
        if off != len(raw):
            raise ValueError("decompressed size mismatch")
    if color == 3:
        if palette is None:
            raise ValueError("palette image without PLTE chunk")
        img = palette[img[:, :, 0]]
    return img


def encode_png_gray(img: np.ndarray, interlace: bool = False) -> bytes:
    """Minimal PNG encoder (8-bit grayscale or RGB, filter 0; optional
    Adam7 interlacing — the decoder's lattice run in reverse) — enough
    to build self-contained test fixtures without PIL."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, int(interlace))
    if not interlace:
        raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            parts.extend(b"\x00" + sub[y].tobytes()
                         for y in range(sub.shape[0]))
        raw = b"".join(parts)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_area(img: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    """Deterministic NumPy image resize: exact box-mean (area average)
    when downscaling — every source pixel contributes to exactly one
    target box, computed via an integral image — and nearest-neighbor
    when any axis upscales.  No PIL; pairs with :func:`decode_png` /
    :func:`encode_png_gray` to make blob->blob thumbnailing real."""
    if target_h < 1 or target_w < 1:
        raise ValueError(f"target must be >= 1x1, got {target_h}x{target_w}")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if target_h > h or target_w > w:
        ys = (np.arange(target_h) * h) // target_h
        xs = (np.arange(target_w) * w) // target_w
        return img[ys][:, xs]
    ys = (np.arange(target_h + 1) * h) // target_h
    xs = (np.arange(target_w + 1) * w) // target_w
    ii = np.zeros((h + 1, w + 1, c), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(img.astype(np.float64), axis=0), axis=1)
    a = ii[ys[1:][:, None], xs[1:][None, :]]
    b = ii[ys[:-1][:, None], xs[1:][None, :]]
    d = ii[ys[1:][:, None], xs[:-1][None, :]]
    e = ii[ys[:-1][:, None], xs[:-1][None, :]]
    area = ((ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]).astype(
        np.float64
    )[:, :, None]
    return np.rint((a - b - d + e) / area).clip(0, 255).astype(np.uint8)
