"""Pure stdlib+NumPy GIF decoder/encoder (GIF87a/GIF89a).

Implements the public GIF specification (CompuServe GIF89a, 1990; the
same format documented in W3C's "Graphics Interchange Format" note) from
scratch: logical screen descriptor, global/local color tables, graphic
control extensions (delay, transparency, disposal), interlacing, and the
variable-code-width LZW used for image data.  No PIL/ffmpeg — this is
the video-frame analog of ``png_numpy``/``wav_numpy``: an animated GIF
is the one real multi-frame format decodable with the stdlib alone, so
``multimodal.frame_sample(fake=False)`` can sample REAL frames.

The encoder exists for tests (round-trips) and emits the classic
"uncompressed" LZW stream — literal codes with a CLEAR before the code
width would grow — which every conforming decoder (including this one)
accepts.

Reference parity note: the reference library has no media surface; this
module supports the engine's multimodal extension (SURVEY.md §2.10).
"""

from __future__ import annotations

import struct

import numpy as np

_HEADERS = (b"GIF87a", b"GIF89a")


class _BitReader:
    """LSB-first bit reader over the concatenated LZW data bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # bit position
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("GIF: LZW stream truncated")
        out = 0
        for i in range(n):
            byte = self.data[(self.pos + i) >> 3]
            bit = (byte >> ((self.pos + i) & 7)) & 1
            out |= bit << i
        self.pos += n
        return out


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """GIF variable-width LZW: codes grow 1 bit when the dictionary
    fills the current width, capped at 12 bits; CLEAR resets."""
    clear = 1 << min_code_size
    end = clear + 1
    reader = _BitReader(data)
    code_size = min_code_size + 1
    base = [(i,) for i in range(clear)]
    table: list[tuple] = []
    prev: tuple | None = None
    out: list[int] = []

    def reset():
        nonlocal table, code_size, prev
        table = base + [(), ()]
        code_size = min_code_size + 1
        prev = None

    reset()
    while len(out) < n_pixels:
        code = reader.read(code_size)
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if code < len(table) and (code < clear or code > end):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF: bad LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out[:n_pixels]


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: rows arrive as passes (0::8, 4::8, 2::4,
    1::2); put them back in display order."""
    h = rows.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(data: bytes):
    """Decode a GIF into ``(frames, delays_cs)``: a list of full-canvas
    ``(H, W, 3) uint8`` RGB arrays (frames composited per the disposal
    rules — draw-over, restore-background, restore-previous) and the
    per-frame delays in centiseconds (0 when absent)."""
    try:
        return _decode_gif(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"GIF: truncated or malformed stream ({exc})") from exc


def _decode_gif(data: bytes):
    if len(data) < 13 or data[:6] not in _HEADERS:
        raise ValueError("not a GIF (missing GIF87a/GIF89a header)")
    width, height = struct.unpack("<HH", data[6:10])
    packed, bg_idx, _aspect = data[10], data[11], data[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    bg_fill = canvas[0, 0].copy() if height and width else np.zeros(3, np.uint8)

    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                gce = data[pos + 1 : pos + 1 + size]
                disposal = (gce[0] >> 2) & 0x07
                delay = struct.unpack("<H", gce[1:3])[0]
                transparent = gce[3] if (gce[0] & 1) else None
                pos += 1 + size
            # skip any remaining sub-blocks (and the whole body of
            # comment/application/plain-text extensions)
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        # image descriptor
        left, top, w, h = struct.unpack("<HHHH", data[pos : pos + 8])
        if left + w > width or top + h > height:
            # without this the compositing assignment below dies on a
            # raw numpy broadcast error instead of a labeled diagnostic
            raise ValueError("GIF: frame rect outside logical screen")
        ipacked = data[pos + 8]
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF: image without any color table")
        min_code_size = data[pos]
        pos += 1
        chunks = []
        while data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.array(
            _lzw_decode(b"".join(chunks), min_code_size, w * h), dtype=np.int32
        ).reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if idx.max(initial=0) >= len(ct):
            raise ValueError("GIF: pixel index outside color table")
        rgb = ct[idx]

        before = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:  # restore to background
            canvas[top : top + h, left : left + w] = bg_fill
        elif disposal == 3 and before is not None:  # restore to previous
            canvas = before
        disposal, delay, transparent = 0, 0, None

    if not frames:
        raise ValueError("GIF: no image frames")
    return frames, delays


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, code: int, n: int) -> None:
        for i in range(n):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                byte |= bit << j
            out.append(byte)
        return bytes(out)


def _lzw_encode_uncompressed(indices: np.ndarray, min_code_size: int) -> bytes:
    """The classic 'uncompressed GIF' stream: every pixel as a literal
    code at width min_code_size+1, with a CLEAR whenever enough codes
    have passed that a conforming decoder's table would force the next
    width — so the width never grows."""
    clear = 1 << min_code_size
    end = clear + 1
    w = _BitWriter()
    width = min_code_size + 1
    w.write(clear, width)
    # after CLEAR the decoder table holds `clear + 2` codes; each literal
    # appends one once a previous code exists, so after `budget` literals
    # the table reaches 2^width and the decoder would widen
    budget = (1 << width) - clear - 2
    count = 0
    for v in indices.ravel().tolist():
        w.write(int(v), width)
        count += 1
        if count >= budget:
            w.write(clear, width)
            count = 0
    w.write(end, width)
    return w.tobytes()


def encode_gif(
    frames,
    delays_cs=None,
    interlace: bool = False,
    transparent_index: int | None = None,
    disposal: int = 0,
) -> bytes:
    """Encode ``(H, W, 3) uint8`` frames as an animated GIF89a with one
    global color table built from the distinct colors (<= 256 across all
    frames).  Test/round-trip encoder — uncompressed LZW."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    n_ct = 1 << bits
    table = np.zeros((n_ct, 3), dtype=np.uint8)
    table[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors.tolist())}

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])
    out += table.tobytes()
    min_code_size = max(2, bits)
    for fi, frame in enumerate(frames):
        if delays_cs is not None or transparent_index is not None or disposal:
            delay = 0 if delays_cs is None else int(delays_cs[fi])
            packed = (disposal & 0x07) << 2
            tr = 0
            if transparent_index is not None:
                packed |= 1
                tr = transparent_index
            out += bytes([0x21, 0xF9, 4, packed])
            out += struct.pack("<H", delay)
            out += bytes([tr, 0])
        out += bytes([0x2C])
        out += struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlace else 0x00])
        idx = np.array(
            [lut[tuple(px)] for px in frame.reshape(-1, 3).tolist()], dtype=np.int32
        ).reshape(h, w)
        if interlace:
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            idx = idx[order]
        out += bytes([min_code_size])
        stream = _lzw_encode_uncompressed(idx, min_code_size)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)
