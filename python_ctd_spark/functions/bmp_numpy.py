"""Pure stdlib+NumPy BMP (Windows DIB) decoding — the third raster
format real crawls serve in volume after JPEG/PNG/GIF.

Clean-room from the public BITMAPFILEHEADER/BITMAPINFOHEADER layout:
'BM' magic, pixel-array offset at byte 10, a DIB header carrying
dimensions/bit-depth/compression, 4-byte-aligned BGR(A) rows stored
bottom-up (negative height = top-down).  Supported: uncompressed
(BI_RGB) 24/32-bit true color and 8-bit palettized; RLE and bitfield
compressions raise — the same honest-gate policy as the sibling
codecs.  Decoding is a NumPy reshape+slice, O(pixels), no Python loop.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a BMP byte string to an (H, W, 3) uint8 RGB array.

    Raises ``ValueError`` on malformed input or unsupported shapes
    (RLE/bitfields compression, bit depths other than 8/24/32)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (comp,) = struct.unpack("<I", data[30:34])
    if comp != 0:  # BI_RGB only
        raise ValueError(f"unsupported BMP compression {comp} "
                         "(RLE/bitfields need a real gate, not garbage)")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    if width <= 0 or height == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    top_down = height < 0
    height = abs(height)
    palette = None
    if bpp == 8:
        (n_colors,) = struct.unpack("<I", data[46:50])
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
        )
        if pal.size < 4 * n_colors:
            raise ValueError("truncated BMP palette")
        palette = pal.reshape(-1, 4)[:, [2, 1, 0]]  # BGRX -> RGB
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3  # rows pad to 4 bytes
    need = pix_off + stride * height
    if len(data) < need:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(
        data[pix_off : pix_off + stride * height], dtype=np.uint8
    ).reshape(height, stride)
    px = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    if not top_down:
        px = px[::-1]
    if bpp == 8:
        if int(px.max(initial=0)) >= palette.shape[0]:
            # the documented error contract is ValueError — a numpy
            # IndexError here would dodge image_ahash's per-row
            # quarantine and kill the whole task on one bad blob
            raise ValueError(
                f"BMP pixel index {int(px.max())} exceeds palette size "
                f"{palette.shape[0]}"
            )
        return np.ascontiguousarray(palette[px[:, :, 0]])
    return np.ascontiguousarray(px[:, :, [2, 1, 0]])  # BGR(A) -> RGB


def decode_ico(data: bytes) -> np.ndarray:
    """Decode the LARGEST image of an ICO container (favicons — a
    crawl-ubiquitous blob type) to an (H, W, C) uint8 array.

    Entries are either embedded PNGs (delegated to
    :func:`..png_numpy.decode_png`) or headerless DIBs: a
    BITMAPINFOHEADER whose height covers the XOR image PLUS the AND
    mask (doubled), no BITMAPFILEHEADER.  DIB entries are rebuilt into
    a standard BMP stream and decoded by :func:`decode_bmp` — one
    pixel path, two containers; the 1-bit AND mask is dropped
    (transparency is not brightness, same policy as PNG alpha in the
    hash pipeline)."""
    if len(data) < 6 or data[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO: bad header")
    (count,) = struct.unpack("<H", data[4:6])
    if count == 0:
        raise ValueError("ICO with no images")
    best = None
    for i in range(count):
        e = data[6 + 16 * i : 6 + 16 * (i + 1)]
        if len(e) < 16:
            raise ValueError("truncated ICO directory")
        w, h = e[0] or 256, e[1] or 256
        size, off = struct.unpack("<II", e[8:16])
        if best is None or w * h > best[0] * best[1]:
            best = (w, h, size, off)
    w, h, size, off = best
    body = data[off : off + size]
    if len(body) < size:
        raise ValueError("truncated ICO image data")
    if body[:8] == b"\x89PNG\r\n\x1a\n":
        from .png_numpy import decode_png

        return decode_png(body)
    # headerless DIB: height is doubled (XOR + AND mask); rebuild a BMP
    # with the true height and let decode_bmp do the pixel work
    if len(body) < 40:
        raise ValueError("truncated ICO DIB header")
    (hdr_size,) = struct.unpack("<I", body[:4])
    width, dheight = struct.unpack("<ii", body[4:12])
    # the doubled XOR+AND height halves by MAGNITUDE: a top-down ICO
    # DIB stores it negative, and keeping the doubled value there would
    # decode the 1-bit AND mask as pixel rows (ADVICE r13)
    true_h = dheight // 2 if dheight >= 0 else -((-dheight) // 2)
    fixed = (
        body[:4]
        + struct.pack("<ii", width, true_h)
        + body[12:]
    )
    pix_off = 14 + hdr_size
    bpp = struct.unpack("<H", body[14:16])[0]
    if bpp == 8:
        (n_colors,) = struct.unpack("<I", body[32:36])
        pix_off += 4 * (n_colors or 256)
    head = b"BM" + struct.pack("<IHHI", 14 + len(fixed), 0, 0, pix_off)
    return decode_bmp(head + fixed)


def encode_ico(img: np.ndarray) -> bytes:
    """Test-fixture encoder: one-entry ICO wrapping a 32-bit DIB of
    ``img`` (with an all-opaque AND mask, the doubled-height layout)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    h, w = img.shape[:2]
    if h > 256 or w > 256:
        raise ValueError("ICO entries cap at 256x256")
    bmp = encode_bmp(img, bpp=32)
    (pix_off,) = struct.unpack("<I", bmp[10:14])
    dib = bytearray(bmp[14:])
    # double the height field (XOR + AND) per the ICO DIB convention
    dib[4:12] = struct.pack("<ii", w, h * 2)
    mask_stride = ((w + 31) // 32) * 4  # 1-bit rows pad to 4 bytes
    dib += b"\x00" * (mask_stride * h)  # all-zero mask = fully opaque
    entry = struct.pack(
        "<BBBBHHII",
        w % 256, h % 256, 0, 0, 1, 32, len(dib), 6 + 16,
    )
    return b"\x00\x00\x01\x00\x01\x00" + entry + bytes(dib)


def encode_bmp(img: np.ndarray, bpp: int = 24) -> bytes:
    """Test-fixture encoder: (H, W)/(H, W, 3) uint8 -> BI_RGB BMP
    (bottom-up, 4-byte row padding; ``bpp=8`` writes a grayscale
    palette, 24/32 true color)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2) if bpp != 8 else img[:, :, None]
    h, w = img.shape[:2]
    if bpp == 8:
        if img.shape[2] != 1:
            img = img.mean(axis=2).astype(np.uint8)[:, :, None]
        palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
        stride = (w + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = img[::-1, :, 0]
        body = rows.tobytes()
        pix_off = 14 + 40 + 1024
    elif bpp in (24, 32):
        ch = bpp // 8
        bgr = img[:, :, [2, 1, 0]]
        if ch == 4:
            bgr = np.concatenate(
                [bgr, np.full((h, w, 1), 255, np.uint8)], axis=2
            )
        stride = (w * ch + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * ch] = bgr[::-1].reshape(h, w * ch)
        body = rows.tobytes()
        palette = b""
        pix_off = 14 + 40
    else:
        raise ValueError(f"bpp must be 8/24/32, got {bpp}")
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(body),
                       2835, 2835, 256 if bpp == 8 else 0, 0)
    head = b"BM" + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
    return head + info + palette + body
