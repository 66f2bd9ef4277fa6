"""Pure stdlib+NumPy baseline JPEG codec — no PIL in this environment.

Web crawls are dominantly JPEG, so the media family's honest
``NotImplementedError`` guard for it was the first wall a crawl user
hit (VERDICT r11, "What's missing #1").  This module removes it the
same way :mod:`.png_numpy` / :mod:`.gif_numpy` did for their formats:
a clean-room implementation of the PUBLIC spec (ITU-T T.81, baseline
sequential DCT, Huffman entropy coding; JFIF color conventions), built
from the spec's own constants — the Annex K quantization and Huffman
tables and the libjpeg quality-scaling convention are published
reference material.

Decoder supports the overwhelmingly common crawl shape: baseline SOF0,
8-bit, 1 or 3 components, any sampling factors (4:4:4, 4:2:2, 4:2:0),
restart intervals.  Progressive (SOF2) and arithmetic coding raise
``ValueError`` — honest capability edges, same policy as png_numpy's
interlace guard.

Encoder (for fixtures and round-trip tests) writes baseline 4:4:4
JFIF with the standard tables; ``quality=100`` keeps every quantizer
at 1 so encode->decode errors are IDCT rounding only (a few counts per
sample) — the property the round-trip tests pin.

Per-block Huffman coding walks Python loops (entropy decode is
inherently sequential); the DCT/IDCT/color math is batched NumPy over
all blocks at once.  Fine for the Arrow-batch image sizes this backs —
the hash input is an 8x8 pooled raster, not a megapixel render.
"""

from __future__ import annotations

import struct

import numpy as np

# -- spec constants (ITU-T T.81 Annex K) --------------------------------

#: zig-zag order: index i of the scan -> (row, col) flat index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

#: Annex K.1 luminance / K.2 chrominance quantization tables (natural
#: row-major order)
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

#: Annex K.3 typical Huffman tables as (BITS[1..16], HUFFVAL)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# 8x8 orthonormal DCT-II matrix: dct2(B) = C @ B @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the spec's canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(
    bits: tuple[int, ...], vals: tuple[int, ...]
) -> tuple[list, dict]:
    """Two-level decode structure, cached per canonical table (tables
    repeat across blobs — every JFIF writer ships Annex K): a 256-slot
    primary LUT resolves codes of <= 8 bits (the overwhelming
    majority) in ONE peek+lookup; longer codes fall back to a
    (length, code) dict walk.  This is what makes entropy decode
    ~symbol-cost instead of ~bit-cost in Python."""
    primary: list = [None] * 256
    overflow: dict[tuple[int, int], int] = {}
    for sym, (code, length) in _canonical_codes(list(bits), list(vals)).items():
        if length <= 8:
            base = code << (8 - length)
            for k in range(1 << (8 - length)):
                primary[base + k] = (sym, length)
        else:
            overflow[(length, code)] = sym
    return primary, overflow


_DECODE_TABLE_CACHE: dict[tuple, tuple[list, dict]] = {}
#: cap-and-clear bound: non-optimizing encoders all ship Annex K (a
#: handful of entries), but libjpeg -optimize emits PER-IMAGE tables —
#: an unbounded cache on a long-lived worker decoding millions of
#: distinct crawl JPEGs would grow without limit
_DECODE_TABLE_CACHE_MAX = 1024


def _decode_table_cached(bits: list[int], vals: list[int]) -> tuple[list, dict]:
    key = (tuple(bits), tuple(vals))
    t = _DECODE_TABLE_CACHE.get(key)
    if t is None:
        if len(_DECODE_TABLE_CACHE) >= _DECODE_TABLE_CACHE_MAX:
            _DECODE_TABLE_CACHE.clear()
        t = _DECODE_TABLE_CACHE[key] = _decode_table(key[0], key[1])
    return t


def _entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split the entropy-coded stream starting at ``pos`` into
    UNSTUFFED byte segments separated by RSTn markers (restart points
    are byte-aligned, so each interval decodes independently).  Doing
    the 0xFF00 unstuffing once up front lets the bit reader run
    branch-free.  Also returns the offset of the marker that ENDED the
    scan (or ``len(data)``), so a multi-scan file — sequential
    per-component scans or any progressive file — can resume the
    marker loop there and decode the NEXT scan (the r12 silent-wrong
    bug: returning after the first SOS dropped scans 2..n)."""
    segs: list[bytes] = []
    start = i = pos
    n = len(data)
    end = n
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            segs.append(data[start:n])
            break
        m = data[j + 1]
        if m == 0x00:
            i = j + 2  # stuffed data byte
            continue
        if m == 0xFF:
            # 0xFF FILL byte before a marker (T.81 B.1.1.2 allows any
            # number) — re-examine from the second 0xFF; the fill stays
            # in the segment tail, past the bit padding, never read
            i = j + 1
            continue
        segs.append(data[start:j])
        if 0xD0 <= m <= 0xD7:  # restart marker: next segment
            start = i = j + 2
            continue
        end = j
        break  # a real marker (EOI / next header) ends the scan
    return [s.replace(b"\xff\x00", b"\xff") for s in segs], end


class _FastBits:
    """MSB-first bit reader over one unstuffed entropy segment.
    peek/skip pairs cost O(1); reads past the end pad with 1-bits (the
    spec's fill), which can never resolve to a valid code at a correct
    boundary, so truncation surfaces as the invalid-code ValueError."""

    __slots__ = ("d", "pos", "acc", "nbits")

    def __init__(self, d: bytes):
        self.d = d
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _need(self, k: int) -> None:
        d, pos, acc, nb = self.d, self.pos, self.acc, self.nbits
        nd = len(d)
        while nb < k:
            acc = (acc << 8) | (d[pos] if pos < nd else 0xFF)
            pos += 1
            nb += 8
        self.pos, self.acc, self.nbits = pos, acc, nb

    def peek(self, k: int) -> int:
        if self.nbits < k:
            self._need(k)
        return (self.acc >> (self.nbits - k)) & ((1 << k) - 1)

    def take(self, k: int) -> int:
        if self.nbits < k:
            self._need(k)
        self.nbits -= k
        v = (self.acc >> self.nbits) & ((1 << k) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def skip(self, k: int) -> None:
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1


def _huff_decode(r: _FastBits, table: tuple[list, dict]) -> int:
    primary, overflow = table
    e = primary[r.peek(8)]
    if e is not None:
        r.skip(e[1])
        return e[0]
    for length in range(9, 17):
        sym = overflow.get((length, r.peek(length)))
        if sym is not None:
            r.skip(length)
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    """DIFF/AC magnitude decode (spec F.2.2.1 EXTEND)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a JPEG byte string to an (H, W, C) uint8 array (C = 1
    grayscale, 3 RGB).  Supports baseline sequential SOF0/1 —
    interleaved or one-scan-per-component — AND progressive SOF2
    (spectral selection + successive approximation, DC and AC
    refinement scans, EOB runs), i.e. the full Huffman-coded 8-bit
    family real crawls contain.

    Raises ``ValueError`` on malformed input or unsupported shapes
    (lossless SOF3, arithmetic coding, 12-bit precision, >3
    components) — ValueError is the WHOLE error contract: truncated
    segments and dangling table references (IndexError/KeyError/
    struct.error internally) are converted, so upstream "filter
    decodable rows" patterns catching ValueError never leak a
    task-killing exception class.
    """
    try:
        return _decode_jpeg_impl(data)
    except ValueError:
        raise
    except (KeyError, IndexError, struct.error) as exc:
        raise ValueError(
            f"malformed JPEG: {type(exc).__name__}: {exc}"
        ) from exc


def _decode_jpeg_impl(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (H, W, comps) where comps = [(cid, h, v, tq)]
    progressive = False
    restart_interval = 0
    coef = None  # per-component MCU-padded zig-zag coefficient arrays
    n_scans = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # FILL bytes — a multi-scan file with fill before its second
        # SOS must not mis-read the fill as the marker id (and then
        # eat the real SOS as a bogus segment length)
        while pos + 2 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # parameterless
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq_id = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    raise ValueError("16-bit quantizers unsupported")
                tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                qt[tq_id] = tbl  # zig-zag order
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _decode_table_cached(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * c]))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline-sequential and progressive (Huffman) "
                "JPEG supported (lossless/arithmetic/hierarchical "
                "raise — same honesty policy as png_numpy's "
                "interlace guard)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_sel = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                tables = seg[2 + 2 * c]
                scan_sel.append((cs, tables >> 4, tables & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            if coef is None:
                coef = _alloc_coef(frame)
            pos = _decode_scan(
                data, pos + seglen, frame, coef, scan_sel, huff_dc,
                huff_ac, restart_interval, progressive, ss, se, ah, al,
            )
            n_scans += 1
            continue
        pos += seglen
    if n_scans == 0:
        raise ValueError("no SOS marker found")
    return _reconstruct(frame, coef, qt)


def _alloc_coef(frame) -> list[np.ndarray]:
    """Per-component MCU-padded quantized-coefficient planes (zig-zag
    order) — the accumulation target every scan of a multi-scan or
    progressive file writes into."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    return [
        np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int32)
        for (_, ch, cv, _) in comps
    ]


def _blocks_of_scan(frame, scan_sel, order):
    """Yield one UNIT per restart-accounting step: the ``(comp_idx,
    block_y, block_x, dc_table, ac_table)`` tuples it codes.  An
    interleaved scan's unit is the MCU (h x v blocks per component,
    padding blocks included); a NON-interleaved scan's unit is a
    single data unit of its one component, raster order over that
    component's OWN block grid (T.81 A.2.2 — ceil(comp dim / 8), NOT
    the MCU-padded grid: padding blocks are never coded), which is
    what makes per-component sequential scans and progressive AC
    scans frame-accurate."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if len(scan_sel) == 1:
        cs, tdc, tac = scan_sel[0]
        c = order[cs]
        _, ch, cv, _ = comps[c]
        cw = -(-(w * ch) // hmax)  # ceil(w * ch / hmax)
        chh = -(-(h * cv) // vmax)
        bw = -(-cw // 8)
        bh = -(-chh // 8)
        for by in range(bh):
            for bx in range(bw):
                yield ((c, by, bx, tdc, tac),)
    else:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            unit = []
            for cs, tdc, tac in scan_sel:
                c = order[cs]
                _, ch, cv, _ = comps[c]
                for by in range(cv):
                    for bx in range(ch):
                        unit.append((c, my * cv + by, mx * ch + bx, tdc, tac))
            yield unit


def _decode_scan(data, pos, frame, coef, scan_sel, huff_dc, huff_ac,
                 dri, progressive, ss, se, ah, al) -> int:
    """Decode ONE scan's entropy data into ``coef`` and return the
    offset of the marker that ended it (multi-scan files resume the
    marker loop there)."""
    order = {cid: i for i, (cid, _, _, _) in enumerate(frame[2])}
    segs, end = _entropy_segments(data, pos)
    if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("bad spectral selection in a sequential scan")
    if progressive and ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if progressive and ss > 0 and (len(scan_sel) != 1 or se < ss or se > 63):
        raise ValueError("progressive AC scan must be one component, "
                         "1 <= Ss <= Se <= 63")
    seg_idx = 0
    r = _FastBits(segs[0])
    pred: dict[int, int] = {}
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    units = 0
    for unit in _blocks_of_scan(frame, scan_sel, order):
        if dri and units and units % dri == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart marker")
            r = _FastBits(segs[seg_idx])
            pred = {}
            eobrun = 0
        units += 1
        for c, by, bx, tdc, tac in unit:
            blk = coef[c][by, bx]
            if not progressive:
                # DC
                s = _huff_decode(r, huff_dc[tdc])
                diff = _extend(r.take(s), s) if s else 0
                pred[c] = pred.get(c, 0) + diff
                blk[0] = pred[c]
                # AC
                k = 1
                while k < 64:
                    sym = _huff_decode(r, huff_ac[tac])
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0:
                        if run != 15:
                            raise ValueError("bad AC symbol")
                        k += 16  # ZRL
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC run past block end")
                    blk[k] = _extend(r.take(size), size)
                    k += 1
            elif ss == 0:
                if ah == 0:  # DC first: diff at successive-approx level
                    s = _huff_decode(r, huff_dc[tdc])
                    diff = _extend(r.take(s), s) if s else 0
                    pred[c] = pred.get(c, 0) + diff
                    blk[0] = pred[c] << al
                elif r.take(1):  # DC refinement: one appended bit
                    blk[0] |= p1
            elif ah == 0:  # AC first pass over band [ss, se]
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = _huff_decode(r, huff_ac[tac])
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0:
                        if run == 15:
                            k += 16  # ZRL
                            continue
                        eobrun = (1 << run) - 1  # EOBn: this block ends
                        if run:
                            eobrun += r.take(run)
                        break
                    k += run
                    if k > se:
                        raise ValueError("AC run past band end")
                    blk[k] = _extend(r.take(size), size) * p1
                    k += 1
            else:  # AC refinement pass (T.81 G.1.2.3)
                eobrun = _refine_ac(r, blk, huff_ac[tac], ss, se,
                                    p1, m1, eobrun)
    return end


def _refine_ac(r, blk, table, ss, se, p1, m1, eobrun) -> int:
    """One block of an AC successive-approximation refinement scan:
    every already-nonzero coefficient in the band receives ONE
    correction bit (add ``1 << Al`` toward larger magnitude when set,
    guarded against re-setting an already-present bit); newly-nonzero
    coefficients arrive as (run-of-zero-HISTORY, +/-1<<Al) symbols;
    ZRL passes over 16 zero-history positions; EOBn covers the rest of
    this block plus ``eobrun`` following blocks (their nonzero
    coefficients still consume correction bits)."""
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _huff_decode(r, table)
            run, size = sym >> 4, sym & 0x0F
            val = 0
            if size == 0:
                if run != 15:  # EOBn: INCLUDES this block — its
                    # remaining nonzero coefficients still consume
                    # correction bits (the loop below, which also
                    # decrements), unlike the first-pass convention
                    eobrun = 1 << run
                    if run:
                        eobrun += r.take(run)
                    break
                # ZRL: run stays 15 -> pass over 16 zero-history coeffs
            elif size == 1:
                val = p1 if r.take(1) else m1
            else:
                raise ValueError("AC refinement size must be 1")
            while k <= se:
                if blk[k] != 0:
                    if r.take(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB region: correction bits only
            if blk[k] != 0:
                if r.take(1) and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(frame, coef, qt) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    # dequantize + un-zigzag + IDCT, batched per component
    planes = []
    for c, (_, ch, cv, tq_id) in enumerate(comps):
        q = qt[tq_id].astype(np.int32)  # zig-zag order
        blocks = coef[c].reshape(-1, 64) * q[None, :]
        nat = np.zeros_like(blocks)
        nat[:, ZIGZAG] = blocks
        nat = nat.reshape(-1, 8, 8).astype(np.float64)
        px = np.einsum("ij,njk,kl->nil", _C.T, nat, _C) + 128.0
        by, bx = coef[c].shape[0], coef[c].shape[1]
        plane = (
            px.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # upsample to full MCU grid, then crop to the image
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        planes.append(plane[:h, :w])
    out = np.stack(planes, axis=-1)
    if len(comps) == 3:
        y, cb, cr = out[..., 0], out[..., 1] - 128.0, out[..., 2] - 128.0
        out = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# -- encoder -------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg's published quality->table scaling; 100 -> all-ones
    (near-lossless: residual error is IDCT rounding only)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def sc(base):
        t = (base * scale + 50) // 100
        return np.clip(t, 1, 255).astype(np.int32)
    return sc(QUANT_LUM), sc(QUANT_CHROM)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(
    w: _BitWriter, blk: np.ndarray, pred: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    """Huffman-encode one zig-zagged quantized block; returns new DC."""
    dc = int(blk[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_codes[s]
    w.write(code, length)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
    k = 1
    while k <= last_nz:
        run = 0
        while blk[k] == 0:
            run += 1
            k += 1
        while run >= 16:
            code, length = ac_codes[0xF0]
            w.write(code, length)
            run -= 16
        v = int(blk[k])
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        k += 1
    if last_nz < 63:
        code, length = ac_codes[0x00]
        w.write(code, length)
    return dc


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
    interleave: bool = True,
) -> bytes:
    """Encode an (H, W) gray or (H, W, 3) RGB uint8 array as JFIF with
    the Annex K tables scaled by ``quality``.

    ``subsampling='420'`` emits the 2x2-chroma-subsampled layout real
    crawl JPEGs overwhelmingly use (Y sampling 2,2; box-mean chroma);
    ``restart_interval=N`` inserts DRI/RSTn markers every N units
    (MCUs interleaved, data units otherwise); ``interleave=False``
    writes baseline as ONE SEQUENTIAL SCAN PER COMPONENT (the legal
    multi-SOS layout the r12 decoder silently mis-decoded — ADVICE
    r12); ``progressive=True`` writes SOF2 with a spectral-selection +
    successive-approximation scan script (interleaved DC first/refine,
    per-component AC bands 1-5 and 6-63 at Al=1 then their refinement
    to Al=0) using the standard tables, with EOB runs capped at one
    block (always legal; the standard AC tables carry no EOBn>0
    codes).  All of these exist mainly so the DECODER's scan paths are
    exercised by round-trip tests without a foreign encoder in the
    environment — decoding any of them at quality=100 must reproduce
    the baseline-interleaved pixels bit-for-bit, since all layouts
    carry the same quantized coefficients."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("expected (H, W), (H, W, 1) or (H, W, 3) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w, nc = img.shape
    ql, qc = _quality_tables(quality)
    f = img.astype(np.float64)
    sub = subsampling == "420" and nc == 3
    if nc == 3:
        r_, g_, b_ = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = 128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
        cr = 128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
        if sub:
            def box2(p):
                ph2, pw2 = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
                p = np.pad(p, ((0, ph2 - p.shape[0]), (0, pw2 - p.shape[1])),
                           mode="edge")
                return p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(
                    axis=(1, 3)
                )
            cb, cr = box2(cb), box2(cr)
        planes = [y, cb, cr]
        factors = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * 3
        qtabs = [ql, qc, qc]
        dcsel = [_DC_LUM, _DC_CHROM, _DC_CHROM]
        acsel = [_AC_LUM, _AC_CHROM, _AC_CHROM]
        tq_ids = [0, 1, 1]
        tsel = [0x00, 0x11, 0x11]
    else:
        planes = [f[..., 0]]
        factors = [(1, 1)]
        qtabs = [ql]
        dcsel = [_DC_LUM]
        acsel = [_AC_LUM]
        tq_ids = [0]
        tsel = [0x00]
    hmax = max(fc[0] for fc in factors)
    vmax = max(fc[1] for fc in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per component: pad to its MCU-grid size, block, DCT, quantize
    qblocks = []
    for plane, (ch, cv), q in zip(planes, factors, qtabs):
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        p = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        ) - 128.0
        by, bx = ph // 8, pw // 8
        blocks = (
            p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        dct = np.einsum("ij,njk,kl->nil", _C, blocks, _C.T).reshape(-1, 64)
        zz = dct[:, ZIGZAG]  # natural -> zig-zag
        qz = np.round(zz / q[None, :].astype(np.float64)).astype(np.int32)
        qblocks.append(qz.reshape(by, bx, 64))
    # headers
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    def dqt(tq_id, tbl):
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq_id]) + bytes(int(x) for x in tbl[ZIGZAG])
    out += dqt(0, ql)
    if nc == 3:
        out += dqt(1, qc)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nc))
    for c in range(nc):
        ch, cv = factors[c]
        sof += bytes([c + 1, (ch << 4) | cv, tq_ids[c]])
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    def dht(tc, th, table):
        bits, vals = table
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    out += dht(0, 0, _DC_LUM) + dht(1, 0, _AC_LUM)
    if nc == 3:
        out += dht(0, 1, _DC_CHROM) + dht(1, 1, _AC_CHROM)
    dc_codes = [_canonical_codes(*t) for t in dcsel]
    ac_codes = [_canonical_codes(*t) for t in acsel]
    frame = (h, w, [(c + 1, *factors[c], tq_ids[c]) for c in range(nc)])
    order = {c + 1: c for c in range(nc)}

    def emit_scan(scan_comps: list[int], ss: int, se: int,
                  ah: int, al: int) -> None:
        sos = bytearray([len(scan_comps)])
        for c in scan_comps:
            sos += bytes([c + 1, tsel[c]])
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
        scan_sel = [(c + 1, 0, 0) for c in scan_comps]
        wtr = _BitWriter()
        pred = [0] * nc
        rst = units = 0
        for unit in _blocks_of_scan(frame, scan_sel, order):
            if restart_interval and units and units % restart_interval == 0:
                out.extend(wtr.flush())
                out.extend(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                wtr = _BitWriter()
                pred = [0] * nc
            units += 1
            for c, by, bx, _tdc, _tac in unit:
                blk = qblocks[c][by, bx]
                if not progressive:
                    pred[c] = _encode_block(
                        wtr, blk, pred[c], dc_codes[c], ac_codes[c]
                    )
                elif ss == 0 and ah == 0:
                    pred[c] = _encode_dc_first(wtr, blk, pred[c],
                                               dc_codes[c], al)
                elif ss == 0:
                    wtr.write((int(blk[0]) >> al) & 1, 1)  # DC refine
                elif ah == 0:
                    _encode_ac_first(wtr, blk, ac_codes[c], ss, se, al)
                else:
                    _encode_ac_refine(wtr, blk, ac_codes[c], ss, se, al)
        out.extend(wtr.flush())

    if progressive:
        allc = list(range(nc))
        emit_scan(allc, 0, 0, 0, 1)           # DC first, Al=1
        for c in allc:
            emit_scan([c], 1, 5, 0, 1)        # AC band 1 first
            emit_scan([c], 6, 63, 0, 1)       # AC band 2 first
        emit_scan(allc, 0, 0, 1, 0)           # DC refinement
        for c in allc:
            emit_scan([c], 1, 5, 1, 0)        # AC band 1 refinement
            emit_scan([c], 6, 63, 1, 0)       # AC band 2 refinement
    elif interleave:
        emit_scan(list(range(nc)), 0, 63, 0, 0)
    else:
        for c in range(nc):                   # one sequential scan per comp
            emit_scan([c], 0, 63, 0, 0)
    out += b"\xff\xd9"
    return bytes(out)


def _encode_dc_first(w: _BitWriter, blk, pred: int, dc_codes: dict,
                     al: int) -> int:
    """Progressive DC first scan: diff-code the point-transformed DC
    (arithmetic shift, matching the decoder's ``pred << Al``)."""
    dc = int(blk[0]) >> al
    diff = dc - pred
    s = _category(diff)
    code, length = dc_codes[s]
    w.write(code, length)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    return dc


def _encode_ac_first(w: _BitWriter, blk, ac_codes: dict,
                     ss: int, se: int, al: int) -> None:
    """Progressive AC first scan over one band: run-length code the
    point-transformed magnitudes; trailing zeros fold into a plain EOB
    (EOB-run length fixed at one block — always legal, and the only
    EOBn the standard tables can express)."""
    r = 0
    coded_any = False
    for k in range(ss, se + 1):
        v = int(blk[k])
        m = (v if v >= 0 else -v) >> al
        if m == 0:
            r += 1
            continue
        while r > 15:
            code, length = ac_codes[0xF0]
            w.write(code, length)
            r -= 16
        s = m.bit_length()
        code, length = ac_codes[(r << 4) | s]
        w.write(code, length)
        w.write(m if v >= 0 else (-m) + (1 << s) - 1, s)
        r = 0
        coded_any = True
    if r or not coded_any:
        code, length = ac_codes[0x00]
        w.write(code, length)


def _encode_ac_refine(w: _BitWriter, blk, ac_codes: dict,
                      ss: int, se: int, al: int) -> None:
    """Progressive AC refinement (T.81 G.1.2.3 encoder side):
    newly-visible coefficients (|v| >> Al == 1) emit (run-of-zero-
    HISTORY, 1) symbols + a sign bit; already-nonzero coefficients
    buffer one correction bit, flushed after the next symbol so the
    decoder consumes them in position order during its run walk;
    trailing state folds into a single-block EOB."""
    mags = [(abs(int(blk[k])) >> al) for k in range(ss, se + 1)]
    try:
        eob_rel = max(i for i, m in enumerate(mags) if m == 1)
    except ValueError:
        eob_rel = -1  # no newly-visible coefficient in this block
    r = 0
    br: list[int] = []
    for i, m in enumerate(mags):
        if m == 0:
            r += 1
            continue
        # required ZRLs go out at EVERY nonzero position before its
        # own coding (unless foldable into the trailing EOB) — a
        # history coefficient sitting between the ZRL's 16-zero window
        # and the next new coefficient must buffer its correction bit
        # AFTER the ZRL flush, or the decoder's run walk reads it on
        # the wrong side of the symbol
        while r > 15 and i <= eob_rel:
            code, length = ac_codes[0xF0]
            w.write(code, length)
            r -= 16
            for b in br:
                w.write(b, 1)
            br = []
        if m > 1:  # history: one correction bit, buffered
            br.append(m & 1)
            continue
        # m == 1: newly visible (r <= 15 here: i <= eob_rel, so the
        # ZRL loop above has drained any longer run)
        code, length = ac_codes[(r << 4) | 1]
        w.write(code, length)
        w.write(1 if int(blk[ss + i]) >= 0 else 0, 1)
        for b in br:
            w.write(b, 1)
        br = []
        r = 0
    if r or br or eob_rel < 0:
        code, length = ac_codes[0x00]
        w.write(code, length)
        for b in br:
            w.write(b, 1)
