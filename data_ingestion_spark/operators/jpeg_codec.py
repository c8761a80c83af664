"""Pure-stdlib+numpy baseline JPEG (SOF0) decoder.

Closes the last injectable-only codec tier (README "Multimodal codec
tiers"): PNG and WAV already have real in-container decoders; this adds
ITU-T T.81 baseline sequential JPEG — marker parse, DQT/DHT tables,
Huffman entropy decode with byte-stuffing and restart markers, dequantize
+ dezigzag, float IDCT-II, chroma upsampling (4:4:4 / 4:2:2 / 4:2:0 by
pixel replication), and JFIF YCbCr→RGB. Progressive (SOF2) and
arithmetic-coded JPEGs are out of scope and raise ValueError (the
injectable ``decoder=`` seam still accepts a full library for those).

Determinism: all arithmetic is float64 with a fixed evaluation order and
floor(x+0.5) rounding, so decoded pixels are identical across runs and
hosts — the property the multimodal operators' oracle checks rely on.

Tests verify against hand-crafted bitstreams whose expected pixels come
from an INDEPENDENT numpy IDCT replica (tests/test_jpeg_codec.py), not
from this decoder.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# IDCT-II basis: pixel = Mᵀ · coef · M  (+128), c(0)=1/√2
_IDCT_M = np.zeros((8, 8), dtype=np.float64)
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _IDCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _Huffman:
    """Canonical JPEG Huffman table: (length, code) → symbol."""

    def __init__(self, bits: list[int], values: bytes) -> None:
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 stuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:  # a real marker: signal end of entropy segment
                self.pos -= 1
                raise _MarkerReached()
        return b

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.buf = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self) -> None:
        """Byte-align and consume an RSTn marker (restart interval)."""
        self.nbits = 0
        if (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected RST marker at restart interval")


class _MarkerReached(Exception):
    pass


def _decode_symbol(br: _BitReader, table: _Huffman) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    return v - ((1 << t) - 1) if v < (1 << (t - 1)) else v


def jpeg_metadata(data: bytes) -> dict | None:
    """(width, height, n_components, baseline) from any SOFn, or None if
    not a JPEG."""
    if len(data) < 4 or data[:3] != b"\xff\xd8\xff":
        return None
    pos = 2
    try:
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return None
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w, n = struct.unpack(">HHB", data[pos + 5 : pos + 10])
                return {
                    "width": w,
                    "height": h,
                    "n_components": n,
                    "baseline": marker == 0xC0,
                }
            pos += 2 + seg_len
    except (struct.error, IndexError):
        return None
    return None


def jpeg_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline JPEG → (width, height, uint8 array of shape
    (height, width) for grayscale or (height, width, 3) RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    restart_interval = 0
    frame = None
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if 0xD0 <= marker <= 0xD7 or marker in (0x01,):
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(
                        np.float64
                    )
                    i += 64
                else:
                    tbl = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    ).astype(np.float64)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                values = seg[i + 17 : i + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huffman(bits, values)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            h, w, nc = struct.unpack(">HHB", seg[1:6])
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) JPEG is supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cs, tables = seg[1 + 2 * c : 3 + 2 * c]
                scan[cs] = (tables >> 4, tables & 15)
            return _decode_scan(
                data, pos + seg_len, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seg_len
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    if frame is None:
        raise ValueError("SOS before SOF0")
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    # Entropy decode collects dequantized coefficient blocks; the IDCT runs
    # ONCE over all blocks per component as a batched (N,8,8) matmul pair
    # (same per-block float64 ops as the scalar form, so pixels are
    # bit-identical) instead of two tiny matmuls per block in the loop.
    coefs: list[list[np.ndarray]] = [[] for _ in comps]
    coords: list[list[tuple[int, int]]] = [[] for _ in comps]
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    br.align_and_expect_rst()
                    pred = [0] * len(comps)
                for ci, c in enumerate(comps):
                    tdc, tac = scan[c["id"]]
                    q = qt[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coefs[ci].append(
                                _decode_block_coefs(
                                    br, huff_dc[tdc], huff_ac[tac], q, pred, ci
                                )
                            )
                            coords[ci].append(
                                ((my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8)
                            )
                mcu_count += 1
    except _MarkerReached as exc:  # truncated stream = corrupt input
        if mcu_count < mcux * mcuy:
            raise ValueError("truncated entropy-coded data") from exc
    for ci in range(len(comps)):
        if not coefs[ci]:
            continue
        stacked = np.stack(coefs[ci]).reshape(-1, 8, 8)
        pixels = np.matmul(np.matmul(_IDCT_M.T, stacked), _IDCT_M) + 128.0
        plane = planes[ci]
        for (y0, x0), block in zip(coords[ci], pixels):
            plane[y0 : y0 + 8, x0 : x0 + 8] = block
    # Upsample each plane to full MCU-grid resolution, then crop
    full = []
    for c, p in zip(comps, planes):
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.floor(full[0] + 0.5).clip(0, 255).astype(np.uint8)
        return w, h, gray
    if len(full) != 3:
        raise ValueError("only 1- or 3-component JPEGs are supported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, np.floor(rgb + 0.5).clip(0, 255).astype(np.uint8)


def _decode_block_coefs(br, hdc, hac, q, pred, ci):
    """Entropy-decode one block to its dequantized, dezigzagged 8×8
    coefficient matrix (IDCT happens batched in _decode_scan)."""
    coef = np.zeros(64, dtype=np.float64)
    t = _decode_symbol(br, hdc)
    diff = _extend(br.receive(t), t) if t else 0
    pred[ci] += diff
    coef[0] = pred[ci] * q[0]
    k = 1
    while k < 64:
        rs = _decode_symbol(br, hac)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[ZIGZAG[k]] = _extend(br.receive(s), s) * q[k]
        k += 1
    return coef.reshape(8, 8)
