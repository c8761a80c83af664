"""Baseline JPEG decoder tests: hand-crafted ITU-T T.81 bitstreams whose
expected pixels come from an independent numpy IDCT replica (explicit
double-sum formula), never from the decoder under test."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_ingestion_spark.operators.jpeg_codec import (
    ZIGZAG,
    jpeg_decode,
    jpeg_metadata,
)


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def bytes_padded(self) -> bytes:
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:  # byte stuffing
                out.append(0x00)
        return bytes(out)


def dht(tc: int, th: int, bits16: list[int], values: bytes) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(bits16) + values
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def dqt_unit() -> bytes:
    return b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64


def sof0(w: int, h: int, comps: list[tuple[int, int, int, int]]) -> bytes:
    body = b"\x08" + struct.pack(">HHB", h, w, len(comps))
    for cid, hs, vs, tq in comps:
        body += bytes([cid, hs << 4 | vs, tq])
    return b"\xff\xc0" + struct.pack(">H", 2 + len(body)) + body


def sos(comps: list[tuple[int, int, int]]) -> bytes:
    body = bytes([len(comps)])
    for cid, tdc, tac in comps:
        body += bytes([cid, tdc << 4 | tac])
    body += b"\x00\x3f\x00"
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def idct_ref(coef_natural: np.ndarray) -> np.ndarray:
    """Independent IDCT replica: the explicit T.81 double sum."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef_natural[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4 + 128
    return out


# Huffman tables used by the fixtures: DC symbols {0:'0', 7:'10', 8:'110'},
# AC symbols {0x01:'0', 0x00:'10'}
DC_BITS = [1, 1, 1] + [0] * 13
DC_VALS = bytes([0, 7, 8])
AC_BITS = [1, 1] + [0] * 14
AC_VALS = bytes([0x01, 0x00])


def write_dc(bw: BitWriter, category_codes: dict, diff: int):
    if diff == 0:
        bw.write(*category_codes[0])
        return
    t = abs(diff).bit_length()
    bw.write(*category_codes[t])
    v = diff if diff >= 0 else diff + (1 << t) - 1
    bw.write(v, t)


DC_CODES = {0: (0b0, 1), 7: (0b10, 2), 8: (0b110, 3)}
EOB = (0b10, 2)
AC_01 = (0b0, 1)


def test_flat_gray_dc_only():
    bw = BitWriter()
    write_dc(bw, DC_CODES, 64)  # DC=64, q=1
    bw.write(*EOB)
    jpg = (
        b"\xff\xd8" + dqt_unit() + sof0(8, 8, [(1, 1, 1, 0)])
        + dht(0, 0, DC_BITS, DC_VALS) + dht(1, 0, AC_BITS, AC_VALS)
        + sos([(1, 0, 0)]) + bw.bytes_padded() + b"\xff\xd9"
    )
    meta = jpeg_metadata(jpg)
    assert meta == {"width": 8, "height": 8, "n_components": 1, "baseline": True}
    w, h, arr = jpeg_decode(jpg)
    assert (w, h, arr.shape) == (8, 8, (8, 8))
    assert (arr == 136).all()  # 64/8 + 128


def test_single_ac_coefficient_matches_idct_replica():
    bw = BitWriter()
    write_dc(bw, DC_CODES, 0)
    bw.write(*AC_01)  # run 0, size 1
    bw.write(1, 1)  # value +1 at zigzag k=1 -> natural (0,1)
    bw.write(*EOB)
    jpg = (
        b"\xff\xd8" + dqt_unit() + sof0(8, 8, [(1, 1, 1, 0)])
        + dht(0, 0, DC_BITS, DC_VALS) + dht(1, 0, AC_BITS, AC_VALS)
        + sos([(1, 0, 0)]) + bw.bytes_padded() + b"\xff\xd9"
    )
    coef = np.zeros((8, 8))
    coef[divmod(ZIGZAG[1], 8)] = 1.0
    want = np.floor(idct_ref(coef) + 0.5).clip(0, 255).astype(np.uint8)
    _, _, arr = jpeg_decode(jpg)
    assert (arr == want).all()


def test_color_420_flat_and_ycbcr_conversion():
    bw = BitWriter()
    # MCU: 4 Y blocks (DC 64 then diffs 0) + Cb (DC -160 -> 108) + Cr (DC 160 -> 148)
    write_dc(bw, DC_CODES, 64)
    bw.write(*EOB)
    for _ in range(3):
        write_dc(bw, DC_CODES, 0)
        bw.write(*EOB)
    write_dc(bw, DC_CODES, -160)
    bw.write(*EOB)
    write_dc(bw, DC_CODES, 160)
    bw.write(*EOB)
    jpg = (
        b"\xff\xd8" + dqt_unit()
        + sof0(16, 16, [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)])
        + dht(0, 0, DC_BITS, DC_VALS) + dht(1, 0, AC_BITS, AC_VALS)
        + sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)])
        + bw.bytes_padded() + b"\xff\xd9"
    )
    w, h, arr = jpeg_decode(jpg)
    assert (w, h, arr.shape) == (16, 16, (16, 16, 3))
    y, cb, cr = 136.0, 108.0, 148.0
    want = [
        int(np.floor(y + 1.402 * (cr - 128) + 0.5)),
        int(np.floor(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)),
        int(np.floor(y + 1.772 * (cb - 128) + 0.5)),
    ]
    assert arr[0, 0].tolist() == want
    assert (arr == np.array(want, dtype=np.uint8)).all()


def test_rejects_progressive_and_truncated():
    prog = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 11) + b"\x08" + struct.pack(
        ">HHB", 8, 8, 1
    ) + bytes([1, 0x11, 0])
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(prog + b"\xff\xd9")
    bw = BitWriter()
    write_dc(bw, DC_CODES, 64)
    bw.write(*EOB)
    full = (
        b"\xff\xd8" + dqt_unit() + sof0(16, 8, [(1, 1, 1, 0)])  # 2 MCUs
        + dht(0, 0, DC_BITS, DC_VALS) + dht(1, 0, AC_BITS, AC_VALS)
        + sos([(1, 0, 0)]) + bw.bytes_padded() + b"\xff\xd9"  # only 1 MCU coded
    )
    with pytest.raises(ValueError):
        jpeg_decode(full)


def test_multimodal_metadata_and_dispatch_pick_up_jpeg(spark, tmp_path):
    from data_ingestion_spark.operators import multimodal

    bw = BitWriter()
    write_dc(bw, DC_CODES, 64)
    bw.write(*EOB)
    jpg = (
        b"\xff\xd8" + dqt_unit() + sof0(8, 8, [(1, 1, 1, 0)])
        + dht(0, 0, DC_BITS, DC_VALS) + dht(1, 0, AC_BITS, AC_VALS)
        + sos([(1, 0, 0)]) + bw.bytes_padded() + b"\xff\xd9"
    )
    (tmp_path / "img.jpg").write_bytes(jpg)
    (tmp_path / "junk.bin").write_bytes(b"\x00\x01\x02")
    df = spark.read.format("binaryFile").load(str(tmp_path))
    meta = {
        r["path"].rsplit("/", 1)[-1]: r.asDict()
        for r in multimodal.extract_metadata(df).collect()
    }
    assert meta["img.jpg"]["format"] == "jpeg"
    assert (meta["img.jpg"]["width"], meta["img.jpg"]["height"]) == (8, 8)
    assert meta["junk.bin"]["format"] == "unknown"
    arr = multimodal.image_decode(jpg)
    assert arr.shape == (8, 8, 1) and (arr == 136).all()
