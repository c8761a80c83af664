"""Multimodal binary-column plumbing: real Spark dataflow (binaryFile →
sniff/metadata/decode-features), real header parsing, stubbed codecs."""

from __future__ import annotations

import struct

import pytest

from data_ingestion_spark.operators import multimodal as mm


def png_bytes(w=16, h=8) -> bytes:
    ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
    )


def wav_bytes(channels=2, rate=44100, bits=16) -> bytes:
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
                      channels * bits // 8, bits)
    return (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
    )


@pytest.fixture()
def media_dir(tmp_path):
    (tmp_path / "img.png").write_bytes(png_bytes())
    (tmp_path / "sound.wav").write_bytes(wav_bytes())
    (tmp_path / "photo.jpg").write_bytes(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    (tmp_path / "doc.pdf").write_bytes(b"%PDF-1.4 fake")
    (tmp_path / "mystery.bin").write_bytes(b"\x01\x02\x03\x04")
    return str(tmp_path)


def test_header_parsers_unit():
    assert mm.png_metadata(png_bytes(640, 480)) == {
        "width": 640, "height": 480, "bit_depth": 8,
    }
    assert mm.wav_metadata(wav_bytes(1, 8000, 8)) == {
        "channels": 1, "sample_rate": 8000, "bits": 8,
    }
    assert mm.png_metadata(b"junk") is None
    assert mm.wav_metadata(b"RIFFxxxxAVI ") is None


def test_binary_read_and_sniff(spark, media_dir):
    df = mm.read_binary(spark, media_dir)
    assert {"path", "length", "content", "modificationTime"} <= set(df.columns)
    out = {r["path"].rsplit("/", 1)[-1]: r["format"]
           for r in mm.sniff_format(df).select("path", "format").collect()}
    assert out == {
        "img.png": "png", "sound.wav": "wav", "photo.jpg": "jpeg",
        "doc.pdf": "pdf", "mystery.bin": "unknown",
    }


def test_metadata_extraction(spark, media_dir):
    df = mm.read_binary(spark, media_dir)
    meta = {r["path"].rsplit("/", 1)[-1]: r.asDict()
            for r in mm.extract_metadata(df).collect()}
    assert meta["img.png"]["width"] == 16 and meta["img.png"]["height"] == 8
    assert meta["sound.wav"]["sample_rate"] == 44100
    assert meta["sound.wav"]["channels"] == 2
    assert meta["photo.jpg"]["format"] == "unknown"  # no jpeg dimension parser


def test_metadata_pushdown_filter(spark, media_dir):
    # predicate on metadata prunes before content ever matters
    df = mm.read_binary(spark, media_dir, glob="*.png")
    assert df.count() == 1


def test_decode_features_with_fake_decoder(spark, media_dir):
    # deterministic fake decoder: the Spark plumbing (schema, batching) is
    # identical to a real codec path
    def fake_decoder(data: bytes):
        return data[:4]

    def feature_fn(decoded) -> list[float]:
        return [float(b) for b in decoded]

    df = mm.read_binary(spark, media_dir, glob="*.png")
    out = mm.decode_features(df, feature_fn, decoder=fake_decoder, dim=6).collect()
    assert len(out) == 1
    feats = out[0]["features"]
    assert len(feats) == 6
    assert feats[:4] == [137.0, 80.0, 78.0, 71.0]  # \x89 P N G
    assert feats[4:] == [0.0, 0.0]  # padded


def test_decode_without_decoder_raises(spark, media_dir):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    df = mm.read_binary(spark, media_dir, glob="*.png")
    with pytest.raises((PythonException, Py4JJavaError), match="No media decoder"):
        mm.decode_features(df, lambda d: [0.0]).collect()


def test_resize_pipeline_with_fake_codec(spark, tmp_path):
    import os

    from data_ingestion_spark.operators import multimodal

    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.bin").write_bytes(b"\x01\x02\x03\x04")
    (d / "b.bin").write_bytes(b"\x05\x06")
    df = multimodal.read_binary(spark, str(d))

    # deterministic fake codec: decode = raw bytes; resize = tile/truncate
    out = multimodal.resize_images(
        df,
        width=3,
        height=2,
        decoder=lambda b: b,
        encoder=lambda raw, w, h: (raw * (w * h))[: w * h],
    ).collect()
    got = {os.path.basename(r["path"]): bytes(r["content"]) for r in out}
    assert got == {
        "a.bin": b"\x01\x02\x03\x04\x01\x02",
        "b.bin": b"\x05\x06\x05\x06\x05\x06",
    }
    assert all(r["width"] == 3 and r["height"] == 2 for r in out)


def test_frame_sampling_explodes_rows(spark, tmp_path):
    import os

    from data_ingestion_spark.operators import multimodal

    d = tmp_path / "vids"
    d.mkdir()
    (d / "v.bin").write_bytes(bytes(range(10)))
    df = multimodal.read_binary(spark, str(d))

    # fake container: one frame per byte
    out = multimodal.sample_frames(
        df, every_n=3, decoder=lambda b: (bytes([x]) for x in b)
    ).collect()
    frames = sorted((r["frame_index"], bytes(r["frame"])) for r in out)
    assert frames == [(0, b"\x00"), (3, b"\x03"), (6, b"\x06"), (9, b"\x09")]


def test_decode_without_codec_raises(spark, tmp_path):
    from data_ingestion_spark.operators import multimodal

    d = tmp_path / "raw"
    d.mkdir()
    (d / "x.bin").write_bytes(b"xx")
    df = multimodal.read_binary(spark, str(d))
    with pytest.raises(Exception, match="No media decoder|NotImplementedError"):
        multimodal.decode_features(df, feature_fn=lambda x: [0.0]).collect()


# ---------------------------------------------------------------------------
# Pure-stdlib PNG codec
# ---------------------------------------------------------------------------
def _filtered_png(arr, ftypes):
    """Hand-build a PNG whose scanlines use the given per-row filter types
    (exercises decode paths our filter-0 encoder never emits)."""
    import struct
    import zlib

    import numpy as np

    from data_ingestion_spark.operators.multimodal import _PNG_SIG

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int16)
    for y, ft in zip(range(h), ftypes):
        row = a[y].reshape(-1).astype(np.int16)
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(c, np.int16), row[:-c]])
            filt = (row - left) % 256
        elif ft == 2:  # Up
            filt = (row - prev) % 256
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(c, np.int16), row[:-c]])
            filt = (row - ((left + prev) >> 1)) % 256
        elif ft == 4:  # Paeth
            left = np.concatenate([np.zeros(c, np.int16), row[:-c]])
            ul = np.concatenate([np.zeros(c, np.int16), prev[:-c]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = (row - pred) % 256
        raw += bytes([ft]) + filt.astype(np.uint8).tobytes()
        prev = row

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_rgb():
    import numpy as np

    from data_ingestion_spark.operators.multimodal import png_decode, png_encode

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(13, 9, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


def test_png_roundtrip_gray_and_rgba():
    import numpy as np

    from data_ingestion_spark.operators.multimodal import png_decode, png_encode

    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, size=(5, 7, 1), dtype=np.uint8)
    rgba = rng.randint(0, 256, size=(4, 6, 4), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(gray)), gray)
    assert np.array_equal(png_decode(png_encode(rgba)), rgba)


def test_png_decode_all_filter_types():
    import numpy as np

    from data_ingestion_spark.operators.multimodal import png_decode

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(5, 8, 3), dtype=np.uint8)
    blob = _filtered_png(img, ftypes=[0, 1, 2, 3, 4])
    assert np.array_equal(png_decode(blob), img)


def test_png_decode_rejects_unsupported():
    import struct
    import zlib

    import numpy as np

    from data_ingestion_spark.operators.multimodal import _PNG_SIG, png_decode

    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"JUNK")
    # 16-bit depth PNG header -> unsupported
    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    blob = _PNG_SIG + chunk(b"IHDR", ihdr16) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported PNG"):
        png_decode(blob)


def test_resize_images_with_real_png_codec(spark, tmp_path):
    """End-to-end: binaryFile read -> mapInPandas decode/resize/encode with
    the stdlib PNG codec — no injected fakes anywhere."""
    import numpy as np

    from data_ingestion_spark.operators import multimodal as mm

    rng = np.random.RandomState(5)
    for i in range(3):
        img = rng.randint(0, 256, size=(10 + i, 8, 3), dtype=np.uint8)
        (tmp_path / f"img{i}.png").write_bytes(mm.png_encode(img))
    df = mm.read_binary(spark, str(tmp_path))
    out = mm.resize_images(
        df,
        width=4,
        height=5,
        decoder=mm.png_decode,
        encoder=lambda arr, w, h: mm.png_encode(mm.resize_nearest(arr, w, h)),
    ).collect()
    assert len(out) == 3
    for r in out:
        assert (r["width"], r["height"]) == (4, 5)
        decoded = mm.png_decode(bytes(r["content"]))
        assert decoded.shape == (5, 4, 3)


# ---------------------------------------------------------------------------
# Pure-stdlib WAV PCM codec + audio features
# ---------------------------------------------------------------------------
def test_wav_roundtrip_mono_and_stereo():
    import numpy as np

    from data_ingestion_spark.operators.multimodal import wav_decode, wav_encode

    rng = np.random.RandomState(9)
    mono = rng.randint(-32768, 32767, size=(400,), dtype=np.int16)
    stereo = rng.randint(-32768, 32767, size=(300, 2), dtype=np.int16)
    arr, rate = wav_decode(wav_encode(mono, 8000))
    assert rate == 8000 and np.array_equal(arr[:, 0], mono)
    arr2, rate2 = wav_decode(wav_encode(stereo, 44100))
    assert rate2 == 44100 and np.array_equal(arr2, stereo)


def test_wav_decode_skips_extra_chunks_and_rejects_nonpcm():
    import struct

    import numpy as np

    from data_ingestion_spark.operators.multimodal import wav_decode, wav_encode

    mono = np.array([1, -1, 2, -2], dtype=np.int16)
    blob = wav_encode(mono, 16000)
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    listc = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = blob[:fmt_end] + listc + blob[fmt_end:]
    arr, rate = wav_decode(spliced)
    assert rate == 16000 and np.array_equal(arr[:, 0], mono)
    # float PCM (fmt 3) rejected
    bad = bytearray(blob)
    bad[20:22] = struct.pack("<H", 3)
    with pytest.raises(ValueError, match="unsupported WAV"):
        wav_decode(bytes(bad))


def test_audio_features_pipeline(spark, tmp_path):
    import numpy as np

    from data_ingestion_spark.operators import multimodal as mm

    t = np.arange(8000)
    tone = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    (tmp_path / "tone.wav").write_bytes(mm.wav_encode(tone, 8000))
    (tmp_path / "junk.wav").write_bytes(b"not audio at all")
    # fmt chunk CLAIMS 16 bytes but the file ends after 4 — wav_decode's
    # struct.unpack reads short (struct.error, not ValueError); must yield
    # nulls, never fail the whole Arrow batch
    (tmp_path / "lying_fmt.wav").write_bytes(
        b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE" + b"fmt " + b"\x10\x00\x00\x00"
        + b"\x01\x00"
    )
    out = {r["path"].rsplit("/", 1)[-1]: r for r in
           mm.audio_features(mm.read_binary(spark, str(tmp_path))).collect()}
    good = out["tone.wav"]
    assert good["n_samples"] == 8000 and good["sample_rate"] == 8000
    assert good["duration_ms"] == 1000
    assert 9000 <= good["peak"] <= 10000
    assert 870 <= good["zero_crossings"] <= 890  # 440Hz over 1s ≈ 880 crossings
    assert abs(good["rms"] - 10000 / 2**0.5) < 100
    junk = out["junk.wav"]
    assert junk["n_samples"] is None and junk["rms"] is None
    lying = out["lying_fmt.wav"]
    assert lying["n_samples"] is None and lying["rms"] is None


def test_wav_resample_decimate():
    import numpy as np

    from data_ingestion_spark.operators.multimodal import (
        wav_decode,
        wav_encode,
        wav_resample_decimate,
    )

    x = np.arange(100, dtype=np.int16).reshape(-1, 1)
    arr, _ = wav_decode(wav_encode(x, 8000))
    down = wav_resample_decimate(arr, 4)
    assert down.shape[0] == 25 and down[1, 0] == 4


# ---------------------------------------------------------------------------
# Perceptual hashing (pHash) + banded Hamming pairs
# ---------------------------------------------------------------------------
def test_phash_invariant_to_small_edits_and_separates_images():
    import numpy as np

    from data_ingestion_spark.operators.multimodal import phash64

    rng = np.random.default_rng(42)
    base = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    h = phash64(base)
    edited = base.astype(np.int16)
    edited[5, 5] += 10
    edited[40, 20] -= 10
    h_edit = phash64(edited.clip(0, 255).astype(np.uint8))
    other = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    h_other = phash64(other)
    assert bin(h ^ h_edit).count("1") <= 6
    assert bin(h ^ h_other).count("1") >= 16
    # resize invariance: nearest-2x upscale preserves the hash exactly
    up = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    assert phash64(up) == h


def test_image_phash_null_on_junk_and_jpeg_path(spark):
    import numpy as np

    from data_ingestion_spark.operators import multimodal as M

    arr = np.random.default_rng(1).integers(0, 256, (32, 32), dtype=np.uint8)
    rows = [(1, bytearray(M.png_encode(arr))), (2, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {r["id"]: r["phash"] for r in M.image_phash(df, "id").collect()}
    assert out[1] is not None and out[2] is None


def test_phash_hamming_pairs_banding_and_popcount(spark):
    from data_ingestion_spark.operators import multimodal as M

    # hand-planted signatures: a/b differ in 2 bits (pair), c differs from
    # both in ~32 bits but SHARES band 0 with a (candidate that must be
    # rejected by the exact popcount), d is NULL (skipped)
    a = 0x1234_5678_9ABC_DEF0
    b = a ^ 0b0110  # hamming 2
    c = (a & 0xFFFF) | (~a & ~0xFFFF) & 0xFFFF_FFFF_FFFF_0000  # shares band 0
    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v
    df = spark.createDataFrame(
        [(1, signed(a)), (2, signed(b)), (3, signed(c)), (4, None)],
        "id long, phash long",
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in M.phash_hamming_pairs(df, max_hamming=10).collect()}
    assert got == {(1, 2): 2}


def test_audio_fingerprint_gain_invariant_noise_tolerant():
    import numpy as np

    from data_ingestion_spark.operators import multimodal as M

    rng = np.random.default_rng(9)
    sr = 8000
    t = np.arange(sr) / sr

    def clip(seed):
        prng = np.random.default_rng(seed)
        x = np.zeros_like(t)
        for band_lo in (250, 1250, 2250, 3250):
            f = float(prng.integers(band_lo, band_lo + 600))
            env = np.repeat(prng.uniform(0.2, 1.0, 18), sr // 18 + 1)[:sr]
            x = x + env * np.sin(2 * np.pi * f * t)
        return (x / np.abs(x).max() * 8000).astype(np.int16)[:, None]

    base = clip(1)
    h = M.audio_fingerprint64(base, sr)
    # pure gain change: fingerprint is bit-identical
    assert M.audio_fingerprint64((base * 0.5).astype(np.int16), sr) == h
    noisy = (base.astype(np.float64) + rng.normal(0, 30, base.shape)).astype(np.int16)
    assert bin((h ^ M.audio_fingerprint64(noisy, sr)) & (2**64 - 1)).count("1") <= 4
    other = clip(2)
    assert bin((h ^ M.audio_fingerprint64(other, sr)) & (2**64 - 1)).count("1") >= 16
    # stereo mixdown of the same content matches mono
    stereo = np.repeat(base, 2, axis=1)
    assert M.audio_fingerprint64(stereo, sr) == h


def test_audio_fingerprints_null_on_junk_and_short(spark):
    import numpy as np

    from data_ingestion_spark.operators import multimodal as M

    ok = M.wav_encode(
        (np.sin(np.arange(8000) / 5.0) * 8000).astype(np.int16)[:, None], 8000
    )
    rows = [
        (1, bytearray(ok)),
        (2, bytearray(b"RIFFgarbage")),
        (3, bytearray(M.wav_encode(np.zeros((10, 1), dtype=np.int16), 8000))),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {r["id"]: r["afp"] for r in M.audio_fingerprints(df, "id").collect()}
    assert out[1] is not None and out[2] is None and out[3] is None
