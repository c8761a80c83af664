"""Multimodal (binary) column operators.

Images/audio/video ride through the engine as opaque ``binary`` columns with
typed metadata — the public Spark pattern: ``spark.read.format("binaryFile")``
yields (path, modificationTime, length, content) with lazy per-file loading
and predicate pushdown on the metadata columns.

What's REAL here (and tested): the Spark plumbing — binary ingestion, format
sniffing from magic bytes (pure byte expressions), container metadata parses
(PNG/WAV header fields via stdlib struct), batch shapes, schemas, and the
mapInPandas decode pipeline. What's STUBBED (clearly, by raising
NotImplementedError): the actual pixel/sample decode — this container ships
no image/audio libraries. ``decoder=`` injection keeps the pipeline testable
with a deterministic fake and lets a real decoder (Pillow, soundfile, ffmpeg)
drop in unchanged on a production cluster.
"""

from __future__ import annotations

import struct
from typing import Any, Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: magic-byte prefixes → format label (public file-signature table)
_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"RIFF", "riff"),  # refined to wav/avi below
    (b"ID3", "mp3"),
    (b"\x00\x00\x00", "mp4_maybe"),  # ftyp box check below
    (b"%PDF", "pdf"),
]


def read_binary(spark: SparkSession, path: str, glob: Optional[str] = None) -> DataFrame:
    """Ingest binary files: (path, modificationTime, length, content).

    At scale: binaryFile is lazy per file and prunes on metadata predicates
    (e.g. ``length < 100MB``) before any content is read.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def sniff_format(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Add a ``format`` column from magic bytes — pure JVM byte expressions
    (substring on binary + equality), no UDF, fuses into the scan."""
    c = F.col(content_col)

    def prefix_is(sig: bytes) -> F.Column:
        return F.expr(
            f"substring({content_col}, 1, {len(sig)})"
        ) == F.lit(bytearray(sig))

    fmt = F.lit("unknown")
    # build from lowest to highest priority; RIFF/MP4 get refinements
    fmt = F.when(prefix_is(b"%PDF"), "pdf").otherwise(fmt)
    fmt = F.when(
        (F.expr(f"substring({content_col}, 5, 4)") == F.lit(bytearray(b"ftyp"))),
        "mp4",
    ).otherwise(fmt)
    fmt = F.when(prefix_is(b"ID3"), "mp3").otherwise(fmt)
    fmt = F.when(
        prefix_is(b"RIFF")
        & (F.expr(f"substring({content_col}, 9, 4)") == F.lit(bytearray(b"WAVE"))),
        "wav",
    ).otherwise(fmt)
    fmt = F.when(prefix_is(b"GIF87a") | prefix_is(b"GIF89a"), "gif").otherwise(fmt)
    fmt = F.when(prefix_is(b"\xff\xd8\xff"), "jpeg").otherwise(fmt)
    fmt = F.when(prefix_is(b"\x89PNG\r\n\x1a\n"), "png").otherwise(fmt)
    return df.withColumn("format", fmt)


def png_metadata(data: bytes) -> Optional[dict[str, int]]:
    """Parse PNG IHDR (public spec): width/height/bit_depth — stdlib only."""
    if len(data) < 33 or data[:8] != b"\x89PNG\r\n\x1a\n" or data[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", data[16:24])
    return {"width": w, "height": h, "bit_depth": data[24]}


def wav_metadata(data: bytes) -> Optional[dict[str, int]]:
    """Parse WAV fmt chunk (public RIFF spec): channels/sample_rate/bits."""
    if len(data) < 36 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    if data[12:16] != b"fmt ":
        return None
    channels, sample_rate = struct.unpack("<HI", data[22:28])
    bits = struct.unpack("<H", data[34:36])[0]
    return {"channels": channels, "sample_rate": sample_rate, "bits": bits}


_META_SCHEMA = (
    "path string, format string, width int, height int, channels int, "
    "sample_rate int"
)


def extract_metadata(df: DataFrame) -> DataFrame:
    """Typed per-file metadata via mapInPandas (Arrow batches of whole files).

    Partitioning note: binaryFile packs many small files per task; huge files
    arrive one per task — either way each batch stays bounded by
    maxPartitionBytes, so executor memory is safe at any corpus size.
    """

    def _extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                png = png_metadata(data)
                wav = wav_metadata(data)
                fmt = "png" if png else ("wav" if wav else "unknown")
                rows.append(
                    {
                        "path": path,
                        "format": fmt,
                        "width": png["width"] if png else None,
                        "height": png["height"] if png else None,
                        "channels": wav["channels"] if wav else None,
                        "sample_rate": wav["sample_rate"] if wav else None,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "format", "width", "height", "channels", "sample_rate",
                ],
            )

    return df.select("path", "content").mapInPandas(_extract, schema=_META_SCHEMA)


# --------------------------------------------------------------------------
# Decode pipeline: real plumbing, stubbed codec.
# --------------------------------------------------------------------------
Decoder = Callable[[bytes], Any]


def _no_decoder(data: bytes) -> Any:
    raise NotImplementedError(
        "No media decoder available in this environment. Inject decoder= "
        "(e.g. PIL.Image.open / soundfile.read) on a cluster with codecs."
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    decoder: Decoder = _no_decoder,
    encoder: Callable[[Any, int, int], bytes] | None = None,
) -> DataFrame:
    """Decode → resize → re-encode over binary image content, Arrow-batched.

    ``decoder``/``encoder`` are injected (PIL.Image.open / img.resize().save
    on a real cluster; deterministic fakes in tests — this container ships
    no codecs). The Spark contract — schema ``(path, content, width,
    height)``, per-partition batching, binary pass-through — is identical
    either way.
    """

    def _enc(decoded: Any, w: int, h: int) -> bytes:
        if encoder is None:
            raise NotImplementedError(
                "No image encoder available; inject encoder= on a cluster "
                "with codecs (e.g. PIL resize + save-to-bytes)."
            )
        return encoder(decoded, w, h)

    schema = "path string, content binary, width int, height int"

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                resized = _enc(decoder(bytes(content)), width, height)
                out_rows.append(
                    {"path": path, "content": resized, "width": width, "height": height}
                )
            yield pd.DataFrame(
                out_rows, columns=["path", "content", "width", "height"]
            )

    return df.select("path", "content").mapInPandas(_run, schema=schema)


def sample_frames(
    df: DataFrame,
    every_n: int,
    decoder: Callable[[bytes], Iterator[Any]] = _no_decoder,
    frame_encoder: Callable[[Any], bytes] | None = None,
) -> DataFrame:
    """Video/audio frame sampling: one output row per kept frame
    (every ``every_n``-th), exploding each container into
    ``(path, frame_index, frame)`` — the UDTF-shaped mapInPandas pattern
    (input rows ≠ output rows). ``decoder`` yields frames (ffmpeg/PyAV on a
    real cluster; deterministic fake in tests)."""

    schema = "path string, frame_index int, frame binary"

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for i, frame in enumerate(decoder(bytes(content))):
                    if i % every_n == 0:
                        blob = (
                            frame_encoder(frame)
                            if frame_encoder is not None
                            else bytes(frame)
                        )
                        rows.append(
                            {"path": path, "frame_index": i, "frame": blob}
                        )
            yield pd.DataFrame(rows, columns=["path", "frame_index", "frame"])

    return df.select("path", "content").mapInPandas(_run, schema=schema)


def decode_features(
    df: DataFrame,
    feature_fn: Callable[[Any], list[float]],
    decoder: Decoder = _no_decoder,
    dim: int = 8,
) -> DataFrame:
    """Decode → feature-extract over binary content, Arrow-batched.

    The Spark-side contract (schema ``path, features array<float>``, batch
    iteration, partition behavior) is identical whether ``decoder`` is a real
    codec or the deterministic test fake — that's the point: swap-in, no
    pipeline change.
    """
    schema = "path string, features array<float>"

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            paths, feats = [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                decoded = decoder(bytes(content))
                vec = [float(x) for x in feature_fn(decoded)][:dim]
                vec += [0.0] * (dim - len(vec))
                paths.append(path)
                feats.append(vec)
            yield pd.DataFrame({"path": paths, "features": feats})

    return df.select("path", "content").mapInPandas(_run, schema=schema)
