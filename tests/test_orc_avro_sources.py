"""ORC (native) and Avro (pure-stdlib OCF codec) source/sink tests."""

from __future__ import annotations

import os

import pytest

from data_ingestion_spark.errors import ParseError
from data_ingestion_spark.pipeline import IngestionPipeline
from data_ingestion_spark.rules import DEFAULT_RULES
from data_ingestion_spark.sources.avro_source import (
    decode_container,
    read_avro,
    write_avro_file,
)
from data_ingestion_spark.sources.orc_source import read_orc, write_orc

from conftest import rows_as_dicts


# ---------------------------------------------------------------------------
# ORC
# ---------------------------------------------------------------------------


def _write_single_orc(spark, df, target: str) -> None:
    """spark.write.orc emits a directory; relocate the part file to a single
    .orc path the pipeline's key-based dispatch can address."""
    tmp = target + ".dir"
    df.coalesce(1).write.mode("overwrite").orc(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".orc"))
    os.replace(os.path.join(tmp, part), target)


def test_orc_roundtrip_native_types(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "ann", 1.5), (2, "bob", None)], "id: long, name: string, score: double"
    )
    path = str(tmp_path / "t.orc")
    _write_single_orc(spark, df, path)
    got = read_orc(spark, path)
    assert dict(got.dtypes) == {"id": "bigint", "name": "string", "score": "double"}
    assert sorted(rows_as_dicts(got), key=lambda r: r["id"]) == [
        {"id": 1, "name": "ann", "score": 1.5},
        {"id": 2, "name": "bob", "score": None},
    ]


def test_orc_column_projection(spark, tmp_path):
    df = spark.createDataFrame([(1, "x", 9)], "a: long, b: string, c: long")
    path = str(tmp_path / "proj.orc")
    _write_single_orc(spark, df, path)
    got = read_orc(spark, path, {"columns": ["a", "c"]})
    assert got.columns == ["a", "c"]


def test_orc_missing_path_raises_parse_error(spark, tmp_path):
    with pytest.raises(ParseError):
        read_orc(spark, str(tmp_path / "nope.orc"))


def test_orc_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k: long, v: string")
    out = str(tmp_path / "orc_out")
    write_orc(df, out)
    assert spark.read.orc(out).count() == 2


def test_orc_through_pipeline(spark, tmp_path):
    landing = tmp_path / "landing" / "bkt"
    os.makedirs(landing / "uploads")
    src = spark.createDataFrame([(7, "g"), (8, "h")], "id: long, tag: string")
    _write_single_orc(spark, src, str(landing / "uploads" / "metrics.orc"))
    pipe = IngestionPipeline(
        spark,
        warehouse_dir=str(tmp_path / "wh"),
        rules=DEFAULT_RULES,
        base_dir=str(tmp_path / "landing"),
    )
    pipe.process_key("bkt", "uploads/metrics.orc")
    got = pipe.sink.read_table("orc_data")
    assert got.count() == 2
    assert "file_name" in got.columns and "log_id" in got.columns


# ---------------------------------------------------------------------------
# Avro — codec unit tests + Spark read path
# ---------------------------------------------------------------------------

_SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": ["null", "double"]},
        {"name": "ok", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
    ],
}

_RECORDS = [
    {"id": 1, "name": "ann", "score": 1.25, "ok": True, "tags": ["a", "b"]},
    {"id": 2, "name": "bob", "score": None, "ok": False, "tags": []},
    {"id": -3, "name": "cé", "score": -0.5, "ok": True, "tags": ["z"]},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_codec_roundtrip(tmp_path, codec):
    path = str(tmp_path / f"{codec}.avro")
    write_avro_file(path, _SCHEMA, _RECORDS, codec=codec)
    schema, recs = decode_container(open(path, "rb").read())
    assert schema == _SCHEMA
    assert recs == _RECORDS


def test_avro_zigzag_extremes(tmp_path):
    schema = {
        "type": "record",
        "name": "E",
        "fields": [{"name": "v", "type": "long"}],
    }
    vals = [0, -1, 1, 2**62, -(2**62), 63, -64]
    path = str(tmp_path / "ex.avro")
    write_avro_file(path, schema, [{"v": v} for v in vals])
    _, recs = decode_container(open(path, "rb").read())
    assert [r["v"] for r in recs] == vals


def test_avro_read_spark_typed(spark, tmp_path):
    path = str(tmp_path / "docs.avro")
    write_avro_file(path, _SCHEMA, _RECORDS, codec="deflate")
    got = read_avro(spark, path)
    assert dict(got.dtypes) == {
        "id": "bigint",
        "name": "string",
        "score": "double",
        "ok": "boolean",
        "tags": "array<string>",
    }
    rows = sorted(rows_as_dicts(got), key=lambda r: r["id"])
    assert rows[1] == {"id": 1, "name": "ann", "score": 1.25, "ok": True, "tags": ["a", "b"]}
    assert rows[2]["score"] is None


def test_avro_multi_file_directory(spark, tmp_path):
    d = tmp_path / "avrodir"
    write_avro_file(str(d / "a.avro"), _SCHEMA, _RECORDS[:2])
    write_avro_file(str(d / "b.avro"), _SCHEMA, _RECORDS[2:])
    got = read_avro(spark, str(d))
    assert got.count() == 3


def test_avro_nested_map_enum_fixed(tmp_path):
    schema = {
        "type": "record",
        "name": "N",
        "fields": [
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {
                "name": "color",
                "type": {"type": "enum", "name": "C", "symbols": ["RED", "BLUE"]},
            },
            {"name": "fx", "type": {"type": "fixed", "name": "F", "size": 4}},
            {
                "name": "sub",
                "type": {
                    "type": "record",
                    "name": "Sub",
                    "fields": [{"name": "x", "type": "int"}],
                },
            },
        ],
    }
    recs = [{"m": {"a": 1, "b": 2}, "color": "BLUE", "fx": b"\x01\x02\x03\x04", "sub": {"x": 9}}]
    path = str(tmp_path / "n.avro")
    write_avro_file(path, schema, recs)
    _, got = decode_container(open(path, "rb").read())
    assert got == recs


def test_avro_bad_magic_raises(tmp_path):
    with pytest.raises(ParseError):
        decode_container(b"NOPE" + b"\x00" * 32)


def test_avro_corrupt_sync_raises(tmp_path):
    path = str(tmp_path / "c.avro")
    write_avro_file(path, _SCHEMA, _RECORDS)
    data = bytearray(open(path, "rb").read())
    data[-1] ^= 0xFF  # flip last sync byte
    with pytest.raises(ParseError):
        decode_container(bytes(data))


def test_avro_sink_partitioned_write(spark, tmp_path):
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "v", "type": "string"},
        ],
    }
    from data_ingestion_spark.sources.avro_source import write_avro

    df = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "k: long, v: string")
    out = str(tmp_path / "avro_out")
    n = write_avro(df.repartition(3), out, schema, codec="deflate")
    assert n >= 1
    got = read_avro(spark, out)
    assert got.count() == 10
    assert sorted(r["k"] for r in got.collect()) == list(range(10))


def test_avro_through_pipeline(spark, tmp_path):
    landing = tmp_path / "landing" / "bkt"
    os.makedirs(landing / "uploads", exist_ok=True)
    write_avro_file(str(landing / "uploads" / "ev.avro"), _SCHEMA, _RECORDS)
    pipe = IngestionPipeline(
        spark,
        warehouse_dir=str(tmp_path / "wh"),
        rules=DEFAULT_RULES,
        base_dir=str(tmp_path / "landing"),
    )
    pipe.process_key("bkt", "uploads/ev.avro")
    got = pipe.sink.read_table("avro_data")
    assert got.count() == 3
    assert "file_name" in got.columns
