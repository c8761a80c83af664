"""Logfmt Python Data Source (Spark 4 DataSource API) tests."""

from __future__ import annotations

import json
import os

from data_ingestion_spark.sources.logfmt_source import (
    LogfmtDataSource,
    parse_logfmt_line,
)


def test_parse_quoted_escapes_flags_and_last_wins():
    assert parse_logfmt_line('a=1 b="x y" c="q\\"z"') == {
        "a": "1",
        "b": "x y",
        "c": 'q"z',
    }
    assert parse_logfmt_line("flag a=1 flag") == {"flag": "", "a": "1"}
    assert parse_logfmt_line("k=1 k=2 k=3") == {"k": "3"}
    assert parse_logfmt_line("x=1 ??? y=2") == {"x": "1", "_raw": "???", "y": "2"}
    assert parse_logfmt_line("") == {}


def test_datasource_reads_files_in_parallel_partitions(spark, tmp_path):
    spark.dataSource.register(LogfmtDataSource)
    for name, content in {
        "one.logfmt": "a=1\n\nb=2\n",
        "two.log": 'm="hi there"\n',
        "skip.txt": "not=read\n",
    }.items():
        (tmp_path / name).write_text(content)
    df = spark.read.format("logfmt").option("path", str(tmp_path)).load()
    assert df.rdd.getNumPartitions() == 2  # one per matched file
    rows = {(r["file_name"], r["line_number"]): r["kv_json"] for r in df.collect()}
    assert rows[("one.logfmt", 1)] == json.dumps({"a": "1"})
    assert rows[("one.logfmt", 3)] == json.dumps({"b": "2"})  # blank line skipped
    assert rows[("two.log", 1)] == json.dumps({"m": "hi there"})
    assert len(rows) == 3  # .txt not picked up


def test_datasource_single_file_and_junk_bytes(spark, tmp_path):
    spark.dataSource.register(LogfmtDataSource)
    p = tmp_path / "x.log"
    p.write_bytes(b"ok=1\n\xff\xfe garbage\n")
    rows = (
        spark.read.format("logfmt")
        .option("path", str(p))
        .load()
        .collect()
    )
    by_line = {r["line_number"]: json.loads(r["kv_json"]) for r in rows}
    assert by_line[1] == {"ok": "1"}
    assert "_raw" in by_line[2] or "garbage" in by_line[2]  # junk preserved
    assert os.path.basename(str(p)) == rows[0]["file_name"]


def test_writer_roundtrip_and_overwrite(spark, tmp_path):
    from data_ingestion_spark.sources.logfmt_source import format_logfmt_row

    spark.dataSource.register(LogfmtDataSource)
    out = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [("info", 'say "hi"', "8080"), ("warn", "disk low", "")],
        "level string, msg string, port string",
    )
    df.write.format("logfmt").mode("append").option("path", out).save()
    files = [f for f in os.listdir(out) if f.endswith(".logfmt")]
    assert files and not any(f.startswith("_tmp_") for f in files)
    back = (
        spark.read.format("logfmt").option("path", out).load().collect()
    )
    got = {json.dumps(json.loads(r["kv_json"]), sort_keys=True) for r in back}
    want = {
        json.dumps(dict(level="info", msg='say "hi"', port="8080"), sort_keys=True),
        json.dumps(dict(level="warn", msg="disk low", port=""), sort_keys=True),
    }
    assert got == want
    # overwrite replaces prior committed files
    df2 = spark.createDataFrame([("err", "x", "1")], "level string, msg string, port string")
    df2.write.format("logfmt").mode("overwrite").option("path", out).save()
    back2 = spark.read.format("logfmt").option("path", out).load().collect()
    assert len(back2) == 1 and json.loads(back2[0]["kv_json"])["level"] == "err"
    # serializer inverse check for escapes
    assert format_logfmt_row({"a": 'q"z', "b": ""}) == 'a="q\\"z" b='


def test_stream_reader_tails_directory_with_checkpoint(spark, tmp_path):
    """Streaming tier: availableNow run 1 ingests landed files; run 2 with
    the SAME checkpoint ingests only files that appeared in between."""
    spark.dataSource.register(LogfmtDataSource)
    land = tmp_path / "land"
    land.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (land / "a.logfmt").write_text("n=1\nn=2\n")

    def run_once():
        q = (
            spark.readStream.format("logfmt")
            .option("path", str(land))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run_once()
    got1 = spark.read.parquet(out).collect()
    assert sorted(json.loads(r["kv_json"])["n"] for r in got1) == ["1", "2"]
    (land / "b.log").write_text("n=3\n")
    run_once()
    got2 = spark.read.parquet(out).collect()
    assert sorted(json.loads(r["kv_json"])["n"] for r in got2) == ["1", "2", "3"]
    assert {r["file_name"] for r in got2} == {"a.logfmt", "b.log"}


def test_tmp_orphans_invisible_and_commit_preserves_tmp_dirname(spark, tmp_path):
    """A crashed/speculative writer task's _tmp_ file must never be read
    (abort() only sees commit messages from tasks that returned one), and
    commit()'s rename must strip _tmp_ from the BASENAME only, so a parent
    directory containing '_tmp_' survives intact."""
    spark.dataSource.register(LogfmtDataSource)
    land = tmp_path / "zone_tmp_a"  # dirname deliberately contains _tmp_
    land.mkdir()
    (land / "good.logfmt").write_text("n=1\n")
    (land / "_tmp_part-00007-dead.logfmt").write_text("n=666\n")  # orphan

    got = (
        spark.read.format("logfmt").option("path", str(land)).load().collect()
    )
    assert [json.loads(r["kv_json"])["n"] for r in got] == ["1"]

    # Write path: committed output lands NEXT TO the orphan without
    # touching the directory name, and a re-read still skips the orphan.
    df = spark.createDataFrame([("x", "1")], "k string, v string").coalesce(1)
    df.write.format("logfmt").mode("append").option("path", str(land)).save()
    assert (land / "good.logfmt").exists()
    assert land.exists() and "_tmp_" in land.name
    committed = [
        f for f in land.iterdir()
        if f.name.endswith(".logfmt") and not f.name.startswith("_tmp_")
    ]
    assert len(committed) == 2  # good.logfmt + the new part file
    got2 = (
        spark.read.format("logfmt").option("path", str(land)).load().collect()
    )
    assert sorted(json.loads(r["kv_json"]).get("n", "x") for r in got2) == ["1", "x"]
