"""Tests for the versioned-table commit protocol
(operators/tableformat.py): pointer-flip atomicity semantics, time
travel, orphan-directory tolerance, and vacuum."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_spark.operators import tableformat as tf


def _df(spark, n, tag):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_commit_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    assert tf.commit_version(_df(spark, 10, "a"), root) == 0
    assert tf.commit_version(_df(spark, 7, "b"), root) == 1
    # current pointer → v1
    cur = tf.read_version(spark, root)
    assert cur.count() == 7 and cur.select("tag").first()["tag"] == "b"
    # time travel → v0, intact after the flip
    old = tf.read_version(spark, root, 0)
    assert old.count() == 10 and old.select("tag").first()["tag"] == "a"
    with pytest.raises(ValueError, match="version 5 not in table"):
        tf.read_version(spark, root, 5)


def test_orphan_snapshot_invisible_until_referenced(spark, tmp_path):
    """A crashed commit = data dir written, manifest never flipped: the
    reader must keep serving the old pointer."""
    root = str(tmp_path / "t")
    tf.commit_version(_df(spark, 5, "a"), root)
    # simulate the crash: orphan v99 directory, manifest untouched
    _df(spark, 3, "junk").write.parquet(os.path.join(root, "v99"))
    assert tf.read_version(spark, root).count() == 5
    m = tf.read_manifest(root)
    assert m["current"] == 0 and len(m["versions"]) == 1


def test_vacuum_drops_old_and_orphans(spark, tmp_path):
    root = str(tmp_path / "t")
    for i in range(4):
        tf.commit_version(_df(spark, i + 1, f"t{i}"), root)
    _df(spark, 2, "junk").write.parquet(os.path.join(root, "v99"))
    removed = tf.vacuum(root, keep_last=2)
    assert removed == [0, 1]
    dirs = {n for n in os.listdir(root) if n.startswith("v")}
    assert dirs == {"v2", "v3"}  # old versions AND the orphan gone
    assert tf.read_version(spark, root).count() == 4
    assert tf.read_version(spark, root, 2).count() == 3
    with pytest.raises(ValueError):
        tf.read_version(spark, root, 0)
    with pytest.raises(ValueError):
        tf.vacuum(root, keep_last=0)


def test_manifest_flip_is_rename_based(tmp_path, spark):
    """The pointer write goes through a temp file + rename (no window
    where _manifest.json is partially written)."""
    root = str(tmp_path / "t")
    tf.commit_version(_df(spark, 1, "a"), root)
    # manifest is valid JSON and no .tmp residue remains
    with open(os.path.join(root, "_manifest.json")) as f:
        m = json.load(f)
    assert m["current"] == 0
    assert not os.path.exists(os.path.join(root, "_manifest.json.tmp"))
