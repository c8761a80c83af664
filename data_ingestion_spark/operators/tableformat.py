"""Versioned-table commit protocol: snapshot isolation + time travel over
plain parquet — the minimal transactional-table-format core (the pointer
-file idea Delta/Iceberg build on), with no engine dependency.

Layout::

    <root>/_manifest.json     ← the POINTER: {"current": N, "versions": […]}
    <root>/v0/ …parquet…      ← immutable snapshot directories
    <root>/v1/ …parquet…

Why this shape at 100 TB:

- **Writers never mutate**: every commit writes a brand-new ``v{N}``
  directory, then flips the manifest via write-temp + ``os.rename`` — the
  one primitive object stores / POSIX give atomically. A reader that
  loaded the manifest an instant earlier keeps reading its (immutable)
  snapshot: snapshot isolation without locks.
- **Time travel is free**: old versions stay until ``vacuum`` — audits,
  reproducible training runs ("train on the corpus exactly as of v12"),
  and incremental diffing (cdc.snapshot_diff between two versions) all
  read dead-cheap manifest metadata, never a log replay.
- **Commit is O(manifest)**: the data write is the normal distributed
  parquet job; the transactional part touches one small JSON file. A real
  multi-writer lake adds a CAS on the pointer (object-store conditional
  put); single-writer rename is the honest local equivalent and is
  disclosed as such.

``merge_upsert``/``compact_files`` express the same staging-swap idea as
in-place table maintenance; this module is the multi-version form.
Reference parity: the reference's sink is append-only bulk insert
(src/ingestion_service.rs K1) — §2.5 scale extension.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def _manifest_path(root: str) -> str:
    return os.path.join(root, "_manifest.json")


def read_manifest(root: str) -> dict:
    with open(_manifest_path(root)) as f:
        return json.load(f)


def _write_manifest_atomic(root: str, manifest: dict) -> None:
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, _manifest_path(root))  # the atomic pointer flip


def commit_version(df: DataFrame, root: str) -> int:
    """Write ``df`` as the next immutable snapshot and flip the pointer.
    Returns the new version number. The snapshot directory is fully
    written BEFORE the manifest references it — a crash in between leaves
    an orphan directory (cleaned by vacuum), never a torn table."""
    os.makedirs(root, exist_ok=True)
    if os.path.exists(_manifest_path(root)):
        manifest = read_manifest(root)
    else:
        manifest = {"current": -1, "versions": []}
    v = manifest["current"] + 1
    vdir = f"v{v}"
    df.write.mode("overwrite").parquet(os.path.join(root, vdir))
    manifest["versions"].append({"v": v, "dir": vdir})
    manifest["current"] = v
    _write_manifest_atomic(root, manifest)
    return v


def read_version(spark, root: str, version: int | None = None) -> DataFrame:
    """Read a snapshot: ``version=None`` → the current pointer; an int →
    time travel to that committed version. Unknown versions raise."""
    manifest = read_manifest(root)
    v = manifest["current"] if version is None else version
    entries = {e["v"]: e["dir"] for e in manifest["versions"]}
    if v not in entries:
        raise ValueError(
            f"version {v} not in table (have {sorted(entries)})"
        )
    return spark.read.parquet(os.path.join(root, entries[v]))


def vacuum(root: str, keep_last: int) -> list[int]:
    """Drop all but the last ``keep_last`` versions (and any orphan
    ``v*`` directories a crashed commit left unreferenced). Returns the
    removed version numbers. The manifest flips BEFORE directories are
    deleted, so a concurrent reader of a dropped version fails fast at
    the manifest rather than mid-scan."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    manifest = read_manifest(root)
    keep = manifest["versions"][-keep_last:]
    drop = manifest["versions"][:-keep_last]
    manifest["versions"] = keep
    _write_manifest_atomic(root, manifest)
    referenced = {e["dir"] for e in keep}
    removed = [e["v"] for e in drop]
    for name in os.listdir(root):
        path = os.path.join(root, name)
        if (
            name.startswith("v")
            and os.path.isdir(path)
            and name not in referenced
        ):
            shutil.rmtree(path)
    return removed


def table_changes(
    spark, root: str, v_from: int, v_to: int, key_cols: list
) -> "DataFrame":
    """Delta-style CHANGE DATA FEED between two committed versions: a
    keyed snapshot diff (cdc.snapshot_diff) of the two immutable
    snapshots → insert/update/delete rows tagged ``change_type``.

    This is what makes the versioned table USEFUL downstream: consumers
    (incremental_agg_refresh, a search-index updater, a replication sink)
    ask "what changed between v3 and v7?" and get the minimal delta
    without either side re-scanning history — one full-outer key join
    between two snapshot scans, the same cost profile as snapshot_diff.
    Columns are the intersection of the two versions' non-key columns, so
    additively-evolved schemas diff over their common ground.
    """
    from . import cdc

    old = read_version(spark, root, v_from)
    new = read_version(spark, root, v_to)
    keys = list(key_cols)
    common = [c for c in new.columns if c in old.columns and c not in keys]
    return cdc.snapshot_diff(
        old.select(*keys, *common), new.select(*keys, *common), keys, common
    )
