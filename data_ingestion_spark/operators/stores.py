"""Deterministic cross-process roots for committed derived-artifact stores.

The stored-artifact pattern (winnowing fingerprints, the AllPairs shingle
base, the IVF/PQ index builds) commits a corpus-scale derivation ONCE
through ``tableformat`` and lets every consumer probe the committed
snapshot. Before r11 those roots lived in ``tempfile.mkdtemp()`` — each
fresh process (every bench rep, test run, driver invocation) rebuilt AND
leaked one committed snapshot plus its catalog-backed parquet in /tmp
(r10 ADVICE). A store root is now a PURE FUNCTION of its inputs: corpus
path + parameters pick a stable prefix, and the corpus file's mtime picks
the suffix — so every process computes the SAME path, the first builder
commits, and later processes (or sessions) reuse the snapshot straight
from disk (``read_version`` re-registers bucketed catalog entries on a
fresh session — see the catalog-durability note in tableformat.py).

Staleness and bounded storage: a regenerated corpus changes the mtime →
a NEW root; the superseded sibling (same name+params prefix, different
mtime suffix) is swept after the new build commits, so storage is bounded
at one live snapshot per (corpus, params). A ``force=True`` rebuild
commits a NEW VERSION into the SAME root and vacuums to the last two —
the previous version's files stay on disk until the next rebuild, so a
lazy DataFrame a consumer obtained before the rebuild still collects
correctly (r10 ADVICE: the old eager-drop design broke exactly that).

Single-writer assumption: tableformat manifests are read-modify-write;
the driver / bench / pytest harnesses are sequential per process, and two
processes concurrently BUILDING the same store are not supported (the
same constraint commit_atomic already documents). Concurrent READERS of
a committed store are fine — that is the point of the design.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from . import tableformat


def store_base_dir() -> str:
    """One well-known directory for every deterministic store root."""
    return os.path.join(tempfile.gettempdir(), "spark_graft_stores")


def derivation_token(*funcs) -> str:
    """A hash of the SOURCE of the functions that define a store's
    derivation. Included in the store identity so a code change to the
    derivation AUTOMATICALLY invalidates committed snapshots (r11 review
    finding: path+params+mtime alone would serve a pre-change snapshot
    to every fresh process after, say, the tokenizer or the frequency
    tie-break changed — the one staleness the old build-per-process
    design could never exhibit). Comment-only edits also invalidate;
    that is the safe direction for a cache."""
    import inspect

    src = "\n".join(inspect.getsource(f) for f in funcs)
    return hashlib.sha1(src.encode()).hexdigest()[:10]


def store_root(
    name: str, key_parts: tuple, mtime_token: float, derivation: str = ""
) -> str:
    """The deterministic root for store ``name``: the IDENTITY is
    (name, key_parts) — corpus abspath + params — and the FRESHNESS is
    the derivation-source token plus the corpus mtime. The path is
    ``<name>_<keyhash>_<dthash>_<mthash>`` and ``sweep_stale`` globs the
    ``<name>_<keyhash>_`` identity prefix, so BOTH a regenerated corpus
    (new mtime) AND a changed derivation (new token) leave exactly one
    live root per identity — the superseded sibling is swept at the next
    build. (The token must NOT live inside key_parts: that would change
    the identity prefix and strand the old root forever — caught in the
    r11 second review pass.)"""
    keyhash = hashlib.sha1(repr(key_parts).encode()).hexdigest()[:12]
    dthash = hashlib.sha1(repr(derivation).encode()).hexdigest()[:6]
    mthash = hashlib.sha1(repr(mtime_token).encode()).hexdigest()[:8]
    return os.path.join(
        store_base_dir(), f"{name}_{keyhash}_{dthash}_{mthash}"
    )


def ensure_store(
    spark, root: str, build_fn, force: bool = False, origin: str | None = None
) -> str:
    """Build-if-absent: if ``root`` holds a committed transaction, reuse
    it; otherwise call ``build_fn(root)`` (which must ``commit_atomic``
    into ``root``) and sweep stale siblings. ``force=True`` always
    rebuilds — as a new version in the same root (old version kept for
    in-flight lazy readers), vacuumed to the last 2 so repeated forced
    builds (every bench rep) cannot grow the root unboundedly.
    ``origin`` (the source corpus file) is recorded in the root so
    orphaned stores — snapshots of a corpus that no longer exists, e.g.
    every pytest tmp-dir corpus — are reaped by ANY later build (r11
    review finding: identity-prefix sweeping alone never matches a
    run-unique tmp path again, so those roots leaked forever)."""
    if not force and os.path.exists(tableformat._txn_path(root)):
        # backfill the origin record on reuse (a crash between
        # commit_atomic and the origin write, or a root committed by an
        # older writer, would otherwise stay invisible to reap_orphans
        # forever — r11 second-review finding)
        if origin is not None and not os.path.exists(
            os.path.join(root, "_origin.json")
        ):
            _write_origin(root, origin)
        return root
    os.makedirs(store_base_dir(), exist_ok=True)
    build_fn(root)
    if origin is not None:
        _write_origin(root, origin)
    if force:
        _vacuum_members(spark, root, keep_last=2)
    sweep_stale(spark, root)
    reap_orphans(spark)
    return root


def _write_origin(root: str, origin: str) -> None:
    """Atomic (tmp + rename) origin record — a torn write must never
    make reap_orphans misread a live store's corpus path."""
    import json

    path = os.path.join(root, "_origin.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"corpus": os.path.abspath(origin)}, f)
    os.rename(tmp, path)


def reap_orphans(spark) -> None:
    """Drop every store root whose recorded origin corpus no longer
    exists on disk (deleted tmp-dir corpora). Best-effort; roots without
    an origin record are left alone."""
    import json

    base = store_base_dir()
    try:
        roots = os.listdir(base)
    except OSError:
        return
    for d in roots:
        path = os.path.join(base, d)
        origin_file = os.path.join(path, "_origin.json")
        try:
            with open(origin_file) as f:
                corpus = json.load(f).get("corpus")
        except (OSError, ValueError):
            continue
        if not corpus:
            continue
        # only a DEFINITE absence is an orphan: os.path.exists returns
        # False on EACCES/unmounted paths too, and reaping on those
        # would rmtree a live store out from under concurrent readers
        # (r11 second-review finding)
        try:
            os.stat(corpus)
        except (FileNotFoundError, NotADirectoryError):
            drop_store(spark, path)
        except OSError:
            continue


def _vacuum_members(spark, root: str, keep_last: int) -> None:
    """Vacuum every member table of a commit_atomic group root. Best
    effort — a vacuum hiccup must never fail the build that succeeded."""
    try:
        members = [
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        ]
    except OSError:
        return
    for m in members:
        sub = os.path.join(root, m)
        if not os.path.exists(os.path.join(sub, "_manifest.json")):
            continue
        try:
            tableformat.vacuum(sub, keep_last=keep_last, spark=spark)
        except Exception:
            pass


def sweep_stale(spark, keep_root: str) -> None:
    """Remove sibling roots with the same ``<name>_<keyhash>_`` identity
    prefix but a different derivation-token or mtime suffix — by
    construction snapshots of a corpus/derivation state that no longer
    exists in that form. Best-effort."""
    base = os.path.dirname(keep_root)
    prefix = os.path.basename(keep_root).rsplit("_", 2)[0] + "_"
    try:
        siblings = os.listdir(base)
    except OSError:
        return
    for d in siblings:
        path = os.path.join(base, d)
        if d.startswith(prefix) and path != keep_root:
            drop_store(spark, path)


def drop_store(spark, root: str) -> None:
    """Remove a superseded store root: catalog entries of every member
    table first (from the member manifests), then the directory tree.
    Best-effort by contract — a vanished directory, a dead session, or a
    foreign-session catalog error must never fail the build that
    replaced the store (r10 ADVICE: the old narrow ``except (OSError,
    ValueError, KeyError)`` let AnalysisException escape ``spark.sql``)."""
    try:
        members = [
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        ]
    except OSError:
        members = []
    for m in members:
        try:
            manifest = tableformat.read_manifest(os.path.join(root, m))
            for e in manifest.get("versions", []):
                if "table" in e:
                    spark.sql(f"DROP TABLE IF EXISTS {e['table']}")
        except Exception:
            pass
    shutil.rmtree(root, ignore_errors=True)


_SCRATCH_DIRS: list = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp with process-exit cleanup — for DEMO/scenario queries that
    build scratch versioned tables as part of their semantics (zorder
    demo, merge-upsert, time travel, RTBF, ...). Unlike store_root these
    are not reusable artifacts: each run's history IS the query, so the
    dir is fresh per call — but it no longer outlives the process (the
    r10 ADVICE leak class: every bench rep/test run left its scenario
    tables in /tmp forever)."""
    import atexit
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    if not _SCRATCH_DIRS:
        atexit.register(_cleanup_scratch)
    _SCRATCH_DIRS.append(d)
    return d


def _cleanup_scratch() -> None:
    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)
