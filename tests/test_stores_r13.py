"""Round-13 store-infrastructure hardening (the four r12 ADVICE items):
flock-guarded stale-lock stealing (no two-stealer unlink race), a bounded
wait loop (the vanished-lock path can no longer busy-spin past the
deadline), ast-based function-local import parsing (aliases / trailing
comments / continuations reach the derivation closure), and sibling-lock
cleanup in drop_store."""

from __future__ import annotations

import os
import time

import pytest

from data_ingestion_spark.operators import stores


def test_parse_local_imports_handles_aliases_and_comments():
    """The r12 ADVICE gap: `from x import y as z`, `import x as y`, and
    trailing comments were invisible to the old regex, so helpers
    reachable only through those forms were silently dropped from the
    derivation closure (a change to them would not invalidate committed
    snapshots)."""
    src = (
        "def f():\n"
        "    from data_ingestion_spark.operators import dedup as dd  # c\n"
        "    import data_ingestion_spark.operators.similarity as sim\n"
        "    from ..functions import (\n"
        "        md5_hash60 as h60,\n"
        "        tokenize,\n"
        "    )\n"
        "    from . import tableformat\n"
    )
    got = list(
        stores._parse_local_imports(
            src, "data_ingestion_spark.operators.registry"
        )
    )
    assert ("data_ingestion_spark.operators", ["dedup"]) in got
    assert ("data_ingestion_spark.operators.similarity", []) in got
    # aliased from-import yields the SOURCE attribute names
    assert (
        "data_ingestion_spark.functions", ["md5_hash60", "tokenize"]
    ) in got
    assert ("data_ingestion_spark.operators", ["tableformat"]) in got


def test_parse_local_imports_indented_method_source():
    """inspect.getsource of a nested function is indented — the ast path
    must dedent before parsing, and a syntactically broken snippet must
    yield nothing rather than raise."""
    src = (
        "        def g():\n"
        "            from .stores import store_root as sr\n"
    )
    got = dict(
        stores._parse_local_imports(
            src, "data_ingestion_spark.operators.registry"
        )
    )
    assert got == {"data_ingestion_spark.operators.stores": ["store_root"]}
    assert list(stores._parse_local_imports("def (", "a.b")) == []


def test_derivation_closure_follows_aliased_local_import(tmp_path):
    """End-to-end through the closure walk: a root function whose ONLY
    path to a package helper is an aliased function-local import must
    still pull that helper's source into the token."""

    def uses_alias():
        from data_ingestion_spark.operators.stores import (
            corpus_token as ct,  # aliased on purpose
        )

        return ct("/nowhere")

    # the walk only follows in-package functions; fake the module so the
    # root itself qualifies
    uses_alias.__module__ = "data_ingestion_spark._r13_test"
    closure = stores._derivation_closure([uses_alias])
    assert any(q.endswith("corpus_token") for q in closure)


def test_steal_stale_spares_a_fresh_lock(tmp_path):
    """The two-stealer race regression (r12 ADVICE): staleness is
    re-judged INSIDE the flock critical section, so a stealer that lost
    the race — the winner already stole and re-created the lock — must
    leave the fresh lock alone."""
    root = str(tmp_path / "r")
    lock = root + ".lock"
    lk = stores._build_lock(root, force=True)
    # stale lock: stolen
    with open(lock, "w") as f:
        f.write("999999")
    old = time.time() - stores.LOCK_STALE_SECONDS - 60
    os.utime(lock, (old, old))
    lk._steal_stale()
    assert not os.path.exists(lock)
    # fresh lock (what the slower stealer sees after the faster one
    # re-created it): spared
    with open(lock, "w") as f:
        f.write("1")
    lk._steal_stale()
    assert os.path.exists(lock)


def test_vanishing_lock_wait_is_bounded(tmp_path, monkeypatch):
    """The busy-spin regression (r12 ADVICE): a lock that perpetually
    vanishes between the open and the stat used to `continue` past both
    the deadline check and the sleep — the loop now raises TimeoutError
    within the (shrunken) wait window instead of spinning forever."""
    root = str(tmp_path / "r")
    lock = root + ".lock"
    monkeypatch.setattr(stores, "LOCK_WAIT_SECONDS", 0.6)
    real_open, real_stat = os.open, os.stat

    def fake_open(path, flags, *a, **k):
        if path == lock and (flags & os.O_EXCL):
            raise FileExistsError(path)
        return real_open(path, flags, *a, **k)

    def fake_stat(path, *a, **k):
        if path == lock:
            raise FileNotFoundError(path)
        return real_stat(path, *a, **k)

    monkeypatch.setattr(os, "open", fake_open)
    monkeypatch.setattr(os, "stat", fake_stat)
    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        stores._build_lock(root, force=True).__enter__()
    assert time.monotonic() - t0 < 5


def test_drop_store_removes_sibling_lock(spark, tmp_path):
    """A crashed builder's lock on a root that is later dropped must go
    with the root (r12 ADVICE: locks are excluded from sweep_stale's
    sibling match, so a superseded root's lock leaked forever)."""
    root = str(tmp_path / "doomed_ab_cd_ef")
    os.makedirs(root)
    with open(root + ".lock", "w") as f:
        f.write("42")
    stores.drop_store(spark, root)
    assert not os.path.exists(root)
    assert not os.path.exists(root + ".lock")
