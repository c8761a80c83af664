"""True MULTI-PROCESS races over the store build-lock protocol — the r12
tests simulate contention in-process (threads/monkeypatch); these spawn
real processes so the O_EXCL acquisition, the loser-waits-for-commit
path, and the flock-guarded stale steal are exercised across actual
process boundaries. ensure_store only needs a live SparkSession for the
best-effort sweep/vacuum paths (all wrapped in try/except by contract),
so the workers run sparkless with a filesystem-only build_fn — the lock
protocol itself is pure POSIX."""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time


def _worker(root: str, ledger: str, delay: float, force: bool) -> None:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from data_ingestion_spark.operators import stores, tableformat

    def build(r):
        os.makedirs(r, exist_ok=True)
        time.sleep(delay)  # widen the race window
        # record WHO built (O_APPEND is atomic for small writes)
        fd = os.open(ledger, os.O_CREAT | os.O_WRONLY | os.O_APPEND, 0o600)
        os.write(fd, f"{os.getpid()}\n".encode())
        os.close(fd)
        with open(tableformat._txn_path(r), "w") as f:
            json.dump({"by": os.getpid()}, f)

    got = stores.ensure_store(None, root, build, force=force)
    assert got == root


def _run_racers(root, ledger, n, delay=0.4, force=False, stale_lock=False):
    from data_ingestion_spark.operators import stores

    if stale_lock:
        with open(root + ".lock", "w") as f:
            f.write("999999")
        old = time.time() - stores.LOCK_STALE_SECONDS - 120
        os.utime(root + ".lock", (old, old))
    ctx = mp.get_context("fork")
    procs = [
        ctx.Process(target=_worker, args=(root, ledger, delay, force))
        for _ in range(n)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0, p.exitcode


def test_concurrent_builders_build_exactly_once(tmp_path):
    """N processes race ensure_store on the same absent root: exactly ONE
    build runs (the O_EXCL winner), every loser waits for the winner's
    commit and reuses it, and the lock is gone afterwards."""
    root = str(tmp_path / "race_ab_cd_ef")
    ledger = str(tmp_path / "ledger")
    _run_racers(root, ledger, n=4)
    with open(ledger) as f:
        builders = f.read().split()
    assert len(builders) == 1, builders
    assert os.path.exists(os.path.join(root, "_txn.json"))
    assert not os.path.exists(root + ".lock")


def test_concurrent_stale_steal_builds_exactly_once(tmp_path):
    """The advisory's exact scenario, cross-process: a crashed builder's
    STALE lock sits on the root and two processes race to steal it. The
    flock-guarded steal admits exactly one builder; the other reuses the
    commit — never a double build, never a deleted fresh lock."""
    root = str(tmp_path / "steal_ab_cd_ef")
    ledger = str(tmp_path / "ledger2")
    _run_racers(root, ledger, n=2, delay=0.2, stale_lock=True)
    with open(ledger) as f:
        builders = f.read().split()
    assert len(builders) == 1, builders
    assert os.path.exists(os.path.join(root, "_txn.json"))
    assert not os.path.exists(root + ".lock")


def test_concurrent_force_builders_serialize(tmp_path):
    """force=True racers must ALL build (each commits a new version by
    contract) but strictly one at a time — the ledger shows every pid,
    and the committed txn is whole (valid JSON) because no two builders
    ever overlapped inside the root."""
    root = str(tmp_path / "force_ab_cd_ef")
    ledger = str(tmp_path / "ledger3")
    _run_racers(root, ledger, n=3, delay=0.15, force=True)
    with open(ledger) as f:
        builders = f.read().split()
    assert len(builders) == 3, builders
    from data_ingestion_spark.operators import tableformat

    with open(tableformat._txn_path(root)) as f:
        assert "by" in json.load(f)
    assert not os.path.exists(root + ".lock")
