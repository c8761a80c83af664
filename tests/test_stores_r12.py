"""Round-12 store hardening (the r11 ADVICE items): per-user 0700 base
dir with ownership refusal, O_EXCL build-lock serialization, age-gated
sweeps (in-flight readers drain before a superseded root is reaped),
the beyond-mtime corpus freshness token, and the mechanically-derived
derivation closure."""

from __future__ import annotations

import os
import time

from data_ingestion_spark.operators import stores


def _docs(spark, sf, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))


def test_base_dir_is_per_user_and_0700(tmp_path, monkeypatch):
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    base = stores.store_base_dir()
    assert base.endswith(f"spark_graft_stores_{os.getuid()}")
    # a pre-existing dir with loose perms is tightened in place
    os.makedirs(base)
    os.chmod(base, 0o755)
    assert stores._ensure_base_dir() == base
    assert os.stat(base).st_mode & 0o777 == 0o700
    assert os.stat(base).st_uid == os.getuid()


def test_base_dir_refuses_foreign_owner(tmp_path, monkeypatch):
    """A foreign-uid dir squatting at the well-known path must be
    refused, not trusted (pre-planted-root attack). Runs only when the
    test has the privilege to create a foreign-owned dir (uid 0)."""
    import tempfile

    import pytest

    if os.getuid() != 0:
        pytest.skip("needs chown privilege to simulate a foreign owner")
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    base = stores.store_base_dir()
    os.makedirs(base, mode=0o700)
    os.chown(base, 12345, 12345)
    with pytest.raises(RuntimeError, match="foreign"):
        stores._ensure_base_dir()


def test_corpus_token_detects_timestamp_preserving_rewrite(spark, tmp_path):
    """mtime alone missed rsync -t / cp -p style replaces (r11 ADVICE);
    the token also folds in total size and the part-file name list, so a
    rewrite pinned to the identical directory mtime still changes it."""
    sf = str(tmp_path)
    _docs(spark, sf, [(1, "alpha beta gamma delta", "en", 22)])
    path = os.path.join(sf, "documents.parquet")
    t0 = os.stat(path).st_mtime
    tok1 = stores.corpus_token(path)
    _docs(spark, sf, [(2, "one two three four five six", "en", 27)])
    os.utime(path, (t0, t0))  # timestamp-preserving replace
    tok2 = stores.corpus_token(path)
    assert tok1 != tok2
    assert tok2 == stores.corpus_token(path)  # and it is stable


def test_build_lock_reuses_winner_commit_and_steals_stale(spark, tmp_path):
    from data_ingestion_spark.operators import dedup

    sf = str(tmp_path)
    _docs(spark, sf, [(1, "alpha beta gamma delta epsilon", "en", 30)])
    root = dedup.shingle_base_store(spark, sf)
    # the successful build released its lock
    assert not os.path.exists(root + ".lock")
    # a FRESH foreign lock + an already-committed txn: a non-force
    # builder is satisfied by the existing commit without waiting
    with open(root + ".lock", "w") as f:
        f.write("99999")
    t0 = time.monotonic()
    with stores._build_lock(root, force=False) as committed:
        assert committed is True
    assert time.monotonic() - t0 < 5
    # a STALE lock (crashed builder) is stolen: a forced rebuild goes
    # through rather than deadlocking
    old = time.time() - stores.LOCK_STALE_SECONDS - 60
    os.utime(root + ".lock", (old, old))
    assert dedup.shingle_base_store(spark, sf, force=True) == root
    assert not os.path.exists(root + ".lock")


def test_build_lock_loser_waits_for_winner_commit(tmp_path, monkeypatch):
    """Two concurrent builders of the same root: the loser must block on
    the winner's lock and be satisfied the moment the winner's
    ``_txn.json`` lands — never double-build, never give up early."""
    import json
    import threading

    root = str(tmp_path / "r1")
    os.makedirs(root)
    fd = os.open(root + ".lock", os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)

    def winner():
        time.sleep(0.4)
        with open(os.path.join(root, "_txn.json"), "w") as f:
            json.dump({"txn": 0, "tables": {}}, f)
        os.unlink(root + ".lock")

    t = threading.Thread(target=winner)
    t.start()
    t0 = time.monotonic()
    with stores._build_lock(root, force=False) as committed:
        assert committed is True
    waited = time.monotonic() - t0
    t.join()
    assert 0.3 < waited < 10, waited  # blocked on the winner, then served


def test_build_lock_times_out_loudly(tmp_path, monkeypatch):
    """A fresh foreign lock with NO commit: the loser must raise after
    LOCK_WAIT_SECONDS rather than silently double-building into the
    winner's root (the manifest-corruption race the lock exists for)."""
    import pytest

    monkeypatch.setattr(stores, "LOCK_WAIT_SECONDS", 0.5)
    root = str(tmp_path / "r2")
    os.makedirs(root)
    fd = os.open(root + ".lock", os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)
    with pytest.raises(TimeoutError, match="without a commit"):
        stores._build_lock(root, force=False).__enter__()
    # the foreign lock is left in place (it is not ours to remove)
    assert os.path.exists(root + ".lock")


def test_young_superseded_sibling_survives_sweep(spark, tmp_path):
    """The cross-root sweep is age-gated: a just-superseded sibling (a
    concurrent process may still hold lazy DataFrames against it) is
    left in place; once past SWEEP_GRACE_SECONDS a later build reaps
    it (r11 ADVICE)."""
    from data_ingestion_spark.operators import dedup

    sf = str(tmp_path)
    _docs(spark, sf, [(1, "alpha beta gamma delta epsilon", "en", 30)])
    root = dedup.shingle_base_store(spark, sf)
    name, keyhash, _dt, _mt = os.path.basename(root).split("_")
    young = os.path.join(
        os.path.dirname(root), f"{name}_{keyhash}_young0_cafe0000"
    )
    os.makedirs(young, exist_ok=True)
    dedup.shingle_base_store(spark, sf, force=True)
    assert os.path.exists(young), "young sibling must survive the grace window"
    old = time.time() - stores.SWEEP_GRACE_SECONDS - 60
    os.utime(young, (old, old))
    dedup.shingle_base_store(spark, sf, force=True)
    assert not os.path.exists(young), "aged sibling must be reaped"


def test_derivation_closure_is_mechanical():
    """The ADVICE's fragility concern, pinned: the closure walk must pull
    in every known-critical transitive dependency of the shingle-base
    derivation — the tokenizer regex, the shingle builder, the loader,
    and the bucketed write path — WITHOUT them being hand-listed."""
    from data_ingestion_spark.operators import dedup

    got = set(stores._derivation_closure([dedup.shingle_base_store]))
    for qual in (
        "data_ingestion_spark.functions.text_functions.tokens",
        "data_ingestion_spark.functions.text_functions.word_shingles",
        "data_ingestion_spark.operators.dedup.build_shingle_base",
        "data_ingestion_spark.operators.dedup.frequency_ordered_prefix",
        "data_ingestion_spark.session.load_table",
        "data_ingestion_spark.operators.tableformat.commit_atomic",
        "data_ingestion_spark.operators.tableformat.commit_version_bucketed",
    ):
        assert qual in got, qual


def test_parse_local_imports_handles_parenthesized_form():
    """A refactor to parenthesized multi-line imports must not silently
    drop dependencies out of the closure walk (the exact fragility class
    the mechanical token exists to close)."""
    src = (
        "def f():\n"
        "    from . import (stores,\n"
        "                   tableformat)\n"
        "    from ..session import load_table\n"
        "    import os\n"
    )
    got = dict(
        stores._parse_local_imports(
            src, "data_ingestion_spark.operators.dedup"
        )
    )
    assert got["data_ingestion_spark.operators"] == [
        "stores", "tableformat"
    ]
    assert got["data_ingestion_spark.session"] == ["load_table"]
    assert "os" in got


def test_derivation_token_tracks_transitive_dep_change(tmp_path):
    """Changing the SOURCE of an un-listed transitive helper must change
    the token of the root that calls it — the exact staleness class the
    hand-enumerated list could silently miss."""
    import importlib.util
    import sys

    mod_path = tmp_path / "dis_tokmod_r12.py"

    def load(body: str):
        mod_path.write_text(body)
        spec = importlib.util.spec_from_file_location(
            "data_ingestion_spark._tokmod_r12_test", str(mod_path)
        )
        mod = importlib.util.module_from_spec(spec)
        # registered under the package namespace so in_pkg() accepts it
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        return mod

    src_v1 = (
        "def helper(x):\n    return x + 1\n\n"
        "def root(x):\n    return helper(x) * 2\n"
    )
    src_v2 = (
        "def helper(x):\n    return x + 2\n\n"  # helper body changed
        "def root(x):\n    return helper(x) * 2\n"
    )
    try:
        m1 = load(src_v1)
        t1 = stores.derivation_token(m1.root)
        assert t1 == stores.derivation_token(m1.root)  # deterministic
        m2 = load(src_v2)
        t2 = stores.derivation_token(m2.root)
        assert t1 != t2, "transitive helper change must invalidate the token"
    finally:
        sys.modules.pop("data_ingestion_spark._tokmod_r12_test", None)
