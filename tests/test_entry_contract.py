"""The driver-contract smoke: entry() runs and returns rows with a stable
schema; queries()/oracle_sql() stay consistent (every oracle key exists,
every priority name resolves, the one intentionally-oracle-less query is
exactly zorder_prune_demo_events)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) >= {"l_returnflag"}


def test_registry_consistency():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert set(q) - set(o) == {"zorder_prune_demo_events"}
    assert len(q) >= 170
    # driver verifies the first 50 in insertion order: every never-yet-
    # driver-verified (round-4-new) query must sit inside that window
    names = list(q)
    window = set(names[:50])
    for must in ("bpe_encode_docs", "histogram_lineitem", "winsorize_events",
                 "temperature_sample_docs", "corpus_build_pipeline_docs"):
        assert must in window, must
