"""The driver-contract smoke: entry() runs and returns rows with a stable
schema; queries()/oracle_sql() stay consistent (every oracle key exists,
every priority name resolves, every query is oracle-paired)."""

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
    # round 6: zorder_prune_demo_events gained an oracle — the registry has
    # zero rows-only queries left
    assert set(q) == set(o)
    assert len(q) >= 178
    # driver verifies the first 50 in insertion order: every query new or
    # changed in round 6 must sit inside that window
    names = list(q)
    window = set(names[:50])
    for must in ("stats_prune_scan_orders", "assign_ids_orders",
                 "kn_bigram_lm_corpus", "psi_drift_docs",
                 "trajectory_events", "pq_adc_topk_embeddings",
                 "pq_ivf_topk_embeddings", "shuffle_ids_docs",
                 "merge_upsert_customers", "zorder_prune_demo_events",
                 "zipf_slope_corpus", "knn_two_stage_topk",
                 "matryoshka_qc_embeddings"):
        assert must in window, must
