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
    assert len(q) >= 194
    # driver verifies the first 50 in insertion order: every query new in
    # round 7 must sit inside that window, and (r7 rotation) no query that
    # already earned its driver-green row in the fully-green r6 window may
    # burn a slot
    names = list(q)
    window = set(names[:50])
    for must in ("theta_intersection_events", "dedup_nightly_pipeline_docs",
                 "ks_critical_drift_docs", "minhash_band_recall_docs",
                 "robust_scale_events", "pmi_bigrams_corpus",
                 "auc_quality_classifier_docs", "calibration_bins_docs",
                 # late round-7 additions — all new, all need driver rows
                 "funnel_windowed_events", "join_size_sample_orders_customer",
                 "classifier_report_docs", "pareto_quality_docs",
                 "bucketed_join_orders_customer", "key_skew_profile_events",
                 "dedup_keep_best_docs", "dedup_clusters_twostar_docs",
                 "source_overlap_matrix_docs", "rtbf_delete_docs",
                 "event_volume_trend_events", "cms_token_freq_corpus",
                 # the r6-verdict-named displaced temporal/knn tail
                 "knn_cosine_topk", "knn_ivf_topk",
                 "kmeans_centroids_embeddings", "gapfill_events_locf",
                 "asof_join_events_orders", "range_join_event_pairs",
                 "session_window_events", "time_window_events"):
        assert must in window, must
    for r6_green in ("stats_prune_scan_orders", "kn_bigram_lm_corpus",
                     "tpch_q9_product_profit", "ingest_csv_docs",
                     "dedup_exact_docs"):
        assert r6_green not in window, r6_green
