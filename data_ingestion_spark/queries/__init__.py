"""Query battery for the driver contract (__spark_entry__.py).

Each module exposes a ``QUERIES`` registry: ``{name: (spark_fn, oracle_sql)}``
where ``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
equivalent ANSI SQL for the DuckDB correctness oracle (or ``None`` for
non-SQL-expressible operators, which get a rows-only check).

Registration ORDER matters: the driver's correctness gate verifies the first
50 entries in dict-insertion order. ``_PRIORITY`` therefore front-loads one
query per operator family — the full ingestion-parser surface (the
reference's core), every §2.5 extension operator, and queries that are new
or were non-green last round — and only then the (already driver-green in
round 1) relational/TPC-H battery. Everything stays registered and locally
verified by tools/check_oracle.py regardless of position.
"""

from __future__ import annotations

#: First-50 curation for the driver's correctness window. Round-7 rotation:
#: CORRECTNESS_r06 went 50/50 green, so every r6-window query has a fresh
#: driver row and none repeats here. What remains stale: 64 queries whose
#: latest driver-green row is r1 (27) or r2 (37) — verified locally every
#: round (tools/check_oracle.py, all 188 green under the strict dtype gate)
#: but not driver-checked since the testdata generator last changed.
#: Round-7 slots therefore go to
#: (a) queries NEW or changed THIS round (prepended as they land; the
#:     AllPairs canonical-order change touches dedup_jaccard_pairs_docs /
#:     dedup_clusters_docs — both already in the stale set below),
#: (b) all 27 r1-era queries (relational/window/scalar battery),
#: (c) the 10 r2-era dedup/knn/temporal operators the r6 verdict queued by
#:     name (they sat just below r6's 50-name cutoff),
#: (d) as many of the remaining 27 r2-era queries as fit (alphabetical;
#:     same age). The residue (from chunk_docs on — each late-r7 addition
#:     in (a) displaces one) leads the round-8 window. Everything stays
#:     registered and locally verified by tools/check_oracle.py
#:     regardless of position.
_PRIORITY = [
    # (a) new in round 7 — must earn a driver-green row
    "funnel_windowed_events",
    "join_size_sample_orders_customer",
    "classifier_report_docs",
    "pareto_quality_docs",
    "bucketed_join_orders_customer",
    "key_skew_profile_events",
    "dedup_keep_best_docs",
    "dedup_clusters_twostar_docs",
    "source_overlap_matrix_docs",
    "rtbf_delete_docs",
    "event_volume_trend_events",
    "dpp_prune_join_events",
    "schema_evolution_orders",
    "assoc_rules_lineitem",
    "event_paths_topk_events",
    "neyman_allocation_events",
    "theta_intersection_events",
    "dedup_nightly_pipeline_docs",
    "ks_critical_drift_docs",
    "minhash_band_recall_docs",
    "robust_scale_events",
    "pmi_bigrams_corpus",
    "auc_quality_classifier_docs",
    "calibration_bins_docs",
    "cms_token_freq_corpus",
    # (b) r1-era: relational / window / scalar battery
    "array_hof_embeddings",
    "cube_order_status_priority",
    "date_functions_orders",
    "except_wealthy_nations",
    "full_outer_join_nation_balance",
    "grouping_sets_orders",
    "lag_lead_user_events",
    "multi_distinct_events",
    "ntile_customer_quartiles",
    "percentile_lineitem",
    "pivot_priority_by_status",
    "rank_dist_orders",
    "rollup_order_priority",
    "session_window_events",
    "time_window_events",
    # (c) r2-era dedup / knn / temporal tail queued by the r6 verdict
    "dedup_minhash_docs",
    "dedup_simhash_pairs",
    "dedup_jaccard_pairs_docs",
    "dedup_clusters_docs",
    "knn_cosine_topk",
    "knn_ivf_topk",
    "kmeans_centroids_embeddings",
    "gapfill_events_locf",
    "asof_join_events_orders",
    "range_join_event_pairs",
    # ---- driver window cutoff (first 50 above) ----
    # displaced to round 8: twelve r1-era battery entries (same age as
    # the rest of (b); the verdict-named (c) trio and the new-in-r7 block
    # outrank them — new queries can only earn a driver row in-window)
    "scalar_functions_part",
    "semi_join_active_customers",
    "setop_customer_supplier_nations",
    "sort_limit_top_orders",
    "sql_correlated_subquery",
    "stats_moments_lineitem",
    "string_agg_segment",
    "unpivot_part_measures",
    "window_range_frame_events",
    "window_running_revenue",
    "window_topk_orders",
    "word_count_docs",
    # (d) remaining r2-era queries, alphabetical (same age)
    "cap_per_source_docs",
    "chunk_docs",
    "decontaminate_docs",
    "dup_ngram_fraction_docs",
    "embedding_centroids_by_label",
    "fingerprint_docs",
    "ingest_metrics_by_source",
    "json_extract_events",
    "lang_id_docs",
    "multimodal_metadata_docs",
    "ndv_hll_events",
    "ngram_topk_corpus",
    "normalize_text_docs",
    "pack_sequences_docs",
    "percentile_approx_lineitem",
    "pii_scrub_docs",
    "quality_filter_docs",
    "quantize_embeddings",
    "regexp_extract_docs",
    "repetition_stats_docs",
    "sample_docs_hash",
    "skew_salted_agg_events",
    "split_docs_hash",
    "text_quality_docs",
    "tfidf_docs",
    "token_count_docs",
    "winnow_fingerprint_docs",
]


def merged_queries() -> dict:
    """All query registries merged, ``_PRIORITY`` names first."""
    from . import advanced, ingestion, relational, tpch, tpch2, tpch3

    pool: dict = {}
    pool.update(relational.QUERIES)
    pool.update(tpch.QUERIES)
    pool.update(tpch2.QUERIES)
    pool.update(tpch3.QUERIES)
    pool.update(advanced.QUERIES)
    pool.update(ingestion.QUERIES)
    try:
        from ..operators import registry as ops_registry

        pool.update(ops_registry.QUERIES)
    except ImportError:
        pass
    try:
        from ..operators import registry2 as ops_registry2

        pool.update(ops_registry2.QUERIES)
    except ImportError:
        pass

    missing = [name for name in _PRIORITY if name not in pool]
    if missing:  # a typo here would silently drop a query out of the window
        raise KeyError(f"_PRIORITY names not in any registry: {missing}")
    out: dict = {name: pool.pop(name) for name in _PRIORITY}
    out.update(pool)
    return out
