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

#: First-50 curation for the driver's correctness window. Round-6 rotation:
#: after r1–r5, 169/170 queries have ≥1 driver-green row, but 81 were last
#: driver-checked in rounds 1–2 against since-regenerated testdata (the r5
#: window was byte-identical to r4's). Round-6 slots therefore go to
#: (a) the ingest core (SURVEY §2.1–§2.3, always windowed),
#: (b) queries NEW or changed THIS round (8 new operators: prefix-sum id
#:     manifests ×2, KN bigram LM, PSI drift, trajectories, PQ/ADC +
#:     IVF-PQ, stats-manifest pruning; plus merge_upsert's integer-cents
#:     rename, zorder's new oracle-paired selectivity output, zipf's
#:     de-globalized rank, two-stage retrieval's adaptive shortlist,
#:     matryoshka's zero-energy guard),
#: (c) 27 of the 81 oldest (r1/r2-only) queries — the TPC-H battery head
#:     and the dedup/knn/temporal families. The 8 operators added LATE in
#:     round 6 (url_dedup … ewma) take the front slots, which pushes the
#:     knn/kmeans/temporal rotation tail (knn_cosine_topk, knn_ivf_topk,
#:     kmeans_centroids_embeddings, gapfill_events_locf,
#:     asof_join_events_orders, range_join_event_pairs,
#:     session_window_events, time_window_events) just below the 50-name
#:     cutoff — they lead the round-7 window together with the remaining
#:     ~46 r1/r2-era queries (oldest first). Everything stays registered
#:     and locally verified by tools/check_oracle.py regardless of
#:     position.
_PRIORITY = [
    # (b) new or changed this round — must earn a driver-green row
    "url_dedup_docs",
    "dsir_importance_docs",
    "nb_lang_confusion_docs",
    "wilson_quality_sources",
    "weighted_sample_docs",
    "unimax_mixture_sources",
    "hll_intersection_events",
    "ewma_user_values",
    "ks_drift_docs",
    "chi2_lang_source_docs",
    "stats_prune_scan_orders",
    "assign_ids_orders",
    "kn_bigram_lm_corpus",
    "psi_drift_docs",
    "trajectory_events",
    "pq_adc_topk_embeddings",
    "pq_ivf_topk_embeddings",
    "shuffle_ids_docs",
    "merge_upsert_customers",
    "zorder_prune_demo_events",
    "zipf_slope_corpus",
    "knn_two_stage_topk",
    "matryoshka_qc_embeddings",
    # (a) ingestion-parser surface (the reference's core; always windowed)
    "ingest_csv_docs",
    "ingest_json_docs",
    "ingest_txt_docs",
    "ingest_xml_docs",
    "ingest_excel_docs",
    "ingest_audit_log",
    "ingest_logfmt_docs",
    "ingest_orc_docs",
    "ingest_avro_docs",
    "s3_event_decode_docs",
    # (c) rotation: last driver-green in r1/r2 — TPC-H battery head
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_exists_priority",
    "tpch_q5_local_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q13_custdist",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity",
    "tpch_q18_large_volume",
    "tpch_q19_disjunctive",
    "tpch_q20_excess_volume",
    "tpch_q22_idle_wealthy",
    # (c) rotation: dedup / similarity families
    "dedup_exact_docs",
    "dedup_minhash_docs",
    "dedup_simhash_pairs",
    "dedup_jaccard_pairs_docs",
    "dedup_clusters_docs",
    "knn_cosine_topk",
    "knn_ivf_topk",
    "kmeans_centroids_embeddings",
    # (c) rotation: temporal / window / agg shapes
    "gapfill_events_locf",
    "asof_join_events_orders",
    "range_join_event_pairs",
    # ---- driver window cutoff (first 50 above) ----
    "session_window_events",
    "time_window_events",
    "window_topk_orders",
    "window_running_revenue",
    "percentile_lineitem",
    "percentile_approx_lineitem",
    "multi_distinct_events",
    "skew_salted_agg_events",
    # Round-7 window queue: the remaining 46 r1/r2-era queries, oldest
    # first. Listing them here keeps next round's rotation a reorder, not
    # a rewrite; they are all locally gated every round regardless.
    "array_hof_embeddings",
    "cap_per_source_docs",
    "chunk_docs",
    "cube_order_status_priority",
    "date_functions_orders",
    "decontaminate_docs",
    "dup_ngram_fraction_docs",
    "embedding_centroids_by_label",
    "except_wealthy_nations",
    "fingerprint_docs",
    "full_outer_join_nation_balance",
    "grouping_sets_orders",
    "ingest_metrics_by_source",
    "json_extract_events",
    "lag_lead_user_events",
    "lang_id_docs",
    "multimodal_metadata_docs",
    "ndv_hll_events",
    "ngram_topk_corpus",
    "normalize_text_docs",
    "ntile_customer_quartiles",
    "pack_sequences_docs",
    "pii_scrub_docs",
    "pivot_priority_by_status",
    "quality_filter_docs",
    "quantize_embeddings",
    "rank_dist_orders",
    "regexp_extract_docs",
    "repetition_stats_docs",
    "rollup_order_priority",
    "sample_docs_hash",
    "scalar_functions_part",
    "semi_join_active_customers",
    "setop_customer_supplier_nations",
    "sort_limit_top_orders",
    "split_docs_hash",
    "sql_correlated_subquery",
    "stats_moments_lineitem",
    "string_agg_segment",
    "text_quality_docs",
    "tfidf_docs",
    "token_count_docs",
    "unpivot_part_measures",
    "window_range_frame_events",
    "winnow_fingerprint_docs",
    "word_count_docs",
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
