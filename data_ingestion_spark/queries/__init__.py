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

#: First-50 curation for the driver's correctness window. Round-4 state:
#: after r1–r3, every registered query EXCEPT bpe_encode_docs (registered
#: post-window in r3) has ≥1 driver-green row. Round-4 slots therefore go
#: to (a) the ingest core (always windowed), (b) bpe_encode_docs — top of
#: the list, per the round-3 verdict, (c) queries whose implementation
#: changed this round (BPE fixpoint rework, bm25 guard), (d) queries new
#: this round, (e) rotation of the longest-unverified r1/r2 queries.
#: Everything stays registered and locally verified by
#: tools/check_oracle.py regardless of position.
_PRIORITY = [
    # (b) the one query with no driver row ever + (c) changed this round
    "bpe_encode_docs",
    "bm25_topk_docs",
    # (d) new in round 4
    "ingest_pdf_docs",
    "zorder_prune_demo_events",
    "lm_perplexity_docs",
    "bpe_train_merges_corpus",
    "dedup_image_phash_docs",
    "dedup_audio_fingerprint_docs",
    "pca_top_component_embeddings",
    "pca_project_embeddings",
    "pca_top2_components_embeddings",
    "merge_upsert_customers",
    "stratified_split_docs",
    "nfc_normalize_docs",
    "incremental_agg_orders",
    "compact_small_files_docs",
    "shard_balance_docs",
    "heavy_hitters_docs",
    "ingest_html_docs",
    "time_travel_orders",
    "char_entropy_docs",
    "dedup_incremental_docs",
    "vocab_coverage_docs",
    "corpus_build_pipeline_docs",
    "table_changes_orders",
    "knn_two_stage_topk",
    "join_cardinality_orders_customer",
    "matryoshka_qc_embeddings",
    "backfill_partitions_events",
    "triangle_count_suppliers",
    "event_transitions_events",
    "pit_join_events",
    "temperature_sample_docs",
    "winsorize_events",
    "histogram_lineitem",
    # (a) ingestion-parser surface (SURVEY.md §2.1-§2.3 — the reference's
    # core; always windowed)
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
    # (e) rotation: driver-green only in r1/r2 windows — re-verify the
    # longest-unseen relational/TPC-H/LLM shapes under the current data
    "agg_pricing_summary",
    "scan_filter_project",
    "join_revenue_by_segment",
    "join_multi_region",
    "anti_join_inactive_customers",
    "window_topk_orders",
    "sort_limit_top_orders",
    "rollup_order_priority",
    "json_extract_events",
    "time_window_events",
    "session_window_events",
    "scalar_functions_part",
    "dedup_exact_docs",
    "dedup_minhash_docs",
    "knn_cosine_topk",
    "knn_ivf_topk",
    "multimodal_metadata_docs",
    "text_quality_docs",
    "lang_id_docs",
    "token_count_docs",
    "fingerprint_docs",
    "tfidf_docs",
    "percentile_lineitem",
    "percentile_approx_lineitem",
    "multi_distinct_events",
    "asof_join_events_orders",
    "range_join_event_pairs",
    "skew_salted_agg_events",
    "winnow_fingerprint_docs",
    "chunk_docs",
    "pii_scrub_docs",
    "decontaminate_docs",
    "repetition_stats_docs",
    "quality_filter_docs",
    "ngram_topk_corpus",
    "sample_docs_hash",
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
