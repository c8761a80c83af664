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

#: First-50 curation for the driver's correctness window. Round-3 rotation
#: goal: every registered query has at least one driver-green row across
#: CORRECTNESS_r01-r03. Slots go to (a) the ingest core, (b) the 19 queries
#: never yet inside a driver window, (c) queries whose implementation
#: changed this round, (d) queries new this round. Round-1/2-green shapes
#: rotate below the cap and stay locally verified by tools/check_oracle.py.
_PRIORITY = [
    # Ingestion-parser surface (SURVEY.md §2.1-§2.3 — the reference's core;
    # always windowed)
    "ingest_csv_docs",
    "ingest_json_docs",
    "ingest_txt_docs",
    "ingest_xml_docs",
    "ingest_excel_docs",
    "ingest_audit_log",
    "ingest_logfmt_docs",
    # Never driver-verified before round 3 (green locally in r1/r2 but
    # always below the 50-slot cap)
    "tpch_q6_forecast_revenue",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode",
    "tpch_q16_parts_supplier",
    "tpch_q21_waiting_supplier",
    "setop_multiset_priorities",
    "map_functions_events",
    "regression_stats_lineitem",
    "variant_props_events",
    "funnel_conversion_events",
    "retention_cohorts_events",
    "dedup_simhash_docs",
    "knn_ivf_exact_topk",
    "mix_corpus_docs",
    "corpus_stats_by_lang",
    "zipf_slope_corpus",
    "fuzzy_match_parts",
    "skew_salted_join_events",
    "dq_checks_star_schema",
    # Implementation changed in round 3 — re-verify under the driver:
    # covariance (Gram mapInPandas + cov_micro; the r2 red row), LSH slim
    # band shuffle, pagerank femto-integer inflow, inverted_index AQE join
    "covariance_embeddings",
    "dedup_embedding_pairs",
    "knn_lsh_pairs",
    "pagerank_supplier_graph",
    "inverted_index_terms",
    # New in round 3 — names appended here as each lands in the registry
    "s3_event_decode_docs",
    "ingest_orc_docs",
    "ingest_avro_docs",
    "paragraph_dedup_docs",
    "snapshot_diff_customers",
    "scd2_customers",
    "semantic_dedup_embeddings",
    "bm25_topk_docs",
    "zorder_layout_events",
    "bloom_prune_join_events",
    "anomaly_zscore_events",
    "classifier_score_docs",
    "curriculum_bins_docs",
    "dedup_substring_docs",
    "bpe_merge_candidates_corpus",
    "batch_by_length_docs",
    "llm_data_pipeline_docs",
    "dedup_embedding_recall",
    "corpus_datasheet_docs",
    # position 51 — deliberately one past the driver's 50-slot window this
    # round (every windowed query needs its first-or-changed verification
    # row more urgently); rotate into the round-4 window.
    "bpe_encode_docs",
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
