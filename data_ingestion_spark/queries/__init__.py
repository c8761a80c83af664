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

#: First-50 curation for the driver's correctness window. Round-8 rotation:
#: CORRECTNESS_r07 went 50/50 green, so every r7-window query has a fresh
#: driver row. The ONLY remaining staleness is the 39 queries whose latest
#: driver-green row is r1/r2 (verified locally every round by
#: tools/check_oracle.py under the strict dtype gate, but not
#: driver-checked since the testdata generator last changed). Round-8
#: slots therefore go to
#: (a) queries NEW or materially CHANGED this round (prepended as they
#:     land — a changed query must re-earn its driver row), then
#: (b) ALL 39 r1/r2-era queries (alphabetical; same age) — this clears
#:     the staleness queue completely: afterward no registered query's
#:     latest driver-green row is older than two rounds.
#: 39 + |a| <= 50 is maintained by keeping this round's new/changed set
#: at <= 11 names. Everything stays registered and locally verified by
#: tools/check_oracle.py regardless of position.
_PRIORITY = [
    # (a) new or changed in round 8 — must (re-)earn a driver-green row
    # (prepended as they land)
    "dedup_embedding_pairs",  # r8 fold-lean verify (bit-identical, replanned)
    "knn_lsh_pairs",  # same rewrite
    "dedup_nightly_pipeline_docs",  # r8 bucketed stored index
    "minhash_band_recall_docs",  # r8 fused shingle pipeline
    "rtbf_delete_dv_docs",  # NEW r8: deletion-vector RTBF tier
    "skew_autogate_join_events",  # NEW r8: auto-gated skew salting
    "funnel_windowfunnel_exact_events",  # NEW r8: exact sliding-anchor windowFunnel
    "ndcg_ivf_retrieval_qc",  # NEW r8: retrieval rank-quality QC
    "dp_noisy_counts_docs",  # NEW r8: DP geometric-mechanism release
    "dedup_containment_pairs_docs",  # NEW r8: asymmetric containment dedup
    "diversity_index_sources",  # NEW r8: per-source diversity indices
    # (b) the full r1/r2-era staleness queue (39) — clears it in one window
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
    "scalar_functions_part",
    "semi_join_active_customers",
    "setop_customer_supplier_nations",
    "skew_salted_agg_events",
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
    "window_running_revenue",
    "window_topk_orders",
    "winnow_fingerprint_docs",
    "word_count_docs",
    # ---- driver window cutoff (first 50 above; (a)+(b) <= 50) ----
    # r8-late additions below the cutoff — locally 3-SF-verified; they
    # lead the ROUND-9 window (new queries can only earn a driver row
    # in-window, and this round's 50 slots are spoken for):
    "sessionize_events",
    "benford_digits_orders",
    "tokenizer_fertility_langs",
    "range_partition_plan_orders",
    "rrf_fusion_topk_docs",
    "item_cf_similarity_suppliers",
    "attribution_last_touch_events",
    "k_anonymity_docs",
    "watermark_lateness_profile_events",
    "cusum_changepoint_events",
    "knn_ivf_kmeans_topk",
    "semantic_drift_labels",
    "markov_next_event_accuracy",
    "ht_sampled_total_orders",
    "twap_user_values",
    "funnel_time_to_convert_events",
    "column_profile_orders",
    "session_cooccurrence_lift_events",
    "minhash_band_precision_docs",
    "rfm_segments_customers",
]


def merged_queries() -> dict:
    """All query registries merged, ``_PRIORITY`` names first."""
    from . import advanced, ingestion, relational, tpch, tpch2, tpch3

    sources = [relational, tpch, tpch2, tpch3, advanced, ingestion]
    try:
        from ..operators import registry as ops_registry

        sources.append(ops_registry)
    except ImportError:
        pass
    try:
        from ..operators import registry2 as ops_registry2

        sources.append(ops_registry2)
    except ImportError:
        pass
    pool: dict = {}
    for mod in sources:
        # A name registered twice would SILENTLY shadow the earlier
        # implementation (dict.update) — the r8 duplicate
        # retention_cohorts_events got masked exactly this way. Refuse
        # instead: every query name must be registered exactly once.
        clash = set(pool) & set(mod.QUERIES)
        if clash:
            raise KeyError(
                f"duplicate query registrations in {mod.__name__}: "
                f"{sorted(clash)}"
            )
        pool.update(mod.QUERIES)

    missing = [name for name in _PRIORITY if name not in pool]
    if missing:  # a typo here would silently drop a query out of the window
        raise KeyError(f"_PRIORITY names not in any registry: {missing}")
    out: dict = {name: pool.pop(name) for name in _PRIORITY}
    out.update(pool)
    return out
