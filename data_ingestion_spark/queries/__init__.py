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

#: First-50 curation for the driver's correctness window. One entry per
#: operator family; previously-green redundant shapes deliberately sort last.
_PRIORITY = [
    # Ingestion-parser surface (SURVEY.md §2.1-§2.3 — the reference's core)
    "ingest_csv_docs",
    "ingest_json_docs",
    "ingest_txt_docs",
    "ingest_xml_docs",
    "ingest_excel_docs",
    "ingest_audit_log",
    # §2.5 extension operators (dedup / similarity / text / sampling /
    # temporal / skew / multimodal)
    "dedup_exact_docs",
    "dedup_jaccard_pairs_docs",
    "dedup_minhash_docs",
    # simhash family: the banded-pairs variant carries the window slot;
    # the signature query stays locally verified below the cap
    "dedup_simhash_pairs",
    "dedup_embedding_pairs",
    "knn_cosine_topk",
    "knn_lsh_pairs",
    # ivf family: the probe-limited variant carries the slot (the exact
    # anchor shares its entire plumbing)
    "knn_ivf_topk",
    "text_quality_docs",
    "lang_id_docs",
    "token_count_docs",
    "fingerprint_docs",
    "tfidf_docs",
    "winnow_fingerprint_docs",
    "dedup_clusters_docs",
    "sample_docs_hash",
    "cap_per_source_docs",
    "normalize_text_docs",
    "embedding_centroids_by_label",
    "kmeans_centroids_embeddings",
    "multimodal_metadata_docs",
    "skew_salted_agg_events",
    "asof_join_events_orders",
    "range_join_event_pairs",
    # Non-green in round 1 (hash-fail / no-oracle), fixed this round
    "json_extract_events",
    "ingest_metrics_by_source",
    "ndv_hll_events",
    # New this round
    "percentile_approx_lineitem",
    "tpch_q2_min_cost_supplier",
    # New training-data pipeline operators take the window slots of the
    # remaining new TPC-H shapes (q6/q11/q12/q16/q21): the TPC-H *family*
    # already has 16 driver-green rows across rounds 1-2, while each of
    # these is a distinct operator family with no green row yet. The
    # demoted shapes stay registered + locally verified below the cap.
    "pack_sequences_docs",
    "dup_ngram_fraction_docs",
    "inverted_index_terms",
    "split_docs_hash",
    "quantize_embeddings",
    # Strongest new round-2 families take the slots of the three
    # same-family variants demoted above (simhash_docs, ivf_exact,
    # mix_corpus — all still registered + locally verified)
    "pagerank_supplier_graph",
    "covariance_embeddings",
    "gapfill_events_locf",
    "chunk_docs",
    "pii_scrub_docs",
    "decontaminate_docs",
    # Past the round-1 cap (registered position 51) — now inside the window
    "regexp_extract_docs",
    # New this round: corpus quality battery (Gopher/C4 filters, n-gram
    # stats). These take the window slots that round-1-green relational
    # shapes (agg_pricing_summary / join_revenue_by_segment /
    # percentile_lineitem) filled — those already have driver-green rows in
    # CORRECTNESS_r01.json and stay locally verified below the cap.
    "repetition_stats_docs",
    "quality_filter_docs",
    "ngram_topk_corpus",
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

    missing = [name for name in _PRIORITY if name not in pool]
    if missing:  # a typo here would silently drop a query out of the window
        raise KeyError(f"_PRIORITY names not in any registry: {missing}")
    out: dict = {name: pool.pop(name) for name in _PRIORITY}
    out.update(pool)
    return out
