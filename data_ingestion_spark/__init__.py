"""data_ingestion_spark — a PySpark-native ingestion + analytics engine.

A from-scratch rebuild of the capabilities of ``hicham-mdous/data_ingestion``
(an event-driven S3 → parse → NoSQL file-ingestion pipeline; see SURVEY.md for
the full structural analysis) on idiomatic Spark:

- ``sources``   — file readers replicating the reference parsers
                  (CSV/JSON/TXT/XML/Excel, reference: src/infrastructure/parsers/)
- ``rules``     — regex config-rule routing, longest-pattern-wins
                  (reference: src/infrastructure/mongodb/config_repo.rs:26-83)
- ``pipeline``  — the 5-step ingest dataflow: match → fetch → detect → parse →
                  enrich/log/sink (reference: src/application/ingestion_service.rs:36-127)
- ``sinks``     — parquet (test harness) + document-store sinks
                  (reference: src/infrastructure/{mongodb,couchdb,documentdb}/data_repo.rs)
- ``streaming`` — Structured Streaming event loop (reference: src/ecs_service.rs:113-174,
                  upgraded from at-most-once SQS polling to checkpointed exactly-once)
- ``operators`` — LLM-data-pipeline extensions (dedup, similarity search,
                  text analysis, multimodal columns) — not in the reference;
                  mandated by the project north star, designed for 100 TB scale
- ``queries``   — the relational query battery used by the driver contract

Everything is public-API-only PySpark (DataFrame/SQL + Pandas UDFs where the
built-ins genuinely can't express the semantics).
"""

__version__ = "0.1.0"
