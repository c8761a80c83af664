"""LLM-data-pipeline extension operators (SURVEY.md §2.5).

Not present in the reference (which has no per-record analytics at all) —
mandated by the project north star: deduplication, similarity search, text
analysis, multimodal columns, each designed for 100 TB scale and expressed
Spark-first (built-in functions > Pandas UDF > never driver loops).
"""
