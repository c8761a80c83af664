"""Shared column-expression helpers (all JVM-side, codegen-friendly).

These are the text/vector primitives the §2.5 extension operators compose:
tokenization, shingling, deterministic 60-bit hashes, cosine similarity.
Each helper returns a Column built from pyspark.sql.functions only — no
Python UDFs — so every operator using them stays inside whole-stage codegen
and scales with the executor count, not the driver.
"""

from .text_functions import (
    tokens,
    bpe_ish_tokens,
    word_shingles,
    md5_hash60,
    stopword_hits,
)
from .vector_functions import cosine_similarity, dot, l2_norm

__all__ = [
    "tokens",
    "bpe_ish_tokens",
    "word_shingles",
    "md5_hash60",
    "stopword_hits",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
