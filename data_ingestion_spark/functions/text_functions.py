"""Text primitives as pure Column expressions.

Every function here has an exactly-equivalent ANSI-SQL formulation (used by
the DuckDB oracles in operators/registry.py) — that parity is what makes the
custom operators correctness-checkable, so keep the two in sync when editing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish tokenizer: letter runs, digit runs, or single non-space symbols —
#: the standard pre-tokenization shape (public GPT-2/BPE style), regex-only.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of lowercased text (empty strings filtered)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def bpe_ish_tokens(col: Column | str) -> Column:
    """Regex pre-tokenization over lowercased text (BPE_ISH_PATTERN)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), 0)


def word_shingles(tokens_col: Column, k: int = 3) -> Column:
    """k-word shingles: space-joined sliding windows over a token array.

    ``transform(sequence(1, size-k+1), i -> concat_ws(' ', slice(tokens, i, k)))``
    — empty when the document has fewer than k tokens.
    """
    n = F.size(tokens_col)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens_col, i, k)),
        )
    )


def md5_hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5.

    60 bits keeps the value positive in a signed 64-bit long in BOTH Spark
    and DuckDB (oracle: ``('0x' || substr(md5(x), 1, 15))::BIGINT``), which is
    what makes SimHash/fingerprint operators cross-engine checkable.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def stopword_hits(tokens_col: Column, stopwords: list[str]) -> Column:
    """How many tokens are in the given stopword list (with repeats)."""
    arr = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(tokens_col, lambda t: F.array_contains(arr, t)))
