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

    Built as ``zip_with`` over k length-aligned ``slice``s of the token array
    (k slices per ROW, then one element-wise concat per window) rather than
    ``transform(sequence(...), i -> concat_ws(slice(tokens, i, k)))`` which
    allocates a per-WINDOW slice. Higher-order functions are interpreted (not
    codegen'd) in Spark, so minimizing per-window work matters: the zip_with
    form benchmarks ~6× faster on 300-char documents.

    Empty when the document has fewer than k tokens. Pass a *materialized*
    token column (project tokens() in a prior select) — inlining the
    tokenizer expression here replicates it k+2 times per row.
    """
    n = F.size(tokens_col)
    m = n - (k - 1)
    acc = F.slice(tokens_col, 1, m)
    for j in range(1, k):
        acc = F.zip_with(
            acc, F.slice(tokens_col, j + 1, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(n < k, F.array().cast("array<string>")).otherwise(acc)


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
