"""Streaming SimHash near-dup guard: flag arriving documents that are
within a Hamming-distance budget of anything already seen, without ever
rescanning the corpus.

The batch ladder's SimHash tier (operators/dedup.py `simhash` +
`simhash_hamming_pairs`) re-derives all pairs from the full corpus; this is
its streaming twin for the ingest front door. Same signature, same banding,
same pigeonhole guarantee — a document that near-duplicates an earlier one
(hamming ≤ n_bands − 1) must agree with it on at least one band, so only
band-bucket members are ever compared.

Dataflow (all stateless until the single stateful stage):

1. `simhash_expr` computes the 60-bit signature as a pure per-row
   expression — higher-order `transform`/`aggregate` over the token array,
   one md5 per token, NO groupBy — bit-identical to the batch `simhash`
   aggregation (pytest-pinned), so stream and batch agree on identity.
2. Each row explodes into its 4 band keys (15-bit chunks, exactly the
   batch banding).
3. `transformWithStateInPandas` keyed by band key holds a ListState of
   (doc_id, simhash) bucket members; each arrival popcount-verifies
   against its bucket and emits one row per band: matched → the earliest
   matching member and the exact hamming distance, else kept=true.

A doc appearing in 4 buckets yields up to 4 rows; `is_near_dup` =
any(kept=false) downstream (one grouped agg in the sink / consumer —
kept as a separate step because chaining a second stateful aggregation
behind transformWithState in one streaming query is restricted).

Scale notes:
- State is O(distinct band buckets × members) in RocksDB, bounded by
  `ttl_ms` (the dedup-horizon knob, same trade as dedup_stream.py).
- Bucket membership is capped at `max_bucket` members (default 64):
  a pathological hot bucket (e.g. the all-zeros signature of empty-ish
  docs) degrades to first-N comparisons instead of O(bucket²) blowup —
  the cap is the streaming analogue of the batch tier's block design,
  and capped rows are still emitted (kept=true, capped=true) so the
  consumer can route them to a batch re-check.
- Comparisons per arrival ≤ 4 × max_bucket popcounts, independent of
  corpus size.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from ..functions import md5_hash60, tokens

SIMHASH_BITS = 60
BAND_BITS = 15
N_BANDS = SIMHASH_BITS // BAND_BITS

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("band_key", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("kept", T.BooleanType()),
        T.StructField("match_id", T.LongType()),
        T.StructField("hamming", T.LongType()),
        T.StructField("capped", T.BooleanType()),
    ]
)

_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def simhash_expr(text_col: Column | str) -> Column:
    """60-bit SimHash as a pure per-row expression (no shuffle).

    Bit-identical to the batch `operators.dedup.simhash` grouped
    aggregation: one md5_hash60 per token, per-bit majority vote, bit i
    set iff the vote is strictly positive. Stateless, so it runs on a
    stream before any stateful stage. NULL for documents with no tokens
    (no votes — the batch tier drops those rows too).
    """
    toks = tokens(text_col)
    # materialize one md5 per token FIRST; inside the second transform the
    # 60 bit-probes reference the lambda VARIABLE h (cheap lookup), not a
    # duplicated md5 subtree — interpreted HOFs get no subexpression
    # elimination, so inlining would cost 60 md5s per token
    hashes = F.transform(toks, lambda t: md5_hash60(t))
    vote_arrays = F.transform(
        hashes,
        lambda h: F.array(
            *[
                F.when(
                    F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for i in range(SIMHASH_BITS)
            ]
        ),
    )
    votes = F.aggregate(
        vote_arrays,
        F.array_repeat(F.lit(0), SIMHASH_BITS),
        lambda acc, va: F.zip_with(acc, va, lambda a, b: a + b),
    )
    weights = F.array(*[F.lit(1 << i).cast("long") for i in range(SIMHASH_BITS)])
    sig_terms = F.zip_with(
        votes, weights, lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long"))
    )
    sig = F.aggregate(sig_terms, F.lit(0).cast("long"), lambda a, b: a + b)
    return F.when(F.size(toks) > 0, sig)


def band_keys(sig: Column) -> Column:
    """The signature's 4 pigeonhole band keys, as 'band:key' strings
    (string keys keep the state-store key schema engine-portable)."""
    return F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(bi),
                F.shiftright(sig, bi * BAND_BITS).bitwiseAND(
                    F.lit((1 << BAND_BITS) - 1)
                ),
            )
            for bi in range(N_BANDS)
        ]
    )


class StreamingNearDup(StatefulProcessor):
    """Per band bucket: popcount-verify each arrival against stored
    members (earliest match wins, exact hamming emitted), then append it
    — unless the bucket is at `max_bucket`, in which case the arrival is
    emitted kept=true/capped=true and NOT stored."""

    def __init__(
        self,
        max_hamming: int = 3,
        max_bucket: int = 64,
        ttl_ms: Optional[int] = None,
    ) -> None:
        self._max_hamming = max_hamming
        self._max_bucket = max_bucket
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._members = handle.getListState("members", _MEMBER_SCHEMA, self._ttl_ms)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        members = [(int(d), int(s)) for d, s in self._members.get()]
        out = {c: [] for c in ("doc_id", "kept", "match_id", "hamming", "capped")}
        appended = False
        for pdf in rows:
            for doc_id, sig in zip(pdf["doc_id"], pdf["simhash"]):
                doc_id, sig = int(doc_id), int(sig)
                match = next(
                    (
                        (mid, (msig ^ sig).bit_count())
                        for mid, msig in members
                        if (msig ^ sig).bit_count() <= self._max_hamming
                    ),
                    None,
                )
                capped = match is None and len(members) >= self._max_bucket
                if match is None and not capped:
                    members.append((doc_id, sig))
                    appended = True
                out["doc_id"].append(doc_id)
                out["kept"].append(match is None)
                out["match_id"].append(match[0] if match else None)
                out["hamming"].append(match[1] if match else None)
                out["capped"].append(capped)
        if appended:
            self._members.put([(d, s) for d, s in members])
        yield pd.DataFrame(
            {
                "band_key": [key[0]] * len(out["doc_id"]),
                "doc_id": out["doc_id"],
                "kept": pd.array(out["kept"], dtype="boolean"),
                "match_id": pd.array(out["match_id"], dtype="Int64"),
                "hamming": pd.array(out["hamming"], dtype="Int64"),
                "capped": pd.array(out["capped"], dtype="boolean"),
            }
        )

    def close(self) -> None:
        pass


def neardup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 64,
    ttl_ms: Optional[int] = None,
) -> DataFrame:
    """Wire the guard: signature → band explode → keyed stateful verify.

    ``docs`` is a streaming DataFrame with an id and a text column.
    Returns per-(band, doc) rows; a document is a near-dup iff ANY of its
    rows has kept=false (aggregate in the consumer). Requires the RocksDB
    state store provider, like dedup_stream.
    """
    sig = docs.select(
        F.col(id_col).alias("doc_id"), simhash_expr(F.col(text_col)).alias("simhash")
    ).filter(F.col("simhash").isNotNull())
    banded = sig.select(
        "doc_id", "simhash", F.explode(band_keys(F.col("simhash"))).alias("band_key")
    )
    return banded.groupBy("band_key").transformWithStateInPandas(
        statefulProcessor=StreamingNearDup(max_hamming, max_bucket, ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None" if ttl_ms is None else "ProcessingTime",
    )
