"""Streaming heavy hitters: sharded Misra-Gries on the Spark 4
arbitrary-state API (``transformWithStateInPandas``).

The batch tier (operators/sketch.heavy_hitters) sketches then verifies
exactly; a stream cannot re-scan, so the streaming tier maintains the
sketch AS the state. Tokens are sharded by hash (the grouping key), and
each shard keeps a weighted Misra-Gries counter table of size ``k`` in a
ValueState:

- every occurrence of a token lands in exactly ONE shard, so a token's
  within-shard frequency IS its global frequency — the per-shard MG
  support guarantee (any token with freq > shard_total/(k+1) survives)
  is therefore a guarantee about GLOBAL heavy hitters, strictly stronger
  than one global MG of size k·n_shards;
- counter values are lower bounds (decrements only ever subtract), the
  classic MG contract the test pins against the exact batch counts;
- state per shard is two length-≤k arrays — O(k·n_shards) total,
  independent of the stream length.

Emits each shard's full counter table every micro-batch (Update mode),
tagged with the shard's running batch sequence so a consumer (or test)
can select the latest table per shard. Requires the RocksDB state store
provider, same as running_totals.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("emit_seq", T.LongType()),
        T.StructField("token", T.StringType()),
        T.StructField("count_lb", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("emit_seq", T.LongType()),
        T.StructField("toks", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)


def _mg_merge(counters: dict, token: str, weight: int, k: int) -> None:
    """Weighted Misra-Gries insert: add, then while the table exceeds k,
    subtract the minimum counter from everything and drop zeros — each
    pass removes at least one entry, and total decrement mass is bounded
    by shard_total/(k+1) (the standard weighted-MG argument)."""
    counters[token] = counters.get(token, 0) + weight
    while len(counters) > k:
        m = min(counters.values())
        for t in list(counters):
            counters[t] -= m
            if counters[t] <= 0:
                del counters[t]


class ShardedMisraGries(StatefulProcessor):
    def __init__(self, k: int = 16):
        self._k = int(k)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("mg", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if self._state.exists():
            seq, toks, counts = self._state.get()
            counters = dict(zip(list(toks), [int(c) for c in counts]))
        else:
            seq, counters = 0, {}
        for pdf in rows:
            # batch pre-aggregation: one weighted insert per distinct
            # token in the micro-batch, not one per occurrence
            for token, weight in pdf["token"].value_counts().items():
                _mg_merge(counters, str(token), int(weight), self._k)
        seq += 1
        self._state.update((seq, list(counters.keys()), list(counters.values())))
        out = pd.DataFrame(
            {
                "shard": [int(shard)] * len(counters),
                "emit_seq": [seq] * len(counters),
                "token": list(counters.keys()),
                "count_lb": list(counters.values()),
            }
        )
        yield out

    def close(self) -> None:
        pass


def heavy_hitters_stream(
    docs: DataFrame, text_col: str = "text", n_shards: int = 8, k: int = 16
) -> DataFrame:
    """Wire the processor: explode tokens → shard by token hash →
    transformWithStateInPandas. The shard key is a pure function of the
    token, so re-partitioning between micro-batches can never split one
    token's stream across shards."""
    from ..functions import tokens

    tok = docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
    sharded = tok.withColumn(
        "shard", F.pmod(F.xxhash64("token"), F.lit(n_shards)).cast("long")
    )
    return sharded.groupBy("shard").transformWithStateInPandas(
        statefulProcessor=ShardedMisraGries(k=k),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
