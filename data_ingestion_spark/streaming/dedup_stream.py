"""Streaming exact dedup: first-arrival-wins over an unbounded stream via
``transformWithStateInPandas`` (the Spark 4 arbitrary-state API, same
pattern as running_totals.py).

The batch dedup ladder (operators/dedup.py) re-derives winners from the
full corpus; on a continuously-arriving stream that rescan is the thing
you cannot afford. Here the seen-set IS the state store: keyed by the
content fingerprint, one tiny ValueState per distinct key records the
winner and a replay counter, so each micro-batch touches only its own
keys.

Scale notes:
- State is O(distinct fingerprints) and lives in RocksDB (required
  provider for this API) — it spills to disk, not executor heap.
- ``ttl_ms`` bounds state at web scale: a fingerprint unseen for the TTL
  ages out and a later replay is re-admitted. That makes the dedup
  horizon an explicit knob (exactly the Bloom-window trade every
  streaming dedup service makes) instead of an unbounded set.
- Emitted rows carry ``kept`` so the downstream sink routes winners vs
  replays without a second pass; n_dup supports replay-rate monitoring.

Reference contrast: the reference pipeline (src/ecs_service.rs) ingests
every delivered file unconditionally — replayed S3 events become
duplicate rows. This operator is the streaming guard in front of that
path.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("kept", T.BooleanType()),
        T.StructField("n_dup", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("winner_id", T.LongType()),
        T.StructField("n_dup", T.LongType()),
    ]
)


class StreamingDedup(StatefulProcessor):
    """First arrival of each fingerprint is emitted with ``kept=True``;
    every replay (same key, any later row — including later rows of the
    SAME micro-batch) is emitted with ``kept=False`` and bumps the
    replay counter. Within a batch, the winner is the first row in
    arrival order — deterministic when the upstream attaches an ordered
    id (sort the batch before the groupBy if strict min-id winners are
    required)."""

    def __init__(self, ttl_ms: Optional[int] = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState("seen", _STATE_SCHEMA, self._ttl_ms)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            winner, n_dup = self._seen.get()
        else:
            winner, n_dup = None, 0
        out_ids, out_kept, out_dup = [], [], []
        for pdf in rows:
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                if winner is None:
                    winner = doc_id
                    out_ids.append(doc_id)
                    out_kept.append(True)
                else:
                    n_dup += 1
                    out_ids.append(doc_id)
                    out_kept.append(False)
                out_dup.append(n_dup)
        self._seen.update((winner, n_dup))
        yield pd.DataFrame(
            {
                "fp": [key[0]] * len(out_ids),
                "doc_id": out_ids,
                "kept": out_kept,
                "n_dup": out_dup,
            }
        )

    def close(self) -> None:
        pass


def dedup_stream(
    docs: DataFrame,
    fp_col: str = "fp",
    id_col: str = "doc_id",
    ttl_ms: Optional[int] = None,
) -> DataFrame:
    """Wire the processor: groupBy fingerprint → transformWithStateInPandas.

    ``docs`` is a streaming DataFrame carrying a precomputed fingerprint
    column (md5 of normalized text — reuse the batch ladder's fingerprint
    expressions so stream and batch dedup agree on identity). Requires the
    RocksDB state store provider, like running_totals_stream.
    """
    return (
        docs.select(
            docs[fp_col].alias("fp"), docs[id_col].alias("doc_id")
        )
        .groupBy("fp")
        .transformWithStateInPandas(
            statefulProcessor=StreamingDedup(ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None" if ttl_ms is None else "ProcessingTime",
        )
    )
