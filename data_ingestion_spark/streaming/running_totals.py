"""Custom stateful streaming operator on the Spark 4 arbitrary-state API:
per-key running totals via ``transformWithStateInPandas``.

This is the successor API to ``applyInPandasWithState`` (sessionize.py keeps
the classic form): a ``StatefulProcessor`` with named, typed state variables
managed by the state store — the composable shape for long-lived per-key
aggregates (counters, feature accumulators, online stats) on unbounded
streams.

Scale notes: state lives in the per-partition state store (RocksDB provider
— required by this API and the right choice at scale: state spills to disk
instead of executor heap), keyed by the grouping column, one Arrow batch
per key-group per micro-batch. State size is O(distinct keys).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


class RunningTotals(StatefulProcessor):
    """Per-key event count + value sum, carried across micro-batches in a
    ValueState; emits the updated running totals for every key seen in the
    current batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._totals.exists():
            n, total = self._totals.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Wire the processor: groupBy key → transformWithStateInPandas.

    Requires the RocksDB state store provider (set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...RocksDBStateStoreProvider`` before starting the query).
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
