"""Direct-drive tests for the transformWithStateInPandas processors.

This container has no google.protobuf (and installs are off-limits), so
the tws tier's state-server TRANSPORT cannot run here — the readStream
E2Es dispatch to the foreachBatch versioned-state fallback instead (see
tests/test_streaming.py). What CAN run is everything above the
transport: these tests instantiate each StatefulProcessor against a
faked StatefulProcessorHandle (same exists/get/update/put surface the
real handle exposes) and drive init → handleInputRows across simulated
micro-batches, pinning the cross-batch state semantics — MG merge
math, first-wins dedup, band-bucket verify/cap, running totals — that
the protobuf layer merely ferries. One processor instance per grouping
key mirrors the engine's implicit key scoping of state."""

from __future__ import annotations

import pandas as pd
import pytest


class FakeValueState:
    def __init__(self):
        self._v = None
        self._set = False

    def exists(self):
        return self._set

    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self._set = True


class FakeListState:
    def __init__(self):
        self._rows = []
        self.put_calls = 0

    def get(self):
        return iter(list(self._rows))

    def put(self, rows):
        self._rows = list(rows)
        self.put_calls += 1


class FakeHandle:
    """One handle per grouping key (the engine scopes state per key)."""

    def __init__(self):
        self._states = {}

    def getValueState(self, name, schema, ttl_ms=None):
        return self._states.setdefault(name, FakeValueState())

    def getListState(self, name, schema, ttl_ms=None):
        return self._states.setdefault(name, FakeListState())


def _drive(proc, key, batches):
    """handleInputRows per micro-batch, collecting emitted frames."""
    outs = []
    for pdf in batches:
        outs.append(pd.concat(list(proc.handleInputRows(key, iter([pdf]), None))))
    return outs


def test_sharded_misra_gries_cross_batch_contract():
    """Weighted-MG state across micro-batches: counters lower-bound the
    exact token frequencies, every token above the support bound
    survives, emit_seq counts batches, and the table never exceeds k."""
    from data_ingestion_spark.streaming.heavy_hitters_stream import (
        ShardedMisraGries,
    )

    k = 4
    proc = ShardedMisraGries(k=k)
    proc.init(FakeHandle())
    b1 = pd.DataFrame({"token": ["a"] * 30 + ["b"] * 20 + list("cdefg")})
    b2 = pd.DataFrame({"token": ["a"] * 10 + ["h"] * 25 + list("ijklmn")})
    out1, out2 = _drive(proc, (3,), [b1, b2])
    assert set(out1["emit_seq"]) == {1} and set(out2["emit_seq"]) == {2}
    assert len(out2) <= k
    exact = pd.concat([b1, b2])["token"].value_counts().to_dict()
    final = dict(zip(out2["token"], out2["count_lb"]))
    for tok, lb in final.items():
        assert lb <= exact[tok], (tok, lb, exact[tok])
    total = sum(exact.values())
    for tok, freq in exact.items():
        if freq > total / (k + 1):
            assert tok in final, (tok, freq)
    assert (out2["shard"] == 3).all()


def test_streaming_dedup_first_wins_and_counts_replays():
    from data_ingestion_spark.streaming.dedup_stream import StreamingDedup

    proc = StreamingDedup()
    proc.init(FakeHandle())
    out1, out2 = _drive(
        proc,
        ("fp0",),
        [
            pd.DataFrame({"doc_id": [7, 9]}),   # 7 wins, 9 is a replay
            pd.DataFrame({"doc_id": [11]}),      # replay of the stored fp
        ],
    )
    assert list(out1["kept"]) == [True, False]
    assert list(out1["n_dup"]) == [0, 1]
    assert list(out2["kept"]) == [False]
    assert list(out2["n_dup"]) == [2]  # counter carried across batches
    assert (out1["fp"] == "fp0").all()


def test_streaming_neardup_verify_cap_and_state_append():
    from data_ingestion_spark.streaming.neardup_stream import StreamingNearDup

    proc = StreamingNearDup(max_hamming=3, max_bucket=2)
    handle = FakeHandle()
    proc.init(handle)
    state = handle._states["members"]
    sig = 0b1111000011110000
    near = sig ^ 0b101  # hamming 2 → matches
    far = sig ^ ((1 << 10) - 1)  # hamming 10 → new member
    over = sig ^ (0b11111 << 20)  # hamming 5 → no match, bucket full → capped
    b1 = pd.DataFrame({"doc_id": [1, 2], "simhash": [sig, near]})
    b2 = pd.DataFrame({"doc_id": [3, 4], "simhash": [far, over]})
    out1, out2 = _drive(proc, ("0:5",), [b1, b2])
    # batch 1: 1 is new (stored); 2 matches 1 at hamming 2
    assert list(out1["kept"]) == [True, False]
    assert list(out1["match_id"].astype("Int64")) == [pd.NA, 1]
    assert list(out1["hamming"].astype("Int64"))[1] == 2
    # batch 2: 3 is new (bucket now 2 = cap); 4 misses and is capped
    assert list(out2["kept"]) == [True, True]
    assert list(out2["capped"]) == [False, True]
    members = [d for d, _s in state.get()]
    assert members == [1, 3]  # capped arrival 4 was NOT stored
    assert state.put_calls == 2  # batch 2 appended → rewrite; cap path didn't add


def test_running_totals_accumulate_across_batches():
    from data_ingestion_spark.streaming.running_totals import RunningTotals

    proc = RunningTotals()
    proc.init(FakeHandle())
    out1, out2 = _drive(
        proc,
        (42,),
        [
            pd.DataFrame({"value": [1.5, 2.5]}),
            pd.DataFrame({"value": [10.0]}),
        ],
    )
    assert list(out1["n_events"]) == [2] and list(out1["total_value"]) == [4.0]
    assert list(out2["n_events"]) == [3] and list(out2["total_value"]) == [14.0]


def test_tws_processors_share_math_with_fallback_tier():
    """The MG merge the tws processor runs is the SAME function the
    foreachBatch fallback commits through the versioned state table —
    one implementation, so the two tiers cannot drift."""
    from data_ingestion_spark.streaming import foreach_batch_state
    from data_ingestion_spark.streaming.heavy_hitters_stream import _mg_merge

    import inspect

    src = inspect.getsource(foreach_batch_state.heavy_hitters_batch)
    assert "_mg_merge" in src
    tab: dict = {}
    for tok, w in [("a", 5), ("b", 3), ("c", 1), ("d", 1), ("e", 1)]:
        _mg_merge(tab, tok, w, 3)
    assert len(tab) <= 3 and tab.get("a", 0) <= 5
