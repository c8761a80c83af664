"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most skew at runtime,
but two cases still need explicit salting at 100 TB:

1. **Skewed aggregation** — a single hot group key funnels to one reducer.
   ``salted_agg`` does a two-phase aggregate: phase 1 groups on
   (key, salt) spreading the hot key over N partitions (map-side partials
   still apply), phase 2 merges the N partials per key. Works for any
   algebraic aggregate (sum/count/min/max; avg = sum+count then divide).
2. **Skewed join against a small-ish build side** — ``salted_join``
   replicates each build-side row N ways (explode over salt values) and
   salts the probe side randomly-but-deterministically (hash-mod on a
   stable column), so one hot probe key spreads over N tasks.

Both are plain DataFrame transforms — no partitioner surgery — so Catalyst
still owns the physical plan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_from: Column | str, buckets: int) -> DataFrame:
    """Deterministic salt in [0, buckets): xxhash64-mod on a stable column
    (NOT rand() — retries/speculative tasks must re-derive the same salt)."""
    c = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    return df.withColumn("_salt", F.pmod(F.xxhash64(c), F.lit(buckets)))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_from: str,
    buckets: int,
    partials: dict[str, tuple[Column, Column]],
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``partials`` maps output-column name → (phase1_agg_expr, phase2_merge_expr)
    where the phase-2 expression references the phase-1 column by name, e.g.::

        salted_agg(df, ["k"], "id", 32,
                   {"n":   (F.count(F.lit(1)),  F.sum("n")),
                    "tot": (F.sum("v"),         F.sum("tot"))})

    Identical results to ``df.groupBy(keys).agg(...)`` for algebraic
    aggregates; the hot key's rows split over ``buckets`` reducers first.
    """
    phase1 = (
        with_salt(df, salt_from, buckets)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, (expr, _) in partials.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in partials.items()]
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    buckets: int,
    probe_salt_from: str,
) -> DataFrame:
    """Inner equi-join where ``probe`` has hot values of ``on``.

    The build side explodes ×buckets (fine for dimension-sized builds that
    are too big to broadcast but small next to the probe side); the probe
    side computes one deterministic salt. Join key becomes (on, salt) —
    the hot key now lands on ``buckets`` distinct reducers.
    """
    salted_probe = with_salt(probe, probe_salt_from, buckets)
    exploded_build = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<bigint>"))
    )
    out = salted_probe.join(exploded_build, [on, "_salt"])
    return out.drop("_salt")


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """The pre-flight that DECIDES whether to salt: a one-row skew profile
    of a prospective join/agg key — total rows, distinct keys, the
    heaviest key's fanout, and the row share held by the top-1 / top-10
    keys (a near-uniform key has top1_share ≈ 1/n_keys; a power-law key
    holds percent-scale shares and needs ``salted_agg``/``salted_join``
    or AQE skew splitting).

    Scale shape: one partial-agg'd per-key count (the only corpus-sized
    stage), then scalar aggregates over the |keys| count table and a
    TakeOrderedAndProject top-10 (per-partition heaps, no global sort).
    Shares are integer micros with a deterministic (cnt desc, key asc)
    tie-break, so the profile is oracle-replayable.
    """
    c = (
        df.groupBy(F.col(key_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = c.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_fanout"),
    )
    top10 = (
        c.orderBy(F.col("cnt").desc(), F.col("k").asc())
        .limit(10)
        .agg(
            F.sum("cnt").cast("long").alias("_s10"),
            F.max("cnt").cast("long").alias("_s1"),
        )
    )
    return tot.crossJoin(top10).select(
        "n_rows",
        "n_keys",
        "max_fanout",
        F.expr("(1000000 * _s1) div n_rows").cast("long").alias("top1_share_micro"),
        F.expr("(1000000 * _s10) div n_rows").cast("long").alias("top10_share_micro"),
        F.expr("(1000000 * n_rows) div n_keys").cast("long").alias("avg_fanout_micro"),
    )


def autogated_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_salt_from: str,
    buckets: int = 8,
    gate_micro: int = 100_000,
) -> tuple[DataFrame, bool]:
    """The profile→threshold→branch composition (round 8): run
    ``key_skew_profile`` on the probe side's join key and pick
    ``salted_join`` iff the hottest key holds ≥ ``gate_micro`` millionths
    of the rows (default 10% — a key that routes a tenth of a 100 TB
    shuffle through one reducer is the thing salting exists for); plain
    equi-join otherwise, because salting a uniform key just multiplies
    the build side ×buckets for nothing.

    The profile is a ONE-ROW driver collect (metadata-scale: the per-key
    count agg runs distributed; only six integers reach the driver) — the
    same pre-flight pattern as join_cardinality/stats-manifest planning.
    Salting is semantically invisible, so callers' results are identical
    on both branches; returns (joined, salted_flag) so the caller can
    surface WHICH branch ran (and an oracle can re-derive the flag from
    the same threshold arithmetic).
    """
    prof = key_skew_profile(probe, on).collect()[0]
    # empty probe → NULL shares (sum over zero rows); skew is undefined,
    # so degrade to the plain join instead of crashing the gate — an
    # incremental pipeline's nightly batch can legitimately be empty
    share = prof["top1_share_micro"]
    salted = share is not None and int(share) >= gate_micro
    if salted:
        return (
            salted_join(
                probe, build, on=on, buckets=buckets,
                probe_salt_from=probe_salt_from,
            ),
            True,
        )
    return probe.join(build, on), False
