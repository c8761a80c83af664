"""Tests for the Misra-Gries heavy-hitters sketch (operators/sketch.py):
the merge-shrink math, the superset guarantee, exactness vs a plain
aggregation, the flat-distribution fallback, and partitioning
independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_spark.operators import sketch


def test_mg_merge_shrink_guarantee():
    """After shrinking to k counters, per-token undercount ≤ N/k (the MG
    bound), and any token with true count > N/k survives."""
    from collections import Counter

    stream = (
        ["apple"] * 50 + ["banana"] * 30 + ["cherry"] * 10
        + [f"rare{i}" for i in range(40)]
    )
    true = Counter(stream)
    n = len(stream)
    k = 8
    counters: dict = {}
    for i in range(0, n, 13):  # arbitrary batch boundaries
        counters = sketch._mg_merge_shrink(
            counters, Counter(stream[i : i + 13]), k
        )
    assert len(counters) <= k
    for t, c in counters.items():
        assert true[t] - n / k <= c <= true[t]
    for t, c in true.items():
        if c > n / k:
            assert t in counters, f"heavy hitter {t} lost"


def _mk_docs(spark, rows, n_parts=1):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.repartition(n_parts) if n_parts > 1 else df


def test_heavy_hitters_equals_exact_on_zipf(spark):
    rows = [
        (i, " ".join(f"w{j}" for j in range(1, 40) if i % j == 0))
        for i in range(1, 300)
    ]
    df = _mk_docs(spark, rows, n_parts=7)
    got = [(r["token"], r["freq"]) for r in sketch.heavy_hitters(df, "text", 10, sketch_k=64).collect()]
    exact = [
        (r["token"], r["freq"])
        for r in df.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("token"))
        .filter("token <> ''")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(10)
        .collect()
    ]
    assert got == exact


def test_heavy_hitters_flat_distribution_fallback_still_exact(spark):
    """Every token unique → support guarantee cannot hold → fallback path
    must still return the exact (tie-broken) answer."""
    rows = [(i, f"tok{i:04d}") for i in range(200)]
    df = _mk_docs(spark, rows, n_parts=5)
    got = [(r["token"], r["freq"]) for r in sketch.heavy_hitters(df, "text", 5, sketch_k=16).collect()]
    assert got == [(f"tok{i:04d}", 1) for i in range(5)]  # freq ties → token asc


def test_heavy_hitters_partitioning_independent(spark):
    rows = [(i, ("alpha " * (i % 5)) + f"beta{i % 17}") for i in range(400)]
    a = sketch.heavy_hitters(_mk_docs(spark, rows, 3), "text", 8, sketch_k=32).collect()
    b = sketch.heavy_hitters(_mk_docs(spark, rows, 19), "text", 8, sketch_k=32).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_mg_candidates_bounded_per_partition(spark):
    """Each partition contributes ≤ sketch_k candidate rows — the memory
    bound the operator's 100 TB story rests on."""
    rows = [(i, f"t{i % 997} u{i % 499} v{i % 251}") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    cands = sketch.mg_candidates(df, "text", sketch_k=32)
    # distinct-union across 4 partitions: at most 4 × 32 rows
    assert cands.count() <= 4 * 32


# --------------------------------------------------------------------------
# KMV (bottom-k) sketch
# --------------------------------------------------------------------------
def test_kmv_bottom_k_returns_k_smallest(spark):
    df = spark.createDataFrame([(h,) for h in [50, 10, 90, 30, 70, 20]], "h long")
    got = [r["h"] for r in sketch.kmv_bottom_k(df, "h", 3).collect()]
    assert got == [10, 20, 30]


def test_kmv_union_stats_exact_when_under_k(spark):
    """nk < k ⇒ the sketch holds the whole set and the estimate is exact."""
    df = spark.createDataFrame([(h,) for h in [5, 7, 11]], "h long")
    row = sketch.kmv_union_stats(sketch.kmv_bottom_k(df, "h", 64), 64).collect()[0]
    assert (row["nk"], row["union_est"]) == (3, 3)


def test_kmv_union_estimate_within_bound(spark):
    """Sketch path (n >> k): (k-1)/theta estimator lands within 5/sqrt(k-1)
    of the true distinct count on md5-uniform hashes."""
    from data_ingestion_spark.functions import md5_hash60

    n, k = 20000, 256
    df = spark.range(n).select(md5_hash60(F.col("id").cast("string")).alias("h"))
    row = sketch.kmv_union_stats(sketch.kmv_bottom_k(df, "h", k), k).collect()[0]
    assert row["nk"] == k
    assert abs(row["union_est"] - n) <= 5.0 / (k - 1) ** 0.5 * n


def test_theta_intersection_exact_path_at_tiny_sf(spark):
    """At sf0.001 the union fits the sketch, so BOTH estimates must equal
    the exact counts — the CASE nk<k branch on both engines."""
    from data_ingestion_spark.operators.registry2 import theta_intersection_events

    row = theta_intersection_events(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["kmv_union_est"] == row["exact_union"]
    assert row["kmv_intersection_est"] == row["exact_intersection"]
    assert row["sketch_within_bound"]


def test_theta_intersection_sketch_path_bound(spark):
    """At sf0.01 the sketch path engages (union > k) and the checked
    contract column must hold."""
    from data_ingestion_spark.operators.registry2 import theta_intersection_events

    row = theta_intersection_events(spark, "/root/testdata/sf0.01").collect()[0]
    assert row["exact_union"] > 64  # sketch path actually exercised
    assert row["sketch_within_bound"]


# --------------------------------------------------------------------------
# Count-Min sketch
# --------------------------------------------------------------------------
def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    """CMS estimates >= exact always; with a vocabulary far smaller than
    width, collisions are unlikely and estimates are exact."""
    rows = [(i, "alpha beta " + ("gamma " * (i % 3))) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sk = sketch.cms_table(df, "text", depth=4, width=1024)
    got = {
        r["token"]: (r["exact_cnt"], r["cms_est"], r["never_underestimates"])
        for r in sketch.cms_estimate(
            sk, df, "text", ["alpha", "gamma", "absent"], depth=4, width=1024
        ).collect()
    }
    assert got["alpha"] == (50, 50, True)
    assert got["absent"][0] == 0 and got["absent"][2]
    assert got["gamma"][1] >= got["gamma"][0] and got["gamma"][2]


def test_cms_bounded_cells(spark):
    """The sketch table never exceeds depth*width rows regardless of
    vocabulary size — the memory bound the scale story rests on."""
    rows = [(i, " ".join(f"tok{i}_{j}" for j in range(20))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert sketch.cms_table(df, "text", depth=4, width=64).count() <= 4 * 64
