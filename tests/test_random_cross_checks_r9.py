"""Seeded randomized cross-checks for the round-9 changes: the PPJoin
positional filter (jaccard + containment candidate pruning) and the
planted-twin embedding fixture are swept against independent pure-Python
references on randomized inputs the planted fixtures don't reach."""

from __future__ import annotations

import random
from itertools import combinations


def test_jaccard_pairs_positional_filter_lossless(spark):
    """PPJoin positional filtering (r9) must keep jaccard_pairs output
    EXACTLY equal to the naive within-block all-pairs result across
    random corpora and thresholds — the filter may only thin candidates,
    never pairs. Sweeps duplicate-heavy corpora (small vocab forces high
    overlap) so the positional bound actually binds."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.operators import dedup

    rnd = random.Random(91)
    for t in (0.2, 0.3, 0.5, 0.8):
        vocab = [f"w{i}" for i in range(12)]  # tiny vocab → heavy overlap
        docs = [
            (i, " ".join(rnd.choices(vocab, k=rnd.randrange(3, 18))))
            for i in range(45)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string").withColumn(
            "blk", F.lit(1)
        )
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.jaccard_pairs(
                df, "doc_id", "text", [F.col("blk")], k=3, threshold=t
            ).collect()
        }

        def shingles(text):
            w = text.split()
            return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

        expect = {}
        for (ia, ta), (ib, tb) in combinations(docs, 2):
            sa, sb = shingles(ta), shingles(tb)
            if not sa or not sb:
                continue
            j = round(len(sa & sb) / len(sa | sb), 4)
            if j >= t:
                expect[(ia, ib)] = j
        assert got == expect, (t, set(got) ^ set(expect))


def test_containment_positional_filter_lossless(spark):
    """The asymmetric positional filter on the containment tier (r9) must
    preserve the exact naive containment result: C(A→B) = |A∩B|/|A| ≥ 0.6
    including subset/superset extremes (a contained doc's prefix is short;
    the superset side is unbounded)."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions import tokens, word_shingles
    from data_ingestion_spark.operators import dedup

    rnd = random.Random(92)
    vocab = [f"w{i}" for i in range(15)]
    docs = []
    for i in range(0, 40, 2):
        base = rnd.choices(vocab, k=rnd.randrange(5, 20))
        docs.append((i, " ".join(base)))
        # an extension superset: high C(base→ext), lower C(ext→base)
        docs.append((i + 1, " ".join(base + rnd.choices(vocab, k=6))))

    t_num, t_den = 6, 10
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = (
        df.select(
            F.col("doc_id").alias("id"),
            tokens(F.col("text")).alias("toks"),
            F.lit("b").alias("block"),
        )
        .filter(F.size("toks") >= 3)
        .select(
            "id",
            F.array_sort(
                F.array_distinct(word_shingles(F.col("toks"), 3))
            ).alias("sset"),
            "block",
        )
    )
    pref = dedup.frequency_ordered_prefix(base, threshold=t_num / t_den).select(
        "id", "block", "n", "p", "s"
    )
    inv = base.select("id", "block", F.explode("sset").alias("s"))
    cand = (
        pref.alias("pa")
        .join(
            inv.alias("ib"),
            (F.col("pa.block") == F.col("ib.block"))
            & (F.col("pa.s") == F.col("ib.s"))
            & (F.col("pa.id") != F.col("ib.id"))
            & (
                F.lit(t_den) * (F.lit(1) + F.col("pa.n") - F.col("pa.p"))
                >= F.lit(t_num) * F.col("pa.n")
            ),
        )
        .select(F.col("pa.id").alias("id_a"), F.col("ib.id").alias("id_b"))
        .distinct()
    )
    sa = base.select(F.col("id").alias("id_a"), F.col("sset").alias("sh_a"))
    sb = base.select(F.col("id").alias("id_b"), F.col("sset").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("long")
    na = F.size("sh_a").cast("long")
    got = {
        (r["id_a"], r["id_b"])
        for r in cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(inter * t_den >= na * t_num)
        .collect()
    }

    def shingles(text):
        w = text.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sets = {i: shingles(t) for i, t in docs if len(t.split()) >= 3}
    naive = {
        (a, b)
        for a, s_a in sets.items()
        for b, s_b in sets.items()
        if a != b and 10 * len(s_a & s_b) >= 6 * len(s_a)
    }
    assert got == naive, got ^ naive


def test_planted_twins_are_high_cosine_and_isolated(spark):
    """The dedup_embedding_pairs plant (r9): every twin must sit at
    cosine ≥ 0.9 of its source (the regime's threshold), and NO
    cross pair (source×other-source, twin×other-twin, twin×other-source)
    may reach 0.9 — so the true-pair set is exactly the plants and the
    registered query's output is the banding's recall on them."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.vector_functions import (
        cosine_similarity,
    )
    from data_ingestion_spark.operators.registry import (
        _TWIN_ID_OFFSET,
        _planted_embeddings,
    )

    allv = _planted_embeddings(spark, "/root/testdata/sf0.01")
    a = allv.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = allv.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = (
        a.join(b, F.col("ia") < F.col("ib"))
        .select(
            "ia",
            "ib",
            F.round(cosine_similarity(F.col("va"), F.col("vb")), 6).alias("c"),
        )
        .filter(F.col("c") >= 0.9)
        .collect()
    )
    assert pairs, "plant produced no high-cosine pairs"
    for r in pairs:
        # every ≥0.9 pair is exactly (source, its twin)
        assert r["ib"] == r["ia"] + _TWIN_ID_OFFSET, (r["ia"], r["ib"], r["c"])
    n_planted = allv.filter(F.col("vec_id") >= _TWIN_ID_OFFSET).count()
    assert len(pairs) == n_planted  # no twin fell below the threshold


def test_simhash_multiprobe_recall_theorem(spark):
    """Multi-probe SimHash (r9): on random signatures, the probe-expanded
    band join + popcount verify must return EXACTLY the brute-force
    hamming ≤ 7 pair set (the 2·bands−1 pigeonhole theorem), including
    adversarial pairs whose 4 bands each differ in exactly 1 bit (never
    an exact band match — only probing finds them)."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.operators import dedup

    rnd = random.Random(93)
    sigs = [(i, rnd.getrandbits(60)) for i in range(220)]
    # adversarial plants: hamming 4 spread 1-per-band, and hamming 8
    # spread 2-per-band (must be EXCLUDED: > 7)
    base = rnd.getrandbits(60)
    sigs.append((500, base))
    sigs.append((501, base ^ ((1 << 0) | (1 << 15) | (1 << 30) | (1 << 45))))
    sigs.append((502, base ^ (0b11 | (0b11 << 15) | (0b11 << 30) | (0b11 << 45))))
    df = spark.createDataFrame(sigs, "id long, simhash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_multiprobe_pairs(
            df, max_hamming=7, band_bits=15
        ).collect()
    }
    expect = {}
    for (ia, sa), (ib, sb) in combinations(sigs, 2):
        h = (sa ^ sb).bit_count()
        if h <= 7:
            key = (ia, ib) if ia < ib else (ib, ia)
            expect[key] = h
    assert got == expect, set(got) ^ set(expect)
    assert (500, 501) in got and got[(500, 501)] == 4  # probe-only pair
    assert (500, 502) not in got  # hamming 8 correctly excluded
