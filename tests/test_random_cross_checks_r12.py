"""Seeded randomized cross-checks for round 12.

1. The NULL-block Jaccard fixture, promoted into the randomized sweep
   (the r11 verdict's task #6): corpora with NULL lang values are now
   part of every round's three-way inline/stored/oracle parity check, so
   a future refactor of the block-join equality (eqNullSafe vs bare ==,
   `IS NOT DISTINCT FROM` vs `=`) cannot regress silently.
2. Stored-signature sweeps (the r12 embsig/simsig stores): on randomized
   corpora, the stored LSH/simhash/semantic paths must equal an
   independent pure-Python reference — not just the in-line Spark path,
   so a shared Spark-side bug cannot vouch for itself.
"""

from __future__ import annotations

import math
import os
import random
from itertools import combinations


def _write_docs(spark, tmp_path, rnd, n_docs=36, null_lang_rate=0.3):
    """Random duplicate-heavy corpus where a fraction of lang values are
    NULL — the block column the r11 NULL-parity finding was about."""
    vocab = [f"w{i}" for i in range(10)]
    docs = []
    for i in range(n_docs):
        text = " ".join(rnd.choices(vocab, k=rnd.randrange(3, 16)))
        lang = None if rnd.random() < null_lang_rate else rnd.choice(
            ["en", "es"]
        )
        docs.append((i, text, lang, len(text)))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, n_chars long"
    )
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    return sf, docs


def _naive_jaccard_pairs(docs, threshold):
    """Pure-Python blocked exact Jaccard. NULL blocks compare EQUAL
    (Python None == None), matching Spark struct equality, eqNullSafe,
    and SQL IS NOT DISTINCT FROM."""

    def shingles(text):
        w = text.split()
        return {" ".join(w[i: i + 3]) for i in range(len(w) - 2)}

    expect = {}
    for (ia, ta, la, ca), (ib, tb, lb, cb) in combinations(docs, 2):
        if la != lb or ca // 200 != cb // 200:
            continue
        sa, sb = shingles(ta), shingles(tb)
        if not sa or not sb:
            continue
        j = round(len(sa & sb) / len(sa | sb), 4)
        if j >= threshold:
            expect[(ia, ib)] = j
    return expect


def test_null_block_jaccard_three_way_parity_random(spark, tmp_path):
    """Randomized NULL-lang corpora: the inline struct-block path, BOTH
    stored strategies, and the DuckDB oracle must all agree with the
    naive reference — including the NULL==NULL block pairs."""
    import duckdb

    from pyspark.sql import functions as F

    from data_ingestion_spark.operators import dedup
    from data_ingestion_spark.operators.registry import (
        DEDUP_JACCARD_PAIRS_DOCS_SQL,
    )

    rnd = random.Random(1201)
    for trial, t in enumerate((0.02, 0.3)):
        sf, docs = _write_docs(spark, tmp_path / f"c{trial}", rnd)
        expect = _naive_jaccard_pairs(docs, t)
        assert any(d[2] is None for d in docs)  # the fixture has NULLs
        blocks = [F.col("lang"), F.expr("n_chars div 200").alias("bucket")]
        from data_ingestion_spark.session import load_table

        inline = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.jaccard_pairs(
                load_table(spark, sf, "documents"), "doc_id", "text",
                block_cols=blocks, k=3, threshold=t,
            ).collect()
        }
        assert inline == expect, (t, set(inline) ^ set(expect))
        for strategy in ("prefix", "count"):
            stored = {
                (r["id_a"], r["id_b"]): r["jaccard"]
                for r in dedup.jaccard_pairs_stored(
                    spark, sf, threshold=t, strategy=strategy
                ).collect()
            }
            assert stored == expect, (t, strategy, set(stored) ^ set(expect))
        if t == 0.3:  # the registered query's threshold — oracle parity
            con = duckdb.connect()
            con.sql(
                "CREATE VIEW documents AS SELECT * FROM read_parquet('"
                + os.path.join(sf, "documents.parquet")
                + "/*.parquet')"
            )
            oracle = {
                (r[0], r[1]): r[2]
                for r in con.sql(DEDUP_JACCARD_PAIRS_DOCS_SQL).fetchall()
            }
            assert oracle == expect, set(oracle) ^ set(expect)


def _splitmix_planes(dim, bits, seed=42):
    from data_ingestion_spark.operators import similarity

    return similarity._deterministic_hyperplanes(dim, bits, seed)


def _fold_dot(a, b):
    """Left fold from 0.0 — the exact summation order of the SQL
    aggregate AND the numpy cumsum path."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def test_stored_lsh_pairs_match_pure_python_random(spark, tmp_path):
    """The stored 16/4 LSH path must equal an independent pure-Python
    replay (signature, banding, exact rounded-cosine verify) on random
    embedding corpora — checked against the REFERENCE, not the inline
    Spark path, so a shared bug cannot self-vouch."""
    from data_ingestion_spark.operators import registry as R

    rnd = random.Random(1202)
    for trial in range(2):
        n, dim = 80, 64
        rows = [
            (i, [rnd.uniform(-1, 1) for _ in range(dim)], 0)
            for i in range(n)
        ]
        sf = str(tmp_path / f"e{trial}")
        os.makedirs(sf, exist_ok=True)
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(
            os.path.join(sf, "embeddings.parquet")
        )
        # pure-Python reference over the FLOAT32-rounded values the
        # parquet round-trip stores
        stored_rows = spark.read.parquet(
            os.path.join(sf, "embeddings.parquet")
        ).collect()
        vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
                for r in stored_rows}
        planes = _splitmix_planes(dim, 16)
        sigs = {
            i: sum(
                (1 << b) for b, p in enumerate(planes)
                if _fold_dot(v, p) > 0
            )
            for i, v in vecs.items()
        }
        expect = {}
        for ia, ib in combinations(sorted(vecs), 2):
            sa, sb = sigs[ia], sigs[ib]
            if not any(
                ((sa >> (4 * b)) & 15) == ((sb >> (4 * b)) & 15)
                for b in range(4)
            ):
                continue
            dot = _fold_dot(vecs[ia], vecs[ib])
            na = math.sqrt(_fold_dot(vecs[ia], vecs[ia]))
            nb = math.sqrt(_fold_dot(vecs[ib], vecs[ib]))
            cos = round(dot / (na * nb), 6)
            if cos >= 0.35:
                expect[(ia, ib)] = cos
        got = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in R.knn_lsh_pairs(spark, sf).collect()
        }
        assert got == expect, (trial, set(got) ^ set(expect))


def test_stored_simhash_pairs_match_pure_python_random(spark, tmp_path):
    """The stored simhash hamming ≤ 3 and multi-probe hamming ≤ 7 tiers
    must equal the brute-force pure-Python hamming over independently
    recomputed signatures (md5-60bit token hashes, majority vote)."""
    import hashlib

    from data_ingestion_spark.operators import registry as R
    from data_ingestion_spark.operators.registry3 import QUERIES as Q3

    rnd = random.Random(1203)
    sf, docs = _write_docs(spark, tmp_path, rnd, n_docs=40, null_lang_rate=0)

    def sim(text):
        votes = [0] * 60
        for tok in [t for t in text.lower().split() if t]:
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            for b in range(60):
                votes[b] += 1 if (h >> b) & 1 else -1
        return sum((1 << b) for b in range(60) if votes[b] > 0)

    sigs = {i: sim(t) for i, t, _l, _c in docs}
    got_sig = {
        (r["doc_id"], r["simhash"])
        for r in R.dedup_simhash_docs(spark, sf).collect()
    }
    assert got_sig == set(sigs.items())
    for max_h, fn in (
        (3, R.dedup_simhash_pairs),
        (7, Q3["simhash_multiprobe_pairs_docs"][0]),
    ):
        expect = {
            (ia, ib, bin(sigs[ia] ^ sigs[ib]).count("1"))
            for ia, ib in combinations(sorted(sigs), 2)
            if bin(sigs[ia] ^ sigs[ib]).count("1") <= max_h
        }
        got = {tuple(r) for r in fn(spark, sf).collect()}
        assert got == expect, (max_h, got ^ expect)


def test_stored_semantic_dedup_matches_pure_python_random(spark, tmp_path):
    """The stored-assignment SemDeDup summary must equal a pure-Python
    replay: nearest-centroid by fold-ordered inner product (lowest-cid
    tie), greedy lowest-id ε-ball drop at micro-unit threshold."""
    from data_ingestion_spark.operators import registry as R

    rnd = random.Random(1204)
    n, dim = 96, 64
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(dim)], 0) for i in range(n)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(sf, "embeddings.parquet"))
    stored_rows = spark.read.parquet(
        os.path.join(sf, "embeddings.parquet")
    ).collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in stored_rows}
    k = max(8, n // 64)
    cents = [vecs[i] for i in sorted(vecs)[:k]]
    assign = {}
    for i, v in vecs.items():
        dots = [_fold_dot(v, c) for c in cents]
        assign[i] = max(range(k), key=lambda c: (dots[c], -c))
    dropped = set()
    for ia, ib in combinations(sorted(vecs), 2):
        if assign[ia] != assign[ib]:
            continue
        dot = _fold_dot(vecs[ia], vecs[ib])
        na = math.sqrt(_fold_dot(vecs[ia], vecs[ia]))
        nb = math.sqrt(_fold_dot(vecs[ib], vecs[ib]))
        if math.floor((dot / (na * nb)) * 1e6 + 0.5) >= 300000:
            dropped.add(ib)
    expect = {
        (c, sum(1 for i in assign if assign[i] == c),
         sum(1 for i in dropped if assign[i] == c))
        for c in range(k)
        if any(assign[i] == c for i in assign)
    }
    got = {tuple(r) for r in R.semantic_dedup_embeddings(spark, sf).collect()}
    assert got == expect, got ^ expect
