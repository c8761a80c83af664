"""Seeded randomized cross-checks for the round-11 stored shingle base:
the committed (base, fpos) snapshot and BOTH jaccard_pairs_stored
strategies are swept against an independent pure-Python naive reference
on randomized corpora, and the threshold-filtered stored prefix is
checked row-identical to the in-line frequency_ordered_prefix — the
"one stored order serves every threshold" claim, pinned directly."""

from __future__ import annotations

import os
import random
from itertools import combinations


def _write_corpus(spark, tmp_path, rnd, n_docs=40, vocab_size=12):
    """Random duplicate-heavy corpus (tiny vocab forces overlap) with the
    real documents-table block columns (lang, n_chars)."""
    vocab = [f"w{i}" for i in range(vocab_size)]
    docs = []
    for i in range(n_docs):
        text = " ".join(rnd.choices(vocab, k=rnd.randrange(3, 18)))
        lang = rnd.choice(["en", "es"])
        docs.append((i, text, lang, len(text)))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, n_chars long"
    )
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    return sf, docs


def _naive_pairs(docs, threshold):
    """Pure-Python within-(lang, n_chars//200)-block exact Jaccard."""
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


def test_jaccard_pairs_stored_lossless_random(spark, tmp_path):
    """Both stored strategies must equal the naive all-pairs result on
    random corpora across thresholds spanning the count/prefix crossover
    — the store, the prefix filter, and the co-occurrence count may only
    change the PLAN, never a pair or a value."""
    from data_ingestion_spark.operators import dedup

    rnd = random.Random(1106)
    for trial, t in enumerate((0.02, 0.3, 0.6)):
        sf, docs = _write_corpus(spark, tmp_path / f"c{trial}", rnd)
        expect = _naive_pairs(docs, t)
        for strategy in ("prefix", "count"):
            got = {
                (r["id_a"], r["id_b"]): r["jaccard"]
                for r in dedup.jaccard_pairs_stored(
                    spark, sf, threshold=t, strategy=strategy
                ).collect()
            }
            assert got == expect, (t, strategy, set(got) ^ set(expect))


def test_stored_prefix_equals_inline_prefix_random(spark, tmp_path):
    """stored_prefix(fpos, t) must emit EXACTLY the rows
    frequency_ordered_prefix(base, t) emits, for every threshold — the
    stored full positional stream at threshold 0 plus the p-bound filter
    IS the in-line prefix (same global frequency order, same
    rounding-safe t_eff), which is what makes one committed snapshot
    lossless for all consumers."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.operators import dedup

    rnd = random.Random(1107)
    sf, _docs = _write_corpus(spark, tmp_path, rnd, n_docs=30)
    base, fpos = dedup.shingle_base_probe(spark, sf, k=3)
    inline_base = base.select(
        "id", F.struct("lang", "bucket").alias("block"), "sset"
    )
    for t in (0.02, 0.3, 0.6, 0.9):
        inline = {
            (r["id"], r["n"], r["p"], r["s"])
            for r in dedup.frequency_ordered_prefix(
                inline_base, threshold=t
            ).collect()
        }
        stored = {
            (r["id"], r["n"], r["p"], r["s"])
            for r in dedup.stored_prefix(fpos, t).collect()
        }
        assert stored == inline, (t, stored ^ inline)
