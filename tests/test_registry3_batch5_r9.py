"""Cross-checks for the round-9 retrieval additions: ColBERT-style
MaxSim and MMR diversification — pure-Python replays on the fixture
(the DuckDB oracle already replays both end-to-end in SQL)."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _vecs():
    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    return {int(r.vec_id): [float(x) for x in r.embedding]
            for r in pdf.itertuples()}


def _dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _cos(a, b):
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


def test_colbert_maxsim_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import colbert_maxsim_topk

    got = [
        (r["qid"], r["rank"], r["doc_id"], r["maxsim_micro"])
        for r in colbert_maxsim_topk(spark, SF).collect()
    ]
    vecs = _vecs()
    expect = []
    for qid in (0, 1):
        qv = vecs[qid]
        scored = []
        for did, dv in vecs.items():
            if did == qid:
                continue
            total = 0
            for s in range(4):
                qt = qv[s * 16:(s + 1) * 16]
                best = max(
                    _dot(qt, dv[t * 16:(t + 1) * 16]) for t in range(4)
                )
                total += math.floor(best * 1e6 + 0.5)
            scored.append((-total, did))
        scored.sort()
        for rk, (negt, did) in enumerate(scored[:5], 1):
            expect.append((qid, rk, did, -negt))
    assert got == expect


def test_mmr_matches_python_and_diversifies(spark):
    from data_ingestion_spark.operators.registry3 import mmr_diversify_topk

    got = [
        (r["qid"], r["mmr_rank"], r["doc_id"], r["mmr_score"])
        for r in mmr_diversify_topk(spark, SF).collect()
    ]
    vecs = _vecs()
    expect = []
    for qid in (0, 1):
        qv = vecs[qid]
        rel = {
            d: math.floor(_cos(qv, v) * 1e6 + 0.5)
            for d, v in vecs.items()
            if d != qid
        }
        cand = sorted(rel, key=lambda d: (-rel[d], d))[:8]
        sim = {
            (a, b): math.floor(_cos(vecs[a], vecs[b]) * 1e6 + 0.5)
            for a in cand
            for b in cand
            if a != b
        }
        s1 = min(cand, key=lambda d: (-rel[d], d))
        expect.append((qid, 1, s1, 7 * rel[s1]))
        rest = [d for d in cand if d != s1]
        sc2 = {d: 7 * rel[d] - 3 * sim[(d, s1)] for d in rest}
        s2 = min(rest, key=lambda d: (-sc2[d], d))
        expect.append((qid, 2, s2, sc2[s2]))
        rest3 = [d for d in rest if d != s2]
        sc3 = {
            d: 7 * rel[d] - 3 * max(sim[(d, s1)], sim[(d, s2)])
            for d in rest3
        }
        s3 = min(rest3, key=lambda d: (-sc3[d], d))
        expect.append((qid, 3, s3, sc3[s3]))
    assert got == expect
    # diversification actually bites on this fixture OR degenerates to the
    # top-3 — either way the selected sets are valid; assert shape
    for qid in (0, 1):
        picks = [d for q, rk, d, s in got if q == qid]
        assert len(set(picks)) == 3
