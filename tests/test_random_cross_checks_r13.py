"""Seeded randomized cross-checks for round 13: the two stored index
probes (IVF-Flat, IVF-PQ) must equal an INDEPENDENT pure-Python replay —
seed selection, Lloyd rounds with 6-dp rounding and empty-cluster
carry-over, encode/assign tie-breaks, probe routing, and the
micro-rounded ADC/cosine ranking — on random embedding corpora. Checked
against the reference, not the inline Spark path, so a bug shared by the
store build and its Spark-side twin cannot vouch for itself (the r12
randomized-sweep standard applied to the r13 conversions)."""

from __future__ import annotations

import math
import os
import random


def _fold(pairs):
    """Left fold from 0.0 — the summation order of every SQL aggregate
    fragment (_sql_dot/_sql_l2sq) and the numpy-cumsum build workers."""
    acc = 0.0
    for term in pairs:
        acc = acc + term
    return acc


def _dot(a, b):
    return _fold(float(x) * float(y) for x, y in zip(a, b))


def _l2sq(a, b):
    return _fold(
        (float(x) - float(y)) * (float(x) - float(y)) for x, y in zip(a, b)
    )


def _write_emb(spark, path, rnd, n, dim=64):
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(dim)], 0) for i in range(n)
    ]
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(path, "embeddings.parquet"))
    # the reference replays over the FLOAT32-rounded values the parquet
    # round-trip stores, exactly what Spark reads
    stored = spark.read.parquet(os.path.join(path, "embeddings.parquet")).collect()
    return {r["vec_id"]: [float(x) for x in r["embedding"]] for r in stored}


def _assign(vecs, cents):
    """list_id per vector: max inner product, lowest-cid tie-break."""
    out = {}
    for i, v in vecs.items():
        best, best_d = 0, None
        for cid, c in enumerate(cents):
            d = _dot(v, c)
            if best_d is None or d > best_d:
                best, best_d = cid, d
        out[i] = best
    return out


def _lloyd(vecs, k, n_iter):
    """kmeans_centroid_list's exact recipe: seeds = k lowest-id vectors;
    per round assign by max inner product then per-(cluster, dim) mean
    rounded to 6 dp; empty clusters keep the previous codeword."""
    ids = sorted(vecs)
    cents = [list(vecs[i]) for i in ids[:k]]
    for _ in range(n_iter):
        asg = _assign(vecs, cents)
        new = [list(c) for c in cents]
        for cid in range(k):
            members = [vecs[i] for i in ids if asg[i] == cid]
            if not members:
                continue
            for d in range(len(cents[0])):
                new[cid][d] = round(
                    _fold(m[d] for m in members) / len(members), 6
                )
        cents = new
    return cents


def test_knn_ivf_stored_probe_matches_pure_python_random(spark, tmp_path):
    from data_ingestion_spark.operators import registry as R

    rnd = random.Random(1301)
    for trial in range(2):
        vecs = _write_emb(
            spark, str(tmp_path / f"k{trial}"), rnd, n=70 + 15 * trial
        )
        sf = str(tmp_path / f"k{trial}")
        cents = _lloyd(vecs, k=4, n_iter=2)
        lists = _assign(vecs, cents)
        expect = {}
        for qid in (0, 1):
            qv = vecs[qid]
            scored_cids = sorted(
                range(4), key=lambda c: (-_dot(qv, cents[c]), c)
            )[:2]
            cand = [
                i for i in vecs if lists[i] in scored_cids and i != qid
            ]
            scored = []
            for i in cand:
                cos = _dot(qv, vecs[i]) / (
                    math.sqrt(_dot(qv, qv)) * math.sqrt(_dot(vecs[i], vecs[i]))
                )
                scored.append((i, round(cos, 6)))
            scored.sort(key=lambda t: (-t[1], t[0]))
            for rank, (i, cos) in enumerate(scored[:10], start=1):
                expect[(qid, i)] = (cos, rank)
        got = {
            (r["query_id"], r["neighbor_id"]): (r["cosine"], r["rank"])
            for r in R.knn_ivf_stored_probe(spark, sf).collect()
        }
        assert got == expect, (trial, set(got) ^ set(expect))


def _pq_train_py(vecs, m, k, n_iter):
    """pq_train's exact recipe per subspace: seeds = k lowest-id
    vectors' slices; assign by squared L2 (ties to lower code); codeword
    = per-dim mean rounded 6 dp; empty clusters keep previous."""
    ids = sorted(vecs)
    dim = len(vecs[ids[0]])
    d_sub = dim // m
    books = [
        [
            [float(vecs[ids[c]][s * d_sub + j]) for j in range(d_sub)]
            for c in range(k)
        ]
        for s in range(m)
    ]

    def enc_one(v, s):
        best, best_d = 0, None
        for c in range(k):
            d = _l2sq(v[s * d_sub: (s + 1) * d_sub], books[s][c])
            if best_d is None or d < best_d:
                best, best_d = c, d
        return best

    for _ in range(n_iter):
        codes = {i: [enc_one(vecs[i], s) for s in range(m)] for i in ids}
        new = [[list(cw) for cw in book] for book in books]
        for s in range(m):
            for c in range(k):
                members = [vecs[i] for i in ids if codes[i][s] == c]
                if not members:
                    continue
                for j in range(d_sub):
                    new[s][c][j] = round(
                        _fold(mv[s * d_sub + j] for mv in members)
                        / len(members),
                        6,
                    )
        books = new
    return books, d_sub


def test_pq_ivf_stored_probe_matches_pure_python_random(spark, tmp_path):
    from data_ingestion_spark.operators.registry3 import pq_ivf_stored_probe

    rnd = random.Random(1302)
    for trial in range(2):
        vecs = _write_emb(
            spark, str(tmp_path / f"p{trial}"), rnd, n=60 + 20 * trial
        )
        sf = str(tmp_path / f"p{trial}")
        m, k, n_lists, n_probe, topk = 4, 8, 4, 2, 5
        books, d_sub = _pq_train_py(vecs, m, k, n_iter=2)
        ids = sorted(vecs)
        cents = [list(vecs[i]) for i in ids[:n_lists]]  # lowest-id seeds
        lists = _assign(vecs, cents)

        def enc(v, s):
            best, best_d = 0, None
            for c in range(k):
                d = _l2sq(v[s * d_sub: (s + 1) * d_sub], books[s][c])
                if best_d is None or d < best_d:
                    best, best_d = c, d
            return best

        expect = {}
        for qid in ids[:2]:
            qv = vecs[qid]
            probed = sorted(
                range(n_lists), key=lambda c: (-_dot(qv, cents[c]), c)
            )[:n_probe]
            scored = []
            for i in ids:
                if lists[i] not in probed:
                    continue
                adc = 0
                for s in range(m):
                    c = enc(vecs[i], s)
                    dist = _l2sq(qv[s * d_sub: (s + 1) * d_sub], books[s][c])
                    adc += int(math.floor(dist * 1e6 + 0.5))
                scored.append((i, adc))
            scored.sort(key=lambda t: (t[1], t[0]))
            for rk, (i, adc) in enumerate(scored[:topk], start=1):
                expect[(qid, i)] = (adc, rk)
        got = {
            (r["qid"], r["vec_id"]): (r["adc_micro"], r["rk"])
            for r in pq_ivf_stored_probe(spark, sf).collect()
        }
        assert got == expect, (trial, set(got) ^ set(expect))
