"""Cross-checks for the round-9 batch-3 operators: residual IVF-PQ,
bipartite label propagation, and mergeable quantile summaries — each
against an independent pure-Python reference (the DuckDB oracle already
replays them end-to-end at 3 SFs; these pin the algebra on inputs the
fixture doesn't reach)."""

from __future__ import annotations

import math
import random

import pandas as pd

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# Residual PQ algebra: with k >= n the codebook is exact, so ADC ranking
# must equal the exact residual-space distance ranking
# --------------------------------------------------------------------------
def test_residual_pq_exact_when_codebook_saturates(spark):
    from pyspark.sql import functions as F

    from data_ingestion_spark.operators import similarity

    rnd = random.Random(7)
    dim, m, k = 8, 2, 8
    d_sub = dim // m
    vecs = [
        (i, [round(rnd.uniform(-1, 1), 3) for _ in range(dim)])
        for i in range(8)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    cents = similarity.ivf_centroids_from_sample(df, 1)
    case_cv = f"WHEN 0 THEN {similarity._sql_double_array(cents[0])}"
    res = df.withColumn("list_id", F.lit(0)).select(
        "vec_id",
        F.expr(
            f"zip_with(embedding, CASE list_id {case_cv} END,"
            " (x, y) -> CAST(x AS DOUBLE) - y)"
        ).alias("rv"),
    )
    books = similarity.pq_train(res, "vec_id", "rv", m=m, k=k, n_iter=2)
    codes = {
        r["vec_id"]: [r[f"code_{s}"] for s in range(m)]
        for r in similarity.pq_encode(res, "vec_id", "rv", books).collect()
    }
    rv = {r["vec_id"]: list(r["rv"]) for r in res.collect()}
    # with k = n and distinct vectors, every residual becomes (a 6-dp
    # rounding of) its own codeword -> quantization error ~0, so ADC
    # between q's residual and x's codes tracks ||q_res - x_res||^2
    for q in rv:
        adc = {}
        exact = {}
        for x, cx in codes.items():
            a = 0
            for s in range(m):
                word = books[s][cx[s]]
                d2 = 0.0
                for j in range(d_sub):
                    diff = rv[q][s * d_sub + j] - word[j]
                    d2 += diff * diff
                a += math.floor(d2 * 1e6 + 0.5)
            adc[x] = a
            exact[x] = sum(
                (rv[q][i] - rv[x][i]) ** 2 for i in range(dim)
            )
        # micro-exact up to the 6-dp codeword rounding: same ordering
        order_adc = sorted(adc, key=lambda x: (adc[x], x))
        order_exact = sorted(exact, key=lambda x: (round(exact[x], 4), x))
        assert order_adc == order_exact, (q, adc, exact)


def test_residual_pq_registry_shape(spark):
    from data_ingestion_spark.operators.registry3 import (
        pq_ivf_residual_topk_embeddings,
    )

    rows = pq_ivf_residual_topk_embeddings(spark, SF).collect()
    qids = sorted({r["qid"] for r in rows})
    assert qids == [0, 1, 2]
    for q in qids:
        ranks = [r["rk"] for r in rows if r["qid"] == q]
        assert ranks == [1, 2, 3, 4, 5]
    # adc is monotone in rank within each query
    for q in qids:
        adcs = [r["adc_micro"] for r in sorted(
            (r for r in rows if r["qid"] == q), key=lambda r: r["rk"]
        )]
        assert adcs == sorted(adcs)


# --------------------------------------------------------------------------
# Label propagation vs a pure-Python replay on a random bipartite graph
# --------------------------------------------------------------------------
def test_label_propagation_matches_python(spark, tmp_path):
    from data_ingestion_spark.operators.registry3 import (
        label_propagation_trade_graph,
    )

    rnd = random.Random(23)
    orders, lineitem = [], []
    # two planted blocks of customers/suppliers + a few cross edges
    edges = set()
    for blk in range(2):
        custs = range(blk * 10, blk * 10 + 6)
        supps = range(blk * 10, blk * 10 + 5)
        for c in custs:
            for s in rnd.sample(list(supps), 3):
                edges.add((c, s))
    edges.add((0, 10))  # one weak cross-block tie
    for i, (c, s) in enumerate(sorted(edges)):
        orders.append((i, c))
        lineitem.append((i, s, 50.0))
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lineitem, "l_orderkey long, l_suppkey long, l_quantity double"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    got = {
        (r["community"], r["n_members"])
        for r in label_propagation_trade_graph(spark, str(tmp_path)).collect()
    }

    pairs = {(c * 2, s * 2 + 1) for c, s in edges}
    to_s: dict = {}
    to_c: dict = {}
    for c, s in pairs:
        to_s.setdefault(s, []).append(c)
        to_c.setdefault(c, []).append(s)
    lab = {n: n for n in set(to_s) | set(to_c)}

    def half(targets):
        upd = {}
        for node, nbrs in targets.items():
            cnt: dict = {}
            for nb in nbrs:
                cnt[lab[nb]] = cnt.get(lab[nb], 0) + 1
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            upd[node] = best
        lab.update(upd)

    half(to_s)
    half(to_c)
    half(to_s)
    sizes: dict = {}
    for n, l in lab.items():
        sizes[l] = sizes.get(l, 0) + 1
    expect = set(
        sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    )
    assert got == expect
    assert len(expect) >= 2  # the planted blocks stay separate


# --------------------------------------------------------------------------
# Mergeable quantile summaries vs a pure-Python replay
# --------------------------------------------------------------------------
def test_quantile_merge_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import (
        quantile_merge_summaries_docs,
    )

    got = {r["p_micro"]: r for r in quantile_merge_summaries_docs(
        spark, SF
    ).collect()}
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    vals = list(zip(pdf["source"], pdf["n_chars"].astype(int), pdf["doc_id"]))
    n_total = len(vals)
    # per-source summaries
    summ = []
    by_src: dict = {}
    for s, v, d in vals:
        by_src.setdefault(s, []).append((v, d))
    for s, items in by_src.items():
        items.sort()
        n_s = len(items)
        step = max(n_s // 32, 1)
        prev = 0
        for r in range(1, n_s + 1):
            if r % step == 0 or r == n_s:
                summ.append((items[r - 1][0], s, r, r - prev))
                prev = r
    summ.sort(key=lambda t: (t[0], t[1], t[2]))
    svals = sorted(v for _, v, _ in vals)
    for p_micro in (250000, 500000, 750000):
        target = math.ceil(n_total * p_micro / 1000000.0)
        cum = 0
        est = None
        for v, s, r, wt in summ:
            cum += wt
            if cum >= target:
                est = v
                break
        exact = svals[target - 1]
        cnt_lt = sum(1 for v in svals if v < est)
        cnt_le = sum(1 for v in svals if v <= est)
        err = max(cnt_lt + 1 - target, target - cnt_le, 0)
        r = got[p_micro]
        assert r["target_rank"] == target
        assert r["est_value"] == est
        assert r["exact_value"] == exact
        assert r["err_rows"] == err
        assert r["err_micro"] == (1000000 * err) // n_total
