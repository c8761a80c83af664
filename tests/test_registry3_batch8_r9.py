"""Cross-checks for the round-9 batch-8 operators: join-order advisor,
diagonal-Mahalanobis OOD, and the integer-halving decayed leaderboard."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_join_order_advisor_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import join_order_advisor

    r = join_order_advisor(spark, SF).collect()[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    cu = pd.read_parquet(f"{SF}/customer.parquet")

    def gated_counts(series):
        out: dict = {}
        for k in series:
            h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
            if h % 8 == 0:
                out[k] = out.get(k, 0) + 1
        return out

    lo_a = gated_counts(li["l_orderkey"])
    lo_b = gated_counts(od["o_orderkey"])
    est_lo = 8 * sum(c * lo_b[k] for k, c in lo_a.items() if k in lo_b)
    oc_a = gated_counts(od["o_custkey"])
    oc_b = gated_counts(cu["c_custkey"])
    est_oc = 8 * sum(c * oc_b[k] for k, c in oc_a.items() if k in oc_b)
    assert r["est_lo"] == est_lo
    assert r["est_oc"] == est_oc
    want = (
        "(orders JOIN customer) JOIN lineitem"
        if est_oc <= est_lo
        else "(lineitem JOIN orders) JOIN customer"
    )
    assert r["chosen_order"] == want
    # sanity: on TPC-H shapes the O-C intermediate is the smaller one
    assert est_oc <= est_lo


def test_ood_mahalanobis_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import (
        ood_mahalanobis_embeddings,
    )

    got = [(r["rk"], r["vec_id"], r["d2_micro"])
           for r in ood_mahalanobis_embeddings(spark, SF).collect()]
    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding]
            for r in pdf.itertuples()}
    n = len(vecs)
    ms, vs = [], []
    for i in range(64):
        col = [v[i] for v in vecs.values()]
        m = round(sum(col) / n, 6)
        ex2 = round(sum(x * x for x in col) / n, 6)
        ms.append(m)
        vs.append(max(ex2 - m * m, 1e-12))
    scored = []
    for vid, v in vecs.items():
        d2 = 0.0
        for i in range(64):
            d2 += (v[i] - ms[i]) * (v[i] - ms[i]) / vs[i]
        scored.append((-math.floor(d2 * 1e6 + 0.5), vid))
    scored.sort()
    expect = [(rk, vid, -negd) for rk, (negd, vid) in
              enumerate(scored[:20], 1)]
    # means computed by pandas (numpy pairwise sums) can differ from
    # Spark's in the last ulp BEFORE the 6-dp freeze; compare ranks and
    # allow micro slack on the frozen distance
    assert [(rk, vid) for rk, vid, _ in got] == [
        (rk, vid) for rk, vid, _ in expect
    ]
    for (_, _, a), (_, _, b) in zip(got, expect):
        assert abs(a - b) <= 2


def test_decayed_leaderboard_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import (
        decayed_leaderboard_events,
    )

    rows = decayed_leaderboard_events(spark, SF).collect()
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf["d"] = (pdf["ts"].dt.normalize()
                - pd.Timestamp("1970-01-01")).dt.days
    pdf["cents"] = pdf["value"].map(lambda v: math.floor(v * 100 + 0.5))
    max_d = int(pdf["d"].max())
    pdf["dec"] = [
        int(c) >> min((max_d - int(d)) // 7, 62)
        for c, d in zip(pdf["cents"], pdf["d"])
    ]
    expect = {}
    for et, grp in pdf.groupby("event_type"):
        raw, dec = int(grp["cents"].sum()), int(grp["dec"].sum())
        expect[et] = (len(grp), raw, dec, (dec * 1000000) // raw)
    for r in rows:
        assert expect[r["event_type"]] == (
            r["n_events"], r["raw_cents"], r["decayed_cents"],
            r["retention_micro"],
        )
        # halving decay can only lose mass
        assert r["decayed_cents"] <= r["raw_cents"]
    # ordering contract: by decayed score desc
    decs = [r["decayed_cents"] for r in rows]
    assert decs == sorted(decs, reverse=True)
