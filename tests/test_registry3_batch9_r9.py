"""Cross-checks for the round-9 batch-9 operators: AMS F2 sketch,
Adamic-Adar link prediction, column-encoding advisor."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _h60(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


def test_ams_f2_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import ams_f2_events

    r = ams_f2_events(spark, SF).collect()[0]
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    users = [int(u) for u in pdf["user_id"]]
    z = [0] * 16
    for u in users:
        h = _h60(u)
        for j in range(16):
            z[j] += 1 - 2 * ((h >> j) & 1)
    ests = sorted(x * x for x in z)
    f2_est = ests[7]  # lower median of 16
    counts: dict = {}
    for u in users:
        counts[u] = counts.get(u, 0) + 1
    f2_exact = sum(c * c for c in counts.values())
    assert r["f2_exact"] == f2_exact
    assert r["f2_est"] == f2_est
    assert r["rel_err_micro"] == (
        abs(f2_est - f2_exact) * 1000000
    ) // f2_exact
    # AMS error concentrates near sqrt-law bounds; a wildly broken hash
    # would blow this (tolerant: within 3x of F2)
    assert r["rel_err_micro"] < 3_000_000


def test_adamic_adar_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import adamic_adar_suppliers

    got = [(r["s1"], r["s2"], r["aa_micro"], r["n_common"])
           for r in adamic_adar_suppliers(spark, SF).collect()]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    j = li[li["l_quantity"] > 45].merge(
        od, left_on="l_orderkey", right_on="o_orderkey"
    )
    edges = {(int(c), int(s)) for c, s in zip(j["o_custkey"], j["l_suppkey"])}
    deg: dict = {}
    for c, s in edges:
        deg[c] = deg.get(c, 0) + 1
    pairs: dict = {}
    by_c: dict = {}
    for c, s in edges:
        by_c.setdefault(c, []).append(s)
    for c, ss in by_c.items():
        if deg[c] < 2:
            continue
        w = math.floor(1000000.0 / math.log(deg[c]) + 0.5)
        ss = sorted(ss)
        for i in range(len(ss)):
            for k in range(i + 1, len(ss)):
                key = (ss[i], ss[k])
                aa, n = pairs.get(key, (0, 0))
                pairs[key] = (aa + w, n + 1)
    expect = sorted(
        ((s1, s2, aa, n) for (s1, s2), (aa, n) in pairs.items()),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:20]
    assert got == expect


def test_encoding_advisor_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import (
        encoding_advisor_lineitem,
    )

    got = {r["column"]: r for r in encoding_advisor_lineitem(
        spark, SF
    ).collect()}
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    cols = {
        "returnflag": li["l_returnflag"].astype(str),
        "linestatus": li["l_linestatus"].astype(str),
        "shipdate": li["l_shipdate"].dt.date.astype(str),
        "quantity": li["l_quantity"].astype(int).astype(str),
    }
    for name, vals in cols.items():
        df = pd.DataFrame({
            "k": li["l_orderkey"], "ln": li["l_linenumber"], "v": vals,
        }).sort_values(["k", "ln", "v"], kind="mergesort")
        n_rows = len(df)
        ndv = df["v"].nunique()
        n_runs = 0
        prev_key = None
        prev_v = None
        for k, v in zip(df["k"], df["v"]):
            if k != prev_key or v != prev_v:
                n_runs += 1
            prev_key, prev_v = k, v
        r = got[name]
        assert r["n_rows"] == n_rows
        assert r["ndv"] == ndv
        assert r["n_runs"] == n_runs, name
        assert r["ndv_ratio_micro"] == (ndv * 1000000) // n_rows
        assert r["avg_run_micro"] == (n_rows * 1000000) // n_runs
        if ndv <= 64:
            want = "DICT"
        elif (n_rows * 1000000) // n_runs >= 2000000:
            want = "RLE"
        else:
            want = "PLAIN"
        assert r["recommendation"] == want
    # the advisor must actually discriminate on this fixture
    recs = {r["recommendation"] for r in got.values()}
    assert "DICT" in recs and len(recs) >= 2


def test_plagiarism_pairs_planted(spark, tmp_path):
    """A lifted passage must surface with high containment; boilerplate
    shared by > 10 docs must be filtered and create no pairs."""
    from data_ingestion_spark.operators.registry3 import plagiarism_pairs_docs

    lifted = "the quick brown fox jumps over the lazy dog tonight"
    boiler = "standard legal disclaimer text appears everywhere verbatim"
    rows = []
    rows.append((1, f"original work alpha {lifted} end of document one",
                 "en", "s", 60))
    rows.append((2, f"plagiarist copy {lifted} plus unrelated padding words",
                 "en", "s", 60))
    # 12 docs sharing ONLY boilerplate (df > 10 -> all its fps dropped)
    for i in range(3, 15):
        rows.append((i, f"unique body {i} {boiler} trailing {i}",
                     "en", "s", 60))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = [(r["id_a"], r["id_b"], r["containment_micro"])
           for r in plagiarism_pairs_docs(spark, str(tmp_path)).collect()]
    assert any(a == 1 and b == 2 and c > 300000 for a, b, c in got), got
    boiler_ids = set(range(3, 15))
    assert not any(a in boiler_ids and b in boiler_ids for a, b, _ in got)
