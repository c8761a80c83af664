"""Cross-checks for the round-9 batch-4 operators: split-conformal
coverage, deterministic Poisson bootstrap, and golden-record entity
resolution — pure-Python replays plus the invariants the fixture can't
pin (conformal's finite-sample rank, Poisson CDF mass, survivorship)."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_conformal_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import (
        conformal_coverage_docs,
    )

    r = conformal_coverage_docs(spark, SF).collect()[0]
    pdf = pd.read_parquet(f"{SF}/documents.parquet")

    def nc(text: str) -> int:
        toks = [t for t in text.lower().split() if t]
        score = math.floor(
            1.0 / (1.0 + math.exp(-(0.9 * math.log(1.0 + len(toks)) - 3.0)))
            * 1e6 + 0.5
        )
        return 1000000 - score

    pdf["nc"] = pdf["text"].map(nc)
    cal = sorted(pdf.loc[pdf["doc_id"] % 5 == 0, "nc"])
    ev = list(pdf.loc[pdf["doc_id"] % 5 != 0, "nc"])
    n_cal = len(cal)
    k = ((n_cal + 1) * 9 + 9) // 10
    thr = cal[k - 1] if k <= n_cal else 1000001
    covered = sum(1 for v in ev if v <= thr)
    assert r["n_cal"] == n_cal
    assert r["k_rank"] == k
    assert r["threshold_nc"] == thr
    assert r["n_eval"] == len(ev)
    assert r["n_covered"] == covered
    assert r["coverage_micro"] == (1000000 * covered) // len(ev)
    # the conformal guarantee direction: with exchangeable splits coverage
    # concentrates near >= 0.9; allow slack for the deterministic split
    assert r["coverage_micro"] >= 800000


def test_bootstrap_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import bootstrap_se_sources

    got = {r["source"]: r for r in bootstrap_se_sources(spark, SF).collect()}
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    cum = (367879, 735758, 919698, 981011, 996340)

    def w(doc_id: int, b: int) -> int:
        h = int(
            hashlib.md5(f"{doc_id}-{b}".encode()).hexdigest()[:15], 16
        ) % 1000000
        for i, c in enumerate(cum):
            if h < c:
                return i
        return 5

    for source, grp in pdf.groupby("source"):
        ids = list(zip(grp["doc_id"].astype(int), grp["n_chars"].astype(int)))
        ms = []
        for b in range(32):
            swv = sum(w(d, b) * v for d, v in ids)
            sw = sum(w(d, b) for d, v in ids)
            if sw > 0:
                ms.append((swv * 1000000) // sw)
        B = len(ms)
        sm, sm2 = sum(ms), sum(m * m for m in ms)
        var = (B * sm2 - sm * sm) // (B * max(B - 1, 1))
        r = got[source]
        assert r["n_replicas"] == B
        assert r["var_boot_micro2"] == var
        assert r["se_boot_micro"] == math.floor(math.sqrt(var) + 0.5)
        assert r["mean_micro"] == (
            sum(v for _, v in ids) * 1000000
        ) // len(ids)


def test_poisson_weights_mass():
    """The inverse-CDF thresholds are the true Poisson(1) CDF at 1e-6
    granularity (floor of the exact cumulative)."""
    import math

    cum_exact = 0.0
    for k, c in enumerate((367879, 735758, 919698, 981011, 996340)):
        cum_exact += math.exp(-1) / math.factorial(k)
        assert c == math.floor(cum_exact * 1e6), k


def test_golden_record_planted(spark, tmp_path):
    """Planted entity clusters: two near-name groups merge, the canonical
    row is the max-balance member (tie lowest key), unrelated names stay
    out."""
    from data_ingestion_spark.operators.registry3 import (
        golden_record_customers,
    )

    rows = [
        # cluster 1: edit distance 1 within a shared 16-char prefix block
        (1, "Customer#000000001x", 10.0),
        (2, "Customer#000000001y", 99.0),   # canonical (max balance)
        (3, "Customer#000000001x", 50.0),   # same name as key 1
        # cluster 2
        (10, "Customer#000000777a", 5.0),
        (11, "Customer#000000777b", 5.0),   # tie -> lower key 10 wins
        # singleton (different block)
        (20, "Zzz#unrelated-name", 1000.0),
    ]
    spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_acctbal double"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    out = {r["component"]: r for r in golden_record_customers(
        spark, str(tmp_path)
    ).collect()}
    assert set(out) == {1, 10}
    c1 = out[1]
    assert c1["n_rows"] == 3 and c1["n_names"] == 2
    assert c1["canon_custkey"] == 2
    assert c1["canon_acctbal_cents"] == 9900
    c2 = out[10]
    assert c2["n_rows"] == 2 and c2["n_names"] == 2
    assert c2["canon_custkey"] == 10
    assert c2["canon_acctbal_cents"] == 500
