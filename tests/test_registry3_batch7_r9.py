"""Cross-checks for the round-9 batch-7 operators: diff-in-differences,
churn hazard table, and the A/B conversion chi-square — pure-Python
replays plus planted-effect sanity."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _arm(uid: int) -> int:
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2


def test_diff_in_diff_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import diff_in_diff_events

    r = diff_in_diff_events(spark, SF).collect()[0]
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf["treated"] = pdf["user_id"].map(_arm)
    pdf["post"] = (pdf["ts"] >= pd.Timestamp("2024-01-16")).astype(int)
    pdf["cents"] = pdf["value"].map(lambda v: math.floor(v * 100 + 0.5))
    m = {}
    for (t, p), grp in pdf.groupby(["treated", "post"]):
        m[(t, p)] = (int(grp["cents"].sum()) * 1000000) // len(grp)
        n_col = {(1, 0): "n_treat_pre", (1, 1): "n_treat_post",
                 (0, 0): "n_ctrl_pre", (0, 1): "n_ctrl_post"}[(t, p)]
        assert r[n_col] == len(grp)
    assert r["mean_treat_pre"] == m[(1, 0)]
    assert r["did_micro"] == (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])


def test_churn_hazard_matches_python_and_sums(spark):
    from data_ingestion_spark.operators.registry3 import churn_hazard_events

    rows = churn_hazard_events(spark, SF).collect()
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf["d"] = (pdf["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    life = pdf.groupby("user_id")["d"].agg(["min", "max"])
    ks = (life["max"] - life["min"]).astype(int)
    per_k = ks.value_counts().to_dict()
    total = len(life)
    for r in rows:
        at_risk = sum(v for k, v in per_k.items() if k >= r["k"])
        assert r["n_churned"] == per_k[r["k"]]
        assert r["n_at_risk"] == at_risk
        assert r["hazard_micro"] == (1000000 * per_k[r["k"]]) // at_risk
    # life-table identities: risk set at k=min is everyone; churn sums to n
    assert rows[0]["n_at_risk"] == total
    assert sum(r["n_churned"] for r in rows) == total
    # hazard at the maximum observed lifetime is 1 by construction
    assert rows[-1]["hazard_micro"] == 1000000


def test_ab_conversion_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import (
        ab_conversion_test_events,
    )

    r = ab_conversion_test_events(spark, SF).collect()[0]
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    conv = pdf.groupby("user_id")["event_type"].agg(
        lambda s: int((s == "purchase").any())
    )
    na = ca = nb = cb = 0
    for uid, c in conv.items():
        if _arm(int(uid)) == 0:
            na += 1
            ca += c
        else:
            nb += 1
            cb += c
    assert (r["n_users_a"], r["n_conv_a"]) == (na, ca)
    assert (r["n_users_b"], r["n_conv_b"]) == (nb, cb)
    assert r["rate_a_micro"] == (1000000 * ca) // na
    if (ca + cb) == 0 or (na + nb - ca - cb) == 0:
        assert r["chi2_micro"] == 0
    else:
        d = ca * (nb - cb) - cb * (na - ca)
        t1 = (d * d * 1000000) // (na * nb)
        chi2 = (t1 * (na + nb)) // ((ca + cb) * (na + nb - ca - cb))
        assert r["chi2_micro"] == chi2
    assert r["independent_at_05"] == (r["chi2_micro"] < 3841459)


def test_diff_in_diff_detects_planted_effect(spark, tmp_path):
    """A planted treated-post lift must surface as did_micro > 0 while a
    parallel-trend placebo stays ~0."""
    import random

    from data_ingestion_spark.operators.registry3 import diff_in_diff_events

    rnd = random.Random(3)
    rows = []
    eid = 0
    # find users per arm under the md5 bucketing
    treated = [u for u in range(1, 200) if _arm(u) == 1][:20]
    control = [u for u in range(1, 200) if _arm(u) == 0][:20]
    for users, lift in ((treated, 5.0), (control, 0.0)):
        for u in users:
            for post, ts in ((0, "2024-01-05 10:00:00"),
                             (1, "2024-01-20 10:00:00")):
                eid += 1
                base = 10.0 + rnd.uniform(-0.5, 0.5)
                v = base + (lift if post else 0.0)
                rows.append((eid, ts, u, "view", v, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "to_timestamp(ts) AS ts", "user_id", "event_type",
        "value", "props"
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = diff_in_diff_events(spark, str(tmp_path)).collect()[0]
    # lift of 5.0 -> did_micro ~ 500 cent-micros * 1e6-scale
    assert r["did_micro"] > 400 * 1000000
