"""Cross-checks for the round-9 batch-6 operators: join-view incremental
maintenance (delta algebra vs planted corruption) and the A/B SRM audit
vs a pure-Python replay."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_ivm_equals_full_recompute_and_paths_disjoint(spark):
    """The maintained view must equal the from-scratch target, and the
    three maintenance paths (evicted / repaired / appended) must
    partition it — no double-applied keys, no missed evictions."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.operators.registry3 import (
        ivm_join_orders_customer,
    )
    from data_ingestion_spark.session import load_table

    got = {r["c_mktsegment"]: (r["n_rows"], r["sum_cents"])
           for r in ivm_join_orders_customer(spark, SF).collect()}
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    target = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.when(F.col("c_custkey") % 53 == 0, F.lit("MOVED"))
            .otherwise(F.col("c_mktsegment")).alias("seg"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).alias("cents"),
        )
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
        .collect()
    )
    expect = {r["seg"]: (r["n"], r["s"]) for r in target}
    assert got == expect
    # total row conservation: view rows == orders rows (inner join on a
    # complete dim -> every order appears exactly once)
    assert sum(n for n, _ in got.values()) == orders.count()


def test_ab_srm_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import ab_srm_check_events

    r = ab_srm_check_events(spark, SF).collect()[0]
    pdf = pd.read_parquet(f"{SF}/events.parquet")

    def arm(uid: int) -> int:
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2

    pdf["arm"] = pdf["user_id"].map(arm)
    na = pdf.loc[pdf["arm"] == 0, "user_id"].nunique()
    nb = pdf.loc[pdf["arm"] == 1, "user_id"].nunique()
    chi2 = ((na - nb) * (na - nb) * 1000000) // (na + nb)
    assert (r["n_users_a"], r["n_users_b"]) == (na, nb)
    assert r["srm_chi2_micro"] == chi2
    assert r["srm_pass"] == (chi2 < 3841459)
    for armno, (ec, mc) in {0: ("n_events_a", "mean_cents_micro_a"),
                            1: ("n_events_b", "mean_cents_micro_b")}.items():
        sub = pdf[pdf["arm"] == armno]
        cents = sub["value"].map(lambda v: math.floor(v * 100 + 0.5)).sum()
        assert r[ec] == len(sub)
        assert r[mc] == (int(cents) * 1000000) // len(sub)
