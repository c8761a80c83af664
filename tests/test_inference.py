"""Tests for the classifier-scoring stage (column tier + injectable
mapInPandas tier) and curriculum binning."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from data_ingestion_spark.operators import inference


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a"),
            (2, "one two three four"),
            (3, " ".join(["tok"] * 50)),
            (4, " ".join(["tok"] * 500)),
        ],
        "doc_id long, text string",
    )


def test_column_tier_matches_injected_numpy_replica(spark):
    """The injectable tier with a numpy replica of the logistic prior must
    reproduce the column tier exactly — proves the mapInPandas plumbing
    (schema, batching, Arrow transfer) is faithful."""

    def fake_model(texts):
        n = np.array([len([w for w in str(t).split() if w]) for t in texts])
        return 1.0 / (1.0 + np.exp(-(0.9 * np.log(1.0 + n.astype("float64")) - 3.0)))

    col_tier = {
        r["id"]: r["score_micro"]
        for r in inference.classifier_scores(_docs(spark), "doc_id", "text").collect()
    }
    udf_tier = {
        r["id"]: r["score_micro"]
        for r in inference.classifier_scores(
            _docs(spark), "doc_id", "text", scorer=fake_model
        ).collect()
    }
    assert col_tier == udf_tier
    assert col_tier[4] > col_tier[3] > col_tier[2] > col_tier[1]  # monotone in length


def test_column_tier_is_zero_shuffle(spark):
    out = inference.classifier_scores(_docs(spark), "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_curriculum_bins_balanced_and_ordered(spark):
    scored = spark.createDataFrame(
        [(i, i * 1000) for i in range(20)], "id long, score_micro long"
    )
    out = {r["bin"]: r for r in inference.curriculum_bins(scored, 4).collect()}
    assert sorted(out) == [1, 2, 3, 4]
    assert all(out[b]["n_docs"] == 5 for b in out)
    assert out[1]["score_micro_max"] < out[2]["score_micro_min"]


def test_curriculum_bins_by_cuts_no_sort_matches_case_semantics(spark):
    scored = spark.createDataFrame(
        [(i, i * 1000) for i in range(20)], "id long, score_micro long"
    )
    out = {
        r["bin"]: r
        for r in inference.curriculum_bins_by_cuts(
            scored, cuts=[4000, 9000, 14000]
        ).collect()
    }
    assert {b: out[b]["n_docs"] for b in sorted(out)} == {1: 5, 2: 5, 3: 5, 4: 5}
    plan = inference.curriculum_bins_by_cuts(scored, cuts=[4000])._jdf
    # single aggregate exchange; no global sort stage
    s = plan.queryExecution().executedPlan().toString()
    assert "Sort" not in s


# ---------------------------------------------------------------------------
# Exact AUC + calibration (round 7)
# ---------------------------------------------------------------------------
def test_binary_auc_perfect_and_inverted(spark):
    from data_ingestion_spark.operators.inference import binary_auc_exact

    perfect = spark.createDataFrame(
        [(10, False), (20, False), (30, True), (40, True)], "s long, y boolean"
    )
    row = binary_auc_exact(perfect, "s", "y").collect()[0]
    assert (row["n_pos"], row["n_neg"], row["auc_micro"]) == (2, 2, 1_000_000)
    inverted = spark.createDataFrame(
        [(40, False), (30, False), (20, True), (10, True)], "s long, y boolean"
    )
    assert binary_auc_exact(inverted, "s", "y").collect()[0]["auc_micro"] == 0


def test_binary_auc_midrank_ties(spark):
    """All-tied scores ⇒ AUC exactly 0.5 via midranks (a naive rank
    would bias by arrival order)."""
    from data_ingestion_spark.operators.inference import binary_auc_exact

    tied = spark.createDataFrame(
        [(5, True), (5, False), (5, True), (5, False)], "s long, y boolean"
    )
    assert binary_auc_exact(tied, "s", "y").collect()[0]["auc_micro"] == 500_000


def test_binary_auc_degenerate_labels(spark):
    from data_ingestion_spark.operators.inference import binary_auc_exact

    allpos = spark.createDataFrame([(1, True), (2, True)], "s long, y boolean")
    assert binary_auc_exact(allpos, "s", "y").collect()[0]["auc_micro"] == 500_000


def test_calibration_bins_well_calibrated_fixture(spark):
    """A fixture whose empirical rate equals its score lands each bin's
    frac_pos at its mean score (up to integer division)."""
    from data_ingestion_spark.operators.inference import calibration_bins

    rows = []
    for bin_mid, rate in [(150_000, 0.15), (850_000, 0.85)]:
        for i in range(100):
            rows.append((bin_mid, i < rate * 100))
    df = spark.createDataFrame(rows, "s long, y boolean")
    got = {r["bin"]: (r["n_docs"], r["mean_score_micro"], r["frac_pos_micro"])
           for r in calibration_bins(df, "s", "y", n_bins=10).collect()}
    assert got == {1: (100, 150_000, 150_000), 8: (100, 850_000, 850_000)}


def test_classification_report_hand_computed(spark):
    from data_ingestion_spark.operators import inference

    # 4 TP, 1 FP, 2 FN, 3 TN → P=0.8, R=2/3, F1=0.727..., kappa hand-checked
    rows = (
        [(900_000, True)] * 4 + [(900_000, False)] * 1
        + [(100_000, True)] * 2 + [(100_000, False)] * 3
    )
    df = spark.createDataFrame(rows, "score_micro long, keep boolean")
    r = inference.classification_report(df, "score_micro", "keep").collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (4, 1, 2, 3)
    assert r["precision_micro"] == 800_000
    assert r["recall_micro"] == 666_666
    assert r["f1_micro"] == 727_272
    # po = 0.7, pe = (5*6 + 5*4)/100 = 0.5 → kappa = 0.4
    assert r["kappa_micro"] == 400_000


def test_classification_report_negative_kappa(spark):
    from data_ingestion_spark.operators import inference

    # systematic disagreement → kappa < 0, pinned for the div-truncation
    # cross-engine case
    rows = [(900_000, False)] * 3 + [(100_000, True)] * 3
    df = spark.createDataFrame(rows, "score_micro long, keep boolean")
    r = inference.classification_report(df, "score_micro", "keep").collect()[0]
    assert (r["tp"], r["tn"]) == (0, 0)
    assert r["kappa_micro"] == -1_000_000


def test_classification_report_degenerate(spark):
    from data_ingestion_spark.operators import inference

    df = spark.createDataFrame([(900_000, True)] * 3, "score_micro long, keep boolean")
    r = inference.classification_report(df, "score_micro", "keep").collect()[0]
    assert r["precision_micro"] == 1_000_000
    assert r["recall_micro"] == 1_000_000
    # all-one-cell confusion → pe == N², kappa defined as 0
    assert r["kappa_micro"] == 0
