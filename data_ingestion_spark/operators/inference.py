"""Model-inference plumbing: batch classifier scoring over a text column.

This is the quality-classifier stage of a training-data pipeline (FastText
quality/toxicity models, fineweb-edu-style educational scorers, perplexity
filters): a model runs over every document, the score drives downstream
filtering and mixture weights.

Two tiers, mirroring the repo's multimodal codec pattern:

- **Column tier (default)**: a deterministic logistic quality prior
  computed entirely in JVM whole-stage codegen — no Python in the hot
  path, SQL-replayable, used by the driver-verified query.
- **Injectable tier**: any real model rides in through ``scorer`` as an
  Arrow-batched ``mapInPandas`` (pandas Series[str] → Series[float]); the
  executor loads the model once per partition, not per row. The sandbox
  ships no model runtimes, so tests inject a numpy fake — the Spark-side
  plumbing (schema, batching, partition-wise model reuse) is real.

Reference parity note: the reference (/root/reference/src) has no model
stage; §2.5 extension, Spark-first.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import tokens

#: Logistic prior weights: longer docs score higher, saturating ~e^3 tokens.
_W_LOGTOK = 0.9
_B = -3.0


def classifier_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    scorer: Callable | None = None,
) -> DataFrame:
    """Score every document with a quality classifier → (id, score_micro).

    Scale shape: zero shuffles either way. Column tier is one codegen'd
    projection; injectable tier is one ``mapInPandas`` pass whose batches
    are Arrow columns (no per-row pickling), with the model handle created
    once per partition iterator.

    Value parity (column tier): score = 1/(1+exp(−(w·ln(1+n_tokens)+b)))
    emitted as floor(score·1e6 + 0.5)::BIGINT. n_tokens is the exact
    whitespace token count (functions.tokens semantics).
    """
    if scorer is None:
        n_tok = F.size(tokens(F.col(text_col))).cast("double")
        logit = F.lit(_W_LOGTOK) * F.log(F.lit(1.0) + n_tok) + F.lit(_B)
        score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
        return df.select(
            F.col(id_col).alias("id"),
            F.floor(score * F.lit(1e6) + F.lit(0.5)).cast("long").alias(
                "score_micro"
            ),
        )

    def run(batches):
        import numpy as np
        import pandas as pd

        model = scorer  # per-partition handle; a real loader would init here
        for pdf in batches:
            if len(pdf) == 0:
                continue
            s = np.asarray(model(pdf["_text"]), dtype="float64")
            yield pd.DataFrame(
                {
                    "id": pdf["_id"],
                    "score_micro": np.floor(s * 1e6 + 0.5).astype("int64"),
                }
            )

    staged = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    return staged.mapInPandas(run, "id long, score_micro long")


def curriculum_bins(
    scored: DataFrame, n_bins: int = 4
) -> DataFrame:
    """Quantile-bin scored documents into curriculum tiers (the
    quality-bucketed mixing table: train mostly on top bins, keep a tail
    for diversity).

    ``ntile`` over (score, id) — the id tie-break makes bin assignment
    deterministic and engine-replayable. Scale note: a global ntile is a
    single-partition sort of (id, score) pairs — fine for a per-snapshot
    curriculum table built from scores (16 bytes/row); for 100 TB-corpus
    row counts switch to pre-computed quantile CUTS from a one-pass
    aggregate and a narrow ``CASE`` — same output, no global sort — which
    is what the companion ``curriculum_bins_by_cuts`` does.

    Output: (bin, n_docs, score_micro_min, score_micro_max).
    """
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("score_micro").asc(), F.col("id").asc())
    return (
        scored.withColumn("bin", F.ntile(n_bins).over(w))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("score_micro").alias("score_micro_min"),
            F.max("score_micro").alias("score_micro_max"),
        )
    )


def curriculum_bins_by_cuts(scored: DataFrame, cuts: list[int]) -> DataFrame:
    """Scale path for curriculum binning: explicit score cuts (from a
    prior aggregate or a fixed rubric) → narrow CASE projection + small
    aggregate. No global sort, no single-partition stage; bins are
    half-open (cut[i-1], cut[i]] with bin 1 = lowest.

    Output: (bin, n_docs, score_micro_min, score_micro_max).
    """
    b = F.lit(1)
    for i, c in enumerate(sorted(cuts), start=1):
        b = F.when(F.col("score_micro") > F.lit(int(c)), F.lit(i + 1)).otherwise(b)
    return (
        scored.withColumn("bin", b)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("score_micro").alias("score_micro_min"),
            F.max("score_micro").alias("score_micro_max"),
        )
    )


def binary_auc_exact(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """EXACT ROC-AUC of an integer score against a boolean label via the
    Mann-Whitney U rank statistic with midrank tie handling — the
    classifier QC you run before trusting a quality model to filter a
    100 TB corpus (AUC is the threshold-free discrimination measure; a
    near-0.5 classifier would delete random data).

    All arithmetic is INTEGER (doubled midranks avoid the /2), so an SQL
    oracle replays the statistic bit-for-bit:

        R2    = Σ_s c_pos(s) · (2·cum_before(s) + c(s) + 1)
        AUC   = (R2 − n_pos·(n_pos+1)) / (2·n_pos·n_neg)

    emitted as auc_micro = (1e6 · numerator) div denominator; degenerate
    label distributions (n_pos or n_neg = 0) emit the undefined-AUC
    convention 500000. 64-bit headroom: R2 ≤ 2N², so 1e6·R2 needs
    N ≲ 2e6 rows — past that, lift to decimal (same note as pmi).

    Scale shape: one (score, label) count aggregation collapses the
    corpus to the distinct-score grid (≤ 1e6 micro values — metadata,
    like ks_by_group's ECDF grid); one unpartitioned cumulative window
    over THAT grid (bounded, documented); one scalar aggregate.
    """
    grid = (
        df.select(F.col(score_col).alias("s"), F.col(label_col).cast("long").alias("y"))
        .groupBy("s")
        .agg(
            F.sum("y").alias("c_pos"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("s").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = grid.select(
        "c_pos",
        "c",
        (F.coalesce(F.sum("c").over(w), F.lit(0)) * 2 + F.col("c") + 1).alias(
            "midrank2"
        ),
    )
    return ranked.agg(
        F.sum("c_pos").cast("long").alias("n_pos"),
        (F.sum("c") - F.sum("c_pos")).cast("long").alias("n_neg"),
        F.sum(F.col("c_pos") * F.col("midrank2")).alias("r2"),
    ).select(
        "n_pos",
        "n_neg",
        F.expr(
            "CASE WHEN n_pos = 0 OR n_neg = 0 THEN 500000"
            " ELSE (1000000 * (r2 - n_pos * (n_pos + 1)))"
            " div (2 * n_pos * n_neg) END"
        )
        .cast("long")
        .alias("auc_micro"),
    )


def calibration_bins(
    scored: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Reliability-diagram table: equal-width score bins (micro scores in
    [0, 1e6]) with per-bin size, mean predicted score, and empirical
    positive rate — the calibration companion to binary_auc_exact (a
    discriminative but mis-calibrated quality model keeps the wrong
    volume when you threshold it). Integer-division arithmetic on both
    engines; the per-bin |confidence − accuracy| gaps are the ECE terms,
    left per-bin so the diagram stays inspectable."""
    width = 1_000_000 // n_bins
    binned = scored.select(
        # integer div keeps the bin id exact on both engines; scores of
        # exactly 1e6 clamp into the top bin
        F.expr(f"least({score_col} div {width}, {n_bins - 1})").alias("bin"),
        F.col(score_col).alias("s"),
        F.col(label_col).cast("long").alias("y"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("sum(s) div count(1)").cast("long").alias("mean_score_micro"),
            F.expr("(1000000 * sum(y)) div count(1)").cast("long").alias(
                "frac_pos_micro"
            ),
        )
        .orderBy("bin")
    )


def classification_report(
    df: DataFrame, score_col: str, label_col: str, threshold_micro: int = 500_000
) -> DataFrame:
    """Thresholded classifier evaluation against a boolean reference
    label: confusion counts plus precision / recall / F1 / Cohen's kappa,
    every metric in exact integer micros — the companion readout to
    binary_auc_exact (AUC is threshold-free; this is what the ONE
    deployed threshold actually does to the corpus) and the
    chance-corrected agreement (kappa) that a skewed keep-rate would
    otherwise hide behind raw accuracy.

        kappa = (N·(tp+tn) − pe) / (N² − pe),
        pe    = (tp+fp)(tp+fn) + (fn+tn)(fp+tn)

    Both engines truncate integer division toward zero (verified for the
    negative-kappa case), so one `div` emits identical micros. 64-bit
    headroom: 1e6·N² needs N ≲ 3e6 rows per evaluation slice — beyond
    that, lift to decimal (same note as binary_auc_exact).

    Scale shape: one scalar aggregation over (pred, label) indicator
    sums; zero joins, zero windows.
    """
    pred = (F.col(score_col) >= threshold_micro).cast("long")
    y = F.col(label_col).cast("long")
    agg = df.agg(
        F.sum(pred * y).cast("long").alias("tp"),
        F.sum(pred * (1 - y)).cast("long").alias("fp"),
        F.sum((1 - pred) * y).cast("long").alias("fn"),
        F.sum((1 - pred) * (1 - y)).cast("long").alias("tn"),
    )
    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr(
            "CASE WHEN tp + fp = 0 THEN 0"
            " ELSE (1000000 * tp) div (tp + fp) END"
        ).cast("long").alias("precision_micro"),
        F.expr(
            "CASE WHEN tp + fn = 0 THEN 0"
            " ELSE (1000000 * tp) div (tp + fn) END"
        ).cast("long").alias("recall_micro"),
        F.expr(
            "CASE WHEN 2 * tp + fp + fn = 0 THEN 0"
            " ELSE (2000000 * tp) div (2 * tp + fp + fn) END"
        ).cast("long").alias("f1_micro"),
        F.expr(
            "CASE WHEN (tp + fp + fn + tn) * (tp + fp + fn + tn)"
            "        - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) = 0"
            " THEN 0 ELSE"
            " (1000000 * ((tp + fp + fn + tn) * (tp + tn)"
            "             - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))))"
            " div ((tp + fp + fn + tn) * (tp + fp + fn + tn)"
            "      - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))) END"
        ).cast("long").alias("kappa_micro"),
    )
