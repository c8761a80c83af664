"""Pin the windowFunnel (deadline-bounded greedy funnel) semantics of
temporal.funnel_steps against hand-computed fixtures."""
from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_ingestion_spark.operators import temporal


def _ev(spark, rows):
    return spark.createDataFrame(rows, "u long, et string, t timestamp")


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(hours):
    return T0 + dt.timedelta(hours=hours)


def _counts(df):
    return {r["step_name"]: r["n_users"] for r in df.collect()}


def test_full_funnel_within_window(spark):
    ev = _ev(
        spark,
        [(1, "view", ts(0)), (1, "click", ts(1)), (1, "purchase", ts(2))],
    )
    out = temporal.funnel_steps(ev, "u", "et", "t", ["view", "click", "purchase"])
    assert _counts(out) == {"view": 1, "click": 1, "purchase": 1}
    convs = [r["conv_from_first_micro"] for r in out.orderBy("step_idx").collect()]
    assert convs == [1_000_000, 1_000_000, 1_000_000]


def test_order_is_strict(spark):
    # click BEFORE the first view → stage 2 never fires
    ev = _ev(spark, [(1, "click", ts(0)), (1, "view", ts(1))])
    out = temporal.funnel_steps(ev, "u", "et", "t", ["view", "click"])
    assert _counts(out) == {"view": 1, "click": 0}
    # click at the SAME instant as the view does not count (strictly after)
    ev2 = _ev(spark, [(2, "view", ts(0)), (2, "click", ts(0))])
    out2 = temporal.funnel_steps(ev2, "u", "et", "t", ["view", "click"])
    assert _counts(out2) == {"view": 1, "click": 0}


def test_deadline_excludes_late_completion(spark):
    # purchase lands 8 days after the first view → outside the 7-day window
    ev = _ev(
        spark,
        [(1, "view", ts(0)), (1, "click", ts(1)), (1, "purchase", ts(8 * 24))],
    )
    out = temporal.funnel_steps(ev, "u", "et", "t", ["view", "click", "purchase"])
    assert _counts(out) == {"view": 1, "click": 1, "purchase": 0}
    # widen the window and the same data completes
    out2 = temporal.funnel_steps(
        ev, "u", "et", "t", ["view", "click", "purchase"], window="9 days"
    )
    assert _counts(out2) == {"view": 1, "click": 1, "purchase": 1}


def test_greedy_anchor_is_first_view(spark):
    # The walk anchors at the EARLIEST view (day 0), so its 7-day deadline
    # expires before the late click→purchase pair — windowFunnel's greedy
    # contract, pinned deliberately (a per-anchor retry would find it).
    ev = _ev(
        spark,
        [
            (1, "view", ts(0)),
            (1, "view", ts(10 * 24)),
            (1, "click", ts(10 * 24 + 1)),
            (1, "purchase", ts(10 * 24 + 2)),
        ],
    )
    out = temporal.funnel_steps(ev, "u", "et", "t", ["view", "click", "purchase"])
    assert _counts(out) == {"view": 1, "click": 0, "purchase": 0}


def test_conversion_rates_across_users(spark):
    ev = _ev(
        spark,
        [
            (1, "view", ts(0)), (1, "click", ts(1)), (1, "purchase", ts(2)),
            (2, "view", ts(0)), (2, "click", ts(3)),
            (3, "view", ts(0)),
            (4, "click", ts(0)),  # never viewed → not in funnel at all
        ],
    )
    out = temporal.funnel_steps(ev, "u", "et", "t", ["view", "click", "purchase"])
    rows = {r["step_name"]: r for r in out.collect()}
    assert rows["view"]["n_users"] == 3
    assert rows["click"]["n_users"] == 2
    assert rows["purchase"]["n_users"] == 1
    assert rows["click"]["conv_from_first_micro"] == 666_666
    assert rows["purchase"]["conv_from_first_micro"] == 333_333


def test_window_funnel_exact_recovers_late_anchor(spark):
    """The case the greedy restriction loses: the first view's 7-day
    window expires before the click→purchase pair, but a LATER view
    anchors a completing chain — exact windowFunnel must count it."""
    ev = _ev(
        spark,
        [
            (1, "view", ts(0)),
            (1, "view", ts(10 * 24)),
            (1, "click", ts(10 * 24 + 1)),
            (1, "purchase", ts(10 * 24 + 2)),
        ],
    )
    exact = temporal.window_funnel_exact(
        ev, "u", "et", "t", ["view", "click", "purchase"]
    )
    counts = {r["step_name"]: r["n_users"] for r in exact.collect()}
    assert counts == {"view": 1, "click": 1, "purchase": 1}
    # greedy on the same data reports step 0 only (pinned above)
    greedy = temporal.funnel_steps(ev, "u", "et", "t", ["view", "click", "purchase"])
    assert _counts(greedy) == {"view": 1, "click": 0, "purchase": 0}


def test_window_funnel_exact_equals_greedy_on_single_anchor(spark):
    """With one view per user the two semantics coincide exactly."""
    ev = _ev(
        spark,
        [
            (1, "view", ts(0)), (1, "click", ts(1)), (1, "purchase", ts(2)),
            (2, "view", ts(0)), (2, "click", ts(3)),
            (3, "view", ts(0)),
        ],
    )
    exact = temporal.window_funnel_exact(
        ev, "u", "et", "t", ["view", "click", "purchase"]
    )
    counts = {r["step_name"]: r["n_users"] for r in exact.collect()}
    assert counts == {"view": 3, "click": 2, "purchase": 1}
