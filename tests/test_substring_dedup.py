"""Tests for corpus-wide duplicated-substring removal (ExactSubstr)."""

from __future__ import annotations

from data_ingestion_spark.operators import text


def _run(spark, rows, k=3):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.dedup_substring_spans(df, "doc_id", "text", k=k)
    return {r["id"]: r.asDict() for r in out.collect()}


def test_first_occurrence_survives_later_copy_cut(spark):
    shared = "alpha beta gamma"
    out = _run(
        spark,
        [(1, f"{shared} one two"), (2, f"head {shared} three four")],
        k=3,
    )
    assert out[1]["n_removed"] == 0
    assert out[1]["text_dedup"] == "alpha beta gamma one two"
    assert out[2]["n_removed"] == 3
    assert out[2]["text_dedup"] == "head three four"


def test_overlapping_spans_merge_into_one_island(spark):
    # doc 2 repeats a 5-token run from doc 1: spans at starts 1..3 (k=3)
    # all duplicate and must merge into ONE removed island of 5 tokens.
    run5 = "a b c d e"
    out = _run(spark, [(1, f"{run5} x"), (2, f"y {run5} z")], k=3)
    assert out[2]["n_removed"] == 5
    assert out[2]["text_dedup"] == "y z"


def test_within_document_repeat_keeps_first(spark):
    out = _run(spark, [(1, "p q r filler p q r")], k=3)
    assert out[1]["n_removed"] == 3
    assert out[1]["text_dedup"] == "p q r filler"


def test_unique_docs_untouched_and_short_docs_pass_through(spark):
    out = _run(
        spark,
        [(1, "unique words only here"), (2, "tiny"), (3, "one two")],
        k=3,
    )
    for i in (1, 2, 3):
        assert out[i]["n_removed"] == 0
    assert out[2]["text_dedup"] == "tiny"


def test_text_never_shuffles_document_side(spark):
    """The interval join must not exchange the document/token side when the
    interval side is broadcast-able — document text stays in the scan
    stage."""
    rows = [(i, f"w{i} x{i} y{i} z{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.dedup_substring_spans(df, "doc_id", "text", k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
