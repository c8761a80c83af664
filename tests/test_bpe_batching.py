"""Tests for BPE merge-candidate counting and length-bucketed batching."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_spark.operators import sampling, text


def test_bpe_pair_counts_weighted_by_word_frequency(spark):
    df = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab xy")], "doc_id long, text string"
    )
    out = {r["pair"]: r["n_pairs"] for r in text.bpe_merge_candidates(df, "text").collect()}
    # "abab" occurs 3x: pairs ab(×2 per word), ba(×1 per word)
    assert out["ab"] == 6
    assert out["ba"] == 3
    assert out["cd"] == 1 and out["xy"] == 1


def test_bpe_topn_is_deterministic_under_ties(spark):
    df = spark.createDataFrame([(1, "zz aa")], "doc_id long, text string")
    out = [r["pair"] for r in text.bpe_merge_candidates(df, "text", top_n=1).collect()]
    assert out == ["aa"]  # equal counts: lexicographic tie-break


def test_batch_by_length_padding_waste(spark):
    # 5 docs in one bucket (width 1000), batch size 2: batches of
    # lengths [50,40], [30,20], [10]
    rows = [(i, n) for i, n in enumerate([50, 40, 30, 20, 10])]
    df = spark.createDataFrame(rows, "doc_id long, nt long")
    out = {
        (r["bucket"], r["batch_idx"]): r.asDict()
        for r in sampling.batch_by_length(
            df, "doc_id", F.col("nt"), bucket_width=1000, batch_size=2
        ).collect()
    }
    assert out[(0, 0)]["padding_waste"] == 2 * 50 - 90
    assert out[(0, 1)]["padding_waste"] == 2 * 30 - 50
    assert out[(0, 2)]["n_docs"] == 1 and out[(0, 2)]["padding_waste"] == 0


def test_batch_by_length_buckets_are_independent(spark):
    rows = [(1, 10), (2, 11), (3, 200), (4, 210)]
    df = spark.createDataFrame(rows, "doc_id long, nt long")
    out = sampling.batch_by_length(
        df, "doc_id", F.col("nt"), bucket_width=32, batch_size=16
    ).collect()
    assert {r["bucket"] for r in out} == {0, 6}
    assert all(r["batch_idx"] == 0 for r in out)


def test_bpe_encode_applies_merges_in_order(spark):
    df = spark.createDataFrame(
        [(1, "the thin stand"), (2, "zz")], "doc_id long, text string"
    )
    out = {r["id"]: r.asDict() for r in text.bpe_encode(df, "doc_id", "text").collect()}
    # 'the' -> th e -> the (merge t+h then th+e): 1 token
    # 'thin' -> th i n -> th in: 2 tokens; 'stand' -> st an d -> st and: 2
    assert out[1]["n_words"] == 3
    assert out[1]["n_bpe_tokens"] == 1 + 2 + 2
    assert out[2]["n_bpe_tokens"] == 2  # no merges apply: z z


def test_bpe_encode_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = text.bpe_encode(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
