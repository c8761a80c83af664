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


def test_bpe_encode_adjacent_repeats_reach_fixpoint(spark):
    # 'thth': one non-overlapping replace pass consumes the shared boundary
    # space and leaves 'th t h'; the second pass must finish the merge.
    df = spark.createDataFrame([(1, "thth thththth")], "doc_id long, text string")
    out = text.bpe_encode(df, "doc_id", "text", merges=[("t", "h")]).collect()[0]
    assert out["n_bpe_tokens"] == 2 + 4  # th th | th th th th


def test_bpe_encode_two_passes_equal_python_fixpoint(spark):
    # Property: the column tier's 2-pass replace equals repeat-until-fixpoint
    # (Python str.replace has the same left-to-right non-overlapping
    # semantics as Spark's replace). Adversarial a/b words up to len 16.
    import itertools
    import random

    rng = random.Random(11)
    words = ["".join(rng.choice("ab") for _ in range(n)) for n in range(1, 17) for _ in range(8)]
    words += ["".join(t) for t in itertools.product("ab", repeat=8)]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    out = {
        r["id"]: r["n_bpe_tokens"]
        for r in text.bpe_encode(df, "doc_id", "text", merges=[("a", "b")]).collect()
    }
    for i, w in enumerate(words):
        s = " " + " ".join(w) + " "
        while " a b " in s:
            s = s.replace(" a b ", " ab ")
        assert out[i] == len(s.split()), w


def test_bpe_encode_empty_and_whitespace_docs(spark):
    # Zero-word docs: n_words = n_bpe_tokens = 0 (aggregate's 0 seed) —
    # the oracle side coalesces DuckDB's NULL list_sum to 0 to match.
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "th")], "doc_id long, text string"
    )
    out = {r["id"]: r.asDict() for r in text.bpe_encode(df, "doc_id", "text").collect()}
    assert out[1]["n_words"] == 0 and out[1]["n_bpe_tokens"] == 0
    assert out[2]["n_words"] == 0 and out[2]["n_bpe_tokens"] == 0
    assert out[3]["n_bpe_tokens"] == 1


def _make_merge_table(n: int) -> list[tuple[str, str]]:
    """Deterministic ≥n-entry merge table over a–z, built the way a trainer
    would: chars pair into 2-grams, 2-grams absorb chars into 3-grams."""
    merges = []
    letters = "abcdefghijklmnopqrstuvwxyz"
    for a in letters:
        for b in letters:
            merges.append((a, b))
            if len(merges) >= n * 2 // 3:
                break
        else:
            continue
        break
    for a, b in list(merges):
        for c in letters:
            merges.append((a + b, c))
            if len(merges) >= n:
                return merges
    return merges


def test_bpe_encode_arrow_handles_1k_merge_table(spark):
    # The production tier: a ≥1k-entry merge table (the column tier's
    # chained-replace expression cannot parse at this depth) encoded via
    # mapInPandas, verified word-by-word against the canonical Python loop.
    merges = _make_merge_table(1000)
    assert len(merges) >= 1000
    ranks = {p: i for i, p in enumerate(merges)}
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "abc abcd abcde xyz"),
        (3, ""),
        (4, "aaaa bbbb abab"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["id"]: r.asDict()
        for r in text.bpe_encode_arrow(df, "doc_id", "text", merges).collect()
    }
    import hashlib

    for doc_id, txt in docs:
        words = [w for w in txt.lower().split() if w]
        encs = [text.bpe_encode_reference(w, ranks) for w in words]
        assert out[doc_id]["n_words"] == len(words)
        assert out[doc_id]["n_bpe_tokens"] == sum(len(e) for e in encs)
        expect_md5 = hashlib.md5(
            "|".join(" ".join(e) for e in encs).encode()
        ).hexdigest()
        assert out[doc_id]["enc_md5"] == expect_md5


def test_bpe_encode_arrow_agrees_with_column_tier_on_fixture(spark):
    # On the 8-merge table the two tiers agree for ordinary text (rank
    # order == sequential order here); this pins the tiers to each other.
    df = spark.createDataFrame(
        [(1, "the thin stand over another"), (2, "north or in the end")],
        "doc_id long, text string",
    )
    col_out = {
        r["id"]: r.asDict() for r in text.bpe_encode(df, "doc_id", "text").collect()
    }
    arrow_out = {
        r["id"]: r.asDict()
        for r in text.bpe_encode_arrow(df, "doc_id", "text", text.BPE_MERGES).collect()
    }
    assert col_out == arrow_out


def test_bpe_train_matches_python_reference(spark):
    corpus = [
        (1, "the thin theme then"),
        (2, "this that the them"),
        (3, "thin air in the den"),
        (4, "a b a b abab"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = text.bpe_train(df, "text", n_merges=5)
    wc: dict[str, int] = {}
    for _, t in corpus:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    want = text.bpe_train_reference(wc, 5)
    assert got == want
    assert got[0][:2] == ("t", "h")  # 'th' dominates this corpus


def test_bpe_train_merges_feed_encode(spark):
    # trained merges are a valid table for both encode tiers
    df = spark.createDataFrame(
        [(1, "then then thin")], "doc_id long, text string"
    )
    merges = [(l, r) for l, r, _ in text.bpe_train(df, "text", n_merges=3)]
    enc_col = {
        r["id"]: r["n_bpe_tokens"]
        for r in text.bpe_encode(df, "doc_id", "text", merges=merges).collect()
    }
    enc_arrow = {
        r["id"]: r["n_bpe_tokens"]
        for r in text.bpe_encode_arrow(df, "doc_id", "text", merges).collect()
    }
    assert enc_col[1] <= 9  # merges compress vs the 12-char baseline
    assert enc_arrow[1] <= 9


def test_bpe_train_stops_when_no_pairs_left(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    merges = text.bpe_train(df, "text", n_merges=10)
    assert len(merges) == 0  # all words are single chars: nothing to merge


def test_bpe_train_handles_quote_tokens(spark):
    # token text must never be spliced into a SQL literal
    df = spark.createDataFrame(
        [(1, "it's it's it's don't")], "doc_id long, text string"
    )
    merges = text.bpe_train(df, "text", n_merges=2)
    wc = {"it's": 3, "don't": 1}
    assert merges == text.bpe_train_reference(wc, 2)
