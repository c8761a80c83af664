"""Cross-checks for the round-9 batch-2 operators (t-closeness, ESS,
dedup impact, DoReMi reweighting, split leakage, quantile normalization,
hard negatives, Spearman, silhouette) against independent pure-Python
references, plus the temperature-rate monotonicity regression pins.

The DuckDB oracle gate value-checks these at 3 SFs; the tests here cover
what the fixture can't reach — planted edge cases, invariant proofs, and
the exact Hypothesis counterexamples that broke the pre-fix rate
formula."""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _docs_pdf():
    return pd.read_parquet(f"{SF}/documents.parquet")


# --------------------------------------------------------------------------
# temperature_sample_rates: the two Hypothesis counterexamples, pinned
# --------------------------------------------------------------------------
def test_temperature_rates_monotone_counterexamples():
    """Pre-fix falsifying inputs: (a) perfect-square neighbor counts where
    isqrt jumps broke monotonicity; (b) the {3,4} small-n case where
    isqrt(3)/3 < isqrt(4)/4 by 50%. The downward envelope must give the
    smaller group >= the larger group's rate AND stay within budget."""
    from data_ingestion_spark.operators.sampling import temperature_sample_rates

    for counts, frac in [
        ({"a": 9461776, "b": 9458724}, 1),
        ({"a": 9461776, "b": 9460612}, 99),
        ({"a": 3, "b": 4}, 100),
        ({"a": 4, "b": 3}, 100),
    ]:
        total = sum(counts.values())
        target = max(1, (total * frac) // 100)
        rates = temperature_sample_rates(counts, target)
        for g1, n1 in counts.items():
            for g2, n2 in counts.items():
                if n1 < n2:
                    assert rates[g1] >= rates[g2], (counts, rates)
        expected = sum(n * rates[g] for g, n in counts.items()) / 10000
        assert expected <= target + len(counts), (counts, rates)


def test_temperature_rates_envelope_only_lowers():
    """The monotone repair may only LOWER rates vs the raw formula (the
    budget proof depends on it)."""
    from data_ingestion_spark.operators.sampling import temperature_sample_rates

    rnd = random.Random(17)
    for _ in range(50):
        counts = {
            f"g{i}": rnd.randrange(1, 10**6)
            for i in range(rnd.randrange(1, 9))
        }
        target = rnd.randrange(1, sum(counts.values()) + 1)
        rates = temperature_sample_rates(counts, target)
        isq = {g: math.isqrt(n) for g, n in counts.items()}
        denom = sum(isq.values())
        for g, n in counts.items():
            raw = min(10000, (target * isq[g] * 10000) // (denom * n))
            assert rates[g] <= raw, (counts, target, g)


# --------------------------------------------------------------------------
# t-closeness vs a pure-Python EMD reference
# --------------------------------------------------------------------------
def test_t_closeness_matches_python_emd(spark):
    from data_ingestion_spark.operators.registry3 import t_closeness_docs

    got = {
        (r["lang"], r["source"]): r["t_micro"]
        for r in t_closeness_docs(spark, SF).collect()
    }
    pdf = _docs_pdf()
    pdf["s"] = pdf["n_chars"] // 200
    buckets = sorted(pdf["s"].unique())
    n_total = len(pdf)
    g = pdf.groupby("s").size().to_dict()
    for (lang, source), grp in pdf.groupby(["lang", "source"]):
        n = len(grp)
        c = grp.groupby("s").size().to_dict()
        cum_c = cum_g = sd = 0
        for b in buckets:
            cum_c += c.get(b, 0)
            cum_g += g[b]
            sd += abs(cum_c * n_total - cum_g * n)
        t_micro = (sd * 1000000) // (n * n_total * max(len(buckets) - 1, 1))
        assert got[(lang, source)] == t_micro, (lang, source)


# --------------------------------------------------------------------------
# ESS vs Kong's formula in exact integers
# --------------------------------------------------------------------------
def test_ess_importance_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import ess_importance_docs

    rows = ess_importance_docs(spark, SF).collect()
    pdf = _docs_pdf()
    for r in rows:
        w = pdf.loc[pdf["source"] == r["source"], "n_chars"].astype(int)
        sw, sw2, n = int(w.sum()), int((w * w).sum()), len(w)
        assert r["ess_rows"] == (sw * sw) // sw2
        assert r["ess_frac_micro"] == (sw * sw * 1000000) // (n * sw2)
        # ESS can never exceed n (Cauchy-Schwarz)
        assert r["ess_rows"] <= n


# --------------------------------------------------------------------------
# Dedup impact report vs a pandas reference
# --------------------------------------------------------------------------
def test_dedup_impact_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import (
        dedup_impact_report_docs,
    )

    got = {r["source"]: r for r in dedup_impact_report_docs(spark, SF).collect()}
    pdf = _docs_pdf()
    winners = pdf.loc[pdf.groupby(pdf["text"])["doc_id"].idxmin()]
    tot_before = int(pdf["n_chars"].sum())
    tot_after = int(winners["n_chars"].sum())
    for source, grp in pdf.groupby("source"):
        w = winners[winners["source"] == source]
        r = got[source]
        assert r["n_docs"] == len(grp)
        assert r["n_kept"] == len(w)
        assert r["dup_rate_micro"] == (
            1000000 * (len(grp) - len(w))
        ) // len(grp)
        assert r["share_before_micro"] == (
            int(grp["n_chars"].sum()) * 1000000
        ) // tot_before
        assert r["share_after_micro"] == (
            int(w["n_chars"].sum()) * 1000000
        ) // tot_after


# --------------------------------------------------------------------------
# DoReMi reweighting invariants
# --------------------------------------------------------------------------
def test_doremi_reweight_invariants(spark):
    from data_ingestion_spark.operators.registry3 import (
        doremi_reweight_sources,
    )

    rows = doremi_reweight_sources(spark, SF).collect()
    # shares renormalize: sum within one floor-step per source of 1e6
    for col in ("share_micro", "new_share_micro"):
        s = sum(r[col] for r in rows)
        assert 1000000 - len(rows) <= s <= 1000000, (col, s)
    # a source with excess 0 can only lose share to upweighted ones;
    # the MW direction: excess > 0 strictly helps relative share
    for r in rows:
        assert 0 <= r["excess_micro"] <= 1000000
        if r["excess_micro"] == 0:
            assert r["new_share_micro"] <= r["share_micro"] + 1


# --------------------------------------------------------------------------
# Split leakage: planted duplicate across the hash split
# --------------------------------------------------------------------------
def test_split_leakage_planted(spark, tmp_path):
    from data_ingestion_spark.operators.registry3 import (
        split_leakage_ngram_docs,
    )

    def bucket(doc_id: int) -> int:
        import hashlib

        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return h % 100

    train_ids = [i for i in range(400) if bucket(i) < 80]
    test_ids = [i for i in range(400) if bucket(i) >= 90]
    assert len(train_ids) > 5 and len(test_ids) >= 2
    leak_text = "alpha beta gamma delta epsilon zeta"
    rows = []
    # one train doc carrying the leaked 3-grams
    rows.append((train_ids[0], leak_text, "en", "src_a", len(leak_text)))
    for i in train_ids[1:6]:
        t = f"unique train {i} filler words here {i}"
        rows.append((i, t, "en", "src_a", len(t)))
    # test doc 1 shares a 3-gram with train; test doc 2 is clean
    t1 = "xx yy alpha beta gamma zz"
    rows.append((test_ids[0], t1, "en", "src_a", len(t1)))
    t2 = "totally clean held out document nothing shared"
    rows.append((test_ids[1], t2, "en", "src_a", len(t2)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in split_leakage_ngram_docs(
        spark, str(tmp_path)
    ).collect()}
    r = out["src_a"]
    assert r["n_test"] == 2 and r["n_leaked"] == 1
    assert r["leak_micro"] == 500000


# --------------------------------------------------------------------------
# Quantile normalization invariants
# --------------------------------------------------------------------------
def test_quantile_normalize_invariants(spark):
    from data_ingestion_spark.operators.registry3 import (
        quantile_normalize_scores_docs,
    )

    rows = quantile_normalize_scores_docs(spark, SF).collect()
    pdf = _docs_pdf()
    scores = sorted(pdf["n_chars"].astype(int))
    smax = scores[-1]
    by_src: dict = {}
    for r in rows:
        assert r["norm_score"] in set(scores)
        by_src.setdefault(r["source"], []).append(
            (r["score"], r["doc_id"], r["norm_score"])
        )
    for src, triples in by_src.items():
        triples.sort()
        norm = [t[2] for t in triples]
        # monotone within source; top rank maps to the global max
        assert norm == sorted(norm), src
        assert norm[-1] == smax, src


# --------------------------------------------------------------------------
# Hard negatives vs brute-force python
# --------------------------------------------------------------------------
def test_hard_negatives_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import (
        hard_negatives_embeddings,
    )

    got = [
        (r["query_id"], r["rank"], r["neighbor_id"], r["n_label"])
        for r in hard_negatives_embeddings(spark, SF).collect()
    ]
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {int(r.vec_id): list(r.embedding) for r in emb.itertuples()}
    labels = {int(r.vec_id): int(r.label) for r in emb.itertuples()}

    def cos(a, b):
        num = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        return round(num / (na * nb), 6)

    expect = []
    for q in sorted(v for v in vecs if v < 5):
        cands = [
            (-cos(vecs[q], vecs[c]), c)
            for c in vecs
            if labels[c] != labels[q]
        ]
        cands.sort()
        for rk, (negc, c) in enumerate(cands[:5], 1):
            expect.append((q, rk, c, labels[c]))
    assert got == expect


# --------------------------------------------------------------------------
# Spearman: perfect monotone / anti-monotone / tie handling
# --------------------------------------------------------------------------
def test_spearman_known_values(spark, tmp_path):
    from data_ingestion_spark.operators.registry3 import (
        spearman_len_tokens_sources,
    )

    rows = []
    # src_up: token count strictly increases with n_chars -> rho = 1
    for i in range(6):
        text = " ".join(["w"] * (i + 1))
        rows.append((100 + i, text, "en", "src_up", 10 * (i + 1)))
    # src_down: token count strictly decreases as n_chars grows -> rho = -1
    for i in range(6):
        text = " ".join(["w"] * (6 - i))
        rows.append((200 + i, text, "en", "src_down", 10 * (i + 1)))
    # src_const: constant token count -> denominator 0 -> NULL
    for i in range(4):
        rows.append((300 + i, "one two", "en", "src_const", 10 * (i + 1)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["source"]: r["rho_spearman"]
        for r in spearman_len_tokens_sources(spark, str(tmp_path)).collect()
    }
    assert out["src_up"] == pytest.approx(1.0)
    assert out["src_down"] == pytest.approx(-1.0)
    assert out["src_const"] is None


def test_spearman_ties_match_python(spark):
    """Fixture run must equal the textbook average-rank Spearman computed
    in pure Python (scipy semantics) to the 6-dp freeze."""
    from data_ingestion_spark.operators.registry3 import (
        spearman_len_tokens_sources,
    )

    got = {
        r["source"]: r["rho_spearman"]
        for r in spearman_len_tokens_sources(spark, SF).collect()
    }
    pdf = _docs_pdf()
    pdf["y"] = pdf["text"].map(lambda t: len(t.lower().split()))

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    for source, grp in pdf.groupby("source"):
        rx = avg_ranks(list(grp["n_chars"]))
        ry = avg_ranks(list(grp["y"]))
        n = len(rx)
        mx, my = sum(rx) / n, sum(ry) / n
        num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        dx = math.sqrt(sum((a - mx) ** 2 for a in rx))
        dy = math.sqrt(sum((b - my) ** 2 for b in ry))
        if dx == 0 or dy == 0:
            assert got[source] is None
        else:
            assert got[source] == pytest.approx(num / (dx * dy), abs=2e-6)


# --------------------------------------------------------------------------
# Silhouette vs a numpy reference over the SAME trained centroids
# --------------------------------------------------------------------------
def test_silhouette_matches_python(spark):
    from data_ingestion_spark.operators import similarity
    from data_ingestion_spark.operators.registry3 import (
        silhouette_kmeans_embeddings,
    )
    from data_ingestion_spark.session import load_table

    got = {r["grp"]: r for r in silhouette_kmeans_embeddings(spark, SF).collect()}
    emb = load_table(spark, SF, "embeddings")
    cents = similarity.kmeans_centroid_list(
        emb, vec_col="embedding", k=4, n_iter=2, id_col="vec_id"
    )
    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    agg: dict = {}
    for r in pdf.itertuples():
        x = [float(v) for v in r.embedding]
        d2s = []
        for g, c in enumerate(cents):
            xx = 0.0
            for v in x:
                xx += v * v
            xc = 0.0
            for v, w in zip(x, c):
                xc += v * w
            cc = 0.0
            for w in c:
                cc += w * w
            d2s.append((xx - 2.0 * xc + cc, g))
        d2s.sort()
        (a2, own), (b2, _) = d2s[0], d2s[1]
        m = max(a2, b2)
        s = math.floor((b2 - a2) / m * 1000000 + 0.5) if m > 0 else 0
        n, tot, mn = agg.get(own, (0, 0, 10**9))
        agg[own] = (n + 1, tot + int(s), min(mn, int(s)))
    for g, (n, tot, mn) in agg.items():
        # Spark div / DuckDB // both truncate toward zero
        trunc_div = tot // n if tot >= 0 else -((-tot) // n)
        assert got[g]["n_points"] == n
        assert got[g]["mean_s_micro"] == trunc_div
        assert got[g]["min_s_micro"] == mn
