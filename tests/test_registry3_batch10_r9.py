"""Cross-checks for the round-9 batch-10 operators: rank-biased overlap,
k-fold balance audit, one-way ANOVA F — pure-Python replays plus the
RBO boundary identities."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

SF = "/root/testdata/sf0.001"

_RBO_W = [(0.1) * 0.9 ** (d - 1) / d for d in range(1, 11)]


def test_rbo_identical_rankings_bound():
    """RBO@10 of two IDENTICAL top-10 rankings equals Σ w_d·d — the
    truncated-RBO upper bound the micro output must hit exactly."""
    full = sum(math.floor(_RBO_W[d - 1] * d * 1e6 + 0.5) for d in range(1, 11))
    # identical rankings: overlap@d = d at every depth
    assert 0 < full < 1_000_000  # truncated RBO_min < 1 by construction


def test_rbo_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import (
        rbo_rankings_embeddings,
    )

    got = {r["qid"]: r for r in rbo_rankings_embeddings(spark, SF).collect()}
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding]
            for r in emb.itertuples()}

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    for qid in (0, 1):
        qv = vecs[qid]
        nq = math.sqrt(dot(qv, qv))
        r1 = sorted(
            (
                (-round(dot(qv, v) / (nq * math.sqrt(dot(v, v))), 6), d)
                for d, v in vecs.items()
                if d != qid
            )
        )[:10]
        rank1 = {d: i + 1 for i, (_, d) in enumerate(r1)}
        ms = []
        for d, v in vecs.items():
            if d == qid:
                continue
            tot = 0
            for s in range(4):
                qt = qv[s * 16:(s + 1) * 16]
                best = max(dot(qt, v[t * 16:(t + 1) * 16]) for t in range(4))
                tot += math.floor(best * 1e6 + 0.5)
            ms.append((-tot, d))
        ms.sort()
        rank2 = {d: i + 1 for i, (_, d) in enumerate(ms[:10])}
        both = set(rank1) & set(rank2)
        mx = {d: max(rank1[d], rank2[d]) for d in both}
        rbo = sum(
            math.floor(
                _RBO_W[dd - 1] * sum(1 for v in mx.values() if v <= dd)
                * 1e6 + 0.5
            )
            for dd in range(1, 11)
        )
        assert got[qid]["overlap_at_10"] == len(both)
        assert got[qid]["rbo_micro"] == rbo


def test_kfold_balance_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import kfold_balance_docs

    got = {r["fold"]: r for r in kfold_balance_docs(spark, SF).collect()}
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    pdf["fold"] = pdf["doc_id"].map(
        lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16) % 5
    )
    lang_tot = pdf.groupby("lang").size().to_dict()
    for fold, grp in pdf.groupby("fold"):
        per = grp.groupby("lang").size().to_dict()
        devs = [
            (1000000 * abs(5 * n - lang_tot[lg])) // lang_tot[lg]
            for lg, n in per.items()
        ]
        r = got[fold]
        assert r["n_docs"] == len(grp)
        assert r["max_lang_dev_micro"] == max(devs)
    assert sum(r["n_docs"] for r in got.values()) == len(pdf)


def test_anova_f_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import anova_f_sources

    r = anova_f_sources(spark, SF).collect()[0]
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    terms = 0
    ssq = 0
    t_tot = 0
    n_tot = 0
    k = 0
    for _, grp in pdf.groupby("source"):
        vals = [int(v) for v in grp["n_chars"]]
        t_s, n_s = sum(vals), len(vals)
        terms += (t_s * t_s * 1000000) // n_s
        ssq += sum(v * v for v in vals)
        t_tot += t_s
        n_tot += n_s
        k += 1
    ssb = terms - (t_tot * t_tot * 1000000) // n_tot
    ssw = ssq * 1000000 - terms
    f = (ssb * (n_tot - k) * 1000000) // (ssw * (k - 1))
    assert (r["k"], r["n_tot"]) == (k, n_tot)
    assert r["ssb_micro"] == ssb
    assert r["ssw_micro"] == ssw
    assert r["f_micro"] == f
    # variance decomposition sanity: SSB + SSW = total SS (scaled)
    mean_term = (t_tot * t_tot * 1000000) // n_tot
    assert ssb + ssw == ssq * 1000000 - mean_term


def test_forecast_mase_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import forecast_mase_events

    got = {r["event_type"]: r for r in forecast_mase_events(
        spark, SF
    ).collect()}
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf["d"] = (pdf["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    for et, grp in pdf.groupby("event_type"):
        daily = grp.groupby("d").size().to_dict()
        sae7 = n7 = sae1 = n1 = 0
        for d, c in daily.items():
            if d - 7 in daily:
                sae7 += abs(c - daily[d - 7])
                n7 += 1
            if d - 1 in daily:
                sae1 += abs(c - daily[d - 1])
                n1 += 1
        r = got[et]
        assert (r["n7"], r["sae7"], r["n1"], r["sae1"]) == (
            n7, sae7, n1, sae1,
        )
        if sae1 == 0:
            assert r["mase_micro"] is None
        else:
            assert r["mase_micro"] == (sae7 * n1 * 1000000) // (sae1 * n7)


def test_loo_source_value_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import loo_source_value_docs

    got = {r["source"]: r for r in loo_source_value_docs(spark, SF).collect()}
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    n_tot = len(pdf)
    t_tot = int(pdf["n_chars"].sum())
    mean_with = (t_tot * 1000000) // n_tot
    for source, grp in pdf.groupby("source"):
        t_s, n_s = int(grp["n_chars"].sum()), len(grp)
        without = ((t_tot - t_s) * 1000000) // (n_tot - n_s)
        r = got[source]
        assert r["mean_with_micro"] == mean_with
        assert r["mean_without_micro"] == without
        assert r["loo_delta_micro"] == without - mean_with
    # conservation-ish: deltas cannot all share one sign (removals must
    # move the mean both ways unless every source is identical)
    signs = {r["loo_delta_micro"] > 0 for r in got.values()}
    assert len(signs) == 2 or all(
        r["loo_delta_micro"] == 0 for r in got.values()
    )


def test_wasserstein_pairs_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import (
        wasserstein_pairs_sources,
    )

    got = [(r["src_a"], r["src_b"], r["w1_micro"])
           for r in wasserstein_pairs_sources(spark, SF).collect()]
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    pdf["b"] = pdf["n_chars"] // 200
    buckets = sorted(pdf["b"].unique())
    by_src = {
        s: grp.groupby("b").size().to_dict()
        for s, grp in pdf.groupby("source")
    }
    n = {s: sum(d.values()) for s, d in by_src.items()}
    pairs = []
    srcs = sorted(by_src)
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            sa, sb = srcs[i], srcs[j]
            ca = cb = sd = 0
            for b in buckets:
                ca += by_src[sa].get(b, 0)
                cb += by_src[sb].get(b, 0)
                sd += abs(ca * n[sb] - cb * n[sa])
            w1 = (sd * 1000000) // (
                n[sa] * n[sb] * max(len(buckets) - 1, 1)
            )
            pairs.append((sa, sb, w1))
    pairs.sort(key=lambda t: (-t[2], t[0], t[1]))
    assert got == pairs[:10]


def test_compression_ratio_signal(spark):
    """Repetitive text compresses far below random text; prose sits in
    between; values replay zlib exactly."""
    import zlib

    from data_ingestion_spark.operators.text import compression_ratio

    rows = [
        (1, "spam " * 200),                                   # repetitive
        (2, "".join(  # genuinely aperiodic noise (seeded)
            __import__("random").Random(0).choices(
                [chr(33 + i) for i in range(90)], k=1000
            )
        )),
        (3, "the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet field toward the river " * 4),
        (4, ""),                                              # empty guard
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in compression_ratio(
        df, "doc_id", "text"
    ).collect()}
    for i, t in rows:
        b = t.encode()
        assert got[i]["raw_bytes"] == len(b)
        if b:
            c = len(zlib.compress(b, 6))
            assert got[i]["compressed_bytes"] == c
            assert got[i]["ratio_micro"] == (1000000 * c) // len(b)
        else:
            assert got[i]["ratio_micro"] == 0
    assert got[1]["ratio_micro"] < 100000          # boilerplate band
    assert got[2]["ratio_micro"] > 700000          # noise band
    assert 100000 < got[3]["ratio_micro"] < 700000  # prose band


def test_assoc_triples_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import (
        assoc_triples_lineitem,
    )

    got = [(r["a"], r["b"], r["c"], r["n_abc"], r["support_micro"])
           for r in assoc_triples_lineitem(spark, SF).collect()]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    baskets: dict = {}
    for bid, item in zip(li["l_orderkey"], li["l_partkey"]):
        baskets.setdefault(int(bid), set()).add(int(item))
    nb = len(baskets)
    floor = max(2, nb // 10000)
    item_c: dict = {}
    for s in baskets.values():
        for i in s:
            item_c[i] = item_c.get(i, 0) + 1
    freq = {i for i, c in item_c.items() if c >= floor}
    pair_c: dict = {}
    for s in baskets.values():
        ss = sorted(i for i in s if i in freq)
        for x in range(len(ss)):
            for y in range(x + 1, len(ss)):
                pair_c[(ss[x], ss[y])] = pair_c.get((ss[x], ss[y]), 0) + 1
    pairs = {p for p, c in pair_c.items() if c >= floor}
    tri_c: dict = {}
    for s in baskets.values():
        ss = sorted(i for i in s if i in freq)
        for x in range(len(ss)):
            for y in range(x + 1, len(ss)):
                if (ss[x], ss[y]) not in pairs:
                    continue
                for z in range(y + 1, len(ss)):
                    t = (ss[x], ss[y], ss[z])
                    if (ss[x], ss[z]) in pairs and (ss[y], ss[z]) in pairs:
                        tri_c[t] = tri_c.get(t, 0) + 1
    expect = sorted(
        ((a, b, c, n, (1000000 * n) // nb)
         for (a, b, c), n in tri_c.items() if n >= floor),
        key=lambda t: (-t[3], t[0], t[1], t[2]),
    )[:20]
    assert got == expect


def test_rolling_wau_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import rolling_wau_events

    got = {r["d"]: r for r in rolling_wau_events(spark, SF).collect()}
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf["d"] = (pdf["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    active = {(int(u), int(d)) for u, d in zip(pdf["user_id"], pdf["d"])}
    days = sorted({d for _, d in active})
    for d in days:
        dau = len({u for u, dd in active if dd == d})
        wau = len({u for u, dd in active if d - 6 <= dd <= d})
        r = got[d]
        assert r["dau"] == dau
        assert r["wau"] == wau
        assert r["stickiness_micro"] == (1000000 * dau) // wau
        assert dau <= wau  # sliding window dominates its last day
    assert set(got) == set(days)


def test_mad_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import mad_events

    got = {r["event_type"]: r for r in mad_events(spark, SF).collect()}
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf["cents"] = pdf["value"].map(lambda v: math.floor(v * 100 + 0.5))

    def median(vals):
        v = sorted(vals)
        n = len(v)
        return (v[n // 2 - 1] + v[n // 2]) / 2 if n % 2 == 0 else float(
            v[n // 2]
        )

    for et, grp in pdf.groupby("event_type"):
        cents = [int(c) for c in grp["cents"]]
        med = median(cents)
        adev = [abs(c - med) for c in cents]
        mad = median(adev)
        outl = sum(1 for d in adev if 6745 * d > 35000 * mad)
        r = got[et]
        assert r["n_rows"] == len(cents)
        assert r["median_centi_cents"] == math.floor(med * 100 + 0.5)
        assert r["mad_centi_cents"] == math.floor(mad * 100 + 0.5)
        assert r["n_outliers"] == outl


def test_data_contract_clean_fixture_and_planted_violations(spark, tmp_path):
    from data_ingestion_spark.operators.registry3 import data_contract_docs

    clean = {r["rule"]: r["n_violations"]
             for r in data_contract_docs(spark, SF).collect()}
    assert set(clean) == {
        "doc_id_unique", "doc_id_not_null", "lang_in_enum",
        "n_chars_in_range", "text_not_null", "n_chars_matches_text_length",
    }
    assert all(v == 0 for v in clean.values()), clean
    rows = [
        (1, "hello", "en", "s", 5),
        (1, "world", "en", "s", 5),      # dup pk
        (2, "abc", "xx", "s", 3),        # bad lang enum
        (3, "abcd", "en", "s", 99),      # stale derived n_chars
        (4, "ok", "en", "s", 0),         # out-of-range n_chars (and stale)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    bad = {r["rule"]: r["n_violations"]
           for r in data_contract_docs(spark, str(tmp_path)).collect()}
    assert bad["doc_id_unique"] == 1
    assert bad["lang_in_enum"] == 1
    assert bad["n_chars_matches_text_length"] == 2
    assert bad["n_chars_in_range"] == 1


def test_int8_recall_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import (
        int8_recall_qc_embeddings,
    )

    got = {r["qid"]: r for r in int8_recall_qc_embeddings(
        spark, SF
    ).collect()}
    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding]
            for r in pdf.itertuples()}

    def quant(v):
        scale = max(max(abs(x) for x in v), 1e-12) / 127.0
        return [math.floor(x / scale + 0.5) for x in v]

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    q = {d: quant(v) for d, v in vecs.items()}
    for qid in (0, 1, 2):
        cands = [d for d in vecs if d != qid]
        top8 = sorted(
            cands, key=lambda d: (-sum(a * b for a, b in zip(q[d], q[qid])), d)
        )[:10]
        nq = math.sqrt(dot(vecs[qid], vecs[qid]))
        topex = sorted(
            cands,
            key=lambda d: (
                -round(dot(vecs[qid], vecs[d])
                       / (nq * math.sqrt(dot(vecs[d], vecs[d]))), 6),
                d,
            ),
        )[:10]
        ov = len(set(top8) & set(topex))
        assert got[qid]["n_overlap"] == ov
        assert got[qid]["recall_micro"] == (1000000 * ov) // 10
        # int8 at 64 dims should not be catastrophic
        assert ov >= 5


def test_kcenter_matches_python(spark):
    from data_ingestion_spark.operators.registry3 import (
        kcenter_coreset_embeddings,
    )

    got = [(r["round"], r["center_id"], r["coverage_radius_micro"])
           for r in kcenter_coreset_embeddings(spark, SF).collect()]
    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding]
            for r in pdf.itertuples()}

    def d2(a, b):
        s = 0.0
        xx = 0.0
        xc = 0.0
        cc = 0.0
        for x, y in zip(a, b):
            xx += x * x
            xc += x * y
            cc += y * y
        return xx - 2.0 * xc + cc

    centers = [min(vecs)]
    expect = []
    for rnd in range(4):
        mind = {
            v: min(d2(vecs[v], vecs[c]) for c in centers) for v in vecs
        }
        far = min(vecs, key=lambda v: (-mind[v], v))
        radius = math.floor(max(mind.values()) * 1e6 + 0.5)
        expect.append((rnd, centers[-1], radius))
        if rnd < 3:
            centers.append(far)
    assert got == expect
    # coverage radius is monotone nonincreasing as centers are added
    radii = [r for _, _, r in got]
    assert radii == sorted(radii, reverse=True)


def test_cluster_keywords_matches_python(spark):
    from data_ingestion_spark.operators import similarity
    from data_ingestion_spark.operators.registry3 import (
        cluster_keywords_embeddings,
    )
    from data_ingestion_spark.session import load_table

    got = [(r["grp"], r["rk"], r["term"], r["score_micro"])
           for r in cluster_keywords_embeddings(spark, SF).collect()]
    emb = load_table(spark, SF, "embeddings")
    cents = similarity.kmeans_centroid_list(
        emb, vec_col="embedding", k=4, n_iter=2, id_col="vec_id"
    )
    epdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    dpdf = pd.read_parquet(f"{SF}/documents.parquet")

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * y
        return s

    assign = {}
    for r in epdf.itertuples():
        scores = [(-dot(r.embedding, c), g) for g, c in enumerate(cents)]
        scores.sort()
        assign[int(r.vec_id)] = scores[0][1]
    n_docs = len(dpdf)
    df_t: dict = {}
    doc_toks = {}
    for r in dpdf.itertuples():
        ts = set(t for t in r.text.lower().split() if t)
        doc_toks[int(r.doc_id)] = ts
        for t in ts:
            df_t[t] = df_t.get(t, 0) + 1
    tf: dict = {}
    for d, ts in doc_toks.items():
        g = assign[d]
        for t in ts:
            tf[(g, t)] = tf.get((g, t), 0) + 1
    scored: dict = {}
    for (g, t), c in tf.items():
        idf = math.floor(math.log(n_docs / df_t[t]) * 1e6 + 0.5)
        scored.setdefault(g, []).append((-(c * idf), t))
    expect = []
    for g in sorted(scored):
        for rk, (negs, t) in enumerate(sorted(scored[g])[:3], 1):
            expect.append((g, rk, t, -negs))
    assert got == expect
