"""Tests for layout (Z-order, Bloom pruning), BM25 retrieval, and z-score
anomaly operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_spark.operators import layout, stats, text


def _morton_ref(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_key_matches_reference_bit_interleave(spark):
    pts = [(3, 5), (0, 0), (65535, 65535), (1, 0), (0, 1), (41234, 997)]
    df = spark.createDataFrame(pts, "gx long, gy long")
    got = {
        (r["gx"], r["gy"]): r["z"]
        for r in df.select(
            "gx", "gy", layout.morton_key(F.col("gx"), F.col("gy")).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton_ref(x, y)


def test_zorder_bucket_stats_envelopes_cover_grid(spark):
    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(100)], "x long, y double"
    )
    out = layout.zorder_bucket_stats(
        df, "x", "y", (0.0, 99.0), (0.0, 6.0), bucket_bits=4
    ).collect()
    assert sum(r["n_rows"] for r in out) == 100
    for r in out:
        assert 0 <= r["gx_min"] <= r["gx_max"] <= 65535
        assert 0 <= r["gy_min"] <= r["gy_max"] <= 65535
    # Z-order locality: every bucket's envelope must be a proper sub-range
    # of the grid (no bucket spans the whole x range), which a y-only sort
    # would violate.
    assert all(r["gx_max"] - r["gx_min"] < 65535 for r in out)


def test_zorder_single_shuffle_plan(spark):
    df = spark.createDataFrame([(1, 1.0)], "x long, y double")
    out = layout.zorder_bucket_stats(df, "x", "y", (0.0, 9.0), (0.0, 9.0))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # only the per-bucket aggregate


def test_bloom_no_false_negatives_and_empty_bitmap(spark):
    build = spark.createDataFrame([(i,) for i in range(0, 50, 5)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(50)], "k long")
    bitmap = layout.bloom_bitmap(build, "k", m_bits=128, n_hashes=3)
    assert bitmap == sorted(set(bitmap))
    passed = {
        r["k"]
        for r in layout.bloom_prune_probe(probe, "k", bitmap, 128, 3).collect()
    }
    assert set(range(0, 50, 5)) <= passed  # every true key survives
    assert layout.bloom_prune_probe(probe, "k", [], 128, 3).count() == 0


def test_bloom_probe_filter_is_scan_side(spark):
    probe = spark.createDataFrame([(1,)], "k long")
    out = layout.bloom_prune_probe(probe, "k", [1, 2, 3], 128, 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # literal-bitmap filter: zero shuffle


def test_bm25_prefers_docs_with_more_query_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha gamma"),
            (2, "alpha delta delta delta"),
            (3, "delta epsilon zeta eta"),
            (4, "theta iota kappa mu"),
        ],
        "doc_id long, text string",
    )
    out = text.bm25_topk(docs, "doc_id", "text", ["alpha", "beta"], k=3).collect()
    assert [r["id"] for r in out][0] == 1  # two distinct query terms, tf 3
    assert all(r["score_micro"] > 0 for r in out)
    assert {r["id"] for r in out} == {1, 2}  # doc 3/4 match nothing


def test_zscore_flags_constructed_outlier(spark):
    rows = [(i, 1, 10.0) for i in range(20)] + [(99, 1, 1000.0)]
    rows += [(200 + i, 2, 5.0) for i in range(5)]  # zero variance: no flags
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    out = stats.zscore_outliers(df, "user_id", "event_id", "value", 2.0).collect()
    assert [r["id"] for r in out] == [99]
    assert out[0]["z_milli"] > 2000


def test_zorder_write_prunes_on_both_dimensions(spark, tmp_path):
    """Close the Z-order loop: the clustered write must make parquet footer
    min/max stats tight enough that a selective predicate on EITHER
    dimension skips most row groups, while the round-robin control layout
    skips ~nothing. Deterministic grid data (200x200, both dims uniform)."""
    rows = [(i, float(i % 200), float(i // 200)) for i in range(40_000)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    zdir, cdir = str(tmp_path / "z"), str(tmp_path / "c")
    layout.zorder_write(df, "x", "y", (0.0, 199.0), (0.0, 199.0), zdir, n_files=64)
    df.repartition(64).write.mode("overwrite").parquet(cdir)

    for dim in ("x", "y"):
        fh, ft, gh, gt = layout.parquet_rowgroups_overlapping(zdir, dim, 98.0, 101.0)
        cfh, cft, cgh, cgt = layout.parquet_rowgroups_overlapping(cdir, dim, 98.0, 101.0)
        assert ft == 64 and cft == 64
        # control: every round-robin file spans the whole domain
        assert cgh == cgt
        # z-order: a ~2%-span predicate must skip >= half the row groups on
        # BOTH dimensions (64 files over a 2D z-curve: ~sqrt fraction hit)
        assert gh <= gt // 2, (dim, gh, gt)

    # and the data survives the clustered write byte-for-byte
    assert spark.read.parquet(zdir).count() == 40_000
    got = {r["id"] for r in spark.read.parquet(zdir).filter("x = 5 and y = 7").collect()}
    assert got == {7 * 200 + 5}


def test_lm_perplexity_flags_noise_vs_fluent(spark):
    # 'the cat sat' repeated -> high-count bigrams -> low NLL; a doc of
    # unique junk bigrams scores strictly higher
    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((99, "zq xv qj wk pf"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r.asDict() for r in text.lm_perplexity_scores(df, "doc_id", "text").collect()}
    assert out[0]["n_bigrams"] == 5
    assert out[99]["avg_nll_micro"] > out[0]["avg_nll_micro"]
    # exact-integer invariants: sum/avg relation holds bitwise
    for r in out.values():
        assert r["avg_nll_micro"] == int(r["nll_micro_sum"] / r["n_bigrams"] + 0.5)


def test_lm_perplexity_short_docs_absent(spark):
    df = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two tokens")], "doc_id long, text string"
    )
    out = {r["id"] for r in text.lm_perplexity_scores(df, "doc_id", "text").collect()}
    assert out == {3}


def test_pca_power_iteration_converges_to_numpy_eigvec(spark):
    import numpy as np

    from data_ingestion_spark.operators import similarity

    # anisotropic cloud with a known dominant direction
    rng = np.random.default_rng(3)
    d = 8
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    scales = np.array([10.0, 3.0, 1.0, 0.5, 0.3, 0.2, 0.1, 0.05])
    X = rng.normal(size=(4000, d)) * scales @ basis.T
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.pca_top_component(df, "embedding", dim=d, rounds=8).collect()
    v = np.array([r["v_micro"] for r in sorted(out, key=lambda r: r["dim_i"])], dtype=np.float64)
    v = v / np.linalg.norm(v)
    cov = np.cov(np.array(df.select("embedding").toPandas()["embedding"].tolist(), dtype=np.float64).T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    assert abs(float(np.dot(v, top))) > 0.99  # aligned up to sign


def test_power_iteration_micro_is_pure_and_deterministic():
    from data_ingestion_spark.operators.similarity import power_iteration_micro

    rows = [(0, 0, 2_000_000), (1, 1, 1_000_000), (0, 1, 500_000)]
    v1 = power_iteration_micro(rows, dim=2, rounds=4)
    v2 = power_iteration_micro(rows, dim=2, rounds=4)
    assert v1 == v2 and v1[0] == 1_000_000  # dominant axis normalizes to 1e6
    assert 0 < v1[1] < 1_000_000
    # zero matrix: guard against division by zero, stays all-zero
    assert power_iteration_micro([], dim=2, rounds=2) == [0, 0]


def test_pca_project_zero_shuffle_and_variance_ordering(spark):
    import numpy as np

    from data_ingestion_spark.operators import similarity

    rng = np.random.default_rng(4)
    d = 8
    X = rng.normal(size=(2000, d)) * np.array([8.0, 2, 1, 1, 1, 1, 1, 1])
    df = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.pca_project(df, "vec_id", "embedding", dim=d, rounds=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # component is a literal; map-only pass
    projs = np.array([r["proj_micro"] for r in out.collect()], dtype=np.float64) / 1e6
    # variance captured along the learned component beats any raw axis
    assert projs.var() > max(X[:, i].var() for i in range(1, d))


def test_pca_deflation_finds_second_component(spark):
    import numpy as np

    from data_ingestion_spark.operators.similarity import (
        power_iteration_deflate_micro,
    )

    rng = np.random.default_rng(12)
    d = 10
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    scales = np.array([9.0, 4.0] + [0.5] * (d - 2))
    X = rng.normal(size=(6000, d)) * scales @ basis.T
    C = np.cov(X.T, bias=True)
    rows = [
        (i, j, int(np.floor(C[i, j] * 1e6 + 0.5)))
        for i in range(d)
        for j in range(i, d)
    ]
    comps = power_iteration_deflate_micro(rows, dim=d, k=2, rounds=10)
    evals, evecs = np.linalg.eigh(C)
    for ci, true in [(0, evecs[:, -1]), (1, evecs[:, -2])]:
        v = np.array(comps[ci], dtype=float)
        v /= np.linalg.norm(v)
        assert abs(float(v @ true)) > 0.98, ci


def test_merge_upsert_semantics_and_staging_swap(spark, tmp_path):
    import os

    from data_ingestion_spark.operators import cdc

    target = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, val double",
    ).write.parquet(target)
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "k long, name string, val double"
    )
    stats = cdc.merge_upsert(spark, target, updates, ["k"])
    assert stats == {
        "rows_before": 3,
        "rows_after": 4,
        "n_updated": 1,
        "n_inserted": 1,
        "n_deleted": 0,
    }
    got = {r["k"]: (r["name"], r["val"]) for r in spark.read.parquet(target).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}
    # commit protocol: pre-merge data parked at .bak, no staging leftover
    assert os.path.isdir(target + ".bak")
    assert not os.path.exists(target + ".staging")
    bak = {r["k"] for r in spark.read.parquet(target + ".bak").collect()}
    assert bak == {1, 2, 3}
    # idempotent re-merge of the same batch changes nothing but the counts
    stats2 = cdc.merge_upsert(spark, target, updates, ["k"])
    assert stats2["rows_after"] == 4 and stats2["n_inserted"] == 0


def test_stratified_split_exact_fractions_per_group(spark):
    from data_ingestion_spark.operators import sampling

    # 3 groups of deliberately awkward sizes, incl. one tiny group
    rows = (
        [(i, "big") for i in range(100)]
        + [(1000 + i, "mid") for i in range(37)]
        + [(2000 + i, "tiny") for i in range(12)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.stratified_splits(df, "lang", "doc_id")
    counts = {
        (r["lang"], r["split"]): r["n"]
        for r in out.groupBy("lang", "split").agg(F.count("*").alias("n")).collect()
    }
    assert counts[("big", "train")] == 80
    assert counts[("big", "val")] == 10 and counts[("big", "test")] == 10
    # 37 docs: train = floor(37*0.8) = 29, val = floor(37*0.9)-29 = 4, test 4
    assert counts[("mid", "train")] == 29
    assert counts[("mid", "val")] == 4 and counts[("mid", "test")] == 4
    # 12 docs: every split non-empty — the property hash bucketing can't give
    assert counts[("tiny", "train")] == 9
    assert counts[("tiny", "val")] == 1 and counts[("tiny", "test")] == 2
    # deterministic across invocations
    again = {
        (r["lang"], r["split"]): r["n"]
        for r in sampling.stratified_splits(df, "lang", "doc_id")
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert again == counts


def test_nfc_normalize_composes_and_counts(spark):
    from data_ingestion_spark.operators import text as T

    decomposed = "café naïve"
    df = spark.createDataFrame(
        [(1, decomposed), (2, "plain ascii"), (3, None)],
        "doc_id long, text string",
    )
    out = {r["id"]: r.asDict() for r in T.nfc_normalize(df, "doc_id", "text").collect()}
    assert out[1]["text_nfc"] == "café naïve"
    assert out[1]["n_chars_before"] == 12 and out[1]["n_chars_after"] == 10
    assert out[1]["changed"] is True
    assert out[2]["changed"] is False and out[2]["text_nfc"] == "plain ascii"
    assert out[3]["n_chars_before"] == 0  # null-safe: treated as ""


def test_merge_upsert_with_delete_tombstones(spark, tmp_path):
    from data_ingestion_spark.operators import cdc

    target = str(tmp_path / "tbl2")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], "k long, val double"
    ).write.parquet(target)
    updates = spark.createDataFrame(
        [
            (2, 99.0, False),   # update
            (3, 0.0, True),     # tombstone: delete k=3
            (5, 50.0, False),   # insert
            (9, 0.0, True),     # tombstone with no match: no-op
        ],
        "k long, val double, deleted boolean",
    )
    stats = cdc.merge_upsert(spark, target, updates, ["k"], delete_col="deleted")
    assert stats == {
        "rows_before": 4,
        "rows_after": 4,
        "n_updated": 1,
        "n_inserted": 1,
        "n_deleted": 1,
    }
    after = spark.read.parquet(target)
    got = {r["k"]: r["val"] for r in after.collect()}
    assert got == {1: 10.0, 2: 99.0, 4: 40.0, 5: 50.0}
    assert "deleted" not in after.columns  # the flag never lands


def test_compact_table_byte_target_planning(spark, tmp_path):
    """Byte-target sizing plans from on-disk sizes, content survives
    bit-exact, and no temp/old residue outlives the swap."""
    import os

    from data_ingestion_spark.sinks.parquet_sink import compact_table

    path = str(tmp_path / "t")
    df = spark.range(0, 2000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("payload")
    )
    df.repartition(32).write.parquet(path)
    stats_out = compact_table(spark, path, target_file_mb=1)
    assert stats_out["files_before"] >= 32
    assert 1 <= stats_out["files_after"] <= stats_out["files_before"]
    assert not os.path.exists(path + ".compact_tmp")
    assert not os.path.exists(path + ".compact_old")
    after = spark.read.parquet(path)
    assert after.count() == 2000
    assert after.exceptAll(df).count() == 0 and df.exceptAll(after).count() == 0


def test_compact_table_cluster_by_preserves_pruning(spark, tmp_path):
    """With cluster_by + explicit n_files, compacted files carry disjoint
    key ranges so footer stats still prune (the Z-order/cluster-preserving
    path)."""
    from data_ingestion_spark.sinks.parquet_sink import compact_table

    path = str(tmp_path / "t")
    spark.range(0, 4096).select(
        F.col("id"), (F.col("id") % 7).alias("junk")
    ).repartition(16).write.parquet(path)
    compact_table(spark, path, n_files=4, cluster_by=["id"])
    # a 1/16-span predicate must hit at most 1 of the 4 sorted files,
    # vs all files under the round-robin original layout
    fh, ft, _, _ = layout.parquet_rowgroups_overlapping(path, "id", 100.0, 355.0)
    assert ft >= 2 and fh == 1


def test_join_cardinality_predicts_explosion(spark):
    """The pre-flight count equals the real join size, including a planted
    many-to-many explosion (3×4=12 on one key)."""
    a = spark.createDataFrame(
        [(1,)] * 3 + [(2,)] * 1 + [(3,)] * 2, "k: long"
    )
    b = spark.createDataFrame([(1,)] * 4 + [(2,)] * 5, "k: long")
    r = stats.join_cardinality(a, b, ["k"]).collect()[0]
    assert r["est_join_rows"] == 3 * 4 + 1 * 5 == a.join(b, "k").count()
    assert r["n_join_keys"] == 2      # key 3 has no match
    assert r["max_key_fanout"] == 12  # the planted explosion key


def test_backfill_only_touches_missing_partitions(spark, tmp_path):
    """Dynamic-overwrite backfill rewrites ONLY the missing partitions:
    pre-existing partition files keep their mtimes/identity."""
    import os

    from data_ingestion_spark.sinks.parquet_sink import (
        backfill_partitions,
        missing_partitions,
        write_partitioned,
    )

    df = spark.createDataFrame(
        [(i, f"d{i % 4}") for i in range(40)], "v: long, part: string"
    )
    path = str(tmp_path / "t")
    write_partitioned(df.filter("part <> 'd2'"), path, ["part"])
    expected = ["d0", "d1", "d2", "d3"]
    assert missing_partitions(path, "part", expected) == ["d2"]

    before = {}
    for d in os.listdir(path):
        if d.startswith("part="):
            p = os.path.join(path, d)
            before[d] = sorted(os.listdir(p))

    assert backfill_partitions(df, path, "part", ["d2"]) == 1
    assert missing_partitions(path, "part", expected) == []
    for d, files in before.items():
        assert sorted(os.listdir(os.path.join(path, d))) == files  # untouched
    assert spark.read.parquet(path).count() == 40
    assert backfill_partitions(df, path, "part", []) == 0  # no-op guard


def test_join_cardinality_composite_keys(spark):
    a = spark.createDataFrame([(1, "x")] * 2 + [(1, "y")], "k: long, s: string")
    b = spark.createDataFrame([(1, "x")] * 3 + [(2, "x")], "k: long, s: string")
    r = stats.join_cardinality(a, b, ["k", "s"]).collect()[0]
    assert r["est_join_rows"] == 6 == a.join(b, ["k", "s"]).count()
    assert r["n_join_keys"] == 1


def test_winsorize_clips_planted_outlier(spark):
    from pyspark.sql import functions as F

    from data_ingestion_spark.operators.stats import winsorize_by_group

    rows = [("g", float(i)) for i in range(1, 100)] + [("g", 10_000.0)]
    df = spark.createDataFrame(rows, "g: string, v: double")
    out = winsorize_by_group(df, "g", "v", lo=0.01, hi=0.99)
    top = out.agg(F.max("value_w")).collect()[0][0]
    assert top < 10_000.0  # the planted outlier got clipped
    assert out.filter("clipped_high").count() == 1
    assert out.filter("clipped_low").count() == 1
