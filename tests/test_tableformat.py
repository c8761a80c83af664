"""Tests for the versioned-table commit protocol
(operators/tableformat.py): pointer-flip atomicity semantics, time
travel, orphan-directory tolerance, and vacuum."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_spark.operators import tableformat as tf


def _df(spark, n, tag):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_commit_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    assert tf.commit_version(_df(spark, 10, "a"), root) == 0
    assert tf.commit_version(_df(spark, 7, "b"), root) == 1
    # current pointer → v1
    cur = tf.read_version(spark, root)
    assert cur.count() == 7 and cur.select("tag").first()["tag"] == "b"
    # time travel → v0, intact after the flip
    old = tf.read_version(spark, root, 0)
    assert old.count() == 10 and old.select("tag").first()["tag"] == "a"
    with pytest.raises(ValueError, match="version 5 not in table"):
        tf.read_version(spark, root, 5)


def test_orphan_snapshot_invisible_until_referenced(spark, tmp_path):
    """A crashed commit = data dir written, manifest never flipped: the
    reader must keep serving the old pointer."""
    root = str(tmp_path / "t")
    tf.commit_version(_df(spark, 5, "a"), root)
    # simulate the crash: orphan v99 directory, manifest untouched
    _df(spark, 3, "junk").write.parquet(os.path.join(root, "v99"))
    assert tf.read_version(spark, root).count() == 5
    m = tf.read_manifest(root)
    assert m["current"] == 0 and len(m["versions"]) == 1


def test_vacuum_drops_old_and_orphans(spark, tmp_path):
    root = str(tmp_path / "t")
    for i in range(4):
        tf.commit_version(_df(spark, i + 1, f"t{i}"), root)
    _df(spark, 2, "junk").write.parquet(os.path.join(root, "v99"))
    removed = tf.vacuum(root, keep_last=2)
    assert removed == [0, 1]
    dirs = {n for n in os.listdir(root) if n.startswith("v")}
    assert dirs == {"v2", "v3"}  # old versions AND the orphan gone
    assert tf.read_version(spark, root).count() == 4
    assert tf.read_version(spark, root, 2).count() == 3
    with pytest.raises(ValueError):
        tf.read_version(spark, root, 0)
    with pytest.raises(ValueError):
        tf.vacuum(root, keep_last=0)


def test_manifest_flip_is_rename_based(tmp_path, spark):
    """The pointer write goes through a temp file + rename (no window
    where _manifest.json is partially written)."""
    root = str(tmp_path / "t")
    tf.commit_version(_df(spark, 1, "a"), root)
    # manifest is valid JSON and no .tmp residue remains
    with open(os.path.join(root, "_manifest.json")) as f:
        m = json.load(f)
    assert m["current"] == 0
    assert not os.path.exists(os.path.join(root, "_manifest.json.tmp"))


def test_streaming_cdc_folds_into_versioned_table(spark, tmp_path):
    """Micro-batch CDC apply: a file stream of upsert/tombstone batches
    folds into the versioned table via foreachBatch — ONE commit per
    micro-batch, and every intermediate table state stays time-travelable
    afterwards (the streaming-lakehouse composition: ingest_stream ×
    tableformat)."""
    import time

    land = tmp_path / "land"
    land.mkdir()
    root = str(tmp_path / "table")

    (land / "b1.json").write_text(
        '{"k":1,"v":"a","is_delete":false}\n'
        '{"k":2,"v":"b","is_delete":false}\n'
    )
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    (land / "b2.json").write_text(
        '{"k":1,"v":"a2","is_delete":false}\n'
        '{"k":2,"v":null,"is_delete":true}\n'
        '{"k":3,"v":"c","is_delete":false}\n'
    )

    def apply_batch(bdf, _bid):
        s = bdf.sparkSession
        if os.path.exists(os.path.join(root, "_manifest.json")):
            cur = tf.read_version(s, root)
        else:
            cur = s.createDataFrame([], "k long, v string")
        upserts = bdf.filter(~F.col("is_delete")).select("k", "v")
        touched = bdf.select("k").distinct()
        merged = cur.join(touched, "k", "left_anti").unionByName(upserts)
        tf.commit_version(merged, root)

    q = (
        spark.readStream.schema("k long, v string, is_delete boolean")
        .option("maxFilesPerTrigger", "1")
        .json(str(land))
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert tf.read_manifest(root)["current"] == 1  # one commit per batch
    v0 = {r["k"]: r["v"] for r in tf.read_version(spark, root, 0).collect()}
    v1 = {r["k"]: r["v"] for r in tf.read_version(spark, root, 1).collect()}
    assert v0 == {1: "a", 2: "b"}
    assert v1 == {1: "a2", 3: "c"}  # update applied, tombstone deleted


def test_incremental_corpus_build_end_to_end(spark, tmp_path):
    """The nightly-ingest composition: corpus v0 committed, then a new
    batch is near-dup-screened AGAINST THE CORPUS ONLY
    (minhash_incremental_pairs) and the survivors appended as v1 — v0
    stays byte-identical under time travel, and the v1 row count equals
    the closed-form expectation from the pair set."""
    from data_ingestion_spark.operators import dedup
    from data_ingestion_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    root = str(tmp_path / "t")
    assert tf.commit_version(corpus, root) == 0
    n_v0 = tf.read_version(spark, root, 0).count()

    pairs = dedup.minhash_incremental_pairs(
        tf.read_version(spark, root, 0), batch, "doc_id", "text",
        k=3, jaccard_distance_threshold=0.7, band_r=2,
    )
    dup_ids = pairs.select(F.col("batch_id").alias("doc_id")).distinct()
    survivors = batch.join(dup_ids, "doc_id", "left_anti")
    merged = tf.read_version(spark, root, 0).unionByName(survivors)
    assert tf.commit_version(merged, root) == 1

    n_batch = batch.count()
    n_dup = dup_ids.count()
    assert tf.read_version(spark, root, 1).count() == n_v0 + n_batch - n_dup
    # v0 unchanged by the append (snapshot isolation)
    assert tf.read_version(spark, root, 0).count() == n_v0
    # screened near-dups truly absent from v1
    if n_dup:
        v1_ids = {r["doc_id"] for r in tf.read_version(spark, root, 1).select("doc_id").collect()}
        assert not v1_ids & {r["doc_id"] for r in dup_ids.collect()}


def test_table_changes_between_versions(spark, tmp_path):
    """CDF: insert/update/delete all detected between two versions, and
    diffing v0→v0 yields an empty feed."""
    root = str(tmp_path / "t")
    v0 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k: long, seg: string, bal: double",
    )
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 25.0), (4, "d", 40.0)],
        "k: long, seg: string, bal: double",
    )
    tf.commit_version(v0, root)
    tf.commit_version(v1, root)
    out = {
        r["k"]: r["change_type"]
        for r in tf.table_changes(spark, root, 0, 1, ["k"]).collect()
    }
    assert out == {2: "update", 3: "delete", 4: "insert"}
    assert tf.table_changes(spark, root, 0, 0, ["k"]).count() == 0


def test_table_changes_over_evolved_schema(spark, tmp_path):
    """Additive schema evolution: the CDF diffs over the COMMON columns,
    so v0 (2 cols) vs v1 (3 cols, one added) still classifies correctly."""
    root = str(tmp_path / "t")
    v0 = spark.createDataFrame([(1, "a"), (2, "b")], "k: long, seg: string")
    v1 = spark.createDataFrame(
        [(1, "a", 9.0), (2, "B", 8.0), (3, "c", 7.0)],
        "k: long, seg: string, extra: double",
    )
    tf.commit_version(v0, root)
    tf.commit_version(v1, root)
    out = {
        r["k"]: r["change_type"]
        for r in tf.table_changes(spark, root, 0, 1, ["k"]).collect()
    }
    # 'extra' is ignored (not common), so k=1 is unchanged on common ground
    assert out == {2: "update", 3: "insert"}


# ---------------------------------------------------------------------------
# Stats manifest (Iceberg-manifest-style metadata-only planning) — round 6
# ---------------------------------------------------------------------------
def test_collect_stats_matches_data(spark, tmp_path):
    """The manifest's n_rows and per-file envelopes must agree with the
    data: metadata_count == real count, and every row's value sits inside
    its file's recorded [min, max]."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(i, float(i)) for i in range(1000)], "k: long, x: double")
    tf.commit_version(df.repartitionByRange(4, "x").sortWithinPartitions("x"), root)
    stats = tf.collect_stats(root)
    assert tf.metadata_count(root) == 1000
    assert len(stats["files"]) == 4
    for f in stats["files"]:
        env = f["columns"]["x"]
        assert env["min"] <= env["max"]
        assert env["nulls"] == 0
    # envelopes of a range-clustered write are disjoint and cover 0..999
    envs = sorted((f["columns"]["x"]["min"], f["columns"]["x"]["max"]) for f in stats["files"])
    assert envs[0][0] == 0.0 and envs[-1][1] == 999.0
    for (lo1, hi1), (lo2, _hi2) in zip(envs, envs[1:]):
        assert hi1 < lo2  # disjoint: sortWithinPartitions + range partitioner


def test_prune_files_never_drops_needed_rows(spark, tmp_path):
    """Pruned scan == full-scan filter for bands crossing file
    boundaries, landing inside one file, and missing entirely — and the
    kept-file count actually shrinks (the point of the manifest)."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(i, float(i)) for i in range(1000)], "k: long, x: double")
    tf.commit_version(df.repartitionByRange(8, "x").sortWithinPartitions("x"), root)
    tf.collect_stats(root)
    full = tf.read_version(spark, root)
    for lo, hi in ((100.0, 300.0), (500.5, 510.5), (2000.0, 3000.0), (-50.0, 0.0)):
        kept, total = tf.prune_files(root, "x", lo, hi)
        expected = full.filter((F.col("x") >= lo) & (F.col("x") <= hi)).count()
        got = tf.scan_pruned(spark, root, "x", lo, hi).count()
        assert got == expected, (lo, hi)
        assert total == 8
        if expected == 0:
            assert kept == []  # out-of-range band: zero files touched
        else:
            assert len(kept) < total  # clustered layout must prune


def test_prune_keeps_files_without_stats_column(spark, tmp_path):
    """A column absent from the manifest (collect_stats(columns=[...]))
    must be conservatively un-prunable: every file is kept."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "k: long, x: double")
    tf.commit_version(df.repartitionByRange(4, "x"), root)
    tf.collect_stats(root, columns=["x"])
    kept, total = tf.prune_files(root, "k", 5, 10)  # no 'k' envelope recorded
    assert len(kept) == total == 4


def test_stats_versioned_alongside_time_travel(spark, tmp_path):
    """Each version carries its own stats file; metadata_count time-travels."""
    root = str(tmp_path / "t")
    tf.commit_version(spark.range(10).toDF("k"), root)
    tf.commit_version(spark.range(25).toDF("k"), root)
    tf.collect_stats(root, version=0)
    tf.collect_stats(root, version=1)
    assert tf.metadata_count(root, 0) == 10
    assert tf.metadata_count(root, 1) == 25


def test_vacuum_drops_orphaned_stats_files(spark, tmp_path):
    root = str(tmp_path / "t")
    for n in (10, 20, 30):
        tf.commit_version(spark.range(n).toDF("k"), root)
    for v in (0, 1, 2):
        tf.collect_stats(root, version=v)
    assert tf.vacuum(root, keep_last=1) == [0, 1]
    assert not os.path.exists(os.path.join(root, "_stats_v0.json"))
    assert not os.path.exists(os.path.join(root, "_stats_v1.json"))
    assert tf.metadata_count(root, 2) == 30  # survivor intact


def test_nightly_pipeline_versioned_composition(spark):
    """The nightly dedup composition actually advances the versioned
    tables: docs v1 = v0 ∪ accepted batch docs, index v1 row count grows
    by exactly the accepted docs' band rows, and every decision row
    carries the audit constants consistently."""
    from data_ingestion_spark.operators.registry import (
        dedup_nightly_pipeline_docs,
    )

    rows = dedup_nightly_pipeline_docs(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no batch decisions"
    n_accepted = sum(1 for r in rows if not r["is_dup"])
    first = rows[0]
    assert first["cdf_inserts"] == n_accepted
    assert first["index_rows_v1"] >= first["index_rows_v0"]
    # dup rows must name their best corpus match; accepted rows must not
    for r in rows:
        if r["is_dup"]:
            assert r["best_corpus_id"] is not None and r["n_matches"] >= 1
        else:
            assert r["best_corpus_id"] is None and r["n_matches"] == 0


def test_deletion_vector_masks_reads_and_chains(spark, tmp_path):
    """commit_deletion_vector is metadata-only: the new version dir holds
    ONLY the key mask, the base snapshot's files are untouched, reads
    apply the mask (recursively for DV-on-DV chains), and time travel to
    the base still sees every row."""
    import os

    from data_ingestion_spark.operators import tableformat as tf
    from pyspark.sql import functions as F

    root = str(tmp_path / "dv")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")
    )
    v0 = tf.commit_version(df, root)
    v1 = tf.commit_deletion_vector(
        spark.range(10).select(F.col("id").alias("k")), root, "k"
    )
    assert tf.read_version(spark, root, v1).count() == 90
    assert tf.read_version(spark, root, v0).count() == 100  # time travel
    # the DV dir contains only the (1-column) mask, not rewritten data
    mask = spark.read.parquet(os.path.join(root, "v1"))
    assert mask.columns == ["k"] and mask.count() == 10
    # chain: a second DV on top of the first composes
    v2 = tf.commit_deletion_vector(
        spark.range(10, 15).select(F.col("id").alias("k")), root, "k"
    )
    live = tf.read_version(spark, root, v2)
    assert live.count() == 85
    assert live.filter(F.col("k") < 15).count() == 0
    # change feed across the chain is delete-only with the right keys
    feed = tf.table_changes(spark, root, v0, v2, ["k"])
    types = {r["change_type"] for r in feed.select("change_type").distinct().collect()}
    assert types == {"delete"}
    assert feed.count() == 15


def test_deletion_vector_guards(spark, tmp_path):
    """Footer-stats math over a DV version would silently describe the
    mask — collect_stats must refuse; a DV without a base must refuse."""
    import pytest as _pytest

    from data_ingestion_spark.operators import tableformat as tf
    from pyspark.sql import functions as F

    root = str(tmp_path / "dvg")
    with _pytest.raises(Exception):
        tf.commit_deletion_vector(
            spark.range(1).select(F.col("id").alias("k")), root, "k"
        )
    tf.commit_version(spark.range(5).toDF("k"), root)
    v1 = tf.commit_deletion_vector(
        spark.range(1).select(F.col("id").alias("k")), root, "k"
    )
    with _pytest.raises(ValueError, match="deletion-vector"):
        tf.collect_stats(root, version=v1)


def test_vacuum_keeps_dv_base_chain(spark, tmp_path):
    """A kept deletion-vector version must pin its base snapshot through
    vacuum — otherwise the current version's only data files vanish."""
    from data_ingestion_spark.operators import tableformat as tf
    from pyspark.sql import functions as F

    root = str(tmp_path / "dvv")
    tf.commit_version(spark.range(100).toDF("k"), root)      # v0 (base)
    tf.commit_deletion_vector(
        spark.range(5).select(F.col("id").alias("k")), root, "k"
    )                                                        # v1 = DV on v0
    removed = tf.vacuum(root, keep_last=1)
    assert removed == []  # v0 is pinned by v1's dv_base
    assert tf.read_version(spark, root, 1).count() == 95
    # a plain commit unpins the chain; the next vacuum drops v0 AND v1
    tf.commit_version(spark.range(10).toDF("k"), root)       # v2 (full)
    removed = tf.vacuum(root, keep_last=1)
    assert set(removed) == {0, 1}
    assert tf.read_version(spark, root).count() == 10


def test_vacuum_drops_bucketed_catalog_tables(spark, tmp_path):
    from data_ingestion_spark.operators import tableformat as tf
    from pyspark.sql import functions as F

    root = str(tmp_path / "bktv")
    v0 = tf.commit_version_bucketed(
        spark.range(50).select(F.col("id").alias("k")), root, "k", 4
    )
    entry = tf.read_manifest(root)["versions"][0]
    assert spark.catalog.tableExists(entry["table"])
    tf.commit_version(spark.range(5).toDF("k"), root)
    removed = tf.vacuum(root, keep_last=1, spark=spark)
    assert removed == [v0]
    assert not spark.catalog.tableExists(entry["table"])


def test_commit_atomic_group_is_all_or_nothing(spark, tmp_path):
    """A crash between member commits must leave the group pointer on the
    previous transaction: readers through read_atomic see the old
    consistent pair, never a torn one."""
    import pytest as _pytest

    from data_ingestion_spark.operators import tableformat as tf
    from pyspark.sql import functions as F

    root = str(tmp_path / "grp")
    docs0 = spark.range(10).toDF("k")
    idx0 = spark.range(10).select(F.col("id").alias("k"), (F.col("id") % 3).alias("b"))
    v = tf.commit_atomic(root, {"docs": ("plain", docs0), "index": ("plain", idx0)})
    assert v == {"docs": 0, "index": 0}
    assert tf.read_atomic(spark, root, "docs").count() == 10

    # simulate a crash AFTER docs v1 lands but BEFORE the group flip:
    # commit docs directly (bypassing the group), then verify the group
    # read still resolves the OLD consistent pair
    tf.commit_version(spark.range(99).toDF("k"), root + "/docs")
    assert tf.read_version(spark, root + "/docs").count() == 99  # torn direct read
    assert tf.read_atomic(spark, root, "docs").count() == 10      # consistent group read
    assert tf.read_atomic(spark, root, "index").count() == 10

    # a full transaction advances both together (bucketed member included)
    v2 = tf.commit_atomic(
        root,
        {
            "docs": ("plain", spark.range(20).toDF("k")),
            "index": ("bucketed", idx0.withColumn("b", F.col("b") + 1), "b", 4),
        },
    )
    assert v2["docs"] == 2 and v2["index"] == 1
    assert tf.read_atomic(spark, root, "docs").count() == 20
    assert tf.read_atomic(spark, root, "index").count() == 10
    with _pytest.raises(KeyError):
        tf.read_atomic(spark, root, "nope")


def test_bucketed_catalog_names_unique_per_root(spark, tmp_path):
    """Two versioned tables whose roots share a basename must not clobber
    each other's catalog entry (the pre-fix name was basename+version
    only, so every nightly run's 'index' member collided)."""
    from data_ingestion_spark.operators import tableformat as tf
    from pyspark.sql import functions as F

    ra = str(tmp_path / "run1" / "index")
    rb = str(tmp_path / "run2" / "index")
    tf.commit_version_bucketed(
        spark.range(10).select(F.col("id").alias("k")), ra, "k", 2
    )
    tf.commit_version_bucketed(
        spark.range(99).select(F.col("id").alias("k")), rb, "k", 2
    )
    assert tf.read_version(spark, ra, 0).count() == 10  # not repointed
    assert tf.read_version(spark, rb, 0).count() == 99
    ta = tf.read_manifest(ra)["versions"][0]["table"]
    tb = tf.read_manifest(rb)["versions"][0]["table"]
    assert ta != tb


def test_bucketed_read_survives_catalog_loss(spark, tmp_path):
    """r9 (was an r8 ADVICE finding): the in-memory catalog dies with the
    session while a bucketed version's data files and manifest persist.
    read_version must re-register the table from manifest metadata on
    catalog miss — same rows AND the bucketing restored (exchange-free
    self-join on the bucket column)."""
    root = str(tmp_path / "bktloss")
    df = spark.range(60).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    tf.commit_version_bucketed(df, root, "k", 4)
    entry = tf.read_manifest(root)["versions"][0]
    # simulate a session restart: the catalog entry evaporates
    spark.sql(f"DROP TABLE IF EXISTS {entry['table']}")
    assert not spark.catalog.tableExists(entry["table"])
    got = tf.read_version(spark, root)
    assert got.count() == 60
    assert spark.catalog.tableExists(entry["table"])  # re-registered
    # bucketing is real again: a self-join on the bucket column plans
    # zero shuffle exchanges (broadcast disabled so the SMJ path — the
    # one bucketing serves at scale — is what gets planned)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = tf.read_version(spark, root).alias("a").join(
            tf.read_version(spark, root).alias("b"), "k"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    # and the re-registered entry keeps working for time travel reads
    assert tf.read_version(spark, root, 0).count() == 60


def test_vacuum_keeps_txn_pinned_version(spark, tmp_path):
    """r9 (was an r8 ADVICE finding): vacuuming a commit_atomic member
    must keep the version the group _txn.json pins, even when that
    version falls outside keep_last — exactly the torn-crash window
    read_atomic exists to survive."""
    root = str(tmp_path / "grpvac")
    tf.commit_atomic(root, {"docs": ("plain", spark.range(10).toDF("k"))})
    # crash window: two member commits land, the group pointer never flips
    tf.commit_version(spark.range(20).toDF("k"), root + "/docs")
    tf.commit_version(spark.range(30).toDF("k"), root + "/docs")
    removed = tf.vacuum(root + "/docs", keep_last=1, spark=spark)
    # v0 is pinned by _txn.json → NOT removed; v1 is neither recent nor
    # pinned → removed
    assert removed == [1]
    assert tf.read_atomic(spark, root, "docs").count() == 10  # survives
    assert tf.read_version(spark, root + "/docs").count() == 30


# ---------------------------------------------------------------------------
# Branches + fast-forward merge (r9)
# ---------------------------------------------------------------------------
def test_branch_isolated_writes_and_ff_merge(spark, tmp_path):
    """A branch commit is invisible to main; a fast-forward merge flips
    main to the branch head atomically; version numbering stays global
    (no collision when main commits after a branch commit)."""
    from data_ingestion_spark.operators import tableformat as tf

    root = str(tmp_path / "t")
    df0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    v0 = tf.commit_version(df0, root)
    tf.create_branch(root, "audit")
    v1 = tf.commit_to_branch(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                              "id long, s string"),
        root, "audit",
    )
    # main still serves v0
    assert tf.read_version(spark, root).count() == 2
    assert tf.read_branch(spark, root, "audit").count() == 3
    # ff merge advances main with zero data movement
    head = tf.merge_branch(root, "audit", "main")
    assert head == v1
    assert tf.read_version(spark, root).count() == 3
    # post-merge commit on main continues the global numbering
    v2 = tf.commit_version(df0, root)
    assert v2 == v1 + 1
    assert v0 == 0


def test_branch_non_ff_merge_rejected(spark, tmp_path):
    from data_ingestion_spark.operators import tableformat as tf
    import pytest

    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1,)], "id long")
    tf.commit_version(df, root)
    tf.create_branch(root, "exp")
    tf.commit_to_branch(spark.createDataFrame([(2,)], "id long"), root, "exp")
    tf.commit_version(spark.createDataFrame([(3,)], "id long"), root)  # main diverges
    with pytest.raises(ValueError, match="non-fast-forward"):
        tf.merge_branch(root, "exp", "main")
    # and the reverse direction IS a fast-forward... no: exp lacks main's
    # commit too (both advanced) -> also rejected
    with pytest.raises(ValueError, match="non-fast-forward"):
        tf.merge_branch(root, "main", "exp")


def test_vacuum_keeps_branch_heads(spark, tmp_path):
    """A branch head outside the last keep_last versions must survive
    vacuum (same pinning rule as dv_base chains)."""
    from data_ingestion_spark.operators import tableformat as tf

    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1,)], "id long")
    tf.commit_version(df, root)              # v0
    tf.create_branch(root, "old")            # old -> v0
    for i in range(4):                       # v1..v4 on main
        tf.commit_version(
            spark.createDataFrame([(10 + i,)], "id long"), root
        )
    removed = tf.vacuum(root, keep_last=2)
    assert 0 not in removed                  # pinned by branch head
    assert tf.read_branch(spark, root, "old").count() == 1
    # everything not pinned and not in the last 2 is gone
    assert set(removed) == {1, 2}


def test_branch_errors(spark, tmp_path):
    from data_ingestion_spark.operators import tableformat as tf
    import pytest

    root = str(tmp_path / "t")
    tf.commit_version(spark.createDataFrame([(1,)], "id long"), root)
    with pytest.raises(ValueError, match="main is implicit"):
        tf.create_branch(root, "main")
    tf.create_branch(root, "b1")
    with pytest.raises(ValueError, match="already exists"):
        tf.create_branch(root, "b1")
    with pytest.raises(ValueError, match="unknown branch"):
        tf.commit_to_branch(
            spark.createDataFrame([(1,)], "id long"), root, "nope"
        )
    with pytest.raises(ValueError, match="unknown branch"):
        tf.read_branch(spark, root, "nope")


def test_bucketed_main_commit_no_false_fast_forward(spark, tmp_path):
    """r10 (was an r9 ADVICE finding): a bucketed commit on main must
    record its parent. Without it, _is_ancestor's legacy cur-1 fallback
    chained the bucketed main head to the BRANCH commit at v-1, so
    merge_branch(main -> b) looked fast-forward and silently discarded
    the branch's snapshot."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    tf.commit_version(df, root)                                   # v0 main
    tf.create_branch(root, "b")                                   # b -> v0
    tf.commit_to_branch(
        spark.createDataFrame([(2, "b")], "id long, s string"), root, "b"
    )                                                             # v1 on b
    tf.commit_version_bucketed(
        spark.createDataFrame([(3, "c")], "id long, s string"),
        root, "id", 2,
    )                                                             # v2 on main
    m = tf.read_manifest(root)
    assert m["versions"][-1]["parent"] == 0                       # not v1
    assert m["branches"]["main"] == 2
    # both directions have diverged -> both merges must refuse
    with pytest.raises(ValueError, match="non-fast-forward"):
        tf.merge_branch(root, "main", "b")
    with pytest.raises(ValueError, match="non-fast-forward"):
        tf.merge_branch(root, "b", "main")
    # branch b's snapshot survives untouched
    assert tf.read_branch(spark, root, "b").count() == 1
    assert tf.read_branch(spark, root, "b").first()["id"] == 2


def test_legacy_parentless_fallback_stops_at_branch_commit(spark, tmp_path):
    """The pre-branch cur-1 fallback in _is_ancestor only chains through
    MAIN-LINE predecessors: a legacy (parentless) entry whose v-1 is a
    branch commit terminates the walk instead of crossing branches."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1,)], "id long")
    tf.commit_version(df, root)                                   # v0
    tf.create_branch(root, "b")
    tf.commit_to_branch(spark.createDataFrame([(2,)], "id long"), root, "b")
    tf.commit_version(spark.createDataFrame([(3,)], "id long"), root)  # v2
    # simulate a legacy manifest: strip the explicit parent from v2
    m = tf.read_manifest(root)
    for e in m["versions"]:
        if e["v"] == 2:
            e.pop("parent")
    tf._write_manifest_atomic(root, m)
    m = tf.read_manifest(root)
    assert not tf._is_ancestor(m, 1, 2)   # must NOT walk 2 -> 1 (branch b)
    assert not tf._is_ancestor(m, 0, 2)   # walk stops at the branch commit


def test_merge_fast_forward_survives_vacuum(spark, tmp_path):
    """r10 (was an r9 ADVICE finding), hardened r11: vacuum used to leave
    {v, parent} ancestry tombstones; the r11 FOLD re-points each live
    entry's parent through the pruned chain to its nearest live ancestor
    and drops the stubs — a genuinely fast-forward merge still resolves
    after intermediate versions between the two heads were vacuumed, and
    the manifest holds LIVE ENTRIES ONLY."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1,)], "id long")
    tf.commit_version(df, root)                                   # v0
    tf.create_branch(root, "old")                                 # old -> v0
    for i in range(4):                                            # v1..v4
        tf.commit_version(
            spark.createDataFrame([(10 + i,)], "id long"), root
        )
    removed = tf.vacuum(root, keep_last=1)
    assert set(removed) == {1, 2, 3}                              # v0 pinned
    m = tf.read_manifest(root)
    # the fold leaves NO pruned stubs; v4's parent jumped the chain to v0
    assert not any(e.get("pruned") for e in m["versions"])
    assert {e["v"] for e in m["versions"]} == {0, 4}
    assert {e["v"]: e.get("parent") for e in m["versions"]}[4] == 0
    assert m["vmax"] == 4
    # ancestry across the folded chain: old(v0) is an ancestor of main(v4)
    head = tf.merge_branch(root, "main", "old")                   # ff old->v4
    assert head == 4
    assert tf.read_branch(spark, root, "old").first()["id"] == 13
    # folded versions never satisfy a read...
    with pytest.raises(ValueError, match="vacuumed"):
        tf.read_version(spark, root, 2)
    # ...never count toward keep_last, and never get their numbers reused.
    # (After the merge nothing pins v0 anymore, so this drops exactly it.)
    assert tf.vacuum(root, keep_last=1) == [0]
    v5 = tf.commit_version(spark.createDataFrame([(9,)], "id long"), root)
    assert v5 == 5


def test_vacuum_fold_bounds_manifest_growth(spark, tmp_path):
    """r11 (the r10 verdict's task #7, closing SELFREVIEW_r10 #5's
    accepted debt): a long create/vacuum cycle keeps the manifest
    O(live versions + branch heads) — tombstones fold away instead of
    accumulating one stub per vacuumed version forever."""
    root = str(tmp_path / "t")
    tf.commit_version(spark.createDataFrame([(0,)], "id long"), root)  # v0
    tf.create_branch(root, "pin")                                  # pin -> v0
    for i in range(1, 25):                                         # 24 cycles
        tf.commit_version(
            spark.createDataFrame([(i,)], "id long"), root
        )
        tf.vacuum(root, keep_last=1)
        m = tf.read_manifest(root)
        # bounded: the pinned branch head + at most keep_last live heads
        assert len(m["versions"]) <= 2, (i, m["versions"])
        assert not any(e.get("pruned") for e in m["versions"])
    m = tf.read_manifest(root)
    assert m["vmax"] == 24
    # ancestry survived every fold: pin(v0) is an ancestor of main(v24)
    assert tf.merge_branch(root, "main", "pin") == 24
    # numbers keep advancing monotonically after 24 fold cycles
    assert tf.commit_version(
        spark.createDataFrame([(99,)], "id long"), root
    ) == 25
    # a mid-history folded version reads as vacuumed, not "unknown"
    with pytest.raises(ValueError, match="vacuumed"):
        tf.read_version(spark, root, 12)
