"""Change-data-capture operators: snapshot diff + SCD Type-2 merge.

The reference pipeline is append-only (every parsed file bulk-inserts,
SURVEY.md §2.3 K1); real warehouse ingest also needs the two canonical
mutation patterns, so the rebuild adds them as first-class, oracle-paired
operators:

- ``snapshot_diff``: given yesterday's and today's full snapshots of a
  keyed table, emit the (insert / update / delete) delta — the batch-CDC
  primitive every lake pipeline runs before a merge.
- ``scd2_apply``: apply a batch of changed rows to a slowly-changing
  dimension with full history (effective_from / effective_to / is_current)
  — the Kimball Type-2 merge, expressed as pure joins + unions so Catalyst
  plans it (no MERGE INTO engine dependency, no Delta requirement).

Scale notes (100 TB): both are single equi-shuffles on the business key.
``snapshot_diff`` is one full-outer join; AQE handles skewed keys.
``scd2_apply`` joins only the CURRENT slice of the dimension against the
update batch — history rows pass through untouched with zero shuffle
(a filter + union, not a join), and the typically-small update batch is
broadcast when under the AQE threshold. A hash-compare column avoids
comparing N attribute columns row-wise in the join condition.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_fingerprint(cols: Sequence[str]) -> F.Column:
    """Attribute fingerprint: md5 of concatenated PER-COLUMN md5s (fixed
    32-hex parts make the concat injective — no separator-ambiguity when a
    value itself contains the join character), with a NULL marker distinct
    from any hex digest. Oracle SQL twins replicate the classification
    logic, not this hash, so only Spark-internal stability matters."""
    parts = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("NULL")) for c in cols
    ]
    if not parts:
        # key-only table: no attributes to compare, so every matched key is
        # "unchanged" — a constant fingerprint makes the diff emit only
        # inserts and deletes instead of raising on the empty concat
        return F.md5(F.lit(""))
    return F.md5(F.concat(*parts) if len(parts) > 1 else parts[0])


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Keyed diff of two snapshots → rows tagged ``change_type`` in
    {'insert','update','delete'}; unchanged rows are dropped.

    Output columns: key_cols + compare_cols (new values; old values for
    deletes) + change_type. One full-outer shuffle join on the key; the
    attribute comparison is a single fingerprint equality, not an N-column
    predicate, so the join stays a cheap hash compare at any width.
    """
    compare_cols = list(
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c not in key_cols]
    )
    o = old.select(
        *key_cols,
        *[F.col(c).alias(f"_old_{c}") for c in compare_cols],
        _row_fingerprint(compare_cols).alias("_old_fp"),
    )
    n = new.select(
        *key_cols,
        *compare_cols,
        _row_fingerprint(compare_cols).alias("_new_fp"),
    )
    j = o.join(n, on=list(key_cols), how="full_outer")
    change = (
        F.when(F.col("_old_fp").isNull(), F.lit("insert"))
        .when(F.col("_new_fp").isNull(), F.lit("delete"))
        .when(F.col("_old_fp") != F.col("_new_fp"), F.lit("update"))
    )
    out_vals = [
        F.when(F.col("_new_fp").isNull(), F.col(f"_old_{c}"))
        .otherwise(F.col(c))
        .alias(c)
        for c in compare_cols
    ]
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, *out_vals, "change_type")
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    batch_ts,
    eff_from: str = "eff_from",
    eff_to: str = "eff_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Kimball SCD Type-2 merge.

    ``dim`` carries key_cols + tracked_cols + (eff_from, eff_to, is_current);
    ``updates`` carries key_cols + tracked_cols (the changed/new snapshot
    batch). ``batch_ts`` (a literal or Column) stamps this batch's effective
    boundary. Result:

    - history rows (``is_current = false``): pass through UNTOUCHED — no
      shuffle, a filter+union branch
    - current rows with a differing update: closed (eff_to = batch_ts,
      is_current = false) AND a new open row inserted
    - current rows with an identical update (no attribute change): unchanged
    - brand-new keys: inserted open
    """
    ts = batch_ts if isinstance(batch_ts, F.Column) else F.lit(batch_ts)
    key_cols = list(key_cols)
    tracked_cols = list(tracked_cols)
    end_type = dim.schema[eff_to].dataType

    history = dim.filter(~F.col(is_current))
    current = dim.filter(F.col(is_current))

    cur = current.withColumn("_fp", _row_fingerprint(tracked_cols))
    upd = updates.select(
        *key_cols,
        *[F.col(c).alias(f"_u_{c}") for c in tracked_cols],
        _row_fingerprint(tracked_cols).alias("_u_fp"),
    )
    # ONE full-outer join; each key then emits its 1-2 output rows through
    # an array+explode, so the big dimension is scanned and shuffled exactly
    # once. (Post-filtering three separate branches instead lets Catalyst
    # specialize each into its own join — three scans of the dimension.)
    j = cur.join(upd, on=key_cols, how="full_outer")

    def row(vals, start, end, flag):
        return F.struct(
            *[v.alias(c) for c, v in zip(tracked_cols, vals)],
            start.alias(eff_from),
            end.alias(eff_to),
            flag.alias(is_current),
        )

    old_vals = [F.col(c) for c in tracked_cols]
    new_vals = [F.col(f"_u_{c}") for c in tracked_cols]
    carried = row(old_vals, F.col(eff_from), F.col(eff_to), F.lit(True))
    closed = row(old_vals, F.col(eff_from), ts.cast(end_type), F.lit(False))
    opened = row(
        new_vals,
        ts.cast(dim.schema[eff_from].dataType),
        F.lit(None).cast(end_type),
        F.lit(True),
    )
    rows = (
        F.when(F.col("_fp").isNull(), F.array(opened))  # brand-new key
        .when(
            F.col("_u_fp").isNull() | (F.col("_u_fp") == F.col("_fp")),
            F.array(carried),  # no update, or identical replay
        )
        .otherwise(F.array(closed, opened))  # real change
    )
    merged = (
        j.select(*key_cols, F.explode(rows).alias("_r"))
        .select(*key_cols, "_r.*")
    )
    return history.unionByName(merged)


def incremental_agg_refresh(
    mv: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    count_col: str,
    sum_cols: Optional[dict] = None,
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: refresh a COUNT/SUM
    rollup from a CDC delta batch WITHOUT rescanning the base table — the
    view-maintenance primitive (Gupta & Mumick) every warehouse uses to
    keep a 100 TB fact table's rollups current from a per-hour change feed.

    ``mv`` is the stored aggregate: key_cols + count_col + the sum columns
    (keys of ``sum_cols``). ``delta`` is a CDC batch with ``change_type``
    in {'insert','delete'} — an update travels as its canonical
    delete(old)+insert(new) pair, so sums need no old-value bookkeeping.
    ``sum_cols`` maps each mv sum column -> the measure column in delta.

    Shape: the delta aggregates to signed partials per touched group
    (map-side combined), then ONE full-outer join against the mv on the
    group key — broadcast when the touched-group set is small, never a
    base-table scan. Groups whose refreshed count reaches 0 are dropped
    (the group no longer exists); brand-new groups appear. Refresh cost is
    O(|delta| + |touched groups|), independent of the base table size —
    that independence is exactly what the oracle twin (a full recompute of
    the post-CDC state) certifies.
    """
    sum_cols = dict(sum_cols or {})
    keys = list(key_cols)
    # coalesce so a NULL change_type counts as invalid (a bare ~isin()
    # returns NULL for NULL input and the filter would silently drop it —
    # the row would then be mis-weighted as a delete below)
    bad = delta.filter(
        ~F.coalesce(
            F.col("change_type").isin("insert", "delete"), F.lit(False)
        )
    ).limit(1).count()
    if bad:
        raise ValueError(
            "incremental_agg_refresh: delta change_type must be "
            "'insert' or 'delete' (send updates as delete+insert pairs)"
        )
    w = F.when(F.col("change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    aggs = [F.sum(w).alias(f"_d_{count_col}")]
    for out, measure in sum_cols.items():
        aggs.append(F.sum(w.cast("long") * F.col(measure)).alias(f"_d_{out}"))
    dagg = delta.groupBy(*keys).agg(*aggs)

    j = mv.join(dagg, on=keys, how="full_outer")
    zero = F.lit(0)
    new_count = F.coalesce(F.col(count_col), zero) + F.coalesce(
        F.col(f"_d_{count_col}"), zero
    )
    out_cols = [new_count.cast(mv.schema[count_col].dataType).alias(count_col)]
    for out in sum_cols:
        t = mv.schema[out].dataType
        refreshed = F.coalesce(F.col(out), zero.cast(t)) + F.coalesce(
            F.col(f"_d_{out}").cast(t), zero.cast(t)
        )
        out_cols.append(refreshed.cast(t).alias(out))
    return j.select(*keys, *out_cols).filter(F.col(count_col) > 0)


def merge_upsert(
    spark,
    target_path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    delete_col: Optional[str] = None,
) -> dict:
    """Copy-on-write MERGE (upsert) into a parquet table — the third
    canonical mutation pattern next to snapshot_diff and scd2_apply:
    rows whose key appears in ``updates`` are REPLACED (whole-row update
    semantics, the Delta ``MERGE … WHEN MATCHED UPDATE SET *`` shape),
    unmatched update rows are INSERTED, everything else passes through.
    With ``delete_col``, update rows whose flag is true instead DELETE the
    matching target rows (``WHEN MATCHED AND flag THEN DELETE`` — a
    CDC-feed tombstone); flagged rows with no match are a no-op, and the
    flag column never lands in the table.

    Expressed as ``target LEFT ANTI JOIN updates ∪ updates`` — pure
    DataFrame ops, no table-format engine dependency. Scale shape: with a
    small update batch the anti-join broadcasts, making the rewrite a
    MAP-ONLY pass over the target (the common nightly-upsert case); a
    corpus-sized batch degrades to one key shuffle. Copy-on-write is
    table-level here; on a real lake the same plan runs per partition
    after pruning to partitions whose keys are touched (list the update
    batch's partition values first), or inside a transactional format.

    Commit protocol: the merged table is written to ``<path>.staging``
    first and only then swapped into place (old data parked at
    ``<path>.bak``) — a reader never observes a partially-written table;
    the swap itself is two renames, which a transactional table format
    (or an object-store pointer file) would make atomic. Returns
    {"rows_before", "rows_after", "n_updated", "n_inserted", "n_deleted"}
    (counts are computed from the joins, not re-scans).
    """
    import os
    import shutil

    keys = list(key_cols)
    tgt = spark.read.parquet(target_path)
    if delete_col is not None:
        deletes = updates.filter(F.col(delete_col)).select(*keys).distinct()
        upserts = updates.filter(~F.col(delete_col)).drop(delete_col)
        # a key both tombstoned AND re-upserted in the same batch survives
        # (the upsert rows come back after the anti-join) — count it as
        # updated, not deleted, or rows_after double-subtracts it
        gone = deletes.join(upserts.select(*keys).distinct(), keys, "left_anti")
    else:
        deletes = None
        upserts = updates
    # r14 (optimization guide §1.2): the three (four with deletes) stat
    # counts used to be separate driver actions — one scheduled job each.
    # CrossJoined scalar aggregates collect them in ONE job; the collect
    # stays EAGER and BEFORE the staging write below, because the counts
    # scan the pre-swap target directory.
    _cnt = lambda df, name: df.agg(  # noqa: E731
        F.count(F.lit(1)).cast("long").alias(name)
    )
    stats = _cnt(tgt, "rows_before").crossJoin(
        _cnt(
            tgt.join(upserts.select(*keys).distinct(), keys, "left_semi"),
            "n_updated",
        )
    ).crossJoin(_cnt(upserts, "n_updates"))
    if deletes is not None:
        stats = stats.crossJoin(
            _cnt(tgt.join(gone, keys, "left_semi"), "n_deleted")
        )
    srow = stats.collect()[0]
    rows_before = srow["rows_before"]
    n_updated = srow["n_updated"]
    n_updates = srow["n_updates"]
    n_deleted = srow["n_deleted"] if deletes is not None else 0
    # one anti-join against EVERY touched key (upserted or tombstoned),
    # then the upsert rows come back in — deletes simply never do
    touched = upserts.select(*keys).distinct()
    if deletes is not None:
        touched = touched.unionByName(deletes).distinct()
    merged = tgt.join(touched, keys, "left_anti").unionByName(upserts)

    staging = target_path.rstrip("/") + ".staging"
    backup = target_path.rstrip("/") + ".bak"
    merged.write.mode("overwrite").parquet(staging)
    if os.path.exists(backup):
        shutil.rmtree(backup)
    os.rename(target_path, backup)
    os.rename(staging, target_path)
    return {
        "rows_before": rows_before,
        "rows_after": rows_before - n_updated + n_updates - n_deleted,
        "n_updated": n_updated,
        "n_inserted": n_updates - n_updated,
        "n_deleted": n_deleted,
    }
