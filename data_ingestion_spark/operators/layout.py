"""Data-layout operators: Z-order (Morton) clustering stats and
Bloom-filter join pruning.

Why these exist in a training-data engine: at 100 TB the dominant cost is
usually the SCAN, and both operators attack it from the write side —

- **Z-order** decides how rows are laid out into files so that min/max
  footer stats prune on EITHER of two dimensions (the Delta/Iceberg
  ``OPTIMIZE ZORDER BY`` idea). The operator here computes the Morton key
  and the per-bucket min/max envelopes, i.e. exactly the file-skipping
  index a writer would persist.
- **Bloom pruning** pre-filters a huge probe table against a tiny bitmap
  of the build side's join keys BEFORE the shuffle, so rows that cannot
  match never leave the scan stage (the Spark runtime-filter /
  bloom-join idea, made explicit and oracle-checkable).

Reference parity note: the reference pipeline
(/root/reference/src/ingestion_service.rs) has no layout layer at all —
these are §2.5 scale extensions, designed Spark-first.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import md5_hash60

GRID_BITS = 16  # per-dimension grid resolution (2^16 cells)


def _grid(col, lo, hi):
    """Map a numeric column into [0, 2^GRID_BITS - 1] on a fixed min/max
    scale. All-double arithmetic in a fixed op order, so any engine lands
    on the same cell."""
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    scale = float((1 << GRID_BITS) - 1) / span
    g = F.floor((col.cast("double") - F.lit(lo)) * F.lit(scale)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << GRID_BITS) - 1), g))


def morton_key(gx, gy):
    """Interleave two GRID_BITS-bit grid coordinates into one Z-value
    (x in even bits, y in odd bits). Pure 64-bit integer ops — replayable
    verbatim in any SQL engine with shift/and/or."""
    parts = []
    for i in range(GRID_BITS):
        parts.append(
            F.shiftleft(F.shiftright(gx, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        parts.append(
            F.shiftleft(F.shiftright(gy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_bucket_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bucket_bits: int = 6,
) -> DataFrame:
    """Assign each row a Z-order bucket and emit the per-bucket (file-level)
    min/max envelope on BOTH dimensions — the footer-stats index a
    Z-ordered writer would produce.

    Scale shape: the Morton key is a narrow JVM expression (zero shuffle);
    the ONLY shuffle is the per-bucket aggregate on a ≤2^bucket_bits key
    space, partial-aggregated map-side. Writing would be
    ``df.repartitionByRange(F.col("z")).sortWithinPartitions("z")`` — the
    stats here quantify how well that layout prunes: tight per-bucket
    envelopes on both x and y mean a predicate on EITHER column skips most
    buckets, which a single-column sort cannot give.

    ``x_range``/``y_range`` are the fixed normalization bounds (driver
    metadata, like tfidf's N literal — a 2-value min/max agg, never data).
    """
    z_bits = 2 * GRID_BITS
    gx = _grid(F.col(x_col), float(x_range[0]), float(x_range[1]))
    gy = _grid(F.col(y_col), float(y_range[0]), float(y_range[1]))
    keyed = df.select(
        gx.alias("gx"), gy.alias("gy")
    ).withColumn("z", morton_key(F.col("gx"), F.col("gy")))
    bucket = F.shiftright(F.col("z"), z_bits - bucket_bits)
    return (
        keyed.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("gx").alias("gx_min"),
            F.max("gx").alias("gx_max"),
            F.min("gy").alias("gy_min"),
            F.max("gy").alias("gy_max"),
        )
    )


def zorder_write(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    path: str,
    n_files: int = 16,
) -> None:
    """WRITE the Z-ordered layout whose quality ``zorder_bucket_stats``
    measures: compute the Morton key, ``repartitionByRange(n_files, z)``
    (contiguous z-ranges per output file — one range shuffle), sort within
    each partition by z, and write parquet WITHOUT the key — the payoff is
    that the parquet footer min/max stats of the NATURAL columns (x and y)
    become tight per file, so a stats-pruning reader (parquet row-group
    pushdown, Delta/Iceberg file stats) skips most files on a selective
    predicate against EITHER dimension. A single-column sort gives that on
    one dimension only; Z-order gives ~sqrt-fraction pruning on both.

    At 100 TB this is the standard ``OPTIMIZE ZORDER BY`` write: one range
    exchange (AQE-balanced), files sized by n_files, no driver data.
    """
    gx = _grid(F.col(x_col), float(x_range[0]), float(x_range[1]))
    gy = _grid(F.col(y_col), float(y_range[0]), float(y_range[1]))
    (
        df.withColumn("__z", morton_key(gx, gy))
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def parquet_rowgroups_overlapping(
    path: str, col: str, lo: float, hi: float
) -> tuple[int, int, int, int]:
    """Count parquet files / row groups whose footer min/max envelope on
    ``col`` intersects [lo, hi] — i.e. exactly the units a stats-pruning
    reader must scan for that predicate (everything else is skipped from
    the footer alone, no data IO). Pure pyarrow metadata reads: this is
    the verification side of ``zorder_write``, not a query operator.

    Returns (files_hit, files_total, rowgroups_hit, rowgroups_total).
    """
    import pyarrow.parquet as pq

    files_hit = files_total = rg_hit = rg_total = 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet") or name.startswith("_"):
            continue
        files_total += 1
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = md.schema.names.index(col)
        file_hits = 0
        for g in range(md.num_row_groups):
            rg_total += 1
            st = md.row_group(g).column(idx).statistics
            if st is None or st.min is None or st.max is None:
                rg_hit += 1  # no stats: reader cannot skip — count as hit
                file_hits += 1
                continue
            if float(st.max) >= lo and float(st.min) <= hi:
                rg_hit += 1
                file_hits += 1
        if file_hits:
            files_hit += 1
    return files_hit, files_total, rg_hit, rg_total


def bloom_bitmap(df: DataFrame, key_col: str, m_bits: int, n_hashes: int) -> list[int]:
    """Build-side Bloom bitmap: the sorted set-bit positions for the key
    column under ``n_hashes`` salted md5-60bit hash functions mod
    ``m_bits``.

    Returns driver-side bounded metadata (≤ m_bits ints — like the rules
    table or k-means centroids), NOT data rows: on a cluster this is the
    bitmap that gets broadcast into the probe-side scan filter. The build
    aggregation is a distinct on (≤ m_bits) positions, partial-agg'd.
    """
    pos_cols = [
        (
            md5_hash60(
                F.concat(F.lit(f"bloom{j}:"), F.col(key_col).cast("string"))
            )
            % m_bits
        ).alias(f"p{j}")
        for j in range(n_hashes)
    ]
    exploded = df.select(pos_cols).select(
        F.explode(F.array(*[F.col(f"p{j}") for j in range(n_hashes)])).alias("pos")
    )
    rows = exploded.distinct().collect()
    return sorted(r["pos"] for r in rows)


def bloom_prune_probe(
    probe: DataFrame,
    key_col: str,
    bitmap_positions: list[int],
    m_bits: int,
    n_hashes: int,
) -> DataFrame:
    """Filter the probe side to rows whose key passes the Bloom bitmap
    (all ``n_hashes`` positions set). Zero-shuffle: the bitmap rides into
    the scan as a literal array membership test, so at 100 TB the rows
    that cannot join are dropped inside the (codegen'd) scan stage and
    never reach the exchange. False positives are possible (verified by
    the real join downstream); false negatives are not.
    """
    if not bitmap_positions:  # empty build side: nothing can match
        return probe.filter(F.lit(False))
    # one-parse literal array (the bitmap appears once per hash check in
    # the plan; element-wise F.lit would cost m_bits py4j calls × k copies)
    bitset = F.expr(
        "array(" + ",".join(str(int(p)) + "L" for p in bitmap_positions) + ")"
    )
    checks = [
        F.array_contains(
            bitset,
            (
                md5_hash60(
                    F.concat(F.lit(f"bloom{j}:"), F.col(key_col).cast("string"))
                )
                % m_bits
            ),
        )
        for j in range(n_hashes)
    ]
    return probe.filter(reduce(lambda a, b: a & b, checks))


# --------------------------------------------------------------------------
# Bucketed (co-located) joins: pre-shuffle the data at WRITE time
# --------------------------------------------------------------------------
def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
) -> None:
    """Persist ``df`` as a bucketed, per-bucket-sorted table: rows are
    hash-distributed into ``n_buckets`` files by ``bucket_col`` and sorted
    within each bucket — Spark's bucketBy/sortBy, i.e. the shuffle a join
    would need, paid ONCE at write time. Any later equi-join or
    aggregation on ``bucket_col`` between tables bucketed the same way
    runs with NO Exchange (asserted in tests/test_plans); only cheap
    pipeline-local per-bucket Sorts remain, because Spark ≥3.0 ignores
    bucket sort metadata by default
    (spark.sql.legacy.bucketedTableScan.outputOrdering) rather than
    force one-file-per-bucket reads.

    At 100 TB this is the difference between re-shuffling a fact table
    for every nightly join and never shuffling it again: the table IS the
    shuffle output. Requires saveAsTable (bucket metadata lives in the
    catalog); ``path`` keeps the data out of the default warehouse so
    repeated runs are self-contained.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    (
        df.write.mode("overwrite")
        .option("path", os.path.join(path, table_name))
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two co-bucketed catalog tables on their bucket key with a
    sort-merge hint: because both inputs are already hash-partitioned by
    ``key`` on disk, Catalyst plans the SMJ with zero Exchange — only
    pipeline-local per-bucket Sorts, no data movement.
    The merge hint keeps the small side from being
    broadcast, which would hide what bucketing buys on two LARGE tables
    (broadcast stops being an option when both sides are TBs)."""
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table)
    return lt.join(rt, key)
