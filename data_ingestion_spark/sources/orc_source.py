"""ORC source (rebuild extension — no reference counterpart).

The reference's parser menu stops at CSV/JSON/TXT/XML/XLSX
(src/infrastructure/parser_adapter.rs:32-58); real ingest menageries also
land columnar files. ORC support ships inside every Spark distribution
(orc-core is a bundled jar), so this is the zero-cost columnar sibling of
the parquet surface: a native, splittable, predicate-pushdown-capable
reader — no Python in the data path at all.

Scale notes (100 TB): ORC stripes split across executors natively; column
pruning and predicate pushdown reach the stripe reader (PushedFilters in
.explain), so a 2-column projection over a wide table reads 2 streams, not
the file. This is the fast path the brief asks for — the opposite of the
whole-file Python decoders (XLSX/Avro), which exist only for formats Spark
has no native reader for.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

from ..errors import ParseError


def read_orc(
    spark: SparkSession,
    path: str,
    parser_config: Optional[dict[str, Any]] = None,
) -> DataFrame:
    """Read an ORC file (or directory of files) into a typed DataFrame.

    Native types are preserved (like the JSON parser, unlike the
    stringifying CSV/XLSX parsers): ORC carries a real schema, and
    stringifying it would throw away pushdown and vectorized decode.

    parser_config:
      - ``columns``: optional list — project before the scan so column
        pruning reaches the ORC stripe reader
      - ``merge_schema``: bool (default False) — schema reconciliation
        across files, same knob as parquet
    """
    cfg = parser_config or {}
    reader = spark.read
    if cfg.get("merge_schema"):
        reader = reader.option("mergeSchema", "true")
    try:
        df = reader.orc(path)
    except Exception as exc:  # AnalysisException: missing path / not ORC
        raise ParseError(f"Failed to read ORC at {path}: {exc}") from exc
    cols = cfg.get("columns")
    if cols:
        df = df.select(*cols)
    return df


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[list[str]] = None,
) -> None:
    """ORC sink twin of the parquet sink's write path."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
