"""TXT source (reference: src/infrastructure/parsers/txt_parser.rs).

Reference semantics (SURVEY.md §2.2 P6): UTF-8 decode (hard error on invalid
bytes); one document per line, shaped ``{"line_number": <1-based int>,
"content": <line>}`` (txt_parser.rs:18-23).

Spark design: deterministic line numbers need a total order per file, which
``spark.read.text`` doesn't guarantee across splits. The faithful default
reads each file with ``wholetext`` (one row per file — mirroring the
reference's whole-buffer parse, s3_adapter.rs:39-46) and splits with
``posexplode``, giving exact 0-based positions JVM-side with no UDF.

For huge single files where whole-file rows are unacceptable, the scalable
variant (``mode="distributed"``) uses the splittable text reader and
reconstructs line numbers from byte offsets via a window — one shuffle,
no data skew beyond line-length variance.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def read_txt(
    spark: SparkSession,
    path: str,
    parser_config: Optional[dict[str, Any]] = None,
) -> DataFrame:
    """Parse a text file into (line_number bigint, content string)."""
    cfg = parser_config or {}
    mode = cfg.get("mode", "wholefile")
    if mode == "distributed":
        # Scalable path: per-file ordering key from a monotonic id within
        # input order; correct as long as each file is read in offset order
        # within its splits (Spark's text source guarantees per-split order,
        # and ids are ordered across splits of the same file).
        df = spark.read.text(path).select(
            F.input_file_name().alias("_file"),
            F.monotonically_increasing_id().alias("_mid"),
            F.col("value"),
        )
        w = W.partitionBy("_file").orderBy("_mid")
        return df.select(
            F.row_number().over(w).cast("long").alias("line_number"),
            F.col("value").alias("content"),
        )
    whole = spark.read.text(path, wholetext=True)
    lines = whole.select(
        F.posexplode(F.split(F.col("value"), "\n", -1)).alias("pos", "content")
    )
    # A trailing newline produces one empty final element — the reference's
    # lines() iterator does not emit it; drop only that final empty line.
    max_pos = lines.agg(F.max("pos")).collect()[0][0]
    lines = lines.filter(
        ~((F.col("pos") == F.lit(max_pos)) & (F.col("content") == ""))
    )
    return lines.select(
        (F.col("pos") + 1).cast("long").alias("line_number"),
        F.col("content"),
    )
