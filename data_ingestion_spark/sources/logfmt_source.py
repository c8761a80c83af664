"""Logfmt source on Spark 4's Python Data Source API — the modern
parser-plug-in tier.

The reference's plug-in surface is a trait object registered in a match
arm (/root/reference/src/parser_adapter.rs:43-57). This repo already
mirrors that with ``register_parser`` (sources/dispatch.py) and a UDTF
lateral parser; this module adds the third, Spark-native extension point:
``pyspark.sql.datasource.DataSource``, the official Spark 4 API for
user-defined sources (SPARK-44076). A registered format name becomes a
first-class ``spark.read.format("logfmt")`` — it composes with the whole
DataFrame API, and ``partitions()`` gives file-level parallel reads
without any driver-side loop.

Tiering honesty: a Python data source executes the parse in Python
workers (Arrow-batched rows back to the JVM) — the right tier for formats
with no JVM reader, the wrong tier for CSV/JSON/parquet which stay on the
built-in (codegen + pushdown) readers.

Format: one record per line, ``key=value`` pairs; values may be
double-quoted ("..." with ``\\"`` escapes) to carry spaces; a bare
``key`` (no ``=``) is a flag with empty value; duplicate keys keep the
LAST value (the reference's XML last-wins rule, xml_parser.rs:42). Output
rows are the repo's all-string document shape (§1.2): (file_name,
line_number 1-based, kv_json with keys sorted) — blank lines skipped,
malformed spans kept raw under the ``_raw`` key, never dropping a line
silently (the reference's warn-and-continue semantics).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_PAIR = re.compile(r'(\w+)=("(?:[^"\\]|\\.)*"|\S*)|(\w+)')


def parse_logfmt_line(line: str) -> dict:
    """Parse one logfmt line to an ordered dict (last-wins duplicates)."""
    out: dict = {}
    covered = 0
    for m in _PAIR.finditer(line):
        between = line[covered : m.start()].strip()
        if between:  # junk span between pairs: preserved, not dropped
            out["_raw"] = (out.get("_raw", "") + " " + between).strip()
        covered = m.end()
        if m.group(3) is not None:
            out[m.group(3)] = ""
            continue
        k, v = m.group(1), m.group(2)
        if v.startswith('"') and v.endswith('"') and len(v) >= 2:
            v = v[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        out[k] = v
    tail = line[covered:].strip()
    if tail:
        out["_raw"] = (out.get("_raw", "") + " " + tail).strip()
    return out


class LogfmtDataSource(DataSource):
    """``spark.read.format("logfmt").option("path", dir)`` after
    ``spark.dataSource.register(LogfmtDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "logfmt"

    def schema(self) -> str:
        return "file_name string, line_number int, kv_json string"

    def reader(self, schema):  # noqa: ARG002 - fixed schema
        return LogfmtReader(self.options)

    def writer(self, schema, overwrite: bool):  # noqa: ARG002
        return LogfmtWriter(self.options, overwrite)

    def simpleStreamReader(self, schema):  # noqa: ARG002 - fixed schema
        return LogfmtStreamReader(self.options)


class LogfmtReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("logfmt source requires .option('path', <dir or file>)")

    def partitions(self):
        # One partition per file: each executor task streams one file —
        # the unit of parallelism for a many-small-files landing zone. (On
        # object stores, enumerate via the store's listing API instead.)
        if os.path.isfile(self.path):
            files = [self.path]
        else:
            # _tmp_ files are uncommitted writer-task output (a crashed or
            # speculative task's private file that commit() never renamed —
            # abort() only sees messages from tasks that RETURNED one).
            # They must never become visible to readers.
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if (f.endswith(".logfmt") or f.endswith(".log"))
                and not f.startswith("_tmp_")
            )
        return [InputPartition(f) for f in files]

    def read(self, partition):
        yield from _read_logfmt_file(partition.value)


def _read_logfmt_file(path: str):
    base = os.path.basename(path)
    with open(path, encoding="utf-8", errors="replace") as fh:
        for i, line in enumerate(fh, start=1):
            line = line.rstrip("\n")
            if not line.strip():
                continue
            kv = parse_logfmt_line(line)
            yield (base, i, json.dumps(kv, sort_keys=True))


class LogfmtStreamReader(SimpleDataSourceStreamReader):
    """Streaming tier of the same source: tail a landing directory as a
    micro-batch stream. Offsets are the SET OF FILES ALREADY PROCESSED (a
    {name: 1} dict — offsets must be primitive-valued dicts); each batch
    emits the files that appeared since, and ``readBetweenOffsets``
    replays any batch deterministically from its offset pair, which is
    what makes checkpointed exactly-once recovery work. Files are
    immutable-once-landed (the reference's S3-event contract); appends to
    an already-processed file are deliberately NOT re-read."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("logfmt stream requires .option('path', <dir>)")

    def _list(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        # Same _tmp_ exclusion as LogfmtReader.partitions(): orphaned
        # writer-task temp files are not committed data.
        return sorted(
            f
            for f in os.listdir(self.path)
            if (f.endswith(".logfmt") or f.endswith(".log"))
            and not f.startswith("_tmp_")
        )

    def initialOffset(self) -> dict:
        return {"files": {}}

    def read(self, start: dict):
        seen = start.get("files", {})
        new = [f for f in self._list() if f not in seen]
        rows = [
            r for f in new for r in _read_logfmt_file(os.path.join(self.path, f))
        ]
        end = {"files": {**seen, **{f: 1 for f in new}}}
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = start.get("files", {})
        new = [f for f in sorted(end.get("files", {})) if f not in seen]
        for f in new:
            yield from _read_logfmt_file(os.path.join(self.path, f))


def format_logfmt_row(d: dict) -> str:
    """Serialize a {str: str} mapping to one logfmt line (sorted keys;
    values quoted when they contain whitespace/quotes; quotes and
    backslashes escaped — the exact inverse of parse_logfmt_line for
    \\w+ keys)."""
    parts = []
    for k in sorted(d):
        v = "" if d[k] is None else str(d[k])
        if v == "" :
            parts.append(f"{k}=")
            continue
        if any(c.isspace() for c in v) or '"' in v or "\\" in v:
            v = '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
        parts.append(f"{k}={v}")
    return " ".join(parts)


class _LogfmtCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int) -> None:
        self.path = path
        self.n_rows = n_rows


class LogfmtWriter(DataSourceWriter):
    """Write side of the Spark 4 Python Data Source API: each task streams
    its partition to a private ``_tmp_`` file, the driver-side
    ``commit()`` renames all of them into place atomically-per-file (and
    ``abort()`` deletes them) — the standard task-temp + job-commit
    protocol, which keeps failed/speculative tasks from leaving partial
    visible output."""

    def __init__(self, options, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("logfmt sink requires .option('path', <dir>)")
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f"_tmp_part-{pid:05d}-{uuid.uuid4().hex}.logfmt"
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(format_logfmt_row(row.asDict()) + "\n")
                n += 1
        return _LogfmtCommit(tmp, n)

    def commit(self, messages) -> None:
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".logfmt") and not f.startswith("_tmp_"):
                    os.remove(os.path.join(self.path, f))
        for m in messages:
            if m is not None:
                # Strip the _tmp_ prefix from the BASENAME only — a parent
                # directory whose name contains "_tmp_" must not be mangled.
                d, base = os.path.split(m.path)
                os.replace(m.path, os.path.join(d, base.replace("_tmp_", "", 1)))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
