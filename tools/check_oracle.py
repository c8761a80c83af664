"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry from __spark_entry__.py at a given scale
factor, runs the matching ``oracle_sql()`` in DuckDB over the same parquet
tables, and compares row count, column names (sorted), and values
(order-insensitive, exact for ints/strings, tight tolerance report for
floats). Exit code 1 on any mismatch.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py [sf_dir] --window   # the driver's
       first-50 rotation view only
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _dtype_class(s: pd.Series) -> str:
    """Coarse dtype class for driver-strict comparison.

    The driver hashes exact values: a Spark DECIMAL column crosses pandas
    as Decimal *objects* while DuckDB's bridge emits float64 — values can
    be numerically identical yet hash differently. Locally tolerating that
    (round 4's three dtype-parity fails) is how the class ships, so flag
    the dtype-class mismatch itself.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if s.dtype == object:
        nonnull = s.dropna()
        if len(nonnull):
            kinds = {
                "decimal" if isinstance(v, decimal.Decimal) else "object"
                for v in nonnull
            }
            if len(kinds) > 1:
                return "mixed"
            return kinds.pop()
        return "object"
    return str(s.dtype)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if sorted(sdf.columns) != sorted(odf.columns):
        errs.append(f"schema: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return errs
    if len(sdf) != len(odf):
        errs.append(f"rows: spark={len(sdf)} oracle={len(odf)}")
        return errs
    # driver-strict dtype-class gate (see _dtype_class): ANY cross-class
    # numeric mismatch (decimal/float/int/bool/mixed) is an error — the
    # driver hashes exact values, so int64 vs float64 parity would pass a
    # lenient local gate and still fail on the driver. Dtype errors are
    # collected but the value comparison below still runs, so one run
    # reports both classes of failure.
    numeric = {"float", "int", "decimal", "bool", "mixed"}
    for c in sdf.columns:
        sc, oc = _dtype_class(sdf[c]), _dtype_class(odf[c])
        if sc == oc:
            continue
        if {sc, oc} <= numeric:
            errs.append(
                f"col {c}: dtype-class mismatch spark={sc} oracle={oc} "
                "(the driver hashes exact values — numerically equal "
                "columns of different classes hash differently; align "
                "the type on BOTH sides, e.g. integer units)"
            )
    s, o = canon(sdf), canon(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv = pd.to_numeric(sv, errors="coerce").astype(float)
            ov = pd.to_numeric(ov, errors="coerce").astype(float)
            both_nan = sv.isna() & ov.isna()
            diff = (sv - ov).abs()
            bad = ~both_nan & ~(diff == 0)
            nexact = int(bad.sum())
            if nexact:
                mx = float(diff[bad].max())
                msg = f"col {c}: {nexact} non-bitwise-equal floats, max_abs_diff={mx:.3e}"
                if mx > 1e-9 or math.isnan(mx):
                    errs.append(msg)
                else:
                    print(f"    warn {name}: {msg}")
        else:
            if not sv.astype(str).equals(ov.astype(str)):
                nbad = int((sv.astype(str) != ov.astype(str)).sum())
                ex = [
                    (a, b)
                    for a, b in zip(sv.astype(str), ov.astype(str))
                    if a != b
                ][:3]
                errs.append(f"col {c}: {nbad} mismatched values, e.g. {ex}")
    return errs


def main() -> int:
    # flags are parsed BEFORE positionals (r10 ADVICE: `check_oracle.py
    # --window` without an sf_dir used to bind sf_dir='--window' and
    # silently run ALL queries against a nonexistent directory)
    argv = sys.argv[1:]
    window = "--window" in argv
    argv = [a for a in argv if a != "--window"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    args = argv[1:]
    if window and args:
        print("--window and explicit query names are mutually exclusive")
        return 2
    if not os.path.isdir(sf_dir):
        print(f"sf_dir {sf_dir!r} is not a directory")
        return 2

    import __spark_entry__ as e
    from data_ingestion_spark.session import get_spark

    # --window = exactly the driver's view: the first 50 registered
    # queries in insertion order (the rotation gate). Rehearse it per
    # round before the external run does.
    if window:
        only = set(list(e.queries())[:50])
    else:
        only = set(args)

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                print(f"    warn {name}: 0 rows on rows-only check")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {ex}")
            failures += 1
            continue
        errs = compare(name, sdf, odf)
        if errs:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(errs))
        else:
            print(f"ok   {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
    n_run = len(only & set(qs)) if only else len(qs)
    print(f"\n{n_run} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
