"""Isolation re-timer for optimization rounds (guide §1).

Times the named queries one at a time on a fresh session — min of N reps
after a sf0.001 codegen warm rep — using the SAME action as bench.py
(Arrow toPandas materialization) plus, separately, the noop sink
(guide §1.4) so sink cost vs compute cost can be told apart. Optionally
writes .explain("formatted") to a file per query.

Usage:
  python tools/isolate_time.py [--reps N] [--plans DIR] [--sf SF_DIR] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_spark.queries import merged_queries  # noqa: E402
from data_ingestion_spark.session import get_spark, load_table  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir for <q>.txt explain output")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--suffix", default="", help="suffix for plan filenames, e.g. _before")
    ap.add_argument("--noop", action="store_true", help="also time via noop sink")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_MUTE_WINDOWEXEC", "1")
    spark = get_spark("isolate")
    registry = merged_queries()
    load_table(spark, args.sf, "lineitem").count()  # session warm-up

    warm_dir = os.path.join(os.path.dirname(args.sf.rstrip("/")), "sf0.001")
    out = {}
    for name in args.queries:
        fn, _sql = registry[name]
        spark.sparkContext.setJobDescription(f"isolate:{name}")
        try:
            fn(spark, warm_dir).toPandas()  # codegen warm, not billed
        except Exception as exc:
            print(f"# warm {name} failed: {exc}", file=sys.stderr)
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf).toPandas()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rec = {"toPandas_min": round(best, 3), "reps": args.reps}
        if args.noop:
            bestn = None
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                bestn = dt if bestn is None else min(bestn, dt)
            rec["noop_min"] = round(bestn, 3)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)  # built once — fn() may itself run jobs
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
