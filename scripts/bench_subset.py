#!/usr/bin/env python
"""Focused re-bench of a subset of queries with the SAME methodology
as the frozen bench.py (one untimed warm-up + best-of-N noop-sink
reps). For per-query optimization loops; cite numbers in
OPTIMIZATION_r07.md — bench.py itself stays the driver's measurement.

Usage: python scripts/bench_subset.py query [query ...]
Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
       BENCH_REPS (3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_reps = int(os.environ.get("BENCH_REPS", "3"))

    import __spark_entry__ as entry_mod
    from inputosm_spark import get_spark

    spark = get_spark(cpus=cpus, app_name=f"bench_subset[{cpus}]")
    qs = entry_mod.queries()
    materialize(qs["count_all"](spark, sf_dir))  # session warm-up

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_subset:{name}")
        materialize(fn(spark, sf_dir))  # untimed warm-up
        best = None
        for _ in range(n_reps):
            t0 = time.monotonic()
            materialize(fn(spark, sf_dir))
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"{name:28s} {best:.3f}", flush=True)
    print(json.dumps({"queries": timings, "sf_dir": sf_dir, "reps": n_reps}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
