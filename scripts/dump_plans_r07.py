#!/usr/bin/env python
"""Dump `.explain("formatted")` for the named queries into
plans/r07/<query>_<suffix>.txt (suffix = before|after, argv[1]).

Usage: python scripts/dump_plans_r07.py before [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from inputosm_spark import get_spark

    spark = get_spark(cpus=8, app_name="dump_plans_r07")
    qs = entry_mod.queries()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", "r07")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
