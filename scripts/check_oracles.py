#!/usr/bin/env python
"""Local emulation of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf dir, runs its
oracle_sql() twin in DuckDB over the same parquet files, and compares
row count + column names + an order-insensitive value hash. Use while
iterating so CORRECTNESS_r{N}.json holds no surprises.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inputosm_spark.oracle_compare import canon_cell, duck_con, frame_hash  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from inputosm_spark import get_spark

    spark = get_spark()
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duck_con(sf_dir)

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:26s} rows={len(sdf):>8} (rows-only check, no oracle) "
                  f"[{t_spark:.1f}s]")
            if len(sdf) == 0:
                failures.append((name, "0 rows (rows-only)"))
            continue
        odf = con.execute(oracles[name]).df()
        sn, sc, sh = frame_hash(sdf)
        on, oc, oh = frame_hash(odf)
        ok = (sn, sc, sh) == (on, oc, oh)
        status = "OK " if ok else "FAIL"
        print(f"  {name:26s} {status} rows={sn}/{on} hash={'=' if sh == oh else '≠'} "
              f"cols={'=' if sc == oc else '≠'} [{t_spark:.1f}s]")
        if not ok:
            failures.append((name, f"spark=({sn},{sc},{sh[:8]}) duck=({on},{oc},{oh[:8]})"))
            if sc != oc:
                print(f"    spark cols: {sc}\n    duck  cols: {oc}")
            if sn == on and sc == oc:
                import pandas as pd

                s_rows = sorted(
                    "\x1f".join(canon_cell(v) for v in r)
                    for r in sdf[sorted(sdf.columns)].itertuples(index=False, name=None)
                )
                o_rows = sorted(
                    "\x1f".join(canon_cell(v) for v in r)
                    for r in odf[sorted(odf.columns)].itertuples(index=False, name=None)
                )
                diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
                for a, b in diff:
                    print(f"    spark row: {a[:160]}\n    duck  row: {b[:160]}")
    if failures:
        print(f"\n{len(failures)} FAILURES: {[f[0] for f in failures]}")
        return 1
    print("\nall queries match their oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
