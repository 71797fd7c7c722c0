#!/usr/bin/env python
"""Solo, pinned, best-of-5 measurement of the HEADLINE spatial core +
the flagged dedup_keep_best (round-6 directives #3/#4).

The driver's BENCH_r* artifacts showed `spatial_docs_per_sec` 6,149
(r4) -> 4,941 (r5) and `dedup_keep_best` 2.57 -> 3.46 s; both moved
without any code change to their pipelines, consistent with this box's
documented noisy-neighbor episodes (BASELINE.md §scaling). This script
produces the committed, reproduced number the verdict asked for,
under the repo's own quiet-box rules (CLAUDE.md):

* nothing else runs on the box (caller's responsibility — the script
  refuses if load average says otherwise);
* the WHOLE process tree is pinned with taskset (re-execs itself);
* one untimed full warm-up rep per query, then best-of-N (default 5)
  timed reps, with every rep recorded so the artifact carries the
  spread, not just the minimum.

Writes BENCH_HEADLINE.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SPATIAL_CORE = [
    "flagship",
    "cell_assign",
    "pip_join_boxes",
    "knn_join",
    "tile_counts",
    "salted_cell_count",
]
EXTRA = ["dedup_keep_best"]


def main() -> int:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if os.environ.get("_BENCH_HEADLINE_PINNED") != "1":
        la1 = os.getloadavg()[0]
        if la1 > 2.0 and os.environ.get("BENCH_HEADLINE_FORCE") != "1":
            print(
                f"refusing: load average {la1:.1f} > 2 — the box is not "
                "quiet (set BENCH_HEADLINE_FORCE=1 to override)",
                file=sys.stderr,
            )
            return 1
        env = dict(os.environ, _BENCH_HEADLINE_PINNED="1")
        return subprocess.call(
            ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
             os.path.abspath(__file__)],
            env=env,
        )

    import __spark_entry__ as entry_mod
    from bench import materialize
    from inputosm_spark import get_spark
    from inputosm_spark.sources.registry import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_reps = int(os.environ.get("BENCH_REPS", "5"))
    spark = get_spark(cpus=str(cpus), app_name="bench_headline")
    qs = entry_mod.queries()
    n_docs = load_table(spark, sf_dir, "documents").count()

    materialize(qs["count_all"](spark, sf_dir))  # JVM + footer warm-up

    reps: dict[str, list[float]] = {}
    for name in SPATIAL_CORE + EXTRA:
        fn = qs[name]
        materialize(fn(spark, sf_dir))  # untimed full warm-up
        walls = []
        for _ in range(n_reps):
            t0 = time.monotonic()
            materialize(fn(spark, sf_dir))
            walls.append(round(time.monotonic() - t0, 3))
        reps[name] = walls

    best = {n: min(w) for n, w in reps.items()}
    spatial_s = sum(best[n] for n in SPATIAL_CORE)
    out = {
        "metric": "solo pinned headline (best-of-%d)" % n_reps,
        "sf_dir": sf_dir,
        "cpus": cpus,
        "n_documents": n_docs,
        "spatial_docs_per_sec": round(n_docs * len(SPATIAL_CORE) / spatial_s),
        "spatial_core_sec": round(spatial_s, 3),
        "best": best,
        "all_reps": reps,
    }
    path = os.path.join(ROOT, "BENCH_HEADLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
