#!/usr/bin/env python
"""N -> 4N scaling-efficiency evidence (north_rule).

A real two-size cluster isn't available in this sandbox, so — per the
driver's instruction — the SAME job runs at two parallelism levels
(local[8] vs local[32]) on the SAME input, and we report throughput at
both plus scaling efficiency:

    efficiency = (docs_per_sec_32 / docs_per_sec_8) / (32 / 8)

The job is scripts/scaling_job.py: the north_star spatial-join +
tiling pipeline over a deterministically synthesized interleaved
corpus, sized so per-task work dominates scheduling overhead (the
regime a 1000-executor cluster actually runs in; sub-second sf0.1
suite queries would measure fixed overhead, not scaling).

Each level runs in a fresh subprocess (a SparkSession's master is
fixed per JVM). Results land in BENCH_SCALING.json and are summarized
in BASELINE.md.

Usage: python scripts/bench_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_job(cpus: int, n_docs: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SCALING_DOCS=str(n_docs))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "scaling_job.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stdout + out.stderr)
        raise RuntimeError(f"scaling_job failed at cpus={cpus}")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("SCALING_DOCS", "4000000")
    )
    small_n, big_n = 8, 32

    small = run_job(small_n, n_docs)
    big = run_job(big_n, n_docs)

    speedup = big["docs_per_sec"] / small["docs_per_sec"]
    efficiency = speedup / (big_n / small_n)

    result = {
        "job": "spatial-join+tiling pipeline (scripts/scaling_job.py)",
        "n_docs": n_docs,
        "cores_small": small_n,
        "cores_big": big_n,
        "wall_s_small": small["wall_s"],
        "wall_s_big": big["wall_s"],
        "docs_per_sec_small": small["docs_per_sec"],
        "docs_per_sec_big": big["docs_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "target_efficiency": 0.8,
        "meets_target": efficiency >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
