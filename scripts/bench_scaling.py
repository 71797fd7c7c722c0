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
    # pin the WHOLE process tree (JVM task threads + Python UDF workers
    # + GC) to exactly `cpus` physical cores — without affinity a
    # local[8] run leaks its Python workers onto the other 24 cores and
    # the "small cluster" secretly runs on ~2x its nominal size,
    # corrupting the N vs 4N comparison
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.join(REPO, "scripts", "scaling_job.py")]
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stdout + out.stderr)
        raise RuntimeError(f"scaling_job failed at cpus={cpus}")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def hardware_ceiling(small_n: int, big_n: int) -> float:
    """Raw-CPU scaling control: the same pure-Python integer burn via
    multiprocessing, pinned like the Spark runs. On shared-memory VMs
    this ceiling is < 1.0 (a real N->4N cluster multiplies memory
    bandwidth and sockets; a thread-count change on one box does not).
    Normalizing the job efficiency by this isolates what the ENGINE
    loses from what the sandbox hardware cannot provide.
    """
    prog = (
        "from multiprocessing import Pool\n"
        "import sys, time\n"
        "def burn(_):\n"
        "    s = 0\n"
        "    for i in range(20_000_000): s += i * 3 + 7\n"
        "    return s\n"
        "n = int(sys.argv[1])\n"
        "t0 = time.time()\n"
        "with Pool(n) as p: p.map(burn, range(n * 2))\n"
        "print((n * 2) / (time.time() - t0))\n"
    )

    def rate(n: int) -> float:
        out = subprocess.run(
            ["taskset", "-c", f"0-{n - 1}", sys.executable, "-c", prog, str(n)],
            capture_output=True, text=True, timeout=600,
        )
        return float(out.stdout.strip().splitlines()[-1])

    return (rate(big_n) / rate(small_n)) / (big_n / small_n)


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("SCALING_DOCS", "40000000")
    )
    small_n, big_n = 8, 32

    # alternate the two levels across rounds so both sample the SAME
    # host window — this VM has noisy-neighbor episodes that would
    # otherwise bias whichever level ran during a bad minute; keep the
    # best round per level (the uncontended estimate)
    rounds = int(os.environ.get("SCALING_ROUNDS", "2"))
    small = big = None
    for _ in range(rounds):
        s = run_job(small_n, n_docs)
        b = run_job(big_n, n_docs)
        if small is None or s["wall_s"] < small["wall_s"]:
            small = s
        if big is None or b["wall_s"] < big["wall_s"]:
            big = b

    speedup = big["docs_per_sec"] / small["docs_per_sec"]
    efficiency = speedup / (big_n / small_n)
    ceiling = hardware_ceiling(small_n, big_n)

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
        "hardware_ceiling_efficiency": round(ceiling, 3),
        "normalized_efficiency": round(efficiency / ceiling, 3),
        "raw_small": small,
        "raw_big": big,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
