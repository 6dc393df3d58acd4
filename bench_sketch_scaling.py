#!/usr/bin/env python3
"""Scaling-efficiency evidence for the SKETCH family (same protocol as
bench_scaling.py / bench_graph_scaling.py: CPU-pinned local[2] vs
local[8] — the sandbox proxy for N vs 4N executors — interleaved
pairs, medians, E = speedup / 4).

Measures `hll_distinct` (the family's map-combined core: one codegen'd
hash + register pass, shuffle <= 2^p rows) over a parquet-materialized
synthetic column (SPARK_GRAFT_SKETCH_SOURCE=parquet: generated ONCE at
full width, untimed; every pinned invocation scans the same files).
Unlike pagerank (per-round shuffle + checkpoint, memory-bandwidth
bound on one box — see BENCH/BASELINE.md round-5 graph-scaling
analysis), a sketch pass is compute-dense per byte, so the pinned
protocol should be a fair proxy here. Pass iff E >= 0.8.

Results land in BENCH/results/sketch_scaling_<n>.json.

Env: SPARK_GRAFT_SKETCH_ROWS (default 100M here — half the guarantee
table's 200M to keep 6 pinned runs tractable), SPARK_GRAFT_SKETCH_DISTINCT
(default 25M), SPARK_GRAFT_SCALING_REPEATS (default 3 pairs),
SPARK_GRAFT_PIN=0 to disable taskset.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

ROWS = os.environ.get("SPARK_GRAFT_SKETCH_ROWS", "100000000")
DISTINCT = os.environ.get("SPARK_GRAFT_SKETCH_DISTINCT", "25000000")


OP = os.environ.get("SPARK_GRAFT_SKETCH_SCALING_OP", "hll")


def _env(cpus: int) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-tmp")
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SKETCH_OPS"] = OP
    env["SPARK_GRAFT_SKETCH_EXACT"] = "0"
    env["SPARK_GRAFT_SKETCH_SOURCE"] = "parquet"
    env["SPARK_GRAFT_SKETCH_ROWS"] = ROWS
    env["SPARK_GRAFT_SKETCH_DISTINCT"] = DISTINCT
    return env


def run_level(cpus: int) -> float:
    cmd = [sys.executable, os.path.join(HERE, "bench_sketch_scale.py")]
    if os.environ.get("SPARK_GRAFT_PIN", "1") != "0":
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, env=_env(cpus), capture_output=True, text=True, check=True
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return float(json.loads(line)["wall_sketch_s"])


def main() -> None:
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))
    # materialize the probe parquet at full width, unpinned + untimed
    subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_sketch_scale.py")],
        env={**_env(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))},
        capture_output=True, text=True, check=True,
    )
    lo, hi = [], []
    for i in range(repeats):
        lo.append(run_level(2))
        hi.append(run_level(8))
        print(f"pair {i + 1}: local[2]={lo[-1]}s local[8]={hi[-1]}s",
              file=sys.stderr)
    t_lo, t_hi = statistics.median(lo), statistics.median(hi)
    eff = (t_lo / t_hi) / 4.0
    result = {
        "op": {"hll": "hll_distinct", "quantiles": "approx_quantiles",
               "countmin": "countmin"}.get(OP, OP),
        "rows": int(ROWS),
        "distinct": int(DISTINCT),
        **({"p": 14} if OP == "hll" else {"k": 4096} if OP == "quantiles" else {}),
        "wall_local2_median_s": t_lo,
        "wall_local8_median_s": t_hi,
        "walls_local2": lo,
        "walls_local8": hi,
        "scaling_efficiency": round(eff, 3),
        "pass": eff >= 0.8,
        "pinned": os.environ.get("SPARK_GRAFT_PIN", "1") != "0",
        "interleaved": True,
    }
    os.makedirs(os.path.join(HERE, "BENCH", "results"), exist_ok=True)
    n = 1
    while os.path.exists(
        os.path.join(HERE, "BENCH", "results", f"sketch_scaling_{n:03d}.json")
    ):
        n += 1
    path = os.path.join(HERE, "BENCH", "results", f"sketch_scaling_{n:03d}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
