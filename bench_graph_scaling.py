#!/usr/bin/env python3
"""Scaling-efficiency evidence for the GRAPH family (same protocol as
bench_scaling.py: CPU-pinned local[2] vs local[8] — the sandbox proxy
for N vs 4N executors — interleaved pairs, medians, E = speedup / 4).

Measures `pagerank` (the family's iterative core: per round one
src-keyed join + one map-combined agg + the dangling-mass action)
over the materialized skewed 5M-edge probe graph. Pass iff E >= 0.8.

Results land in BENCH/results/graph_scaling_<n>.json.

Env: SPARK_GRAFT_GRAPH_NODES/EDGES (default 1M/5M),
SPARK_GRAFT_SCALING_REPEATS (default 3 pairs), SPARK_GRAFT_PIN=0 to
disable taskset.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_level(cpus: int) -> float:
    env = dict(os.environ)
    env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-tmp")
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_GRAPH_OPS"] = "pagerank"
    cmd = [sys.executable, os.path.join(HERE, "bench_graph_scale.py")]
    if os.environ.get("SPARK_GRAFT_PIN", "1") != "0":
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return float(json.loads(line)["wall_s"])


def main() -> None:
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))
    # ensure the probe graph parquet exists BEFORE any pinned level
    # runs (generation at full width, untimed)
    subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_graph_scale.py")],
        env={**os.environ, "SPARK_GRAFT_GRAPH_OPS": "degrees"},
        capture_output=True,
        text=True,
        check=True,
    )
    lo, hi = [], []
    for i in range(repeats):
        lo.append(run_level(2))
        hi.append(run_level(8))
        print(f"pair {i + 1}: local[2]={lo[-1]}s local[8]={hi[-1]}s", file=sys.stderr)
    t_lo, t_hi = statistics.median(lo), statistics.median(hi)
    eff = (t_lo / t_hi) / 4.0
    result = {
        "op": "pagerank",
        "encode_ids": os.environ.get("SPARK_GRAFT_PR_ENCODE", "0") == "1",
        "nodes": int(os.environ.get("SPARK_GRAFT_GRAPH_NODES", "1000000")),
        "edges": int(os.environ.get("SPARK_GRAFT_GRAPH_EDGES", "5000000")),
        "iterations": int(os.environ.get("SPARK_GRAFT_PR_ITERS", "5")),
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
        os.path.join(HERE, "BENCH", "results", f"graph_scaling_{n:03d}.json")
    ):
        n += 1
    path = os.path.join(HERE, "BENCH", "results", f"graph_scaling_{n:03d}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
