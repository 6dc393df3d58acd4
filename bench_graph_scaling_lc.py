#!/usr/bin/env python3
"""Graph-family scaling under PROCESS-ISOLATED executors (VERDICT r5
task #1): the in-process local[2] vs local[8] proxy measured
E = 0.707 (r5) / 0.653 (r6 re-run) for pagerank and the open question
was whether a single shared JVM heap/GC + one memory controller is
the bottleneck rather than the operator. ``local-cluster[N,1,3072]``
forks N real worker JVMs (own heaps, own GC, real netty shuffle
between processes) on this box — the closest available proxy for N
executors; taskset-pins each level to N cores like bench_graph_scaling.

Protocol otherwise identical: interleaved pairs, medians,
E = (t_2 / t_8) / 4, pass iff E >= 0.8. Results land in
BENCH/results/graph_scaling_lc_<n>.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_level(n_workers: int) -> float:
    env = dict(os.environ)
    env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-tmp")
    env["SPARK_GRAFT_MASTER_OVERRIDE"] = f"local-cluster[{n_workers},1,3072]"
    env["SPARK_GRAFT_LC_WORKERS"] = str(n_workers)
    cmd = [sys.executable, os.path.join(HERE, "bench_graph_scaling_lc.py"), "child"]
    if os.environ.get("SPARK_GRAFT_PIN", "1") != "0":
        cmd = ["taskset", "-c", f"0-{n_workers - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return float(json.loads(line)["wall_s"])


def child() -> None:
    sys.path.insert(0, HERE)
    import time

    from bio_re_with_entity_embeddings_spark.deploy import ensure_shipped
    from bio_re_with_entity_embeddings_spark.operators import graph as G
    from bio_re_with_entity_embeddings_spark.session import get_spark

    n_workers = int(os.environ["SPARK_GRAFT_LC_WORKERS"])
    spark = get_spark(
        app_name=f"graph-lc-{n_workers}",
        master=os.environ["SPARK_GRAFT_MASTER_OVERRIDE"],
        shuffle_partitions=2 * n_workers,
    )
    ensure_shipped(spark)
    n_nodes = int(os.environ.get("SPARK_GRAFT_GRAPH_NODES", "1000000"))
    n_edges = int(os.environ.get("SPARK_GRAFT_GRAPH_EDGES", "5000000"))
    work = os.path.join(HERE, ".kgwork", f"bench_graph_v{n_nodes}_e{n_edges}")
    edges = spark.read.parquet(work)
    # warm (codegen/shuffle infra), then timed
    G.pagerank(edges, iterations=2).count()
    t0 = time.perf_counter()
    ranks = G.pagerank(edges, iterations=5)
    n = ranks.count()
    wall = round(time.perf_counter() - t0, 1)
    print(json.dumps({"wall_s": wall, "rows": n}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child()
        return
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))
    lo, hi = [], []
    for i in range(repeats):
        lo.append(run_level(2))
        hi.append(run_level(8))
        print(
            f"pair {i + 1}: lc[2]={lo[-1]}s lc[8]={hi[-1]}s", file=sys.stderr
        )
    t_lo, t_hi = statistics.median(lo), statistics.median(hi)
    eff = round((t_lo / t_hi) / 4.0, 3)
    result = {
        "op": "pagerank",
        "protocol": "local-cluster[N,1,3072] process-isolated workers, pinned to N cores",
        "nodes": int(os.environ.get("SPARK_GRAFT_GRAPH_NODES", "1000000")),
        "edges": int(os.environ.get("SPARK_GRAFT_GRAPH_EDGES", "5000000")),
        "iterations": 5,
        "wall_lc2_median_s": t_lo,
        "wall_lc8_median_s": t_hi,
        "walls_lc2": lo,
        "walls_lc8": hi,
        "scaling_efficiency": eff,
        "pass": eff >= 0.8,
        "interleaved": True,
    }
    os.makedirs(os.path.join(HERE, "BENCH", "results"), exist_ok=True)
    n = 1
    while os.path.exists(
        os.path.join(HERE, "BENCH", "results", f"graph_scaling_lc_{n:03d}.json")
    ):
        n += 1
    path = os.path.join(HERE, "BENCH", "results", f"graph_scaling_lc_{n:03d}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
