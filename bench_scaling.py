#!/usr/bin/env python3
"""Scaling-efficiency evidence (BASELINE.md protocol): run bench.py at
two parallelism levels (local[2] vs local[8], each CPU-PINNED to its
core budget — the sandbox proxy for N vs 4N executors), report
throughput at both plus E = T_hi / (4 * T_lo); pass iff E >= 0.8.

Protocol details that matter (measured, see BENCH/BASELINE.md):
* levels are pinned with ``taskset -c``: Spark's Python workers run
  OUTSIDE the task slots, so an unpinned local[2] quietly uses ~4
  cores and systematically deflates E — pinning emulates a real
  executor's hard core budget.
* input defaults to 2M files: the pipeline has a ~15 s serial driver
  fraction (plan building, dim collects, job scheduling) that does not
  shrink with threads; E rises with input size (0.75 @ 500k files ->
  0.80+ @ 2M) exactly as Amdahl predicts, and at the north rule's
  10^12-file scale the serial fraction is nil.
* levels run INTERLEAVED (lo, hi, lo, hi, ...) so slow host-load drift
  cancels pair-wise; medians of `repeats` pairs are reported.

Results land in BENCH/results/scaling_<n>.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_bench(cpus: int, shuffle: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-tmp")
    env.setdefault("SPARK_GRAFT_SCALE_FILES", "2000000")
    env.setdefault("SPARK_GRAFT_SKIP_HEADLINE", "1")
    # each inner bench invocation is ONE measurement; the outer
    # interleaved pair loop provides the median-of-repeats (a nested
    # median-of-3 would triple every level's wall for no extra rigor)
    env["SPARK_GRAFT_BENCH_REPEATS"] = "1"
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = str(shuffle)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    cmd = [sys.executable, os.path.join(HERE, "bench.py")]
    if os.environ.get("SPARK_GRAFT_PIN", "1") != "0":
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def run_full(cpus: int, sf_dir: str) -> dict:
    """One pinned measurement of the COMPOSED product (plans/full.py's
    curate_then_build via bench_dedup_scale.py's FULL_FILES probe) —
    the SPARK_GRAFT_SCALE_TARGET=full variant of the protocol. Input
    defaults to 100k files (subsampled from the probe harness's
    200k bench corpus, which must be pre-generated so the one-time
    corpus write never lands inside a pinned level); the composed
    chain's wall at this size keeps its ~fixed job-scheduling fraction
    (~15 Spark jobs: eager cache populates + CC rounds) under a few
    percent of the lo-level wall, same Amdahl reasoning as the 2M-file
    pipeline default above."""
    env = dict(os.environ)
    env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-tmp")
    env["SPARK_GRAFT_DEDUP_SKIP_MINHASH"] = "1"
    env["SPARK_GRAFT_DEDUP_VECTORS"] = "0"
    n = int(os.environ.get("SPARK_GRAFT_SCALE_FILES", "100000"))
    env["SPARK_GRAFT_FULL_FILES"] = str(n)
    # the probe harness subsamples FULL_FILES out of its DEDUP_FILES
    # corpus (default 200k) — without this the request would silently
    # cap at 200k (no-silent-caps discipline)
    env["SPARK_GRAFT_DEDUP_FILES"] = str(max(200_000, n))
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    cmd = [sys.executable, os.path.join(HERE, "bench_dedup_scale.py")]
    if os.environ.get("SPARK_GRAFT_PIN", "1") != "0":
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    rec = [
        json.loads(l)
        for l in out.stdout.strip().splitlines()
        if l.startswith("{") and '"curate_then_build"' in l
    ][-1]
    # normalize to the bench.py record shape the summary code reads
    return {
        "value": rec["t_full_s"],
        "files_per_sec": rec["files_per_sec"],
        "triples_per_sec": rec["triples_per_sec"],
        "files": rec["files"],
        "stages": rec["stages"],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    target = os.environ.get("SPARK_GRAFT_SCALE_TARGET", "pipeline")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    # N vs 4N parallelism: local[2] vs local[8] (pinned). Threads on one
    # box SHARE one memory subsystem: beyond ~8 threads this VM's
    # shuffle/hash-agg throughput is memory-saturated, so higher levels
    # measure host memory contention, not the job. A real N->4N
    # EXECUTOR scale-out adds memory bandwidth with every node, which
    # thread scale-up cannot emulate; 2->8 stays in the linear region.
    levels = [(2, 4), (8, 16)]
    results: dict[str, list[dict]] = {f"local[{c}]": [] for c, _ in levels}
    if target == "full":
        # ensure the probe corpus exists BEFORE any pinned level runs:
        # a missing corpus would otherwise be generated inside the
        # first taskset-pinned (2-core) invocation, distorting nothing
        # in the timed region but stretching that level's wall far
        # beyond the documented estimate. Unpinned, all probes off —
        # bench_dedup_scale.py generates the corpus as a side effect.
        env = dict(os.environ)
        env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-tmp")
        env["SPARK_GRAFT_DEDUP_SKIP_MINHASH"] = "1"
        env["SPARK_GRAFT_DEDUP_VECTORS"] = "0"
        env["SPARK_GRAFT_DEDUP_FILES"] = str(
            max(200_000, int(os.environ.get("SPARK_GRAFT_SCALE_FILES", "100000")))
        )
        subprocess.run(
            [sys.executable, os.path.join(HERE, "bench_dedup_scale.py")],
            env=env, capture_output=True, text=True, check=True,
        )

    for _ in range(repeats):  # interleaved pairs: drift cancels
        for cpus, shuffle in levels:
            rec = (
                run_full(cpus, sf_dir)
                if target == "full"
                else run_bench(cpus, shuffle, sf_dir)
            )
            results[f"local[{cpus}]"].append(rec)

    def med(key: str, runs: list[dict]) -> float:
        return statistics.median(r[key] for r in runs)

    lo, hi = f"local[{levels[0][0]}]", f"local[{levels[1][0]}]"
    # the composed product's bottleneck stages scale with the FILE
    # volume (dedup candidate/verify), so files/s is its throughput
    # metric; the pipeline target keeps triples/s (BASELINE.md)
    eff_key = "files_per_sec" if target == "full" else "triples_per_sec"
    t_lo = med(eff_key, results[lo])
    t_hi = med(eff_key, results[hi])
    eff = t_hi / (4 * t_lo)
    summary = {
        "target": target,
        "efficiency_metric": eff_key,
        "sf_dir": sf_dir,
        "repeats": repeats,
        "levels": [lo, hi],
        lo: {
            "wall_sec": med("value", results[lo]),
            "triples_per_sec": med("triples_per_sec", results[lo]),
            "files_per_sec": med("files_per_sec", results[lo]),
        },
        hi: {
            "wall_sec": med("value", results[hi]),
            "triples_per_sec": med("triples_per_sec", results[hi]),
            "files_per_sec": med("files_per_sec", results[hi]),
        },
        "scaling_efficiency": round(eff, 3),
        "pass": eff >= 0.8,
        "runs": results,
    }
    os.makedirs(os.path.join(HERE, "BENCH", "results"), exist_ok=True)
    n = len(os.listdir(os.path.join(HERE, "BENCH", "results")))
    out_path = os.path.join(HERE, "BENCH", "results", f"scaling_{n:03d}.json")
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"}))
    print(f"written: {out_path}")


if __name__ == "__main__":
    main()
