#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship measurement is the full KG pipeline (distributed corpus
generation -> trie mentions -> pair join -> scoring -> triples) with
throughput reported as triples/sec and files/sec. Scaling-efficiency
runs (local[8] vs local[32]) are driven by bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bio_re_with_entity_embeddings_spark import fixtures  # noqa: E402
from bio_re_with_entity_embeddings_spark.deploy import ensure_shipped  # noqa: E402
from bio_re_with_entity_embeddings_spark.plans import pipeline  # noqa: E402
from bio_re_with_entity_embeddings_spark.session import get_spark  # noqa: E402

# Representative per-operator headline queries from the driver contract.
HEADLINE_QUERIES = [
    "kg_triples_scored",
    "kg_doc2entity",
    "rel_agg_groupby",
    "rel_topk_window",
    "rel_broadcast_join",
    "dedup_minhash",
    "dedup_exact",
    "sim_topk_matmul",
    "text_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = fixtures.sf_from_dir(sf_dir)
    n_files = fixtures.n_files_for_sf(sf)
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", 2 * cpus))

    spark = get_spark(
        app_name="kg-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
    )
    ensure_shipped(spark)

    import __spark_entry__ as entrymod

    timings: dict[str, float] = {}

    # Flagship: full pipeline on executor-side-generated corpus.
    dictionary = fixtures.make_dictionary()
    corpus = fixtures.distributed_corpus_df(
        spark, n_files, dictionary, partitions=max(cpus * 2, 8)
    )
    embeddings = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cfg = pipeline.PipelineConfig(repo_partitions=0)

    # Warm-up (JIT/codegen/Python workers), then timed run.
    out = pipeline.build_triples(spark, corpus, dictionary, embeddings, cfg)
    out["triples"].count()
    t0 = time.perf_counter()
    out = pipeline.build_triples(spark, corpus, dictionary, embeddings, cfg)
    n_triples = out["triples"].count()
    wall = time.perf_counter() - t0
    timings["kg_pipeline"] = round(wall, 3)

    qs = entrymod.queries()
    for name in HEADLINE_QUERIES:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "kg_pipeline_wall",
        "value": timings["kg_pipeline"],
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "master": f"local[{cpus}]",
        "shuffle_partitions": shuffle,
        "files": n_files,
        "triples": n_triples,
        "triples_per_sec": round(n_triples / timings["kg_pipeline"], 1),
        "files_per_sec": round(n_files / timings["kg_pipeline"], 1),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
