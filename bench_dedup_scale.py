#!/usr/bin/env python3
"""Dedup-at-scale probe: minhash near-dup over the materialized bench
corpus used by the pipeline scaling runs (~200k x 1200-token synthetic
source files by default). Separate from bench.py because a full pass
is minutes, not seconds — run when the dedup hot path changes.

Prints ONE JSON line:
  {"op": ..., "docs": N, "pairs": N, "t_signatures_s": s, "t_full_s": s,
   "docs_per_sec": r, "hash_mode": ...}

Env knobs: SPARK_GRAFT_DEDUP_FILES (default 200000),
SPARK_GRAFT_DEDUP_HASH_MODE (default xxhash64), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bio_re_with_entity_embeddings_spark import fixtures  # noqa: E402
from bio_re_with_entity_embeddings_spark.deploy import ensure_shipped  # noqa: E402
from bio_re_with_entity_embeddings_spark.operators import dedup as DD  # noqa: E402
from bio_re_with_entity_embeddings_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_files = int(os.environ.get("SPARK_GRAFT_DEDUP_FILES", "200000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    hash_mode = os.environ.get("SPARK_GRAFT_DEDUP_HASH_MODE", "xxhash64")
    spark = get_spark(
        app_name="dedup-bench", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    ensure_shipped(spark)
    corpus_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".kgwork",
        f"bench_corpus_f{n_files}_t1200_d400x1200_s48",
    )
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        dictionary = fixtures.make_dictionary(n_pkg=400, n_fn=1200)
        fixtures.distributed_corpus_df(
            spark, n_files, dictionary, tokens_per_file=1200, partitions=64,
            surface_density=48,
        ).write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path).select(
        F.col("path").alias("doc_id"), F.col("content").alias("text")
    )
    t0 = time.perf_counter()
    DD.minhash_signatures(docs, "doc_id", "text", hash_mode=hash_mode).count()
    t_sig = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    pairs = DD.minhash_near_duplicates(
        docs, "doc_id", "text", threshold=0.5, hash_mode=hash_mode
    ).count()
    t_full = round(time.perf_counter() - t0, 1)
    print(
        json.dumps(
            {
                "op": "minhash_near_duplicates",
                "docs": n_files,
                "hash_mode": hash_mode,
                "pairs": pairs,
                "t_signatures_s": t_sig,
                "t_full_s": t_full,
                "docs_per_sec": round(n_files / t_full, 0),
                "master": f"local[{cpus}]",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
