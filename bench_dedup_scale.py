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


def synth_embeddings(spark, n: int, dim: int = 64, dup_every: int = 100):
    """Deterministic synthetic embedding table: component j of vector i
    is pmod(xxhash64(i, j), 2000001)/1e6 - 1 in [-1, 1] — codegen'd,
    seed-free, partition-layout independent. Every ``dup_every``-th id
    also gets a near-duplicate twin (same components * 1.000001) with
    id offset n, so recall has ground truth."""
    base = spark.range(n).select(F.col("id").cast("int").alias("vec_id"))
    vec = F.array(
        *[
            (
                F.pmod(F.xxhash64("vec_id", F.lit(j)), F.lit(2000001))
                / F.lit(1000000.0)
                - F.lit(1.0)
            ).cast("float")
            for j in range(dim)
        ]
    )
    orig = base.select("vec_id", vec.alias("embedding"))
    twins = (
        base.where(F.col("vec_id") % dup_every == 0)
        .select((F.col("vec_id") + n).cast("int").alias("tid"), "vec_id")
        .select(
            F.col("tid").alias("out_id"),
            F.transform(vec, lambda x: x * F.lit(1.000001)).alias("embedding"),
        )
        .select(F.col("out_id").alias("vec_id"), "embedding")
    )
    return orig.unionByName(twins)


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

    n_vec = int(os.environ.get("SPARK_GRAFT_DEDUP_VECTORS", "500000"))
    if n_vec > 0:
        vecs = synth_embeddings(spark, n_vec)
        n_total = n_vec + n_vec // 100
        planted = n_vec // 100
        t0 = time.perf_counter()
        epairs = DD.embedding_near_duplicates(
            vecs, threshold=0.99, n_vectors=n_total
        )
        # one pass: total pairs + recall over planted twins (i, i+n)
        row = epairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("id_b") - F.col("id_a") == n_vec)
                    & (F.col("id_a") % 100 == 0),
                    1,
                ).otherwise(0)
            ).alias("hits"),
        ).collect()[0]
        total_pairs, hits = int(row["n"]), int(row["hits"] or 0)
        t_vec = round(time.perf_counter() - t0, 1)
        print(
            json.dumps(
                {
                    "op": "embedding_near_duplicates",
                    "vectors": n_total,
                    "dim": 64,
                    "pairs": total_pairs,
                    "planted": planted,
                    "planted_recalled": hits,
                    "t_full_s": t_vec,
                    "vectors_per_sec": round(n_total / t_vec, 0),
                    "master": f"local[{cpus}]",
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
