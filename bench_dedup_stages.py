#!/usr/bin/env python3
"""VERDICT r5 #4: stage-split the minhash wall at volume — signatures
/ gram-array build / banded candidate generation / full (verify) — so
the superlinear term has a name. Prints one JSON line per stage.

Usage: SPARK_GRAFT_DEDUP_FILES=2000000 python bench_dedup_stages.py
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
from bio_re_with_entity_embeddings_spark.operators.curation import (  # noqa: E402
    _exploded_grams,
)
from bio_re_with_entity_embeddings_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_files = int(os.environ.get("SPARK_GRAFT_DEDUP_FILES", "2000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="dedup-stages", master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    ensure_shipped(spark)
    corpus_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".kgwork",
        f"bench_corpus_f{n_files}_t1200_d400x1200_s48",
    )
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        dictionary = fixtures.make_dictionary(n_pkg=400, n_fn=1200)
        fixtures.distributed_corpus_df(
            spark, n_files, dictionary, tokens_per_file=1200, partitions=128,
            surface_density=48,
        ).write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path).select(
        F.col("path").alias("doc_id"), F.col("content").alias("text")
    )

    out = {"docs": n_files, "master": f"local[{cpus}]"}

    def stage(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        r = fn()
        out[name] = round(time.perf_counter() - t0, 1)
        out[f"{name}_rows"] = r
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: out[name], "rows": r}), flush=True)

    # 1. signatures only (explode + 32 min-agg columns)
    stage(
        "t_signatures",
        lambda: DD.minhash_signatures(docs, "doc_id", "text").count(),
    )
    # 2. verify-side gram-hash arrays only
    stage(
        "t_gram_arrays",
        lambda: (
            _exploded_grams(docs, "doc_id", "text", 3)
            .select("doc", F.xxhash64("g").alias("gh"))
            .groupBy("doc")
            .agg(F.sort_array(F.collect_set("gh")).alias("sh"))
            .count()
        ),
    )
    # 3. banded candidate pairs (distinct), no verify
    def cand():
        sig = DD.minhash_signatures(docs, "doc_id", "text")
        rows_per_band = 32 // 8

        def band_key(b):
            cols = [
                F.col(f"h{i}")
                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
            ]
            return F.xxhash64(*cols, F.lit(b))

        from pyspark.sql import Window

        banded = sig.select(
            "doc",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"), band_key(b).alias("bucket")
                        )
                        for b in range(8)
                    ]
                )
            ).alias("bb"),
        ).select(
            "doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
        )
        w = Window.partitionBy("band", "bucket")
        banded = (
            banded.withColumn("_bsz", F.count(F.lit(1)).over(w))
            .where(F.col("_bsz") <= 2000)
            .drop("_bsz")
        )
        return (
            banded.alias("x")
            .join(banded.alias("y"), ["band", "bucket"], "inner")
            .where(F.col("x.doc") < F.col("y.doc"))
            .select(F.col("x.doc").alias("a"), F.col("y.doc").alias("b"))
            .distinct()
            .count()
        )

    stage("t_candidates", cand)
    # 4. full (candidates + sort-merge array joins + jaccard verify)
    stage(
        "t_full",
        lambda: DD.minhash_near_duplicates(
            docs, "doc_id", "text", threshold=0.5
        ).count(),
    )
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
