#!/usr/bin/env python3
"""Round-6 optimization profiler (guide section 1: measure first).

NOT part of the frozen measurement harness (bench.py is untouched);
this file exists to (a) isolate each expensive declared query with the
noop sink so the computation is timed without the sink, (b) time
internal stages of the multi-stage queries (signatures / banding /
candidates / verify; detector / pairs / scoring), and (c) dump
``explain('formatted')`` plans into plans/r06/.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [target ...]

Targets: winnow minhash pagerank bgp pipeline curate full headline
(defaults to all). Prints one JSON line per timing.
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
from bio_re_with_entity_embeddings_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, repeats=2):
    walls = []
    for _ in range(repeats):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn()
        walls.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"probe": name, "walls": walls, "min": min(walls)}), flush=True)
    return min(walls)


def dump_plan(df, name):
    os.makedirs(PLAN_DIR, exist_ok=True)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(PLAN_DIR, name), "w") as f:
        f.write(txt)


def main() -> None:
    targets = set(sys.argv[1:]) or {
        "winnow", "minhash", "pagerank", "bgp", "pipeline", "curate", "headline"
    }
    spark = get_spark(app_name="kg-bench-extra", master=f"local[{CPUS}]")
    ensure_shipped(spark)
    import __spark_entry__ as entrymod

    qs = {**entrymod.queries(), **entrymod.extra_queries()}

    if "winnow" in targets:
        noop(qs["text_winnowing"](spark, SF_DIR))  # warm
        timed(spark, "winnow: full", lambda: noop(qs["text_winnowing"](spark, SF_DIR)))
        from bio_re_with_entity_embeddings_spark.contract import _load

        d = _load(spark, SF_DIR, "documents")
        norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        grams = (
            d.select(F.col("doc_id").cast("string").alias("doc"), norm.alias("_t"))
            .where(F.length("_t") >= 5)
            .select(
                "doc", "_t",
                F.explode(F.sequence(F.lit(1), F.length("_t") - 4)).alias("pos"),
            )
            .select(
                "doc", "pos",
                F.md5(F.substring(F.col("_t"), F.col("pos"), F.lit(5))).alias("h"),
            )
        )
        timed(spark, "winnow: grams+md5 only", lambda: noop(grams))

    if "minhash" in targets:
        from bio_re_with_entity_embeddings_spark.contract_text import _docs_with_dups
        from bio_re_with_entity_embeddings_spark.operators import dedup as DD

        noop(qs["dedup_minhash"](spark, SF_DIR))  # warm
        timed(spark, "minhash_md5: full", lambda: noop(qs["dedup_minhash"](spark, SF_DIR)))

        docs = _docs_with_dups(spark, SF_DIR)
        from bio_re_with_entity_embeddings_spark.functions.text import shingles

        sh_tbl = docs.select(
            F.col("doc_id").cast("string").alias("doc"), shingles("text").alias("sh")
        )
        timed(spark, "minhash_md5: shingle arrays", lambda: noop(sh_tbl))
        sig = DD.minhash_signatures(docs, "doc_id", "text", 32, "md5")
        timed(spark, "minhash_md5: signatures", lambda: noop(sig))

        # banded + gate + candidates
        def cand_count():
            out = DD.minhash_near_duplicates(
                docs, "doc_id", "text", threshold=2.0, hash_mode="md5"
            )
            noop(out)

        timed(spark, "minhash_md5: thresh2 (cand+verify, empty out)", cand_count)
        timed(
            spark,
            "minhash_prod: full",
            lambda: noop(
                DD.minhash_near_duplicates(docs, "doc_id", "text", threshold=0.5)
            ),
        )

    if "pagerank" in targets:
        from bio_re_with_entity_embeddings_spark.contract_graph import _bipartite_edges
        from bio_re_with_entity_embeddings_spark.operators import graph as G

        noop(qs["graph_pagerank"](spark, SF_DIR))  # warm
        timed(spark, "pagerank: full", lambda: noop(qs["graph_pagerank"](spark, SF_DIR)))
        timed(spark, "pagerank: edges only", lambda: noop(_bipartite_edges(spark, SF_DIR)))

    if "bgp" in targets:
        noop(qs["kg_bgp_query"](spark, SF_DIR))  # warm
        timed(spark, "bgp: full", lambda: noop(qs["kg_bgp_query"](spark, SF_DIR)))
        from bio_re_with_entity_embeddings_spark.contract_graph import _kg_triples

        timed(spark, "bgp: kg base only", lambda: noop(_kg_triples(spark, SF_DIR)))

    if "pipeline" in targets:
        from bio_re_with_entity_embeddings_spark.plans import pipeline as P

        sf = fixtures.sf_from_dir(SF_DIR)
        n_files = int(fixtures.n_files_for_sf(sf))
        dictionary = fixtures.make_dictionary(n_pkg=400, n_fn=1200)
        corpus_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".kgwork",
            f"bench_corpus_f{n_files}_t1200_d400x1200_s48",
        )
        if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
            fixtures.distributed_corpus_df(
                spark, n_files, dictionary, tokens_per_file=1200,
                partitions=64, surface_density=48,
            ).write.mode("overwrite").parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        cfg = P.PipelineConfig(repo_partitions=0, articles_cap=-1)

        def full_pipe():
            out = P.build_triples(spark, corpus, dictionary, embeddings, cfg)
            out["triples"].count()
            spark.catalog.clearCache()

        full_pipe()  # warm
        timed(spark, "pipeline: full", full_pipe, repeats=3)

        # detector alone
        from bio_re_with_entity_embeddings_spark.operators import mentions as MOP

        ids = sorted(e.entity_id for e in dictionary)
        entity_idx = {eid: i + 1 for i, eid in enumerate(ids)}
        docs = P.ingest(corpus)
        arrs = MOP.detect_entity_arrays(
            docs, [(e.surface, e.entity_id, e.entity_type) for e in dictionary],
            entity_idx,
        )
        timed(spark, "pipeline: detector only", lambda: noop(arrs), repeats=3)
        timed(spark, "pipeline: ingest scan only", lambda: noop(docs.select("doc_id", "content")), repeats=3)

    if "curate" in targets:
        from bio_re_with_entity_embeddings_spark.contract_text import (
            _curate_split,
            _docs_with_near_dups,
        )
        from bio_re_with_entity_embeddings_spark.plans import curation as PC

        def run_curation():
            corp, bench_split = _curate_split(_docs_with_near_dups(spark, SF_DIR))
            cur_cfg = PC.CurationConfig(
                min_quality=0.55, decon_n=4, quota=2000, quota_max_group_rows=40_000
            )
            PC.curate_corpus(spark, corp, benchmark=bench_split, config=cur_cfg)[
                "corpus"
            ].count()
            spark.catalog.clearCache()

        run_curation()  # warm
        timed(spark, "curate: full", run_curation, repeats=3)

    if "headline" in targets:
        for name in ("kg_triples_scored", "sim_ann_lsh", "sim_ivf", "kg_doc2entity",
                     "curate_decontaminate", "dedup_exact", "sim_topk_matmul"):
            noop(qs[name](spark, SF_DIR))
            timed(spark, f"headline: {name}", lambda n=name: noop(qs[n](spark, SF_DIR)))

    spark.stop()


if __name__ == "__main__":
    main()
