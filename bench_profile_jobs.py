#!/usr/bin/env python3
"""Job-level profiler: run one composed target and print every Spark
job's wall + the inter-job driver gaps (the composed chains are
job-count-dominated at bench scale — this shows where the seconds go).

Usage: SPARK_GRAFT_SF_DIR=... python bench_profile_jobs.py curate|full|pagerank|bgp|pipeline|minhash
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bio_re_with_entity_embeddings_spark import fixtures  # noqa: E402
from bio_re_with_entity_embeddings_spark.deploy import ensure_shipped  # noqa: E402
from bio_re_with_entity_embeddings_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/sfdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    target = sys.argv[1]
    spark = get_spark(
        app_name=f"kg-profile-{target}",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    ensure_shipped(spark)
    import __spark_entry__ as entrymod

    qs = {**entrymod.queries(), **entrymod.extra_queries()}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run_curate():
        from bio_re_with_entity_embeddings_spark.contract_text import (
            _curate_split,
            _docs_with_near_dups,
        )
        from bio_re_with_entity_embeddings_spark.plans import curation as PC

        corp, bench_split = _curate_split(_docs_with_near_dups(spark, SF_DIR))
        cfg = PC.CurationConfig(
            min_quality=0.55, decon_n=4, quota=2000, quota_max_group_rows=40_000
        )
        PC.curate_corpus(spark, corp, benchmark=bench_split, config=cfg)[
            "corpus"
        ].count()
        spark.catalog.clearCache()

    def run_full():
        from bio_re_with_entity_embeddings_spark.contract_text import (
            _as_code_corpus,
            _curate_split,
            _doc_dict_entities,
            _doc_dict_entries,
            _docs_with_near_dups,
        )
        from bio_re_with_entity_embeddings_spark.plans import curation as PC
        from bio_re_with_entity_embeddings_spark.plans import full as PF
        from bio_re_with_entity_embeddings_spark.plans import pipeline as P

        corp, bench_split = _curate_split(_docs_with_near_dups(spark, SF_DIR))
        embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        ccfg = PC.CurationConfig(min_quality=0.55, decon_n=4, quota=0)
        pcfg = P.PipelineConfig(
            relations=[("op", "obj")],
            predicates={("op", "obj"): "acts_on"},
            threshold=-2.0,
        )
        PF.curate_then_build(
            spark, _as_code_corpus(corp), _doc_dict_entries(), embeddings,
            benchmark=_as_code_corpus(bench_split), curation_config=ccfg,
            pipeline_config=pcfg, entities=_doc_dict_entities(spark),
            doc_key=F.col("repo"),
        )["triples"].count()
        spark.catalog.clearCache()

    def run_pipeline():
        from bio_re_with_entity_embeddings_spark.plans import pipeline as P

        sf = fixtures.sf_from_dir(SF_DIR)
        n_files = int(fixtures.n_files_for_sf(sf))
        dictionary = fixtures.make_dictionary(n_pkg=400, n_fn=1200)
        corpus_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".kgwork",
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
        P.build_triples(spark, corpus, dictionary, embeddings, cfg)[
            "triples"
        ].count()
        spark.catalog.clearCache()

    runs = {
        "curate": run_curate,
        "full": run_full,
        "pipeline": run_pipeline,
        "pagerank": lambda: noop(qs["graph_pagerank"](spark, SF_DIR)),
        "bgp": lambda: noop(qs["kg_bgp_query"](spark, SF_DIR)),
        "minhash": lambda: noop(qs["dedup_minhash"](spark, SF_DIR)),
        "scored": lambda: noop(qs["kg_triples_scored"](spark, SF_DIR)),
    }
    fn = runs[target]
    fn()  # warm
    time.sleep(1.0)
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    jobs0 = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs")
    )
    first_new = max((j["jobId"] for j in jobs0), default=-1) + 1
    t0 = time.perf_counter()
    fn()
    wall = time.perf_counter() - t0
    jobs = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs"))
    jobs = sorted(
        (j for j in jobs if j["jobId"] >= first_new), key=lambda j: j["jobId"]
    )

    def ts(s):
        from datetime import datetime

        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%fGMT").timestamp()

    print(f"== {target}: wall {wall:.2f}s, {len(jobs)} jobs ==")
    prev_end = None
    total_job = 0.0
    total_gap = 0.0
    for j in jobs:
        st, en = ts(j["submissionTime"]), ts(j["completionTime"])
        dur = en - st
        gap = (st - prev_end) if prev_end is not None else 0.0
        total_job += dur
        total_gap += max(0.0, gap)
        desc = (j.get("description") or j["name"])[:90]
        print(f"job {j['jobId']:>4} dur {dur:6.2f}s gap {gap:6.2f}s  {desc}")
        prev_end = max(prev_end or en, en)
    print(
        f"== sum(job)={total_job:.2f}s sum(gap)={total_gap:.2f}s wall={wall:.2f}s =="
    )
    spark.stop()


if __name__ == "__main__":
    main()
