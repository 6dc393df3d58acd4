#!/usr/bin/env python3
"""Dump .explain('formatted') for declared queries into a directory.

Usage:
    SPARK_GRAFT_SF_DIR=... python bench_dump_plans.py OUTDIR SUFFIX [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each named query (default: the
bench headline set + composed plans). Runs from either the current or
the round-start tree (only uses the stable contract surface).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bio_re_with_entity_embeddings_spark.deploy import ensure_shipped  # noqa: E402
from bio_re_with_entity_embeddings_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "text_winnowing",
    "dedup_minhash",
    "graph_pagerank",
    "kg_bgp_query",
    "kg_doc2entity",
    "kg_entity2doc",
    "kg_triples_support",
    "kg_triples_scored",
    "kg_pipeline",
    "curate_corpus",
    "kg_full",
]


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="kg-plan-dump", master=f"local[{cpus}]")
    ensure_shipped(spark)
    import __spark_entry__ as entrymod

    qs = {**entrymod.queries(), **entrymod.extra_queries()}

    def df_for(name):
        if name == "kg_pipeline":
            from bio_re_with_entity_embeddings_spark import fixtures
            from bio_re_with_entity_embeddings_spark.plans import pipeline as P

            dictionary = fixtures.make_dictionary(n_pkg=400, n_fn=1200)
            corpus = fixtures.distributed_corpus_df(
                spark, 5000, dictionary, tokens_per_file=1200, partitions=64,
                surface_density=48,
            )
            embeddings = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            cfg = P.PipelineConfig(repo_partitions=0, articles_cap=-1)
            return P.build_triples(spark, corpus, dictionary, embeddings, cfg)[
                "triples"
            ]
        if name == "curate_corpus":
            from bio_re_with_entity_embeddings_spark.contract_text import (
                _curate_split,
                _docs_with_near_dups,
            )
            from bio_re_with_entity_embeddings_spark.plans import curation as PC

            corp, bench_split = _curate_split(_docs_with_near_dups(spark, sf_dir))
            cfg = PC.CurationConfig(
                min_quality=0.55, decon_n=4, quota=2000, quota_max_group_rows=40_000
            )
            return PC.curate_corpus(spark, corp, benchmark=bench_split, config=cfg)[
                "corpus"
            ]
        if name == "kg_full":
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

            corp, bench_split = _curate_split(_docs_with_near_dups(spark, sf_dir))
            embeddings = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            ccfg = PC.CurationConfig(min_quality=0.55, decon_n=4, quota=0)
            pcfg = P.PipelineConfig(
                relations=[("op", "obj")],
                predicates={("op", "obj"): "acts_on"},
                threshold=-2.0,
            )
            return PF.curate_then_build(
                spark, _as_code_corpus(corp), _doc_dict_entries(), embeddings,
                benchmark=_as_code_corpus(bench_split), curation_config=ccfg,
                pipeline_config=pcfg, entities=_doc_dict_entities(spark),
                doc_key=F.col("repo"),
            )["triples"]
        if name == "dedup_minhash_prod":
            from bio_re_with_entity_embeddings_spark.contract_text import (
                _docs_with_dups,
            )
            from bio_re_with_entity_embeddings_spark.operators import dedup as DD

            return DD.minhash_near_duplicates(
                _docs_with_dups(spark, sf_dir), "doc_id", "text", threshold=0.5
            )
        return qs[name](spark, sf_dir)

    for name in names:
        try:
            txt = explain_str(df_for(name))
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR: {exc}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
