"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose the operator inventory
(SURVEY.md section 2) as (PySpark fn, DuckDB SQL) pairs — defined in
``bio_re_with_entity_embeddings_spark/contract*.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from bio_re_with_entity_embeddings_spark import contract  # noqa: E402
from bio_re_with_entity_embeddings_spark import (  # noqa: E402,F401 (register side effects)
    contract_graph,
    contract_norm,
    contract_relational,
    contract_sketch,
    contract_text,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline (trie mentions -> co-occurrence pairs
    -> embedding scoring -> triples) on the sf0.001 fixture corpus with
    /root/testdata/sf0.001 embeddings."""
    from bio_re_with_entity_embeddings_spark import fixtures
    from bio_re_with_entity_embeddings_spark.deploy import ensure_shipped
    from bio_re_with_entity_embeddings_spark.plans import pipeline

    ensure_shipped(spark)
    dictionary = fixtures.make_dictionary()
    corpus = fixtures.corpus_df(spark, 0.001, dictionary)
    embeddings = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = pipeline.build_triples(spark, corpus, dictionary, embeddings)
    return out["triples"]


# Explicit driver-facing order (the driver checks registrations in
# order; the end-to-end pipeline oracles are the strongest correctness
# signal, so they lead).  Must enumerate every contract.QUERIES key —
# _ordered() asserts the two sets match so a new registration can't
# silently fall outside the checked window.
QUERY_ORDER: list[str] = [
    # end-to-end pipeline (reference sections 3.1-3.2) + the composed
    # curation->KG product (plans/full.py)
    "kg_pipeline_triples",
    "kg_pipeline_canonical",
    "kg_full_curated",
    # stage-by-stage KG dataflow
    "kg_mentions",
    "kg_doc2entity",
    "kg_entity2doc",
    "kg_pairs",
    "kg_doc2pairs",
    "kg_triples_support",
    "kg_triples_scored",
    "kg_semi_join_docs",
    "kg_doc2vec_input",
    "kg_entity_type_counts",
    # similarity search + multimodal
    "sim_topk_cosine",
    "sim_topk_matmul",
    "sim_ann_lsh",
    "sim_ivf",
    "mm_image_dims",
    # graph analytics + BGP read path over the materialized KG
    # (operators/graph.py, operators/kgquery.py)
    "graph_pagerank",
    "graph_triangles",
    "kg_bgp_query",
    # dedup family
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding",
    # curation + text analysis
    "curate_corpus",
    "curate_quota_sample",
    "curate_decontaminate",
    "text_stats",
    "text_tokens_bpe",
    "text_winnowing",
    "text_quality",
    "text_langid",
    "text_repetition",
    "text_pii",
    # normalizers + ontology
    "norm_default",
    "norm_chemical",
    "norm_drug",
    "norm_disease",
    "norm_disease_doid",
    "norm_gene",
    "norm_mutation",
    "norm_hgvs_doid",
    "obo_ontology",
    # relational inventory (non-redundant subset; the rest are in
    # extra_queries(), oracle-checked by tests/test_oracle_parity.py)
    "rel_filter_project",
    "rel_agg_groupby",
    "rel_distinct_sort",
    "events_hourly_rollup",
    "events_sessionize",
]


def _ordered(mapping: dict) -> dict:
    missing = set(contract.QUERIES) - set(QUERY_ORDER)
    extra = set(QUERY_ORDER) - set(contract.QUERIES)
    if missing or extra:
        raise RuntimeError(
            f"QUERY_ORDER out of sync: missing={sorted(missing)} extra={sorted(extra)}"
        )
    return {k: mapping[k] for k in QUERY_ORDER if k in mapping}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(contract.ORACLES)


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Overflow queries beyond the driver's 50-row correctness window;
    same contract, checked locally by tests/test_oracle_parity.py."""
    return dict(contract.EXTRA_QUERIES)


def extra_oracle_sql() -> dict[str, str]:
    return dict(contract.EXTRA_ORACLES)
