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
    contract_norm,
    contract_relational,
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(contract.ORACLES)
