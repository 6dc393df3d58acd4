"""Co-occurrence index aggregations (pipeline stage 3).

Reference semantics: streaming dict accumulation into ``pubmed2entity``
and ``entity2pubmed`` (``data/pubtator.py:384-409``) and the pair
mirrors (``prepare_pair_dataset.py:37-53``). In Spark each becomes a
single hash aggregate with map-side partial aggregation for free:
``groupBy(...).agg(collect_set(...))``. Sets are typed arrays, sorted
for determinism (the reference sorts at export, ``prepare_entity_dataset.py:76-81``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_to_entities(mentions: DataFrame) -> DataFrame:
    """pubmed2entity analog: doc -> sorted distinct entity ids (A1)."""
    return mentions.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("entity_id")).alias("entity_ids")
    )


def entity_to_docs(mentions: DataFrame) -> DataFrame:
    """entity2pubmed / instances analog: entity -> supporting docs (A2)."""
    return mentions.groupBy("entity_id").agg(
        F.sort_array(F.collect_set("doc_id")).alias("articles"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


def doc_to_pairs(pairs: DataFrame) -> DataFrame:
    """pubmed2pairs analog (A4): doc -> sorted distinct 'subj##obj' keys.

    The ``##`` pair-key encoding is the reference's export format
    (prepare_pair_dataset.py:37-39); internal tables keep (subj, obj)
    as typed columns.
    """
    return pairs.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_set(F.concat(F.col("subj"), F.lit("##"), F.col("obj")))
        ).alias("pair_keys")
    )
