"""Triple emission (pipeline stage 6).

Reference semantics: the pair ``instances.tsv`` —
(source_id, target_id, ';;;'-joined sorted article set) grouped from
the per-doc pair stream (``prepare_pair_dataset.py:42-53``, written
``:66-68``) — plus the embedding-classifier gate (``README.md:6-11``).
The predicate is implied by the (source_type, target_type) role pair,
exactly as the reference's datasets are per type-pair (mutation-disease
etc.).

Spark shape: one hash aggregate on (subj, obj) for support, a broadcast
join to scores, a threshold filter. Output is written partitioned by
``pred`` and bucketed by ``hash(subj)`` at the Iceberg edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..fixtures import RELATION_PREDICATES


def predicate_for(source_type: str, target_type: str) -> str:
    return RELATION_PREDICATES.get(
        (source_type, target_type), f"co_{source_type}_{target_type}"
    )


def support_agg(pairs: DataFrame) -> DataFrame:
    """(doc_id, subj, obj) -> one row per (subj, obj) with sorted
    article set + distinct-doc support (prepare_pair_dataset.py:42-53).
    The ONLY shuffle of the pipeline tail — scoring is applied to this
    aggregate directly (it is already distinct on (subj, obj)), so no
    further join or exchange follows."""
    return pairs.groupBy("subj", "obj").agg(
        F.sort_array(F.collect_set("doc_id")).alias("articles"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


def emit_triples(
    scored_support: DataFrame,
    source_type: str,
    target_type: str,
    threshold: float = 0.0,
) -> DataFrame:
    """scored support rows -> TRIPLES rows (threshold gate + predicate)."""
    pred = predicate_for(source_type, target_type)
    return scored_support.where(
        F.coalesce(F.col("score"), F.lit(0.0)) >= threshold
    ).select(
        "subj",
        F.lit(pred).alias("pred"),
        "obj",
        "score",
        "articles",
        "n_docs",
    )
