"""End-to-end KG-construction plan (SURVEY.md section 7.0).

The reference's three CLI entry points (``prepare_entity_dataset.py``,
``prepare_pair_dataset.py``, ``learn_embeddings.py``) are fixed eager
DAGs with filesystem materialization between stages. Here the whole
dataflow is one lazy DataFrame plan per output; Catalyst prunes,
pushes down, and reorders. Stage boundaries only materialize when the
checkpointed/resumable runner (plans/manifest.py) is used.

Scale shape:
  corpus --repartition(hash(repo))--> ingest (native exprs)
    -> mapInPandas trie mentions      [one corpus scan]
    -> per-relation doc-keyed join    [the only big shuffle; AQE skew + salt]
    -> groupBy(subj, obj) support agg [map-side partial agg]
    -> broadcast-join scores, filter  [no shuffle]
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fixtures
from ..operators import aggregates, mentions as mentions_op, pairs as pairs_op
from ..operators import scoring, triples as triples_op


def ingest(corpus: DataFrame, langs: list[str] | None = None) -> DataFrame:
    """Stage 1: stable doc key + lineage sha (BASELINE.json per-row
    invariant: content sha256 equality input<->manifest)."""
    df = corpus
    if langs:
        df = df.where(F.col("lang").isin(langs))
    return df.withColumn(
        "doc_id",
        F.sha2(F.concat_ws("\x1f", "repo", "path", "commit"), 256),
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))


@dataclass
class PipelineConfig:
    relations: list[tuple[str, str]] = field(
        default_factory=lambda: [(fixtures.FN, fixtures.PKG), (fixtures.PKG, fixtures.FN), (fixtures.FN, fixtures.FN)]
    )
    threshold: float = 0.0
    salt_buckets: int = 0
    max_entities_per_doc: int = 0
    langs: list[str] | None = None
    repo_partitions: int = 0  # >0: explicit repartition on hash(repo)
    canonicalize: bool = False  # stage 7: minhash/CC entity dedup + remap


def build_triples(
    spark: SparkSession,
    corpus: DataFrame,
    dictionary: list[fixtures.DictEntry],
    embeddings: DataFrame,
    config: PipelineConfig | None = None,
) -> dict[str, DataFrame]:
    """Return all pipeline outputs as lazy DataFrames."""
    cfg = config or PipelineConfig()
    docs = ingest(corpus, cfg.langs)
    if cfg.repo_partitions:
        docs = docs.repartition(cfg.repo_partitions, F.col("repo"))

    dict_entries = [(e.surface, e.entity_id, e.entity_type) for e in dictionary]
    mentions = mentions_op.detect_mentions(docs, dict_entries)

    # The trie scan is the most expensive stage (full corpus + Python
    # workers); every downstream consumer (doc2entity, entity2doc, and
    # both sides of every relation join) reuses ONE materialization
    # instead of re-running it per subtree (observed 6x re-execution
    # in the unpersisted plan). Deduping (doc, entity) here also drops
    # the per-side distinct shuffles in pair generation.
    from pyspark.storagelevel import StorageLevel

    mentions = mentions.persist(StorageLevel.MEMORY_AND_DISK)
    mentions_dedup = (
        mentions.select("doc_id", "entity_id", "entity_type")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    n_vecs = embeddings.selectExpr("max(vec_id) + 1 AS n").first()["n"]
    entities = fixtures.entities_df(spark, dictionary, int(n_vecs))

    triple_parts: list[DataFrame] = []
    pair_parts: list[DataFrame] = []
    for src_t, tgt_t in cfg.relations:
        rel_pairs = pairs_op.generate_pairs(
            mentions_dedup,
            src_t,
            tgt_t,
            salt_buckets=cfg.salt_buckets,
            max_entities_per_doc=cfg.max_entities_per_doc,
            already_distinct=True,
        )
        # support rows are distinct on (subj, obj) by construction, so
        # the scoring kernel applies directly — no distinct-pairs
        # subtree, no support<->score join, no extra exchange.
        support = triples_op.support_agg(rel_pairs)
        scored = scoring.score_pairs(support, entities, embeddings)
        triple_parts.append(
            triples_op.emit_triples(scored, src_t, tgt_t, cfg.threshold)
        )
        pair_parts.append(rel_pairs)

    triples = triple_parts[0]
    for t in triple_parts[1:]:
        triples = triples.unionByName(t)
    all_pairs = pair_parts[0]
    for p in pair_parts[1:]:
        all_pairs = all_pairs.unionByName(p)

    if cfg.canonicalize:
        from ..operators import canonicalize as canon

        dict_df = spark.createDataFrame(
            [(e.surface, e.entity_id, e.entity_type) for e in dictionary],
            "surface string, entity_id string, entity_type string",
        )
        mapping = canon.canonical_map(dict_df)
        triples = canon.canonicalize_triples(triples, mapping)

    return {
        "docs": docs,
        "mentions": mentions,
        "doc2entity": aggregates.doc_to_entities(mentions),
        "entity2doc": aggregates.entity_to_docs(mentions),
        "pairs": all_pairs,
        "triples": triples,
    }
