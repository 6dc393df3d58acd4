"""Co-occurrence pair generation (pipeline stage 4).

Reference semantics: pandas index-join of two per-type doc->entity-set
mappings on the doc id (``prepare_pair_dataset.py:22-28``) followed by
a per-document Python cartesian product of the two sets (``:33-37``) —
O(docs * |src| * |tgt|) in driver RAM, the hottest loop in the
reference. Here it is the doc-keyed equi-join of the two typed mention
tables: Catalyst plans the join, the cartesian blow-up happens
executor-side, and skew (hub documents / hub entities) is handled by
AQE skew-join plus optional explicit salting.

Directionality parity: a pair is (source-typed entity, target-typed
entity) in that order (``prepare_pair_dataset.py:37-39``). Self-pairs
are excluded when source and target type coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def generate_pairs(
    mentions: DataFrame,
    source_type: str,
    target_type: str,
    salt_buckets: int = 0,
    max_entities_per_doc: int = 0,
    already_distinct: bool = False,
) -> DataFrame:
    """mentions -> (doc_id, subj, obj) distinct co-occurrence pairs.

    salt_buckets > 0 adds an explicit salt to the doc-keyed join so a
    hub document's pair expansion spreads over ``salt_buckets`` shuffle
    partitions instead of one (SURVEY.md section 4.2); output is
    invariant to the salt (tested).

    max_entities_per_doc > 0 caps each side's per-document distinct
    entity list at the N smallest entity ids (deterministic), bounding
    the quadratic blow-up of degenerate hub files; dropped rows are
    observable via metrics, never silent at call sites that enable it.
    """
    src = _typed_side(mentions, source_type, "subj", max_entities_per_doc, already_distinct)
    tgt = _typed_side(mentions, target_type, "obj", max_entities_per_doc, already_distinct)

    if salt_buckets and salt_buckets > 1:
        src = src.withColumn(
            "salt", F.pmod(F.xxhash64("subj"), F.lit(salt_buckets)).cast("int")
        )
        tgt = tgt.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
        )
        joined = src.join(tgt, ["doc_id", "salt"], "inner").drop("salt")
    else:
        joined = src.join(tgt, "doc_id", "inner")

    if source_type == target_type:
        joined = joined.where(F.col("subj") != F.col("obj"))
    out = joined.select("doc_id", "subj", "obj")
    if already_distinct:
        # Both sides are unique on (doc_id, entity) and the salt (if
        # any) matches exactly one replica — the join output is already
        # distinct. Skipping the dedup saves a full shuffle+agg of the
        # widest table in the pipeline.
        return out
    return out.distinct()


def evidence_articles(
    pairs: DataFrame, docs: DataFrame, entity_dim: DataFrame | None = None
) -> DataFrame:
    """Recover per-(subj, obj) article sets from SCALE-path evidence
    edges (the round-2 gap: scale triples carry empty ``articles``; the
    doc evidence lives in the ``pairs`` output keyed by the hashed pair
    ``(xxhash64(doc_id), xxhash64(doc_id, 1))``).

    Joins evidence edges back to ``docs`` on BOTH hashes (the 128-bit
    identity — a single 64-bit key could alias two docs at 10^9 rows)
    and aggregates sorted article-id sets + exact n_docs. With
    ``entity_dim`` (idx, entity_id) — exposed by the scale pipeline as
    outputs["entity_dim"] — the int-encoded subj/obj are restored to
    entity ids via broadcast, making the output directly comparable to
    the parity path's per-triple article sets.

    Scale shape: docs is projected to (hash, hash, doc_id) only — the
    join carries no content column; the aggregate is the same
    (subj, obj)-keyed shuffle the support agg already does.
    """
    keyed = docs.select(
        F.xxhash64("doc_id").alias("doc_id"),
        F.xxhash64("doc_id", F.lit(1)).alias("doc_id2"),
        F.col("doc_id").alias("article"),
    )
    out = (
        pairs.join(keyed, ["doc_id", "doc_id2"], "inner")
        .groupBy("subj", "obj")
        .agg(F.sort_array(F.collect_set("article")).alias("articles"))
        # n_docs = size of the collected SET, so it always equals
        # len(articles) even when pairs carries duplicate
        # (doc, subj, obj) rows (an entity id listed under two types,
        # or a pair matched by two relations, after rc is dropped) —
        # a plain count would overcount there (ADVICE r3). Costs
        # nothing extra: no count_distinct EXPAND, the set is already
        # being built.
        .withColumn("n_docs", F.size("articles").cast("long"))
    )
    if entity_dim is not None:
        out = (
            out.join(
                F.broadcast(
                    entity_dim.select(
                        F.col("idx").alias("subj"), F.col("entity_id").alias("subj_id")
                    )
                ),
                "subj",
            )
            .join(
                F.broadcast(
                    entity_dim.select(
                        F.col("idx").alias("obj"), F.col("entity_id").alias("obj_id")
                    )
                ),
                "obj",
            )
            .select(
                F.col("subj_id").alias("subj"),
                F.col("obj_id").alias("obj"),
                "articles",
                "n_docs",
            )
        )
    return out


def _typed_side(
    mentions: DataFrame, entity_type: str, alias: str, cap: int,
    already_distinct: bool = False,
) -> DataFrame:
    side = mentions.where(F.col("entity_type") == entity_type).select(
        "doc_id", F.col("entity_id").alias(alias)
    )
    if not already_distinct:
        # One (doc, entity) row per side; callers that pass a pre-
        # deduplicated (doc_id, entity_id, entity_type) table skip this
        # shuffle entirely (the pipeline dedupes ONCE for all relations).
        side = side.distinct()
    if cap and cap > 0:
        # Deterministic per-doc cap: keep the N lexicographically
        # smallest entity ids (hub-file bound; logged by pipeline metrics).
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id").orderBy(alias)
        side = (
            side.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= cap)
            .drop("_rn")
        )
    return side
