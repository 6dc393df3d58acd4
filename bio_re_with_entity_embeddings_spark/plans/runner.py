"""Checkpointed, resumable pipeline runner (north rule: per-partition
checkpoint/metrics records enabling exact resume).

Wraps the stage functions of ``plans/pipeline.py`` with
``plans/manifest.py``: every stage writes bucket-partitioned parquet +
a manifest row per bucket (rows in/out, content-sha xor fold, wall,
run id). A rerun — after a crash, a kill, or on a grown corpus —
anti-joins the manifest and recomputes ONLY missing buckets; completed
buckets are never touched (idempotent per-bucket dynamic overwrite).

The bucket key is ``pmod(xxhash64(repo), n_buckets)`` — the explicit
repo-hash partitioning of the north rule: all files of a repo land in
one bucket, so partial corpora resume repo-atomically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fixtures
from ..operators import mentions as mentions_op
from ..operators import scoring, triples as triples_op
from . import manifest as M
from . import pipeline as P


def run_checkpointed(
    spark: SparkSession,
    corpus: DataFrame,
    dictionary: list[fixtures.DictEntry],
    embeddings: DataFrame,
    base_dir: str,
    n_buckets: int = 32,
    config: P.PipelineConfig | None = None,
    run_id: str | None = None,
    entities: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Stage-materialized pipeline with exact resume.

    Stages (each checkpointed under ``{base_dir}/{stage}``):
      ingest    corpus -> docs (doc_id, content_sha, bucket)
      mentions  docs -> mention rows (bucket preserved)
      triples   global (cannot be bucket-local: pairs join across the
                whole doc axis) — checkpointed as ONE manifest bucket
                whose input fingerprint is the count + content-sha
                xor-fold of the whole mention table: a rerun with
                unchanged mentions skips the tail entirely; a crash
                mid-tail (or any upstream bucket change) recomputes it
                idempotently.
    """
    cfg = config or P.PipelineConfig()

    docs = M.run_stage(
        spark,
        base_dir,
        "ingest",
        M.with_bucket(P.ingest(corpus, cfg.langs), "repo", n_buckets),
        lambda df: df,
        run_id=run_id,
    )

    dict_entries = [(e.surface, e.entity_id, e.entity_type) for e in dictionary]

    def detect(df: DataFrame) -> DataFrame:
        m = mentions_op.detect_mentions(df, dict_entries)
        return m.join(
            df.select("doc_id", "bucket", "content_sha"), "doc_id", "inner"
        )

    mentions = M.run_stage(
        spark, base_dir, "mentions", docs, detect, run_id=run_id
    )

    # Triple emission consumes the materialized mention table — a
    # global aggregate over all buckets (pair co-occurrence crosses
    # bucket boundaries by definition). It runs through the SAME
    # manifest machinery as the bucket-local stages, as one logical
    # bucket: the stage is skipped when its input fingerprint (mention
    # count + content-sha xor-fold) matches the manifest, recomputed
    # idempotently otherwise — so the all-upstream-buckets-complete
    # gate is enforced by construction (run_stage returned only after
    # completing them) and a crash mid-tail resumes exactly.
    if entities is None:
        # default: the fixture vec-index convention (same fallback as
        # build_triples); pass an explicit (entity_id, entity_type,
        # vec_id) dimension for dictionaries outside that convention
        n_vecs = embeddings.selectExpr("max(vec_id) + 1 AS n").first()["n"]
        entities = fixtures.entities_df(spark, dictionary, int(n_vecs))

    from ..operators import pairs as pairs_op

    def build_triples_tail(mention_rows: DataFrame) -> DataFrame:
        mentions_dedup = mention_rows.select(
            "doc_id", "entity_id", "entity_type"
        ).distinct()
        triple_parts = []
        for src_t, tgt_t in cfg.relations:
            rel_pairs = pairs_op.generate_pairs(
                mentions_dedup, src_t, tgt_t,
                salt_buckets=cfg.salt_buckets,
                max_entities_per_doc=cfg.max_entities_per_doc,
                already_distinct=True,
            )
            support = triples_op.support_agg(rel_pairs, max(cfg.articles_cap, 0))
            scored = scoring.score_pairs(support, entities, embeddings)
            triple_parts.append(
                triples_op.emit_triples(
                    scored, src_t, tgt_t, cfg.threshold,
                    pred=cfg.predicate(src_t, tgt_t),
                )
            )
        triples = triple_parts[0]
        for t in triple_parts[1:]:
            triples = triples.unionByName(t)
        return triples.withColumn("bucket", F.lit(0).cast("int"))

    tail_input = mentions.withColumn("bucket", F.lit(0).cast("int"))
    triples = M.run_stage(
        spark, base_dir, "triples", tail_input, build_triples_tail, run_id=run_id
    )

    return {
        "docs": docs,
        "mentions": mentions,
        "triples": triples.drop("bucket"),
    }


def verify_lineage(spark: SparkSession, corpus: DataFrame, base_dir: str, n_buckets: int = 32) -> bool:
    """Per-row lineage invariant (BASELINE.json): the xor-fold of
    content shas in the INPUT equals the ingest manifest's fold, per
    repo-hash bucket."""
    bucketed = M.with_bucket(
        corpus.withColumn("content_sha", F.sha2(F.col("content"), 256)),
        "repo",
        n_buckets,
    )
    return M.lineage_check(spark, base_dir, "ingest", bucketed)
