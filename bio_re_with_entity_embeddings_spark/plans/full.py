"""Full product plan: corpus curation -> KG construction, composed.

The repo ships two end-to-end products — ``plans/curation.py``'s
``curate_corpus`` (the LLM-corpus curation chain) and
``plans/pipeline.py``'s ``build_triples`` (the KG construction
pipeline). This module composes them into the plan a 100 TB
code-corpus deployment actually runs: quality-gate / dedup /
decontaminate the raw file corpus FIRST, then detect mentions and emit
triples over the curated survivors only. The ordering matters twice at
scale:

* compute — mention detection (the Arrow trie pass) is the pipeline's
  widest stage; running it after dedup shrinks its input by the clone
  rate, and source-code corpora are clone-heavy (license headers,
  vendored dependencies, forks).
* semantics — duplicate files inflate ``n_docs`` support counts: a
  pair mentioned in one file cloned 1000x would look 1000x
  better-supported than it is. Dedup-before-detection makes support
  count DISTINCT content, not copies.

The streaming analog (``streaming/incremental.py``'s
``incremental_curated_triples``) establishes the same ordering for the
incremental path; this is the batch side of that symmetry.

Both entry points stay lazy-composable: ``curate_then_build`` chains
the two lazy plans (the semi-join between them hints ``merge`` — the
survivor set is O(corpus) and must be neither broadcast nor
hash-built, plans/curation.py module doc), ``run_full_checkpointed``
chains the two checkpointed runners under one working dir, so a crash
anywhere — mid-curation, between the products, or mid-KG — resumes
exactly: the KG stages' per-bucket input fingerprints (count +
content-sha fold, plans/manifest.py) cover the curated survivor set,
so a changed curation config or benchmark recomputes the KG tail and
an unchanged one skips it.

Oracle: ``contract_text.kg_full_curated`` restates the ENTIRE chain
(signals -> quality gate -> exact dedup -> minhash/CC keepers ->
decontamination -> mention detection -> pair join -> scoring ->
triples) as one recursive-CTE SQL statement over the documents table
with planted near-duplicate clones, row-exact at sf0.01 — the planted
clones provably change the emitted support counts, so the oracle
checks the composition (curation feeding the KG), not just the two
halves.

Reference: the reference pipelines prepare_entity_dataset.py ->
prepare_pair_dataset.py -> build_dataset manually via CLI invocations
over shared TSV files with no dedup between them; this module is the
composed, resumable restatement of that outer workflow with the
beyond-reference curation layer in front.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fixtures
from . import curation as PC
from . import pipeline as P
from . import runner as R

#: Internal join-key column added to the caller's corpus; dropped from
#: every returned frame. Collision with a corpus column is rejected.
_KEY = "_curation_key"


def _keyed(corpus: DataFrame, doc_key: Column | None) -> DataFrame:
    if _KEY in corpus.columns:
        raise ValueError(f"corpus already has a {_KEY!r} column")
    if doc_key is None:
        # the pipeline's stable doc identity (plans/pipeline.py::ingest)
        doc_key = F.sha2(F.concat_ws("\x1f", "repo", "path", "commit"), 256)
    return corpus.withColumn(_KEY, doc_key.cast("string"))


def _survivors(keyed: DataFrame, curated_full: DataFrame) -> DataFrame:
    """Corpus rows whose curation key survived the chain. left_semi on
    the O(survivors) keep set — merge-hinted for the same
    cannot-broadcast / cannot-hash-build reason as every other
    O(corpus)-sided join in the curation chain."""
    keep = curated_full.select(F.col("doc").alias(_KEY))
    return keyed.join(keep.hint("merge"), _KEY, "left_semi").drop(_KEY)


def curate_then_build(
    spark: SparkSession,
    corpus: DataFrame,
    dictionary: list[fixtures.DictEntry],
    embeddings: DataFrame,
    benchmark: DataFrame | None = None,
    curation_config: PC.CurationConfig | None = None,
    pipeline_config: P.PipelineConfig | None = None,
    entities: DataFrame | None = None,
    doc_key: Column | None = None,
) -> dict[str, DataFrame]:
    """Compose ``curate_corpus`` -> ``build_triples`` lazily.

    ``corpus``: the Iceberg-shaped file table
    (repo, path, commit, lang, content). ``benchmark``: optional
    held-out eval corpus for the decontamination stage (same shape).
    ``doc_key``: expression for the curation document identity; default
    is the pipeline's sha256(repo, path, commit) — pass e.g.
    ``F.col("repo")`` when the corpus carries one file per repo and a
    printable key helps (the oracle does).

    Returns the curation intermediates under ``cur_*`` keys plus every
    ``build_triples`` output (``triples``, ``mentions``, ...). The
    curation ``signals``/hub persists are owned by the caller exactly
    as in ``curate_corpus`` (unpersist ``cur_signals`` /
    ``cur_exact_survivors`` / ``cur_near_survivors`` when done).
    """
    keyed = _keyed(corpus, doc_key)
    # Parallelism guard ONCE for the composition: both the curation
    # signals projection and (via the survivor semi-join, which
    # preserves the left side's partitioning under the broadcast AQE
    # picks at small scale) the KG detector read this frame; a
    # single-split scan would serialize both widest stages
    # (functions/parallel.py). No-op on a wide corpus scan.
    from ..functions.parallel import ensure_min_parallelism

    keyed = ensure_min_parallelism(keyed, _KEY)
    cur = PC.curate_corpus(
        spark,
        keyed,
        benchmark=benchmark,
        config=curation_config,
        id_col=_KEY,
        text_col="content",
        lang_col="lang",
    )
    survivors = _survivors(keyed, cur["corpus_full"])
    kg = P.build_triples(
        spark,
        survivors,
        dictionary,
        embeddings,
        pipeline_config,
        entities=entities,
    )
    out = {f"cur_{k}": v for k, v in cur.items()}
    out["survivors"] = survivors
    out.update(kg)
    return out


def run_full_checkpointed(
    spark: SparkSession,
    corpus: DataFrame,
    dictionary: list[fixtures.DictEntry],
    embeddings: DataFrame,
    base_dir: str,
    benchmark: DataFrame | None = None,
    n_buckets: int = 32,
    curation_config: PC.CurationConfig | None = None,
    pipeline_config: P.PipelineConfig | None = None,
    run_id: str | None = None,
    entities: DataFrame | None = None,
    doc_key: Column | None = None,
) -> dict[str, DataFrame]:
    """Checkpointed/resumable composition: ``run_curation_checkpointed``
    under ``{base_dir}/curation`` then ``run_checkpointed`` (the KG
    runner) under ``{base_dir}/kg``, fed by the materialized survivor
    set.

    Resume is end-to-end exact: the curation runner's stage identities
    fold in the chain config and the benchmark fingerprint
    (plans/curation.py), the KG runner's stage identities fold in the
    dictionary hash, the embeddings/entities content fingerprints and
    the triple-config knobs (plans/runner.py), and the KG runner's
    per-bucket input fingerprints (count + content-sha xor fold) are
    computed over the survivor rows this function feeds it — so any
    upstream change (grown corpus, new config on EITHER side, swapped
    benchmark/dictionary/embeddings) invalidates exactly the downstream
    stages it reaches, and a kill at ANY point (mid-curation, between
    the products, mid-KG) rerun recomputes only what is missing.
    Verified by tests/test_full_plan.py (kill-between-products +
    config-change recompute on both sides)."""
    keyed = _keyed(corpus, doc_key)
    cur = PC.run_curation_checkpointed(
        spark,
        keyed,
        benchmark,
        f"{base_dir}/curation",
        n_buckets=n_buckets,
        config=curation_config,
        run_id=run_id,
        id_col=_KEY,
        text_col="content",
        lang_col="lang",
    )
    survivors = _survivors(keyed, cur["corpus_full"])
    kg = R.run_checkpointed(
        spark,
        survivors,
        dictionary,
        embeddings,
        f"{base_dir}/kg",
        n_buckets=n_buckets,
        config=pipeline_config,
        run_id=run_id,
        entities=entities,
    )
    out = {f"cur_{k}": v for k, v in cur.items()}
    out["survivors"] = survivors
    out.update(kg)
    return out
