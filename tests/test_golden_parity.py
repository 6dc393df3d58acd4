"""Golden-fixture parity: the Spark pipeline must reproduce the
pure-pandas reference restatement (BASELINE.json: triple P/R >= 0.95;
both sides deterministic, so we demand exact agreement)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bio_re_with_entity_embeddings_spark import fixtures, golden, schemas
from bio_re_with_entity_embeddings_spark.operators import scoring
from bio_re_with_entity_embeddings_spark.plans import pipeline

SF = 0.001
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def world(spark):
    dictionary = fixtures.make_dictionary()
    rows = fixtures.make_corpus_rows(fixtures.n_files_for_sf(SF), dictionary)
    corpus = spark.createDataFrame(rows, schemas.CORPUS)
    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    outputs = pipeline.build_triples(spark, corpus, dictionary, embeddings)
    emb_mat = scoring.embedding_matrix(embeddings)
    gold_mentions = golden.expected_mentions(rows, dictionary)
    return dict(
        rows=rows,
        dictionary=dictionary,
        outputs=outputs,
        emb_mat=emb_mat,
        gold_mentions=gold_mentions,
    )


def test_fillers_never_collide_with_surfaces(world):
    surfaces = {e.surface.lower() for e in world["dictionary"]}
    assert not surfaces & {f.lower() for f in fixtures._FILLERS}


def test_mentions_match_golden(world):
    got = world["outputs"]["mentions"].toPandas()
    exp = world["gold_mentions"]
    key = ["doc_id", "entity_id", "mention", "begin", "end"]
    got_set = set(map(tuple, got[key].itertuples(index=False)))
    exp_set = set(map(tuple, exp[key].itertuples(index=False)))
    assert got_set == exp_set
    assert len(exp_set) > 1000  # fixture actually exercises the corpus


def test_edge_cases_present(world):
    """The corpus must contain the span-predicate edge cases."""
    m = world["gold_mentions"]
    # case-variant mentions matched case-insensitively
    assert (m["mention"].str.isupper() & (m["mention"].str.len() > 3)).any()
    # ambiguous surface links to two ids
    amb = m[m["mention"].str.lower() == "initcompat"]
    assert set(amb["entity_id"]) == {"FN:0000", "FN:0001"}
    # hub entity present in many docs
    hub_docs = m[m["entity_id"] == "PKG:0000"]["doc_id"].nunique()
    assert hub_docs > 100


def test_doc2entity_matches_golden(world):
    got = world["outputs"]["doc2entity"].toPandas()
    exp = golden.expected_doc2entity(world["gold_mentions"])
    got_map = {r.doc_id: list(r.entity_ids) for r in got.itertuples()}
    exp_map = {r.doc_id: list(r.entity_ids) for r in exp.itertuples()}
    assert got_map == exp_map


def test_entity2doc_matches_golden(world):
    got = world["outputs"]["entity2doc"].toPandas()
    exp = golden.expected_entity2doc(world["gold_mentions"])
    got_map = {r.entity_id: (list(r.articles), r.n_docs) for r in got.itertuples()}
    exp_map = {r.entity_id: (list(r.articles), r.n_docs) for r in exp.itertuples()}
    assert got_map == exp_map


def _triple_set(df: pd.DataFrame) -> set:
    return set(map(tuple, df[["subj", "pred", "obj"]].itertuples(index=False)))


def test_triples_pr_ge_095(world):
    got = world["outputs"]["triples"].toPandas()
    parts = []
    for src_t, tgt_t in [
        (fixtures.FN, fixtures.PKG),
        (fixtures.PKG, fixtures.FN),
        (fixtures.FN, fixtures.FN),
    ]:
        p = golden.expected_pairs(world["gold_mentions"], src_t, tgt_t)
        parts.append(
            golden.expected_triples(
                p, fixtures.RELATION_PREDICATES[(src_t, tgt_t)], world["emb_mat"]
            )
        )
    exp = pd.concat(parts, ignore_index=True)
    got_set, exp_set = _triple_set(got), _triple_set(exp)
    assert exp_set, "golden produced no triples — fixture broken"
    tp = len(got_set & exp_set)
    precision = tp / max(len(got_set), 1)
    recall = tp / len(exp_set)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # deterministic restatement: expect exact agreement, not just 0.95
    assert got_set == exp_set

    # scores bit-identical (shared kernel), articles identical
    got_m = {
        (r.subj, r.pred, r.obj): (r.score, list(r.articles), r.n_docs)
        for r in got.itertuples()
    }
    exp_m = {
        (r.subj, r.pred, r.obj): (r.score, list(r.articles), r.n_docs)
        for r in exp.itertuples()
    }
    for k, (score, articles, n_docs) in exp_m.items():
        gs, ga, gn = got_m[k]
        assert ga == articles and gn == n_docs
        assert gs == pytest.approx(score, abs=1e-12)


def test_salt_invariance(world, spark):
    """S=1 vs S=8 salted pair join -> identical pairs (SURVEY 5.2.4d)."""
    from bio_re_with_entity_embeddings_spark.operators import pairs as pairs_op

    m = world["outputs"]["mentions"]
    base = pairs_op.generate_pairs(m, fixtures.FN, fixtures.PKG).toPandas()
    salted = pairs_op.generate_pairs(
        m, fixtures.FN, fixtures.PKG, salt_buckets=8
    ).toPandas()
    key = ["doc_id", "subj", "obj"]
    assert set(map(tuple, base[key].itertuples(index=False))) == set(
        map(tuple, salted[key].itertuples(index=False))
    )


def test_lineage_content_sha(world):
    """Per-row lineage invariant: content sha256 equality (BASELINE.json)."""
    import hashlib

    got = (
        world["outputs"]["docs"].select("doc_id", "content_sha").toPandas()
    )
    exp = {
        golden.doc_id_of(r[0], r[1], r[2]): hashlib.sha256(r[4].encode()).hexdigest()
        for r in world["rows"]
    }
    got_map = dict(zip(got["doc_id"], got["content_sha"]))
    assert got_map == exp


def test_permutation_invariance(world, spark):
    """Repartitioned input => identical triple set (SURVEY 5.2.4c)."""
    corpus = spark.createDataFrame(world["rows"], schemas.CORPUS).repartition(13)
    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    outputs = pipeline.build_triples(
        spark, corpus, world["dictionary"], embeddings
    )
    got = outputs["triples"].toPandas()
    base = world["outputs"]["triples"].toPandas()
    assert _triple_set(got) == _triple_set(base)
