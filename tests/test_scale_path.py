"""Scale path (dictionary-encoded fused pipeline, articles_cap=-1)
must emit the same (subj, pred, obj, score, n_docs) as the parity
path — only the articles representation differs."""

from __future__ import annotations

import pytest

from bio_re_with_entity_embeddings_spark import fixtures, schemas
from bio_re_with_entity_embeddings_spark.plans import pipeline

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def both(spark):
    dictionary = fixtures.make_dictionary()
    rows = fixtures.make_corpus_rows(400, dictionary)
    corpus = spark.createDataFrame(rows, schemas.CORPUS)
    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    parity = pipeline.build_triples(spark, corpus, dictionary, embeddings)
    scale = pipeline.build_triples(
        spark, corpus, dictionary, embeddings,
        pipeline.PipelineConfig(articles_cap=-1),
    )
    return parity["triples"].toPandas(), scale["triples"].toPandas()


def _key(df):
    return {
        (r.subj, r.pred, r.obj): (r.n_docs, round(r.score, 9))
        for r in df.itertuples()
    }


def test_scale_equals_parity_triples(both):
    parity, scale = both
    kp, ks = _key(parity), _key(scale)
    assert set(kp) == set(ks)
    for k, v in kp.items():
        assert ks[k] == v, k


def test_scale_articles_empty_parity_full(both):
    parity, scale = both
    assert all(len(a) > 0 for a in parity["articles"])
    assert all(len(a) == 0 for a in scale["articles"])


def test_scale_salted_invariance(spark, both):
    dictionary = fixtures.make_dictionary()
    rows = fixtures.make_corpus_rows(400, dictionary)
    corpus = spark.createDataFrame(rows, schemas.CORPUS)
    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    salted = pipeline.build_triples(
        spark, corpus, dictionary, embeddings,
        pipeline.PipelineConfig(articles_cap=-1, salt_buckets=8),
    )["triples"].toPandas()
    _, scale = both
    assert _key(salted) == _key(scale)
