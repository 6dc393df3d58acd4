"""Stage-7 canonicalization wired into the pipeline: merged entities
disappear from the triple stream; support is re-aggregated; the result
equals remapping the uncanonicalized triples through the same mapping."""

from __future__ import annotations

import pandas as pd
import pytest

from bio_re_with_entity_embeddings_spark import fixtures, schemas
from bio_re_with_entity_embeddings_spark.operators import canonicalize as C
from bio_re_with_entity_embeddings_spark.plans import pipeline

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def world(spark):
    dictionary = fixtures.make_dictionary()
    rows = fixtures.make_corpus_rows(300, dictionary)
    corpus = spark.createDataFrame(rows, schemas.CORPUS)
    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = pipeline.build_triples(spark, corpus, dictionary, embeddings)
    canon = pipeline.build_triples(
        spark, corpus, dictionary, embeddings,
        pipeline.PipelineConfig(canonicalize=True),
    )
    dict_df = fixtures.dictionary_df(spark, dictionary)
    mapping = {
        r.entity_id: r.canonical_id for r in C.canonical_map(dict_df).collect()
    }
    return dict(
        base=base["triples"].toPandas(),
        canon=canon["triples"].toPandas(),
        mapping=mapping,
    )


def test_merged_entities_absent(world):
    merged_away = {e for e, c in world["mapping"].items() if c != e}
    assert merged_away, "fixture dictionary should produce at least one merge"
    nodes = set(world["canon"]["subj"]) | set(world["canon"]["obj"])
    assert not (nodes & merged_away)


def test_canonical_equals_remapped_base(world):
    m = world["mapping"]
    base = world["base"].copy()
    base["subj"] = base["subj"].map(lambda e: m.get(e, e))
    base["obj"] = base["obj"].map(lambda e: m.get(e, e))
    exp = (
        base.explode("articles")
        .groupby(["subj", "pred", "obj"])["articles"]
        .apply(lambda s: sorted(set(s)))
        .reset_index()
    )
    exp["n_docs"] = exp["articles"].apply(len)
    got = world["canon"]
    key = ["subj", "pred", "obj"]
    exp_m = {tuple(r[k] for k in key): (r["articles"], r["n_docs"]) for _, r in exp.iterrows()}
    got_m = {
        tuple(getattr(r, k) for k in key): (list(r.articles), r.n_docs)
        for r in got.itertuples()
    }
    assert set(exp_m) == set(got_m)
    for k, (arts, n) in exp_m.items():
        assert got_m[k] == (arts, n), k
