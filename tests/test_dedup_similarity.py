"""Correctness of the non-oracle dedup/similarity operators."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bio_re_with_entity_embeddings_spark.operators import dedup as DD
from bio_re_with_entity_embeddings_spark.operators import similarity as SIM

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    dups = d.where(F.col("doc_id") < 10).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    return d.unionByName(dups).cache()


def test_exact_duplicates_finds_planted(docs):
    got = DD.exact_duplicates(docs, "doc_id", "text").toPandas()
    assert len(got) >= 10
    groups = {tuple(sorted(r.split(";;;"))) for r in got["docs_str"]}
    for i in range(10):
        assert tuple(sorted([str(i), str(100000 + i)])) in groups
    # keeper is the lexicographic min member (string ids)
    for r in got.itertuples():
        assert r.keeper == sorted(r.docs_str.split(";;;"))[0]


def test_minhash_recovers_exact_duplicates(docs):
    got = DD.minhash_near_duplicates(docs, "doc_id", "text", threshold=0.99)
    pairs = {(r.doc_a, r.doc_b) for r in got.collect()}
    for i in range(10):
        a, b = sorted([str(i), str(100000 + i)])
        assert (a, b) in pairs, f"planted dup {i} not recovered"


def test_minhash_candidates_subset_of_exact_jaccard(docs):
    """Every minhash-emitted pair must pass the exact-jaccard filter
    (the verify step is exact — no false positives at the threshold)."""
    mh = DD.minhash_near_duplicates(docs, "doc_id", "text", threshold=0.5)
    exact = DD.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
    mh_pairs = {(r.doc_a, r.doc_b) for r in mh.collect()}
    ex_pairs = {(r.doc_a, r.doc_b) for r in exact.collect()}
    assert mh_pairs <= ex_pairs


def test_simhash_finds_exact_duplicates(docs):
    got = DD.simhash_near_duplicates(docs, "doc_id", "text", max_hamming=0)
    pairs = {(r.doc_a, r.doc_b) for r in got.collect()}
    for i in range(10):
        a, b = sorted([str(i), str(100000 + i)])
        assert (a, b) in pairs


def test_matmul_topk_equals_brute_force(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    bf = SIM.brute_force_topk(emb, queries, k=5).toPandas()
    qrows = queries.select("vec_id", "embedding").collect()
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float32) for r in qrows])
    mm = SIM.topk_matmul(emb, qmat, [r["vec_id"] for r in qrows], k=5).toPandas()
    key = ["query_id", "neighbor_id", "rank"]
    assert sorted(map(tuple, bf[key].itertuples(index=False))) == sorted(
        map(tuple, mm[key].itertuples(index=False))
    )


def test_ann_lsh_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 20)
    bf = SIM.brute_force_topk(emb, queries, k=5).toPandas()
    ann = SIM.ann_topk(emb, queries, k=5, n_planes=4, dim=64).toPandas()
    bf_set = set(map(tuple, bf[["query_id", "neighbor_id"]].itertuples(index=False)))
    ann_set = set(map(tuple, ann[["query_id", "neighbor_id"]].itertuples(index=False)))
    # ANN results must be a plausible approximation: nonempty, and all
    # emitted neighbors verified by exact cosine ordering within bucket.
    assert ann_set
    recall = len(bf_set & ann_set) / len(bf_set)
    assert recall >= 0.2, recall  # 4 planes, 64-dim random vectors


def test_embedding_near_duplicates_self_consistency(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(100)
    doubled = emb.unionByName(
        emb.where(F.col("vec_id") < 3).withColumn(
            "vec_id", F.col("vec_id") + 1000
        )
    )
    got = DD.embedding_near_duplicates(doubled, threshold=0.9999).toPandas()
    pairs = {(r.id_a, r.id_b) for r in got.itertuples()}
    for i in range(3):
        assert (i, 1000 + i) in pairs
