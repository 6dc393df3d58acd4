"""BM25 retrieval (operators/retrieval.py): hand-computed scores,
the deterministic top-k cut, and the float-determinism contract."""

from __future__ import annotations

import math

import pytest

from bio_re_with_entity_embeddings_spark.operators import retrieval as RET


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _by_id(df):
    return {r["doc_id"]: (r["n_terms"], r["score"]) for r in df.collect()}


def test_bm25_hand_computed(spark):
    """3-doc corpus against the textbook formula evaluated in Python:
    idf = ln(1 + (N-df+.5)/(df+.5)), tfn = tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))."""
    d = _docs(
        spark,
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "durian durian durian durian"),
        ],
    )
    out = _by_id(RET.bm25_scores(d, ["apple", "cherry"]))
    n, avgdl, k1, b = 3.0, 3.0, 1.2, 0.75
    idf = math.log(1.0 + (n - 1.0 + 0.5) / (1.0 + 0.5))  # df=1 for both terms

    def tfn(tf, dl):
        return (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))

    assert out == {
        1: (1, round(idf * tfn(2.0, 3.0), 6)),
        2: (1, round(idf * tfn(1.0, 2.0), 6)),
    }  # doc 3 matches nothing and is absent


def test_bm25_multi_term_and_topk_cut(spark):
    """A doc matching both terms outscores single-term docs; identical
    docs tie on score and the doc-id tie-break decides the cut."""
    rows = [
        (1, "apple cherry plum"),
        (2, "apple plum plum"),
        (3, "apple plum plum"),  # identical content to doc 2
        (4, "plum plum plum"),
    ]
    scores = _by_id(RET.bm25_scores(_docs(spark, rows), ["apple", "cherry"]))
    assert scores[1][0] == 2 and scores[2][0] == 1
    assert scores[1][1] > scores[2][1]
    assert scores[2] == scores[3]  # identical docs, identical score
    top2 = [
        r["doc_id"]
        for r in RET.bm25_topk(_docs(spark, rows), ["apple", "cherry"], k=2)
        .collect()
    ]
    assert top2 == [1, 2]  # tie between 2 and 3 broken by doc_id


def test_bm25_term_hygiene(spark):
    d = _docs(spark, [(1, "apple banana"), (2, "banana banana")])
    base = _by_id(RET.bm25_scores(d, ["apple"]))
    # duplicate / differently-cased terms collapse: no double-counting
    assert _by_id(RET.bm25_scores(d, ["Apple", "apple", "APPLE"])) == base
    # absent terms contribute no postings and change nothing
    assert _by_id(RET.bm25_scores(d, ["apple", "zzz_absent"])) == base
    with pytest.raises(ValueError):
        RET.bm25_scores(d, [])


def test_bm25_deterministic_under_partitioning(spark):
    """The ordered per-doc fold makes scores bit-identical whatever the
    physical layout — 1-partition vs 16-partition runs agree exactly."""
    rows = [
        (i, " ".join(f"w{(i * 7 + j * 3) % 11}" for j in range(1 + i % 9)))
        for i in range(200)
    ]
    d1 = _docs(spark, rows).coalesce(1)
    d16 = _docs(spark, rows).repartition(16)
    terms = ["w0", "w3", "w5", "w7"]
    assert _by_id(RET.bm25_scores(d1, terms)) == _by_id(
        RET.bm25_scores(d16, terms)
    )
