"""BM25 keyword retrieval over a document table (beyond-reference).

The reference pipeline materializes a corpus and its derived tables
(``prepare_entity_dataset.py:32-74``) but offers no way to ASK the
corpus anything; the first consumer feature of any corpus store is
ranked keyword search.  This module supplies Okapi BM25 as a pure
DataFrame plan over the ``documents`` table — the house tokenizer
(whitespace split, the ``text_stats`` contract), no index build step,
no UDFs.

Scale shape (the 100-TB lens):

* The query-term filter lands BEFORE any shuffle: ``explode`` +
  ``isin(<literal terms>)`` means only the postings of the query's
  terms leave the scan — the corpus-wide shuffle is O(matching
  postings), not O(tokens).  Document length rides the groupBy key
  (doc_id determines it), so no join-back against the corpus.
* Corpus stats (N, avgdl) are ONE map-combined 1-row aggregate,
  attached by a broadcast cross-join — the plan stays fully LAZY (no
  plan-time driver action, the embedding_lsh_candidates discipline).
* Per-term document frequencies are <= |query| rows — broadcast.
* Top-k is ``orderBy(...).limit(k)`` = TakeOrdered (per-partition
  heaps + driver merge of k rows), never a global sort.

Float policy: the per-document score sums <= |query| doubles via an
ORDERED fold over the sorted (term, score) list, so a Spark rerun is
bit-identical under any partitioning; cross-engine comparison rounds
to 6 decimals (the pagerank convention) and orders by the ROUNDED
score with a doc-id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_scores(
    documents: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_terms, score): Okapi BM25 score for EVERY document
    matching at least one query term (Robertson/Sparck Jones idf in
    the non-negative ``ln(1 + (N-df+0.5)/(df+0.5))`` form — the
    Lucene variant, so a term in over half the corpus still scores
    >= 0).  ``n_terms`` is the number of distinct query terms the
    document contains.  Use :func:`bm25_topk` for the ranked cut.

    Duplicate / differently-cased query terms collapse (scoring a
    term twice would double-count it); empty term lists raise.
    """
    terms = sorted({t.lower() for t in query_terms if t})
    if not terms:
        raise ValueError("bm25: query_terms must contain at least one term")
    toks = documents.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("toks"),
    )
    docs = toks.select("doc_id", F.size("toks").alias("dl"), "toks")
    # ONE 1-row map-combined aggregate; broadcast cross-join keeps the
    # plan lazy (no plan-time count job).
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    postings = (
        docs.select("doc_id", "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")  # dl rides the key: no join-back
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")  # postings are per-(doc,term): count = df
    )
    n, dfc = F.col("n_docs").cast("double"), F.col("df").cast("double")
    idf = F.log(F.lit(1.0) + (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)))
    tf, dl = F.col("tf").cast("double"), F.col("dl").cast("double")
    tfn = (tf * F.lit(k1 + 1.0)) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.col("avgdl"))
    )
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", (idf * tfn).alias("s"))
    )
    # ordered fold over the sorted per-doc (term, s) list: the <=|Q|
    # float additions happen in ONE fixed order under any partitioning.
    return (
        scored.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("term", "s"))).alias("ts"))
        .select(
            "doc_id",
            F.size("ts").alias("n_terms"),
            F.round(
                F.aggregate(
                    "ts", F.lit(0.0), lambda acc, x: acc + x["s"]
                ),
                6,
            ).alias("score"),
        )
    )


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k BM25 documents for a query — ``bm25_scores`` cut by
    (score DESC, doc_id ASC): the rounded score decides, the doc id
    breaks ties, so the cut is deterministic cross-engine.  The limit
    compiles to TakeOrdered (per-partition k-heaps), not a global
    sort."""
    return (
        bm25_scores(
            documents, query_terms, k1=k1, b=b,
            id_col=id_col, text_col=text_col,
        )
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
    )
