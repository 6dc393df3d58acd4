"""Driver-contract queries: text analysis, dedup, similarity search,
and the full trie pipeline (rows-only). These are the training-data
pipeline operators (dedup / ANN / quality / lang-id / fingerprint)
layered on the same engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .contract import _SQL_COSINE, register, _load
from .functions import text as TXT
from .operators import dedup as DD
from .operators import similarity as SIM

_EN = TXT.STOPWORDS["en"]
_SQL_STOP_LISTS = {
    lang: "(" + ", ".join(f"'{w}'" for w in sw) + ")"
    for lang, sw in sorted(TXT.STOPWORDS.items())
}


@register(
    "text_stats",
    """
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
FROM documents
""",
)
def text_stats(spark, sf_dir):
    """Token counting + document fingerprinting."""
    d = _load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TXT.token_count("text").alias("n_tokens"),
        TXT.fingerprint("text").alias("fp"),
    )


@register(
    "text_quality",
    f"""
SELECT doc_id,
       round(punct_ratio, 6) AS punct_ratio,
       round(least(n_tokens / 50.0, 1.0) * 0.5 + (1.0 - punct_ratio) * 0.3
             + least(stop_ratio * 5.0, 1.0) * 0.2, 6) AS quality
FROM (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
           / greatest(length(lower(text)), 1) AS punct_ratio,
         CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                              x -> x IN {_SQL_STOP_LISTS["en"]})) AS DOUBLE)
           / greatest(len(string_split_regex(lower(trim(text)), '\\s+')), 1) AS stop_ratio
  FROM documents
)
""",
)
def text_quality(spark, sf_dir):
    """Quality scoring: length/punctuation/stopword heuristics."""
    d = _load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(TXT.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(TXT.quality_score("text"), 6).alias("quality"),
    )


_LANGID_HITS_SQL = "\nUNION ALL\n".join(
    f"""SELECT doc_id, '{lang}' AS lang,
       len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       x -> x IN {lst})) AS h
FROM documents"""
    for lang, lst in _SQL_STOP_LISTS.items()
)


@register(
    "text_langid",
    f"""
WITH hits AS (
{_LANGID_HITS_SQL}
),
best AS (
  SELECT doc_id, lang AS lang_pred FROM (
    SELECT doc_id, lang, h,
           row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang) AS rn
    FROM hits WHERE h > 0
  ) WHERE rn = 1
)
SELECT d.doc_id, d.lang, coalesce(b.lang_pred, 'und') AS lang_pred
FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id
""",
)
def text_langid(spark, sf_dir):
    """Stopword-vote language ID heuristic."""
    d = _load(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", TXT.lang_id("text").alias("lang_pred"))


# --- dedup family: exercised on documents + re-planted duplicates -------

_SQL_DOCS_WITH_DUPS = """
WITH docs2 AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text, lang FROM documents WHERE doc_id < 10
)
"""


def _docs_with_dups(spark, sf_dir):
    d = _load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    dups = (
        d.where(F.col("doc_id") < 10)
        .withColumn("doc_id", F.col("doc_id") + 100000)
    )
    return d.unionByName(dups)


@register(
    "dedup_exact",
    _SQL_DOCS_WITH_DUPS
    + """
SELECT fp, keeper, n_dups, docs_str FROM (
  SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         min(CAST(doc_id AS VARCHAR)) AS keeper,
         CAST(count(*) AS BIGINT) AS n_dups,
         string_agg(DISTINCT CAST(doc_id AS VARCHAR), ';;;'
                    ORDER BY CAST(doc_id AS VARCHAR)) AS docs_str
  FROM docs2 GROUP BY 1
) WHERE n_dups > 1
""",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on normalized-text fingerprint."""
    return DD.exact_duplicates(_docs_with_dups(spark, sf_dir), "doc_id", "text")


@register(
    "dedup_ngram_jaccard",
    _SQL_DOCS_WITH_DUPS
    + """
, sh AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(
           range(len(string_split_regex(lower(trim(text)), '\\s+')) - 2),
           i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\\s+'),
                                           i + 1, i + 3), ' ')
         )) AS grams
  FROM docs2
)
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM (
  SELECT CAST(a.doc_id AS VARCHAR) AS doc_a, CAST(b.doc_id AS VARCHAR) AS doc_b,
         CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
           / len(list_distinct(a.grams || b.grams)) AS jaccard
  FROM sh a JOIN sh b ON a.lang = b.lang
  WHERE CAST(a.doc_id AS VARCHAR) < CAST(b.doc_id AS VARCHAR)
) WHERE jaccard >= 0.5
""",
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram jaccard near-dup pairs (lang-blocked)."""
    pairs = DD.ngram_jaccard_pairs(
        _docs_with_dups(spark, sf_dir), "doc_id", "text",
        threshold=0.5, block_col="lang",
    )
    return pairs.select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


@register("dedup_minhash")  # rows-only: xxhash64 has no DuckDB equivalent
def dedup_minhash(spark, sf_dir):
    """MinHash+LSH near-dup pairs; correctness vs exact jaccard is
    asserted in tests/test_dedup.py (planted duplicates recovered)."""
    return DD.minhash_near_duplicates(
        _docs_with_dups(spark, sf_dir), "doc_id", "text", threshold=0.5
    )


@register("dedup_simhash")  # rows-only
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs (chunk-banded hamming)."""
    return DD.simhash_near_duplicates(
        _docs_with_dups(spark, sf_dir), "doc_id", "text", max_hamming=8
    )


# --- similarity search ---------------------------------------------------

_SQL_COS_Q = _SQL_COSINE  # references a.embedding / b.embedding


@register(
    "sim_topk_cosine",
    f"""
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_SQL_COS_Q} AS cosine,
         CAST(row_number() OVER (PARTITION BY a.vec_id
              ORDER BY {_SQL_COS_Q} DESC, b.vec_id) AS INT) AS rank
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < 5
)
WHERE rank <= 5
""",
)
def sim_topk_cosine(spark, sf_dir):
    """Brute-force cosine top-5 for the first 5 vectors (T3 analog of
    gensim most_similar, examples/load_entity_embeddings.py:30-34)."""
    emb = _load(spark, sf_dir, "embeddings")
    out = SIM.brute_force_topk(emb, emb.where(F.col("vec_id") < 5), k=5)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


@register("sim_topk_matmul")  # rows-only: Arrow kernel variant
def sim_topk_matmul(spark, sf_dir):
    """Scale-path ANN baseline: broadcast query matrix + batched NumPy
    matmul; equality with sim_topk_cosine asserted in tests."""
    import numpy as np

    emb = _load(spark, sf_dir, "embeddings")
    qrows = emb.where(F.col("vec_id") < 5).select("vec_id", "embedding").collect()
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float32) for r in qrows])
    return SIM.topk_matmul(emb, qmat, [r["vec_id"] for r in qrows], k=5)


@register("sim_ann_lsh")  # rows-only: approximate by construction
def sim_ann_lsh(spark, sf_dir):
    """LSH-bucketed approximate top-k; recall vs brute force asserted
    in tests (>= 0.4 with 6 planes on 64-dim random vectors)."""
    emb = _load(spark, sf_dir, "embeddings")
    return SIM.ann_topk(emb, emb.where(F.col("vec_id") < 5), k=5, dim=64)


# --- the real trie pipeline (rows-only smoke at driver sf) ---------------


@register("kg_pipeline_canonical")
def kg_pipeline_canonical(spark, sf_dir):
    """Full pipeline WITH stage 7 (minhash/CC canonicalization + remap):
    entities sharing or nearly-sharing surfaces collapse to one
    canonical node; support re-aggregated. Rows-only check; merge
    semantics asserted in tests/test_canonicalize.py."""
    from . import fixtures
    from .deploy import ensure_shipped
    from .plans import pipeline

    ensure_shipped(spark)
    sf = min(fixtures.sf_from_dir(sf_dir), 0.01)
    dictionary = fixtures.make_dictionary()
    corpus = fixtures.corpus_df(spark, sf, dictionary)
    embeddings = _load(spark, sf_dir, "embeddings")
    cfg = pipeline.PipelineConfig(canonicalize=True)
    out = pipeline.build_triples(spark, corpus, dictionary, embeddings, cfg)
    return out["triples"].select(
        "subj", "pred", "obj", F.col("n_docs").cast("long").alias("n_docs")
    )


@register("kg_pipeline_triples")
def kg_pipeline_triples(spark, sf_dir):
    """Full stage-1..6 pipeline (trie mentions -> pairs -> scoring ->
    triples) on the generated corpus at the sf of ``sf_dir``, embeddings
    from ``sf_dir``. Golden parity is enforced in tests/test_golden_parity.py;
    here the driver records a rows-only check."""
    from . import fixtures
    from .deploy import ensure_shipped
    from .plans import pipeline

    ensure_shipped(spark)
    sf = min(fixtures.sf_from_dir(sf_dir), 0.01)  # bound corpus gen cost
    dictionary = fixtures.make_dictionary()
    corpus = fixtures.corpus_df(spark, sf, dictionary)
    embeddings = _load(spark, sf_dir, "embeddings")
    out = pipeline.build_triples(spark, corpus, dictionary, embeddings)
    return out["triples"].select(
        "subj", "pred", "obj", "score", F.col("n_docs").cast("long").alias("n_docs")
    )
