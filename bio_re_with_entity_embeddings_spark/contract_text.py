"""Driver-contract queries: text analysis, dedup, similarity search,
and the full trie pipeline (rows-only). These are the training-data
pipeline operators (dedup / ANN / quality / lang-id / fingerprint)
layered on the same engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .contract import (
    DOC_DICT,
    _DICT_VALUES,
    _SQL_COSINE,
    _SQL_PAIRS,
    _SQL_PRELUDE,
    _SQL_PRELUDE_BODY,
    register,
    register_extra,
    _load,
)
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
    "text_tokens_bpe",
    f"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_ws,
       CAST(len(regexp_extract_all(text, '{TXT.BPE_PRETOKEN_PATTERN.replace("'", "''")}')) AS BIGINT) AS n_bpe
FROM documents
""",
)
def text_tokens_bpe(spark, sf_dir):
    """Token counting two ways: whitespace (the reference's unit,
    learn_embeddings.py:29) and the GPT-2 BPE pretokenizer split (the
    unit an LLM pipeline budgets by) — the lookahead-free pattern
    evaluates identically under Java regex and RE2."""
    d = _load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TXT.token_count("text").alias("n_ws"),
        TXT.token_count_bpe("text").alias("n_bpe"),
    )


@register(
    "text_winnowing",
    """
WITH norm AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
),
grams AS (
  SELECT doc, i.g AS pos, md5(substr(t, CAST(i.g AS INT), 5)) AS h
  FROM norm, unnest(generate_series(1, length(t) - 4)) AS i(g)
  WHERE length(t) >= 5
),
wins AS (
  SELECT doc,
         min(h) OVER (PARTITION BY doc ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         count(*) OVER (PARTITION BY doc ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
  FROM grams
)
SELECT DISTINCT doc, fp FROM wins WHERE wn = 4
""",
)
def text_winnowing(spark, sf_dir):
    """Winnowing (MOSS) document fingerprints: md5 char-5-gram hashes,
    window-4 minima, distinct kept hashes per doc — the DuckDB oracle
    replays the identical selection with window functions."""
    d = _load(spark, sf_dir, "documents")
    return TXT.winnowing_fingerprints(d, "doc_id", "text", k=5, w=4, hash_mode="md5")


@register(
    "curate_quota_sample",
    """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 50
""",
)
def curate_quota_sample(spark, sf_dir):
    """Deterministic per-group quota sampling (cap over-represented
    languages/domains): at most 50 docs per lang, md5-hash order —
    reproducible, oracle-exact (rand() sampling would be neither)."""
    from .operators import curation as CUR

    d = _load(spark, sf_dir, "documents")
    # skew_salts pinned: auto mode runs a plan-construction count job
    # (the antipattern this round bans elsewhere); fixture groups are
    # tiny and the salted result is exactly equal anyway
    return CUR.quota_sample(
        d, "lang", 50, "doc_id", skew_salts=1
    ).select("doc_id", "lang")


# Deterministic benchmark split for the decontamination query: every
# 20th doc plays the held-out benchmark, the rest are the corpus.
_SQL_DECON_GRAMS = """
WITH d AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
g AS (
  SELECT doc_id,
         array_to_string(toks[CAST(i.g AS INT) : CAST(i.g AS INT) + 3], ' ') AS gram
  FROM d, unnest(generate_series(1, greatest(len(toks) - 3, 1))) AS i(g)
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
corpus AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS doc, gram FROM g
           WHERE doc_id % 20 <> 0)
"""


@register(
    "curate_decontaminate",
    _SQL_DECON_GRAMS
    + """
SELECT doc, CAST(count(*) AS BIGINT) AS n_hits
FROM corpus c JOIN bench b USING (gram)
GROUP BY doc
""",
)
def curate_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3-style word n-gram overlap,
    n=4 at this corpus size): corpus docs sharing >= 1 n-gram with the
    deterministic benchmark split, with distinct-gram hit counts. The
    string-keyed dataflow is the oracle; the production variant
    broadcasts 64-bit gram hashes instead (equality pinned in tests)."""
    from .operators import curation as CUR

    d = _load(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 20 == 0)
    corpus = d.where(F.col("doc_id") % 20 != 0)
    return CUR.decontaminate_exact(corpus, bench, "doc_id", "text", n=4)


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


_SR = TXT.SCRIPT_RANGES


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
),
scr AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[{_SR["kana"]}]')) AS nk,
         len(regexp_extract_all(text, '[{_SR["hangul"]}]')) AS nh,
         len(regexp_extract_all(text, '[{_SR["han"]}]')) AS nz,
         len(regexp_extract_all(text, '[{_SR["thai"]}]')) AS nt,
         greatest(length(text), 1) AS l
  FROM documents
)
SELECT d.doc_id, d.lang,
       CASE WHEN (s.nk + s.nh + s.nz + s.nt) / CAST(s.l AS DOUBLE) >= {TXT.SCRIPT_MIN_RATIO}
            THEN CASE WHEN s.nk > 0 THEN 'ja'
                      WHEN s.nh > 0 THEN 'ko'
                      WHEN s.nt >= s.nz THEN 'th'
                      ELSE 'zh' END
            ELSE coalesce(b.lang_pred, 'und') END AS lang_pred
FROM documents d
LEFT JOIN best b ON b.doc_id = d.doc_id
JOIN scr s ON s.doc_id = d.doc_id
""",
)
def text_langid(spark, sf_dir):
    """Two-tier language ID: char-script histogram for whitespace-free
    scripts (ja/ko/zh/th), stopword vote for Latin-script languages —
    the SQL replays both tiers (the script tier decides via the same
    shared Java/RE2 char-class patterns)."""
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


# MinHash signature/banding restated over md5 (the portable hash_mode —
# minhash only needs a uniform hash with a total order, so min over
# seeded md5 hex strings is a faithful signature both engines share).
_MH_N, _MH_BANDS = 32, 8
_MH_RPB = _MH_N // _MH_BANDS
# One md5 per 4 signature slots (32-bit hex chunks), mirroring the
# Spark side's projection-then-min shape exactly.
_MH_NMD5 = (_MH_N + 3) // 4
_SQL_MH_MCOLS = ", ".join(
    f"md5('{j}:' || g) AS m{j}" for j in range(_MH_NMD5)
)
_SQL_MH_SIG = ",\n         ".join(
    f"min(substr(m{i // 4}, {(i % 4) * 8 + 1}, 8)) AS h{i}" for i in range(_MH_N)
)
_SQL_MH_BANDS = ", ".join(
    "{'band': %d, 'bucket': md5(%s || '|%d')}"
    % (b, " || '|' || ".join(f"h{i}" for i in range(b * _MH_RPB, (b + 1) * _MH_RPB)), b)
    for b in range(_MH_BANDS)
)
_SQL_GRAMS = """
  SELECT CAST(doc_id AS VARCHAR) AS doc,
         list_distinct(list_transform(
           range(greatest(len(string_split_regex(lower(trim(text)), '\\s+')) - 2, 1)),
           i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\\s+'),
                                           i + 1, i + 3), ' ')
         )) AS grams
  FROM docs2
"""


@register(
    "dedup_minhash",
    _SQL_DOCS_WITH_DUPS
    + f"""
, sh AS ({_SQL_GRAMS})
, g AS (SELECT doc, unnest(grams) AS g FROM sh)
, mh AS (SELECT doc, {_SQL_MH_MCOLS} FROM g)
, sig AS (
  SELECT doc, {_SQL_MH_SIG}
  FROM mh GROUP BY doc
)
, banded AS (SELECT doc, unnest([{_SQL_MH_BANDS}]) AS bb FROM sig)
, b2 AS (SELECT doc, bb.band AS band, bb.bucket AS bucket FROM banded)
, cand AS (
  SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
  FROM b2 x JOIN b2 y ON x.band = y.band AND x.bucket = y.bucket
  WHERE x.doc < y.doc
)
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
           / len(list_distinct(a.grams || b.grams)) AS jaccard
  FROM cand c JOIN sh a ON a.doc = c.doc_a JOIN sh b ON b.doc = c.doc_b
) WHERE jaccard >= 0.5
""",
)
def dedup_minhash(spark, sf_dir):
    """MinHash+LSH near-dup pairs (banded bucket join + exact jaccard
    verify), md5 hash_mode so DuckDB replays the identical signature,
    banding, candidate and verify dataflow. The xxhash64 scale mode is
    pinned against this one and the exact baseline in tests."""
    out = DD.minhash_near_duplicates(
        _docs_with_dups(spark, sf_dir), "doc_id", "text",
        threshold=0.5, hash_mode="md5",
    )
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


# Portable simhash: token bit b comes from the b-th bit of the first 16
# hex chars of md5(token); bit of doc = sign of the +/-1 vote sum.
_SQL_SH_BITS = ",\n         ".join(
    "sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, %d, 1)) - 1) >> %d) & 1 = 1"
    " THEN 1 ELSE -1 END) AS c%d" % (b // 4 + 1, 3 - (b % 4), b)
    for b in range(64)
)
_SQL_SH_SIGNS = ", ".join(f"c{b} > 0 AS b{b}" for b in range(64))
_SQL_SH_HAMMING = " + ".join(
    f"(CASE WHEN x.b{b} <> y.b{b} THEN 1 ELSE 0 END)" for b in range(64)
)


@register(
    "dedup_simhash",
    _SQL_DOCS_WITH_DUPS
    + f"""
, tk AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
  FROM docs2
)
, th AS (SELECT doc, md5(t) AS h FROM tk)
, bits AS (
  SELECT doc, {_SQL_SH_BITS}
  FROM th GROUP BY doc
)
, sgn AS (SELECT doc, {_SQL_SH_SIGNS} FROM bits)
SELECT doc_a, doc_b, hamming FROM (
  SELECT x.doc AS doc_a, y.doc AS doc_b,
         CAST({_SQL_SH_HAMMING} AS BIGINT) AS hamming
  FROM sgn x JOIN sgn y ON x.doc < y.doc
) WHERE hamming <= 7
""",
)
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs. 8x8-bit chunk banding is LOSSLESS for
    hamming <= 7 (pigeonhole), so the oracle is simply every pair at
    hamming <= 7 — computed all-pairs in DuckDB over the identical
    md5-derived sign bits."""
    out = DD.simhash_near_duplicates(
        _docs_with_dups(spark, sf_dir), "doc_id", "text",
        max_hamming=7, hash_mode="md5",
    )
    return out.select("doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming"))


# Embedding near-dup LSH: the 32 hyperplanes (8 tables x 4 planes,
# seed 7 — the operator's floor configuration) are a pure function of
# (dim, n_planes, seed); restated as SQL literals both engines assign
# identical per-table keys, so the "approximate" candidate set is
# row-exact, and the cosine verify is the shared double-precision sum.
_EMB_PLANES = SIM._hyperplanes(dim=64, n_planes=32, seed=7)
_SQL_EMB_BITS = " + ".join(
    "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ["
    + ", ".join(repr(float(x)) for x in plane)
    + f"]) >= 0 THEN {1 << h} ELSE 0 END)"
    for h, plane in enumerate(_EMB_PLANES)
)


@register(
    "dedup_embedding",
    f"""
WITH v AS (
  SELECT vec_id, {_SQL_EMB_BITS} AS bits FROM embeddings
),
tabbed AS (
  SELECT vec_id, u.t AS tbl, (bits >> (4 * u.t)) & 15 AS bkey
  FROM v, (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS t) u
),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM tabbed x
  JOIN tabbed y ON x.tbl = y.tbl AND x.bkey = y.bkey AND x.vec_id < y.vec_id
)
SELECT id_a, id_b, round(cosine, 6) AS cosine FROM (
  SELECT c.id_a, c.id_b, {_SQL_COSINE} AS cosine
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.id_a
  JOIN embeddings b ON b.vec_id = c.id_b
  WHERE {_SQL_COSINE} >= 0.4
)
""",
)
def dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs: multi-table hyperplane-LSH
    candidates + exact cosine verify (operators/dedup.py
    embedding_near_duplicates, the scale path for content-embedding
    dedup). Fixed 8x4-plane configuration so the DuckDB restatement
    replays the identical hash tables; the n-derived plane count and
    bucket cap are pinned separately in tests (flood + exact-match)."""
    emb = _load(spark, sf_dir, "embeddings")
    out = DD.embedding_near_duplicates(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.4,
        n_tables=8, planes_per_table=4, seed=7,
        # oracle arithmetic: the interpreted fold sums components in
        # the same sequential order the SQL restatement does; the
        # 'arrow' einsum kernel is the scale default elsewhere
        verify_kernel="hof",
    )
    return out.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
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


@register(
    "sim_topk_matmul",
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
def sim_topk_matmul(spark, sf_dir):
    """Scale-path exact top-k: broadcast query matrix + batched NumPy
    matmul + per-batch top-k (shuffles O(batches*k) survivor rows, not
    O(n*q) scores). float64 here so the kernel's cosines agree with the
    brute-force SQL oracle at round(...,6); the float32 scale default is
    pinned against brute force in tests."""
    import numpy as np

    emb = _load(spark, sf_dir, "embeddings")
    qrows = emb.where(F.col("vec_id") < 5).select("vec_id", "embedding").collect()
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    out = SIM.topk_matmul(
        emb, qmat, [r["vec_id"] for r in qrows], k=5, dtype=np.float64
    )
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


# LSH hyperplanes are a pure function of (dim, n_planes, seed); restating
# them as SQL literals makes the "approximate" index fully deterministic
# and oracle-checkable: both engines assign identical buckets, probe the
# same hamming-1 neighborhood, and verify with the same exact cosine.
_ANN_PLANES = SIM._hyperplanes(dim=64, n_planes=6, seed=42)
_SQL_BUCKET = " + ".join(
    "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ["
    + ", ".join(repr(float(x)) for x in plane)
    + f"]) >= 0 THEN {1 << h} ELSE 0 END)"
    for h, plane in enumerate(_ANN_PLANES)
)
_SQL_PROBES = ", ".join(["bucket"] + [f"xor(bucket, {1 << h})" for h in range(6)])


@register(
    "sim_ann_lsh",
    f"""
WITH v AS (
  SELECT vec_id, embedding, {_SQL_BUCKET} AS bucket FROM embeddings
),
probes AS (
  SELECT vec_id AS query_id, unnest([{_SQL_PROBES}]) AS bucket
  FROM v WHERE vec_id < 5
),
cand AS (
  SELECT DISTINCT p.query_id, n.vec_id AS neighbor_id
  FROM probes p JOIN v n ON n.bucket = p.bucket AND n.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine FROM (
  SELECT c.query_id, c.neighbor_id,
         {_SQL_COS_Q} AS cosine,
         CAST(row_number() OVER (PARTITION BY c.query_id
              ORDER BY {_SQL_COS_Q} DESC, c.neighbor_id) AS INT) AS rank
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.query_id
  JOIN embeddings b ON b.vec_id = c.neighbor_id
)
WHERE rank <= 5
""",
)
def sim_ann_lsh(spark, sf_dir):
    """LSH-bucketed approximate top-k (Arrow sign-matmul bucket kernel,
    hamming-1 multi-probe on the query side, exact cosine verify within
    buckets). Deterministic seed -> row-exact oracle; recall vs brute
    force additionally asserted in tests."""
    emb = _load(spark, sf_dir, "embeddings")
    # oracle mode: n_planes pinned to the 6 literal hyperplanes the SQL
    # restates, verify via the interpreted fold whose sequential sum
    # order the SQL shares (the scale defaults — derived plane count +
    # Arrow einsum verify — are pinned against this mode in tests)
    out = SIM.ann_topk(
        emb, emb.where(F.col("vec_id") < 5), k=5, n_planes=6,
        verify_kernel="hof",
    )
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


# IVF ANN: 16 deterministic unit anchors (dim 64, seed 42) restated as
# literal centroids — both engines compute identical dot products, rank
# cells by (dot DESC, cell ASC), probe the same 4 cells, and verify
# with the shared double cosine. (Trained-centroid IVF is data-
# dependent and pinned by units instead; see similarity.train_centroids.)
_IVF_ANCHORS = SIM.anchors(dim=64, k=16, seed=42)
_SQL_IVF_STRUCTS = ", ".join(
    "{'cell': %d, 'd': list_dot_product(CAST(embedding AS DOUBLE[]), [%s])}"
    % (i, ", ".join(repr(float(x)) for x in c))
    for i, c in enumerate(_IVF_ANCHORS)
)


@register(
    "sim_ivf",
    f"""
WITH ranked AS (
  SELECT vec_id, embedding, u.cell AS cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY u.d DESC, u.cell) AS rn
  FROM embeddings, unnest([{_SQL_IVF_STRUCTS}]) AS t(u)
),
corpus AS (SELECT vec_id AS neighbor_id, cell FROM ranked WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cell FROM ranked WHERE rn <= 4 AND vec_id < 5
),
cand AS (
  SELECT DISTINCT p.query_id, c.neighbor_id
  FROM probes p JOIN corpus c ON c.cell = p.cell
  WHERE c.neighbor_id <> p.query_id
)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine FROM (
  SELECT c.query_id, c.neighbor_id,
         {_SQL_COS_Q} AS cosine,
         CAST(row_number() OVER (PARTITION BY c.query_id
              ORDER BY {_SQL_COS_Q} DESC, c.neighbor_id) AS INT) AS rank
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.query_id
  JOIN embeddings b ON b.vec_id = c.neighbor_id
)
WHERE rank <= 5
""",
)
def sim_ivf(spark, sf_dir):
    """IVF approximate top-k (anchor-quantized cells, 4-probe query
    side, exact cosine verify). Deterministic anchors -> row-exact
    oracle; the trained-centroid variant (distributed Lloyd) is pinned
    by unit tests (recall >= anchors, determinism)."""
    emb = _load(spark, sf_dir, "embeddings")
    out = SIM.ivf_topk(
        emb, emb.where(F.col("vec_id") < 5), k=5, n_cells=16, n_probe=4,
        verify_kernel="hof",  # oracle arithmetic; 'arrow' is the scale default
    )
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


# --- the real trie pipeline, oracle-checked end to end -------------------
#
# documents.text is [A-Za-z0-9_ ]-only, so the Arrow trie/token detector's
# word-boundary semantics coincide with the space-padded LIKE prelude —
# the FULL production pipeline (mapInPandas mentions -> pair join ->
# float32 Arrow scoring kernel -> triples [-> minhash/CC canonicalize])
# is compared against a pure-SQL restatement. Scores: the float32 kernel
# and the double-precision SQL cosine agree at round(...,6) on this data
# (verified row-exactly; both engines are deterministic).

def _as_code_corpus(d):
    """(doc_id, text, lang) frame -> corpus schema
    (repo/path/commit/lang/content); repo == the doc_id string, so the
    corpus key is printable and SQL-restatable."""
    return d.select(
        F.col("doc_id").cast("string").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.lit("c0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def _documents_corpus(spark, sf_dir):
    """documents table -> corpus schema (repo/path/commit/lang/content)."""
    return _as_code_corpus(_load(spark, sf_dir, "documents"))


def _doc_dict_entries():
    from .fixtures import DictEntry

    return [DictEntry(s, e, t) for s, e, t, _v in DOC_DICT]


def _doc_dict_entities(spark):
    rows = sorted({(e, t, v) for _s, e, t, v in DOC_DICT})
    return spark.createDataFrame(
        rows, "entity_id string, entity_type string, vec_id long"
    )


def _run_doc_pipeline(spark, sf_dir, canonicalize: bool):
    from .deploy import ensure_shipped
    from .plans import pipeline

    ensure_shipped(spark)
    cfg = pipeline.PipelineConfig(
        relations=[("op", "obj")],
        predicates={("op", "obj"): "acts_on"},
        threshold=-2.0,  # no score gate: emit every supported pair
        canonicalize=canonicalize,
    )
    out = pipeline.build_triples(
        spark,
        _documents_corpus(spark, sf_dir),
        _doc_dict_entries(),
        _load(spark, sf_dir, "embeddings"),
        cfg,
        entities=_doc_dict_entities(spark),
    )
    return out["triples"].select(
        "subj",
        "pred",
        "obj",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round("score", 6).alias("score"),
    )


_SQL_SCORED_TAIL = f"""
, entity_vecs AS (
  SELECT DISTINCT e.entity_id, e.vec_id, emb.embedding
  FROM dict e JOIN embeddings emb ON emb.vec_id = e.vec_id
),
support AS (
  SELECT subj, obj, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM pairs GROUP BY subj, obj
),
scored AS (
  SELECT s.subj, 'acts_on' AS pred, s.obj, s.n_docs,
         round({_SQL_COSINE}, 6) AS score
  FROM support s
  JOIN entity_vecs a ON a.entity_id = s.subj
  JOIN entity_vecs b ON b.entity_id = s.obj
)
"""


@register(
    "kg_pipeline_triples",
    _SQL_PRELUDE
    + _SQL_PAIRS
    + _SQL_SCORED_TAIL
    + "SELECT subj, pred, obj, n_docs, score FROM scored",
)
def kg_pipeline_triples(spark, sf_dir):
    """Full stage-1..6 production pipeline (ingest -> Arrow trie/token
    mentions -> co-occurrence pair join -> support agg -> float32 Arrow
    scoring kernel -> triple emission) over the documents table with the
    DOC_DICT dictionary; synthetic-corpus parity is separately pinned by
    tests/test_golden_parity.py (P/R vs an independent restatement)."""
    return _run_doc_pipeline(spark, sf_dir, canonicalize=False)


@register(
    "kg_pipeline_canonical",
    "\nWITH RECURSIVE "
    + _SQL_PRELUDE_BODY
    + _SQL_PAIRS
    + _SQL_SCORED_TAIL
    + """
, edges AS (
  SELECT a.entity_id AS u, b.entity_id AS v
  FROM dict a JOIN dict b ON a.surface = b.surface AND a.entity_id <> b.entity_id
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u AND r.u <> e.v
),
canon AS (
  SELECT e.entity_id,
         least(e.entity_id, coalesce(r.mn, e.entity_id)) AS canonical_id
  FROM (SELECT DISTINCT entity_id FROM dict) e
  LEFT JOIN (SELECT u, min(v) AS mn FROM reach GROUP BY u) r
    ON r.u = e.entity_id
),
cpairs AS (
  SELECT DISTINCT p.doc_id, cs.canonical_id AS subj, co.canonical_id AS obj
  FROM pairs p
  JOIN canon cs ON cs.entity_id = p.subj
  JOIN canon co ON co.entity_id = p.obj
),
merged AS (
  SELECT cs.canonical_id AS subj, 'acts_on' AS pred, co.canonical_id AS obj,
         max(t.score) AS score
  FROM scored t
  JOIN canon cs ON cs.entity_id = t.subj
  JOIN canon co ON co.entity_id = t.obj
  GROUP BY 1, 2, 3
)
SELECT m.subj, m.pred, m.obj,
       CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_docs, m.score
FROM merged m
JOIN cpairs c ON c.subj = m.subj AND c.obj = m.obj
GROUP BY m.subj, m.pred, m.obj, m.score
""",
)
def kg_pipeline_canonical(spark, sf_dir):
    """Full pipeline WITH stage 7 (minhash/CC canonicalization + remap):
    entities sharing (or near-sharing, char-3-gram jaccard >= 0.6)
    surfaces collapse to one canonical node; support re-aggregated from
    the unioned article sets. On DOC_DICT the only merge component is
    the exact shared surface (identical shingle sets -> LSH recall 1),
    so the recursive-CC SQL restatement is exact, not approximate."""
    return _run_doc_pipeline(spark, sf_dir, canonicalize=True)


# --- multimodal: real PPM decode cross-checked against the synthesis ---


@register(
    "mm_image_dims",
    """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(8 + doc_id % 9 AS INT) AS width,
       CAST(6 + doc_id % 5 AS INT) AS height,
       3 AS n_channels
FROM documents WHERE doc_id % 3 = 0
""",
)
def mm_image_dims(spark, sf_dir):
    """Binary-column image decode (pure-NumPy P6 parser inside
    mapInPandas): dimensions extracted from REAL payload bytes must
    equal the synthesis formula the oracle recomputes arithmetically —
    a genuine header-parse check, not a tautology (the Spark side never
    sees the formula, only the bytes)."""
    from .operators import multimodal as MM

    docs = _load(spark, sf_dir, "documents")
    media = MM.synth_media(docs)
    return MM.decode_image_features(media).select(
        "media_id", "width", "height", "n_channels"
    )


@register_extra(
    "mm_png_dims",
    """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       'png' AS format,
       CAST(8 + doc_id % 9 AS INT) AS width,
       CAST(6 + doc_id % 5 AS INT) AS height,
       3 AS n_channels
FROM documents
""",
)
def mm_png_dims(spark, sf_dir):
    """Real COMPRESSED-codec decode (stdlib-zlib PNG inflate + NumPy
    scanline unfiltering, operators/multimodal.py::_decode_png) over
    every document: dimensions recovered from actual DEFLATE streams
    whose rows cycle through all five PNG filters must equal the
    synthesis formula the oracle recomputes arithmetically. Like
    mm_image_dims this is a genuine parse check — the Spark side only
    ever sees compressed bytes."""
    from .operators import multimodal as MM

    docs = _load(spark, sf_dir, "documents")
    media = MM.synth_media_png(docs)
    return MM.decode_image_features(media).select(
        "media_id", "format", "width", "height", "n_channels"
    )


@register_extra(
    "mm_gif_dims",
    """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       'gif' AS format,
       CAST(8 + doc_id % 9 AS INT) AS width,
       CAST(6 + doc_id % 5 AS INT) AS height,
       3 AS n_channels
FROM documents
""",
)
def mm_gif_dims(spark, sf_dir):
    """Real GIF-LZW decode (operators/multimodal.py::_decode_gif —
    variable-width codes, interlaced rows, decoy-global/real-local
    color tables alternating by seed) over every document: dimensions
    recovered from actual LZW streams must equal the synthesis formula
    the oracle recomputes arithmetically. Genuine parse check — the
    Spark side only ever sees compressed bytes."""
    from .operators import multimodal as MM

    docs = _load(spark, sf_dir, "documents")
    media = MM.synth_media_gif(docs)
    return MM.decode_image_features(media).select(
        "media_id", "format", "width", "height", "n_channels"
    )


@register_extra(
    "mm_jpeg_dims",
    """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       'jpeg' AS format,
       CAST(8 + doc_id % 9 AS INT) AS width,
       CAST(6 + doc_id % 5 AS INT) AS height,
       3 AS n_channels
FROM documents
""",
)
def mm_jpeg_dims(spark, sf_dir):
    """Real baseline-JPEG decode (operators/jpeg.py::decode_jpeg —
    Huffman tables read from the stream, 4:4:4/4:2:0 MCU interleave
    and restart intervals alternating by seed) over every document:
    dimensions recovered from actual entropy-coded scans must equal
    the synthesis formula the oracle recomputes arithmetically."""
    from .operators import multimodal as MM

    docs = _load(spark, sf_dir, "documents")
    media = MM.synth_media_jpeg(docs)
    return MM.decode_image_features(media).select(
        "media_id", "format", "width", "height", "n_channels"
    )


@register_extra(
    "mm_flac_audio",
    """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 2 END AS INT) AS n_channels,
       CAST(1600 AS BIGINT) AS n_samples,
       CAST(0.2 AS DOUBLE) AS duration_s
FROM documents
""",
)
def mm_flac_audio(spark, sf_dir):
    """Real FLAC decode (operators/flac.py — Rice-coded FIXED-predictor
    frames, mono/stereo/mid-side alternating by seed, CRC-8/16
    verified) over every document: rate/channels/sample-count/duration
    recovered from actual entropy-coded frames must equal the synthesis
    formula the oracle recomputes arithmetically. A row only exists if
    the full frame decode (including CRCs) succeeded; sample-exactness
    vs the WAV twin fixture is pinned in the unit suite."""
    from .operators import multimodal as MM

    docs = _load(spark, sf_dir, "documents")
    media = MM.synth_media_flac(docs)
    return MM.decode_audio_features(media).select(
        "media_id", "sample_rate", "n_channels", "n_samples", "duration_s"
    )


@register_extra(
    "mm_mp4_meta",
    """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       'isom' AS brand,
       round((24 + (doc_id % 7) * 12) * 25.0 / 600.0, 6) AS duration_s,
       'vide' AS kind,
       CAST(8 + doc_id % 9 AS INT) AS width,
       CAST(6 + doc_id % 5 AS INT) AS height,
       CAST(24 + (doc_id % 7) * 12 AS BIGINT) AS n_frames
FROM documents
""",
)
def mm_mp4_meta(spark, sf_dir):
    """Real ISO-BMFF container walk (operators/mp4.py — v0/v1 movie
    and track headers, 64-bit largesize boxes, skip boxes, 16.16
    fixed-point dims, stts frame counts) over every document: track
    metadata recovered from actual box structures must equal the
    synthesis formula the oracle recomputes arithmetically."""
    from .operators import multimodal as MM

    docs = _load(spark, sf_dir, "documents")
    media = MM.synth_media_mp4(docs)
    return MM.decode_video_meta(media).select(
        "media_id",
        "brand",
        F.round("duration_s", 6).alias("duration_s"),
        "kind",
        "width",
        "height",
        "n_frames",
    )


@register(
    "text_repetition",
    """
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc,
         string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
  WHERE text IS NOT NULL
),
g AS (
  SELECT doc,
         array_to_string(toks[CAST(i.g AS INT) : CAST(i.g AS INT) + 1], ' ') AS gram
  FROM d, unnest(generate_series(1, greatest(len(toks) - 1, 1))) AS i(g)
),
per AS (SELECT doc, gram, count(*) AS c FROM g GROUP BY doc, gram)
SELECT doc,
       CAST(sum(c) AS BIGINT) AS n_grams,
       round(1 - count(*) / CAST(sum(c) AS DOUBLE), 6) AS dup_gram_frac,
       round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_gram_frac
FROM per GROUP BY doc
""",
)
def text_repetition(spark, sf_dir):
    """Gopher-style repetition signals (duplicate-2-gram fraction +
    most-common-2-gram coverage) over the documents table — the
    boilerplate/keyword-stuffing filter of a pre-training pipeline."""
    from .operators import curation as CUR

    d = _load(spark, sf_dir, "documents")
    return CUR.repetition_signals(d, "doc_id", "text", n=2)


# Deterministic synthetic PII injection: the fixture corpus carries no
# emails/IPs/phones, so the query plants them (schedule varies by
# doc_id) and the oracle replays the identical injection — masking and
# counting are then exercised on genuinely varying rows.
_SQL_PII_AUG = """
SELECT CAST(doc_id AS VARCHAR) AS doc,
       text ||
       CASE WHEN doc_id % 2 = 0
            THEN ' contact user' || doc_id || '@example.com'
            ELSE '' END ||
       CASE WHEN doc_id % 3 = 0
            THEN ' from 10.0.' || doc_id % 250 || '.7'
            ELSE '' END ||
       CASE WHEN doc_id % 5 = 0
            THEN ' call +44 7700 900' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
            ELSE '' END AS t
FROM documents
"""


@register(
    "text_pii",
    f"""
WITH aug AS ({_SQL_PII_AUG})
SELECT doc,
       regexp_replace(
         regexp_replace(
           regexp_replace(t,
             '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
           '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
         '\\+?\\d[\\d\\- ]{{7,}}\\d', '<PHONE>', 'g') AS masked,
       CAST(len(regexp_extract_all(t,
         '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{{2,}}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t,
         '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(t,
         '\\+?\\d[\\d\\- ]{{7,}}\\d')) AS INT) AS n_phones
FROM aug
""",
)
def text_pii(spark, sf_dir):
    """PII masking + span counts over deterministically-injected
    emails/IPv4s/phone numbers (codegen'd regexp_replace, no UDF)."""
    d = _load(spark, sf_dir, "documents")
    aug = d.select(
        F.col("doc_id").cast("string").alias("doc"),
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 250).cast("string"),
                    F.lit(".7"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" call +44 7700 900"),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    return aug.select(
        "doc",
        TXT.pii_mask(F.col("t")).alias("masked"),
        *TXT.pii_counts(F.col("t")),
    )


@register_extra(
    "dedup_winnowing",
    """
WITH norm AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
),
grams AS (
  SELECT doc, i.g AS pos, md5(substr(t, CAST(i.g AS INT), 5)) AS h
  FROM norm, unnest(generate_series(1, length(t) - 4)) AS i(g)
  WHERE length(t) >= 5
),
wins AS (
  SELECT doc,
         min(h) OVER (PARTITION BY doc ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         count(*) OVER (PARTITION BY doc ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
  FROM grams
),
fps AS (SELECT DISTINCT doc, fp FROM wins WHERE wn = 4),
gated AS (
  SELECT doc, fp FROM (
    SELECT doc, fp, count(*) OVER (PARTITION BY fp) AS bsz FROM fps
  ) WHERE bsz <= 2000
)
SELECT x.doc AS id_a, y.doc AS id_b, CAST(count(*) AS BIGINT) AS n_shared
FROM gated x JOIN gated y ON x.fp = y.fp AND x.doc < y.doc
GROUP BY x.doc, y.doc
HAVING count(*) >= 5
""",
)
def dedup_winnowing(spark, sf_dir):
    """Local-similarity near-dup pairs: docs sharing >= 5 winnowing
    fingerprints (copied-passage detection, the minhash complement) —
    md5 oracle mode, fingerprint bucket gate replayed in SQL."""
    d = _load(spark, sf_dir, "documents")
    return DD.winnowing_near_duplicates(
        d, "doc_id", "text", k=5, w=4, min_shared=5, hash_mode="md5",
        max_bucket_size=2000,  # pinned: the SQL restatement says <= 2000
    )


# --- the composed curation plan, oracle-checked end to end ---------------
#
# plans/curation.py::curate_corpus — quality gate -> exact dedup ->
# minhash near-dup + CC keeper election -> benchmark decontamination ->
# per-lang quota — restated as ONE recursive-CTE SQL dataflow with every
# knob pinned (md5 minhash, string-keyed decon, salts=1 quota; the
# xxhash64/hashed production modes are pinned against these in tests).
# Near-dups are PLANTED (clones of doc_id < 10 with one appended token)
# so the near-dup + keeper stages demonstrably fire; exact-dup recall is
# covered by dedup_exact, whose planted clones exact dedup would silently
# swallow here.

_SQL_QUALITY_EXPR = f"""least(len(string_split_regex(trim(text), '\\s+')) / 50.0, 1.0) * 0.5
         + (1.0 - CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
             / greatest(length(lower(text)), 1)) * 0.3
         + least(CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                   x -> x IN {_SQL_STOP_LISTS["en"]})) AS DOUBLE)
             / greatest(len(string_split_regex(lower(trim(text)), '\\s+')), 1) * 5.0, 1.0) * 0.2"""

# The chain CTE body (docs2 ... clean) is shared between the
# curate_corpus oracle (which appends the quota select) and the
# kg_full_curated oracle (which appends the mention/pair/scoring tail
# over `clean` — the composed curation->KG product of plans/full.py).
_SQL_CURATE_CHAIN = f"""docs2 AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' zzqx' AS text, lang
  FROM documents WHERE doc_id < 10
),
corpus0 AS (SELECT * FROM docs2 WHERE doc_id % 20 <> 0),
bench0 AS (SELECT * FROM docs2 WHERE doc_id % 20 = 0),
sig AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc, lang, text,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         round({_SQL_QUALITY_EXPR}, 6) AS quality,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM corpus0
),
qp AS (SELECT * FROM sig WHERE quality >= 0.55),
ek AS (SELECT fp, min(doc) AS keeper FROM qp GROUP BY fp),
ex AS (SELECT q.* FROM qp q JOIN ek k ON k.fp = q.fp AND q.doc = k.keeper),
sh AS (
  SELECT doc, list_distinct(list_transform(
           range(greatest(len(string_split_regex(lower(trim(text)), '\\s+')) - 2, 1)),
           i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\\s+'),
                                           i + 1, i + 3), ' ')
         )) AS grams
  FROM ex
),
g AS (SELECT doc, unnest(grams) AS g FROM sh),
mh AS (SELECT doc, {_SQL_MH_MCOLS} FROM g),
sg AS (SELECT doc, {_SQL_MH_SIG} FROM mh GROUP BY doc),
banded AS (SELECT doc, unnest([{_SQL_MH_BANDS}]) AS bb FROM sg),
b2 AS (SELECT doc, bb.band AS band, bb.bucket AS bucket FROM banded),
cand AS (
  SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
  FROM b2 x JOIN b2 y ON x.band = y.band AND x.bucket = y.bucket
  WHERE x.doc < y.doc
),
prs AS (
  SELECT doc_a, doc_b FROM (
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(a.grams || b.grams)) AS jaccard
    FROM cand c JOIN sh a ON a.doc = c.doc_a JOIN sh b ON b.doc = c.doc_b
  ) WHERE jaccard >= 0.5
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM prs
  UNION
  SELECT doc_b, doc_a FROM prs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v AND r.u <> e.v
),
clus AS (
  SELECT n.doc, least(n.doc, coalesce(r.mn, n.doc)) AS cluster
  FROM (SELECT DISTINCT u AS doc FROM edges) n
  LEFT JOIN (SELECT u, min(v) AS mn FROM reach GROUP BY u) r ON r.u = n.doc
),
cq AS (SELECT c.doc, c.cluster, s.quality FROM clus c JOIN sig s ON s.doc = c.doc),
mx AS (SELECT cluster, max(quality) AS mq FROM cq GROUP BY cluster),
keep2 AS (
  SELECT cq.cluster, min(cq.doc) AS keeper
  FROM cq JOIN mx ON mx.cluster = cq.cluster AND cq.quality = mx.mq
  GROUP BY cq.cluster
),
drops AS (
  SELECT cq.doc FROM cq JOIN keep2 ON keep2.cluster = cq.cluster
  WHERE cq.doc <> keep2.keeper
),
nd AS (SELECT * FROM ex WHERE doc NOT IN (SELECT doc FROM drops)),
ndt AS (SELECT doc, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM nd),
ndg AS (
  SELECT doc,
         array_to_string(toks[CAST(i.g AS INT) : CAST(i.g AS INT) + 3], ' ') AS gram
  FROM ndt, unnest(generate_series(1, greatest(len(toks) - 3, 1))) AS i(g)
),
bt AS (SELECT string_split_regex(lower(trim(text)), '\\s+') AS toks FROM bench0),
bg AS (
  SELECT DISTINCT array_to_string(toks[CAST(i.g AS INT) : CAST(i.g AS INT) + 3], ' ') AS gram
  FROM bt, unnest(generate_series(1, greatest(len(toks) - 3, 1))) AS i(g)
),
hits AS (SELECT DISTINCT c.doc FROM ndg c JOIN bg USING (gram)),
clean AS (SELECT * FROM nd WHERE doc NOT IN (SELECT doc FROM hits))"""

_SQL_CURATE_CORPUS = (
    "\nWITH RECURSIVE "
    + _SQL_CURATE_CHAIN
    + """
SELECT doc, lang, quality, n_tokens FROM (
  SELECT doc, lang, quality, n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY md5(doc), doc) AS rn
  FROM clean
) WHERE rn <= 40
"""
)


def _docs_with_near_dups(spark, sf_dir):
    """documents + NEAR-duplicate clones: doc_id < 10 re-appears as
    doc_id + 100000 with one appended token (' zzqx') — high-jaccard
    but not byte-identical, so the minhash/keeper stages (not exact
    dedup) must catch them. THE single source of the planted world the
    curate_corpus oracle, tests/test_curation_plan.py, and bench.py's
    curation measurement all share — a drifted copy would make them
    validate different worlds. The SQL mirror lives in the docs2 CTE
    of _SQL_CURATE_CORPUS (keep the two in sync)."""
    d = _load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    dups = (
        d.where(F.col("doc_id") < 10)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zzqx")))
    )
    return d.unionByName(dups)


def _curate_split(docs2):
    """(corpus, benchmark): every 20th doc id is the held-out
    benchmark (the SQL mirror: corpus0/bench0 CTEs)."""
    return (
        docs2.where(F.col("doc_id") % 20 != 0),
        docs2.where(F.col("doc_id") % 20 == 0),
    )


# The curation chain persists three DISK_ONLY hubs per invocation
# (signals / exact_survivors / near_survivors) and assigns unpersist
# duty to the caller (plans/curation.py module doc). Contract rows are
# called repeatedly in one long-lived session (driver window, oracle
# parity tests), so each invocation releases the PREVIOUS one's hubs
# before recording its own — the returned lazy frame stays computable
# (its own persists live until the next call; a stale holder merely
# recomputes). Without this the session's disk cache grows by three
# frames per call for its lifetime.
_CHAIN_PERSISTS: list = []


def _swap_chain_persists(out: dict) -> None:
    while _CHAIN_PERSISTS:
        _CHAIN_PERSISTS.pop().unpersist()
    for k in (
        "signals", "exact_survivors", "near_survivors",
        "cur_signals", "cur_exact_survivors", "cur_near_survivors",
    ):
        df = out.get(k)
        if df is not None and df.storageLevel.useDisk:
            _CHAIN_PERSISTS.append(df)


@register("curate_corpus", _SQL_CURATE_CORPUS)
def curate_corpus(spark, sf_dir):
    """The composed end-to-end curation plan (plans/curation.py) in
    oracle mode over the documents table + planted near-duplicates:
    signals -> quality >= 0.55 -> exact dedup -> md5 minhash pairs ->
    CC keeper election (quality-ranked) -> string-keyed 4-gram
    decontamination vs the %20 benchmark split -> 40-per-lang quota."""
    from .plans import curation as PC

    corpus, bench = _curate_split(_docs_with_near_dups(spark, sf_dir))
    cfg = PC.CurationConfig(
        min_quality=0.55,
        hash_mode="md5",
        decon_n=4,
        decon_hashed=False,
        quota=40,
        quota_skew_salts=1,  # oracle pins the one-stage window
    )
    out = PC.curate_corpus(spark, corpus, benchmark=bench, config=cfg)
    _swap_chain_persists(out)
    return out["corpus"]


# --- the composed product: curation -> KG construction -------------------
#
# plans/full.py::curate_then_build — quality gate -> exact dedup ->
# minhash/CC keeper election -> decontamination, THEN mention
# detection -> pair join -> scoring -> triple emission over the
# curated survivors only. One recursive-CTE SQL statement: the
# curation chain CTEs (shared with the curate_corpus oracle, planted
# near-dup clones included) feed the mention/pair/scoring tail (shared
# with kg_pipeline_triples). The planted clones provably change the
# emitted n_docs supports vs the uncurated pipeline, so this checks
# the COMPOSITION — curation feeding the KG — not just the two halves.

_SQL_FULL_CURATED = (
    "\nWITH RECURSIVE "
    + _SQL_CURATE_CHAIN
    + f""",
dict(surface, entity_id, entity_type, vec_id) AS (
  VALUES {_DICT_VALUES}
),
mentions AS (
  SELECT DISTINCT c.doc AS doc_id, e.entity_id, e.entity_type, e.vec_id
  FROM clean c
  JOIN dict e
    ON (' ' || lower(c.text) || ' ') LIKE ('% ' || e.surface || ' %')
)"""
    + _SQL_PAIRS
    + _SQL_SCORED_TAIL
    + "SELECT subj, pred, obj, n_docs, score FROM scored"
)


@register("kg_full_curated", _SQL_FULL_CURATED)
def kg_full_curated(spark, sf_dir):
    """The full composed product (plans/full.py): the oracle-mode
    curation chain (md5 minhash, string-keyed 4-gram decon vs the %20
    benchmark split, no quota) in front of the production KG pipeline
    (Arrow trie mentions -> pair join -> float32 scoring -> triples)
    over the curated survivors. doc_key = repo (the doc_id string) so
    both engines elect identical dedup keepers."""
    from .deploy import ensure_shipped
    from .plans import curation as PCu
    from .plans import full as PF
    from .plans import pipeline as PP

    ensure_shipped(spark)
    corpus, bench = _curate_split(_docs_with_near_dups(spark, sf_dir))
    ccfg = PCu.CurationConfig(
        min_quality=0.55,
        hash_mode="md5",
        decon_n=4,
        decon_hashed=False,
        quota=0,
    )
    pcfg = PP.PipelineConfig(
        relations=[("op", "obj")],
        predicates={("op", "obj"): "acts_on"},
        threshold=-2.0,
    )
    out = PF.curate_then_build(
        spark,
        _as_code_corpus(corpus),
        _doc_dict_entries(),
        _load(spark, sf_dir, "embeddings"),
        benchmark=_as_code_corpus(bench),
        curation_config=ccfg,
        pipeline_config=pcfg,
        entities=_doc_dict_entities(spark),
        doc_key=F.col("repo"),
    )
    _swap_chain_persists(out)
    return out["triples"].select(
        "subj",
        "pred",
        "obj",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round("score", 6).alias("score"),
    )


# --- keeper election, isolated oracle (extras registry) ------------------
#
# dedup_keepers is SQL-checked inside the curate_corpus chain; this
# extra checks the operator IN ISOLATION over the exact-clone world:
# md5 minhash pairs -> recursive-CTE connected components -> max-quality
# (tie: min doc) keeper -> drop flags.

_SQL_KEEPERS = (
    "\nWITH RECURSIVE "
    + _SQL_DOCS_WITH_DUPS.replace("\nWITH ", "", 1)
    + f"""
, sh AS ({_SQL_GRAMS})
, g AS (SELECT doc, unnest(grams) AS g FROM sh)
, mh AS (SELECT doc, {_SQL_MH_MCOLS} FROM g)
, sg AS (SELECT doc, {_SQL_MH_SIG} FROM mh GROUP BY doc)
, banded AS (SELECT doc, unnest([{_SQL_MH_BANDS}]) AS bb FROM sg)
, b2 AS (SELECT doc, bb.band AS band, bb.bucket AS bucket FROM banded)
, cand AS (
  SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
  FROM b2 x JOIN b2 y ON x.band = y.band AND x.bucket = y.bucket
  WHERE x.doc < y.doc
),
prs AS (
  SELECT doc_a, doc_b FROM (
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(a.grams || b.grams)) AS jaccard
    FROM cand c JOIN sh a ON a.doc = c.doc_a JOIN sh b ON b.doc = c.doc_b
  ) WHERE jaccard >= 0.5
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM prs
  UNION
  SELECT doc_b, doc_a FROM prs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v AND r.u <> e.v
),
clus AS (
  SELECT n.doc, least(n.doc, coalesce(r.mn, n.doc)) AS cluster
  FROM (SELECT DISTINCT u AS doc FROM edges) n
  LEFT JOIN (SELECT u, min(v) AS mn FROM reach GROUP BY u) r ON r.u = n.doc
),
q AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc, round({_SQL_QUALITY_EXPR}, 6) AS quality
  FROM docs2
),
cq AS (SELECT c.doc, c.cluster, q.quality FROM clus c JOIN q ON q.doc = c.doc),
mx AS (SELECT cluster, max(quality) AS mq FROM cq GROUP BY cluster),
keep2 AS (
  SELECT cq.cluster, min(cq.doc) AS keeper
  FROM cq JOIN mx ON mx.cluster = cq.cluster AND cq.quality = mx.mq
  GROUP BY cq.cluster
)
SELECT c.doc, c.cluster, k.keeper, c.doc <> k.keeper AS drop
FROM clus c JOIN keep2 k ON k.cluster = c.cluster
"""
)


@register_extra("dedup_keepers", _SQL_KEEPERS)
def dedup_keepers_q(spark, sf_dir):
    """Keeper election in isolation (operators/dedup.py::dedup_keepers):
    md5 minhash pairs over the exact-clone world -> transitive CC
    clusters -> quality-ranked keeper (tie: min doc) -> drop flags; the
    SQL replays CC with a recursive CTE and the same argmax."""
    from .functions.text import quality_score

    docs2 = _docs_with_dups(spark, sf_dir)
    pairs = DD.minhash_near_duplicates(
        docs2, "doc_id", "text", threshold=0.5, hash_mode="md5"
    )
    quality = docs2.select(
        F.col("doc_id").cast("string").alias("doc"),
        F.round(quality_score("text"), 6).alias("quality"),
    )
    out = DD.dedup_keepers(
        pairs, id_a="doc_a", id_b="doc_b",
        quality=quality, quality_id="doc", quality_col="quality",
    )
    return out.select("doc", "cluster", "keeper", "drop")


@register_extra(
    "curate_budget",
    f"""
SELECT lang AS grp,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_ws_tokens,
       CAST(sum(len(regexp_extract_all(text, '{TXT.BPE_PRETOKEN_PATTERN.replace("'", "''")}'))) AS BIGINT) AS n_bpe_tokens,
       round(CAST(sum(CAST(round({_SQL_QUALITY_EXPR}, 6) AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS mean_quality
FROM documents
GROUP BY lang
""",
)
def curate_budget(spark, sf_dir):
    """Per-lang corpus budget report (docs, whitespace tokens, BPE
    pretokens, mean quality) — the curation product's telemetry; the
    quality mean accumulates as DECIMAL so both engines sum
    order-insensitively."""
    from .operators import curation as CUR

    d = _load(spark, sf_dir, "documents")
    return CUR.corpus_budget(d, group_col="lang", text_col="text")


# ---------------------------------------------------------------------------
# BM25 keyword retrieval (operators/retrieval.py): the full matching
# score set — no top-k boundary, so the oracle is cut-free; the
# deterministic (rounded score, doc_id) cut is pinned by unit tests.
# The SQL restates the whole plan: tokenize, postings restricted to
# the query terms, per-term document frequency, one-row corpus stats,
# and the Lucene-form idf with the operator's exact expression tree.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("merge", "spark", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register_extra(
    "text_bm25",
    f"""
WITH docs AS (
  SELECT doc_id,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS dl,
         string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents WHERE text IS NOT NULL
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl
  FROM docs
),
postings AS (
  SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
  FROM docs, unnest(toks) AS u(term)
  WHERE term IN {str(tuple(_BM25_TERMS))}
  GROUP BY doc_id, dl, term
),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings GROUP BY term),
scored AS (
  SELECT p.doc_id,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
         * ((p.tf * {_BM25_K1 + 1.0!r})
            / (p.tf + {_BM25_K1!r}
               * ({1.0 - _BM25_B!r} + {_BM25_B!r} * CAST(p.dl AS DOUBLE) / s.avgdl)))
         AS s
  FROM postings p JOIN dfreq d USING (term) CROSS JOIN stats s
)
SELECT doc_id, CAST(count(*) AS INT) AS n_terms, round(sum(s), 6) AS score
FROM scored GROUP BY doc_id
""",
)
def text_bm25(spark, sf_dir):
    """Okapi BM25 scores (operators/retrieval.py::bm25_scores) for
    every document matching any of three query terms — ranked keyword
    search over the corpus store.  Cut-free so the oracle checks the
    complete scored set; bm25_topk's deterministic (rounded score,
    doc_id) cut over this set is unit-pinned.  Float policy: the
    per-doc sum is an ORDERED fold Spark-side and rounds to 6 both
    sides (the pagerank convention)."""
    from .operators import retrieval as RET

    return RET.bm25_scores(
        _load(spark, sf_dir, "documents"),
        list(_BM25_TERMS),
        k1=_BM25_K1,
        b=_BM25_B,
    )
