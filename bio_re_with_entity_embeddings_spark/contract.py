"""Driver-contract queries: (PySpark DataFrame fn, DuckDB oracle SQL)
pairs over the driver-provided parquet tables (TESTDATA.md).

Every SQL-expressible operator from SURVEY.md section 2 gets a pair;
column names and value representations are aligned between the two
sides (the driver hashes values after sorting columns by name).
Conventions for cross-engine exactness:

* multi-valued cells -> sorted ';;;'-joined strings (the reference's
  own export encoding, prepare_entity_dataset.py:76-81),
* money aggregates -> DECIMAL sums (exact, no float summation order),
* per-row doubles -> identical IEEE expressions both sides,
* similarity scores -> rounded to 6 decimals both sides,
* timestamps -> formatted strings (UTC pinned).

Non-SQL-expressible ops (trie spans, minhash/simhash, LSH ANN) are in
``queries()`` without an oracle entry -> driver records rows-only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Secondary registry: queries whose operators are already evidenced by
# another driver-checked row (the driver's correctness window holds 50
# rows; see VERDICT r3).  These stay oracle-checked locally by
# tests/test_oracle_parity.py at the same sf, outside the driver window.
EXTRA_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
EXTRA_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def register_extra(name: str, sql: str | None = None):
    def deco(fn):
        EXTRA_QUERIES[name] = fn
        if sql is not None:
            EXTRA_ORACLES[name] = sql
        return fn

    return deco


def _load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# KG pipeline over the `documents` table (oracle-checkable corpus).
# The trie pipeline (operators/mentions.py) is the scale path over the
# source-code corpus; this literal-dictionary restatement cross-checks
# the same dataflow stage by stage against DuckDB.
# ---------------------------------------------------------------------------

# (surface, entity_id, entity_type, vec_id) — 'spark' is deliberately
# ambiguous (1 surface -> 2 ids, the MeSH->DrugBank explode analog).
DOC_DICT: list[tuple[str, str, str, int]] = [
    ("join", "OP:join", "op", 3),
    ("merge", "OP:merge", "op", 17),
    ("scan", "OP:scan", "op", 29),
    ("sort", "OP:sort", "op", 41),
    ("filter", "OP:filter", "op", 53),
    ("group", "OP:group", "op", 67),
    ("agg", "OP:agg", "op", 79),
    ("window", "OP:window", "op", 97),
    ("table", "OBJ:table", "obj", 101),
    ("row", "OBJ:row", "obj", 113),
    ("column", "OBJ:column", "obj", 131),
    ("batch", "OBJ:batch", "obj", 149),
    ("stream", "OBJ:stream", "obj", 151),
    ("vector", "OBJ:vector", "obj", 173),
    ("key", "OBJ:key", "obj", 191),
    ("query", "OBJ:query", "obj", 211),
    ("spark", "SYS:spark", "obj", 229),
    ("spark", "SYS:spark2", "obj", 233),
]

_DICT_VALUES = ", ".join(
    f"('{s}', '{e}', '{t}', {v})" for s, e, t, v in DOC_DICT
)

# Shared oracle CTEs: dictionary + word-boundary mention detection.
# (documents.text is [A-Za-z0-9_ ]-only — asserted in tests — so the
# space-padded LIKE here is EXACTLY the trie/token matcher's word-
# boundary semantics on this table, making the full trie pipeline
# oracle-checkable, not just its relational restatement.)
_SQL_PRELUDE_BODY = f"""dict(surface, entity_id, entity_type, vec_id) AS (
  VALUES {_DICT_VALUES}
),
mentions AS (
  SELECT DISTINCT d.doc_id, e.entity_id, e.entity_type, e.vec_id
  FROM documents d
  JOIN dict e
    ON (' ' || lower(d.text) || ' ') LIKE ('% ' || e.surface || ' %')
)
"""
_SQL_PRELUDE = "\nWITH " + _SQL_PRELUDE_BODY


def _dict_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        DOC_DICT, "surface string, entity_id string, entity_type string, vec_id long"
    )


# Token-probe eligibility: the padded-contains predicate
# `contains(' '||lower(text)||' ', ' '||surface||' ')` is EXACTLY
# token-set membership when every surface is space-free — ' s ' occurs
# in the padded text iff s equals one of the maximal single-space-
# delimited runs of text (tabs/newlines/punctuation stay inside a run
# and fail both predicates identically). Checked once against the
# static dict; a future spaced surface falls back to the nested loop.
_TOKEN_PROBE_OK = all(" " not in s for s, _, _, _ in DOC_DICT)


def _doc_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.parallel import ensure_min_parallelism

    # single-file scan => one task for the per-doc probes
    # (functions/parallel.py); no-op on a wide scan
    docs = ensure_min_parallelism(_load(spark, sf_dir, "documents"), "doc_id")
    if _TOKEN_PROBE_OK:
        # Round 6 (guide §3.1/§4.1): the nested-loop broadcast join
        # evaluated the contains predicate |docs| x |dict| times — each
        # a full scan of the ~300-char padded text. Exploding the
        # (deduped) space-split tokens and HASH-joining the broadcast
        # dict on exact token equality does |distinct tokens per doc|
        # O(1) hash probes instead, is whole-stage-codegen'd, and
        # plans a BroadcastHashJoin in place of the
        # BroadcastNestedLoopJoin. Same mention set by the equivalence
        # above (pinned by the DuckDB oracle, which keeps the LIKE).
        toks = docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.lower(F.col("text")), " ", -1))
            ).alias("_tok"),
        )
        dict_df = _dict_df(spark).select(
            "entity_id",
            "entity_type",
            "vec_id",
            F.col("surface").alias("_tok"),
        )
        return (
            toks.join(F.broadcast(dict_df), "_tok")
            .select("doc_id", "entity_id", "entity_type", "vec_id")
            .distinct()
        )
    # Project the padded lowercase text BEFORE the join (round 6,
    # guide §2.3 "project before"): a nested-loop join condition is
    # evaluated per (row, dict-entry) pair, so inlining the concat/
    # lower there recomputes them |dict| times per document; as
    # pre-projected columns each side's padding is computed once per
    # row. Same predicate, same mention set.
    docs = docs.select(
        "doc_id",
        F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" ")).alias("_pad"),
    )
    dict_df = _dict_df(spark).select(
        "entity_id",
        "entity_type",
        "vec_id",
        F.concat(F.lit(" "), F.col("surface"), F.lit(" ")).alias("_pat"),
    )
    return (
        docs.join(
            F.broadcast(dict_df),
            F.contains(F.col("_pad"), F.col("_pat")),
            "inner",
        )
        .select("doc_id", "entity_id", "entity_type", "vec_id")
        .distinct()
    )


@register(
    "kg_mentions",
    _SQL_PRELUDE
    + "SELECT doc_id, entity_id, entity_type FROM mentions",
)
def kg_mentions(spark, sf_dir):
    """Dictionary mention detection + linking (S1/F2/J3 analog)."""
    return _doc_mentions(spark, sf_dir).select("doc_id", "entity_id", "entity_type")


@register(
    "kg_doc2entity",
    _SQL_PRELUDE
    + """
SELECT doc_id,
       string_agg(DISTINCT entity_id, ';;;' ORDER BY entity_id) AS entity_ids_str,
       CAST(count(DISTINCT entity_id) AS BIGINT) AS n_entities
FROM mentions GROUP BY doc_id
""",
)
def kg_doc2entity(spark, sf_dir):
    """pubmed2entity analog (A1 + N9 export encoding)."""
    # ONE set aggregate (round 6): mixing count_distinct with a
    # non-distinct aggregate plans an Expand that doubles the shuffled
    # rows; the string and the count both come from the same collected
    # set, so derive n_entities as size() of it — identical by
    # definition (a set's size IS its distinct count).
    return (
        _doc_mentions(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("entity_id")).alias("_ids"))
        .select(
            "doc_id",
            F.concat_ws(";;;", "_ids").alias("entity_ids_str"),
            F.size("_ids").cast("long").alias("n_entities"),
        )
    )


@register(
    "kg_entity2doc",
    _SQL_PRELUDE
    + """
SELECT entity_id,
       string_agg(DISTINCT CAST(doc_id AS VARCHAR), ';;;'
                  ORDER BY CAST(doc_id AS VARCHAR)) AS articles_str,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM mentions GROUP BY entity_id
""",
)
def kg_entity2doc(spark, sf_dir):
    """entity2pubmed / instances analog (A2)."""
    # size(collect_set) == count(DISTINCT) by definition; avoids the
    # Expand a mixed distinct/non-distinct aggregate plans (round 6)
    return (
        _doc_mentions(spark, sf_dir)
        .groupBy("entity_id")
        .agg(
            F.sort_array(
                F.collect_set(F.col("doc_id").cast("string"))
            ).alias("_docs")
        )
        .select(
            "entity_id",
            F.concat_ws(";;;", "_docs").alias("articles_str"),
            F.size("_docs").cast("long").alias("n_docs"),
        )
    )


_SQL_PAIRS = """
, pairs AS (
  SELECT DISTINCT s.doc_id, s.entity_id AS subj, t.entity_id AS obj
  FROM mentions s JOIN mentions t ON s.doc_id = t.doc_id
  WHERE s.entity_type = 'op' AND t.entity_type = 'obj'
)
"""


def _doc_pairs(spark, sf_dir):
    m = _doc_mentions(spark, sf_dir)
    src = m.where(F.col("entity_type") == "op").select(
        "doc_id", F.col("entity_id").alias("subj")
    )
    tgt = m.where(F.col("entity_type") == "obj").select(
        "doc_id", F.col("entity_id").alias("obj")
    )
    return src.join(tgt, "doc_id", "inner").distinct()


@register(
    "kg_pairs",
    _SQL_PRELUDE + _SQL_PAIRS + "SELECT doc_id, subj, obj FROM pairs",
)
def kg_pairs(spark, sf_dir):
    """Doc-level co-occurrence pair expansion (J1+J2)."""
    return _doc_pairs(spark, sf_dir)


@register(
    "kg_doc2pairs",
    _SQL_PRELUDE
    + _SQL_PAIRS
    + """
SELECT doc_id,
       string_agg(DISTINCT subj || '##' || obj, ';;;'
                  ORDER BY subj || '##' || obj) AS pair_keys_str
FROM pairs GROUP BY doc_id
""",
)
def kg_doc2pairs(spark, sf_dir):
    """pubmed2pairs analog (A4, '##' pair-key export encoding)."""
    return (
        _doc_pairs(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                ";;;",
                F.sort_array(
                    F.collect_set(F.concat("subj", F.lit("##"), "obj"))
                ),
            ).alias("pair_keys_str")
        )
    )


@register(
    "kg_triples_support",
    _SQL_PRELUDE
    + _SQL_PAIRS
    + """
SELECT subj, 'acts_on' AS pred, obj,
       string_agg(DISTINCT CAST(doc_id AS VARCHAR), ';;;'
                  ORDER BY CAST(doc_id AS VARCHAR)) AS articles_str,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM pairs GROUP BY subj, obj
""",
)
def kg_triples_support(spark, sf_dir):
    """Pair-support aggregation -> triple rows (A3)."""
    # size(collect_set) == count(DISTINCT) by definition; avoids the
    # Expand a mixed distinct/non-distinct aggregate plans (round 6)
    return (
        _doc_pairs(spark, sf_dir)
        .groupBy("subj", "obj")
        .agg(
            F.sort_array(
                F.collect_set(F.col("doc_id").cast("string"))
            ).alias("_docs")
        )
        .select(
            "subj",
            F.lit("acts_on").alias("pred"),
            "obj",
            F.concat_ws(";;;", "_docs").alias("articles_str"),
            F.size("_docs").cast("long").alias("n_docs"),
        )
    )


_SQL_ENTITY_VECS = """
, entity_vecs AS (
  SELECT DISTINCT e.entity_id, e.vec_id, emb.embedding
  FROM dict e JOIN embeddings emb ON emb.vec_id = e.vec_id
)
"""


def _cosine_expr(a: str, b: str):
    """Native double-precision cosine over two array<float> columns,
    sequential fold — mirrors the oracle's expression exactly."""
    da = F.transform(F.col(a), lambda x: x.cast("double"))
    db = F.transform(F.col(b), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


_SQL_COSINE = """
list_sum(list_transform(list_zip(a.embedding, b.embedding),
         z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
/ (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
 * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


@register(
    "kg_triples_scored",
    _SQL_PRELUDE
    + _SQL_PAIRS
    + _SQL_ENTITY_VECS
    + f"""
, support AS (
  SELECT subj, obj, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM pairs GROUP BY subj, obj
)
SELECT s.subj, 'acts_on' AS pred, s.obj, s.n_docs,
       round({_SQL_COSINE}, 6) AS score
FROM support s
JOIN entity_vecs a ON a.entity_id = s.subj
JOIN entity_vecs b ON b.entity_id = s.obj
""",
)
def kg_triples_scored(spark, sf_dir):
    """Embedding-based pair scoring (M3) + support — native-expression
    variant (the Arrow-kernel variant is exercised by the pipeline)."""
    emb = _load(spark, sf_dir, "embeddings")
    vecs = (
        _dict_df(spark)
        .select("entity_id", "vec_id")
        .distinct()
        .join(F.broadcast(emb.select("vec_id", "embedding")), "vec_id", "inner")
    )
    # _doc_pairs ends in .distinct() on (doc_id, subj, obj), so per
    # (subj, obj) the doc_ids are unique by construction: count(1) is
    # count(DISTINCT doc_id) without the distinct-aggregate expand
    # (round 6)
    support = (
        _doc_pairs(spark, sf_dir)
        .groupBy("subj", "obj")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    a = vecs.select(
        F.col("entity_id").alias("subj"), F.col("embedding").alias("a_emb")
    )
    b = vecs.select(F.col("entity_id").alias("obj"), F.col("embedding").alias("b_emb"))
    return (
        support.join(F.broadcast(a), "subj", "inner")
        .join(F.broadcast(b), "obj", "inner")
        .select(
            "subj",
            F.lit("acts_on").alias("pred"),
            "obj",
            "n_docs",
            F.round(
                _cosine_expr("a_emb", "b_emb").alias("score"), 6
            ).alias("score"),
        )
    )


@register(
    "kg_semi_join_docs",
    _SQL_PRELUDE
    + """
SELECT d.doc_id, d.n_chars FROM documents d
WHERE EXISTS (SELECT 1 FROM mentions m
              WHERE m.doc_id = d.doc_id AND m.entity_id = 'OP:join')
""",
)
def kg_semi_join_docs(spark, sf_dir):
    """Article extraction semi-join (J5, extract_articles.py:14-51)."""
    docs = _load(spark, sf_dir, "documents")
    ids = (
        _doc_mentions(spark, sf_dir)
        .where(F.col("entity_id") == "OP:join")
        .select("doc_id")
    )
    return docs.join(ids, "doc_id", "left_semi").select("doc_id", "n_chars")


@register_extra(
    "kg_anti_join_docs",
    _SQL_PRELUDE
    + """
SELECT d.doc_id FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM mentions m WHERE m.doc_id = d.doc_id)
""",
)
def kg_anti_join_docs(spark, sf_dir):
    """Anti-join (J7): docs with no dictionary mention at all.
    Extras-registry since r5 (J7 also DuckDB-checked via the
    rel_anti_join extra; kg_semi_join_docs keeps the same dataflow
    driver-checked) — retired to make window room for kg_bgp_query,
    the KG read-path oracle."""
    docs = _load(spark, sf_dir, "documents")
    return docs.join(
        _doc_mentions(spark, sf_dir).select("doc_id"), "doc_id", "left_anti"
    ).select("doc_id")


@register(
    "kg_doc2vec_input",
    _SQL_PRELUDE
    + """
SELECT m.doc_id,
       string_agg(DISTINCT m.entity_id, ';;;' ORDER BY m.entity_id) AS tags_str,
       CAST(len(string_split_regex(trim(any_value(d.text)), '\\s+')) AS BIGINT) AS n_words
FROM mentions m JOIN documents d ON d.doc_id = m.doc_id
GROUP BY m.doc_id
""",
)
def kg_doc2vec_input(spark, sf_dir):
    """Doc2Vec input assembly (J6 + N10/N11): tags per doc + text
    token count (prepare_doc2vec_input.py:41-52)."""
    docs = _load(spark, sf_dir, "documents")
    tags = (
        _doc_mentions(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(";;;", F.sort_array(F.collect_set("entity_id"))).alias(
                "tags_str"
            )
        )
    )
    return tags.join(docs, "doc_id", "inner").select(
        "doc_id",
        "tags_str",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_words"),
    )


@register(
    "kg_entity_type_counts",
    _SQL_PRELUDE
    + """
SELECT entity_type,
       CAST(count(DISTINCT entity_id) AS BIGINT) AS n_entities,
       CAST(count(*) AS BIGINT) AS n_doc_mentions
FROM mentions GROUP BY entity_type
""",
)
def kg_entity_type_counts(spark, sf_dir):
    """Cardinality metrics (A7)."""
    return (
        _doc_mentions(spark, sf_dir)
        .groupBy("entity_type")
        .agg(
            F.count_distinct("entity_id").alias("n_entities"),
            F.count(F.lit(1)).alias("n_doc_mentions"),
        )
    )
