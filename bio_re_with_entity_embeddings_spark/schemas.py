"""Typed schemas for every pipeline table (SURVEY.md section 1.2).

The reference keeps schemas implicit (positional TSV columns, pandas
object dtypes — e.g. ``data/pubtator.py:96-118`` parses annotation rows
by column index); here every table has an explicit ``StructType`` and
multi-valued cells are typed arrays, never ``";;;"``-joined strings
(that encoding exists only at the TSV-compat export edge, see
``functions/arrays.py::set_to_string``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input corpus — BASELINE.json input_hint: one row per source file.
CORPUS = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

# Ingested corpus: + doc_id (stable key) and content_sha (lineage invariant).
DOCS = T.StructType(
    list(CORPUS.fields)
    + [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("content_sha", T.StringType(), False),
    ]
)

# Entity dictionary — analog of PubTator concept vocab + normalization
# maps (drug_mapping.tsv, DOID xrefs). Broadcast as an Aho-Corasick trie.
ENTITY_DICT = T.StructType(
    [
        T.StructField("surface", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
    ]
)

# One row per detected mention — the reference's ``Annotation``
# (data/pubtator.py:33-40) with doc-relative char span.
MENTIONS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("mention", T.StringType(), False),
        T.StructField("begin", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
    ]
)

# pubmed2entity analog (data/pubtator.py:384-397).
DOC2ENTITY = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("entity_ids", T.ArrayType(T.StringType()), False),
    ]
)

# entity2pubmed / instances analog (data/pubtator.py:399-409).
ENTITY2DOC = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("articles", T.ArrayType(T.StringType()), False),
        T.StructField("n_docs", T.LongType(), False),
    ]
)

# Directed co-occurrence pairs per doc (prepare_pair_dataset.py:33-40).
PAIRS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("subj", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
    ]
)

# Emitted KG triples (pair instances.tsv, prepare_pair_dataset.py:66-68,
# plus the embedding score that gates emission).
TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("articles", T.ArrayType(T.StringType()), False),
        T.StructField("n_docs", T.LongType(), False),
    ]
)

# Per-partition checkpoint/metrics manifest (FIXTURES.md section 7) —
# replaces the reference's file-existence caching
# (prepare_entity_dataset.py:118-126) with exact, lineage-checked resume.
MANIFEST = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("content_sha_xor", T.StringType(), False),
        T.StructField("run_wall_ms", T.LongType(), False),
        T.StructField("run_id", T.StringType(), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)
