"""PubTator-offset-format compat source (SURVEY 2.1 S1, 2.2 F1, 2.10 P3).

The reference reads the whole ~70 GB offset file into driver RAM and
splits on blank lines (``data/pubtator.py:336-355``); documents are
``PMID|t|title`` / ``PMID|a|abstract`` lines plus TSV annotation rows
(``:14-15, 53-68, 96-118``). Here the file is a distributed text scan:
line-type classification and document assembly are native expressions
(one shuffle on pubmed_id), so a 70 GB offset file is just another
partitioned input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.arrays import doc_text

TITLE_RE = r"^(\d+)\|t\|(.*)$"
ABSTRACT_RE = r"^(\d+)\|a\|(.*)$"


def read_offset_documents(spark: SparkSession, path: str) -> DataFrame:
    """offset file -> (pubmed_id, title, abstract, text).

    text = 'title + " " + abstract', tabs stripped, trimmed
    (Document.text(), data/pubtator.py:25-30).
    """
    lines = spark.read.text(path)
    classified = lines.select(
        F.regexp_extract("value", TITLE_RE, 1).alias("t_id"),
        F.regexp_extract("value", TITLE_RE, 2).alias("title"),
        F.regexp_extract("value", ABSTRACT_RE, 1).alias("a_id"),
        F.regexp_extract("value", ABSTRACT_RE, 2).alias("abstract"),
    )
    titles = classified.where(F.col("t_id") != "").select(
        F.col("t_id").alias("pubmed_id"), "title"
    )
    abstracts = classified.where(F.col("a_id") != "").select(
        F.col("a_id").alias("pubmed_id"), "abstract"
    )
    return (
        titles.join(abstracts, "pubmed_id", "left")
        .withColumn("abstract", F.coalesce("abstract", F.lit("")))
        .withColumn("text", doc_text("title", "abstract"))
    )


def read_offset_annotations(spark: SparkSession, path: str) -> DataFrame:
    """offset file -> raw annotation rows in the reference's wire format
    (pubmed_id, start, end, mention, entity_type, concept_id) — feed to
    functions/normalizers.py extractors. Malformed (<6 col) lines are
    dropped (F3, data/pubtator.py:101-103)."""
    lines = spark.read.text(path)
    cols = F.split("value", "\t")
    return (
        lines.where(
            (F.size(cols) >= 6) & ~F.col("value").rlike(r"^\d+\|[ta]\|")
        )
        .select(
            F.get(cols, 0).alias("pubmed_id"),
            F.get(cols, 1).try_cast("int").alias("start"),
            F.get(cols, 2).try_cast("int").alias("end"),
            F.get(cols, 3).alias("mention"),
            F.get(cols, 4).alias("entity_type"),
            F.get(cols, 5).alias("concept_id"),
        )
        .where(F.col("start").isNotNull() & F.col("end").isNotNull())
    )


def validate_spans(annotations: DataFrame, documents: DataFrame) -> DataFrame:
    """Span predicate F4 (data/pubtator.py:74-84): keep a mention iff
    the span is in bounds and text[start:end] case-insensitively equals
    the mention. Native substring compare — no Python."""
    joined = annotations.join(documents.select("pubmed_id", "text"), "pubmed_id")
    span = F.substring(
        F.col("text"), F.col("start") + 1, F.col("end") - F.col("start")
    )
    return joined.where(
        (F.col("start") <= F.length("text"))
        & (F.lower(span) == F.lower(F.col("mention")))
    ).drop("text")
