"""TSV-compat sources/sinks (SURVEY 2.1 S2-S4) — the reference's
on-disk interchange formats, kept for export parity. Internal tables
are Parquet/Iceberg; these writers exist so a reference user can diff
our exports against theirs byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.arrays import set_to_string


def read_tsv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S2: schema-enforced TSV read (never inferSchema in prod)."""
    return spark.read.csv(path, sep="\t", header=True, schema=schema)


def write_tsv(df: DataFrame, path: str) -> None:
    """S3: single-header TSV export."""
    df.write.mode("overwrite").csv(path, sep="\t", header=True)


def write_id_list(df: DataFrame, col: str, path: str) -> None:
    """S4: newline-joined sorted unique values (pubmed_ids.txt /
    vocab files, utils/pandas_utils.py:102-104)."""
    df.select(F.col(col).cast("string").alias("value")).distinct().orderBy(
        "value"
    ).write.mode("overwrite").text(path)


def export_doc2entity(doc2entity: DataFrame, path: str) -> None:
    """pubmed2entity.tsv parity (prepare_entity_dataset.py:64-74):
    entity_ids as sorted ';;;'-joined string, empty -> null."""
    write_tsv(
        doc2entity.select(
            "doc_id", set_to_string("entity_ids").alias("entity_ids_str")
        ),
        path,
    )


def export_instances(entity2doc: DataFrame, path: str) -> None:
    """instances.tsv parity (prepare_entity_dataset.py:46-62)."""
    write_tsv(
        entity2doc.select(
            "entity_id", set_to_string("articles").alias("articles_str")
        ),
        path,
    )


def export_pair_instances(triples: DataFrame, path: str) -> None:
    """pair instances.tsv parity (prepare_pair_dataset.py:66-68):
    source_id, target_id, ';;;'-joined article set."""
    write_tsv(
        triples.select(
            F.col("subj").alias("source_id"),
            F.col("obj").alias("target_id"),
            set_to_string("articles").alias("articles_str"),
        ),
        path,
    )


def export_doc2vec_input(tagged_docs: DataFrame, path: str) -> None:
    """doc2vec_input parity (prepare_doc2vec_input.py:41-52):
    'tags \\t text' rows; tags = ';;;'-joined entity ids."""
    write_tsv(
        tagged_docs.select(
            set_to_string("entity_ids").alias("tags"), F.col("text")
        ),
        path,
    )
