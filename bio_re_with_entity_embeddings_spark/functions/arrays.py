"""Array/set helpers — the reference's multi-valued-cell encodings
(SURVEY.md section 2.3 N9-N11). Internal tables keep typed arrays;
these exist for the TSV-compat export edge and text assembly."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def set_to_string(col) -> Column:
    """N9: sorted ';;;'-joined set, empty -> NULL
    (prepare_entity_dataset.py:76-81)."""
    arr = F.sort_array(F.col(col) if isinstance(col, str) else col)
    return F.when(F.size(arr) == 0, F.lit(None).cast("string")).otherwise(
        F.concat_ws(";;;", arr)
    )


def collect_set_string(col) -> Column:
    """groupBy-side composition: collect -> sort -> ';;;' join."""
    return F.concat_ws(";;;", F.sort_array(F.collect_set(col)))


def pair_key(subj, obj) -> Column:
    """'src##tgt' export pair key (prepare_pair_dataset.py:37-39)."""
    s = F.col(subj) if isinstance(subj, str) else subj
    o = F.col(obj) if isinstance(obj, str) else obj
    return F.concat(s, F.lit("##"), o)


def doc_text(title, abstract) -> Column:
    """N10: 'title + \" \" + abstract', tabs removed, trimmed
    (data/pubtator.py:25-30)."""
    t = F.col(title) if isinstance(title, str) else title
    a = F.col(abstract) if isinstance(abstract, str) else abstract
    joined = F.concat_ws(" ", t, a)
    return F.trim(F.replace(joined, F.lit("\t"), F.lit("")))


def tokenize_words(col) -> Column:
    """N11: naive split on single space (learn_embeddings.py:29)."""
    return F.split(F.col(col) if isinstance(col, str) else col, " ")


def tokenize_tags(col) -> Column:
    """N11: tag split on ';;;' (learn_embeddings.py:30)."""
    return F.split(F.col(col) if isinstance(col, str) else col, ";;;")
