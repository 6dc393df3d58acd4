"""Embedding-based pair scoring kernel (pipeline stage 5).

Reference semantics: each entity (and pair) has a dense doctag vector
(``extract_document_vectors.py:22-37``); relation extraction scores a
candidate (subj, obj) via those embeddings (``README.md:6-11``; cosine
nearest-neighbor form in ``examples/load_entity_embeddings.py:30-34``).
Training (gensim Doc2Vec, ``learn_embeddings.py:36-58``) is off the hot
path by design — the kernel consumes a *pretrained* embedding table.

Spark shape: the embedding table is dimension-sized (vocab of entities,
not corpus-sized), so it is collected once into a float32 NumPy matrix
and broadcast; scoring is an Arrow-batched pandas UDF doing one fancy-
indexed ``einsum`` per batch — no per-row Python, no shuffle (the UDF
is a projection). Entity->row mapping arrives as a broadcast-joined
``(entity_id, vec_id)`` dimension, so the kernel itself never sees
strings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def embedding_matrix(embeddings: DataFrame) -> np.ndarray:
    """Collect the (dimension-sized) embedding table into a float32
    matrix with row index == vec_id. Rows absent from the table are
    zero (score 0 -> below any positive threshold)."""
    rows = embeddings.select("vec_id", "embedding").collect()
    n = max(r["vec_id"] for r in rows) + 1
    dim = len(rows[0]["embedding"])
    mat = np.zeros((n, dim), dtype=np.float32)
    for r in rows:
        mat[r["vec_id"]] = np.asarray(r["embedding"], dtype=np.float32)
    return mat


def score_vectors(mat: np.ndarray, a_idx: np.ndarray, b_idx: np.ndarray) -> np.ndarray:
    """Cosine similarity between embedding rows a_idx and b_idx.

    Shared by the Spark kernel and the golden-fixture generator so the
    two sides are bit-identical (float32 accumulate, float64 result).
    """
    a = mat[a_idx]
    b = mat[b_idx]
    dots = np.einsum("ij,ij->i", a, b)
    norms = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    out = np.where(norms > 0, dots / np.where(norms == 0, 1, norms), 0.0)
    return out.astype(np.float64)


def score_pairs(
    pairs: DataFrame, entities: DataFrame, embeddings: DataFrame
) -> DataFrame:
    """(subj, obj) -> + score column.

    ``pairs`` must have distinct (subj, obj); ``entities`` is the
    broadcast-sized (entity_id, vec_id) dimension.
    """
    spark = pairs.sparkSession
    mat = embedding_matrix(embeddings)
    bc = spark.sparkContext.broadcast(mat)

    @F.pandas_udf(T.DoubleType())
    def cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        m = bc.value
        return pd.Series(
            score_vectors(
                m,
                a.to_numpy(dtype=np.int64),
                b.to_numpy(dtype=np.int64),
            )
        )

    vecs = entities.select("entity_id", "vec_id")
    subj_vec = vecs.withColumnsRenamed({"entity_id": "subj", "vec_id": "subj_vec"})
    obj_vec = vecs.withColumnsRenamed({"entity_id": "obj", "vec_id": "obj_vec"})
    return (
        pairs.join(F.broadcast(subj_vec), "subj", "left")
        .join(F.broadcast(obj_vec), "obj", "left")
        .withColumn(
            "score",
            F.when(
                F.col("subj_vec").isNotNull() & F.col("obj_vec").isNotNull(),
                cosine(F.col("subj_vec"), F.col("obj_vec")),
            ).otherwise(F.lit(0.0)),
        )
        .drop("subj_vec", "obj_vec")
    )
