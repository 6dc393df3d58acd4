"""word2vec-format embedding export/import (M2 compat path).

The reference ships doctag vectors as a gensim-pickled ``.bin`` plus a
newline ``.vocab`` (``extract_document_vectors.py:22-37``) consumed via
``KeyedVectors`` (``examples/load_entity_embeddings.py:1-17``). gensim
is not a dependency here, so the compat interchange is the word2vec
C binary/text format — the one ``KeyedVectors.load_word2vec_format``
reads natively — written byte-exactly by hand:

    header  b"<n_vectors> <dim>\\n"
    entry   b"<tag> " + float32-little-endian vector bytes   (binary)
            "<tag> <v0> <v1> ...\\n"                          (text)

Embedding tables are vocabulary-sized (entities, not corpus), so the
export collects to the driver exactly like the reference does; the
``.vocab`` sidecar reuses the distributed sorted-text sink.

Documented divergence: the reference's ``.bin`` is a gensim *pickle*
(``docvecs.save``), loadable only by gensim itself; this writer emits
the portable word2vec format instead, which the same gensim API family
loads (``load_word2vec_format(path, binary=True)``).
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def save_word2vec_format(
    vectors: DataFrame,
    path: str,
    tag_col: str = "entity_id",
    vec_col: str = "embedding",
    binary: bool = True,
) -> int:
    """Write (tag, vector) rows as a word2vec-format file; returns the
    number of vectors written. Tags are sorted for determinism; a tag
    must not contain spaces or newlines (asserted)."""
    rows = sorted(
        (r[tag_col], r[vec_col])
        for r in vectors.select(tag_col, vec_col).collect()
    )
    if not rows:
        dim = 0
    else:
        dim = len(rows[0][1])
    for tag, vec in rows:
        if " " in tag or "\n" in tag:
            raise ValueError(f"word2vec tags cannot contain whitespace: {tag!r}")
        if len(vec) != dim:
            raise ValueError(f"ragged vector for {tag!r}: {len(vec)} != {dim}")
    if binary:
        with open(path, "wb") as out:
            out.write(f"{len(rows)} {dim}\n".encode("utf8"))
            for tag, vec in rows:
                out.write(tag.encode("utf8") + b" ")
                out.write(np.asarray(vec, dtype="<f4").tobytes())
    else:
        with open(path, "w", encoding="utf8") as out:
            out.write(f"{len(rows)} {dim}\n")
            for tag, vec in rows:
                vals = " ".join(repr(float(np.float32(x))) for x in vec)
                out.write(f"{tag} {vals}\n")
    return len(rows)


def load_word2vec_format(
    spark: SparkSession, path: str, binary: bool = True
) -> DataFrame:
    """Read a word2vec-format file back into an (entity_id, embedding
    array<float>) DataFrame — the roundtrip check for the writer and
    the ingest path for models exported by gensim itself."""
    rows: list[tuple[str, list[float]]] = []
    if binary:
        with open(path, "rb") as f:
            header = f.readline().decode("utf8").strip().split()
            n, dim = int(header[0]), int(header[1])
            vec_bytes = 4 * dim
            for _ in range(n):
                tag_chars = bytearray()
                while True:
                    ch = f.read(1)
                    if not ch or ch == b" ":
                        break
                    tag_chars.extend(ch)
                vec = struct.unpack(f"<{dim}f", f.read(vec_bytes))
                rows.append((tag_chars.decode("utf8").strip(), list(vec)))
    else:
        with open(path, "r", encoding="utf8") as f:
            n, dim = (int(x) for x in f.readline().split())
            for line in f:
                parts = line.rstrip("\n").split(" ")
                rows.append((parts[0], [float(x) for x in parts[1 : dim + 1]]))
    return spark.createDataFrame(
        rows, "entity_id string, embedding array<float>"
    )


def to_gensim_native(path_in: str, path_out: str, binary: bool = True) -> bool:
    """Close the last byte-compat gap with the reference when gensim IS
    installed: load the word2vec-format export via
    ``KeyedVectors.load_word2vec_format`` and re-save it with
    ``KeyedVectors.save`` — the gensim-pickle ``.bin`` layout the
    reference writes (``extract_document_vectors.py:22-31``) and its
    examples load. Returns False (no-op) when gensim is absent — this
    environment does not ship it, so the function is import-gated the
    same way the Iceberg V2 writer is jar-gated."""
    try:
        from gensim.models import KeyedVectors
    except ImportError:
        return False
    kv = KeyedVectors.load_word2vec_format(path_in, binary=binary)
    kv.save(path_out)
    return True
