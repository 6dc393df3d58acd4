"""PV-DBOW entity-embedding trainer (M1/M4 compat path).

Reference semantics: gensim Doc2Vec PV-DBOW over the tagged corpus —
``dm=0``, negative sampling, 20 single-epoch ``train`` calls with a
linearly decayed learning rate (``learn_embeddings.py:36-58``; configs
``resources/configurations/doc2vec-*.config``). The north rule keeps
training OFF the hot path (the scoring kernel consumes pretrained
matrices); this module exists so a reference user can also TRAIN
without gensim, and to document the distributed formulation.

Spark shape — parameter-averaged mini-batch SGD (the formulation
Spark MLlib's Word2Vec uses):

1. vocab build: distributed aggregates (word counts -> ``min_count``
   filter; distinct tags); id maps are dimension-sized.
2. the (tag, word) skip-gram table is a DISTRIBUTED DataFrame
   (corpus-scale, never driver-side).
3. each epoch: broadcast the current parameter matrices; shard the
   pair table by hash; each shard trains locally inside ONE
   ``applyInPandas`` group (vectorized NumPy negative-sampling SGD, no
   per-row Python crossing the JVM); shards return only the rows they
   touched; touched rows are AVERAGED across shards and folded into
   the matrices driver-side (parameter matrices are vocabulary-sized —
   the same driver-side footprint as the reference's gensim model).
4. learning rate decays linearly per epoch from ``alpha`` to
   ``min_alpha`` (M4 schedule parity).

Determinism: all randomness flows from (seed, epoch, shard) — reruns
produce identical vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_vocab(
    tagged: DataFrame,
    tags_col: str = "tags",
    words_col: str = "words",
    min_count: int = 1,
) -> tuple[list[str], list[str], np.ndarray]:
    """(sorted tag list, sorted kept-word list, unigram^0.75 negative-
    sampling table) from distributed aggregates."""
    wc = (
        tagged.select(F.explode(words_col).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
        .orderBy("w")
        .collect()
    )
    words = [r["w"] for r in wc]
    counts = np.array([r["n"] for r in wc], dtype=np.float64)
    tags = [
        r["t"]
        for r in tagged.select(F.explode(tags_col).alias("t"))
        .distinct()
        .orderBy("t")
        .collect()
    ]
    noise = counts**0.75
    noise = noise / noise.sum() if len(noise) else noise
    return tags, words, np.cumsum(noise)


def train_pv_dbow(
    tagged: DataFrame,
    vector_size: int = 32,
    epochs: int = 10,
    negative: int = 5,
    alpha: float = 0.05,
    min_alpha: float = 0.005,
    min_count: int = 1,
    n_shards: int = 8,
    seed: int = 42,
    tags_col: str = "tags",
    words_col: str = "words",
    batch_size: int = 64,
    local_passes: int = 2,
) -> DataFrame:
    """tagged(tags array<string>, words array<string>) ->
    (entity_id, embedding array<float>) doctag vectors."""
    spark = tagged.sparkSession
    tags, words, noise_cdf = build_vocab(tagged, tags_col, words_col, min_count)
    tag_idx = {t: i for i, t in enumerate(tags)}
    word_idx = {w: i for i, w in enumerate(words)}
    n_tags, n_words, dim = len(tags), len(words), vector_size

    # distributed (tag_idx, word_idx) skip-gram table
    tag_map = spark.createDataFrame(
        list(tag_idx.items()), "t string, ti int"
    )
    word_map = spark.createDataFrame(
        list(word_idx.items()), "w string, wi int"
    )
    pairs = (
        tagged.select(F.explode(tags_col).alias("t"), F.col(words_col).alias("ws"))
        .select("t", F.explode("ws").alias("w"))
        .join(F.broadcast(tag_map), "t")
        .join(F.broadcast(word_map), "w")
        .select("ti", "wi")
        .persist()
    )
    pairs.count()

    rng = np.random.RandomState(seed)
    T = ((rng.rand(n_tags, dim) - 0.5) / dim).astype(np.float64)
    C = np.zeros((n_words, dim), dtype=np.float64)
    sc = spark.sparkContext

    out_schema = "kind int, idx int, vec array<double>"

    for epoch in range(epochs):
        lr = alpha - (alpha - min_alpha) * epoch / max(epochs - 1, 1)
        bc = sc.broadcast((T, C, noise_cdf, lr, negative, seed, epoch))

        def train_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
            T0, C0, cdf, lr_, neg, seed_, ep = bc.value
            Ts, Cs = T0.copy(), C0.copy()
            r = np.random.RandomState((seed_ * 1_000_003 + ep * 7919 + key[0]) & 0x7FFFFFFF)
            ti = pdf["ti"].to_numpy(np.int64)
            wi = pdf["wi"].to_numpy(np.int64)
            # mini-batch vectorized negative-sampling SGD; several local
            # passes per sync amortize the broadcast/average round-trip
            # (small batches matter: one giant batch = one gradient step)
            for _ in range(local_passes):
                order = r.permutation(len(ti))
                for start in range(0, len(order), batch_size):
                    sel = order[start : start + batch_size]
                    t, w = ti[sel], wi[sel]
                    negs = np.searchsorted(cdf, r.rand(len(sel), neg))
                    v = Ts[t]  # (b, d)
                    # positive
                    s = 1.0 / (1.0 + np.exp(-np.einsum("bd,bd->b", v, Cs[w])))
                    g = (1.0 - s) * lr_
                    dv = g[:, None] * Cs[w]
                    np.add.at(Cs, w, g[:, None] * v)
                    # negatives
                    sn = 1.0 / (1.0 + np.exp(-np.einsum("bd,bnd->bn", v, Cs[negs])))
                    gn = -sn * lr_
                    dv += np.einsum("bn,bnd->bd", gn, Cs[negs])
                    np.add.at(Cs, negs, gn[:, :, None] * v[:, None, :])
                    np.add.at(Ts, t, dv)
            touched_t = np.unique(ti)
            touched_w = np.unique(np.concatenate([wi]))
            rows = [(0, int(i), Ts[i].tolist()) for i in touched_t]
            rows += [(1, int(i), Cs[i].tolist()) for i in touched_w]
            return pd.DataFrame(rows, columns=["kind", "idx", "vec"])

        shard = F.pmod(
            F.xxhash64("ti", "wi", F.lit(epoch)), F.lit(n_shards)
        ).cast("int")
        updated = (
            pairs.withColumn("shard", shard)
            .groupBy("shard")
            .applyInPandas(train_shard, out_schema)
            .groupBy("kind", "idx")
            .agg(F.array(*[
                F.avg(F.element_at("vec", d + 1)) for d in range(dim)
            ]).alias("vec"))
            .collect()
        )
        for r_ in updated:
            mat = T if r_["kind"] == 0 else C
            mat[r_["idx"]] = np.asarray(r_["vec"], dtype=np.float64)
        bc.destroy()

    pairs.unpersist()
    rows = [(t, T[i].astype(np.float32).tolist()) for t, i in sorted(tag_idx.items())]
    return spark.createDataFrame(rows, "entity_id string, embedding array<float>")
