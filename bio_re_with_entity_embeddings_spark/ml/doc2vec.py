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

Parameter averaging vs gensim's hogwild: gensim threads share one
model and see each other's updates immediately; here shards train on
a broadcast SNAPSHOT and their touched rows (positives AND
negative-sampled context rows) are averaged at each sync. Rows touched
by one shard keep their full update; rows hot in k shards get the mean
(collision damping ~1/k) — convergence per epoch is slightly slower,
compensated by ``local_passes``. The trade buys a shuffle-free sync
whose traffic is O(touched rows), not O(vocab).

Determinism: all randomness flows from (seed, epoch, shard); shard
data is lexsorted before the seeded permutation and shard
contributions are averaged in shard order, so reruns produce identical
vectors regardless of partition layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def load_train_config(path: str) -> dict:
    """Reference JSON training-config parity
    (``learn_embeddings.py:97-101``; files like
    ``resources/configurations/doc2vec-0500.config``) -> keyword
    arguments for :func:`train_pv_dbow`.

    Mapping: ``iterations`` -> epochs; ``doc2vec_config``:
    ``vector_size``/``min_count`` straight through,
    ``learning_rate`` -> alpha, ``workers`` -> n_shards. The
    reference's ``adapt_learning_rate`` subtracts
    ``learning_rate_decay`` per iteration — the equivalent endpoint of
    our linear alpha->min_alpha schedule is ``alpha - decay *
    (iterations - 1)``; with adaptation off the rate is constant
    (min_alpha = alpha). ``dm`` must be 0 (this IS the PV-DBOW
    trainer); ``window_size``/``dbow_words`` have no effect in pure
    DBOW doctag training and are accepted but ignored."""
    import json

    with open(path, encoding="utf-8") as fh:
        cfg = json.load(fh)
    d2v = cfg.get("doc2vec_config", {})
    if d2v.get("dm", 0) != 0:
        raise ValueError(
            f"config {path}: dm={d2v['dm']} is PV-DM; this trainer is PV-DBOW (dm=0)"
        )
    epochs = int(cfg.get("iterations", 10))
    alpha = float(d2v.get("learning_rate", 0.05))
    if cfg.get("adapt_learning_rate"):
        decay = float(cfg.get("learning_rate_decay", 0.0))
        min_alpha = max(alpha - decay * max(epochs - 1, 0), alpha * 0.01)
    else:
        min_alpha = alpha
    out = dict(epochs=epochs, alpha=alpha, min_alpha=min_alpha)
    if "vector_size" in d2v:
        out["vector_size"] = int(d2v["vector_size"])
    if "min_count" in d2v:
        out["min_count"] = int(d2v["min_count"])
    if "workers" in d2v:
        out["n_shards"] = int(d2v["workers"])
    return out


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
            shard_id = key[0]
            r = np.random.RandomState((seed_ * 1_000_003 + ep * 7919 + shard_id) & 0x7FFFFFFF)
            ti = pdf["ti"].to_numpy(np.int64)
            wi = pdf["wi"].to_numpy(np.int64)
            # Canonical order BEFORE the seeded permutation: Spark makes
            # no row-order promise within an applyInPandas group, so the
            # gradient order must be a pure function of (seed, epoch,
            # shard, data), not of partition layout.
            canon = np.lexsort((wi, ti))
            ti, wi = ti[canon], wi[canon]
            # Context rows sampled only as NEGATIVES also receive
            # updates — they must be in the returned/averaged set or
            # their repulsion is discarded every sync.
            touched_neg: list[np.ndarray] = []
            # mini-batch vectorized negative-sampling SGD; several local
            # passes per sync amortize the broadcast/average round-trip
            # (small batches matter: one giant batch = one gradient step)
            for _ in range(local_passes):
                order = r.permutation(len(ti))
                for start in range(0, len(order), batch_size):
                    sel = order[start : start + batch_size]
                    t, w = ti[sel], wi[sel]
                    negs = np.searchsorted(cdf, r.rand(len(sel), neg))
                    touched_neg.append(negs.ravel())
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
            touched_w = np.unique(np.concatenate([wi, *touched_neg]))
            rows = [(int(shard_id), 0, int(i), Ts[i].tolist()) for i in touched_t]
            rows += [(int(shard_id), 1, int(i), Cs[i].tolist()) for i in touched_w]
            return pd.DataFrame(rows, columns=["shard", "kind", "idx", "vec"])

        def mean_vec(pdf: pd.DataFrame) -> pd.DataFrame:
            # Deterministic parameter average: sort contributions by
            # shard id (float addition is not associative — delivery
            # order must not leak into the result), one NumPy mean per
            # (kind, idx) instead of dim avg() agg expressions (the
            # round-2 shape was unwieldy at dim ~2000).
            srt = pdf.sort_values("shard")
            m = np.stack(srt["vec"].to_numpy()).mean(axis=0)
            return pd.DataFrame(
                {
                    "kind": [int(pdf["kind"].iloc[0])],
                    "idx": [int(pdf["idx"].iloc[0])],
                    "vec": [m.tolist()],
                }
            )

        shard = F.pmod(
            F.xxhash64("ti", "wi", F.lit(epoch)), F.lit(n_shards)
        ).cast("int")
        updated = (
            pairs.withColumn("shard", shard)
            .groupBy("shard")
            .applyInPandas(train_shard, "shard int, " + out_schema)
            .groupBy("kind", "idx")
            .applyInPandas(mean_vec, out_schema)
            .collect()
        )
        for r_ in updated:
            mat = T if r_["kind"] == 0 else C
            mat[r_["idx"]] = np.asarray(r_["vec"], dtype=np.float64)
        bc.destroy()

    pairs.unpersist()
    rows = [(t, T[i].astype(np.float32).tolist()) for t, i in sorted(tag_idx.items())]
    return spark.createDataFrame(rows, "entity_id string, embedding array<float>")
