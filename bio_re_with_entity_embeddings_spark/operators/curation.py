"""Training-data curation operators (beyond the reference — the
selection/filtering layer a 100 TB LLM-corpus pipeline runs between
dedup and training). All pure DataFrame compositions, codegen'd end to
end; deterministic (hash-ordered, no rand()) so reruns and oracle
restatements are row-exact.
"""

from __future__ import annotations

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
        df.select(*sel, toks.alias("_tk"))
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


def quota_sample(
    df: DataFrame,
    key_col: str,
    quota: int,
    order_col: str,
) -> DataFrame:
    """Deterministic per-group quota sampling: keep at most ``quota``
    rows per ``key_col`` group, chosen by md5-hash order of
    ``order_col`` (uniform-but-reproducible — the standard cap on
    over-represented domains/languages in corpus curation; rand()-based
    sampling would not survive a rerun or an oracle comparison).

    Scale shape: one window over the same (key) partitioning any
    per-group cap needs; no global sort. Skewed keys: the window sorts
    within each group — for degenerate groups (10^8 rows of one
    domain) pre-filter with a cheap ``WHERE pmod(xxhash64(order), k) =
    0`` stage first; the md5 order makes the two-stage result identical
    to the one-stage one on the surviving rows."""
    w = Window.partitionBy(key_col).orderBy(
        F.md5(F.col(order_col).cast("string")), F.col(order_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
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
    aggregate. The per-doc gram arrays are already distinct
    (``shingles`` dedups), so n_hits is a plain count."""
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
    d = _exploded_grams(docs, id_col, text_col, n)
    b = _exploded_grams(benchmark, None, text_col, n).distinct()
    return (
        d.join(F.broadcast(b), "g", "inner")
        .dropDuplicates(["doc", "g"])  # dedupe HITS only (tiny)
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
