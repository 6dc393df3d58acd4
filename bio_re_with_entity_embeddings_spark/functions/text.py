"""Text-analysis functions for large-scale training-data pipelines —
beyond the reference's surface (which only splits on spaces,
``learn_embeddings.py:29``), these are the document-quality operators a
100 TB corpus pipeline needs. All native Column expressions
(whole-stage codegen; zero Python on the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the stopword-vote language-ID
# heuristic. Deterministic, self-contained (no external models).
# SCOPE: whitespace-tokenized LATIN-SCRIPT languages only — scripts
# without whitespace word boundaries (zh/ja/ko/th) cannot be identified
# by token voting and are deliberately not listed; they are handled by
# the char-script-histogram tier in :func:`lang_id` instead (a previous
# pinyin-syllable "zh" list could never match real Chinese text).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour"],
    "it": ["il", "la", "di", "che", "e", "non", "un", "per"],
    "pt": ["o", "a", "de", "que", "e", "do", "um", "para"],
}

# Unicode script ranges for the whitespace-free tier (BMP blocks as
# literal char-class ranges — syntax Java regex and RE2 share, so the
# same pattern strings run in Spark's codegen'd regexp_count AND the
# DuckDB oracle). Scope: BMP only (rare Han extensions B+ ignored);
# kana presence dominates Han so mixed Japanese text reads 'ja'.
SCRIPT_RANGES = {
    "kana": "ぁ-ヿ",    # hiragana + katakana (ja)
    "hangul": "가-힣",  # hangul syllables (ko)
    "han": "一-鿿",     # CJK unified ideographs (zh)
    "thai": "ก-๛",    # thai (th)
}
# Minimum fraction of script characters for the script tier to decide;
# below it (e.g. a Latin doc quoting one Chinese word) the stopword
# vote runs instead.
SCRIPT_MIN_RATIO = 0.3


def token_count(col) -> Column:
    """Whitespace token count (BPE-ish regex split)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+")).cast("long")


# GPT-2-style pretokenizer pattern, lookahead-free so Java regex
# (Spark) and RE2 (DuckDB) agree token-for-token: contractions, then
# optionally-space-prefixed letter runs / digit runs / other-symbol runs.
BPE_PRETOKEN_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def token_count_bpe(col) -> Column:
    """BPE-pretokenizer token count (GPT-2 split pattern): the unit an
    LLM data pipeline budgets by, vs the whitespace count the reference
    uses. Counts pretokens — a lower bound on (and strongly correlated
    with) the post-merge BPE token count, with no vocabulary needed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_PATTERN), 0)
    ).cast("long")


def char_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c).cast("long")


def punct_ratio(col) -> Column:
    """Fraction of characters that are not [a-z0-9 ] (lowercased)."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    stripped = F.regexp_replace(c, "[a-z0-9 ]", "")
    return (F.length(stripped) / F.greatest(F.length(c), F.lit(1))).cast("double")


def stopword_ratio(col, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS[lang])))
    return (hits / F.greatest(F.size(toks), F.lit(1))).cast("double")


def quality_score(col) -> Column:
    """Composite [0,1] doc-quality heuristic: long enough, low
    punctuation, some stopwords. Deterministic integer-arithmetic-free
    formula shared with the DuckDB oracle."""
    c = F.col(col) if isinstance(col, str) else col
    len_ok = F.least(token_count(c) / F.lit(50.0), F.lit(1.0))
    return (
        (len_ok * 0.5 + (1.0 - punct_ratio(c)) * 0.3 + F.least(stopword_ratio(c) * 5.0, F.lit(1.0)) * 0.2)
    ).cast("double")


def lang_id(col) -> Column:
    """Two-tier language ID, all codegen'd native expressions:

    1. char-script histogram (whitespace-free scripts): when >= 30% of
       characters are kana/hangul/han/thai, decide ja/ko/zh/th by a
       fixed cascade — kana present -> ja (Japanese text mixes kana
       with Han), else hangul -> ko, else thai-majority -> th, else
       zh. Token voting is structurally blind to these languages (no
       whitespace word boundaries).
    2. stopword vote (Latin-script languages): argmax over
       per-language stopword hit counts; ties broken by language code
       order; no hits -> 'und'."""
    c = F.col(col) if isinstance(col, str) else col
    n_scr = {
        k: F.regexp_count(c, F.lit(f"[{r}]"))
        for k, r in SCRIPT_RANGES.items()
    }
    total_scr = n_scr["kana"] + n_scr["hangul"] + n_scr["han"] + n_scr["thai"]
    scr_ratio = total_scr / F.greatest(F.length(c), F.lit(1))
    script_pred = (
        F.when(n_scr["kana"] > 0, F.lit("ja"))
        .when(n_scr["hangul"] > 0, F.lit("ko"))
        .when(n_scr["thai"] >= n_scr["han"], F.lit("th"))
        .otherwise(F.lit("zh"))
    )
    toks = F.split(F.lower(F.trim(c)), r"\s+")

    def _hits(sw):
        # NB: a 2-arg lambda in a Spark HOF means (element, index) —
        # capture the stopword list via closure, never as a parameter.
        return F.size(F.filter(toks, lambda t: t.isin(sw)))

    scored = F.array(
        *[
            F.struct(_hits(sw).alias("hits"), F.lit(lang).alias("lang"))
            for lang, sw in sorted(STOPWORDS.items())
        ]
    )
    # argmax with deterministic tie-break: min on (-hits, lang).
    inv = F.array_min(
        F.transform(
            F.filter(scored, lambda s: s["hits"] > 0),
            lambda s: F.struct((-s["hits"]).alias("neg"), s["lang"].alias("lang")),
        )
    )
    vote = F.when(inv.isNull(), F.lit("und")).otherwise(inv["lang"])
    return F.when(scr_ratio >= SCRIPT_MIN_RATIO, script_pred).otherwise(vote)


def fingerprint(col) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text (stable across engines; exact-dedup key)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(norm)


def shingles(col, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (near-dup features)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS copy-detection scheme): hash every char
    ``k``-gram of the normalized text, slide a window of ``w``
    consecutive hashes, keep each window's MINIMUM; the distinct kept
    hashes are the doc's fingerprint set. Guarantees: any shared
    substring of length >= k + w - 1 between two documents yields at
    least one shared fingerprint, and selection density is bounded
    (~2/(w+1)) — the local-similarity analog of the global minhash
    sketch.

    ``hash_mode='xxhash64'`` (default): 8-byte long hashes — cheap to
    window-min and shuffle. ``'md5'``: hex-string hashes whose
    lexicographic min any ANSI engine reproduces — the DuckDB oracle
    mode (fp column is then a string).

    Output: (doc, fp) distinct rows. Scale shape: one posexplode (a
    row per char k-gram), ONE doc-keyed sort-window (the same shuffle a
    groupBy(doc) needs), distinct keyed (doc, fp) — all codegen'd, no
    Python. Docs shorter than k yield no rows.
    """
    from pyspark.sql import Window

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    # Shuffle the TEXT, not the grams (guide §2.3/§2.4, round 6): the
    # doc-keyed window below needs hash(doc) clustering; establishing it
    # on the one-row-per-doc table BEFORE the position explode moves
    # ~1/k-gram-factor of the bytes (each doc explodes to L gram rows of
    # ~50 B), and the window + final distinct then plan ZERO exchanges
    # (HashPartitioning(doc) satisfies both).  It also fixes the
    # single-split small-scan case (functions/parallel.py): the explode
    # + per-gram md5 was a measured 19.6 s single-task stage of a 24.5 s
    # query at sf1.0.  Explicit partition count: REPARTITION_BY_NUM is
    # exempt from AQE coalescing, which would otherwise re-fuse the
    # small input into one task.
    spark = df.sparkSession
    p = int(
        spark.conf.get(
            "spark.sql.shuffle.partitions",
            str(2 * spark.sparkContext.defaultParallelism),
        )
    )
    # explode positions FIRST, hash as a top-level codegen'd expr:
    # md5 inside a transform() lambda is interpreted per element
    # (measured ~20x penalty on this workload class, BENCH/BASELINE.md)
    grams = (
        df.select(
            F.col(id_col).cast("string").alias("doc"), norm.alias("_t")
        )
        .where(F.length("_t") >= k)
        .repartition(p, F.col("doc"))
        .select(
            "doc",
            "_t",
            F.explode(
                F.sequence(F.lit(1), F.length("_t") - k + 1)
            ).alias("pos"),
        )
        .select(
            "doc",
            "pos",
            (
                F.md5(F.substring(F.col("_t"), F.col("pos"), F.lit(k)))
                if hash_mode == "md5"
                else F.xxhash64(F.substring(F.col("_t"), F.col("pos"), F.lit(k)))
            ).alias("h"),
        )
    )
    frame = (
        Window.partitionBy("doc").orderBy("pos").rowsBetween(0, w - 1)
    )
    return (
        grams.select(
            "doc",
            F.min("h").over(frame).alias("fp"),
            F.count(F.lit(1)).over(frame).alias("_wn"),
        )
        .where(F.col("_wn") == w)  # complete windows only
        .select("doc", "fp")
        .distinct()
    )


_WINNOW_B = 0x9E3779B97F4A7C15  # odd -> invertible mod 2^64
_WINNOW_BINV = pow(_WINNOW_B, -1, 1 << 64)
_WINNOW_M1, _WINNOW_M2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB  # splitmix64


# per-k cache of B^(k-1) mod 2^64 (a Python bignum modpow per DOC was
# measurable at multi-million-doc scale)
_WINNOW_BK1: dict[int, object] = {}


def winnow_text(t, k: int, w: int, _guard: bool = True):
    """The Arrow winnowing kernel's per-document core, as a PURE
    function so the selection invariants are property-testable without
    a SparkSession: normalize (lower + whitespace collapse), rolling
    64-bit polynomial hash over byte ``k``-grams, splitmix64 finalize,
    sliding-window-``w`` min, unique. Returns a sorted int64 ndarray of
    kept fingerprints, or None for null/short input (no complete
    window — expr-path parity).

    ``_guard=False`` skips the per-call numpy seterr save/restore —
    for batch callers (the Arrow kernel) that already set
    ``np.seterr(over="ignore")`` once per partition; a geterr/seterr
    round-trip per DOCUMENT re-adds seconds at the scale this kernel
    was the measured 18x fix for."""
    import numpy as np

    if t is None:
        return None
    s = " ".join(str(t).lower().split())
    b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
    L = len(b)
    if L < k:
        return None
    bk1 = _WINNOW_BK1.get(k)
    if bk1 is None:
        bk1 = np.uint64(pow(_WINNOW_B, k - 1, 1 << 64))
        _WINNOW_BK1[k] = bk1
    err = np.geterr() if _guard else None
    if _guard:
        np.seterr(over="ignore")
    try:
        bu = b.astype(np.uint64)
        # H[i] = sum_{d<k} b[i+d] * B^(k-1-d)  (mod 2^64)
        # via one prefix sum: Q[m] = sum_{j<m} b[j]*BINV^j,
        # H[i] = (Q[i+k] - Q[i]) * B^i * B^(k-1)
        binv_pow = np.full(L, np.uint64(_WINNOW_BINV), dtype=np.uint64)
        binv_pow[0] = np.uint64(1)
        np.multiply.accumulate(binv_pow, out=binv_pow)
        q = np.zeros(L + 1, dtype=np.uint64)
        np.cumsum(bu * binv_pow, out=q[1:])
        b_pow = np.full(L - k + 1, np.uint64(_WINNOW_B), dtype=np.uint64)
        b_pow[0] = np.uint64(1)
        np.multiply.accumulate(b_pow, out=b_pow)
        h = (q[k:] - q[: L - k + 1]) * b_pow * bk1
        # splitmix64 finalize: min-selection density should not
        # correlate with byte content
        h ^= h >> np.uint64(30)
        h *= np.uint64(_WINNOW_M1)
        h ^= h >> np.uint64(27)
        h *= np.uint64(_WINNOW_M2)
        h ^= h >> np.uint64(31)
        if len(h) < w:
            return None  # complete windows only (expr parity)
        wins = np.lib.stride_tricks.sliding_window_view(h, w)
        return np.unique(wins.min(axis=1))
    finally:
        if _guard:
            np.seterr(**err)


def winnowing_fingerprints_arrow(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 25,
    w: int = 16,
) -> DataFrame:
    """Arrow/NumPy winnowing kernel — the SCALE path for
    :func:`winnowing_fingerprints` (same selection scheme, different
    hash family). Measured motivation: the expression path posexplodes
    one row per char position and window-sorts them (20k x 7KB docs =
    140M rows -> 213 s of a 216 s wall, BENCH/BASELINE.md round 5);
    this kernel keeps each document inside one vectorized NumPy pass —
    O(L) rolling 64-bit polynomial hash over byte ``k``-grams of the
    normalized text (splitmix64-finalized), sliding-window min via a
    strided view, unique — no explode, no window exchange, ~2 orders
    of magnitude less shuffled data (only the kept fingerprints leave
    the worker).

    Hash-family note: selection depends on hash VALUES, so this kernel
    keeps a (valid) different fingerprint SET than the expr path; the
    winnowing guarantee (any shared run >= k + w - 1 bytes shares a
    fingerprint) holds per kernel, and cross-kernel equality is
    deliberately NOT promised. Grams are BYTE k-grams of the UTF-8
    encoding (identical to char k-grams on ASCII corpora).

    Output: (doc string, fp long) distinct rows, like the expr path in
    xxhash64 mode."""
    import numpy as np
    import pandas as pd

    def run(batches):
        err = np.geterr()
        np.seterr(over="ignore")  # uint64 wraparound is the arithmetic
        try:
            # Drain the input stream before computing (round 6): while
            # this worker hashes a batch, the JVM's merged Arrow
            # reader/writer otherwise spins on the full socket buffer
            # (see operators/mentions.py and OPTIMIZATION_r06.md §12);
            # input here is (doc_id, text) only, so buffering a task's
            # partition is a few tens of MB at bench scale.
            batches = list(batches)
            for pdf in batches:
                out_doc: list = []
                out_fp: list = []
                for doc, t in zip(
                    pdf[id_col].astype(str).values, pdf[text_col].values
                ):
                    fps = winnow_text(t, k, w, _guard=False)
                    if fps is None:
                        continue
                    out_doc.extend([doc] * len(fps))
                    out_fp.append(fps)
                yield pd.DataFrame(
                    {
                        "doc": pd.Series(out_doc, dtype=object),
                        "fp": (
                            np.concatenate(out_fp).view(np.int64)
                            if out_fp
                            else np.array([], dtype=np.int64)
                        ),
                    }
                )
        finally:
            np.seterr(**err)

    return df.select(
        F.col(id_col).cast("string").alias(id_col), text_col
    ).mapInPandas(run, "doc string, fp long")


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("punct_ratio", punct_ratio(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("lang_pred", lang_id(text_col))
        .withColumn("fingerprint", fingerprint(text_col))
    )


# --- PII masking -----------------------------------------------------------
#
# Regexes deliberately restricted to syntax RE2 and Java share (no
# lookaround, no backrefs) so the SAME pattern string runs in Spark's
# codegen'd regexp_replace AND the DuckDB oracle.
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d[\d\- ]{7,}\d"


def pii_mask(col) -> Column:
    """Mask common PII spans with typed placeholders: emails ->
    <EMAIL>, IPv4 addresses -> <IP>, long digit runs with separators
    (phone-shaped) -> <PHONE>. Order matters and is fixed: emails
    first (their local parts contain digits), then IPs (dotted quads
    are NOT phone-shaped because the phone class excludes dots), then
    phones over the residue. Pure codegen'd projection — the standard
    pre-training redaction pass, at scan speed, no UDF."""
    c = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(c, PII_PHONE_RE, "<PHONE>")


def pii_counts(col) -> list[Column]:
    """Per-row PII span counts (pre-mask): n_emails, n_ips, n_phones.
    Same shared-syntax patterns as :func:`pii_mask`."""
    return [
        F.regexp_count(col, F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(col, F.lit(PII_IPV4_RE)).alias("n_ips"),
        F.regexp_count(col, F.lit(PII_PHONE_RE)).alias("n_phones"),
    ]
