"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's key-based ``drop_duplicates``
(``utils/pandas_utils.py:109-120``), a 100 TB corpus needs content
dedup. All variants are pure DataFrame compositions (native exprs,
no Python on the hot path):

* exact        — fingerprint (md5 of normalized text) group-by
* minhash+LSH  — shingle -> per-seed min-hash signature -> banded
                 bucket join -> jaccard verify (candidates only)
* simhash      — 64-bit sign-aggregated token hashes; chunk-banded
                 candidate join + hamming verify (bit_count)
* n-gram jaccard — direct pairwise verify (small/partitioned inputs)
* embedding cosine — multi-table hyperplane-LSH candidates + exact
  cosine verify (crossJoin kept only as the validation baseline)

Scale shape: LSH banding turns O(n^2) pair comparison into
groupBy(band_hash) buckets; only bucket-mates are verified. Bucket
skew (a degenerate band value) is bounded by ``max_bucket_size`` on
``minhash_near_duplicates`` (oversized buckets are skipped per band)
plus AQE skew handling on the bucket join itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.parallel import CHEAP_MAP_MIN_BYTES, ensure_min_parallelism
from ..functions.text import fingerprint, shingles


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical (after whitespace/case normalization)
    documents: fingerprint, keeper id, group size, member ids.

    NO parallelism guard here (round 6): the map side is one md5
    fingerprint per doc — too cheap for the guard's exchange to ever
    pay for itself (measured: the guard DOUBLED the sf0.1 wall,
    0.35 -> 0.69 s, and the sf1.0 wall was fine without it; the
    groupBy shuffle already parallelizes the aggregate)."""
    return (
        df.select(F.col(id_col).cast("string").alias("doc"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc").alias("keeper"),
            F.count(F.lit(1)).alias("n_dups"),
            F.concat_ws(";;;", F.sort_array(F.collect_set("doc"))).alias("docs_str"),
        )
        .where(F.col("n_dups") > 1)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(doc, h0..h{n-1}) minhash signature columns over word-3-gram
    shingles.

    Shape: explode(shingles) -> one hash-aggregate with n_hashes
    ``min(hash(gram, seed))`` columns. PERF NOTE: this is ~20x
    faster than the "obvious" nested higher-order-function expression
    (transform(sequence, i -> array_min(transform(grams, xxhash64)))):
    Spark HOFs are interpreted per element-lambda call, while explode +
    min-agg is whole-stage-codegen'd with map-side partial aggregation
    (measured 21s -> 1.0s on 510 docs x ~54 shingles x 32 seeds).

    ``hash_mode``:

    * 'perm': ONE xxhash64 over the gram STRING, then n_hashes seeded
      xxhash64 re-hashes of that fixed-width value — the string walk
      is paid once instead of n_hashes times. NOTE the measurement
      that keeps the default at 'xxhash64': at 200k x 1200-token docs
      the whole signature stage is ~7 s either way (codegen'd hashing
      is not the bottleneck; the candidate VERIFY stage is, see
      ``minhash_near_duplicates``) — 'perm' matters only for much
      wider signatures (n_hashes >> 32) or longer grams. Distribution
      is as uniform as the direct mode; grams collide first at the
      shared ``_h``, a 2^-64 event minhash tolerates.
    * 'xxhash64': n_hashes independent seeded xxhash64 calls per gram
      (the pre-round-4 production mode, kept for comparability).
    * 'md5': min over seeded md5 hex strings — a hash every ANSI
      engine has, so the whole LSH dataflow is cross-checkable
      row-exactly in DuckDB; minhash only needs a uniform hash with a
      total order.

    Gram rows are built explode-FIRST (codegen'd concat/slice) rather
    than exploding a transform()-built array (interpreted per element);
    duplicate grams per doc are harmless here — min(hash) is
    multiplicity-invariant — so no distinct pass is needed at all.

    Input parallelism is guarded (functions/parallel.py): on a
    single-split scan the gram explode + per-gram hashing otherwise
    runs as ONE task (measured 24.7 s of a 29 s query at sf1.0,
    round 6); at scale the guard is a no-op."""
    from .curation import _exploded_grams

    # md5 mode's per-gram hash chain is heavy enough that the guard
    # wins even on the 0.6 MB sf0.1 input (3.5 s vs 5.0 s measured);
    # xxhash64's is not — bytes-gate it (functions/parallel.py).
    df = ensure_min_parallelism(
        df, id_col, min_bytes=0 if hash_mode == "md5" else CHEAP_MAP_MIN_BYTES
    )
    ex = _exploded_grams(df, id_col, text_col, 3)
    if hash_mode == "md5":
        # One md5 yields FOUR independent 32-bit chunks (8 hex chars
        # each): ceil(n/4) md5 calls per gram instead of n. The md5s
        # are materialized as projection columns BEFORE the aggregate —
        # agg expressions are evaluated independently, so min(substr(
        # md5(...))) x4 would re-hash four times without this.
        n_md5 = (n_hashes + 3) // 4
        ex = ex.select(
            "doc",
            *[
                F.md5(F.concat(F.lit(f"{j}:"), F.col("g"))).alias(f"m{j}")
                for j in range(n_md5)
            ],
        )
        hs = [
            F.min(
                F.substring(F.col(f"m{i // 4}"), (i % 4) * 8 + 1, 8)
            ).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    elif hash_mode == "perm":
        # One STRING hash per gram; the n_hashes minhash functions are
        # seeded xxhash64 re-hashes of that 8-byte value — hashing a
        # long is a few instructions vs walking a ~20-char string, so
        # the dominant per-gram cost is paid once instead of n_hashes
        # times. (A wrapping multiply-add permutation would be cheaper
        # still, but ANSI mode — on by default in Spark 4 — makes long
        # overflow an error, and ANSI-safe mod arithmetic costs more
        # than the fixed-width rehash.)
        ex = ex.select("doc", F.xxhash64("g").alias("_h"))
        hs = [
            F.min(F.xxhash64("_h", F.lit(i))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    else:
        hs = [
            F.min(F.xxhash64("g", F.lit(i))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    return ex.groupBy("doc").agg(*hs)


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hash_mode: str = "xxhash64",
    max_bucket_size: int = 2000,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs with exact jaccard verify.

    rows_per_band = n_hashes // bands; candidate pairs are doc pairs
    sharing >=1 band hash; each candidate is verified with the exact
    shingle jaccard. Output: (doc_a, doc_b, jaccard), doc_a < doc_b.

    ``max_bucket_size`` bounds the quadratic term: a degenerate bucket
    (boilerplate shingle signatures shared by millions of docs) is
    SKIPPED for candidate generation in that band (its members still
    pair via their other bands, and byte-identical boilerplate belongs
    to ``exact_duplicates``, which is linear). The cap makes worst-case
    candidate count <= n_buckets * cap^2 instead of unbounded.
    """
    rows_per_band = n_hashes // bands
    # Parallelism guard once for BOTH the signature and the verify-side
    # shingle subtrees (functions/parallel.py; the inner
    # minhash_signatures guard then sees a wide input and no-ops).
    # Bytes-gated in xxhash64 mode: its codegen'd per-gram hashing is
    # cheap enough that on the sub-MB sf0.1 input the guard's exchange
    # cost the production row ~+1 s (measured round 6); md5 mode keeps
    # the unconditional guard (its map side is the measured 25 s win).
    df = ensure_min_parallelism(
        df, id_col, min_bytes=0 if hash_mode == "md5" else CHEAP_MAP_MIN_BYTES
    )
    # Candidate generation shuffles ONLY (doc, band, bucket) — the
    # shingle arrays stay out of the bucket join and are re-joined just
    # for the (few) candidate pairs at verify time. NOTE a measured
    # anti-optimization kept OUT: restricting array construction to
    # candidate docs via a semi-join against the candidate set makes
    # the (expensive) signature subtree an input of the verify side
    # too — Spark re-derives it per consumer (md5 mode measured 2x
    # SLOWER) — while building arrays for all docs is linear,
    # shuffle-free, and embarrassingly parallel.
    # Verify-side representation (measured at 200k x 1200-token docs:
    # verify is 99% of wall — 1578 s of 1585 s — signatures just 7 s):
    # hashed modes intersect arrays of int64 GRAM HASHES — 8-byte
    # equality and ~3x less join shuffle than ~20-char strings; jaccard
    # identical up to 2^-64 in-doc hash collisions. md5 mode keeps the
    # string arrays (the DuckDB oracle replays them verbatim).
    if hash_mode == "md5":
        sh_tbl = df.select(
            F.col(id_col).cast("string").alias("doc"), shingles(text_col).alias("sh")
        )
    else:
        from .curation import _exploded_grams

        sh_tbl = (
            _exploded_grams(df, id_col, text_col, 3)
            .select("doc", F.xxhash64("g").alias("gh"))
            .groupBy("doc")
            .agg(F.sort_array(F.collect_set("gh")).alias("sh"))
        )
    sig = minhash_signatures(df, id_col, text_col, n_hashes, hash_mode)

    def band_key(b: int):
        cols = [F.col(f"h{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        if hash_mode == "md5":
            return F.md5(F.concat_ws("|", *cols, F.lit(str(b))))
        return F.xxhash64(*cols, F.lit(b))

    banded = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_key(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # Per-bucket size gate: one window count over the same (band,
    # bucket) partitioning the self-join shuffles on anyway.
    w = Window.partitionBy("band", "bucket")
    banded = banded.withColumn("_bsz", F.count(F.lit(1)).over(w)).where(
        F.col("_bsz") <= max_bucket_size
    ).drop("_bsz")

    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"], "inner")
        .where(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )
    # Jaccard WITHOUT materializing the union array (round 6): both sh
    # representations are distinct by construction (array_distinct
    # shingles; collect_set gram hashes), so |A ∪ B| = |A| + |B| − |A ∩ B|
    # exactly — the intersect is computed once and the union array
    # (the largest allocation of the verify loop) never exists.
    # Identical jaccard values; pair-set equality pinned by the oracle
    # (md5 mode) and the production-vs-md5 parity tests.
    jac = F.col("_i") / (
        F.size("sh_a") + F.size("sh_b") - F.col("_i")
    )
    return (
        # merge (sort-merge join), twice measured: the array table is
        # O(corpus), so (a) AQE must never broadcast it (round 4: the
        # shrunken hashed-long arrays dropped under the adaptive
        # threshold and the attempted broadcast blew
        # spark.driver.maxResultSize at 200k docs), and (b) a SHUFFLED
        # HASH join — the round-4 fix — builds an UNSPILLABLE
        # UnsafeHashedRelation of the array side per partition, which
        # OOM'd at 2M docs (~19 GB of gram arrays over 64 partitions;
        # "not enough memory to build hash map"). Sort-merge spills
        # gracefully AND measured faster (200k docs: 31.3 s vs 47.9 s,
        # identical pair set) — the 8-byte doc-id sort is cheap next to
        # carrying the arrays.
        cand.join(
            sh_tbl.withColumnsRenamed({"doc": "doc_a", "sh": "sh_a"}).hint(
                "merge"
            ),
            "doc_a",
        )
        .join(
            sh_tbl.withColumnsRenamed({"doc": "doc_b", "sh": "sh_b"}).hint(
                "merge"
            ),
            "doc_b",
        )
        .withColumn("_i", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("jaccard", jac.cast("double"))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.3,
    block_col: str | None = None,
) -> DataFrame:
    """Direct pairwise n-gram jaccard (the exact baseline the LSH path
    approximates). O(n^2) per block — use ``block_col`` (e.g. lang) to
    bound blocks; at scale this exists to validate the LSH variant on
    samples, not to run on the full corpus."""
    df = ensure_min_parallelism(df, id_col)
    base = df.select(
        F.col(id_col).cast("string").alias("doc"),
        shingles(text_col).alias("sh"),
        *( [F.col(block_col).alias("blk")] if block_col else [F.lit(1).alias("blk")] ),
    )
    a = base.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"), "blk")
    b = base.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"), "blk")
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        a.join(b, "blk")
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("jaccard", jac.cast("double"))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


_HEX = "0123456789abcdef"


def _md5_bit(h, b: int):
    """Bit b (0..63) of the 64-bit value spelled by the first 16 hex
    chars of md5 column ``h`` — pure string/int codegen exprs that every
    ANSI engine reproduces verbatim (portable simhash token hash)."""
    digit = F.substring(h, b // 4 + 1, 1)
    val = F.instr(F.lit(_HEX), digit) - 1
    return F.shiftright(val, 3 - (b % 4)).bitwiseAND(F.lit(1))


def simhash_table(
    df: DataFrame, id_col: str, text_col: str, hash_mode: str = "xxhash64"
) -> DataFrame:
    """(doc, sh64): 64-bit SimHash of whitespace tokens.

    Bit b of sh64 is 1 iff sum over tokens of sign(bit b of
    hash(token)) is positive. Shape: explode(tokens) -> one
    hash-aggregate with 64 codegen'd conditional sums, then a scalar
    bit-pack — same perf rationale as ``minhash_signatures`` (token-
    wise interpreted array folds are ~20x slower).

    ``hash_mode='md5'``: token bits come from the first 16 hex chars of
    md5(token) instead of xxhash64 — reproducible in any ANSI engine,
    used by the DuckDB oracle cross-check (same sign-aggregation)."""
    df = ensure_min_parallelism(df, id_col)
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ex = df.select(
        F.col(id_col).cast("string").alias("doc"), F.explode(toks).alias("t")
    )
    if hash_mode == "md5":
        ex = ex.select("doc", F.md5("t").alias("th"))
        bit = lambda b: _md5_bit(F.col("th"), b)  # noqa: E731
    else:
        ex = ex.select("doc", F.xxhash64("t").alias("th"))
        bit = lambda b: F.shiftright("th", b).bitwiseAND(F.lit(1))  # noqa: E731
    counts = ex.groupBy("doc").agg(
        *[
            F.sum(F.when(bit(b) == 1, F.lit(1)).otherwise(F.lit(-1))).alias(f"c{b}")
            for b in range(64)
        ]
    )
    packed = F.lit(0).cast("long")
    for b in range(64):
        packed = packed.bitwiseOR(
            F.when(
                F.col(f"c{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        )
    return counts.select("doc", packed.alias("sh64"))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 7,
    hash_mode: str = "xxhash64",
    max_bucket_size: int = 2000,
) -> DataFrame:
    """SimHash near-dup pairs: 8x8-bit chunk banding + exact hamming
    verify. Pigeonhole: a pair within hamming distance <= 7 MUST share
    at least one of the 8 chunks, so for ``max_hamming <= 7`` (the
    default) the banding is LOSSLESS — output is exactly every pair at
    hamming <= max_hamming. Values above 7 raise (silent recall loss is
    how near-dup pipelines rot); re-chunk wider instead.

    Scale shape (the part that matters at 10^9 docs):

    * ``max_hamming <= 3`` auto-selects COMPOSITE banding: all
      C(8,2)=28 two-chunk 16-bit keys. A pair differing in <= 3 chunks
      still agrees on >= 5, hence on at least one two-chunk composite —
      lossless, with 65536-value keys instead of 256, so bucket
      co-occupancy is n/65536 per table (Manku et al.'s block-key
      trick, WWW'07).
    * ``max_hamming in (4, 7]`` uses single-chunk banding (the only
      lossless option with 8 chunks of a 64-bit simhash).
    * ``max_bucket_size`` bounds the quadratic term in BOTH modes (same
      window gate as ``minhash_near_duplicates``): single-chunk keys
      have only 256 values, so at n docs an ungated self-join is
      ~n^2/32 candidates. Buckets above the cap are SKIPPED for
      candidate generation in that band; their members still pair via
      every OTHER shared band, so recall weakens only for pairs whose
      EVERY shared band is degenerate (near-identical boilerplate —
      which ``exact_duplicates`` catches linearly). Worst-case
      candidates <= n_bands * (key_space) * cap^2 / 2 instead of
      unbounded. Single-chunk banding SATURATES once n >> 256 * cap
      (every bucket exceeds the cap): at that scale run the composite
      mode (``max_hamming <= 3``), whose 65536-value keys stay under
      cap up to ~65536 * cap docs.
    """
    if max_hamming > 7:
        raise ValueError(
            "8-chunk banding guarantees recall only for hamming <= 7; "
            f"got max_hamming={max_hamming} — increase chunk count instead"
        )
    base = simhash_table(df, id_col, text_col, hash_mode)

    def ck(c: int):
        return F.shiftright(F.col("sh64"), c * 8).bitwiseAND(F.lit(0xFF))

    if max_hamming <= 3:
        combos = [(i, j) for i in range(8) for j in range(i + 1, 8)]
        structs = [
            F.struct(
                F.lit(t).alias("chunk"),
                (ck(i) * 256 + ck(j)).alias("ckey"),
            )
            for t, (i, j) in enumerate(combos)
        ]
    else:
        structs = [
            F.struct(F.lit(c).alias("chunk"), ck(c).alias("ckey"))
            for c in range(8)
        ]
    chunked = base.select(
        "doc",
        "sh64",
        F.explode(F.array(*structs)).alias("cc"),
    ).select("doc", "sh64", F.col("cc.chunk").alias("chunk"), F.col("cc.ckey").alias("ckey"))
    # Per-bucket size gate: one window count over the same (chunk,
    # ckey) partitioning the self-join shuffles on anyway.
    w = Window.partitionBy("chunk", "ckey")
    chunked = chunked.withColumn("_bsz", F.count(F.lit(1)).over(w)).where(
        F.col("_bsz") <= max_bucket_size
    ).drop("_bsz")
    a = chunked.select(F.col("doc").alias("doc_a"), F.col("sh64").alias("h_a"), "chunk", "ckey")
    b = chunked.select(F.col("doc").alias("doc_b"), F.col("sh64").alias("h_b"), "chunk", "ckey")
    return (
        a.join(b, ["chunk", "ckey"])
        .where(F.col("doc_a") < F.col("doc_b"))
        # hamming filter BEFORE the pair dedup: bit_count(xor) is a
        # codegen'd per-row expression, while dropDuplicates is a full
        # shuffle keyed on the pair — deduping the raw candidate
        # stream (~bands x cap^2/2 rows) exhausted executor memory at
        # 200k docs; deduping only the hamming survivors is the same
        # result (hamming is a function of the pair) at output size
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", "hamming")
    )


def derive_planes_per_table(
    n_vectors: int, target_bucket_size: int = 1024, floor: int = 4
) -> int:
    """Scale-safe hyperplane count: enough planes that EXPECTED bucket
    co-occupancy n / 2^planes stays near ``target_bucket_size``.
    ``max(floor, ceil(log2(n / target)))`` — 4 at sample scale (the
    round-1 default), 17 at 100M vectors, 20 at 10^9."""
    import math

    if n_vectors <= target_bucket_size:
        return floor
    return max(floor, math.ceil(math.log2(n_vectors / target_bucket_size)))


def embedding_lsh_candidates(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    planes_per_table: int | None = None,
    seed: int = 7,
    target_bucket_size: int = 128,
    max_bucket_size: int = 2000,
    n_vectors: int | None = None,
) -> DataFrame:
    """(id_a, id_b) pairs sharing a random-hyperplane bucket in >= 1 of
    ``n_tables`` independent hash tables. ONE Arrow kernel pass computes
    all n_tables*planes_per_table sign bits as an array of per-table
    keys (no 63-bit packing ceiling, so the plane count can grow with
    corpus size).

    Scale safety (both knobs exist because a FIXED plane count is a
    scale-killer: 4 planes = 16 buckets/table regardless of n, i.e.
    ~n^2/32 candidate pairs at large n):

    * ``planes_per_table=None`` (default) derives the plane count from
      the corpus size so expected co-occupancy tracks
      ``target_bucket_size`` (see ``derive_planes_per_table``;
      default 128, aligned with ``embedding_near_duplicates`` — the
      old 1024 default measurably ground through ~10^8 candidate
      pairs at 50k x 64-dim, BENCH/BASELINE.md). The
      size comes from the ``n_vectors`` hint when the caller already
      knows it; otherwise ONE eager ``vectors.count()`` job runs at
      plan-construction time (ADVICE r3 — pass the hint, or an
      explicit ``planes_per_table``, to avoid the extra scan; the
      oracle path pins ``planes_per_table`` and never counts).
    * ``max_bucket_size`` is the same per-(table, key) window gate as
      ``minhash_near_duplicates``: degenerate buckets (e.g. a mass of
      zero/near-zero vectors all hashing together) are skipped for
      candidate generation in that table — members still pair via
      their other tables — bounding candidates at
      <= n_tables * n * cap / 2 instead of quadratic.

    Recall for cosine >= 0.95 pairs at the floor (8 tables x 4 planes):
    1 - (1 - p^4)^8 ~ 0.9998 where p = 1 - theta/pi ~ 0.899; at 17
    planes/table it is 1 - (1 - p^17)^8 ~ 0.86 — the standard
    recall/candidate-volume trade, tunable via ``n_tables``."""
    tabbed = _lsh_tabbed_gated(
        vectors, [F.col(id_col).alias("id")], vec_col, n_tables,
        planes_per_table, seed, target_bucket_size, max_bucket_size,
        n_vectors,
    )
    return (
        tabbed.alias("x")
        .join(tabbed.alias("y"), ["tbl", "bkey"], "inner")
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def _lsh_tabbed_gated(
    vectors: DataFrame,
    carry: list,
    vec_col: str,
    n_tables: int,
    planes_per_table: int | None,
    seed: int,
    target_bucket_size: int,
    max_bucket_size: int,
    n_vectors: int | None,
) -> DataFrame:
    """The ONE bucketing stage every hyperplane-LSH consumer shares
    (candidate self-join and block verify must agree on which buckets
    exist and which are gated): per-table (tbl, bkey) membership rows
    carrying ``carry`` columns, plane count derived from the corpus
    size unless pinned, degenerate buckets dropped by the
    ``max_bucket_size`` window over the same (tbl, bkey) partitioning
    the consumers shuffle on anyway."""
    from .similarity import lsh_table_keys_udf

    if planes_per_table is None:
        if n_vectors is None:
            n_vectors = vectors.count()
        planes_per_table = derive_planes_per_table(n_vectors, target_bucket_size)
    keys = lsh_table_keys_udf(n_tables, planes_per_table, seed)
    tabbed = vectors.select(
        *carry, F.posexplode(keys(F.col(vec_col))).alias("tbl", "bkey")
    )
    w = Window.partitionBy("tbl", "bkey")
    return (
        tabbed.withColumn("_bsz", F.count(F.lit(1)).over(w))
        .where(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )


def embedding_near_duplicates(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, method: str = "lsh",
    n_tables: int = 8, planes_per_table: int | None = None, seed: int = 7,
    target_bucket_size: int = 128, max_bucket_size: int = 2000,
    n_vectors: int | None = None,
    verify_kernel: str = "block",
) -> DataFrame:
    """Embedding-cosine near-dup pairs.

    ``method='lsh'`` (default, the scale path): multi-table hyperplane
    LSH candidates + exact cosine verify — plane count derived from a
    corpus count and degenerate buckets capped (see
    ``embedding_lsh_candidates``), so candidate count is bounded at
    O(n * cap), never O(n^2). ``method='exact'``: brute crossJoin, the
    validation baseline for samples only.

    ``target_bucket_size`` defaults to 128 here (the candidate-volume
    dial: expected candidates ~ n * bucket/2 * tables; measured at 50k
    x 64-dim with the old 1024 target the verify stage ground through
    ~10^8 candidate pairs). Near-DUP thresholds (>= 0.95) lose no
    measurable recall from more planes — a twin pair at cosine ~ 1
    flips a sign bit with probability ~ theta/pi ~ 0.
    ``verify_kernel``:

    * ``'block'`` (the scale default): NO candidate-pair join at all —
      bucket members are grouped per (table, key) and each bucket
      computes its full cosine matrix in ONE Arrow matmul, emitting
      only pairs >= threshold; a final (id_a, id_b) aggregate dedups
      pairs found by several tables. Shuffle volume is vectors x
      n_tables (each vector ships once per membership, ~n_tables x
      dim x 4 B/vector) — the pair-join kernels ship BOTH full vectors
      per CANDIDATE, measured 270+ GB of spill at 500k x 64-dim
      (OOM-killed the JVM via tmpfs exhaustion) vs ~1 GB for block.
    * ``'arrow'``: candidate pairs joined back to vectors, one einsum
      per Arrow batch — fine when candidates are scarce.
    * ``'hof'``: the interpreted expression fold — the DuckDB-oracle
      arithmetic (sequential sum order), used by the contract query;
      correct but ~20x slower per pair and pair-join shaped.
    All kernels return id_a/id_b in the INPUT id dtype: block's Arrow
    schema needs a static long/string internally (min/max pair
    ordering is numeric or lexicographic accordingly) but casts back
    on output, so switching verify_kernel never changes the schema."""
    from .similarity import cosine_cols, cosine_pairs_udf

    if method != "exact" and verify_kernel == "block":
        id_dtype = dict(vectors.dtypes)[id_col]
        numeric = id_dtype in ("tinyint", "smallint", "int", "bigint")
        out_t = "long" if numeric else "string"
        tabbed = _lsh_tabbed_gated(
            vectors,
            [
                F.col(id_col).cast(out_t).alias("id"),
                F.col(vec_col).alias("v"),
            ],
            vec_col, n_tables, planes_per_table, seed,
            target_bucket_size, max_bucket_size, n_vectors,
        )

        import pandas as pd  # noqa: F811 (worker-side import)
        import numpy as np  # noqa: F811

        thr = float(threshold)
        empty_dtype = "int64" if numeric else object

        def block(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) < 2:
                return pd.DataFrame(
                    {"id_a": pd.Series([], dtype=empty_dtype),
                     "id_b": pd.Series([], dtype=empty_dtype),
                     "cosine": pd.Series([], dtype="float64")}
                )
            M = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"].values]
            )
            M = M / np.maximum(
                np.linalg.norm(M, axis=1, keepdims=True), 1e-30
            )
            S = M @ M.T
            ids = (
                pdf["id"].to_numpy(dtype=np.int64)
                if empty_dtype == "int64"
                else pdf["id"].to_numpy()
            )
            ia, ib = np.where(np.triu(S >= thr, k=1))
            a_ids, b_ids = ids[ia], ids[ib]
            lo = np.minimum(a_ids, b_ids)
            hi = np.maximum(a_ids, b_ids)
            keep = lo != hi
            return pd.DataFrame(
                {"id_a": lo[keep], "id_b": hi[keep],
                 "cosine": S[ia, ib][keep]}
            )

        found = tabbed.groupBy("tbl", "bkey").applyInPandas(
            block, f"id_a {out_t}, id_b {out_t}, cosine double"
        )
        # a pair can surface in several tables: dedup on the pair key
        # (cosine identical across tables -> max == any); ids are cast
        # BACK to the input dtype so switching verify_kernel never
        # changes the output schema (ADVICE r4 — the Arrow block schema
        # needs long/string internally, but that is an implementation
        # detail callers must not see)
        return found.groupBy("id_a", "id_b").agg(
            F.max("cosine").alias("cosine")
        ).select(
            F.col("id_a").cast(id_dtype).alias("id_a"),
            F.col("id_b").cast(id_dtype).alias("id_b"),
            "cosine",
        )

    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    if method == "exact":
        cand = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        pairs = embedding_lsh_candidates(
            vectors, id_col, vec_col, n_tables, planes_per_table, seed,
            target_bucket_size, max_bucket_size, n_vectors,
        )
        # merge, not shuffle_hash: same rationale as the minhash verify
        # — the vector table is O(corpus); a shuffled hash join builds
        # an unspillable hash map of it per partition (measured OOM at
        # 2M docs on minhash), sort-merge spills (block kernel is the
        # default anyway; this pair-join path serves oracle/small runs)
        cand = pairs.join(a.hint("merge"), "id_a").join(
            b.hint("merge"), "id_b"
        )
    if verify_kernel == "arrow":
        cos = cosine_pairs_udf()("v_a", "v_b")
    else:
        cos = cosine_cols("v_a", "v_b")
    return (
        cand.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def dedup_keepers(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    quality: DataFrame | None = None,
    quality_id: str = "doc",
    quality_col: str = "score",
) -> DataFrame:
    """Turn near-duplicate PAIRS (any of the minhash/simhash/embedding
    candidate outputs) into an actionable per-cluster decision:
    (doc, cluster, keeper, drop). Pairs are clustered transitively with
    the large/small-star connected-components operator (A~B, B~C =>
    one cluster even if A,C never paired — the semantics a drop list
    needs; keeping per-pair winners instead would drop BOTH of B's
    neighbors or neither deterministically).

    Keeper selection: highest ``quality`` score (ties -> min doc id)
    when a quality table is given, else min doc id — deterministic
    either way, so reruns produce identical drop lists.

    Scale shape: CC is O(log n) star rounds over the pair set (pairs
    are already candidate-bounded by the upstream cap knobs); keeper
    election is two map-combinable aggregates + a SORT-MERGE join
    back of (cluster, keeper) — NOT a broadcast (keepers is O(number
    of clusters), which grows with the corpus — the driver-collect
    failure mode the embedding verify hit at 500k rows) and NOT a
    shuffled hash join (its unspillable per-partition build side is
    the OOM class the minhash verify hit at 2M docs, both in
    BENCH/BASELINE.md; probed here at 4M pairs / 5M nodes, 49.8 s).
    Docs never in any pair are absent
    from the output — they are trivially kept (union them in as
    ``drop=false`` only if a full roster is needed; avoids scanning
    the corpus here).
    """
    from .canonicalize import connected_components

    comp = connected_components(
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    ).select(F.col("node").alias("doc"), F.col("component").alias("cluster"))
    if quality is not None:
        q = quality.select(
            F.col(quality_id).alias("doc"),
            F.col(quality_col).cast("double").alias("_q"),
        )
        scored = comp.join(q, "doc", "left").na.fill({"_q": float("-inf")})
        # max quality, then MIN doc among the tied best: two map-side-
        # combinable aggregates (a single max_by(struct) cannot express
        # a descending-then-ascending composite over a string id)
        mx = scored.groupBy("cluster").agg(F.max("_q").alias("_mq"))
        keepers = (
            scored.join(mx, "cluster")
            .where(F.col("_q") == F.col("_mq"))
            .groupBy("cluster")
            .agg(F.min("doc").alias("keeper"))
        )
    else:
        keepers = comp.groupBy("cluster").agg(F.min("doc").alias("keeper"))
    return (
        comp.join(keepers.hint("merge"), "cluster")
        .select(
            "doc", "cluster", "keeper", (F.col("doc") != F.col("keeper")).alias("drop")
        )
    )


def winnowing_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 25,
    w: int = 16,
    min_shared: int = 2,
    hash_mode: str = "xxhash64",
    max_bucket_size: int = 200,
    kernel: str | None = None,
) -> DataFrame:
    """LOCAL-similarity near-dup pairs: documents sharing at least
    ``min_shared`` winnowing fingerprints (Schleimer SIGMOD'03). The
    complement of the global sketches — minhash needs whole-document
    Jaccard overlap, winnowing fires on one COPIED PASSAGE of length
    >= k + w - 1 chars regardless of how different the rest is (the
    contained-plagiarism / boilerplate-block case minhash misses).

    Output: (id_a, id_b, n_shared), id_a < id_b.

    Scale shape mirrors the banded joins: fingerprints are the bucket
    keys; a per-fp size gate (same ``max_bucket_size`` window as
    minhash buckets) drops degenerate fingerprints; capped candidates
    are <= n_fp * cap / 2, and the pair aggregate is map-side
    combinable on (id_a, id_b).

    Defaults are PASSAGE-scale and the gate is tight, both on a
    measurement: with toy-scale ``k=5`` char-grams on a 50k-doc
    shared-vocabulary corpus, most fingerprints recur across thousands
    of documents — each gated bucket of 2000 emits ~2M pair rows and
    the join detonated the JVM. A fingerprint shared by thousands of
    docs has idf ~ 0 and carries no pair-level signal; ``k=25, w=16``
    guarantees detection of any shared passage >= 40 chars (the MOSS
    operating range) while making cross-document fingerprint
    collisions meaningful, and ``max_bucket_size=200`` bounds the
    residual worst case. Tiny-fixture callers (and the DuckDB oracle,
    which pins every knob) pass small k explicitly.

    ``kernel``: ``'arrow'`` fingerprints each doc in one vectorized
    NumPy pass (``winnowing_fingerprints_arrow`` — the measured ~100x
    fingerprint-stage fix, round 5); ``'expr'`` is the posexplode +
    window expression path whose md5 mode the DuckDB oracle replays.
    Default (None): arrow for ``hash_mode='xxhash64'``, expr for
    ``'md5'``. The two kernels select DIFFERENT (equally valid)
    fingerprint sets — the shared-passage guarantee holds for both,
    exact pair equality across kernels is not promised."""
    from ..functions.text import (
        winnowing_fingerprints,
        winnowing_fingerprints_arrow,
    )

    if kernel is None:
        kernel = "arrow" if hash_mode == "xxhash64" else "expr"
    if kernel == "arrow":
        if hash_mode != "xxhash64":
            raise ValueError("kernel='arrow' supports hash_mode='xxhash64' only")
        fp = winnowing_fingerprints_arrow(df, id_col, text_col, k, w)
    else:
        fp = winnowing_fingerprints(df, id_col, text_col, k, w, hash_mode)
    wdw = Window.partitionBy("fp")
    gated = (
        fp.withColumn("_bsz", F.count(F.lit(1)).over(wdw))
        .where(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )
    return (
        gated.alias("x")
        .join(gated.alias("y"), "fp", "inner")
        .where(F.col("x.doc") < F.col("y.doc"))
        .groupBy(
            F.col("x.doc").alias("id_a"), F.col("y.doc").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
