"""Correctness of the non-oracle dedup/similarity operators."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bio_re_with_entity_embeddings_spark.operators import dedup as DD
from bio_re_with_entity_embeddings_spark.operators import similarity as SIM

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    dups = d.where(F.col("doc_id") < 10).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    return d.unionByName(dups).cache()


def test_exact_duplicates_finds_planted(docs):
    got = DD.exact_duplicates(docs, "doc_id", "text").toPandas()
    assert len(got) >= 10
    groups = {tuple(sorted(r.split(";;;"))) for r in got["docs_str"]}
    for i in range(10):
        assert tuple(sorted([str(i), str(100000 + i)])) in groups
    # keeper is the lexicographic min member (string ids)
    for r in got.itertuples():
        assert r.keeper == sorted(r.docs_str.split(";;;"))[0]


def test_minhash_recovers_exact_duplicates(docs):
    got = DD.minhash_near_duplicates(docs, "doc_id", "text", threshold=0.99)
    pairs = {(r.doc_a, r.doc_b) for r in got.collect()}
    for i in range(10):
        a, b = sorted([str(i), str(100000 + i)])
        assert (a, b) in pairs, f"planted dup {i} not recovered"


def test_minhash_candidates_subset_of_exact_jaccard(docs):
    """Every minhash-emitted pair must pass the exact-jaccard filter
    (the verify step is exact — no false positives at the threshold)."""
    mh = DD.minhash_near_duplicates(docs, "doc_id", "text", threshold=0.5)
    exact = DD.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
    mh_pairs = {(r.doc_a, r.doc_b) for r in mh.collect()}
    ex_pairs = {(r.doc_a, r.doc_b) for r in exact.collect()}
    assert mh_pairs <= ex_pairs


def test_simhash_finds_exact_duplicates(docs):
    got = DD.simhash_near_duplicates(docs, "doc_id", "text", max_hamming=0)
    pairs = {(r.doc_a, r.doc_b) for r in got.collect()}
    for i in range(10):
        a, b = sorted([str(i), str(100000 + i)])
        assert (a, b) in pairs


def test_matmul_topk_equals_brute_force(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    bf = SIM.brute_force_topk(emb, queries, k=5).toPandas()
    qrows = queries.select("vec_id", "embedding").collect()
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float32) for r in qrows])
    mm = SIM.topk_matmul(emb, qmat, [r["vec_id"] for r in qrows], k=5).toPandas()
    key = ["query_id", "neighbor_id", "rank"]
    assert sorted(map(tuple, bf[key].itertuples(index=False))) == sorted(
        map(tuple, mm[key].itertuples(index=False))
    )


def test_ann_lsh_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 20)
    bf = SIM.brute_force_topk(emb, queries, k=5).toPandas()
    ann = SIM.ann_topk(emb, queries, k=5, n_planes=4).toPandas()
    bf_set = set(map(tuple, bf[["query_id", "neighbor_id"]].itertuples(index=False)))
    ann_set = set(map(tuple, ann[["query_id", "neighbor_id"]].itertuples(index=False)))
    # ANN results must be a plausible approximation: nonempty, and all
    # emitted neighbors verified by exact cosine ordering within bucket.
    assert ann_set
    recall = len(bf_set & ann_set) / len(bf_set)
    assert recall >= 0.2, recall  # 4 planes, 64-dim random vectors


def test_embedding_near_duplicates_self_consistency(spark):
    """Default (LSH-bucketed) path: identical vectors share every
    bucket, so planted exact copies are always recovered."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(100)
    doubled = emb.unionByName(
        emb.where(F.col("vec_id") < 3).withColumn(
            "vec_id", F.col("vec_id") + 1000
        )
    )
    got = DD.embedding_near_duplicates(doubled, threshold=0.9999).toPandas()
    pairs = {(r.id_a, r.id_b) for r in got.itertuples()}
    for i in range(3):
        assert (i, 1000 + i) in pairs


def test_embedding_near_duplicates_lsh_matches_exact(spark):
    """Bucketed output == brute-force output on planted near-dups
    (tiny perturbations of real vectors -> cosine ~ 0.9999; 8x4-table
    recall at that band ~ 1 - 2e-4 — deterministic seed, pinned)."""
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(60)
    )
    near = emb.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 2000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.000001)).alias("embedding"),
    )
    base = emb.unionByName(near)
    lsh = DD.embedding_near_duplicates(base, threshold=0.999).toPandas()
    exact = DD.embedding_near_duplicates(base, threshold=0.999, method="exact").toPandas()
    key = lambda df: sorted((r.id_a, r.id_b) for r in df.itertuples())  # noqa: E731
    assert key(lsh) == key(exact)
    assert len(exact) >= 5
    # n_vectors hint: same derivation, no plan-time count job (ADVICE
    # r3) — identical pairs when the hint equals the true count
    hinted = DD.embedding_near_duplicates(
        base, threshold=0.999, n_vectors=65
    ).toPandas()
    assert key(hinted) == key(exact)


def test_simhash_banding_lossless_vs_all_pairs(docs):
    """8x8-bit chunk banding must emit EXACTLY every pair at hamming
    <= 7 (pigeonhole guarantee, incl. distances 4-7 that the old 4x16
    banding silently dropped)."""
    sh = DD.simhash_table(docs, "doc_id", "text")
    a = sh.select(F.col("doc").alias("doc_a"), F.col("sh64").alias("h_a"))
    b = sh.select(F.col("doc").alias("doc_b"), F.col("sh64").alias("h_b"))
    brute = (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .where(F.col("hamming") <= 7)
    )
    want = {(r.doc_a, r.doc_b, r.hamming) for r in brute.collect()}
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in DD.simhash_near_duplicates(docs, "doc_id", "text").collect()
    }
    assert got == want
    assert any(h >= 4 for _, _, h in want), "fixture must exercise hamming 4-7"


def test_simhash_rejects_unguaranteed_radius(docs):
    with pytest.raises(ValueError, match="hamming"):
        DD.simhash_near_duplicates(docs, "doc_id", "text", max_hamming=8)


def test_minhash_hash_modes_agree_on_planted(docs):
    md5_pairs = {
        (r.doc_a, r.doc_b)
        for r in DD.minhash_near_duplicates(
            docs, "doc_id", "text", threshold=0.99, hash_mode="md5"
        ).collect()
    }
    xx_pairs = {
        (r.doc_a, r.doc_b)
        for r in DD.minhash_near_duplicates(
            docs, "doc_id", "text", threshold=0.99, hash_mode="xxhash64"
        ).collect()
    }
    # jaccard ~1 pairs share every band under ANY uniform hash
    assert md5_pairs == xx_pairs
    assert len(md5_pairs) >= 10


def test_minhash_bucket_cap_bounds_degenerate_bucket(spark):
    """Adversarial flood: thousands of identical-signature docs share
    every LSH bucket — without the cap the bucket join is quadratic
    (~4.5M candidate pairs here). With the cap the flood is skipped
    (exact_duplicates owns byte-identical content, linearly) while
    normal-sized buckets still pair."""
    flood = spark.range(3000).select(
        F.col("id").cast("string").alias("doc_id"),
        F.lit("aa bb cc dd ee ff gg hh ii jj kk ll").alias("text"),
    )
    pair = spark.createDataFrame(
        [
            ("p1", "one two three four five six seven eight nine ten"),
            ("p2", "one two three four five six seven eight nine zzz"),
        ],
        "doc_id string, text string",
    )
    df = flood.unionByName(pair)
    got = DD.minhash_near_duplicates(
        df, "doc_id", "text", threshold=0.5, max_bucket_size=100
    ).toPandas()
    pairs = {(r.doc_a, r.doc_b) for r in got.itertuples()}
    assert ("p1", "p2") in pairs
    assert len(pairs) == 1, f"flood leaked {len(pairs) - 1} quadratic pairs"


def test_embedding_block_kernel_bucket_cap_and_parity(spark):
    """The block verify kernel must (a) respect max_bucket_size — a
    flood of identical vectors sharing every bucket is skipped, not
    verified quadratically — and (b) agree with the pair-join arrow
    kernel on a normal input."""
    # flood: 500 identical vectors + one genuine near-dup pair apart
    flood = spark.range(500).select(
        F.col("id").cast("int").alias("vec_id"),
        F.array(*[F.lit(float(j % 7 - 3)) for j in range(16)]).alias("embedding"),
    )
    pair = spark.createDataFrame(
        [
            (9001, [1.0] * 8 + [0.0] * 8),
            (9002, [1.0] * 8 + [0.000001] * 8),
        ],
        "vec_id int, embedding array<double>",
    )
    df = flood.unionByName(pair.select("vec_id", F.col("embedding").cast("array<float>")))
    got = DD.embedding_near_duplicates(
        df, threshold=0.999, planes_per_table=4, max_bucket_size=50
    ).toPandas()
    pairs = {(r.id_a, r.id_b) for r in got.itertuples()}
    assert (9001, 9002) in pairs
    assert len(pairs) == 1, f"flood leaked {len(pairs) - 1} quadratic pairs"

    # parity: block == arrow pair-join kernel on the sf sample
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(80)
    )
    kw = dict(threshold=0.4, n_tables=8, planes_per_table=4, seed=7)
    blk = DD.embedding_near_duplicates(emb, verify_kernel="block", **kw).toPandas()
    arw = DD.embedding_near_duplicates(emb, verify_kernel="arrow", **kw).toPandas()
    key = lambda df: sorted(  # noqa: E731
        (int(r.id_a), int(r.id_b), round(r.cosine, 9)) for r in df.itertuples()
    )
    assert key(blk) == key(arw)

    # string ids: the block kernel must handle non-numeric id columns
    # (lexicographic pair ordering) instead of a silent long cast
    semb = emb.select(
        F.concat(F.lit("doc-"), F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    sblk = DD.embedding_near_duplicates(semb, verify_kernel="block", **kw).toPandas()
    skey = {
        (r.id_a, r.id_b, round(r.cosine, 9)) for r in sblk.itertuples()
    }
    exp = {
        (f"doc-{a}", f"doc-{b}", c) if f"doc-{a}" < f"doc-{b}" else (f"doc-{b}", f"doc-{a}", c)
        for a, b, c in key(blk)
    }
    assert skey == exp


def test_embedding_index_sparse_ids(spark):
    """Dense remap: 10^12-range vec ids must not allocate max(id)+1
    rows; absent/null ids score 0 via the sentinel row."""
    from bio_re_with_entity_embeddings_spark.operators import scoring

    emb = spark.createDataFrame(
        [(10**12 + 7, [1.0, 0.0]), (10**12 + 9, [1.0, 0.0]), (5, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="sparse"):
        scoring.embedding_matrix(emb)
    mat, lut = scoring.embedding_index(emb)
    assert mat.shape == (4, 2)
    pairs = spark.createDataFrame(
        [("a", "b", 3), ("a", "missing", 1)], "subj string, obj string, n_docs long"
    )
    entities = spark.createDataFrame(
        [("a", 10**12 + 7), ("b", 10**12 + 9)], "entity_id string, vec_id long"
    )
    out = {
        r["obj"]: r["score"]
        for r in scoring.score_pairs(pairs, entities, emb).collect()
    }
    assert out["b"] == pytest.approx(1.0)
    assert out["missing"] == 0.0


def test_simhash_composite_banding_lossless_radius3(docs):
    """max_hamming <= 3 auto-selects two-chunk composite banding
    (28 tables x 16-bit keys); it must still emit EXACTLY every pair
    at hamming <= 3 (pigeonhole: <= 3 differing chunks => >= 5 equal
    => some two-chunk composite equal)."""
    sh = DD.simhash_table(docs, "doc_id", "text")
    a = sh.select(F.col("doc").alias("doc_a"), F.col("sh64").alias("h_a"))
    b = sh.select(F.col("doc").alias("doc_b"), F.col("sh64").alias("h_b"))
    brute = (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .where(F.col("hamming") <= 3)
    )
    want = {(r.doc_a, r.doc_b, r.hamming) for r in brute.collect()}
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in DD.simhash_near_duplicates(
            docs, "doc_id", "text", max_hamming=3
        ).collect()
    }
    assert got == want
    assert want, "fixture must exercise hamming <= 3"


@pytest.mark.parametrize("max_hamming", [7, 3])
def test_simhash_bucket_cap_bounds_degenerate_bucket(spark, max_hamming):
    """Adversarial flood: thousands of identical-simhash docs co-occupy
    every chunk bucket — without the cap the chunk self-join is
    quadratic (~4.5M candidates here). With the cap the flood is
    skipped (exact_duplicates owns byte-identical content, linearly)
    while a normal near-dup pair still pairs via its own buckets.
    Parametrized over both banding modes (single-chunk and composite)."""
    flood = spark.range(3000).select(
        F.col("id").cast("string").alias("doc_id"),
        F.lit("aa bb cc dd ee ff gg hh ii jj kk ll").alias("text"),
    )
    pair = spark.createDataFrame(
        [
            ("p1", "one two three four five six seven eight nine ten"),
            ("p2", "one two three four five six seven eight nine ten"),
        ],
        "doc_id string, text string",
    )
    got = DD.simhash_near_duplicates(
        flood.unionByName(pair),
        "doc_id",
        "text",
        max_hamming=max_hamming,
        max_bucket_size=100,
    ).toPandas()
    pairs = {(r.doc_a, r.doc_b) for r in got.itertuples()}
    assert ("p1", "p2") in pairs
    assert len(pairs) == 1, f"flood leaked {len(pairs) - 1} quadratic pairs"


def test_derive_planes_per_table_scales_with_n():
    assert DD.derive_planes_per_table(0) == 4
    assert DD.derive_planes_per_table(1024) == 4
    assert DD.derive_planes_per_table(100_000) == 7
    assert DD.derive_planes_per_table(100_000_000) == 17
    assert DD.derive_planes_per_table(10**9) == 20


def test_embedding_lsh_bucket_cap_bounds_degenerate_bucket(spark):
    """Adversarial flood: thousands of IDENTICAL vectors land in the
    same bucket of every table (quadratic candidates without the cap);
    a distinct near-dup pair pointing elsewhere must still be found."""
    import pandas as pd

    rng = np.random.default_rng(3)
    base_dir = rng.normal(size=8)
    rows = [(i, (base_dir + rng.normal(scale=1e-6, size=8)).tolist())
            for i in range(2)]  # the planted near-dup pair
    flood_vec = rng.normal(size=8).tolist()
    rows += [(100 + i, flood_vec) for i in range(3000)]
    vecs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    got = DD.embedding_near_duplicates(
        vecs, threshold=0.999, max_bucket_size=100
    ).toPandas()
    pairs = {(r.id_a, r.id_b) for r in got.itertuples()}
    assert (0, 1) in pairs
    assert len(pairs) == 1, f"flood leaked {len(pairs) - 1} quadratic pairs"


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing invariant (Schleimer et al.): two docs sharing a
    substring of length >= k + w - 1 (= 8 here) share at least one
    fingerprint; disjoint-content docs share none; docs shorter than k
    yield no rows."""
    from bio_re_with_entity_embeddings_spark.functions.text import (
        winnowing_fingerprints,
    )

    shared = "xqzjvkwpy"  # 9 chars >= k + w - 1
    docs = spark.createDataFrame(
        [
            ("a", f"left padding {shared} more text here"),
            ("b", f"completely different start {shared} and end"),
            ("c", "nothing in common with the others at all"),
            ("d", "hi"),  # shorter than k=5
        ],
        "doc_id string, text string",
    )
    fp = winnowing_fingerprints(docs, "doc_id", "text", k=5, w=4).toPandas()
    by_doc = {d: set(g["fp"]) for d, g in fp.groupby("doc")}
    assert by_doc["a"] & by_doc["b"], "shared substring must share a fingerprint"
    assert not (by_doc["a"] & by_doc["c"] & by_doc["b"])
    assert "d" not in by_doc
    # density: kept fingerprints are a strict subset of all k-gram hashes
    texts = {r.doc_id: r.text for r in docs.collect()}
    for d in ("a", "b", "c"):
        assert len(by_doc[d]) < len(texts[d]) - 5 + 1


def test_decontaminate_hashed_equals_exact(spark):
    """The production (64-bit gram-hash broadcast) decontamination must
    equal the string-keyed oracle dataflow row-exactly."""
    from bio_re_with_entity_embeddings_spark.operators import curation as CUR

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = d.where(F.col("doc_id") % 20 == 0)
    corpus = d.where(F.col("doc_id") % 20 != 0)
    fast = CUR.decontaminate(corpus, bench, n=4).toPandas()
    exact = CUR.decontaminate_exact(corpus, bench, n=4).toPandas()
    assert dict(zip(fast["doc"], fast["n_hits"])) == dict(
        zip(exact["doc"], exact["n_hits"])
    )
    assert len(exact) > 0  # fixture actually exercises contamination


def test_quota_sample_deterministic_cap(spark):
    from bio_re_with_entity_embeddings_spark.operators import curation as CUR

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s1 = CUR.quota_sample(d, "lang", 7, "doc_id").toPandas()
    s2 = CUR.quota_sample(d.repartition(13), "lang", 7, "doc_id").toPandas()
    # per-group cap respected
    assert (s1.groupby("lang")["doc_id"].count() <= 7).all()
    # groups smaller than the quota survive whole
    sizes = d.toPandas().groupby("lang")["doc_id"].count()
    got_sizes = s1.groupby("lang")["doc_id"].count()
    for lang, n in sizes.items():
        assert got_sizes.get(lang, 0) == min(n, 7)
    # deterministic under repartitioning
    assert sorted(s1["doc_id"]) == sorted(s2["doc_id"])


def test_winnowing_near_duplicates_copied_passage(spark):
    """A passage of length >= k+w-1 copied between two otherwise
    different docs must pair them (the local-similarity case global
    minhash misses); unrelated docs must not pair."""
    passage = "the quick brown fox jumps over the lazy dog in autumn"
    rows = [
        ("a", "totally unrelated preamble here. " + passage),
        ("b", passage + " and then a completely different continuation"),
        ("c", "nothing in common with anyone else at all zzz qqq"),
    ]
    d = spark.createDataFrame(rows, "doc_id string, text string")
    got = DD.winnowing_near_duplicates(
        d, "doc_id", "text", k=5, w=4, min_shared=2
    ).toPandas()
    pairs = {(r.id_a, r.id_b) for r in got.itertuples()}
    assert ("a", "b") in pairs
    assert not any("c" in p for p in pairs)
    # xxhash64 and md5 modes agree on the pair set
    got_md5 = DD.winnowing_near_duplicates(
        d, "doc_id", "text", k=5, w=4, min_shared=2, hash_mode="md5"
    ).toPandas()
    assert pairs == {(r.id_a, r.id_b) for r in got_md5.itertuples()}


def test_winnowing_near_duplicates_bucket_gate(spark):
    """A boilerplate fingerprint shared by > max_bucket_size docs is
    dropped from candidate generation (ubiquitous = uninformative);
    docs still pair via their other, informative fingerprints."""
    boiler = "standard footer text appears everywhere verbatim today"
    # per-doc prefix = one distinct repeated letter, so no two docs
    # share ANY doc-specific 5-gram (digit prefixes would: "0 sta"
    # junction grams recur every 10th doc — a real, correct pairing)
    rows = [(f"d{i:03d}", chr(97 + i) * 12 + " " + boiler) for i in range(26)]
    rows += [("x1", "shared rare passage alpha beta gamma delta epsilon"),
             ("x2", "shared rare passage alpha beta gamma delta epsilon zz")]
    d = spark.createDataFrame(rows, "doc_id string, text string")
    got = DD.winnowing_near_duplicates(
        d, "doc_id", "text", k=5, w=4, min_shared=2, max_bucket_size=10
    ).toPandas()
    pairs = {(r.id_a, r.id_b) for r in got.itertuples()}
    # the 26 boilerplate docs share ONLY gated fingerprints -> no pairs
    assert not any(a.startswith("d") and b.startswith("d") for a, b in pairs)
    assert ("x1", "x2") in pairs


def test_minhash_null_text_docs_never_pair(spark):
    """Code-review r4: NULL-text docs must not pair with each other at
    jaccard 1.0 in the hashed verify mode (string mode drops them via
    null propagation; the modes must agree)."""
    docs = spark.createDataFrame(
        [
            ("n1", None),
            ("n2", None),
            ("p1", "one two three four five six seven eight nine ten"),
            ("p2", "one two three four five six seven eight nine zzz"),
        ],
        "doc_id string, text string",
    )
    for mode in ("xxhash64", "md5"):
        got = DD.minhash_near_duplicates(
            docs, "doc_id", "text", threshold=0.5, hash_mode=mode
        ).toPandas()
        pairs = {(r.doc_a, r.doc_b) for r in got.itertuples()}
        assert pairs == {("p1", "p2")}, (mode, pairs)


def test_dedup_keepers_transitive_clusters(spark):
    """A~B, B~C plus a separate D~E: two clusters; min-id keepers by
    default; quality table flips the keeper (ties -> min id)."""
    pairs = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("D", "E")], "id_a string, id_b string"
    )
    got = {
        r.doc: (r.cluster, r.keeper, r.drop)
        for r in DD.dedup_keepers(pairs).collect()
    }
    assert got == {
        "A": ("A", "A", False),
        "B": ("A", "A", True),
        "C": ("A", "A", True),
        "D": ("D", "D", False),
        "E": ("D", "D", True),
    }

    quality = spark.createDataFrame(
        [("A", 0.1), ("B", 0.9), ("C", 0.9), ("D", 0.5), ("E", 0.5)],
        "doc string, score double",
    )
    got_q = {
        r.doc: (r.keeper, r.drop)
        for r in DD.dedup_keepers(pairs, quality=quality).collect()
    }
    # B and C tie at 0.9 -> min id B wins; D/E tie -> D
    assert got_q["A"] == ("B", True)
    assert got_q["B"] == ("B", False)
    assert got_q["C"] == ("B", True)
    assert got_q["D"] == ("D", False)
    assert got_q["E"] == ("D", True)


def test_repetition_signals_hand_computed(spark):
    """'a a a b' -> 2-grams {'a a' x2, 'a b'}: n=3, dup=1-2/3, top=2/3;
    a no-repeat doc scores 0/uniform; a 1-token doc clamps to 1 gram."""
    from bio_re_with_entity_embeddings_spark.operators import curation as CUR

    d = spark.createDataFrame(
        [("r", "a a a b"), ("u", "w x y z"), ("s", "solo")],
        "doc_id string, text string",
    )
    got = {
        r.doc: (r.n_grams, r.dup_gram_frac, r.top_gram_frac)
        for r in CUR.repetition_signals(d).collect()
    }
    assert got["r"] == (3, round(1 - 2 / 3, 6), round(2 / 3, 6))
    assert got["u"] == (3, 0.0, round(1 / 3, 6))
    assert got["s"] == (1, 0.0, 1.0)


def test_pii_mask_positive_and_negative(spark):
    from bio_re_with_entity_embeddings_spark.functions import text as TXT

    rows = [
        ("e", "mail bob.smith+x@sub.example.co.uk now"),
        ("i", "host 192.168.0.17 up"),
        ("p1", "call +44 7700 900123 today"),
        ("p2", "fax 555-123-4567."),
        ("neg", "v1.2.3 has 12-34 items at 10.0 rating"),
    ]
    d = spark.createDataFrame(rows, "k string, t string")
    out = {
        r.k: (r.m, r.n_emails, r.n_ips, r.n_phones)
        for r in d.select(
            "k", TXT.pii_mask("t").alias("m"), *TXT.pii_counts(F.col("t"))
        ).collect()
    }
    assert out["e"] == ("mail <EMAIL> now", 1, 0, 0)
    assert out["i"] == ("host <IP> up", 0, 1, 0)
    assert out["p1"] == ("call <PHONE> today", 0, 0, 1)
    assert out["p2"] == ("fax <PHONE>.", 0, 0, 1)
    # three-octet versions, short digit runs, bare decimals untouched
    assert out["neg"] == ("v1.2.3 has 12-34 items at 10.0 rating", 0, 0, 0)


def test_quota_sample_salted_exact_and_auto(spark):
    """VERDICT r3 #2: the salted two-stage top-k must equal the
    one-stage window exactly on a skewed fixture, the auto mode must
    choose salting for a degenerate group, and the salted plan must
    actually split the group (two Window operators over different
    partitionings)."""
    from bio_re_with_entity_embeddings_spark.operators import curation as CUR

    # skewed fixture: one 'hub' key with 2000 rows, two small keys
    rows = (
        [("hub", f"d{i:05d}") for i in range(2000)]
        + [("sm1", f"x{i}") for i in range(3)]
        + [("sm2", f"y{i}") for i in range(9)]
    )
    d = spark.createDataFrame(rows, "k string, doc_id string").repartition(8)

    plain = CUR.quota_sample(d, "k", 5, "doc_id", skew_salts=1).toPandas()
    salted = CUR.quota_sample(d, "k", 5, "doc_id", skew_salts=17).toPandas()
    auto = CUR.quota_sample(d, "k", 5, "doc_id").toPandas()
    key = lambda p: sorted(map(tuple, p[["k", "doc_id"]].itertuples(index=False)))
    assert key(salted) == key(plain)
    assert key(auto) == key(plain)
    # caps + small-group survival
    assert (plain.groupby("k")["doc_id"].count() <= 5).all()
    assert (plain["k"] == "sm1").sum() == 3

    # auto mode on the skewed fixture must pick the salted plan:
    # two Window nodes, the first partitioned by (k, salt)
    auto_df = CUR.quota_sample(d, "k", 5, "doc_id")
    plan = auto_df._jdf.queryExecution().toString()
    assert plan.count("Window") >= 2, plan[:2000]
    assert "xxhash64" in plan.lower(), plan[:2000]
    # hint path skips the count job but must produce the same rows
    hinted = CUR.quota_sample(
        d, "k", 5, "doc_id", max_group_rows=2000
    ).toPandas()
    assert key(hinted) == key(plain)


def test_ivf_topk_recall_and_exactness_within_cells(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 20)
    bf = SIM.brute_force_topk(emb, queries, k=5).toPandas()
    ivf = SIM.ivf_topk(emb, queries, k=5, n_cells=16, n_probe=4).toPandas()
    bf_set = set(map(tuple, bf[["query_id", "neighbor_id"]].itertuples(index=False)))
    ivf_set = set(map(tuple, ivf[["query_id", "neighbor_id"]].itertuples(index=False)))
    assert ivf_set
    recall = len(bf_set & ivf_set) / len(bf_set)
    assert recall >= 0.2, recall  # 4/16 cells probed, random 64-dim
    # full-probe IVF == brute force (probing every cell is exhaustive)
    full = SIM.ivf_topk(emb, queries, k=5, n_cells=16, n_probe=16).toPandas()
    key = ["query_id", "neighbor_id", "rank"]
    assert sorted(map(tuple, full[key].itertuples(index=False))) == sorted(
        map(tuple, bf[key].itertuples(index=False))
    )


def test_ivf_trained_centroids(spark):
    """Distributed Lloyd: training must strictly reduce quantization
    error vs the seeded anchors, be deterministic for a fixed layout,
    and trained-IVF recall must not collapse below anchor-IVF."""
    import numpy as np

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").coalesce(4).cache()
    emb.count()
    M = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    a = SIM.anchors(M.shape[1], 8, seed=42)
    t1 = SIM.train_centroids(emb, n_cells=8, iters=4, seed=42)
    t2 = SIM.train_centroids(emb, n_cells=8, iters=4, seed=42)
    np.testing.assert_array_equal(t1, t2)  # deterministic, fixed layout

    def inertia(C):
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        return float((1.0 - (Mn @ C.T).max(axis=1)).sum())  # cosine distance

    assert inertia(t1) < inertia(a), (inertia(t1), inertia(a))

    queries = emb.where(F.col("vec_id") < 20)
    bf = SIM.brute_force_topk(emb, queries, k=5).toPandas()
    bf_set = set(map(tuple, bf[["query_id", "neighbor_id"]].itertuples(index=False)))
    got = SIM.ivf_topk(
        emb, queries, k=5, n_cells=8, n_probe=3, centroids=t1
    ).toPandas()
    got_set = set(map(tuple, got[["query_id", "neighbor_id"]].itertuples(index=False)))
    assert len(bf_set & got_set) / len(bf_set) >= 0.2


def test_bpe_pretoken_count_known_strings(spark):
    from bio_re_with_entity_embeddings_spark.functions.text import token_count_bpe

    rows = [
        ("a", "it's 2024, don't panic!"),
        ("b", "hello   world"),
        ("c", ""),
    ]
    d = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r.n for r in d.select("doc_id", token_count_bpe("text").alias("n")).collect()}
    # it|'s| 2024|,| don|'t| panic|! -> 8 ; hello|  world(' world' run) -> note
    # double spaces: ' ?\p{L}+' consumes ONE leading space, the stray
    # space is not a token -> hello + ' world' = 2
    assert got["a"] == 8, got
    assert got["b"] == 2
    assert got["c"] == 0


def test_embedding_lsh_derived_planes_above_floor(spark):
    """When the corpus count drives planes_per_table ABOVE the floor
    (here 1000 vectors / target 16 -> 6 planes), the multi-table key
    kernel still recovers planted identical vectors (identical vectors
    share every bucket at ANY plane count) and candidate volume shrinks
    vs the floor configuration."""
    import pandas as pd

    rng = np.random.default_rng(9)
    rows = [(i, rng.normal(size=8).tolist()) for i in range(1000)]
    rows += [(5000 + i, rows[i][1]) for i in range(3)]  # planted copies
    vecs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    assert DD.derive_planes_per_table(1003, target_bucket_size=16) == 6
    derived = DD.embedding_lsh_candidates(
        vecs, target_bucket_size=16
    )
    floor4 = DD.embedding_lsh_candidates(vecs, planes_per_table=4)
    n_derived, n_floor = derived.count(), floor4.count()
    pairs = {(r.id_a, r.id_b) for r in derived.collect()}
    for i in range(3):
        assert (i, 5000 + i) in pairs
    assert n_derived < n_floor, (n_derived, n_floor)


# --- ANN scale defaults (VERDICT r4 #1) ----------------------------------


def test_ann_defaults_are_scale_safe():
    """Pin the scale-safe defaults: both ANN top-k paths verify with
    the Arrow einsum kernel (the interpreted HOF fold is oracle mode
    only), and ann_topk derives its plane count from the corpus size
    instead of a fixed 6 (~n/64 candidates/query at any n)."""
    import inspect

    ann = inspect.signature(SIM.ann_topk).parameters
    assert ann["verify_kernel"].default == "arrow"
    assert ann["n_planes"].default is None
    ivf = inspect.signature(SIM.ivf_topk).parameters
    assert ivf["verify_kernel"].default == "arrow"


def test_ann_arrow_verify_equals_hof(spark):
    """Same candidates either kernel; cosines agree to float64 noise,
    so (query, neighbor) sets and ranks coincide on non-tied data."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    cols = ["query_id", "neighbor_id", "rank"]
    a = SIM.ann_topk(emb, q, k=5, n_planes=4, verify_kernel="arrow").toPandas()
    h = SIM.ann_topk(emb, q, k=5, n_planes=4, verify_kernel="hof").toPandas()
    assert sorted(map(tuple, a[cols].itertuples(index=False))) == sorted(
        map(tuple, h[cols].itertuples(index=False))
    )
    ai = SIM.ivf_topk(emb, q, k=5, n_probe=4, verify_kernel="arrow").toPandas()
    hi = SIM.ivf_topk(emb, q, k=5, n_probe=4, verify_kernel="hof").toPandas()
    assert sorted(map(tuple, ai[cols].itertuples(index=False))) == sorted(
        map(tuple, hi[cols].itertuples(index=False))
    )


def test_ann_derived_planes_recall_100k(spark):
    """The derived-plane + Arrow-verify path at volume: 100k random
    16-dim vectors, 20 queries each with a planted near-twin (cosine
    ~0.999). derive_planes_per_table(100k, 1024) = 7 planes; a twin at
    cosine 0.999 flips a sign bit w.p. ~theta/pi ~ 0.014, so hamming-1
    multi-probe recovers it w.p. ~0.996 — assert recall >= 0.9
    (deterministic: fixed data seed + fixed hyperplane seed)."""
    import pandas as pd

    rng = np.random.RandomState(7)
    n, dim, nq = 100_000, 16, 20
    base = rng.standard_normal((n, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    twins = base[:nq] + 0.045 * rng.standard_normal((nq, dim))
    mat = np.vstack([base, twins]).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(mat), dtype=np.int64),
         "embedding": [row.tolist() for row in mat]}
    )
    vecs = spark.createDataFrame(pdf).repartition(8)
    queries = vecs.where(F.col("vec_id") < nq)
    got = SIM.ann_topk(
        vecs, queries, k=5, n_vectors=n + nq
    ).toPandas()
    hits = {
        (r.query_id, r.neighbor_id)
        for r in got.itertuples()
    }
    recall = sum((q, n + q) in hits for q in range(nq)) / nq
    assert recall >= 0.9, recall


# --- two-tier language ID (script histogram + stopword vote) -------------


def test_lang_id_script_tier(spark):
    """The char-script tier identifies whitespace-free scripts the
    stopword vote is structurally blind to; Latin text still routes
    through the vote, and a Latin doc QUOTING one CJK word stays on
    the vote (ratio gate)."""
    from bio_re_with_entity_embeddings_spark.functions.text import lang_id

    rows = [
        ("zh", "这是一个中文句子没有空格"),
        ("ja", "これは日本語の文章です漢字も混ざる"),
        ("ko", "이것은 한국어 문장입니다"),
        ("th", "นี่คือประโยคภาษาไทย"),
        ("en", "the quick brown fox is in the yard for fun"),
        ("de", "der hund ist nicht ein katze und das ist zu viel"),
        ("quote", "the word 中 means middle in the text for all that is"),
        ("und", "qqq www eee rrr"),
    ]
    d = spark.createDataFrame(rows, "k string, text string")
    got = {r.k: r.p for r in d.select("k", lang_id("text").alias("p")).collect()}
    assert got["zh"] == "zh"
    assert got["ja"] == "ja"  # kana presence dominates the Han chars
    assert got["ko"] == "ko"
    assert got["th"] == "th"
    assert got["en"] == "en"
    assert got["de"] == "de"
    assert got["quote"] == "en"  # one quoted ideograph: below ratio gate
    assert got["und"] == "und"


def test_lang_id_script_tier_duckdb_parity(spark):
    """The script-tier decision replays identically in DuckDB via the
    same shared char-class patterns (the sf oracle only exercises the
    Latin path — fixture texts carry no CJK — so this pins the CJK
    branch cross-engine on planted rows)."""
    import duckdb

    from bio_re_with_entity_embeddings_spark.functions.text import (
        SCRIPT_MIN_RATIO,
        SCRIPT_RANGES,
        lang_id,
    )

    rows = [
        (0, "这是一个中文句子没有空格"),
        (1, "これは日本語の文章です"),
        (2, "이것은 한국어 문장입니다"),
        (3, "นี่คือประโยคภาษาไทย"),
        (4, "the plain latin text is here for the vote"),
        (5, "中文 mixed with latin words half and half maybe"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.p
        for r in d.select("doc_id", lang_id("text").alias("p")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sr = SCRIPT_RANGES
    sql = f"""
    SELECT doc_id,
           CASE WHEN (nk + nh + nz + nt) / CAST(greatest(l, 1) AS DOUBLE) >= {SCRIPT_MIN_RATIO}
                THEN CASE WHEN nk > 0 THEN 'ja' WHEN nh > 0 THEN 'ko'
                          WHEN nt >= nz THEN 'th' ELSE 'zh' END
                ELSE 'vote' END AS p
    FROM (
      SELECT doc_id,
             len(regexp_extract_all(text, '[{sr["kana"]}]')) AS nk,
             len(regexp_extract_all(text, '[{sr["hangul"]}]')) AS nh,
             len(regexp_extract_all(text, '[{sr["han"]}]')) AS nz,
             len(regexp_extract_all(text, '[{sr["thai"]}]')) AS nt,
             length(text) AS l
      FROM t)
    """
    oracle = {int(r[0]): r[1] for r in con.execute(sql).fetchall()}
    for k, v in oracle.items():
        if v == "vote":
            assert got[k] not in ("zh", "ja", "ko", "th"), (k, got[k])
        else:
            assert got[k] == v, (k, got[k], v)


def test_winnowing_arrow_kernel_guarantee(spark):
    """The Arrow rolling-hash kernel preserves the winnowing invariant
    (any shared byte run >= k + w - 1 shares a fingerprint; short docs
    yield nothing; density < all-gram count) and is the default for
    xxhash64-mode winnowing_near_duplicates."""
    import inspect

    from bio_re_with_entity_embeddings_spark.functions.text import (
        winnowing_fingerprints_arrow,
    )

    shared = "xqzjvkwpy"  # 9 >= k + w - 1 = 8
    docs = spark.createDataFrame(
        [
            ("a", f"left padding {shared} more text here"),
            ("b", f"completely different start {shared} and end"),
            ("c", "nothing in common with the others at all"),
            ("d", "hi"),
        ],
        "doc_id string, text string",
    )
    fp = winnowing_fingerprints_arrow(docs, "doc_id", "text", k=5, w=4).toPandas()
    by_doc = {d: set(g["fp"]) for d, g in fp.groupby("doc")}
    assert by_doc["a"] & by_doc["b"]
    assert not (by_doc["a"] & by_doc["b"] & by_doc["c"])
    assert "d" not in by_doc
    texts = {r.doc_id: r.text for r in docs.collect()}
    for d in ("a", "b", "c"):
        assert len(by_doc[d]) < len(texts[d]) - 5 + 1
    # pinned default: xxhash64-mode near-dup pairs run the Arrow kernel
    sig = inspect.signature(DD.winnowing_near_duplicates).parameters
    assert sig["kernel"].default is None  # None -> arrow for xxhash64
    got = DD.winnowing_near_duplicates(
        docs, "doc_id", "text", k=5, w=4, min_shared=1
    ).toPandas()
    assert ("a", "b") in {(r.id_a, r.id_b) for r in got.itertuples()}
