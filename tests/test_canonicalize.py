"""Canonicalization: candidate edges, connected components, remap."""

from __future__ import annotations

from pyspark.sql import functions as F

from bio_re_with_entity_embeddings_spark.operators import canonicalize as C


def test_connected_components_known_graph(spark):
    # components: {a,b,c,d} (chain), {x,y}, isolated handled by caller
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"), ("y", "x")], "a string, b string"
    )
    got = {r.node: r.component for r in C.connected_components(edges).collect()}
    assert got["b"] == "a" and got["c"] == "a" and got["d"] == "a"
    assert got["y"] == "x"
    assert got.get("a", "a") == "a" and got.get("x", "x") == "x"


def test_edge_signature_set_semantics(spark):
    """Convergence detection rests on _edge_signature: equal on equal
    DISTINCT sets regardless of row order/partitioning, different on
    subset and on same-count-different-members sets, stable on empty."""
    mk = lambda rows: spark.createDataFrame(rows, "u string, v string")
    sa = C._edge_signature(mk([("a", "b"), ("b", "c")]))
    sb = C._edge_signature(mk([("b", "c"), ("a", "b")]).repartition(7))
    sc = C._edge_signature(mk([("a", "b")]))
    sd = C._edge_signature(mk([("a", "b"), ("b", "d")]))
    assert sa == sb
    assert sa != sc and sa != sd and sc != sd
    assert C._edge_signature(mk([])) == C._edge_signature(mk([]))


def test_connected_components_long_chain(spark):
    n = 64
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)], "a string, b string"
    )
    comp = C.connected_components(edges)
    vals = {r.component for r in comp.collect()}
    assert vals == {"n000"}


def test_connected_components_adversarial_scale(spark):
    """VERDICT r3 #7: CC on adversarial shapes at 10^5 nodes — a long
    chain (worst case for label propagation) plus a big star and some
    random cross links — must (a) match a union-find reference exactly
    and (b) converge in O(log n) star rounds, not O(n)."""
    import random

    n_chain, n_star, n_rand = 60_000, 40_000, 5_000
    rng = random.Random(42)
    edges = [(f"c{i:06d}", f"c{i + 1:06d}") for i in range(n_chain - 1)]
    edges += [("s000000", f"s{i:06d}") for i in range(1, n_star)]
    # random links, including a few chain<->star bridges
    ids = [f"c{rng.randrange(n_chain):06d}" for _ in range(n_rand)]
    ids2 = [f"s{rng.randrange(n_star):06d}" for _ in range(n_rand)]
    edges += list(zip(ids, ids2))

    stats: dict = {}
    df = spark.createDataFrame(edges, "a string, b string").repartition(32)
    got = {
        r.node: r.component
        for r in C.connected_components(df, max_iterations=40, stats=stats).collect()
    }

    # union-find reference (path-compressed)
    parent: dict[str, str] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {}
    for a, b in edges:
        exp[a] = find(a)
        exp[b] = find(b)

    assert got == exp
    # O(log n): 2*log2(10^5) ~ 33; star rounds stay well under that
    # (a linear propagation would need ~60k rounds on the chain)
    assert stats["rounds"] <= 34, stats
    dict_df = spark.createDataFrame(
        [
            ("initcompat", "FN:0000", "fn"),
            ("initcompat", "FN:0001", "fn"),
            ("readblock", "FN:0002", "fn"),
            ("libcore01", "PKG:0001", "pkg"),
        ],
        "surface string, entity_id string, entity_type string",
    )
    m = {r.entity_id: r.canonical_id for r in C.canonical_map(dict_df).collect()}
    assert m["FN:0000"] == m["FN:0001"] == "FN:0000"
    assert m["FN:0002"] == "FN:0002"
    assert m["PKG:0001"] == "PKG:0001"


def test_candidate_edges_exact_branch_is_linear_star(spark):
    """An ambiguous surface shared by k entities must yield k-1 star
    edges (to the min entity), not the k*(k-1)/2 clique — the clique
    detonates at dictionary scale (10^5 entities sharing "p53" would
    be 10^10 pairs) and CC only needs connectivity. Components must be
    identical to the clique's."""
    k = 40
    rows = [("p53", f"GENE:{i:04d}", "gene") for i in range(k)]
    rows += [("unique_surface", "GENE:9999", "gene")]
    dict_df = spark.createDataFrame(
        rows, "surface string, entity_id string, entity_type string"
    )
    edges = C.surface_candidate_edges(dict_df).collect()
    star = {(r.a, r.b) for r in edges}
    # linear: k-1 edges, every one anchored at the min entity
    assert len(star) == k - 1
    assert all(a == "GENE:0000" for a, _ in star)
    # same components as the clique would give
    m = {r.entity_id: r.canonical_id for r in C.canonical_map(dict_df).collect()}
    assert all(m[f"GENE:{i:04d}"] == "GENE:0000" for i in range(k))
    assert m["GENE:9999"] == "GENE:9999"


def test_candidate_edges_bucket_gate(spark):
    """LSH buckets above max_bucket_size are skipped (dedup.py's gate):
    with the cap forced to 1 no near edges survive, while distinct
    ambiguous surfaces still connect through the exact star branch."""
    dict_df = spark.createDataFrame(
        [
            ("parse_frame_header", "A", "fn"),
            ("parse_frame_headers", "B", "fn"),
            ("shared_name", "X", "fn"),
            ("shared_name", "Y", "fn"),
        ],
        "surface string, entity_id string, entity_type string",
    )
    edges = {
        (r.a, r.b)
        for r in C.surface_candidate_edges(dict_df, max_bucket_size=1).collect()
    }
    assert ("A", "B") not in edges  # near branch fully gated
    assert ("X", "Y") in edges  # exact branch unaffected by the gate


def test_candidate_edges_near_identical_surfaces(spark):
    dict_df = spark.createDataFrame(
        [
            ("parse_frame_header", "A", "fn"),
            ("parse_frame_headers", "B", "fn"),  # near-identical
            ("zzqqxxyy", "C", "fn"),
        ],
        "surface string, entity_id string, entity_type string",
    )
    edges = {
        (r.a, r.b)
        for r in C.surface_candidate_edges(
            dict_df, jaccard_threshold=0.6
        ).collect()
    }
    assert ("A", "B") in edges
    assert not any("C" in e for e in edges)


def test_canonicalize_triples_reaggregates(spark):
    triples = spark.createDataFrame(
        [
            ("FN:0001", "calls", "FN:0002", 0.5, ["d1", "d2"], 2),
            ("FN:0000", "calls", "FN:0002", 0.7, ["d2", "d3"], 2),
        ],
        "subj string, pred string, obj string, score double, articles array<string>, n_docs long",
    )
    mapping = spark.createDataFrame(
        [("FN:0000", "FN:0000"), ("FN:0001", "FN:0000"), ("FN:0002", "FN:0002")],
        "entity_id string, canonical_id string",
    )
    got = C.canonicalize_triples(triples, mapping).collect()
    assert len(got) == 1
    row = got[0]
    assert row.subj == "FN:0000" and row.obj == "FN:0002"
    assert row.articles == ["d1", "d2", "d3"] and row.n_docs == 3
    assert row.score == 0.7
