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


def test_connected_components_long_chain(spark):
    n = 64
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)], "a string, b string"
    )
    comp = C.connected_components(edges)
    vals = {r.component for r in comp.collect()}
    assert vals == {"n000"}


def test_canonical_map_merges_shared_surface(spark):
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
