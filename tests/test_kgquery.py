"""BGP triple-pattern queries (operators/kgquery.py): binding
semantics against hand-enumerable graphs, join-order invariance,
exists gates, and the broadcast/pushdown plan contract."""

from __future__ import annotations

import pytest

from bio_re_with_entity_embeddings_spark.operators.kgquery import (
    bgp_query,
    parse_patterns,
)

TRIPLES = [
    # a tiny heterogeneous KG: docs mention entities, entities act on
    # entities, entities have types
    ("D:1", "mentions", "A"),
    ("D:1", "mentions", "B"),
    ("D:2", "mentions", "A"),
    ("D:2", "mentions", "C"),
    ("A", "acts_on", "B"),
    ("A", "acts_on", "C"),
    ("B", "acts_on", "B"),  # self-loop for the same-var case
    ("A", "instance_of", "op"),
    ("B", "instance_of", "obj"),
    ("C", "instance_of", "obj"),
]


@pytest.fixture(scope="module")
def kg(spark):
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string"
    ).cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_single_pattern_constant_filter(kg):
    out = bgp_query(kg, [("?x", "acts_on", "?y")])
    assert _rows(out) == [("A", "B"), ("A", "C"), ("B", "B")]
    assert out.columns == ["x", "y"]


def test_chain_join(kg):
    # doc mentions ?x, ?x acts_on ?y
    out = bgp_query(kg, [("?d", "mentions", "?x"), ("?x", "acts_on", "?y")])
    assert _rows(out) == [
        ("D:1", "A", "B"),
        ("D:1", "A", "C"),
        ("D:1", "B", "B"),
        ("D:2", "A", "B"),
        ("D:2", "A", "C"),
    ]


def test_star_plus_type_constant(kg):
    # docs mentioning both ends of an acts_on edge whose obj is typed 'obj'
    out = bgp_query(
        kg,
        [
            ("?d", "mentions", "?x"),
            ("?x", "acts_on", "?y"),
            ("?d", "mentions", "?y"),
            ("?y", "instance_of", "obj"),
        ],
    )
    assert _rows(out) == [("D:1", "A", "B"), ("D:1", "B", "B"), ("D:2", "A", "C")]


def test_same_variable_twice_in_one_pattern(kg):
    # (?x acts_on ?x) -> only the self-loop
    out = bgp_query(kg, [("?x", "acts_on", "?x")])
    assert _rows(out) == [("B",)]


def test_variable_in_pred_position(kg):
    out = bgp_query(kg, [("A", "?p", "B")])
    assert _rows(out) == [("acts_on",)]


def test_disconnected_components_cross_join(kg):
    out = bgp_query(
        kg, [("?x", "instance_of", "op"), ("?y", "instance_of", "obj")]
    )
    assert _rows(out) == [("A", "B"), ("A", "C")]


def test_exists_gate_positive_and_negative(kg):
    pats = [("?x", "instance_of", "op")]
    assert _rows(bgp_query(kg, pats + [("A", "acts_on", "B")])) == [("A",)]
    assert _rows(bgp_query(kg, pats + [("C", "acts_on", "A")])) == []


def test_all_constant_query(kg):
    assert _rows(bgp_query(kg, [("A", "acts_on", "B")])) == [(True,)]
    assert bgp_query(kg, [("A", "acts_on", "B")]).columns == ["matched"]
    assert _rows(bgp_query(kg, [("B", "acts_on", "A")])) == []


def test_select_projection_and_unbound_raises(kg):
    out = bgp_query(
        kg,
        [("?d", "mentions", "?x"), ("?x", "acts_on", "?y")],
        select=["y", "d"],
    )
    assert out.columns == ["y", "d"]
    with pytest.raises(ValueError, match="unbound"):
        bgp_query(kg, [("?x", "acts_on", "?y")], select=["z"])


def test_distinct_vs_multiplicity(kg):
    # ?x acts_on ?y joined with ?x instance_of op: A matches twice via
    # its two out-edges when y is projected away without distinct
    pats = [("?x", "acts_on", "?y"), ("?x", "instance_of", "op")]
    multi = bgp_query(kg, pats, select=["x"], distinct=False)
    dedup = bgp_query(kg, pats, select=["x"], distinct=True)
    assert sorted(r[0] for r in multi.collect()) == ["A", "A"]
    assert _rows(dedup) == [("A",)]


def test_join_order_invariance(kg):
    pats = [
        ("?d", "mentions", "?x"),
        ("?x", "acts_on", "?y"),
        ("?d", "mentions", "?y"),
        ("?y", "instance_of", "obj"),
    ]
    sel = ["d", "x", "y"]
    base = _rows(bgp_query(kg, pats, select=sel))
    for rotated in (pats[::-1], pats[2:] + pats[:2]):
        assert _rows(bgp_query(kg, rotated, select=sel)) == base


def test_parse_patterns_roundtrip(kg):
    pats = parse_patterns("?d mentions ?x . ?x acts_on ?y")
    assert pats == [("?d", "mentions", "?x"), ("?x", "acts_on", "?y")]
    assert _rows(bgp_query(kg, pats)) == _rows(
        bgp_query(kg, [("?d", "mentions", "?x"), ("?x", "acts_on", "?y")])
    )
    with pytest.raises(ValueError, match="3 terms"):
        parse_patterns("?x acts_on")


def test_constant_subject_pattern_broadcasts(kg):
    # constant SUBJECT = one out-adjacency -> static broadcast hint
    pats = [("A", "acts_on", "?y"), ("?y", "instance_of", "?t")]
    out = bgp_query(kg, pats)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "broadcast" in analyzed.lower()
    # and the hint is off when disabled
    out2 = bgp_query(kg, pats, auto_broadcast=False)
    assert "broadcast" not in out2._jdf.queryExecution().analyzed().toString().lower()
    assert _rows(out) == _rows(out2)


def test_object_constant_pattern_not_statically_broadcast(kg):
    # (pred, object)-constant selects an IN-adjacency (type-predicate
    # shape, unbounded at scale): must NOT carry a static hint — AQE
    # decides at runtime (module doc / r4 similarity lesson)
    out = bgp_query(
        kg, [("?x", "acts_on", "?y"), ("?y", "instance_of", "obj")]
    )
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in analyzed.lower()


def test_constant_filters_reach_parquet_scan(spark, tmp_path):
    path = str(tmp_path / "kg.parquet")
    spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string"
    ).write.parquet(path)
    kg = spark.read.parquet(path)
    out = bgp_query(kg, [("?x", "acts_on", "?y")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "EqualTo(pred,acts_on)" in plan


def test_empty_and_malformed_patterns_raise(kg):
    with pytest.raises(ValueError, match="at least one"):
        bgp_query(kg, [])
    with pytest.raises(ValueError, match="3 terms"):
        bgp_query(kg, [("?x", "acts_on")])


# ---------------------------------------------------------------------------
# N-Triples interchange (sources/rdf.py)
# ---------------------------------------------------------------------------

from bio_re_with_entity_embeddings_spark.sources.rdf import (  # noqa: E402
    parse_ntriples,
    to_ntriples,
)

NASTY = [
    ("S1", "P", 'plain'),
    ("S2", "P", 'quote " inside'),
    ("S3", "P", "back\\slash"),
    ("S4", "P", "line\nbreak and\ttab and\rcr"),
    ("S5", "P", "literal backslash-n: \\n and \\\\ doubled"),
    ("S6", "P", ""),
]


def test_ntriples_literal_roundtrip_adversarial(spark):
    df = spark.createDataFrame(NASTY, "subj string, pred string, obj string")
    lines = to_ntriples(df, obj_as_iri=False)
    back = parse_ntriples(lines)
    got = sorted(
        (r.subj, r.pred, r.obj, r.obj_is_iri) for r in back.collect()
    )
    assert got == sorted((s, p, o, False) for s, p, o in NASTY)
    # every line is single-line on the wire (embedded newlines escaped)
    assert all("\n" not in r.line and "\r" not in r.line
               for r in lines.collect())


def test_ntriples_iri_roundtrip_and_base_strip(spark, kg):
    back = parse_ntriples(to_ntriples(kg))
    got = sorted((r.subj, r.pred, r.obj) for r in back.collect())
    assert got == sorted(TRIPLES)
    assert all(r.obj_is_iri for r in back.collect())
    # foreign base survives un-stripped
    other = parse_ntriples(to_ntriples(kg, base="http://x/"), base="urn:kg:")
    assert all(r.subj.startswith("http://x/") for r in other.collect())


def test_ntriples_malformed_guard(spark):
    rows = [
        ('<urn:kg:A> <urn:kg:p> <urn:kg:B> .',),      # good IRI
        ('<urn:kg:A> <urn:kg:p> "lit" .',),            # good literal
        ('<urn:kg:A> <urn:kg:p> <urn:kg:B>',),         # missing dot
        ('# a comment line',),
        ('<urn:kg:A> <urn:kg:p> "unterminated .',),
        ('',),
    ]
    df = spark.createDataFrame(rows, "line string")
    got = parse_ntriples(df).collect()
    assert len(got) == 2
    assert sorted(r.obj for r in got) == ["B", "lit"]


def test_ntriples_no_udfs_in_plan(spark, kg):
    plan = (
        parse_ntriples(to_ntriples(kg))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# property_path (pred+ reachability)
# ---------------------------------------------------------------------------

from bio_re_with_entity_embeddings_spark.operators.kgquery import (  # noqa: E402
    property_path,
)


def test_property_path_directed_hops(spark, kg):
    # acts_on+: A -> {B, C} at hop 1; B's self-loop adds nothing new
    out = property_path(kg, "acts_on", ["A"], max_hops=3)
    got = {r.node: r.hop for r in out.collect()}
    assert got == {"A": 0, "B": 1, "C": 1}


def test_property_path_undirected_multihop(spark, kg):
    # mentions as undirected: A -> D:1/D:2 (1) -> B, C (2)
    out = property_path(kg, "mentions", ["A"], max_hops=2, directed=False)
    got = {r.node: r.hop for r in out.collect()}
    assert got == {"A": 0, "D:1": 1, "D:2": 1, "B": 2, "C": 2}


def test_property_path_hop_bound_and_df_sources(spark, kg):
    seeds = spark.createDataFrame([("A",)], "node string")
    out = property_path(kg, "mentions", seeds, max_hops=1, directed=False)
    got = {r.node: r.hop for r in out.collect()}
    assert got == {"A": 0, "D:1": 1, "D:2": 1}


def test_ntriples_streaming_ingest(spark, tmp_path):
    """parse_ntriples is a stateless projection, so an N-Triples
    directory is a native STREAMING KG source: readStream.text ->
    parse -> append sink, one file per trigger, malformed lines
    dropped mid-stream."""
    src = tmp_path / "nt_in"
    src.mkdir()
    (src / "a.nt").write_text(
        '<urn:kg:A> <urn:kg:calls> <urn:kg:B> .\n'
        'garbage line\n'
        '<urn:kg:B> <urn:kg:calls> <urn:kg:C> .\n'
    )
    (src / "b.nt").write_text(
        '<urn:kg:C> <urn:kg:doc> "hello \\"w\\"" .\n'
    )
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .text(str(src))
        .withColumnRenamed("value", "line")
    )
    parsed = parse_ntriples(stream)
    out = str(tmp_path / "nt_out")
    q = (
        parsed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.subj, r.pred, r.obj, r.obj_is_iri)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        ("A", "calls", "B", True),
        ("B", "calls", "C", True),
        ("C", "doc", 'hello "w"', False),
    ]


def test_parse_patterns_dots_inside_terms(kg):
    # only a STANDALONE '.' separates clauses; dots inside terms stay
    pats = parse_patterns("?x uses v1.2 . ?x imports pkg.mod")
    assert pats == [("?x", "uses", "v1.2"), ("?x", "imports", "pkg.mod")]
    # trailing SPARQL-style dot after the last clause is fine
    assert parse_patterns("?a calls ?b .") == [("?a", "calls", "?b")]


def test_ntriples_foreign_whitespace_tolerated(spark):
    rows = [
        ('  <urn:kg:A>   <urn:kg:p>\t<urn:kg:B>  .  ',),
        ('<urn:kg:A> <urn:kg:p> "x"\t.',),
    ]
    got = parse_ntriples(
        spark.createDataFrame(rows, "line string")
    ).collect()
    assert sorted(r.obj for r in got) == ["B", "x"]


def test_cost_based_ordering_with_pred_stats(spark, kg):
    from bio_re_with_entity_embeddings_spark.operators.kgquery import (
        pred_stats,
    )

    stats = pred_stats(kg)
    assert stats == {"mentions": 4, "acts_on": 3, "instance_of": 3}

    pats = [("?d", "mentions", "?x"), ("?x", "acts_on", "?y")]
    # heuristic: both patterns have 1 constant -> earliest seeds
    heur_order: list = []
    heur = bgp_query(kg, pats, order_out=heur_order)
    assert heur_order == [0, 1]
    # cost-based with a skewed catalog: acts_on is rare -> seeds first
    cost_order: list = []
    cost = bgp_query(
        kg, pats,
        pred_counts={"mentions": 1_000_000, "acts_on": 5},
        order_out=cost_order,
    )
    assert cost_order == [1, 0]
    # semantics identical either way
    assert _rows(heur) == _rows(cost)


def test_cost_based_endpoint_damping(spark, kg):
    # (pred, object)-constant pattern: est = count/1000 beats a
    # smaller-count pattern with no endpoint constants
    order: list = []
    bgp_query(
        kg,
        [("?x", "mentions", "?y"), ("?x", "instance_of", "obj")],
        pred_counts={"mentions": 20, "instance_of": 10_000},
        order_out=order,
    )
    assert order == [1, 0]
