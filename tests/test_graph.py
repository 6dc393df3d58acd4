"""Unit tests for operators/graph.py — graph analytics over the
materialized KG (degrees, gated two-hop, degree-ordered triangles,
PageRank with dangling-mass redistribution).

Hand-verifiable fixtures plus a brute-force cross-check on a random
graph: the operators must agree with a direct O(V^3)/O(V^2) NumPy
computation of the same quantity, node for node.
"""

from __future__ import annotations

import itertools
import random

import pytest

from bio_re_with_entity_embeddings_spark.operators import graph as G


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


# ---------------------------------------------------------------------------
# degrees
# ---------------------------------------------------------------------------


def test_degrees_hand_graph(spark):
    # a->b, a->c, b->c, c->a
    df = _edges_df(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")])
    got = {r["node"]: (r["out_degree"], r["in_degree"], r["degree"])
           for r in G.degrees(df).collect()}
    assert got == {"a": (2, 1, 3), "b": (1, 1, 2), "c": (1, 2, 3)}


# ---------------------------------------------------------------------------
# two_hop
# ---------------------------------------------------------------------------


def test_two_hop_basic_and_self_excluded(spark):
    # a->b->c, c->a (cycle): two-hop pairs exclude src == dst.
    df = _edges_df(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    got = {(r["src"], r["dst"]) for r in G.two_hop(df).collect()}
    # a->b->c, b->c->a, c->a->b; never (x, x).
    assert got == {("a", "c"), ("b", "a"), ("c", "b")}


def test_two_hop_hub_gate_skips_hub_mid(spark):
    # hub 'h' has total degree 4 (2 in + 2 out); spokes degree 2.
    pairs = [("a", "h"), ("b", "h"), ("h", "c"), ("h", "d"), ("c", "d")]
    df = _edges_df(spark, pairs)
    ungated = {(r["src"], r["dst"]) for r in G.two_hop(df).collect()}
    # through h: a->{c,d}, b->{c,d}; through c: h->d (h->c->d).
    assert ungated == {("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("h", "d")}
    gated = {(r["src"], r["dst"])
             for r in G.two_hop(df, max_mid_degree=3).collect()}
    # h (degree 4) is skipped as a MID; pairs through c (degree 2) stay,
    # and h still appears as an endpoint.
    assert gated == {("h", "d")}


# ---------------------------------------------------------------------------
# triangles
# ---------------------------------------------------------------------------


def test_triangles_hand_graph(spark):
    # K3 on {a,b,c} plus pendant d, plus a duplicate/reversed edge and
    # a self-loop that must all be ignored.
    pairs = [("a", "b"), ("b", "c"), ("c", "a"),
             ("b", "a"), ("a", "a"), ("c", "d")]
    got = {r["node"]: r["n_triangles"]
           for r in G.triangles(_edges_df(spark, pairs)).collect()}
    assert got == {"a": 1, "b": 1, "c": 1, "d": 0}


def test_triangles_k4(spark):
    # K4: each node is in C(3,2) = 3 triangles.
    nodes = ["a", "b", "c", "d"]
    pairs = [(u, v) for u, v in itertools.combinations(nodes, 2)]
    got = {r["node"]: r["n_triangles"]
           for r in G.triangles(_edges_df(spark, pairs)).collect()}
    assert got == {n: 3 for n in nodes}


def test_triangles_brute_force_random(spark):
    rng = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(24)]
    und = {tuple(sorted(p)) for p in itertools.combinations(nodes, 2)
           if rng.random() < 0.25}
    adj = {n: set() for n in nodes}
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    expected = {
        n: sum(1 for u, v in itertools.combinations(sorted(adj[n]), 2)
               if tuple(sorted((u, v))) in und)
        for n in nodes if adj[n]
    }
    # feed the operator a messy directed multi-edge version
    pairs = []
    for u, v in sorted(und):
        pairs.append((u, v))
        if rng.random() < 0.5:
            pairs.append((v, u))  # reverse duplicate
    got = {r["node"]: r["n_triangles"]
           for r in G.triangles(_edges_df(spark, pairs)).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------


def _np_pagerank(und_pairs, iterations, damping, directed=True):
    """Reference synchronous PageRank with uniform dangling
    redistribution, straight off the update rule."""
    nodes = sorted({n for p in und_pairs for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {i: set() for i in range(n)}
    for u, v in und_pairs:
        out[idx[u]].add(idx[v])
        if not directed:
            out[idx[v]].add(idx[u])
    rank = [1.0 / n] * n
    for _ in range(iterations):
        dangling = sum(rank[i] for i in range(n) if not out[i])
        nxt = [(1.0 - damping) / n + damping * dangling / n] * n
        for i in range(n):
            if out[i]:
                share = rank[i] / len(out[i])
                for j in out[i]:
                    nxt[j] += damping * share
        rank = nxt
    return {nodes[i]: rank[i] for i in range(n)}


def test_pagerank_matches_reference_with_dangling(spark):
    # 'd' is dangling (no out-edges): exercises the mass redistribution.
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("c", "d")]
    stats = {}
    got = {r["node"]: r["rank"]
           for r in G.pagerank(_edges_df(spark, pairs), iterations=7,
                               stats=stats).collect()}
    exp = _np_pagerank(pairs, iterations=7, damping=0.85)
    assert stats["rounds"] == 7 and stats["n_nodes"] == 4
    assert set(got) == set(exp)
    for n in exp:
        assert got[n] == pytest.approx(exp[n], abs=1e-12)
    # mass conserved exactly (stochastic-matrix fix)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_parallel_edges_collapse(spark):
    base = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a")]
    dup = base + [("a", "b"), ("b", "c")]
    r1 = {r["node"]: r["rank"]
          for r in G.pagerank(_edges_df(spark, base), iterations=4).collect()}
    r2 = {r["node"]: r["rank"]
          for r in G.pagerank(_edges_df(spark, dup), iterations=4).collect()}
    assert r1 == r2


def test_pagerank_tol_early_stop(spark):
    # symmetric K3: uniform ranks are the fixed point from round 1,
    # so any tol stops the loop on round 1.
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
             ("a", "c"), ("c", "a")]
    stats = {}
    got = {r["node"]: r["rank"]
           for r in G.pagerank(_edges_df(spark, pairs), iterations=50,
                               tol=1e-9, stats=stats).collect()}
    assert stats["rounds"] == 1
    for v in got.values():
        assert v == pytest.approx(1.0 / 3.0, abs=1e-12)


def test_pagerank_dangling_free_fast_path_matches_reference(spark):
    # every node has an out-edge -> the lazy no-per-round-action fast
    # path; must equal the same NumPy reference as the slow path.
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "b"), ("a", "c")]
    stats = {}
    got = {r["node"]: r["rank"]
           for r in G.pagerank(_edges_df(spark, pairs), iterations=6,
                               stats=stats).collect()}
    exp = _np_pagerank(pairs, iterations=6, damping=0.85)
    assert stats["rounds"] == 6
    for n in exp:
        assert got[n] == pytest.approx(exp[n], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------


def test_label_propagation_two_communities(spark):
    # two triangles {a,b,c} / {d,e,f} joined by bridge c-d: after 3
    # deterministic synchronous rounds each community is uniform
    # (hand-traced: min-label ties round 1, majority thereafter).
    pairs = [("a", "b"), ("b", "c"), ("c", "a"),
             ("d", "e"), ("e", "f"), ("f", "d"), ("c", "d")]
    stats = {}
    got = {r["node"]: r["label"]
           for r in G.label_propagation(_edges_df(spark, pairs),
                                        iterations=3, stats=stats).collect()}
    assert stats["rounds"] == 3
    assert got == {"a": "a", "b": "a", "c": "a",
                   "d": "c", "e": "c", "f": "c"}


def test_label_propagation_direction_and_multiplicity_invariant(spark):
    base = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    messy = base + [("b", "a"), ("a", "b"), ("d", "c")]
    r1 = {r["node"]: r["label"]
          for r in G.label_propagation(_edges_df(spark, base),
                                       iterations=2).collect()}
    r2 = {r["node"]: r["label"]
          for r in G.label_propagation(_edges_df(spark, messy),
                                       iterations=2).collect()}
    assert r1 == r2


def test_all_ops_empty_edge_set(spark):
    # graph-metrics over a zero-triple build must yield empty
    # profiles, never a crash (the pipeline's own empty-corpus
    # contract).
    empty = spark.createDataFrame([], "src string, dst string")
    stats = {}
    assert G.degrees(empty).count() == 0
    assert G.two_hop(empty, max_mid_degree=4).count() == 0
    assert G.triangles(empty).count() == 0
    assert G.label_propagation(empty, iterations=2).count() == 0
    assert G.pagerank(empty, iterations=2, stats=stats).count() == 0
    assert stats == {"rounds": 0, "n_nodes": 0}


def test_pagerank_encode_ids_equal(spark):
    # dictionary-encoded loop must return IDENTICAL ranks under the
    # original ids (both the dangling and dangling-free paths).
    for pairs in (
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("c", "d")],  # dangling d
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "b")],              # none
    ):
        plain = {r["node"]: r["rank"]
                 for r in G.pagerank(_edges_df(spark, pairs),
                                     iterations=5).collect()}
        enc = {r["node"]: r["rank"]
               for r in G.pagerank(_edges_df(spark, pairs), iterations=5,
                                   encode_ids=True).collect()}
        assert set(enc) == set(plain)
        for n in plain:
            assert enc[n] == pytest.approx(plain[n], abs=1e-15)


# ---------------------------------------------------------------------------
# bfs_hops
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], ["node"])


def test_bfs_path_graph_distances_and_early_stop(spark):
    """a-b-c-d-e path from seed a: exact hop distances, and the loop
    stops at the exhausted frontier (4 rounds reach e; round 5 never
    runs even though max_hops allows it)."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    stats = {}
    out = {
        r["node"]: r["hop"]
        for r in G.bfs_hops(e, _seeds(spark, ["a"]), max_hops=10, stats=stats).collect()
    }
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3, "e": 4}
    assert stats["rounds"] == 4


def test_bfs_hop_bound_truncates(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    out = {
        r["node"]: r["hop"]
        for r in G.bfs_hops(e, _seeds(spark, ["a"]), max_hops=2).collect()
    }
    assert out == {"a": 0, "b": 1, "c": 2}  # d is beyond the bound


def test_bfs_directed_vs_undirected(spark):
    """a->b->c directed: BFS from c reaches nothing downstream in
    directed mode, everything in undirected mode."""
    e = _edges(spark, [("a", "b"), ("b", "c")])
    directed = {
        r["node"]: r["hop"]
        for r in G.bfs_hops(e, _seeds(spark, ["c"]), max_hops=5, directed=True).collect()
    }
    undirected = {
        r["node"]: r["hop"]
        for r in G.bfs_hops(e, _seeds(spark, ["c"]), max_hops=5).collect()
    }
    assert directed == {"c": 0}
    assert undirected == {"c": 0, "b": 1, "a": 2}


def test_bfs_multi_source_takes_min(spark):
    """Seeds at both ends of a 5-path: middle node is 2 from either."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    out = {
        r["node"]: r["hop"]
        for r in G.bfs_hops(e, _seeds(spark, ["a", "e"]), max_hops=10).collect()
    }
    assert out == {"a": 0, "b": 1, "c": 2, "d": 1, "e": 0}


def test_bfs_unreachable_absent_and_cycles_safe(spark):
    """Disconnected component never appears; a cycle does not loop."""
    e = _edges(spark, [("a", "b"), ("b", "a"), ("x", "y")])
    out = {
        r["node"]: r["hop"]
        for r in G.bfs_hops(e, _seeds(spark, ["a"]), max_hops=10).collect()
    }
    assert out == {"a": 0, "b": 1}


def test_bfs_brute_force_random(spark):
    """24-node random graph vs a NetworkX-free Python BFS."""
    rnd = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(24)]
    pairs = sorted(
        {
            (a, b)
            for a, b in (
                rnd.sample(nodes, 2) for _ in range(60)
            )
        }
    )
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seeds = ["n00", "n13"]
    expected, frontier = {s: 0 for s in seeds}, set(seeds)
    hop = 0
    while frontier:
        hop += 1
        frontier = {
            v for u in frontier for v in adj.get(u, ()) if v not in expected
        }
        for v in frontier:
            expected[v] = hop
    got = {
        r["node"]: r["hop"]
        for r in G.bfs_hops(
            _edges(spark, pairs), _seeds(spark, seeds), max_hops=30
        ).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# personalized pagerank (seeds teleport)
# ---------------------------------------------------------------------------


def _np_ppr(und_pairs, seeds, iterations, damping):
    """Reference personalized PageRank: teleport uniform over the seed
    set, dangling mass redistributed by the teleport vector."""
    nodes = sorted({n for p in und_pairs for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {i: set() for i in range(n)}
    for u, v in und_pairs:
        out[idx[u]].add(idx[v])
    found = [idx[s] for s in seeds if s in idx]
    tp = [0.0] * n
    for i in found:
        tp[i] = 1.0 / len(found)
    rank = tp[:]
    for _ in range(iterations):
        dangling = sum(rank[i] for i in range(n) if not out[i])
        nxt = [tp[i] * ((1.0 - damping) + damping * dangling)
               for i in range(n)]
        for i in range(n):
            if out[i]:
                share = rank[i] / len(out[i])
                for j in out[i]:
                    nxt[j] += damping * share
        rank = nxt
    return {nodes[i]: rank[i] for i in range(n)}


def test_personalized_pagerank_matches_reference(spark):
    """Seeded teleport vs the direct NumPy-style reference, on a graph
    WITH a dangling node (seed mass must flow back to seeds, not
    uniformly)."""
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("c", "d")]
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["rank"]
           for r in G.pagerank(_edges_df(spark, pairs), iterations=7,
                               seeds=seeds).collect()}
    exp = _np_ppr(pairs, ["a"], iterations=7, damping=0.85)
    assert set(got) == set(exp)
    for n in exp:
        assert got[n] == pytest.approx(exp[n], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    # the seed outranks every non-adjacent node (the point of PPR)
    assert got["a"] > got["d"]


def test_personalized_pagerank_all_seeds_equals_uniform(spark):
    """Teleporting uniformly over ALL nodes IS ordinary PageRank —
    results equal to 1e-12 (association differs, values agree)."""
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("c", "d")]
    e = _edges_df(spark, pairs)
    all_nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "node string"
    )
    plain = {r["node"]: r["rank"]
             for r in G.pagerank(e, iterations=5).collect()}
    ppr = {r["node"]: r["rank"]
           for r in G.pagerank(e, iterations=5, seeds=all_nodes).collect()}
    for n in plain:
        assert ppr[n] == pytest.approx(plain[n], abs=1e-12)


def test_personalized_pagerank_missing_seed_renormalizes(spark):
    """A seed absent from the graph is dropped and the teleport
    renormalized over the FOUND seeds (documented contract): seeding
    {a, ghost} equals seeding {a}."""
    pairs = [("a", "b"), ("b", "a"), ("b", "c")]
    e = _edges_df(spark, pairs)
    with_ghost = {r["node"]: r["rank"] for r in G.pagerank(
        e, iterations=4,
        seeds=spark.createDataFrame([("a",), ("ghost",)], "node string"),
    ).collect()}
    just_a = {r["node"]: r["rank"] for r in G.pagerank(
        e, iterations=4,
        seeds=spark.createDataFrame([("a",)], "node string"),
    ).collect()}
    for n in just_a:
        assert with_ghost[n] == pytest.approx(just_a[n], abs=1e-15)


def test_personalized_pagerank_no_seed_raises(spark):
    pairs = [("a", "b")]
    with pytest.raises(ValueError, match="no seed"):
        G.pagerank(
            _edges_df(spark, pairs), iterations=2,
            seeds=spark.createDataFrame([("zz",)], "node string"),
        )


def test_personalized_pagerank_encode_ids_equal(spark):
    """encode_ids must remap the seed set too — encoded and plain PPR
    agree to 1e-12."""
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
    e = _edges_df(spark, pairs)
    seeds = spark.createDataFrame([("b",)], "node string")
    plain = {r["node"]: r["rank"] for r in G.pagerank(
        e, iterations=4, seeds=seeds).collect()}
    enc = {r["node"]: r["rank"] for r in G.pagerank(
        e, iterations=4, seeds=seeds, encode_ids=True).collect()}
    for n in plain:
        assert enc[n] == pytest.approx(plain[n], abs=1e-12)


# ---------------------------------------------------------------------------
# hyperball: HLL neighborhood function / harmonic centrality
# ---------------------------------------------------------------------------


def _py_hyperball(edges, p, rounds, directed=False):
    """Pure-Python md5-mode HyperBall reference: replays the EXACT
    register hashing (sketches.hll_registers md5 branch: bucket =
    first p/4 hex digits, rho from the next 13) and the exact
    estimate dataflow (decimal totals -> one float division; linear
    counting branch) so Spark's md5-mode output must match to float
    noise (same IEEE ops, same order)."""
    import hashlib
    import math

    from bio_re_with_entity_embeddings_spark.operators.sketches import _alpha

    m = 1 << p
    k = p // 4
    if not directed:
        edges = edges + [(b, a) for a, b in edges]
    edges = [(a, b) for a, b in set(edges) if a != b]

    def reg(v):
        h = hashlib.md5(("hll:" + v).encode()).hexdigest()
        bucket = int(h[:k], 16)
        rho = 53
        for i, d in enumerate(h[k:k + 13]):
            val = int(d, 16)
            if val:
                lz = 0 if val >= 8 else (1 if val >= 4 else (2 if val >= 2 else 3))
                rho = 4 * i + lz + 1
                break
        return bucket, rho

    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    state = {}
    for v in nodes:
        b, r = reg(v)
        state[v] = {b: r}

    alpha_num = _alpha(m) * m * m * float(2**53)

    def est(regs):
        nb = len(regs)
        total = sum(2 ** (53 - r) for r in regs.values()) + (m - nb) * 2**53
        raw = alpha_num / float(total)
        if raw <= 2.5 * m and nb < m:
            return float(m) * math.log(float(m) / float(m - nb))
        return raw

    prev = {v: est(state[v]) for v in nodes}
    hc = {v: 0.0 for v in nodes}
    for t in range(1, rounds + 1):
        new = {v: dict(s) for v, s in state.items()}
        changed = False
        for a, b in edges:
            for bk, r in state[b].items():
                if new[a].get(bk, 0) < r:
                    new[a][bk] = r
                    changed = True
        state = new
        cur = {v: est(state[v]) for v in nodes}
        for v in nodes:
            hc[v] = hc[v] + (cur[v] - prev[v]) / float(t)
        prev = cur
        if not changed:
            break
    return {v: (prev[v], hc[v]) for v in nodes}


def test_hyperball_md5_matches_python_reference(spark):
    """Spark md5-mode hyperball == the pure-Python replay of the same
    hashing + estimator, node for node, on a seeded random digraph."""
    rng = random.Random(77)
    nodes = [f"n{i}" for i in range(30)]
    pairs = sorted({(rng.choice(nodes), rng.choice(nodes)) for _ in range(70)})
    ref = _py_hyperball(pairs, p=4, rounds=12, directed=True)
    got = {r["node"]: (r["ball_est"], r["harmonic"]) for r in G.hyperball(
        _edges_df(spark, pairs), p=4, max_rounds=12,
        hash_mode="md5", directed=True,
    ).collect()}
    assert set(got) == set(ref)
    for n, (b, h) in ref.items():
        assert got[n][0] == pytest.approx(b, abs=1e-9), n
        assert got[n][1] == pytest.approx(h, abs=1e-9), n


def test_hyperball_ball_estimates_track_exact_reachability(spark):
    """At p=8 (~6.5% se) the converged ball of every node in a sparse
    undirected random graph tracks the EXACT reachable-set size from
    a direct Python BFS, and the final neighborhood function point
    equals their sum."""
    rng = random.Random(5)
    nodes = [f"v{i}" for i in range(120)]
    pairs = sorted({(rng.choice(nodes), rng.choice(nodes)) for _ in range(140)})
    pairs = [(a, b) for a, b in pairs if a != b]
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    def reach(v):
        seen, frontier = {v}, [v]
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj.get(u, ()):
                    if w not in seen:
                        seen.add(w)
                        nxt.append(w)
            frontier = nxt
        return len(seen)
    st = {}
    got = {r["node"]: r["ball_est"] for r in G.hyperball(
        _edges_df(spark, pairs), p=8, max_rounds=40, stats=st,
    ).collect()}
    assert set(got) == set(adj)
    for v in adj:
        exact = reach(v)
        # p=8 linear-counting regime on these cardinalities: generous
        # deterministic bound (observed max rel err ~0.05 here).
        assert abs(got[v] - exact) <= max(2.0, 0.3 * exact), (v, got[v], exact)
    assert st["nf"][-1] == pytest.approx(sum(got.values()), rel=1e-9)
    assert st["rounds"] < 40  # converged by signature, not exhaustion


def test_hyperball_convergence_and_monotone_nf(spark):
    """Path graph a-b-c-d: exact fixed point at round 3 (the
    diameter); nf is strictly increasing until it."""
    st = {}
    G.hyperball(
        _edges_df(spark, [("a", "b"), ("b", "c"), ("c", "d")]),
        p=8, max_rounds=10, stats=st,
    ).collect()
    assert st["rounds"] == 3
    nf = st["nf"]
    assert len(nf) == 4  # N(0..3)
    assert all(nf[i] < nf[i + 1] for i in range(3))


def test_hyperball_directed_vs_undirected(spark):
    """On the directed chain a->b->c the ball of c is just {c}; the
    undirected run reaches everything from everywhere."""
    pairs = [("a", "b"), ("b", "c")]
    d = {r["node"]: r["ball_est"] for r in G.hyperball(
        _edges_df(spark, pairs), p=8, directed=True).collect()}
    u = {r["node"]: r["ball_est"] for r in G.hyperball(
        _edges_df(spark, pairs), p=8, directed=False).collect()}
    assert d["c"] == pytest.approx(1.0, abs=0.1)
    assert d["a"] > d["b"] > d["c"]
    assert all(abs(v - 3.0) < 0.3 for v in u.values())


def test_hyperball_harmonic_ordering_star(spark):
    """Star center (distance 1 to all) dominates the leaves
    (distance 2 to each other) in harmonic centrality."""
    pairs = [("hub", f"l{i}") for i in range(8)]
    hc = {r["node"]: r["harmonic"] for r in G.hyperball(
        _edges_df(spark, pairs), p=8).collect()}
    assert all(hc["hub"] > hc[f"l{i}"] for i in range(8))


def test_effective_diameter_interpolation():
    # N(0)=10, N(1)=70, N(2)=100: q=0.9 target 90 -> between 1 and 2.
    assert G.effective_diameter([10.0, 70.0, 100.0]) == pytest.approx(
        1 + (90 - 70) / (100 - 70))
    assert G.effective_diameter([10.0, 100.0], q=0.05) == 0.0
    assert G.effective_diameter([5.0]) == 0.0
    with pytest.raises(ValueError):
        G.effective_diameter([])


# ---------------------------------------------------------------------------
# link_prediction: common neighbors + Adamic-Adar
# ---------------------------------------------------------------------------


def test_link_prediction_cycle4(spark):
    """4-cycle a-b-c-d-a: the only candidate pairs are the two
    diagonals, each with 2 common neighbors of degree 2."""
    import math
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    got = {(r["src"], r["dst"]): (r["common_neighbors"], r["adamic_adar"])
           for r in G.link_prediction(_edges_df(spark, pairs)).collect()}
    aa = 2.0 / math.log(2.0)
    assert set(got) == {("a", "c"), ("b", "d")}
    for cn, a in got.values():
        assert cn == 2
        assert a == pytest.approx(aa, abs=1e-12)


def test_link_prediction_include_existing(spark):
    """Triangle a-b-c: with existing edges excluded nothing remains;
    included, every edge pair scores via its one shared neighbor."""
    import math
    pairs = [("a", "b"), ("b", "c"), ("c", "a")]
    e = _edges_df(spark, pairs)
    assert G.link_prediction(e).count() == 0
    got = {(r["src"], r["dst"]): (r["common_neighbors"], r["adamic_adar"])
           for r in G.link_prediction(e, include_existing=True).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for cn, a in got.values():
        assert cn == 1 and a == pytest.approx(1.0 / math.log(2.0), abs=1e-12)


def test_link_prediction_hub_gate(spark):
    """Star hub + one side path: gating the hub's degree removes the
    leaf-leaf candidates that only the hub connects, while the pair
    connected by a low-degree mid survives."""
    pairs = [("hub", f"l{i}") for i in range(5)] + [("l0", "m"), ("m", "l1")]
    e = _edges_df(spark, pairs)
    ungated = {(r["src"], r["dst"]) for r in G.link_prediction(e).collect()}
    gated = {(r["src"], r["dst"]) for r in G.link_prediction(
        e, max_mid_degree=3).collect()}
    assert ("l2", "l3") in ungated and ("l2", "l3") not in gated
    # l0-l1 goes through both the hub (deg 5, gated) and m (deg 2).
    assert ("l0", "l1") in gated
    got = {(r["src"], r["dst"]): r["common_neighbors"]
           for r in G.link_prediction(e, max_mid_degree=3).collect()}
    assert got[("l0", "l1")] == 1  # hub wedge dropped, m wedge kept


def test_link_prediction_brute_force(spark):
    """Random graph vs a direct Python computation of both scores."""
    import math
    rng = random.Random(11)
    nodes = [f"n{i}" for i in range(25)]
    pairs = sorted({(rng.choice(nodes), rng.choice(nodes)) for _ in range(60)})
    pairs = [(a, b) for a, b in pairs if a != b]
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    ref = {}
    ns = sorted(adj)
    for i, u in enumerate(ns):
        for w in ns[i + 1:]:
            if w in adj[u]:
                continue
            common = adj[u] & adj[w]
            if common:
                ref[(u, w)] = (
                    len(common),
                    sum(1.0 / math.log(len(adj[v])) for v in common),
                )
    got = {(r["src"], r["dst"]): (r["common_neighbors"], r["adamic_adar"])
           for r in G.link_prediction(_edges_df(spark, pairs)).collect()}
    assert set(got) == set(ref)
    for k, (cn, aa) in ref.items():
        assert got[k][0] == cn, k
        assert got[k][1] == pytest.approx(aa, abs=1e-9), k


# ---------------------------------------------------------------------------
# core_numbers / k_core
# ---------------------------------------------------------------------------


def _peel_cores(pairs):
    """Exact core numbers by the textbook peeling algorithm (repeatedly
    remove a minimum-degree node; its core is the running maximum of
    the minimum degree seen) — the independent reference."""
    adj = {}
    for u, v in pairs:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {n: len(ns) for n, ns in adj.items()}
    core, k = {}, 0
    while deg:
        n = min(deg, key=lambda x: (deg[x], x))
        k = max(k, deg[n])
        core[n] = k
        for m in adj[n]:
            if m in deg and m != n:
                deg[m] -= 1
        del deg[n]
    return core


def test_core_numbers_hand_shapes(spark):
    # path P4 -> all 1; cycle C5 -> all 2; K5 -> all 4 (disjoint parts).
    path = [("p1", "p2"), ("p2", "p3"), ("p3", "p4")]
    cyc = [(f"c{i}", f"c{(i + 1) % 5}") for i in range(5)]
    k5 = [(u, v) for u, v in itertools.combinations(
        ["k1", "k2", "k3", "k4", "k5"], 2)]
    stats = {}
    got = {r["node"]: r["core"] for r in G.core_numbers(
        _edges_df(spark, path + cyc + k5), stats=stats).collect()}
    want = {f"p{i}": 1 for i in (1, 2, 3, 4)}
    want.update({f"c{i}": 2 for i in range(5)})
    want.update({f"k{i}": 4 for i in (1, 2, 3, 4, 5)})
    assert got == want
    assert stats["converged"] and stats["rounds"] >= 1


def test_core_numbers_clique_with_tail(spark):
    # K4 with a pendant path hanging off one corner: clique stays core
    # 3, the tail peels to 1 — degree alone would misrank t1 (deg 2).
    k4 = [(u, v) for u, v in itertools.combinations(
        ["a", "b", "c", "d"], 2)]
    tail = [("d", "t1"), ("t1", "t2")]
    got = {r["node"]: r["core"] for r in G.core_numbers(
        _edges_df(spark, k4 + tail)).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "t1": 1, "t2": 1}


def test_core_numbers_direction_multiplicity_selfloop_invariant(spark):
    # duplicates, reversals and self-loops must not change the simple
    # undirected graph the decomposition sees.
    base = [("a", "b"), ("b", "c"), ("c", "a")]
    noisy = base + [("b", "a"), ("c", "b"), ("a", "a"), ("c", "a")]
    got_base = {r["node"]: r["core"]
                for r in G.core_numbers(_edges_df(spark, base)).collect()}
    got_noisy = {r["node"]: r["core"]
                 for r in G.core_numbers(_edges_df(spark, noisy)).collect()}
    assert got_base == got_noisy == {"a": 2, "b": 2, "c": 2}


def test_core_numbers_brute_force_random(spark):
    rng = random.Random(23)
    nodes = [f"n{i:02d}" for i in range(30)]
    pairs = [(u, v) for u, v in itertools.combinations(nodes, 2)
             if rng.random() < 0.18]
    # plant a K6 nucleus so the decomposition has real structure
    pairs += [(u, v) for u, v in itertools.combinations(nodes[:6], 2)]
    stats = {}
    got = {r["node"]: r["core"] for r in G.core_numbers(
        _edges_df(spark, pairs), stats=stats).collect()}
    assert stats["converged"]
    assert got == _peel_cores(pairs)


def test_k_core_subgraph_min_degree_property(spark):
    # the returned k-core subgraph is exactly the peeling survivor set:
    # every kept node has >= k kept neighbors, and it is maximal (all
    # nodes with core >= k appear).
    rng = random.Random(5)
    nodes = [f"n{i:02d}" for i in range(24)]
    pairs = [(u, v) for u, v in itertools.combinations(nodes, 2)
             if rng.random() < 0.2]
    pairs += [(u, v) for u, v in itertools.combinations(nodes[:5], 2)]
    k = 3
    sub = [(r["src"], r["dst"])
           for r in G.k_core(_edges_df(spark, pairs), k).collect()]
    cores = _peel_cores(pairs)
    keep = {n for n, c in cores.items() if c >= k}
    want = {(min(u, v), max(u, v)) for u, v in pairs
            if u != v and u in keep and v in keep}
    assert set(sub) == want
    deg = {}
    for u, v in sub:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    assert deg and min(deg.values()) >= k


def test_core_numbers_empty_and_selfloop_only(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    stats = {}
    assert G.core_numbers(empty, stats=stats).count() == 0
    assert stats["converged"] and stats["rounds"] == 0
    only_loops = _edges_df(spark, [("a", "a")])
    assert G.core_numbers(only_loops).count() == 0
    assert G.k_core(empty, 2).count() == 0


# ---------------------------------------------------------------------------
# sssp (weighted multi-source shortest paths)
# ---------------------------------------------------------------------------


def _wedges(spark, triples):
    return spark.createDataFrame(triples, ["src", "dst", "weight"])


def _sssp_dict(df):
    return {r["node"]: r["dist"] for r in df.collect()}


def test_sssp_weighted_path_beats_direct_edge(spark):
    """a-b direct costs 10; a-c-b costs 2 — the weighted answer differs
    from the hop answer, and the loop's round count reflects the
    re-relaxation (b improves in round 1 AND round 2)."""
    e = _wedges(spark, [("a", "b", 10.0), ("a", "c", 1.0), ("c", "b", 1.0)])
    stats = {}
    out = _sssp_dict(G.sssp(e, _seeds(spark, ["a"]), stats=stats))
    assert out == {"a": 0.0, "b": 2.0, "c": 1.0}
    assert stats["rounds"] == 2


def test_sssp_directed_vs_undirected(spark):
    e = _wedges(spark, [("a", "b", 3.0), ("b", "c", 4.0)])
    directed = _sssp_dict(G.sssp(e, _seeds(spark, ["c"]), directed=True))
    undirected = _sssp_dict(G.sssp(e, _seeds(spark, ["c"])))
    assert directed == {"c": 0.0}
    assert undirected == {"c": 0.0, "b": 4.0, "a": 7.0}


def test_sssp_unreachable_absent_parallel_min_self_loop(spark):
    """Parallel edges collapse to their min weight; self-loops are
    ignored; the disconnected island never appears."""
    e = _wedges(
        spark,
        [
            ("a", "b", 5.0),
            ("a", "b", 2.0),  # parallel: min wins
            ("b", "b", 0.5),  # self-loop: dropped
            ("x", "y", 1.0),  # island
        ],
    )
    out = _sssp_dict(G.sssp(e, _seeds(spark, ["a"]), directed=True))
    assert out == {"a": 0.0, "b": 2.0}


def test_sssp_max_rounds_bounds_hops(spark):
    """max_rounds=2 on a 4-edge path: distances are min over <= 2-edge
    paths (the Bellman-Ford invariant the oracle restates)."""
    e = _wedges(
        spark,
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0), ("d", "e", 1.0)],
    )
    out = _sssp_dict(G.sssp(e, _seeds(spark, ["a"]), max_rounds=2))
    assert out == {"a": 0.0, "b": 1.0, "c": 2.0}


def test_sssp_multi_seed_equals_min_over_per_seed_runs(spark):
    e = _wedges(
        spark,
        [("a", "b", 2.0), ("b", "c", 2.0), ("c", "d", 2.0), ("d", "e", 2.0)],
    )
    both = _sssp_dict(G.sssp(e, _seeds(spark, ["a", "e"])))
    runs = [
        _sssp_dict(G.sssp(e, _seeds(spark, [s]))) for s in ("a", "e")
    ]
    merged = {}
    for run in runs:
        for n, d in run.items():
            merged[n] = min(merged.get(n, float("inf")), d)
    assert both == merged


def test_sssp_unit_weights_equal_bfs_hops(spark):
    """With every weight 1.0, sssp IS bfs (dist == hop as doubles)."""
    rnd = random.Random(11)
    nodes = [f"n{i:02d}" for i in range(20)]
    pairs = sorted({tuple(rnd.sample(nodes, 2)) for _ in range(45)})
    e = _wedges(spark, [(a, b, 1.0) for a, b in pairs])
    hops = {
        r["node"]: float(r["hop"])
        for r in G.bfs_hops(
            _edges(spark, pairs), _seeds(spark, ["n00"]), max_hops=30
        ).collect()
    }
    assert _sssp_dict(G.sssp(e, _seeds(spark, ["n00"]))) == hops


def test_sssp_brute_force_random_dijkstra(spark):
    """40-node weighted random digraph vs a pure-Python Dijkstra."""
    import heapq

    rnd = random.Random(13)
    nodes = [f"n{i:02d}" for i in range(40)]
    triples = sorted(
        {
            (a, b, float(rnd.randint(1, 9)))
            for a, b in (rnd.sample(nodes, 2) for _ in range(160))
        }
    )
    adj = {}
    for a, b, w in triples:
        adj.setdefault(a, []).append((b, w))
    seeds = ["n00", "n27"]
    expected, heap = {}, [(0.0, s) for s in seeds]
    heapq.heapify(heap)
    while heap:
        d, u = heapq.heappop(heap)
        if u in expected:
            continue
        expected[u] = d
        for v, w in adj.get(u, ()):
            if v not in expected:
                heapq.heappush(heap, (d + w, v))
    got = _sssp_dict(
        G.sssp(
            _wedges(spark, triples), _seeds(spark, seeds), directed=True
        )
    )
    assert got == expected


# ---------------------------------------------------------------------------
# edge_support / k_truss
# ---------------------------------------------------------------------------


def _peel_truss(pairs, k):
    """Exact k-truss by textbook support peeling (drop every edge with
    fewer than k-2 triangles, recount, repeat) — the independent
    reference implementation."""
    edges = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    while True:
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        drop = {(u, v) for u, v in edges if len(adj[u] & adj[v]) < k - 2}
        if not drop:
            return edges
        edges -= drop


def test_edge_support_hand_shapes(spark):
    # bowtie: two triangles sharing edge (x, y) -> shared edge support
    # 2, the four outer edges 1; a triangle-free path -> all 0.
    bowtie = [("x", "y"), ("x", "z1"), ("y", "z1"), ("x", "z2"), ("y", "z2")]
    path = [("p1", "p2"), ("p2", "p3")]
    got = {(r["src"], r["dst"]): r["support"]
           for r in G.edge_support(_edges_df(spark, bowtie + path)).collect()}
    assert got == {("x", "y"): 2, ("x", "z1"): 1, ("y", "z1"): 1,
                   ("x", "z2"): 1, ("y", "z2"): 1,
                   ("p1", "p2"): 0, ("p2", "p3"): 0}


def test_k_truss_clique_with_tail(spark):
    # K5 with a pendant path: 5-truss keeps exactly the clique's 10
    # edges (each clique edge closes 3 triangles >= k-2=3); 6-truss is
    # empty (4 needed, 3 available).
    k5 = [(u, v) for u, v in itertools.combinations(
        ["a", "b", "c", "d", "e"], 2)]
    tail = [("e", "t1"), ("t1", "t2")]
    stats = {}
    got = {(r["src"], r["dst"])
           for r in G.k_truss(_edges_df(spark, k5 + tail), 5, stats=stats).collect()}
    assert got == set(k5)
    assert stats["converged"] and stats["n_edges_in"] == 12
    assert stats["n_edges_kept"] == 10
    assert G.k_truss(_edges_df(spark, k5), 6).count() == 0


def test_k_truss_peeling_cascade(spark):
    # bowtie at k=4: the outer edges (support 1 < 2) drop in round 1;
    # the shared edge had support 2 BEFORE the drop and 0 after, so it
    # must fall in round 2 — pins that support is recounted on the
    # survivor set, not read once.
    bowtie = [("x", "y"), ("x", "z1"), ("y", "z1"), ("x", "z2"), ("y", "z2")]
    stats = {}
    assert G.k_truss(_edges_df(spark, bowtie), 4, stats=stats).count() == 0
    assert stats["converged"] and stats["rounds"] >= 2


def test_k_truss_direction_multiplicity_selfloop_invariant(spark):
    base = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("b", "d")]
    noisy = base + [("b", "a"), ("c", "b"), ("a", "a"), ("d", "a")]
    got_base = {(r["src"], r["dst"])
                for r in G.k_truss(_edges_df(spark, base), 3).collect()}
    got_noisy = {(r["src"], r["dst"])
                 for r in G.k_truss(_edges_df(spark, noisy), 3).collect()}
    assert got_base == got_noisy == _peel_truss(base, 3)


def test_k_truss_brute_force_random(spark):
    rng = random.Random(31)
    nodes = [f"n{i:02d}" for i in range(26)]
    pairs = [(u, v) for u, v in itertools.combinations(nodes, 2)
             if rng.random() < 0.22]
    # plant a K6 nucleus so high trusses are non-empty
    pairs += [(u, v) for u, v in itertools.combinations(nodes[:6], 2)]
    for k in (3, 4, 5):
        stats = {}
        got = {(r["src"], r["dst"])
               for r in G.k_truss(_edges_df(spark, pairs), k, stats=stats).collect()}
        assert stats["converged"]
        assert got == _peel_truss(pairs, k), k


def test_k_truss_contained_in_km1_core(spark):
    # textbook containment: the k-truss is a subgraph of the
    # (k-1)-core — every kept endpoint has >= k-1 kept neighbors.
    rng = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(24)]
    pairs = [(u, v) for u, v in itertools.combinations(nodes, 2)
             if rng.random() < 0.25]
    k = 4
    truss = {(r["src"], r["dst"])
             for r in G.k_truss(_edges_df(spark, pairs), k).collect()}
    core_edges = {(r["src"], r["dst"])
                  for r in G.k_core(_edges_df(spark, pairs), k - 1).collect()}
    assert truss <= core_edges


def test_k_truss_k_lt_3_and_empty(spark):
    bowtie = [("x", "y"), ("x", "z1"), ("y", "z1"), ("x", "z2"), ("y", "z2")]
    stats = {}
    got = G.k_truss(_edges_df(spark, bowtie), 2, stats=stats)
    assert got.count() == 5 and stats["converged"] and stats["rounds"] == 0
    empty = spark.createDataFrame([], "src string, dst string")
    st2 = {}
    assert G.k_truss(empty, 3, stats=st2).count() == 0
    assert st2["converged"]
    only_loops = _edges_df(spark, [("a", "a")])
    assert G.k_truss(only_loops, 3).count() == 0
    assert G.edge_support(empty).count() == 0
