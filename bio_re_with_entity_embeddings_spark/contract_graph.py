"""Graph-analytics contract queries (operators/graph.py) over the
materialized KG — the consumer side of "graph materialize".

Graph bases, both derived from the shared mention CTE so the oracle
checks the SAME graph the Spark side builds:

* the BIPARTITE doc<->entity mention graph, symmetric ('D:'-prefixed
  doc nodes vs entity-id nodes; 'D:' keeps the node namespaces
  disjoint) — ~1k nodes / ~14k directed edges at sf0.01: a strong
  hash target for PageRank and degree profiles;
* the entity CO-OCCURRENCE graph (subj-obj pairs) for triangle
  structure, where a dense small graph exercises every wedge path.

Float policy: PageRank ranks are rounded to 6 decimals on BOTH sides
(the module's similarity-score convention) — the iteration is the
same IEEE dataflow in both engines, differing only in summation
order (~1e-15/round), far below the rounding grain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .contract import (
    _SQL_PAIRS,
    _SQL_PRELUDE,
    _doc_mentions,
    _doc_pairs,
    register,
    register_extra,
)
from .operators import graph as G
from .operators.sketches import _HEX, _alpha, _rho_from_tail_expr

# ---------------------------------------------------------------------------
# shared graph-base CTEs (appended to the mention prelude)
# ---------------------------------------------------------------------------

_SQL_BEDGES = """
, bedges AS (
  SELECT 'D:' || CAST(doc_id AS VARCHAR) AS src, entity_id AS dst FROM mentions
  UNION
  SELECT entity_id AS src, 'D:' || CAST(doc_id AS VARCHAR) AS dst FROM mentions
)
"""


def _bipartite_edges(spark, sf_dir):
    # No .distinct() here (round 6): every graph operator consuming
    # this base dedups its edge input itself (pagerank/two_hop/... all
    # open with select(src, dst).distinct()), so the previous distinct
    # was a second full exchange of the same rows. The union is in fact
    # already a set — mentions are distinct on (doc_id, entity_id) and
    # the 'D:' prefix keeps the two directions disjoint — which the
    # consumers' distinct re-establishes at no extra risk.
    # (round 6: an eager localCheckpoint of m was tried here and
    # measured SLOWER — the fwd/rev branches' identical distinct
    # subtrees are already deduped by exchange reuse inside the first
    # consuming job, so the extra synchronous job only added wall.)
    m = _doc_mentions(spark, sf_dir)
    doc_node = F.concat(F.lit("D:"), F.col("doc_id").cast("string"))
    fwd = m.select(doc_node.alias("src"), F.col("entity_id").alias("dst"))
    rev = m.select(F.col("entity_id").alias("src"), doc_node.alias("dst"))
    return fwd.unionByName(rev)


# ---------------------------------------------------------------------------
# PageRank: 5 fixed rounds over the symmetric bipartite graph.
# The SQL restates the synchronous update EXACTLY (same dataflow,
# same dangling-mass term — identically zero on a symmetric graph but
# kept so the restatement is the algorithm, not a simplification).
# ---------------------------------------------------------------------------

_PR_ITERS = 5
_PR_DAMPING = 0.85


def _pagerank_sql() -> str:
    ctes = [
        "nodes AS (SELECT DISTINCT src AS node FROM bedges)",
        "outd AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS od"
        " FROM bedges GROUP BY src)",
        "meta AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "r0 AS (SELECT node, 1.0 / (SELECT n FROM meta) AS rank FROM nodes)",
    ]
    d = _PR_DAMPING
    for i in range(1, _PR_ITERS + 1):
        prev = f"r{i - 1}"
        ctes.append(
            f"""r{i} AS (
  SELECT n.node,
         (1 - {d}) / (SELECT n FROM meta)
         + {d} * (SELECT coalesce(sum(r.rank), 0) FROM {prev} r
                  LEFT JOIN outd o ON r.node = o.node WHERE o.node IS NULL)
               / (SELECT n FROM meta)
         + {d} * coalesce(c.c, 0) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank / o.od) AS c
    FROM bedges e
    JOIN {prev} r ON e.src = r.node
    JOIN outd o ON o.node = e.src
    GROUP BY e.dst
  ) c ON n.node = c.node
)"""
        )
    return (
        _SQL_PRELUDE
        + _SQL_BEDGES
        + ", "
        + ",\n".join(ctes)
        + f"\nSELECT node, round(rank, 6) AS rank FROM r{_PR_ITERS}"
    )


@register("graph_pagerank", _pagerank_sql())
def graph_pagerank(spark, sf_dir):
    """PageRank over the symmetric doc<->entity mention graph —
    5 synchronous rounds, damping 0.85, dangling mass redistributed
    uniformly (operators/graph.py::pagerank)."""
    # assume_distinct: bedges IS a set — mentions are distinct on
    # (doc_id, entity_id) and the 'D:' prefix keeps the two union
    # directions disjoint (see _bipartite_edges) — so the operator's
    # defensive distinct would be a pure extra exchange (measured
    # 1.4 s of the 2.1 s edge-base job at sf0.1, round 6).
    ranks = G.pagerank(
        _bipartite_edges(spark, sf_dir),
        iterations=_PR_ITERS,
        damping=_PR_DAMPING,
        assume_distinct=True,
    )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


# ---------------------------------------------------------------------------
# Triangles: degree-ordered orientation over the entity co-occurrence
# graph.  The SQL mirrors the orientation/wedge/closing dataflow.
# ---------------------------------------------------------------------------

_SQL_TRIANGLES = (
    _SQL_PRELUDE
    + _SQL_PAIRS
    + """
, und AS (
  SELECT DISTINCT least(subj, obj) AS u, greatest(subj, obj) AS v
  FROM pairs WHERE subj <> obj
),
deg AS (
  SELECT node, count(*) AS d
  FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
  GROUP BY node
),
oriented AS (
  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND und.u < und.v)
              THEN und.u ELSE und.v END AS a,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND und.u < und.v)
              THEN und.v ELSE und.u END AS b
  FROM und
  JOIN deg du ON du.node = und.u
  JOIN deg dv ON dv.node = und.v
),
tri AS (
  SELECT w1.a AS n1, w1.b AS n2, w2.b AS n3
  FROM oriented w1
  JOIN oriented w2 ON w2.a = w1.a AND w1.b <> w2.b
  JOIN oriented c ON c.a = w1.b AND c.b = w2.b
),
per_node AS (
  SELECT node, count(*) AS cnt
  FROM (SELECT n1 AS node FROM tri
        UNION ALL SELECT n2 AS node FROM tri
        UNION ALL SELECT n3 AS node FROM tri)
  GROUP BY node
)
SELECT deg.node, CAST(coalesce(per_node.cnt, 0) AS BIGINT) AS n_triangles
FROM deg LEFT JOIN per_node ON per_node.node = deg.node
"""
)


@register("graph_triangles", _SQL_TRIANGLES)
def graph_triangles(spark, sf_dir):
    """Per-entity triangle counts of the co-occurrence graph
    (operators/graph.py::triangles, degree-ordered orientation)."""
    m = _doc_mentions(spark, sf_dir)
    src = m.where(F.col("entity_type") == "op").select(
        "doc_id", F.col("entity_id").alias("subj")
    )
    tgt = m.where(F.col("entity_type") == "obj").select(
        "doc_id", F.col("entity_id").alias("obj")
    )
    pairs = src.join(tgt, "doc_id").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return G.triangles(pairs)


# ---------------------------------------------------------------------------
# Degree profile + gated two-hop: extras (the operators' plumbing is
# already driver-evidenced through pagerank/triangles; these pin the
# remaining public surface with local DuckDB parity).
# ---------------------------------------------------------------------------

_SQL_DEGREES = (
    _SQL_PRELUDE
    + """
SELECT node,
       CAST(sum(o) AS BIGINT) AS out_degree,
       CAST(sum(i) AS BIGINT) AS in_degree,
       CAST(count(*) AS BIGINT) AS degree
FROM (
  SELECT 'D:' || CAST(doc_id AS VARCHAR) AS node, 1 AS o, 0 AS i FROM mentions
  UNION ALL
  SELECT entity_id AS node, 0 AS o, 1 AS i FROM mentions
)
GROUP BY node
"""
)


@register_extra("graph_degrees", _SQL_DEGREES)
def graph_degrees(spark, sf_dir):
    """Degree profile of the DIRECTED doc->entity mention graph."""
    m = _doc_mentions(spark, sf_dir)
    edges = m.select(
        F.concat(F.lit("D:"), F.col("doc_id").cast("string")).alias("src"),
        F.col("entity_id").alias("dst"),
    )
    return G.degrees(edges)


# ---------------------------------------------------------------------------
# Label propagation: 3 synchronous deterministic rounds over the
# entity co-occurrence graph.  The SQL restates each round literally
# (count messages, take max count with min-label tie-break).
# ---------------------------------------------------------------------------

_LPA_ITERS = 3


def _lpa_sql() -> str:
    ctes = [
        """und AS (
  SELECT DISTINCT least(subj, obj) AS u, greatest(subj, obj) AS v
  FROM pairs WHERE subj <> obj
)""",
        "sym AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und)",
        "l0 AS (SELECT DISTINCT u AS node, u AS label FROM sym)",
    ]
    for i in range(1, _LPA_ITERS + 1):
        prev = f"l{i - 1}"
        ctes.append(
            f"""l{i} AS (
  SELECT node, label FROM (
    SELECT c.node, c.label,
           row_number() OVER (PARTITION BY c.node
                              ORDER BY c.cnt DESC, c.label ASC) AS rn
    FROM (SELECT s.v AS node, l.label, count(*) AS cnt
          FROM sym s JOIN {prev} l ON s.u = l.node
          GROUP BY s.v, l.label) c
  ) WHERE rn = 1
)"""
        )
    return (
        _SQL_PRELUDE
        + _SQL_PAIRS
        + ", "
        + ",\n".join(ctes)
        + f"\nSELECT node, label FROM l{_LPA_ITERS}"
    )


@register_extra("graph_lpa", _lpa_sql())
def graph_lpa(spark, sf_dir):
    """Synchronous deterministic label propagation (3 rounds,
    min-label tie-break) over the entity co-occurrence graph
    (operators/graph.py::label_propagation)."""
    m = _doc_mentions(spark, sf_dir)
    src = m.where(F.col("entity_type") == "op").select(
        "doc_id", F.col("entity_id").alias("subj")
    )
    tgt = m.where(F.col("entity_type") == "obj").select(
        "doc_id", F.col("entity_id").alias("obj")
    )
    pairs = src.join(tgt, "doc_id").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return G.label_propagation(pairs, iterations=_LPA_ITERS)


# ---------------------------------------------------------------------------
# Connected components as a consumer op: the SAME large-star/small-star
# CC the canonicalizer uses (operators/canonicalize.py), exposed over
# the co-occurrence graph; the SQL replays reachability with a
# recursive CTE and takes component = min reachable node (the
# dedup_keepers oracle pattern).
# ---------------------------------------------------------------------------

_SQL_COMPONENTS = (
    "\nWITH RECURSIVE "
    + _SQL_PRELUDE.replace("\nWITH ", "", 1)
    + _SQL_PAIRS
    + """
, und AS (
  SELECT DISTINCT least(subj, obj) AS u, greatest(subj, obj) AS v
  FROM pairs WHERE subj <> obj
),
cedges AS (SELECT u, v FROM und UNION SELECT v AS u, u AS v FROM und),
reach(u, v) AS (
  SELECT u, v FROM cedges
  UNION
  SELECT r.u, e.v FROM reach r JOIN cedges e ON e.u = r.v AND r.u <> e.v
)
SELECT n.node, least(n.node, coalesce(r.mn, n.node)) AS component
FROM (SELECT DISTINCT u AS node FROM cedges) n
LEFT JOIN (SELECT u, min(v) AS mn FROM reach GROUP BY u) r ON r.u = n.node
"""
)


@register_extra("graph_components", _SQL_COMPONENTS)
def graph_components(spark, sf_dir):
    """Connected components of the co-occurrence graph
    (operators/canonicalize.py::connected_components — large-star /
    small-star with the shuffle-free signature convergence test),
    component = min node id."""
    from .operators.canonicalize import connected_components

    m = _doc_mentions(spark, sf_dir)
    src = m.where(F.col("entity_type") == "op").select(
        "doc_id", F.col("entity_id").alias("subj")
    )
    tgt = m.where(F.col("entity_type") == "obj").select(
        "doc_id", F.col("entity_id").alias("obj")
    )
    pairs = (
        src.join(tgt, "doc_id")
        .where(F.col("subj") != F.col("obj"))
        .select(F.col("subj").alias("a"), F.col("obj").alias("b"))
    )
    return connected_components(pairs)


_TWO_HOP_CAP = 64

_SQL_TWO_HOP = (
    _SQL_PRELUDE
    + _SQL_BEDGES
    + f"""
, degg AS (
  SELECT node, count(*) AS d
  FROM (SELECT src AS node FROM bedges UNION ALL SELECT dst AS node FROM bedges)
  GROUP BY node
),
mids AS (SELECT node FROM degg WHERE d <= {_TWO_HOP_CAP})
SELECT DISTINCT a.src, b.dst
FROM bedges a
JOIN mids m ON m.node = a.dst
JOIN bedges b ON b.src = a.dst
WHERE a.src <> b.dst
"""
)


@register_extra("graph_two_hop", _SQL_TWO_HOP)
def graph_two_hop(spark, sf_dir):
    """Two-hop reachability over the symmetric mention graph with the
    hub-mid gate engaged (entity mids exceed the cap at sf0.01 and are
    skipped; doc mids pass) — the gate IS the query here."""
    return G.two_hop(_bipartite_edges(spark, sf_dir), max_mid_degree=_TWO_HOP_CAP)


# ---------------------------------------------------------------------------
# Multi-source BFS: minimum hop distance from the two smallest entity
# nodes over the symmetric mention graph.  The SQL replays the walk
# with a hop-bounded recursive CTE + min(hop) (the reachability oracle
# pattern of graph_components, with distance kept).
# ---------------------------------------------------------------------------

_BFS_HOPS = 4

_SQL_BFS = (
    "\nWITH RECURSIVE "
    + _SQL_PRELUDE.replace("\nWITH ", "", 1)
    + _SQL_BEDGES
    + f"""
, seeds AS (
  SELECT node FROM (SELECT DISTINCT entity_id AS node FROM mentions)
  ORDER BY node LIMIT 2
),
walk(node, hop) AS (
  SELECT node, 0 AS hop FROM seeds
  UNION
  SELECT e.dst, w.hop + 1 FROM walk w JOIN bedges e ON e.src = w.node
  WHERE w.hop < {_BFS_HOPS}
)
SELECT node, CAST(min(hop) AS INT) AS hop FROM walk GROUP BY node
"""
)


def _ppr_sql() -> str:
    d = _PR_DAMPING
    ctes = [
        "nodes AS (SELECT DISTINCT src AS node FROM bedges)",
        "outd AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS od"
        " FROM bedges GROUP BY src)",
        "seeds AS (SELECT node FROM (SELECT DISTINCT entity_id AS node"
        " FROM mentions) ORDER BY node LIMIT 2)",
        "smeta AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM seeds)",
        # teleport vector: uniform over the seed set, 0 elsewhere —
        # the exact doubles the Spark side computes (_s / n_seeds)
        "tp AS (SELECT n.node, CASE WHEN s.node IS NULL THEN 0.0"
        " ELSE 1.0 / (SELECT ns FROM smeta) END AS t"
        " FROM nodes n LEFT JOIN seeds s ON n.node = s.node)",
        "p0 AS (SELECT node, t AS rank FROM tp)",
    ]
    for i in range(1, _PR_ITERS + 1):
        prev = f"p{i - 1}"
        # same association as the operator: tp*((1-d) + d*D) + d*c
        ctes.append(
            f"""p{i} AS (
  SELECT t.node,
         t.t * ((1 - {d})
                + {d} * (SELECT coalesce(sum(r.rank), 0) FROM {prev} r
                         LEFT JOIN outd o ON r.node = o.node
                         WHERE o.node IS NULL))
         + {d} * coalesce(c.c, 0) AS rank
  FROM tp t LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank / o.od) AS c
    FROM bedges e
    JOIN {prev} r ON e.src = r.node
    JOIN outd o ON o.node = e.src
    GROUP BY e.dst
  ) c ON t.node = c.node
)"""
        )
    return (
        _SQL_PRELUDE
        + _SQL_BEDGES
        + ", "
        + ",\n".join(ctes)
        + f"\nSELECT node, round(rank, 6) AS rank FROM p{_PR_ITERS}"
    )


@register_extra("graph_ppr", _ppr_sql())
def graph_ppr(spark, sf_dir):
    """Personalized PageRank over the mention graph — teleport uniform
    over the two smallest entity ids (the graph_bfs seed choice), 5
    synchronous rounds (operators/graph.py::pagerank(seeds=...)):
    entity relevance from the viewpoint of a query set. The SQL
    restates the seeded update with the operator's exact association
    (tp*((1-d) + d*D) + d*c)."""
    m = _doc_mentions(spark, sf_dir)
    seeds = (
        m.select(F.col("entity_id").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(2)
    )
    ranks = G.pagerank(
        _bipartite_edges(spark, sf_dir),
        iterations=_PR_ITERS,
        damping=_PR_DAMPING,
        seeds=seeds,
        assume_distinct=True,  # bedges is a set (see graph_pagerank)
    )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


# ---------------------------------------------------------------------------
# Weighted SSSP: minimum weighted distance from the BFS seed pair over
# the mention graph with a deterministic integer-valued edge weight
# (1 + (len(src)+len(dst)) % 7 — computed by the same expression in
# both engines, so every path sum is exact).  The SQL unrolls the
# synchronous Bellman-Ford rounds (node-sized CTEs, the PPR pattern;
# idempotent at the fixed point, so early Spark convergence cannot
# diverge); after round i both sides hold EXACTLY min(path weight)
# over paths of <= i edges.
# ---------------------------------------------------------------------------

_SSSP_ROUNDS = 6
_SSSP_W = "1.0 + (length(src) + length(dst)) % 7"


def _sssp_sql() -> str:
    ctes = [
        f"wedges AS (SELECT src, dst, {_SSSP_W} AS w FROM bedges)",
        "seeds AS (SELECT node FROM (SELECT DISTINCT entity_id AS node"
        " FROM mentions) ORDER BY node LIMIT 2)",
        "d0 AS (SELECT node, 0.0 AS dist FROM seeds)",
    ]
    for i in range(1, _SSSP_ROUNDS + 1):
        prev = f"d{i - 1}"
        ctes.append(
            f"""d{i} AS (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM {prev} d JOIN wedges e ON e.src = d.node
  ) GROUP BY node
)"""
        )
    return (
        _SQL_PRELUDE
        + _SQL_BEDGES
        + ", "
        + ",\n".join(ctes)
        + f"\nSELECT node, dist FROM d{_SSSP_ROUNDS}"
    )


@register_extra("graph_sssp", _sssp_sql())
def graph_sssp(spark, sf_dir):
    """Weighted multi-source shortest paths
    (operators/graph.py::sssp) from the two smallest entity ids over
    the mention graph, bounded at 6 Bellman-Ford rounds — weighted
    reach-cost radii.  The edge set is already symmetric, so the
    directed relaxation equals the undirected one; the weight is the
    oracle's literal expression evaluated Spark-side."""
    m = _doc_mentions(spark, sf_dir)
    seeds = (
        m.select(F.col("entity_id").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(2)
    )
    edges = _bipartite_edges(spark, sf_dir).withColumn(
        "weight",
        F.lit(1.0) + (F.length("src") + F.length("dst")) % F.lit(7),
    )
    return G.sssp(
        edges, seeds, max_rounds=_SSSP_ROUNDS, directed=True
    )


@register_extra("graph_bfs", _SQL_BFS)
def graph_bfs(spark, sf_dir):
    """Multi-source BFS hop distances (operators/graph.py::bfs_hops)
    from the two smallest entity ids, bounded at 4 hops — seed
    expansion over the mention graph.  The edge set is already
    symmetric, so the directed walk equals the undirected one."""
    m = _doc_mentions(spark, sf_dir)
    seeds = (
        m.select(F.col("entity_id").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(2)
    )
    return G.bfs_hops(
        _bipartite_edges(spark, sf_dir), seeds,
        max_hops=_BFS_HOPS, directed=True,
    )


# ---------------------------------------------------------------------------
# HyperBall: HLL neighborhood sketches + harmonic centrality, 3 fixed
# rounds at p=4 over the symmetric mention graph.  The SQL restates
# the ENTIRE dataflow — md5 register init (the sketch-family hashing,
# shared _rho_from_tail_expr), per-round union/join/bucket-max, and
# the per-round per-node estimator whose deltas accumulate the
# harmonic sum with the operator's exact association.
# ---------------------------------------------------------------------------

_HB_ROUNDS = 3
_HB_P = 4


def _hyperball_sql() -> str:
    m = 1 << _HB_P
    scale = 2**53
    num = repr(_alpha(m) * m * m * float(scale))
    bucket = f"(instr('{_HEX}', substring(h, 1, 1)) - 1)"
    rho = _rho_from_tail_expr("substring(h, 2, 13)")
    total = (
        f"CAST(sp + CAST(({m} - nb) AS DECIMAL(38,0))"
        f" * CAST({scale} AS DECIMAL(38,0)) AS DECIMAL(38,0))"
    )
    est = (
        f"CASE WHEN {num} / CAST({total} AS DOUBLE) <= {2.5 * m}"
        f" AND nb < {m}"
        f" THEN CAST({m} AS DOUBLE)"
        f" * ln(CAST({m} AS DOUBLE) / CAST({m} - nb AS DOUBLE))"
        f" ELSE {num} / CAST({total} AS DOUBLE) END"
    )
    ctes = [
        "nodes AS (SELECT DISTINCT src AS node FROM bedges)",
        "h0 AS (SELECT node, md5('hll:' || node) AS h FROM nodes)",
        f"s0 AS (SELECT node, CAST({bucket} AS INT) AS bucket,"
        f" CAST({rho} AS INT) AS r FROM h0)",
    ]
    for t in range(1, _HB_ROUNDS + 1):
        ctes.append(
            f"s{t} AS (SELECT node, bucket, max(r) AS r FROM ("
            f"SELECT node, bucket, r FROM s{t - 1}"
            f" UNION ALL"
            f" SELECT e.src AS node, s.bucket, s.r"
            f" FROM bedges e JOIN s{t - 1} s ON s.node = e.dst"
            f") u GROUP BY node, bucket)"
        )
    for t in range(_HB_ROUNDS + 1):
        ctes.append(
            f"a{t} AS (SELECT node, count(*) AS nb,"
            f" SUM(CAST(power(2.0, 53 - r) AS DECIMAL(38,0))) AS sp"
            f" FROM s{t} GROUP BY node)"
        )
        ctes.append(f"v{t} AS (SELECT node, {est} AS est FROM a{t})")
    # harmonic: the operator's exact left-to-right accumulation
    # ((0 + d1/1) + d2/2) + d3/3 over per-round estimate deltas.
    hc = "0.0"
    for t in range(1, _HB_ROUNDS + 1):
        hc = f"({hc} + (v{t}.est - v{t - 1}.est) / {float(t)})"
    joins = " ".join(
        f"JOIN v{t} ON v{t}.node = v0.node" for t in range(1, _HB_ROUNDS + 1)
    )
    return (
        _SQL_PRELUDE
        + _SQL_BEDGES
        + ", "
        + ", ".join(ctes)
        + f"""
SELECT v0.node AS node,
       round(v{_HB_ROUNDS}.est, 3) AS ball_est,
       round({hc}, 6) AS harmonic
FROM v0 {joins}
ORDER BY node
"""
    )


@register_extra("graph_hyperball", _hyperball_sql())
def graph_hyperball(spark, sf_dir):
    """HyperBall [Boldi & Vigna 2013] over the symmetric mention
    graph (operators/graph.py::hyperball, md5 oracle mode, p=4,
    3 rounds): per-node reachable-ball size estimates + harmonic
    centrality from HLL registers — per-round state is <= 2^p ints
    per node where exact all-pairs reachability is O(V*E)."""
    out = G.hyperball(
        _bipartite_edges(spark, sf_dir),
        p=_HB_P,
        max_rounds=_HB_ROUNDS,
        hash_mode="md5",
        directed=True,
    )
    return out.select(
        "node",
        F.round("ball_est", 3).alias("ball_est"),
        F.round("harmonic", 6).alias("harmonic"),
    ).orderBy("node")


# ---------------------------------------------------------------------------
# Link prediction: common-neighbor / Adamic-Adar scores over the
# co-occurrence graph (the triangles base), ungated (the hub gate is
# two_hop's contract, pinned there and in units).
# ---------------------------------------------------------------------------

_SQL_LINKPRED = (
    _SQL_PRELUDE
    + _SQL_PAIRS
    + """
, e0 AS (SELECT subj AS src, obj AS dst FROM pairs WHERE subj <> obj)
, und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0)
),
nbr AS (SELECT src AS mid, dst AS n FROM und),
deg AS (SELECT mid, count(*) AS md FROM nbr GROUP BY mid),
wedge AS (
  SELECT x.n AS u, y.n AS w, d.md
  FROM nbr x
  JOIN nbr y ON y.mid = x.mid AND x.n < y.n
  JOIN deg d ON d.mid = x.mid
),
scored AS (
  SELECT u, w, count(*) AS cn, sum(1.0 / ln(CAST(md AS DOUBLE))) AS aa
  FROM wedge GROUP BY u, w
)
SELECT u AS src, w AS dst,
       CAST(cn AS BIGINT) AS common_neighbors,
       round(aa, 6) AS adamic_adar
FROM scored s
WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.src = s.u AND und.dst = s.w)
ORDER BY src, dst
"""
)


@register_extra("graph_link_prediction", _SQL_LINKPRED)
def graph_link_prediction(spark, sf_dir):
    """Link-prediction scores (operators/graph.py::link_prediction)
    over the entity co-occurrence graph: common-neighbor count and
    Adamic-Adar for every absent pair at distance two — the wedge
    join of two_hop with the scoring fold, each unordered pair once."""
    m = _doc_mentions(spark, sf_dir)
    src = m.where(F.col("entity_type") == "op").select(
        "doc_id", F.col("entity_id").alias("subj")
    )
    tgt = m.where(F.col("entity_type") == "obj").select(
        "doc_id", F.col("entity_id").alias("obj")
    )
    pairs = src.join(tgt, "doc_id").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    out = G.link_prediction(pairs)
    return out.select(
        "src", "dst", "common_neighbors",
        F.round("adamic_adar", 6).alias("adamic_adar"),
    ).orderBy("src", "dst")


# ---------------------------------------------------------------------------
# k-core decomposition: the h-index iteration replayed round by round
# (the chained-CTE pattern of _lpa_sql).  Both engines compute h^R for
# the SAME fixed R: the Spark loop's early convergence break cannot
# diverge because the h-index fixed point is idempotent (h^k = h^R for
# all R >= k), so parity holds whether or not the small graph converges
# before R.
# ---------------------------------------------------------------------------

_KCORE_ROUNDS = 8


def _kcore_sql() -> str:
    ctes = [
        """kund AS (
  SELECT DISTINCT least(subj, obj) AS u, greatest(subj, obj) AS v
  FROM pairs WHERE subj <> obj
)""",
        "ksym AS (SELECT u, v FROM kund UNION ALL SELECT v AS u, u AS v FROM kund)",
        "h0 AS (SELECT u AS node, count(*) AS val FROM ksym GROUP BY u)",
    ]
    for i in range(1, _KCORE_ROUNDS + 1):
        ctes.append(
            f"""h{i} AS (
  SELECT node, max(least(lvl, cum)) AS val FROM (
    SELECT node, lvl,
           sum(c) OVER (PARTITION BY node ORDER BY lvl DESC) AS cum
    FROM (SELECT s.u AS node, p.val AS lvl, count(*) AS c
          FROM ksym s JOIN h{i - 1} p ON p.node = s.v
          GROUP BY s.u, p.val) m
  ) GROUP BY node
)"""
        )
    return (
        _SQL_PRELUDE
        + _SQL_PAIRS
        + ", "
        + ",\n".join(ctes)
        + f"\nSELECT node, CAST(val AS BIGINT) AS core FROM h{_KCORE_ROUNDS}"
        + "\nORDER BY node"
    )


@register_extra("graph_kcore", _kcore_sql())
def graph_kcore(spark, sf_dir):
    """Core numbers (operators/graph.py::core_numbers — the Lu et al.
    h-index iteration whose fixed point is the exact k-core
    decomposition) over the entity co-occurrence graph."""
    m = _doc_mentions(spark, sf_dir)
    src = m.where(F.col("entity_type") == "op").select(
        "doc_id", F.col("entity_id").alias("subj")
    )
    tgt = m.where(F.col("entity_type") == "obj").select(
        "doc_id", F.col("entity_id").alias("obj")
    )
    pairs = src.join(tgt, "doc_id").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return G.core_numbers(pairs, max_rounds=_KCORE_ROUNDS).orderBy("node")


# ---------------------------------------------------------------------------
# k-truss: support peeling over the THRESHOLDED entity co-occurrence
# projection (operators/graph.py::k_truss).  The subj-obj pair graph
# is strictly bipartite (zero triangles — any truss over it is
# vacuous), so the truss oracle uses the classic KG-curation graph
# instead: two entities are linked when they co-occur in >= _KTRUSS_T
# mention pairs (the threshold sparsifies the otherwise-complete
# co-occurrence clique into real structure: 48 edges -> a 20-edge
# 6-truss through a 3-round peeling cascade at sf0.01).  The SQL
# unrolls the rounds — each round enumerates the survivor set's
# triangles as ordered (a < b < c) canonical-edge joins, counts
# per-edge support with the SAME three-edge explode the Spark side
# uses, and keeps edges with support >= k-2.  Peeling is idempotent
# at the fixed point, so an early Spark convergence cannot diverge
# from extra unrolled rounds.  Every per-round CTE is MATERIALIZED:
# each round references its predecessor 4x, so inlined CTEs expand
# 4^rounds-fold (the un-hinted form exhausted file handles re-opening
# the parquet scan hundreds of times).
# ---------------------------------------------------------------------------

_KTRUSS_K = 6
_KTRUSS_ROUNDS = 6
_KTRUSS_T = 323  # sf0.01 fixture: 70th-percentile pair co-mention count


def _ktruss_sql() -> str:
    ctes = [
        f"""te0 AS MATERIALIZED (
  SELECT least(a.entity_id, b.entity_id) AS u,
         greatest(a.entity_id, b.entity_id) AS v
  FROM mentions a JOIN mentions b ON a.doc_id = b.doc_id
  WHERE a.entity_id < b.entity_id
  GROUP BY 1, 2
  HAVING count(*) >= {_KTRUSS_T}
)"""
    ]
    for i in range(1, _KTRUSS_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"""tt{i} AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM te{p} e1
  JOIN te{p} e2 ON e2.u = e1.v
  JOIN te{p} e3 ON e3.u = e1.u AND e3.v = e2.v
)"""
        )
        ctes.append(
            f"""ts{i} AS MATERIALIZED (
  SELECT u, v, count(*) AS sup FROM (
    SELECT a AS u, b AS v FROM tt{i}
    UNION ALL SELECT a AS u, c AS v FROM tt{i}
    UNION ALL SELECT b AS u, c AS v FROM tt{i}
  ) GROUP BY u, v
)"""
        )
        ctes.append(
            f"""te{i} AS MATERIALIZED (
  SELECT e.u, e.v FROM te{p} e
  LEFT JOIN ts{i} s ON s.u = e.u AND s.v = e.v
  WHERE coalesce(s.sup, 0) >= {_KTRUSS_K - 2}
)"""
        )
    return (
        _SQL_PRELUDE
        + ", "
        + ",\n".join(ctes)
        + f"\nSELECT u AS src, v AS dst FROM te{_KTRUSS_ROUNDS}"
        + "\nORDER BY src, dst"
    )


@register_extra("graph_ktruss", _ktruss_sql())
def graph_ktruss(spark, sf_dir):
    """The 6-truss of the thresholded entity co-occurrence projection
    (operators/graph.py::k_truss — support peeling, exact at its
    fixed point): co-mention edges whose evidence sits inside >= 4
    mutually corroborating triangles of the surviving subgraph."""
    m = _doc_mentions(spark, sf_dir).select("doc_id", "entity_id")
    a, b = m.alias("a"), m.alias("b")
    edges = (
        a.join(b, "doc_id")
        .where(F.col("a.entity_id") < F.col("b.entity_id"))
        .groupBy(
            F.col("a.entity_id").alias("src"),
            F.col("b.entity_id").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= _KTRUSS_T)
        .select("src", "dst")
    )
    return G.k_truss(edges, _KTRUSS_K, max_rounds=_KTRUSS_ROUNDS).orderBy(
        "src", "dst"
    )


# ---------------------------------------------------------------------------
# BGP triple-pattern query (operators/kgquery.py) — the KG read path.
# Triple base: the three edge families the pipeline materializes, as
# one heterogeneous (subj, pred, obj) table (branches are disjoint by
# pred and each internally distinct, so no global distinct is needed).
# ---------------------------------------------------------------------------

_SQL_KG = """
, kg AS (
  SELECT 'D:' || CAST(doc_id AS VARCHAR) AS subj, 'mentions' AS pred,
         entity_id AS obj
  FROM mentions
  UNION ALL
  SELECT DISTINCT subj, 'acts_on' AS pred, obj FROM pairs
  UNION ALL
  SELECT DISTINCT entity_id AS subj, 'instance_of' AS pred,
         entity_type AS obj
  FROM mentions
)
"""


def _kg_triples(spark, sf_dir):
    # The 4-pattern BGP consumes the base once per pattern, and the
    # mention subtree feeds THREE branches (mentions / acts_on via the
    # pair self-join / instance_of) — without materialization it
    # recomputes per consumer (exchange reuse only dedupes
    # byte-identical subtrees, and the branch projections differ).
    # ONE eager localCheckpoint runs the detection+distinct once;
    # every branch then reads the materialized partitions (round 6:
    # kg_bgp_query 10.2 s -> the base was 3.0 s of it, recomputed ~4x).
    m = _doc_mentions(spark, sf_dir).localCheckpoint()
    doc_node = F.concat(F.lit("D:"), F.col("doc_id").cast("string"))
    mention_edges = m.select(
        doc_node.alias("subj"),
        F.lit("mentions").alias("pred"),
        F.col("entity_id").alias("obj"),
    )
    # DISTINCT: pair rows carry doc-level multiplicity (one row
    # per co-mentioning doc); a materialized triple table is a SET of
    # (s, p, o).  Without this the acts_on branch is |pairs| rows, not
    # |edges|, and every BGP join through it multiplies by the doc
    # count — measured 251k-row edge table -> 968M-row intermediate at
    # sf0.1 (347 s) vs 80 edges -> seconds after the fix.  Built from
    # the checkpointed mention table directly (same (subj, obj) set as
    # distinct-of-_doc_pairs: projecting before the distinct cannot
    # add or drop an edge).
    src = m.where(F.col("entity_type") == "op").select(
        "doc_id", F.col("entity_id").alias("subj")
    )
    tgt = m.where(F.col("entity_type") == "obj").select(
        "doc_id", F.col("entity_id").alias("obj")
    )
    pair_edges = (
        src.join(tgt, "doc_id", "inner")
        .select("subj", "obj")
        .distinct()
        .select("subj", F.lit("acts_on").alias("pred"), "obj")
    )
    type_edges = (
        m.select(
            F.col("entity_id").alias("subj"),
            F.lit("instance_of").alias("pred"),
            F.col("entity_type").alias("obj"),
        )
        .distinct()
    )
    return mention_edges.unionByName(pair_edges).unionByName(type_edges)


# Docs that mention BOTH ends of an acts_on edge whose object is an
# 'obj'-typed entity: a 4-pattern star+path BGP exercising shared-var
# joins on subj AND obj positions, a (pred, object)-constant pattern
# (?y instance_of obj — deliberately NOT statically broadcast, AQE
# decides), and DISTINCT binding semantics.
_SQL_BGP = (
    _SQL_KG
    + """
SELECT DISTINCT t0.subj AS d, t0.obj AS x, t1.obj AS y
FROM kg t0
JOIN kg t1 ON t1.pred = 'acts_on'     AND t1.subj = t0.obj
JOIN kg t2 ON t2.pred = 'mentions'    AND t2.subj = t0.subj
                                      AND t2.obj = t1.obj
JOIN kg t3 ON t3.pred = 'instance_of' AND t3.subj = t1.obj
                                      AND t3.obj = 'obj'
WHERE t0.pred = 'mentions'
"""
)


@register("kg_bgp_query", _SQL_PRELUDE + _SQL_PAIRS + _SQL_BGP)
def kg_bgp_query(spark, sf_dir):
    """SPARQL-style basic graph pattern over the materialized KG
    (operators/kgquery.py::bgp_query): compile-to-joins read path —
    constant terms pushed to the scans, shared variables joined,
    2-constant patterns broadcast."""
    from .operators.kgquery import bgp_query

    kg = _kg_triples(spark, sf_dir)
    return bgp_query(
        kg,
        [
            ("?d", "mentions", "?x"),
            ("?x", "acts_on", "?y"),
            ("?d", "mentions", "?y"),
            ("?y", "instance_of", "obj"),
        ],
    )


# ---------------------------------------------------------------------------
# N-Triples interchange (sources/rdf.py) — serialize -> parse must be
# the identity on the KG triple base (IRI-object mode; the literal
# escape chain is unit-tested with adversarial payloads in
# tests/test_kgquery.py since the oracle corpus ids are IRI-safe).
# ---------------------------------------------------------------------------

_SQL_NT = (
    _SQL_KG
    + """
SELECT subj, pred, obj, TRUE AS obj_is_iri FROM kg
"""
)


@register_extra("kg_ntriples_roundtrip", _SQL_PRELUDE + _SQL_PAIRS + _SQL_NT)
def kg_ntriples_roundtrip(spark, sf_dir):
    """sources/rdf.py: to_ntriples -> parse_ntriples over the
    heterogeneous KG base is the identity (codegen'd concat/replace
    out, anchored regexp_extract back; no UDFs either way)."""
    from .sources.rdf import parse_ntriples, to_ntriples

    kg = _kg_triples(spark, sf_dir)
    return parse_ntriples(to_ntriples(kg))


# ---------------------------------------------------------------------------
# Property-path pred+ reachability (operators/kgquery.py::property_path)
# over the UNDIRECTED 'mentions' slice of the KG base — the only
# multi-hop structure at oracle scale (acts_on/instance_of are
# bipartite-by-type, depth 1 by construction).  Seeds: the 2 smallest
# entity ids; hop bound 2 keeps the DuckDB walk CTE small.
# ---------------------------------------------------------------------------

_PATH_HOPS = 2

_SQL_PATH = (
    "\nWITH RECURSIVE "
    + _SQL_PRELUDE.replace("\nWITH ", "", 1)
    + _SQL_PAIRS
    + _SQL_KG
    + f"""
, medges AS (
  SELECT subj AS src, obj AS dst FROM kg WHERE pred = 'mentions'
  UNION
  SELECT obj AS src, subj AS dst FROM kg WHERE pred = 'mentions'
),
seeds AS (
  SELECT node FROM (SELECT DISTINCT entity_id AS node FROM mentions)
  ORDER BY node LIMIT 2
),
walk(node, hop) AS (
  SELECT node, 0 AS hop FROM seeds
  UNION
  SELECT e.dst, w.hop + 1 FROM walk w JOIN medges e ON e.src = w.node
  WHERE w.hop < {_PATH_HOPS}
)
SELECT node, CAST(min(hop) AS INT) AS hop FROM walk GROUP BY node
"""
)


@register_extra("kg_path_reachable", _SQL_PATH)
def kg_path_reachable(spark, sf_dir):
    """SPARQL mentions+ property path: min-hop reachability from the
    2 smallest entity ids through undirected mention edges
    (operators/kgquery.py::property_path -> graph.bfs_hops)."""
    from .operators.kgquery import property_path

    kg = _kg_triples(spark, sf_dir)
    seeds = (
        _doc_mentions(spark, sf_dir)
        .select(F.col("entity_id").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(2)
    )
    return property_path(
        kg, "mentions", seeds, max_hops=_PATH_HOPS, directed=False
    )
