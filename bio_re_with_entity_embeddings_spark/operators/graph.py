"""Graph analytics over the materialized KG (beyond-reference).

The reference stops at emitting (subj, pred, obj) rows
(``prepare_pair_dataset.py:19-68`` writes the pair table and exits);
the first thing every consumer of a materialized graph does next is
rank and slice it — degree profiles, neighborhood expansion, triangle
/ clustering structure, PageRank.  This module supplies those as
DataFrame-native operators over an arbitrary edge table with columns
``src`` / ``dst`` (string or integral node ids), so they run on the
triple table, the doc-entity mention graph, or any projection.

Scale shape (the 100-TB lens for each operator):

* ``degrees`` — ONE map-combined groupBy over the exploded endpoint
  stream; no joins, no driver collects.
* ``two_hop`` — the mid-node self-join is the classic skew detonator
  (a 10^6-degree hub mid contributes 10^12 wedges); gated by
  ``max_mid_degree`` the same way every dedup bucket join is gated
  (operators/dedup.py): hub mids are SKIPPED, loudly, not enumerated.
* ``triangles`` — degree-ordered orientation (each undirected edge
  points low->high by (degree, node)) bounds every oriented
  out-neighborhood by O(sqrt(m)) [Schank & Wagner 2005; the standard
  MapReduce formulation], so the wedge join is O(m^{3/2}) worst case
  instead of sum(deg^2) — hub-safe without a cap.
* ``pagerank`` — per-iteration cost is one edges|><|ranks join + one
  map-combined groupBy; iteration state is lazily
  ``localCheckpoint``'ed and materialized by the SAME one-row action
  that computes the round's dangling mass (the fused-job pattern of
  canonicalize.connected_components); shuffle width adapts to the
  measured edge count instead of paying session width on toy graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .canonicalize import _loop_width


def degrees(edges: DataFrame) -> DataFrame:
    """(node, out_degree, in_degree, degree) over a DIRECTED edge set.

    ``degree`` counts edge endpoints (out + in), so a node on both
    sides of the same undirected relationship counts it twice —
    callers with an undirected graph pass each edge once and read
    ``degree``.  One exploded endpoint stream -> one map-combined
    aggregate; no joins (a left-join of separate out/in aggregates
    would shuffle the node table twice for the same answer).
    """
    endpoints = edges.select(
        F.col("src").alias("node"), F.lit(1).alias("o"), F.lit(0).alias("i")
    ).unionByName(
        edges.select(F.col("dst").alias("node"), F.lit(0).alias("o"), F.lit(1).alias("i"))
    )
    return endpoints.groupBy("node").agg(
        F.sum("o").alias("out_degree"),
        F.sum("i").alias("in_degree"),
        F.count(F.lit(1)).alias("degree"),
    )


def two_hop(edges: DataFrame, max_mid_degree: int | None = None) -> DataFrame:
    """Distinct (src, dst) pairs reachable in exactly two directed
    hops, src != dst.

    ``max_mid_degree`` gates the wedge join on the mid node's TOTAL
    degree (in + out): a mid above the cap is skipped entirely — the
    pairs it would have connected can still appear through other mids.
    Same contract as the per-bucket size gates in operators/dedup.py:
    at web scale a single hub mid (a "the"-like entity) otherwise
    detonates the join quadratically.  The gate count rides the SAME
    (mid-keyed) clustering the wedge join shuffles on, so gating adds
    no exchange — only a window count.
    """
    # the input subtree feeds BOTH wedge sides (and the gate's degree
    # profile): materialize it once — lazy localCheckpoint, the CC-loop
    # pattern — instead of recomputing an arbitrarily expensive
    # upstream (e.g. the Arrow mention-detection stage) 2-3x.
    e0 = edges.select("src", "dst").localCheckpoint(eager=False)
    a = e0.select(F.col("src").alias("a_src"), F.col("dst").alias("mid"))
    b = e0.select(F.col("src").alias("mid"), F.col("dst").alias("b_dst"))
    if max_mid_degree is not None:
        deg = degrees(e0).where(F.col("degree") <= max_mid_degree).select(
            F.col("node").alias("mid")
        )
        # node-sized dimension, but it GROWS with the graph: merge-hint
        # the semi-joins rather than letting AQE attempt a broadcast of
        # an O(V) table (the dedup.py 2M-doc lesson).
        a = a.join(deg.hint("merge"), "mid", "left_semi")
        b = b.join(deg.hint("merge"), "mid", "left_semi")
    return (
        a.join(b, "mid")
        .where(F.col("a_src") != F.col("b_dst"))
        .select(F.col("a_src").alias("src"), F.col("b_dst").alias("dst"))
        .distinct()
    )


def triangles(edges: DataFrame) -> DataFrame:
    """(node, n_triangles): triangles of the UNDIRECTED simple graph
    underlying ``edges`` (direction and multiplicity ignored,
    self-loops dropped).

    Degree-ordered orientation: every undirected edge {u, v} becomes
    one arc low->high under the (degree, node) total order, so each
    triangle {u, v, w} appears as EXACTLY one wedge (u->v, u->w with
    v < w) closed by arc v->w — counted once, and every oriented
    out-neighborhood is O(sqrt(m)).  The closing join is on the
    composite (v, w) key — narrow, uniformly hashed — never on a
    single hub node.
    """
    # und feeds the degree profile AND the orientation; oriented feeds
    # both wedge sides AND the closing-arc lookup — materialize each
    # once (lazy localCheckpoint, the CC-loop pattern) instead of
    # recomputing the upstream + orientation join cascade 3x per
    # action (measured 52.8 s -> see BENCH/BASELINE.md before/after).
    und = _canonical_simple(edges).localCheckpoint(eager=False)
    tri, deg = _tri_core(und)
    per_node = (
        tri.select(F.explode(F.array("n1", "n2", "n3")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    # nodes in no triangle -> 0 (callers expect a full node profile)
    return (
        deg.select("node")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        )
    )


def _canonical_simple(edges: DataFrame) -> DataFrame:
    """(u, v) with u < v: the undirected simple edge set underlying a
    directed/multi ``src``/``dst`` table (self-loops dropped)."""
    return (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("u"),
            F.greatest(F.col("src"), F.col("dst")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _tri_core(und: DataFrame):
    """(tri, deg) over a canonical simple edge set ``und`` (u < v,
    ideally already lazily checkpointed): ``tri`` holds one
    (n1, n2, n3) row per triangle via the degree-ordered orientation
    (n1 is the low-degree apex; {n2, n3} close the wedge), ``deg`` the
    undirected degree profile.  Shared by :func:`triangles` (per-node
    counts), :func:`edge_support` (per-edge counts) and
    :func:`k_truss` (support peeling)."""
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.withColumnsRenamed({"node": "u", "d": "du"})
    dv = deg.withColumnsRenamed({"node": "v", "d": "dv"})
    # merge-hint, not broadcast: deg is O(V) and grows with the graph.
    lo_hi = F.col("du") < F.col("dv")
    tie = (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    oriented = (
        und.join(du.hint("merge"), "u")
        .join(dv.hint("merge"), "v")
        .select(
            F.when(lo_hi | tie, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lo_hi | tie, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
        .localCheckpoint(eager=False)
    )
    # wedges at the low-degree apex: (a -> b1, a -> b2), ordered so the
    # closing arc is looked up once.  The pair (b1 < b2) follows the
    # SAME (degree, node) order the orientation used, so the closing
    # arc b1 -> b2 is oriented iff it exists.
    w1 = oriented.withColumnsRenamed({"b": "b1"})
    w2 = oriented.withColumnsRenamed({"b": "b2"})
    wedges = w1.join(w2, "a").where(
        # b1 precedes b2 in orientation order == the arc (b1, b2) is
        # the one the orientation would emit; comparing the oriented
        # endpoints directly avoids re-joining degrees here.
        F.col("b1") != F.col("b2")
    )
    closing = oriented.select(F.col("a").alias("b1"), F.col("b").alias("b2"))
    tri = wedges.join(closing, ["b1", "b2"]).select(
        F.col("a").alias("n1"), F.col("b1").alias("n2"), F.col("b2").alias("n3")
    )
    return tri, deg


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """(node, label) after ``iterations`` SYNCHRONOUS label-propagation
    rounds over the UNDIRECTED simple graph underlying ``edges``
    (Raghavan et al. 2007's community detection, made deterministic):
    every node starts labeled with itself; each round every node
    simultaneously adopts the most frequent label among its neighbors,
    ties broken by the SMALLEST label.  Fixed rounds + deterministic
    tie-break = restatable in plain SQL (unlike the async/randomized
    original), at the price of possible 2-cycles on bipartite-ish
    structures — callers pick ``iterations`` odd/even deliberately.

    Execution shape per round: one edges|><|labels join, one
    (node, label) map-combined count, one min(struct(-cnt, label))
    argmax — no window over raw messages; state is lazily
    ``localCheckpoint``'ed per round (constant-size Catalyst plans)
    and materialized by one final action, the pagerank fast-path
    pattern.  Isolated nodes cannot occur (every node has >= 1
    neighbor by construction of the symmetric edge set).

    String-keyed graphs at high round counts: messages carry TWO id
    columns (node, label), so the dictionary-encode technique of
    ``pagerank(encode_ids=True)`` applies with double the payload
    saving — callers running many rounds should pre-encode ids (the
    KG pipeline's scale path already carries int entity keys).
    """
    und = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("u"),
            F.greatest(F.col("src"), F.col("dst")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)
    spark = edges.sparkSession
    ceiling = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_edges = sym.count()  # materializes sym; sizes the loop width
    p = _loop_width(n_edges, ceiling)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .repartition(p, "node")
        .localCheckpoint(eager=False)
    )
    for _ in range(iterations):
        msgs = sym.join(
            labels.select(F.col("node").alias("u"), "label"), "u"
        ).select(F.col("v").alias("node"), "label")
        counts = msgs.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        labels = (
            counts.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("neg"), F.col("label"))
                ).alias("best")
            )
            .select("node", F.col("best.label").alias("label"))
            .repartition(p, "node")
            .localCheckpoint(eager=False)
        )
    labels.count()  # one action materializes the round cascade
    if stats is not None:
        stats["rounds"] = iterations
        stats["n_edges_sym"] = n_edges
    return labels


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    tol: float | None = None,
    stats: dict | None = None,
    encode_ids: bool = False,
    seeds: DataFrame | None = None,
    assume_distinct: bool = False,
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous PageRank rounds
    over the DIRECTED edge set (parallel edges collapse; ranks sum
    to 1).

    ``assume_distinct``: the caller asserts the edge set carries no
    parallel edges, so the defensive ``distinct()`` (one full exchange
    + dedup of the edge table before anything else runs) is skipped.
    Measured round 6 at sf0.1: the distinct cost 1.4 s of a 2.1 s
    edge-base materialization on a 139k-edge input that was provably
    already a set. Only assert it when it is provable — a parallel
    edge would inflate out-degrees and per-round contributions.

    rank'(v) = (1-d)*t(v) + d * (sum_{u->v} rank(u)/outdeg(u) + D*t(v))

    where D is the total rank mass on dangling nodes (outdeg 0) and
    t is the TELEPORT distribution: uniform 1/N by default, or — when
    ``seeds`` (a one-column ``node`` DataFrame) is given —
    PERSONALIZED PageRank with t uniform over the seed set (relevance
    to a query set: 'which entities matter from the viewpoint of
    these seeds'). Dangling mass is redistributed by t in both cases
    — the standard stochastic-matrix fix, so mass is conserved
    exactly and the result is independent of how many dangling nodes
    the graph has.

    Seed handling: seeds are intersected with the graph's node set
    and the teleport renormalized over the found seeds (documented
    contract — a seed absent from the graph contributes nothing);
    zero found seeds raises ``ValueError``. The seed flag rides the
    state table as one extra column, so the per-round plan shape is
    IDENTICAL to the uniform case (same single join + fused action;
    the scalar (1-d)/N terms become tp-column multiplies).

    Execution shape per round: ONE edges|><|ranks equi-join on src
    (both sides riding the SAME explicit width-p clustering — the
    groupBy(dst) is repartitioned to p too, so partials combine
    map-side and the width never silently reverts to session width
    on a toy graph) and ONE one-row action per round that
    simultaneously (a) materializes the round's lazy
    ``localCheckpoint``, (b) computes the NEXT round's dangling mass,
    and (c) when ``tol`` is set, the L1 delta vs the previous round —
    the fused-job pattern of ``connected_components._edge_signature``.
    N and the edge count are measured ONCE up front (two small jobs at
    plan-build time, same documented trade as
    ``embedding_lsh_candidates``' n_vectors probe).

    ``tol``: optional early stop when the L1 delta between rounds
    falls below it.  Leave None for a fixed, oracle-restatable round
    count.  ``stats`` receives {"rounds": n, "n_nodes": N}.

    Dangling-free fast path: the node set is fixed, so when the
    state_0 action reports ZERO dangling nodes (every symmetric graph,
    e.g. the bipartite mention graph) the per-round mass is provably
    0.0 forever — with ``tol`` unset the loop then chains all rounds
    LAZILY (no per-round driver action; each round's Catalyst plan is
    still constant-size because it compiles against the previous
    round's checkpoint RDD) and the caller's first action materializes
    the checkpoint cascade in one go.  Measured honestly: ~nil on
    local mode at sf0.1 (6.5 s vs 6.6 s interleaved median — the
    checkpoint materialization work dominates either way); the win is
    N fewer driver round-trips, which matters on a real cluster where
    each job submission pays scheduler + network latency, not here.

    ``encode_ids``: dictionary-encode node ids to dense longs before
    the loop and restore them after (merge-hinted joins — the mapping
    is O(V) and grows with the graph).  The per-round shuffle ships
    (id, share) for every EDGE; with string ids that payload is
    ~28 B/row vs 16 B for longs, and long hash/compare is cheaper —
    measured 53.1 s -> 33.4 s (1.6x) at 20M edges x 5 rounds on
    pre-encoded input (BENCH/BASELINE.md).  The encode itself costs
    two string-keyed E-row joins + one V-row restore join, so it
    amortizes over rounds — interleaved A/B at 20M edges: a wash at
    5 rounds, ~1.6x faster at 10 rounds ([53.5, 67.5] s vs
    [84.6, 118.4] s).  Leave False for toy graphs or few rounds; set
    True at production round counts (~10+) on string-keyed graphs.
    """
    if encode_ids:
        e0 = edges.select("src", "dst").localCheckpoint(eager=False)
        dim = (
            e0.select(F.col("src").alias("node"))
            .unionByName(e0.select(F.col("dst").alias("node")))
            .distinct()
            .withColumn("nid", F.monotonically_increasing_id())
            .localCheckpoint(eager=False)
        )
        enc = (
            e0.join(
                dim.select(F.col("node").alias("src"), F.col("nid").alias("_s"))
                .hint("merge"),
                "src",
            )
            .join(
                dim.select(F.col("node").alias("dst"), F.col("nid").alias("_d"))
                .hint("merge"),
                "dst",
            )
            .select(F.col("_s").alias("src"), F.col("_d").alias("dst"))
        )
        seeds_enc = None
        if seeds is not None:
            seeds_enc = (
                seeds.select("node")
                .join(dim.hint("merge"), "node")
                .select(F.col("nid").alias("node"))
            )
        ranks = pagerank(
            enc, iterations=iterations, damping=damping, tol=tol,
            stats=stats, encode_ids=False, seeds=seeds_enc,
            assume_distinct=assume_distinct,
        )
        return ranks.join(
            dim.select(
                F.col("nid").alias("node"), F.col("node").alias("_orig")
            ).hint("merge"),
            "node",
        ).select(F.col("_orig").alias("node"), "rank")
    # AQE off for the loop (round 6): every width in the iteration is
    # an explicit measured repartition, so adaptive re-planning buys
    # nothing here — and it costs a lot at small scale: each round's
    # checkpoint materialization became 2-3 separate AQE query-stage
    # jobs with driver planning gaps between them (event-log audit: 34
    # jobs / 13.5 s for one 5-round call at sf1.0; job wall sum 9 s,
    # the rest inter-job gaps). Every action of the loop runs inside
    # this scope; the returned frame reads the already-materialized
    # final checkpoint, so the caller's conf is restored before any of
    # their actions run.
    from .canonicalize import _adaptive_off

    with _adaptive_off(edges.sparkSession):
        return _pagerank_fixed(
            edges, iterations, damping, tol, stats, seeds, assume_distinct
        )


def _pagerank_fixed(
    edges, iterations, damping, tol, stats, seeds, assume_distinct=False
):
    spark = edges.sparkSession
    # e feeds the degree aggregate AND the loop's edge table: persist it
    # so an expensive upstream (mention detection) runs exactly once;
    # released before returning (the returned state is checkpointed —
    # its partitions are already materialized by the final round's
    # action, so the unpersist cannot trigger a recompute).
    e = edges.select("src", "dst")
    if not assume_distinct:
        e = e.distinct()
    e = e.persist()
    # Fused node-set + out-degree pass (round 6, guide §2.4): explode
    # each edge into (src, 1) and (dst, 0) and ONE groupBy(node)
    # sums the out-degree with dangling nodes appearing at od=0 —
    # replacing the previous nodes-distinct (2E rows) + outd groupBy
    # (E rows) + nodes|><|outd left join: one exchange and no join
    # where there were three exchanges and a join, same (node, od)
    # relation row for row.
    pre = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("src").alias("node"), F.lit(1).alias("_c")),
                    F.struct(F.col("dst").alias("node"), F.lit(0).alias("_c")),
                )
            ).alias("s")
        )
        .select(F.col("s.node").alias("node"), F.col("s._c").alias("_c"))
        .groupBy("node")
        .agg(F.sum("_c").cast("long").alias("od"))
    )
    seed_cols = []
    if seeds is not None:
        sd = (
            seeds.select("node").distinct().withColumn("_sflag", F.lit(1))
        )
        pre = pre.join(sd, "node", "left")
        seed_cols = [
            F.coalesce("_sflag", F.lit(0)).cast("int").alias("_s")
        ]
    # ONE setup action (round 6): the edge count IS sum(od) over the
    # fused node/out-degree aggregate — each directed edge contributes
    # exactly one od unit at its src — so the previous separate
    # e.count() job folds into the same aggregate that reads N and the
    # dangling structure. state_0 itself stays a LAZY checkpoint now:
    # round 1's action materializes it (pre is recomputed once there
    # from the persisted e — two cheap partial-agg passes instead of a
    # third setup job + its driver gap).
    aggs0 = [
        F.count(F.lit(1)).alias("n"),
        F.sum("od").alias("sum_od"),
        F.sum(F.when(F.col("od") == 0, 1).otherwise(0)).alias("n_dangling"),
    ]
    if seeds is not None:
        # pre carries the raw left-join _sflag; the _s alias only
        # exists on the state projection below
        aggs0.append(
            F.sum(F.coalesce("_sflag", F.lit(0))).alias("n_seeds")
        )
        aggs0.append(
            F.sum(
                F.when(
                    (F.col("od") == 0) & (F.col("_sflag") == 1), 1
                ).otherwise(0)
            ).alias("n_dseeds")
        )
    row = pre.agg(*aggs0).collect()[0]
    n_nodes = int(row["n"])
    n_edges = int(row["sum_od"] or 0)
    ceiling = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    p = _loop_width(n_edges, ceiling)
    state = (
        pre.select(
            "node",
            F.col("od").cast("long").alias("od"),  # fused aggregate: 0 marks dangling
            *seed_cols,
            F.lit(0.0).alias("rank"),  # placeholder; set below once N is known
        )
        .repartition(p, "node")
        .localCheckpoint(eager=False)
    )
    if n_nodes == 0:
        # empty graph (e.g. graph-metrics over a zero-triple build):
        # empty profile, not a ZeroDivisionError
        e.unpersist()
        if stats is not None:
            stats["rounds"] = 0
            stats["n_nodes"] = 0
        return state.select("node", "rank")
    base = (1.0 - damping) / n_nodes
    if seeds is None:
        state = state.withColumn("rank", F.lit(1.0 / n_nodes))
        dangling = row["n_dangling"] / n_nodes  # uniform init: exact
    else:
        n_seeds = int(row["n_seeds"] or 0)
        if n_seeds == 0:
            e.unpersist()
            raise ValueError(
                "personalized pagerank: no seed appears in the graph"
            )
        # tp = teleport prob per node; rides the state like od does
        state = state.withColumn(
            "tp", F.col("_s").cast("double") / F.lit(float(n_seeds))
        ).drop("_s").withColumn("rank", F.col("tp"))
        dangling = int(row["n_dseeds"] or 0) / n_seeds  # seed-mass on dangling
    # localCheckpoint, not just persist (round 6): each round's plan
    # embeds ep's full lineage — with an expensive upstream (mention
    # detection) the driver re-ANALYZES that whole tree once per round
    # even though persist shortcuts execution (event-log audit: ~0.7 s
    # driver gap per round at sf1.0). The checkpoint compiles rounds
    # against a constant-size LogicalRDD instead. Lazy: round 1's
    # action materializes it.
    ep = e.repartition(p, "src").localCheckpoint(eager=False)
    rounds = 0
    # Dangling-free + fixed-round fast path (round 6): NO per-round
    # localCheckpoint. Each checkpoint call compiles that round's plan
    # (analysis + codegen) and materializes eagerly-enough to cost a
    # job — event-log audit at sf1.0 measured ~0.7 s driver gap + one
    # 6-task job per round even with eager=False. Chaining the rounds
    # as one lazy tree pays ONE planning pass and ONE final job for the
    # whole loop; a checkpoint every _CHUNK rounds bounds plan growth
    # at production round counts, and the tol/dangling path keeps its
    # per-round checkpoint (its convergence action needs the
    # materialization anyway).
    fast = tol is None and row["n_dangling"] == 0
    _CHUNK = 8
    for _ in range(iterations):
        if seeds is None:
            add_expr = F.lit(base + damping * dangling / n_nodes)
        else:
            # (1-d)*tp + d*D*tp, folded so the column multiplies once
            add_expr = F.col("tp") * F.lit(
                (1.0 - damping) + damping * dangling
            )
        contrib = (
            ep.join(
                state.where(F.col("od") > 0).select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("od")).alias("share"),
                ),
                "src",
            )
            .repartition(p, "dst")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("c"))
        )
        # No repartition before the checkpoint (round 6): the left join
        # preserves the state side's HashPartitioning(node, p) — the
        # clustering is already the loop invariant, so the explicit
        # exchange here was a per-round no-op shuffle of the full state.
        new_state = (
            state.withColumnRenamed("rank", "_prev_rank")
            .join(contrib, "node", "left")
            .select(
                "node",
                "od",
                *([] if seeds is None else ["tp"]),
                (add_expr + F.lit(damping) * F.coalesce("c", F.lit(0.0))).alias(
                    "rank"
                ),
                "_prev_rank",
            )
        )
        rounds += 1
        if fast:
            # dangling-free fast path (docstring): mass is 0.0 forever,
            # nothing to measure — no per-round driver action, and no
            # per-round checkpoint (see loop header); bound plan growth
            # every _CHUNK rounds.
            if rounds % _CHUNK == 0:
                new_state = new_state.localCheckpoint(eager=False)
            state = new_state.drop("_prev_rank")
            continue
        new_state = new_state.localCheckpoint(eager=False)
        state = new_state.drop("_prev_rank")
        # the ONE action of the round: materializes new_state's
        # checkpoint, measures next round's dangling mass and (when
        # tol is set) this round's convergence delta.
        aggs = [
            F.sum(F.when(F.col("od") == 0, F.col("rank")).otherwise(0.0)).alias("d")
        ]
        if tol is not None:
            aggs.append(F.sum(F.abs(F.col("rank") - F.col("_prev_rank"))).alias("l1"))
        r = new_state.agg(*aggs).collect()[0]
        dangling = r["d"] or 0.0
        if tol is not None and (r["l1"] or 0.0) < tol:
            break
    if fast and rounds:
        # fast path: ONE eager checkpoint materializes the whole chained
        # loop — must happen BEFORE the unpersist below, or the caller's
        # first action would recompute ep's (arbitrarily expensive)
        # upstream from lineage.
        state = state.localCheckpoint()
    # ep is a localCheckpoint now — its partitions are reclaimed by the
    # ContextCleaner when the frame is collected; only e holds an
    # explicit cache entry to release.
    e.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
        stats["n_nodes"] = n_nodes
    return state.select("node", "rank")


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 3,
    directed: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """(node, hop): MINIMUM hop distance from a source set, bounded by
    ``max_hops`` — multi-source breadth-first search, the neighborhood
    /reachability primitive (seed expansion, contamination radius,
    ego-network slicing) over any ``src``/``dst`` edge table.
    ``sources`` is a one-column ``node`` DataFrame; unreached nodes are
    absent from the output.

    Execution shape (the frontier-join pattern of
    sources/obo.py::with_parent_paths): per round ONE
    frontier|><|edges join + ONE anti-join against the visited set —
    every node enters the frontier AT MOST ONCE across the whole loop
    (BFS's min-hop property), so total join traffic is bounded by
    sum(deg(reached nodes)), NOT rounds * edges: the frontier, not the
    graph, pays each round.  State is repartitioned once by ``node``
    (``_loop_width`` from the measured edge count) and lazily
    ``localCheckpoint``'ed; the per-round frontier count that
    materializes the round doubles as the early-stop signal (the
    fused-action discipline of pagerank/connected_components), so an
    exhausted frontier ends the loop before ``max_hops``.
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct().localCheckpoint(eager=False)
    spark = edges.sparkSession
    ceiling = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_edges = e.count()  # materializes e; sizes the loop width
    p = _loop_width(n_edges, ceiling)
    dist = (
        sources.select("node")
        .distinct()
        .withColumn("hop", F.lit(0).cast("int"))
        .repartition(p, "node")
        .localCheckpoint(eager=False)
    )
    frontier = dist
    rounds = 0
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("hop", F.lit(h).cast("int"))
            .repartition(p, "node")
            .localCheckpoint(eager=False)
        )
        n_new = nxt.count()  # materializes the round + early-stop signal
        if n_new == 0:
            break
        rounds = h
        frontier = nxt
        dist = dist.unionByName(nxt).localCheckpoint(eager=False)
    dist.count()  # materialize the final union cascade
    if stats is not None:
        stats["rounds"] = rounds
        stats["n_edges"] = n_edges
    return dist


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    weight_col: str = "weight",
    max_rounds: int = 64,
    directed: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """(node, dist): MINIMUM weighted distance from a seed set —
    multi-source single-source-shortest-paths over a ``src``/``dst``/
    ``weight`` edge table (non-negative weights), the weighted
    complement of ``bfs_hops`` (reach-cost radii, weighted ego
    slicing, cheapest-evidence paths over a scored triple graph).
    ``sources`` is a one-column ``node`` DataFrame; unreachable nodes
    are absent from the output.

    Execution = frontier-activated Bellman-Ford: per round, ONE
    frontier|><|edges join relaxes only the out-edges of nodes whose
    distance improved last round, ONE map-combined min collapses the
    candidates, and ONE node-keyed left join against the running
    distance table keeps strict improvements (the next frontier).
    After round i the table holds EXACTLY min(path weight) over paths
    of <= i edges (the Bellman-Ford invariant — the frontier
    optimization skips only provably non-improving relaxations), so
    the fixed point is the true distance and an unconverged
    ``max_rounds`` cut is still a well-defined bounded-hop distance
    (restated verbatim by the oracle's unrolled rounds).  The
    per-round improved-count that materializes the round's lazy
    ``localCheckpoint`` doubles as the early-stop signal — the fused
    one-action-per-round discipline of pagerank / bfs_hops /
    connected_components.  Unlike BFS a node may re-enter the
    frontier (a later cheaper path), so total traffic is bounded by
    rounds * frontier degree sums, converging in at most
    (longest shortest path, in edges) rounds.

    Parallel edges collapse to their min weight before the loop (the
    cheapest parallel edge dominates any relaxation); self-loops are
    dropped (with w >= 0 they never improve).  Float policy: each
    path's weight accumulates left-to-right along the path in BOTH
    this loop and the oracle's unrolled CTEs — identical IEEE
    association, so min() sees identical doubles and integer-valued
    weights compare exactly.
    """
    w = F.col(weight_col).cast("double")
    e = (
        edges.select("src", "dst", w.alias("w"))
        .where(F.col("src") != F.col("dst"))
    )
    if not directed:
        e = e.unionByName(
            e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
    # min-collapse parallel edges: shrinks every round's join and makes
    # the relaxation candidate set deterministic.
    e = e.groupBy("src", "dst").agg(F.min("w").alias("w")).localCheckpoint(
        eager=False
    )
    spark = edges.sparkSession
    ceiling = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_edges = e.count()  # materializes e; sizes the loop width
    p = _loop_width(n_edges, ceiling)
    dist = (
        sources.select("node")
        .distinct()
        .withColumn("dist", F.lit(0.0))
        .repartition(p, "node")
        .localCheckpoint(eager=False)
    )
    frontier = dist
    rounds = 0
    for r in range(1, max_rounds + 1):
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"), (frontier["dist"] + F.col("w")).alias("d"))
            .groupBy("node")
            .agg(F.min("d").alias("d"))
        )
        old = dist.select("node", F.col("dist").alias("_old"))
        nxt = (
            cand.join(old, "node", "left")
            .where(F.col("_old").isNull() | (F.col("d") < F.col("_old")))
            .select("node", F.col("d").alias("dist"))
            .repartition(p, "node")
            .localCheckpoint(eager=False)
        )
        n_improved = nxt.count()  # materializes the round + early stop
        if n_improved == 0:
            break
        rounds = r
        frontier = nxt
        dist = (
            dist.join(nxt.select("node"), "node", "left_anti")
            .unionByName(nxt)
            .localCheckpoint(eager=False)
        )
    dist.count()  # materialize the final cascade
    if stats is not None:
        stats["rounds"] = rounds
        stats["n_edges"] = n_edges
    return dist


def link_prediction(
    edges: DataFrame,
    max_mid_degree: int | None = None,
    include_existing: bool = False,
) -> DataFrame:
    """(src, dst, common_neighbors, adamic_adar): link-prediction
    scores for UNORDERED node pairs at distance two in the undirected
    graph — the classic "which edges are missing" features
    (common-neighbor count and Adamic & Adar's sum of 1/ln(deg(mid))
    over shared neighbors, which discounts promiscuous mids).

    Scale shape = ``two_hop``'s wedge join with the same hub contract:
    ``max_mid_degree`` gates MID nodes by distinct-neighbor degree —
    a hub mid ("the"-like entity) otherwise contributes deg^2 wedge
    rows; gated mids are SKIPPED, loudly documented, not enumerated.
    The degree needed by the Adamic-Adar term rides the SAME mid-keyed
    clustering the wedge join shuffles on (one merge-hinted V-row
    join, no broadcast of an O(V) table), the pair reduction is ONE
    map-combinable groupBy on (src, dst), and existing edges leave via
    ONE merge-hinted anti-join (skipped with ``include_existing``).

    src < dst in every output row (each unordered pair once).  A mid
    with one distinct neighbor spawns no wedge, so deg(mid) >= 2 and
    ln never sees 1.  Float policy: the AA sum is order-sensitive at
    ~1e-15 like the pagerank rounds — callers compare rounded (the
    oracle rounds to 6).
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    und = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nbr = und.select(F.col("src").alias("mid"), F.col("dst").alias("n"))
    deg = nbr.groupBy("mid").agg(F.count(F.lit(1)).alias("_md"))
    if max_mid_degree is not None:
        deg = deg.where(F.col("_md") <= max_mid_degree)
    x = nbr.join(deg.hint("merge"), "mid").select(
        "mid", F.col("n").alias("u"), "_md"
    )
    y = nbr.select("mid", F.col("n").alias("w"))
    scored = (
        x.join(y, "mid")
        .where(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(F.lit(1.0) / F.log(F.col("_md").cast("double"))).alias(
                "adamic_adar"
            ),
        )
    )
    if not include_existing:
        ex = und.where(F.col("src") < F.col("dst")).select(
            F.col("src").alias("u"), F.col("dst").alias("w")
        )
        scored = scored.join(ex.hint("merge"), ["u", "w"], "left_anti")
    return scored.select(
        F.col("u").alias("src"),
        F.col("w").alias("dst"),
        "common_neighbors",
        "adamic_adar",
    )


def core_numbers(
    edges: DataFrame,
    max_rounds: int = 64,
    stats: dict | None = None,
) -> DataFrame:
    """(node, core): the core number (k-core decomposition) of every
    node of the UNDIRECTED simple graph underlying ``edges`` — the
    largest k such that the node survives in the subgraph where every
    node keeps degree >= k.  The density profile of the materialized
    KG: high-core nodes form the tightly-knit nucleus, core 1 is the
    tree-like fringe (curation consumers prune crawl/spam tendrils by
    core, the mirror of the degree gates in ``two_hop``).

    Algorithm: the h-index iteration of Lu et al. 2016 ("The H-index
    of a network node"), the local formulation behind Montresor et
    al.'s distributed k-core: h_0(v) = deg(v) and h_{t+1}(v) =
    H(h_t(w) : w ~ v), where H is the h-index (the largest k with at
    least k neighbors of value >= k).  The sequence is pointwise
    non-increasing (H(xs) <= len(xs) and H is monotone in its
    arguments) and its fixed point is EXACTLY the core number — a
    converged run is exact, not an estimate.

    Execution shape per round (the pagerank/LPA discipline): ONE
    edges|><|state join ships each neighbor's value, ONE map-combined
    (node, value) count compacts hub fan-in to <= #distinct-levels
    rows per node, ONE node-keyed window (descending value, running
    count) evaluates H as max(min(level, count_ge)) — never a window
    over raw messages — and ONE one-row action materializes the lazy
    ``localCheckpoint`` and reads the EXACT convergence signal: values
    are non-increasing integers, so the global sum is strictly
    decreasing until the fixed point; an unchanged sum IS convergence
    (the decimal-signal pattern of ``hyperball``, exact here because
    the values are integral).  Hub safety: per-round traffic is one
    value per directed edge — linear, no wedge blow-up anywhere.

    Activation (the bfs_hops frontier discipline, measured necessary):
    recomputing EVERY node EVERY round left the 1M-node/5M-edge probe
    graph unconverged after 64 full passes (304 s) — late rounds
    change only a thin cascade tail while paying the full V-row join.
    h_{t+1}(v) can differ from h_t(v) ONLY if some neighbor's value
    changed in round t (H reads nothing else), so each round recomputes
    just the nodes with a changed neighbor: the frontier collapses
    geometrically while the computed sequence stays EXACTLY h^t,
    round for round (the skipped nodes' values are provably fixed).
    Convergence signal: an empty changed-set — exact, and it doubles
    as the round's one materializing action.

    Round count: bounded by the longest peeling cascade (pathological
    paths can need O(V); the probe graph converged in 73 frontier
    rounds, 411.6 s — see BENCH/BASELINE.md).
    ``max_rounds`` caps the loop; ``stats`` receives {"rounds",
    "converged", "n_nodes", "n_edges_sym"} — callers that need the
    exactness guarantee assert ``converged``.
    """
    und = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("u"),
            F.greatest(F.col("src"), F.col("dst")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)
    spark = edges.sparkSession
    ceiling = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_edges = sym.count()  # materializes sym; sizes the loop width
    p = _loop_width(n_edges, ceiling)
    vals = (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).alias("val"))
        .repartition(p, "node")
        .localCheckpoint(eager=False)
    )
    n_nodes = vals.count()
    from pyspark.sql import Window

    win = Window.partitionBy("node").orderBy(F.col("lvl").desc())
    # round 0's frontier is everything: h_1 must be computed for every
    # node (degree -> first h-index); from then on only cascade tails.
    changed = vals.select("node").localCheckpoint(eager=False)
    rounds, converged = 0, n_nodes == 0
    for t in range(1, max_rounds + 1):
        if converged:
            break
        # nodes with at least one changed neighbor — the only ones
        # whose h-index can move this round.  merge hint: the frontier
        # is O(V) in round 1 and shrinks after; never broadcast.
        cand = (
            sym.join(
                changed.select(F.col("node").alias("v")).hint("merge"),
                "v",
                "left_semi",
            )
            .select(F.col("u").alias("node"))
            .distinct()
        )
        nbrv = (
            sym.join(
                cand.select(F.col("node").alias("u")).hint("merge"),
                "u",
                "left_semi",
            )
            .join(
                vals.select(F.col("node").alias("v"), F.col("val").alias("lvl")),
                "v",
            )
            .select(F.col("u").alias("node"), "lvl")
        )
        levels = nbrv.groupBy("node", "lvl").agg(F.count(F.lit(1)).alias("c"))
        upd = (
            levels.withColumn("cum", F.sum("c").over(win))
            .groupBy("node")
            .agg(F.max(F.least(F.col("lvl"), F.col("cum"))).alias("_nv"))
        )
        new_vals = (
            vals.join(upd.hint("merge"), "node", "left")
            .select(
                "node",
                F.coalesce("_nv", F.col("val")).alias("val"),
                (F.col("_nv") < F.col("val")).alias("_chg"),
            )
            .repartition(p, "node")
            .localCheckpoint(eager=False)
        )
        new_changed = new_vals.where(F.col("_chg")).select("node")
        # the ONE action of the round: materializes the checkpoint and
        # reads the exact convergence signal (empty frontier).
        n_changed = new_changed.count()
        vals = new_vals.drop("_chg")
        changed = new_changed.localCheckpoint(eager=False)
        rounds = t
        if n_changed == 0:
            converged = True
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
        stats["n_nodes"] = n_nodes
        stats["n_edges_sym"] = n_edges
    return vals.select("node", F.col("val").alias("core"))


def k_core(edges: DataFrame, k: int, max_rounds: int = 64) -> DataFrame:
    """The k-core SUBGRAPH: the undirected simple edges (src < dst)
    whose BOTH endpoints have core number >= ``k`` — equivalently the
    maximal subgraph of minimum degree >= k (the peeling fixed point).
    Composition over ``core_numbers``: the survivor set is O(V) and
    grows with the graph, so both endpoint filters are merge-hinted
    semi-joins, never broadcasts (the two_hop gate contract)."""
    keep = (
        core_numbers(edges, max_rounds=max_rounds)
        .where(F.col("core") >= k)
        .select("node")
    )
    und = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("src"),
            F.greatest(F.col("src"), F.col("dst")).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return und.join(
        keep.select(F.col("node").alias("src")).hint("merge"), "src", "left_semi"
    ).join(
        keep.select(F.col("node").alias("dst")).hint("merge"), "dst", "left_semi"
    )


def _edge_support_of(und: DataFrame) -> DataFrame:
    """(u, v, support) for a canonical simple edge set ``und`` (u < v,
    already lazily checkpointed): how many triangles of the CURRENT
    edge set each edge participates in.  Each (n1, n2, n3) triangle
    row contributes its three canonical edges to one exploded stream
    -> ONE map-combined (u, v) count; edges in no triangle come back
    with support 0 via the left join (und is the probe side — the
    support table is a subset of it, never broadcast: both are O(m))."""
    tri, _ = _tri_core(und)
    pair = lambda x, y: F.struct(  # noqa: E731
        F.least(x, y).alias("u"), F.greatest(x, y).alias("v")
    )
    sup = (
        tri.select(
            F.explode(
                F.array(
                    pair(F.col("n1"), F.col("n2")),
                    pair(F.col("n1"), F.col("n3")),
                    pair(F.col("n2"), F.col("n3")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return und.join(sup.hint("merge"), ["u", "v"], "left").select(
        "u", "v", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    )


def edge_support(edges: DataFrame) -> DataFrame:
    """(src, dst, support): per-edge triangle support of the
    UNDIRECTED simple graph underlying ``edges`` (src < dst in the
    output) — the edge-cohesion profile (an evidence edge embedded in
    many triangles is corroborated by closed co-occurrence structure;
    a support-0 bridge is a single-path claim).  The building block
    of :func:`k_truss`; hub-safe the same way :func:`triangles` is
    (degree-ordered wedge enumeration, O(m^{3/2}) worst case)."""
    und = _canonical_simple(edges).localCheckpoint(eager=False)
    return _edge_support_of(und).withColumnsRenamed({"u": "src", "v": "dst"})


def k_truss(
    edges: DataFrame,
    k: int,
    max_rounds: int = 64,
    stats: dict | None = None,
) -> DataFrame:
    """The k-truss SUBGRAPH: canonical simple edges (src < dst) of the
    maximal subgraph in which EVERY edge participates in >= k-2
    triangles of that same subgraph [Cohen 2008] — the edge-analog of
    :func:`k_core` and a strictly tighter cohesion filter (the k-truss
    is contained in the (k-1)-core): curation consumers keep claims
    whose evidence edges sit inside mutually-corroborating cliques-ish
    neighborhoods, not just near busy nodes.

    Algorithm: support peeling to the fixed point — drop every edge
    with support < k-2, recount on the survivors, repeat.  Peeling in
    any order reaches the SAME maximal fixed point (removal is
    monotone: deleting an edge can only lower other edges' support),
    so a converged run is exact, not an estimate.  Execution shape per
    round: the degree-ordered triangle enumeration of
    :func:`triangles` restricted to survivors (O(m'^{3/2}) with m'
    shrinking), ONE map-combined per-edge support count, ONE
    merge-hinted left join to filter, and ONE count action that
    materializes the round's lazy ``localCheckpoint`` AND reads the
    exact convergence signal (edge counts are non-increasing integers;
    an unchanged count IS the fixed point — the core_numbers
    discipline).  Unlike core_numbers there is no per-node frontier to
    activate: support must be recounted on the survivor set anyway
    (dropping one edge invalidates counts two hops away), and rounds
    are bounded by the peeling cascade depth, observed small on real
    graphs (the volume probe records it).

    ``stats`` receives {"rounds", "converged", "n_edges_in",
    "n_edges_kept"}; callers needing the exactness guarantee assert
    ``converged``.  k < 3 returns the simple graph unchanged (every
    edge has >= 0 triangles, support >= k-2 is vacuous).
    """
    und = _canonical_simple(edges).localCheckpoint(eager=False)
    n_cur = und.count()  # materializes und; baseline for convergence
    n_in = n_cur
    rounds, converged = 0, (k < 3 or n_cur == 0)
    cur = und
    for t in range(1, max_rounds + 1):
        if converged:
            break
        keep = (
            _edge_support_of(cur)
            .where(F.col("support") >= F.lit(int(k) - 2))
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        # the ONE action of the round: materializes the survivor set
        # and reads the exact convergence signal.
        n_keep = keep.count()
        rounds = t
        cur = keep
        if n_keep == n_cur:
            converged = True
        n_cur = n_keep
        if n_cur == 0:
            converged = True
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
        stats["n_edges_in"] = n_in
        stats["n_edges_kept"] = n_cur
    return cur.withColumnsRenamed({"u": "src", "v": "dst"})


def hyperball(
    edges: DataFrame,
    p: int = 4,
    max_rounds: int = 16,
    hash_mode: str = "xxhash64",
    directed: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """(node, ball_est, harmonic): HyperBall [Boldi & Vigna 2013] —
    per-node reachable-set size and harmonic-centrality ESTIMATES via
    HLL counters, the sketch-composed answer to "how big is every
    node's neighborhood" that exact all-pairs BFS cannot give at scale
    (exact N(v, t) for all v is O(V * E) and shuffles the full
    reachability relation; HyperBall's whole state is <= 2^p small
    ints per node).

    Update rule: B_0(v) = {v}; B_{t+1}(v) = B_t(v) u union of B_t(w)
    over edges v->w — expressed on HLL register rows (node, bucket, r)
    where the set union IS the bucket-wise max (the mergeability of
    operators/sketches.py::hll_registers, whose hashing this reuses
    verbatim so estimates match hll_distinct bit-for-bit).  At the
    register fixed point B_inf(v) is v's reachable set: ``ball_est``
    estimates its size (component size / closeness denominator) and
    ``harmonic`` accumulates sum_t (|B_t(v)| - |B_{t-1}(v)|) / t — the
    harmonic centrality estimator of Boldi & Vigna, robust to
    disconnected graphs where closeness degenerates.

    Execution shape per round (the pagerank/CC discipline): ONE
    edges|><|state join on dst ships each neighbor's <= 2^p register
    rows to src, ONE map-combinable groupBy(node, bucket) max(r)
    compacts, ONE small V-row join folds the per-node estimate delta
    into the harmonic accumulator, and ONE one-row action per round
    simultaneously materializes both lazy ``localCheckpoint``s, emits
    the round's neighborhood-function point N(t) = sum_v |B_t(v)|,
    and computes the EXACT convergence signal: the global DECIMAL sum
    of per-node register totals sum 2^(rho_max - r) is strictly
    decreasing while ANY register changes (raising r shrinks its term;
    filling a zero bucket replaces 2^rho_max with something smaller),
    so an unchanged sum is a true fixed point — no exceptAll co-group,
    no hash-collision odds at all.

    Cost dial: per-round join traffic is <= edges * 2^p tiny rows —
    p=4 (16 registers, se ~26%) suits ranking/telemetry; p=8 (256,
    ~6.5%) when the estimate itself is the product.  ``hash_mode``
    follows the dedup/sketch convention: 'xxhash64' production,
    'md5' the DuckDB-restatable oracle mode (p % 4 == 0).

    ``stats`` receives {"rounds", "n_edges", "n_nodes", "nf"} where
    nf[t] ~= N(t), the neighborhood function (nf[0] = N(0) ~= V; feed
    it to ``effective_diameter``).  Nodes are the edge endpoints;
    ``directed=False`` symmetrizes first (balls = undirected
    reachability).
    """
    from .sketches import _alpha, hll_registers

    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct().localCheckpoint(eager=False)
    spark = edges.sparkSession
    ceiling = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_edges = e.count()  # materializes e; sizes the loop width
    # width from the worst-case round's message volume (edges * 2^p
    # register rows), not the edge count alone — a saturated-ball
    # round really ships that many rows.
    w = _loop_width(n_edges << p, ceiling)

    m = 1 << p
    rho_max = 53 if hash_mode == "md5" else (64 - p + 1)
    scale = 2**rho_max
    alpha_num = _alpha(m) * m * m * float(scale)
    term = F.pow(F.lit(2.0), F.lit(rho_max) - F.col("r")).cast("decimal(38,0)")

    def _per_node(regs: DataFrame) -> DataFrame:
        # (node, _t2 exact-decimal register total, _e2 estimate) — the
        # estimator of sketches.hll_estimate with group_cols=[node],
        # kept inline so the decimal total doubles as the convergence
        # signal column.
        agg = regs.groupBy("node").agg(
            F.count(F.lit(1)).alias("_nb"),
            F.sum(term).cast("decimal(38,0)").alias("_sp"),
        )
        v_zero = F.lit(m) - F.col("_nb")
        total = (
            F.col("_sp")
            + v_zero.cast("decimal(38,0)") * F.lit(scale).cast("decimal(38,0)")
        ).cast("decimal(38,0)")
        raw = F.lit(alpha_num) / total.cast("double")
        est = F.when(
            (raw <= F.lit(2.5 * m)) & (v_zero > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
        ).otherwise(raw)
        return agg.select("node", total.alias("_t2"), est.alias("_e2"))

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    state = (
        hll_registers(nodes, "node", ["node"], p=p, hash_mode=hash_mode)
        .repartition(w, "node")
        .localCheckpoint(eager=False)
    )
    cur = (
        _per_node(state)
        .select(
            "node",
            F.col("_e2").alias("_prev"),
            F.lit(0.0).alias("hc"),
            F.col("_t2").alias("_total"),
        )
        .repartition(w, "node")
        .localCheckpoint(eager=False)
    )
    row = cur.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_total").alias("sig"),
        F.sum("_prev").alias("nf"),
    ).collect()[0]
    n_nodes, sig = row["n"], row["sig"]
    nf_hist = [float(row["nf"])]
    rounds = 0
    for t in range(1, max_rounds + 1):
        msgs = e.join(state, e["dst"] == state["node"]).select(
            e["src"].alias("node"), "bucket", "r"
        )
        new_state = (
            state.unionByName(msgs)
            .groupBy("node", "bucket")
            .agg(F.max("r").alias("r"))
            .repartition(w, "node")
            .localCheckpoint(eager=False)
        )
        pere = _per_node(new_state)
        new_cur = (
            cur.join(pere, "node")
            .select(
                "node",
                F.col("_e2").alias("_prev"),
                (
                    F.col("hc")
                    + (F.col("_e2") - F.col("_prev")) / F.lit(float(t))
                ).alias("hc"),
                F.col("_t2").alias("_total"),
            )
            .repartition(w, "node")
            .localCheckpoint(eager=False)
        )
        row = new_cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_total").alias("sig"),
            F.sum("_prev").alias("nf"),
        ).collect()[0]
        if row["sig"] == sig:
            break  # exact fixed point: no register changed anywhere
        sig = row["sig"]
        nf_hist.append(float(row["nf"]))
        rounds = t
        state, cur = new_state, new_cur
    if stats is not None:
        stats["rounds"] = rounds
        stats["n_edges"] = n_edges
        stats["n_nodes"] = n_nodes
        stats["nf"] = nf_hist
    return cur.select(
        "node",
        F.col("_prev").alias("ball_est"),
        F.col("hc").alias("harmonic"),
    )


def effective_diameter(nf: list[float], q: float = 0.9) -> float:
    """Interpolated effective diameter from a neighborhood-function
    series nf[t] ~= N(t) (``hyperball``'s stats["nf"]): the smallest
    t (linearly interpolated between integer radii, the HyperANF
    convention) at which N(t) reaches q * N(inf), N(inf) = nf[-1].
    Driver-side pure function — nf has one float per round."""
    if not nf:
        raise ValueError("empty neighborhood function")
    target = q * nf[-1]
    for t, v in enumerate(nf):
        if v >= target:
            if t == 0:
                return 0.0
            prev = nf[t - 1]
            if v > prev:
                return (t - 1) + (target - prev) / (v - prev)
            return float(t)
    return float(len(nf) - 1)
