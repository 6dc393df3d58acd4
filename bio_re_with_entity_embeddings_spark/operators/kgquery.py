"""Basic-graph-pattern (BGP) queries over the materialized triple table.

The reference stops at writing pair/triple rows
(``prepare_pair_dataset.py:19-68``); the graph family
(operators/graph.py) ranks and slices the result.  What neither gives
a consumer is the first-class KG read path: *match a pattern of
triples with shared variables* — the SPARQL basic-graph-pattern core,
``(?d mentions ?x) (?x acts_on ?y) (?y instance_of obj)`` — which is
how every downstream user actually asks a knowledge graph a question.

``bgp_query`` compiles a pattern list into a DataFrame join tree:

* each pattern becomes ONE scan of the triple table with its constant
  terms as pushed-down filters (on the (pred, bucket(subj))-partitioned
  graph layout of sources/iceberg.py a constant ``pred`` prunes to a
  single partition subtree, and a constant ``subj``/``obj`` reaches the
  parquet row-group stats — the filters sit directly on the scan node,
  so Catalyst's pushdown does the pruning for free);
* shared variables become inner equi-join keys.  The join ORDER is
  chosen greedily — most-constant pattern first, then always a pattern
  sharing a variable with the bound set (most shared keys, then most
  constants) — so a cartesian product can only appear where the
  pattern graph is genuinely disconnected (and then exactly once per
  component, last, where both sides are already maximally reduced);
* a pattern whose SUBJECT is constant is broadcast by default: its
  result is one node's out-adjacency — bounded by the max out-degree,
  the safe side of a broadcast join at any corpus size.  No other
  constant shape gets a static hint: a (pred, object) constant pair
  like ``(?x instance_of t1)`` selects the IN-adjacency of the object,
  which for type/category predicates is a constant fraction of the
  whole graph — force-broadcasting it is a scale-killer default (the
  r4 similarity lesson), so those patterns stay plain var-keyed hash
  joins and AQE's runtime row counts upgrade them to broadcast only
  when they measure small.  AQE's skew split applies unchanged, which
  matters because hub entities (the skew the KG pipeline salts for at
  build time, plans/pipeline.py) reappear here as hot join keys at
  read time.

Scale shape: k patterns = k scans of the same triple table + (k-1)
equi-joins; no driver collects, no per-row Python, no iteration.  The
variable-binding relation between joins is the only shuffled state,
and each join can only shrink-or-grow it by the pattern's real
selectivity — the same contract as any relational star query, which is
what Catalyst + AQE are best at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bgp_query", "parse_patterns", "pred_stats", "property_path"]

_COLS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?") and len(term) > 1


def parse_patterns(text: str) -> list[tuple[str, str, str]]:
    """Parse a whitespace BGP string: ``s p o`` clauses separated by a
    STANDALONE ``.`` token or a newline (SPARQL's ``s p o . s p o``
    spelling).  ``?name`` terms are variables, everything else is a
    constant — dots INSIDE a term (``v1.2``, ``pkg.mod``) are part of
    the term, which is why only a whitespace-delimited ``.`` separates
    clauses.  Convenience for the CLI surface."""
    out: list[tuple[str, str, str]] = []
    clause: list[str] = []

    def flush() -> None:
        if not clause:
            return
        if len(clause) != 3:
            raise ValueError(
                f"pattern clause needs exactly 3 terms: {' '.join(clause)!r}"
            )
        out.append((clause[0], clause[1], clause[2]))
        clause.clear()

    for line in text.splitlines():
        for tok in line.split():
            if tok == ".":
                flush()
            else:
                clause.append(tok)
        flush()  # newline also ends a clause
    flush()
    return out


def _compile_pattern(
    triples: DataFrame, pat: tuple[str, str, str]
) -> tuple[DataFrame, list[str], int]:
    """One pattern -> (scan with constant filters + var projection,
    var names in column order, constant count)."""
    conds = []
    var_cols: dict[str, str] = {}  # var name (no '?') -> first column bound
    n_const = 0
    subj_const = False
    for term, col in zip(pat, _COLS):
        if _is_var(term):
            name = term[1:]
            if name in var_cols:
                # same variable twice in one pattern: within-row equality
                conds.append(F.col(var_cols[name]) == F.col(col))
            else:
                var_cols[name] = col
        else:
            conds.append(F.col(col) == F.lit(term))
            n_const += 1
            if col == "subj":
                subj_const = True
    df = triples
    for c in conds:
        df = df.where(c)
    names = list(var_cols)
    df = df.select(*(F.col(var_cols[v]).alias(v) for v in names))
    return df, names, n_const, subj_const


def pred_stats(triples: DataFrame) -> dict[str, int]:
    """Predicate histogram for cost-based BGP ordering: ONE
    map-combined groupBy collected to the driver.  The result is
    dimension-sized by definition (distinct predicates are a schema-
    scale set, not a data-scale one), but the scan is an EAGER extra
    input pass — compute it once per graph and reuse, the
    `embedding_lsh_candidates` n_vectors-hint discipline."""
    return {
        r["pred"]: r["n"]
        for r in triples.groupBy("pred").agg(F.count(F.lit(1)).alias("n")).collect()
    }


# fixed per-constant-endpoint selectivity damping for the cardinality
# estimate (System-R style magic constant: ordering needs relative
# sizes, not absolute ones)
_ENDPOINT_SELECTIVITY = 1000.0


def bgp_query(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    select: list[str] | None = None,
    distinct: bool = True,
    auto_broadcast: bool = True,
    pred_counts: dict[str, int] | None = None,
    order_out: list[int] | None = None,
) -> DataFrame:
    """Match a basic graph pattern against a (subj, pred, obj) table.

    ``patterns`` — (s, p, o) term triples; ``?name`` terms are
    variables (shared names join), other strings are constants.
    Result columns are the variable names (no ``?``), in first-
    appearance order, optionally restricted by ``select``.
    ``distinct=True`` gives SPARQL ``SELECT DISTINCT`` semantics
    (set of bindings); ``False`` keeps the join multiplicity.

    ``pred_counts`` (from ``pred_stats``, or any external catalog)
    switches join ordering from the constant-count heuristic to
    cost-based: per-pattern cardinality is estimated as the constant
    predicate's triple count (total for a variable predicate), damped
    by a fixed selectivity per constant endpoint; the greedy order
    then seeds with the SMALLEST estimate and always extends with the
    smallest-estimate connected pattern — the selectivity-first BGP
    ordering every SPARQL engine ships.  Semantics are identical
    either way (inner joins commute); only the plan changes.
    ``order_out``, if given, receives the chosen pattern indices
    (introspection/testing).

    A pattern with no variables is an EXISTS gate: it contributes one
    row if any matching triple exists, none otherwise (the whole
    result empties).  Joined last via a 1-row cross join.
    """
    if not patterns:
        raise ValueError("bgp_query needs at least one pattern")
    total = float(sum(pred_counts.values())) if pred_counts else 0.0
    compiled = []
    for i, pat in enumerate(patterns):
        if len(pat) != 3:
            raise ValueError(f"pattern {i} needs exactly 3 terms: {pat!r}")
        df, names, n_const, subj_const = _compile_pattern(triples, pat)
        # static broadcast ONLY for out-adjacency slices (constant
        # subject): bounded by max out-degree at any scale.  Other
        # constant shapes can be arbitrarily large (module doc) — AQE
        # upgrades them at runtime when they measure small.
        if auto_broadcast and subj_const and names:
            df = F.broadcast(df)
        est = None
        if pred_counts is not None:
            s, p, o = pat
            base = total if _is_var(p) else float(pred_counts.get(p, 0))
            n_endpoints = (not _is_var(s)) + (not _is_var(o))
            est = base / (_ENDPOINT_SELECTIVITY ** n_endpoints)
        compiled.append((df, set(names), n_const, i, est))

    # variable order for the final projection: first appearance
    var_order: list[str] = []
    for _, names, _, i, _ in compiled:
        for term in patterns[i]:
            if _is_var(term) and term[1:] not in var_order:
                var_order.append(term[1:])

    with_vars = [c for c in compiled if c[1]]
    exists_gates = [c for c in compiled if not c[1]]

    if pred_counts is None:
        # heuristic: most constants first (bigger = better seed)
        seed_key = lambda c: (c[2], -c[3])  # noqa: E731
        grow_key = lambda c: (len(c[1] & bound), c[2], -c[3])  # noqa: E731
    else:
        # cost-based: smallest estimate first (max of negated est)
        seed_key = lambda c: (-c[4], -c[3])  # noqa: E731
        grow_key = lambda c: (-c[4], len(c[1] & bound), -c[3])  # noqa: E731

    result = None
    bound: set[str] = set()
    remaining = list(with_vars)
    chosen: list[int] = []
    while remaining:
        if result is None:
            pick = max(remaining, key=seed_key)
        else:
            sharing = [c for c in remaining if c[1] & bound]
            pool = sharing or remaining  # disconnected component -> cross join
            pick = max(pool, key=grow_key)
        remaining.remove(pick)
        df, names, _, i, _ = pick
        chosen.append(i)
        if result is None:
            result = df
        else:
            keys = sorted(names & bound)
            result = result.join(df, on=keys) if keys else result.crossJoin(df)
        bound |= names

    for df, _, _, i, _ in exists_gates:
        gate = df.select(F.lit(1).alias(f"__exists_{i}")).limit(1)
        result = gate.crossJoin(result) if result is not None else gate
        chosen.append(i)
    if exists_gates:
        result = result.drop(*(f"__exists_{i}" for _, _, _, i, _ in exists_gates))
    if order_out is not None:
        order_out.extend(chosen)

    if not var_order:
        # all-constant query: 1 row iff every gate matched
        return result.select(F.lit(True).alias("matched"))

    out_cols = select if select is not None else var_order
    missing = [v for v in out_cols if v not in bound]
    if missing:
        raise ValueError(f"select references unbound variables: {missing}")
    result = result.select(*out_cols)
    return result.distinct() if distinct else result


def property_path(
    triples: DataFrame,
    pred: str,
    sources,
    max_hops: int = 3,
    directed: bool = True,
) -> DataFrame:
    """SPARQL property-path ``pred+`` reachability: (node, hop) for
    every node reachable from ``sources`` through one-or-more ``pred``
    edges, with the MINIMUM hop count (multi-source semantics — the
    nearest source wins; per-source closure pairs are quadratic at
    scale by construction and deliberately not offered).

    ``sources`` is a list of node ids or a one-column ``node``
    DataFrame.  Bounded by ``max_hops`` (SPARQL engines bound `+`
    paths in practice for the same reason); an exhausted frontier
    ends earlier.  This is what ``bgp_query`` cannot express — a
    variable-length join — so it composes the frontier-activated BFS
    (operators/graph.py::bfs_hops: per-round traffic is the
    frontier's out-edges, every node enters the frontier at most
    once) over the single-predicate edge projection, whose constant
    ``pred`` filter prunes to one partition subtree of the
    (pred, bucket(subj)) graph layout.

    The source rows themselves appear with hop 0 (a node is its own
    ``pred*`` endpoint); drop hop 0 for strict ``pred+`` semantics
    when the distinction matters.
    """
    from .graph import bfs_hops

    edges = triples.where(F.col("pred") == pred).select("subj", "obj")
    edges = edges.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    spark = triples.sparkSession
    if not isinstance(sources, DataFrame):
        sources = spark.createDataFrame(
            [(s,) for s in sources], "node string"
        )
    return bfs_hops(edges, sources, max_hops=max_hops, directed=directed)
