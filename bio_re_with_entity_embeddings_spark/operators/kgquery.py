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
* patterns with >= 2 constant terms are broadcast by default: two
  constants pin a (pred, endpoint) slice whose size is one adjacency
  list, exactly the safe side of a broadcast join.  Everything else is
  a plain var-keyed hash join — AQE's skew split applies unchanged,
  which matters because hub entities (the skew the KG pipeline salts
  for at build time, plans/pipeline.py) reappear here as hot join keys
  at read time.

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

__all__ = ["bgp_query", "parse_patterns"]

_COLS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?") and len(term) > 1


def parse_patterns(text: str) -> list[tuple[str, str, str]]:
    """Parse a whitespace BGP string: one ``s p o`` pattern per ``.``- or
    newline-separated clause.  ``?name`` terms are variables, everything
    else is a constant.  Convenience for the CLI surface."""
    out: list[tuple[str, str, str]] = []
    for clause in text.replace(".", "\n").splitlines():
        parts = clause.split()
        if not parts:
            continue
        if len(parts) != 3:
            raise ValueError(f"pattern clause needs exactly 3 terms: {clause!r}")
        out.append((parts[0], parts[1], parts[2]))
    return out


def _compile_pattern(
    triples: DataFrame, pat: tuple[str, str, str]
) -> tuple[DataFrame, list[str], int]:
    """One pattern -> (scan with constant filters + var projection,
    var names in column order, constant count)."""
    conds = []
    var_cols: dict[str, str] = {}  # var name (no '?') -> first column bound
    n_const = 0
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
    df = triples
    for c in conds:
        df = df.where(c)
    names = list(var_cols)
    df = df.select(*(F.col(var_cols[v]).alias(v) for v in names))
    return df, names, n_const


def bgp_query(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    select: list[str] | None = None,
    distinct: bool = True,
    auto_broadcast: bool = True,
) -> DataFrame:
    """Match a basic graph pattern against a (subj, pred, obj) table.

    ``patterns`` — (s, p, o) term triples; ``?name`` terms are
    variables (shared names join), other strings are constants.
    Result columns are the variable names (no ``?``), in first-
    appearance order, optionally restricted by ``select``.
    ``distinct=True`` gives SPARQL ``SELECT DISTINCT`` semantics
    (set of bindings); ``False`` keeps the join multiplicity.

    A pattern with no variables is an EXISTS gate: it contributes one
    row if any matching triple exists, none otherwise (the whole
    result empties).  Joined last via a 1-row cross join.
    """
    if not patterns:
        raise ValueError("bgp_query needs at least one pattern")
    compiled = []
    for i, pat in enumerate(patterns):
        if len(pat) != 3:
            raise ValueError(f"pattern {i} needs exactly 3 terms: {pat!r}")
        df, names, n_const = _compile_pattern(triples, pat)
        if auto_broadcast and n_const >= 2 and names:
            df = F.broadcast(df)
        compiled.append((df, set(names), n_const, i))

    # variable order for the final projection: first appearance
    var_order: list[str] = []
    for _, names, _, i in compiled:
        for term in patterns[i]:
            if _is_var(term) and term[1:] not in var_order:
                var_order.append(term[1:])

    with_vars = [c for c in compiled if c[1]]
    exists_gates = [c for c in compiled if not c[1]]

    result = None
    bound: set[str] = set()
    remaining = list(with_vars)
    while remaining:
        if result is None:
            # seed: most constants, then earliest
            pick = max(remaining, key=lambda c: (c[2], -c[3]))
        else:
            sharing = [c for c in remaining if c[1] & bound]
            pool = sharing or remaining  # disconnected component -> cross join
            pick = max(pool, key=lambda c: (len(c[1] & bound), c[2], -c[3]))
        remaining.remove(pick)
        df, names, _, _ = pick
        if result is None:
            result = df
        else:
            keys = sorted(names & bound)
            result = result.join(df, on=keys) if keys else result.crossJoin(df)
        bound |= names

    for df, _, _, i in exists_gates:
        gate = df.select(F.lit(1).alias(f"__exists_{i}")).limit(1)
        result = gate.crossJoin(result) if result is not None else gate
    if exists_gates:
        result = result.drop(*(f"__exists_{i}" for _, _, _, i in exists_gates))

    if not var_order:
        # all-constant query: 1 row iff every gate matched
        return result.select(F.lit(True).alias("matched"))

    out_cols = select if select is not None else var_order
    missing = [v for v in out_cols if v not in bound]
    if missing:
        raise ValueError(f"select references unbound variables: {missing}")
    result = result.select(*out_cols)
    return result.distinct() if distinct else result
