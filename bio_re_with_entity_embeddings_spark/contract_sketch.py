"""Sketch-family contract queries (operators/sketches.py): mergeable
HyperLogLog distinct, count-min frequency, bottom-k quantiles — each
restated verbatim in DuckDB over the md5 hash mode, so the oracle
replays the exact registers / cells / sample the Spark side builds.

Float policy: the HLL oracle is pinned to p=8, where the sf0.01
cardinalities (~1.3k distinct custkeys per priority) provably select
the RAW harmonic estimator branch (raw > 2.5m = 640, zero empty
buckets) — the linear-counting branch needs ln(), whose last-ulp can
differ between libm and the JVM; that branch is pinned within-engine
by tests/test_sketches.py instead. Everything else is exact integer /
picked-value arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .contract import _load, register_extra
from .operators import sketches as SK
from .operators.sketches import _HEX, _alpha, _rho_from_tail_expr

# ---------------------------------------------------------------------------
# HLL distinct: distinct o_custkey per o_orderpriority
# ---------------------------------------------------------------------------

_HLL_P = 8


def _hex_val_sql(d: str) -> str:
    return f"(instr('{_HEX}', {d}) - 1)"


def _hll_sql(p: int) -> str:
    k = p // 4
    m = 1 << p
    rho_max = 53
    scale = 2**rho_max
    # bucket = first k hex digits as an int
    bucket = " + ".join(
        f"{_hex_val_sql(f'substring(h, {i + 1}, 1)')} * {16 ** (k - 1 - i)}"
        for i in range(k)
    )
    rho = _rho_from_tail_expr(f"substring(h, {k + 1}, 13)")
    # the exact double literal the Spark side multiplies by (repr
    # round-trips, so both engines share the bit-identical constant)
    num = repr(_alpha(m) * m * m * float(scale))
    return f"""
WITH h AS (
  SELECT o_orderpriority AS grp,
         md5('hll:' || CAST(o_custkey AS VARCHAR)) AS h
  FROM orders
), br AS (
  SELECT grp, CAST({bucket} AS INT) AS bucket, CAST({rho} AS INT) AS r
  FROM h
), regs AS (
  SELECT grp, bucket, max(r) AS r FROM br GROUP BY grp, bucket
), agg AS (
  SELECT grp,
         count(*) AS n_buckets,
         SUM(CAST(power(2.0, {rho_max} - r) AS DECIMAL(38,0))) AS sp
  FROM regs GROUP BY grp
)
SELECT grp,
       CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(CAST(sp + CAST(({m} - n_buckets) AS DECIMAL(38,0))
                      * CAST({scale} AS DECIMAL(38,0)) AS DECIMAL(38,0))
            AS VARCHAR) AS sum_scaled,
       round(CASE WHEN {num} / CAST(sp + CAST(({m} - n_buckets) AS DECIMAL(38,0))
                                    * CAST({scale} AS DECIMAL(38,0)) AS DOUBLE)
                       <= {2.5 * m}
                   AND n_buckets < {m}
                  THEN CAST({m} AS DOUBLE)
                       * ln(CAST({m} AS DOUBLE) / CAST({m} - n_buckets AS DOUBLE))
                  ELSE {num} / CAST(sp + CAST(({m} - n_buckets) AS DECIMAL(38,0))
                                    * CAST({scale} AS DECIMAL(38,0)) AS DOUBLE)
             END, 3) AS n_est
FROM agg
ORDER BY grp
"""


@register_extra("sketch_hll_distinct", _hll_sql(_HLL_P))
def sketch_hll_distinct(spark, sf_dir):
    """Mergeable HyperLogLog distinct-custkey estimate per order
    priority (operators/sketches.py::hll_distinct, md5 oracle mode,
    p=8): ONE map-combinable aggregate whose shuffle is <= 256
    registers per group — exact distinct would shuffle every key."""
    orders = _load(spark, sf_dir, "orders")
    out = SK.hll_distinct(
        orders.select(F.col("o_orderpriority").alias("grp"), "o_custkey"),
        "o_custkey",
        ["grp"],
        p=_HLL_P,
        hash_mode="md5",
    )
    return out.orderBy("grp")


# ---------------------------------------------------------------------------
# Count-min: supplier line frequencies, estimate vs exact
# ---------------------------------------------------------------------------

_CM_DEPTH = 4
_CM_WIDTH = 256


def _cm_val_sql(j: int, vexpr: str) -> str:
    """First 8 md5 hex digits of 'cm{j}:'||v as an int (32 bits)."""
    h = f"md5('cm{j}:' || {vexpr})"
    return " + ".join(
        f"{_hex_val_sql(f'substring({h}, {i + 1}, 1)')} * {16 ** (7 - i)}"
        for i in range(8)
    )


def _cm_sql() -> str:
    cell_rows = "\nUNION ALL\n".join(
        f"SELECT {j} AS row, ({_cm_val_sql(j, 'CAST(l_suppkey AS VARCHAR)')})"
        f" % {_CM_WIDTH} AS col, CAST(1 AS BIGINT) AS w FROM lineitem"
        for j in range(_CM_DEPTH)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT item, {j} AS row,"
        f" ({_cm_val_sql(j, 'CAST(item AS VARCHAR)')}) % {_CM_WIDTH} AS col"
        " FROM items"
        for j in range(_CM_DEPTH)
    )
    return f"""
WITH raw AS (
{cell_rows}
), cells AS (
  SELECT row, col, SUM(w) AS n FROM raw GROUP BY row, col
), items AS (
  SELECT DISTINCT l_suppkey AS item FROM lineitem
), probes AS (
{probe_rows}
), est AS (
  SELECT p.item, MIN(coalesce(c.n, 0)) AS cm_est
  FROM probes p LEFT JOIN cells c ON p.row = c.row AND p.col = c.col
  GROUP BY p.item
)
SELECT e.item, CAST(x.n AS BIGINT) AS n_exact, CAST(e.cm_est AS BIGINT) AS cm_est
FROM est e
JOIN (SELECT l_suppkey AS item, count(*) AS n FROM lineitem GROUP BY l_suppkey) x
  ON e.item = x.item
ORDER BY e.item
"""


@register_extra("sketch_countmin", _cm_sql())
def sketch_countmin(spark, sf_dir):
    """Count-min point-frequency estimates for every supplier's
    lineitem count, alongside the exact count (the one-sided cm_est >=
    n_exact guarantee is visible in the data). The sketch is ONE
    map-combinable aggregate with depth*width counter state
    (operators/sketches.py::countmin_cells)."""
    li = _load(spark, sf_dir, "lineitem")
    cells = SK.countmin_cells(
        li, "l_suppkey", depth=_CM_DEPTH, width=_CM_WIDTH, hash_mode="md5"
    )
    items = li.select(F.col("l_suppkey")).distinct()
    est = SK.countmin_estimate(
        cells, items, "l_suppkey",
        depth=_CM_DEPTH, width=_CM_WIDTH, hash_mode="md5",
    )
    exact = li.groupBy(F.col("l_suppkey").alias("item")).agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return (
        est.join(exact, "item")
        .select("item", "n_exact", "cm_est")
        .orderBy("item")
    )


# ---------------------------------------------------------------------------
# Bottom-k quantiles: o_totalprice by priority
# ---------------------------------------------------------------------------

_QK = 64
_QS = [0.25, 0.5, 0.75, 0.95]


def _quantiles_sql() -> str:
    qvals = ", ".join(f"({q})" for q in _QS)
    return f"""
WITH sample AS (
  SELECT o_orderpriority AS grp, o_totalprice, o_orderkey
  FROM (
    SELECT o_orderpriority, o_totalprice, o_orderkey,
           row_number() OVER (
             PARTITION BY o_orderpriority
             ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
           ) AS rn
    FROM orders
  ) WHERE rn <= {_QK}
), ranked AS (
  SELECT grp, o_totalprice,
         row_number() OVER (
           PARTITION BY grp ORDER BY o_totalprice, o_orderkey
         ) AS rk,
         count(*) OVER (PARTITION BY grp) AS ns
  FROM sample
), picks AS (
  SELECT r.grp, CAST(q.q AS DOUBLE) AS q,
         CAST(floor(CAST(q.q AS DOUBLE) * (r.ns - 1)) AS INT) + 1 AS rk
  FROM (SELECT DISTINCT grp, ns FROM ranked) r
  CROSS JOIN (VALUES {qvals}) q(q)
)
SELECT p.grp, p.q, r.o_totalprice AS quantile
FROM picks p JOIN ranked r ON p.grp = r.grp AND p.rk = r.rk
ORDER BY p.grp, p.q
"""


@register_extra("sketch_quantiles", _quantiles_sql())
def sketch_quantiles(spark, sf_dir):
    """Approximate o_totalprice quantiles per priority from a
    deterministic bottom-64 hash sample
    (operators/sketches.py::approx_quantiles; skew_salts=1 pins the
    one-stage sample the SQL restates). Quantiles are exact input
    values picked by rank — no interpolation floats."""
    orders = _load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"), "o_totalprice", "o_orderkey"
    )
    out = SK.approx_quantiles(
        orders, "o_totalprice", "o_orderkey", _QS,
        k=_QK, group_col="grp", skew_salts=1,
    )
    return out.orderBy("grp", "q")
