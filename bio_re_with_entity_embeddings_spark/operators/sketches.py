"""Mergeable sketch operators: HyperLogLog distinct, count-min
frequency, and bottom-k sampling / approximate quantiles.

Why sketches at 100 TB: exact ``COUNT(DISTINCT)`` and exact global
quantiles force a full shuffle of every distinct value (or a global
sort); a sketch is a tiny, MERGEABLE summary that map-side-combines —
the shuffle ships 2^p registers / depth*width counters / k sample rows
per group instead of the data. All three sketches here are
deterministic (hash-seeded, no ``rand()``): the same input always
yields the same summary, so results are reproducible across reruns and
restatable in ANSI SQL for the DuckDB oracles.

Hash modes (the dedup-family convention, operators/dedup.py:77-103):

* ``xxhash64`` (production): JVM-codegen 64-bit hashes, zero string
  materialization.
* ``md5`` (oracle): every engine computes the identical md5 hex, so
  DuckDB replays the exact register/cell/sample values. Bit-level
  work (HLL's leading-zero rank) is spelled with portable
  string/arithmetic exprs over the hex digits.

No estimate here depends on float summation order: HLL's harmonic sum
is an exact DECIMAL sum of integer terms 2^(rho_max - rho) (each fits
a long), count-min cells are exact integer sums, and quantiles return
exact input values picked by rank. The only floats are final per-group
scalar expressions (identical IEEE ops both engines), rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch
# ---------------------------------------------------------------------------


def _hex_digit_val(col):
    """0..15 value of a single hex-digit column — instr arithmetic that
    DuckDB restates verbatim as strpos('0123..f', d) - 1."""
    return F.instr(F.lit(_HEX), col) - F.lit(1)


def _rho_from_tail_expr(tail_col: str) -> str:
    """SQL expr (valid verbatim in BOTH Spark and DuckDB) computing the
    HLL rank rho from a 13-hex-digit string column: scan for the first
    non-zero digit; rho = 4*(zero digits before it) + that digit's
    leading zero bits + 1; all 52 bits zero -> sentinel 53. Chained
    CASE over substring/instr only — no engine-specific trim forms."""
    whens = []
    for i in range(13):
        d = f"substring({tail_col}, {i + 1}, 1)"
        v = f"(instr('{_HEX}', {d}) - 1)"
        lz = (
            f"(CASE WHEN {v} >= 8 THEN 0 WHEN {v} >= 4 THEN 1 "
            f"WHEN {v} >= 2 THEN 2 ELSE 3 END)"
        )
        whens.append(f"WHEN {d} <> '0' THEN {4 * i} + {lz} + 1")
    return "CASE " + " ".join(whens) + " ELSE 53 END"


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(group..., bucket, r): the 2^p HLL max-rank registers per group.

    This IS the mergeable summary: registers of a union of inputs equal
    the bucket-wise max of the inputs' registers (unit-pinned), so
    partial registers combine map-side and across days/partitions
    without re-reading data. Shuffle per group is <= 2^p rows whatever
    the input size.
    """
    gc = list(group_cols or [])
    v = F.col(value_col).cast("string")
    if hash_mode == "md5":
        if p % 4 != 0:
            raise ValueError("md5 hash_mode needs p divisible by 4")
        k = p // 4
        h = F.md5(F.concat(F.lit("hll:"), v))
        bucket = F.lit(0)
        for i in range(k):
            bucket = bucket * F.lit(16) + _hex_digit_val(F.substring(h, i + 1, 1))
        stage = df.select(
            *gc,
            bucket.cast("int").alias("bucket"),
            F.substring(h, k + 1, 13).alias("_tail"),
        ).withColumn("r", F.expr(_rho_from_tail_expr("_tail")).cast("int"))
    elif hash_mode == "xxhash64":
        nbits = 64 - p
        h = F.xxhash64(F.lit("hll:"), v)
        low = h.bitwiseAND(F.lit((1 << nbits) - 1))
        # leading zeros of the nbits-wide suffix via the binary-string
        # length of the value (conv drops leading zeros); low == 0 is
        # the all-zero sentinel nbits + 1.
        blen = F.length(F.conv(low.cast("string"), 10, 2))
        rho = F.when(low == 0, F.lit(nbits + 1)).otherwise(
            F.lit(nbits) - blen + F.lit(1)
        )
        stage = df.select(
            *gc,
            F.shiftrightunsigned(h, nbits).cast("int").alias("bucket"),
            rho.cast("int").alias("r"),
        )
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    return stage.groupBy(*gc, "bucket").agg(F.max("r").alias("r"))


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge two register tables: bucket-wise max. The union-combine
    that makes HLL a one-pass distributed sketch."""
    gc = list(group_cols or [])
    return (
        a.unionByName(b)
        .groupBy(*gc, "bucket")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate(
    registers: DataFrame,
    p: int = 12,
    group_cols: list[str] | None = None,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(group..., n_buckets, sum_scaled, n_est): the HLL estimator over
    a register table (Flajolet et al. 2007 raw estimator + the standard
    small-range linear-counting correction).

    Exactness across engines: the harmonic sum is computed as an exact
    DECIMAL(38,0) sum of integer terms 2^(rho_max - rho) (rho <= rho_max
    = 64 - p + 1 for xxhash64, 53 for md5; each term fits a long), so
    no float-order sensitivity; the final estimate is one scalar double
    expression, rounded to 3 decimals (the oracle convention for
    derived doubles).
    """
    gc = list(group_cols or [])
    m = 1 << p
    rho_max = 53 if hash_mode == "md5" else (64 - p + 1)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    term = F.pow(F.lit(2.0), F.lit(rho_max) - F.col("r")).cast("decimal(38,0)")
    agg = registers.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(term).cast("decimal(38,0)").alias("_sum_present"),
    )
    scale = float(2**rho_max)
    v_zero = F.lit(m) - F.col("n_buckets")
    total = (
        F.col("_sum_present")
        + v_zero.cast("decimal(38,0)") * F.lit(2**rho_max).cast("decimal(38,0)")
    ).cast("decimal(38,0)")
    raw = F.lit(alpha * m * m * scale) / total.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *gc,
        F.col("n_buckets").cast("long").alias("n_buckets"),
        total.cast("string").alias("sum_scaled"),
        F.round(est, 3).alias("n_est"),
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """One-pass approximate COUNT(DISTINCT value) per group; standard
    error ~1.04/sqrt(2^p) (~1.6% at the default p=12). The whole
    reduction is ONE map-combinable aggregate whose combiner state is
    2^p small ints per group — contrast exact distinct, which shuffles
    every distinct value."""
    regs = hll_registers(df, value_col, group_cols, p=p, hash_mode=hash_mode)
    return hll_estimate(regs, p=p, group_cols=group_cols, hash_mode=hash_mode)


# ---------------------------------------------------------------------------
# Count-min frequency sketch
# ---------------------------------------------------------------------------


def _cm_cell(value_col, j: int, width: int, hash_mode: str):
    """Column expr: row-j cell index of a value (0..width-1)."""
    v = F.col(value_col).cast("string")
    if hash_mode == "md5":
        h = F.md5(F.concat(F.lit(f"cm{j}:"), v))
        # accumulate in a LONG: 16^8 overflows int32 under ANSI mode
        val = F.lit(0).cast("long")
        for i in range(8):  # first 8 hex digits = 32 bits, exact in a long
            val = val * F.lit(16) + _hex_digit_val(F.substring(h, i + 1, 1)).cast("long")
        return F.pmod(val, F.lit(width)).cast("int")
    if hash_mode == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(f"cm{j}:"), v), F.lit(width)).cast("int")
    raise ValueError(f"unknown hash_mode {hash_mode!r}")


def countmin_cells(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(row, col, n): the depth x width count-min counter table
    (Cormode & Muthukrishnan 2005). One map-combinable aggregate; the
    combiner state is depth*width longs regardless of input size, so
    the sketch of a 100-TB column ships a few KB per partition.
    Mergeable: cells of a union = cell-wise sum (unit-pinned)."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = _cm_probe_rows(
        df, value_col, depth, width, hash_mode, {"_w": w}
    )
    return rows.groupBy("row", "col").agg(F.sum("_w").alias("n"))


def _cm_probe_rows(df, value_col, depth, width, hash_mode, carry):
    """(carry..., row, col) — one output row per (input row, depth).
    ``carry``: {output name: Column} projected through.

    md5 mode pre-projects the depth md5 columns and derives the cell
    with ONE built-in ``conv(hex, 16, 10)`` (round 6): the previous
    8-step hex-digit Horner chain lived inside the posexplode array,
    and Generate performs no common-subexpression elimination — every
    digit reference re-evaluated its md5, 8 md5 + 8 instr/substring
    per cell per row (measured: the 600k-row sf0.1 cells aggregate was
    a 22.5 s stage; same cells with ~20x less expression work this
    way). Identical cell values: conv(substr(h,1,8),16,10) IS the
    Horner sum of the first 8 hex digits."""
    if hash_mode == "md5":
        v = F.col(value_col).cast("string")
        pre = df.select(
            *[c.alias(name) for name, c in carry.items()],
            *[
                F.md5(F.concat(F.lit(f"cm{j}:"), v)).alias(f"_h{j}")
                for j in range(depth)
            ],
        )
        cells = [
            F.pmod(
                F.conv(F.substring(F.col(f"_h{j}"), 1, 8), 16, 10).cast("long"),
                F.lit(width),
            ).cast("int")
            for j in range(depth)
        ]
        return pre.select(
            *carry.keys(),
            F.posexplode(F.array(*cells)).alias("row", "col"),
        )
    return df.select(
        *[c.alias(name) for name, c in carry.items()],
        F.posexplode(
            F.array(*[_cm_cell(value_col, j, width, hash_mode) for j in range(depth)])
        ).alias("row", "col"),
    )


def countmin_estimate(
    cells: DataFrame,
    items: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(item, cm_est): point-frequency estimates for candidate items —
    min over the item's depth cells; missing cells read 0. Count-min
    guarantees cm_est >= true count (never under), with overshoot
    bounded by (e/width) * total weight at probability 1 - e^-depth.

    Scale note: ``items`` is a CANDIDATE set (heavy-hitter candidates
    come from per-partition local top-k or a stream, not from an exact
    global distinct — which would defeat the sketch); the join ships
    depth rows per candidate against the tiny broadcastable cell table.
    """
    probes = _cm_probe_rows(
        items, value_col, depth, width, hash_mode,
        {"item": F.col(value_col)},
    )
    joined = probes.join(F.broadcast(cells), ["row", "col"], "left").na.fill(
        {"n": 0}
    )
    return joined.groupBy("item").agg(F.min("n").alias("cm_est"))


# ---------------------------------------------------------------------------
# Bottom-k hash sampling / approximate quantiles
# ---------------------------------------------------------------------------


_PREFILTER_FACTOR = 8  # expected survivors per group = factor * k


def bottomk_sample(
    df: DataFrame,
    id_col: str,
    k: int,
    group_col: str | None = None,
    skew_salts: int | None = None,
    max_group_rows: int | None = None,
    min_group_rows: int | None = None,
) -> DataFrame:
    """Deterministic uniform sample: the k rows per group whose
    ``md5(id)`` ranks smallest — a K-minimum-values / bottom-k sketch.
    Uniform because md5 order is independent of any data order;
    deterministic and MERGEABLE because bottom-k of a union is the
    bottom-k of the parts' bottom-k's (unit-pinned), so partial samples
    combine without re-reading data (rand()-based sampling has neither
    property). Reuses quota_sample's salted two-stage top-k, so one
    10^8-row group cannot pin a single task.

    ``min_group_rows`` (scale hint, EXACT): a lower bound on the
    SMALLEST group's row count. When set (and the implied keep
    probability is < 1) a hash-threshold pre-filter runs before any
    window: keep rows whose ``md5(id)`` 8-hex-digit prefix is <= t,
    with t sized for ~8*k expected survivors in the smallest group.
    This is NOT the inexact ``pmod`` pre-filter quota_sample's
    docstring rejects — here the filter is a prefix of the ORDERING
    KEY itself, so whenever >= k rows of a group survive, the group's
    true bottom-k all survive (their hashes are <= the k-th smallest,
    which is <= t). Groups where < k rows survive (hint violated, or
    an astronomically unlikely hash fluke: P < exp(-k*49/32) by
    Chernoff at factor 8) are repaired LAZILY: their keys anti-filter
    the survivor stream and semi-join the raw input back in
    unfiltered, so the output is bit-identical to the unfiltered path
    in ALL cases (unit-pinned, including a deliberately violated
    hint). Cost shape at 10^8+ rows: the stage-1 window's
    full-input (key, salt) sort — the dominant cost, measured 130.9 s
    at 200M rows in bench_sketch_scale.py — collapses to one
    codegen'd filter scan + a window over ~8*k*(n_max/n_min) rows;
    the repair machinery costs one key-only map-combined distinct
    pass (to enumerate groups — a zero-survivor group leaves no
    trace in the survivor stream) and one hash-probe re-scan against
    the (normally empty) failing-key set."""
    from .curation import quota_sample

    work = df
    gcol = group_col
    if gcol is None:
        gcol = "_g"
        work = work.withColumn("_g", F.lit(0))
    eff_max = max_group_rows
    if min_group_rows and min_group_rows > _PREFILTER_FACTOR * k:
        p = _PREFILTER_FACTOR * k / min_group_rows
        t_hex = format(min(int(p * 16**8), 16**8 - 1), "08x")
        h8 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
        survivors = work.where(h8 <= F.lit(t_hex))
        # failing = input groups NOT adequately surviving — derived
        # from the INPUT's key set, not the survivors' (a group whose
        # every row is filtered has no survivor rows to count and
        # would otherwise vanish instead of being repaired)
        adequate = (
            survivors.groupBy(gcol)
            .agg(F.count(F.lit(1)).alias("_nsv"))
            .where(F.col("_nsv") >= k)
            .select(gcol)
        )
        # NO broadcast hint on `adequate`: per-group sampling can have
        # 10^7+ groups, and adequate ~= ALL of them — a forced
        # broadcast would blow the driver. Both sides of this anti-join
        # are key-only (#groups rows); AQE picks broadcast at runtime
        # exactly when it fits. `failing` is normally EMPTY, so AQE
        # broadcasts it in the two repair joins without being told.
        failing = (
            work.select(gcol)
            .distinct()
            .join(adequate, gcol, "left_anti")
        )
        ok = survivors.join(F.broadcast(failing), gcol, "left_anti")
        repair = work.join(F.broadcast(failing), gcol, "left_semi")
        # the joins float the key column first; restore caller order
        work = ok.unionByName(repair).select(*work.columns)
        if eff_max is not None:
            # survivors of an ok group are ~p * its size; repair
            # groups arrive unfiltered, so the bound must still cover
            # a full group of up to k rows' worth of survivors — keep
            # the conservative max of both.
            eff_max = max(int(eff_max * p) + 1, _PREFILTER_FACTOR * k)
    out = quota_sample(
        work, gcol, k, id_col,
        skew_salts=skew_salts, max_group_rows=eff_max,
    )
    return out.drop("_g") if group_col is None else out


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    id_col: str,
    qs: list[float],
    k: int = 1024,
    group_col: str | None = None,
    skew_salts: int | None = None,
    max_group_rows: int | None = None,
    min_group_rows: int | None = None,
) -> DataFrame:
    """(group?, q, quantile): per-group approximate quantiles from a
    deterministic bottom-k uniform sample — quantile q is the sample's
    rank floor(q*(n_s - 1)) + 1 element ordered by (value, id).

    Returned quantiles are EXACT input values picked by rank (no
    interpolation, no floats), so the oracle comparison is exact; the
    approximation error is rank error only, O(1/sqrt(k)) quantile
    deviation from the sample. Two shuffles total: the salted sample
    top-k and one <= k-rows-per-group window. ``min_group_rows``
    enables bottomk_sample's exact hash-threshold pre-filter — the
    scale path for 10^8+-row groups."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0,1]")
    sample = bottomk_sample(
        df, id_col, k, group_col,
        skew_salts=skew_salts, max_group_rows=max_group_rows,
        min_group_rows=min_group_rows,
    )
    gc = [group_col] if group_col else []
    w = (
        Window.partitionBy(*[F.col(c) for c in gc])
        if gc
        else Window.partitionBy(F.lit(0))
    )
    ranked = sample.select(
        *gc,
        F.col(value_col),
        F.row_number()
        .over(w.orderBy(F.col(value_col), F.col(id_col)))
        .alias("_rk"),
        F.count(F.lit(1)).over(w).alias("_ns"),
    )
    picks = F.array(*[F.lit(float(q)) for q in qs])
    out = (
        ranked.select(*gc, "_rk", "_ns", F.explode(picks).alias("q"))
        .where(
            F.col("_rk")
            == F.floor(F.col("q") * (F.col("_ns") - 1)).cast("int") + 1
        )
        .join(
            ranked.select(*gc, "_rk", F.col(value_col).alias("quantile")),
            gc + ["_rk"],
        )
    )
    # self-join keeps the pick/value split explicit for the SQL
    # restatement; Catalyst collapses it over the shared sample.
    return out.select(*gc, "q", "quantile")


def _alpha(m: int) -> float:
    """Public HLL bias constant (exported for tests)."""
    return 0.7213 / (1.0 + 1.079 / m)


__all__ = [
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "hll_distinct",
    "countmin_cells",
    "countmin_estimate",
    "bottomk_sample",
    "approx_quantiles",
]
