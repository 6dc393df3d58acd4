"""Sketch-family units (operators/sketches.py): estimator accuracy,
mergeability (the property that makes a sketch distributable), the
count-min one-sided guarantee, and the linear-counting branch the
cross-engine oracle deliberately avoids (contract_sketch.py pins the
raw-estimator branch; the ln() branch is pinned within-engine here)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from bio_re_with_entity_embeddings_spark.operators import sketches as SK


@pytest.fixture(scope="module")
def nums(spark):
    # 100k rows, 20k distinct values, 3 groups, unique row id
    return (
        spark.range(100_000)
        .select(
            (F.col("id") % 20_000).alias("v"),
            (F.col("id") % 3).alias("g"),
            F.col("id").alias("rid"),
        )
        .localCheckpoint()
    )


def _same_rows(a, b) -> bool:
    return a.exceptAll(b).limit(1).count() == 0 and b.exceptAll(a).limit(1).count() == 0


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("hash_mode", ["xxhash64", "md5"])
def test_hll_accuracy_within_bound(nums, hash_mode):
    """20k true distinct per group; p=12 standard error is
    1.04/sqrt(4096) ~ 1.6% — assert a generous 3-sigma 5% band."""
    out = SK.hll_distinct(nums, "v", ["g"], p=12, hash_mode=hash_mode).collect()
    assert len(out) == 3
    for r in out:
        assert abs(float(r["n_est"]) - 20_000) / 20_000 < 0.05, r


def test_hll_registers_merge_equals_union(nums):
    """Mergeability: registers(a U b) == bucket-wise max of partial
    registers — partial sketches combine without re-reading data."""
    a = nums.where("rid < 50000")
    b = nums.where("rid >= 50000")
    merged = SK.hll_merge(
        SK.hll_registers(a, "v", ["g"]),
        SK.hll_registers(b, "v", ["g"]),
        ["g"],
    )
    full = SK.hll_registers(nums, "v", ["g"])
    assert _same_rows(merged, full)


def test_hll_linear_counting_branch_pinned(spark):
    """Small cardinality (100 distinct at p=12) lands in the
    linear-counting regime: estimate must equal m*ln(m/V) with V the
    empty-bucket count — computed independently here from the
    register table itself."""
    df = spark.range(1000).select((F.col("id") % 100).alias("v"))
    regs = SK.hll_registers(df, "v", p=12)
    n_buckets = regs.count()
    m = 4096
    v_zero = m - n_buckets
    expected = round(m * math.log(m / v_zero), 3)
    got = float(SK.hll_estimate(regs, p=12).collect()[0]["n_est"])
    assert got == pytest.approx(expected, abs=1e-9)
    # and the branch really is linear counting (raw threshold holds)
    assert got <= 2.5 * m
    # sanity: estimate near the true 100
    assert abs(got - 100) < 10


def test_hll_md5_mode_p_must_be_nibble_aligned(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        SK.hll_registers(df, "v", p=10, hash_mode="md5")


# ---------------------------------------------------------------------------
# Count-min
# ---------------------------------------------------------------------------


def test_countmin_never_underestimates(nums):
    """The one-sided guarantee: cm_est >= true count for EVERY item,
    even at a deliberately tiny width (massive collisions)."""
    cells = SK.countmin_cells(nums, "v", depth=4, width=64)
    items = nums.select("v").distinct()
    est = SK.countmin_estimate(cells, items, "v", depth=4, width=64)
    exact = nums.groupBy(F.col("v").alias("item")).agg(
        F.count(F.lit(1)).alias("n")
    )
    bad = est.join(exact, "item").where(F.col("cm_est") < F.col("n")).count()
    assert bad == 0


def test_countmin_cells_merge_is_cellwise_sum(nums):
    a = nums.where("rid % 2 = 0")
    b = nums.where("rid % 2 = 1")
    ca = SK.countmin_cells(a, "v", depth=3, width=128)
    cb = SK.countmin_cells(b, "v", depth=3, width=128)
    merged = (
        ca.unionByName(cb).groupBy("row", "col").agg(F.sum("n").alias("n"))
    )
    full = SK.countmin_cells(nums, "v", depth=3, width=128)
    assert _same_rows(merged, full)


def test_countmin_weighted(spark):
    """weight_col: the sketch counts weight mass, not rows."""
    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 2)], ["v", "w"]
    )
    cells = SK.countmin_cells(df, "v", depth=2, width=512, weight_col="w")
    items = spark.createDataFrame([("a",), ("b",)], ["v"])
    got = {
        r["item"]: r["cm_est"]
        for r in SK.countmin_estimate(cells, items, "v", depth=2, width=512).collect()
    }
    assert got["a"] >= 15 and got["b"] >= 2
    # width 512 with 2 items: collisions essentially impossible
    assert got["a"] == 15 and got["b"] == 2


# ---------------------------------------------------------------------------
# Bottom-k sampling / quantiles
# ---------------------------------------------------------------------------


def test_bottomk_merge_property(nums):
    """bottom-k(a U b) == bottom-k(bottom-k(a) U bottom-k(b)) — the
    KMV sketch property that lets partial samples combine."""
    a = nums.where("rid < 50000")
    b = nums.where("rid >= 50000")
    k = 37
    merged = SK.bottomk_sample(
        SK.bottomk_sample(a, "rid", k, "g", skew_salts=1).unionByName(
            SK.bottomk_sample(b, "rid", k, "g", skew_salts=1)
        ),
        "rid",
        k,
        "g",
        skew_salts=1,
    )
    full = SK.bottomk_sample(nums, "rid", k, "g", skew_salts=1)
    assert _same_rows(merged, full)


def test_quantiles_exact_when_k_covers_group(spark):
    """k >= group size -> the sample IS the group, so every quantile is
    the exact rank statistic."""
    rows = [(i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7, 2, 8, 4, 6, 0])]
    df = spark.createDataFrame(rows, ["rid", "x"])
    out = {
        r["q"]: r["quantile"]
        for r in SK.approx_quantiles(
            df, "x", "rid", [0.0, 0.5, 1.0], k=100, skew_salts=1
        ).collect()
    }
    # n=10: rank floor(q*9)+1 over sorted 0..9
    assert out[0.0] == 0.0
    assert out[0.5] == 4.0
    assert out[1.0] == 9.0


def test_quantiles_rank_error_bounded(nums):
    """k=512 sample of ~33k uniform values: quantile deviation should
    stay within ~4/sqrt(k) (~18% of a 3-sigma-ish band is generous but
    deterministic — the seed is the data)."""
    out = SK.approx_quantiles(
        nums, "v", "rid", [0.25, 0.5, 0.75], k=512, group_col="g"
    ).collect()
    tol = 4.0 / math.sqrt(512) * 20_000
    for r in out:
        target = {0.25: 5000, 0.5: 10_000, 0.75: 15_000}[r["q"]]
        assert abs(r["quantile"] - target) < tol, r


def test_quantiles_rejects_bad_q(nums):
    with pytest.raises(ValueError):
        SK.approx_quantiles(nums, "v", "rid", [1.5], k=16, group_col="g")


def test_bottomk_prefilter_bit_identical(nums):
    """min_group_rows hash-threshold pre-filter == unfiltered path,
    exactly: the filter is a prefix of the ordering key, so every
    group with >= k survivors keeps its true bottom-k intact."""
    k = 64
    plain = SK.bottomk_sample(nums, "rid", k, "g", skew_salts=1)
    # each group has ~33,333 rows; honest hint (33k) -> filter keeps
    # ~8*64/33_333 of rows, all groups survive, no repair
    fast = SK.bottomk_sample(
        nums, "rid", k, "g", skew_salts=1, min_group_rows=33_000
    )
    assert _same_rows(plain, fast)


def test_bottomk_prefilter_repair_branch(spark):
    """A group SMALLER than the hint (hint deliberately violated)
    under-survives the filter and must come back through the lazy
    repair semi-join — output still bit-identical to unfiltered."""
    big = spark.range(50_000).select(
        F.lit("big").alias("g"), F.col("id").alias("rid")
    )
    tiny = spark.range(50_000, 50_040).select(
        F.lit("tiny").alias("g"), F.col("id").alias("rid")
    )
    df = big.unionByName(tiny).localCheckpoint()
    k = 32
    plain = SK.bottomk_sample(df, "rid", k, "g", skew_salts=1)
    # hint claims every group has >= 50k rows; 'tiny' has 40 — with
    # keep-p = 8*32/50_000 its expected survivors ~= 0.2 << k, so the
    # repair branch must fire for it (and ONLY exactness matters:
    # the union is windowed again either way)
    fast = SK.bottomk_sample(
        df, "rid", k, "g", skew_salts=1, min_group_rows=50_000
    )
    assert _same_rows(plain, fast)
    # the tiny group keeps all 40 rows in both paths
    assert fast.where(F.col("g") == "tiny").count() == plain.where(
        F.col("g") == "tiny"
    ).count()


def test_quantiles_prefilter_identical(nums):
    """approx_quantiles(min_group_rows=...) returns the identical
    quantile rows as the plain path (same sample -> same ranks)."""
    qs = [0.25, 0.5, 0.75]
    plain = SK.approx_quantiles(
        nums, "v", "rid", qs, k=256, group_col="g", skew_salts=1
    )
    fast = SK.approx_quantiles(
        nums, "v", "rid", qs, k=256, group_col="g", skew_salts=1,
        min_group_rows=33_000,
    )
    assert _same_rows(plain, fast)


def test_bottomk_prefilter_zero_survivor_group(spark):
    """A group so small that ZERO rows survive the filter has no
    survivor rows to count — failing keys must come from the INPUT's
    key set, or the group would silently vanish instead of being
    repaired (regression pin for the survivor-side groupBy bug)."""
    big = spark.range(100_000).select(
        F.lit("big").alias("g"), F.col("id").alias("rid")
    )
    one = spark.createDataFrame([("one", 123456789)], ["g", "rid"])
    df = big.unionByName(one).localCheckpoint()
    fast = SK.bottomk_sample(
        df, "rid", 16, "g", skew_salts=1, min_group_rows=100_000
    )
    assert fast.where(F.col("g") == "one").count() == 1


@pytest.mark.parametrize(
    "shape,hint,k",
    [
        # every group EXACTLY k rows: with an inflated hint every
        # group under-survives -> all-repair -> must equal plain
        ("uniform_k", 10_000_000, 16),
        # one huge group + many tiny ones, hint honest for the min
        ("skewed", 40, 8),
        # k larger than every group: bottom-k = whole groups
        ("uniform_k", 1_000_000, 500),
        # global (no groups), hint at the enable boundary (just > 8k)
        ("global", 8 * 24 + 1, 24),
    ],
)
def test_bottomk_prefilter_adversarial_shapes(spark, shape, hint, k):
    """Shapes chosen to stress the repair machinery: full-repair,
    honest-skew, k > group size, and the boundary hint — the
    prefiltered path must stay bit-equal to the plain path in every
    one (exactness must come from construction + repair, never from
    the hint being right)."""
    if shape == "uniform_k":
        df = spark.range(25 * 16).select(
            (F.col("id") % 25).alias("g"), F.col("id").alias("rid")
        )
        gcol = "g"
    elif shape == "skewed":
        big = spark.range(20_000).select(
            F.lit(0).alias("g"), F.col("id").alias("rid")
        )
        tiny = spark.range(20_000, 20_400).select(
            (F.col("id") % 10 + 1).alias("g"), F.col("id").alias("rid")
        )
        df = big.unionByName(tiny)
        gcol = "g"
    else:
        df = spark.range(5_000).select(F.col("id").alias("rid"))
        gcol = None
    df = df.localCheckpoint()
    plain = SK.bottomk_sample(df, "rid", k, gcol, skew_salts=1)
    fast = SK.bottomk_sample(
        df, "rid", k, gcol, skew_salts=1, min_group_rows=hint
    )
    assert _same_rows(plain, fast), (shape, hint, k)
