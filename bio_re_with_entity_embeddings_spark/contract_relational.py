"""Driver-contract queries: generic relational operator inventory
(SURVEY 2.2/2.4/2.5/2.6) exercised over the TPC-H-ish tables.

Cross-engine exactness: money aggregates as DECIMAL (no float-sum
order sensitivity); per-row doubles with identical IEEE expressions;
deterministic tie-breaks on every window/top-k.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .contract import _load, register, register_extra


@register(
    "rel_filter_project",
    """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05
  AND l_returnflag IS NOT NULL
""",
)
def rel_filter_project(spark, sf_dir):
    """F5 notnull + F6 projection + F7 scalar map (per-row double)."""
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") > 0.05)
            & F.col("l_returnflag").isNotNull()
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@register(
    "rel_agg_groupby",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
)
def rel_agg_groupby(spark, sf_dir):
    """A-family hash aggregate (TPC-H Q1 shape, exact decimal sums)."""
    li = _load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("l_orderkey").alias("n_orders"),
    )


@register_extra(
    "rel_equi_join_agg",
    """
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def rel_equi_join_agg(spark, sf_dir):
    """J1 equi-join + aggregate."""
    o = _load(spark, sf_dir, "orders")
    c = _load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_total"),
        )
    )


@register_extra(
    "rel_broadcast_join",
    """
SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
)
def rel_broadcast_join(spark, sf_dir):
    """J3 broadcast lookup join (part is dimension-sized)."""
    li = _load(spark, sf_dir, "lineitem")
    p = _load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
    )


@register_extra(
    "rel_semi_join",
    """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def rel_semi_join(spark, sf_dir):
    """J5 left-semi."""
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register_extra(
    "rel_anti_join",
    """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def rel_anti_join(spark, sf_dir):
    """J7 left-anti (crawler-dedupe analog)."""
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "rel_distinct_sort",
    "SELECT DISTINCT p_type FROM part ORDER BY p_type",
)
def rel_distinct_sort(spark, sf_dir):
    """A5 distinct + T2 global sort."""
    return _load(spark, sf_dir, "part").select("p_type").distinct().orderBy("p_type")


@register_extra(
    "rel_dedup_keys",
    """
SELECT o_custkey, o_orderstatus,
       CAST(min(o_orderkey) AS BIGINT) AS first_orderkey,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY o_custkey, o_orderstatus
""",
)
def rel_dedup_keys(spark, sf_dir):
    """A6 drop_duplicates by keys, made deterministic (min orderkey)."""
    o = _load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey", "o_orderstatus").agg(
        F.min("o_orderkey").alias("first_orderkey"),
        F.count(F.lit(1)).alias("n"),
    )


@register_extra(
    "rel_topk_window",
    """
SELECT o_custkey, o_orderkey, rnk FROM (
  SELECT o_custkey, o_orderkey,
         CAST(row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
  FROM orders)
WHERE rnk <= 3
""",
)
def rel_topk_window(spark, sf_dir):
    """T3 top-k per group via row_number (deterministic tie-break)."""
    o = _load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


@register_extra(
    "rel_topk_global",
    """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
)
def rel_topk_global(spark, sf_dir):
    """T2/T3 global ordered limit. Extras-registry since r5 (T2 stays
    driver-checked via rel_distinct_sort) — retired to make window
    room for kg_full_curated, the composed curation->KG oracle."""
    return (
        _load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@register_extra(
    "rel_union_distinct",
    """
SELECT * FROM (
  SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
  UNION
  SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 100000
)
""",
)
def rel_union_distinct(spark, sf_dir):
    """U1 union + distinct."""
    o = _load(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select(F.col("o_orderkey").alias("k"))
    b = o.where(F.col("o_totalprice") > 100000).select(F.col("o_orderkey").alias("k"))
    return a.unionByName(b).distinct()


@register_extra(
    "rel_multiway_join",
    """
SELECT n.n_name, r.r_name,
       CAST(count(*) AS BIGINT) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
""",
)
def rel_multiway_join(spark, sf_dir):
    """Dimension-chain broadcast joins (star-schema shape)."""
    c = _load(spark, sf_dir, "customer")
    n = _load(spark, sf_dir, "nation")
    r = _load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "events_hourly_rollup",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
""",
)
def events_hourly_rollup(spark, sf_dir):
    """Tumbling-window rollup over the event table (streaming-shaped
    agg run as batch; the streaming wrapper reuses this stage)."""
    e = _load(spark, sf_dir, "events")
    return e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_ts"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


@register_extra(
    "rel_cube",
    """
SELECT coalesce(l_returnflag, '<all>') AS rflag,
       coalesce(l_linestatus, '<all>') AS lstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def rel_cube(spark, sf_dir):
    """CUBE rollup (beyond the reference's aggregate surface; grouping
    sets are table stakes for an analytics engine)."""
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("lstatus"),
            "n_rows",
            "sum_qty",
        )
    )


@register(
    "events_sessionize",
    """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, session_id
""",
)
def events_sessionize(spark, sf_dir):
    """Sessionization: 30-minute-gap sessions via lag + running sum
    (the batch form of the streaming session_window pattern)."""
    e = _load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")  # parquet may infer NTZ
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
                > 30 * 60
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("session_id", F.sum("new_sess").over(w2))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
