"""Per-partition checkpoint / metrics / lineage manifests -> exact
resume (north rule; FIXTURES.md section 7).

The reference's "resume" is file-existence caching per stage
(``prepare_entity_dataset.py:118-126``, ``prepare_pair_dataset.py:130-138``):
all-or-nothing, no lineage, silently stale. Here every stage writes

  {base}/{stage}/data/bucket=N/*.parquet      (idempotent overwrite per bucket)
  {base}/{stage}/_manifest/*.parquet          (manifest-LAST, appended)

where ``bucket = pmod(xxhash64(repo), n_buckets)`` — the explicit
repo-hash partitioning of the north rule. A rerun recomputes a bucket
iff it has no manifest row OR its input changed — the manifest stores
each bucket's input row count and input sha-xor fold, and resume
compares them against the current input, so a grown/edited corpus
recomputes exactly the touched buckets (per-bucket dynamic partition
overwrite keeps that idempotent). Double-written manifest rows are
deduped on read by (stage, partition_id) keeping the LATEST (ts,
run_id) row — the data directory always reflects the last writer.

Lineage: ``content_sha_xor`` is an order-insensitive XOR-fold of the
rows' ``content_sha`` (first 15 hex chars as int64) — equality between
the input snapshot's fold and the stage manifest fold is the per-row
content-sha lineage invariant (BASELINE.json).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_bucket(df: DataFrame, key_col: str = "repo", n_buckets: int = 32) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )


def sha_xor(df: DataFrame, sha_col: str = "content_sha"):
    """Order-insensitive lineage fold: bit_xor of sha prefix as int64."""
    return F.bit_xor(F.conv(F.substring(F.col(sha_col), 1, 15), 16, 10).cast("long"))


def _manifest_path(base: str, stage: str) -> str:
    return os.path.join(base, stage, "_manifest")


def _data_path(base: str, stage: str) -> str:
    return os.path.join(base, stage, "data")


def read_manifest(spark: SparkSession, base: str, stage: str) -> DataFrame | None:
    path = _manifest_path(base, stage)
    try:
        # mergeSchema: a dir holding pre-rename (wall_ms) and current
        # (run_wall_ms) rows must not resolve file-order dependently.
        m = spark.read.option("mergeSchema", "true").parquet(path)
    except Exception:
        return None
    # Migration: manifests written before the wall_ms -> run_wall_ms
    # rename stay resumable (ADVICE r3) — resolve whichever exists.
    cols = set(m.columns)
    if "run_wall_ms" not in cols:
        m = m.withColumn(
            "run_wall_ms",
            F.col("wall_ms").cast("long")
            if "wall_ms" in cols
            else F.lit(None).cast("long"),
        )
    elif "wall_ms" in cols:
        m = m.withColumn(
            "run_wall_ms",
            F.coalesce(F.col("run_wall_ms"), F.col("wall_ms").cast("long")),
        )
    # Dedupe re-runs: keep the LATEST manifest row per partition (the
    # per-bucket dynamic overwrite means data reflects the last writer;
    # a bucket recomputed for changed input must not resurrect stale
    # input stats). (ts, run_id) orders deterministically.
    w_cols = ["stage", "partition_id"]
    return (
        m.groupBy(*w_cols)
        .agg(
            F.max_by(
                F.struct(
                    "rows_in", "rows_out", "content_sha_xor", "in_sha_xor",
                    "run_wall_ms", "run_id",
                ),
                F.struct("ts", "run_id"),
            ).alias("s")
        )
        .select(*w_cols, "s.*")
    )


def run_stage(
    spark: SparkSession,
    base: str,
    stage: str,
    bucketed_input: DataFrame,
    fn,
    run_id: str | None = None,
    sha_col: str = "content_sha",
) -> DataFrame:
    """Execute ``fn(input_subset) -> DataFrame`` per stale bucket set,
    materialize + manifest, and return the full stage output.

    ``bucketed_input`` must carry an int ``bucket`` column (use
    ``with_bucket``); ``fn``'s output must preserve it. A bucket is
    DONE (skipped, its input anti-joined away before ``fn`` runs) iff
    it has a manifest row AND that row's recorded input stats — row
    count + content-sha xor fold — equal the current input's. Buckets
    whose input grew or changed are recomputed and idempotently
    overwritten; the one extra cost of change detection is a map-side-
    combinable count+xor aggregate over the full input per rerun."""
    run_id = run_id or uuid.uuid4().hex[:12]
    manifest = read_manifest(spark, base, stage)

    t0 = time.perf_counter()
    cur_stats = bucketed_input.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("rows_in"),
        (
            sha_xor(bucketed_input, sha_col)
            if sha_col in bucketed_input.columns
            else F.lit(0).cast("long")
        ).alias("in_sha_xor"),
    )
    orphaned: list[int] = []
    if manifest is not None:
        done = (
            manifest.select(
                F.col("partition_id").alias("bucket"),
                F.col("rows_in").alias("m_rows_in"),
                F.col("in_sha_xor").alias("m_in_sha_xor"),
            )
            .join(cur_stats, "bucket", "inner")
            .where(
                (F.col("m_rows_in") == F.col("rows_in"))
                & F.col("m_in_sha_xor").eqNullSafe(
                    F.format_string("%016x", F.col("in_sha_xor"))
                )
            )
            .select("bucket")
        )
        todo = bucketed_input.join(F.broadcast(done), "bucket", "left_anti")
        n_in_by_bucket = cur_stats.join(F.broadcast(done), "bucket", "left_anti")
        # ORPHANS: manifested buckets whose input vanished ENTIRELY.
        # They have no cur_stats row, so they are neither done nor
        # todo, and dynamic overwrite never touches their directories —
        # deleted docs would silently persist in stage output. Delete
        # the directories now and tombstone the manifest (rows 0).
        # Bucket count is bounded (n_buckets), so the collect is tiny.
        orphaned = [
            r["bucket"]
            for r in manifest.select(F.col("partition_id").alias("bucket"))
            .join(cur_stats.select("bucket"), "bucket", "left_anti")
            .join(  # only tombstone buckets not ALREADY tombstoned
                manifest.where(
                    (F.col("rows_in") == 0) & (F.col("rows_out") == 0)
                ).select(F.col("partition_id").alias("bucket")),
                "bucket",
                "left_anti",
            )
            .collect()
        ]
        if orphaned:
            jvm = spark._jvm
            hconf = spark._jsc.hadoopConfiguration()
            for b in orphaned:
                p = jvm.org.apache.hadoop.fs.Path(
                    os.path.join(_data_path(base, stage), f"bucket={b}")
                )
                p.getFileSystem(hconf).delete(p, True)
    else:
        todo = bucketed_input
        n_in_by_bucket = cur_stats

    out = fn(todo)
    assert "bucket" in out.columns, f"stage {stage}: fn must preserve 'bucket'"

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out.write.mode("overwrite").partitionBy("bucket").parquet(_data_path(base, stage))
    # Whole-RUN wall for this stage invocation, stamped identically
    # onto every bucket it wrote — honest name: this is NOT a
    # per-bucket task time (capturing that needs a Spark listener).
    run_wall_ms = int((time.perf_counter() - t0) * 1000)

    written = spark.read.parquet(_data_path(base, stage))
    new_out = (
        written.join(
            F.broadcast(n_in_by_bucket.select("bucket")), "bucket", "left_semi"
        )
        if manifest is not None
        else written
    )
    stats = new_out.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("rows_out"),
        (
            sha_xor(new_out, sha_col)
            if sha_col in new_out.columns
            else F.lit(0).cast("long")
        ).alias("out_sha_xor"),
    )
    mrows = (
        n_in_by_bucket.join(stats, "bucket", "full")
        .select(
            F.lit(stage).alias("stage"),
            F.col("bucket").cast("int").alias("partition_id"),
            F.coalesce("rows_in", F.lit(0)).cast("long").alias("rows_in"),
            F.coalesce("rows_out", F.lit(0)).cast("long").alias("rows_out"),
            F.format_string(
                "%016x", F.coalesce("out_sha_xor", F.lit(0))
            ).alias("content_sha_xor"),
            F.format_string(
                "%016x", F.coalesce("in_sha_xor", F.lit(0))
            ).alias("in_sha_xor"),
            F.lit(run_wall_ms).cast("long").alias("run_wall_ms"),
            F.lit(run_id).alias("run_id"),
            F.lit(time.time_ns()).cast("long").alias("ts"),
        )
    )
    if orphaned:
        zero = "%016x" % 0
        tomb = spark.createDataFrame(
            [
                (stage, int(b), 0, 0, zero, zero, run_wall_ms, run_id, time.time_ns())
                for b in orphaned
            ],
            mrows.schema,
        )
        mrows = mrows.unionByName(tomb)
    mrows.write.mode("append").parquet(_manifest_path(base, stage))
    return spark.read.parquet(_data_path(base, stage))


def lineage_check(
    spark: SparkSession, base: str, stage: str, bucketed_input: DataFrame,
    sha_col: str = "content_sha",
) -> bool:
    """Per-row lineage invariant: XOR-fold of input content shas equals
    the manifest's fold, per bucket (stages that preserve one row per
    doc; identity for the ingest stage)."""
    manifest = read_manifest(spark, base, stage)
    if manifest is None:
        return False
    inp = bucketed_input.groupBy("bucket").agg(
        F.format_string("%016x", sha_xor(bucketed_input, sha_col)).alias("in_fold")
    )
    joined = manifest.join(
        inp, manifest.partition_id == inp.bucket, "full"
    ).select("partition_id", "rows_in", "rows_out", "content_sha_xor", "in_fold")
    # Null-safe: a bucket present on only ONE side (input never
    # manifested, or manifest row with no input) is a lineage failure,
    # not a silently-dropped null comparison. Exception: a TOMBSTONE
    # (orphaned bucket whose input vanished) is consistent, not a
    # failure — identified by its explicit marker (rows_in == 0 AND
    # rows_out == 0, how run_stage writes tombstones), NOT by a zero
    # sha fold: a live bucket can legitimately fold to zero (paired
    # duplicate shas, or a stage without sha_col), and its vanished
    # input must still FAIL the check (ADVICE r3).
    tombstone_ok = (
        (F.col("rows_in") == 0)
        & (F.col("rows_out") == 0)
        & F.col("in_fold").isNull()
    )
    bad = joined.where(
        ~(F.col("content_sha_xor").eqNullSafe(F.col("in_fold")) | tombstone_ok)
    ).count()
    return bad == 0
