"""Checkpoint/resume + lineage manifest (north rule): rerun after
partial completion recomputes ONLY missing buckets and yields
byte-identical output; lineage xor-fold matches input."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from bio_re_with_entity_embeddings_spark import fixtures, schemas
from bio_re_with_entity_embeddings_spark.plans import manifest as M
from bio_re_with_entity_embeddings_spark.plans import pipeline


@pytest.fixture()
def workdir(tmp_path):
    d = str(tmp_path / "stages")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _corpus(spark):
    dictionary = fixtures.make_dictionary()
    rows = fixtures.make_corpus_rows(200, dictionary)
    return pipeline.ingest(spark.createDataFrame(rows, schemas.CORPUS))


def test_stage_runs_and_manifests(spark, workdir):
    docs = M.with_bucket(_corpus(spark), "repo", 8)
    out = M.run_stage(
        spark, workdir, "ident", docs, lambda df: df, run_id="r1"
    )
    assert out.count() == 200
    m = M.read_manifest(spark, workdir, "ident").toPandas()
    assert set(m["partition_id"]) <= set(range(8))
    assert m["rows_in"].sum() == 200 and m["rows_out"].sum() == 200
    assert (m["run_id"] == "r1").all()
    # lineage invariant: identity stage keeps the xor-fold
    assert M.lineage_check(spark, workdir, "ident", docs)


def test_resume_skips_completed_buckets(spark, workdir):
    docs = M.with_bucket(_corpus(spark), "repo", 8).cache()
    # simulate a failed first run: only buckets 0-3 completed
    partial = docs.where(F.col("bucket") < 4)
    M.run_stage(spark, workdir, "st", partial, lambda df: df, run_id="r1")
    m1 = M.read_manifest(spark, workdir, "st").toPandas()
    done_buckets = set(m1["partition_id"])

    calls = {}

    def fn(df):
        calls["buckets"] = sorted(
            r.bucket for r in df.select("bucket").distinct().collect()
        )
        return df

    out = M.run_stage(spark, workdir, "st", docs, fn, run_id="r2")
    # second run touched only the missing buckets
    assert set(calls["buckets"]).isdisjoint(done_buckets)
    # full output present and identical to the unchunked input
    got = sorted(r.doc_id for r in out.select("doc_id").collect())
    exp = sorted(r.doc_id for r in docs.select("doc_id").collect())
    assert got == exp
    # manifest: exactly one row per bucket after dedup, r1 rows kept
    m2 = M.read_manifest(spark, workdir, "st").toPandas()
    assert len(m2) == m2["partition_id"].nunique()
    kept = dict(zip(m2["partition_id"], m2["run_id"]))
    for b in done_buckets:
        assert kept[b] == "r1"


def test_grown_corpus_recomputes_changed_buckets(spark, workdir):
    """A bucket whose INPUT changed (grown corpus) must be recomputed,
    not skipped forever on the strength of an old manifest row; buckets
    with identical input stay attributed to the first run."""
    dictionary = fixtures.make_dictionary()
    rows = fixtures.make_corpus_rows(200, dictionary)
    small = pipeline.ingest(spark.createDataFrame(rows, schemas.CORPUS))
    big = pipeline.ingest(
        spark.createDataFrame(
            fixtures.make_corpus_rows(260, dictionary), schemas.CORPUS
        )
    )
    b_small = M.with_bucket(small, "repo", 8).cache()
    b_big = M.with_bucket(big, "repo", 8).cache()
    M.run_stage(spark, workdir, "st", b_small, lambda df: df, run_id="r1")

    grown = {
        r.bucket
        for r in b_big.groupBy("bucket").count()
        .join(
            b_small.groupBy("bucket").count().withColumnRenamed("count", "c0"),
            "bucket", "left",
        )
        .where(~F.col("count").eqNullSafe(F.col("c0")))
        .collect()
    }
    assert grown, "fixture must actually grow some buckets"

    out = M.run_stage(spark, workdir, "st", b_big, lambda df: df, run_id="r2")
    assert out.count() == 260
    got = sorted(r.doc_id for r in out.select("doc_id").collect())
    exp = sorted(r.doc_id for r in b_big.select("doc_id").collect())
    assert got == exp  # no stale rows, no dropped new rows
    m = M.read_manifest(spark, workdir, "st").toPandas()
    kept = dict(zip(m["partition_id"], m["run_id"]))
    for b, rid in kept.items():
        assert rid == ("r2" if b in grown else "r1"), (b, rid)
    assert M.lineage_check(spark, workdir, "st", b_big)
    # and the old, smaller input now FAILS lineage (null-safe compare)
    assert not M.lineage_check(spark, workdir, "st", b_small.where(F.col("bucket").isin(list(grown))))


def test_lineage_check_nullsafe_missing_buckets(spark, workdir):
    """Buckets present in the input but absent from the manifest are a
    lineage FAILURE (the old null != value comparison dropped them)."""
    docs = M.with_bucket(_corpus(spark), "repo", 8).cache()
    partial = docs.where(F.col("bucket") < 2)
    M.run_stage(spark, workdir, "st", partial, lambda df: df, run_id="r1")
    assert M.lineage_check(spark, workdir, "st", partial)
    assert not M.lineage_check(spark, workdir, "st", docs)


def test_read_manifest_pre_rename_wall_ms_schema(spark, workdir):
    """Manifests written before the wall_ms -> run_wall_ms rename must
    stay resumable (ADVICE r3): read_manifest resolves the old column,
    and a dir mixing old- and new-schema row files reads stably."""
    zero = "%016x" % 0
    old = spark.createDataFrame(
        [("st", 0, 5, 5, zero, zero, 123, "r0", 1)],
        "stage string, partition_id int, rows_in long, rows_out long, "
        "content_sha_xor string, in_sha_xor string, wall_ms long, "
        "run_id string, ts long",
    )
    old.write.mode("append").parquet(M._manifest_path(workdir, "st"))
    m = M.read_manifest(spark, workdir, "st")
    assert m is not None
    row = m.toPandas().iloc[0]
    assert row["run_wall_ms"] == 123 and row["run_id"] == "r0"

    # mixed dir: append a new-schema row file, both must survive
    new = spark.createDataFrame(
        [("st", 1, 7, 7, zero, zero, 456, "r1", 2)],
        "stage string, partition_id int, rows_in long, rows_out long, "
        "content_sha_xor string, in_sha_xor string, run_wall_ms long, "
        "run_id string, ts long",
    )
    new.write.mode("append").parquet(M._manifest_path(workdir, "st"))
    p = M.read_manifest(spark, workdir, "st").toPandas().set_index("partition_id")
    assert p.loc[0, "run_wall_ms"] == 123
    assert p.loc[1, "run_wall_ms"] == 456


def test_lineage_zero_fold_bucket_is_not_a_tombstone(spark, workdir):
    """A live bucket whose sha fold is legitimately zero (paired
    duplicate shas xor away) must still FAIL lineage when its input
    vanishes — tombstones are identified by the explicit rows_in == 0
    AND rows_out == 0 marker, not the fold value (ADVICE r3)."""
    rows = [
        ("a", "aaaaaaaaaaaaaaaaaaaa", 0),
        ("b", "aaaaaaaaaaaaaaaaaaaa", 0),  # duplicate sha: bucket-0 fold = 0
        ("c", "cccccccccccccccccccc", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id string, content_sha string, bucket int"
    ).cache()
    M.run_stage(spark, workdir, "st", docs, lambda df: df, run_id="r1")
    m = M.read_manifest(spark, workdir, "st").toPandas().set_index("partition_id")
    assert m.loc[0, "content_sha_xor"] == "%016x" % 0  # fixture as intended
    assert M.lineage_check(spark, workdir, "st", docs)
    # bucket 0's input vanishes -> must fail, not pass as a tombstone
    assert not M.lineage_check(
        spark, workdir, "st", docs.where(F.col("bucket") != 0)
    )


def test_rerun_is_idempotent(spark, workdir):
    docs = M.with_bucket(_corpus(spark), "repo", 8)
    M.run_stage(spark, workdir, "st", docs, lambda df: df, run_id="r1")
    out2 = M.run_stage(spark, workdir, "st", docs, lambda df: df, run_id="r2")
    assert out2.count() == 200
    m = M.read_manifest(spark, workdir, "st").toPandas()
    # all buckets still attributed to r1; no double counting
    assert (m["run_id"] == "r1").all()
    assert m["rows_out"].sum() == 200


def test_shrunk_corpus_deletes_orphaned_buckets(spark, workdir):
    """A bucket whose input VANISHED entirely must not leave stale data
    in stage output (round-2 ADVICE item 4): the orphaned directory is
    deleted, the manifest tombstoned, and lineage still passes."""
    docs = M.with_bucket(_corpus(spark), "repo", 8).cache()
    M.run_stage(spark, workdir, "st", docs, lambda df: df, run_id="r1")

    # shrink: drop every doc of two whole buckets
    keep = docs.where(~F.col("bucket").isin([0, 1])).cache()
    dropped = docs.count() - keep.count()
    assert dropped > 0, "fixture must actually empty some buckets"

    out = M.run_stage(spark, workdir, "st", keep, lambda df: df, run_id="r2")
    got = sorted(r.doc_id for r in out.select("doc_id").collect())
    exp = sorted(r.doc_id for r in keep.select("doc_id").collect())
    assert got == exp, "deleted docs persisted in stage output"
    m = M.read_manifest(spark, workdir, "st").toPandas()
    tomb = m[m["partition_id"].isin([0, 1])]
    assert (tomb["rows_out"] == 0).all() and (tomb["run_id"] == "r2").all()
    assert M.lineage_check(spark, workdir, "st", keep)

    # idempotent: a third run with the same shrunk input touches nothing
    out3 = M.run_stage(spark, workdir, "st", keep, lambda df: df, run_id="r3")
    assert sorted(r.doc_id for r in out3.select("doc_id").collect()) == exp
    m3 = M.read_manifest(spark, workdir, "st").toPandas()
    assert "r3" not in set(m3["run_id"])
