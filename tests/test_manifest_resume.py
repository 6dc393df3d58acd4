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


def test_rerun_is_idempotent(spark, workdir):
    docs = M.with_bucket(_corpus(spark), "repo", 8)
    M.run_stage(spark, workdir, "st", docs, lambda df: df, run_id="r1")
    out2 = M.run_stage(spark, workdir, "st", docs, lambda df: df, run_id="r2")
    assert out2.count() == 200
    m = M.read_manifest(spark, workdir, "st").toPandas()
    # all buckets still attributed to r1; no double counting
    assert (m["run_id"] == "r1").all()
    assert m["rows_out"].sum() == 200
