"""The composed curation plan (plans/curation.py): production mode ==
oracle mode, stage semantics, checkpointed == lazy, exact resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bio_re_with_entity_embeddings_spark.plans import curation as PC
from bio_re_with_entity_embeddings_spark.plans import manifest as M

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def world(spark):
    # the ONE planted world the oracle/bench/tests share (drifted
    # copies would validate different worlds)
    from bio_re_with_entity_embeddings_spark.contract_text import (
        _curate_split,
        _docs_with_near_dups,
    )

    docs2 = _docs_with_near_dups(spark, SF_DIR).cache()
    docs2.count()
    return _curate_split(docs2)


def _corpus_set(out):
    return {
        (r.doc, r.lang, r.quality, r.n_tokens)
        for r in out["corpus"].collect()
    }


CFG = dict(min_quality=0.55, decon_n=4, decon_hashed=False, quota=8)


def test_production_mode_equals_oracle_mode(spark, world):
    """xxhash64 minhash + hashed decon (the scale defaults) select the
    same survivors as the md5/string oracle mode: both candidate sets
    derive from the same banding math, verify is the same exact
    jaccard, and gram hashing is collision-free at fixture scale."""
    docs, bench = world
    md5 = PC.curate_corpus(
        spark, docs, bench,
        PC.CurationConfig(hash_mode="md5", **CFG),
    )
    xx = PC.curate_corpus(
        spark, docs, bench,
        PC.CurationConfig(hash_mode="xxhash64", **{**CFG, "decon_hashed": True}),
    )
    assert _corpus_set(md5) == _corpus_set(xx)


def test_stage_semantics(spark, world):
    docs, bench = world
    out = PC.curate_corpus(
        spark, docs, bench, PC.CurationConfig(hash_mode="md5", **CFG)
    )
    clusters = out["dedup_clusters"].toPandas()
    # planted near-dup clones cluster with their originals
    planted = {
        frozenset((str(i), str(100000 + i)))
        for i in range(1, 10)  # doc 0's clone sits in the benchmark split
    }
    got_pairs = {
        frozenset(g["doc"]) for _, g in clusters.groupby("cluster")
    }
    assert any(p <= g for p in planted for g in got_pairs)
    # exactly one keeper per cluster, keeper has the max quality
    sig = out["signals"].select("doc", "quality").toPandas().set_index("doc")
    for cl, grp in clusters.groupby("cluster"):
        keepers = grp[~grp["drop"]]
        assert len(keepers) == 1, cl
        kq = sig.loc[keepers.iloc[0]["doc"], "quality"]
        assert all(kq >= sig.loc[d, "quality"] for d in grp["doc"]), cl
    # dropped docs are absent from the final corpus
    dropped = set(clusters[clusters["drop"]]["doc"])
    final = {r.doc for r in out["corpus"].collect()}
    assert not (dropped & final)
    # quota respected per lang
    per_lang = out["corpus"].groupBy("lang").count().collect()
    assert all(r["count"] <= CFG["quota"] for r in per_lang)
    # decontaminated docs are absent
    contaminated = {
        r.doc for r in out["decon_hits"].where(F.col("n_hits") > 0).collect()
    }
    assert not (contaminated & final)
    # every stage only shrinks the survivor set
    n_sig = out["signals"].count()
    n_qp = out["quality_pass"].count()
    n_ex = out["exact_survivors"].count()
    n_final = out["corpus"].count()
    assert n_sig >= n_qp >= n_ex >= n_final > 0


def test_checkpointed_equals_lazy(spark, world, tmp_path):
    docs, bench = world
    cfg = PC.CurationConfig(hash_mode="md5", **CFG)
    lazy = PC.curate_corpus(spark, docs, bench, cfg)
    ck = PC.run_curation_checkpointed(
        spark, docs, bench, str(tmp_path / "ck"), n_buckets=8, config=cfg,
        run_id="r1",
    )
    assert _corpus_set(lazy) == _corpus_set(ck)


def test_crash_resume_exactness(spark, world, tmp_path):
    """Crash mid-corpus (half the buckets ingested), rerun over the
    full input: completed signal buckets keep their run id; the global
    tail recomputes; output equals a clean single run."""
    docs, bench = world
    cfg = PC.CurationConfig(hash_mode="md5", **CFG)
    base = str(tmp_path / "ck2")
    half = (
        M.with_bucket(
            docs.select(F.col("doc_id").cast("string").alias("doc"), "doc_id", "text", "lang"),
            "doc", 8,
        )
        .where(F.col("bucket") < 4)
        .drop("bucket", "doc")
    )
    PC.run_curation_checkpointed(
        spark, half, bench, base, n_buckets=8, config=cfg, run_id="r1"
    )
    out = PC.run_curation_checkpointed(
        spark, docs, bench, base, n_buckets=8, config=cfg, run_id="r2"
    )
    clean = PC.run_curation_checkpointed(
        spark, docs, bench, str(tmp_path / "clean"), n_buckets=8,
        config=cfg, run_id="rc",
    )
    assert _corpus_set(out) == _corpus_set(clean)
    m = M.read_manifest(spark, base, "signals").toPandas()
    kept = dict(zip(m["partition_id"], m["run_id"]))
    assert all(v == "r1" for b, v in kept.items() if b < 4)
    assert all(v == "r2" for b, v in kept.items() if b >= 4)


def test_kill_between_keep_and_corpus_resumes(spark, world, tmp_path):
    """Kill AFTER the keep stage (quota stage never ran): the rerun
    must skip signals + keep (manifest run ids unchanged) and compute
    only the corpus stage, byte-identical survivors."""
    import shutil

    docs, bench = world
    cfg = PC.CurationConfig(hash_mode="md5", **CFG)
    base = str(tmp_path / "ck3")
    first = PC.run_curation_checkpointed(
        spark, docs, bench, base, n_buckets=8, config=cfg, run_id="r1"
    )
    want = _corpus_set(first)
    stages = first["_stages"]
    shutil.rmtree(f"{base}/{stages['corpus']}")  # the "crash": quota output lost
    out = PC.run_curation_checkpointed(
        spark, docs, bench, base, n_buckets=8, config=cfg, run_id="r2"
    )
    assert _corpus_set(out) == want
    for stage in (stages["signals"], stages["keep"]):
        m = M.read_manifest(spark, base, stage).toPandas()
        assert (m["run_id"] == "r1").all(), stage
    m = M.read_manifest(spark, base, stages["corpus"]).toPandas()
    assert (m["run_id"] == "r2").all()


def test_config_or_benchmark_change_recomputes(spark, world, tmp_path):
    """The silently-stale-resume guard: rerunning over the same
    working dir with a different config knob or benchmark must NOT
    serve the old stage output (knobs + benchmark fingerprint are part
    of the stage identity), while an unchanged rerun still resumes."""
    docs, bench = world
    base = str(tmp_path / "ck4")
    cfg1 = PC.CurationConfig(hash_mode="md5", **CFG)
    out1 = PC.run_curation_checkpointed(
        spark, docs, bench, base, n_buckets=8, config=cfg1, run_id="r1"
    )
    # different quality gate -> different keep stage -> fresh compute
    cfg2 = PC.CurationConfig(hash_mode="md5", **{**CFG, "min_quality": 0.75})
    out2 = PC.run_curation_checkpointed(
        spark, docs, bench, base, n_buckets=8, config=cfg2, run_id="r2"
    )
    assert out1["_stages"]["keep"] != out2["_stages"]["keep"]
    assert _corpus_set(out2) != _corpus_set(out1)
    clean2 = PC.run_curation_checkpointed(
        spark, docs, bench, str(tmp_path / "clean4"), n_buckets=8,
        config=cfg2, run_id="rc",
    )
    assert _corpus_set(out2) == _corpus_set(clean2)
    # different benchmark -> different keep stage identity
    out3 = PC.run_curation_checkpointed(
        spark, docs, bench.limit(5), base, n_buckets=8, config=cfg1,
        run_id="r3",
    )
    assert out3["_stages"]["keep"] != out1["_stages"]["keep"]
    # unchanged rerun of cfg1 resumes the ORIGINAL stage untouched
    out4 = PC.run_curation_checkpointed(
        spark, docs, bench, base, n_buckets=8, config=cfg1, run_id="r4"
    )
    assert out4["_stages"]["keep"] == out1["_stages"]["keep"]
    m = M.read_manifest(spark, base, out1["_stages"]["keep"]).toPandas()
    assert (m["run_id"] == "r1").all()
    assert _corpus_set(out4) == _corpus_set(out1)


def test_corpus_budget_distinct_col(spark):
    """corpus_budget(distinct_col=...) joins an HLL n_distinct_est per
    group: inside the sketch's 3-standard-error bound of the exact
    distinct count, deterministic across reruns, and absent when the
    parameter is off."""
    import math

    from pyspark.sql import functions as F

    from bio_re_with_entity_embeddings_spark.operators import curation as CUR

    # 3 langs x 4000 docs; domain cardinality differs per lang
    # (1000 / 200 / 1) and every domain repeats, so distinct != count
    df = (
        spark.range(12_000)
        .select(
            F.concat(F.lit("l"), (F.col("id") % 3)).alias("lang"),
            F.concat(
                F.lit("d"),
                (F.col("id") % 3),
                F.lit("_"),
                F.when(F.col("id") % 3 == 0, F.col("id") % 1000)
                .when(F.col("id") % 3 == 1, F.col("id") % 200)
                .otherwise(F.lit(0)),
            ).alias("domain"),
            F.lit("some text for the budget").alias("text"),
        )
        .localCheckpoint()
    )
    out = {
        r["grp"]: r
        for r in CUR.corpus_budget(
            df, group_col="lang", text_col="text",
            distinct_col="domain", distinct_p=12,
        ).collect()
    }
    exact = {
        r["lang"]: r["n"]
        for r in df.groupBy("lang")
        .agg(F.count_distinct("domain").alias("n"))
        .collect()
    }
    bound = 3 * 1.04 / math.sqrt(2**12)
    for lang, n in exact.items():
        est = out[lang]["n_distinct_est"]
        assert abs(est - n) <= max(bound * n, 2.0), (lang, est, n)
    # off by default: the column does not exist
    plain = CUR.corpus_budget(df, group_col="lang", text_col="text")
    assert "n_distinct_est" not in plain.columns
    # deterministic
    again = {
        r["grp"]: r["n_distinct_est"]
        for r in CUR.corpus_budget(
            df, group_col="lang", text_col="text",
            distinct_col="domain", distinct_p=12,
        ).collect()
    }
    assert again == {k: v["n_distinct_est"] for k, v in out.items()}
