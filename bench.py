#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship measurement is the full KG pipeline (distributed corpus
generation -> trie mentions -> pair join -> scoring -> triples) with
throughput reported as triples/sec and files/sec. Scaling-efficiency
runs (local[8] vs local[32]) are driven by bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bio_re_with_entity_embeddings_spark import fixtures  # noqa: E402
from bio_re_with_entity_embeddings_spark.deploy import ensure_shipped  # noqa: E402
from bio_re_with_entity_embeddings_spark.plans import pipeline  # noqa: E402
from bio_re_with_entity_embeddings_spark.session import get_spark  # noqa: E402

# Representative per-operator headline queries from the driver contract.
HEADLINE_QUERIES = [
    "kg_triples_scored",
    "kg_doc2entity",
    "rel_agg_groupby",
    "rel_topk_window",
    "rel_broadcast_join",
    "dedup_minhash",
    "dedup_exact",
    "sim_topk_matmul",
    "sim_ann_lsh",
    "sim_ivf",
    "text_stats",
    "text_winnowing",
    "curate_decontaminate",
    "graph_pagerank",
    "kg_bgp_query",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = fixtures.sf_from_dir(sf_dir)
    n_files = int(
        os.environ.get("SPARK_GRAFT_SCALE_FILES", fixtures.n_files_for_sf(sf))
    )
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", 2 * cpus))

    spark = get_spark(
        app_name="kg-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
    )
    ensure_shipped(spark)

    import __spark_entry__ as entrymod

    timings: dict[str, float] = {}

    # Flagship: full pipeline on executor-side-generated corpus.
    # tokens_per_file sized so the corpus is ~3 KB/file (real-source-file
    # scale) and trie/join compute dominates task-scheduling overhead —
    # the scaling measurement is meaningless on a 25 MB input.
    tokens_per_file = int(os.environ.get("SPARK_GRAFT_TOKENS_PER_FILE", "1200"))
    surface_density = int(os.environ.get("SPARK_GRAFT_SURFACE_DENSITY", "48"))
    # Dictionary sized so per-doc entity sets stay sparse (real-corpus
    # shape); hub pairs' article sets bounded (n_docs stays exact).
    n_pkg = int(os.environ.get("SPARK_GRAFT_DICT_PKG", "400"))
    n_fn = int(os.environ.get("SPARK_GRAFT_DICT_FN", "1200"))
    dictionary = fixtures.make_dictionary(n_pkg=n_pkg, n_fn=n_fn)
    # Materialize the synthetic corpus to parquet ONCE (untimed,
    # content-addressed, reused across runs/levels): production input
    # is a columnar scan of an Iceberg table, not a generator
    # expression — timing the interpreted generator would measure the
    # benchmark harness, not the pipeline.
    corpus_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".kgwork",
        f"bench_corpus_f{n_files}_t{tokens_per_file}_d{n_pkg}x{n_fn}_s{surface_density}",
    )
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        fixtures.distributed_corpus_df(
            spark, n_files, dictionary,
            tokens_per_file=tokens_per_file, partitions=64,
            surface_density=surface_density,
        ).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    embeddings = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # Scale-path config: evidence edges live in the pairs table, the
    # triple table carries exact n_docs (articles_cap=-1 -> map-side
    # combinable support aggregate).
    cfg = pipeline.PipelineConfig(repo_partitions=0, articles_cap=-1)

    # Measurement protocol (round-4: repeats are INTERLEAVED round-robin
    # across all measurements, the bench_scaling.py discipline — back-
    # to-back repeats of one query land in the same VM-contention
    # window, which is how BENCH_r03's kg_pipeline got a 3.4x min-max
    # band; spreading a query's repeats across the whole pass
    # decorrelates them from any one noise burst. min/max recorded per
    # measurement; the min is the best contention-free estimate.)
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    spread: dict[str, list[float]] = {}

    n_triples = 0

    def run_pipeline() -> None:
        nonlocal n_triples
        out = pipeline.build_triples(spark, corpus, dictionary, embeddings, cfg)
        n_triples = out["triples"].count()

    # Pipeline warm-up on a 10x smaller corpus (JIT/codegen/Python-
    # worker fork), then drop its cache so the timed runs are isolated.
    warm = corpus.where(F.pmod(F.xxhash64("path"), F.lit(10)) == 0)
    pipeline.build_triples(spark, warm, dictionary, embeddings, cfg)["triples"].count()
    spark.catalog.clearCache()

    measurements: list[tuple[str, object]] = [("kg_pipeline", run_pipeline)]

    if not os.environ.get("SPARK_GRAFT_SKIP_HEADLINE"):
        # scaling runs (SKIP_HEADLINE) measure kg_pipeline throughput
        # only — the fixed-cost headline queries would dilute wall-clock.
        # extras: rel_* micro-queries retired from the driver's 50-row
        # window still benchmark round-over-round
        qs = {**entrymod.queries(), **entrymod.extra_queries()}
        for name in HEADLINE_QUERIES:
            # The contract dedup_minhash runs the md5 hash_mode (the
            # DuckDB-checkable oracle variant; an md5 per (gram, seed)
            # is ~2x the xxhash64 signature cost) — record it under its
            # own name; "dedup_minhash" stays the PRODUCTION xxhash64
            # mode, comparable round-over-round.
            key = "dedup_minhash_md5_oracle" if name == "dedup_minhash" else name
            measurements.append(
                (key, lambda name=name: qs[name](spark, sf_dir).count())
            )

        from bio_re_with_entity_embeddings_spark.contract_text import _docs_with_dups
        from bio_re_with_entity_embeddings_spark.operators import dedup as DD

        measurements.append(
            (
                "dedup_minhash",
                lambda: DD.minhash_near_duplicates(
                    _docs_with_dups(spark, sf_dir), "doc_id", "text", threshold=0.5
                ).count(),
            )
        )

        # Composed curation plan, PRODUCTION mode (xxhash64 minhash,
        # hashed decon, salted quota via the max_group_rows hint — no
        # plan-time count). The contract's md5/string oracle variant is
        # correctness-gated; this is the round-over-round throughput
        # number for the end-to-end chain.
        from bio_re_with_entity_embeddings_spark.plans import curation as PC

        def run_curation() -> None:
            from bio_re_with_entity_embeddings_spark.contract_text import (
                _curate_split,
                _docs_with_near_dups,
            )

            corp, bench_split = _curate_split(
                _docs_with_near_dups(spark, sf_dir)
            )
            # 40k > quota * _QUOTA_SKEW_FACTOR (32k), so the hint
            # actually selects the SALTED two-stage top-k (the scale
            # path this bench claims to exercise) without a plan-time
            # count job
            cur_cfg = PC.CurationConfig(
                min_quality=0.55,
                decon_n=4,
                quota=2000,
                quota_max_group_rows=40_000,
            )
            PC.curate_corpus(
                spark, corp, benchmark=bench_split, config=cur_cfg
            )["corpus"].count()

        measurements.append(("curate_corpus", run_curation))

        # Composed curation -> KG product (plans/full.py), PRODUCTION
        # mode: xxhash64 minhash + hashed decon in front of the trie
        # pipeline over the curated survivors. Same planted world as
        # curate_corpus; the kg_full_curated contract row is the
        # row-exact oracle variant of this measurement.
        def run_full() -> None:
            from bio_re_with_entity_embeddings_spark.contract_text import (
                _as_code_corpus,
                _curate_split,
                _doc_dict_entities,
                _doc_dict_entries,
                _docs_with_near_dups,
            )
            from bio_re_with_entity_embeddings_spark.plans import full as PF

            corp, bench_split = _curate_split(
                _docs_with_near_dups(spark, sf_dir)
            )
            ccfg = PC.CurationConfig(min_quality=0.55, decon_n=4, quota=0)
            pcfg = pipeline.PipelineConfig(
                relations=[("op", "obj")],
                predicates={("op", "obj"): "acts_on"},
                threshold=-2.0,
            )
            PF.curate_then_build(
                spark,
                _as_code_corpus(corp),
                _doc_dict_entries(),
                embeddings,
                benchmark=_as_code_corpus(bench_split),
                curation_config=ccfg,
                pipeline_config=pcfg,
                entities=_doc_dict_entities(spark),
                doc_key=F.col("repo"),
            )["triples"].count()

        measurements.append(("kg_full", run_full))
        # untimed warm-up pass (pipeline already warmed above)
        for _, fn in measurements[1:]:
            fn()
        spark.catalog.clearCache()

    walls: dict[str, list[float]] = {k: [] for k, _ in measurements}
    for _ in range(repeats):
        for key, fn in measurements:
            t0 = time.perf_counter()
            fn()
            walls[key].append(time.perf_counter() - t0)
            if key in ("kg_pipeline", "curate_corpus", "kg_full"):
                # cache teardown between repeats, OUTSIDE the timed
                # region (both plans persist internally; pre-r4
                # protocol also excluded teardown from the wall)
                spark.catalog.clearCache()
    for key, ws in walls.items():
        timings[key] = round(statistics.median(ws), 3)
        spread[key] = [round(min(ws), 3), round(max(ws), 3)]

    # Second scale point (VERDICT r3 #5), measured this round at 40x
    # the default corpus on this harness (too long to re-run inside
    # every driver bench; full table + protocol in BENCH/BASELINE.md).
    second_scale_point = {
        "files": 2_000_000,
        "wall_sec_median": 32.0,
        "wall_sec_spread": [30.1, 37.3],
        "files_per_sec": 62440,
        "triples": 1_201_170,
        "master": "local[32]",
        "source": "BENCH/BASELINE.md round 5 (pre-measured, not re-run here)",
        # Staleness stamp (ADVICE r4): the commit/date this point was
        # measured at. If the pipeline changes materially after this
        # commit, re-measure (SPARK_GRAFT_SCALE_FILES=2000000
        # SPARK_GRAFT_SKIP_HEADLINE=1 python bench.py) instead of
        # trusting this entry.
        "measured_at_commit": "dc51458",
        "measured_at_date": "2026-08-17",
    }
    if os.environ.get("SPARK_GRAFT_OMIT_SCALE_POINT"):
        second_scale_point = None

    result = {
        "metric": "kg_pipeline_wall",
        "value": timings["kg_pipeline"],
        "unit": "sec",
        "second_scale_point": second_scale_point,
        "queries": timings,
        "spread": spread,
        # Per-query MIN of the interleaved repeats — the best
        # contention-free estimate on this shared VM (see the
        # measurement-protocol note above: repeats are round-robin, so
        # a noise burst inflates some repeats of every query; the min
        # survives). Read this when the medians look uniformly inflated
        # vs the previous round AND the spread is wide: a 5-7x
        # degraded host window was measured on 2026-08-17
        # (BENCH/BASELINE.md "window calibration") where medians ran
        # 6x the quiet-window values while the mins reproduced them.
        # derived from spread (same rounding site) so the two can
        # never drift apart if the spread computation changes
        "queries_min": {k: spread[k][0] for k in walls},
        "repeats": repeats,
        "interleaved": True,
        "sf": sf,
        "master": f"local[{cpus}]",
        "shuffle_partitions": shuffle,
        "files": n_files,
        "triples": n_triples,
        "triples_per_sec": round(n_triples / timings["kg_pipeline"], 1),
        "files_per_sec": round(n_files / timings["kg_pipeline"], 1),
        "triples_per_sec_best": round(n_triples / min(walls["kg_pipeline"]), 1),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
