"""spark-submit CLI — the reference's command-line surface, one
subcommand per reference entry point, runnable as

    spark-submit --py-files <pkg.zip> -m ... OR
    spark-submit cli.py <subcommand> ...    OR
    python -m bio_re_with_entity_embeddings_spark.cli <subcommand> ...

Reference entry points mirrored (semantics, not flags-for-flags):

* ``prepare-entities``   <- prepare_entity_dataset.py:86-96
  (--working_dir/--entity_type): corpus scan -> mention detection ->
  doc2entity / entity2doc exports per entity type.
* ``prepare-pairs``      <- prepare_pair_dataset.py:82-94
  (--source_type/--target_type): co-occurrence pair dataset + the
  ';;;'-joined instances export.
* ``build-triples``      — the full KG pipeline (this engine's
  superset entry point): mentions -> pairs -> scoring -> thresholded
  triples into the partitioned graph table (sources/iceberg.py).
* ``train-embeddings``   <- learn_embeddings.py:85-91: PV-DBOW compat
  trainer over the doc2vec input (off the hot path).
* ``extract-vectors``    <- extract_document_vectors.py:8-37: doctag
  vectors -> word2vec-format .bin + .vocab sidecar.
* ``resume-run``         — checkpointed runner (plans/runner.py):
  per-bucket manifests, exact resume, lineage verification.

Every subcommand takes --corpus as a parquet path or (with --catalog)
an Iceberg table name; dictionaries arrive as a TSV of
(surface, entity_id, entity_type).
"""

from __future__ import annotations

import argparse
import sys


def _spark(args):
    from .session import get_spark

    return get_spark(app_name=f"kg-{args.cmd}", master=args.master)


def _read_corpus(spark, args):
    from .sources import iceberg

    return iceberg.read_corpus(spark, args.corpus, args.catalog)


def _read_dictionary(spark, path: str):
    from . import fixtures

    rows = (
        spark.read.csv(path, sep="\t", header=True)
        .select("surface", "entity_id", "entity_type")
        .collect()
    )
    return [fixtures.DictEntry(r[0], r[1], r[2]) for r in rows]


def cmd_prepare_entities(args) -> int:
    from .operators import aggregates, mentions as mentions_op
    from .plans.pipeline import ingest
    from .sources import tsv

    spark = _spark(args)
    dictionary = _read_dictionary(spark, args.dictionary)
    entries = [
        (e.surface, e.entity_id, e.entity_type)
        for e in dictionary
        if args.entity_type in (None, e.entity_type)
    ]
    docs = ingest(_read_corpus(spark, args))
    mentions = mentions_op.detect_mentions(docs, entries)
    tsv.export_doc2entity(
        aggregates.doc_to_entities(mentions), f"{args.working_dir}/doc2entity"
    )
    tsv.export_instances(
        aggregates.entity_to_docs(mentions), f"{args.working_dir}/instances"
    )
    tsv.write_id_list(
        mentions.select("doc_id"), "doc_id", f"{args.working_dir}/doc_ids"
    )
    print(f"mentions: {mentions.count()}", file=sys.stderr)
    return 0


def cmd_prepare_pairs(args) -> int:
    from .operators import mentions as mentions_op, pairs as pairs_op, triples as triples_op
    from .plans.pipeline import ingest
    from .sources import tsv

    spark = _spark(args)
    dictionary = _read_dictionary(spark, args.dictionary)
    entries = [(e.surface, e.entity_id, e.entity_type) for e in dictionary]
    docs = ingest(_read_corpus(spark, args))
    mentions = mentions_op.detect_mentions(docs, entries)
    rel_pairs = pairs_op.generate_pairs(
        mentions.select("doc_id", "entity_id", "entity_type").distinct(),
        args.source_type,
        args.target_type,
        salt_buckets=args.salt_buckets,
        already_distinct=True,
    )
    support = triples_op.support_agg(rel_pairs)
    tsv.export_pair_instances(
        support.select("subj", "obj", "articles"),
        f"{args.working_dir}/pair_instances",
    )
    print(f"pairs: {support.count()}", file=sys.stderr)
    return 0


def cmd_build_triples(args) -> int:
    from .plans import pipeline
    from .sources import iceberg

    spark = _spark(args)
    dictionary = _read_dictionary(spark, args.dictionary)
    embeddings = spark.read.parquet(args.embeddings)
    cfg = pipeline.PipelineConfig(
        threshold=args.threshold,
        articles_cap=-1 if args.scale else 0,
        salt_buckets=args.salt_buckets,
        canonicalize=args.canonicalize,
    )
    out = pipeline.build_triples(
        spark, _read_corpus(spark, args), dictionary, embeddings, cfg
    )
    iceberg.write_triples(out["triples"], args.output, args.catalog)
    print(f"triples written to {args.output}", file=sys.stderr)
    return 0


def cmd_train_embeddings(args) -> int:
    from .ml import doc2vec

    spark = _spark(args)
    tagged = spark.read.parquet(args.input)
    # Reference config-file parity (learn_embeddings.py:97-101): the
    # JSON provides defaults; explicitly passed flags win over it.
    kwargs = doc2vec.load_train_config(args.config) if args.config else {}
    if args.vector_size is not None:
        kwargs["vector_size"] = args.vector_size
    if args.epochs is not None:
        kwargs["epochs"] = args.epochs
    kwargs.setdefault("vector_size", 64)
    kwargs.setdefault("epochs", 10)
    emb = doc2vec.train_pv_dbow(tagged, seed=args.seed, **kwargs)
    emb.write.mode("overwrite").parquet(args.output)
    print(f"doctag vectors -> {args.output}", file=sys.stderr)
    return 0


def cmd_extract_vectors(args) -> int:
    from .sources import tsv, word2vec

    spark = _spark(args)
    emb = spark.read.parquet(args.embedding_model)
    n = word2vec.save_word2vec_format(
        emb, f"{args.output_dir}/{args.model_name}.bin",
        tag_col=args.tag_col, vec_col=args.vec_col,
    )
    tsv.write_id_list(emb, args.tag_col, f"{args.output_dir}/{args.model_name}.vocab")
    print(f"{n} vectors -> {args.output_dir}/{args.model_name}.bin", file=sys.stderr)
    return 0


def cmd_media_features(args) -> int:
    """Multimodal feature extraction (operators/multimodal.py): one
    pass over a media table (media_id, modality, payload, mime) writes
    per-modality feature tables — image dims/intensity/thumbnails
    (PPM/PGM/BMP/PNG/GIF/JPEG), audio rate/duration/RMS (WAV/FLAC),
    video track metadata (MP4 box walk). Decodes run partition-
    parallel in Arrow batches; a payload a decoder cannot handle fails
    the job loudly rather than emitting a silent null row."""
    from .operators import multimodal as MM

    spark = _spark(args)
    media = spark.read.parquet(args.input)
    MM.decode_image_features(media).write.mode("overwrite").parquet(
        f"{args.output_dir}/image_features"
    )
    MM.decode_audio_features(media).write.mode("overwrite").parquet(
        f"{args.output_dir}/audio_features"
    )
    MM.decode_video_meta(media).write.mode("overwrite").parquet(
        f"{args.output_dir}/video_meta"
    )
    print(f"media features -> {args.output_dir}", file=sys.stderr)
    return 0


def cmd_graph_metrics(args) -> int:
    """Graph analytics over a MATERIALIZED triple/edge table
    (operators/graph.py) — the consumer pass after build-triples:
    degree profile, PageRank (uniform dangling redistribution), and
    per-node triangle counts, each written as its own feature table.
    --two_hop_cap > 0 additionally writes the hub-gated two-hop pairs
    (mids above the cap are SKIPPED — the documented hub contract)."""
    from pyspark.sql import functions as F

    from .operators import graph as G

    spark = _spark(args)
    edges = spark.read.parquet(args.input).select(
        F.col(args.src_col).alias("src"), F.col(args.dst_col).alias("dst")
    )
    out = args.output_dir
    G.degrees(edges).write.mode("overwrite").parquet(f"{out}/degrees")
    stats: dict = {}
    G.pagerank(
        edges, iterations=args.iterations, damping=args.damping,
        tol=args.tol, stats=stats, encode_ids=args.encode_ids,
    ).write.mode("overwrite").parquet(f"{out}/pagerank")
    if not args.skip_triangles:
        G.triangles(edges).write.mode("overwrite").parquet(f"{out}/triangles")
    if args.lpa_iterations > 0:
        G.label_propagation(edges, iterations=args.lpa_iterations).write.mode(
            "overwrite"
        ).parquet(f"{out}/communities")
    if args.two_hop_cap > 0:
        G.two_hop(edges, max_mid_degree=args.two_hop_cap).write.mode(
            "overwrite"
        ).parquet(f"{out}/two_hop")
    if args.bfs_seeds:
        seeds = spark.createDataFrame(
            [(s,) for s in args.bfs_seeds.split(",") if s], "node string"
        )
        G.bfs_hops(edges, seeds, max_hops=args.bfs_max_hops).write.mode(
            "overwrite"
        ).parquet(f"{out}/bfs_hops")
    if args.sssp_seeds:
        sseeds = spark.createDataFrame(
            [(s,) for s in args.sssp_seeds.split(",") if s], "node string"
        )
        wsrc = spark.read.parquet(args.input)
        w = (
            F.col(args.sssp_weight_col).cast("double")
            if args.sssp_weight_col
            else F.lit(1.0)
        )
        wedges = wsrc.select(
            F.col(args.src_col).alias("src"),
            F.col(args.dst_col).alias("dst"),
            w.alias("weight"),
        )
        G.sssp(
            wedges, sseeds, max_rounds=args.sssp_max_rounds
        ).write.mode("overwrite").parquet(f"{out}/sssp")
    if args.ppr_seeds:
        pseeds = spark.createDataFrame(
            [(s,) for s in args.ppr_seeds.split(",") if s], "node string"
        )
        G.pagerank(
            edges, iterations=args.iterations, damping=args.damping,
            encode_ids=args.encode_ids, seeds=pseeds,
        ).write.mode("overwrite").parquet(f"{out}/ppr")
    if args.linkpred_cap != 0:
        cap = None if args.linkpred_cap < 0 else args.linkpred_cap
        G.link_prediction(edges, max_mid_degree=cap).write.mode(
            "overwrite"
        ).parquet(f"{out}/link_prediction")
    if args.kcore:
        kc: dict = {}
        G.core_numbers(edges, stats=kc).write.mode("overwrite").parquet(
            f"{out}/core_numbers"
        )
        print(
            f"core_numbers rounds={kc['rounds']} converged={kc['converged']}",
            file=sys.stderr,
        )
    if args.ktruss > 0:
        kt: dict = {}
        G.k_truss(edges, args.ktruss, stats=kt).write.mode(
            "overwrite"
        ).parquet(f"{out}/ktruss")
        print(
            f"k_truss k={args.ktruss} rounds={kt['rounds']}"
            f" converged={kt['converged']} kept={kt['n_edges_kept']}"
            f"/{kt['n_edges_in']}",
            file=sys.stderr,
        )
    if args.hyperball_p > 0:
        hb: dict = {}
        G.hyperball(edges, p=args.hyperball_p, stats=hb).write.mode(
            "overwrite"
        ).parquet(f"{out}/hyperball")
        print(
            f"hyperball rounds={hb['rounds']}"
            f" eff_diam={G.effective_diameter(hb['nf']):.2f}"
            f" nf={[round(x, 1) for x in hb['nf']]}",
            file=sys.stderr,
        )
    print(
        f"graph metrics -> {out} (pagerank rounds={stats.get('rounds')},"
        f" nodes={stats.get('n_nodes')})",
        file=sys.stderr,
    )
    return 0


def cmd_profile(args) -> int:
    """One-pass corpus profiling report — the telemetry a corpus ships
    next to the data: per-group budget (docs, whitespace + BPE tokens,
    mean quality, optional HLL distinct cardinality of --distinct_col)
    and per-group text-length quantiles from the deterministic
    bottom-k sample (operators/curation.py::corpus_budget +
    operators/sketches.py::approx_quantiles). Every number is either
    exact or a sketch with a stated bound; nothing shuffles raw
    values."""
    from pyspark.sql import functions as F

    from .operators import curation as CUR
    from .operators import sketches as SK

    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    out = args.output_dir
    CUR.corpus_budget(
        docs, group_col=args.group_col, text_col=args.text_col,
        distinct_col=args.distinct_col,
    ).write.mode("overwrite").parquet(f"{out}/budget")
    lengths = docs.select(
        F.col(args.group_col).alias("grp"),
        F.length(F.col(args.text_col)).alias("text_len"),
        F.col(args.id_col),
    )
    SK.approx_quantiles(
        lengths, "text_len", args.id_col, [0.25, 0.5, 0.75, 0.99],
        k=args.quantile_k, group_col="grp",
        max_group_rows=args.max_group_rows,
        min_group_rows=args.min_group_rows,
    ).write.mode("overwrite").parquet(f"{out}/length_quantiles")
    print(f"corpus profile -> {out}", file=sys.stderr)
    return 0


def cmd_curate(args) -> int:
    """The composed LLM-corpus curation chain (plans/curation.py):
    quality gate -> exact dedup -> minhash keepers -> decontamination
    -> per-group quota. --working_dir switches to the checkpointed
    resumable runner (per-bucket manifests, exact resume)."""
    from .plans import curation as PC

    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    cfg = PC.CurationConfig(
        min_quality=args.min_quality,
        decon_n=args.decon_n,
        quota=args.quota,
        quota_key=args.quota_key,
        quota_max_group_rows=args.max_group_rows,
    )
    if args.working_dir:
        out = PC.run_curation_checkpointed(
            spark, docs, bench, args.working_dir,
            n_buckets=args.n_buckets, config=cfg,
        )
    else:
        out = PC.curate_corpus(spark, docs, bench, cfg)
    # corpus_full keeps the TEXT — the product a training pipeline
    # consumes ("corpus" is the metadata/oracle view)
    out["corpus_full"].write.mode("overwrite").parquet(args.output)
    print(f"curated corpus -> {args.output}", file=sys.stderr)
    return 0


def cmd_full_build(args) -> int:
    """The composed product (plans/full.py): curation in front of the
    KG pipeline — quality gate / dedup / decontaminate the file
    corpus, then build triples over the survivors only.
    --working_dir switches both halves to their checkpointed
    resumable runners under one working dir (curation/ + kg/)."""
    from .plans import curation as PC
    from .plans import full as PF
    from .plans import pipeline
    from .sources import iceberg

    spark = _spark(args)
    dictionary = _read_dictionary(spark, args.dictionary)
    embeddings = spark.read.parquet(args.embeddings)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    ccfg = PC.CurationConfig(
        min_quality=args.min_quality, decon_n=args.decon_n
    )
    pcfg = pipeline.PipelineConfig(
        threshold=args.threshold,
        articles_cap=-1 if args.scale else 0,
        salt_buckets=args.salt_buckets,
    )
    corpus = _read_corpus(spark, args)
    if args.working_dir:
        out = PF.run_full_checkpointed(
            spark, corpus, dictionary, embeddings, args.working_dir,
            benchmark=bench, n_buckets=args.n_buckets,
            curation_config=ccfg, pipeline_config=pcfg,
        )
    else:
        out = PF.curate_then_build(
            spark, corpus, dictionary, embeddings, benchmark=bench,
            curation_config=ccfg, pipeline_config=pcfg,
        )
    iceberg.write_triples(out["triples"], args.output, args.catalog)
    print(f"curated triples written to {args.output}", file=sys.stderr)
    return 0


def cmd_kg_query(args) -> int:
    """BGP read path over a materialized triple table
    (operators/kgquery.py::bgp_query): ``--pattern`` is a
    '.'-separated clause list, ``?name`` terms are variables; constant
    terms push down to the scan, shared variables join.  Input is
    parquet or (--input_format ntriples) an N-Triples export; output
    is parquet or (--output_format ntriples when exactly 3 variables
    are selected) N-Triples lines."""
    from pyspark.sql import functions as F

    from .operators.kgquery import bgp_query, parse_patterns, pred_stats
    from .sources.rdf import read_ntriples, write_ntriples

    spark = _spark(args)
    if args.input_format == "ntriples":
        triples = read_ntriples(spark, args.input, base=args.base)
    else:
        triples = spark.read.parquet(args.input)
    triples = triples.select(
        F.col(args.subj_col).alias("subj"),
        F.col(args.pred_col).alias("pred"),
        F.col(args.obj_col).alias("obj"),
    )
    if args.path_pred:
        from .operators.kgquery import property_path

        seeds = [s for s in args.path_seeds.split(",") if s]
        if not seeds:
            print("--path_pred needs --path_seeds", file=sys.stderr)
            return 2
        out = property_path(
            triples, args.path_pred, seeds,
            max_hops=args.max_hops, directed=not args.undirected,
        )
        out.write.mode("overwrite").parquet(args.output)
        print(f"kg-query path: {args.path_pred}+ -> {args.output}",
              file=sys.stderr)
        return 0
    if not args.pattern:
        print("kg-query needs --pattern (or --path_pred)", file=sys.stderr)
        return 2
    pats = parse_patterns(args.pattern)
    sel = [s for s in args.select.split(",") if s] if args.select else None
    counts = pred_stats(triples) if args.cost_stats else None
    out = bgp_query(
        triples, pats, select=sel, distinct=not args.keep_duplicates,
        pred_counts=counts,
    )
    if args.output_format == "ntriples":
        if len(out.columns) != 3:
            print("ntriples output needs exactly 3 selected variables",
                  file=sys.stderr)
            return 2
        s, p, o = out.columns
        write_ntriples(out, args.output, subj=s, pred=p, obj=o,
                       base=args.base)
    else:
        out.write.mode("overwrite").parquet(args.output)
    print(f"kg-query: columns={out.columns} -> {args.output}",
          file=sys.stderr)
    return 0


def cmd_export_ntriples(args) -> int:
    """Serialize a (subj, pred, obj) parquet table to N-Triples lines
    (sources/rdf.py) — the W3C interchange surface for the graph."""
    from pyspark.sql import functions as F

    from .sources.rdf import write_ntriples

    spark = _spark(args)
    df = spark.read.parquet(args.input).select(
        F.col(args.subj_col).alias("subj"),
        F.col(args.pred_col).alias("pred"),
        F.col(args.obj_col).alias("obj"),
    )
    write_ntriples(df, args.output, base=args.base,
                   obj_as_iri=not args.obj_literal)
    print(f"export-ntriples: -> {args.output}", file=sys.stderr)
    return 0


def cmd_resume_run(args) -> int:
    from .plans import runner

    spark = _spark(args)
    dictionary = _read_dictionary(spark, args.dictionary)
    embeddings = spark.read.parquet(args.embeddings)
    out = runner.run_checkpointed(
        spark,
        _read_corpus(spark, args),
        dictionary,
        embeddings,
        args.working_dir,
        n_buckets=args.n_buckets,
    )
    ok = runner.verify_lineage(
        spark, _read_corpus(spark, args), args.working_dir, args.n_buckets
    )
    print(
        f"triples: {out['triples'].count()}  lineage_ok: {ok}", file=sys.stderr
    )
    return 0 if ok else 1


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("bio-re-with-entity-embeddings-spark")
    p.add_argument("--master", default=None, help="spark master override")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, corpus=True):
        if corpus:
            sp.add_argument("--corpus", required=True,
                            help="parquet path or (with --catalog) Iceberg table")
            sp.add_argument("--catalog", default=None)
        sp.add_argument("--dictionary", required=True,
                        help="TSV of (surface, entity_id, entity_type)")

    sp = sub.add_parser("prepare-entities")
    common(sp)
    sp.add_argument("--working_dir", required=True)
    sp.add_argument("--entity_type", default=None)
    sp.set_defaults(fn=cmd_prepare_entities)

    sp = sub.add_parser("prepare-pairs")
    common(sp)
    sp.add_argument("--working_dir", required=True)
    sp.add_argument("--source_type", required=True)
    sp.add_argument("--target_type", required=True)
    sp.add_argument("--salt_buckets", type=int, default=0)
    sp.set_defaults(fn=cmd_prepare_pairs)

    sp = sub.add_parser("build-triples")
    common(sp)
    sp.add_argument("--embeddings", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--threshold", type=float, default=0.0)
    sp.add_argument("--scale", action="store_true",
                    help="scale path: evidence edges out-of-line")
    sp.add_argument("--salt_buckets", type=int, default=0)
    sp.add_argument("--canonicalize", action="store_true")
    sp.set_defaults(fn=cmd_build_triples)

    sp = sub.add_parser("train-embeddings")
    sp.add_argument("--input", required=True,
                    help="parquet of (tags array, words array)")
    sp.add_argument("--output", required=True)
    sp.add_argument("--config", default=None,
                    help="reference doc2vec-*.config JSON "
                         "(learn_embeddings.py format); flags override")
    sp.add_argument("--vector_size", type=int, default=None)
    sp.add_argument("--epochs", type=int, default=None)
    sp.add_argument("--seed", type=int, default=42)
    sp.set_defaults(fn=cmd_train_embeddings)

    sp = sub.add_parser("extract-vectors")
    sp.add_argument("--embedding_model", required=True,
                    help="parquet of (entity_id, embedding)")
    sp.add_argument("--output_dir", required=True)
    sp.add_argument("--model_name", required=True)
    sp.add_argument("--tag_col", default="entity_id")
    sp.add_argument("--vec_col", default="embedding")
    sp.set_defaults(fn=cmd_extract_vectors)

    sp = sub.add_parser("media-features")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output_dir", required=True)
    sp.set_defaults(fn=cmd_media_features)

    sp = sub.add_parser("graph-metrics")
    sp.add_argument("--input", required=True,
                    help="parquet edge/triple table (e.g. build-triples "
                         "output)")
    sp.add_argument("--output_dir", required=True)
    sp.add_argument("--src_col", default="subj")
    sp.add_argument("--dst_col", default="obj")
    sp.add_argument("--iterations", type=int, default=10)
    sp.add_argument("--damping", type=float, default=0.85)
    sp.add_argument("--tol", type=float, default=None,
                    help="optional L1 early-stop (omit for a fixed "
                         "round count)")
    sp.add_argument("--skip_triangles", action="store_true")
    sp.add_argument("--encode_ids", action="store_true",
                    help="dictionary-encode node ids to longs for the "
                         "PageRank loop (wins at ~10+ rounds on "
                         "string-keyed graphs)")
    sp.add_argument("--lpa_iterations", type=int, default=0,
                    help="> 0 also writes label-propagation communities")
    sp.add_argument("--two_hop_cap", type=int, default=0,
                    help="> 0 also writes hub-gated two-hop pairs")
    sp.add_argument("--bfs_seeds", default="",
                    help="comma-separated seed node ids: also writes "
                         "multi-source BFS hop distances")
    sp.add_argument("--bfs_max_hops", type=int, default=6)
    sp.add_argument("--sssp_seeds", default="",
                    help="comma-separated seed node ids: also writes "
                         "weighted shortest-path distances "
                         "(--sssp_weight_col, else unit weights)")
    sp.add_argument("--sssp_weight_col", default="",
                    help="edge-weight column for --sssp_seeds "
                         "(empty = 1.0 per edge)")
    sp.add_argument("--sssp_max_rounds", type=int, default=64)
    sp.add_argument("--ppr_seeds", default="",
                    help="comma-separated seed node ids: also writes "
                         "personalized PageRank (teleport uniform over "
                         "the seeds)")
    sp.add_argument("--linkpred_cap", type=int, default=0,
                    help="nonzero also writes common-neighbor/"
                         "Adamic-Adar link-prediction pairs; > 0 is "
                         "the hub mid-degree gate, -1 ungated")
    sp.add_argument("--hyperball_p", type=int, default=0,
                    help="> 0 also writes HyperBall per-node ball-size"
                         " + harmonic-centrality estimates (HLL"
                         " precision 2^p registers; reports the"
                         " effective diameter)")
    sp.add_argument("--kcore", action="store_true",
                    help="also writes per-node core numbers (k-core"
                         " decomposition, exact at convergence)")
    sp.add_argument("--ktruss", type=int, default=0,
                    help="> 0 also writes the k-truss subgraph edges"
                         " (support peeling, exact at convergence)")
    sp.set_defaults(fn=cmd_graph_metrics)

    sp = sub.add_parser("profile")
    sp.add_argument("--input", required=True,
                    help="documents parquet (doc_id, text, <group col>)")
    sp.add_argument("--output_dir", required=True)
    sp.add_argument("--group_col", default="lang")
    sp.add_argument("--text_col", default="text")
    sp.add_argument("--id_col", default="doc_id")
    sp.add_argument("--distinct_col", default=None,
                    help="optional column whose per-group distinct "
                         "cardinality is HLL-estimated into the budget")
    sp.add_argument("--quantile_k", type=int, default=1024)
    sp.add_argument("--max_group_rows", type=int, default=None,
                    help="skew hint: upper bound on the LARGEST group "
                         "(skips quota_sample's plan-time count job)")
    sp.add_argument("--min_group_rows", type=int, default=None,
                    help="scale hint: lower bound on the SMALLEST group "
                         "— enables the exact hash-threshold pre-filter "
                         "(bottomk_sample docstring)")
    sp.set_defaults(fn=cmd_profile)

    sp = sub.add_parser("curate")
    sp.add_argument("--input", required=True,
                    help="parquet of (doc_id, text, lang) documents")
    sp.add_argument("--benchmark", default=None,
                    help="parquet of held-out benchmark docs to "
                         "decontaminate against (same schema)")
    sp.add_argument("--output", required=True)
    sp.add_argument("--working_dir", default=None,
                    help="enable the checkpointed resumable runner")
    sp.add_argument("--min_quality", type=float, default=0.55)
    sp.add_argument("--decon_n", type=int, default=13)
    sp.add_argument("--quota", type=int, default=0)
    sp.add_argument("--quota_key", default="lang")
    sp.add_argument("--max_group_rows", type=int, default=None,
                    help="largest quota-group size hint (skips the "
                         "plan-time count job)")
    sp.add_argument("--n_buckets", type=int, default=32)
    sp.set_defaults(fn=cmd_curate)

    sp = sub.add_parser("full-build")
    common(sp)
    sp.add_argument("--embeddings", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--benchmark", default=None,
                    help="parquet of held-out benchmark docs "
                         "(corpus schema; decontamination reads "
                         "'content') — omit to skip decontamination")
    sp.add_argument("--threshold", type=float, default=0.0)
    sp.add_argument("--scale", action="store_true",
                    help="scale path: evidence edges out-of-line")
    sp.add_argument("--salt_buckets", type=int, default=0)
    sp.add_argument("--min_quality", type=float, default=0.55)
    sp.add_argument("--decon_n", type=int, default=13)
    sp.add_argument("--working_dir", default=None,
                    help="enable the checkpointed resumable runners")
    sp.add_argument("--n_buckets", type=int, default=32)
    sp.set_defaults(fn=cmd_full_build)

    sp = sub.add_parser("kg-query")
    sp.add_argument("--input", required=True,
                    help="triple table: parquet dir, or N-Triples text "
                         "dir with --input_format ntriples")
    sp.add_argument("--output", required=True)
    sp.add_argument("--pattern", default=None,
                    help="BGP clauses, '.'-separated: "
                         "'?d mentions ?x . ?x calls ?y' "
                         "(required unless --path_pred)")
    sp.add_argument("--select", default=None,
                    help="comma-joined variable names to project")
    sp.add_argument("--keep_duplicates", action="store_true",
                    help="skip the final DISTINCT (multiplicity "
                         "semantics)")
    sp.add_argument("--cost_stats", action="store_true",
                    help="compute the predicate histogram (one scan) "
                         "and use cost-based join ordering")
    sp.add_argument("--path_pred", default=None,
                    help="property-path mode: pred+ min-hop "
                         "reachability instead of a BGP (ignores "
                         "--pattern)")
    sp.add_argument("--path_seeds", default="",
                    help="comma-joined seed node ids for --path_pred")
    sp.add_argument("--max_hops", type=int, default=3)
    sp.add_argument("--undirected", action="store_true")
    sp.add_argument("--input_format", choices=["parquet", "ntriples"],
                    default="parquet")
    sp.add_argument("--output_format", choices=["parquet", "ntriples"],
                    default="parquet")
    sp.add_argument("--subj_col", default="subj")
    sp.add_argument("--pred_col", default="pred")
    sp.add_argument("--obj_col", default="obj")
    sp.add_argument("--base", default="urn:kg:")
    sp.set_defaults(fn=cmd_kg_query)

    sp = sub.add_parser("export-ntriples")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--subj_col", default="subj")
    sp.add_argument("--pred_col", default="pred")
    sp.add_argument("--obj_col", default="obj")
    sp.add_argument("--base", default="urn:kg:")
    sp.add_argument("--obj_literal", action="store_true",
                    help="emit objects as escaped string literals "
                         "instead of IRIs")
    sp.set_defaults(fn=cmd_export_ntriples)

    sp = sub.add_parser("resume-run")
    common(sp)
    sp.add_argument("--working_dir", required=True)
    sp.add_argument("--embeddings", required=True)
    sp.add_argument("--n_buckets", type=int, default=32)
    sp.set_defaults(fn=cmd_resume_run)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
