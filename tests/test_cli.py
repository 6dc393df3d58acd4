"""spark-submit CLI surface: every reference entry point has a
runnable subcommand producing the reference's export formats."""

from __future__ import annotations

import numpy as np
import pytest

from bio_re_with_entity_embeddings_spark import cli, fixtures, schemas

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    dictionary = fixtures.make_dictionary()
    corpus_path = str(base / "corpus")
    spark.createDataFrame(
        fixtures.make_corpus_rows(120, dictionary), schemas.CORPUS
    ).write.parquet(corpus_path)
    dict_path = str(base / "dict")
    fixtures.dictionary_df(spark, dictionary).write.csv(
        dict_path, sep="\t", header=True
    )
    return base, corpus_path, dict_path


def test_cli_prepare_entities(spark, world):
    base, corpus, dct = world
    rc = cli.main([
        "prepare-entities", "--corpus", corpus, "--dictionary", dct,
        "--working_dir", str(base / "ents"),
    ])
    assert rc == 0
    d2e = spark.read.csv(str(base / "ents" / "doc2entity"), sep="\t", header=True)
    assert d2e.count() > 0 and "entity_ids_str" in d2e.columns


def test_cli_prepare_pairs(spark, world):
    base, corpus, dct = world
    rc = cli.main([
        "prepare-pairs", "--corpus", corpus, "--dictionary", dct,
        "--working_dir", str(base / "pairs"),
        "--source_type", fixtures.FN, "--target_type", fixtures.PKG,
    ])
    assert rc == 0
    inst = spark.read.csv(
        str(base / "pairs" / "pair_instances"), sep="\t", header=True
    )
    assert inst.count() > 0
    assert set(inst.columns) == {"source_id", "target_id", "articles_str"}


def test_cli_build_triples_and_read_back(spark, world):
    from bio_re_with_entity_embeddings_spark.sources import iceberg

    base, corpus, dct = world
    out = str(base / "graph")
    rc = cli.main([
        "build-triples", "--corpus", corpus, "--dictionary", dct,
        "--embeddings", f"{SF_DIR}/embeddings.parquet",
        "--output", out, "--scale", "--threshold", "-2.0",
    ])
    assert rc == 0
    back = iceberg.read_triples(spark, out)
    assert back.count() > 0
    assert {"subj", "pred", "obj", "score", "n_docs"} <= set(back.columns)


def test_cli_full_build(spark, world):
    """The composed curation->KG verb (plans/full.py): curate the file
    corpus (no benchmark -> decon skipped; min_quality 0 keeps the
    synthetic corpus), build triples over survivors, write the graph."""
    from bio_re_with_entity_embeddings_spark.sources import iceberg

    base, corpus, dct = world
    out = str(base / "graph_full")
    rc = cli.main([
        "full-build", "--corpus", corpus, "--dictionary", dct,
        "--embeddings", f"{SF_DIR}/embeddings.parquet",
        "--output", out, "--threshold", "-2.0", "--min_quality", "0.0",
    ])
    assert rc == 0
    back = iceberg.read_triples(spark, out)
    assert back.count() > 0
    assert {"subj", "pred", "obj", "score", "n_docs"} <= set(back.columns)


def test_cli_train_and_extract(spark, world, tmp_path):
    base, corpus, dct = world
    rng = np.random.RandomState(1)
    tagged = spark.createDataFrame(
        [(["T%d" % (i % 4)], [str(w) for w in rng.choice(list("abcdefgh"), 8)])
         for i in range(24)],
        "tags array<string>, words array<string>",
    )
    tagged_path = str(tmp_path / "tagged")
    tagged.write.parquet(tagged_path)
    emb_path = str(tmp_path / "emb")
    rc = cli.main([
        "train-embeddings", "--input", tagged_path, "--output", emb_path,
        "--vector_size", "8", "--epochs", "2",
    ])
    assert rc == 0
    rc = cli.main([
        "extract-vectors", "--embedding_model", emb_path,
        "--output_dir", str(tmp_path), "--model_name", "m1",
    ])
    assert rc == 0
    raw = open(str(tmp_path / "m1.bin"), "rb").read()
    assert raw.startswith(b"4 8\n")


def test_cli_resume_run(spark, world):
    base, corpus, dct = world
    rc = cli.main([
        "resume-run", "--corpus", corpus, "--dictionary", dct,
        "--working_dir", str(base / "ckpt"),
        "--embeddings", f"{SF_DIR}/embeddings.parquet",
        "--n_buckets", "4",
    ])
    assert rc == 0  # lineage verified inside


def test_cli_train_embeddings_config_file(spark, tmp_path):
    """Reference JSON config parity (learn_embeddings.py:97-101 +
    resources/configurations/doc2vec-*.config): iterations ->
    epochs, doc2vec_config.{vector_size,min_count,learning_rate,
    workers} -> trainer kwargs; dm!=0 rejected; flags override."""
    import json

    from bio_re_with_entity_embeddings_spark.ml import doc2vec

    cfg = {
        "iterations": 3,
        "adapt_learning_rate": True,
        "learning_rate_decay": 0.001,
        "doc2vec_config": {
            "workers": 4,
            "min_count": 1,
            "window_size": 10,
            "learning_rate": 0.02,
            "vector_size": 8,
            "dbow_words": 1,
            "dm": 0,
        },
    }
    cfg_path = str(tmp_path / "doc2vec-0008.config")
    json.dump(cfg, open(cfg_path, "w"))
    kw = doc2vec.load_train_config(cfg_path)
    assert kw == {
        "epochs": 3,
        "alpha": 0.02,
        "min_alpha": 0.02 - 0.001 * 2,
        "vector_size": 8,
        "min_count": 1,
        "n_shards": 4,
    }
    with pytest.raises(ValueError, match="PV-DM"):
        bad = dict(cfg, doc2vec_config=dict(cfg["doc2vec_config"], dm=1))
        bad_path = str(tmp_path / "bad.config")
        json.dump(bad, open(bad_path, "w"))
        doc2vec.load_train_config(bad_path)

    tagged = spark.createDataFrame(
        [(["T1"], ["alpha", "amber"]), (["T2"], ["bolt", "brick"])] * 6,
        "tags array<string>, words array<string>",
    )
    tagged_path = str(tmp_path / "tagged2")
    tagged.write.parquet(tagged_path)
    emb_path = str(tmp_path / "emb2")
    rc = cli.main([
        "train-embeddings", "--input", tagged_path, "--output", emb_path,
        "--config", cfg_path,
    ])
    assert rc == 0
    out = spark.read.parquet(emb_path)
    assert out.count() == 2
    assert len(out.first()["embedding"]) == 8  # vector_size from config


def test_cli_media_features(spark, world, tmp_path_factory):
    """media-features writes the three per-modality feature tables
    from one mixed media table whose payloads span every real decoder
    (JPEG image, FLAC audio, MP4 video)."""
    from bio_re_with_entity_embeddings_spark.operators import multimodal as MM

    base = tmp_path_factory.mktemp("media")
    docs = spark.read.parquet(SF_DIR + "/documents.parquet").limit(18)
    media = (
        MM.synth_media_jpeg(docs.limit(6))
        .unionByName(MM.synth_media_flac(docs.offset(6).limit(6)))
        .unionByName(MM.synth_media_mp4(docs.offset(12).limit(6)))
    )
    media_path = str(base / "media")
    media.write.parquet(media_path)
    rc = cli.main([
        "media-features", "--input", media_path,
        "--output_dir", str(base / "features"),
    ])
    assert rc == 0
    img = spark.read.parquet(str(base / "features" / "image_features"))
    aud = spark.read.parquet(str(base / "features" / "audio_features"))
    vid = spark.read.parquet(str(base / "features" / "video_meta"))
    assert img.count() == 6 and (img.toPandas()["format"] == "jpeg").all()
    assert aud.count() == 6 and (aud.toPandas()["sample_rate"] == 8000).all()
    assert vid.count() == 6 and (vid.toPandas()["kind"] == "vide").all()


def test_cli_graph_metrics(spark, tmp_path_factory):
    """graph-metrics verb: the consumer pass over a materialized
    edge/triple table — degrees, PageRank, triangles and the gated
    two-hop land as separate feature tables with exact values."""
    base = tmp_path_factory.mktemp("gm")
    edges_path = str(base / "edges")
    # K3 {a,b,c} + pendant d: hand-verifiable on every output
    spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "subj string, obj string",
    ).write.parquet(edges_path)
    out = str(base / "metrics")
    rc = cli.main([
        "graph-metrics", "--input", edges_path, "--output_dir", out,
        "--iterations", "4", "--two_hop_cap", "64",
        "--lpa_iterations", "2",
    ])
    assert rc == 0
    deg = {
        r["node"]: r["degree"]
        for r in spark.read.parquet(f"{out}/degrees").collect()
    }
    assert deg == {"a": 2, "b": 2, "c": 3, "d": 1}
    pr = spark.read.parquet(f"{out}/pagerank")
    assert pr.count() == 4
    assert abs(sum(r["rank"] for r in pr.collect()) - 1.0) < 1e-12
    tri = {
        r["node"]: r["n_triangles"]
        for r in spark.read.parquet(f"{out}/triangles").collect()
    }
    assert tri == {"a": 1, "b": 1, "c": 1, "d": 0}
    hops = {
        (r["src"], r["dst"])
        for r in spark.read.parquet(f"{out}/two_hop").collect()
    }
    # directed 2-paths: a->b->c, b->c->{a,d}, c->a->b
    assert hops == {("a", "c"), ("b", "a"), ("b", "d"), ("c", "b")}
    comm = spark.read.parquet(f"{out}/communities")
    assert comm.count() == 4 and set(comm.columns) == {"node", "label"}


def test_cli_graph_metrics_bfs(spark, tmp_path_factory):
    """--bfs_seeds adds multi-source min-hop distances: hand-checked
    on a path graph a-b-c-d seeded at a."""
    base = tmp_path_factory.mktemp("gmb")
    edges_path = str(base / "edges")
    spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "subj string, obj string"
    ).write.parquet(edges_path)
    out = str(base / "metrics")
    rc = cli.main([
        "graph-metrics", "--input", edges_path, "--output_dir", out,
        "--iterations", "2", "--skip_triangles",
        "--bfs_seeds", "a", "--bfs_max_hops", "6",
    ])
    assert rc == 0
    hops = {
        r["node"]: r["hop"]
        for r in spark.read.parquet(f"{out}/bfs_hops").collect()
    }
    assert hops == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_cli_graph_metrics_sssp(spark, tmp_path_factory):
    """--sssp_seeds writes weighted shortest-path distances: the cheap
    two-edge detour beats the heavy direct edge."""
    base = tmp_path_factory.mktemp("gms")
    edges_path = str(base / "edges")
    spark.createDataFrame(
        [("a", "b", 10.0), ("a", "c", 1.0), ("c", "b", 1.0)],
        "subj string, obj string, cost double",
    ).write.parquet(edges_path)
    out = str(base / "metrics")
    rc = cli.main([
        "graph-metrics", "--input", edges_path, "--output_dir", out,
        "--iterations", "2", "--skip_triangles",
        "--sssp_seeds", "a", "--sssp_weight_col", "cost",
    ])
    assert rc == 0
    dist = {
        r["node"]: r["dist"]
        for r in spark.read.parquet(f"{out}/sssp").collect()
    }
    assert dist == {"a": 0.0, "b": 2.0, "c": 1.0}


def test_cli_graph_metrics_ppr(spark, tmp_path_factory):
    """--ppr_seeds writes personalized PageRank: mass conserved and
    the seed outranks the far end of the path."""
    base = tmp_path_factory.mktemp("gmp")
    edges_path = str(base / "edges")
    spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")],
        "subj string, obj string",
    ).write.parquet(edges_path)
    out = str(base / "metrics")
    rc = cli.main([
        "graph-metrics", "--input", edges_path, "--output_dir", out,
        "--iterations", "4", "--skip_triangles", "--ppr_seeds", "a",
    ])
    assert rc == 0
    ppr = {
        r["node"]: r["rank"]
        for r in spark.read.parquet(f"{out}/ppr").collect()
    }
    assert abs(sum(ppr.values()) - 1.0) < 1e-12
    assert ppr["a"] > ppr["c"]


def test_cli_graph_metrics_hyperball(spark, tmp_path_factory):
    """--hyperball_p writes per-node ball/harmonic estimates: on the
    path graph every node's converged ball is the whole component and
    the middle nodes dominate the ends in harmonic centrality."""
    base = tmp_path_factory.mktemp("gmh")
    edges_path = str(base / "edges")
    spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "subj string, obj string"
    ).write.parquet(edges_path)
    out = str(base / "metrics")
    rc = cli.main([
        "graph-metrics", "--input", edges_path, "--output_dir", out,
        "--iterations", "2", "--skip_triangles", "--hyperball_p", "8",
    ])
    assert rc == 0
    hb = {
        r["node"]: (r["ball_est"], r["harmonic"])
        for r in spark.read.parquet(f"{out}/hyperball").collect()
    }
    assert set(hb) == {"a", "b", "c", "d"}
    for b, _ in hb.values():
        assert abs(b - 4.0) < 0.5
    assert hb["b"][1] > hb["a"][1] and hb["c"][1] > hb["d"][1]


def test_cli_graph_metrics_linkpred(spark, tmp_path_factory):
    """--linkpred_cap writes link-prediction pairs: the 4-cycle's two
    diagonals, each with two shared degree-2 neighbors."""
    import math
    base = tmp_path_factory.mktemp("gml")
    edges_path = str(base / "edges")
    spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "subj string, obj string",
    ).write.parquet(edges_path)
    out = str(base / "metrics")
    rc = cli.main([
        "graph-metrics", "--input", edges_path, "--output_dir", out,
        "--iterations", "2", "--skip_triangles", "--linkpred_cap", "-1",
    ])
    assert rc == 0
    lp = {
        (r["src"], r["dst"]): (r["common_neighbors"], r["adamic_adar"])
        for r in spark.read.parquet(f"{out}/link_prediction").collect()
    }
    assert set(lp) == {("a", "c"), ("b", "d")}
    for cn, aa in lp.values():
        assert cn == 2 and abs(aa - 2.0 / math.log(2.0)) < 1e-12


def test_cli_profile(spark, tmp_path_factory):
    """profile verb: per-group budget (+ optional HLL distinct) and
    rank-picked length quantiles land as two tables; quantile values
    are EXACT text lengths from the input."""
    base = tmp_path_factory.mktemp("prof")
    docs_path = str(base / "docs")
    rows = [
        (f"d{i}", "l%d" % (i % 2), "x" * (10 + i), f"dom{i % 5}")
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "doc_id string, lang string, text string, domain string"
    ).write.parquet(docs_path)
    out = str(base / "profile")
    rc = cli.main([
        "profile", "--input", docs_path, "--output_dir", out,
        "--distinct_col", "domain", "--quantile_k", "64",
    ])
    assert rc == 0
    budget = {r["grp"]: r for r in spark.read.parquet(f"{out}/budget").collect()}
    assert set(budget) == {"l0", "l1"}
    assert budget["l0"]["n_docs"] == 20
    # 5 domains split 3/2 across the two langs by i%2 vs i%5 parity
    for g in ("l0", "l1"):
        assert budget[g]["n_distinct_est"] > 0
    q = spark.read.parquet(f"{out}/length_quantiles")
    lens = {len(r[2]) for r in rows}
    got = q.collect()
    assert len(got) == 8  # 2 groups x 4 quantiles
    assert all(r["quantile"] in lens for r in got)  # exact picked values


def test_cli_graph_metrics_kcore(spark, tmp_path_factory):
    """--kcore writes exact core numbers: K4 nucleus stays core 3, the
    pendant tail peels to 1."""
    import itertools
    base = tmp_path_factory.mktemp("gmk")
    edges_path = str(base / "edges")
    k4 = [(u, v) for u, v in itertools.combinations("abcd", 2)]
    spark.createDataFrame(
        k4 + [("d", "t")], "subj string, obj string"
    ).write.parquet(edges_path)
    out = str(base / "metrics")
    rc = cli.main([
        "graph-metrics", "--input", edges_path, "--output_dir", out,
        "--iterations", "2", "--skip_triangles", "--kcore",
    ])
    assert rc == 0
    cores = {
        r["node"]: r["core"]
        for r in spark.read.parquet(f"{out}/core_numbers").collect()
    }
    assert cores == {"a": 3, "b": 3, "c": 3, "d": 3, "t": 1}


def test_cli_graph_metrics_ktruss(spark, tmp_path_factory):
    """--ktruss writes the k-truss subgraph: K4 nucleus survives the
    4-truss (every clique edge closes 2 triangles), the pendant edge
    peels away."""
    import itertools
    base = tmp_path_factory.mktemp("gmt")
    edges_path = str(base / "edges")
    k4 = [(u, v) for u, v in itertools.combinations("abcd", 2)]
    spark.createDataFrame(
        k4 + [("d", "t")], "subj string, obj string"
    ).write.parquet(edges_path)
    out = str(base / "metrics")
    rc = cli.main([
        "graph-metrics", "--input", edges_path, "--output_dir", out,
        "--iterations", "2", "--skip_triangles", "--ktruss", "4",
    ])
    assert rc == 0
    kept = {
        (r["src"], r["dst"])
        for r in spark.read.parquet(f"{out}/ktruss").collect()
    }
    assert kept == set(k4)


def test_cli_kg_query_and_ntriples(spark, tmp_path_factory):
    """kg-query verb: BGP over a parquet triple table, then the same
    graph exported to N-Triples and queried straight off the .nt text
    (read path parses lines, malformed-guarded)."""
    base = tmp_path_factory.mktemp("kgq")
    triples = str(base / "triples")
    spark.createDataFrame(
        [
            ("D:1", "mentions", "A"),
            ("D:1", "mentions", "B"),
            ("A", "calls", "B"),
            ("B", "instance_of", "obj"),
        ],
        "subj string, pred string, obj string",
    ).write.parquet(triples)
    out = str(base / "res")
    rc = cli.main([
        "kg-query", "--input", triples, "--output", out,
        "--pattern", "?d mentions ?x . ?x calls ?y", "--select", "d,y",
    ])
    assert rc == 0
    assert [(r.d, r.y) for r in spark.read.parquet(out).collect()] == [
        ("D:1", "B")
    ]

    nt = str(base / "nt")
    assert cli.main(["export-ntriples", "--input", triples,
                     "--output", nt]) == 0
    out2 = str(base / "res2")
    rc = cli.main([
        "kg-query", "--input", nt, "--input_format", "ntriples",
        "--output", out2, "--pattern", "?s ?p ?o",
        "--output_format", "ntriples",
    ])
    assert rc == 0
    assert spark.read.text(out2).count() == 4

    # ntriples output demands exactly 3 selected variables
    rc = cli.main([
        "kg-query", "--input", triples, "--output", str(base / "bad"),
        "--pattern", "?d mentions ?x", "--output_format", "ntriples",
    ])
    assert rc == 2


def test_cli_kg_query_cost_stats(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("kgqc")
    triples = str(base / "t")
    spark.createDataFrame(
        [("A", "calls", "B"), ("B", "calls", "C"), ("B", "instance_of", "x")],
        "subj string, pred string, obj string",
    ).write.parquet(triples)
    out = str(base / "o")
    rc = cli.main([
        "kg-query", "--input", triples, "--output", out, "--cost_stats",
        "--pattern", "?a calls ?b . ?b instance_of ?t",
    ])
    assert rc == 0
    assert [(r.a, r.b, r.t) for r in spark.read.parquet(out).collect()] == [
        ("A", "B", "x")
    ]


def test_cli_kg_query_property_path(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("kgpp")
    triples = str(base / "t")
    spark.createDataFrame(
        [("A", "calls", "B"), ("B", "calls", "C"), ("C", "uses", "D")],
        "subj string, pred string, obj string",
    ).write.parquet(triples)
    out = str(base / "o")
    rc = cli.main([
        "kg-query", "--input", triples, "--output", out,
        "--path_pred", "calls", "--path_seeds", "A", "--max_hops", "4",
    ])
    assert rc == 0
    got = {r.node: r.hop for r in spark.read.parquet(out).collect()}
    assert got == {"A": 0, "B": 1, "C": 2}
    # missing seeds and missing pattern both fail loudly
    assert cli.main(["kg-query", "--input", triples, "--output", out,
                     "--path_pred", "calls"]) == 2
    assert cli.main(["kg-query", "--input", triples,
                     "--output", out]) == 2
