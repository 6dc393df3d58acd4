"""OBO ontology source (S7): parse a Disease-Ontology-style ``.obo``
file into a term dimension + derive root->term parent paths.

Reference semantics being reproduced (not code) —
``data/disease_ontology.py``:

* stanza parse (``parse_obo_file``, :151-225): per ``[Term]`` stanza
  keep id / name / alt_ids / ``MESH:`` xrefs / ``is_a`` parents /
  EXACT-empty-xref synonyms; names and synonyms lowercased; ids
  int-normalized (``clean_id`` :273-280, ``DOID:0001816 -> DOID:1816``);
  ``is_a`` trailing ``! comment`` stripped (:194-197).
* parent paths (``append_paths``/``get_parent_paths``, :227-271): for a
  term X, ``parent_paths`` is the ';'-joined set of full root->parent
  chains, each chain '>'-joined over ``id#`` components (X itself NOT
  included — ``get_paths`` :68-81 appends it). A parent missing from
  the file contributes an empty chain ('' — so X still gets a path
  rooted at itself); terms with no parents get NULL.
* lookup maps: mesh -> doids (:111-119), name/synonym -> doid
  (:45-57, :121-135).

Documented divergences from the reference's accidental behavior:
the final stanza of the file IS flushed (the reference only flushes on
seeing the next ``[Term]``), ``[Typedef]`` stanzas are excluded, only
well-formed ``"..." EXACT []`` synonym lines are kept (the reference's
string slicing lets malformed ones through mangled), and multi-valued
exports are deterministically sorted (the reference uses Python set
iteration order).

Spark shape: an ontology is dimension-sized, but the parse is still
expressed as native column operations (wholetext scan -> stanza
explode -> regexp extraction; whole-stage codegen, no Python), and the
path derivation is an iterative frontier join (O(depth) rounds, each a
broadcast-sized join), so a 10^7-term ontology works unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MINI_DOID_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "mini_doid.obo",
)


def _clean_id(c):
    """clean_id parity: strip 'DOID:', int-normalize if numeric,
    re-prefix ('DOID:0001816' -> 'DOID:1816')."""
    s = F.trim(F.regexp_replace(c, "^DOID:", ""))
    num = F.regexp_extract(s, r"^0*(\d+)$", 1)
    return F.concat(F.lit("DOID:"), F.when(num != "", num).otherwise(s))


def parse_obo(spark: SparkSession, path: str = MINI_DOID_PATH) -> DataFrame:
    """.obo file -> one row per [Term] stanza:
    (doid, name, alt_ids array, parent_ids array, mesh_terms array,
    synonyms array) — arrays sorted, ids normalized."""
    raw = spark.read.text(path, wholetext=True)
    stanzas = raw.select(
        F.explode(F.split("value", r"(?=\[(?:Term|Typedef)\])")).alias("st")
    ).where(F.col("st").startswith("[Term]"))

    def _all(pattern: str):
        return F.regexp_extract_all(F.col("st"), F.lit(pattern), F.lit(1))

    terms = stanzas.select(
        _clean_id(F.regexp_extract("st", r"(?m)^id: (.*)$", 1)).alias("doid"),
        F.lower(F.trim(F.regexp_extract("st", r"(?m)^name: ?(.*)$", 1))).alias("name"),
        F.array_sort(
            F.transform(_all(r"(?m)^alt_id: (.*)$"), _clean_id)
        ).alias("alt_ids"),
        F.array_sort(
            F.transform(
                _all(r"(?m)^is_a: (DOID:[^!\r\n]*)"),
                lambda x: _clean_id(F.trim(x)),
            )
        ).alias("parent_ids"),
        F.array_sort(_all(r"(?m)^xref: (MESH:\S+)")).alias("mesh_terms"),
        F.array_sort(
            F.transform(
                _all(r'(?m)^synonym: "([^"]*)" EXACT \[\][ \t\r]*$'), F.lower
            )
        ).alias("synonyms"),
    )
    return terms.where(F.col("doid") != "DOID:")


def with_parent_paths(terms: DataFrame, max_depth: int = 32) -> DataFrame:
    """+ ``parent_paths``: ';'-joined sorted root->parent chains
    ('A#>B#' components), NULL for parentless terms, '' contributions
    for parents absent from the table (reference :256-271 semantics).

    Iterative frontier propagation: round k emits every chain of length
    k+1; each round is a (dimension x frontier) join + anti-join, with
    localCheckpoint lineage truncation — O(longest root path) rounds,
    no recursion, no driver loop over rows."""
    t = terms.select("doid", "parent_ids")
    edges = t.select(
        F.col("doid").alias("child"), F.explode("parent_ids").alias("parent")
    )
    ids = t.select("doid")
    e_in = edges.join(
        ids.withColumnRenamed("doid", "parent"), "parent", "left_semi"
    )
    # chains(X) seeds: parentless terms, and terms whose parent is
    # missing from the file (both yield the chain 'X#').
    missing_children = edges.join(
        ids.withColumnRenamed("doid", "parent"), "parent", "left_anti"
    ).select("child")
    seeds = (
        t.where(F.size("parent_ids") == 0)
        .select("doid")
        .unionByName(missing_children.withColumnRenamed("child", "doid"))
        .distinct()
        .select("doid", F.concat("doid", F.lit("#")).alias("chain"))
    )
    chains = seeds.localCheckpoint(eager=True)
    frontier = chains
    exhausted = False
    for _ in range(max_depth):
        new = (
            e_in.join(
                frontier.withColumnRenamed("doid", "parent").withColumnRenamed(
                    "chain", "pchain"
                ),
                "parent",
            )
            .select(
                F.col("child").alias("doid"),
                F.concat("pchain", F.lit(">"), "child", F.lit("#")).alias("chain"),
            )
            .join(chains, ["doid", "chain"], "left_anti")
            .distinct()
            .localCheckpoint(eager=True)
        )
        if new.limit(1).count() == 0:
            exhausted = True
            break
        chains = chains.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    if not exhausted:
        # The frontier was still growing at max_depth: either an is_a
        # CYCLE reachable from a root (every chain through it extends
        # forever) or a hierarchy deeper than max_depth. Both would
        # silently TRUNCATE parent paths — fail loudly instead (the
        # count is one limit(1) probe, already the loop's own
        # convergence check).
        raise ValueError(
            f"parent-path propagation did not converge within max_depth="
            f"{max_depth}: is_a cycle or deeper hierarchy — raise "
            "max_depth for deep ontologies; cycles must be fixed upstream"
        )
    # Converged — but a DETACHED cycle never enters the frontier at all:
    # its members are in-table parents that received no chain. Without
    # this probe their children would get silent ''-contributions (the
    # 'parent missing from file' semantics, which they are NOT).
    unreachable = e_in.select("parent").distinct().join(
        chains.withColumnRenamed("doid", "parent"), "parent", "left_anti"
    )
    if unreachable.limit(1).count() > 0:
        raise ValueError(
            "is_a cycle: in-table parent term(s) unreachable from any "
            "root (e.g. "
            + unreachable.limit(3).toPandas()["parent"].str.cat(sep=", ")
            + ") — cycles must be fixed upstream"
        )

    # parent_paths(X) = chains of each parent; missing parents -> ''.
    contrib = edges.join(
        chains.withColumnRenamed("doid", "parent").withColumnRenamed(
            "chain", "pchain"
        ),
        "parent",
        "left",
    ).select("child", F.coalesce("pchain", F.lit("")).alias("pchain"))
    pp = contrib.groupBy("child").agg(
        F.concat_ws(";", F.array_sort(F.collect_list("pchain"))).alias(
            "parent_paths"
        )
    )
    return terms.join(
        pp.withColumnRenamed("child", "doid"), "doid", "left"
    )  # parentless terms: parent_paths stays NULL


def term_paths(terms_with_paths: DataFrame) -> DataFrame:
    """get_paths parity (:68-81): (doid, path) rows, each path a full
    root->term chain 'A#>...>doid#'; parentless terms yield none."""
    return (
        terms_with_paths.where(F.col("parent_paths").isNotNull())
        .select(
            "doid",
            F.explode(F.split("parent_paths", ";", -1)).alias("pchain"),
        )
        .select(
            "doid",
            F.when(
                F.col("pchain") == "", F.concat("doid", F.lit("#"))
            )
            .otherwise(F.concat("pchain", F.lit(">"), "doid", F.lit("#")))
            .alias("path"),
        )
        .distinct()
    )


def path_prefixes(
    terms_with_paths: DataFrame, only_true_prefixes: bool = False
) -> DataFrame:
    """get_path_prefixes parity (:83-109): (doid, prefix) rows — every
    leading '>'-join of each parent chain's components, plus (unless
    ``only_true_prefixes``) the full chain extended with the term
    itself; parentless terms yield 'doid#'."""
    with_pp = terms_with_paths.where(F.col("parent_paths").isNotNull())
    chains = with_pp.select(
        "doid", F.explode(F.split("parent_paths", ";", -1)).alias("pchain")
    )
    comps = chains.select(
        "doid", "pchain", F.split("pchain", ">", -1).alias("cs")
    )
    lead = comps.where(F.col("pchain") != "").select(
        "doid",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("cs")),
                lambda n: F.concat_ws(">", F.slice("cs", 1, n)),
            )
        ).alias("prefix"),
    )
    parts = [lead]
    if not only_true_prefixes:
        parts.append(
            comps.select(
                "doid",
                F.when(
                    F.col("pchain") == "", F.concat("doid", F.lit("#"))
                )
                .otherwise(F.concat("pchain", F.lit(">"), "doid", F.lit("#")))
                .alias("prefix"),
            )
        )
    parts.append(
        terms_with_paths.where(F.col("parent_paths").isNull()).select(
            "doid", F.concat("doid", F.lit("#")).alias("prefix")
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def mesh_to_doid(terms: DataFrame) -> DataFrame:
    """(mesh, doid) lookup dimension (:111-119): one row per xref."""
    return (
        terms.select("doid", F.explode("mesh_terms").alias("mesh"))
        .select("mesh", "doid")
        .distinct()
    )


def surface_to_doid(terms: DataFrame) -> DataFrame:
    """(surface, doid) from names + EXACT synonyms (:45-57, :121-135).
    Duplicate surfaces keep the smallest doid (deterministic stand-in
    for the reference's first-encountered-wins dict insert)."""
    names = terms.select(F.col("name").alias("surface"), "doid")
    syns = terms.select(F.explode("synonyms").alias("surface"), "doid")
    return (
        names.unionByName(syns)
        .where(F.col("surface") != "")
        .groupBy("surface")
        .agg(F.min("doid").alias("doid"))
    )


def reference_tsv_frame(terms_with_paths: DataFrame) -> DataFrame:
    """The reference's ontology_tsv row encoding (prepare_ontology
    :143-149 output): '#'-suffixed ';'-joined alt ids, ';'-joined
    parents/mesh/synonyms, parent_paths verbatim."""

    def _join(col, suffix: str = ""):
        arr = F.transform(F.col(col), lambda x: F.concat(x, F.lit(suffix)))
        return F.when(F.size(col) > 0, F.array_join(arr, ";"))

    return terms_with_paths.select(
        F.col("doid").alias("id"),
        "doid",
        "name",
        _join("alt_ids", "#").alias("alternative_ids"),
        _join("parent_ids").alias("parent_ids"),
        _join("mesh_terms").alias("mesh_terms"),
        F.array_join("synonyms", ";").alias("synonyms"),
        "parent_paths",
    )
