"""Deterministic synthetic fixtures (seed-fixed, no external data).

Analog of the reference's input universe:

* ``make_dictionary()``  — the concept vocabulary + normalization maps
  (PubTator concepts; ``resources/mappings/drug_mapping.tsv``; DOID
  xrefs ``data/disease_ontology.py:111-119``): surfaces -> typed entity
  ids, including synonyms (multi-surface entities), an ambiguous
  surface mapping to two ids (the MeSH->DrugBank 1->n explode,
  ``data/pubtator.py:183-187``), and an ultra-frequent hub entity
  (skew-join test, SURVEY.md section 4.2).
* ``make_corpus_rows()`` — the document corpus (PubTator offset file,
  ``data/pubtator.py:336-355``) re-imagined as source files
  ``(repo, path, commit, lang, content)`` with mentions planted at
  known offsets, plus the edge cases the reference's span predicate
  guards (``data/pubtator.py:74-84``): case-variant mentions, tabs near
  mentions, word-boundary decoys, zero-mention files, hub files.
* ``distributed_corpus_df()`` — the same *shape* generated entirely
  with native Spark expressions from ``spark.range`` (no driver-side
  materialization), used for bench-scale input. At 100 TB the corpus
  is an Iceberg table; this generator stands in for the scan.

Everything is reproducible from integer seeds; no wall clock, no
global RNG state.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas

SEED = 42

# Entity types: packages and functions (analog of the reference's typed
# entity universe, e.g. mutation/disease in prepare_pair_dataset.py).
PKG = "pkg"
FN = "fn"

# Directed relation predicate per (source_type, target_type) — the
# reference's pair datasets are directed by type role
# (prepare_pair_dataset.py:37-39: source type first).
RELATION_PREDICATES = {
    (PKG, FN): "provides",
    (FN, PKG): "uses",
    (FN, FN): "calls",
}
DEFAULT_RELATION = (FN, PKG)

_PKG_STEMS = [
    "core", "net", "io", "json", "http", "crypto", "math", "log",
    "db", "cache", "auth", "rpc", "fs", "cli", "cfg", "time",
    "rand", "zip", "xml", "csv",
]
_FN_VERBS = ["parse", "read", "write", "open", "close", "merge", "split",
             "encode", "decode", "flush", "init", "scan", "emit", "bind"]
_FN_NOUNS = ["frame", "block", "chunk", "header", "stream", "token",
             "record", "index", "buffer", "socket", "page", "node"]

# Filler tokens never collide with dictionary surfaces (checked in tests).
_FILLERS = [
    "def", "return", "self", "for", "while", "if", "else", "class",
    "import", "from", "val", "var", "let", "func", "x", "y", "z",
    "tmp0", "tmp1", "arg0", "arg1", "res", "out", "err", "ok",
] + [f"w{i:03d}" for i in range(40)]


@dataclass(frozen=True)
class DictEntry:
    surface: str
    entity_id: str
    entity_type: str


def make_dictionary(n_pkg: int = 40, n_fn: int = 120) -> list[DictEntry]:
    """Seeded surface->entity dictionary with synonyms / ambiguity / hub."""
    rng = random.Random(SEED)
    entries: list[DictEntry] = []
    for i in range(n_pkg):
        eid = f"PKG:{i:04d}"
        stem = _PKG_STEMS[i % len(_PKG_STEMS)]
        entries.append(DictEntry(f"lib{stem}{i:02d}", eid, PKG))
        if i % 5 == 0:  # synonym surface
            entries.append(DictEntry(f"{stem}kit{i:02d}", eid, PKG))
    for i in range(n_fn):
        eid = f"FN:{i:04d}"
        verb = _FN_VERBS[i % len(_FN_VERBS)]
        noun = _FN_NOUNS[(i // len(_FN_VERBS)) % len(_FN_NOUNS)]
        entries.append(DictEntry(f"{verb}_{noun}{i:02d}", eid, FN))
        if i % 7 == 0:  # camelCase synonym
            entries.append(
                DictEntry(f"{verb}{noun.capitalize()}{i:02d}", eid, FN)
            )
    # Ambiguous surface: one literal linking to two entity ids
    # (MeSH id exploding to multiple DrugBank ids, data/pubtator.py:183-187).
    entries.append(DictEntry("initcompat", "FN:0000", FN))
    entries.append(DictEntry("initcompat", "FN:0001", FN))
    # Hub entity: extremely frequent surface (stdlib-import analog).
    entries.append(DictEntry("stdhub", "PKG:0000", PKG))
    rng.shuffle(entries)  # order must not matter anywhere downstream
    return entries


def vec_index(entity_id: str, n_vecs: int) -> int:
    """Deterministic entity -> embedding-row mapping (FIXTURES.md section 3)."""
    suffix = int(entity_id.rsplit(":", 1)[1])
    base = 17 if entity_id.startswith("PKG:") else 293
    return (base + 13 * suffix) % n_vecs


def entities_df(spark: SparkSession, dictionary: list[DictEntry], n_vecs: int) -> DataFrame:
    """Distinct (entity_id, entity_type, vec_id) dimension — broadcast-sized."""
    seen: dict[str, tuple[str, str, int]] = {}
    for e in dictionary:
        seen[e.entity_id] = (e.entity_id, e.entity_type, vec_index(e.entity_id, n_vecs))
    rows = sorted(seen.values())
    return spark.createDataFrame(
        rows, "entity_id string, entity_type string, vec_id long"
    )


def dictionary_df(spark: SparkSession, dictionary: list[DictEntry]) -> DataFrame:
    rows = [(e.surface, e.entity_id, e.entity_type) for e in dictionary]
    return spark.createDataFrame(rows, schemas.ENTITY_DICT)


def n_files_for_sf(sf: float) -> int:
    return max(50, int(round(sf * 500_000)))


def sf_from_dir(sf_dir: str) -> float:
    """Parse '.../sf0.01' -> 0.01; fall back to 0.01."""
    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    if name.startswith("sf"):
        try:
            return float(name[2:])
        except ValueError:
            pass
    return 0.01


def make_corpus_rows(
    n_files: int, dictionary: list[DictEntry], seed: int = SEED
) -> list[tuple[str, str, str, str, str]]:
    """Plant-controlled corpus rows (driver-side; small scales only)."""
    surfaces = sorted({e.surface for e in dictionary})
    langs = ["python", "java", "go"]
    rows = []
    for i in range(n_files):
        rng = random.Random((seed << 20) ^ i)
        repo_idx = i // 10
        repo = f"org{repo_idx % 17:03d}/repo-{repo_idx:05d}"
        path = f"src/mod_{i:06d}.py"
        commit = hashlib.sha1(f"commit-{seed}-{i}".encode()).hexdigest()
        lang = langs[i % len(langs)]

        tokens: list[str] = []
        n_tok = rng.randint(20, 80)
        for _ in range(n_tok):
            tokens.append(rng.choice(_FILLERS))
        is_hub_file = i % 97 == 0
        n_mentions = 0 if i % 10 == 9 else rng.randint(1, 5)
        if is_hub_file:
            n_mentions += 25  # skew: one doc, many entities of both types
        for _ in range(n_mentions):
            s = rng.choice(surfaces)
            if rng.random() < 0.15:
                s = s.upper()  # case-variant (matching is case-insensitive)
            pos = rng.randint(0, len(tokens))
            tokens.insert(pos, s)
        if rng.random() < 0.3:  # hub entity in ~30% of docs
            tokens.insert(rng.randint(0, len(tokens)), "stdhub")
        if rng.random() < 0.2:  # word-boundary decoy: must NOT match
            tokens.insert(
                rng.randint(0, len(tokens)), rng.choice(surfaces) + "_ext"
            )
        if rng.random() < 0.2:
            tokens.insert(rng.randint(0, len(tokens)), "pre" + rng.choice(surfaces))
        seps = [" ", " ", " ", "\n", "\t"]
        content = ""
        for t in tokens:
            content += t + rng.choice(seps)
        rows.append((repo, path, commit, lang, content.rstrip()))
    return rows


def corpus_df(spark: SparkSession, sf: float, dictionary: list[DictEntry] | None = None) -> DataFrame:
    dictionary = dictionary or make_dictionary()
    rows = make_corpus_rows(n_files_for_sf(sf), dictionary)
    return spark.createDataFrame(rows, schemas.CORPUS)


def distributed_corpus_df(
    spark: SparkSession,
    n_files: int,
    dictionary: list[DictEntry] | None = None,
    tokens_per_file: int = 60,
    partitions: int | None = None,
    surface_density: int = 12,
) -> DataFrame:
    """Corpus synthesized executor-side with native expressions only.

    ``spark.range`` -> per-id deterministic token picks via
    ``transform(sequence(...), xxhash64)`` — no driver materialization,
    so input generation itself scales with the cluster (this is the
    100 TB stand-in: swap for ``spark.read.table('corpus')``).
    """
    dictionary = dictionary or make_dictionary()
    surfaces = sorted({e.surface for e in dictionary})
    # filler:surface ratio tuned so a doc mentions a SPARSE subset of
    # the dictionary (real corpora: dictionary >> per-doc entity set;
    # ~1 token in `surface_density` is a dictionary surface); hub
    # surface boosted for skew realism.
    fill_copies = max(1, (len(surfaces) * surface_density) // len(_FILLERS))
    token_pool = _FILLERS * fill_copies + surfaces + ["stdhub"] * (len(surfaces) // 20 + 1)
    pool = F.array(*[F.lit(t) for t in token_pool])
    n_pool = len(token_pool)
    df = spark.range(0, n_files, 1, partitions or spark.sparkContext.defaultParallelism)
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(tokens_per_file - 1)),
            lambda k: F.element_at(
                pool, (F.pmod(F.xxhash64(F.col("id") * 131 + k), F.lit(n_pool)) + 1).cast("int")
            ),
        ),
        " ",
    )
    return df.select(
        F.format_string("org%03d/repo-%05d", F.pmod(F.col("id"), F.lit(17)).cast("int"), (F.col("id") / 10).cast("int")).alias("repo"),
        F.format_string("src/mod_%09d.py", F.col("id").cast("int")).alias("path"),
        F.sha2(F.concat(F.lit("commit-"), F.col("id").cast("string")), 256).substr(1, 40).alias("commit"),
        F.element_at(F.array(F.lit("python"), F.lit("java"), F.lit("go")), (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")).alias("lang"),
        body.alias("content"),
    )
