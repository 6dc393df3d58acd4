"""Concept-id normalizers (SURVEY.md section 2.3, N1-N8) as native
Column expressions — the reference's per-line Python extractors
re-expressed as whole-stage-codegen'd flatMaps (0..n rows out per row
in, via ``explode``). No Python UDFs.

Input shape: an annotation-row DataFrame in the reference's wire
format (``data/pubtator.py:96-118``, positional TSV columns):
  pubmed_id string, start int, end int, mention string,
  entity_type string, concept_id string
Output: (pubmed_id, entity_id, mention, start, end) per linked entity.

Faithfulness notes (semantics, not code):
* Default/Gene/Mutation/Species extractors match the requested type
  CASE-INSENSITIVELY (``DefaultEntityAnnotationExtractor`` lowercases
  both sides); Drug and Disease check ``"Chemical" in columns[4]`` /
  ``"Disease" in columns[4]`` CASE-SENSITIVELY. Reproduced exactly.
* Cellline (N3): the reference returns a plain ``str`` where its
  caller iterates a list, emitting one annotation per CHARACTER
  (latent bug, ``data/pubtator.py:145-151`` + ``:109-118``). We
  implement the intended semantics: one annotation with the
  first ``;``-token of the id. Documented divergence.
* Gene (N6): the reference prefixes EVERY ``;``-token with ``NCBI:``,
  including empty ones ("1;" -> ["NCBI:1", "NCBI:"]); reproduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT = ["pubmed_id", "entity_id", "mention", "start", "end"]


def _emit(df: DataFrame, entity_id_col) -> DataFrame:
    return df.select(
        "pubmed_id",
        entity_id_col.alias("entity_id"),
        "mention",
        "start",
        "end",
    )


def _type_matches_ci(df: DataFrame, entity_type: str) -> DataFrame:
    return df.where(
        F.col("entity_type").isNotNull()
        & F.lower(F.col("entity_type")).contains(entity_type.lower())
        & F.col("concept_id").isNotNull()
    )


def extract_default(df: DataFrame, entity_type: str) -> DataFrame:
    """N1: identity normalize; '*'-prefixed ids dropped (PubTator bug
    note, data/pubtator.py:120-125)."""
    return _emit(
        _type_matches_ci(df, entity_type).where(
            ~F.col("concept_id").startswith("*")
        ),
        F.col("concept_id"),
    )


def extract_chemical(df: DataFrame) -> DataFrame:
    """N2: keep only MESH:-prefixed ids (data/pubtator.py:133-137)."""
    return _emit(
        _type_matches_ci(df, "Chemical").where(
            F.col("concept_id").startswith("MESH:")
        ),
        F.col("concept_id"),
    )


def extract_cellline(df: DataFrame) -> DataFrame:
    """N3 (intended semantics): cvcl: prefix case-insensitive, keep
    first ';'-token (data/pubtator.py:145-151; char-iteration bug not
    reproduced)."""
    return _emit(
        _type_matches_ci(df, "CellLine").where(
            F.lower(F.col("concept_id")).startswith("cvcl:")
        ),
        F.split(F.col("concept_id"), ";").getItem(0),
    )


def extract_drug(df: DataFrame, mesh_to_drugbank: DataFrame) -> DataFrame:
    """N4/J3: MESH id -> first ';'-token -> broadcast-join the
    mesh->DrugBank map -> explode '|'-separated DrugBank ids
    (data/pubtator.py:160-187). ``mesh_to_drugbank``: (mesh string,
    drugbank_ids string) with '|'-separated multi-values, pre-exploded
    here. NOTE: type check is case-SENSITIVE 'Chemical' containment."""
    base = df.where(
        F.col("entity_type").isNotNull()
        & F.col("entity_type").contains("Chemical")
        & F.col("concept_id").isNotNull()
        & F.col("concept_id").startswith("MESH:")
    ).withColumn("mesh", F.split(F.col("concept_id"), ";").getItem(0))
    exploded_map = mesh_to_drugbank.select(
        "mesh", F.explode(F.split("drugbank_ids", "\\|")).alias("drugbank_id")
    )
    return _emit(
        base.join(F.broadcast(exploded_map), "mesh", "inner"),
        F.col("drugbank_id"),
    )


def extract_disease(df: DataFrame, doid_xref: DataFrame | None = None) -> DataFrame:
    """N5: keep MESH:/OMIM: ids, first ';'-token; with an ontology,
    MESH -> 0..n DOIDs via xref map (data/pubtator.py:196-224).
    ``doid_xref``: (mesh string, doid string), pre-exploded.
    Case-SENSITIVE 'Disease' containment."""
    base = df.where(
        F.col("entity_type").isNotNull()
        & F.col("entity_type").contains("Disease")
        & F.col("concept_id").isNotNull()
        & (
            F.col("concept_id").startswith("MESH:")
            | F.col("concept_id").startswith("OMIM:")
        )
    ).withColumn("mesh", F.split(F.col("concept_id"), ";").getItem(0))
    if doid_xref is None:
        return _emit(base, F.col("mesh"))
    return _emit(
        base.join(F.broadcast(doid_xref), "mesh", "inner"), F.col("doid")
    )


def extract_gene(df: DataFrame) -> DataFrame:
    """N6: split multi-id on ';', prefix each with NCBI:; drop
    null/'None' (data/pubtator.py:232-239)."""
    base = _type_matches_ci(df, "Gene").where(
        (F.col("concept_id") != "None") & (F.col("concept_id") != "")
    )
    return _emit(
        base.select(
            "pubmed_id",
            "mention",
            "start",
            "end",
            F.explode(F.split("concept_id", ";")).alias("tok"),
        ),
        F.concat(F.lit("NCBI:"), F.col("tok")),
    )


def extract_mutation(df: DataFrame) -> DataFrame:
    """N7: require 'RS#:'; strip '(Expired)'; first ';'-token starting
    with RS#: -> 'rs<id>'; split on ',' for multi-rs; re-prefix 'rs'
    (data/pubtator.py:247-266)."""
    base = _type_matches_ci(df, "Mutation").where(
        F.col("concept_id").contains("RS#:")
    )
    cleaned = F.replace(F.col("concept_id"), F.lit("(Expired)"), F.lit(""))
    first_rs = F.get(
        F.filter(F.split(cleaned, ";"), lambda t: t.startswith("RS#:")), 0
    )
    plain = F.replace(first_rs, F.lit("RS#:"), F.lit("rs"))
    rs_ids = F.transform(
        F.split(plain, ","),
        lambda t: F.when(t.startswith("rs"), t).otherwise(F.concat(F.lit("rs"), t)),
    )
    return _emit(
        base.withColumn("_first", first_rs)
        .where(F.col("_first").isNotNull() & (F.col("_first") != ""))
        .select(
            "pubmed_id",
            "mention",
            "start",
            "end",
            F.explode(rs_ids).alias("rs_id"),
        ),
        F.col("rs_id"),
    )


def extract_species(df: DataFrame) -> DataFrame:
    """N8: strip one leading '*', prefix TAXON: (data/pubtator.py:274-278)."""
    stripped = F.when(
        F.col("concept_id").startswith("*"), F.expr("substring(concept_id, 2)")
    ).otherwise(F.col("concept_id"))
    return _emit(
        _type_matches_ci(df, "Species"),
        F.concat(F.lit("TAXON:"), stripped),
    )


def clean_doid(col) -> F.Column:
    """N13: 'DOID:0001816' -> int-normalized 'DOID:1816'
    (data/disease_ontology.py:273-280)."""
    return F.concat(
        F.lit("DOID:"),
        F.replace(col, F.lit("DOID:"), F.lit("")).cast("long").cast("string"),
    )


def canonicalize_hgvs(col) -> F.Column:
    """N12: drop transcript version: 'NM_7.2:c.5C>T' -> 'NM_7:c.5C>T'
    (utils/mapping_utils.py:113-121)."""
    return F.regexp_replace(col, r"^([^.:]+)\.[0-9]+:", r"$1:")
