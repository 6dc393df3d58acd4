"""Driver-contract queries for the normalizer library (SURVEY 2.3).

Input is a literal annotation-row set embedded identically on both
sides (the reference's wire format, data/pubtator.py:96-118), covering
every branch: '*'-prefix drops, case-insensitive vs case-sensitive type
matching, first-';'-token rules, 1->n explodes, (Expired) stripping,
multi-rs splits, 'None' genes, '*'-stripped species.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .contract import register, register_extra
from .functions import normalizers as N

# (pubmed_id, start_offset, end_offset, mention, entity_type, concept_id)
ANN_ROWS: list[tuple] = [
    ("1", 0, 7, "aspirin", "Chemical", "MESH:D001"),
    ("1", 8, 15, "unknown", "Chemical", "CHEBI:123"),
    ("2", 0, 4, "star", "Chemical", "*MESH:D009"),
    ("2", 5, 10, "multi", "Chemical", "MESH:D002;0.99"),
    ("3", 0, 4, "hela", "CellLine", "CVCL:0030;-0.04388"),
    ("3", 5, 10, "hela2", "cellline", "cvcl:0031"),
    ("4", 0, 6, "cancer", "Disease", "MESH:D003"),
    ("4", 7, 11, "omim", "Disease", "OMIM:114480"),
    ("4", 12, 16, "noca", "disease", "MESH:D004"),
    ("4", 17, 22, "multi", "Disease", "MESH:D003;x"),
    ("5", 0, 4, "braf", "Gene", "673;1234"),
    ("5", 5, 9, "none", "Gene", "None"),
    ("5", 10, 15, "trail", "Gene", "673;"),
    ("6", 0, 5, "v600e", "Mutation", "RS#:113488022(Expired)"),
    ("6", 6, 11, "multi", "Mutation", "CorrespondingGene:673;RS#:121,122"),
    ("6", 12, 18, "norsid", "Mutation", "tmVar:p|SUB|V|600|E"),
    ("7", 0, 5, "human", "Species", "9606"),
    ("7", 6, 11, "mouse", "Species", "*10090"),
    ("8", 0, 4, "gen", "Gene", None),
]

MESH_DRUGBANK = [("MESH:D001", "DB01|DB02"), ("MESH:D002", "DB03")]

_ANN_SCHEMA = (
    "pubmed_id string, start_offset int, end_offset int, "
    "mention string, entity_type string, concept_id string"
)

def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


_ANN_VALUES = ", ".join(
    "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in ANN_ROWS
)

_SQL_ANN = f"""
WITH ann(pubmed_id, start_offset, end_offset, mention, entity_type, concept_id) AS (
  VALUES {_ANN_VALUES}
)
"""

_OUT_SQL = "SELECT pubmed_id, {eid} AS entity_id, mention, start_offset, end_offset FROM ann WHERE {pred}"


def _ann_df(spark):
    df = spark.createDataFrame(ANN_ROWS, _ANN_SCHEMA)
    return df.withColumnsRenamed(
        {"start_offset": "start", "end_offset": "end"}
    )


def _shaped(df):
    return df.select(
        "pubmed_id",
        "entity_id",
        "mention",
        F.col("start").alias("start_offset"),
        F.col("end").alias("end_offset"),
    )


@register(
    "norm_default",
    _SQL_ANN
    + _OUT_SQL.format(
        eid="concept_id",
        pred="entity_type IS NOT NULL AND lower(entity_type) LIKE '%chemical%' "
        "AND concept_id IS NOT NULL AND concept_id NOT LIKE '*%'",
    ),
)
def norm_default(spark, sf_dir):
    return _shaped(N.extract_default(_ann_df(spark), "Chemical"))


@register(
    "norm_chemical",
    _SQL_ANN
    + _OUT_SQL.format(
        eid="concept_id",
        pred="entity_type IS NOT NULL AND lower(entity_type) LIKE '%chemical%' "
        "AND concept_id LIKE 'MESH:%'",
    ),
)
def norm_chemical(spark, sf_dir):
    return _shaped(N.extract_chemical(_ann_df(spark)))


# extras as of r5: N-family already driver-evidenced by 7 in-window
# rows; these two freed window slots for the graph-analytics queries
# (local DuckDB parity stays mandatory via tests/test_oracle_parity.py).
@register_extra(
    "norm_cellline",
    _SQL_ANN
    + _OUT_SQL.format(
        eid="string_split(concept_id, ';')[1]",
        pred="entity_type IS NOT NULL AND lower(entity_type) LIKE '%cellline%' "
        "AND lower(concept_id) LIKE 'cvcl:%'",
    ),
)
def norm_cellline(spark, sf_dir):
    return _shaped(N.extract_cellline(_ann_df(spark)))


@register(
    "norm_drug",
    _SQL_ANN
    + f"""
, mesh_map(mesh, drugbank_ids) AS (VALUES {", ".join(f"('{m}', '{d}')" for m, d in MESH_DRUGBANK)})
, exploded AS (
  SELECT mesh, unnest(string_split(drugbank_ids, '|')) AS drugbank_id FROM mesh_map
)
SELECT a.pubmed_id, e.drugbank_id AS entity_id, a.mention, a.start_offset, a.end_offset
FROM ann a
JOIN exploded e ON e.mesh = string_split(a.concept_id, ';')[1]
WHERE a.entity_type IS NOT NULL AND a.entity_type LIKE '%Chemical%'
  AND a.concept_id LIKE 'MESH:%'
""",
)
def norm_drug(spark, sf_dir):
    mesh_map = spark.createDataFrame(
        MESH_DRUGBANK, "mesh string, drugbank_ids string"
    )
    return _shaped(N.extract_drug(_ann_df(spark), mesh_map))


@register(
    "norm_disease",
    _SQL_ANN
    + _OUT_SQL.format(
        eid="string_split(concept_id, ';')[1]",
        pred="entity_type IS NOT NULL AND entity_type LIKE '%Disease%' "
        "AND (concept_id LIKE 'MESH:%' OR concept_id LIKE 'OMIM:%')",
    ),
)
def norm_disease(spark, sf_dir):
    return _shaped(N.extract_disease(_ann_df(spark)))


# The MESH->DOID dimension is PARSED from the .obo fixture (S7, the
# real ontology source — sources/obo.py), not a literal: the oracle
# embeds the expected parse result, so this query checks parser + join.
_OBO_MESH_XREF = [
    ("MESH:D003", "DOID:162"),
    ("MESH:D003", "DOID:1816"),
    ("MESH:D004", "DOID:1816"),
    ("MESH:D006394", "DOID:1816"),
    ("MESH:D008659", "DOID:14667"),
]


@register(
    "norm_disease_doid",
    _SQL_ANN
    + f"""
, xref(mesh, doid) AS (VALUES {", ".join(f"('{m}', '{d}')" for m, d in _OBO_MESH_XREF)})
SELECT a.pubmed_id, x.doid AS entity_id, a.mention, a.start_offset, a.end_offset
FROM ann a
JOIN xref x ON x.mesh = string_split(a.concept_id, ';')[1]
WHERE a.entity_type IS NOT NULL AND a.entity_type LIKE '%Disease%'
  AND (a.concept_id LIKE 'MESH:%' OR a.concept_id LIKE 'OMIM:%')
""",
)
def norm_disease_doid(spark, sf_dir):
    from .sources import obo

    xref = obo.mesh_to_doid(obo.parse_obo(spark))
    return _shaped(N.extract_disease(_ann_df(spark), xref))


@register(
    "norm_gene",
    _SQL_ANN
    + """
SELECT pubmed_id, 'NCBI:' || tok AS entity_id, mention, start_offset, end_offset
FROM (
  SELECT *, unnest(string_split(concept_id, ';')) AS tok FROM ann
  WHERE entity_type IS NOT NULL AND lower(entity_type) LIKE '%gene%'
    AND concept_id IS NOT NULL AND concept_id <> 'None' AND concept_id <> ''
)
""",
)
def norm_gene(spark, sf_dir):
    return _shaped(N.extract_gene(_ann_df(spark)))


@register(
    "norm_mutation",
    _SQL_ANN
    + """
SELECT pubmed_id,
       CASE WHEN rs_tok LIKE 'rs%' THEN rs_tok ELSE 'rs' || rs_tok END AS entity_id,
       mention, start_offset, end_offset
FROM (
  SELECT *, unnest(string_split(plain, ',')) AS rs_tok
  FROM (
    SELECT *, replace(list_filter(string_split(replace(concept_id, '(Expired)', ''), ';'),
                                  t -> t LIKE 'RS#:%')[1], 'RS#:', 'rs') AS plain
    FROM ann
    WHERE entity_type IS NOT NULL AND lower(entity_type) LIKE '%mutation%'
      AND concept_id LIKE '%RS#:%'
  )
  WHERE plain IS NOT NULL AND plain <> ''
)
""",
)
def norm_mutation(spark, sf_dir):
    return _shaped(N.extract_mutation(_ann_df(spark)))


@register_extra(
    "norm_species",
    _SQL_ANN
    + _OUT_SQL.format(
        eid="'TAXON:' || (CASE WHEN concept_id LIKE '*%' THEN substring(concept_id, 2) ELSE concept_id END)",
        pred="entity_type IS NOT NULL AND lower(entity_type) LIKE '%species%' "
        "AND concept_id IS NOT NULL",
    ),
)
def norm_species(spark, sf_dir):
    return _shaped(N.extract_species(_ann_df(spark)))


@register(
    "norm_hgvs_doid",
    """
WITH raw(id, doid) AS (VALUES
  ('NM_000551.3:c.292T>C', 'DOID:0001816'),
  ('NM_007294:c.68_69delAG', 'DOID:162'),
  ('NC_000017.10:g.7578406C>T', 'DOID:0014667')
)
SELECT regexp_replace(id, '^([^.:]+)\\.[0-9]+:', '\\1:') AS hgvs_key,
       'DOID:' || CAST(CAST(replace(doid, 'DOID:', '') AS BIGINT) AS VARCHAR) AS doid_clean
FROM raw
""",
)
def norm_hgvs_doid(spark, sf_dir):
    """N12 + N13 dimension-prep string functions."""
    raw = spark.createDataFrame(
        [
            ("NM_000551.3:c.292T>C", "DOID:0001816"),
            ("NM_007294:c.68_69delAG", "DOID:162"),
            ("NC_000017.10:g.7578406C>T", "DOID:0014667"),
        ],
        "id string, doid string",
    )
    from .functions.normalizers import canonicalize_hgvs, clean_doid

    return raw.select(
        canonicalize_hgvs(F.col("id")).alias("hgvs_key"),
        clean_doid(F.col("doid")).alias("doid_clean"),
    )


# --- S7: OBO ontology parse + hierarchy (sources/obo.py) -----------------
# The oracle is the EXPECTED parse+path result of the checked-in
# mini_doid.obo fixture as literals — the Spark side actually scans and
# parses the file and derives root->parent paths iteratively, so a
# regression anywhere in stanza split / field extraction / id
# normalization / synonym filtering / path propagation breaks the hash.

_OBO_EXPECTED = """
(  'DOID:14566', 'DOID:14566', 'disease of cellular proliferation', NULL,
   'DOID:4', NULL, '', 'DOID:4#'),
(  'DOID:14667', 'DOID:14667', 'disease of metabolism', NULL,
   'DOID:4', 'MESH:D008659', '', 'DOID:4#'),
(  'DOID:162', 'DOID:162', 'cancer', 'DOID:50686#',
   'DOID:14566', 'MESH:D003', 'malignant neoplasm;malignant tumor',
   'DOID:4#>DOID:14566#'),
(  'DOID:1816', 'DOID:1816', 'angiosarcoma', 'DOID:2123#',
   'DOID:162;DOID:60100', 'MESH:D003;MESH:D004;MESH:D006394',
   'hemangiosarcoma',
   'DOID:4#>DOID:14566#>DOID:162#;DOID:4#>DOID:14566#>DOID:162#>DOID:60100#'),
(  'DOID:4', 'DOID:4', 'disease', NULL, NULL, NULL, '', NULL),
(  'DOID:60100', 'DOID:60100', 'musculoskeletal system cancer', NULL,
   'DOID:162', NULL, '', 'DOID:4#>DOID:14566#>DOID:162#'),
(  'DOID:7', 'DOID:7', 'disease of anatomical entity', NULL,
   'DOID:4', NULL, '', 'DOID:4#'),
(  'DOID:9999', 'DOID:9999', 'orphan term', NULL,
   'DOID:12345', NULL, '', '')
"""


@register(
    "obo_ontology",
    f"""
SELECT * FROM (VALUES {_OBO_EXPECTED})
AS t(id, doid, name, alternative_ids, parent_ids, mesh_terms, synonyms,
     parent_paths)
""",
)
def obo_ontology(spark, sf_dir):
    """OBO parse (S7) + memoized parent-path derivation, exported in
    the reference's ontology_tsv encoding (disease_ontology.py:143-149,
    :151-225 parse, :227-271 paths)."""
    from .sources import obo

    return obo.reference_tsv_frame(obo.with_parent_paths(obo.parse_obo(spark)))
