"""N-Triples RDF interchange for the materialized KG (beyond-reference).

The reference exports pair tables as TSV (``prepare_pair_dataset.py``);
the lingua franca for exchanging a (subj, pred, obj) graph with the
wider KG tooling world (triple stores, rdflib, SPARQL endpoints) is
W3C N-Triples: one ``<s> <p> <o> .`` / ``<s> <p> "literal" .`` line
per triple, UTF-8, order-free.  This module is the codegen'd
serialize/parse pair:

* ``to_ntriples`` — triple DataFrame -> one-string-column DataFrame of
  N-Triples lines.  Pure ``concat``/``replace`` expressions (whole-
  stage codegen, no UDFs); literal objects get the spec's escape set
  (``\\`` ``\"`` ``\\n`` ``\\r`` ``\\t``) via a sentinel-guarded
  replace chain so a literal backslash-n survives the roundtrip.
* ``parse_ntriples`` — lines -> (subj, pred, obj, obj_is_iri).  One
  ``regexp_extract`` per term (anchored, backslash-aware literal
  body), malformed lines dropped by the same anchored match — the
  F3-style malformed-line guard, not an exception.

Scale shape: both directions are row-local projection/filter — no
shuffle, no state; writing with ``df.write.text`` shards lines across
tasks exactly like every other sink.  IRIs are minted as
``base + id``; ids must not contain the chars N-Triples forbids
inside ``<>`` (space, ``<>"{}|^``, backtick, control) — true for
every id family this pipeline emits (``FN:``/``OP:``/DOID/MeSH-style
tokens); violators are NULLed by the parse guard on the way back in,
never silently mangled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["to_ntriples", "parse_ntriples", "write_ntriples", "read_ntriples"]

# sentinel-guarded escape chain: \x01 must not appear in payloads
# (control chars are forbidden in N-Triples terms anyway)
_SENTINEL = "\x01"


def _escape_literal(col):
    out = F.replace(col, F.lit("\\"), F.lit(_SENTINEL))
    for raw, esc in (("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t"), ('"', '\\"')):
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return F.replace(out, F.lit(_SENTINEL), F.lit("\\\\"))


def _unescape_literal(col):
    out = F.replace(col, F.lit("\\\\"), F.lit(_SENTINEL))
    for raw, esc in (("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t"), ('"', '\\"')):
        out = F.replace(out, F.lit(esc), F.lit(raw))
    return F.replace(out, F.lit(_SENTINEL), F.lit("\\"))


def to_ntriples(
    df: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    base: str = "urn:kg:",
    obj_as_iri: bool = True,
) -> DataFrame:
    """Serialize (subj, pred, obj) rows to one N-Triples ``line`` each.

    ``obj_as_iri=True`` treats objects as graph nodes (``<base+obj>``);
    ``False`` emits them as escaped string literals.  Subjects and
    predicates are always IRIs under ``base``.
    """
    s = F.concat(F.lit("<" + base), F.col(subj).cast("string"), F.lit(">"))
    p = F.concat(F.lit("<" + base), F.col(pred).cast("string"), F.lit(">"))
    o_str = F.col(obj).cast("string")
    if obj_as_iri:
        o = F.concat(F.lit("<" + base), o_str, F.lit(">"))
    else:
        o = F.concat(F.lit('"'), _escape_literal(o_str), F.lit('"'))
    return df.select(
        F.concat(s, F.lit(" "), p, F.lit(" "), o, F.lit(" .")).alias("line")
    )


# anchored term patterns; the literal body is backslash-aware so an
# escaped quote doesn't end the literal early; inter-term whitespace
# is \s+ / trailing \s* per the N-Triples grammar (the writer emits
# canonical single spaces, but foreign producers vary)
_IRI = r"<([^<>\"{}|^`\x00-\x20]*)>"
_LIT = r'"((?:[^"\\]|\\.)*)"'
_LINE_IRI = rf"^\s*{_IRI}\s+{_IRI}\s+{_IRI}\s*\.\s*$"
_LINE_LIT = rf"^\s*{_IRI}\s+{_IRI}\s+{_LIT}\s*\.\s*$"


def parse_ntriples(
    lines: DataFrame, column: str = "line", base: str = "urn:kg:"
) -> DataFrame:
    """Parse N-Triples lines -> (subj, pred, obj, obj_is_iri).

    Lines matching neither the IRI-object nor the literal-object
    grammar are dropped (malformed-line guard, F3 semantics).  The
    ``base`` prefix is stripped from IRI terms when present.
    """
    col = F.col(column)
    pat_iri, pat_lit = _LINE_IRI, _LINE_LIT
    is_iri = col.rlike(pat_iri)
    is_lit = col.rlike(pat_lit)

    def strip_base(term):
        return F.when(
            term.startswith(base), term.substr(F.lit(len(base) + 1), F.length(term))
        ).otherwise(term)

    parsed = lines.where(is_iri | is_lit).select(
        strip_base(
            F.when(is_iri, F.regexp_extract(col, pat_iri, 1)).otherwise(
                F.regexp_extract(col, pat_lit, 1)
            )
        ).alias("subj"),
        strip_base(
            F.when(is_iri, F.regexp_extract(col, pat_iri, 2)).otherwise(
                F.regexp_extract(col, pat_lit, 2)
            )
        ).alias("pred"),
        F.when(is_iri, strip_base(F.regexp_extract(col, pat_iri, 3)))
        .otherwise(_unescape_literal(F.regexp_extract(col, pat_lit, 3)))
        .alias("obj"),
        is_iri.alias("obj_is_iri"),
    )
    return parsed


def write_ntriples(df: DataFrame, path: str, **kwargs) -> None:
    """Sink: shard N-Triples lines across tasks (set order is free in
    N-Triples, so no global sort is imposed)."""
    to_ntriples(df, **kwargs).write.mode("overwrite").text(path)


def read_ntriples(spark, path: str, base: str = "urn:kg:") -> DataFrame:
    """Source: text scan -> parsed triples (malformed lines dropped)."""
    return parse_ntriples(spark.read.text(path).withColumnRenamed("value", "line"),
                          base=base)
