"""Local mirror of the driver's DuckDB oracle comparison: every
queries() entry with an oracle_sql() entry must match row count +
column names + order-insensitive values at the driver's sf (0.01)."""

from __future__ import annotations

import decimal
import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


# Driver-window queries plus the extras that live outside the 50-row
# window (retired rel_* micro-queries) — all oracle-checked here.
ALL_QUERIES = {**entrymod.queries(), **entrymod.extra_queries()}
ALL_ORACLES = {**entrymod.oracle_sql(), **entrymod.extra_oracle_sql()}
ORACLE_NAMES = sorted(ALL_ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, spark, ddb):
    q = ALL_QUERIES[name]
    sql = ALL_ORACLES[name]
    got = q(spark, SF_DIR).toPandas()
    exp = ddb.execute(sql).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rowcount {len(got)} vs {len(exp)}"
    cg, ce = canon(got), canon(exp)
    if cg != ce:
        diffs = [(a, b) for a, b in zip(cg, ce) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_rows_only_queries_run(spark):
    """Queries without an oracle must still run and return a schema."""
    qs = ALL_QUERIES
    for name in sorted(set(qs) - set(ALL_ORACLES)):
        df = qs[name](spark, SF_DIR)
        n = df.count()
        assert n >= 0, name
        assert df.columns, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"subj", "pred", "obj", "score", "articles", "n_docs"}
