"""Driver-representation gate: pandas-level value parity for the queries
whose types historically diverged at the driver (DECIMAL / HUGEINT →
float64 in DuckDB's .df(), int64/Decimal on Spark's toPandas()).

tests/test_entry_oracle.py proves value equality with canonicalisation;
this module additionally proves the REPRESENTATIONS agree after each
engine's pandas conversion — the exact comparison the per-round driver
runs. Full-coverage version: tools_hashdiff.py (all oracled queries at
sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# every query that has ever been hash-amber at the driver, plus the
# soon-to-be-checked ones that share the risky shapes (integer sums,
# rounded averages, quantiles, formatted timestamps, recall doubles)
GATED = [
    "stats_documents",
    "events_json",
    "sessions_30m",
    "quantiles_nchars",
    "repetition_trigrams",
    "corpus_verdicts",
    "lexical_diversity",
    "embedding_topk_lsh",
    "embedding_topk_ivf",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    return repr(v)


def _cells(df):
    cols = sorted(df.columns)
    rows = sorted(
        tuple(_canon(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )
    return cols, rows


@pytest.mark.parametrize("name", GATED)
def test_pandas_repr_parity(name, spark, duck):
    sdf = E.queries()[name](spark, SF).toPandas()
    odf = duck.execute(E.oracle_sql()[name]).df()
    scols, srows = _cells(sdf)
    ocols, orows = _cells(odf)
    assert scols == ocols
    assert len(srows) == len(orows)
    for i, (sr, orr) in enumerate(zip(srows, orows)):
        assert sr == orr, f"{name} row {i}: {sr} != {orr}"
