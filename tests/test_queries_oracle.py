"""Local mirror of the driver's correctness gate: run every queries()
entry in Spark and its oracle_sql() twin in DuckDB on the same parquet,
compare row count, column names, and values (order-insensitive)."""

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, ddb, name):
    got = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(ddb.execute(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}")
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            assert (got[c].fillna(-1) == want[c].fillna(-1)).all(), f"{name}.{c}"
        else:
            assert (got[c].values == want[c].values).all(), f"{name}.{c}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    df.limit(5).collect()  # schema materializes without error
