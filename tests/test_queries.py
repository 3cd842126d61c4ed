"""Local mirror of the driver's correctness gate: every ``queries()``
entry runs at sf0.001; SQL-checked ones are compared against their
``oracle_sql()`` via DuckDB (row count + sorted-column/sorted-row value
equality, floats to 1e-9); rows-only ones must at least run and keep a
stable schema across two executions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def contract():
    import __ray_entry__ as entry_mod

    return entry_mod


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')")
    return con


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        df = result.to_pandas()
    elif isinstance(result, pa.Table):
        df = result.to_pandas()
    else:
        df = result
    return df


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _compare(df_a: pd.DataFrame, df_b: pd.DataFrame, name: str):
    a, b = _canon(df_a), _canon(df_b)
    assert list(a.columns) == list(b.columns), (name, a.columns, b.columns)
    assert len(a) == len(b), (name, len(a), len(b))
    for col in a.columns:
        va, vb = a[col].to_numpy(), b[col].to_numpy()
        if np.issubdtype(va.dtype, np.floating) or np.issubdtype(
                vb.dtype, np.floating):
            # equal_nan: nullable int columns (e.g. LAG's first-row
            # NULL) surface as NaN after the float cast on BOTH sides
            assert np.allclose(va.astype(float), vb.astype(float),
                               rtol=0, atol=1e-9, equal_nan=True), \
                (name, col)
        else:
            # NaT/None never compare equal to themselves: a null on
            # both sides (e.g. union_by_name's null-filled columns,
            # as-of's gated matches) is a MATCH, not a diff
            both_null = pd.isna(pd.Series(va)).to_numpy() & \
                pd.isna(pd.Series(vb)).to_numpy()
            assert ((va == vb) | both_null).all(), (name, col)


def test_sql_checked_queries_match_duckdb(ray_session, contract, duck):
    # Deliberately SERIAL: several queries use Ray's hash-shuffle
    # join, whose per-partition aggregator ACTORS reserve CPUs;
    # running join-bearing queries concurrently on the 4-CPU test
    # cluster starves the pools into a cross-pipeline deadlock
    # (observed: 28 aggregator actors wedged at 4 CPUs).
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, sql in oracles.items():
        got = _to_df(qs[name](SF))
        expected = duck.execute(sql).fetchdf()
        _compare(got, expected, name)


def test_rows_only_queries_run(ray_session, contract):
    qs = contract.queries()
    oracles = contract.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        df = _to_df(qs[name](SF))
        assert df is not None, name
        assert len(df.columns) > 0, name


def test_entry_runs(ray_session, contract):
    result = contract.entry()
    df = _to_df(result)
    assert len(df) > 0
    assert "url" in df.columns and "hash" in df.columns
