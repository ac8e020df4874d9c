"""Local replica of the driver's correctness gate: run every query's
Ray implementation AND its DuckDB oracle on the same parquet tables,
compare row counts, column sets and values (order-insensitive).

Runs at sf0.001 in the suite (fast); bump GRAFT_PARITY_SF=sf0.01 to
mirror the driver exactly.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = os.environ.get("GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.001")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    # normalize numerics the way a value-hash comparison would
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df


SQL_QUERIES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(name, con):
    q = entrymod.queries()[name]
    got = _canon(_to_pandas(q(SF_DIR)))
    want = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        # the driver's value-hash distinguishes int64(4) from
        # float64(4.0) — do NOT coerce across kinds (that masked the
        # round-1 q_sessionize failure); widths within a kind are
        # normalized by _canon already
        g_f, w_f = (np.issubdtype(d.dtype, np.floating) for d in (g, w))
        assert g_f == w_f, (
            f"{name}: column {c} dtype-kind drift: got {g.dtype} vs oracle {w.dtype}"
        )
        ok = np.array_equal(g, w)
        assert ok, f"{name}: column {c} differs\n got: {g[:5]}\nwant: {w[:5]}"


ROWS_ONLY = [k for k in entrymod.queries() if k not in entrymod.oracle_sql()]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    q = entrymod.queries()[name]
    got = _to_pandas(q(SF_DIR))
    assert got is not None
    assert len(got) >= 0
