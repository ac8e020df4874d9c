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

# ADVICE r4: every rows-only query sits PAST the driver's 50-entry
# recording window, so this suite is its only per-round gate — assert
# real schema + floor-row expectations, not just "it ran".  Column
# sets are exact (sorted); row floors hold from sf0.001 upward (row
# counts are monotone in sf except the fixed-k/top-k entries, which
# are exact).
ROWS_ONLY_EXPECT: dict[str, tuple[list[str], int]] = {
    "q_minhash_clusters": (["cluster_id", "doc_id"], 100),
    "q_extract_documents": (["doc_id", "n_spans"], 100),
    "q_kind_histogram": (["kind", "n"], 3),
    "q_simhash_pairs": (["a", "b", "hamming"], 5),
    "q_extract_spans": (
        ["doc_id", "kind", "media_ref", "offset", "page_num", "text"], 1000),
    "q_chunks_direct": (
        ["chunk_id", "confidence", "doc_id", "kind", "offset",
         "structured_text"], 1000),
    "q_chunks_typed": (
        ["agent_notes", "chunk_id", "confidence", "doc_id", "kind",
         "offset", "structured_text"], 1000),
    "q_embed_chunks": (["chunk_id", "vec_sum"], 1000),
    "q_simhash": (["doc_id", "simhash"], 100),
    "q_ngram_jaccard": (["a", "b", "jaccard"], 5),
    "q_knn_lsh": (["score", "vec_id"], 10),
    "q_knn_store": (["score", "vec_id"], 10),
    "q_knn_ivf": (["score", "vec_id"], 10),
    "q_cms_heavy_hitters": (
        ["envelope", "est_count", "exact_count", "token"], 20),
    "q_routed_answer": (
        ["answer_len", "insufficient_context", "is_grounded", "n_sources",
         "question", "route"], 1),
    "q_validated_chunks": (["n", "validation_outcome"], 1),
    "q_classified_spans": (
        ["doc_id", "kind", "layout_class", "offset", "table_schema"], 1000),
    "q_media_features": (
        ["doc_id", "feature", "height", "media_ref", "thumb_h", "thumb_w",
         "width"], 500),
}


def test_rows_only_expectations_complete():
    # a NEW rows-only query must declare its expectation here, so a
    # demotion past the recording window can't silently drop its gate
    assert sorted(ROWS_ONLY) == sorted(ROWS_ONLY_EXPECT)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    q = entrymod.queries()[name]
    got = _to_pandas(q(SF_DIR))
    assert got is not None
    want_cols, min_rows = ROWS_ONLY_EXPECT[name]
    assert sorted(got.columns) == want_cols, (
        f"{name}: columns {sorted(got.columns)} != {want_cols}")
    assert len(got) >= min_rows, f"{name}: {len(got)} rows < {min_rows}"
    assert not got.isna().all().any(), f"{name}: an all-NaN column"
