"""Corpus readers: testdata tables and raw/interleaved corpora.

Always prunes columns at the read (``read_parquet(columns=[...])``) —
at 100 TB a read that loads all columns for a two-column transform is
wrong by itself.
"""

from __future__ import annotations

import os

import ray.data as rd

try:  # Lance is optional in this environment (SURVEY.md §1.4)
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read one testdata table with column pruning."""
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def read_interleaved(path: str) -> rd.Dataset:
    """Read a (doc_id, spans) corpus — Lance when available, else parquet."""
    if HAVE_LANCE and os.path.isdir(path) and os.path.exists(
        os.path.join(path, "_versions")
    ):
        return rd.read_lance(path)
    return rd.read_parquet(path)


def write_interleaved(ds: rd.Dataset, path: str) -> None:
    if HAVE_LANCE:
        ds.write_lance(path)
    else:
        ds.write_parquet(path)
