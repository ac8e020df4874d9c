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


def _strip_meta(t):
    """Drop the embedded ``pandas`` schema metadata pandas-written
    parquet carries: a ``pa.Schema`` WITH metadata is unhashable,
    which defeats Ray's schema deduplication in the read's block
    splitter and every downstream shuffle/join aggregator (the
    "Failed to hash the schemas" warning wall — round-4 verdict
    housekeeping).  Zero-copy; applied INSIDE the read task
    (``_block_udf``) so even ``SplitBlocks`` sees clean schemas."""
    return t.replace_schema_metadata(None)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read one testdata table with column pruning."""
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                           columns=columns, _block_udf=_strip_meta)


def read_any(path: str, fmt: str | None = None,
             columns: list[str] | None = None) -> rd.Dataset:
    """Format-flexible corpus reader: parquet (column-pruned), csv,
    json/jsonl, lance (when importable).  ``fmt=None`` sniffs from the
    extension (a directory defaults to parquet, or lance when it has a
    ``_versions`` dir and the package exists)."""
    if fmt is None:
        ext = os.path.splitext(path)[1].lower().lstrip(".")
        if os.path.isdir(path):
            fmt = "lance" if (HAVE_LANCE and os.path.exists(
                os.path.join(path, "_versions"))) else "parquet"
        elif ext in ("jsonl", "ndjson"):
            fmt = "json"
        elif ext in ("parquet", "csv", "json"):
            fmt = ext
        else:
            raise ValueError(f"cannot sniff format of {path}; pass fmt=")
    if fmt == "parquet":
        return rd.read_parquet(path, columns=columns)
    if fmt == "csv":
        ds = rd.read_csv(path)
    elif fmt == "json":
        ds = rd.read_json(path)
    elif fmt == "lance":
        if not HAVE_LANCE:
            raise ImportError("lance is not installed in this environment")
        ds = rd.read_lance(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    return ds.select_columns(columns) if columns else ds


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
