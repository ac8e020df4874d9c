"""Per-partition lineage manifests + checkpointed resume.

The north rule requires "per-partition lineage manifests and
checkpointed resume so a killed run restarts at partition granularity".
The reference has nothing comparable (its closest analogue is the
idempotent ChromaDB upsert by chunk_id, ``store.py:71-76``); this is
new, scale-motivated design (SURVEY.md §4.2).

Layout: the corpus is split into ``n_partitions`` hash partitions of
``doc_id`` (``stable_hash64(doc_id) % n``).  Each partition writes

    <out_dir>/part=<i>/*.parquet      (the data, written to a tmp dir
                                       and atomically renamed)
    <out_dir>/part=<i>/_MANIFEST.json (doc count, span count, a
                                       content fingerprint, wall time)

A resumed run lists valid manifests and processes only the missing
partitions; a partition is the retry/restart unit, exactly what a
multi-node ``ray job submit`` rerun needs.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_NAME = "_MANIFEST.json"


def partition_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part}")


def read_manifests(out_dir: str) -> dict[int, dict]:
    """All parseable partition manifests, keyed by partition id."""
    out: dict[int, dict] = {}
    if not os.path.isdir(out_dir):
        return out
    for name in os.listdir(out_dir):
        if not name.startswith("part="):
            continue
        mpath = os.path.join(out_dir, name, MANIFEST_NAME)
        if not os.path.isfile(mpath):
            continue
        try:
            with open(mpath) as f:
                out[int(name.split("=", 1)[1])] = json.load(f)
        except (ValueError, OSError):
            continue
    return out


def completed_partitions(out_dir: str, expect_layout: dict | None = None) -> set[int]:
    """Partitions whose manifest exists and passes the self-check.

    With ``expect_layout``, a complete manifest whose recorded layout
    DIFFERS is not counted (resuming across a changed n_partitions
    would silently skip old-layout partitions and drop/duplicate
    documents); manifests without a layout (legacy) are accepted."""
    done: set[int] = set()
    for part, m in read_manifests(out_dir).items():
        if m.get("status") != "complete":
            continue
        if expect_layout is not None and m.get("layout") is not None \
                and m["layout"] != expect_layout:
            continue
        done.add(part)
    return done


def check_layout(out_dir: str, layout: dict) -> None:
    """Refuse to mix output layouts in one directory: raise if any
    existing complete manifest records a DIFFERENT layout."""
    for part, m in read_manifests(out_dir).items():
        got = m.get("layout")
        if m.get("status") == "complete" and got is not None and got != layout:
            raise ValueError(
                f"{out_dir} holds partitions written with layout {got}, "
                f"but this run uses {layout}; writing both would mix "
                f"partition schemes — clear the directory or match the layout"
            )


def _plain_arrow(table: pa.Table) -> pa.Table:
    """Strip extension types (e.g. Ray's tensor extension on ndarray
    columns) down to their storage arrays, so persisted partitions are
    PLAIN Arrow/Parquet any reader can consume — and re-reading them in
    a fresh worker can't trip extension-dtype reconstruction."""
    cols, changed = [], False
    for col in table.columns:
        if isinstance(col.type, pa.ExtensionType):
            col = pa.chunked_array([c.storage for c in col.chunks]) \
                if col.num_chunks else pa.chunked_array([], col.type.storage_type)
            changed = True
        cols.append(col)
    if not changed:
        return table
    return pa.table(dict(zip(table.column_names, cols)))


def write_partition(out_dir: str, part: int, table: pa.Table, fingerprint: str,
                    layout: dict | None = None) -> dict:
    """Atomically write one partition's data + manifest.

    Write to a tmp sibling then ``os.replace``-rename into place, so a
    kill mid-write never leaves a partition that looks complete.
    Extension-typed columns are stored as their plain storage type.
    """
    table = _plain_arrow(table)
    final = partition_dir(out_dir, part)
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    t0 = time.perf_counter()
    pq.write_table(table, os.path.join(tmp, "data.parquet"))
    manifest = {
        "status": "complete",
        "partition": part,
        "num_docs": table.num_rows,
        "fingerprint": fingerprint,
        "wall_sec": round(time.perf_counter() - t0, 4),
        "written_at": time.time(),
    }
    if layout is not None:
        manifest["layout"] = layout
    with open(os.path.join(tmp, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f)
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    return manifest


def completed_files(out_dir: str) -> list[str]:
    """Data files of all completed partitions, in partition order."""
    return [
        os.path.join(partition_dir(out_dir, p), "data.parquet")
        for p in sorted(completed_partitions(out_dir))
    ]


def read_output(out_dir: str) -> pa.Table:
    """Read back all completed partitions (driver-side — ONLY for
    small results like histograms or top-k hits; large stores must use
    :func:`read_output_ds` so blocks stream through the object store)."""
    files = completed_files(out_dir)
    if not files:
        raise FileNotFoundError(f"no completed partitions under {out_dir}")
    return pa.concat_tables([pq.read_table(f) for f in files])


def read_output_ds(out_dir: str):
    """Read back all completed partitions as a streaming Ray Dataset.

    The scale path: partition files feed ``ray.data.read_parquet``
    directly, so the store never materializes on the driver — at 100 TB
    the chunk store is itself a large table."""
    import ray.data as rd

    files = completed_files(out_dir)
    if not files:
        raise FileNotFoundError(f"no completed partitions under {out_dir}")
    return rd.read_parquet(files)
