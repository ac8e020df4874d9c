"""Fragment-exchange extraction — the no-global-sort fast path.

``run_extraction`` (pipelines/extract.py) routes the reassembly +
partitioned write through ``groupby(part)`` — one Ray sort-based
all-to-all.  Profiling at 32 CPUs shows that central sort dominating
wall time, so this variant implements the exchange the way large
batch engines write dynamic partitions:

  1. parse tasks APPEND their span rows as per-partition *fragment*
     parquet files (``<out>/_frags/part=<i>/<uuid>.parquet``) — a
     map-side, file-system-level exchange with no coordination;
  2. a finalize pass runs one task per partition: read that
     partition's fragments, vectorized in-partition reassembly
     (sort by (doc_id, offset), run-length pack), atomic rename +
     ``_MANIFEST.json``.

Both phases are embarrassingly parallel and streaming; on a multi-node
cluster the fragment directory lives on shared storage exactly like
any shuffle-file exchange.  Resume semantics are identical to the
groupby path (completed partitions are skipped before parsing).
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..functions.hashing import stable_bucket
from ..state.manifest import completed_partitions, write_partition
from ..util import default_concurrency
from .extract import PartitionedPayloadParser, pack_partition


class FragmentWritingParser(PartitionedPayloadParser):
    """Parse + map-side partitioned fragment write in one actor stage.

    Emits one tiny (part, n_rows) accounting row per fragment written.
    """

    def __init__(self, n_partitions: int, frag_dir: str) -> None:
        super().__init__(n_partitions)
        self.frag_dir = frag_dir

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        span_rows = super().__call__(batch)
        if span_rows.num_rows == 0:
            return pa.Table.from_pydict({"part": pa.array([], type=pa.int32()),
                                         "rows": pa.array([], type=pa.int64())})
        srt = span_rows.sort_by("part")
        parts = srt.column("part").to_numpy()
        bounds = np.flatnonzero(np.r_[True, parts[1:] != parts[:-1]])
        bounds = np.append(bounds, len(parts))
        out_parts, out_rows = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            part = int(parts[s])
            frag = srt.slice(s, e - s).drop_columns(["part"])
            d = os.path.join(self.frag_dir, f"part={part}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(frag, os.path.join(d, f"{uuid.uuid4().hex}.parquet"),
                           compression="zstd")
            out_parts.append(part)
            out_rows.append(e - s)
        return pa.Table.from_pydict(
            {"part": pa.array(out_parts, type=pa.int32()),
             "rows": pa.array(out_rows, type=pa.int64())}
        )


def _finalize_partition(out_dir: str, frag_dir: str, part: int) -> dict:
    d = os.path.join(frag_dir, f"part={part}")
    files = sorted(os.listdir(d))
    table = pa.concat_tables([pq.read_table(os.path.join(d, f)) for f in files])
    packed = pack_partition(table)
    text_bytes = int(pc.sum(pc.binary_length(table.column("text"))).as_py() or 0)
    fingerprint = f"docs={packed.num_rows};spans={table.num_rows};text_bytes={text_bytes}"
    m = write_partition(out_dir, part, packed, fingerprint)
    m["num_spans"] = table.num_rows
    return m


def run_extraction_fragments(
    raw_ds: rd.Dataset,
    out_dir: str,
    n_partitions: int = 64,
    batch_size: int = 128,
    concurrency=None,
) -> list[dict]:
    """Resumable extraction via fragment exchange; returns manifests."""
    done = completed_partitions(out_dir)
    if done:
        done_arr = np.array(sorted(done), dtype=np.int64)

        def drop_done(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_pylist()
            parts = np.array([stable_bucket(d, n_partitions) for d in ids])
            return t.filter(pa.array(~np.isin(parts, done_arr)))

        raw_ds = raw_ds.map_batches(drop_done, batch_format="pyarrow")

    frag_dir = os.path.join(out_dir, "_frags")
    shutil.rmtree(frag_dir, ignore_errors=True)
    if concurrency is None:
        concurrency = default_concurrency(0.75)

    acct = raw_ds.map_batches(
        FragmentWritingParser,
        fn_constructor_args=(n_partitions, frag_dir),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    ).take_all()

    touched = sorted({int(r["part"]) for r in acct})
    finalize = rd.from_items([{"part": p} for p in touched]).map_batches(
        lambda b: pa.Table.from_pylist(
            [_finalize_partition(out_dir, frag_dir, int(p)) for p in b.column("part").to_pylist()]
        ),
        batch_format="pyarrow",
        batch_size=1,
    )
    manifests = finalize.take_all()
    shutil.rmtree(frag_dir, ignore_errors=True)
    return manifests
