"""Flagship extraction pipeline (the reference's ``app.py ingest`` path,
re-expressed Ray-Data-first — SURVEY.md §3.1, §7).

    documents_raw ──map_batches(parse+pack, stateless tasks)──▶
        packed rows (part, doc_id, spans)   [or span rows, packed=False]
    ──repartition(n_partitions)──▶ bounded shuffle fan-out
    ──groupby(part).map_groups──▶ one shuffle total
        (per-partition reassembly where needed + atomic write +
         _MANIFEST.json) ──▶ manifest rows (tiny)

Design decisions for 100 TB scale:

* **One shuffle, one row per document.** Every span of a doc is born
  in a single parse call (offsets computed inside the per-doc parse),
  so ordered spans are packed into ``list<struct>`` in-task and the
  ``part = hash(doc_id) % n`` exchange moves packed doc rows — ~6×
  fewer sort rows than the span-row layout (which remains available:
  ``packed=False`` here, per-doc ``groupby(doc_id)`` reassembly in
  ``stages/reassemble.py`` for flows that scatter spans across tasks).
* **Resume before the work, not after.** Completed partitions (valid
  manifests) are dropped by a vectorized filter right after the read,
  so a resumed run re-parses only missing partitions.
* **Skew.** ``n_partitions`` bounds the size of the largest in-memory
  group; doc-size skew (log-normal synth) is additionally handled by
  the optional size-bucketed parse (`bucketed=True`): coarse
  ``doc_bytes`` buckets get their own ``batch_size`` so one batch of
  mega-docs cannot blow a worker heap (SURVEY.md §4.2).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import stable_bucket
from ..util import default_concurrency
from ..parsing import parse_payload
from ..schema import DOCUMENTS_INTERLEAVED_SCHEMA, SPAN_STRUCT
from ..state.manifest import completed_partitions, write_partition

_SPAN_PART_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("page_num", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("part", pa.int32()),
    ]
)


class PartitionedPayloadParser:
    """Actor-pool parse stage that also stamps the partition key.

    Ray analogue of reference ``PDFParser.parse`` (parser.py:34-138)
    + the kind thresholds M1-M3 (parser.py:31-32,82), emitting
    span rows with ``part = stable_hash(doc_id) % n_partitions``.
    """

    def __init__(self, n_partitions: int) -> None:
        self.n_partitions = n_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in _SPAN_PART_SCHEMA.names}
        for doc_id, payload in zip(
            batch.column("doc_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            part = stable_bucket(doc_id, self.n_partitions)
            for s in parse_payload(payload):
                out["doc_id"].append(doc_id)
                out["page_num"].append(s.page_num)
                out["kind"].append(s.kind)
                out["text"].append(s.text)
                out["media_ref"].append(s.media_ref)
                out["offset"].append(s.offset)
                out["part"].append(part)
        return pa.Table.from_pydict(out, schema=_SPAN_PART_SCHEMA)


_PACKED_SCHEMA = pa.schema(
    [
        pa.field("part", pa.int32()),
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)


class PackingPayloadParser:
    """Parse + in-task reassembly: every span of a document is produced
    by the same parse call (offsets are assigned within the per-doc
    parse), so the ordered ``spans`` list can be packed IMMEDIATELY —
    the downstream shuffle then moves one packed row per document
    instead of one row per span (~6× fewer rows through the sort, same
    bytes).  The span-row layout + ``groupby(doc_id)`` reassembly
    remain available (stages/reassemble.py) for flows that genuinely
    scatter spans across tasks (e.g. media re-join)."""

    def __init__(self, n_partitions: int) -> None:
        self.n_partitions = n_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts: list[int] = []
        ids: list[str] = []
        offsets: list[int] = [0]
        kinds: list[str] = []
        texts: list[str] = []
        refs: list[str] = []
        offs: list[int] = []
        for doc_id, payload in zip(
            batch.column("doc_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            spans = parse_payload(payload)
            # zero-span docs are EMITTED with an empty span list (not
            # dropped) so the output accounts for every input doc —
            # the 100%-lineage claim is auditable from the data alone
            parts.append(stable_bucket(doc_id, self.n_partitions))
            ids.append(doc_id)
            for s in spans:
                kinds.append(s.kind)
                texts.append(s.text)
                refs.append(s.media_ref)
                offs.append(s.offset)
            offsets.append(len(kinds))
        struct = pa.StructArray.from_arrays(
            [
                pa.array(kinds, type=pa.string()),
                pa.array(texts, type=pa.string()),
                pa.array(refs, type=pa.string()),
                pa.array(offs, type=pa.int32()),
            ],
            fields=list(SPAN_STRUCT),
        )
        spans_arr = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)
        return pa.Table.from_arrays(
            [pa.array(parts, type=pa.int32()), pa.array(ids, type=pa.string()), spans_arr],
            schema=_PACKED_SCHEMA,
        )


def pack_partition(group: pa.Table) -> pa.Table:
    """Vectorized reassembly of ALL docs in one partition.

    sort by (doc_id, offset) → run-length boundaries of doc_id →
    one ListArray wrap.  No per-document Python loop.
    """
    g = group.sort_by([("doc_id", "ascending"), ("offset", "ascending")])
    ids = g.column("doc_id").combine_chunks()
    codes = pc.dictionary_encode(ids).indices.to_numpy(zero_copy_only=False)
    run_starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
    offsets = np.append(run_starts, len(g)).astype(np.int32)
    struct = pa.StructArray.from_arrays(
        [
            g.column("kind").combine_chunks(),
            g.column("text").combine_chunks(),
            g.column("media_ref").combine_chunks(),
            g.column("offset").combine_chunks(),
        ],
        fields=list(SPAN_STRUCT),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets), struct)
    doc_ids = ids.take(pa.array(run_starts))
    return pa.Table.from_arrays([doc_ids, spans], schema=DOCUMENTS_INTERLEAVED_SCHEMA)


class PartitionWriter:
    """map_groups sink: reassemble one partition, write atomically,
    emit its manifest row.  Accepts either span rows (packs them here)
    or already-packed (doc_id, spans) rows from PackingPayloadParser."""

    def __init__(self, out_dir: str, layout: dict | None = None) -> None:
        self.out_dir = out_dir
        self.layout = layout

    def __call__(self, group: pa.Table) -> pa.Table:
        part = int(group.column("part")[0].as_py())
        n_empty = 0
        if "spans" in group.column_names:  # packed rows
            packed = group.drop_columns(["part"]).sort_by("doc_id")
            flat = packed.column("spans").combine_chunks().flatten()
            n_spans = len(flat)
            text_bytes = int(pc.sum(pc.binary_length(flat.field("text"))).as_py() or 0)
            n_empty = int(pc.sum(pc.equal(
                pc.list_value_length(packed.column("spans")), 0)).as_py() or 0)
        else:  # span rows
            packed = pack_partition(group.drop_columns(["part"]))
            n_spans = int(group.num_rows)
            text_bytes = int(
                pc.sum(pc.binary_length(group.column("text"))).as_py() or 0
            )
        fingerprint = (f"docs={packed.num_rows};spans={n_spans};"
                       f"text_bytes={text_bytes};empty_docs={n_empty}")
        m = write_partition(self.out_dir, part, packed, fingerprint,
                            layout=self.layout)
        return pa.Table.from_pylist(
            [
                {
                    "part": part,
                    "num_docs": m["num_docs"],
                    "num_spans": n_spans,
                    "num_docs_empty": n_empty,
                    "fingerprint": fingerprint,
                }
            ]
        )


def parse_to_span_rows(
    raw_ds: rd.Dataset,
    n_partitions: int = 64,
    batch_size: int = 128,
    concurrency=None,
    bucketed: bool = False,
) -> rd.Dataset:
    """documents_raw → partition-stamped span rows.

    With ``bucketed=True`` the parse runs as per-size-bucket branches
    with bucket-proportional batch sizes (mega-docs in tiny batches),
    unioned back — the explicit skew treatment for corpora where doc
    sizes span orders of magnitude.  The default single pass is right
    when sizes are bounded.
    """
    if concurrency is None:
        # parse gets half the CPUs; the rest stay free for the read,
        # the shuffle and the partition writers (a pool that reserves
        # every CPU starves the other stages and the pipeline serializes)
        concurrency = default_concurrency(fraction=0.5)
    if not bucketed:
        return raw_ds.map_batches(
            PartitionedPayloadParser,
            fn_constructor_args=(n_partitions,),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    # size buckets: <64 KiB, 64 KiB-1 MiB, >=1 MiB
    bounds = [(None, 64 * 1024, 512), (64 * 1024, 1024 * 1024, 64), (1024 * 1024, None, 4)]
    branches = []
    for lo, hi, bsz in bounds:
        def pred(t: pa.Table, lo=lo, hi=hi) -> pa.Table:
            m = pc.greater_equal(t["doc_bytes"], lo) if lo is not None else None
            h = pc.less(t["doc_bytes"], hi) if hi is not None else None
            mask = m if h is None else (h if m is None else pc.and_(m, h))
            return t.filter(mask)

        branch = raw_ds.map_batches(pred, batch_format="pyarrow").map_batches(
            PartitionedPayloadParser,
            fn_constructor_args=(n_partitions,),
            batch_format="pyarrow",
            batch_size=bsz,
            concurrency=concurrency,
        )
        branches.append(branch)
    out = branches[0]
    for b in branches[1:]:
        out = out.union(b)
    return out


def run_extraction(
    raw_ds: rd.Dataset,
    out_dir: str,
    n_partitions: int = 64,
    batch_size: int = 128,
    concurrency=None,
    bucketed: bool = False,
    packed: bool = True,
    stats_out: dict | None = None,
) -> list[dict]:
    """Resumable end-to-end extraction; returns the manifest rows.

    Skips partitions whose manifests are already complete (the broadcast
    side is just the small ``done`` set, captured in the filter
    closure), parses the rest, reassembles + writes per partition.

    ``packed=True`` (default) packs each document's ordered spans
    inside the parse task (all spans of a doc are born in one call —
    offsets never depend on block layout) so the partition shuffle
    moves one row per document; ``packed=False`` keeps the exploded
    span-row exchange (same spans, more shuffle rows — the layout a
    flow needs when other per-span stages sit between parse and
    write).

    Doc-set asymmetry: zero-span documents are emitted (with an empty
    ``spans`` list) ONLY on the packed path; the span-row exchange has
    no row to carry them, so they are absent from ``packed=False``
    output entirely (and ``num_docs_empty`` reads 0 there — per-doc
    accounting of empties needs the packed path).  ``check_layout``
    refuses to mix the two layouts in one output dir, so a single
    store never sees both lineage contracts.
    """
    layout = {"n_partitions": n_partitions, "packed": bool(packed)}
    from ..state.manifest import check_layout

    check_layout(out_dir, layout)  # refuse to mix partition schemes
    done = completed_partitions(out_dir, expect_layout=layout)
    if done:
        done_arr = np.array(sorted(done), dtype=np.int64)

        def drop_done(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_pylist()
            parts = np.array([stable_bucket(d, n_partitions) for d in ids])
            return t.filter(pa.array(~np.isin(parts, done_arr)))

        raw_ds = raw_ds.map_batches(drop_done, batch_format="pyarrow")

    # pool budget: parse (the heavy stage) ~60% of CPUs, writers ~25%,
    # the remainder stays free for read tasks and the shuffle
    parse_c = concurrency if concurrency is not None else default_concurrency(0.6)
    writer_c = max(1, min(parse_c // 2, default_concurrency(0.25)))
    if packed and not bucketed:
        # stateless TASK parse: the parse state (compiled regexes) is
        # trivial, and tasks share CPUs elastically with the read, the
        # shuffle and the writers — an actor pool here would reserve
        # slots a small session needs for those stages.  Stages with
        # real state (classifiers, embedders) stay actor pools.
        def parse_pack(batch: pa.Table, _n=n_partitions) -> pa.Table:
            return PackingPayloadParser(_n)(batch)

        rows = raw_ds.map_batches(
            parse_pack, batch_format="pyarrow", batch_size=batch_size
        )
    else:
        rows = parse_to_span_rows(raw_ds, n_partitions, batch_size, parse_c, bucketed)
    writer = PartitionWriter(out_dir, layout=layout)

    def write_group(group: pa.Table) -> pa.Table:
        return writer(group)

    import json
    import time as _time

    # Ray's sort-based groupby uses the INPUT block count as its
    # map/reduce fan-out: B blocks → B reducers each fetching B
    # sub-blocks (B² tiny object transfers).  Coalesce to ~n_partitions
    # blocks first so the exchange is n_partitions² bounded, not
    # (read-parallelism)² (measured: 200 blocks → 44 s sort; 64 → ~6 s
    # for the same rows).
    rows = rows.repartition(n_partitions)

    t0 = _time.perf_counter()
    grouped = rows.groupby("part").map_groups(
        write_group, batch_format="pyarrow")
    manifests = grouped.take_all()
    if stats_out is not None:
        # the executed plan's per-operator timing/row profile — the
        # evidence the volume-curve analysis reads
        stats_out["stats"] = grouped.stats()
    # run-level metrics next to the partition manifests (the north
    # rule's "per-partition lineage + metrics"); the reference's
    # Langfuse tracing (T8) maps to this + Ray's per-operator stats
    wall = _time.perf_counter() - t0
    n_docs = sum(m["num_docs"] for m in manifests)
    try:
        with open(os.path.join(out_dir, "_RUN_METRICS.json"), "w") as f:
            json.dump(
                {
                    "wall_sec": round(wall, 3),
                    "partitions_written": len(manifests),
                    "partitions_skipped_resume": len(done),
                    "num_docs": n_docs,
                    "num_spans": sum(m["num_spans"] for m in manifests),
                    "num_docs_empty": sum(
                        m.get("num_docs_empty", 0) or 0 for m in manifests
                    ),
                    "docs_per_sec": round(n_docs / wall, 1) if wall > 0 else None,
                    "n_partitions": n_partitions,
                    "batch_size": batch_size,
                    "packed": packed,
                },
                f,
            )
    except OSError:
        pass  # metrics are best-effort; the data write already succeeded
    return manifests
