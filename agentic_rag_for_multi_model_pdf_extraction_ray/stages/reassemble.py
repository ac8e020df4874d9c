"""Span reassembly — THE shuffle of the engine.

Re-associates exploded span rows to their documents and restores
reading order: ``groupby("doc_id")`` (hash shuffle; the key is uniform
by construction) followed by an in-group ``offset`` sort — never a
global sort (SURVEY.md §2.5, §4.2).  The reference keeps this order
implicitly by sequential list appends (``pipeline.py:249-324``); here
it is explicit and partition-layout independent.

The per-group function is a handful of vectorized pyarrow calls
(sort_by + one ListArray wrap), so the per-document Python overhead is
constant and small; the cost that matters at 10^12 docs is the hash
exchange itself, which Ray's streaming shuffle handles.
"""

from __future__ import annotations

import pyarrow as pa

from ..schema import DOCUMENTS_INTERLEAVED_SCHEMA, SPAN_STRUCT


def _pack_group(group: pa.Table) -> pa.Table:
    g = group.sort_by("offset")
    struct = pa.StructArray.from_arrays(
        [
            g.column("kind").combine_chunks(),
            g.column("text").combine_chunks(),
            g.column("media_ref").combine_chunks(),
            g.column("offset").combine_chunks(),
        ],
        fields=list(SPAN_STRUCT),
    )
    spans = pa.ListArray.from_arrays(
        pa.array([0, len(g)], type=pa.int32()), struct
    )
    doc_id = pa.array([g.column("doc_id")[0].as_py()], type=pa.string())
    return pa.Table.from_arrays([doc_id, spans], schema=DOCUMENTS_INTERLEAVED_SCHEMA)


def reassemble_documents(span_rows_ds):
    """span rows Dataset → (doc_id, spans list<struct>) Dataset."""
    return span_rows_ds.groupby("doc_id").map_groups(
        _pack_group, batch_format="pyarrow"
    )


def explode_spans_batch(batch: pa.Table) -> pa.Table:
    """Inverse transform: (doc_id, spans) → span rows (vectorized).

    Uses Arrow list offsets — no Python loop over spans.
    """
    spans = batch.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):  # defensive; combine_chunks on column
        spans = spans.chunk(0) if spans.num_chunks else pa.array([], type=spans.type)
    flat = spans.flatten()
    counts = pa.compute.list_value_length(spans).fill_null(0).to_numpy(zero_copy_only=False)
    doc_ids = batch.column("doc_id").combine_chunks()
    import numpy as np

    repeated_ids = doc_ids.take(pa.array(np.repeat(np.arange(len(counts)), counts)))
    out = pa.Table.from_arrays(
        [
            repeated_ids,
            flat.field("kind"),
            flat.field("text"),
            flat.field("media_ref"),
            flat.field("offset"),
        ],
        names=["doc_id", "kind", "text", "media_ref", "offset"],
    )
    return out
