"""Distributed payload → span-row parse stage.

The Ray-Data analogue of the reference ``PDFParser.parse``
(``/root/reference/src/core/parser.py:34-138``): a *flat-map shaped*
``map_batches`` that explodes each ``documents_raw`` row into its
ordered span rows.  Offsets are computed **inside** the per-document
parse (never from block order), so the output is partition-layout
independent — the precondition for exact span-sequence equality after
any shuffle (SURVEY.md §7 "hard parts" #1).

Implemented as a callable class so the compiled regex machinery and
any future layout-model state initialize once per actor
(``map_batches(PayloadParser, concurrency=N)``); the per-row body is
whole-document parsing — the natural work unit, matching the
reference's one-PDF-at-a-time granularity but batched and parallel.
"""

from __future__ import annotations

import pyarrow as pa

from ..parsing import parse_payload
from ..schema import SPAN_ROWS_SCHEMA


class PayloadParser:
    """Actor-pool stage: documents_raw batch → span rows batch."""

    def __init__(self) -> None:
        # Parse machinery (compiled regexes) is module-level in
        # ..parsing; importing it here pins it per actor.  A real
        # layout/table-structure model would be loaded here, once per
        # actor (reference T1-T3 lifecycle, cache.py:44-62).
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in SPAN_ROWS_SCHEMA.names}
        doc_ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        for doc_id, payload in zip(doc_ids, payloads):
            for s in parse_payload(payload):
                out["doc_id"].append(doc_id)
                out["page_num"].append(s.page_num)
                out["kind"].append(s.kind)
                out["text"].append(s.text)
                out["media_ref"].append(s.media_ref)
                out["offset"].append(s.offset)
        return pa.Table.from_pydict(out, schema=SPAN_ROWS_SCHEMA)


def parse_spans_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task variant of :class:`PayloadParser` (same output)."""
    return PayloadParser()(batch)
