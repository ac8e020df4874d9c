"""Single-process reference implementation (the test oracle).

Mirrors the reference's only deterministic golden path
(``/root/reference/src/core/crewai_pipeline.py:149-159`` producing
``output/21_77_chunks.json``): a plain sequential loop over documents,
no Ray, producing the expected ordered span sequences.  Tests assert
exact ``(doc_id, offset) → (kind, text, media_ref)`` equality between
this and the distributed pipeline (SURVEY.md §5, FIXTURES.md §3).
"""

from __future__ import annotations

import pyarrow as pa

from .parsing import parse_payload
from .schema import DOCUMENTS_INTERLEAVED_SCHEMA, SPAN_ROWS_SCHEMA


def oracle_spans_rows(raw_table: pa.Table) -> pa.Table:
    """documents_raw → exploded span rows, sequentially, in doc order."""
    out = {k: [] for k in ("doc_id", "page_num", "kind", "text", "media_ref", "offset")}
    for doc_id, payload in zip(
        raw_table.column("doc_id").to_pylist(), raw_table.column("payload").to_pylist()
    ):
        for span in parse_payload(payload):
            out["doc_id"].append(doc_id)
            out["page_num"].append(span.page_num)
            out["kind"].append(span.kind)
            out["text"].append(span.text)
            out["media_ref"].append(span.media_ref)
            out["offset"].append(span.offset)
    return pa.Table.from_pydict(out, schema=SPAN_ROWS_SCHEMA)


def oracle_documents_interleaved(raw_table: pa.Table) -> pa.Table:
    """documents_raw → (doc_id, spans list<struct>) golden output."""
    ids, span_lists = [], []
    for doc_id, payload in zip(
        raw_table.column("doc_id").to_pylist(), raw_table.column("payload").to_pylist()
    ):
        ids.append(doc_id)
        span_lists.append(
            [
                {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
                for s in parse_payload(payload)
            ]
        )
    return pa.Table.from_pydict(
        {"doc_id": ids, "spans": span_lists}, schema=DOCUMENTS_INTERLEAVED_SCHEMA
    )
