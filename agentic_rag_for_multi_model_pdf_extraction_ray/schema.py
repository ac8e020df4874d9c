"""Arrow schemas and the frozen extraction constants.

The constants mirror the reference parser's thresholds
(``/root/reference/src/core/parser.py:31-32,82``):
``MIN_TABLE_ROWS=2``, ``MIN_TEXT_LEN=40``, ``MIN_FIGURE_PX=80``.

The span data model follows ``BASELINE.json.input_hint``:
one row per document, ``spans`` an ordered
``list<struct<kind,text,media_ref,offset>>`` with ``kind`` in
``{"text","table","figure"}`` and dense 0-based ``offset`` in reading
order (reference ordering invariant: SURVEY.md §1.3 — per page all
tables, then all figures, then at most one text chunk;
``parser.py:49-133``).
"""

from __future__ import annotations

import pyarrow as pa

# Frozen parse thresholds (reference parser.py:31-32, :82).
MIN_TABLE_ROWS = 2
MIN_TEXT_LEN = 40
MIN_FIGURE_PX = 80

# Boilerplate strip: a candidate text line is dropped when the
# tag-stripped text density falls below this fraction of the raw line
# (DOM text-density heuristic per the north rule), or when the line is
# wrapped in a structural boilerplate tag.
MIN_TEXT_DENSITY = 0.5
BOILERPLATE_TAGS = ("nav", "header", "footer", "aside", "script", "style")

KINDS = ("text", "table", "figure")

# Deterministic-extraction defaults (reference crewai_pipeline.py:149-159,
# models.py:104-137, base.py:42, pipeline.py:292).
STRUCTURED_TEXT_MAX = 2000
DETERMINISTIC_CONFIDENCE = 0.8
CONFIDENCE_RETRY_THRESHOLD = 0.5
CONFIDENCE_ACCEPT_FLOOR = 0.25
AGENT_NOTES_DETERMINISTIC = "Extracted via direct agents (no crew orchestration)"

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

# Flagship input/output table (input_hint shape).
DOCUMENTS_INTERLEAVED_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Pre-extraction payload table (FIXTURES.md §2).
MEDIA_STRUCT = pa.struct(
    [
        pa.field("media_ref", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("data", pa.binary()),
    ]
)

DOCUMENTS_RAW_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("payload", pa.string()),
        pa.field("media", pa.list_(MEDIA_STRUCT)),
        pa.field("doc_bytes", pa.int64()),
    ]
)

# Exploded per-span rows (processing layout between parse and reassembly).
SPAN_ROWS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("page_num", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

# Post-extraction chunk rows (reference ProcessedChunk, models.py:104-137,
# projected columnar; chunk_id is deterministic, FIXTURES.md §4).
PROCESSED_CHUNKS_SCHEMA = pa.schema(
    [
        pa.field("chunk_id", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("page_num", pa.int32()),
        pa.field("offset", pa.int32()),
        pa.field("structured_text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("intuition_summary", pa.string()),
        pa.field("key_concepts", pa.list_(pa.string())),
        pa.field("confidence", pa.float32()),
        pa.field("agent_notes", pa.string()),
    ]
)
