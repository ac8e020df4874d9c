"""Per-kind chunk transforms — the extraction-agent layer.

Ray-Data re-expression of the reference's agent router + extraction
agents (SURVEY.md §2.2):

* kind router M4 (``/root/reference/src/agents/router.py:31-53``) — a
  SINGLE ``map_batches`` pass with vectorized per-kind masks, not three
  unioned sub-datasets (one pass, no extra scans).
* deterministic extraction M15
  (``crewai_pipeline.py:149-159``): ``structured_text = text[:2000]``,
  ``confidence = 0.8``, fixed agent notes — the reference's golden
  fixture path, reproduced exactly in ``mode="direct"``.
* typed mode mirrors the per-kind agents' deterministic fallbacks:
  text M5 (``extraction.py:81-127``, fallback text[:2000], conf 0.7),
  table M6 (``extraction.py:147-194``, markdown + appended
  ``<!-- schema: ... -->`` annotation), figure M7
  (``extraction.py:220-280``, description placeholder, conf 0.6).
* confidence acceptance filter M11 (``pipeline.py:292,306,311``):
  keep iff confidence >= 0.25.
* embed-text projection M14 (``store.py:54``).
* chunk-type histogram A1 (``app.py:103-107``).

``chunk_id`` is deterministic (md5 of doc_id:offset, FIXTURES.md §4)
— never uuid4 — so re-running a partition is idempotent.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count

from ..schema import (
    AGENT_NOTES_DETERMINISTIC,
    CONFIDENCE_ACCEPT_FLOOR,
    DETERMINISTIC_CONFIDENCE,
    STRUCTURED_TEXT_MAX,
)


def chunk_id_batch(doc_ids: pd.Series, offsets: pd.Series) -> pd.Series:
    keys = doc_ids.astype(str) + ":" + offsets.astype(str)
    return keys.map(lambda k: hashlib.md5(k.encode()).hexdigest())


def _table_schema_annotation(texts: pd.Series) -> pd.Series:
    """Deterministic stand-in for the reference's LLM-inferred table
    schema annotation (extraction.py:184-189): column count from the
    markdown header row."""
    ncols = texts.str.split("\n").str[0].str.count(r"\|") - 1
    ncols = ncols.clip(lower=0).astype("int64")
    return texts + "\n<!-- schema: {\"columns\": " + ncols.astype(str) + "} -->"


def transform_chunks_batch(batch: pd.DataFrame, mode: str = "direct") -> pd.DataFrame:
    """span rows → processed chunk rows; one pass, vectorized masks."""
    out = pd.DataFrame(
        {
            "chunk_id": chunk_id_batch(batch["doc_id"], batch["offset"]),
            "doc_id": batch["doc_id"],
            "kind": batch["kind"],
            "page_num": batch["page_num"].astype("int32")
            if "page_num" in batch
            else np.int32(0),
            "offset": batch["offset"].astype("int32"),
            "media_ref": batch["media_ref"],
        }
    )
    text = batch["text"].fillna("")
    if mode == "direct":
        out["structured_text"] = text.str.slice(0, STRUCTURED_TEXT_MAX)
        out["confidence"] = np.float32(DETERMINISTIC_CONFIDENCE)
        out["agent_notes"] = AGENT_NOTES_DETERMINISTIC
    else:  # typed per-kind branches, all vectorized on masks
        st = text.str.slice(0, STRUCTURED_TEXT_MAX)
        conf = pd.Series(np.float32(0.7), index=batch.index)
        notes = pd.Series("text agent (deterministic fallback)", index=batch.index)
        is_table = batch["kind"] == "table"
        is_figure = batch["kind"] == "figure"
        st = st.mask(is_table, _table_schema_annotation(text))
        notes = notes.mask(is_table, "table agent (schema annotated)")
        st = st.mask(is_figure, "[figure] " + batch["media_ref"].fillna(""))
        conf = conf.mask(is_figure, np.float32(0.6))
        notes = notes.mask(is_figure, "vision agent (deterministic fallback)")
        out["structured_text"] = st
        out["confidence"] = conf.astype(np.float32)
        out["agent_notes"] = notes
    out["intuition_summary"] = ""
    out["key_concepts"] = [[] for _ in range(len(out))]
    return out


def transform_chunks(span_rows: rd.Dataset, mode: str = "direct") -> rd.Dataset:
    return span_rows.map_batches(
        lambda b: transform_chunks_batch(b, mode), batch_format="pandas"
    )


def confidence_filter(chunks: rd.Dataset, floor: float = CONFIDENCE_ACCEPT_FLOOR) -> rd.Dataset:
    """M11: accept iff confidence >= floor (vectorized mask, not
    per-row ds.filter)."""
    import pyarrow.compute as pc

    return chunks.map_batches(
        lambda t: t.filter(pc.greater_equal(t["confidence"], pa.scalar(floor, pa.float32()))),
        batch_format="pyarrow",
    )


def kind_histogram(span_rows: rd.Dataset) -> rd.Dataset:
    """A1: chunk-type histogram — groupby(kind).count() (tiny shuffle:
    pre-aggregated per block by Ray's aggregate push-down)."""
    return span_rows.groupby("kind").aggregate(Count(alias_name="n"))


def embed_text_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """M14: the text actually embedded/stored —
    structured_text + "\\n\\n" + intuition_summary (store.py:54)."""
    batch["embed_text"] = batch["structured_text"] + "\n\n" + batch["intuition_summary"]
    return batch
