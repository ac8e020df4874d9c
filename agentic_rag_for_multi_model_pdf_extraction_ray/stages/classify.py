"""Stateful classifier stages — the engine's analogue of the
reference's per-kind model agents (T1–T3, SURVEY.md §2.3).

The reference loads 1.5–14 GB MLX models once per process and runs
them chunk-by-chunk (``/root/reference/src/agents/extraction.py:77-79``,
``src/core/cache.py:44-62``).  No model weights exist in this
container, so these are deterministic rule/hash models — but the
*operator shape* is the real contract: state built once per actor in
``__init__`` (the expensive part for a real model), vectorized batched
``__call__``, fixed-size actor pool via
``map_batches(Cls, concurrency=(min,max), batch_size=B, num_cpus=c)``.

* :class:`TableStructureClassifier` — M6 analogue: parses the markdown
  table, infers a per-column type signature (int / float / date /
  text) + column count, emits a JSON schema annotation like the
  reference's ``<!-- schema: ... -->`` (``extraction.py:184-189``).
* :class:`LayoutClassifier` — M5/M7 analogue: scores text spans
  (density/length features → layout class heading/paragraph/list) and
  figures (deterministic pseudo-class from the media_ref hash,
  standing in for the VLM figure_type classification,
  ``extraction.py:220-280``).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions.hashing import stable_hash64

_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?\d*\.\d+$")
_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")

FIGURE_TYPES = ("chart", "diagram", "photo", "screenshot", "map")


def infer_cell_type(cell: str) -> str:
    c = cell.strip()
    if not c:
        return "empty"
    if _INT_RE.match(c):
        return "int"
    if _FLOAT_RE.match(c):
        return "float"
    if _DATE_RE.match(c):
        return "date"
    return "text"


def infer_table_schema(markdown: str) -> dict:
    """Column names from the header row; per-column type = majority
    type over body cells (tie → 'text'). Deterministic."""
    lines = [ln for ln in (markdown or "").split("\n") if ln.strip().startswith("|")]
    if not lines:
        return {"columns": [], "types": []}
    header = [c.strip() for c in lines[0].strip().strip("|").split("|")]
    body = []
    for ln in lines[1:]:
        cells = [c.strip() for c in ln.strip().strip("|").split("|")]
        if all(set(c) <= {"-", ":", ""} for c in cells):
            continue  # separator
        body.append(cells)
    types = []
    for col in range(len(header)):
        counts: dict[str, int] = {}
        for row in body:
            if col < len(row):
                t = infer_cell_type(row[col])
                if t != "empty":
                    counts[t] = counts.get(t, 0) + 1
        if not counts:
            types.append("text")
        else:
            best = max(counts.values())
            winners = sorted(k for k, v in counts.items() if v == best)
            types.append(winners[0] if len(winners) == 1 else "text")
    return {"columns": header, "types": types}


class TableStructureClassifier:
    """Actor stage: adds ``table_schema`` (JSON) to table spans."""

    def __init__(self) -> None:
        # real model load would happen here, once per actor
        self._empty = json.dumps({"columns": [], "types": []})

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        is_table = batch["kind"] == "table"
        schemas = np.full(len(batch), self._empty, dtype=object)
        idx = np.flatnonzero(is_table.to_numpy())
        texts = batch["text"].to_numpy()
        for i in idx:
            schemas[i] = json.dumps(infer_table_schema(texts[i]), sort_keys=True)
        batch = batch.copy()
        batch["table_schema"] = schemas
        return batch


class LayoutClassifier:
    """Actor stage: adds ``layout_class`` per span.

    text → heading / list / paragraph by cheap features;
    figure → pseudo figure-type from a stable hash of media_ref;
    table → 'table'.
    """

    def __init__(self) -> None:
        self.fig_types = FIGURE_TYPES

    def _text_class(self, t: str) -> str:
        s = (t or "").strip()
        first = s.split("\n", 1)[0]
        if len(first) <= 60 and s.count("\n") == 0 and first == first.title():
            return "heading"
        lines = s.split("\n")
        bullety = sum(1 for ln in lines if ln.lstrip().startswith(("-", "*", "•")))
        if lines and bullety / len(lines) >= 0.5:
            return "list"
        return "paragraph"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for kind, text, ref in zip(batch["kind"], batch["text"], batch["media_ref"]):
            if kind == "table":
                out.append("table")
            elif kind == "figure":
                out.append(self.fig_types[stable_hash64(ref or "") % len(self.fig_types)])
            else:
                out.append(self._text_class(text))
        batch = batch.copy()
        batch["layout_class"] = out
        return batch


def classify_spans(span_rows: rd.Dataset, concurrency=(1, 2),
                   batch_size: int = 512) -> rd.Dataset:
    """Both classifier pools over span rows (separate pools — the
    reference's table and vision models have different resource
    shapes, T1 vs T2)."""
    ds = span_rows.map_batches(
        TableStructureClassifier, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )
    return ds.map_batches(
        LayoutClassifier, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )
