"""Pure deterministic payload → ordered-span parse (the frozen contract).

This module is the engine's analogue of the reference PDF parser
(``/root/reference/src/core/parser.py:34-156``) re-targeted at
interleaved HTML-ish text + media payloads (the north rule's
"main-content extraction": boilerplate strip by text-density, table
region detection, figure filtering).  It is pure Python over strings —
no Ray, no I/O — so the exact same function body runs inside the
distributed ``map_batches`` stage AND inside the single-process test
oracle; span-sequence equality between the two is the correctness gate.

Payload format (produced by :mod:`..synth`, but any text following it
parses deterministically):

* pages separated by ``"\\f"`` (form feed);
* within a page, ``\\n``-separated lines of four kinds:

  - **table lines** — lines whose first non-space char is ``"|"``;
    maximal consecutive runs form one table block.  Separator rows
    (every cell made only of ``-``/``:``) are formatting and are
    skipped.  A block is a valid table iff it has at least
    ``MIN_TABLE_ROWS`` (=2) remaining rows (reference ``parser.py:55``);
    it is re-serialized to normalized markdown exactly like the
    reference ``_to_markdown`` (``parser.py:140-156``: header row,
    ``---`` separator, body; ``None``/empty → "").
  - **figure lines** — ``<img src="REF" width="W" height="H">``
    (attribute order fixed; self-closing slash optional).  Kept iff
    ``W >= 80 and H >= 80`` (reference small-image drop,
    ``parser.py:82``); span text is ``""`` and ``media_ref`` is the
    ``src`` value.
  - **boilerplate lines** — dropped from the text stream: any line
    containing a structural boilerplate tag
    (``<nav|header|footer|aside|script|style``…), or whose
    *text density* — ``len(tag-stripped, trimmed) / len(raw line)`` —
    is below ``MIN_TEXT_DENSITY`` (=0.5).  This is the DOM
    text-density heuristic demanded by the north rule.
  - **main text lines** — everything else; inline tags are stripped.

Per page the emission order is: all valid tables (in order of
appearance), then all kept figures (in order), then at most one text
span (the surviving lines joined by ``"\\n"``, emitted iff the stripped
length is at least ``MIN_TEXT_LEN`` (=40), reference ``parser.py:124-133``).
Offsets are dense 0..n-1 **per document** across pages in that order
(SURVEY.md §1.3 — the load-bearing ordering invariant).
"""

from __future__ import annotations

import re
from typing import NamedTuple

from .schema import (
    BOILERPLATE_TAGS,
    MIN_FIGURE_PX,
    MIN_TABLE_ROWS,
    MIN_TEXT_DENSITY,
    MIN_TEXT_LEN,
)


class Span(NamedTuple):
    kind: str
    text: str
    media_ref: str
    offset: int
    page_num: int


_IMG_RE = re.compile(
    r'<img\s+src="(?P<src>[^"]*)"\s+width="(?P<w>\d+)"\s+height="(?P<h>\d+)"\s*/?>'
)
_TAG_RE = re.compile(r"<[^>]*>")
_BOILER_RE = re.compile(
    "</?(?:" + "|".join(BOILERPLATE_TAGS) + r")\b", re.IGNORECASE
)
_SEP_CELL_RE = re.compile(r"^:?-+:?$")


def to_markdown(rows: list[list[str]]) -> str:
    """Normalized markdown serialization, reference ``parser.py:140-156``."""
    if not rows:
        return ""
    header = "| " + " | ".join(c or "" for c in rows[0]) + " |"
    sep = "| " + " | ".join("---" for _ in rows[0]) + " |"
    body = ["| " + " | ".join(c or "" for c in row) + " |" for row in rows[1:]]
    return "\n".join([header, sep] + body)


def _table_rows(block_lines: list[str]) -> list[list[str]]:
    rows: list[list[str]] = []
    for line in block_lines:
        stripped = line.strip()
        # "| a | b |" -> cells between the outer pipes.
        inner = stripped.strip("|")
        cells = [c.strip() for c in inner.split("|")]
        if cells and all(_SEP_CELL_RE.match(c) for c in cells if c != ""):
            if any(c != "" for c in cells):
                continue  # formatting separator row
        rows.append(cells)
    return rows


def _is_boilerplate(line: str) -> bool:
    if _BOILER_RE.search(line):
        return True
    stripped = _TAG_RE.sub("", line).strip()
    if len(line) == 0:
        return False
    return (len(stripped) / len(line)) < MIN_TEXT_DENSITY


def parse_page(page: str) -> tuple[list[str], list[tuple[str, int, int]], str]:
    """Split one page into (table_markdowns, figures, page_text).

    figures are (media_ref, width, height) in order of appearance and
    are NOT yet size-filtered; page_text is the boilerplate-stripped
    joined main text (not yet length-filtered).
    """
    tables: list[str] = []
    figures: list[tuple[str, int, int]] = []
    text_lines: list[str] = []

    lines = page.split("\n")
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        ls = line.lstrip()
        if ls.startswith("|"):
            j = i
            block = []
            while j < n and lines[j].lstrip().startswith("|"):
                block.append(lines[j])
                j += 1
            rows = _table_rows(block)
            if len(rows) >= MIN_TABLE_ROWS:
                tables.append(to_markdown(rows))
            i = j
            continue
        m = _IMG_RE.search(line)
        if m is not None:
            figures.append((m.group("src"), int(m.group("w")), int(m.group("h"))))
            i += 1
            continue
        if line.strip() == "" or _is_boilerplate(line):
            i += 1
            continue
        text_lines.append(_TAG_RE.sub("", line).strip())
        i += 1

    return tables, figures, "\n".join(text_lines).strip()


def parse_payload(payload: str) -> list[Span]:
    """Parse one document payload into its ordered span sequence.

    Deterministic; offsets dense 0..n-1 in (page, tables, figures,
    text) reading order.  This is THE contract both the Ray stage and
    the oracle execute.
    """
    spans: list[Span] = []
    offset = 0
    for page_idx, page in enumerate(payload.split("\f")):
        page_num = page_idx + 1
        tables, figures, text = parse_page(page)
        for md in tables:
            spans.append(Span("table", md, "", offset, page_num))
            offset += 1
        for ref, w, h in figures:
            if w < MIN_FIGURE_PX or h < MIN_FIGURE_PX:
                continue  # reference parser.py:82
            spans.append(Span("figure", "", ref, offset, page_num))
            offset += 1
        if len(text) >= MIN_TEXT_LEN:
            spans.append(Span("text", text, "", offset, page_num))
            offset += 1
    return spans
