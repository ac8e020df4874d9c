"""Seeded deterministic generator of the interleaved raw corpus.

Produces ``documents_raw`` rows (FIXTURES.md §2): an HTML-ish payload
with boilerplate noise, inline markdown tables and figure placeholders
around main-content text, plus synthetic media blobs.  Everything is a
pure function of ``(doc_id, base_text)`` — no global RNG — so the same
row is produced on any worker, any run, any partition layout (the
precondition for span-equality testing and checkpointed resume).

Two entry paths:

* :func:`synthesize_raw_batch` — an Arrow ``map_batches`` transform
  turning the driver's ``documents`` test table (``doc_id:int64,
  text:string``) into ``documents_raw`` rows *inside* the pipeline, so
  corpus synthesis streams at any scale (no driver-side materialize).
* :func:`generate_corpus` — writes a standalone parquet corpus for
  tests / benchmarks.

Doc sizes are drawn log-normal so a few mega-docs exist (skew-bucketing
exercise, SURVEY.md §4.2).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .functions.hashing import stable_hash64
from .schema import DOCUMENTS_RAW_SCHEMA

_FILLER = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega data span table figure "
    "stream batch shuffle partition offset corpus layout region heading caption"
).split()

_NAV = '<nav><a href="/">home</a> | <a href="/docs">docs</a> | <a href="/about">about</a></nav>'
_FOOTER = "<footer>(c) 2026 corpus-synth · privacy · terms</footer>"
_LINKBAR = '<div><a href="#1">1</a> <a href="#2">2</a> <a href="#3">3</a> <a href="#4">4</a></div>'


def _rng_for(doc_id: str) -> np.random.RandomState:
    return np.random.RandomState(stable_hash64("synth:" + doc_id) % (2**32))


def _media_bytes(media_ref: str) -> bytes:
    """Small deterministic fake image payload (no real codecs in env)."""
    h = hashlib.blake2b(media_ref.encode(), digest_size=32).digest()
    return h * 4  # 128 bytes


def synthesize_raw_doc(doc_id: str, base_text: str) -> dict:
    """Build one documents_raw row deterministically from (doc_id, text)."""
    rng = _rng_for(doc_id)
    words = base_text.split() or ["empty"]
    pool = words + _FILLER

    n_pages = int(np.clip(np.round(np.exp(rng.normal(0.6, 0.7))), 1, 16))
    pages: list[str] = []
    media: list[dict] = []
    fig_counter = 0

    for p in range(n_pages):
        lines: list[str] = [_NAV]
        # tables: 0-2 per page, some invalid (single data row < MIN_TABLE_ROWS
        # after header? rows counted raw: 1-row block is invalid)
        for _ in range(rng.randint(0, 3)):
            n_rows = rng.randint(1, 5)  # 1 → invalid table, exercised on purpose
            n_cols = rng.randint(2, 5)
            for r in range(n_rows):
                cells = [pool[rng.randint(0, len(pool))] for _ in range(n_cols)]
                lines.append("| " + " | ".join(cells) + " |")
            lines.append("")
        # figures: 0-3 per page, some below the 80px floor
        for _ in range(rng.randint(0, 4)):
            w = int(rng.randint(40, 220))
            h = int(rng.randint(40, 220))
            ref = f"crop://{doc_id}/{fig_counter}"
            fig_counter += 1
            lines.append(f'<img src="{ref}" width="{w}" height="{h}"/>')
            media.append(
                {"media_ref": ref, "width": w, "height": h, "data": _media_bytes(ref)}
            )
        lines.append(_LINKBAR)
        # main text: a deterministic slice of the word stream; some pages
        # come out short (<40 chars) to exercise the min-text rule
        if rng.rand() < 0.15:
            n_words = rng.randint(1, 6)
        else:
            n_words = rng.randint(12, 80)
        start = rng.randint(0, len(pool))
        text_words = [pool[(start + k) % len(pool)] for k in range(n_words)]
        # split into a few lines with inline emphasis tags to strip
        per_line = max(6, n_words // max(1, rng.randint(1, 4)))
        for i in range(0, n_words, per_line):
            seg = " ".join(text_words[i : i + per_line])
            if rng.rand() < 0.3:
                seg = f"<b>{seg}</b>"
            lines.append(seg)
        lines.append(_FOOTER)
        pages.append("\n".join(lines))

    payload = "\f".join(pages)
    return {
        "doc_id": doc_id,
        "payload": payload,
        "media": media,
        "doc_bytes": len(payload.encode("utf-8")) + sum(len(m["data"]) for m in media),
    }


def synthesize_raw_batch(batch: pa.Table) -> pa.Table:
    """Arrow batch transform: documents(doc_id int64, text) → documents_raw.

    Runs inside ``map_batches(..., batch_format="pyarrow")``; per-row
    work is whole-document payload construction (the natural unit, like
    the reference's per-PDF parse).
    """
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    rows = [
        synthesize_raw_doc(f"doc-{int(i):012d}", t or "") for i, t in zip(ids, texts)
    ]
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_RAW_SCHEMA)


def generate_corpus(n_docs: int, seed: int = 42) -> pa.Table:
    """Standalone seeded corpus (tests): n_docs documents_raw rows."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_docs):
        n = rng.randint(5, 60)
        base = " ".join(_FILLER[rng.randint(0, len(_FILLER))] for _ in range(n))
        rows.append(synthesize_raw_doc(f"doc-{i:012d}", base))
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_RAW_SCHEMA)
