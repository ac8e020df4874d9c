"""Result sinks.

* chunk JSON writer — S4 (``/root/reference/src/utils/serialization.py:20-68``):
  per-document JSON dumps with the 500-char display truncation applied
  AT THE SINK only (M16 truncations are display projections, never
  data-path semantics — SURVEY.md §2.2).
* answer JSON writer — S5 (``serialization.py:71-108``).
* dataset sinks: partitioned parquet via the manifest writer
  (state/manifest.py) or plain ``write_parquet``/``write_json``.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import ray.data as rd

DISPLAY_TRUNC = 500


def write_chunks_json(chunks: rd.Dataset, out_dir: str,
                      truncate: int = DISPLAY_TRUNC) -> None:
    """One JSON file per output block, rows shaped like the reference's
    ``<stem>_chunks.json`` entries."""
    os.makedirs(out_dir, exist_ok=True)

    def project(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        st = b["structured_text"].fillna("")
        b["structured_text"] = st.where(
            st.str.len() <= truncate, st.str.slice(0, truncate) + "..."
        )
        return b

    chunks.map_batches(project, batch_format="pandas").write_json(out_dir)


def save_answer_json(answer: dict, path: str, truncate_reasoning: int = 1000) -> None:
    """S5: single small driver-side result (never a dataset op)."""
    out = dict(answer)
    if len(out.get("reasoning_trace") or "") > truncate_reasoning:
        out["reasoning_trace"] = out["reasoning_trace"][:truncate_reasoning] + "..."
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, ensure_ascii=False, indent=2)
