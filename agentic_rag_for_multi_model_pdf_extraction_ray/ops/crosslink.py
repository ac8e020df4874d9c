"""Cross-reference link detection + attach.

The reference's only *implemented* linking logic is a keyword detector
(``/root/reference/src/integrations/crew_mlx_tools.py:358-396``): a
chunk whose text contains one of the cross-reference keywords gets a
link record with fixed confidence 0.8 (the LLM LinkingCrew is skipped,
``crewai_pipeline.py:239-242``).  The attach step is a tiny
nested-loop join (``crewai_pipeline.py:296-299``) — here a broadcast
lookup inside ``map_batches`` (links are small by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

CROSSREF_KEYWORDS = ("see figure", "table", "section", "refer to")
LINK_CONFIDENCE = 0.8


def detect_crosslinks(chunks: rd.Dataset, id_col: str = "chunk_id",
                      text_col: str = "structured_text") -> rd.Dataset:
    """→ link rows (source_chunk_id, link_type, confidence, keyword).

    Vectorized: one case-insensitive substring scan per keyword
    (pandas str.contains, compiled once), no row loop.
    """

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("").str.lower()
        out = []
        for kw in CROSSREF_KEYWORDS:
            hit = t.str.contains(kw, regex=False)
            if hit.any():
                sub = batch[hit]
                out.append(pd.DataFrame({
                    "source_chunk_id": sub[id_col],
                    "link_type": "cross_reference",
                    "confidence": np.float32(LINK_CONFIDENCE),
                    "keyword": kw,
                }))
        if not out:
            return pd.DataFrame({
                "source_chunk_id": pd.Series([], dtype=batch[id_col].dtype),
                "link_type": pd.Series([], dtype=str),
                "confidence": pd.Series([], dtype=np.float32),
                "keyword": pd.Series([], dtype=str),
            })
        return pd.concat(out, ignore_index=True)

    return chunks.map_batches(f, batch_format="pandas")


def attach_crosslinks(chunks: rd.Dataset, links: pd.DataFrame,
                      id_col: str = "chunk_id") -> rd.Dataset:
    """J3: per-chunk link count + keywords via broadcast lookup (the
    link table is small; no shuffle)."""
    agg = links.groupby("source_chunk_id").agg(
        n_links=("keyword", "size"), link_keywords=("keyword", lambda s: ",".join(sorted(s)))
    )
    ref = ray.put(agg)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        a = ray.get(ref)
        batch = batch.merge(a, left_on=id_col, right_index=True, how="left")
        batch["n_links"] = batch["n_links"].fillna(0).astype("int64")
        batch["link_keywords"] = batch["link_keywords"].fillna("")
        return batch

    return chunks.map_batches(f, batch_format="pandas")
