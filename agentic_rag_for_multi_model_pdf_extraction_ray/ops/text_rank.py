"""BM25 relevance scoring over a document table — the classic
sparse-retrieval ranker a training-data / retrieval pipeline runs next
to the dense (embedding) path.  The reference retrieves dense-only
(``/root/reference/src/core/store.py:79-99``); BM25 is the engine's
sparse complement, exactly SQL-mirrorable so the DuckDB oracle can
check it value-for-value.

Scale shape — TWO streaming passes over the corpus, NO shuffle of
corpus rows, nothing corpus-sized on the driver:

  pass 1 (stats): per-batch partials of (N, Σdl, df per query term)
          → one tiny driver-side reduce (Q+2 numbers).
  pass 2 (score): broadcast the (tiny) term stats, per-batch
          vectorized tf → BM25 score → partial top-k per batch →
          single tiny global merge (k × #batches rows max).

Tokenization matches the engine-wide contract: ``lower().split()``
(ASCII whitespace — the RE2/DuckDB dialect, see functions/text.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.rounding import round_half_up

K1 = 1.2
B = 0.75


def _tf_matrix(texts, terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(tf[doc, term], dl[doc]) for a batch — one split pass, then one
    vectorized equality-count per query term (Q is tiny)."""
    toks_per_doc = [(t or "").lower().split() for t in texts]
    dl = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    flat = np.array([w for toks in toks_per_doc for w in toks], dtype=object)
    ends = np.cumsum(dl)
    starts = ends - dl
    tf = np.zeros((len(dl), len(terms)), dtype=np.int64)
    if len(flat):
        for j, term in enumerate(terms):
            # cumsum difference per segment — safe for zero-token docs
            # (reduceat rejects offsets at the end of the array)
            csum = np.concatenate([[0], np.cumsum(flat == term)])
            tf[:, j] = csum[ends] - csum[starts]
    return tf, dl


def bm25_score(docs: rd.Dataset, query: str, k: int = 20,
               id_col: str = "doc_id", text_col: str = "text",
               k1: float = K1, b: float = B) -> pd.DataFrame:
    """Top-k docs by BM25(query) → (id_col, score) sorted by
    (score desc, id asc).  Docs matching no query term are excluded
    (score 0 rows carry no ranking information)."""
    terms = list(dict.fromkeys(query.lower().split()))
    if not terms:
        return pd.DataFrame({id_col: pd.Series(dtype=object),
                             "score": pd.Series(dtype="float64")})

    def partial_stats(batch: pd.DataFrame) -> pd.DataFrame:
        tf, dl = _tf_matrix(batch[text_col].tolist(), terms)
        keep = dl > 0  # empty docs don't count toward N / avgdl
        return pd.DataFrame({
            "n": [int(keep.sum())],
            "sum_dl": [int(dl.sum())],
            **{f"df_{j}": [int((tf[keep, j] > 0).sum())]
               for j in range(len(terms))},
        })

    stats = docs.map_batches(partial_stats, batch_format="pandas",
                             batch_size=None).to_pandas()
    n_docs = int(stats["n"].sum())
    if n_docs == 0:
        return pd.DataFrame({id_col: pd.Series(dtype=object),
                             "score": pd.Series(dtype="float64")})
    avgdl = stats["sum_dl"].sum() / n_docs
    df = np.array([int(stats[f"df_{j}"].sum()) for j in range(len(terms))],
                  dtype=np.float64)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    bundle = ray.put((terms, idf, avgdl))

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        t, idf_, avg = ray.get(bundle)
        tf, dl = _tf_matrix(batch[text_col].tolist(), t)
        denom = tf + (k1 * (1.0 - b + b * (dl[:, None] / avg)))
        s = (idf_[None, :] * (tf * (k1 + 1.0)) / denom).sum(axis=1)
        out = pd.DataFrame({id_col: batch[id_col].to_numpy(),
                            "score": round_half_up(s, 6)})
        out = out[s > 0]
        return out.sort_values(["score", id_col],
                               ascending=[False, True]).head(k)

    partials = docs.map_batches(partial_topk, batch_format="pandas",
                                batch_size=4096).to_pandas()
    if partials.empty:
        return pd.DataFrame({id_col: pd.Series(dtype=object),
                             "score": pd.Series(dtype="float64")})
    return (partials.sort_values(["score", id_col], ascending=[False, True])
            .head(k).reset_index(drop=True))
