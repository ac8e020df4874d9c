"""Embedding stage — actor-pool analogue of the reference's
SentenceTransformer embedder (T6, ``/root/reference/src/core/store.py:32-54``:
e5-small, 384-d, L2-normalized, batch_size 32).

No model weights exist in this container, so the "model" is a
deterministic feature-hashing encoder: tokens are hashed into a
``dim``-bucket bag-of-words vector which is L2-normalized.  The
*operator shape* is the real thing — weights "loaded" once per actor in
``__init__``, batched vectorized ``__call__``, fixed-size float32
vectors out — and the output feeds the cosine dedup / ANN operators
exactly like real embeddings would.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions.hashing import hash_tokens

from ..util import default_actor_pool


class HashingEmbedder:
    """Callable-class stage: adds an ``embedding`` (list<float32>[dim])
    column derived from ``text_col``."""

    def __init__(self, dim: int = 384, text_col: str = "structured_text") -> None:
        self.dim = dim
        self.text_col = text_col
        # "model load": the token→bucket hash is derived per call from
        # stable_hash64; nothing mutable is shared between batches.

    def _encode(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, dtype=np.float32)
        h = hash_tokens(text.lower().split())
        if len(h):
            idx = (h % np.uint64(self.dim)).astype(np.int64)
            sign = np.where((h >> np.uint64(63)) > 0, np.float32(1.0),
                            np.float32(-1.0))
            np.add.at(v, idx, sign)
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # batched encode: hash every token once, scatter-add into the
        # (rows × dim) matrix — honest about batch shape (a real model
        # call is one forward pass per batch, not per row).  ±1 sums in
        # float32 are exact, so this equals per-row _encode bit-for-bit.
        toks_per_row = [(t or "").lower().split() for t in batch[self.text_col]]
        lens = np.fromiter((len(t) for t in toks_per_row), dtype=np.int64,
                           count=len(toks_per_row))
        M = np.zeros((len(toks_per_row), self.dim), dtype=np.float32)
        flat = [tok for toks in toks_per_row for tok in toks]
        if flat:
            h = hash_tokens(flat)  # one C-speed pass, no per-token Python
            idx = (h % np.uint64(self.dim)).astype(np.int64)
            sign = np.where((h >> np.uint64(63)) > 0, np.float32(1.0),
                            np.float32(-1.0))
            rows = np.repeat(np.arange(len(toks_per_row)), lens)
            np.add.at(M, (rows, idx), sign)
        n = np.linalg.norm(M, axis=1, keepdims=True)
        n[n == 0] = 1.0
        M /= n
        batch["embedding"] = list(M)
        return batch


def embed(ds: rd.Dataset, dim: int = 384, text_col: str = "structured_text",
          concurrency=None, batch_size: int = 256) -> rd.Dataset:
    if concurrency is None:
        concurrency = default_actor_pool()
    return ds.map_batches(
        HashingEmbedder,
        fn_constructor_kwargs={"dim": dim, "text_col": text_col},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
