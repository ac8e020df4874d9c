"""Multimodal (image/audio) stages — real Ray plumbing, stubbed codecs.

The reference holds PIL images in memory and processes them with an
MLX vision model or pytesseract OCR
(``/root/reference/src/core/parser.py:66-118``,
``src/agents/extraction.py:220-306``).  Neither PIL nor any codec
library exists in this container, so the *decode* step is gated: if
PIL is importable it is used; otherwise a deterministic fake decoder
stands in (clearly marked).  Everything around it — binary columns,
typed metadata, small batch sizes for large payloads, actor-pool
signature, output layout — is the real production shape and is tested.

Media rows: (media_ref: string, width: int32, height: int32,
data: binary)  — the ``media`` list column of documents_raw, exploded.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

try:  # gated: not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def explode_media_batch(batch: pa.Table) -> pa.Table:
    """documents_raw → one row per media object (vectorized via Arrow
    list offsets)."""
    media = batch.column("media").combine_chunks()
    flat = media.flatten()
    counts = pa.compute.list_value_length(media).fill_null(0).to_numpy(zero_copy_only=False)
    doc_ids = batch.column("doc_id").combine_chunks().take(
        pa.array(np.repeat(np.arange(len(counts)), counts))
    )
    return pa.Table.from_arrays(
        [doc_ids, flat.field("media_ref"), flat.field("width"),
         flat.field("height"), flat.field("data")],
        names=["doc_id", "media_ref", "width", "height", "data"],
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decode + featurize media blobs.

    ``__init__`` is where a real model/codec would load once per actor.
    With no codec available the decode is a DETERMINISTIC FAKE: feature
    = first 8 bytes of blake2b(data), "decoded" dims pass through.
    Batches must stay small — binary payloads make rows wide
    (``batch_size`` 32 default; at 100 TB, blocks of media rows should
    also get a larger target_max_block_size so they aren't split
    absurdly small).
    """

    def __init__(self, thumbnail_px: int = 64) -> None:
        self.thumbnail_px = thumbnail_px
        self.have_pil = HAVE_PIL

    def _decode_fake(self, data: bytes, w: int, h: int) -> dict:
        digest = hashlib.blake2b(data or b"", digest_size=8).hexdigest()
        tw = min(self.thumbnail_px, int(w))
        th = min(self.thumbnail_px, int(h))
        return {"feature": digest, "thumb_w": tw, "thumb_h": th}

    def _decode_pil(self, data: bytes, w: int, h: int) -> dict:
        raise NotImplementedError(
            "real decode path requires PIL + codec libraries; "
            "this container has none (install pillow to enable)"
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        decode = self._decode_pil if self.have_pil else self._decode_fake
        feats = [
            decode(d, w, h)
            for d, w, h in zip(batch["data"], batch["width"], batch["height"])
        ]
        batch = batch.drop(columns=["data"])  # features out, blobs dropped
        batch["feature"] = [f["feature"] for f in feats]
        batch["thumb_w"] = np.array([f["thumb_w"] for f in feats], dtype=np.int32)
        batch["thumb_h"] = np.array([f["thumb_h"] for f in feats], dtype=np.int32)
        return batch


def extract_media_features(raw_ds: rd.Dataset, concurrency: int = 2,
                           batch_size: int = 32) -> rd.Dataset:
    """documents_raw → per-media feature rows (decode on an actor pool,
    small batches because rows carry binary payloads)."""
    media_rows = raw_ds.map_batches(explode_media_batch, batch_format="pyarrow")
    return media_rows.map_batches(
        MediaFeatureExtractor,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
