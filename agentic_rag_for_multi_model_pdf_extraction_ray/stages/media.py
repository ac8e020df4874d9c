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

from ..util import default_actor_pool

try:  # gated: not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def pixmap_to_rgb(samples: bytes, width: int, height: int,
                  n_components: int, colorspace: str = "auto") -> np.ndarray | None:
    """Raw pixmap samples → (h, w, 3) uint8 RGB, pure numpy — the
    reference's pixmap→RGB conversion (``src/core/parser.py:66-110``:
    RGBA/CMYK → csRGB, insufficient-data skip) without PIL/pymupdf.

    * 1 component: grayscale, replicated to RGB
    * 2: gray+alpha, alpha-composited over white
    * 3: RGB pass-through
    * 4: RGBA (alpha-composite over white) or CMYK (naive inversion
      R=255(1−C)(1−K)) — ``colorspace`` disambiguates; "auto" assumes
      RGBA, pymupdf's common case
    * buffer shorter than width×height×n → None (the reference's
      "insufficient data … Skipping" fallback)
    """
    n = int(n_components)
    need = int(width) * int(height) * n
    buf = np.frombuffer(samples or b"", dtype=np.uint8)
    if n not in (1, 2, 3, 4) or need <= 0 or len(buf) < need:
        return None
    px = buf[:need].reshape(int(height), int(width), n).astype(np.float64)
    if n == 1:
        rgb = np.repeat(px, 3, axis=2)
    elif n == 2:
        a = px[:, :, 1:2] / 255.0
        gray = px[:, :, 0:1] * a + 255.0 * (1.0 - a)
        rgb = np.repeat(gray, 3, axis=2)
    elif n == 3:
        rgb = px
    elif colorspace == "cmyk":
        c, m, y, k = (px[:, :, i] / 255.0 for i in range(4))
        rgb = np.stack([
            255.0 * (1.0 - c) * (1.0 - k),
            255.0 * (1.0 - m) * (1.0 - k),
            255.0 * (1.0 - y) * (1.0 - k),
        ], axis=2)
    else:  # RGBA over white
        a = px[:, :, 3:4] / 255.0
        rgb = px[:, :, :3] * a + 255.0 * (1.0 - a)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def thumbnail_rgb(rgb: np.ndarray, max_px: int = 64) -> np.ndarray:
    """Nearest-neighbor downscale keeping aspect (pure numpy index
    striding — no codec)."""
    h, w = rgb.shape[:2]
    scale = max(h, w) / max_px
    if scale <= 1.0:
        return rgb
    th, tw = max(1, int(h / scale)), max(1, int(w / scale))
    yi = np.minimum((np.arange(th) * scale).astype(np.int64), h - 1)
    xi = np.minimum((np.arange(tw) * scale).astype(np.int64), w - 1)
    return rgb[yi[:, None], xi[None, :]]


def sample_video_frames(data: bytes, width: int, height: int,
                        stride: int = 1, max_frames: int | None = None
                        ) -> np.ndarray | None:
    """Raw RGB24 frame-concatenated video buffer → sampled frames
    (F', h, w, 3) uint8, pure numpy (every ``stride``-th frame, up to
    ``max_frames``).  Container formats (mp4/webm) need a codec and
    stay behind the gated stub; raw buffers — the layout a decode
    actor upstream would emit — are handled for real.  Short/ragged
    buffers → None (same skip contract as pixmap_to_rgb)."""
    frame_bytes = int(width) * int(height) * 3
    buf = np.frombuffer(data or b"", dtype=np.uint8)
    if frame_bytes <= 0 or len(buf) < frame_bytes:
        return None
    n = len(buf) // frame_bytes
    frames = buf[:n * frame_bytes].reshape(n, int(height), int(width), 3)
    out = frames[::max(1, int(stride))]
    if max_frames is not None:
        out = out[:max_frames]
    return out


def audio_features_pcm16(data: bytes, sample_rate: int = 16000) -> dict | None:
    """Raw mono int16 PCM → deterministic features, pure numpy:
    duration, RMS energy, zero-crossing rate, peak amplitude.
    Compressed audio (mp3/ogg) needs a codec — gated; raw PCM is the
    real path."""
    if not data or len(data) < 2 or len(data) % 2:
        return None
    x = np.frombuffer(data, dtype=np.int16).astype(np.float64)
    n = len(x)
    rms = float(np.sqrt((x * x).mean()))
    zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])) / max(1, n - 1))
    return {
        "n_samples": n,
        "duration_sec": n / float(sample_rate),
        "rms": rms,
        "zero_crossing_rate": zc,
        "peak": float(np.abs(x).max()),
    }


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

    def _decode_raw_samples(self, data: bytes, w: int, h: int) -> dict | None:
        """Real (codec-free) path: if the blob is raw pixmap samples
        (len = w×h×n for n∈{1,2,3,4}), convert to RGB + thumbnail with
        pure numpy (pixmap_to_rgb) and featurize the pixels."""
        for n in (3, 4, 1, 2):
            if len(data or b"") == int(w) * int(h) * n:
                rgb = pixmap_to_rgb(data, w, h, n)
                if rgb is None:
                    return None
                thumb = thumbnail_rgb(rgb, self.thumbnail_px)
                digest = hashlib.blake2b(thumb.tobytes(), digest_size=8).hexdigest()
                return {"feature": digest, "thumb_w": thumb.shape[1],
                        "thumb_h": thumb.shape[0]}
        return None

    def _decode_codec(self, data: bytes, w: int, h: int) -> dict:
        raise NotImplementedError(
            "compressed-image decode (PNG/JPEG) requires PIL; this "
            "container has none (install pillow to enable) — raw "
            "pixmap samples are handled codec-free by _decode_raw_samples"
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def decode(d, w, h):
            real = self._decode_raw_samples(d, w, h)
            if real is not None:
                return real
            if self.have_pil:
                return self._decode_codec(d, w, h)
            return self._decode_fake(d, w, h)

        feats = [
            decode(d, w, h)
            for d, w, h in zip(batch["data"], batch["width"], batch["height"])
        ]
        batch = batch.drop(columns=["data"])  # features out, blobs dropped
        batch["feature"] = [f["feature"] for f in feats]
        batch["thumb_w"] = np.array([f["thumb_w"] for f in feats], dtype=np.int32)
        batch["thumb_h"] = np.array([f["thumb_h"] for f in feats], dtype=np.int32)
        return batch


def extract_media_features(raw_ds: rd.Dataset, concurrency=None,
                           batch_size: int = 32) -> rd.Dataset:
    """documents_raw → per-media feature rows (decode on an actor pool,
    small batches because rows carry binary payloads)."""
    if concurrency is None:
        concurrency = default_actor_pool()
    media_rows = raw_ds.map_batches(explode_media_batch, batch_format="pyarrow")
    return media_rows.map_batches(
        MediaFeatureExtractor,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
