"""Pure-numpy pixmap→RGB conversion (the reference's
parser.py:66-110 color handling, PIL-free) + thumbnailing + the
raw-samples decode path in MediaFeatureExtractor."""

import numpy as np
import pandas as pd

from agentic_rag_for_multi_model_pdf_extraction_ray.stages.media import (
    MediaFeatureExtractor,
    pixmap_to_rgb,
    thumbnail_rgb,
)


def test_rgb_passthrough():
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    out = pixmap_to_rgb(rgb.tobytes(), 3, 2, 3)
    assert np.array_equal(out, rgb)


def test_gray_replicates():
    g = np.array([[0, 128], [255, 7]], dtype=np.uint8)
    out = pixmap_to_rgb(g.tobytes(), 2, 2, 1)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out[:, :, 0], g)
    assert np.array_equal(out[:, :, 1], g)


def test_rgba_composites_over_white():
    # fully transparent red pixel → white; opaque red → red
    px = np.array([[[255, 0, 0, 0], [255, 0, 0, 255]]], dtype=np.uint8)
    out = pixmap_to_rgb(px.tobytes(), 2, 1, 4)
    assert np.array_equal(out[0, 0], [255, 255, 255])
    assert np.array_equal(out[0, 1], [255, 0, 0])
    # half alpha → blended halfway
    half = np.array([[[0, 0, 0, 128]]], dtype=np.uint8)
    out2 = pixmap_to_rgb(half.tobytes(), 1, 1, 4)
    assert abs(int(out2[0, 0, 0]) - 127) <= 1


def test_cmyk_inversion():
    # pure cyan, no black → (0, 255, 255); pure black → (0,0,0)
    cyan = np.array([[[255, 0, 0, 0]]], dtype=np.uint8)
    out = pixmap_to_rgb(cyan.tobytes(), 1, 1, 4, colorspace="cmyk")
    assert np.array_equal(out[0, 0], [0, 255, 255])
    black = np.array([[[0, 0, 0, 255]]], dtype=np.uint8)
    out2 = pixmap_to_rgb(black.tobytes(), 1, 1, 4, colorspace="cmyk")
    assert np.array_equal(out2[0, 0], [0, 0, 0])


def test_insufficient_buffer_skipped():
    assert pixmap_to_rgb(b"\x00" * 10, 4, 4, 3) is None  # needs 48
    assert pixmap_to_rgb(b"", 4, 4, 3) is None
    assert pixmap_to_rgb(b"\x00" * 48, 4, 4, 5) is None  # bad n


def test_thumbnail_keeps_aspect_and_small_passthrough():
    big = np.zeros((200, 100, 3), dtype=np.uint8)
    t = thumbnail_rgb(big, 64)
    assert t.shape[0] == 64 and 30 <= t.shape[1] <= 34
    small = np.zeros((10, 20, 3), dtype=np.uint8)
    assert thumbnail_rgb(small, 64) is small


def test_extractor_uses_raw_samples_path():
    w, h = 100, 90
    raw = np.random.RandomState(0).randint(0, 256, size=(h, w, 3),
                                           dtype=np.uint8)
    batch = pd.DataFrame({
        "doc_id": ["d1", "d2"],
        "media_ref": ["m1", "m2"],
        "width": np.array([w, 16], dtype=np.int32),
        "height": np.array([h, 16], dtype=np.int32),
        "data": [raw.tobytes(), b"\x01\x02\x03"],  # raw samples vs opaque blob
    })
    out = MediaFeatureExtractor(thumbnail_px=32)(batch.copy())
    # raw-samples row: real numpy decode, thumbnail ≤ 32 on the long edge
    assert out.loc[0, "thumb_w"] <= 32 and out.loc[0, "thumb_h"] <= 32
    # feature of the raw row = hash of the actual thumbnail pixels
    rgb = pixmap_to_rgb(raw.tobytes(), w, h, 3)
    import hashlib

    expected = hashlib.blake2b(thumbnail_rgb(rgb, 32).tobytes(),
                               digest_size=8).hexdigest()
    assert out.loc[0, "feature"] == expected
    # opaque blob falls back to the gated fake
    assert len(out.loc[1, "feature"]) == 16
