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


def test_video_frame_sampling_raw_buffer():
    from agentic_rag_for_multi_model_pdf_extraction_ray.stages.media import (
        sample_video_frames,
    )

    w, h, f = 8, 6, 10
    vid = np.arange(f * h * w * 3, dtype=np.uint64).astype(np.uint8)
    frames = sample_video_frames(vid.tobytes(), w, h, stride=3)
    assert frames.shape == (4, h, w, 3)  # frames 0, 3, 6, 9
    full = vid.reshape(f, h, w, 3)
    assert np.array_equal(frames[1], full[3])
    capped = sample_video_frames(vid.tobytes(), w, h, stride=1, max_frames=2)
    assert capped.shape == (2, h, w, 3)
    # ragged tail: trailing partial frame dropped, not an error
    assert sample_video_frames(vid.tobytes()[:-5], w, h).shape[0] == f - 1
    assert sample_video_frames(b"\x00" * 10, w, h) is None


def test_audio_features_pcm16():
    from agentic_rag_for_multi_model_pdf_extraction_ray.stages.media import (
        audio_features_pcm16,
    )

    t = np.arange(16000, dtype=np.float64) / 16000.0
    x = (10000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    feats = audio_features_pcm16(x.tobytes(), sample_rate=16000)
    assert feats["n_samples"] == 16000
    assert abs(feats["duration_sec"] - 1.0) < 1e-9
    # sine RMS ≈ amplitude/√2; 440 Hz crosses zero ~880 times/sec
    assert abs(feats["rms"] - 10000 / np.sqrt(2)) < 100
    assert abs(feats["zero_crossing_rate"] * 16000 - 880) < 10
    assert feats["peak"] <= 10000
    assert audio_features_pcm16(b"\x01") is None  # odd length
    assert audio_features_pcm16(b"") is None


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
