"""Preset pipelines (the deployment-facing API surface)."""

import numpy as np
import cv2

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.pipelines.presets import (
    camera_pipeline,
    detection_preprocessor,
    temporal_window,
)
from conftest import check_float


def test_detection_preprocessor(rng):
    frame = rng.integers(0, 256, (296, 384, 3)).astype(np.uint8)
    rects = np.array([[i, i, 60, 120] for i in range(8)], np.int32)
    prep = detection_preprocessor(
        dsize=cvgs.Size(64, 128), mean=(127.5,) * 3, scale=(128.0,) * 3,
    )
    out = np.asarray(prep(frame, rects, used_planes=8))
    assert out.shape == (8, 3, 128, 64)
    crop = frame[2:122, 2:62].astype(np.float32)
    ref = (cv2.resize(crop, (64, 128)) - 127.5) / 128.0
    check_float(out[2], ref.transpose(2, 0, 1), msg="preset plane 2")


def test_temporal_window(rng):
    tw = temporal_window(window=3, dsize=cvgs.Size(16, 8))
    for k in range(5):
        t = tw.push(np.full((32, 64, 3), (k + 1) * 10, np.uint8))
    t = np.asarray(t)
    assert t.shape == (3, 3, 8, 16)
    # newest first: planes hold frames 5,4,3 scaled by 1/255
    for z, k in enumerate([5, 4, 3]):
        check_float(t[z], np.full((3, 8, 16), k * 10 / 255.0), msg=f"window z={z}")


def test_camera_pipeline(rng):
    h, w = 32, 64
    buf = rng.integers(0, 256, (h * 3 // 2, w)).astype(np.uint8)
    cam = camera_pipeline(out_size=cvgs.Size(32, 16), alpha=True)
    out = np.asarray(cam(buf))
    assert out.shape == (16, 32, 4) and out.dtype == np.uint8
    assert np.all(out[..., 3] == 255)
