#!/usr/bin/env python
"""Example: CircularTensor temporal window for a SLAM / temporal-model
front-end.

The reference's CircularTensor scenario (README.md:149-155): a temporal
network consumes the last K frames, preprocessed and stacked planar. Each
incoming frame is resized+normalized AND the window shifted in ONE fused
device program with the ring buffer donated (in-place HBM reuse).

Run: python examples/temporal_window_slam.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.pipelines.presets import temporal_window

K = 15  # the reference demos a 15-frame window

window = temporal_window(
    window=K,
    dsize=cvgs.Size(320, 192),
    alpha=1 / 255.0,
    order=cvgs.CircularTensorOrder.NEWEST_FIRST,
    planes=cvgs.ColorPlanes.STANDARD,   # (K, C, H, W) — temporal model input
)

rng = np.random.default_rng(2)
for t in range(20):
    frame = rng.integers(0, 256, (480, 800, 3)).astype(np.uint8)
    tensor = window.push(frame)

print("temporal stack:", tensor.shape, tensor.dtype)  # (15, 3, 192, 320)

# the same ring with raw op control (order/layout variants, custom chains):
ring = cvgs.CircularTensor(width=64, height=64, channels=3, batch=8,
                           order=cvgs.CircularTensorOrder.OLDEST_FIRST,
                           planes=cvgs.ColorPlanes.TRANSPOSED)
for t in range(10):
    frame = rng.integers(0, 256, (128, 128, 3)).astype(np.uint8)
    ring.update(
        cvgs.resize(cvgs.image(frame), cvgs.Size(64, 64)),
        cvgs.convert_to(np.float32, alpha=2.0, beta=-1.0),
    )
print("transposed ring:", ring.tensor.shape)  # (3, 8, 64, 64)
