#!/usr/bin/env python
"""Example: detection preprocessing — N crops of one frame, ONE fused kernel.

The reference's flagship scenario (README.md:90-136): an object detector
yields N boxes per video frame; each box must be cropped, resized to the
classifier input, normalized, and laid out planar. Classic per-op libraries
launch 5 kernels per box; this runs the whole batch as one fused program.

Run: python examples/detection_preprocessing.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cvgpuspeedup_tpu as cvgs

# a 1080p frame and 20 detections with different sizes
rng = np.random.default_rng(0)
frame = rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8)
rects = np.array(
    [[40 * i, 30 * i, 60 + (i % 5) * 8, 120 + (i % 3) * 10] for i in range(20)],
    np.int32,
)

out = cvgs.execute_operations(
    cvgs.resize_batch(
        frame,
        rects=rects,
        dsize=cvgs.Size(64, 128),
        used_planes=len(rects),
        background=114.0,                       # letterbox gray
        aspect_ratio=cvgs.AspectRatio.PRESERVE_AR,
    ),
    cvgs.convert_to(np.float32, alpha=1 / 255.0),
    cvgs.subtract((0.485, 0.456, 0.406)),       # ImageNet mean
    cvgs.divide((0.229, 0.224, 0.225)),         # ImageNet std
    cvgs.split_tensor(),                        # planar (N, C, H, W)
)
print("classifier input batch:", out.shape, out.dtype)

# next frame: new boxes, same compiled program (no rebuild, no recompile)
out2 = cvgs.execute_operations(
    cvgs.resize_batch(frame, rects=rects + 3, dsize=cvgs.Size(64, 128),
                      used_planes=17, background=114.0,
                      aspect_ratio=cvgs.AspectRatio.PRESERVE_AR),
    cvgs.convert_to(np.float32, alpha=1 / 255.0),
    cvgs.subtract((0.485, 0.456, 0.406)),
    cvgs.divide((0.229, 0.224, 0.225)),
    cvgs.split_tensor(),
)
print("second frame (cache hit):", out2.shape)
