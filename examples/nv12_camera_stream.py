#!/usr/bin/env python
"""Example: NV12 camera stream -> fused convert+resize ("ComputeWhatYouSee").

Mirrors the reference's 6K NV12 scenario (tests/resize/test_fused_resize.cu):
the YUV->RGB conversion happens *inside* the fused read, so only the pixels
the resize actually samples are converted. Frames stream through the native
C++ prefetch ring.

Run: python examples/nv12_camera_stream.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.utils.frameloader import FrameLoader, frame_shape_nv12

W, H = 1280, 720

# synthesize a short NV12 stream on disk (a real deployment points at a
# camera ring buffer or capture file)
rng = np.random.default_rng(1)
frames = rng.integers(0, 256, (8,) + frame_shape_nv12(W, H)).astype(np.uint8)
path = os.path.join(tempfile.mkdtemp(), "camera.nv12")
with open(path, "wb") as f:
    f.write(frames.tobytes())

with FrameLoader(path, frame_shape_nv12(W, H), ring_depth=4) as loader:
    print(f"native loader: {loader.native}, {loader.num_frames} frames")
    for k, nv12 in enumerate(loader):
        rgb_small = cvgs.execute_operations(
            cvgs.resize(
                cvgs.fuse(
                    cvgs.read_yuv(nv12.copy()),
                    cvgs.convert_yuv_to_rgb(
                        standard=cvgs.ColorStandard.BT709,
                        color_range=cvgs.ColorRange.LIMITED,
                        out_dtype=np.float32,
                    ),
                ),
                cvgs.Size(640, 360),
            ),
            cvgs.convert_to(np.uint8),
        )
        if k == 0:
            print("fused NV12->RGB->resize output:", rgb_small.shape, rgb_small.dtype)
print("stream done")
