"""The flagship suite: batched variable-geometry crops -> resize -> normalize
-> split, one fused program — the ``tests/batchresize/`` analog
(reference ``test_batchresize_x_split3D.cu:294-355`` and
``test_batchresize_aspectratio_x_split3D.cu:60-173``).

Standard geometry mirrors the reference: large source frame, WxH=60x120 (or
30x120 for aspect-ratio runs) crops at offset (i, i), target 64x128, batch
sweeps. The cv2 oracle runs the same per-crop pipeline op by op on float32.
"""

import cv2
import numpy as np
import pytest

import cvgpuspeedup_tpu as cvgs
from conftest import check_float

UP = (64, 128)  # (w, h)


def _frame(rng, h=400, w=600, c=3):
    return rng.integers(0, 256, (h, w, c)).astype(np.uint8)


def _rects(batch, cw=60, ch=120):
    return np.array([[i, i, cw, ch] for i in range(batch)], np.int32)


def _cv_pipeline(crop, alpha, sub, div):
    r = cv2.resize(crop.astype(np.float32), UP, interpolation=cv2.INTER_LINEAR)
    r = r.reshape(UP[1], UP[0], -1)
    r = r * np.float32(alpha)
    r = r - np.asarray(sub, np.float32)
    r = r / np.asarray(div, np.float32)
    return r.transpose(2, 0, 1)  # planar like TensorSplit


@pytest.mark.parametrize("batch", [1, 10, 50])
def test_batchresize_split_vs_cv2(rng, batch):
    frame = _frame(rng)
    rects = _rects(batch)
    alpha, sub, div = 0.3, (3.2, 0.6, 11.8), (128.0, 128.0, 128.0)
    out = np.asarray(
        cvgs.execute_operations(
            cvgs.resize_batch(frame, rects=rects, dsize=cvgs.Size(*UP)),
            cvgs.convert_to(np.float32, alpha=alpha),
            cvgs.subtract(sub),
            cvgs.divide(div),
            cvgs.split_tensor(),
        )
    )
    assert out.shape == (batch, 3, UP[1], UP[0])
    for z in range(batch):
        x, y, w, h = rects[z]
        ref = _cv_pipeline(frame[y : y + h, x : x + w], alpha, sub, div)
        check_float(out[z], ref, msg=f"plane {z}")


def test_batchresize_ragged_default(rng):
    frame = _frame(rng)
    rects = _rects(8)
    out = np.asarray(
        cvgs.execute_operations(
            cvgs.resize_batch(
                frame, rects=rects, dsize=cvgs.Size(*UP),
                used_planes=5, background=128.0,
            ),
            cvgs.multiply(2.0),
        )
    )
    for z in range(5):
        x, y, w, h = rects[z]
        ref = cv2.resize(frame[y:y+h, x:x+w].astype(np.float32), UP) * 2.0
        check_float(out[z], ref, msg=f"active plane {z}")
    assert np.all(out[5:] == 256.0), "masked planes carry background through the chain"


@pytest.mark.parametrize("mode", [
    cvgs.AspectRatio.PRESERVE_AR,
    cvgs.AspectRatio.PRESERVE_AR_LEFT,
])
def test_batchresize_preserve_ar_letterbox(rng, mode):
    """Letterbox math vs the reference's own oracle formula
    (``test_batchresize_aspectratio_x_split3D.cu:86-95,125-144``): 30x120
    crops into 64x128 -> fitted size (32, 128), centered (or left-anchored),
    background elsewhere."""
    frame = _frame(rng)
    batch = 6
    rects = _rects(batch, cw=30, ch=120)
    bg = 128.0
    out = np.asarray(
        cvgs.execute_operations(
            cvgs.resize_batch(
                frame, rects=rects, dsize=cvgs.Size(*UP),
                background=bg, aspect_ratio=mode,
            ),
        )
    )
    # reference host math: scale to height; trunc; overflow -> scale to width
    scale = UP[1] / 120.0
    new_w, new_h = int(scale * 30), UP[1]
    assert new_w <= UP[0]
    ox = 0 if mode == cvgs.AspectRatio.PRESERVE_AR_LEFT else (UP[0] - new_w) // 2
    oy = 0 if mode == cvgs.AspectRatio.PRESERVE_AR_LEFT else (UP[1] - new_h) // 2
    for z in range(batch):
        x, y, w, h = rects[z]
        fitted = cv2.resize(
            frame[y:y+h, x:x+w].astype(np.float32), (new_w, new_h),
            interpolation=cv2.INTER_LINEAR,
        )
        expect = np.full((UP[1], UP[0], 3), bg, np.float32)
        expect[oy:oy+new_h, ox:ox+new_w] = fitted
        check_float(out[z], expect, msg=f"letterbox plane {z} ({mode.name})")


def test_batchresize_stack_mode(rng):
    """Independent ragged images (list input, padded+stacked internally)."""
    imgs = [
        _frame(rng, 100, 50), _frame(rng, 80, 120), _frame(rng, 37, 61),
    ]
    out = np.asarray(
        cvgs.execute_operations(
            cvgs.resize_batch(imgs, dsize=cvgs.Size(32, 32)),
        )
    )
    assert out.shape == (3, 32, 32, 3)
    for z, im in enumerate(imgs):
        ref = cv2.resize(im.astype(np.float32), (32, 32), interpolation=cv2.INTER_LINEAR)
        check_float(out[z], ref, msg=f"stack plane {z}")


def test_batchresize_rn_even(rng):
    """PRESERVE_AR_RN_EVEN rounds fitted dims to even numbers."""
    frame = _frame(rng)
    rects = np.array([[0, 0, 33, 120]], np.int32)  # fitted w = 35 -> 36 even
    out = np.asarray(
        cvgs.execute_operations(
            cvgs.resize_batch(
                frame, rects=rects, dsize=cvgs.Size(*UP),
                background=0.0, aspect_ratio=cvgs.AspectRatio.PRESERVE_AR_RN_EVEN,
            ),
        )
    )
    scale = UP[1] / 120.0
    new_w = int(scale * 33)          # 35
    new_w = min(((new_w + 1) // 2) * 2, UP[0])  # 36
    ox = (UP[0] - new_w) // 2
    col_has_content = (np.abs(out[0]).sum(axis=(0, 2)) > 0)
    assert col_has_content[ox] and col_has_content[ox + new_w - 1]
    assert not col_has_content[ox - 1] if ox > 0 else True
