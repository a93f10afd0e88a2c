"""Border-extension reads vs cv2.copyMakeBorder (FKL border_reader analog)."""

import cv2
import numpy as np
import pytest

import cvgpuspeedup_tpu as cvgs
from conftest import check_exact

CV_MODE = {
    cvgs.BorderMode.CONSTANT: cv2.BORDER_CONSTANT,
    cvgs.BorderMode.REPLICATE: cv2.BORDER_REPLICATE,
    cvgs.BorderMode.REFLECT: cv2.BORDER_REFLECT,
    cvgs.BorderMode.REFLECT_101: cv2.BORDER_REFLECT_101,
    cvgs.BorderMode.WRAP: cv2.BORDER_WRAP,
}


@pytest.mark.parametrize("mode", list(cvgs.BorderMode))
def test_make_border_vs_cv2(rng, mode):
    img = rng.integers(0, 256, (10, 14, 3)).astype(np.uint8)
    out = np.asarray(cvgs.execute_operations(
        cvgs.make_border(img, 3, 2, 4, 1, mode=mode, value=7)
    ))
    ref = cv2.copyMakeBorder(img, 3, 2, 4, 1, CV_MODE[mode], value=(7, 7, 7))
    check_exact(out, ref, mode.name)


@pytest.mark.parametrize(
    "mode", [cvgs.BorderMode.REPLICATE, cvgs.BorderMode.REFLECT_101,
             cvgs.BorderMode.CONSTANT]
)
def test_border_under_warp(rng, mode):
    """Border read as the warp's source (the reference composes
    ``border_reader`` inside warping — ``tests/warping/test_warping_opencv.cu:18``):
    warping the border-extended virtual image must equal cv2.warpAffine of the
    cv2.copyMakeBorder result."""
    img = rng.integers(0, 256, (30, 40, 3)).astype(np.uint8)
    t, b, l, r = 4, 3, 5, 2
    virtual = cvgs.make_border(img, t, b, l, r, mode=mode, value=9)
    ang, scale = 10.0, 0.8
    m = cv2.getRotationMatrix2D((20.0, 15.0), ang, scale)
    out = np.asarray(
        cvgs.execute_operations(cvgs.warp(virtual, m, cvgs.Size(48, 40)))
    )
    ext = cv2.copyMakeBorder(img, t, b, l, r, CV_MODE[mode], value=(9, 9, 9))
    ref = cv2.warpAffine(
        ext.astype(np.float32), m, (48, 40), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    from conftest import check_float
    # cv2 CPU warp uses 1/32-px fixed-point coords (see test_warp.py)
    check_float(out, ref, tol=2e-2, msg=f"border({mode.name})->warp vs cv2")


def test_border_then_resize(rng):
    """Border read as back-op of a resize (fused virtual image)."""
    img = rng.integers(0, 256, (12, 16, 3)).astype(np.uint8)
    virtual = cvgs.make_border(img, 2, 2, 2, 2, mode=cvgs.BorderMode.REPLICATE)
    out = np.asarray(cvgs.execute_operations(cvgs.resize(virtual, cvgs.Size(8, 8))))
    ref_src = cv2.copyMakeBorder(img, 2, 2, 2, 2, cv2.BORDER_REPLICATE)
    ref = cv2.resize(ref_src.astype(np.float32), (8, 8), interpolation=cv2.INTER_LINEAR)
    from conftest import check_float
    check_float(out, ref, msg="border->resize")
