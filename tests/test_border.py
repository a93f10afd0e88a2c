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


def test_border_then_resize(rng):
    """Border read as back-op of a resize (fused virtual image)."""
    img = rng.integers(0, 256, (12, 16, 3)).astype(np.uint8)
    virtual = cvgs.make_border(img, 2, 2, 2, 2, mode=cvgs.BorderMode.REPLICATE)
    out = np.asarray(cvgs.execute_operations(cvgs.resize(virtual, cvgs.Size(8, 8))))
    ref_src = cv2.copyMakeBorder(img, 2, 2, 2, 2, cv2.BORDER_REPLICATE)
    ref = cv2.resize(ref_src.astype(np.float32), (8, 8), interpolation=cv2.INTER_LINEAR)
    from conftest import check_float
    check_float(out, ref, msg="border->resize")
