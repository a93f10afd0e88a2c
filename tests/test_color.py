"""cvtColor parity vs cv2 across the whole supported-code whitelist —
the ``tests/color/test_cvtColor.cu:102-123`` analog (16 codes x depths,
integer outputs bit-exact incl. the fixed-point GRAY coefficients)."""

import cv2
import numpy as np
import pytest

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu import ColorConversionCode as C
from conftest import check_exact, check_float

CV_CODE = {
    C.COLOR_BGR2BGRA: cv2.COLOR_BGR2BGRA,
    C.COLOR_RGB2RGBA: cv2.COLOR_RGB2RGBA,
    C.COLOR_BGRA2BGR: cv2.COLOR_BGRA2BGR,
    C.COLOR_RGBA2RGB: cv2.COLOR_RGBA2RGB,
    C.COLOR_BGR2RGBA: cv2.COLOR_BGR2RGBA,
    C.COLOR_RGB2BGRA: cv2.COLOR_RGB2BGRA,
    C.COLOR_BGRA2RGB: cv2.COLOR_BGRA2RGB,
    C.COLOR_RGBA2BGR: cv2.COLOR_RGBA2BGR,
    C.COLOR_BGR2RGB: cv2.COLOR_BGR2RGB,
    C.COLOR_RGB2BGR: cv2.COLOR_RGB2BGR,
    C.COLOR_BGRA2RGBA: cv2.COLOR_BGRA2RGBA,
    C.COLOR_RGBA2BGRA: cv2.COLOR_RGBA2BGRA,
    C.COLOR_RGB2GRAY: cv2.COLOR_RGB2GRAY,
    C.COLOR_RGBA2GRAY: cv2.COLOR_RGBA2GRAY,
    C.COLOR_BGR2GRAY: cv2.COLOR_BGR2GRAY,
    C.COLOR_BGRA2GRAY: cv2.COLOR_BGRA2GRAY,
}

IN_CH = {c: (4 if "RGBA2" in c.name or "BGRA2" in c.name else 3) for c in C}


def _img(rng, dtype, ch):
    if dtype == np.float32:
        return rng.random((23, 31, ch), dtype=np.float32)
    hi = np.iinfo(dtype).max
    return rng.integers(0, hi + 1, (23, 31, ch)).astype(dtype)


@pytest.mark.parametrize("code", list(C))
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
def test_cvt_color_all_codes(rng, code, dtype):
    img = _img(rng, dtype, IN_CH[code])
    out = np.asarray(cvgs.execute_operations(cvgs.image(img), cvgs.cvt_color(code)))
    ref = cv2.cvtColor(img, CV_CODE[code])
    if ref.ndim == 2:
        ref = ref[..., None]
    assert out.shape == ref.shape, f"{code.name}: {out.shape} vs {ref.shape}"
    if dtype == np.float32:
        check_float(out, ref, msg=code.name)
    else:
        check_exact(out, ref, code.name)


def test_gray_after_normalize_fused(rng):
    """GRAY inside a fused chain keeps exactness on the integer path."""
    img = _img(rng, np.uint8, 3)
    out = np.asarray(
        cvgs.execute_operations(
            cvgs.image(img),
            cvgs.cvt_color(C.COLOR_RGB2GRAY),
            cvgs.convert_to(np.float32, alpha=2.0),
        )
    )
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)[..., None] * 2.0
    check_float(out, ref, msg="gray->convertTo fused")
