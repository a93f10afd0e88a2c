"""convertTo / saturate-cast parity vs OpenCV (cv2 CPU oracle).

Mirrors reference ``tests/single_operation/test_convertTo.cu:60-96`` (exact
match vs ``GpuMat::convertTo``) across depth & channel sweeps.

Note on alpha choice: the engine computes in float32 (like the reference's
CUDA kernels); cv2 CPU computes in double. For INTEGER outputs (bit-exact
contract) the sweep uses alphas exactly representable in binary so f32 and f64
agree; float outputs use arbitrary alphas under the 1e-4 contract.
"""

import cv2
import numpy as np
import pytest

import cvgpuspeedup_tpu as cvgs
from conftest import check_exact, check_float

DEPTHS = [np.uint8, np.int8, np.uint16, np.int16, np.int32, np.float32]
CV_DEPTH = {
    np.uint8: cv2.CV_8U,
    np.int8: cv2.CV_8S,
    np.uint16: cv2.CV_16U,
    np.int16: cv2.CV_16S,
    np.int32: cv2.CV_32S,
    np.float32: cv2.CV_32F,
    np.float64: cv2.CV_64F,
}


def _rand_img(rng, dtype, channels, h=37, w=61):
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        lo, hi = max(info.min, -4000), min(info.max, 4000)
        img = rng.integers(lo, hi + 1, size=(h, w, channels)).astype(dtype)
    else:
        img = (rng.random((h, w, channels), dtype=np.float32) * 200 - 100).astype(dtype)
    return img


def _cv_convert_to(src, dst_dtype, alpha=1.0, beta=0.0):
    # cv2 python has no Mat::convertTo; addWeighted with a zero second term
    # reproduces saturate_cast<dst>(src*alpha + beta) with OpenCV's own code.
    return cv2.addWeighted(src, alpha, src, 0.0, beta, dtype=CV_DEPTH[dst_dtype])


def _run(img, *ops):
    return np.asarray(cvgs.execute_operations(cvgs.image(img), *ops))


@pytest.mark.parametrize("src_dtype", DEPTHS)
@pytest.mark.parametrize("dst_dtype", [np.uint8, np.int16, np.float32])
@pytest.mark.parametrize("channels", [1, 3])
def test_plain_saturate_cast(rng, src_dtype, dst_dtype, channels):
    img = _rand_img(rng, src_dtype, channels)
    out = _run(img, cvgs.convert_to(dst_dtype))
    ref = _cv_convert_to(img, dst_dtype)
    ref = ref.reshape(img.shape)
    if np.issubdtype(dst_dtype, np.integer):
        check_exact(out, ref, f"{src_dtype}->{dst_dtype}")
    else:
        check_float(out, ref, msg=f"{src_dtype}->{dst_dtype}")


@pytest.mark.parametrize("src_dtype", [np.uint8, np.uint16, np.float32])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_alpha_to_float(rng, src_dtype, channels):
    img = _rand_img(rng, src_dtype, channels)
    out = _run(img, cvgs.convert_to(np.float32, alpha=0.3))
    ref = _cv_convert_to(img, np.float32, alpha=0.3).reshape(img.shape)
    check_float(out, ref, msg=f"{src_dtype} alpha=0.3")
    assert out.dtype == np.float32


@pytest.mark.parametrize("src_dtype", [np.uint8, np.int16, np.float32])
@pytest.mark.parametrize("alpha,beta", [(0.25, 3.5), (1.5, -2.0), (2.0, 0.5)])
def test_alpha_beta_to_int(rng, src_dtype, alpha, beta):
    """Integer outputs bit-exact: binary-representable alpha/beta."""
    img = _rand_img(rng, src_dtype, 3)
    out = _run(img, cvgs.convert_to(np.int16, alpha=alpha, beta=beta))
    ref = _cv_convert_to(img, np.int16, alpha=alpha, beta=beta).reshape(img.shape)
    check_exact(out, ref, f"{src_dtype} a={alpha} b={beta}")


def test_saturation_extremes(rng):
    img = np.array([[[-300.7, 255.5, 254.5], [256.5, -0.5, 1000.0]]], np.float32)
    out = _run(img, cvgs.convert_to(np.uint8))
    ref = _cv_convert_to(img, np.uint8).reshape(img.shape)
    check_exact(out, ref, "saturation extremes")


def test_round_half_to_even():
    img = np.array([[[0.5, 1.5, 2.5], [3.5, -1.5, -2.5]]], np.float32)
    out = _run(img, cvgs.convert_to(np.int16))
    ref = _cv_convert_to(img, np.int16).reshape(img.shape)
    check_exact(out, ref, "cvRound banker's rounding")
