"""General-affine (rotation/shear) Pallas warp kernel — interpret-mode parity
vs the XLA gather path (reference fuses arbitrary affine maps into its one
kernel: ``include/cvGPUSpeedup.cuh:285-442``,
``tests/warping/test_warping_opencv.cu:139-271``).

The kernel recomputes every coordinate with the exact f32 operation shapes of
``decompose_inverse_map``, so taps and fractions agree with the XLA path
bit-for-bit; remaining diffs are 4-tap summation-order ulps plus the
Dekker-3 residual (~2^-24 relative) — well inside the 1e-4 contract.
"""

import cv2
import numpy as np
import pytest

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.exec import pallas_warp_general as pwg
from conftest import check_float


def _pipe(img, m, dsize, extra=(), write=None, **kw):
    ops = [cvgs.warp(img, m, dsize, **kw), *extra,
           write if write is not None else cvgs.split_tensor()]
    return ops, cvgs.build_pipeline(*ops)


def _parity(ops, pipe, tol=1e-4):
    x = np.asarray(cvgs.execute_operations(*ops, backend=cvgs.ParBackend.XLA))
    lowered = pwg.try_lower(pipe, interpret=True)
    assert lowered is not None, "general kernel did not claim the pipeline"
    check_float(np.asarray(lowered), x, tol=tol,
                msg="pallas general warp vs xla")


@pytest.mark.parametrize("angle", [10.0, -7.5, 3.0])
def test_rotation_parity(rng, angle):
    img = rng.integers(0, 256, (288, 768, 3)).astype(np.uint8)
    m = cv2.getRotationMatrix2D((384, 144), angle, 1 / 3.0)
    ops, pipe = _pipe(img, m, cvgs.Size(128, 96))
    assert pipe.read.gen_buckets is not None
    _parity(ops, pipe)


def test_rotation_with_chain_and_border(rng):
    # heavy border coverage: half the output falls outside the source
    img = rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
    m = cv2.getRotationMatrix2D((50, 20), 12.0, 0.25)
    ops, pipe = _pipe(
        img, m, cvgs.Size(128, 96),
        extra=(cvgs.multiply((2.0, 0.5, 1.0)), cvgs.subtract(3.0)),
        default=17.0,
    )
    _parity(ops, pipe)


def test_shear_only_horizontal(rng):
    # forward shear in x => inverse has b != 0, d == 0
    img = rng.integers(0, 256, (160, 512, 3)).astype(np.uint8)
    m = np.array([[1 / 3.0, 0.12, 5.0], [0.0, 1 / 2.0, -2.0]], np.float64)
    inv_like = np.linalg.inv(np.vstack([m, [0, 0, 1]]))[:2]
    assert abs(inv_like[0, 1]) > 0
    ops, pipe = _pipe(img, m, cvgs.Size(96, 64))
    _parity(ops, pipe)


def test_shear_only_vertical(rng):
    # forward shear in y => inverse has d != 0, b == 0
    img = rng.integers(0, 256, (160, 512, 3)).astype(np.uint8)
    m = np.array([[1 / 3.0, 0.0, 1.0], [0.08, 1 / 2.0, 0.0]], np.float64)
    ops, pipe = _pipe(img, m, cvgs.Size(96, 64))
    _parity(ops, pipe)


def test_single_channel_and_split_write(rng):
    img = rng.integers(0, 256, (288, 768)).astype(np.uint8)
    m = cv2.getRotationMatrix2D((300, 100), -15.0, 1 / 4.0)
    ops, pipe = _pipe(img, m, cvgs.Size(128, 64),
                      write=cvgs.split())
    _parity(ops, pipe)


def test_four_channel(rng):
    img = rng.integers(0, 256, (96, 320, 4)).astype(np.uint8)
    m = cv2.getRotationMatrix2D((160, 48), 8.0, 1 / 3.0)
    ops, pipe = _pipe(img, m, cvgs.Size(64, 48))
    _parity(ops, pipe)


def test_vertical_upscale_rotation(rng):
    # e < 1 (vertical upscale) with rotation: still in class (only a >= 2
    # is required)
    img = rng.integers(0, 256, (64, 512, 3)).astype(np.uint8)
    m = np.array([[1 / 3.0, -0.05, 8.0], [0.10, 1.6, 2.0]], np.float64)
    ops, pipe = _pipe(img, m, cvgs.Size(96, 64))
    assert pipe.read.gen_buckets is not None
    _parity(ops, pipe)


def test_out_of_class_falls_back():
    img = np.zeros((96, 384, 3), np.uint8)
    # a < 2 (inverse: upscale-ish horizontally): not consumer-unique
    m_up = cv2.getRotationMatrix2D((100, 40), 10.0, 1.2)
    ops = [cvgs.warp(img, m_up, cvgs.Size(64, 64)), cvgs.split_tensor()]
    pipe = cvgs.build_pipeline(*ops)
    assert pipe.read.gen_buckets is None
    assert pwg.try_lower(pipe, interpret=True) is None
    # separable maps stay with the separable kernel's class
    m_sep = np.array([[0.4, 0.0, 3.0], [0.0, 0.5, 1.0]], np.float64)
    pipe2 = cvgs.build_pipeline(
        cvgs.warp(img, m_sep, cvgs.Size(64, 64)), cvgs.split_tensor())
    assert pipe2.read.gen_buckets is None
    assert pipe2.read.sep_buckets is not None


def test_cv2_oracle_quantized(rng):
    """End-to-end vs cv2 itself (2e-2: cv2 quantizes coords to 1/32 px)."""
    img = rng.integers(0, 256, (288, 768, 3)).astype(np.uint8)
    m = cv2.getRotationMatrix2D((384, 144), 10.0, 1 / 3.0)
    ops, pipe = _pipe(img, m, cvgs.Size(128, 96))
    out = np.asarray(pwg.try_lower(pipe, interpret=True))
    ref = cv2.warpAffine(img.astype(np.float32), m, (128, 96)).transpose(2, 0, 1)
    check_float(out, ref, tol=2e-2, msg="general warp vs cv2 (quantized)")


def test_describe_backend_reports_general(rng):
    img = rng.integers(0, 256, (288, 768, 3)).astype(np.uint8)
    m = cv2.getRotationMatrix2D((384, 144), 10.0, 1 / 3.0)
    from cvgpuspeedup_tpu.exec import executor
    name = executor.describe_backend(
        cvgs.warp(img, m, cvgs.Size(128, 96)), cvgs.split_tensor(),
        backend=cvgs.ParBackend.PALLAS_INTERPRET,
    )
    assert name == "pallas:warp_general:interpret"
