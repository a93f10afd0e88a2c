"""Universal warp Pallas kernel — upscales, flips, perspective (the classes
outside the separable/consumer-unique kernels; the reference's one kernel
covers them all: ``include/cvGPUSpeedup.cuh:285-442``, perspective validated
at ``tests/warping/test_warping_opencv.cu:185-270``). Interpret-mode parity
vs the XLA gather path; on-chip validation lives in bench jobs (the kernel's
one-hot gathers are exact u8-in-bf16, so parity is bit-level)."""

import cv2
import numpy as np
import pytest

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.exec import pallas_warp_universal as pwu
from conftest import check_float


def _pipe(img, m, dsize, extra=(), wt=cvgs.WarpType.AFFINE, **kw):
    ops = [cvgs.warp(img, m, dsize, warp_type=wt, **kw), *extra,
           cvgs.split_tensor()]
    return ops, cvgs.build_pipeline(*ops)


def _parity(ops, pipe, tol=1e-4):
    x = np.asarray(cvgs.execute_operations(*ops, backend=cvgs.ParBackend.XLA))
    lowered = pwu.try_lower(pipe, interpret=True)
    assert lowered is not None, "universal kernel did not claim the pipeline"
    check_float(np.asarray(lowered), x, tol=tol,
                msg="pallas universal warp vs xla")


def test_upscale_rotation_parity(rng):
    """|a| < 2 (upscale): outside the consumer-unique class."""
    img = rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
    m = cv2.getRotationMatrix2D((100, 40), 10.0, 1.2)
    ops, pipe = _pipe(img, m, cvgs.Size(128, 64))
    assert pipe.read.gen_buckets is None
    assert pipe.read.uni_buckets is not None
    _parity(ops, pipe, tol=0)


def test_horizontal_flip_parity(rng):
    img = rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
    m = np.array([[-0.5, 0.0, 90.0], [0.0, 0.5, 2.0]], np.float64)
    ops, pipe = _pipe(img, m, cvgs.Size(64, 32))
    _parity(ops, pipe, tol=0)


def test_vertical_flip_parity(rng):
    img = rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
    m = np.array([[0.5, 0.02, 3.0], [0.01, -0.5, 80.0]], np.float64)
    ops, pipe = _pipe(img, m, cvgs.Size(64, 32))
    _parity(ops, pipe, tol=0)


def test_perspective_parity(rng):
    """Perspective homography through the Pallas kernel (VERDICT r3 #3):
    rational per-element coordinates, exact one-hot taps."""
    img = rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
    src_pts = np.float32([[0, 0], [383, 0], [0, 95], [383, 95]])
    dst_pts = np.float32([[5, 3], [120, 8], [2, 60], [125, 62]])
    m = cv2.getPerspectiveTransform(src_pts, dst_pts)
    ops, pipe = _pipe(img, m, cvgs.Size(128, 64),
                      wt=cvgs.WarpType.PERSPECTIVE)
    assert pipe.read.uni_buckets is not None and pipe.read.uni_buckets[0]
    _parity(ops, pipe, tol=0)


def test_perspective_vs_cv2_interior(rng):
    img = rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
    src_pts = np.float32([[0, 0], [383, 0], [0, 95], [383, 95]])
    dst_pts = np.float32([[5, 3], [120, 8], [2, 60], [125, 62]])
    m = cv2.getPerspectiveTransform(src_pts, dst_pts)
    ops, pipe = _pipe(img, m, cvgs.Size(128, 64),
                      wt=cvgs.WarpType.PERSPECTIVE)
    out = np.asarray(pwu.try_lower(pipe, interpret=True))
    ref = cv2.warpPerspective(
        img.astype(np.float32), m, (128, 64), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    ).transpose(2, 0, 1)
    # border ring is EXPECTED_FAIL territory in the reference
    # (test_warping_opencv.cu:268-270); interior must track cv2's
    # 1/32-px-quantized sampler
    check_float(out[:, 2:-2, 2:-2], ref[:, 2:-2, 2:-2], tol=2e-2,
                msg="universal perspective vs cv2 interior")


def test_chain_and_border(rng):
    img = rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
    m = cv2.getRotationMatrix2D((50, 20), 12.0, 1.5)
    ops, pipe = _pipe(
        img, m, cvgs.Size(128, 64),
        extra=(cvgs.multiply((2.0, 0.5, 1.0)), cvgs.subtract(3.0)),
        default=17.0,
    )
    _parity(ops, pipe, tol=0)


def test_single_channel_split_write(rng):
    img = rng.integers(0, 256, (96, 384)).astype(np.uint8)
    m = cv2.getRotationMatrix2D((150, 40), -8.0, 1.3)
    ops = [cvgs.warp(img, m, cvgs.Size(128, 64)), cvgs.split()]
    pipe = cvgs.build_pipeline(*ops)
    x = np.asarray(cvgs.execute_operations(*ops, backend=cvgs.ParBackend.XLA))
    lowered = pwu.try_lower(pipe, interpret=True)
    assert lowered is not None
    check_float(np.asarray(np.stack(lowered)), x.reshape(1, 64, 128),
                msg="single channel universal", tol=0)


def test_matrix_jitter_reuses_program(rng):
    """Matrix values are runtime leaves; small jitter stays in the same
    derivative buckets and must not change the pytree structure."""
    import jax

    img = rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
    m1 = cv2.getRotationMatrix2D((100, 40), 10.0, 1.2)
    m2 = cv2.getRotationMatrix2D((101, 41), 10.2, 1.21)
    _, p1 = _pipe(img, m1, cvgs.Size(128, 64))
    _, p2 = _pipe(img, m2, cvgs.Size(128, 64))
    t1 = jax.tree_util.tree_structure(p1)
    t2 = jax.tree_util.tree_structure(p2)
    assert t1 == t2


def test_describe_backend_reports_universal(rng):
    from cvgpuspeedup_tpu.exec import executor

    img = rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
    m = cv2.getRotationMatrix2D((100, 40), 10.0, 1.2)
    name = executor.describe_backend(
        cvgs.warp(img, m, cvgs.Size(128, 64)), cvgs.split_tensor(),
        backend=cvgs.ParBackend.PALLAS_INTERPRET,
    )
    assert name == "pallas:warp_universal:interpret"


def test_out_of_class_rejects():
    """Degenerate / extreme maps stay on XLA (observable via supports)."""
    img = np.zeros((96, 384, 3), np.uint8)
    # denominator crosses zero inside the output domain
    m = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [-0.2, 0.0, 1.0]])
    ops, pipe = _pipe(img, m, cvgs.Size(128, 64),
                      wt=cvgs.WarpType.PERSPECTIVE)
    assert pipe.read.uni_buckets is None
    assert not pwu.supports(pipe)


def test_ragged_band_heights(rng):
    """dst_h without an 8-multiple divisor (e.g. 540-style heights): the
    last band is ragged — padded rows are computed and sliced off."""
    img = rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
    m = cv2.getRotationMatrix2D((100, 40), 10.0, 1.2)
    for h in (60, 44, 52):
        ops, pipe = _pipe(img, m, cvgs.Size(128, h))
        assert pwu.supports(pipe), h
        _parity(ops, pipe, tol=0)


def test_sy_endpoint_rounding_regression(rng):
    """Homography whose bottom output rows map to src row ~95 everywhere:
    f32 evaluation of an interior element can round 1 ulp BELOW both rounded
    row-endpoint values (94.99999 vs 95.0), which made s_sel = -1 and every
    candidate mask miss (silent border output). The kernel biases the
    candidate base down by one row; parity must be exact."""
    img = rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
    srcs = np.float32([[0, 0], [383, 0], [0, 95], [383, 95]])
    m = cv2.getPerspectiveTransform(
        srcs, np.float32([[6, 3], [119, 8], [2, 61], [125, 61]]))
    ops, pipe = _pipe(img, m, cvgs.Size(128, 64), wt=cvgs.WarpType.PERSPECTIVE)
    _parity(ops, pipe, tol=0)


# --- batched warp (cvGS::warp<WT, I, BATCH>, one kernel launch) ------------


def test_warp_batch_kernel_affine_ragged(rng):
    """Per-image affine matrices + ragged used_planes + default through ONE
    Pallas launch (reference ``include/cvGPUSpeedup.cuh:381-442``,
    ``tests/warping/test_warping_opencv.cu:157-247``)."""
    imgs = [rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
            for _ in range(6)]
    mats = [cv2.getRotationMatrix2D((192, 48), 7.0 * i - 15, 1.0 + 0.1 * i)
            for i in range(6)]
    ops = [
        cvgs.warp_batch(imgs, mats, cvgs.Size(128, 64), used_planes=5,
                        default=7.0, border_value=(1.0, 2.0, 3.0)),
        cvgs.multiply(0.5),
        cvgs.split_tensor(),
    ]
    pipe = cvgs.build_pipeline(*ops)
    assert pwu.supports(pipe)
    assert pwu._plan(pipe)["n_pl"] == 6
    x = np.asarray(cvgs.execute_operations(*ops, backend=cvgs.ParBackend.XLA))
    p = np.asarray(pwu.try_lower(pipe, interpret=True))
    assert p.shape == (6, 3, 64, 128)
    # coordinate math matches the XLA sampler to 1 ulp; taps are exact
    check_float(p, x, msg="batched warp kernel vs xla")
    # ragged plane: default through the chain
    assert np.all(p[5] == 3.5)


def test_warp_batch_kernel_perspective(rng):
    imgs = [rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
            for _ in range(4)]
    srcs = np.float32([[0, 0], [383, 0], [0, 95], [383, 95]])
    pms = [cv2.getPerspectiveTransform(srcs, np.float32(
        [[5 + i, 3], [120 - i, 8], [2, 60 + i], [125, 62 - i]]))
        for i in range(4)]
    ops = [
        cvgs.warp_batch(imgs, pms, cvgs.Size(128, 64),
                        warp_type=cvgs.WarpType.PERSPECTIVE),
        cvgs.split_tensor(),
    ]
    pipe = cvgs.build_pipeline(*ops)
    assert pwu.supports(pipe)
    x = np.asarray(cvgs.execute_operations(*ops, backend=cvgs.ParBackend.XLA))
    p = np.asarray(pwu.try_lower(pipe, interpret=True))
    check_float(p, x, msg="batched perspective kernel vs xla")


def test_warp_batch_mixed_classes_one_kernel(rng):
    """A batch mixing a separable translation with rotations still runs as
    ONE universal kernel: the factory attaches universal buckets to every
    plane and the plan sizes tiles by the batch max."""
    imgs = [rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
            for _ in range(4)]
    mats = [np.array([[1.0, 0.0, 5.0], [0.0, 1.0, 3.0]])] + [
        cv2.getRotationMatrix2D((192, 48), 7.0 * i, 1.1) for i in range(1, 4)]
    ops = [cvgs.warp_batch(imgs, mats, cvgs.Size(128, 64)),
           cvgs.split_tensor()]
    pipe = cvgs.build_pipeline(*ops)
    assert pwu.supports(pipe)
    x = np.asarray(cvgs.execute_operations(*ops, backend=cvgs.ParBackend.XLA))
    p = np.asarray(pwu.try_lower(pipe, interpret=True))
    check_float(p, x, msg="mixed-class batched warp vs xla")


def test_describe_backend_reports_batch(rng):
    from cvgpuspeedup_tpu.exec import executor

    imgs = [rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
            for _ in range(3)]
    mats = [cv2.getRotationMatrix2D((192, 48), 5.0 * i, 1.1) for i in range(3)]
    name = executor.describe_backend(
        cvgs.warp_batch(imgs, mats, cvgs.Size(128, 64)), cvgs.split_tensor(),
        backend=cvgs.ParBackend.PALLAS_INTERPRET,
    )
    assert name == "pallas:warp_universal:interpret"
