"""Pallas emitter vs XLA path — parity in interpret mode (the "fake backend"
SURVEY.md §4 prescribes, which the reference lacks).

The flagship pipeline must agree between:
  - the XLA gather path (oracle-verified in test_batchresize.py), and
  - the Pallas MXU-matmul kernel (interpret mode on CPU here; the real
    Mosaic compile is exercised by bench.py on TPU hardware)
within the 1e-4 float contract. Exact bitwise equality is impossible in
general: XLA fuses ``a*(1-w) + b*w`` into FMAs (unrounded products) while the
matmul path rounds each product — a ~2 ulp divergence. Integer outputs remain
bit-exact except on exact .5 rounding ties.
"""

import numpy as np
import pytest

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.exec import pallas_backend
from conftest import assert_backend, check_exact, check_float

UP = (64, 128)


def _frame(rng, h=296, w=384, c=3, dtype=np.uint8):  # tile-aligned dims (8, 128px)
    return rng.integers(0, 256, (h, w, c)).astype(dtype)


def _rects(batch, cw=60, ch=120):
    return np.array([[i * 2, i, cw - (i % 7), ch - (i % 5)] for i in range(batch)], np.int32)


def _both(ops):
    x = np.asarray(cvgs.execute_operations(*ops, backend=cvgs.ParBackend.XLA))
    p = np.asarray(cvgs.execute_operations(*ops, backend=cvgs.ParBackend.PALLAS_INTERPRET))
    assert_backend("pallas:batch_resize:interpret")
    return x, p


def test_supports_flagship(rng):
    pipe = cvgs.build_pipeline(
        cvgs.resize_batch(_frame(rng), rects=_rects(4), dsize=cvgs.Size(*UP)),
        cvgs.multiply(0.5),
        cvgs.split_tensor(),
    )
    assert pallas_backend.supports(pipe)


def test_flagship_parity_tensor_split(rng):
    frame = _frame(rng)
    ops = [
        cvgs.resize_batch(frame, rects=_rects(6), dsize=cvgs.Size(*UP),
                          used_planes=5, background=128.0),
        cvgs.convert_to(np.float32, alpha=0.3),
        cvgs.subtract((3.2, 0.6, 11.8)),
        cvgs.divide((128.0, 128.0, 128.0)),
        cvgs.split_tensor(),
    ]
    x, p = _both(ops)
    assert x.shape == p.shape == (6, 3, UP[1], UP[0])
    check_float(p, x, msg="pallas vs xla flagship")


def test_flagship_parity_u8_output(rng):
    frame = _frame(rng)
    ops = [
        cvgs.resize_batch(frame, rects=_rects(3), dsize=cvgs.Size(*UP)),
        cvgs.convert_to(np.uint8),
        cvgs.split_tensor(),
    ]
    x, p = _both(ops)
    assert p.dtype == np.uint8
    check_exact(p, x, "u8 output parity")


@pytest.mark.parametrize("mode", [
    cvgs.AspectRatio.PRESERVE_AR,
    cvgs.AspectRatio.PRESERVE_AR_LEFT,
    cvgs.AspectRatio.PRESERVE_AR_RN_EVEN,
])
def test_letterbox_parity(rng, mode):
    frame = _frame(rng)
    ops = [
        cvgs.resize_batch(frame, rects=_rects(5, cw=30, ch=120),
                          dsize=cvgs.Size(*UP), background=99.0,
                          aspect_ratio=mode),
    ]
    x, p = _both(ops)
    check_float(p, x, msg=f"letterbox {mode.name}")


def test_stack_mode_parity(rng):
    imgs = [_frame(rng, 100, 50), _frame(rng, 80, 120), _frame(rng, 37, 61)]
    ops = [
        cvgs.resize_batch(imgs, dsize=cvgs.Size(32, 32)),
        cvgs.multiply(2.0),
        cvgs.split_tensor(),
    ]
    x, p = _both(ops)
    check_float(p, x, msg="stack mode")


def test_chain_with_swizzle_and_gray(rng):
    frame = _frame(rng)
    ops = [
        cvgs.resize_batch(frame, rects=_rects(3), dsize=cvgs.Size(*UP)),
        cvgs.convert_to(np.uint8),
        cvgs.cvt_color(cvgs.ColorConversionCode.COLOR_RGB2GRAY),
        cvgs.split_tensor(),
    ]
    x, p = _both(ops)
    assert p.shape == (3, 1, UP[1], UP[0])
    check_exact(p, x, "gray chain parity")


@pytest.mark.parametrize("write,shape", [
    ("split_tensor_transposed", (3, 4, 128, 64)),
    ("write_tensor", (4, 128, 64, 3)),
])
def test_write_layouts_parity(rng, write, shape):
    frame = _frame(rng)
    ops = [
        cvgs.resize_batch(frame, rects=_rects(4), dsize=cvgs.Size(*UP)),
        getattr(cvgs, write)(),
    ]
    x, p = _both(ops)
    assert p.shape == shape
    check_float(p, x, msg=write)


def test_split_write_parity(rng):
    frame = _frame(rng)
    ops = [
        cvgs.resize_batch(frame, rects=_rects(4), dsize=cvgs.Size(*UP)),
        cvgs.split(),
    ]
    x = cvgs.execute_operations(*ops, backend=cvgs.ParBackend.XLA)
    p = cvgs.execute_operations(*ops, backend=cvgs.ParBackend.PALLAS_INTERPRET)
    assert_backend("pallas:batch_resize:interpret")
    assert isinstance(p, (tuple, list)) and len(p) == 3
    for c in range(3):
        check_float(np.asarray(p[c]), np.asarray(x[c]), msg=f"split ch{c}")


def test_unsupported_falls_back(rng):
    """Unsupported chain op (YUV conversion mid-chain needs 3 planes from a
    resize read — supported; use an op with no planar lowering instead)."""
    frame = _frame(rng)
    # warp read head is not the flagship pattern -> XLA fallback, same result
    m = np.array([[1.0, 0.0, 2.0], [0.0, 1.0, 1.0]])
    ops = [cvgs.warp(frame, m, cvgs.Size(64, 64))]
    x = np.asarray(cvgs.execute_operations(*ops, backend=cvgs.ParBackend.XLA))
    p = np.asarray(cvgs.execute_operations(*ops, backend=cvgs.ParBackend.PALLAS_INTERPRET))
    assert_backend("xla")
    check_float(p, x, tol=0, msg="fallback identical")


def test_debug_mode_forces_interpret(rng):
    """debug_mode(): AUTO/PALLAS lowerings run interpreted (nvcc -G analog)."""
    from cvgpuspeedup_tpu.exec.executor import debug_mode
    frame = _frame(rng)
    ops = lambda: [
        cvgs.resize_batch(frame, rects=_rects(3), dsize=cvgs.Size(*UP)),
        cvgs.multiply(0.5),
        cvgs.split_tensor(),
    ]
    ref = np.asarray(cvgs.execute_operations(*ops(), backend=cvgs.ParBackend.XLA))
    with debug_mode():
        out = np.asarray(cvgs.execute_operations(*ops(), backend=cvgs.ParBackend.PALLAS))
    check_float(out, ref, msg="debug-mode interpret parity")


def test_chain_with_alpha_add_parity(rng):
    """BGR2BGRA (alpha append) inside the Pallas chain."""
    frame = _frame(rng)
    ops = lambda: [
        cvgs.resize_batch(frame, rects=_rects(3), dsize=cvgs.Size(*UP)),
        cvgs.convert_to(np.uint8),
        cvgs.cvt_color(cvgs.ColorConversionCode.COLOR_BGR2BGRA),
        cvgs.split_tensor(),
    ]
    x = np.asarray(cvgs.execute_operations(*ops(), backend=cvgs.ParBackend.XLA))
    p = np.asarray(cvgs.execute_operations(*ops(), backend=cvgs.ParBackend.PALLAS_INTERPRET))
    assert_backend("pallas:batch_resize:interpret")
    assert p.shape == (3, 4, UP[1], UP[0])
    assert np.all(np.asarray(p)[:, 3] == 255)
    check_exact(p, x, "alpha-append chain parity")


def test_packed_split_parity(rng):
    """TensorSplitPacked: same values as TensorSplit in packed row-pair order,
    on both backends (Pallas interpret vs XLA), bit-identical."""
    frame = rng.integers(0, 256, (512, 768, 3)).astype(np.uint8)
    rects = np.array([[i, i, 60, 120] for i in range(8)], np.int32)

    def run(write, backend):
        return np.asarray(cvgs.execute_operations(
            cvgs.resize_batch(frame, rects=rects, dsize=cvgs.Size(64, 128)),
            cvgs.convert_to(np.float32, alpha=0.3),
            cvgs.subtract((3.2, 0.6, 11.8)),
            cvgs.divide((128.0, 128.0, 128.0)),
            write, backend=backend,
        ))

    planar = run(cvgs.split_tensor(), cvgs.ParBackend.XLA)
    packed_x = run(cvgs.split_tensor_packed(), cvgs.ParBackend.XLA)
    packed_p = run(cvgs.split_tensor_packed(), cvgs.ParBackend.PALLAS_INTERPRET)
    assert_backend("pallas:batch_resize:interpret")
    assert packed_x.shape == (8, 3, 64, 128)
    # packed reshaped row-major == planar
    assert np.array_equal(packed_x.reshape(8, 3, 128, 64), planar)
    assert np.array_equal(packed_p, packed_x)


def test_packed_split_ragged_letterbox(rng):
    """Packed layout with masking paths active (letterbox + ragged batch)."""
    frame = rng.integers(0, 256, (512, 768, 3)).astype(np.uint8)
    rects = np.array([[8 * i, 4 * i, 30 + i, 100] for i in range(6)], np.int32)

    def run(write, backend):
        return np.asarray(cvgs.execute_operations(
            cvgs.resize_batch(frame, rects=rects, dsize=cvgs.Size(64, 128),
                              aspect_ratio=cvgs.AspectRatio.PRESERVE_AR,
                              used_planes=4, background=(7.0, 8.0, 9.0)),
            cvgs.convert_to(np.float32),
            write, backend=backend,
        ))

    planar = run(cvgs.split_tensor(), cvgs.ParBackend.XLA)
    packed_p = run(cvgs.split_tensor_packed(), cvgs.ParBackend.PALLAS_INTERPRET)
    assert_backend("pallas:batch_resize:interpret")
    # letterbox geometry is the non-bf16-exact regime: matmul-vs-lerp product
    # rounding may differ ~1 ulp (the standard float contract applies)
    check_float(packed_p.reshape(6, 3, 128, 64), planar, msg="packed letterbox")


def test_bottom_aligned_uniform_crops(rng):
    """Uniform-geometry crops whose 8-aligned window start CLAMPS at the
    frame bottom: dy = y0 - (src_h - win_h) exceeds 7 there, so the baked
    per-dy vertical-matrix table must be sized past 8 entries (a regression
    guard: an 8-entry table made wv_ref[dy] read out of bounds and use wrong
    vertical taps for bottom crops)."""
    frame = rng.integers(0, 256, (512, 768, 3)).astype(np.uint8)
    # h=64 -> win_h = 72; y0 = 448 gives dy = 448 - (512 - 72) = 8
    rects = np.array(
        [[7 * i, 440 + i, 60, 64] for i in range(9)], np.int32
    )
    assert rects[:, 1].max() + 64 <= 512
    ops = [
        cvgs.resize_batch(frame, rects=rects, dsize=cvgs.Size(*UP)),
        cvgs.convert_to(np.float32, alpha=0.5),
        cvgs.split_tensor(),
    ]
    pipe = cvgs.build_pipeline(*ops)
    assert pipe.read.uniform_wh == (60, 64)  # baked-weights path engaged
    x, p = _both(ops)
    check_float(p, x, msg="bottom-aligned uniform crops")


def test_pipelined_schedule_parity(rng):
    """The software-pipelined baked schedule (A/B knob) computes the same
    values as the plain schedule and the XLA path."""
    from cvgpuspeedup_tpu.exec import pallas_backend as pb

    frame = rng.integers(0, 256, (296, 384, 3)).astype(np.uint8)
    rects = np.array([[i, i, 60, 120] for i in range(20)], np.int32)
    ops = lambda: [
        cvgs.resize_batch(frame, rects=rects, dsize=cvgs.Size(64, 128)),
        cvgs.convert_to(np.float32, alpha=0.3),
        cvgs.split_tensor(),
    ]
    x = np.asarray(cvgs.execute_operations(*ops(), backend=cvgs.ParBackend.XLA))
    old = pb._PIPELINE_SCHEDULE
    try:
        pb._PIPELINE_SCHEDULE = True
        p = pb.try_lower(cvgs.build_pipeline(*ops()), interpret=True)
        check_float(np.asarray(p), x, tol=0, msg="pipelined schedule vs xla")
    finally:
        pb._PIPELINE_SCHEDULE = old
