"""Full-frame Pallas emitter vs XLA path — parity in interpret mode.

The frame kernel (``exec/pallas_frame.py``) covers single-image static-
geometry resize pipelines (reference ``cvGS::resize<T, INTER_LINEAR>(src,
dsize)``, ``include/cvGPUSpeedup.cuh:209-216``, and the fused NV12 read of
``tests/resize/test_fused_resize.cu:121-143``). In its exact regimes (u8
source, bf16-representable weights — all pure-ratio video configs) the kernel
is BIT-IDENTICAL to the XLA polyphase path, which is itself oracle-verified
against cv2 in test_resize.py / test_nv12_divergent.py; the general f32
regime holds the 1e-4 float contract. Real Mosaic compilation is exercised
by benchmarks on TPU hardware (bench.py protocol)."""

import numpy as np
import pytest

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.exec import pallas_frame
from conftest import check_float


def _both(ops):
    from conftest import assert_backend

    x = np.asarray(cvgs.execute_operations(*ops, backend=cvgs.ParBackend.XLA))
    p = np.asarray(
        cvgs.execute_operations(*ops, backend=cvgs.ParBackend.PALLAS_INTERPRET)
    )
    assert_backend("pallas:frame:interpret")
    return x, p


def _img(rng, h=96, w=384, c=3, dtype=np.uint8):
    return rng.integers(0, 256, (h, w, c)).astype(dtype)


def _supported(ops):
    return pallas_frame.supports(cvgs.build_pipeline(*ops))


def test_supports_frame_pipeline(rng):
    ops = [
        cvgs.resize(cvgs.image(_img(rng)), cvgs.Size(128, 32)),
        cvgs.multiply(0.5),
        cvgs.split_tensor(),
    ]
    assert _supported(ops)


def test_exact_selection_ratio_bit_identical(rng):
    """3:1 downscale (the 1080p benchmark shape, scaled down): pure
    row/column selection — exact bf16 regime, bit-identical to XLA."""
    ops = [
        cvgs.resize(cvgs.image(_img(rng)), cvgs.Size(128, 32)),
        cvgs.convert_to(np.float32, alpha=1 / 255.0),
        cvgs.subtract((0.485, 0.456, 0.406)),
        cvgs.divide((0.229, 0.224, 0.225)),
        cvgs.split_tensor(),
    ]
    assert _supported(ops)
    x, p = _both(ops)
    assert x.shape == p.shape == (3, 32, 128)
    np.testing.assert_array_equal(x, p)


def test_exact_fractional_dekker_bit_identical(rng):
    """1080-style -> 128 rows: k/256 weights — fractional but bf16-exact,
    exercising the Dekker hi/lo split between the passes."""
    img = _img(rng, h=264, w=384)
    ops = [
        cvgs.resize(cvgs.image(img), cvgs.Size(64, 128)),
        cvgs.convert_to(np.float32, alpha=1 / 255.0),
        cvgs.split_tensor(),
    ]
    pipe = cvgs.build_pipeline(*ops)
    assert pallas_frame.supports(pipe)
    plan = pallas_frame._plan_of(pipe)
    assert plan["exact"]
    assert plan["y"]["dekker"] or not plan["y"]["frac_v"]
    x, p = _both(ops)
    np.testing.assert_array_equal(x, p)


def test_integer_output_exact(rng):
    ops = [
        cvgs.resize(cvgs.image(_img(rng)), cvgs.Size(128, 32)),
        cvgs.convert_to(np.uint8),
        cvgs.split_tensor(),
    ]
    assert _supported(ops)
    x, p = _both(ops)
    assert p.dtype == np.uint8
    np.testing.assert_array_equal(x, p)


def test_general_f32_regime_float_contract(rng):
    """Upscale with bf16-inexact-looking ratios still held to the float
    contract vs the XLA association (horizontal-first)."""
    img = _img(rng, h=96, w=256)  # 256 -> 384: thirds, not bf16-exact
    ops = [
        cvgs.resize(cvgs.image(img), cvgs.Size(384, 144)),
        cvgs.multiply(0.25),
        cvgs.split_tensor(),
    ]
    pipe = cvgs.build_pipeline(*ops)
    assert pallas_frame.supports(pipe)
    assert not pallas_frame._plan_of(pipe)["exact"]
    x, p = _both(ops)
    check_float(p, x, msg="frame kernel vs xla, general regime")


def test_multiband_multitile(rng):
    """Several row bands x several W tiles (the 1080p benchmark geometry)."""
    img = _img(rng, h=1080, w=1920)
    ops = [
        cvgs.resize(cvgs.image(img), cvgs.Size(640, 360)),
        cvgs.convert_to(np.float32, alpha=1 / 255.0),
        cvgs.subtract((0.485, 0.456, 0.406)),
        cvgs.divide((0.229, 0.224, 0.225)),
        cvgs.split_tensor(),
    ]
    pipe = cvgs.build_pipeline(*ops)
    assert pallas_frame.supports(pipe)
    plan = pallas_frame._plan_of(pipe)
    assert plan["n_bands"] > 1 and plan["y"]["n_tiles"] > 1
    x, p = _both(ops)
    assert x.shape == (3, 360, 640)
    np.testing.assert_array_equal(x, p)


def test_split_write_layout(rng):
    ops = [
        cvgs.resize(cvgs.image(_img(rng)), cvgs.Size(128, 32)),
        cvgs.multiply(2.0),
        cvgs.split(),
    ]
    assert _supported(ops)
    x = cvgs.execute_operations(*ops, backend=cvgs.ParBackend.XLA)
    p = cvgs.execute_operations(*ops, backend=cvgs.ParBackend.PALLAS_INTERPRET)
    from conftest import assert_backend
    assert_backend("pallas:frame:interpret")
    assert len(x) == len(p) == 3
    for xc, pc in zip(x, p):
        np.testing.assert_array_equal(np.asarray(xc), np.asarray(pc))


def test_grayscale(rng):
    img = rng.integers(0, 256, (96, 384, 1)).astype(np.uint8)
    ops = [
        cvgs.resize(cvgs.image(img), cvgs.Size(128, 32)),
        cvgs.multiply(3.0),
        cvgs.split_tensor(),
    ]
    assert _supported(ops)
    x, p = _both(ops)
    assert x.shape == (1, 32, 128)
    np.testing.assert_array_equal(x, p)


def test_nv12_fused_read_bit_identical(rng):
    """NV12 plane-space kernel: Y full-res + UV half-res with full-res tap
    math + planar conversion. The UV plane of a 1080-row frame has 540 rows
    (not 8-divisible) — exercises the partial bottom-band DMA."""
    buf = rng.integers(0, 256, (1620, 1920)).astype(np.uint8)
    ops = [
        cvgs.resize(
            cvgs.fuse(
                cvgs.read_yuv(buf),
                cvgs.convert_yuv_to_rgb(
                    standard=cvgs.ColorStandard.BT709, out_dtype=np.float32
                ),
            ),
            cvgs.Size(640, 360),
        ),
        cvgs.multiply(1 / 255.0),
        cvgs.split_tensor(),
    ]
    pipe = cvgs.build_pipeline(*ops)
    assert pallas_frame.supports(pipe)
    uv = pallas_frame._plan_of(pipe)["uv"]
    # the bottom band's window overruns the buffer's logical rows (padding)
    assert int(uv["rstarts"].max()) + uv["rows_in"] > 1620
    x, p = _both(ops)
    assert x.shape == (3, 360, 640)
    np.testing.assert_array_equal(x, p)


def test_nv21_limited_alpha(rng):
    buf = rng.integers(0, 256, (1620, 1920)).astype(np.uint8)
    ops = [
        cvgs.resize(
            cvgs.fuse(
                cvgs.read_yuv(buf, pixel_format=cvgs.PixelFormat.NV21),
                cvgs.convert_yuv_to_rgb(
                    standard=cvgs.ColorStandard.BT601,
                    color_range=cvgs.ColorRange.LIMITED,
                    alpha=True,
                    out_dtype=np.float32,
                ),
            ),
            cvgs.Size(640, 360),
        ),
        cvgs.split_tensor(),
    ]
    assert _supported(ops)
    x, p = _both(ops)
    assert x.shape == (4, 360, 640)
    np.testing.assert_array_equal(x, p)


def test_fallbacks():
    rng = np.random.default_rng(7)
    # odd width: lanes not 128-divisible
    img = rng.integers(0, 256, (96, 200, 3)).astype(np.uint8)
    assert not _supported(
        [cvgs.resize(cvgs.image(img), cvgs.Size(64, 32)), cvgs.split_tensor()]
    )
    # packed write layout: not emitted by the frame kernel
    img2 = rng.integers(0, 256, (96, 384, 3)).astype(np.uint8)
    assert not _supported([cvgs.resize(cvgs.image(img2), cvgs.Size(128, 32))])
    # batched reads belong to the flagship emitter
    stack = rng.integers(0, 256, (2, 96, 384, 3)).astype(np.uint8)
    pipe = cvgs.build_pipeline(
        cvgs.image(stack), cvgs.multiply(2.0), cvgs.split_tensor()
    )
    assert not pallas_frame.supports(pipe)
    # integer outputs demand exactness: inexact ratios fall back
    pipe = cvgs.build_pipeline(
        cvgs.resize(cvgs.image(img2), cvgs.Size(120, 36)),
        cvgs.convert_to(np.uint8),
        cvgs.split_tensor(),
    )
    assert not pallas_frame.supports(pipe)


def test_oracle_parity_cv2(rng):
    """End to end vs the cv2 oracle through the kernel path (not just vs the
    XLA path): resize + normalize, float contract."""
    cv2 = pytest.importorskip("cv2")
    img = _img(rng, h=96, w=384)
    ops = [
        cvgs.resize(cvgs.image(img), cvgs.Size(128, 32)),
        cvgs.convert_to(np.float32, alpha=1 / 255.0),
        cvgs.split_tensor(),
    ]
    _, p = _both(ops)
    ref = cv2.resize(
        img.astype(np.float32), (128, 32), interpolation=cv2.INTER_LINEAR
    ) * np.float32(1 / 255.0)
    check_float(p, np.transpose(ref, (2, 0, 1)), msg="frame kernel vs cv2")


def test_v_bake_window_invariants():
    """The chroma-overrun safety argument, as a permanent invariant sweep
    (hardened from the one-off 41_overrun_probe hardware job): for every
    band of every plan, the DMA window [rstart, rstart + rows_in) must stay
    inside the ROW-PADDED allocation (ceil(plane_rows/8)*8 — Mosaic memrefs
    pad to the sublane tile), every tap must land inside the window, and
    overrun rows past the logical plane must carry zero weight. Covers the
    non-8-divisible NV12 chroma branch across geometries, including ones
    where alignment jitter forces the end-clamp."""
    from cvgpuspeedup_tpu.exec.pallas_frame import _v_bake
    from cvgpuspeedup_tpu.ops.resize import axis_lerp_np

    cases = []
    for src_h in (36, 60, 90, 108, 180, 270, 360, 540, 1080, 2160, 3240):
        for dst_h in (30, 36, 54, 90, 108, 120, 360, 1080):
            for R in (2, 4, 6, 8, 10, 12, 30):
                if dst_h % R:
                    continue
                cases.append((src_h, dst_h, R))
    assert cases
    n_checked = 0
    for src_h, dst_h, R in cases:
        for half in (False, True):
            if half and src_h % 2:
                continue
            v = _v_bake(src_h, dst_h, R, 0, half_of_full=half)
            if v is None:
                continue
            plane_rows = src_h // 2 if half else src_h
            padded = -(-plane_rows // 8) * 8
            rows_in = v["rows_in"]
            iy0, iy1, wy = axis_lerp_np(
                np.arange(dst_h, dtype=np.int64), src_h, dst_h)
            if half:
                iy0, iy1 = iy0 // 2, iy1 // 2
            for s, r0 in enumerate(np.asarray(v["rstarts"], np.int64)):
                assert r0 % 8 == 0
                assert r0 >= 0
                assert r0 + rows_in <= padded, (
                    f"window overruns padded allocation: src_h={src_h} "
                    f"dst_h={dst_h} R={R} half={half} band={s}: "
                    f"{r0}+{rows_in} > {padded}")
                q = slice(s * R, (s + 1) * R)
                assert iy0[q].min() - r0 >= 0 and iy1[q].max() - r0 < rows_in
                # any window row past the logical plane must have zero weight
                wv = v["wv"][s]
                overrun = np.arange(rows_in) + r0 >= plane_rows
                assert np.all(wv[:, overrun] == 0.0)
                n_checked += 1
    assert n_checked > 200


def test_auto_gate_small_frame_not_profitable(rng):
    """ParBackend.AUTO must never route a pipeline into a slower kernel:
    the frame kernel supports tiny frames but loses ~8x to XLA there
    (measured 133 vs 17 us on a 64x128 frame — fixed launch overheads), so
    the profitability gate must exclude them. The 6K NV12 config (5.9x
    measured win) must pass the gate."""
    small = rng.integers(0, 256, (128, 128, 3)).astype(np.uint8)
    pipe_small = cvgs.build_pipeline(
        cvgs.resize(cvgs.image(small), cvgs.Size(64, 128)),
        cvgs.convert_to(np.float32, alpha=1 / 255.0),
        cvgs.split_tensor(),
    )
    assert pallas_frame.supports(pipe_small)
    assert not pallas_frame.profitable(pipe_small)

    buf = rng.integers(0, 256, (3240 * 3 // 2, 5760)).astype(np.uint8)
    pipe_nv12 = cvgs.build_pipeline(
        cvgs.resize(
            cvgs.fuse(
                cvgs.read_yuv(buf),
                cvgs.convert_yuv_to_rgb(standard=cvgs.ColorStandard.BT709,
                                        out_dtype=np.float32),
            ),
            cvgs.Size(1920, 1080),
        ),
        cvgs.multiply(1 / 255.0),
        cvgs.split_tensor(),
    )
    assert pallas_frame.supports(pipe_nv12)
    assert pallas_frame.profitable(pipe_nv12)


def test_w3_fractional_ratio_regime(rng):
    """Fractional downscale (3.2:1-style) rides the weight-Dekker-3 bf16
    first pass (VERDICT r3 #7): u8 values exact in bf16, wh = hi+lo+lo2
    reproduces the f32 weight to 2^-24 — accuracy >= the f32-HIGHEST dot it
    replaces, at ~half the MXU cost."""
    img = _img(rng, h=128, w=1024)  # 1024 -> 320: 3.2:1
    ops = [
        cvgs.resize(cvgs.image(img), cvgs.Size(320, 40)),
        cvgs.multiply(np.float32(1 / 255.0)),
        cvgs.split_tensor(),
    ]
    pipe = cvgs.build_pipeline(*ops)
    assert pallas_frame.supports(pipe)
    plan = pallas_frame._plan_of(pipe)
    assert not plan["exact"] and plan["y"]["w3"]
    x, p = _both(ops)
    check_float(p, x, msg="w3 fractional regime vs xla")
