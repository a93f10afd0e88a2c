"""Fused pointwise chains & channel split vs cv2 — the ``tests/read/``
and ``tests/unit_tests/test_split.cu`` analogs (reference
``test_read_x_write.cu:121-144``, ``test_read_x_split.cu:108-154``,
``test_split.cu:47-90``).
"""

import cv2
import numpy as np
import pytest

import cvgpuspeedup_tpu as cvgs
from conftest import check_exact, check_float


def _rand_u8(rng, h=45, w=77, c=3):
    return rng.integers(0, 256, size=(h, w, c)).astype(np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("src_dtype", [np.uint8, np.uint16, np.int16, np.float32])
def test_convert_sub_mul_div_chain(rng, channels, src_dtype):
    """The canonical normalize chain: convertTo(f32, a) -> sub -> mul -> div."""
    if np.issubdtype(src_dtype, np.integer):
        info = np.iinfo(src_dtype)
        img = rng.integers(max(info.min, -1000), min(info.max, 1000) + 1,
                           size=(45, 77, channels)).astype(src_dtype)
    else:
        img = (rng.random((45, 77, channels), dtype=np.float32) * 255).astype(src_dtype)
    alpha = 0.3
    sub = tuple(np.linspace(1.0, 4.0, channels))
    div = tuple(np.linspace(2.0, 8.0, channels))

    out = np.asarray(
        cvgs.execute_operations(
            cvgs.image(img),
            cvgs.convert_to(np.float32, alpha=alpha),
            cvgs.subtract(sub),
            cvgs.divide(div),
        )
    )

    f = cv2.addWeighted(img, alpha, img, 0.0, 0.0, dtype=cv2.CV_32F).reshape(img.shape)
    f = cv2.subtract(f, np.array(sub, np.float64)[: channels if channels <= 4 else None])
    f = cv2.divide(f, np.array(div, np.float64))
    f = f.reshape(img.shape)
    check_float(out, f, msg="normalize chain")


@pytest.mark.parametrize("op,cvfn", [
    ("multiply", cv2.multiply),
    ("add", cv2.add),
    ("subtract", cv2.subtract),
])
@pytest.mark.parametrize("dtype", [np.uint8, np.int16])
def test_integer_saturating_arith(rng, op, cvfn, dtype):
    """OpenCV integer arithmetic saturates (never wraps); ints stay bit-exact."""
    info = np.iinfo(dtype)
    img = rng.integers(info.min, info.max + 1, size=(33, 41, 3)).astype(dtype)
    val = (100.0, 200.0, 50.0)
    out = np.asarray(
        cvgs.execute_operations(cvgs.image(img), getattr(cvgs, op)(val))
    )
    ref = cvfn(img, np.array(val, np.float64)).reshape(img.shape)
    check_exact(out, ref, f"{op} {dtype}")


def test_split_single(rng):
    img = _rand_u8(rng)
    outs = cvgs.execute_operations(cvgs.image(img), cvgs.split())
    refs = cv2.split(img)
    assert len(outs) == 3
    for got, ref in zip(outs, refs):
        check_exact(got, ref, "split plane")


def test_split_batch(rng):
    batch = np.stack([_rand_u8(rng) for _ in range(10)])
    outs = cvgs.execute_operations(cvgs.image(batch), cvgs.split())
    assert len(outs) == 3 and outs[0].shape == (10, 45, 77)
    for z in range(10):
        refs = cv2.split(batch[z])
        for c in range(3):
            check_exact(np.asarray(outs[c])[z], refs[c], f"batch split z={z} c={c}")


def test_split_tensor_layouts(rng):
    batch = np.stack([_rand_u8(rng, 8, 9) for _ in range(5)])
    planar = np.asarray(cvgs.execute_operations(cvgs.image(batch), cvgs.split_tensor()))
    assert planar.shape == (5, 3, 8, 9)
    transposed = np.asarray(
        cvgs.execute_operations(cvgs.image(batch), cvgs.split_tensor_transposed())
    )
    assert transposed.shape == (3, 5, 8, 9)
    packed = np.asarray(cvgs.execute_operations(cvgs.image(batch), cvgs.write_tensor()))
    assert packed.shape == (5, 8, 9, 3)
    for z in range(5):
        for c in range(3):
            check_exact(planar[z, c], batch[z, :, :, c], "TensorSplit")
            check_exact(transposed[c, z], batch[z, :, :, c], "TensorTSplit")
    check_exact(packed, batch, "TensorWrite")


def test_static_loop_mad_chain(rng):
    """The MAD-loop vertical-fusion stress (reference
    ``benchmarks/benchmark_image_resolution_MAD_loop.cu:47-72``): 200 fused
    mul/add ops between one read and one write."""
    img = rng.random((16, 128), dtype=np.float32)
    mad = cvgs.fuse(cvgs.multiply(1.001), cvgs.add(0.001))
    loop = cvgs.static_loop(cvgs.static_loop(mad, 10), 10)
    out = np.asarray(
        cvgs.execute_operations(cvgs.image(img[..., None]), loop)
    )[..., 0]
    ref = img.copy()
    for _ in range(100):
        ref = ref * np.float32(1.001) + np.float32(0.001)
    check_float(out, ref, tol=1e-3, msg="MAD loop x100")


def test_vector_reorder(rng):
    img = _rand_u8(rng, c=4)
    out = np.asarray(
        cvgs.execute_operations(cvgs.image(img), cvgs.vector_reorder(2, 1, 0, 3))
    )
    check_exact(out, img[..., [2, 1, 0, 3]], "VectorReorder<2,1,0,3>")
