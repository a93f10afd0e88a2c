"""CircularTensor + CircularBatchRead semantics — exact ground-truth loops
mirroring reference ``tests/batchread/test_circularbatchread_x_write3D.cu``:

- CircularBatchRead: output plane z reads input plane (first + z) % N (:59-84)
- CircularTensor NewestFirst: after k updates plane z holds frame k-z (:209-221)
- CircularTensor OldestFirst: plane z holds frame k-(BATCH-z-1) (:440-459)
- layout variants Standard/Transposed/Packed (:264-337,400-460)
"""

import numpy as np
import pytest

import cvgpuspeedup_tpu as cvgs
from conftest import check_exact, check_float

W, H, C, BATCH = 8, 6, 3, 4


def _frame(k):
    """Deterministic frame content: value encodes (frame, channel, y, x)."""
    base = np.arange(H * W, dtype=np.float32).reshape(H, W)
    return np.stack([base + 1000 * k + 100 * c for c in range(C)], axis=-1)


def test_circular_batch_read_ascendent(rng):
    data = np.stack([_frame(k) for k in range(BATCH)])
    for first in range(BATCH):
        out = np.asarray(
            cvgs.execute_operations(cvgs.circular_batch_read(data, first=first))
        )
        for z in range(BATCH):
            check_float(out[z], data[(first + z) % BATCH], msg=f"first={first} z={z}")


def test_circular_batch_read_descendent(rng):
    data = np.stack([_frame(k) for k in range(BATCH)])
    out = np.asarray(
        cvgs.execute_operations(
            cvgs.circular_batch_read(data, first=2, ascendent=False)
        )
    )
    for z in range(BATCH):
        check_float(out[z], data[(2 - z) % BATCH], msg=f"desc z={z}")


def test_circular_batch_read_fused_chain(rng):
    """CircularBatchRead feeding a compute chain + tensor write, one program
    (reference :59-94 runs it through buildOperationSequence + Add)."""
    data = np.stack([_frame(k) for k in range(BATCH)])
    out = np.asarray(
        cvgs.execute_operations(
            cvgs.circular_batch_read(data, first=1),
            cvgs.add(3.0),
            cvgs.split_tensor(),
        )
    )
    assert out.shape == (BATCH, C, H, W)
    for z in range(BATCH):
        ref = (data[(1 + z) % BATCH] + 3.0).transpose(2, 0, 1)
        check_float(out[z], ref, msg=f"fused z={z}")


@pytest.mark.parametrize("order,expected_fn", [
    (cvgs.CircularTensorOrder.NEWEST_FIRST, lambda k, z: k - z),
    (cvgs.CircularTensorOrder.OLDEST_FIRST, lambda k, z: k - (BATCH - z - 1)),
])
@pytest.mark.parametrize("planes", [
    cvgs.ColorPlanes.STANDARD,
    cvgs.ColorPlanes.TRANSPOSED,
    cvgs.ColorPlanes.PACKED,
])
def test_circular_tensor_orders_and_layouts(order, expected_fn, planes):
    ct = cvgs.CircularTensor(
        width=W, height=H, channels=C, batch=BATCH, order=order, planes=planes
    )
    n_updates = 7
    for k in range(1, n_updates + 1):
        ct.update(cvgs.image(_frame(k)), cvgs.multiply(2.0))
    t = np.asarray(ct.tensor)
    for z in range(BATCH):
        fk = expected_fn(n_updates, z)
        expect = _frame(fk) * 2.0 if fk >= 1 else np.zeros((H, W, C), np.float32)
        if planes == cvgs.ColorPlanes.STANDARD:
            got = t[z].transpose(1, 2, 0)
        elif planes == cvgs.ColorPlanes.TRANSPOSED:
            got = t[:, z].transpose(1, 2, 0)
        else:
            got = t[z]
        check_float(got, expect, msg=f"{order.name}/{planes.name} z={z}")


def test_circular_tensor_update_with_input_array():
    """The cvGS wrapper form: update(stream, GpuMat, iops...) — input= array."""
    ct = cvgs.CircularTensor(width=W, height=H, channels=C, batch=2)
    ct.update(input=_frame(1).astype(np.uint8), )
    ct.update(input=_frame(2).astype(np.uint8), )
    t = np.asarray(ct.tensor)
    check_float(t[0].transpose(1, 2, 0), _frame(2).astype(np.uint8).astype(np.float32))


def test_circular_tensor_matching_write_op_accepted():
    ct = cvgs.CircularTensor(width=W, height=H, channels=C, batch=2)
    ct.update(cvgs.image(_frame(1)), cvgs.convert_to(np.float32), cvgs.split_tensor())
    with pytest.raises(ValueError):
        ct.update(cvgs.image(_frame(1)), cvgs.split_tensor_transposed())


def test_circular_tensor_uint8_dtype():
    ct = cvgs.CircularTensor(width=W, height=H, channels=C, batch=3, dtype=np.uint8)
    for k in range(1, 4):
        ct.update(cvgs.image(_frame(k)), cvgs.convert_to(np.uint8))
    t = np.asarray(ct.tensor)
    assert t.dtype == np.uint8
    expect = np.clip(np.rint(_frame(3)), 0, 255).astype(np.uint8).transpose(2, 0, 1)
    check_exact(t[0], expect, "u8 ring newest plane")


def test_circular_tensor_save_load(tmp_path):
    ct = cvgs.CircularTensor(width=W, height=H, channels=C, batch=3)
    for k in range(1, 4):
        ct.update(cvgs.image(_frame(k)))
    p = str(tmp_path / "ring")
    ct.save(p)
    ct2 = cvgs.CircularTensor.load(p)
    assert ct2.order == ct.order and ct2.planes == ct.planes
    check_float(np.asarray(ct2.tensor), np.asarray(ct.tensor), tol=0)
    ct2.update(cvgs.image(_frame(4)))
    check_float(np.asarray(ct2.tensor[0]).transpose(1, 2, 0), _frame(4))


@pytest.mark.parametrize("order", [cvgs.CircularTensorOrder.NEWEST_FIRST,
                                   cvgs.CircularTensorOrder.OLDEST_FIRST])
def test_read_batch_zero_copy_head(order):
    """read_batch(): the rolling-offset ring presented in logical order by a
    CircularBatchRead at the head of a fused pipeline — no data movement.
    Checked against .tensor across several wraparounds."""
    ct = cvgs.CircularTensor(W, H, C, BATCH, order=order)
    for k in range(1, 11):  # 2.5 wraparounds of a 4-ring
        ct.update(cvgs.image(_frame(k)), cvgs.multiply(2.0))
        via_read = np.asarray(cvgs.execute_operations(ct.read_batch()))
        check_float(via_read, np.asarray(ct.tensor), tol=0,
                    msg=f"order={order.name} k={k}")
    # ground truth at k=10, plane 0
    newest = 10 if order == cvgs.CircularTensorOrder.NEWEST_FIRST else 7
    check_float(via_read[0].transpose(1, 2, 0), 2.0 * _frame(newest))


def test_read_batch_fused_chain():
    """The ring feeding a fused compute chain + write through the executor
    (PACKED layout: compute ops are channel-last)."""
    ct = cvgs.CircularTensor(W, H, C, BATCH, planes=cvgs.ColorPlanes.PACKED)
    for k in range(1, 6):
        ct.update(cvgs.image(_frame(k)))
    out = np.asarray(cvgs.execute_operations(
        ct.read_batch(), cvgs.subtract((1.0, 2.0, 3.0)), cvgs.split_tensor(),
    ))
    assert out.shape == (BATCH, C, H, W)
    ref = (np.asarray(ct.tensor) - np.array([1.0, 2.0, 3.0])).transpose(0, 3, 1, 2)
    check_float(out, ref, tol=0)


def test_read_batch_transposed_raises():
    ct = cvgs.CircularTensor(W, H, C, BATCH, planes=cvgs.ColorPlanes.TRANSPOSED)
    with pytest.raises(ValueError):
        ct.read_batch()


def test_update_writes_one_slot():
    """The update program must not copy the ring: its output differs from the
    donated input in exactly one plane slot."""
    ct = cvgs.CircularTensor(W, H, C, BATCH)
    for k in range(1, 4):
        before = np.asarray(ct._ring)
        ct.update(cvgs.image(_frame(k)))
        after = np.asarray(ct._ring)
        changed = [z for z in range(BATCH)
                   if not np.array_equal(before[z], after[z])]
        assert changed == [(k - 1) % BATCH]
