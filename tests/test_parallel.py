"""Batch sharding over the 8-device virtual CPU mesh — the multi-chip path
(new TPU-native scope, SURVEY.md §5.8; no reference analog)."""

import numpy as np
import pytest
import jax

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.parallel import mesh as pmesh
from conftest import check_float


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must set 8 virtual CPU devices"
    return pmesh.make_mesh(8)


def test_sharded_flagship_matches_single(rng, mesh8):
    frame = rng.integers(0, 256, (296, 384, 3)).astype(np.uint8)
    rects = np.array([[i, i, 60, 120] for i in range(16)], np.int32)
    ops = lambda: [
        cvgs.resize_batch(frame, rects=rects, dsize=cvgs.Size(64, 128)),
        cvgs.convert_to(np.float32, alpha=0.3),
        cvgs.subtract((3.2, 0.6, 11.8)),
        cvgs.divide((128.0, 128.0, 128.0)),
        cvgs.split_tensor(),
    ]
    single = np.asarray(cvgs.execute_operations(*ops(), backend=cvgs.ParBackend.XLA))
    sharded = pmesh.execute_sharded(*ops(), mesh=mesh8, backend=cvgs.ParBackend.XLA)
    assert sharded.sharding.spec == jax.sharding.PartitionSpec("batch")
    check_float(np.asarray(sharded), single, tol=0, msg="sharded == single")


def test_sharded_ragged_used_planes(rng, mesh8):
    """Global used_planes is rebased per shard (planes 0..10 active of 16)."""
    frame = rng.integers(0, 256, (296, 384, 3)).astype(np.uint8)
    rects = np.array([[i, i, 40, 80] for i in range(16)], np.int32)
    ops = lambda: [
        cvgs.resize_batch(frame, rects=rects, dsize=cvgs.Size(32, 64),
                          used_planes=11, background=5.0),
    ]
    single = np.asarray(cvgs.execute_operations(*ops(), backend=cvgs.ParBackend.XLA))
    sharded = np.asarray(
        pmesh.execute_sharded(*ops(), mesh=mesh8, backend=cvgs.ParBackend.XLA)
    )
    check_float(sharded, single, tol=0, msg="ragged sharded")
    assert np.all(sharded[11:] == 5.0)


def test_sharded_batched_image_pipeline(rng, mesh8):
    batch = rng.integers(0, 256, (8, 16, 32, 3)).astype(np.uint8)
    ops = lambda: [
        cvgs.image(batch),
        cvgs.convert_to(np.float32, alpha=2.0),
        cvgs.split_tensor(),
    ]
    single = np.asarray(cvgs.execute_operations(*ops(), backend=cvgs.ParBackend.XLA))
    sharded = np.asarray(pmesh.execute_sharded(*ops(), mesh=mesh8))
    check_float(sharded, single, tol=0, msg="image batch sharded")


def test_sharded_transposed_layout(rng, mesh8):
    batch = rng.integers(0, 256, (8, 16, 32, 3)).astype(np.uint8)
    ops = lambda: [cvgs.image(batch), cvgs.split_tensor_transposed()]
    single = np.asarray(cvgs.execute_operations(*ops(), backend=cvgs.ParBackend.XLA))
    sharded = pmesh.execute_sharded(*ops(), mesh=mesh8)
    assert sharded.sharding.spec == jax.sharding.PartitionSpec(None, "batch")
    check_float(np.asarray(sharded), single, tol=0, msg="transposed sharded")


def test_plane_count_must_divide(rng, mesh8):
    frame = rng.integers(0, 256, (296, 384, 3)).astype(np.uint8)
    rects = np.array([[0, 0, 8, 8]] * 6, np.int32)
    with pytest.raises(ValueError):
        pmesh.execute_sharded(
            cvgs.resize_batch(frame, rects=rects, dsize=cvgs.Size(8, 8)),
            mesh=mesh8,
        )
