"""IR composition + compile-cache behavior.

Covers the reference's graph-build properties: ``then``/``fuse`` composition
(F4), parameter access on fused chains (``fk::get<N>`` analog), and the
"graph build is free" contract — changing runtime params must reuse the
compiled program (reference ``benchmarks/benchmark_CPUandGPU_cvGS_vs_fk.cu``
proves wrapper/build overhead ≈ 0; here the analog is jit-cache stability).
"""

import numpy as np
import jax

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.exec import executor
from cvgpuspeedup_tpu.graph import FusedCompute, FusedRead
from conftest import check_float


def test_then_composition_types(rng):
    img = rng.random((8, 8, 3), dtype=np.float32)
    m = cvgs.multiply(2.0)
    a = cvgs.add(1.0)
    fused = m.then(a)
    assert isinstance(fused, FusedCompute) and len(fused.ops) == 2
    read = cvgs.image(img).then(fused)
    assert isinstance(read, FusedRead) and len(read.chain) == 2
    # fuse() variadic mirrors fk::fuse
    read2 = cvgs.fuse(cvgs.image(img), m, a)
    assert isinstance(read2, FusedRead)
    out = np.asarray(cvgs.execute_operations(read2))
    check_float(out, img * 2.0 + 1.0, msg="fused read chain")


def test_fused_param_access():
    """fk::get<N>(params) analog: stage params are plain attributes."""
    chain = cvgs.fuse(cvgs.multiply(3.0), cvgs.add(4.0))
    assert float(chain.ops[0].value) == 3.0
    assert float(chain.ops[1].value) == 4.0


def test_param_change_does_not_recompile(rng):
    executor.clear_cache()
    img1 = rng.random((16, 16, 3), dtype=np.float32)
    img2 = rng.random((16, 16, 3), dtype=np.float32)

    out1 = cvgs.execute_operations(cvgs.image(img1), cvgs.multiply(2.0))
    n_after_first = len(executor._CACHE)
    out2 = cvgs.execute_operations(cvgs.image(img2), cvgs.multiply(5.0))
    assert len(executor._CACHE) == n_after_first, "param change must hit the cache"
    check_float(out1, img1 * 2.0)
    check_float(out2, img2 * 5.0)

    # different structure -> new cache entry
    cvgs.execute_operations(cvgs.image(img1), cvgs.multiply(2.0), cvgs.add(1.0))
    assert len(executor._CACHE) == n_after_first + 1


def test_ops_are_pytrees():
    op = cvgs.fuse(cvgs.multiply((1.0, 2.0, 3.0)), cvgs.add(0.5))
    leaves, treedef = jax.tree_util.tree_flatten(op)
    assert len(leaves) == 2
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(rebuilt, FusedCompute)


def test_single_program_compilation(rng):
    """The whole chain lowers to ONE jitted XLA program (the reference's
    single-kernel guarantee — SURVEY.md §0). We verify via jaxpr: a fused
    pipeline traces to one closed jaxpr with no nested pjit calls per op."""
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    pipeline = cvgs.build_pipeline(
        cvgs.image(img),
        cvgs.convert_to(np.float32, 0.5),
        cvgs.subtract((1.0, 2.0, 3.0)),
        cvgs.divide(2.0),
        cvgs.split_tensor(),
    )
    leaves, treedef = jax.tree_util.tree_flatten(pipeline)

    def run(ls):
        return jax.tree_util.tree_unflatten(treedef, ls).lower()

    jaxpr = jax.make_jaxpr(run)(leaves)
    prims = {eqn.primitive.name for eqn in jaxpr.eqns}
    assert "pjit" not in prims or all(e.primitive.name != "custom_call" for e in jaxpr.eqns)
    out = np.asarray(cvgs.execute_operations(
        cvgs.image(img),
        cvgs.convert_to(np.float32, 0.5),
        cvgs.subtract((1.0, 2.0, 3.0)),
        cvgs.divide(2.0),
        cvgs.split_tensor(),
    ))
    assert out.shape == (3, 32, 32)


def test_pending_geometry_ops(rng):
    """cvGS::resize(dsize) / cvGS::crop(rect) source-less overloads bind to
    the preceding read via .then or positionally in execute_operations."""
    import cvgpuspeedup_tpu as cvgs
    frame = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
    # .then-binding
    read = cvgs.image(frame).then(cvgs.crop(cvgs.Rect(8, 4, 32, 16))).then(
        cvgs.resize(cvgs.Size(16, 8))
    )
    out = np.asarray(cvgs.execute_operations(read))
    ref = np.asarray(cvgs.execute_operations(
        cvgs.resize(cvgs.crop(frame, cvgs.Rect(8, 4, 32, 16)), cvgs.Size(16, 8))
    ))
    check_float(out, ref, tol=0)
    # positional binding inside execute_operations (after a fused read)
    out2 = np.asarray(cvgs.execute_operations(
        cvgs.image(frame),
        cvgs.vector_reorder(2, 1, 0),
        cvgs.resize(dsize=cvgs.Size(16, 8)),
        cvgs.multiply(2.0),
    ))
    ref2 = np.asarray(cvgs.execute_operations(
        cvgs.resize(cvgs.fuse(cvgs.image(frame), cvgs.vector_reorder(2, 1, 0)),
                    cvgs.Size(16, 8)),
        cvgs.multiply(2.0),
    ))
    check_float(out2, ref2, tol=0)


def test_set_to():
    import cvgpuspeedup_tpu as cvgs
    x = cvgs.set_to(3.5, (4, 5, 2))
    assert x.shape == (4, 5, 2) and float(np.asarray(x)[0, 0, 0]) == 3.5
