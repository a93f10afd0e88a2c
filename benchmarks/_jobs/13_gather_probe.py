"""Probe Mosaic support for lane-axis dynamic gather in a Pallas kernel
(would unlock a general-affine warp kernel without one-hot matmuls)."""
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
A = rng.standard_normal((64, 512)).astype(np.float32)
IDX = rng.integers(0, 512, (64, 256)).astype(np.int32)

def k1(a_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(a_ref[...], i_ref[...], axis=1)

try:
    out = pl.pallas_call(k1, out_shape=jax.ShapeDtypeStruct((64, 256), jnp.float32))(A, IDX)
    ref = np.take_along_axis(A, IDX, axis=1)
    print("take_along_axis lanes ok, max|diff| =", np.abs(np.asarray(out) - ref).max())
except Exception as e:
    print("take_along_axis lanes FAILED:", type(e).__name__, str(e)[:300])

IDX2 = rng.integers(0, 64, (64, 512)).astype(np.int32)
def k2(a_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(a_ref[...], i_ref[...], axis=0)
try:
    out = pl.pallas_call(k2, out_shape=jax.ShapeDtypeStruct((64, 512), jnp.float32))(A, IDX2)
    ref = np.take_along_axis(A, IDX2, axis=0)
    print("take_along_axis sublanes ok, max|diff| =", np.abs(np.asarray(out) - ref).max())
except Exception as e:
    print("take_along_axis sublanes FAILED:", type(e).__name__, str(e)[:300])

# one-row gather via iota compare (fallback): timing scale check only
import time
from cvgpuspeedup_tpu.utils.profiling import transfer_sync as sync
def k3(a_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(a_ref[...], i_ref[...], axis=1)
try:
    f = pl.pallas_call(k3, out_shape=jax.ShapeDtypeStruct((64, 256), jnp.float32))
    g = jax.jit(lambda a, i: sum(f(a + np.float32(j), i).ravel()[0] for j in range(50)))
    sync(g(A, IDX))
    t0 = time.perf_counter()
    for _ in range(5):
        r = g(A, IDX)
    sync(r)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(25):
        r = g(A, IDX)
    sync(r)
    t2 = time.perf_counter() - t0
    print(f"gather (64,256) of (64,512): {(t2 - t1*5)/(20*50)*1e6:.2f} us/call")
except Exception as e:
    print("gather timing FAILED:", type(e).__name__, str(e)[:200])
