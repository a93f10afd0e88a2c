# probe: lane rotate on the packed-i32 bitcast view of a u8 window.
# Correctness is packing-order independent (roll permutes whole lanes and the
# two bitcasts invert), but Mosaic must (a) accept the shape-changing bitcast
# and (b) rotate correctly with a traced shift (pow2 lanes, 32-bit view).
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern(d_ref, x_ref, o_ref):
    v = pltpu.bitcast(x_ref[...], jnp.int32)
    v = pltpu.roll(v, -d_ref[0], 1)
    o_ref[...] = pltpu.bitcast(v, jnp.uint8)


x = (np.arange(128 * 512) % 251).astype(np.uint8).reshape(128, 512)
fn = pl.pallas_call(
    kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ),
    out_shape=jax.ShapeDtypeStruct((128, 512), jnp.uint8),
)
for d in (0, 1, 37, 127, 255, 300):
    out = np.asarray(fn(np.array([d], np.int32), x))
    ref = np.roll(x, -d, axis=1)
    print("u8 shift", d, "OK" if np.array_equal(out, ref) else "WRONG", flush=True)

# u16 variant (packs 2 rows per i32 sublane)
x16 = (np.arange(128 * 512) % 60001).astype(np.uint16).reshape(128, 512)


def kern16(d_ref, x_ref, o_ref):
    v = pltpu.bitcast(x_ref[...], jnp.int32)
    v = pltpu.roll(v, -d_ref[0], 1)
    o_ref[...] = pltpu.bitcast(v, jnp.uint16)


fn16 = pl.pallas_call(
    kern16,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ),
    out_shape=jax.ShapeDtypeStruct((128, 512), jnp.uint16),
)
for d in (1, 37, 255):
    out = np.asarray(fn16(np.array([d], np.int32), x16))
    ref = np.roll(x16, -d, axis=1)
    print("u16 shift", d, "OK" if np.array_equal(out, ref) else "WRONG", flush=True)
