# NV12 frame kernel after the vmem-limit fix: both 6K configs, valid perturbation
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
for m in [k for k in list(sys.modules) if k.startswith("cvgpuspeedup_tpu")]:
    del sys.modules[m]
import time
import statistics
import jax
import jax.numpy as jnp
import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.exec import pallas_frame
from cvgpuspeedup_tpu.utils.profiling import transfer_sync as sync

rng = np.random.default_rng(1)

def measure(sw, sh, label):
    buf = rng.integers(0, 256, (sh * 3 // 2, sw)).astype(np.uint8)
    ops = [cvgs.resize(cvgs.fuse(cvgs.read_yuv(buf),
                                 cvgs.convert_yuv_to_rgb(
                                     standard=cvgs.ColorStandard.BT709,
                                     out_dtype=np.float32)),
                       cvgs.Size(1920, 1080)),
           cvgs.multiply(1 / 255.0), cvgs.split_tensor()]
    pipe = cvgs.build_pipeline(*ops)
    lower = lambda p: pallas_frame.try_lower(p, interpret=False)
    lowered = lower(pipe)
    if lowered is None:
        print(f"{label}: planner rejected", flush=True); return
    p0 = np.asarray(lowered)
    x = np.asarray(cvgs.execute_operations(*ops, backend=cvgs.ParBackend.XLA))
    print(f"{label}: parity {np.abs(p0-x).max():.2e}", flush=True)
    leaves, treedef = jax.tree_util.tree_flatten(pipe)
    mi = next(i for i, l in enumerate(leaves)
              if getattr(l, "shape", None) == ()
              and getattr(l, "dtype", None) == jnp.float32)
    @jax.jit
    def run_n(ls, seed):
        total = jnp.float32(0.0)
        for i in range(30):
            lv = list(ls)
            # DISTINCT f32 values per iteration (1e-9 steps round away)
            lv[mi] = lv[mi] * (jnp.float32(1.0) + jnp.float32(1e-5) * ((i % 7) + seed))
            o = lower(jax.tree_util.tree_unflatten(treedef, lv))
            if isinstance(o, (tuple, list)):
                o = o[0]
            total = total + o[(0,) * o.ndim].astype(jnp.float32)
        return total
    dl = [jax.device_put(l) for l in leaves]
    run = lambda seed=0: run_n(dl, jnp.int32(seed))
    sync(run())
    samples = []
    for rep in range(15):
        t0 = time.perf_counter()
        for j in range(2): t = run(j)
        sync(t); t1 = time.perf_counter()
        for j in range(8): t = run(j)
        sync(t); t2 = time.perf_counter()
        samples.append(((t2-t1)-(t1-t0))/(6*30))
    samples.sort()
    us = [s*1e6 for s in samples]
    mid = us[3:-3]
    print(f"  {[f'{v:.1f}' for v in us]}")
    print(f"  median {us[len(us)//2]:.1f} us, trimmed mean "
          f"{statistics.mean(mid):.1f}, trimmed stdev {statistics.stdev(mid):.2f}",
          flush=True)

measure(5760, 3240, "6K committed (5760x3240)")
measure(6144, 3168, "aligned 6K (6144x3168)")
