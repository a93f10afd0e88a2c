# warp kernel after M-stacked Dekker: all-distinct timing + parity
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
for m in [k for k in list(sys.modules) if k.startswith("cvgpuspeedup_tpu")]:
    del sys.modules[m]
import time
import cv2
import jax
import jax.numpy as jnp
import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.exec import pallas_warp_general as pwg
from cvgpuspeedup_tpu.utils.profiling import transfer_sync as sync

rng = np.random.default_rng(7)
img = rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8)
m = cv2.getRotationMatrix2D((960, 540), 10.0, 1 / 3.0)
ops = [cvgs.warp(img, m, cvgs.Size(640, 360)),
       cvgs.multiply((2.0, 0.5, 1.0)), cvgs.split_tensor()]
pipe = cvgs.build_pipeline(*ops)
x = np.asarray(cvgs.execute_operations(*ops, backend=cvgs.ParBackend.XLA))
p = np.asarray(pwg.try_lower(pipe, interpret=False))
print("parity:", np.abs(p - x).max(), flush=True)
leaves, treedef = jax.tree_util.tree_flatten(pipe)
ci = next(i for i, l in enumerate(leaves) if getattr(l, "shape", None) == (6,))

def diff_time(lower, inner=20, k_small=2, k_large=8, reps=7):
    @jax.jit
    def run_n(ls, seed):
        total = jnp.float32(0.0)
        for i in range(inner):
            lv = list(ls)
            lv[ci] = lv[ci] + jnp.float32(1e-6) * (i + seed)  # ALL DISTINCT
            o = lower(jax.tree_util.tree_unflatten(treedef, lv))
            if isinstance(o, (tuple, list)):
                o = o[0]
            total = total + o[(0,) * o.ndim].astype(jnp.float32)
        return total
    dl = [jax.device_put(l) for l in leaves]
    run = lambda seed=0: run_n(dl, jnp.int32(seed))
    sync(run())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for j in range(k_small): t = run(j % 3)
        sync(t); t1 = time.perf_counter()
        for j in range(k_large): t = run(j % 3)
        sync(t); t2 = time.perf_counter()
        ts.append(((t2-t1)-(t1-t0))/((k_large-k_small)*inner))
    ts.sort()
    print("   samples us:", [f"{v*1e6:.1f}" for v in ts], flush=True)
    return ts[len(ts)//2]

t = diff_time(lambda pp: pwg.try_lower(pp, interpret=False))
print(f"warp kernel (M-stacked Dekker): {t*1e6:.1f} us", flush=True)
for rt in ((24, 64), (8, 32), (24, 16)):
    pwg._FORCE_RT = rt
    plan = pwg._plan(pipe)
    if plan is None:
        print(f"RT={rt}: no plan", flush=True); continue
    t2 = diff_time(lambda pp: pwg.try_lower(pp, interpret=False))
    print(f"RT={rt}: {t2*1e6:.1f} us", flush=True)
pwg._FORCE_RT = None
