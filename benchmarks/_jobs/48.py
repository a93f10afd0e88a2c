# CSE audit: warp-general timing with ALL-DISTINCT vs %7 perturbations
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
leaves, treedef = jax.tree_util.tree_flatten(pipe)
ci = next(i for i, l in enumerate(leaves) if getattr(l, "shape", None) == (6,))

def diff_time(lower, pert_mod, inner=20, k_small=2, k_large=8, reps=7):
    @jax.jit
    def run_n(ls, seed):
        total = jnp.float32(0.0)
        for i in range(inner):
            lv = list(ls)
            step = (i % pert_mod) if pert_mod else i
            lv[ci] = lv[ci] + jnp.float32(1e-6) * (step + seed)
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

t7 = diff_time(lambda pp: pwg.try_lower(pp, interpret=False), 7)
print(f"warp kernel, %7 perturbation (old protocol): {t7*1e6:.1f} us", flush=True)
t_all = diff_time(lambda pp: pwg.try_lower(pp, interpret=False), 0)
print(f"warp kernel, ALL-DISTINCT perturbation:      {t_all*1e6:.1f} us", flush=True)
tx = diff_time(lambda pp: pp.lower(), 0, inner=4, k_small=1, k_large=3, reps=5)
print(f"XLA path, all-distinct:                      {tx*1e6:.1f} us "
      f"({tx/t_all:.1f}x)", flush=True)
