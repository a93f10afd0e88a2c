# general-affine warp kernel on hardware: numerics vs XLA + timing
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
for m in [k for k in list(sys.modules) if k.startswith("cvgpuspeedup_tpu") or k == "bench"]:
    del sys.modules[m]
import time

import cv2
import jax

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.exec import pallas_warp_general as pwg
from cvgpuspeedup_tpu.utils.profiling import transfer_sync as sync

rng = np.random.default_rng(7)
img = rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8)
m = cv2.getRotationMatrix2D((960, 540), 10.0, 1 / 3.0)
ops = [cvgs.warp(img, m, cvgs.Size(640, 360)),
       cvgs.multiply((2.0, 0.5, 1.0)), cvgs.split_tensor()]
pipe = cvgs.build_pipeline(*ops)
plan = pwg._plan(pipe)
print("plan:", {k: plan[k] for k in
                ("R", "T", "K", "L", "L_pad", "S_v", "S_h", "n_bands", "n_strips")},
      flush=True)

x = np.asarray(cvgs.execute_operations(*ops, backend=cvgs.ParBackend.XLA))
out = pwg.try_lower(pipe, interpret=False)
p = np.asarray(out)
d = np.abs(p - x).max()
print("HW numerics vs XLA: max|diff| =", d, flush=True)

# timing: unrolled differential (perturb the matrix translation via coeffs
# leaf so iterations cannot CSE; geometry buckets unchanged -> no recompile)
leaves, treedef = jax.tree_util.tree_flatten(pipe)
ci = next(i for i, l in enumerate(leaves)
          if getattr(l, "shape", None) == (6,))

def make_run(lower, inner):
    @jax.jit
    def run_n(ls, seed):
        total = jax.numpy.float32(0.0)
        for i in range(inner):
            lv = list(ls)
            lv[ci] = lv[ci] + jax.numpy.float32(1e-6) * ((i % 7) + seed)
            pp = jax.tree_util.tree_unflatten(treedef, lv)
            o = lower(pp)
            if isinstance(o, (tuple, list)):
                o = o[0]
            total = total + o[(0,) * o.ndim].astype(jax.numpy.float32)
        return total
    dl = [jax.device_put(l) for l in leaves]
    return lambda seed=0: run_n(dl, jax.numpy.int32(seed))

def diff_time(lower, inner, k_small, k_large, reps=5):
    run = make_run(lower, inner)
    sync(run())
    ts_l = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for j in range(k_small):
            t = run(j % 3)
        sync(t)
        t1 = time.perf_counter()
        for j in range(k_large):
            t = run(j % 3)
        sync(t)
        t2 = time.perf_counter()
        ts_l.append(((t2 - t1) - (t1 - t0)) / ((k_large - k_small) * inner))
    ts_l.sort()
    print("  per-call us:", [f"{v*1e6:.1f}" for v in ts_l], flush=True)
    return ts_l[len(ts_l) // 2]

t_k = diff_time(lambda pp: pwg.try_lower(pp, interpret=False), 20, 2, 8)
print(f"general warp kernel: {t_k*1e6:.1f} us/frame", flush=True)
t_x = diff_time(lambda pp: pp.lower(), 2, 1, 4)
print(f"XLA gather path:    {t_x*1e6:.1f} us/frame  ({t_x/t_k:.1f}x)", flush=True)
