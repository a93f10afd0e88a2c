# warp kernel stage bisection via source-patched variants
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
import cvgpuspeedup_tpu.exec.pallas_warp_general as pwg
from cvgpuspeedup_tpu.utils.profiling import transfer_sync as sync

rng = np.random.default_rng(7)
img = rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8)
m = cv2.getRotationMatrix2D((960, 540), 10.0, 1 / 3.0)
ops = [cvgs.warp(img, m, cvgs.Size(640, 360)),
       cvgs.multiply((2.0, 0.5, 1.0)), cvgs.split_tensor()]
pipe = cvgs.build_pipeline(*ops)
leaves, treedef = jax.tree_util.tree_flatten(pipe)
ci = next(i for i, l in enumerate(leaves) if getattr(l, "shape", None) == (6,))

def diff_time(lower, inner=20, k_small=2, k_large=8, reps=5):
    @jax.jit
    def run_n(ls, seed):
        total = jnp.float32(0.0)
        for i in range(inner):
            lv = list(ls)
            lv[ci] = lv[ci] + jnp.float32(1e-6) * (i + seed)
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
    return ts[len(ts)//2]

src0 = open(pwg.__file__).read()

VARIANTS = {
  "full": None,
  "no_hdot": (
    """        d3 = jax.lax.dot_general(
            jnp.concatenate([hi, lo, lo2], axis=0), g, dn,
            precision=_DEFAULT, preferred_element_type=jnp.float32,
        )  # (3R, (S_h+1)*tn)
        d_all = d3[:R] + d3[R : 2 * R] + d3[2 * R :]""",
    """        d_all = (jnp.zeros((R, (S_h + 1) * tn), jnp.float32)
                 + hi[0, 0].astype(jnp.float32) + g[0, 0].astype(jnp.float32))""",
  ),
  "no_vdot": (
    """        v_all = jax.lax.dot_general(
            gv, win, (((1,), (0,)), ((), ())),
            precision=_DEFAULT, preferred_element_type=jnp.float32,
        )  # (S_v*R, L): candidate source rows, exact u8 values""",
    """        v_all = (jnp.zeros((S_v * R, L), jnp.float32)
                 + win[0, 0].astype(jnp.float32) + gv[0, 0].astype(jnp.float32))""",
  ),
  "no_select": (
    "        acc = jnp.zeros((R, L), jnp.float32)\n        for s in range(S_v):",
    "        acc = jnp.zeros((R, L), jnp.float32)\n        for s in range(0):",
  ),
  "no_consumer": (
    "        xhat = jnp.floor(((p_f - 1.0) - orow) * inv_a).astype(jnp.int32)",
    "        xhat = (p_px * 0).astype(jnp.int32)",
  ),
}
for name, patch in VARIANTS.items():
    src = src0
    if patch is not None:
        a, b = patch
        if a not in src:
            print(name, ": PATCH MISS", flush=True)
            continue
        src = src.replace(a, b)
    mod = dict(pwg.__dict__)
    exec(compile(src, pwg.__file__, "exec"), mod)
    import types
    fake = types.SimpleNamespace(**mod)
    try:
        t = diff_time(lambda pp: mod["try_lower"](pp, interpret=False))
        print(f"{name}: {t*1e6:.1f} us", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
