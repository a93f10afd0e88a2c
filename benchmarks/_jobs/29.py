"""PRESERVE_AR flagship with the static-letterbox exact-bf16 path."""
import time
import numpy as np, jax, jax.numpy as jnp
import cv2
import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.exec import pallas_backend
from cvgpuspeedup_tpu.utils.profiling import transfer_sync as sync

rng = np.random.default_rng(5)
frame4k = rng.integers(0, 256, (2160, 3840, 3)).astype(np.uint8)
rects = np.array([[i, i, 60, 120] for i in range(50)], np.int32)
pipeAR = cvgs.build_pipeline(
    cvgs.resize_batch(frame4k, rects=rects, dsize=cvgs.Size(64, 128),
                      aspect_ratio=cvgs.AspectRatio.PRESERVE_AR,
                      background=128.0),
    cvgs.convert_to(np.float32, alpha=0.3),
    cvgs.subtract((3.2, 0.6, 11.8)),
    cvgs.divide((128.0, 128.0, 128.0)),
    cvgs.split_tensor(),
)
read = pipeAR.read
print("exact gate:", pallas_backend._exact_bf16_geometry(
    np.dtype(np.uint8), 64, 128, cvgs.AspectRatio.PRESERVE_AR, read.uniform_wh))
leavesA, treedefA = jax.tree_util.tree_flatten(pipeAR)
out_a = np.asarray(jax.jit(lambda ls: pallas_backend.try_lower(
    jax.tree_util.tree_unflatten(treedefA, ls)))([jax.device_put(l) for l in leavesA]))

def letterbox(crop, dw, dh, bg):
    h, w = crop.shape[:2]
    s = min(dw / w, dh / h)
    nw, nh = int(s * w), int(s * h)
    r = cv2.resize(crop.astype(np.float32), (nw, nh), interpolation=cv2.INTER_LINEAR)
    out = np.full((dh, dw, 3), bg, np.float32)
    ox, oy = (dw - nw) // 2, (dh - nh) // 2
    out[oy:oy+nh, ox:ox+nw] = r
    return out
refs = []
for (x, y, w, h) in rects:
    r = letterbox(frame4k[y:y+h, x:x+w], 64, 128, 128.0)
    r = (r * np.float32(0.3) - np.float32((3.2, 0.6, 11.8))) / np.float32((128.0,)*3)
    refs.append(r.transpose(2, 0, 1))
print("PRESERVE_AR exact on-device max|diff| vs cv2:", np.abs(out_a - np.stack(refs)).max())

idx = next(i for i, l in enumerate(leavesA) if getattr(l, "shape", None) == (50, 4))
@jax.jit
def run(ls, seed):
    tot = jnp.float32(0.0)
    for i in range(100):
        lv = list(ls)
        lv[idx] = lv[idx] + (i % 97) + seed
        out = pallas_backend.try_lower(jax.tree_util.tree_unflatten(treedefA, lv))
        tot = tot + out[(0,) * out.ndim].astype(jnp.float32)
    return tot
dl = [jax.device_put(l) for l in leavesA]
sync(run(dl, jnp.int32(0)))
def run_k(k):
    t = None
    for j in range(k):
        t = run(dl, jnp.int32(j % 3))
    sync(t)
diffs = []
for _ in range(5):
    t0 = time.perf_counter(); run_k(2); ts = time.perf_counter() - t0
    t0 = time.perf_counter(); run_k(12); tl = time.perf_counter() - t0
    diffs.append(max(tl - ts, 1e-9) / (10 * 100))
diffs.sort()
print(f"PRESERVE_AR exact-bf16: {diffs[2]*1e6:.1f} us/batch  {[f'{d*1e6:.0f}' for d in diffs]}")
