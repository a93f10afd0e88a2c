"""Packed-ingestion hardware validation + honest timings:
- flagship 4K 50-crop (packed frame; rect perturbation)
- 1080p frame kernel (packed; scalar + frame perturbation)
- 6K NV12 (alpha perturbation - buffer constant)
"""
import time
import numpy as np, jax, jax.numpy as jnp
import cvgpuspeedup_tpu as cvgs
import bench
from cvgpuspeedup_tpu.exec import pallas_backend, pallas_frame
from cvgpuspeedup_tpu.utils.profiling import transfer_sync as sync

rng = np.random.default_rng(42)

# ---- flagship (packed) ----
frame = rng.integers(0, 256, (2160, 3840, 3)).astype(np.uint8)
rects = np.array([[i, i, 60, 120] for i in range(50)], np.int32)
p = bench.build_pipeline(frame, rects)  # numpy -> packed ingestion
print("flagship packed supports:", pallas_backend.supports(p))
lower = lambda pp: pallas_backend.try_lower(pp, interpret=False)
bench.check_on_device(p, lower, frame, rects)
t = bench.differential_time(p, lower)
print(f"flagship packed (rect-perturbed): {t*1e6:.1f} us/batch")
pallas_backend._ABLATION = "floor"
tf = bench.differential_time(p, lower)
print(f"flagship packed floor: {tf*1e6:.1f} us/batch")
pallas_backend._ABLATION = None

def timeit(leaves, treedef, lower_fn, pick, label, inner=50, dt_=np.uint8):
    idx = next(i for i, l in enumerate(leaves) if pick(l))
    @jax.jit
    def run(ls, seed):
        tot = jnp.float32(0.0)
        for i in range(inner):
            lv = list(ls)
            lv[idx] = lv[idx] + jnp.asarray(i % 251, lv[idx].dtype) + seed
            pp = jax.tree_util.tree_unflatten(treedef, lv)
            out = lower_fn(pp)
            if isinstance(out, (tuple, list)):
                out = out[0]
            tot = tot + out[(0,) * out.ndim].astype(jnp.float32)
        return tot
    dl = [jax.device_put(l) for l in leaves]
    sync(run(dl, dt_(0)))
    def run_k(k):
        t = None
        for j in range(k):
            t = run(dl, dt_(j % 3))
        sync(t)
    diffs = []
    for _ in range(5):
        t0 = time.perf_counter(); run_k(1); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run_k(5); tl = time.perf_counter() - t0
        diffs.append(max(tl - ts, 1e-9) / (4 * inner))
    diffs.sort()
    print(f"{label}: {diffs[2]*1e6:.1f} us  {[f'{d*1e6:.0f}' for d in diffs]}")
    return diffs[2]

# ---- 1080p frame kernel (packed) ----
img = rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8)
pipe = cvgs.build_pipeline(
    cvgs.resize(cvgs.image(img), cvgs.Size(640, 360)),
    cvgs.convert_to(np.float32, alpha=1 / 255.0),
    cvgs.subtract((0.485, 0.456, 0.406)),
    cvgs.divide((0.229, 0.224, 0.225)),
    cvgs.split_tensor(),
)
print("1080p packed supports:", pallas_frame.supports(pipe))
leaves, treedef = jax.tree_util.tree_flatten(pipe)
import cv2
out_p = np.asarray(jax.jit(lambda ls: pallas_frame.try_lower(
    jax.tree_util.tree_unflatten(treedef, ls)))([jax.device_put(l) for l in leaves]))
r = cv2.resize(img, (640, 360), interpolation=cv2.INTER_LINEAR).astype(np.float32)
ref = ((r / 255.0) - np.float32((0.485, 0.456, 0.406))) / np.float32((0.229, 0.224, 0.225))
print("1080p packed on-device max|diff|:", np.abs(out_p - ref.transpose(2, 0, 1)).max())
timeit(leaves, treedef, lambda p: pallas_frame.try_lower(p),
       lambda l: getattr(l, "ndim", 0) == 2 and l.size > 10**6,
       "1080p packed pallas FRAME-perturbed")
timeit(leaves, treedef, lambda p: pallas_frame.try_lower(p),
       lambda l: getattr(l, "shape", None) == (3,),
       "1080p packed pallas scalar-perturbed", dt_=np.float32)
timeit(leaves, treedef, lambda p: p.lower(),
       lambda l: getattr(l, "ndim", 0) == 2 and l.size > 10**6,
       "1080p packed XLA frame-perturbed")

# ---- 6K NV12, alpha perturbed (buffer constant) ----
w6, h6 = 5760, 3240
buf = rng.integers(0, 256, (h6 * 3 // 2, w6)).astype(np.uint8)
pipe2 = cvgs.build_pipeline(
    cvgs.resize(cvgs.fuse(cvgs.read_yuv(buf),
                          cvgs.convert_yuv_to_rgb(standard=cvgs.ColorStandard.BT709,
                                                  out_dtype=np.float32)),
                cvgs.Size(1920, 1080)),
    cvgs.multiply(1 / 255.0),
    cvgs.split_tensor(),
)
leaves2, treedef2 = jax.tree_util.tree_flatten(pipe2)
timeit(leaves2, treedef2, lambda p: pallas_frame.try_lower(p),
       lambda l: getattr(l, "shape", None) == () or getattr(l, "shape", None) == (1,),
       "6K NV12 pallas alpha-perturbed", dt_=np.float32)
timeit(leaves2, treedef2, lambda p: p.lower(),
       lambda l: getattr(l, "ndim", 0) == 2 and l.size > 10**6,
       "6K NV12 XLA buffer-perturbed")
