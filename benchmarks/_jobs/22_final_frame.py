"""Final frame-kernel numbers with the fixed cost model (R=40 both configs),
with more reps for stable medians."""
import time
import numpy as np, jax, jax.numpy as jnp
import cv2
import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.exec import pallas_frame
from cvgpuspeedup_tpu.utils.profiling import transfer_sync as sync

rng = np.random.default_rng(1)


def timeit(leaves, treedef, pick, label, inner=30, dt_=np.float32, reps=9):
    idx = next(i for i, l in enumerate(leaves) if pick(l))
    @jax.jit
    def run(ls, seed):
        tot = jnp.float32(0.0)
        for i in range(inner):
            lv = list(ls)
            lv[idx] = lv[idx] + jnp.asarray(i % 251, lv[idx].dtype) + seed
            pp = jax.tree_util.tree_unflatten(treedef, lv)
            out = pallas_frame.try_lower(pp)
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
    for _ in range(reps):
        t0 = time.perf_counter(); run_k(2); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run_k(10); tl = time.perf_counter() - t0
        diffs.append(max(tl - ts, 1e-9) / (8 * inner))
    diffs.sort()
    print(f"{label}: {diffs[len(diffs)//2]*1e6:.1f} us  {[f'{d*1e6:.0f}' for d in diffs]}")


w6, h6 = 5760, 3240
buf = rng.integers(0, 256, (h6 * 3 // 2, w6)).astype(np.uint8)
pipe = cvgs.build_pipeline(
    cvgs.resize(cvgs.fuse(cvgs.read_yuv(buf),
                          cvgs.convert_yuv_to_rgb(standard=cvgs.ColorStandard.BT709,
                                                  out_dtype=np.float32)),
                cvgs.Size(1920, 1080)),
    cvgs.multiply(1 / 255.0),
    cvgs.split_tensor(),
)
plan = pallas_frame._plan_of(pipe)
leaves, treedef = jax.tree_util.tree_flatten(pipe)
out_p = np.asarray(jax.jit(lambda ls: pallas_frame.try_lower(
    jax.tree_util.tree_unflatten(treedef, ls)))([jax.device_put(l) for l in leaves]))
ref = np.asarray(jax.jit(lambda ls: jax.tree_util.tree_unflatten(treedef, ls).lower())(
    [jax.device_put(l) for l in leaves]))
print(f"NV12 R={plan['R']} parity max|diff|:", np.abs(out_p - ref).max())
sc = lambda l: getattr(l, "shape", None) in ((), (1,), (3,)) and jnp.result_type(l) == jnp.float32
timeit(leaves, treedef, sc, "6K NV12 final", inner=20)

img = rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8)
pipe2 = cvgs.build_pipeline(
    cvgs.resize(cvgs.image(img), cvgs.Size(640, 360)),
    cvgs.convert_to(np.float32, alpha=1 / 255.0),
    cvgs.subtract((0.485, 0.456, 0.406)),
    cvgs.divide((0.229, 0.224, 0.225)),
    cvgs.split_tensor(),
)
plan2 = pallas_frame._plan_of(pipe2)
leaves2, treedef2 = jax.tree_util.tree_flatten(pipe2)
out2 = np.asarray(jax.jit(lambda ls: pallas_frame.try_lower(
    jax.tree_util.tree_unflatten(treedef2, ls)))([jax.device_put(l) for l in leaves2]))
r = cv2.resize(img, (640, 360), interpolation=cv2.INTER_LINEAR).astype(np.float32)
ref2 = ((r / 255.0) - np.float32((0.485, 0.456, 0.406))) / np.float32((0.229, 0.224, 0.225))
print(f"1080p R={plan2['R']} on-device max|diff|:", np.abs(out2 - ref2.transpose(2, 0, 1)).max())
timeit(leaves2, treedef2,
       lambda l: getattr(l, "ndim", 0) == 2 and l.size > 10**6,
       "1080p frame-perturbed final", inner=50, dt_=np.uint8)
