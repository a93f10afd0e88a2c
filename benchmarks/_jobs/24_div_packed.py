"""Divergent kernel with PACKED circular rings on hardware: parity + time."""
import time
import numpy as np, jax, jax.numpy as jnp
import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.exec import executor, pallas_divergent
from cvgpuspeedup_tpu.utils.profiling import transfer_sync as sync

rng = np.random.default_rng(4)
H, W, N = 128, 256, 16
stack = rng.integers(0, 256, (N, H, W, 3)).astype(np.uint8)  # HOST -> packs
first = jnp.int32(3)
s1 = executor.build_operation_sequence(
    cvgs.circular_batch_read(stack, first=first),
    cvgs.convert_to(np.float32, alpha=0.3),
    cvgs.subtract((1.0, 2.0, 3.0)),
    cvgs.write_tensor(),
)
s2 = executor.build_operation_sequence(
    cvgs.circular_batch_read(stack, first=first),
    cvgs.convert_to(np.float32, alpha=0.5),
    cvgs.multiply((2.0, 1.0, 0.5)),
    cvgs.write_tensor(),
)
ids = tuple(1 if z % 2 == 0 else 2 for z in range(N))
print("packed divergent supports:", pallas_divergent.supports([s1, s2], ids))
out_p = np.asarray(executor.launch_divergent_batch(
    lambda z: ids[z], s1, s2, backend=cvgs.ParBackend.PALLAS))
out_x = np.asarray(executor.launch_divergent_batch(
    lambda z: ids[z], s1, s2, backend=cvgs.ParBackend.XLA))
print("packed divergent pallas vs xla max|diff|:", np.abs(out_p - out_x).max())

seqs = [s1, s2]
leavesD, treedefD = jax.tree_util.tree_flatten(seqs)

def div_lower(sq, pallas):
    if pallas:
        out = pallas_divergent.try_lower(sq, ids, interpret=False)
        return sq[0].write.write(out)
    groups = {}
    for z in range(N):
        groups.setdefault(ids[z], []).append(z)
    merged = None
    for sid, planes in groups.items():
        s = sq[sid - 1]
        x = s.read.lower_planes(tuple(planes))
        for o in s.compute:
            x = o.apply(x)
        if merged is None:
            merged = jnp.zeros((N,) + x.shape[1:], dtype=x.dtype)
        merged = merged.at[jnp.asarray(planes)].set(x)
    return sq[0].write.write(merged)

for pallas in (True, False):
    idx = next(i for i, l in enumerate(leavesD) if getattr(l, "ndim", 0) == 3 and l.size > 10000)
    @jax.jit
    def run(ls, seed, _p=pallas):
        tot = jnp.float32(0.0)
        for i in range(50):
            lv = list(ls)
            lv[idx] = lv[idx] + np.uint8(i) + seed
            out = div_lower(jax.tree_util.tree_unflatten(treedefD, lv), _p)
            tot = tot + out[(0,) * out.ndim].astype(jnp.float32)
        return tot
    dl = [jax.device_put(l) for l in leavesD]
    sync(run(dl, np.uint8(0)))
    def run_k(k):
        t = None
        for j in range(k):
            t = run(dl, np.uint8(j % 3))
        sync(t)
    diffs = []
    for _ in range(5):
        t0 = time.perf_counter(); run_k(1); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run_k(5); tl = time.perf_counter() - t0
        diffs.append(max(tl - ts, 1e-9) / (4 * 50))
    diffs.sort()
    print(f"packed divergent {'pallas' if pallas else 'xla'}: {diffs[2]*1e6:.1f} us  {[f'{d*1e6:.0f}' for d in diffs]}")
