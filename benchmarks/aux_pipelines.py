#!/usr/bin/env python
"""Auxiliary benchmarks for the remaining BASELINE configs:

- single 1920x1080 RGB: resize -> convertTo(f32) -> subtract -> divide ->
  split (BASELINE config 1)
- 6K NV12 -> RGB + resize + normalize ("ComputeWhatYouSee", BASELINE config 3;
  the reference's raw6K.nv12 scenario with synthesized data — the upstream
  blob is missing, reference falls back to a dummy buffer too)
- CircularTensor 32-frame temporal window update (BASELINE config 4)

Timing: differential in-jit scan with transfer sync (see bench.py). Writes a
CSV; prints a summary to stderr.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.utils.profiling import BenchmarkRecorder, TimingStats


from cvgpuspeedup_tpu.utils.profiling import transfer_sync as sync  # noqa: E402


def diff_time(step_fn, payload, inner=20, k_small=1, k_large=9, reps=5):
    """Differential timing with a LARGE-signal protocol: one jitted program
    of `inner` UNROLLED step invocations (lax.scan adds ~110us of loop
    bookkeeping per iteration around non-fusable bodies; each unrolled step
    sees a distinct python-int i so XLA cannot CSE), called k times
    back-to-back with one sync; t = (T(k2)-T(k1)) / ((k2-k1)*inner). The
    multi-ms differential stands above the few-ms sync jitter — small-N
    protocols measured tens of us of noise per step.
    step_fn(carry, i, payload) -> carry."""
    @jax.jit
    def run(p, seed):
        c = jnp.float32(seed)
        for i in range(inner):
            c = step_fn(c, i, p)
        return c

    sync(run(payload, 0.0))

    def run_k(k):
        t = None
        for j in range(k):
            t = run(payload, float(j % 3))
        sync(t)

    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter(); run_k(k_small)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run_k(k_large)
        tl = time.perf_counter() - t0
        diffs.append(max(tl - ts, 1e-9) / ((k_large - k_small) * inner))
    diffs.sort()
    return diffs[len(diffs) // 2]


def bench_single_1080p(rec):
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8))

    def step(c, i, p):
        pipe = cvgs.build_pipeline(
            cvgs.resize(cvgs.image(p + np.uint8(i % 97)), cvgs.Size(640, 360)),
            cvgs.convert_to(np.float32, alpha=1 / 255.0),
            cvgs.subtract((0.485, 0.456, 0.406)),
            cvgs.divide((0.229, 0.224, 0.225)),
            cvgs.split_tensor(),
        )
        return c + pipe.lower()[0, 0, 0]

    t = diff_time(step, img)
    rec.add_case("single_1080p_resize_normalize_split",
                 TimingStats(t, 0, t, t, 200), TimingStats(t, 0, t, t, 200))
    print(f"1080p resize+normalize+split (XLA fused): {t*1e6:.1f} us/frame "
          f"({1/t:.0f} fps)", file=sys.stderr)


def bench_nv12_6k(rec):
    rng = np.random.default_rng(1)
    w, h = 5760, 3240  # 6K
    buf = jax.device_put(rng.integers(0, 256, (h * 3 // 2, w)).astype(np.uint8))

    def step(c, i, p):
        virtual = cvgs.fuse(
            cvgs.read_yuv(p + np.uint8(i % 97)),
            cvgs.convert_yuv_to_rgb(standard=cvgs.ColorStandard.BT709,
                                    out_dtype=np.float32),
        )
        pipe = cvgs.build_pipeline(
            cvgs.resize(virtual, cvgs.Size(1920, 1080)),
            cvgs.multiply(1 / 255.0),
            cvgs.split_tensor(),
        )
        return c + pipe.lower()[0, 0, 0]

    t = diff_time(step, buf, inner=10, k_large=6)
    rec.add_case("nv12_6k_to_1080p_rgb_normalize",
                 TimingStats(t, 0, t, t, 50), TimingStats(t, 0, t, t, 50))
    print(f"6K NV12 -> 1080p RGB normalize (fused read): {t*1e6:.1f} us/frame "
          f"({1/t:.0f} fps)", file=sys.stderr)


def bench_circular_tensor(rec):
    """32-frame window: resize+normalize the new frame + shift, one program."""
    rng = np.random.default_rng(2)
    frame = jax.device_put(rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8))
    ring0 = jnp.zeros((32, 3, 128, 64), jnp.float32)

    def step(ring, i, p):
        pipe = cvgs.build_pipeline(
            cvgs.resize(cvgs.image(p + np.uint8(i % 97)), cvgs.Size(64, 128)),
            cvgs.convert_to(np.float32, alpha=1 / 255.0),
        )
        new = jnp.transpose(pipe.lower(), (2, 0, 1))[None]
        return jnp.concatenate([new, ring[:-1]], axis=0)

    @jax.jit
    def run(p):
        ring = ring0
        for i in range(20):
            ring = step(ring, i, p)
        return ring

    sync(run(frame))

    def run_k(k):
        t = None
        for _ in range(k):
            t = run(frame)
        sync(t)

    diffs = []
    for _ in range(5):
        t0 = time.perf_counter(); run_k(1)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run_k(9)
        tl = time.perf_counter() - t0
        diffs.append(max(tl - ts, 1e-9) / (8 * 20))
    diffs.sort()
    t = diffs[2]
    rec.add_case("circular_tensor_32_update",
                 TimingStats(t, 0, t, t, 200), TimingStats(t, 0, t, t, 200))
    print(f"CircularTensor-32 update (resize+normalize+shift): {t*1e6:.1f} us "
          f"({1/t:.0f} updates/s)", file=sys.stderr)


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    sync(jnp.sum(jnp.ones((8, 8))))  # warm the transfer path
    rec = BenchmarkRecorder("benchmarks/aux_pipeline_results.csv")
    bench_single_1080p(rec)
    bench_nv12_6k(rec)
    bench_circular_tensor(rec)
    rec.write()
    print("csv -> benchmarks/aux_pipeline_results.csv", file=sys.stderr)


if __name__ == "__main__":
    main()
