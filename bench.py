#!/usr/bin/env python
"""Flagship benchmark: the reference's headline 50-crop pipeline on one chip.

Pipeline (reference SURVEY.md §3.2, ``tests/batchresize/test_batchresize_x_
split3D.cu:311-324``): 3840x2160 uint8 frame -> 50 variable crops (60x120 at
offset (i, i)) -> bilinear resize to 64x128 -> convertTo(float, 0.3) ->
subtract -> divide -> planar TensorSplit, as ONE fused Pallas kernel.

Protocol mirrors the reference benchmark harness (``tests/testsCommon.cuh:
122-195``): warmup + 100 timed iterations. Iterations run inside a single
jitted ``lax.scan`` with per-iteration rect jitter, so host/tunnel dispatch
does not pollute device time (the analog of CUDA-event timing). The baseline
is the same math issued as one device program per op per crop (the 250-launch
pattern cvGPUSpeedup replaces — ``README.md:90-98``).

NOTE: device->host transfers hang through the axon tunnel, so all timing uses
``block_until_ready`` only; no result values are fetched.

Prints ONE JSON line: {"metric", "value" (images/sec/chip), "unit",
"vs_baseline" (fused-vs-unfused speedup)}.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.exec import pallas_backend

BATCH = 50
ITERS = 100
SRC_H, SRC_W = 2160, 3840
UP = cvgs.Size(64, 128)
ALPHA, SUB, DIV = 0.3, (3.2, 0.6, 11.8), (128.0, 128.0, 128.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_pipeline(frame, rects):
    return cvgs.build_pipeline(
        cvgs.resize_batch(frame, rects=rects, dsize=UP),
        cvgs.convert_to(np.float32, alpha=ALPHA),
        cvgs.subtract(SUB),
        cvgs.divide(DIV),
        cvgs.split_tensor(),
    )


def timed_scan(pipeline, lower_fn, iters):
    """Time `iters` kernel invocations inside one jitted scan (device time)."""
    leaves, treedef = jax.tree_util.tree_flatten(pipeline)
    leaves = [jax.device_put(l) for l in leaves]
    rect_idx = next(
        i for i, l in enumerate(leaves)
        if getattr(l, "shape", None) == (BATCH, 4) and l.dtype == jnp.int32
    )

    @jax.jit
    def run_n(ls):
        def body(carry, i):
            lv = list(ls)
            # jitter rect origins so XLA cannot hoist the kernel out of the loop
            lv[rect_idx] = lv[rect_idx].at[:, :2].add(i % 2)
            p = jax.tree_util.tree_unflatten(treedef, lv)
            out = lower_fn(p)
            if isinstance(out, (tuple, list)):
                out = out[0]
            probe = out.ravel()[0].astype(jnp.float32)
            return carry + probe, None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return total

    run_n(leaves).block_until_ready()  # compile + warmup
    t0 = time.perf_counter()
    run_n(leaves).block_until_ready()
    dt = time.perf_counter() - t0
    return dt / iters


def unfused_baseline(frame_dev, rects_np, reps=3):
    """The 5-programs-per-crop launch pattern (250 dispatches per batch)."""

    @jax.jit
    def op_resize(fr, x, y, w, h):
        return cvgs.execute_operations(
            cvgs.resize_batch(fr, rects=jnp.stack([x, y, w, h])[None, :], dsize=UP),
            backend=cvgs.ParBackend.XLA,
        )

    @jax.jit
    def op_convert(t):
        return t * np.float32(ALPHA)

    @jax.jit
    def op_sub(t):
        return t - jnp.asarray(SUB, jnp.float32)

    @jax.jit
    def op_div(t):
        return t / jnp.asarray(DIV, jnp.float32)

    @jax.jit
    def op_split(t):
        return jnp.transpose(t, (0, 3, 1, 2))

    def one_batch():
        outs = []
        for (x, y, w, h) in rects_np:
            t = op_resize(frame_dev, jnp.int32(x), jnp.int32(y), jnp.int32(w), jnp.int32(h))
            t = op_convert(t)
            t = op_sub(t)
            t = op_div(t)
            outs.append(op_split(t))
        return outs

    for o in one_batch():
        o.block_until_ready()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = one_batch()
    for o in outs:
        o.block_until_ready()
    return (time.perf_counter() - t0) / reps


def main():
    platform = jax.default_backend()
    log(f"backend: {platform}, devices: {jax.devices()}")

    rng = np.random.default_rng(42)
    frame = rng.integers(0, 256, (SRC_H, SRC_W, 3)).astype(np.uint8)
    rects = np.array([[i, i, 60, 120] for i in range(BATCH)], np.int32)
    frame_dev = jax.device_put(frame)
    frame_dev.block_until_ready()

    pipeline = build_pipeline(frame_dev, rects)
    use_pallas = platform == "tpu" and pallas_backend.supports(pipeline)

    if use_pallas:
        fused_lower = lambda p: pallas_backend.try_lower(p, interpret=False)
    else:
        fused_lower = lambda p: p.lower()
    t_fused = timed_scan(pipeline, fused_lower, ITERS)
    log(f"fused ({'pallas' if use_pallas else 'xla'}): {t_fused*1e3:.3f} ms/batch")

    t_xla = timed_scan(pipeline, lambda p: p.lower(), ITERS)
    log(f"fused xla path: {t_xla*1e3:.3f} ms/batch")

    t_unfused = unfused_baseline(frame_dev, rects)
    log(f"unfused 250-dispatch baseline: {t_unfused*1e3:.1f} ms/batch")

    images_per_sec = BATCH / t_fused
    speedup = t_unfused / t_fused

    # HBM roofline sanity: bytes touched per batch
    window_bytes = BATCH * 128 * 768  # per-plane DMA windows (u8)
    out_bytes = BATCH * 3 * 128 * 64 * 4
    roofline_s = (window_bytes + out_bytes) / 800e9  # v5e ~819 GB/s
    log(f"ideal HBM time {roofline_s*1e6:.1f} us/batch; achieved {t_fused*1e6:.1f} us")

    print(json.dumps({
        "metric": "images_per_sec_chip_50crop_resize_normalize_split",
        "value": round(images_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(speedup, 2),
    }))


if __name__ == "__main__":
    main()
