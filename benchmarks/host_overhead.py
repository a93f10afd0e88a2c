#!/usr/bin/env python
"""Host-side cost of the lazy graph build + executor dispatch.

Analog of the reference's ``benchmark_CPUandGPU_cvGS_vs_fk.cu:116-184`` which
proves the cvGS wrapper's CPU cost ≈ raw FKL's (graph build is free). Here
the contract is: building the op graph, flattening it, and hitting the jit
cache must cost microseconds per call — frames/rects/scalar changes never
retrace.

Run anywhere (CPU fine): python benchmarks/host_overhead.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

# This benchmark measures HOST-side cost only (graph build, flatten, jit
# cache hit, async dispatch) — pin the CPU backend: through the tunneled
# TPU every call would re-upload the host frame (~95 ms/call of transfer,
# not host overhead), drowning the microsecond-scale quantity under test.
jax.config.update("jax_platforms", "cpu")

import cvgpuspeedup_tpu as cvgs


def main():
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (296, 384, 3)).astype(np.uint8)
    rects = np.array([[i, i, 60, 120] for i in range(16)], np.int32)

    def call(shift):
        return cvgs.execute_operations(
            cvgs.resize_batch(frame, rects=rects + shift, dsize=cvgs.Size(64, 128)),
            cvgs.convert_to(np.float32, alpha=0.3),
            cvgs.subtract((3.2, 0.6, 11.8)),
            cvgs.divide((128.0,) * 3),
            cvgs.split_tensor(),
            backend=cvgs.ParBackend.XLA,
        )

    call(0)  # compile once

    # steady-state host cost per call (async dispatch; build+flatten+cache hit)
    n = 200
    t0 = time.perf_counter()
    for i in range(n):
        out = call(i % 3)
    build_us = (time.perf_counter() - t0) / n * 1e6
    out.block_until_ready()

    # graph build alone (no execution)
    t0 = time.perf_counter()
    for i in range(n):
        cvgs.build_pipeline(
            cvgs.resize_batch(frame, rects=rects, dsize=cvgs.Size(64, 128)),
            cvgs.convert_to(np.float32, alpha=0.3),
            cvgs.subtract((3.2, 0.6, 11.8)),
            cvgs.divide((128.0,) * 3),
            cvgs.split_tensor(),
        )
    graph_us = (time.perf_counter() - t0) / n * 1e6

    print(f"graph build only: {graph_us:.1f} us/call", file=sys.stderr)
    print(f"build + dispatch (cache hit): {build_us:.1f} us/call", file=sys.stderr)
    assert build_us < 5000, "host overhead must stay in the microsecond regime"


if __name__ == "__main__":
    main()
