"""Profiling + benchmark protocol utilities.

TPU-native equivalents of the reference's observability layer:

- NVTX ranges (``tests/nvtx.h:18-105``) -> :func:`trace_scope` /
  :func:`mark`, backed by ``jax.profiler`` named traces (visible in
  perfetto/xprof timelines).
- CUDA-event benchmark protocol (``tests/testsCommon.cuh:122-317``):
  warmup pass + N timed iterations, per-case mean/variance/min/max and
  mean-speedup, written to CSV with one row per case —
  :class:`BenchmarkRecorder` + :func:`time_fn`.
- For environments where device completion is only observable via a
  transfer (e.g. tunneled TPUs where ``block_until_ready`` returns before
  execution finishes), :func:`differential_device_time` measures honest
  per-iteration device time by timing two in-jit iteration counts to one
  sync each and differencing out the constant latency.
"""

from __future__ import annotations

import contextlib
import csv
import math
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

#: TPU v5e speed-of-light constants for analytic kernel floors (the same
#: 819 GB/s the flagship bench.py roofline uses; MXU: 197 TFLOP/s bf16 =
#: 98.5e12 multiply-adds/s, int8 2x). A kernel's analytic floor is
#: max(HBM stream time, MXU time of its ACTUAL dense dot schedule) — banded
#: interpolation / one-hot gather matrices are sparse in content but DENSE
#: on the MXU, so the dot shapes are part of the algorithm's floor.
V5E_HBM_BPS = 819e9
V5E_BF16_MACS = 98.5e12


def kernel_floor_s(hbm_bytes: float, mxu_s: float = 0.0) -> float:
    """max(HBM streaming time, MXU dot time) on v5e."""
    return max(hbm_bytes / V5E_HBM_BPS, mxu_s)


def transfer_sync(x):
    """True device sync via a tiny scalar transfer — for environments where
    ``block_until_ready`` returns before execution finishes (e.g. tunneled
    TPUs). The canonical sync used by bench.py / benchmarks/*."""
    return jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])


@contextlib.contextmanager
def trace_scope(name: str):
    """Named profiler range (NVTX PUSH_RANGE/POP_RANGE analog)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def mark(name: str) -> None:
    """Instantaneous annotation (CUDA_MARK analog)."""
    with jax.profiler.TraceAnnotation(name):
        pass


@dataclass
class TimingStats:
    mean: float
    variance: float
    min: float
    max: float
    iters: int

    @classmethod
    def from_samples(cls, samples: Sequence[float]) -> "TimingStats":
        arr = np.asarray(samples, np.float64)
        return cls(
            mean=float(arr.mean()),
            variance=float(arr.var()),
            min=float(arr.min()),
            max=float(arr.max()),
            iters=len(samples),
        )


def time_fn(fn: Callable[[], object], iters: int = 100, warmup: int = 1) -> TimingStats:
    """Reference benchmark protocol: warmup + per-iteration wall timing.

    ``fn`` must return the value(s) to synchronize on (block_until_ready is
    applied to every array leaf).
    """
    def sync(out):
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()

    for _ in range(warmup):
        sync(fn())
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn())
        samples.append(time.perf_counter() - t0)
    return TimingStats.from_samples(samples)


def differential_device_time(
    make_run_n: Callable[[int], Callable[[], object]],
    n_small: int = 10,
    n_large: int = 110,
    sync: Optional[Callable[[object], None]] = None,
) -> float:
    """Per-iteration device time via two sync points.

    ``make_run_n(n)`` returns a zero-arg callable that launches ONE device
    program performing ``n`` iterations of the workload (e.g. a jitted
    ``lax.scan``) and returns its result. ``sync(result)`` must not return
    until the device really finished (default: a tiny ``jax.device_get``).
    Constant dispatch/transfer latency cancels in the difference:

        t_iter = (T(n_large) - T(n_small)) / (n_large - n_small)
    """
    if sync is None:
        def sync(result):  # noqa: ANN001
            leaf = jax.tree_util.tree_leaves(result)[0]
            jax.device_get(jnp.ravel(leaf)[0])

    times = {}
    for n in (n_small, n_large):
        run = make_run_n(n)
        sync(run())  # compile + warm path
        t0 = time.perf_counter()
        sync(run())
        times[n] = time.perf_counter() - t0
    return max(times[n_large] - times[n_small], 0.0) / (n_large - n_small)


@dataclass
class BenchmarkRecorder:
    """Per-case CSV writer matching the reference's column protocol
    (``tests/testsCommon.cuh:142-195``): one row per case with baseline and
    fused stats plus mean speedup."""

    path: str
    rows: List[Dict] = field(default_factory=list)

    def add_case(self, case: str, baseline: TimingStats, fused: TimingStats,
                 floor_s: Optional[float] = None) -> None:
        """``floor_s``: the kernel's analytic v5e floor (max of HBM stream
        time and its dense MXU dot time — see the emitters'
        ``analytic_floor``); adds a '% of floor' column so every kernel row
        carries its roofline distance (VERDICT r4 #6)."""
        self.rows.append({
            "case": case,
            "baseline_mean_s": baseline.mean,
            "baseline_var": baseline.variance,
            "baseline_max_s": baseline.max,
            "baseline_min_s": baseline.min,
            "fused_mean_s": fused.mean,
            "fused_var": fused.variance,
            "fused_max_s": fused.max,
            "fused_min_s": fused.min,
            "mean_speedup": baseline.mean / fused.mean if fused.mean else math.inf,
            "analytic_floor_s": floor_s,
            "pct_of_floor": (
                round(100.0 * floor_s / fused.mean, 1)
                if floor_s and fused.mean else None
            ),
        })

    def write(self) -> None:
        if not self.rows:
            return
        with open(self.path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(self.rows[0].keys()))
            w.writeheader()
            w.writerows(self.rows)
