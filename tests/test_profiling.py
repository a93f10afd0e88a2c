"""Benchmark-protocol utilities (reference testsCommon.cuh analog)."""

import csv
import os

import numpy as np
import jax.numpy as jnp

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.utils.profiling import (
    BenchmarkRecorder,
    TimingStats,
    differential_device_time,
    time_fn,
    trace_scope,
)


def test_time_fn_protocol():
    calls = []

    def fn():
        calls.append(1)
        return jnp.ones((4, 4))

    stats = time_fn(fn, iters=5, warmup=2)
    assert stats.iters == 5 and len(calls) == 7
    assert stats.min <= stats.mean <= stats.max


def test_trace_scope_runs():
    with trace_scope("unit-test-range"):
        x = jnp.ones((2, 2)) * 2
    assert float(x[0, 0]) == 2.0


def test_differential_device_time():
    import jax

    def make_run_n(n):
        @jax.jit
        def f():
            def body(c, _):
                return c * 1.0000001 + 1e-9, None
            out, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=n)
            return out
        return f

    t = differential_device_time(make_run_n, n_small=2, n_large=50)
    assert t >= 0.0


def test_benchmark_recorder_csv(tmp_path):
    path = str(tmp_path / "bench.csv")
    rec = BenchmarkRecorder(path)
    base = TimingStats(mean=2.0, variance=0.1, min=1.9, max=2.2, iters=10)
    fused = TimingStats(mean=0.5, variance=0.01, min=0.4, max=0.6, iters=10)
    rec.add_case("batch50", base, fused)
    rec.write()
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    assert float(rows[0]["mean_speedup"]) == 4.0
    assert rows[0]["case"] == "batch50"
