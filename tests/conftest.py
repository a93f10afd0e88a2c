"""Test harness configuration.

Tests run on an 8-device virtual CPU mesh (the reference's tests require a
real GPU + OpenCV-CUDA; our oracle is OpenCV CPU — ``cv2`` — per SURVEY.md §4,
with the same tolerance contract: integer outputs bit-exact, float outputs
per-pixel |diff| <= 1e-4). The multi-chip sharding tests use the 8 virtual
devices. ``bench.py`` (not the test suite) runs on the real TPU chip.

NOTE: this container force-registers the ``axon`` TPU backend from
sitecustomize at interpreter start; switching `jax_platforms` to ``cpu`` here
(before any backend is initialized) routes everything to the virtual CPU mesh.
"""

import os

# Must be set before the CPU client initializes.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260817)


# Tolerance contract (reference tests/testsCommon.cuh:36-61).
FLOAT_TOL = 1e-4


def check_exact(actual, expected, msg=""):
    actual = np.asarray(actual)
    expected = np.asarray(expected)
    assert actual.shape == expected.shape, f"{msg} shape {actual.shape} vs {expected.shape}"
    diff = (actual.astype(np.int64) != expected.astype(np.int64)).sum()
    assert diff == 0, f"{msg}: {diff} mismatching pixels (integer outputs must be bit-exact)"


def assert_backend(expected):
    """Assert the emitter the last ``execute_operations`` /
    ``launch_divergent_batch`` actually used. Pallas parity tests MUST call
    this after the interpret-mode run: an explicit PALLAS request silently
    falls through to XLA when no emitter matches, which would turn the
    parity check into an XLA-vs-XLA no-op (VERDICT r4 weak #6)."""
    from cvgpuspeedup_tpu.exec import executor

    got = executor.last_backend()
    assert got == expected, f"emitter {got!r}, parity test expected {expected!r}"


def check_float(actual, expected, tol=FLOAT_TOL, msg=""):
    actual = np.asarray(actual, dtype=np.float64)
    expected = np.asarray(expected, dtype=np.float64)
    assert actual.shape == expected.shape, f"{msg} shape {actual.shape} vs {expected.shape}"
    bad = np.abs(actual - expected) > tol
    assert not bad.any(), (
        f"{msg}: {bad.sum()} pixels exceed |diff|<= {tol}; "
        f"max diff {np.abs(actual - expected).max()}"
    )
