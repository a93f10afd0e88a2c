"""Pallas warp kernel — UNIVERSAL class: any affine (upscale, flips,
rotations at any scale) and perspective homographies.

The reference's single ``Warping`` kernel covers every affine AND
perspective inverse map (``include/cvGPUSpeedup.cuh:285-442``; perspective
validated at ``tests/warping/test_warping_opencv.cu:185-270``). On TPU the
fast consumer-unique kernel (:mod:`.pallas_warp_general`) needs ``|a| >= 2``
and ``e > 0``; everything else previously fell to the XLA gather path at
1.8-22 ms. This module is the one-kernel-for-the-rest: slower per pixel
than the consumer-unique kernel (double candidate select), but 3-20x the
XLA gather path, with NO structural restriction beyond candidate-count and
VMEM caps.

Design (2D grid over output tiles of R rows x T columns; matrix VALUES are
runtime leaves — only quantized DERIVATIVE-BOUND buckets are static, so
jitter within a bucket never recompiles):

1. **Window DMA** per tile from 4-corner coordinate extremes (affine and
   projective maps are monotonic along tile edges when the denominator is
   positive, so corners bound the tile — the den>0 gate is checked by the
   factory over the output domain, where den is linear).
2. **Per-tile one-hot H gather (MXU)**: taps sit at
   ``stair(X) - off + h`` where ``stair(X) = floor(sx(r_top, X))`` and
   ``h`` spans ``S_h = 2*(ceil(|dsx/dY|(R-1))+1)+3`` candidates (vertical
   drift of sx across the band, sign-free). G is built IN-KERNEL per tile
   with absolute window-lane arithmetic — no rolls, no channel phases, no
   alignment games. ``d_raw = win_bf16 @ G`` is exact (u8 in bf16).
3. **One-hot V gather (MXU)**: candidate source rows per output row,
   ``S_v = ceil(|dsy/dX|(T-1))+3`` per row with per-row base
   ``kb(r) = floor(min(sy(r, X_left), sy(r, X_right)))``. H-FIRST ordering
   makes this second dot contract over K (window rows), not L — the cheap
   order for upscale and downscale alike. ``d_all = gv @ d_raw`` is exact.
4. **Double select-lerp on the output grid**: per element the candidate
   pair ``(s_sel, h_sel)`` indexes its 4 exact taps; full 4-tap lerp with
   the XLA sampler's tap-replace -> h-lerp -> v-lerp shape. All coordinate
   math uses the f32 operation shapes of ``decompose_inverse_map`` (and
   the anti-FMA ``_rmul`` fence), so taps and fractions agree with the XLA
   path bit-for-bit.

Perspective coordinates are the rational forms ``(A*X + (B*Y+C)) / den``
with ``den = G*X + (H*Y + I)`` evaluated per element/row — the homography
is projective per row, a scalar-vector rational evaluation (VPU).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.memory import BatchRead, ImageRead, SplitWrite, TensorSplit
from ..ops.warp import WarpRead, WarpType
from ..utils import dtypes as dt
from .pallas_backend import _ScalarVec, _apply_chain_planar, _chain_out_struct
from .pallas_warp_general import _rmul

_DEFAULT = jax.lax.Precision.DEFAULT

_VMEM_BUDGET = 12 * 1024 * 1024
_MAX_SV = 48
_MAX_SH = 26
_FORCE_RT = None  # bench-only (R, T) override
#: double-select strategy: True = FACTORED (select the (s, s+1) row pair
#: ONCE across every h-column — (S_v-1) passes on the (R, (S_h+1)*tn)
#: stack — then h-select on the reduced pair): ~5/9 the VPU select ops of
#: the joint (h, s) loop, bit-exact (same single-nonzero sums). The select
#: is the upscale class's per-pixel floor (STATUS r4), so this is the
#: VERDICT r4 #7 lever. False = the original joint loop (A/B knob).
_FACTORED_SELECT = True


def universal_buckets(inv: np.ndarray, dsize) -> Optional[tuple]:
    """Quantized derivative-bound buckets over the output domain, or None
    when the map is outside the universal class (degenerate / denominator
    not positive). Buckets (1/8 steps) are static; values stay runtime."""
    inv = np.asarray(inv, np.float64)
    W, H = float(dsize.width), float(dsize.height)
    xs = (0.0, max(W - 1.0, 0.0))
    ys = (0.0, max(H - 1.0, 0.0))
    if inv.shape[0] == 2:
        a, b, _ = inv[0]
        d, e, _ = inv[1]
        bx_x, bx_y, by_x, by_y = abs(a), abs(b), abs(d), abs(e)
        persp = False
    else:
        A, B, C = inv[0]
        D, E, F = inv[1]
        G, Hc, I = inv[2]
        dens = [G * x + Hc * y + I for x in xs for y in ys]
        dmin = min(dens)
        if dmin <= 1e-3:
            return None
        d2 = dmin * dmin
        # each partial derivative's numerator is linear in ONE variable, so
        # corner evaluations bound it rigorously (see module docstring)
        bx_x = max(abs(A * (Hc * y + I) - (B * y + C) * G) for y in ys) / d2
        by_x = max(abs(D * (Hc * y + I) - (E * y + F) * G) for y in ys) / d2
        bx_y = max(abs((B * G - A * Hc) * x + (B * I - C * Hc)) for x in xs) / d2
        by_y = max(abs((E * G - D * Hc) * x + (E * I - F * Hc)) for x in xs) / d2
        persp = True
    if not all(np.isfinite(v) for v in (bx_x, bx_y, by_x, by_y)):
        return None
    if bx_x > 16.0 or by_y > 16.0 or bx_y > 3.0 or by_x > 3.0:
        return None  # candidate counts / windows would explode
    q8 = lambda v: math.ceil(v * 8.0) / 8.0
    return (persp, q8(bx_x), q8(bx_y), q8(by_x), q8(by_y))


def _divisors(n: int):
    return [k for k in range(1, n + 1) if n % k == 0]


def _src_geometry(src_op) -> Optional[tuple]:
    """(src_h, src_w, nch, src_lanes) of a supported u8 ImageRead source."""
    if not isinstance(src_op, ImageRead) or src_op.is_batch:
        return None
    src = src_op.data
    pc = src_op.packed_channels
    if pc:
        src_h, src_w, nch = int(src.shape[0]), int(src.shape[1]) // pc, pc
    elif src.ndim == 2:
        src_h, src_w, nch = int(src.shape[0]), int(src.shape[1]), 1
    elif src.ndim == 3:
        src_h, src_w, nch = (int(x) for x in src.shape)
    else:
        return None
    src_lanes = src_w * nch
    if src_h % 8 or src_lanes % 128:
        return None
    if not dt.is_integer(src.dtype) or jnp.dtype(src.dtype).itemsize != 1:
        return None  # exact one-hot bf16 gathers need <=8-bit sources
    return src_h, src_w, nch, src_lanes


def _chain_ok(pipeline, nch) -> Optional[tuple]:
    try:
        out_ch, out_dtype = _chain_out_struct(pipeline.compute, nch)
    except (NotImplementedError, ValueError):
        return None
    if jnp.dtype(out_dtype).itemsize > 4:
        return None
    for leaf in jax.tree_util.tree_leaves(tuple(pipeline.compute)):
        shp = jnp.shape(leaf)
        if len(shp) > 1 or (shp and shp[0] > 64):
            return None
        if jnp.result_type(leaf) != jnp.float32:
            return None
    return out_ch, out_dtype


def _plan(pipeline) -> Optional[dict]:
    read = pipeline.read
    if isinstance(read, BatchRead):
        return _plan_batch(pipeline)
    if not isinstance(read, WarpRead):
        return None
    if getattr(read, "uni_buckets", None) is None:
        return None
    if not isinstance(pipeline.write, (TensorSplit, SplitWrite)):
        return None
    geom = _src_geometry(read.source)
    if geom is None:
        return None
    src_h, src_w, nch, src_lanes = geom
    src = read.source.data
    dst_w, dst_h = read.dsize.width, read.dsize.height
    persp, bx_x, bx_y, by_x, by_y = read.uni_buckets

    co = _chain_ok(pipeline, nch)
    if co is None:
        return None
    out_ch, out_dtype = co

    best = _rt_search(persp, bx_x, bx_y, by_x, by_y, nch, src_h, src_lanes,
                      dst_w, dst_h, out_ch)
    if best is None:
        return None
    best.update(src_h=src_h, src_w=src_w, nch=nch, src_lanes=src_lanes,
                dst_w=dst_w, dst_h=dst_h, out_ch=out_ch, persp=persp,
                out_dtype=jnp.dtype(out_dtype), src_dtype=jnp.dtype(src.dtype))
    return best


def _rt_search(persp, bx_x, bx_y, by_x, by_y, nch, src_h, src_lanes,
               dst_w, dst_h, out_ch) -> Optional[dict]:
    """Pick the (R, T) tile shape minimizing the calibrated cost model."""
    best = None
    for R in (8, 16, 24, 32):
        # R need not divide dst_h: the last band is RAGGED (output rows
        # padded to n_bands*R, sliced off after the call)
        if _FORCE_RT is not None and R != _FORCE_RT[0]:
            continue
        off = math.ceil(bx_y * (R - 1)) + 1
        s_h = 2 * off + 3
        if s_h > _MAX_SH:
            continue
        for T in _divisors(dst_w):
            if _FORCE_RT is not None and T != _FORCE_RT[1]:
                continue
            if not 32 <= nch * T <= 768:
                continue
            # +5: +3 tap/floor slack (as before) + 2 for the kb DOWN-BIAS —
            # sy is monotonic along a row so the endpoint min bounds it in
            # REAL arithmetic, but f32 evaluation of an interior element can
            # round 1 ulp BELOW both rounded endpoints (seen: interior
            # 94.99999 vs endpoints 95.0), which made s_sel = -1 and every
            # candidate mask miss (silent border value). kb is biased -1 in
            # the kernel; the extra candidates keep the top margin.
            s_v = math.ceil(by_x * (T - 1)) + 5
            if s_v > _MAX_SV:
                continue
            k_rows = -(-(int(math.ceil(by_y * (R - 1) + by_x * (T - 1))) + 6)
                       // 8) * 8 + 8
            k_rows = min(k_rows, src_h)
            # stair spans bx_x(T-1)+bx_y(R-1) px across the tile's top row
            # envelope; candidates add [-off, off+3]; +slack for floors
            l_px = int(math.ceil(bx_x * (T - 1))) + 3 * off + 8
            lanes = -(-l_px * nch // 128) * 128 + 128
            lanes = min(lanes, src_lanes)
            n_bands, n_strips = -(-dst_h // R), dst_w // T
            n_tiles = n_bands * n_strips
            tn = nch * T
            ch_cols = (s_h + 1) * tn
            m_rows = s_v * R
            vmem = (
                2 * k_rows * lanes                  # window ring (u8)
                + lanes * ch_cols * 2               # per-tile G (bf16)
                + k_rows * ch_cols * 4              # d_raw
                + m_rows * ch_cols * 4              # d_all
                + m_rows * k_rows * 2               # gv
                + (s_v + 6) * R * tn * 4            # select masks + taps
                + 2 * out_ch * R * T * 4            # output blocks
            )
            if vmem > _VMEM_BUDGET:
                continue
            vmem_plan = vmem
            mxu = 2 * k_rows * lanes * ch_cols + 2 * m_rows * k_rows * ch_cols
            vpu = (lanes * ch_cols            # G build
                   + m_rows * k_rows          # gv build
                   + 9 * s_v * s_h * R * tn   # double select
                   + 60 * R * tn)             # coords + final lerp
            dma_b = k_rows * lanes
            # constants calibrated on the v5e upscale-rot sweeps: (16,20)
            # 3565us/3072 tiles, (16,64) 2991/960, (16,32) 2867/1920,
            # (24,32) 3448/1280, (32,32) 3747/1280 — per-tile overhead
            # ~700ns, select throughput ~2.2 elems/ns
            cost = n_tiles * (700 + mxu / 300_000 + vpu / 2_200 + dma_b / 800)
            if nch * T < 96:
                # sub-tile-wide output lanes underuse the store path and the
                # dots' N axis (the general kernel's measured penalty)
                cost *= 1.5
            if best is None or cost < best["cost"]:
                best = dict(R=R, T=T, K=k_rows, L=lanes, S_v=s_v, S_h=s_h,
                            OFF=off, n_bands=n_bands, n_strips=n_strips,
                            cost=cost, tile_flops=mxu, tile_dma_b=dma_b,
                            vmem=vmem_plan)
    return best


def _plan_batch(pipeline) -> Optional[dict]:
    """Batched warp: a ``BatchRead`` of N WarpReads with per-image matrices
    (the reference's ``cvGS::warp<WT, I, BATCH>`` overloads,
    ``include/cvGPUSpeedup.cuh:381-442``, incl. the ragged
    ``usedPlanes`` + default form). ONE kernel launch: the static tile
    geometry is sized by the BATCH-MAX derivative buckets (so any set of
    matrices within the same maxed buckets reuses the compiled kernel), and
    per-plane matrices/windows ride the scalar-prefetch arrays."""
    read = pipeline.read
    subs = read.ops
    if not subs:
        return None
    if not isinstance(pipeline.write, (TensorSplit, SplitWrite)):
        return None
    w0 = subs[0]
    if not isinstance(w0, WarpRead):
        return None
    geom0 = None
    buckets = []
    for wr in subs:
        if not isinstance(wr, WarpRead):
            return None
        if wr.warp_type != w0.warp_type or wr.dsize != w0.dsize:
            return None
        if getattr(wr, "uni_buckets", None) is None:
            return None
        g = _src_geometry(wr.source)
        if g is None:
            return None
        if geom0 is None:
            geom0 = g
        elif g != geom0:
            return None  # uniform source geometry only (reference: array of
            # same-size planes, tests/warping/test_warping_opencv.cu:157-247)
        if jnp.dtype(wr.source.data.dtype) != jnp.dtype(subs[0].source.data.dtype):
            return None
        buckets.append(wr.uni_buckets)
    persp = buckets[0][0]
    if any(b[0] != persp for b in buckets):
        return None
    src_h, src_w, nch, src_lanes = geom0
    dst_w, dst_h = w0.dsize.width, w0.dsize.height
    # batch-max buckets: every plane's candidates fit the maxed S_v/S_h/K/L
    bx_x = max(b[1] for b in buckets)
    bx_y = max(b[2] for b in buckets)
    by_x = max(b[3] for b in buckets)
    by_y = max(b[4] for b in buckets)

    co = _chain_ok(pipeline, nch)
    if co is None:
        return None
    out_ch, out_dtype = co

    best = _rt_search(persp, bx_x, bx_y, by_x, by_y, nch, src_h, src_lanes,
                      dst_w, dst_h, out_ch)
    if best is None:
        return None
    best.update(src_h=src_h, src_w=src_w, nch=nch, src_lanes=src_lanes,
                dst_w=dst_w, dst_h=dst_h, out_ch=out_ch, persp=persp,
                out_dtype=jnp.dtype(out_dtype),
                src_dtype=jnp.dtype(subs[0].source.data.dtype),
                n_pl=len(subs))
    return best


def supports(pipeline) -> bool:
    return _plan(pipeline) is not None


def profitable(pipeline) -> bool:
    """Gate vs the XLA gather path (~8 ms/Mpx measured): worth it except on
    tiny outputs where per-tile fixed costs dominate."""
    plan = _plan(pipeline)
    if plan is None:
        return False
    n_pl = plan.get("n_pl", 1)
    out_px = plan["dst_w"] * plan["dst_h"] * n_pl
    # ~8 ms/Mpx = 8 ns/px (same figure as pallas_warp_general.profitable);
    # the cost model is in ns, so the comparison must be too — an 8_000
    # factor here made the gate vacuous and routed worst-in-bucket plans
    # (large S_v/S_h) to the kernel even where the model predicts XLA wins
    xla_ns = out_px * 8
    return out_px >= 64 * 64 and plan["cost"] * n_pl < 0.6 * xla_ns


def try_lower(pipeline, *, interpret: bool = False):
    plan = _plan(pipeline)
    if plan is None:
        return None
    if "n_pl" in plan:
        return _emit_batch(pipeline, plan, interpret=interpret)
    return _emit(pipeline, plan, interpret=interpret)


def _emit(pipeline, plan: dict, *, interpret: bool):
    read: WarpRead = pipeline.read
    chain = pipeline.compute
    write = pipeline.write
    nch = plan["nch"]
    src_h, src_w = plan["src_h"], plan["src_w"]
    src_lanes = plan["src_lanes"]
    R, T = plan["R"], plan["T"]
    K, L = plan["K"], plan["L"]
    S_v, S_h, OFF = plan["S_v"], plan["S_h"], plan["OFF"]
    n_bands, n_strips = plan["n_bands"], plan["n_strips"]
    n_tiles = n_bands * n_strips
    dst_w, dst_h = plan["dst_w"], plan["dst_h"]
    out_ch, out_dtype = plan["out_ch"], plan["out_dtype"]
    persp = plan["persp"]
    tn = nch * T
    ch_cols = (S_h + 1) * tn
    n_cf = 9 if persp else 6

    src = read.source.data
    if read.source.packed_channels or src.ndim == 2:
        src2d = jnp.asarray(src)
    else:
        src2d = jnp.reshape(jnp.asarray(src), (src_h, src_lanes))

    # ---- per-tile prepass: window starts from 4-corner extremes (numpy
    # when the matrix leaves are concrete — the execute_operations path —
    # tiny traced ops otherwise). f32 shapes mirror decompose_inverse_map.
    concrete = not isinstance(read.coeffs, jax.core.Tracer)

    def _corners(xp, rp, cfv, m):
        """sx, sy at the outer product of xp x rp corner vectors (module m =
        np or jnp; f32 ops identical either way)."""
        if persp:
            A, B, C, D, E, F, G, Hc, I = (cfv[i] for i in range(9))
        else:
            A, B, C, D, E, F = (cfv[i] for i in range(6))
        xs = xp[:, None]
        ysv = rp[None, :]
        sx = A * xs + (B * ysv + C)
        sy = D * xs + (E * ysv + F)
        if persp:
            den = G * xs + (Hc * ysv + I)
            den = m.where(den == 0.0, m.float32(1.0) if m is np else
                          jnp.float32(1.0), den)
            sx = sx / den
            sy = sy / den
        return sx, sy

    if concrete:
        cfn = np.asarray(read.coeffs, np.float32)
        r0f = (np.arange(n_bands) * R).astype(np.float32)
        x0f = (np.arange(n_strips) * T).astype(np.float32)
        xc = np.stack([x0f, x0f + np.float32(T - 1)])  # (2, n_strips)
        # ragged last band: clamp its corner row to the real output extent
        rc = np.stack([r0f, np.minimum(r0f + np.float32(R - 1),
                                       np.float32(dst_h - 1))])
        sxs, sys_ = [], []
        for i in range(2):
            sx, sy = _corners(xc[i], rc.reshape(-1), cfn, np)
            sxs.append(sx.reshape(n_strips, 2, n_bands))
            sys_.append(sy.reshape(n_strips, 2, n_bands))
        sx_min = np.minimum(sxs[0], sxs[1]).min(axis=1)  # (n_strips, n_bands)
        sy_min = np.minimum(sys_[0], sys_[1]).min(axis=1)
        wy0 = np.clip(((np.floor(sy_min).astype(np.int64) - 2) // 8) * 8,
                      0, src_h - K).astype(np.int32)
        anchor = np.floor(sx_min).astype(np.int64) - OFF - 2
        wl0 = np.clip(((anchor * nch) // 128) * 128,
                      0, src_lanes - L).astype(np.int32)
        # 1-D layout: 2-D SMEM prefetch arrays are row-padded to the lane
        # grain (512 B/row — 1.5 MB at 3072 tiles, over the 1 MB SMEM cap)
        tile_params = np.stack([wy0, wl0], axis=-1).reshape(
            n_tiles * 2).astype(np.int32)
    else:
        cfj = jnp.asarray(read.coeffs, jnp.float32)
        r0f = (jnp.arange(n_bands) * R).astype(jnp.float32)
        x0f = (jnp.arange(n_strips) * T).astype(jnp.float32)
        rall = jnp.concatenate([
            r0f, jnp.minimum(r0f + np.float32(R - 1),
                             np.float32(dst_h - 1))])
        sxs, sys_ = [], []
        for xv in (x0f, x0f + np.float32(T - 1)):
            sx, sy = _corners(xv, rall, cfj, jnp)
            sxs.append(jnp.minimum(sx[:, :n_bands], sx[:, n_bands:]))
            sys_.append(jnp.minimum(sy[:, :n_bands], sy[:, n_bands:]))
        sx_min = jnp.minimum(sxs[0], sxs[1])
        sy_min = jnp.minimum(sys_[0], sys_[1])
        wy0 = jnp.clip(((jnp.floor(sy_min).astype(jnp.int32) - 2) // 8) * 8,
                       0, src_h - K)
        anchor = jnp.floor(sx_min).astype(jnp.int32) - OFF - 2
        wl0 = jnp.clip(((anchor * nch) // 128) * 128, 0, src_lanes - L)
        tile_params = jnp.stack([wy0, wl0], axis=-1).reshape(n_tiles * 2)

    # chain runtime scalars + border + coeffs ride one f32 prefetch array
    chain_leaves, chain_def = jax.tree_util.tree_flatten(tuple(chain))
    leaf_shapes = [jnp.shape(l) for l in chain_leaves]
    leaf_sizes = [1 if shp == () else int(shp[0]) for shp in leaf_shapes]
    leaf_offsets = list(np.cumsum([n_cf + nch] + leaf_sizes))[:-1]
    all_concrete = concrete and not any(
        isinstance(l, jax.core.Tracer) for l in (read.default, *chain_leaves)
    )
    cat = np.concatenate if all_concrete else jnp.concatenate
    asarr = (lambda l: np.asarray(l, np.float32)) if all_concrete else (
        lambda l: jnp.asarray(l, jnp.float32))
    fparams = cat(
        [asarr(read.coeffs).reshape(n_cf),
         asarr(read.default).reshape(nch)]
        + [asarr(l).reshape(-1) for l in chain_leaves]
        + [asarr(np.zeros(1, np.float32))]  # opaque zero for _rmul
    )
    n_fp = n_cf + nch + sum(leaf_sizes) + 1

    pad_h = n_bands * R  # ragged last band writes into the pad rows
    # band grouping amortizes the ~700 ns grid-step overhead; with the
    # factored select the step overhead DOMINATES tile-heavy upscale plans
    # (960 steps x 700 ns ~ 670 us of the 1.7 ms upscale-rot: G_P=4 lands
    # 1466 us, bit-exact). Measured on-chip: G_P=4 HURTS smaller-tile
    # classes (hflip 218 -> 293 us), so it gates on tile count.
    # the ring and double-buffered output blocks scale with G_P beyond what
    # _rt_search budgeted (2-slot ring, single-R blocks) — account the
    # DELTA against the full budget or Mosaic can fail allocation on chip
    G_P = 1
    for cand in ((4, 2) if n_bands * n_strips >= 960 else (2,)):
        extra = ((2 * cand - 2) * K * L
                 + 2 * (cand - 1) * out_ch * R * T * 4)
        if (n_bands % cand == 0 and 2 * cand * K * L <= 4 * 1024 * 1024
                and plan["vmem"] + extra <= _VMEM_BUDGET):
            G_P = cand
            break
    n_groups = n_bands // G_P
    out_shape = jax.ShapeDtypeStruct((n_strips, out_ch, pad_h, T), out_dtype)
    out_specs = pl.BlockSpec((1, out_ch, G_P * R, T),
                             lambda js, ibg, *_: (js, 0, ibg, 0))
    n_steps = n_strips * n_groups

    def kernel(tp_ref, fp_ref, src_ref, *rest):
        out_ref = rest[0]
        window, sem = rest[1], rest[2]
        if persp:
            A, B, C = fp_ref[0], fp_ref[1], fp_ref[2]
            D, E, F = fp_ref[3], fp_ref[4], fp_ref[5]
            Gc, Hc, Ic = fp_ref[6], fp_ref[7], fp_ref[8]
        else:
            A, B, C = fp_ref[0], fp_ref[1], fp_ref[2]
            D, E, F = fp_ref[3], fp_ref[4], fp_ref[5]

        leaf_vals = []
        for shp, size, offp in zip(leaf_shapes, leaf_sizes, leaf_offsets):
            if shp == ():
                leaf_vals.append(fp_ref[int(offp)])
            else:
                leaf_vals.append(
                    _ScalarVec(fp_ref[int(offp) + i] for i in range(size))
                )
        chain_k = jax.tree_util.tree_unflatten(chain_def, leaf_vals)
        kmul = lambda x, y: _rmul(x, y, fp_ref[n_fp - 1])

        def coords(xf, rf):
            """(sx, sy) with the XLA path's f32 operation shapes."""
            sx = kmul(A, xf) + (kmul(B, rf) + C)
            sy = kmul(D, xf) + (kmul(E, rf) + F)
            if persp:
                den = kmul(Gc, xf) + (kmul(Hc, rf) + Ic)
                den = jnp.where(den == 0.0, jnp.float32(1.0), den)
                sx = sx / den
                sy = sy / den
            return sx, sy

        js = pl.program_id(0)
        ibg = pl.program_id(1)
        st = js * n_groups + ibg

        def tile_flat(stp, g):
            return ((stp // n_groups) * n_bands
                    + (stp % n_groups) * G_P + g)

        def dma(ft, slot):
            return pltpu.make_async_copy(
                src_ref.at[
                    pl.ds(pl.multiple_of(tp_ref[ft * 2], 8), K),
                    pl.ds(pl.multiple_of(tp_ref[ft * 2 + 1], 128), L),
                ],
                window.at[slot],
                sem.at[slot],
            )

        @pl.when(st == 0)
        def _():
            for g in range(G_P):
                dma(tile_flat(0, g), g).start()

        @pl.when(st + 1 < n_steps)
        def _():
            for g in range(G_P):
                dma(tile_flat(st + 1, g), ((st + 1) % 2) * G_P + g).start()

        for g in range(G_P):
            dma(tile_flat(st, g), (st % 2) * G_P + g).wait()

        x0 = js * T

        def tile_body(g):
            ft = tile_flat(st, g)
            wy0_t = tp_ref[ft * 2]
            wl0_t = tp_ref[ft * 2 + 1]
            r0 = ((st % n_groups) * G_P + g) * R
            r0f = r0.astype(jnp.float32)
            _run_tile(g, wy0_t, wl0_t, r0, r0f)

        # ---- per-tile one-hot H gather matrix (absolute window lanes) ----
        def _run_tile(g, wy0_t, wl0_t, r0, r0f):
            col = jax.lax.broadcasted_iota(jnp.int32, (1, ch_cols), 1)
            hp = col // tn
            rem = col % tn
            cch = rem // T
            xr = rem % T
            xf_c = (x0 + xr).astype(jnp.float32)
            sx_top, _ = coords(xf_c, r0f)
            stair_c = jnp.floor(sx_top).astype(jnp.int32)
            lane_t = (stair_c - OFF + hp) * nch + cch - wl0_t
            lrow = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
            gmat = (lrow == lane_t).astype(jnp.bfloat16)

            win = window[(st % 2) * G_P + g].astype(jnp.int32).astype(
            jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            d_raw = jax.lax.dot_general(
                win, gmat, dn, precision=_DEFAULT,
                preferred_element_type=jnp.float32,
            )  # (K, ch_cols): exact u8 taps at (window row, (h, X, ch))

            # ---- one-hot V gather onto (s, r) candidate rows ----
            rowid = jax.lax.broadcasted_iota(jnp.int32, (S_v * R, 1), 0)
            s_of = rowid // R
            r_of = rowid % R
            rf_col = (r0 + r_of).astype(jnp.float32)
            xlf = jnp.full_like(rf_col, x0.astype(jnp.float32))
            xrf = xlf + np.float32(T - 1)
            _, sy_l = coords(xlf, rf_col)
            _, sy_r = coords(xrf, rf_col)
            kb_col = jnp.floor(jnp.minimum(sy_l, sy_r)).astype(jnp.int32) - 1
            kk = jnp.clip(kb_col - wy0_t + s_of, 0, K - 1)
            kcol = jax.lax.broadcasted_iota(jnp.int32, (S_v * R, K), 1)
            gv = (kcol == kk).astype(jnp.bfloat16)
            d_all = jax.lax.dot_general(
                gv, d_raw, dn, precision=_DEFAULT,
                preferred_element_type=jnp.float32,
            )  # (S_v*R, ch_cols): exact u8 taps at ((s, r), (h, X, ch))

            # ---- output-grid coordinates (bit-identical to the XLA sampler) --
            colo = jax.lax.broadcasted_iota(jnp.int32, (1, tn), 1)
            ccho = colo // T
            xro = colo % T
            xfo = (x0 + xro).astype(jnp.float32)
            rf = (r0 + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)).astype(
                jnp.float32)
            sx_o, sy_o = coords(xfo, rf)
            ixf = jnp.floor(sx_o)
            fx = sx_o - ixf
            ixi = ixf.astype(jnp.int32)
            iyf = jnp.floor(sy_o)
            fy = sy_o - iyf
            iyi = iyf.astype(jnp.int32)
            vx0 = ((ixi >= 0) & (ixi < src_w)).astype(jnp.float32)
            vx1 = ((ixi + 1 >= 0) & (ixi + 1 < src_w)).astype(jnp.float32)
            vyt = ((iyi >= 0) & (iyi < src_h)).astype(jnp.float32)
            vyb = ((iyi + 1 >= 0) & (iyi + 1 < src_h)).astype(jnp.float32)
            sx_top_o, _ = coords(xfo, r0f)
            stair_o = jnp.floor(sx_top_o).astype(jnp.int32)
            h_sel = ixi - stair_o + OFF  # in [0, S_h-2] by sizing
            _, sy_lo = coords(jnp.full_like(rf, x0.astype(jnp.float32)), rf)
            _, sy_ro = coords(jnp.full_like(rf, (x0 + T - 1).astype(jnp.float32)),
                              rf)
            kb_o = jnp.floor(jnp.minimum(sy_lo, sy_ro)).astype(jnp.int32) - 1  # (R,1)
            s_sel = iyi - kb_o  # in [0, S_v-2] by sizing

            # ---- double select: 4 exact taps per element ----
            if _FACTORED_SELECT:
                # s_sel is independent of the h candidate, so the (s, s+1)
                # row pair selects ONCE across every h-column: the existing
                # (R, tn) s_sel tiles across the S_h+1 groups (cheaper and
                # bit-safer than re-evaluating coords on the wide grid),
                # then the cheap h-select runs on the reduced pair
                s_sel_t = jnp.concatenate([s_sel] * (S_h + 1), axis=1)
                top_sel = jnp.zeros((R, ch_cols), jnp.float32)
                bot_sel = jnp.zeros((R, ch_cols), jnp.float32)
                for sc in range(S_v - 1):
                    m = s_sel_t == sc
                    top_sel = top_sel + jnp.where(
                        m, d_all[sc * R : (sc + 1) * R], 0.0)
                    bot_sel = bot_sel + jnp.where(
                        m, d_all[(sc + 1) * R : (sc + 2) * R], 0.0)
                v00 = jnp.zeros((R, tn), jnp.float32)
                v01 = jnp.zeros((R, tn), jnp.float32)
                v10 = jnp.zeros((R, tn), jnp.float32)
                v11 = jnp.zeros((R, tn), jnp.float32)
                for h in range(S_h - 1):
                    bh = h_sel == h
                    v00 = v00 + jnp.where(
                        bh, top_sel[:, h * tn : (h + 1) * tn], 0.0)
                    v01 = v01 + jnp.where(
                        bh, top_sel[:, (h + 1) * tn : (h + 2) * tn], 0.0)
                    v10 = v10 + jnp.where(
                        bh, bot_sel[:, h * tn : (h + 1) * tn], 0.0)
                    v11 = v11 + jnp.where(
                        bh, bot_sel[:, (h + 1) * tn : (h + 2) * tn], 0.0)
            else:
                s_masks = [s_sel == sc for sc in range(S_v - 1)]
                v00 = jnp.zeros((R, tn), jnp.float32)
                v01 = jnp.zeros((R, tn), jnp.float32)
                v10 = jnp.zeros((R, tn), jnp.float32)
                v11 = jnp.zeros((R, tn), jnp.float32)
                for h in range(S_h - 1):
                    bh = h_sel == h
                    for sc in range(S_v - 1):
                        m = bh & s_masks[sc]
                        top = d_all[sc * R : (sc + 1) * R]
                        bot = d_all[(sc + 1) * R : (sc + 2) * R]
                        v00 = v00 + jnp.where(
                            m, top[:, h * tn : (h + 1) * tn], 0.0)
                        v01 = v01 + jnp.where(
                            m, top[:, (h + 1) * tn : (h + 2) * tn], 0.0)
                        v10 = v10 + jnp.where(
                            m, bot[:, h * tn : (h + 1) * tn], 0.0)
                        v11 = v11 + jnp.where(
                            m, bot[:, (h + 1) * tn : (h + 2) * tn], 0.0)

            border_col = jnp.zeros((1, tn), jnp.float32)
            for ci in range(nch):
                border_col = border_col + jnp.where(
                    ccho == ci, fp_ref[n_cf + ci], 0.0)
            m00 = vx0 * vyt
            m01 = vx1 * vyt
            m10 = vx0 * vyb
            m11 = vx1 * vyb
            h0 = ((m00 * v00 + (1.0 - m00) * border_col) * (1.0 - fx)
                  + (m01 * v01 + (1.0 - m01) * border_col) * fx)
            h1 = ((m10 * v10 + (1.0 - m10) * border_col) * (1.0 - fx)
                  + (m11 * v11 + (1.0 - m11) * border_col) * fx)
            out_flat = h0 * (1.0 - fy) + h1 * fy

            planes = [out_flat[:, ci * T : (ci + 1) * T] for ci in range(nch)]
            planes = _apply_chain_planar(chain_k, planes)
            for ci, pline in enumerate(planes):
                out_ref[0, ci, g * R : (g + 1) * R] = pline

        for g in range(G_P):
            tile_body(g)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_strips, n_groups),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2 * G_P, K, L), plan["src_dtype"]),
            pltpu.SemaphoreType.DMA((2 * G_P,)),
        ],
    )

    out_bytes = int(np.prod(out_shape.shape)) * out_shape.dtype.itemsize
    cost = pl.CostEstimate(
        flops=n_tiles * 2 * ch_cols * (K * L + S_v * R * K),
        bytes_accessed=n_tiles * K * L + out_bytes,
        transcendentals=0,
    )

    raw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=cost,
    )(tile_params, fparams, src2d)
    # (n_strips, out_ch, pad_h, T) -> (out_ch, dst_h, dst_w)
    full = jnp.transpose(raw, (1, 2, 0, 3)).reshape(
        out_ch, pad_h, dst_w)[:, :dst_h]
    if isinstance(write, TensorSplit):
        return full
    return tuple(full[ci] for ci in range(out_ch))


def _emit_batch(pipeline, plan: dict, *, interpret: bool):
    """Batched variant of :func:`_emit`: grid gains a leading PLANE axis,
    per-plane inverse matrices / borders ride the f32 prefetch array, tile
    window starts are baked per (plane, strip, band), and the ragged
    ``used_planes`` + default of ``BatchRead<CONDITIONAL_WITH_DEFAULT>``
    masks whole planes before the compute chain (reference
    ``include/cvGPUSpeedup.cuh:381-442``,
    ``tests/warping/test_warping_opencv.cu:157-247``). The per-tile body is
    the same double-select one-hot gather pipeline as the single-plane
    kernel — only the coefficient/border fetch is plane-indexed."""
    read: BatchRead = pipeline.read
    subs = read.ops
    chain = pipeline.compute
    write = pipeline.write
    n_pl = plan["n_pl"]
    nch = plan["nch"]
    src_h, src_w = plan["src_h"], plan["src_w"]
    src_lanes = plan["src_lanes"]
    R, T = plan["R"], plan["T"]
    K, L = plan["K"], plan["L"]
    S_v, S_h, OFF = plan["S_v"], plan["S_h"], plan["OFF"]
    n_bands, n_strips = plan["n_bands"], plan["n_strips"]
    n_tiles = n_bands * n_strips
    dst_w, dst_h = plan["dst_w"], plan["dst_h"]
    out_ch, out_dtype = plan["out_ch"], plan["out_dtype"]
    persp = plan["persp"]
    tn = nch * T
    ch_cols = (S_h + 1) * tn
    n_cf = 9 if persp else 6

    def _as2d(wr):
        s = wr.source.data
        if wr.source.packed_channels or s.ndim == 2:
            return jnp.asarray(s)
        return jnp.reshape(jnp.asarray(s), (src_h, src_lanes))

    srcs2d = [_as2d(wr) for wr in subs]

    concrete = not any(isinstance(wr.coeffs, jax.core.Tracer) for wr in subs)

    def _corners(xp, rp, cfv, m):
        if persp:
            A, B, C, D, E, F, G, Hc, I = (cfv[i] for i in range(9))
        else:
            A, B, C, D, E, F = (cfv[i] for i in range(6))
        xs = xp[:, None]
        ysv = rp[None, :]
        sx = A * xs + (B * ysv + C)
        sy = D * xs + (E * ysv + F)
        if persp:
            den = G * xs + (Hc * ysv + I)
            den = m.where(den == 0.0, m.float32(1.0) if m is np else
                          jnp.float32(1.0), den)
            sx = sx / den
            sy = sy / den
        return sx, sy

    # ---- per-(plane, tile) window starts; layout (plane, strip, band, 2)
    # flattened 1-D (2-D SMEM prefetch arrays row-pad to 512 B/row) ----
    def _plane_params(cfv, m):
        r0f = (m.arange(n_bands) * R).astype(m.float32)
        x0f = (m.arange(n_strips) * T).astype(m.float32)
        if m is np:
            xc = np.stack([x0f, x0f + np.float32(T - 1)])
            rc = np.stack([r0f, np.minimum(r0f + np.float32(R - 1),
                                           np.float32(dst_h - 1))])
            sxs, sys_ = [], []
            for i in range(2):
                sx, sy = _corners(xc[i], rc.reshape(-1), cfv, np)
                sxs.append(sx.reshape(n_strips, 2, n_bands))
                sys_.append(sy.reshape(n_strips, 2, n_bands))
            sx_min = np.minimum(sxs[0], sxs[1]).min(axis=1)
            sy_min = np.minimum(sys_[0], sys_[1]).min(axis=1)
            wy0 = np.clip(((np.floor(sy_min).astype(np.int64) - 2) // 8) * 8,
                          0, src_h - K).astype(np.int32)
            anchor = np.floor(sx_min).astype(np.int64) - OFF - 2
            wl0 = np.clip(((anchor * nch) // 128) * 128,
                          0, src_lanes - L).astype(np.int32)
            return np.stack([wy0, wl0], axis=-1)
        rall = jnp.concatenate([
            r0f, jnp.minimum(r0f + np.float32(R - 1), np.float32(dst_h - 1))])
        sxs, sys_ = [], []
        for xv in (x0f, x0f + np.float32(T - 1)):
            sx, sy = _corners(xv, rall, cfv, jnp)
            sxs.append(jnp.minimum(sx[:, :n_bands], sx[:, n_bands:]))
            sys_.append(jnp.minimum(sy[:, :n_bands], sy[:, n_bands:]))
        sx_min = jnp.minimum(sxs[0], sxs[1])
        sy_min = jnp.minimum(sys_[0], sys_[1])
        wy0 = jnp.clip(((jnp.floor(sy_min).astype(jnp.int32) - 2) // 8) * 8,
                       0, src_h - K)
        anchor = jnp.floor(sx_min).astype(jnp.int32) - OFF - 2
        wl0 = jnp.clip(((anchor * nch) // 128) * 128, 0, src_lanes - L)
        return jnp.stack([wy0, wl0], axis=-1)

    used = read.used_planes
    if concrete and not isinstance(used, jax.core.Tracer):
        pp = np.stack([
            _plane_params(np.asarray(wr.coeffs, np.float32), np) for wr in subs
        ])
        used_v = np.int32(n_pl if used is None else int(np.asarray(used)))
        tile_params = np.concatenate(
            [pp.reshape(n_pl * n_tiles * 2), used_v.reshape(1)]
        ).astype(np.int32)
    else:
        pp = jnp.stack([
            _plane_params(jnp.asarray(wr.coeffs, jnp.float32), jnp)
            for wr in subs
        ])
        used_v = (jnp.int32(n_pl) if used is None
                  else jnp.asarray(used, jnp.int32))
        tile_params = jnp.concatenate(
            [pp.reshape(n_pl * n_tiles * 2), used_v.reshape(1)]
        )

    # ---- f32 prefetch: [coeffs x N | borders x N | ragged default | chain
    # leaves | opaque zero] ----
    chain_leaves, chain_def = jax.tree_util.tree_flatten(tuple(chain))
    leaf_shapes = [jnp.shape(l) for l in chain_leaves]
    leaf_sizes = [1 if shp == () else int(shp[0]) for shp in leaf_shapes]
    base = n_cf * n_pl + nch * n_pl + nch
    leaf_offsets = list(np.cumsum([base] + leaf_sizes))[:-1]
    rag_default = read.default
    all_concrete = concrete and not any(
        isinstance(l, jax.core.Tracer)
        for l in ([rag_default] if rag_default is not None else [])
        + [wr.default for wr in subs] + list(chain_leaves)
    )
    m = np if all_concrete else jnp
    asarr = (lambda l: np.asarray(l, np.float32)) if all_concrete else (
        lambda l: jnp.asarray(l, jnp.float32))

    def _chvec(v):
        v = asarr(v).reshape(-1)
        if int(v.shape[0]) == nch:
            return v
        return m.broadcast_to(v.reshape(1)[:1], (nch,))

    fparams = m.concatenate(
        [asarr(wr.coeffs).reshape(n_cf) for wr in subs]
        + [_chvec(wr.default) for wr in subs]
        + [_chvec(rag_default if rag_default is not None else 0.0)]
        + [asarr(l).reshape(-1) for l in chain_leaves]
        + [asarr(np.zeros(1, np.float32))]
    )
    n_fp = base + sum(leaf_sizes) + 1

    pad_h = n_bands * R
    # band grouping amortizes the ~700 ns grid-step overhead; with the
    # factored select the step overhead DOMINATES tile-heavy upscale plans
    # (960 steps x 700 ns ~ 670 us of the 1.7 ms upscale-rot: G_P=4 lands
    # 1466 us, bit-exact). Measured on-chip: G_P=4 HURTS smaller-tile
    # classes (hflip 218 -> 293 us), so it gates on tile count.
    # the ring and double-buffered output blocks scale with G_P beyond what
    # _rt_search budgeted (2-slot ring, single-R blocks) — account the
    # DELTA against the full budget or Mosaic can fail allocation on chip
    G_P = 1
    for cand in ((4, 2) if n_bands * n_strips >= 960 else (2,)):
        extra = ((2 * cand - 2) * K * L
                 + 2 * (cand - 1) * out_ch * R * T * 4)
        if (n_bands % cand == 0 and 2 * cand * K * L <= 4 * 1024 * 1024
                and plan["vmem"] + extra <= _VMEM_BUDGET):
            G_P = cand
            break
    n_groups = n_bands // G_P
    out_shape = jax.ShapeDtypeStruct(
        (n_pl, n_strips, out_ch, pad_h, T), out_dtype)
    out_specs = pl.BlockSpec((1, 1, out_ch, G_P * R, T),
                             lambda p, js, ibg, *_: (p, js, 0, ibg, 0))
    n_steps = n_pl * n_strips * n_groups

    def kernel(tp_ref, fp_ref, *rest):
        src_refs = rest[:n_pl]
        out_ref = rest[n_pl]
        window, sem = rest[n_pl + 1], rest[n_pl + 2]
        p = pl.program_id(0)
        js = pl.program_id(1)
        ibg = pl.program_id(2)
        st = (p * n_strips + js) * n_groups + ibg

        coff = p * n_cf
        if persp:
            A, B, C = fp_ref[coff], fp_ref[coff + 1], fp_ref[coff + 2]
            D, E, F = fp_ref[coff + 3], fp_ref[coff + 4], fp_ref[coff + 5]
            Gc, Hc, Ic = fp_ref[coff + 6], fp_ref[coff + 7], fp_ref[coff + 8]
        else:
            A, B, C = fp_ref[coff], fp_ref[coff + 1], fp_ref[coff + 2]
            D, E, F = fp_ref[coff + 3], fp_ref[coff + 4], fp_ref[coff + 5]

        leaf_vals = []
        for shp, size, offp in zip(leaf_shapes, leaf_sizes, leaf_offsets):
            if shp == ():
                leaf_vals.append(fp_ref[int(offp)])
            else:
                leaf_vals.append(
                    _ScalarVec(fp_ref[int(offp) + i] for i in range(size))
                )
        chain_k = jax.tree_util.tree_unflatten(chain_def, leaf_vals)
        kmul = lambda x, y: _rmul(x, y, fp_ref[n_fp - 1])

        def coords(xf, rf):
            sx = kmul(A, xf) + (kmul(B, rf) + C)
            sy = kmul(D, xf) + (kmul(E, rf) + F)
            if persp:
                den = kmul(Gc, xf) + (kmul(Hc, rf) + Ic)
                den = jnp.where(den == 0.0, jnp.float32(1.0), den)
                sx = sx / den
                sy = sy / den
            return sx, sy

        def tile_flat(stp, g):
            # (plane*strips + strip) * n_bands + band, bands G_P-grouped
            return ((stp // n_groups) * n_bands
                    + (stp % n_groups) * G_P + g)

        def start_dma(stp, g, slot):
            ft = tile_flat(stp, g)
            rows = pl.ds(pl.multiple_of(tp_ref[ft * 2], 8), K)
            lanes_s = pl.ds(pl.multiple_of(tp_ref[ft * 2 + 1], 128), L)
            qq = stp // (n_strips * n_groups)
            for q in range(n_pl):
                @pl.when(qq == q)
                def _(q=q):
                    pltpu.make_async_copy(
                        src_refs[q].at[rows, lanes_s],
                        window.at[slot], sem.at[slot],
                    ).start()

        @pl.when(st == 0)
        def _():
            for g in range(G_P):
                start_dma(st, g, g)

        @pl.when(st + 1 < n_steps)
        def _():
            for g in range(G_P):
                start_dma(st + 1, g, ((st + 1) % 2) * G_P + g)

        for g in range(G_P):
            # every plane's copy has identical geometry: one shared wait
            # descriptor (src ref identity does not enter the semaphore wait)
            ft = tile_flat(st, g)
            pltpu.make_async_copy(
                src_refs[0].at[
                    pl.ds(pl.multiple_of(tp_ref[ft * 2], 8), K),
                    pl.ds(pl.multiple_of(tp_ref[ft * 2 + 1], 128), L),
                ],
                window.at[(st % 2) * G_P + g], sem.at[(st % 2) * G_P + g],
            ).wait()

        x0 = js * T
        used_s = tp_ref[n_pl * n_tiles * 2]
        active = (p < used_s).astype(jnp.float32)

        def _run_tile(g, wy0_t, wl0_t, r0, r0f):
            col = jax.lax.broadcasted_iota(jnp.int32, (1, ch_cols), 1)
            hp = col // tn
            rem = col % tn
            cch = rem // T
            xr = rem % T
            xf_c = (x0 + xr).astype(jnp.float32)
            sx_top, _ = coords(xf_c, r0f)
            stair_c = jnp.floor(sx_top).astype(jnp.int32)
            lane_t = (stair_c - OFF + hp) * nch + cch - wl0_t
            lrow = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
            gmat = (lrow == lane_t).astype(jnp.bfloat16)

            win = window[(st % 2) * G_P + g].astype(jnp.int32).astype(
                jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            d_raw = jax.lax.dot_general(
                win, gmat, dn, precision=_DEFAULT,
                preferred_element_type=jnp.float32,
            )  # (K, ch_cols)

            rowid = jax.lax.broadcasted_iota(jnp.int32, (S_v * R, 1), 0)
            s_of = rowid // R
            r_of = rowid % R
            rf_col = (r0 + r_of).astype(jnp.float32)
            xlf = jnp.full_like(rf_col, x0.astype(jnp.float32))
            xrf = xlf + np.float32(T - 1)
            _, sy_l = coords(xlf, rf_col)
            _, sy_r = coords(xrf, rf_col)
            kb_col = jnp.floor(jnp.minimum(sy_l, sy_r)).astype(jnp.int32) - 1
            kk = jnp.clip(kb_col - wy0_t + s_of, 0, K - 1)
            kcol = jax.lax.broadcasted_iota(jnp.int32, (S_v * R, K), 1)
            gv = (kcol == kk).astype(jnp.bfloat16)
            d_all = jax.lax.dot_general(
                gv, d_raw, dn, precision=_DEFAULT,
                preferred_element_type=jnp.float32,
            )  # (S_v*R, ch_cols)

            colo = jax.lax.broadcasted_iota(jnp.int32, (1, tn), 1)
            ccho = colo // T
            xro = colo % T
            xfo = (x0 + xro).astype(jnp.float32)
            rf = (r0 + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)).astype(
                jnp.float32)
            sx_o, sy_o = coords(xfo, rf)
            ixf = jnp.floor(sx_o)
            fx = sx_o - ixf
            ixi = ixf.astype(jnp.int32)
            iyf = jnp.floor(sy_o)
            fy = sy_o - iyf
            iyi = iyf.astype(jnp.int32)
            vx0 = ((ixi >= 0) & (ixi < src_w)).astype(jnp.float32)
            vx1 = ((ixi + 1 >= 0) & (ixi + 1 < src_w)).astype(jnp.float32)
            vyt = ((iyi >= 0) & (iyi < src_h)).astype(jnp.float32)
            vyb = ((iyi + 1 >= 0) & (iyi + 1 < src_h)).astype(jnp.float32)
            sx_top_o, _ = coords(xfo, r0f)
            stair_o = jnp.floor(sx_top_o).astype(jnp.int32)
            h_sel = ixi - stair_o + OFF
            _, sy_lo = coords(jnp.full_like(rf, x0.astype(jnp.float32)), rf)
            _, sy_ro = coords(
                jnp.full_like(rf, (x0 + T - 1).astype(jnp.float32)), rf)
            kb_o = jnp.floor(jnp.minimum(sy_lo, sy_ro)).astype(jnp.int32) - 1
            s_sel = iyi - kb_o

            if _FACTORED_SELECT:
                # s_sel is independent of the h candidate, so the (s, s+1)
                # row pair selects ONCE across every h-column: the existing
                # (R, tn) s_sel tiles across the S_h+1 groups (cheaper and
                # bit-safer than re-evaluating coords on the wide grid),
                # then the cheap h-select runs on the reduced pair
                s_sel_t = jnp.concatenate([s_sel] * (S_h + 1), axis=1)
                top_sel = jnp.zeros((R, ch_cols), jnp.float32)
                bot_sel = jnp.zeros((R, ch_cols), jnp.float32)
                for sc in range(S_v - 1):
                    m = s_sel_t == sc
                    top_sel = top_sel + jnp.where(
                        m, d_all[sc * R : (sc + 1) * R], 0.0)
                    bot_sel = bot_sel + jnp.where(
                        m, d_all[(sc + 1) * R : (sc + 2) * R], 0.0)
                v00 = jnp.zeros((R, tn), jnp.float32)
                v01 = jnp.zeros((R, tn), jnp.float32)
                v10 = jnp.zeros((R, tn), jnp.float32)
                v11 = jnp.zeros((R, tn), jnp.float32)
                for h in range(S_h - 1):
                    bh = h_sel == h
                    v00 = v00 + jnp.where(
                        bh, top_sel[:, h * tn : (h + 1) * tn], 0.0)
                    v01 = v01 + jnp.where(
                        bh, top_sel[:, (h + 1) * tn : (h + 2) * tn], 0.0)
                    v10 = v10 + jnp.where(
                        bh, bot_sel[:, h * tn : (h + 1) * tn], 0.0)
                    v11 = v11 + jnp.where(
                        bh, bot_sel[:, (h + 1) * tn : (h + 2) * tn], 0.0)
            else:
                s_masks = [s_sel == sc for sc in range(S_v - 1)]
                v00 = jnp.zeros((R, tn), jnp.float32)
                v01 = jnp.zeros((R, tn), jnp.float32)
                v10 = jnp.zeros((R, tn), jnp.float32)
                v11 = jnp.zeros((R, tn), jnp.float32)
                for h in range(S_h - 1):
                    bh = h_sel == h
                    for sc in range(S_v - 1):
                        m = bh & s_masks[sc]
                        top = d_all[sc * R : (sc + 1) * R]
                        bot = d_all[(sc + 1) * R : (sc + 2) * R]
                        v00 = v00 + jnp.where(
                            m, top[:, h * tn : (h + 1) * tn], 0.0)
                        v01 = v01 + jnp.where(
                            m, top[:, (h + 1) * tn : (h + 2) * tn], 0.0)
                        v10 = v10 + jnp.where(
                            m, bot[:, h * tn : (h + 1) * tn], 0.0)
                        v11 = v11 + jnp.where(
                            m, bot[:, (h + 1) * tn : (h + 2) * tn], 0.0)

            border_col = jnp.zeros((1, tn), jnp.float32)
            for ci in range(nch):
                border_col = border_col + jnp.where(
                    ccho == ci, fp_ref[n_cf * n_pl + p * nch + ci], 0.0)
            m00 = vx0 * vyt
            m01 = vx1 * vyt
            m10 = vx0 * vyb
            m11 = vx1 * vyb
            h0 = ((m00 * v00 + (1.0 - m00) * border_col) * (1.0 - fx)
                  + (m01 * v01 + (1.0 - m01) * border_col) * fx)
            h1 = ((m10 * v10 + (1.0 - m10) * border_col) * (1.0 - fx)
                  + (m11 * v11 + (1.0 - m11) * border_col) * fx)
            out_flat = h0 * (1.0 - fy) + h1 * fy

            # ragged batch: planes past used_planes hold the DEFAULT value,
            # substituted BEFORE the compute chain (the reference's
            # CONDITIONAL_WITH_DEFAULT ordering, like the flagship kernel)
            def_col = jnp.zeros((1, tn), jnp.float32)
            for ci in range(nch):
                def_col = def_col + jnp.where(
                    ccho == ci, fp_ref[n_cf * n_pl + nch * n_pl + ci], 0.0)
            out_flat = out_flat * active + def_col * (1.0 - active)

            planes = [out_flat[:, ci * T : (ci + 1) * T] for ci in range(nch)]
            planes = _apply_chain_planar(chain_k, planes)
            for ci, pline in enumerate(planes):
                out_ref[0, 0, ci, g * R : (g + 1) * R] = pline

        for g in range(G_P):
            ft = tile_flat(st, g)
            r0 = ((st % n_groups) * G_P + g) * R
            _run_tile(g, tp_ref[ft * 2], tp_ref[ft * 2 + 1],
                      r0, r0.astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pl, n_strips, n_groups),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM) for _ in srcs2d],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2 * G_P, K, L), plan["src_dtype"]),
            pltpu.SemaphoreType.DMA((2 * G_P,)),
        ],
    )

    out_bytes = int(np.prod(out_shape.shape)) * out_shape.dtype.itemsize
    cost = pl.CostEstimate(
        flops=n_pl * n_tiles * 2 * ch_cols * (K * L + S_v * R * K),
        bytes_accessed=n_pl * n_tiles * K * L + out_bytes,
        transcendentals=0,
    )

    raw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=cost,
    )(tile_params, fparams, *srcs2d)
    # (N, n_strips, out_ch, pad_h, T) -> (N, out_ch, dst_h, dst_w)
    full = jnp.transpose(raw, (0, 2, 3, 1, 4)).reshape(
        n_pl, out_ch, pad_h, dst_w)[:, :, :dst_h]
    if isinstance(write, TensorSplit):
        return full
    return tuple(full[:, ci] for ci in range(out_ch))


def analytic_floor(pipeline):
    """Analytic per-launch floor on v5e (VERDICT r4 #6): max of HBM stream
    time and MXU time of the one-hot H/V gather dots (dense bf16 shapes).
    Covers single-plane AND batched plans. Returns dict(hbm_bytes, mxu_s,
    floor_s) or None when the kernel does not claim the pipeline."""
    from ..utils.profiling import V5E_BF16_MACS, kernel_floor_s

    plan = _plan(pipeline)
    if plan is None:
        return None
    n_pl = plan.get("n_pl", 1)
    n_tiles = plan["n_bands"] * plan["n_strips"] * n_pl
    hbm = (n_tiles * plan["tile_dma_b"]
           + n_pl * plan["dst_w"] * plan["dst_h"] * plan["out_ch"]
           * plan["out_dtype"].itemsize)
    mxu_s = n_tiles * plan["tile_flops"] / 2.0 / V5E_BF16_MACS
    return dict(hbm_bytes=hbm, mxu_s=mxu_s, floor_s=kernel_floor_s(hbm, mxu_s))
