"""Pallas warp kernel — GENERAL affine warps (rotations and shears).

The reference fuses arbitrary affine inverse maps into its one kernel
(``include/cvGPUSpeedup.cuh:285-442``; rotation configs exercised at
``tests/warping/test_warping_opencv.cu:139-271``) — trivial on a
thread-per-pixel GPU. On TPU the cross terms (``b``, ``d``) are the whole
problem: every output element needs its own 2x2 source neighborhood, Mosaic
has no dynamic gather, no per-lane sublane shift, and dynamic lane rotates
are only correct for pow2/32-bit shapes. The separable kernel
(:mod:`.pallas_warp`) rejects any map with cross terms; before this module
those fell to the XLA gather path (measured 7.9 ms for 1080p->640x360 — ~40x
off the kernel class).

Notation: inverse map ``sx = a*X + b*Y + c``, ``sy = d*X + e*Y + f`` for
output pixel (X, Y). All coordinate math below is float32 with the exact
operation shapes of :func:`ops.warp.decompose_inverse_map`, so every floor/
fraction agrees bit-for-bit with the XLA path (a 1-ulp disagreement at
sy ~ 1000 is a 1.2e-4 coordinate shift — up to ~3e-2 of value error).

TPU-first design (2D grid over output tiles of R rows x T columns; matrix
VALUES are runtime leaves — only quantized magnitude buckets of (a, e, |b|,
|d|) and the signs are static, so jitter within a bucket never recompiles):

1. **Window DMA**: per tile, one (K, L) HBM->VMEM window whose 8-row/128-lane
   aligned start comes from the tile's corner extremes (affine => extremes at
   corners, exactly). K, L are static bucket functions.
2. **Vertical candidate gather (MXU)**: the row index ``iy(r, X)`` varies per
   ELEMENT (slope d along the row), which no shared matrix can express.
   Instead ONE one-hot bf16 matmul gathers every candidate row per output
   row: M axis = (candidate s, output row r) pairs, ``S_v = ceil(|d|(T-1))+3``
   candidates — the M axis is free real estate on the MXU, and one-hot x
   u8-valued bf16 is exact.
3. **Consumer-unique candidate selection (VPU)**: with ``a >= 2`` (>=2x
   horizontal downscale) each source column is a tap of AT MOST ONE output
   column per row, so per (r, source-lane) the UNWEIGHTED top/bottom source
   rows ``VT = V[sel]``, ``VB = V[sel+1]`` can be recovered: invert the SAME
   f32 floor staircase the forward pass uses (division estimate + exact
   refinement — consistency by construction), then a telescoping
   prefix-mask sweep (``V[0] + sum [sel>=s]*(V[s]-V[s-1])``) selects both
   rows in one S_v pass sharing the masks. VT/VB are exact u8 values.
   Maps with ``a < 2`` fall back to XLA.
4. **Per-sub-band lane re-base (traced rolls)**: every 8-row sub-band
   re-anchors to its own horizontal candidate base ``hbase_i`` with one
   pow2-padded f32 lane rotate, so the H candidate span covers only 8 rows
   of b-drift: ``S_h = ceil(|b|*7)+3`` at ANY band height R (the traced-
   roll legal class: pow2 lanes, 32-bit).
5. **Horizontal gather (MXU)**: one plain bf16 one-hot matmul of the
   stacked ``[VT; VB]`` (2R rows) against the per-strip ``G`` computes ALL
   (h, X, channel) taps EXACTLY — u8 integers are bf16-exact, so no Dekker
   split is needed (round 3 ran a 3x-cost hi/lo/lo2 split on the lerped
   f32 values; moving the lerp after the dot removed it).
6. Full 4-tap lerp on the output grid — the same tap-replace -> h-lerp ->
   v-lerp operation shape as the XLA sampler — then pointwise chain and
   planar writes, shared shapes with the separable kernel.

Perspective warps stay on the XLA path (documented; the reference itself
downgrades perspective border parity to EXPECTED_FAIL,
``tests/warping/test_warping_opencv.cu:268-270``).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.memory import ImageRead, SplitWrite, TensorSplit
from ..ops.warp import WarpRead, WarpType
from ..utils import dtypes as dt
from .pallas_backend import _ScalarVec, _apply_chain_planar, _chain_out_struct

_DEFAULT = jax.lax.Precision.DEFAULT

_VMEM_BUDGET = 12 * 1024 * 1024
#: s8-packed candidate selection: the V gather runs as an s8 one-hot dot
#: (XOR-bias widen, exact i32 u8 values), 4 candidates pack per i32 word
#: (chip-probed little-endian bitcast), and the select telescopes over
#: GROUPS of 4 with per-element byte extraction — 4x fewer prefix-mask
#: iterations on the dominant (R, L) grid. MEASURED 8% SLOWER than the f32
#: telescoping on chip (537 vs 498 us for the 10-degree rotation,
#: bit-exact either way): the i32->u8 pack casts run on the full candidate
#: grid and cost more than the saved iterations. Kept for A/Bs.
_PACKED_SELECT = False
_MAX_SV = 56   # vertical candidate cap (beyond: tilt too steep for this tiling)
_MAX_SH = 18   # horizontal candidate cap
_FORCE_RT = None  # bench-only (R, T) override for tiling sweeps



def _rmul(a, b, zero):
    """``fl(a*b)`` robust to FMA contraction.

    The XLA warp path consumes PREBAKED f32 products (decompose_inverse_map);
    LLVM contracts an in-jit ``a*b + c`` into an FMA (fy/fx then shift by ~1
    ulp of the coordinate — at sy ~ 1000 a 1.2e-4 coordinate error, amplified
    by the tap delta to ~3e-3 of value error, measured). HLO-level fences do
    not survive (optimization_barrier sits above LLVM; bitcast round-trips
    are folded by LLVM itself). Instead add an OPAQUE runtime zero: the plain
    lowering computes ``round(a*b) + 0 = fl(a*b)`` and the contracted one
    ``fma(a, b, 0) = round(a*b exactly + 0) = fl(a*b)`` — identical either
    way, so every floor/fraction matches the baked terms bit-for-bit."""
    return a * b + zero


def general_buckets(inv: np.ndarray) -> Optional[tuple]:
    """Quantized magnitude buckets for the general-affine kernel, or None
    when the map is outside its class. Buckets (not values) are static: the
    compiled program is reused for any matrix in the same buckets.

    Class: 2x3 inverse map with at least one cross term, ``a >= 2`` (the
    consumer-unique condition: each source column is a tap of at most one
    output column per row) and ``e > 0`` (no vertical flip)."""
    inv = np.asarray(inv, np.float64)
    if inv.shape[0] == 3:
        return None
    a, b_, _ = inv[0]
    d_, e, _ = inv[1]
    if b_ == 0.0 and d_ == 0.0:
        return None  # separable: pallas_warp's class
    if not (a >= 2.0 and e > 0.0):
        return None
    q4 = lambda v: math.ceil(v * 4.0) / 4.0        # 1/4 steps: a, e
    q8 = lambda v: math.ceil(abs(v) * 8.0) / 8.0   # 1/8 steps: |b|, |d|
    return (q4(a), q4(e), q8(b_), q8(d_), bool(b_ >= 0), bool(d_ >= 0))


def _divisors(n: int):
    return [k for k in range(1, n + 1) if n % k == 0]


def _plan(pipeline) -> Optional[dict]:
    read = pipeline.read
    if not isinstance(read, WarpRead):
        return None
    if read.warp_type != WarpType.AFFINE or read.gen_buckets is None:
        return None
    src_op = read.source
    if not isinstance(src_op, ImageRead) or src_op.is_batch:
        return None
    if not isinstance(pipeline.write, (TensorSplit, SplitWrite)):
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
        # the exact one-hot bf16 vertical gather needs <=8-bit sources;
        # u16/f32 warps keep the XLA path
        return None
    dst_w, dst_h = read.dsize.width, read.dsize.height
    a_b, e_b, b_b, d_b, _, _ = read.gen_buckets

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

    best = None
    for R in _divisors(dst_h):
        if _FORCE_RT is not None and R != _FORCE_RT[0]:
            continue
        if R % 8 or R > 32:
            continue
        # horizontal candidates span an 8-row SUB-band, not the full band:
        # each sub-band's candidate base (hbase_i) is re-anchored by its own
        # lane roll before the shared H dot, so S_h stays small at any R
        s_h = math.ceil(b_b * 7) + 3
        if s_h > _MAX_SH:
            continue
        for T in _divisors(dst_w):
            if _FORCE_RT is not None and T != _FORCE_RT[1]:
                continue
            # narrow tiles are legal (steep tilts NEED them to bound S_v);
            # the cost model just prices their poor MXU utilization
            if not 32 <= nch * T <= 768:
                continue
            s_v = math.ceil(d_b * (T - 1)) + 3
            if s_v > _MAX_SV:
                continue
            k_rows = -(-(int(math.ceil(e_b * (R - 1) + d_b * (T - 1))) + 4)
                       // 8) * 8 + 8
            k_rows = min(k_rows, src_h)
            l_px = int(math.ceil(a_b * (T - 1) + b_b * (R - 1))) + 4
            lanes = -(-l_px * nch // 128) * 128 + 128
            lanes = min(lanes, src_lanes)
            l_pad = 1 << (lanes - 1).bit_length()
            n_bands, n_strips = dst_h // R, dst_w // T
            n_tiles = n_bands * n_strips
            tn = nch * T
            vmem = (
                2 * k_rows * lanes                       # window ring (u8)
                + lanes * (s_h + 1) * tn * 2             # per-strip G (bf16)
                + s_v * R * lanes * 4                    # V_all transient
                + s_v * R * k_rows * 2                   # G_v transient
                + 5 * R * l_pad * 4                      # VT/VB + roll copies
                + 2 * out_ch * R * T * 4                 # output blocks
            )
            if vmem > _VMEM_BUDGET:
                continue
            v_flops = 2 * s_v * R * k_rows * lanes
            # H dot: exact-bf16 u8 candidates, [VT; VB] stacked (2R rows)
            h_flops = 2 * 2 * R * lanes * (s_h + 1) * tn
            vpu = s_v * R * lanes * 6 + R * lanes * 30 + s_h * R * tn * 8
            dma_b = k_rows * lanes
            # ns/tile, calibrated on the v5e (R,T) sweep of the 10-degree
            # 1080p rotation (280-410us measured): ~300ns effective step
            # overhead (DMAs overlap), MXU ~200 flops/ns at these one-hot
            # dot shapes, VPU ~900 elems/ns, HBM ~0.7 B/ns
            cost = n_tiles * (300 + (v_flops + h_flops) / 300_000
                              + vpu / 3_000 + dma_b / 800)
            if nch * T < 96:
                # sub-tile-wide output lanes underuse the store path and the
                # H dot's N axis (measured: (24,20) 305us vs (24,32) 275us on
                # the 10-degree 1080p rotation) — allowed, but priced
                cost *= 1.5
            if best is None or cost < best["cost"]:
                best = dict(R=R, T=T, K=k_rows, L=lanes, L_pad=l_pad,
                            S_v=s_v, S_h=s_h, n_bands=n_bands,
                            n_strips=n_strips, cost=cost,
                            tile_flops=v_flops + h_flops,
                            tile_dma_b=dma_b)
    if best is None:
        return None
    best.update(src_h=src_h, src_w=src_w, nch=nch, src_lanes=src_lanes,
                dst_w=dst_w, dst_h=dst_h, out_ch=out_ch,
                out_dtype=jnp.dtype(out_dtype), src_dtype=jnp.dtype(src.dtype))
    return best


def supports(pipeline) -> bool:
    return _plan(pipeline) is not None


def profitable(pipeline) -> bool:
    """The XLA path gathers at ~8 ms/Mpx — the kernel wins except on tiny
    outputs where per-tile fixed costs dominate."""
    plan = _plan(pipeline)
    if plan is None:
        return False
    return plan["dst_w"] * plan["dst_h"] >= 64 * 64


def try_lower(pipeline, *, interpret: bool = False):
    plan = _plan(pipeline)
    if plan is None:
        return None
    return _emit(pipeline, plan, interpret=interpret)


def _emit(pipeline, plan: dict, *, interpret: bool):
    read: WarpRead = pipeline.read
    chain = pipeline.compute
    write = pipeline.write
    nch = plan["nch"]
    src_h, src_w = plan["src_h"], plan["src_w"]
    src_lanes = plan["src_lanes"]
    R, T = plan["R"], plan["T"]
    K, L, L_pad = plan["K"], plan["L"], plan["L_pad"]
    S_v, S_h = plan["S_v"], plan["S_h"]
    n_bands, n_strips = plan["n_bands"], plan["n_strips"]
    n_tiles = n_bands * n_strips
    dst_w, dst_h = plan["dst_w"], plan["dst_h"]
    out_ch, out_dtype = plan["out_ch"], plan["out_dtype"]
    tn = nch * T
    l_px_cap = L // nch  # widest pixel extent the window can hold
    sgn_b, sgn_d = read.gen_buckets[4], read.gen_buckets[5]

    src = read.source.data
    if read.source.packed_channels or src.ndim == 2:
        src2d = jnp.asarray(src)
    else:
        src2d = jnp.reshape(jnp.asarray(src), (src_h, src_lanes))

    cf = jnp.asarray(read.coeffs, jnp.float32)  # [a, b, c, d, e, f]

    # ---- per-tile prepass (tiny (n_tiles,) vectors; f32 ops matching the
    # in-kernel formulas bit-for-bit where consistency matters). When the
    # matrix leaves are CONCRETE (the execute_operations path — users
    # changing the matrix per call), the prepass runs in NUMPY: its ~30
    # tiny jnp ops would otherwise dominate the launch (the kernel itself
    # is sub-millisecond; a tiny XLA op is tens of us on this rig). numpy
    # f32 ops are the same IEEE ops with no FMA-contraction hazard, so the
    # values are bit-identical to the traced form. ----
    concrete = not isinstance(read.coeffs, jax.core.Tracer)
    if concrete:
        npf = np.float32
        cfn = np.asarray(read.coeffs, np.float32)
        a, b_, c0, d_, e, f0 = (npf(cfn[i]) for i in range(6))
        r0f = (np.arange(n_bands, dtype=np.int32) * R).astype(np.float32)
        x0f = (np.arange(n_strips, dtype=np.int32) * T).astype(np.float32)
        r1f, x1f = r0f + npf(R - 1), x0f + npf(T - 1)
        sy_rows = np.stack([e * r0f + f0, e * r1f + f0])
        sy_cols = np.stack([d_ * x0f, d_ * x1f])
        sy_min = sy_cols.min(0)[:, None] + sy_rows.min(0)[None, :]
        wy0 = np.clip(
            ((np.floor(sy_min).astype(np.int32) - 1) // 8) * 8, 0, src_h - K
        )
        m1 = np.minimum(b_ * r0f, b_ * r1f) + c0
        hbase = np.floor(m1).astype(np.int32)
        stair0 = np.floor(a * x0f).astype(np.int32)
        anchor_px = stair0[:, None] + hbase[None, :]
        wl0_lanes = np.clip(
            ((np.clip(anchor_px, 0, src_w - l_px_cap) * nch) // 128) * 128,
            0, src_lanes - L,
        ).astype(np.int32)
        shift0 = anchor_px * nch - wl0_lanes
        tile_params = np.stack(
            [wy0, wl0_lanes, shift0,
             np.broadcast_to(hbase[None, :], (n_strips, n_bands))], axis=-1,
        ).reshape(n_tiles, 4).astype(np.int32)
    else:
        r0v = (jnp.arange(n_bands, dtype=jnp.int32) * R)
        x0v = (jnp.arange(n_strips, dtype=jnp.int32) * T)
        r0f, x0f = r0v.astype(jnp.float32), x0v.astype(jnp.float32)
        r1f, x1f = r0f + np.float32(R - 1), x0f + np.float32(T - 1)
        a, b_, c0, d_, e, f0 = (cf[i] for i in range(6))
        # vertical window start: corner extremes of sy (exact for affine)
        zero_p = jax.lax.optimization_barrier(jnp.float32(0.0))
        rmul = lambda x, y: _rmul(x, y, zero_p)
        sy_rows = jnp.stack([rmul(e, r0f) + f0, rmul(e, r1f) + f0])
        sy_cols = jnp.stack([rmul(d_, x0f), rmul(d_, x1f)])
        sy_min = (jnp.min(sy_cols, 0)[:, None] + jnp.min(sy_rows, 0)[None, :])
        wy0 = jnp.clip(
            ((jnp.floor(sy_min).astype(jnp.int32) - 1) // 8) * 8, 0, src_h - K
        )  # (n_strips, n_bands)
        # horizontal anchor: stair0 + hbase (see module docstring, step 5)
        m1 = jnp.minimum(rmul(b_, r0f), rmul(b_, r1f)) + c0    # (n_bands,)
        hbase = jnp.floor(m1).astype(jnp.int32)
        stair0 = jnp.floor(rmul(a, x0f)).astype(jnp.int32)     # (n_strips,)
        anchor_px = stair0[:, None] + hbase[None, :]           # unclamped
        wl0_lanes = jnp.clip(
            ((jnp.clip(anchor_px, 0, src_w - l_px_cap) * nch) // 128) * 128,
            0, src_lanes - L,
        )
        shift0 = anchor_px * nch - wl0_lanes
        tile_params = jnp.stack(
            [wy0, wl0_lanes, shift0,
             jnp.broadcast_to(hbase[None, :], (n_strips, n_bands))], axis=-1,
        ).reshape(n_tiles, 4)

    # chain runtime scalars + border ride one packed f32 prefetch array
    chain_leaves, chain_def = jax.tree_util.tree_flatten(tuple(chain))
    leaf_shapes = [jnp.shape(l) for l in chain_leaves]
    leaf_sizes = [1 if shp == () else int(shp[0]) for shp in leaf_shapes]
    leaf_offsets = list(np.cumsum([6 + nch] + leaf_sizes))[:-1]
    all_concrete = concrete and not any(
        isinstance(l, jax.core.Tracer)
        for l in (read.default, *chain_leaves)
    )
    if all_concrete:
        fparams = np.concatenate(
            [np.asarray(read.coeffs, np.float32).reshape(6),
             np.asarray(read.default, np.float32).reshape(nch)]
            + [np.asarray(l, np.float32).reshape(-1) for l in chain_leaves]
            + [np.zeros((1,), np.float32)]  # opaque zero for _rmul
        )
    else:
        fparams = jnp.concatenate(
            [cf.reshape(6), jnp.asarray(read.default, jnp.float32).reshape(nch)]
            + [jnp.asarray(l, jnp.float32).reshape(-1) for l in chain_leaves]
            + [jnp.zeros((1,), jnp.float32)]  # opaque zero for _rmul
        )
    n_fp = 6 + nch + sum(leaf_sizes) + 1

    # Mosaic requires output-block minor dims divisible by (8, 128) OR equal
    # to the full array dims: emit a strip-major 4D intermediate whose minor
    # dim is the FULL tile width T, and transpose back with one XLA copy
    # (~2x output bytes; the kernel replaces an ~8 ms gather path)
    # band-pair grouping: two independent sub-band pipelines per grid step —
    # each tile's chain alternates MXU (one-hot dots) and VPU (select-lerp)
    # serially, so a single tile leaves one unit idle at every stage; two
    # interleaved tiles let the Mosaic scheduler overlap tile A's selects
    # with tile B's dots (the flagship kernel's plane-grouping lesson)
    G_P = 2 if n_bands % 2 == 0 else 1
    n_groups = n_bands // G_P

    out_shape = jax.ShapeDtypeStruct(
        (n_strips, out_ch, dst_h, T), out_dtype
    )
    out_specs = pl.BlockSpec(
        (1, out_ch, G_P * R, T), lambda js, ib, *_: (js, 0, ib, 0)
    )
    n_outs = 1
    n_steps = n_strips * n_groups

    def kernel(tp_ref, fp_ref, src_ref, *rest):
        out_refs = rest[:n_outs]
        window, gmat, sem = rest[n_outs:]
        A, B, C = fp_ref[0], fp_ref[1], fp_ref[2]
        D, E, F = fp_ref[3], fp_ref[4], fp_ref[5]

        leaf_vals = []
        for shp, size, off in zip(leaf_shapes, leaf_sizes, leaf_offsets):
            if shp == ():
                leaf_vals.append(fp_ref[int(off)])
            else:
                leaf_vals.append(
                    _ScalarVec(fp_ref[int(off) + i] for i in range(size))
                )
        chain_k = jax.tree_util.tree_unflatten(chain_def, leaf_vals)
        kmul = lambda x, y: _rmul(x, y, fp_ref[n_fp - 1])

        js = pl.program_id(0)
        ibg = pl.program_id(1)
        st = js * n_groups + ibg

        def dma(ft, slot):
            return pltpu.make_async_copy(
                src_ref.at[
                    pl.ds(pl.multiple_of(tp_ref[ft, 0], 8), K),
                    pl.ds(pl.multiple_of(tp_ref[ft, 1], 128), L),
                ],
                window.at[slot],
                sem.at[slot],
            )

        def tile_flat(stp, g):
            """Flat tile index of sub-band g of step stp (strip-major)."""
            return ((stp // n_groups) * n_bands
                    + (stp % n_groups) * G_P + g)

        @pl.when(st == 0)
        def _():
            for g in range(G_P):
                dma(tile_flat(0, g), g).start()

        @pl.when(st + 1 < n_steps)
        def _():
            for g in range(G_P):
                dma(tile_flat(st + 1, g), ((st + 1) % 2) * G_P + g).start()

        # per-strip one-hot H-gather matrix, built once per strip: column
        # block h holds taps (stair(X) - stair(X0) + h)*nch + ch, channel-
        # major within the block (planar outputs fall straight out)
        @pl.when(ibg == 0)
        def _():
            col = jax.lax.broadcasted_iota(jnp.int32, (1, (S_h + 1) * tn), 1)
            hp = col // tn
            rem = col % tn
            cch = rem // T
            xr = rem % T
            xf = (js * T + xr).astype(jnp.float32)
            stair = jnp.floor(kmul(A, xf)).astype(jnp.int32)
            stair0 = jnp.floor(
                kmul(A, (js * T).astype(jnp.float32))
            ).astype(jnp.int32)
            lane_t = (stair - stair0 + hp) * nch + cch
            lrow = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
            gmat[...] = (lrow == lane_t).astype(jnp.bfloat16)

        # ALL the step's waits before ANY body (a semaphore wait is a
        # scheduling barrier; interleaving wait->body would re-serialize)
        for g in range(G_P):
            dma(tile_flat(st, g), (st % 2) * G_P + g).wait()

        x0 = js * T
        # minDX: the d*X corner minimum — sign is static (bucketed)
        mindx = kmul(D, (x0 if sgn_d else x0 + T - 1).astype(jnp.float32))

        def tile_body(g):
            ft = tile_flat(st, g)
            wy0_t = tp_ref[ft, 0]
            wl0_t = tp_ref[ft, 1]
            shift0_t = tp_ref[ft, 2]
            hbase_t = tp_ref[ft, 3]
            r0 = (ibg * G_P + g) * R

            dn0 = (((1,), (0,)), ((), ()))
            if _PACKED_SELECT:
                # ---- s8 vertical candidate gather, GROUP-major rows:
                # row = gg*(4R) + r*4 + s' so the u8 bitcast packs the 4
                # in-group candidates of each (gg, r) into ONE i32 word
                # (byte b = candidate 4*gg+b; chip-probed little-endian).
                # The raw u8 window feeds the s8 MXU via the XOR-bias
                # trick — no bf16 widen at all. ----
                n4 = (S_v + 3) // 4
                m_rows = n4 * 4 * R
                rowid = jax.lax.broadcasted_iota(jnp.int32, (m_rows, 1), 0)
                g_of = rowid // (4 * R)
                rem4 = rowid % (4 * R)
                r_of = rem4 // 4
                s_of = g_of * 4 + rem4 % 4
                rf_col = (r0 + r_of).astype(jnp.float32)
                kbase_col = (
                    jnp.floor(mindx + (kmul(E, rf_col) + F)).astype(jnp.int32)
                    - wy0_t
                )
                kk = jnp.clip(kbase_col + s_of, 0, K - 1)
                kcol = jax.lax.broadcasted_iota(jnp.int32, (m_rows, K), 1)
                gv8 = (kcol == kk).astype(jnp.int8)
                win_x = pltpu.bitcast(
                    window[(st % 2) * G_P + g] ^ jnp.uint8(0x80), jnp.int8)
                v_int = jax.lax.dot_general(
                    gv8, win_x, dn0, preferred_element_type=jnp.int32,
                ) + 128  # (m_rows, L): exact u8 candidate values
                packed = pltpu.bitcast(
                    v_int.astype(jnp.uint8), jnp.int32)  # (n4*R, L)
            else:
                # ---- window -> bf16 (u8 values are bf16-exact) ----
                win = window[(st % 2) * G_P + g].astype(jnp.int32).astype(
                    jnp.bfloat16)

                # ---- vertical candidate gather: ONE one-hot matmul ----
                rowid = jax.lax.broadcasted_iota(jnp.int32, (S_v * R, 1), 0)
                s_of = rowid // R
                r_of = rowid % R
                rf_col = (r0 + r_of).astype(jnp.float32)
                kbase_col = (
                    jnp.floor(mindx + (kmul(E, rf_col) + F)).astype(jnp.int32)
                    - wy0_t
                )
                kk = jnp.clip(kbase_col + s_of, 0, K - 1)
                kcol = jax.lax.broadcasted_iota(jnp.int32, (S_v * R, K), 1)
                gv = (kcol == kk).astype(jnp.bfloat16)
                v_all = jax.lax.dot_general(
                    gv, win, (((1,), (0,)), ((), ())),
                    precision=_DEFAULT, preferred_element_type=jnp.float32,
                )  # (S_v*R, L): candidate source rows, exact u8 values

            # ---- consumer-unique candidate selection on the (r, lane)
            # grid: UNWEIGHTED top/bottom source rows per lane. VT[r, l] =
            # win[iy(r, X*(l)), l] and VB its +1 row — exact u8 values, so
            # the H dot below runs as ONE plain bf16 one-hot dot (no Dekker
            # split; u8 ints are bf16-exact). All lerping moves to the
            # output grid where fx/fy/validity are per-element anyway.
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
            abs_lane = wl0_t + lane
            p_px = abs_lane // nch
            rf = (r0 + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)).astype(
                jnp.float32
            )
            orow = kmul(B, rf) + C  # (R, 1)
            inv_a = 1.0 / A
            p_f = p_px.astype(jnp.float32)
            xhat = jnp.floor(((p_f - 1.0) - orow) * inv_a).astype(jnp.int32)

            def ixof(xi):
                return jnp.floor(
                    kmul(A, xi.astype(jnp.float32)) + orow
                ).astype(jnp.int32)

            # smallest X with ix(X) >= p-1, judged by the SAME floor
            # staircase the forward pass uses (consistency by construction;
            # the division above is only a +-1 estimate)
            pm1 = p_px - 1
            xstar = jnp.where(
                ixof(xhat - 1) >= pm1, xhat - 1,
                jnp.where(ixof(xhat) >= pm1, xhat, xhat + 1),
            )
            xstar = jnp.clip(xstar, x0, x0 + T - 1)
            syl = (kmul(D, xstar.astype(jnp.float32))
                   + (kmul(E, rf) + F))  # (R, L)
            iyi = jnp.floor(syl).astype(jnp.int32)
            kbase_r = jnp.floor(mindx + (kmul(E, rf) + F)).astype(jnp.int32)
            sel = iyi - kbase_r  # (R, L) in [0, S_v-2] by sizing
            # telescoping prefix-mask selection: VT = V[sel], VB = V[sel+1]
            # in one S_v sweep sharing the (sel >= sc) masks; out-of-range
            # sel (clipped consumer-less lanes) telescopes to an end value —
            # garbage lanes are never gathered as valid taps
            if _PACKED_SELECT:
                # group-telescoped packed words: Gp = packed[gsel] and
                # Gn = packed[gsel+1] share masks (i32 wrap-subtraction
                # telescopes exactly mod 2^32); then per-element byte
                # extraction via variable logical shifts (chip-probed)
                gsel = sel >> 2
                bb = sel & 3
                gp = packed[0:R]
                gn = packed[R : 2 * R] if n4 > 1 else packed[0:R]
                prev_mask = None
                for gg in range(1, n4):
                    d_g = (packed[gg * R : (gg + 1) * R]
                           - packed[(gg - 1) * R : gg * R])
                    mask = gsel >= gg
                    gp = gp + jnp.where(mask, d_g, 0)
                    if gg >= 2:
                        gn = gn + jnp.where(prev_mask, d_g, 0)
                    prev_mask = mask
                vt_rows = jax.lax.shift_right_logical(gp, bb << 3) & 255
                b2 = (bb + 1) & 3
                src_n = jnp.where(bb == 3, gn, gp)
                vb_rows = jax.lax.shift_right_logical(src_n, b2 << 3) & 255
            else:
                # VT = V[0] + sum_{sc>=1} [sel>=sc]*(V[sc]-V[sc-1])
                # VB = V[1] + sum_{sc>=2} [sel>=sc-1]*(V[sc]-V[sc-1])
                # (sel <= S_v-2 by sizing, so VB never needs a V[S_v] term)
                vt_rows = v_all[0:R]
                vb_rows = v_all[R : 2 * R]
                for sc in range(1, S_v):
                    d_sc = (v_all[sc * R : (sc + 1) * R]
                            - v_all[(sc - 1) * R : sc * R])
                    vt_rows = vt_rows + jnp.where(sel >= sc, d_sc, 0.0)
                    if sc >= 2:
                        vb_rows = vb_rows + jnp.where(sel >= sc - 1, d_sc, 0.0)

            # ---- per-SUB-BAND lane re-base (8-row blocks): each sub-band
            # re-anchors to its own hbase_i so the H candidate span only
            # covers 8 rows of b-drift (S_h = ceil(|b|*7)+3 at any R) ----
            def _rebase(vmat):
                if L_pad > L:
                    vmat = jnp.concatenate(
                        [vmat, jnp.zeros((R, L_pad - L), vmat.dtype)], axis=1
                    )
                blocks = []
                for i in range(R // 8):
                    ri0 = (r0 + i * 8).astype(jnp.float32)
                    m1_i = jnp.minimum(kmul(B, ri0), kmul(B, ri0 + 7.0)) + C
                    hb_i = jnp.floor(m1_i).astype(jnp.int32)
                    sh_i = shift0_t + (hb_i - hbase_t) * nch
                    blocks.append(
                        pltpu.roll(vmat[i * 8 : (i + 1) * 8], -sh_i, 1)[:, :L]
                    )
                return blocks[0] if len(blocks) == 1 else jnp.concatenate(
                    blocks, axis=0)

            vt_rows = _rebase(vt_rows)
            vb_rows = _rebase(vb_rows)

            # ---- ONE exact-bf16 one-hot H dot: [VT; VB] stacked ----
            dn = (((1,), (0,)), ((), ()))
            d2 = jax.lax.dot_general(
                jnp.concatenate([vt_rows, vb_rows], axis=0).astype(
                    jnp.bfloat16),
                gmat[...], dn,
                precision=_DEFAULT, preferred_element_type=jnp.float32,
            )  # (2R, (S_h+1)*tn), exact u8 tap values
            d_t, d_b = d2[:R], d2[R : 2 * R]

            # ---- full 4-tap lerp on the (r, X, channel) grid (the same
            # tap-replace -> h-lerp -> v-lerp shape as the XLA sampler) ----
            col = jax.lax.broadcasted_iota(jnp.int32, (1, tn), 1)
            cch = col // T
            xr = col % T
            xf = (x0 + xr).astype(jnp.float32)
            u = kmul(A, xf) + orow  # (R, tn)
            ixf2 = jnp.floor(u)
            fx = u - ixf2
            ixi = ixf2.astype(jnp.int32)
            vx0 = ((ixi >= 0) & (ixi < src_w)).astype(jnp.float32)
            vx1 = ((ixi + 1 >= 0) & (ixi + 1 < src_w)).astype(jnp.float32)
            sy_o = kmul(D, xf) + (kmul(E, rf) + F)  # == syl at the consumer
            fy = sy_o - jnp.floor(sy_o)
            iy_o = jnp.floor(sy_o).astype(jnp.int32)
            vyt = ((iy_o >= 0) & (iy_o < src_h)).astype(jnp.float32)
            vyb = ((iy_o + 1 >= 0) & (iy_o + 1 < src_h)).astype(jnp.float32)
            stair = jnp.floor(kmul(A, xf)).astype(jnp.int32)
            riota = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
            ri0_col = (r0 + (riota // 8) * 8).astype(jnp.float32)
            m1_col = jnp.minimum(kmul(B, ri0_col),
                                 kmul(B, ri0_col + 7.0)) + C
            hbase_col = jnp.floor(m1_col).astype(jnp.int32)  # (R, 1)
            hsel = ixi - stair - hbase_col  # in [0, S_h-2] by sizing
            v00 = jnp.zeros((R, tn), jnp.float32)
            v01 = jnp.zeros((R, tn), jnp.float32)
            v10 = jnp.zeros((R, tn), jnp.float32)
            v11 = jnp.zeros((R, tn), jnp.float32)
            for h in range(S_h):
                mm = hsel == h
                v00 = v00 + jnp.where(mm, d_t[:, h * tn : (h + 1) * tn], 0.0)
                v01 = v01 + jnp.where(
                    mm, d_t[:, (h + 1) * tn : (h + 2) * tn], 0.0)
                v10 = v10 + jnp.where(mm, d_b[:, h * tn : (h + 1) * tn], 0.0)
                v11 = v11 + jnp.where(
                    mm, d_b[:, (h + 1) * tn : (h + 2) * tn], 0.0)
            border_col = jnp.zeros((1, tn), jnp.float32)
            for ci in range(nch):
                border_col = border_col + jnp.where(
                    cch == ci, fp_ref[6 + ci], 0.0)
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
                out_refs[0][0, ci, g * R : (g + 1) * R] = pline

        for g in range(G_P):
            tile_body(g)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_strips, n_groups),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2 * G_P, K, L), plan["src_dtype"]),
            pltpu.VMEM((L, (S_h + 1) * tn), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2 * G_P,)),
        ],
    )

    out_bytes = (
        sum(int(np.prod(o.shape)) * o.dtype.itemsize for o in out_shape)
        if isinstance(out_shape, tuple)
        else int(np.prod(out_shape.shape)) * out_shape.dtype.itemsize
    )
    cost = pl.CostEstimate(
        flops=n_tiles * 2 * (S_v * R * K * L + 3 * R * L * (S_h + 1) * tn),
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
    # (n_strips, out_ch, dst_h, T) -> (out_ch, dst_h, dst_w)
    full = jnp.transpose(raw, (1, 2, 0, 3)).reshape(out_ch, dst_h, dst_w)
    if isinstance(write, TensorSplit):
        return full
    return tuple(full[ci] for ci in range(out_ch))


def analytic_floor(pipeline):
    """Analytic per-launch floor on v5e (VERDICT r4 #6): max of HBM stream
    time (per-tile window DMA + outputs) and MXU time of the one-hot gather
    dots (dense on the MXU at bf16 rate). Returns dict(hbm_bytes, mxu_s,
    floor_s) or None when the kernel does not claim the pipeline."""
    from ..utils.profiling import V5E_BF16_MACS, kernel_floor_s

    plan = _plan(pipeline)
    if plan is None:
        return None
    n_tiles = plan["n_bands"] * plan["n_strips"]
    hbm = (n_tiles * plan["tile_dma_b"]
           + plan["dst_w"] * plan["dst_h"] * plan["out_ch"]
           * plan["out_dtype"].itemsize)
    mxu_s = n_tiles * plan["tile_flops"] / 2.0 / V5E_BF16_MACS
    return dict(hbm_bytes=hbm, mxu_s=mxu_s, floor_s=kernel_floor_s(hbm, mxu_s))
