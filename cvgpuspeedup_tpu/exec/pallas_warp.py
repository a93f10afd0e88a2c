"""Pallas warp kernel — separable affine warps (scale + translation).

The reference treats ``Warping`` as just another fused read op
(``include/cvGPUSpeedup.cuh:285-442``; its affine test is a pure translation,
``tests/warping/test_warping_opencv.cu:92-107``) — trivial for a
thread-per-pixel GPU, but arbitrary per-pixel gathers crawl on TPU. This
kernel covers the SEPARABLE affine class (inverse map with no cross terms:
``sx = a*x + c``, ``sy = e*y + f`` — translations, axis-aligned scales, and
their compositions), which is the class the reference's own affine tests
exercise; rotations/shears and perspective fall back to the XLA gather path.

TPU-first design (runtime matrix — values NEVER recompile):

- grid = output ROW BANDS. The per-band source row interval depends on the
  runtime map, so band row starts are computed OUTSIDE the kernel with a few
  tiny vector ops on the decomposed coordinate terms (``ops.warp
  .decompose_inverse_map`` — f64-derived f32 vectors, the same values the
  XLA path samples at) and fed through scalar prefetch, exactly like the
  frame kernel's baked start table but per call. Static window EXTENTS come
  from pow2 magnitude buckets of the concrete matrix the factory saw
  (:func:`scale_buckets`), so jitter in the matrix values reuses the program.
- vertical pass: ONE MXU matmul per band against a (R, rows_in) two-tap
  one-hot matrix built on the VPU from the prefetched coordinates. Taps
  outside the source get ZERO weight (constant-border semantics); the border
  value enters once at the end via the factored weight sum
  ``border * (1 - svy(y)*svx(x))`` (bilinear weights factor per axis).
- horizontal pass + HWC de-interleave: per-W-tile MXU matmuls against
  (span, C*T) one-hot matrices (channel-major columns, like the flagship's
  wide matrix). The tile's lane window is a DYNAMIC 128-lane-aligned slice
  of the band's full-width vertical result (bounced through a VMEM scratch
  ref — Mosaic has no dynamic value slicing); tile matrices depend only on
  x, so they are built ONCE at step 0 into scratch and reused every band.
- precision: f32 ``Precision.HIGHEST`` both passes — warp weights are
  arbitrary f32 (no exact-bf16 regime exists), and the result must track the
  XLA path's values within the 1e-4 float contract.

Unsupported patterns return None from ``try_lower`` and fall back to the XLA
path with identical semantics.
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

_HIGHEST = jax.lax.Precision.HIGHEST

_VMEM_BUDGET = 12 * 1024 * 1024  # of ~16 MB/core, leaving Mosaic headroom


def scale_buckets(inv: np.ndarray) -> Optional[tuple]:
    """Static pow2 magnitude buckets for the separable inverse map, or None
    when the map is not kernel-separable. The buckets size the kernel's
    static DMA window extents; the actual matrix values stay runtime leaves,
    so any matrix whose scales stay within the same pow2 bucket reuses the
    compiled program."""
    inv = np.asarray(inv, np.float64)
    if inv.shape[0] == 3:  # perspective
        return None
    a, b_, d_, e = inv[0, 0], inv[0, 1], inv[1, 0], inv[1, 1]
    if b_ != 0.0 or d_ != 0.0:
        return None  # rotation/shear: not separable
    if not (a > 0 and e > 0):
        return None  # flips: XLA path
    bucket = lambda v: float(2.0 ** math.ceil(math.log2(max(v, 0.125))))
    return (bucket(a), bucket(e))


def _divisors(n: int):
    return [d for d in range(1, n + 1) if n % d == 0]


def _plan(pipeline) -> Optional[dict]:
    read = pipeline.read
    if not isinstance(read, WarpRead):
        return None
    if read.warp_type != WarpType.AFFINE or read.sep_buckets is None:
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
        src_h, src_w, nch = (int(d) for d in src.shape)
    else:
        return None
    lanes = src_w * nch
    if src_h % 8 or lanes % 128:
        return None
    dst_w, dst_h = read.dsize.width, read.dsize.height
    a_b, e_b = read.sep_buckets

    try:
        out_ch, out_dtype = _chain_out_struct(pipeline.compute, nch)
    except (NotImplementedError, ValueError):
        return None
    out_itemsize = jnp.dtype(out_dtype).itemsize
    if out_itemsize > 4:
        return None
    for leaf in jax.tree_util.tree_leaves(tuple(pipeline.compute)):
        shp = jnp.shape(leaf)
        if len(shp) > 1 or (shp and shp[0] > 64):
            return None
        if jnp.result_type(leaf) != jnp.float32:
            return None

    # joint (R, T) search: R | dst_h (output-block sublane multiple),
    # T | dst_w (C*T in the MXU lane-tile range), minimizing a device-time
    # model (grid-step overhead + DMA traffic + widen + matmul flops) subject
    # to the VMEM budget. The old "largest R <= 64 / first T" heuristic
    # rejected 1080p-class geometry outright (520-row windows, 14 MB of
    # cached H matrices).
    row_align = max(1, 32 // out_itemsize)
    best = None
    for R in _divisors(dst_h):
        if R % row_align or R > 128:
            continue
        rows_in = -(-(int(math.ceil(e_b * (R - 1))) + 10) // 8) * 8
        # whole-plane window when the band span (plus slack) exceeds it —
        # the row start then clamps to 0 and every valid tap fits
        rows_in = min(rows_in, src_h)
        n_bands = dst_h // R
        for T in _divisors(dst_w):
            if not 128 <= nch * T <= 1024:
                continue
            span = -(-(nch * int(math.ceil(a_b * (T - 1))) + 2 * nch + 1)
                     // 128) * 128 + 128
            # whole-row window when the tile span (plus alignment slack)
            # would exceed it — the lane start then clamps to 0
            span = min(span, lanes)
            n_tiles = dst_w // T
            vmem = (
                2 * rows_in * lanes * src.dtype.itemsize  # window ring
                + rows_in * lanes * 4                     # widened window
                + R * lanes * 4                           # vertical result
                + n_tiles * span * nch * T * 4            # cached H matrices
                + 2 * out_ch * R * dst_w * out_itemsize   # output blocks
            )
            if vmem > _VMEM_BUDGET:
                continue
            # time model in ns: ~1 us/grid step; HBM at ~0.8 B/ns; VPU at
            # ~8 elem-ops/ns; f32 HIGHEST matmul at ~50 flops/ns
            dma_b = n_bands * rows_in * lanes * src.dtype.itemsize
            widen = n_bands * rows_in * lanes * 3
            flops = 2 * n_bands * R * rows_in * lanes \
                + 2 * dst_h * span * nch * dst_w // T \
                + 2 * out_ch * dst_h * dst_w  # epilogue-ish
            build = n_tiles * span * nch * T * 6
            cost = (n_bands * 1000 + dma_b / 0.8 + widen / 8
                    + flops / 50 + build / 8)
            if best is None or cost < best["cost"]:
                best = dict(R=R, rows_in=rows_in, T=T, span=span,
                            n_tiles=n_tiles, n_bands=n_bands, cost=cost)
    if best is None:
        return None
    return dict(src_h=src_h, src_w=src_w, nch=nch, lanes=lanes,
                dst_w=dst_w, dst_h=dst_h, R=best["R"],
                rows_in=best["rows_in"], T=best["T"], span=best["span"],
                n_tiles=best["n_tiles"], n_bands=best["n_bands"],
                out_ch=out_ch, out_dtype=jnp.dtype(out_dtype),
                src_dtype=jnp.dtype(src.dtype))


def supports(pipeline) -> bool:
    return _plan(pipeline) is not None


def profitable(pipeline) -> bool:
    """The XLA warp path is 4 arbitrary gathers per pixel — this kernel wins
    except on tiny outputs where fixed launch overheads dominate."""
    plan = _plan(pipeline)
    if plan is None:
        return False
    return plan["dst_w"] * plan["dst_h"] >= 64 * 64


def try_lower(pipeline, *, interpret: bool = False):
    plan = _plan(pipeline)
    if plan is None:
        return None
    return _emit_warp(pipeline, plan, interpret=interpret)


def _emit_warp(pipeline, plan: dict, *, interpret: bool):
    read: WarpRead = pipeline.read
    chain = pipeline.compute
    write = pipeline.write
    nch = plan["nch"]
    src_h, lanes = plan["src_h"], plan["lanes"]
    src_w = plan["src_w"]
    R, rows_in = plan["R"], plan["rows_in"]
    T, span, n_tiles = plan["T"], plan["span"], plan["n_tiles"]
    n_bands = plan["n_bands"]
    dst_w, dst_h = plan["dst_w"], plan["dst_h"]
    out_ch, out_dtype = plan["out_ch"], plan["out_dtype"]

    src = read.source.data
    if read.source.packed_channels or src.ndim == 2:
        src2d = jnp.asarray(src)  # packed ingestion: already the lane layout
    else:
        src2d = jnp.reshape(jnp.asarray(src), (src_h, lanes))

    # coordinate vectors (same f32 values the XLA path samples)
    sx = (jnp.asarray(read.col_x, jnp.float32)
          + jnp.asarray(read.row_x, jnp.float32)[0])  # (dst_w,)
    sy = (jnp.asarray(read.row_y, jnp.float32)
          + jnp.asarray(read.col_y, jnp.float32)[0])  # (dst_h,)

    # --- tiny in-jit prep: per-band 8-aligned row starts and per-tile
    # 128-aligned lane starts (the analog of the frame kernel's baked start
    # tables, but computed per call because the map is runtime) ---
    iy0 = jnp.floor(sy).astype(jnp.int32)                      # (dst_h,)
    iy0_clip = jnp.clip(iy0, 0, src_h - 1).reshape(n_bands, R)
    band_lo = jnp.min(iy0_clip, axis=1)
    rstarts = jnp.clip((band_lo // 8) * 8, 0, src_h - rows_in)  # (n_bands,)

    ix0 = jnp.floor(sx).astype(jnp.int32)                      # (dst_w,)
    lane0 = jnp.clip(ix0, 0, src_w - 1).reshape(n_tiles, T) * nch
    tile_lo = jnp.min(lane0, axis=1)
    lstarts = jnp.clip((tile_lo // 128) * 128, 0, lanes - span)  # (n_tiles,)

    # chain runtime scalars ride one packed f32 prefetch array, plus the
    # border vector at the front (same machinery as the other emitters)
    chain_leaves, chain_def = jax.tree_util.tree_flatten(tuple(chain))
    leaf_shapes = [jnp.shape(l) for l in chain_leaves]
    leaf_sizes = [1 if shp == () else int(shp[0]) for shp in leaf_shapes]
    leaf_offsets = list(np.cumsum([nch] + leaf_sizes))[:-1]
    fparams = jnp.concatenate(
        [jnp.asarray(read.default, jnp.float32).reshape(nch)]
        + [jnp.asarray(l, jnp.float32).reshape(-1) for l in chain_leaves]
    )

    # coordinate vectors as (1, N) VMEM inputs, whole-array constant fetch
    sx_in = sx.reshape(1, dst_w)
    # per-band slice of sy
    sy_in = sy.reshape(n_bands, 1, R)

    if isinstance(write, TensorSplit):
        out_shape = jax.ShapeDtypeStruct((out_ch, dst_h, dst_w), out_dtype)
        out_specs = pl.BlockSpec((out_ch, R, dst_w), lambda s, *_: (0, s, 0))
        n_outs = 1
    else:
        out_shape = tuple(
            jax.ShapeDtypeStruct((dst_h, dst_w), out_dtype) for _ in range(out_ch)
        )
        out_specs = tuple(
            pl.BlockSpec((R, dst_w), lambda s, *_: (s, 0)) for _ in range(out_ch)
        )
        n_outs = out_ch

    def kernel(rstart_ref, lstart_ref, fp_ref, src_ref, sx_ref, sy_ref, *rest):
        out_refs = rest[:n_outs]
        window, hmat, vres, sem = rest[n_outs:]

        leaf_vals = []
        for shp, size, off in zip(leaf_shapes, leaf_sizes, leaf_offsets):
            if shp == ():
                leaf_vals.append(fp_ref[int(off)])
            else:
                leaf_vals.append(
                    _ScalarVec(fp_ref[int(off) + i] for i in range(size))
                )
        chain_k = jax.tree_util.tree_unflatten(chain_def, leaf_vals)

        s = pl.program_id(0)

        def dma(band, slot):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(pl.multiple_of(rstart_ref[band], 8), rows_in), :],
                window.at[slot],
                sem.at[slot],
            )

        @pl.when(s == 0)
        def _():
            dma(0, 0).start()
            # per-tile horizontal one-hot matrices: x-only geometry, built
            # once into scratch and reused by every band
            sxv = sx_ref[...]  # (1, dst_w)
            for t in range(n_tiles):
                sxt = sxv[:, t * T:(t + 1) * T]          # (1, T)
                ix0t = jnp.floor(sxt)
                fx = sxt - ix0t
                ix0i = ix0t.astype(jnp.int32)
                v0 = ((ix0i >= 0) & (ix0i < src_w)).astype(jnp.float32)
                v1 = ((ix0i + 1 >= 0) & (ix0i + 1 < src_w)).astype(jnp.float32)
                l0 = ix0i * nch - lstart_ref[t]          # (1, T) lane rel
                k = jax.lax.broadcasted_iota(jnp.int32, (span, 1), 0)
                cols = []
                for c in range(nch):
                    m = ((k == l0 + c) * ((1.0 - fx) * v0)
                         + (k == l0 + nch + c) * (fx * v1))
                    cols.append(m)
                hmat[t] = jnp.concatenate(cols, axis=1)  # (span, nch*T)

        @pl.when(s + 1 < n_bands)
        def _():
            dma(s + 1, (s + 1) % 2).start()

        dma(s, s % 2).wait()

        # vertical two-tap one-hot from the band's runtime coords
        syb = sy_ref[0]                                   # (1, R)
        ry = jnp.transpose(syb)                           # (R, 1)
        iy0b = jnp.floor(ry)
        fy = ry - iy0b
        iy0i = iy0b.astype(jnp.int32)
        w0 = (1.0 - fy) * ((iy0i >= 0) & (iy0i < src_h)).astype(jnp.float32)
        w1 = fy * ((iy0i + 1 >= 0) & (iy0i + 1 < src_h)).astype(jnp.float32)
        rel = iy0i - rstart_ref[s]
        kk = jax.lax.broadcasted_iota(jnp.int32, (R, rows_in), 1)
        wv = (kk == rel) * w0 + (kk == rel + 1) * w1      # (R, rows_in)
        svy = w0 + w1                                     # (R, 1) inside-sum

        win = window[s % 2]
        if dt.is_integer(win.dtype):
            win = win.astype(jnp.int32)
        vres[...] = jax.lax.dot_general(
            wv, win.astype(jnp.float32), (((1,), (0,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32,
        )  # (R, lanes)

        sxv = sx_ref[...]
        planes = [[] for _ in range(nch)]
        border_masks = []
        for t in range(n_tiles):
            ls = lstart_ref[t]
            seg = vres[:, pl.ds(pl.multiple_of(ls, 128), span)]  # (R, span)
            h = jax.lax.dot_general(
                seg, hmat[t], (((1,), (0,)), ((), ())),
                precision=_HIGHEST, preferred_element_type=jnp.float32,
            )  # (R, nch*T)
            sxt = sxv[:, t * T:(t + 1) * T]
            ix0t = jnp.floor(sxt)
            fx = sxt - ix0t
            ix0i = ix0t.astype(jnp.int32)
            svx = ((1.0 - fx) * ((ix0i >= 0) & (ix0i < src_w)).astype(jnp.float32)
                   + fx * ((ix0i + 1 >= 0) & (ix0i + 1 < src_w)).astype(jnp.float32))
            border_masks.append(1.0 - svy * svx)          # (R, T)
            for c in range(nch):
                planes[c].append(h[:, c * T:(c + 1) * T])

        bmask = (border_masks[0] if n_tiles == 1
                 else jnp.concatenate(border_masks, axis=1))  # (R, dst_w)
        out_planes = []
        for c in range(nch):
            p = planes[c][0] if n_tiles == 1 else jnp.concatenate(planes[c], axis=1)
            out_planes.append(p + fp_ref[c] * bmask)

        out_planes = _apply_chain_planar(chain_k, out_planes)

        if isinstance(write, TensorSplit):
            for c, p in enumerate(out_planes):
                out_refs[0][c] = p
        else:
            for c, p in enumerate(out_planes):
                out_refs[c][...] = p

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, dst_w), lambda s, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R), lambda s, *_: (s, 0, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, rows_in, lanes), plan["src_dtype"]),
            pltpu.VMEM((n_tiles, span, nch * T), jnp.float32),
            pltpu.VMEM((R, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out_bytes = (
        sum(int(np.prod(o.shape)) * o.dtype.itemsize for o in out_shape)
        if isinstance(out_shape, tuple)
        else int(np.prod(out_shape.shape)) * out_shape.dtype.itemsize
    )
    cost = pl.CostEstimate(
        flops=2 * n_bands * (R * rows_in * lanes + R * span * nch * dst_w),
        bytes_accessed=n_bands * rows_in * lanes * plan["src_dtype"].itemsize
        + out_bytes,
        transcendentals=0,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=cost,
    )(rstarts, lstarts, fparams, src2d, sx_in, sy_in)


def analytic_floor(pipeline):
    """Analytic per-launch floor on v5e (VERDICT r4 #6): max of HBM stream
    time (band windows + outputs) and MXU time of the separable V/H dots at
    f32-HIGHEST (~1/6 the bf16 MAC rate on these shapes). Returns
    dict(hbm_bytes, mxu_s, floor_s) or None when the kernel does not claim
    the pipeline."""
    from ..utils.profiling import V5E_BF16_MACS, kernel_floor_s

    plan = _plan(pipeline)
    if plan is None:
        return None
    hbm = (plan["n_bands"] * plan["rows_in"] * plan["lanes"]
           * plan["src_dtype"].itemsize
           + plan["dst_w"] * plan["dst_h"] * plan["out_ch"]
           * plan["out_dtype"].itemsize)
    # H pass: (R, span) @ (span, nch*T) per tile, summed over tiles/bands =
    # dst_h * span * nch * dst_w MACs (the kernel's own CostEstimate shape;
    # an earlier // T here understated the floor by a factor of T)
    macs = (plan["n_bands"] * plan["R"] * plan["rows_in"] * plan["lanes"]
            + plan["dst_h"] * plan["span"] * plan["nch"] * plan["dst_w"])
    mxu_s = macs / (V5E_BF16_MACS / 6.0)  # f32 HIGHEST passes
    return dict(hbm_bytes=hbm, mxu_s=mxu_s, floor_s=kernel_floor_s(hbm, mxu_s))
