"""Full-frame Pallas kernel — single-image static-geometry resize pipelines.

The flagship kernel (``pallas_backend``) covers the batched variable-geometry
read; this module covers the reference's OTHER hot read pattern: one full
frame resized per call — ``cvGS::resize<T, INTER_LINEAR>(src, dsize)`` feeding
a pointwise chain and a split write (reference factory
``include/cvGPUSpeedup.cuh:209-216``), including the fused NV12
"ComputeWhatYouSee" read (``tests/resize/test_fused_resize.cu:121-143``).
Geometry here is fully static (src/dst dims are shape information), which the
kernel exploits much harder than the flagship's runtime rects:

- grid = output ROW BANDS (R rows per step, R | dst_h). Per band the needed
  source rows form a STATIC interval, baked host-side into an 8-aligned row
  start table (scalar-prefetched) and a per-band vertical interpolation
  matrix (blocked VMEM input indexed by the band id). No in-kernel weight
  build and NO rotates: every alignment residual is folded into baked taps.
- each band's source window is DMA'd HBM->VMEM through a 2-slot ring
  (full-width rows, so lane starts/extents are trivially aligned).
- vertical resize = ONE banded MXU matmul per band: ``Wv_s (R, rows_in) @
  window (rows_in, W*C)``.
- horizontal resize + HWC de-interleave = per-W-tile matmuls against a BAKED
  block-Toeplitz matrix: the output tile stride maps to an integer,
  128-lane-aligned source stride, so interior tiles share ONE ``(span, C*T)``
  matrix (edge tiles get clamped variants; variants are deduped host-side and
  fetched once per launch).
- when the source is u8 and every interpolation weight AND its complement is
  bf16-representable (pure-selection ratios like the 3:1 video configs, and
  ``k/256``-style weight sets), the matmuls run as EXACT single-pass bf16 MXU
  ops — bit-identical to the f32 path (see ``_weights_bf16_exact``; the same
  argument as the flagship's exact regime, ``pallas_backend`` STATUS finding
  5). A fractional first pass produces 16-bit-significand intermediates, so
  the second pass consumes an exact Dekker hi/lo split folded into one
  K-duplicated matmul. Otherwise both passes are f32 ``Precision.HIGHEST``,
  horizontal-first (the XLA path's association).
- the NV12 path rides the same machinery twice — the Y plane at full
  resolution and the interleaved UV plane at native half resolution with
  full-resolution tap math (the plane-space rewrite of
  ``ops.resize._axis_phases_half``) — converts YUV->RGB planar on the VPU,
  then runs the chain. One read of each source byte, one write per output.

Unsupported patterns return None from ``try_lower`` and fall back to the XLA
polyphase path with identical numerics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.memory import ImageRead, SplitWrite, TensorSplit
from ..ops.nv12 import _KR_KB
from ..ops.resize import ResizeRead, axis_lerp_np
from ..types import ColorRange, InterpolationType, PixelFormat
from ..utils import dtypes as dt
from .pallas_backend import _ScalarVec, _apply_chain_planar, _chain_out_struct

_HIGHEST = jax.lax.Precision.HIGHEST
#: weight-Dekker-3 bf16 first pass for bf16-inexact weights (bench A/B knob;
#: both settings meet the float contract)
_W3 = True
_DEFAULT = jax.lax.Precision.DEFAULT

#: total on-chip footprint bound for window rings + weights + blocks.
#: The pallas_call sets vmem_limit_bytes=32M (Mosaic's real footprint runs
#: ~4-6M above this estimate: double-buffered weight inputs + retiling
#: copies), so 20M here keeps ~6M of margin while letting wide sources
#: (6144-lane NV12) pick a deep band height instead of a 135-step R=8 plan.
_VMEM_BUDGET = 20 * 1024 * 1024
#: budget for the baked horizontal matrices (all variants)
_WH_BUDGET = 6 * 1024 * 1024
#: benchmark-only kernel ablation (None = real kernel): "floor" = DMA +
#: trivial write only; "novert" = skip the vertical matmul; "nohoriz" = skip
#: the horizontal matmuls; "nochain" = skip the pointwise chain. Results are
#: WRONG under any non-None value. Mirrors pallas_backend._ABLATION.
_ABLATION = None
#: benchmark-only band-height override (None = cost-model choice)
_FORCE_R = None
#: window-DMA row-start alignment. u8 HBM memrefs are (32,128)-tiled, so
#: 32-aligned starts let the copy engine move whole tiles; taps are baked
#: relative to the aligned start either way.
_DMA_ROW_ALIGN = 8


def _divisors(n: int):
    return [d for d in range(1, n + 1) if n % d == 0]


def _s8_den(wv: np.ndarray):
    """Dyadic denominator for the s8 vertical pass: the smallest power of two
    ``D <= 2^10`` with ``wv * D`` integer and ``<= D``, provided the hi
    nibble fits s8. Returns ``(D, N)`` or None (the kernel then widens the
    full window — the planner must budget for that)."""
    for k2 in range(0, 11):
        D = 1 << k2
        N = wv * D
        Nr = np.round(N)
        if np.array_equal(N, Nr) and Nr.max() <= D:
            N = Nr.astype(np.int32)
            if (N >> 4).max() <= 127:
                return D, N
            return None
    return None


def _weights_bf16_exact(w: np.ndarray) -> bool:
    """True when every weight AND its complement survives an f32->bf16
    round-trip. Both representable implies w = num/2^k with k <= 8 and
    num <= 255, so u8-value x weight products carry <= 16-bit significands
    and two-pass sums stay exact integer multiples of 1/2^16 below 2^24 —
    every MXU operation is exact (same proof as the flagship's exact bf16
    regime)."""
    w = np.asarray(w, np.float32)
    for arr in (w, np.float32(1.0) - w):
        if not np.array_equal(arr.astype(jnp.bfloat16).astype(np.float32), arr):
            return False
    return True


# ---------------------------------------------------------------------------
# host-side plan baking (all-numpy; cached per static geometry)
# ---------------------------------------------------------------------------


def _v_bake(src_h: int, dst_h: int, R: int, row_offset: int,
            half_of_full: bool = False):
    """Per-band vertical geometry: 8-aligned window row starts (absolute,
    ``row_offset`` added — the NV12 UV plane lives below the luma rows) and
    banded interpolation matrices with taps relative to each band's start.

    ``half_of_full``: taps address a half-resolution plane with
    full-resolution INTER_LINEAR coordinates (NV12 chroma): row ``i`` of the
    logical 2x-upsampled plane is row ``i // 2`` of the stored plane —
    bit-identical to resizing the upsampled plane, never materializing it
    (the plane-space rewrite, ``ops.resize._axis_phases_half``).
    """
    iy0, iy1, wy = axis_lerp_np(np.arange(dst_h, dtype=np.int64), src_h, dst_h)
    if half_of_full:
        iy0, iy1 = iy0 // 2, iy1 // 2
    n_bands = dst_h // R
    plane_rows = (src_h // 2) if half_of_full else src_h
    align = _DMA_ROW_ALIGN
    rstarts, need = [], 0
    for s in range(n_bands):
        lo = int(min(iy0[s * R:(s + 1) * R].min(), iy1[s * R:(s + 1) * R].min()))
        hi = int(max(iy0[s * R:(s + 1) * R].max(), iy1[s * R:(s + 1) * R].max()))
        r0 = (lo // align) * align
        rstarts.append(r0)
        need = max(need, hi - r0 + 1)
    rows_in = -(-need // 8) * 8
    if align > 8:
        # keep clamped starts aligned: grow the window until
        # plane_rows - rows_in is itself a multiple of the alignment
        rows_in += (plane_rows - rows_in) % align
    if plane_rows % 8 == 0:
        # clamp starts so the window never overruns the plane
        if rows_in > plane_rows:
            return None
        rstarts = [min(r0, plane_rows - rows_in) for r0 in rstarts]
    else:
        # The plane row count is not 8-divisible (NV12 chroma: src_h/2 rows
        # sit at the bottom of the buffer) and a band's window may overrun
        # the logical rows INTO THE TILED ALLOCATION'S ROW PADDING. This is
        # safe and validated on hardware: Mosaic DMAs address the row-padded
        # memref (ceil(rows/8)*8), the overrun rows have structurally zero
        # vertical weights (taps end at the last plane row), and the u8
        # chroma data widens to finite values — no NaN can leak through a
        # 0-weight (float sources always take the clamped branch above:
        # src_h % 8 == 0 is required). The argument needs each band's END
        # (rstart + rows_in) to stay inside the padded allocation: rows_in is
        # the max over ALL bands, so a band whose own need is smaller must
        # have its start clamped — alignment jitter (lo % 8 up to 7) can
        # otherwise push rstart + rows_in past roundup8(plane_rows).
        padded_rows = -(-plane_rows // 8) * 8
        if align > 8:
            rows_in += (padded_rows - rows_in) % align
        if rows_in > padded_rows:
            return None
        rstarts = [min(r0, padded_rows - rows_in) for r0 in rstarts]
    wv = np.zeros((n_bands, R, rows_in), np.float32)
    rows = np.arange(R)
    for s in range(n_bands):
        q = s * R + rows
        np.add.at(wv[s], (rows, iy0[q] - rstarts[s]), np.float32(1.0) - wy[q])
        np.add.at(wv[s], (rows, iy1[q] - rstarts[s]), wy[q])
    frac = bool(np.any((wy != 0.0) & (wy != 1.0)))
    # NOTE on selection ratios (all-zero weights, e.g. 3:1 video configs):
    # the vertical one-hot matmul IS the row selection, and it is the ONLY
    # Mosaic-lowerable way to do it. Two alternatives were built and measured
    # WORSE on hardware: an in-kernel strided sublane slice (Mosaic rejects
    # it as an unsupported gather), and a host-side (rows/stride,
    # stride*lanes) reshape of the source so bands could DMA only selected
    # rows — HBM arrays are (8,128)-tiled, so that reshape is NOT a metadata
    # alias: XLA materializes a full relayout copy of the source per call
    # (measured 1828 us vs 115 us XLA on the 1080p config).
    return dict(
        rows_in=rows_in,
        rstarts=np.asarray(rstarts, np.int32) + np.int32(row_offset),
        wv=wv,
        frac_v=frac,
        wy=wy,
    )


def _h_bake(src_w: int, dst_w: int, nch: int, lanes_total: int,
            lane_of, uv_half: bool = False):
    """Tile plan for the horizontal pass: pick an output tile width T whose
    source stride is an integer number of pixels landing on a 128-lane
    boundary, then bake per-tile (span, nch*T) interpolation matrices whose
    rows fold the channel de-interleave (``lane_of(tap_px, c)``) into the
    resize. Interior tiles dedupe to one matrix; edges get clamped variants.
    """
    q = np.arange(dst_w, dtype=np.int64)
    ix0, ix1, wx = axis_lerp_np(q, src_w, dst_w)
    frac = bool(np.any((wx != 0.0) & (wx != 1.0)))

    best = None
    for T in _divisors(dst_w):
        if (T * src_w) % dst_w:
            continue
        s_px = T * src_w // dst_w
        if uv_half and s_px % 2:
            continue
        s_lanes = s_px * nch if not uv_half else s_px
        n_tiles = dst_w // T
        if n_tiles > 1 and s_lanes % 128:
            continue
        # exact lane interval per tile (taps already edge-clamped)
        lane_starts, spans = [], []
        ok = True
        for t in range(n_tiles):
            xs = slice(t * T, (t + 1) * T)
            los, his = [], []
            for c in range(nch):
                los.append(min(lane_of(int(ix0[xs].min()), c),
                               lane_of(int(ix1[xs].min()), c)))
                his.append(max(lane_of(int(ix0[xs].max()), c),
                               lane_of(int(ix1[xs].max()), c)))
            lo, hi = min(los), max(his)
            start = max(0, (lo // 128) * 128)
            span = -(-(hi - start + 1) // 128) * 128
            lane_starts.append(start)
            spans.append(span)
        span = max(spans)
        if span > lanes_total:
            continue
        lane_starts = [min(st, lanes_total - span) for st in lane_starts]
        # bake + dedupe variants (keyed by tap pattern relative to start)
        variants, var_ids, index = [], [], {}
        cols = nch * T
        for t in range(n_tiles):
            m = np.zeros((span, cols), np.float32)
            xl = np.arange(T, dtype=np.int64)
            xg = t * T + xl
            for c in range(nch):
                r0 = np.array([lane_of(int(p), c) for p in ix0[xg]]) - lane_starts[t]
                r1 = np.array([lane_of(int(p), c) for p in ix1[xg]]) - lane_starts[t]
                np.add.at(m, (r0, c * T + xl), np.float32(1.0) - wx[xg])
                np.add.at(m, (r1, c * T + xl), wx[xg])
            key = m.tobytes()
            vid = index.get(key)
            if vid is None:
                vid = len(variants)
                index[key] = vid
                variants.append(m)
            var_ids.append(vid)
        wh_bytes = len(variants) * span * cols * 4
        if wh_bytes > _WH_BUDGET:
            continue
        # prefer matmul-shaped tiles: cols near 512, then smaller spans
        score = (abs(cols - 512), span, len(variants))
        cand = dict(T=T, n_tiles=n_tiles, span=span, lane_starts=lane_starts,
                    wh=np.stack(variants), var_ids=var_ids, frac_h=frac,
                    wx=wx, score=score)
        if best is None or cand["score"] < best["score"]:
            best = cand
    return best


def _plan_key(pipeline):
    read = pipeline.read
    src = _source_array(read)
    if src is None:
        return None
    treedef = jax.tree_util.tree_structure(pipeline)
    return (treedef, tuple(src.shape), str(src.dtype), _FORCE_R,
            _DMA_ROW_ALIGN)


def _source_array(read):
    if not isinstance(read, ResizeRead):
        return None
    if isinstance(read.source, ImageRead) and not read.source.is_batch:
        return read.source.data
    commuted = read._commuted_source()
    if commuted is not None:
        return commuted[0].buffer
    return None


_PLAN_CACHE: dict = {}


def _plan_of(pipeline):
    key = _plan_key(pipeline)
    if key is None:
        return None
    if key in _PLAN_CACHE:
        return _PLAN_CACHE[key]
    plan = _build_plan(pipeline)
    _PLAN_CACHE[key] = plan
    return plan


def _build_plan(pipeline) -> Optional[dict]:
    read: ResizeRead = pipeline.read
    if read.interp != InterpolationType.INTER_LINEAR:
        return None
    if not isinstance(pipeline.write, (TensorSplit, SplitWrite)):
        return None
    dst_w, dst_h = read.dsize.width, read.dsize.height

    conv = None
    if isinstance(read.source, ImageRead) and not read.source.is_batch:
        src = read.source.data
        pc = read.source.packed_channels
        if pc:
            src_h, src_w, nch = int(src.shape[0]), int(src.shape[1]) // pc, pc
        elif src.ndim == 2:
            src_h, src_w, nch = int(src.shape[0]), int(src.shape[1]), 1
        elif src.ndim == 3:
            src_h, src_w, nch = (int(d) for d in src.shape)
        else:
            return None
        kind = "image"
        lanes_total = src_w * nch
    else:
        commuted = read._commuted_source()
        if commuted is None:
            return None
        readop, conv = commuted
        buf = readop.buffer
        if buf.ndim != 2 or jnp.dtype(buf.dtype) != jnp.uint8:
            return None
        total_rows, src_w = (int(d) for d in buf.shape)
        src_h = (total_rows * 2) // 3
        if src_h % 2 or src_w % 2 or src_h * 3 != total_rows * 2:
            return None
        if jnp.dtype(conv.out_dtype) != jnp.float32:
            return None
        nch = 1  # luma; chroma handled as its own part
        kind = "nv12"
        lanes_total = src_w
        src = buf

    src_dtype = jnp.dtype(src.dtype)
    if src_h % 8 or lanes_total % 128:
        return None

    # chain output structure (planes entering the chain: resize output
    # channels, or the conversion's RGB[A] planes)
    chain_in_ch = nch if conv is None else (4 if conv.alpha else 3)
    try:
        out_ch, out_dtype = _chain_out_struct(pipeline.compute, chain_in_ch)
    except (NotImplementedError, ValueError):
        return None
    if jnp.dtype(out_dtype).itemsize > 4:
        return None

    # horizontal plans
    if kind == "image":
        h_y = _h_bake(src_w, dst_w, nch, lanes_total,
                      lambda p, c: p * nch + c)
        h_uv = None
    else:
        h_y = _h_bake(src_w, dst_w, 1, lanes_total, lambda p, c: p)
        swap = readop.pixel_format == PixelFormat.NV21
        h_uv = _h_bake(src_w, dst_w, 2, lanes_total,
                       (lambda p, c: (p // 2) * 2 + (1 - c)) if swap
                       else (lambda p, c: (p // 2) * 2 + c),
                       uv_half=True)
        if h_uv is None:
            return None
    if h_y is None:
        return None

    # exactness: u8 source + every weight/complement bf16-representable
    exact = src_dtype == jnp.uint8
    weight_sets = [h_y["wx"]]
    if h_uv is not None:
        weight_sets.append(h_uv["wx"])
    # horizontal exactness is R-independent; the R selection loop combines it
    # with each candidate's vertical weights to decide whether the kernel
    # would actually take the s8 vertical path (widening only R rows) —
    # discounting the widened-window transient on any other path would
    # under-budget VMEM and pick an R whose true footprint fails Mosaic
    exact_h = exact and all(_weights_bf16_exact(w) for w in weight_sets)

    # vertical plan: pick the band height R (| dst_h) by a work model, not
    # just "largest that fits" — the per-band overheads shrink with R while
    # the widen/matmul work grows with the window height. Feasibility still
    # requires the VMEM budget.
    out_itemsize = jnp.dtype(out_dtype).itemsize
    wh_bytes = h_y["wh"].nbytes + (h_uv["wh"].nbytes if h_uv else 0)
    if _W3 and (not exact) and src_dtype == jnp.uint8:
        # w3 regime stores [hi; lo; lo2] bf16 = 1.5x the f32 bytes
        wh_bytes = (wh_bytes * 3) // 2
    chosen = None
    best_score = None
    row_align = max(1, 32 // out_itemsize)  # output block sublane tiling
    for R in sorted(d for d in _divisors(dst_h) if d <= 256):
        if _FORCE_R is not None and R != _FORCE_R:
            continue
        if R % row_align:
            continue
        v_y = _v_bake(src_h, dst_h, R, 0)
        if v_y is None:
            continue
        v_uv = None
        if kind == "nv12":
            v_uv = _v_bake(src_h, dst_h, R, src_h, half_of_full=True)
            if v_uv is None:
                continue
        ring = 2 * v_y["rows_in"] * lanes_total * src_dtype.itemsize
        if v_uv is not None:
            ring += 2 * v_uv["rows_in"] * lanes_total
        out_blk = 2 * out_ch * R * dst_w * out_itemsize
        wv_blk = R * (v_y["rows_in"] + (v_uv["rows_in"] if v_uv else 0)) * 4 * 2
        # transients: widened window (NOT materialized on the s8 vertical
        # path — only the R result rows widen there) + full-width vertical
        # result (+ hi/lo). The s8 discount applies per part only under the
        # conditions finish()/the kernel actually use: exact weights (this
        # R's vertical set included), vertical-first order, and a dyadic
        # denominator — a u8 source with float outputs or non-dyadic weights
        # still widens the FULL window.
        exact_cand = exact_h and all(
            _weights_bf16_exact(p["wy"]) for p in (v_y, v_uv) if p is not None
        )
        order_v = exact_cand and v_y["rows_in"] > R

        def _s8_part(part):
            return (order_v and part["rows_in"] >= R
                    and _s8_den(part["wv"]) is not None)

        trans = 2 * R * lanes_total * 4
        for part in (v_y, v_uv):
            if part is not None:
                trans += (R if _s8_part(part) else part["rows_in"]) \
                    * lanes_total * 4
        if (_FORCE_R is None
                and ring + out_blk + wv_blk + wh_bytes + trans > _VMEM_BUDGET):
            continue
        n_bands_r = dst_h // R
        # units ~ VPU element-ops (~4e12/s): a grid step's DMA-issue/wait
        # overhead is ~1 us => ~4M units. (The 6K NV12 config's old R=24
        # choice — 95 us vs R=40's 56 us — was NOT a scoring error but the
        # VMEM estimate rejecting R=40 by budgeting the full widened-window
        # transient the s8 path never materializes; fixed above.)
        score = n_bands_r * 4_000_000
        for part in (v_y, v_uv):
            if part is None:
                continue
            widen_rows = R if _s8_part(part) else part["rows_in"]
            score += n_bands_r * widen_rows * lanes_total * 3
            score += n_bands_r * R * part["rows_in"] * lanes_total // 8
        if best_score is None or score < best_score:
            best_score = score
            chosen = (R, v_y, v_uv)
    if chosen is None:
        return None
    R, v_y, v_uv = chosen

    for part in (v_y, v_uv):
        if part is not None:
            weight_sets.append(part["wy"])
    if exact:
        exact = all(_weights_bf16_exact(w) for w in weight_sets)

    if dt.is_integer(out_dtype) and not exact:
        # integer outputs are bit-exact by contract; the inexact f32 matmul
        # association can flip rounding ties vs the XLA lerp — fall back
        return None

    # fractional-ratio fast regime (VERDICT r3 #7): u8 sources whose weights
    # are NOT bf16-exact (e.g. 3.2:1 dsts) run the FIRST (horizontal, full
    # source width) pass as a weight-Dekker-3 bf16 dot: u8 values are
    # bf16-exact, wh = hi+lo+lo2 reproduces the f32 weight to 2^-24, every
    # product is exact and the f32 accumulation error is ulp-level — MORE
    # accurate than the f32-HIGHEST dot it replaces at ~1/2 the MXU cost
    # (3 bf16 passes vs ~6 for f32). The reduced second pass stays HIGHEST.
    w3 = _W3 and (not exact) and src_dtype == jnp.uint8

    # pass order: exact regime minimizes flops (vertical first on a
    # downscale); the general f32 regime is horizontal-first to match the
    # XLA path's association
    order = ("v" if v_y["rows_in"] > R else "h") if exact else "h"

    def finish(vp, hp):
        if vp is None:
            return None
        part = dict(rows_in=vp["rows_in"], rstarts=vp["rstarts"],
                    T=hp["T"], n_tiles=hp["n_tiles"], span=hp["span"],
                    lane_starts=hp["lane_starts"], var_ids=hp["var_ids"],
                    frac_v=vp["frac_v"], frac_h=hp["frac_h"])
        wv, wh = vp["wv"], hp["wh"]
        # Dekker: a fractional first pass yields 16-bit-significand values;
        # the second pass consumes [hi; lo] via a K-duplicated matrix
        if exact:
            dekker = vp["frac_v"] if order == "v" else hp["frac_h"]
            if dekker and order == "v":
                wh = np.concatenate([wh, wh], axis=1)
            if dekker and order == "h":
                wv = np.concatenate([wv, wv], axis=2)
            part["dekker"] = dekker
            wdt = jnp.bfloat16
        else:
            part["dekker"] = False
            wdt = jnp.float32
        part["w3"] = False
        if not exact and w3:
            w = np.asarray(wh, np.float32)
            hi = w.astype(jnp.bfloat16)
            r1 = w - hi.astype(np.float32)
            lo = r1.astype(jnp.bfloat16)
            lo2 = (r1 - lo.astype(np.float32)).astype(jnp.bfloat16)
            # COLUMN-stacked parts: one dot against [hi | lo | lo2] and
            # three cheap adds on the REDUCED output width (a K-triplicated
            # lhs was measured 2.4x slower — it re-materializes the full
            # window slice three times per tile)
            part["wh"] = np.concatenate(
                [np.asarray(hi), np.asarray(lo), np.asarray(lo2)], axis=2)
            part["w3"] = True
            part["wv"] = np.asarray(wv, np.float32)
            part["s8"] = None
            return part
        part["s8"] = None
        if exact and order == "v" and vp["rows_in"] >= R:
            # s8 MXU vertical pass: the dominant kernel cost is widening the
            # FULL u8 window (u8->i32->bf16 touches every source byte, ~10x
            # the 1080p kernel's matmul time measured on hardware); instead
            # the vertical interpolation runs as int8 matmuls directly on the
            # bitcast window and only the R result rows are ever widened.
            # Exactness: wv rows each sum to 1, so with the integer matrix
            # N = wv * den (den = 2^K): N @ win = N @ (win XOR 0x80 as s8)
            # + 128*den, every term an exact i32. N splits into hi/lo
            # nibbles (two s8 matmuls, or one when all N <= 15); the f32
            # result times 1/den (power of two) is the exact rational value
            # the bf16 widen path produces.
            s8 = _s8_den(wv)
            if s8 is not None:
                den, N = s8
                hi, lo = (N >> 4).astype(np.int8), (N & 15).astype(np.int8)
                part["s8"] = dict(den=den, use_hi=bool(hi.any()))
                wv = np.stack([hi, lo], axis=1)  # (n_bands, 2, R, rows_in)
        part["wv"] = wv if part["s8"] else np.asarray(wv, wdt)
        part["wh"] = np.asarray(wh, wdt)
        return part

    plan = dict(
        kind=kind, src_h=src_h, src_w=src_w, nch=nch,
        lanes=lanes_total, src_dtype=src_dtype,
        dst_w=dst_w, dst_h=dst_h, R=R, n_bands=dst_h // R,
        out_ch=out_ch, out_dtype=jnp.dtype(out_dtype),
        chain_in_ch=chain_in_ch, exact=exact, order=order,
        y=finish(v_y, h_y),
        uv=finish(v_uv, h_uv) if h_uv else None,
    )
    if conv is not None:
        kr, kb = _KR_KB[conv.standard]
        kg = 1.0 - kr - kb
        plan["conv"] = dict(
            limited=conv.color_range == ColorRange.LIMITED,
            alpha=conv.alpha, out_dtype=jnp.dtype(conv.out_dtype),
            rv=np.float32(2.0 * (1.0 - kr)),
            gu=np.float32(2.0 * kb * (1.0 - kb) / kg),
            gv=np.float32(2.0 * kr * (1.0 - kr) / kg),
            bu=np.float32(2.0 * (1.0 - kb)),
        )
    else:
        plan["conv"] = None
    return plan


def _chain_leaves_ok(chain) -> bool:
    for leaf in jax.tree_util.tree_leaves(tuple(chain)):
        shp = jnp.shape(leaf)
        if len(shp) > 1 or (shp and shp[0] > 64):
            return False
        if jnp.result_type(leaf) != jnp.float32:
            return False
    return True


def supports(pipeline) -> bool:
    if _source_array(pipeline.read) is None:
        return False
    if not _chain_leaves_ok(pipeline.compute):
        return False
    return _plan_of(pipeline) is not None


#: AUTO-gate calibration (TPU v5e, large-signal protocol): `supports()` true
#: does NOT mean faster. Measured: a 64x128-frame resize ran ~133 us under
#: this kernel vs ~17 us on the XLA path (fixed per-launch grid/DMA overheads
#: dwarf the tiny frame), while 6K NV12 -> 1080p ran 122 us vs 708 us (5.9x).
#: Small sources must therefore route to XLA under ParBackend.AUTO; an
#: explicit ParBackend.PALLAS request still bypasses the gate.
_MIN_IMAGE_SRC_BYTES = 2 * 1024 * 1024


def profitable(pipeline) -> bool:
    """True when this kernel is expected to beat the XLA lowering (used by
    the AUTO backend resolver; explicit PALLAS requests bypass it)."""
    plan = _plan_of(pipeline)
    if plan is None:
        return False
    if plan["kind"] == "nv12":
        # the fused NV12 read is the kernel's headline win (XLA's polyphase
        # plane-space path still pays full-res RGB intermediates)
        return True
    src_bytes = plan["src_h"] * plan["lanes"] * plan["src_dtype"].itemsize
    return src_bytes >= _MIN_IMAGE_SRC_BYTES


def try_lower(pipeline, *, interpret: bool = False):
    if not supports(pipeline):
        return None
    from .pallas_backend import _check_ablation

    _check_ablation((_ABLATION, _FORCE_R))
    return _emit_frame_resize(pipeline, _plan_of(pipeline), interpret=interpret)


# ---------------------------------------------------------------------------
# the emitter
# ---------------------------------------------------------------------------


def _conv_planar(conv: dict, y, u, v):
    """Planar mirror of ``ConvertYUVToRGB.apply`` (identical f32 op order on
    identical inputs -> bit-identical planes)."""
    u = u - 128.0
    v = v - 128.0
    if conv["limited"]:
        y = (y - 16.0) * np.float32(255.0 / 219.0)
        u = u * np.float32(255.0 / 224.0)
        v = v * np.float32(255.0 / 224.0)
    r = y + conv["rv"] * v
    g = y - conv["gu"] * u - conv["gv"] * v
    b = y + conv["bu"] * u
    out_dtype = conv["out_dtype"]
    planes = [dt.saturate_cast(p, out_dtype) for p in (r, g, b)]
    if conv["alpha"]:
        fill = 1.0 if dt.is_float(out_dtype) else dt.max_value(out_dtype)
        planes.append(jnp.full_like(planes[0], fill))
    return planes


def _emit_frame_resize(pipeline, plan: dict, *, interpret: bool):
    read: ResizeRead = pipeline.read
    chain = pipeline.compute
    write = pipeline.write

    kind = plan["kind"]
    dma_align = _DMA_ROW_ALIGN
    R, n_bands = plan["R"], plan["n_bands"]
    dst_w, dst_h = plan["dst_w"], plan["dst_h"]
    lanes = plan["lanes"]
    out_ch, out_dtype = plan["out_ch"], plan["out_dtype"]
    exact, order = plan["exact"], plan["order"]
    parts = [plan["y"]] + ([plan["uv"]] if plan["uv"] is not None else [])
    wdt = jnp.bfloat16 if exact else jnp.float32

    if kind == "image":
        src = read.source.data
        if read.source.packed_channels or src.ndim == 2:
            src2d = src  # packed ingestion: rows are already the lane layout
        else:
            # device-array fallback: a full relayout copy per NEW frame
            src2d = src.reshape(plan["src_h"], lanes)
    else:
        src2d = read._commuted_source()[0].buffer

    # per-band window row starts, one i32 column per part
    rstarts = np.stack([p["rstarts"] for p in parts], axis=1)  # (n_bands, P)

    # A bottom band of a non-8-divisible plane overruns the logical rows into
    # the tiled memref's row padding (hardware-validated, see _v_bake). The
    # interpreter has no such padding — its dynamic slices clamp, which would
    # silently shift the window — so pad the source there (test path only).
    srcs = [src2d]
    total_rows = int(src2d.shape[0])
    if interpret:
        ends = [int(p["rstarts"].max()) + p["rows_in"] for p in parts]
        if ends and max(ends) > total_rows:
            srcs[0] = jnp.pad(
                srcs[0], ((0, max(ends) - total_rows), (0, 0))
            )

    # chain runtime scalars ride one packed f32 prefetch array (leaf order =
    # pytree order; identical machinery to the flagship kernel)
    chain_leaves, chain_def = jax.tree_util.tree_flatten(tuple(chain))
    leaf_shapes = [jnp.shape(l) for l in chain_leaves]
    leaf_sizes = [1 if shp == () else int(shp[0]) for shp in leaf_shapes]
    leaf_offsets = list(np.cumsum([0] + leaf_sizes))[:-1]
    if chain_leaves:
        if any(isinstance(l, jax.core.Tracer) for l in chain_leaves):
            fparams = jnp.concatenate(
                [jnp.asarray(l, jnp.float32).reshape(-1) for l in chain_leaves]
            )
        else:
            fparams = np.concatenate(
                [np.asarray(l, np.float32).reshape(-1) for l in chain_leaves]
            )
    else:
        fparams = np.zeros((1,), np.float32)

    # baked weights: per-band vertical blocks (fetched per step via the index
    # map) + deduped horizontal variants (constant index map, fetched once)
    weight_inputs = []
    weight_specs = []
    for p in parts:
        wv = jnp.asarray(p["wv"])
        weight_inputs.append(wv)
        zeros = (0,) * (wv.ndim - 1)
        weight_specs.append(
            pl.BlockSpec((1,) + wv.shape[1:],
                         lambda s, *_, _z=zeros: (s,) + _z)
        )
        wh = jnp.asarray(p["wh"])
        weight_inputs.append(wh)
        weight_specs.append(
            pl.BlockSpec(wh.shape, lambda s, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )

    if isinstance(write, TensorSplit):
        out_shape = jax.ShapeDtypeStruct((out_ch, dst_h, dst_w), out_dtype)
        out_specs = pl.BlockSpec((out_ch, R, dst_w), lambda s, *_: (0, s, 0))
        n_outs = 1
    else:  # SplitWrite
        out_shape = tuple(
            jax.ShapeDtypeStruct((dst_h, dst_w), out_dtype) for _ in range(out_ch)
        )
        out_specs = tuple(
            pl.BlockSpec((R, dst_w), lambda s, *_: (s, 0)) for _ in range(out_ch)
        )
        n_outs = out_ch

    scratch = []
    for p in parts:
        scratch.append(pltpu.VMEM((2, p["rows_in"], lanes), plan["src_dtype"]))
    scratch.append(pltpu.SemaphoreType.DMA((2 * len(parts),)))

    def _dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=_DEFAULT if exact else _HIGHEST,
            preferred_element_type=jnp.float32,
        )

    def _dot_s8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def kernel(rstart_ref, fp_ref, *rest):
        ns = len(srcs)
        src_refs = rest[:ns]
        nw = len(weight_inputs)
        wrefs = rest[ns:ns + nw]
        out_refs = rest[ns + nw:ns + nw + n_outs]
        windows = rest[ns + nw + n_outs:ns + nw + n_outs + len(parts)]
        sem = rest[ns + nw + n_outs + len(parts)]

        # rebuild chain with in-kernel scalar values
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

        def dma(band, slot, pi):
            """The band's window copy: full-width rows at an 8-aligned
            dynamic row start from the prefetched table (a bottom band of a
            non-8-divisible plane overruns into the memref's row padding —
            legal, validated on hardware; see _v_bake)."""
            p = parts[pi]
            rs = rstart_ref[band, pi]
            sl = src_refs[0].at[pl.ds(pl.multiple_of(rs, dma_align), p["rows_in"]), :]
            return pltpu.make_async_copy(
                sl, windows[pi].at[slot], sem.at[2 * pi + slot]
            )

        @pl.when(s == 0)
        def _():
            for pi in range(len(parts)):
                dma(0, 0, pi).start()

        @pl.when(s + 1 < n_bands)
        def _():
            for pi in range(len(parts)):
                dma(s + 1, (s + 1) % 2, pi).start()

        # all waits before any compute (a semaphore wait is a scheduling
        # barrier — flagship STATUS finding 3)
        for pi in range(len(parts)):
            dma(s, s % 2, pi).wait()

        def len_ch(pi):
            return plan["nch"] if (kind == "image" and pi == 0) else (
                1 if pi == 0 else 2)

        def resize_part(pi):
            """One plane set -> list of (R, dst_w) f32 planes."""
            p = parts[pi]
            wv = wrefs[2 * pi][0]        # (R, rows_in[*2]) or s8 (2, R, rows_in)
            wh_ref = wrefs[2 * pi + 1]   # (n_var, span[*2], cols)
            T = p["T"]
            win = windows[pi][s % 2]
            if p["s8"] is None:
                if dt.is_integer(win.dtype):
                    win = win.astype(jnp.int32)  # no direct u8->f32/bf16 cast
                win = win.astype(jnp.bfloat16 if p["w3"] else wdt)
            if _ABLATION == "floor":
                # DMA + output write only (WRONG results; bench ablation)
                z = windows[pi][s % 2, 0:8, 0:128]
                v = z.astype(jnp.int32).astype(jnp.float32)[0, 0]
                return [jnp.full((R, dst_w), v, jnp.float32)
                        for _ in range(len_ch(pi))]
            tiles = []
            if order == "v":
                if _ABLATION == "novert":
                    base = windows[pi][s % 2, 0:R, :]
                    v_full = base.astype(jnp.int32).astype(jnp.float32)
                elif p["s8"] is not None:
                    # int8 MXU vertical pass on the raw u8 window: only the
                    # R result rows are ever widened (see finish() for the
                    # exactness argument)
                    den = p["s8"]["den"]
                    win_x = pltpu.bitcast(win ^ jnp.uint8(0x80), jnp.int8)
                    acc = _dot_s8(wv[1], win_x)
                    if p["s8"]["use_hi"]:
                        acc = acc + _dot_s8(wv[0], win_x) * 16
                    acc = acc + jnp.int32(128 * den)
                    v_full = acc.astype(jnp.float32)
                    if den > 1:
                        v_full = v_full * jnp.float32(1.0 / den)
                else:
                    v_full = _dot(wv, win)
                if _ABLATION == "nohoriz":
                    return [v_full[:, c * 128:c * 128 + dst_w].astype(jnp.float32)
                            for c in range(len_ch(pi))]
                if p["dekker"]:
                    v_hi = v_full.astype(jnp.bfloat16)
                    v_lo = (v_full - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                else:
                    v_one = v_full.astype(wdt)
                for t in range(p["n_tiles"]):
                    ls = p["lane_starts"][t]
                    whv = wh_ref[p["var_ids"][t]]
                    if p["dekker"]:
                        lhs = jnp.concatenate(
                            [v_hi[:, ls:ls + p["span"]],
                             v_lo[:, ls:ls + p["span"]]], axis=1)
                    else:
                        lhs = v_one[:, ls:ls + p["span"]]
                    tiles.append(_dot(lhs, whv))
            else:
                for t in range(p["n_tiles"]):
                    ls = p["lane_starts"][t]
                    if p["w3"]:
                        hh = jax.lax.dot_general(
                            win[:, ls:ls + p["span"]],
                            wh_ref[p["var_ids"][t]],
                            (((1,), (0,)), ((), ())), precision=_DEFAULT,
                            preferred_element_type=jnp.float32,
                        )  # (rows, 3*cols): hi/lo/lo2 partial sums
                        nc = hh.shape[1] // 3
                        h = (hh[:, :nc] + hh[:, nc : 2 * nc]
                             + hh[:, 2 * nc :])
                    else:
                        h = _dot(win[:, ls:ls + p["span"]],
                                 wh_ref[p["var_ids"][t]])
                    if p["dekker"]:
                        h_hi = h.astype(jnp.bfloat16)
                        h_lo = (h - h_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                        rhs = jnp.concatenate([h_hi, h_lo], axis=0)
                    elif exact:
                        rhs = h.astype(wdt)
                    else:
                        rhs = h
                    tiles.append(_dot(wv, rhs))
            planes = []
            for c in range(len_ch(pi)):
                segs = [tl[:, c * T:(c + 1) * T] for tl in tiles]
                planes.append(segs[0] if len(segs) == 1
                              else jnp.concatenate(segs, axis=1))
            return planes

        if kind == "image":
            planes = resize_part(0)
        else:
            (y_p,) = resize_part(0)
            u_p, v_p = resize_part(1)
            planes = _conv_planar(plan["conv"], y_p, u_p, v_p)

        if _ABLATION != "nochain":
            planes = _apply_chain_planar(chain_k, planes)

        if isinstance(write, TensorSplit):
            for c, pln in enumerate(planes):
                out_refs[0][c] = pln
        else:
            for c, pln in enumerate(planes):
                out_refs[c][...] = pln

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM) for _ in srcs]
        + weight_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    flops = 0
    in_bytes = 0
    for p in parts:
        flops += 2 * dst_h * p["rows_in"] * lanes  # vertical pass
        in_bytes += n_bands * p["rows_in"] * lanes * plan["src_dtype"].itemsize
        flops += 2 * dst_h * p["span"] * p["n_tiles"] * p["wh"].shape[-1]
    out_bytes = out_ch * dst_h * dst_w * out_dtype.itemsize
    cost = pl.CostEstimate(
        flops=flops, bytes_accessed=in_bytes + out_bytes, transcendentals=0
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=cost,
        # Mosaic's DEFAULT scoped-vmem limit is 16M and its real footprint
        # (double-buffered weight inputs + retiling copies) runs ~4-6M above
        # the planner's estimate: a 6144-wide NV12 config compiled to 17.1M
        # and failed at the default limit while computing CORRECTLY at 32M
        # (v5e VMEM is far larger). Keep the planner budget at 12M and give
        # the compiler the headroom it actually uses.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
    )(rstarts, fparams, *srcs, *weight_inputs)


def analytic_floor(pipeline):
    """Analytic per-launch floor on v5e (VERDICT r4 #6): the max of HBM
    streaming time (window reads + output writes) and MXU time of the
    kernel's ACTUAL dense dot schedule — the banded interpolation matrices
    are sparse in content but dense on the MXU, so their shapes (incl. the
    w3 column-tripling, Dekker duplication, and the 2x-rate s8 vertical
    path) are part of the algorithm's speed of light. Returns
    dict(hbm_bytes, mxu_s, floor_s) or None if the kernel does not claim
    the pipeline."""
    from ..utils.profiling import V5E_BF16_MACS, V5E_HBM_BPS, kernel_floor_s

    plan = _plan_of(pipeline)
    if plan is None:
        return None
    n_bands, R = plan["n_bands"], plan["R"]
    lanes = plan["lanes"]
    dst_w, dst_h = plan["dst_w"], plan["dst_h"]
    hbm = dst_h * dst_w * plan["out_ch"] * plan["out_dtype"].itemsize
    mxu_s = 0.0
    for p in (plan["y"], plan["uv"]):
        if p is None:
            continue
        rows_in = p["rows_in"]
        hbm += n_bands * rows_in * lanes * plan["src_dtype"].itemsize
        span, cols = p["wh"].shape[-2], p["wh"].shape[-1]
        wv_k = p["wv"].shape[-1]
        n_tiles = p["n_tiles"]
        if plan["order"] == "v":
            # vertical first over the full lane width (s8 nibble passes run
            # at 2x the bf16 MAC rate; use_hi False is a single pass)
            v_passes = (2 if (p["s8"] and p["s8"]["use_hi"]) else 1)
            v_rate = (2.0 if p["s8"] else 1.0) * V5E_BF16_MACS
            mxu_s += n_bands * R * wv_k * lanes * v_passes / v_rate
            mxu_s += n_bands * n_tiles * R * span * cols / V5E_BF16_MACS
        else:
            # horizontal first on the window rows (cols carries the w3
            # tripling), reduced vertical second (wv_k carries Dekker).
            # Exact/w3 parts run single-pass bf16; the general f32 regime
            # runs Precision.HIGHEST (~6 bf16-rate passes)
            rate = (V5E_BF16_MACS if (plan["exact"] or p["w3"])
                    else V5E_BF16_MACS / 6.0)
            mxu_s += n_bands * n_tiles * rows_in * span * cols / rate
            w3f = 3 if p["w3"] else 1
            mxu_s += n_bands * R * wv_k * n_tiles * (cols // w3f) / rate
    return dict(hbm_bytes=hbm, mxu_s=mxu_s, floor_s=kernel_floor_s(hbm, mxu_s))
