"""Fused divergent-batch Pallas kernel — one launch, per-plane op sequences.

The reference executes DIFFERENT op sequences on different planes of one
batch in a single kernel launch (``launchDivergentBatchTransformDPP_Kernel``;
``tests/batchread/test_circularbatchread_x_write3D.cu:147-156`` — some
planes run seq1, others seq2). The XLA lowering in
``exec.executor.launch_divergent_batch`` already fuses everything into ONE
jitted program, but as several region computations + a scatter merge; this
kernel is the single-launch analog:

- grid = (N planes,). A scalar-prefetched group table maps each plane to its
  (static) sequence id; every sequence's body is traced into the kernel and
  executed under ``pl.when(gid == g)`` — the TPU analog of the reference's
  per-plane dispatch, with exactly one body running per grid step.
- each sequence's source stack is an HBM input; the plane window is DMA'd
  through a 2-slot ring (double-buffered across grid steps) with the NEXT
  plane's copy issued conditionally on ITS group. ``CircularBatchRead``'s
  runtime ``first`` rides the scalar-prefetch array — the modular plane
  index is computed in-kernel, so ring rotation never recompiles.
- planes are processed INTERLEAVED (H, W*C): per-channel scalar parameters
  become periodic lane-coefficient rows (``lane % C == c``), so the
  pointwise chain needs no channel de-interleave at all, and the packed
  (N, H, W, C) write is a straight block copy. Channel-reordering chains
  (VectorReorder / color conversions) and planar writes fall back to the
  XLA path.

``try_lower`` returns None for unsupported patterns (the caller falls back
to the XLA scatter-merge lowering with identical results).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graph import FusedCompute
from ..ops.arithmetic import StaticLoop, _BinaryWithScalar
from ..ops.cast import Cast, SaturateCast
from ..graph import FusedRead
from ..ops.memory import (BatchRead, CircularBatchRead, ImageRead,
                          TensorWrite, Write2D)
from ..ops.nv12 import _KR_KB, ColorRange, ConvertYUVToRGB, PixelFormat, ReadYUV
from ..ops.resize import ResizeRead
from ..ops.resize import BatchResizeRead, axis_lerp_np
from ..types import AspectRatio, InterpolationType
from ..utils import dtypes as dt


def _flat_chain(compute) -> Optional[list]:
    """Flatten FusedCompute/StaticLoop nesting; None if any op cannot run on
    interleaved lanes (i.e. needs a channel permutation)."""
    out = []
    for op_ in compute:
        if isinstance(op_, FusedCompute):
            sub = _flat_chain(op_.ops)
            if sub is None:
                return None
            out.extend(sub)
        elif isinstance(op_, StaticLoop):
            body = _flat_chain([op_.body])
            if body is None:
                return None
            out.extend(body * op_.n)
        elif isinstance(op_, (_BinaryWithScalar, Cast, SaturateCast)):
            out.append(op_)
        else:
            return None
    return out


def _chain_out_dtype(chain):
    """Output dtype of the chain on f32 input (dtype propagation only)."""
    dtype = jnp.float32
    for op_ in chain:
        if isinstance(op_, (Cast, SaturateCast)):
            dtype = jnp.dtype(op_.dst)
    return dtype


def _seq_info(seq) -> Optional[dict]:
    read = seq.read
    packed = 0
    sshape = None
    if isinstance(read, ImageRead) and read.is_batch:
        src, kind, asc = read.data, "image", True
        packed = read.packed_channels
    elif isinstance(read, CircularBatchRead):
        src, kind, asc = read.data, "circ", read.ascendent
        packed = read.packed_channels
    elif isinstance(read, BatchResizeRead) and read.frame is not None:
        # GEOMETRY read, flagship shape: per-plane CROPS of one shared frame,
        # bilinear-resized — the reference's divergent demo routes arbitrary
        # per-plane sequences incl. batched reads in one launch
        # (tests/batchread/test_circularbatchread_x_write3D.cu:147-156).
        # Uniform crop SIZE (bucketed window geometry is static); positions
        # are runtime scalar-prefetch values, so rect jitter never
        # recompiles. Ragged/letterbox stays with the flagship kernel.
        from . import pallas_backend as pbk

        if (read.aspect_ratio != AspectRatio.IGNORE_AR
                or read.interp != InterpolationType.INTER_LINEAR
                or read.used_planes is not None
                or read.uniform_wh is None
                or read.max_crop_w is None or read.max_crop_h is None):
            return None
        geo = pbk._window_geometry(read)
        if geo is None:
            return None
        src = read.frame
        sdt = jnp.dtype(src.dtype)
        if sdt not in (jnp.dtype(jnp.uint8), jnp.dtype(jnp.float32)):
            return None
        c = read.source_dims()[2]
        lanes_alloc = 1 << (geo["lanes"] - 1).bit_length()
        chain = _flat_chain(seq.compute)
        if chain is None:
            return None
        if not isinstance(seq.write, (TensorWrite, Write2D)):
            return None
        # dy residual range covers BOTH regimes: unclamped 8-aligned starts
        # (dy <= 7) and the bottom-of-frame clamp to src_h - win_h, where
        # dy = y0 - (src_h - win_h) <= win_h - crop_h (an 8-entry table read
        # out of bounds for bottom-aligned crops — see pallas_backend
        # _n_dy_uniform)
        n_dy = pbk._n_dy_uniform(geo["win_h"], int(read.uniform_wh[1]))
        return dict(src=src, kind="crop_resize", asc=True, chain=chain,
                    read=read, pshape=(read.dsize.height, read.dsize.width, c),
                    packed=read.packed_channels, geo=geo, n_dy=n_dy,
                    lanes_alloc=lanes_alloc,
                    sshape=(geo["win_h"], lanes_alloc, 1))
    elif isinstance(read, BatchResizeRead) and read.stack is not None:
        # GEOMETRY read: whole-plane static resize per group (the reference
        # mixes an NV12-read+resize sequence with a pass-through in ONE
        # divergent launch, tests/resize/test_fused_resize.cu:85-92; the
        # resize half is this kind). Uniform full-plane geometry only —
        # per-plane rect geometry stays with the flagship kernel.
        if (read.aspect_ratio != AspectRatio.IGNORE_AR
                or read.interp != InterpolationType.INTER_LINEAR
                or read.used_planes is not None
                or read.uniform_wh is None):
            return None
        src, kind, asc = read.stack, "resize", True
        packed = read.packed_channels
        sh = int(src.shape[1])
        sw = (int(src.shape[2]) // packed if packed
              else int(src.shape[2]))
        if tuple(read.uniform_wh) != (sw, sh):
            return None  # not a whole-plane resize
        c = packed if packed else int(src.shape[3])
        sshape = (sh, sw, c)
        pshape = (read.dsize.height, read.dsize.width, c)
        if src.ndim != (3 if packed else 4):
            return None
        chain = _flat_chain(seq.compute)
        if chain is None:
            return None
        if not isinstance(seq.write, (TensorWrite, Write2D)):
            return None
        return dict(src=src, kind=kind, asc=asc, chain=chain, read=read,
                    pshape=pshape, packed=packed, sshape=sshape)
    elif isinstance(read, BatchRead) and read.used_planes is None:
        winfo = _warp_seq_info(seq, read)
        if winfo is not None:
            return winfo
        # NV12 group: every plane an identical-structure fused NV12->RGB
        # read, optionally resized — the other half of the reference's
        # divergent demo (tests/resize/test_fused_resize.cu:85-92). The
        # YUV->RGB affine is FOLDED into the baked horizontal matrices
        # (see _bake_nv12), so the kernel runs it as two matmuls.
        sub = read.ops
        if not sub:
            return None
        def _split(op_):
            if isinstance(op_, ResizeRead):
                return op_.source, op_.dsize
            return op_, None
        f0, d0 = _split(sub[0])
        if not isinstance(f0, FusedRead) or not isinstance(f0.read, ReadYUV):
            return None
        if len(f0.chain) != 1 or not isinstance(f0.chain[0], ConvertYUVToRGB):
            return None
        conv = f0.chain[0]
        if conv.alpha or jnp.dtype(conv.out_dtype) != jnp.float32:
            return None
        bufs = []
        for op_ in sub:
            fr, dd = _split(op_)
            if dd != d0 or not isinstance(fr, FusedRead):
                return None
            if not isinstance(fr.read, ReadYUV):
                return None
            if (len(fr.chain) != 1
                    or not isinstance(fr.chain[0], ConvertYUVToRGB)
                    or fr.chain[0] != conv
                    or fr.read.pixel_format != f0.read.pixel_format
                    or fr.read.buffer.shape != f0.read.buffer.shape):
                return None
            bufs.append(fr.read.buffer)
        rows, sw = (int(x) for x in f0.read.buffer.shape)
        sh = rows * 2 // 3
        if d0 is None:
            h_out, w_out = sh, sw
        else:
            h_out, w_out = d0.height, d0.width
        chain = _flat_chain(seq.compute)
        if chain is None:
            return None
        if not isinstance(seq.write, (TensorWrite, Write2D)):
            return None
        return dict(src=jnp.stack(bufs), kind="nv12", asc=True, chain=chain,
                    read=read, pshape=(h_out, w_out, 3), packed=0,
                    sshape=(rows, sw, 1), conv=conv,
                    pixel_format=f0.read.pixel_format, nv_src=(sh, sw))
    else:
        return None
    if packed:
        # packed ingestion: (N, H, W*C) — already the kernel's interleaved
        # lane layout, no per-call relayout
        if src.ndim != 3:
            return None
        pshape = (int(src.shape[1]), int(src.shape[2]) // packed, packed)
    else:
        if src.ndim != 4:
            return None
        pshape = tuple(int(d) for d in src.shape[1:])
    chain = _flat_chain(seq.compute)
    if chain is None:
        return None
    if not isinstance(seq.write, (TensorWrite, Write2D)):
        return None
    return dict(src=src, kind=kind, asc=asc, chain=chain, read=read,
                pshape=pshape, packed=packed, sshape=pshape)


#: caps for the divergent warp group's exact static candidate counts (the
#: bake measures the TRUE per-tile spans — no derivative buckets — and the
#: group falls back to the XLA merge beyond these)
_WARP_MAX_HG = 20
_WARP_MAX_SV = 40
_WARP_R = 8


def _warp_seq_info(seq, read):
    """Warp group: a ``BatchRead`` of per-plane WarpReads with STATIC
    (concrete) matrices — the reference's arbitrary per-plane routing with
    warp sequences (``tests/batchread/test_circularbatchread_x_write3D.cu:
    147-156``; warp overloads ``include/cvGPUSpeedup.cuh:285-442``). The
    matrices being static, the ENTIRE candidate/select structure of the
    universal warp kernel (exec.pallas_warp_universal) is baked host-side:
    exact per-tile one-hot lane/row maps, select indices, fractions and
    border masks — no coordinate math and no derivative buckets in-kernel.
    Static matrices are part of the compile key (see ``static_key``)."""
    from ..ops.warp import WarpRead

    subs = read.ops
    if not subs or not all(isinstance(w, WarpRead) for w in subs):
        return None
    w0 = subs[0]
    geom = None
    for wr in subs:
        if wr.dsize != w0.dsize or wr.warp_type != w0.warp_type:
            return None
        s = wr.source
        if not isinstance(s, ImageRead) or s.is_batch:
            return None
        d = s.data
        pc = s.packed_channels
        if pc:
            g = (int(d.shape[0]), int(d.shape[1]) // pc, pc)
        elif d.ndim == 3:
            g = tuple(int(v) for v in d.shape)
        else:
            return None
        if geom is None:
            geom = g
        elif g != geom:
            return None
        if jnp.dtype(d.dtype) != jnp.dtype(jnp.uint8):
            return None  # exact one-hot bf16 gathers need u8 sources
    sh, sw, c = geom
    if sh % 8 or (sw * c) % 128:
        return None
    chain = _flat_chain(seq.compute)
    if chain is None:
        return None
    if not isinstance(seq.write, (TensorWrite, Write2D)):
        return None
    dst_h, dst_w = w0.dsize.height, w0.dsize.width
    if dst_h % _WARP_R:
        return None
    return dict(src=None, kind="warp", asc=True, chain=chain, read=read,
                warps=tuple(subs), pshape=(dst_h, dst_w, c), packed=0,
                sshape=(sh, sw, c))


def _bake_warp_group(info, n: int):
    """Exact static bake of a warp group's candidate/select structure.

    Mirrors the XLA path's f32 coordinate shapes (``decompose_inverse_map``
    + ``WarpRead.lower``: per-axis f32 term products, then one f32 add per
    element) so the gathered taps and lerp fractions agree with the XLA
    lowering bit-for-bit. Returns a dict of stacked (n, ...) numpy arrays
    (plane-indexed by the kernel's BlockSpec) or None when the exact
    candidate counts exceed the caps."""
    from ..ops.warp import WarpType

    sh, sw, c = info["sshape"]
    dst_h, dst_w, _ = info["pshape"]
    R = _WARP_R
    T = dst_w  # full-width strips: tile cols stay whole-row interleaved
    n_bands = dst_h // R
    n_tiles = n_bands
    tn = T * c
    persp = info["warps"][0].warp_type == WarpType.PERSPECTIVE

    per = []
    hg_need, sv_need = 0, 0
    for wr in info["warps"]:
        cf = np.asarray(wr.coeffs, np.float32)
        xs = np.arange(dst_w, dtype=np.float32)
        ys = np.arange(dst_h, dtype=np.float32)
        col_x = cf[0] * xs
        row_x = cf[1] * ys + cf[2]
        col_y = cf[3] * xs
        row_y = cf[4] * ys + cf[5]
        sx = col_x[None, :] + row_x[:, None]
        sy = col_y[None, :] + row_y[:, None]
        if persp:
            col_w = cf[6] * xs
            row_w = cf[7] * ys + cf[8]
            den = col_w[None, :] + row_w[:, None]
            den = np.where(den == 0.0, np.float32(1.0), den)
            sx = (sx / den).astype(np.float32)
            sy = (sy / den).astype(np.float32)
        ixf = np.floor(sx)
        fx = (sx - ixf).astype(np.float32)
        ixi = ixf.astype(np.int64)
        iyf = np.floor(sy)
        fy = (sy - iyf).astype(np.float32)
        iyi = iyf.astype(np.int64)
        vx0 = ((ixi >= 0) & (ixi < sw)).astype(np.float32)
        vx1 = ((ixi + 1 >= 0) & (ixi + 1 < sw)).astype(np.float32)
        vyt = ((iyi >= 0) & (iyi < sh)).astype(np.float32)
        vyb = ((iyi + 1 >= 0) & (iyi + 1 < sh)).astype(np.float32)
        stairs, kbs, hss, sss = [], [], [], []
        for b in range(n_bands):
            rows = slice(b * R, (b + 1) * R)
            stair = ixi[rows].min(axis=0)          # (T,) per-column base
            kb = iyi[rows].min(axis=1)             # (R,) per-row base
            hs = ixi[rows] - stair[None, :]        # (R, T) >= 0
            ss = iyi[rows] - kb[:, None]           # (R, T) >= 0
            hg_need = max(hg_need, int(hs.max()) + 2)
            sv_need = max(sv_need, int(ss.max()) + 2)
            stairs.append(stair)
            kbs.append(kb)
            hss.append(hs)
            sss.append(ss)
        per.append(dict(stairs=stairs, kbs=kbs, hss=hss, sss=sss,
                        fx=fx, fy=fy, m00=vx0 * vyt, m01=vx1 * vyt,
                        m10=vx0 * vyb, m11=vx1 * vyb,
                        default=np.asarray(wr.default, np.float32)))
    if hg_need > _WARP_MAX_HG or sv_need > _WARP_MAX_SV:
        return None
    n_hg, n_sv = hg_need, sv_need
    ch_cols = n_hg * tn
    # REAL per-step VMEM footprint with the exact candidate counts (the
    # plan-time check used minimal ones): window ring + one plane's baked
    # maps + the d_raw/d_all transients
    real_vmem = (2 * sh * sw * c
                 + n_tiles * (ch_cols + n_sv * R) * 4
                 + 8 * dst_h * tn * 4
                 + sh * ch_cols * 4
                 + n_sv * R * ch_cols * 4)
    if real_vmem > 10 * 1024 * 1024:
        return None

    def expand(a2d):  # (dst_h, dst_w) -> tile-major (n_tiles, R, tn)
        out = np.empty((n_tiles, R, tn), a2d.dtype)
        for b in range(n_bands):
            out[b] = np.repeat(a2d[b * R:(b + 1) * R], c, axis=1)
        return out

    lt = np.full((n, n_tiles, ch_cols), -1, np.int32)
    kk = np.full((n, n_tiles, n_sv * R), sh, np.int32)
    hs_a = np.zeros((n, n_tiles, R, tn), np.int32)
    ss_a = np.zeros((n, n_tiles, R, tn), np.int32)
    fx_a = np.zeros((n, n_tiles, R, tn), np.float32)
    fy_a = np.zeros((n, n_tiles, R, tn), np.float32)
    masks = {m: np.zeros((n, n_tiles, R, tn), np.float32)
             for m in ("m00", "m01", "m10", "m11")}
    # (n, 1, tn): Mosaic requires the last TWO block dims to be (8,128)-
    # divisible or full — a (n, tn) array plane-blocked to (1, tn) puts the
    # plane axis second-to-last and fails to lower (chip-only error;
    # interpret mode accepts it)
    border = np.zeros((n, 1, tn), np.float32)
    src_lanes = sw * c
    jcol = np.arange(ch_cols)
    hp = jcol // tn
    xr = (jcol % tn) // c
    cch = jcol % c
    for z, p in enumerate(per):
        bvec = p["default"].reshape(-1)
        if bvec.size != c:
            bvec = np.broadcast_to(bvec[:1], (c,))
        border[z, 0] = np.tile(bvec, T)
        for b in range(n_bands):
            # one-hot H gather lanes: candidate pixel stair[x]+hp, channel c
            lane = (p["stairs"][b][xr] + hp) * c + cch
            lane = np.where((lane >= 0) & (lane < src_lanes), lane, -1)
            lt[z, b] = lane.astype(np.int32)
            # candidate source rows kb[r] + s (absolute; out of range -> sh
            # sentinel = one-hot miss, masked by vyt/vyb)
            s_of = np.arange(n_sv * R) // R
            r_of = np.arange(n_sv * R) % R
            krow = p["kbs"][b][r_of] + s_of
            kk[z, b] = np.where((krow >= 0) & (krow < sh), krow,
                                sh).astype(np.int32)
        hs_a[z] = expand(np.concatenate(
            [p["hss"][b] for b in range(n_bands)]).astype(np.int32)
            .reshape(dst_h, dst_w))
        ss_a[z] = expand(np.concatenate(
            [p["sss"][b] for b in range(n_bands)]).astype(np.int32)
            .reshape(dst_h, dst_w))
        fx_a[z] = expand(p["fx"])
        fy_a[z] = expand(p["fy"])
        for m in masks:
            masks[m][z] = expand(p[m])
    return dict(n_hg=n_hg, n_sv=n_sv, R=R, T=T, n_bands=n_bands,
                n_tiles=n_tiles, tn=tn, ch_cols=ch_cols, lt=lt, kk=kk,
                hs=hs_a, ss=ss_a, fx=fx_a, fy=fy_a, border=border, **masks)


def static_key(seqs, plane_ids):
    """Hashable digest of the STATIC bake inputs (warp matrices/defaults):
    the divergent compile cache keys on pipeline STRUCTURE (treedef), but a
    warp group's matrices are baked into the kernel — different matrices
    must not reuse a cached program."""
    parts = []
    for seq in seqs:
        read = seq.read
        if isinstance(read, BatchRead) and read.ops:
            from ..ops.warp import WarpRead

            for wr in read.ops:
                if isinstance(wr, WarpRead) and not isinstance(
                        wr.coeffs, jax.core.Tracer):
                    parts.append(np.asarray(wr.coeffs, np.float32).tobytes())
                    if not isinstance(wr.default, jax.core.Tracer):
                        parts.append(
                            np.asarray(wr.default, np.float32).tobytes())
    return tuple(parts)


_PREBAKE_CACHE: dict = {}


def prebake(seqs, plane_ids):
    """Host-side bake of every warp group's static structure (runs OUTSIDE
    jit, where the matrices are concrete). Returns {group_index: bake}
    (empty when no warp group) or None when a group's exact candidate
    counts exceed the caps — the caller must then fall back to XLA.

    Memoized on the matrix bytes (the same key the compile cache uses):
    the hot path calls the launcher per frame, and re-baking several MB of
    numpy maps per call would dwarf the dispatch budget. Traced matrices
    (a caller's own jit) return None uncached — the XLA fallback handles
    them, as before warp groups existed."""
    infos = _plan(seqs, plane_ids)
    if infos is None:
        return {}
    if not any(info["kind"] == "warp" for info in infos):
        return {}
    key = (static_key(seqs, plane_ids), tuple(plane_ids))
    if key in _PREBAKE_CACHE:
        return _PREBAKE_CACHE[key]
    out = {}
    try:
        for gi, info in enumerate(infos):
            if info["kind"] == "warp":
                bake = _bake_warp_group(info, len(plane_ids))
                if bake is None:
                    out = None  # exceeds caps -> caller falls back to XLA
                    break
                out[gi] = bake
    except jax.errors.TracerArrayConversionError:
        return None  # traced matrices: uncached, XLA fallback
    _PREBAKE_CACHE[key] = out
    return out


def _bake_nv12(info, h_out: int, w_out: int):
    """Baked plane-space matrices for an NV12 divergent group.

    Vertical: exact axis_lerp taps for Y; the same full-resolution taps
    mapped to half rows (nearest 2x chroma upsample commutes with the
    linear resample) for the interleaved-UV rows. Horizontal: the bilinear
    taps SCALED by the YUV->RGB affine coefficients per output channel —
    the conversion costs nothing at runtime (channel-major-free: output
    lanes are interleaved 3x+c)."""
    conv: ConvertYUVToRGB = info["conv"]
    sh, sw = info["nv_src"]
    kr, kb = _KR_KB[conv.standard]
    kg = 1.0 - kr - kb
    a_y = 255.0 / 219.0 if conv.color_range == ColorRange.LIMITED else 1.0
    s_c = 255.0 / 224.0 if conv.color_range == ColorRange.LIMITED else 1.0
    bu = np.array([0.0, -2.0 * kb * (1.0 - kb) / kg, 2.0 * (1.0 - kb)]) * s_c
    cv_ = np.array([2.0 * (1.0 - kr), -2.0 * kr * (1.0 - kr) / kg, 0.0]) * s_c
    d_off = (-16.0 * a_y if conv.color_range == ColorRange.LIMITED else 0.0)
    d_c = d_off - 128.0 * (bu + cv_)

    rows_i = np.arange(h_out)
    iy0, iy1, wy = axis_lerp_np(rows_i.astype(np.int64), sh, h_out)
    wv_y = np.zeros((h_out, sh), np.float32)
    np.add.at(wv_y, (rows_i, iy0), (1.0 - wy).astype(np.float32))
    np.add.at(wv_y, (rows_i, iy1), wy.astype(np.float32))
    wv_uv = np.zeros((h_out, sh // 2), np.float32)
    np.add.at(wv_uv, (rows_i, iy0 // 2), (1.0 - wy).astype(np.float32))
    np.add.at(wv_uv, (rows_i, iy1 // 2), wy.astype(np.float32))

    ix0, ix1, wx = axis_lerp_np(np.arange(w_out, dtype=np.int64), sw, w_out)
    lam = np.arange(3 * w_out)
    xs, chs = lam // 3, lam % 3
    h_y = np.zeros((sw, 3 * w_out), np.float32)
    np.add.at(h_y, (ix0[xs], lam), ((1.0 - wx)[xs] * a_y).astype(np.float32))
    np.add.at(h_y, (ix1[xs], lam), (wx[xs] * a_y).astype(np.float32))
    m_u, m_v = (1, 0) if info["pixel_format"] == PixelFormat.NV21 else (0, 1)
    h_uv = np.zeros((sw, 3 * w_out), np.float32)
    for ix, w_ in ((ix0, 1.0 - wx), (ix1, wx)):
        np.add.at(h_uv, (2 * (ix[xs] // 2) + m_u, lam),
                  (w_[xs] * bu[chs]).astype(np.float32))
        np.add.at(h_uv, (2 * (ix[xs] // 2) + m_v, lam),
                  (w_[xs] * cv_[chs]).astype(np.float32))
    delta = d_c[chs].astype(np.float32).reshape(1, 3 * w_out)
    return (jnp.asarray(wv_y), jnp.asarray(wv_uv), jnp.asarray(h_y),
            jnp.asarray(h_uv), jnp.asarray(delta))


def _plan(seqs: Sequence, plane_ids, *, allow_pad: bool = True) -> Optional[list]:
    n = len(plane_ids)
    infos = []
    shape0 = None
    dtype0 = None
    out_dt = None
    for seq in seqs:
        info = _seq_info(seq)
        if info is None:
            return None
        pshape = info["pshape"]
        odt = _chain_out_dtype(info["chain"])
        if shape0 is None:
            shape0, out_dt = pshape, odt
        elif pshape != shape0 or odt != out_dt:
            return None
        if info["kind"] == "warp":
            if len(info["warps"]) != n:
                return None
            infos.append(info)
            continue
        s = info["src"]
        sdt = jnp.dtype(s.dtype)
        if sdt not in (jnp.dtype(jnp.uint8), jnp.dtype(jnp.float32)):
            return None
        if info["kind"] in ("image", "resize", "nv12") and int(s.shape[0]) != n:
            return None
        if info["kind"] == "crop_resize" and info["read"].num_planes != n:
            return None
        infos.append(info)
    h, w, c = shape0
    # output lanes are always the FULL minor dim of the (1, h, w*c) block —
    # legal at any width (the 128-divisibility rule binds partial slices);
    # only the row count needs the sublane grain
    if h % 8:
        return None
    if jnp.dtype(out_dt).itemsize > 4:
        return None
    vmem = 0
    for info in infos:
        sh, sw, sc = info["sshape"]
        if info["kind"] == "warp":
            # plan-time estimate uses the MINIMAL candidate counts (2): the
            # true n_hg/n_sv are only known after the bake, which re-checks
            # the real footprint (_bake_warp_group returns None when over,
            # and the caller falls back to XLA)
            tn = w * c
            vmem += (2 * sh * sw * sc
                     + (h // _WARP_R) * (2 * tn + 2 * _WARP_R) * 4
                     + 8 * h * tn * 4
                     + sh * 2 * tn * 4)
            continue
        # whole-plane window DMAs slice only the leading (plane) axis — full
        # minor dims at any lane width keep whole HBM tiles, so only the
        # sublane grain binds; crop_resize windows slice lanes PARTIALLY,
        # but their 128-alignment is guaranteed by _window_geometry. NV12
        # keeps the 128-lane gate: its in-kernel interleaved-UV row split
        # was chip-validated on aligned buffers only.
        if sh % 8:
            return None
        if info["kind"] == "nv12" and (sw * sc) % 128:
            return None
        if (not allow_pad and info["kind"] in ("image", "circ", "resize")
                and (sw * sc) % 128):
            # lane-padding an unaligned whole-plane stack is a full extra
            # HBM copy of the source per launch (the relayout class the
            # project gotchas flag) — under AUTO, prefer the XLA merge; an
            # explicit PALLAS request keeps the (correct) padded path
            return None
        vmem += 2 * sh * sw * sc * jnp.dtype(info["src"].dtype).itemsize
        if info["kind"] == "resize":
            # baked interpolation matrices live in VMEM for the launch
            vmem += (h * sh + sw * sc * w * c) * 4
        elif info["kind"] == "crop_resize":
            geo = info["geo"]
            # phase-stacked V matrix + interleaved H matrix + widened window
            vmem += (info["n_dy"] * h * geo["win_h"]
                     + geo["core_w"] * c * w * c
                     + geo["win_h"] * info["lanes_alloc"]) * 4
        elif info["kind"] == "nv12":
            luma_h = info["nv_src"][0]
            vmem += (h * (luma_h + luma_h // 2)
                     + 2 * sw * w * c + w * c) * 4
    if vmem > 10 * 1024 * 1024:
        return None
    for info in infos:
        for leaf in jax.tree_util.tree_leaves(tuple(info["chain"])):
            shp = jnp.shape(leaf)
            if len(shp) > 1 or (shp and shp[0] not in (1, c)):
                return None
            if jnp.result_type(leaf) != jnp.float32:
                return None
        # the kernel widens integer sources to f32 up front, so it cannot
        # reproduce the per-op INTEGER saturation semantics of arithmetic
        # applied at an integer dtype — require every binary op to run in
        # the float domain (a preceding cast, a float source, or a resize
        # read, whose output is float by contract)
        cur = (jnp.dtype(jnp.float32)
               if info["kind"] in ("resize", "nv12", "warp")
               else jnp.dtype(info["src"].dtype))
        for op_ in info["chain"]:
            if isinstance(op_, (Cast, SaturateCast)):
                cur = jnp.dtype(op_.dst)
            elif isinstance(op_, _BinaryWithScalar):
                if dt.is_integer(cur):
                    return None
    return infos


def supports(seqs, plane_ids, *, allow_pad: bool = True) -> bool:
    return _plan(seqs, plane_ids, allow_pad=allow_pad) is not None


def try_lower(seqs, plane_ids, *, interpret: bool = False, prebaked=None,
              gids=None):
    """``prebaked``: warp-group bake from :func:`prebake` — required when
    called inside a jit trace (the matrices are tracers there); a direct
    call with concrete matrices bakes on the fly.

    ``gids``: optional RUNTIME (n,) i32 plane->sequence-id array overriding
    the static ``plane_ids`` VALUES (their length still fixes the plane
    count). The kernel reads ids via scalar prefetch, so sharded callers
    pass each shard's slice of the global routing without recompiling
    (``parallel.mesh.execute_divergent_sharded``)."""
    infos = _plan(seqs, plane_ids)
    if infos is None:
        return None
    warp_gis = [gi for gi, i in enumerate(infos) if i["kind"] == "warp"]
    if warp_gis:
        if prebaked is None:
            try:
                prebaked = {
                    gi: _bake_warp_group(infos[gi], len(plane_ids))
                    for gi in warp_gis
                }
            except jax.errors.TracerArrayConversionError:
                return None  # traced matrices without a prebake
        if any(prebaked.get(gi) is None for gi in warp_gis):
            return None  # exact candidate counts exceeded the caps
    return _emit(tuple(plane_ids), infos, interpret=interpret,
                 prebaked=prebaked, gids=gids)


def _emit(plane_ids, infos, *, interpret: bool, prebaked=None, gids=None):
    n = len(plane_ids)
    h, w, c = infos[0]["pshape"]
    lanes = w * c
    out_dtype = jnp.dtype(_chain_out_dtype(infos[0]["chain"]))

    # 1-based group per plane; a runtime override (sharded callers) rides
    # the same scalar-prefetch slot
    gids = (np.asarray(plane_ids, np.int32) if gids is None
            else jnp.asarray(gids, jnp.int32))
    firsts = jnp.stack(
        [
            jnp.asarray(info["read"].first, jnp.int32).reshape(())
            if info["kind"] == "circ"
            else jnp.int32(0)
            for info in infos
        ]
    )
    # per-plane crop positions for crop_resize groups (runtime scalar
    # prefetch: rect jitter reuses the compiled kernel)
    rects_all = jnp.stack(
        [
            jnp.asarray(info["read"].rects, jnp.int32)[:, :2]
            if info["kind"] == "crop_resize"
            else jnp.zeros((n, 2), jnp.int32)
            for info in infos
        ]
    )

    # chain runtime leaves: one packed f32 prefetch array across sequences
    seq_meta = []
    all_leaves: List = []
    pos = 0
    for info in infos:
        leaves, treedef = jax.tree_util.tree_flatten(tuple(info["chain"]))
        shapes = [jnp.shape(l) for l in leaves]
        sizes = [1 if s == () else int(s[0]) for s in shapes]
        offsets = []
        for sz in sizes:
            offsets.append(pos)
            pos += sz
        seq_meta.append((treedef, shapes, sizes, offsets))
        all_leaves.extend(leaves)
    if all_leaves:
        fparams = jnp.concatenate(
            [jnp.asarray(l, jnp.float32).reshape(-1) for l in all_leaves]
        )
    else:
        fparams = jnp.zeros((1,), jnp.float32)

    srcs = []
    src_lanes_real: List[int] = []
    for info in infos:
        sh, sw, sc = info["sshape"]
        if info["kind"] == "warp":
            # per-plane warp sources stacked to one (n, sh, sw*c) input
            # (lane-aligned by the _warp_seq_info gate — no padding)
            views = []
            for wr in info["warps"]:
                d = wr.source.data
                views.append(jnp.asarray(d) if wr.source.packed_channels
                             else jnp.reshape(jnp.asarray(d), (sh, sw * sc)))
            info["src"] = jnp.stack(views)
            srcs.append(info["src"])
            src_lanes_real.append(sw * sc)
            continue
        if info["kind"] == "crop_resize":
            # 2-D lane view of the shared frame (packed ingestion is free on
            # the host; an on-device (H,W,C) frame pays one relayout here)
            geo = info["geo"]
            src = info["src"]
            srcs.append(
                src if src.ndim == 2
                else jnp.reshape(src, (geo["src_h"], geo["src_lanes"]))
            )
            src_lanes_real.append(geo["src_lanes"])
            continue
        s3 = (info["src"] if info["packed"]
              else jnp.reshape(info["src"],
                               (int(info["src"].shape[0]), sh, sw * sc)))
        # Mosaic rejects whole-plane HBM DMA slices whose lane count is not
        # a 128 multiple (the physical buffer is tile-padded; the slice must
        # match the tiling) — chip-verified, interpret mode accepts it. Pad
        # the lane axis and value-slice back after the window load.
        pad = (-sw * sc) % 128
        if pad:
            s3 = jnp.pad(s3, ((0, 0), (0, 0), (0, pad)))
        srcs.append(s3)
        src_lanes_real.append(sw * sc)

    # baked whole-plane interpolation matrices for resize groups (static
    # geometry: exact rational axis_lerp weights; the H matrix maps
    # interleaved source lanes to interleaved output lanes so the kernel
    # stays channel-interleaved end to end)
    bake_inputs: List = []
    bake_specs: List = []
    bake_idx: List[Optional[int]] = []
    def _const_spec(mat):
        nd = len(mat.shape)
        return pl.BlockSpec(mat.shape, lambda z, *_, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    for gi, info in enumerate(infos):
        if info["kind"] == "warp":
            # plane-indexed baked arrays (BlockSpec slices the CURRENT
            # plane's maps, so VMEM holds one plane's bake per step)
            bk = prebaked[gi]
            info["_bake_meta"] = dict(
                n_hg=bk["n_hg"], n_sv=bk["n_sv"], R=bk["R"],
                n_bands=bk["n_bands"], tn=bk["tn"], ch_cols=bk["ch_cols"],
            )
            bake_idx.append(len(bake_inputs))
            for name in ("lt", "kk", "hs", "ss", "fx", "fy",
                         "m00", "m01", "m10", "m11", "border"):
                ja = jnp.asarray(bk[name])
                nd = ja.ndim
                bake_inputs.append(ja)
                bake_specs.append(pl.BlockSpec(
                    (1,) + ja.shape[1:],
                    lambda z, *_, _nd=nd: (z,) + (0,) * (_nd - 1),
                    memory_space=pltpu.VMEM,
                ))
            continue
        if info["kind"] == "nv12":
            bake_idx.append(len(bake_inputs))
            for mat in _bake_nv12(info, h, w):
                bake_inputs.append(mat)
                bake_specs.append(_const_spec(mat))
            continue
        if info["kind"] == "crop_resize":
            # phase-stacked exact V taps (window row = crop row + dy
            # residual of the 8-aligned DMA start) + interleaved-lane H taps
            geo = info["geo"]
            crop_w, crop_h = (int(v) for v in info["read"].uniform_wh)
            win_h, core_w = geo["win_h"], geo["core_w"]
            iy0, iy1, wy = axis_lerp_np(np.arange(h, dtype=np.int64),
                                        crop_h, h)
            wv = np.zeros((info["n_dy"], h, win_h), np.float32)
            for dy in range(info["n_dy"]):
                np.add.at(wv[dy], (np.arange(h), iy0 + dy),
                          (1.0 - wy).astype(np.float32))
                np.add.at(wv[dy], (np.arange(h), iy1 + dy),
                          wy.astype(np.float32))
            ix0, ix1, wx = axis_lerp_np(np.arange(w, dtype=np.int64),
                                        crop_w, w)
            wh_m = np.zeros((core_w * c, lanes), np.float32)
            lam = np.arange(lanes)
            xs, chs = lam // c, lam % c
            np.add.at(wh_m, (ix0[xs] * c + chs, lam),
                      (1.0 - wx)[xs].astype(np.float32))
            np.add.at(wh_m, (ix1[xs] * c + chs, lam),
                      wx[xs].astype(np.float32))
            bake_idx.append(len(bake_inputs))
            for mat in (jnp.asarray(wv), jnp.asarray(wh_m)):
                bake_inputs.append(mat)
                bake_specs.append(_const_spec(mat))
            continue
        if info["kind"] != "resize":
            bake_idx.append(None)
            continue
        sh, sw, sc = info["sshape"]
        iy0, iy1, wy = axis_lerp_np(np.arange(h, dtype=np.int64), sh, h)
        wv = np.zeros((h, sh), np.float32)
        np.add.at(wv, (np.arange(h), iy0), (1.0 - wy).astype(np.float32))
        np.add.at(wv, (np.arange(h), iy1), wy.astype(np.float32))
        ix0, ix1, wx = axis_lerp_np(np.arange(w, dtype=np.int64), sw, w)
        wh_m = np.zeros((sw * sc, lanes), np.float32)
        lam = np.arange(lanes)
        xs, chs = lam // c, lam % c
        np.add.at(wh_m, (ix0[xs] * sc + chs, lam), (1.0 - wx)[xs].astype(np.float32))
        np.add.at(wh_m, (ix1[xs] * sc + chs, lam), wx[xs].astype(np.float32))
        bake_idx.append(len(bake_inputs))
        for mat in (jnp.asarray(wv), jnp.asarray(wh_m)):
            bake_inputs.append(mat)
            bake_specs.append(_const_spec(mat))

    # the kernel computes interleaved (h, lanes) rows; Mosaic cannot shape-
    # cast (h, w*c) -> (h, w, c) in-kernel (hardware rejects the tpu.reshape
    # that interpret mode accepted), so the lane split happens AFTER the
    # pallas call — XLA folds it into the output layout
    out_shape = jax.ShapeDtypeStruct((n, h, lanes), out_dtype)
    out_spec = pl.BlockSpec((1, h, lanes), lambda z, *_: (z, 0, 0))

    def kernel(gid_ref, first_ref, rects_ref, fp_ref, *rest):
        src_refs = rest[: len(srcs)]
        bake_refs = rest[len(srcs) : len(srcs) + len(bake_inputs)]
        base = len(srcs) + len(bake_inputs)
        out_ref = rest[base]
        windows = rest[base + 1 : base + 1 + len(srcs)]
        sem = rest[base + 1 + len(srcs)]

        z = pl.program_id(0)

        def crop_copy(gi, info, zz, slot):
            """Async copy descriptor for a crop_resize plane: dynamic
            window at the plane's rect, 8-row/128-lane aligned starts
            (residuals removed in the body like the flagship kernel)."""
            geo = info["geo"]
            la = info["lanes_alloc"]
            xl = rects_ref[gi, zz, 0] * c
            y0 = rects_ref[gi, zz, 1]
            ys = jnp.minimum((y0 // 8) * 8, geo["src_h"] - geo["win_h"])
            xs_l = jnp.minimum(
                (xl // 128) * 128, geo["src_lanes"] - geo["lanes"]
            )
            dst = (
                windows[gi].at[slot, :, pl.ds(0, geo["lanes"])]
                if la != geo["lanes"] else windows[gi].at[slot]
            )
            return pltpu.make_async_copy(
                src_refs[gi].at[
                    pl.ds(pl.multiple_of(ys, 8), geo["win_h"]),
                    pl.ds(pl.multiple_of(xs_l, 128), geo["lanes"]),
                ],
                dst, sem.at[gi, slot],
            )

        def start_dma(zz, slot):
            for gi, info in enumerate(infos):
                ring_n = int(info["src"].shape[0])

                @pl.when(gid_ref[zz] == gi + 1)
                def _(gi=gi, info=info, ring_n=ring_n):
                    if info["kind"] == "crop_resize":
                        crop_copy(gi, info, zz, slot).start()
                        return
                    if info["kind"] == "image":
                        idx = zz
                    elif info["asc"]:
                        idx = (first_ref[gi] + zz) % ring_n
                    else:
                        idx = (first_ref[gi] - zz) % ring_n
                    pltpu.make_async_copy(
                        src_refs[gi].at[idx], windows[gi].at[slot],
                        sem.at[gi, slot],
                    ).start()

        @pl.when(z == 0)
        def _():
            start_dma(0, 0)

        @pl.when(z + 1 < n)
        def _():
            start_dma(z + 1, (z + 1) % 2)

        lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1) % c

        def run_chain(gi, x):
            """Apply sequence gi's chain on the INTERLEAVED (H, W*C) value.
            Per-channel vector parameters become periodic lane-coefficient
            rows; the saturating integer semantics of _BinaryWithScalar are
            replicated verbatim (its apply() only handles channel-last
            rank-1 parameters)."""
            _, shapes, sizes, offsets = seq_meta[gi]
            li = 0
            for op_ in infos[gi]["chain"]:
                if isinstance(op_, _BinaryWithScalar):
                    size, off = sizes[li], offsets[li]
                    li += 1
                    if size == 1:
                        v = fp_ref[off]
                    else:
                        # per-channel vector -> periodic lane-coefficient row
                        v = jnp.where(lane_c == 0, fp_ref[off], 0.0)
                        for ci in range(1, size):
                            v = jnp.where(lane_c == ci, fp_ref[off + ci], v)
                    if dt.is_integer(x.dtype):
                        y = op_._combine(x.astype(jnp.float32), v)
                        x = dt.saturate_cast(y, x.dtype)
                    else:
                        x = op_._combine(x, v)
                else:
                    x = op_.apply(x)
            return x

        for gi in range(len(infos)):
            @pl.when(gid_ref[z] == gi + 1)
            def _(gi=gi):
                hp = jax.lax.Precision.HIGHEST
                _DEF = jax.lax.Precision.DEFAULT
                dn = (((1,), (0,)), ((), ()))
                if infos[gi]["kind"] == "crop_resize":
                    info = infos[gi]
                    geo = info["geo"]
                    crop_copy(gi, info, z, z % 2).wait()
                    xw = windows[gi][z % 2]
                    xl = rects_ref[gi, z, 0] * c
                    y0 = rects_ref[gi, z, 1]
                    dy = y0 - jnp.minimum(
                        (y0 // 8) * 8, geo["src_h"] - geo["win_h"])
                    dlanes = xl - jnp.minimum(
                        (xl // 128) * 128, geo["src_lanes"] - geo["lanes"])
                    # lane-residual rotate on the packed-i32 bitcast view
                    # (4 rows per i32 sublane; pow2 lane count — the legal
                    # traced-roll class), then static core slice + widen
                    if xw.dtype.itemsize == 4:
                        if dt.is_integer(xw.dtype):
                            xw = xw.astype(jnp.int32)
                        xw = pltpu.roll(xw, -dlanes, 1)
                    else:
                        v32 = pltpu.bitcast(xw, jnp.int32)
                        xw = pltpu.bitcast(
                            pltpu.roll(v32, -dlanes, 1), xw.dtype)
                    xw = xw[:, : geo["core_w"] * c]
                    if dt.is_integer(xw.dtype):
                        xw = xw.astype(jnp.int32)
                    xw = xw.astype(jnp.float32)
                    bi = bake_idx[gi]
                    t = jax.lax.dot_general(
                        bake_refs[bi][dy], xw, dn, precision=hp,
                        preferred_element_type=jnp.float32,
                    )  # (h, core_w*c)
                    x = jax.lax.dot_general(
                        t, bake_refs[bi + 1][...], dn, precision=hp,
                        preferred_element_type=jnp.float32,
                    )  # (h, lanes)
                    x = run_chain(gi, x)
                    out_ref[0] = x.astype(out_dtype)
                    return
                # this plane's copy is the only one targeting this slot
                pltpu.make_async_copy(
                    src_refs[gi].at[0], windows[gi].at[z % 2], sem.at[gi, z % 2]
                ).wait()
                if infos[gi]["kind"] == "warp":
                    # STATIC-matrix warp plane: the universal warp kernel's
                    # one-hot gather + double-select structure with every
                    # index/fraction/mask map BAKED host-side (exact f32
                    # coordinate math mirroring WarpRead.lower — parity is
                    # 1-ulp-of-coordinate class vs the XLA path)
                    meta = infos[gi]["_bake_meta"]
                    bi = bake_idx[gi]
                    (lt_r, kk_r, hs_r, ss_r, fx_r, fy_r, m00_r, m01_r,
                     m10_r, m11_r, bor_r) = bake_refs[bi : bi + 11]
                    n_hg, n_sv = meta["n_hg"], meta["n_sv"]
                    Rw, tn = meta["R"], meta["tn"]
                    ch_cols = meta["ch_cols"]
                    sh_w = infos[gi]["sshape"][0]
                    raw = windows[gi][z % 2][:, : src_lanes_real[gi]]
                    # u8 -> bf16 exact (no direct u8->bf16 in Mosaic)
                    win_f = raw.astype(jnp.int32).astype(jnp.bfloat16)
                    lrow = jax.lax.broadcasted_iota(
                        jnp.int32, (src_lanes_real[gi], 1), 0)
                    bor = bor_r[0, 0].reshape(1, tn)
                    rows_out = []
                    for b in range(meta["n_bands"]):
                        lane_t = lt_r[0, b].reshape(1, ch_cols)
                        gmat = (lrow == lane_t).astype(jnp.bfloat16)
                        d_raw = jax.lax.dot_general(
                            win_f, gmat, dn, precision=_DEF,
                            preferred_element_type=jnp.float32,
                        )  # (sh, ch_cols): exact u8 taps
                        kkv = kk_r[0, b].reshape(n_sv * Rw, 1)
                        kio = jax.lax.broadcasted_iota(
                            jnp.int32, (n_sv * Rw, sh_w), 1)
                        gv = (kio == kkv).astype(jnp.bfloat16)
                        d_all = jax.lax.dot_general(
                            gv, d_raw, dn, precision=_DEF,
                            preferred_element_type=jnp.float32,
                        )  # (n_sv*Rw, ch_cols)
                        hs = hs_r[0, b]
                        ss = ss_r[0, b]
                        v00 = jnp.zeros((Rw, tn), jnp.float32)
                        v01 = jnp.zeros((Rw, tn), jnp.float32)
                        v10 = jnp.zeros((Rw, tn), jnp.float32)
                        v11 = jnp.zeros((Rw, tn), jnp.float32)
                        for hc in range(n_hg - 1):
                            bh = hs == hc
                            lo_c, hi_c = hc * tn, (hc + 1) * tn
                            for sc_ in range(n_sv - 1):
                                mm = bh & (ss == sc_)
                                top = d_all[sc_ * Rw : (sc_ + 1) * Rw]
                                bot = d_all[(sc_ + 1) * Rw : (sc_ + 2) * Rw]
                                v00 = v00 + jnp.where(
                                    mm, top[:, lo_c:hi_c], 0.0)
                                v01 = v01 + jnp.where(
                                    mm, top[:, hi_c : hi_c + tn], 0.0)
                                v10 = v10 + jnp.where(
                                    mm, bot[:, lo_c:hi_c], 0.0)
                                v11 = v11 + jnp.where(
                                    mm, bot[:, hi_c : hi_c + tn], 0.0)
                        fx = fx_r[0, b]
                        fy = fy_r[0, b]
                        m00 = m00_r[0, b]
                        m01 = m01_r[0, b]
                        m10 = m10_r[0, b]
                        m11 = m11_r[0, b]
                        h0 = ((m00 * v00 + (1.0 - m00) * bor) * (1.0 - fx)
                              + (m01 * v01 + (1.0 - m01) * bor) * fx)
                        h1 = ((m10 * v10 + (1.0 - m10) * bor) * (1.0 - fx)
                              + (m11 * v11 + (1.0 - m11) * bor) * fx)
                        rows_out.append(h0 * (1.0 - fy) + h1 * fy)
                    x = (rows_out[0] if len(rows_out) == 1
                         else jnp.concatenate(rows_out, axis=0))
                    x = run_chain(gi, x)
                    out_ref[0] = x.astype(out_dtype)
                    return
                x = windows[gi][z % 2][:, : src_lanes_real[gi]]
                if dt.is_integer(x.dtype) and x.dtype.itemsize == 1:
                    x = x.astype(jnp.int32)
                x = x.astype(jnp.float32)
                if infos[gi]["kind"] == "resize":
                    bi = bake_idx[gi]
                    x = jax.lax.dot_general(
                        bake_refs[bi][...], x, dn, precision=hp,
                        preferred_element_type=jnp.float32,
                    )  # (h, src_lanes)
                    x = jax.lax.dot_general(
                        x, bake_refs[bi + 1][...], dn, precision=hp,
                        preferred_element_type=jnp.float32,
                    )  # (h, lanes)
                elif infos[gi]["kind"] == "nv12":
                    # plane-space NV12: vertical-resize Y and the
                    # interleaved-UV rows separately, then two horizontal
                    # matmuls whose baked matrices CARRY the YUV->RGB affine
                    bi = bake_idx[gi]
                    sh_l = infos[gi]["nv_src"][0]
                    yv = jax.lax.dot_general(
                        bake_refs[bi][...], x[:sh_l], dn, precision=hp,
                        preferred_element_type=jnp.float32,
                    )  # (h, sw)
                    uvv = jax.lax.dot_general(
                        bake_refs[bi + 1][...], x[sh_l:], dn, precision=hp,
                        preferred_element_type=jnp.float32,
                    )  # (h, sw)
                    x = (
                        jax.lax.dot_general(
                            yv, bake_refs[bi + 2][...], dn, precision=hp,
                            preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(
                            uvv, bake_refs[bi + 3][...], dn, precision=hp,
                            preferred_element_type=jnp.float32)
                        + bake_refs[bi + 4][...]
                    )  # (h, 3*w)
                x = run_chain(gi, x)
                out_ref[0] = x.astype(out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM) for _ in srcs]
        + bake_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM(
                (2, info["sshape"][0],
                 info["lanes_alloc"] if info["kind"] == "crop_resize"
                 else -(-(info["sshape"][1] * info["sshape"][2]) // 128) * 128),
                jnp.dtype(info["src"].dtype),
            )
            for info in infos
        ] + [pltpu.SemaphoreType.DMA((len(infos), 2))],
    )

    cost = pl.CostEstimate(
        flops=n * h * lanes * 4,
        bytes_accessed=n * h * lanes * (1 + out_dtype.itemsize),
        transcendentals=0,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=cost,
    )(gids, firsts, rects_all, fparams, *srcs, *bake_inputs)
    return jnp.reshape(out, (n, h, w, c))
