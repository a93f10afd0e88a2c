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
from ..ops.memory import CircularBatchRead, ImageRead, TensorWrite, Write2D
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
    if isinstance(read, ImageRead) and read.is_batch:
        src, kind, asc = read.data, "image", True
        packed = read.packed_channels
    elif isinstance(read, CircularBatchRead):
        src, kind, asc = read.data, "circ", read.ascendent
        packed = read.packed_channels
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
                pshape=pshape, packed=packed)


def _plan(seqs: Sequence, plane_ids) -> Optional[list]:
    n = len(plane_ids)
    infos = []
    shape0 = None
    dtype0 = None
    out_dt = None
    for seq in seqs:
        info = _seq_info(seq)
        if info is None:
            return None
        s = info["src"]
        pshape = info["pshape"]
        sdt = jnp.dtype(s.dtype)
        odt = _chain_out_dtype(info["chain"])
        if shape0 is None:
            shape0, out_dt = pshape, odt
        elif pshape != shape0 or odt != out_dt:
            return None
        if sdt not in (jnp.dtype(jnp.uint8), jnp.dtype(jnp.float32)):
            return None
        if info["kind"] == "image" and int(s.shape[0]) != n:
            return None
        infos.append(info)
    h, w, c = shape0
    if h % 8 or (w * c) % 128:
        return None
    if jnp.dtype(out_dt).itemsize > 4:
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
        # the float domain (a preceding cast, or a float source)
        cur = jnp.dtype(info["src"].dtype)
        for op_ in info["chain"]:
            if isinstance(op_, (Cast, SaturateCast)):
                cur = jnp.dtype(op_.dst)
            elif isinstance(op_, _BinaryWithScalar):
                if dt.is_integer(cur):
                    return None
    return infos


def supports(seqs, plane_ids) -> bool:
    return _plan(seqs, plane_ids) is not None


def try_lower(seqs, plane_ids, *, interpret: bool = False):
    infos = _plan(seqs, plane_ids)
    if infos is None:
        return None
    return _emit(tuple(plane_ids), infos, interpret=interpret)


def _emit(plane_ids, infos, *, interpret: bool):
    n = len(plane_ids)
    h, w, c = infos[0]["pshape"]
    lanes = w * c
    out_dtype = jnp.dtype(_chain_out_dtype(infos[0]["chain"]))

    gids = np.asarray(plane_ids, np.int32)  # 1-based group per plane
    firsts = jnp.stack(
        [
            jnp.asarray(info["read"].first, jnp.int32).reshape(())
            if info["kind"] == "circ"
            else jnp.int32(0)
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

    srcs = [
        info["src"] if info["packed"]
        else jnp.reshape(info["src"], (int(info["src"].shape[0]), h, lanes))
        for info in infos
    ]

    # the kernel computes interleaved (h, lanes) rows; Mosaic cannot shape-
    # cast (h, w*c) -> (h, w, c) in-kernel (hardware rejects the tpu.reshape
    # that interpret mode accepted), so the lane split happens AFTER the
    # pallas call — XLA folds it into the output layout
    out_shape = jax.ShapeDtypeStruct((n, h, lanes), out_dtype)
    out_spec = pl.BlockSpec((1, h, lanes), lambda z, *_: (z, 0, 0))

    def kernel(gid_ref, first_ref, fp_ref, *rest):
        src_refs = rest[: len(srcs)]
        out_ref = rest[len(srcs)]
        windows = rest[len(srcs) + 1 : len(srcs) + 1 + len(srcs)]
        sem = rest[len(srcs) + 1 + len(srcs)]

        z = pl.program_id(0)

        def start_dma(zz, slot):
            for gi, info in enumerate(infos):
                ring_n = int(info["src"].shape[0])

                @pl.when(gid_ref[zz] == gi + 1)
                def _(gi=gi, info=info, ring_n=ring_n):
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
                # this plane's copy is the only one targeting this slot
                pltpu.make_async_copy(
                    src_refs[gi].at[0], windows[gi].at[z % 2], sem.at[gi, z % 2]
                ).wait()
                x = windows[gi][z % 2]
                if dt.is_integer(x.dtype) and x.dtype.itemsize == 1:
                    x = x.astype(jnp.int32)
                x = x.astype(jnp.float32)
                x = run_chain(gi, x)
                out_ref[0] = x.astype(out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM) for _ in srcs],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, h, lanes), jnp.dtype(info["src"].dtype))
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
    )(gids, firsts, fparams, *srcs)
    return jnp.reshape(out, (n, h, w, c))
