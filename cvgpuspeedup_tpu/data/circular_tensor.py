"""CircularTensor — temporal sliding-window state with fused update.

Equivalent of ``fk::CircularTensor<T, COLOR_PLANES, BATCH, CircularTensorOrder,
ColorPlanes>`` (reference F10; wrapper ``include/cvGPUSpeedup.cuh:600-627``;
semantics pinned exactly by
``tests/batchread/test_circularbatchread_x_write3D.cu:176-460``):

- ``update(...)`` runs the per-new-frame preprocessing chain AND the logical
  shift of the other BATCH-1 planes as ONE fused device program — the
  reference does this with a single divergent-batch kernel ("some threads
  normalize the new image, others copy old planes", ``README.md:149-155``);
  here it is one jitted XLA program with the old buffer **donated**, so XLA
  performs the shift in-place in HBM and fuses the new-frame pipeline into the
  same program.
- Ordering semantics (verified in the reference tests): after k updates,
  NEWEST_FIRST plane z holds frame k-z; OLDEST_FIRST plane z holds frame
  k-(BATCH-z-1).
- Layout variants: STANDARD planar (N, C, H, W) (``TensorSplit``),
  TRANSPOSED channel-major (C, N, H, W) (``TensorTSplit``), PACKED
  (N, H, W, C) (``TensorWrite``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import ComputeOp, FusedCompute, IOp, ReadOp, WriteOp
from ..ops.memory import ImageRead, TensorSplit, TensorTSplit, TensorWrite
from ..types import CircularTensorOrder, ColorPlanes

_LAYOUT_FOR_WRITE = {
    TensorSplit: ColorPlanes.STANDARD,
    TensorTSplit: ColorPlanes.TRANSPOSED,
    TensorWrite: ColorPlanes.PACKED,
}


class CircularTensor:
    """A BATCH-deep ring of processed frames on device."""

    def __init__(
        self,
        width: int,
        height: int,
        channels: int,
        batch: int,
        order: CircularTensorOrder = CircularTensorOrder.NEWEST_FIRST,
        planes: ColorPlanes = ColorPlanes.STANDARD,
        dtype=np.float32,
        device=None,
    ):
        self.width = width
        self.height = height
        self.channels = channels
        self.batch = batch
        self.order = order
        self.planes = planes
        self.dtype = jnp.dtype(dtype)
        if planes == ColorPlanes.STANDARD:
            shape = (batch, channels, height, width)
        elif planes == ColorPlanes.TRANSPOSED:
            shape = (channels, batch, height, width)
        else:
            shape = (batch, height, width, channels)
        arr = jnp.zeros(shape, dtype=self.dtype)
        if device is not None:
            arr = jax.device_put(arr, device)
        self._tensor = arr
        self._update_cache = {}

    # reference .ptr()/.tensor access. NOTE: like the reference's .ptr(),
    # this is a LIVE view of the ring: the next update() donates the buffer
    # to XLA for the in-place shift, which invalidates previously returned
    # arrays on devices that honor donation. Use snapshot() to keep a copy
    # across updates.
    @property
    def tensor(self) -> jnp.ndarray:
        return self._tensor

    def snapshot(self) -> jnp.ndarray:
        """A copy of the ring that stays valid across future update()s
        (update donates the previous buffer for the in-place shift)."""
        return jnp.copy(self._tensor)

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self._tensor.shape)

    def size_in_bytes(self) -> int:
        return self._tensor.size * self._tensor.dtype.itemsize

    def _plane_axis(self) -> int:
        return 1 if self.planes == ColorPlanes.TRANSPOSED else 0

    def update(self, *iops: IOp, input: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Insert one new frame: run the compute chain on it and shift the ring,
        fused into one device program.

        ``iops`` = optional leading read op (or pass ``input=`` array, the
        ``cvGS::CircularTensor::update(stream, GpuMat, ...)`` form), pointwise
        compute ops, and an optional terminal write op which — if present —
        must match this tensor's plane layout (the reference's
        self-referencing ``TensorSplit(self)`` argument).
        """
        ops_list = list(iops)
        if input is not None:
            arr = jnp.asarray(input)
            ops_list.insert(0, ImageRead(data=arr, is_batch=False))
        if not ops_list or not isinstance(ops_list[0], ReadOp):
            raise ValueError("update needs a read op or input= array")
        read = ops_list[0]
        rest = ops_list[1:]
        if rest and isinstance(rest[-1], WriteOp):
            wlayout = _LAYOUT_FOR_WRITE.get(type(rest[-1]))
            if wlayout is not None and wlayout != self.planes:
                raise ValueError(
                    f"write op {type(rest[-1]).__name__} does not match "
                    f"CircularTensor layout {self.planes.name}"
                )
            rest = rest[:-1]
        compute: list = []
        for o in rest:
            if isinstance(o, FusedCompute):
                compute.extend(o.ops)
            elif isinstance(o, ComputeOp):
                compute.append(o)
            else:
                raise TypeError(f"unexpected op {type(o).__name__} in update chain")

        bundle = (read, tuple(compute))
        leaves, treedef = jax.tree_util.tree_flatten(bundle)
        key = treedef
        fn = self._update_cache.get(key)
        if fn is None:
            planes_mode = self.planes
            order = self.order
            axis = self._plane_axis()
            dtype = self.dtype

            def run(tensor, ls):
                rd, chain = jax.tree_util.tree_unflatten(treedef, ls)
                x = rd.lower()
                for o in chain:
                    x = o.apply(x)
                x = x.astype(dtype)
                if planes_mode == ColorPlanes.PACKED:
                    plane = x
                else:
                    plane = jnp.transpose(x, (2, 0, 1))  # (C, H, W)
                if planes_mode == ColorPlanes.TRANSPOSED:
                    new = plane[:, None]  # (C, 1, H, W)
                else:
                    new = plane[None]  # (1, ...) leading plane axis
                old = tensor
                if order == CircularTensorOrder.NEWEST_FIRST:
                    shifted = jax.lax.slice_in_dim(old, 0, old.shape[axis] - 1, axis=axis)
                    return jnp.concatenate([new, shifted], axis=axis)
                shifted = jax.lax.slice_in_dim(old, 1, old.shape[axis], axis=axis)
                return jnp.concatenate([shifted, new], axis=axis)

            fn = jax.jit(run, donate_argnums=(0,))
            self._update_cache[key] = fn
        self._tensor = fn(self._tensor, leaves)
        return self._tensor

    # --- persistence (the ring is the only persistent state the engine owns,
    # SURVEY.md §5.4) ---

    def state_dict(self) -> dict:
        import numpy as _np

        return {
            "tensor": _np.asarray(self._tensor),
            "order": self.order.value,
            "planes": self.planes.value,
            "width": self.width,
            "height": self.height,
            "channels": self.channels,
            "batch": self.batch,
        }

    def save(self, path: str) -> None:
        import numpy as _np

        _np.savez(path, **self.state_dict())

    @classmethod
    def load(cls, path: str, device=None) -> "CircularTensor":
        import numpy as _np

        d = _np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
        ct = cls(
            width=int(d["width"]), height=int(d["height"]),
            channels=int(d["channels"]), batch=int(d["batch"]),
            order=CircularTensorOrder(str(d["order"])),
            planes=ColorPlanes(str(d["planes"])),
            dtype=d["tensor"].dtype, device=device,
        )
        payload = jnp.asarray(d["tensor"])
        if device is not None:
            payload = jax.device_put(payload, device)
        ct._tensor = payload
        return ct
