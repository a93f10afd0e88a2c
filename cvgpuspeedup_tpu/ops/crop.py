"""Crop read op.

Equivalent of ``fk::Crop<[BackIOp]>`` (reference ``include/cvGPUSpeedup.cuh:
247-265,444-447``): a crop is a *read* stage — it never copies, it re-indexes
the source. Composes over any back read-op (e.g. crop of an NV12->RGB virtual
image) exactly like the reference's ``crop(backIOp, rect)``.

The rectangle's width/height are static (they define the output shape — the
same constraint the reference has, where output geometry is a template-time
property of the pipeline); x/y offsets are runtime values (kernel params).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph import ReadOp, op, static_field


@op
class CropRead(ReadOp):
    source: ReadOp
    x: jnp.ndarray  # runtime scalar
    y: jnp.ndarray  # runtime scalar
    width: int = static_field()
    height: int = static_field()

    @property
    def batched(self):  # type: ignore[override]
        return self.source.batched

    def lower(self) -> jnp.ndarray:
        src = self.source.lower()
        x = jnp.asarray(self.x, dtype=jnp.int32)
        y = jnp.asarray(self.y, dtype=jnp.int32)
        if src.ndim == 3:
            start = (y, x, jnp.int32(0))
            sizes = (self.height, self.width, src.shape[-1])
        elif src.ndim == 4:
            start = (jnp.int32(0), y, x, jnp.int32(0))
            sizes = (src.shape[0], self.height, self.width, src.shape[-1])
        else:
            raise ValueError(f"crop source must be rank 3 or 4, got {src.ndim}")
        # dynamic_slice clamps the start so the slice stays in bounds,
        # mirroring the reference's debug assert on crop geometry.
        return jax.lax.dynamic_slice(src, start, sizes)

    def describe(self) -> str:
        return f"Crop[{self.width}x{self.height}]({self.source.describe()})"
