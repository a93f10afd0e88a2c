"""Type-conversion compute ops.

Equivalents of ``fk::SaturateCast`` / ``fk::Cast`` (reference F5; semantics
pinned bit-exact vs ``cv::convertTo`` by
``tests/single_operation/test_convertTo.cu:60-96``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..graph import ComputeOp, op, static_field
from ..utils import dtypes as dt


@op
class SaturateCast(ComputeOp):
    """OpenCV ``saturate_cast``: round-half-to-even then clamp for integer
    destinations; plain convert for float destinations."""

    dst: np.dtype = static_field()

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return dt.saturate_cast(x, self.dst)

    def describe(self) -> str:
        return f"SaturateCast->{np.dtype(self.dst).name}"


@op
class Cast(ComputeOp):
    """Plain C-style conversion (truncating for float->int)."""

    dst: np.dtype = static_field()

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return dt.cast(x, self.dst)

    def describe(self) -> str:
        return f"Cast->{np.dtype(self.dst).name}"
