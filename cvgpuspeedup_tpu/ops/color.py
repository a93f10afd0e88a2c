"""Color conversion + channel swizzle compute ops.

Equivalent of ``fk::ColorConversion<code, I, O>`` and ``fk::VectorReorder``
(reference F5/F11). The supported code whitelist mirrors the reference exactly
(``include/cv2cuda_types.cuh:77-86``): the 12 RGB/BGR/RGBA/BGRA permutations
plus the 4 ``->GRAY`` reductions; depths 8U/16U/32F
(``include/cvGPUSpeedup.cuh:151-161``).

GRAY numerics match OpenCV bit-exactly (validated vs ``cv::cuda::cvtColor`` at
integer exactness by reference ``tests/color/test_cvtColor.cu:51-63,105-123``):
integer depths use OpenCV's fixed-point coefficients
``(R*4899 + G*9617 + B*1868 + 8192) >> 14``; float depths use
``0.299 R + 0.587 G + 0.114 B``.

Added alpha channels are set to the dtype's max (1.0 for float), matching
OpenCV's ``cvtColor`` alpha fill.
"""

from __future__ import annotations

import enum
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..graph import ComputeOp, op, static_field
from ..utils import dtypes as dt


class ColorConversionCode(enum.Enum):
    COLOR_BGR2BGRA = "BGR2BGRA"
    COLOR_RGB2RGBA = "RGB2RGBA"
    COLOR_BGRA2BGR = "BGRA2BGR"
    COLOR_RGBA2RGB = "RGBA2RGB"
    COLOR_BGR2RGBA = "BGR2RGBA"
    COLOR_RGB2BGRA = "RGB2BGRA"
    COLOR_BGRA2RGB = "BGRA2RGB"
    COLOR_RGBA2BGR = "RGBA2BGR"
    COLOR_BGR2RGB = "BGR2RGB"
    COLOR_RGB2BGR = "RGB2BGR"
    COLOR_BGRA2RGBA = "BGRA2RGBA"
    COLOR_RGBA2BGRA = "RGBA2BGRA"
    COLOR_RGB2GRAY = "RGB2GRAY"
    COLOR_RGBA2GRAY = "RGBA2GRAY"
    COLOR_BGR2GRAY = "BGR2GRAY"
    COLOR_BGRA2GRAY = "BGRA2GRAY"


# (in_channels, out_channels, swizzle-or-"gray", rgb_index_order_for_gray)
_CODE_INFO = {
    ColorConversionCode.COLOR_BGR2BGRA: (3, 4, (0, 1, 2)),
    ColorConversionCode.COLOR_RGB2RGBA: (3, 4, (0, 1, 2)),
    ColorConversionCode.COLOR_BGRA2BGR: (4, 3, (0, 1, 2)),
    ColorConversionCode.COLOR_RGBA2RGB: (4, 3, (0, 1, 2)),
    ColorConversionCode.COLOR_BGR2RGBA: (3, 4, (2, 1, 0)),
    ColorConversionCode.COLOR_RGB2BGRA: (3, 4, (2, 1, 0)),
    ColorConversionCode.COLOR_BGRA2RGB: (4, 3, (2, 1, 0)),
    ColorConversionCode.COLOR_RGBA2BGR: (4, 3, (2, 1, 0)),
    ColorConversionCode.COLOR_BGR2RGB: (3, 3, (2, 1, 0)),
    ColorConversionCode.COLOR_RGB2BGR: (3, 3, (2, 1, 0)),
    ColorConversionCode.COLOR_BGRA2RGBA: (4, 4, (2, 1, 0, 3)),
    ColorConversionCode.COLOR_RGBA2BGRA: (4, 4, (2, 1, 0, 3)),
    # gray: (r, g, b) channel positions in the source
    ColorConversionCode.COLOR_RGB2GRAY: (3, 1, "gray", (0, 1, 2)),
    ColorConversionCode.COLOR_RGBA2GRAY: (4, 1, "gray", (0, 1, 2)),
    ColorConversionCode.COLOR_BGR2GRAY: (3, 1, "gray", (2, 1, 0)),
    ColorConversionCode.COLOR_BGRA2GRAY: (4, 1, "gray", (2, 1, 0)),
}

# OpenCV fixed-point RGB->GRAY coefficients (R2Y, G2Y, B2Y, shift): round of
# 0.299/0.587 at 15 bits with B2Y making the row sum 2^15 (determined
# empirically against cv2 5.0 for bit-exactness; max int32 accumulation
# 65535 * 2^15 + 2^14 < 2^31, safe for uint16 inputs).
_R2Y, _G2Y, _B2Y, _GRAY_SHIFT = 9798, 19235, 3735, 15


def _alpha_fill(dtype) -> float:
    return 1.0 if dt.is_float(dtype) else dt.max_value(dtype)


@op
class ColorConversion(ComputeOp):
    code: ColorConversionCode = static_field()

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        info = _CODE_INFO[self.code]
        in_c, out_c = info[0], info[1]
        if x.shape[-1] != in_c:
            raise ValueError(
                f"{self.code.name} expects {in_c}-channel input, got {x.shape[-1]}"
            )
        if info[2] == "gray":
            r, g, b = (x[..., i] for i in info[3])
            if dt.is_integer(x.dtype):
                acc = (
                    r.astype(jnp.int32) * _R2Y
                    + g.astype(jnp.int32) * _G2Y
                    + b.astype(jnp.int32) * _B2Y
                    + (1 << (_GRAY_SHIFT - 1))
                ) >> _GRAY_SHIFT
                gray = acc.astype(x.dtype)
            else:
                gray = (
                    r * x.dtype.type(0.299)
                    + g * x.dtype.type(0.587)
                    + b * x.dtype.type(0.114)
                )
            return gray[..., None]
        swz = info[2]
        y = x[..., list(swz)]
        if out_c == 4 and len(swz) == 3:
            alpha = jnp.full(y.shape[:-1] + (1,), _alpha_fill(x.dtype), dtype=x.dtype)
            y = jnp.concatenate([y, alpha], axis=-1)
        return y

    def describe(self) -> str:
        return f"ColorConversion({self.code.name})"


@op
class VectorReorder(ComputeOp):
    """Channel swizzle — reference ``fk::VectorReorder<T, i0, i1, ...>``
    (usage ``tests/resize/test_fused_resize.cu:56,79``)."""

    indices: Tuple[int, ...] = static_field()

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        if len(self.indices) != x.shape[-1]:
            raise ValueError(
                f"VectorReorder{self.indices} on {x.shape[-1]}-channel image"
            )
        return x[..., list(self.indices)]

    def describe(self) -> str:
        return f"VectorReorder{self.indices}"
