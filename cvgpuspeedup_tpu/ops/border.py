"""Border-extension read op.

Equivalent of the FKL ``algorithms/image_processing/border_reader.cuh``
(included by the reference wrapper at ``include/cvGPUSpeedup.cuh:24`` and the
warping test ``tests/warping/test_warping_opencv.cu:18``; the submodule is
absent upstream, so semantics follow the OpenCV border modes the FKL mirrors):
a read stage that extends its source with virtual border pixels, matching
``cv2.copyMakeBorder`` / ``cv::BorderTypes``:

====================  =========================================
mode                  edge behavior for a row ``abcdefgh``
====================  =========================================
CONSTANT              ``iiii | abcdefgh | iiii`` (value i)
REPLICATE             ``aaaa | abcdefgh | hhhh``
REFLECT               ``dcba | abcdefgh | hgfe``
REFLECT_101           ``edcb | abcdefgh | gfed`` (OpenCV default)
WRAP                  ``efgh | abcdefgh | abcd``
====================  =========================================
"""

from __future__ import annotations

import enum

import jax.numpy as jnp

from ..graph import ReadOp, op, static_field


class BorderMode(enum.Enum):
    CONSTANT = "constant"
    REPLICATE = "replicate"
    REFLECT = "reflect"
    REFLECT_101 = "reflect_101"
    WRAP = "wrap"


def _pad_mode(mode: BorderMode):
    return {
        BorderMode.REPLICATE: "edge",
        BorderMode.REFLECT: "symmetric",
        BorderMode.REFLECT_101: "reflect",
        BorderMode.WRAP: "wrap",
    }[mode]


@op
class BorderRead(ReadOp):
    source: ReadOp
    value: jnp.ndarray  # per-channel constant for CONSTANT mode
    top: int = static_field(default=0)
    bottom: int = static_field(default=0)
    left: int = static_field(default=0)
    right: int = static_field(default=0)
    mode: BorderMode = static_field(default=BorderMode.REFLECT_101)

    @property
    def batched(self):  # type: ignore[override]
        return self.source.batched

    def lower(self) -> jnp.ndarray:
        x = self.source.lower()
        lead = (0, 0) if x.ndim == 4 else None
        pad = ([lead] if lead else []) + [
            (self.top, self.bottom),
            (self.left, self.right),
            (0, 0),
        ]
        if self.mode == BorderMode.CONSTANT:
            out = jnp.pad(x, pad, mode="constant")
            val = jnp.asarray(self.value, x.dtype)
            if val.ndim == 0:
                val = jnp.full((x.shape[-1],), val, x.dtype)
            h, w = x.shape[-3], x.shape[-2]
            row = jnp.arange(out.shape[-3])
            col = jnp.arange(out.shape[-2])
            inside = (
                ((row >= self.top) & (row < self.top + h))[:, None, None]
                & ((col >= self.left) & (col < self.left + w))[None, :, None]
            )
            return jnp.where(inside, out, val)
        return jnp.pad(x, pad, mode=_pad_mode(self.mode))

    def describe(self) -> str:
        return (
            f"Border[{self.mode.name},{self.top},{self.bottom},{self.left},"
            f"{self.right}]({self.source.describe()})"
        )
