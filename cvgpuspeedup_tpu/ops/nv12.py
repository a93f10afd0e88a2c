"""NV12/NV21 YUV read + YUV->RGB conversion ops.

Equivalents of ``fk::ReadYUV<NV12>`` and
``fk::ConvertYUVToRGB<NV12, {Full,Limited}, {bt601,bt709}, alpha?, [outT]>``
(reference F11; usage ``tests/resize/test_fused_resize.cu:35-51,121-122,141-143``).

NV12 buffer layout: a (H*3/2, W) uint8 array — H rows of luma followed by
H/2 rows of interleaved half-resolution UV pairs (VU pairs for NV21). The read
op yields a (H, W, 3) uint8 YUV image with chroma upsampled nearest-neighbor
(each UV pair covers its 2x2 luma block), matching the per-pixel addressing
of a CUDA NV12 reader.

Conversion math (FKL submodule is absent upstream, so the coefficients are the
standard BT.601/BT.709 full/limited-range equations, parameterized by Kr/Kb):

  full:     R = Y + 2(1-Kr)(V-128)
            G = Y - (2 Kb(1-Kb)/Kg)(U-128) - (2 Kr(1-Kr)/Kg)(V-128)
            B = Y + 2(1-Kb)(U-128)
  limited:  Y' = (255/219)(Y-16), chroma scaled by 255/224.

with Kg = 1 - Kr - Kb; bt601 Kr=0.299 Kb=0.114; bt709 Kr=0.2126 Kb=0.0722.
Computed in float32; integer outputs are saturate-cast; an alpha channel (max
value) is appended when ``alpha=True``.
"""

from __future__ import annotations



import jax.numpy as jnp
import numpy as np

from ..graph import ComputeOp, ReadOp, op, static_field
from ..types import ColorRange, ColorStandard, PixelFormat
from ..utils import dtypes as dt

_KR_KB = {
    ColorStandard.BT601: (0.299, 0.114),
    ColorStandard.BT709: (0.2126, 0.0722),
}


@op
class ReadYUV(ReadOp):
    """Read an NV12/NV21 buffer as an (H, W, 3) uint8 YUV image."""

    buffer: jnp.ndarray  # (H*3/2, W) uint8
    pixel_format: PixelFormat = static_field(default=PixelFormat.NV12)

    def lower_native_planes(self):
        """The Y plane (H, W) and chroma pairs (H/2, W/2, 2) at NATIVE
        resolution (NV21 swap already applied). Used by the plane-space
        resize rewrite (``ResizeRead``): resizing in chroma space avoids
        ever materializing the 2x-upsampled full-resolution chroma."""
        buf = self.buffer
        if buf.ndim == 3 and buf.shape[-1] == 1:
            buf = buf[..., 0]
        total_rows, width = buf.shape
        height = (total_rows * 2) // 3
        if height % 2 or width % 2:
            raise ValueError(f"NV12 luma dims must be even, got {width}x{height}")
        y = buf[:height]
        uv = buf[height:].reshape(height // 2, width // 2, 2)
        if self.pixel_format == PixelFormat.NV21:
            uv = uv[..., ::-1]
        return y, uv

    def lower(self) -> jnp.ndarray:
        y, uv = self.lower_native_planes()
        # nearest-neighbor 2x chroma upsample (each pair covers a 2x2 block)
        uv_full = jnp.repeat(jnp.repeat(uv, 2, axis=0), 2, axis=1)
        return jnp.stack([y, uv_full[..., 0], uv_full[..., 1]], axis=-1)

    def describe(self) -> str:
        return f"ReadYUV[{self.pixel_format.name}]{tuple(self.buffer.shape)}"


@op
class ConvertYUVToRGB(ComputeOp):
    """YUV -> RGB(A) conversion (pointwise 3x3 matrix + offsets)."""

    color_range: ColorRange = static_field(default=ColorRange.FULL)
    standard: ColorStandard = static_field(default=ColorStandard.BT601)
    alpha: bool = static_field(default=False)
    out_dtype: np.dtype = static_field(default=np.dtype(np.uint8))

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        kr, kb = _KR_KB[self.standard]
        kg = 1.0 - kr - kb
        y = x[..., 0].astype(jnp.float32)
        u = x[..., 1].astype(jnp.float32) - 128.0
        v = x[..., 2].astype(jnp.float32) - 128.0
        if self.color_range == ColorRange.LIMITED:
            y = (y - 16.0) * np.float32(255.0 / 219.0)
            u = u * np.float32(255.0 / 224.0)
            v = v * np.float32(255.0 / 224.0)
        r = y + np.float32(2.0 * (1.0 - kr)) * v
        g = (
            y
            - np.float32(2.0 * kb * (1.0 - kb) / kg) * u
            - np.float32(2.0 * kr * (1.0 - kr) / kg) * v
        )
        b = y + np.float32(2.0 * (1.0 - kb)) * u
        rgb = jnp.stack([r, g, b], axis=-1)
        out_dtype = jnp.dtype(self.out_dtype)
        rgb = dt.saturate_cast(rgb, out_dtype)
        if self.alpha:
            fill = 1.0 if dt.is_float(out_dtype) else dt.max_value(out_dtype)
            a = jnp.full(rgb.shape[:-1] + (1,), fill, dtype=out_dtype)
            rgb = jnp.concatenate([rgb, a], axis=-1)
        return rgb

    def describe(self) -> str:
        return (
            f"ConvertYUVToRGB[{self.standard.name},{self.color_range.name},"
            f"alpha={self.alpha}]->{np.dtype(self.out_dtype).name}"
        )
