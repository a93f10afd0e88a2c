"""Pallas kernel emitter — the hand-scheduled TPU path for hot pipelines.

The XLA path (``Pipeline.lower``) already fuses every pointwise chain into one
kernel; this module exists for the read patterns XLA cannot schedule optimally:
the flagship batched variable-geometry resize (reference SURVEY.md §3.2),
where each plane needs a dynamic HBM window DMA plus gather-free bilinear.

Design (TPU-first, nothing like the CUDA thread-per-pixel reference):

- grid = (BATCH,), one program per output plane;
- per-plane rect/letterbox/scale params are scalar-prefetched into SMEM
  (the analog of the reference's kernel-parameter array, minus the CUDA 4KB
  limit that forced its codegen games);
- the program DMAs the plane's crop window HBM->VMEM (dynamic offset, static
  bucketed extent);
- bilinear resize is computed as TWO SMALL MXU MATMULS: a vertical
  interpolation matrix ``Wv (dstH x srcH)`` and a horizontal one
  ``Wh (srcW x dstW)`` built on the VPU from the scalar params — banded
  two-tap rows reproducing exactly the OpenCV half-pixel-center weights of
  ``ops.resize.axis_lerp``. This keeps the hot loop on the MXU at full
  precision (HIGHEST, needed for the f32 bit-parity contract) instead of
  doing 4-point gathers the VPU hates;
- the pointwise chain runs on the VPU over the resized tile; the write layout
  (TensorSplit etc.) is emitted directly as the kernel's output indexing.

Status: emitter lands with the flagship pipeline milestone. ``supports``
gates AUTO dispatch; ``try_lower`` returns None for unsupported patterns so
the executor falls back to the XLA path with identical numerics.
"""

from __future__ import annotations


def supports(pipeline) -> bool:
    return False


def try_lower(pipeline, *, interpret: bool = False):
    return None
