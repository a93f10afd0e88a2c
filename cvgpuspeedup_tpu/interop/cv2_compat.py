"""cv2-typed convenience shim — drop-in-style ``cvGS`` surface.

The reference's public API is OpenCV-typed (``cvGS::`` functions taking
``cv::cuda::GpuMat``/``CV_8UC3``/``cv::COLOR_*``/``cv::INTER_LINEAR``,
``include/cvGPUSpeedup.cuh:30-628``). The engine here is OpenCV-free; this
optional shim (SURVEY.md §7 "a thin cv2-typed convenience shim") lets code
written against cv2 constants migrate without renaming:

    from cvgpuspeedup_tpu.interop import cv2_compat as cvGS
    out = cvGS.executeOperations(
        cvGS.resize_batch(frame, rects, (64, 128)),
        cvGS.convertTo(cv2.CV_32F, alpha=0.3),
        cvGS.cvtColor(cv2.COLOR_RGB2BGR),
        cvGS.subtract((3.2, 0.6, 11.8)),
        cvGS.divide((128.0,) * 3),
        cvGS.split(),
    )
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is baked into this image
    cv2 = None

from .. import (
    AspectRatio,
    ColorConversionCode,
    InterpolationType,
    Size,
    WarpType,
)
from .. import (
    convert_to as _convert_to,
    cvt_color as _cvt_color,
    execute_operations as _execute,
    multiply as _multiply,
    add as _add,
    subtract as _subtract,
    divide as _divide,
    resize as _resize,
    resize_batch as _resize_batch,
    crop as _crop,
    warp as _warp,
    split as _split,
    split_tensor as _split_tensor,
    split_tensor_transposed as _split_tensor_transposed,
    write as _write,
    write_tensor as _write_tensor,
    Rect,
)

_DEPTH_TO_DTYPE = {}
_COLOR_CODES = {}
_INTERP = {}
if cv2 is not None:
    _DEPTH_TO_DTYPE = {
        cv2.CV_8U: np.uint8, cv2.CV_8S: np.int8,
        cv2.CV_16U: np.uint16, cv2.CV_16S: np.int16,
        cv2.CV_32S: np.int32, cv2.CV_32F: np.float32, cv2.CV_64F: np.float64,
    }
    _COLOR_CODES = {
        getattr(cv2, f"COLOR_{c.value}"): ColorConversionCode[f"COLOR_{c.value}"]
        for c in ColorConversionCode
        if hasattr(cv2, f"COLOR_{c.value}")
    }
    _INTERP = {cv2.INTER_LINEAR: InterpolationType.INTER_LINEAR}


def _dtype_of(cv_type):
    """CV_8UC3-style code or depth -> numpy dtype (the CUDA_T macro analog)."""
    if cv_type in _DEPTH_TO_DTYPE:
        return _DEPTH_TO_DTYPE[cv_type]
    depth = cv_type & 7  # CV_MAT_DEPTH
    if depth in _DEPTH_TO_DTYPE:
        return _DEPTH_TO_DTYPE[depth]
    raise ValueError(f"unsupported cv type code {cv_type}")


def convertTo(cv_type, alpha=None, beta=None):
    return _convert_to(_dtype_of(cv_type), alpha=alpha, beta=beta)


def cvtColor(code):
    if code not in _COLOR_CODES:
        raise ValueError(f"unsupported color conversion code {code} "
                         f"(reference whitelist: 16 RGB/BGR/GRAY codes)")
    return _cvt_color(_COLOR_CODES[code])


def multiply(scalar):
    return _multiply(scalar)


def add(scalar):
    return _add(scalar)


def subtract(scalar):
    return _subtract(scalar)


def divide(scalar):
    return _divide(scalar)


def _interp(interpolation):
    if interpolation not in _INTERP:
        raise ValueError("only cv2.INTER_LINEAR is supported "
                         "(reference whitelist, cv2cuda_types.cuh:86)")
    return _INTERP[interpolation]


def resize(src=None, dsize=None, fx=0.0, fy=0.0, interpolation=None):
    interp = _interp(interpolation) if interpolation is not None else (
        InterpolationType.INTER_LINEAR)
    size = Size(*dsize) if dsize is not None else None
    if src is None:
        return _resize(dsize=size, interpolation=interp)
    return _resize(src, size, fx=fx, fy=fy, interpolation=interp)


def resize_batch(frame, rects, dsize, usedPlanes=None, backgroundValue=0.0,
                 aspectRatio=AspectRatio.IGNORE_AR, interpolation=None):
    interp = _interp(interpolation) if interpolation is not None else (
        InterpolationType.INTER_LINEAR)
    return _resize_batch(
        frame, rects=np.asarray(rects, np.int32), dsize=Size(*dsize),
        used_planes=usedPlanes, background=backgroundValue,
        aspect_ratio=aspectRatio, interpolation=interp,
    )


def crop(src=None, rect=None):
    """rect: (x, y, w, h) tuple (cv::Rect layout)."""
    if rect is None and isinstance(src, (tuple, list)):
        src, rect = None, src
    r = Rect(*rect)
    return _crop(src, r) if src is not None else _crop(r)


def warpAffine(src, M, dsize, borderValue=0.0):
    return _warp(src, M, Size(*dsize), warp_type=WarpType.AFFINE,
                 default=borderValue)


def warpPerspective(src, M, dsize, borderValue=0.0):
    return _warp(src, M, Size(*dsize), warp_type=WarpType.PERSPECTIVE,
                 default=borderValue)


split = _split
split_tensor = _split_tensor
splitT = _split_tensor_transposed
write = _write
write_tensor = _write_tensor


def executeOperations(*iops, **kw):
    return _execute(*iops, **kw)
