"""cv2-typed shim: cvGS-style names with OpenCV constants."""

import cv2
import numpy as np
import pytest

from cvgpuspeedup_tpu.interop import cv2_compat as cvGS
from conftest import check_float


def test_flagship_via_shim(rng):
    frame = rng.integers(0, 256, (296, 384, 3)).astype(np.uint8)
    rects = [[i, i, 60, 120] for i in range(6)]
    out = np.asarray(cvGS.executeOperations(
        cvGS.resize_batch(frame, rects, (64, 128), usedPlanes=6,
                          backgroundValue=128.0,
                          interpolation=cv2.INTER_LINEAR),
        cvGS.convertTo(cv2.CV_32F, alpha=0.3),
        cvGS.cvtColor(cv2.COLOR_RGB2BGR),
        cvGS.subtract((3.2, 0.6, 11.8)),
        cvGS.divide((128.0,) * 3),
        cvGS.split_tensor(),
    ))
    assert out.shape == (6, 3, 128, 64)
    crop = frame[2:122, 2:62].astype(np.float32)
    r = cv2.resize(crop, (64, 128)) * np.float32(0.3)
    r = (r[..., ::-1] - np.array([3.2, 0.6, 11.8], np.float32)) / 128.0
    check_float(out[2], r.transpose(2, 0, 1), msg="shim plane 2")


def test_shim_rejects_unsupported(rng):
    with pytest.raises(ValueError):
        cvGS.cvtColor(cv2.COLOR_BGR2HSV)
    with pytest.raises(ValueError):
        cvGS.resize(np.zeros((8, 8, 3), np.uint8), (4, 4),
                    interpolation=cv2.INTER_CUBIC)


def test_shim_warp_and_crop(rng):
    img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    m = cv2.getRotationMatrix2D((20, 20), 15, 1.0)
    out = np.asarray(cvGS.executeOperations(cvGS.warpAffine(img, m, (40, 40))))
    ref = cv2.warpAffine(img.astype(np.float32), m, (40, 40))
    check_float(out, ref, tol=2e-2, msg="shim warp")
    c = np.asarray(cvGS.executeOperations(cvGS.crop(img, (4, 6, 16, 12))))
    assert c.shape == (12, 16, 3)
    assert np.array_equal(c, img[6:18, 4:20])
