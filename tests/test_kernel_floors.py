"""Analytic kernel floors (VERDICT r4 #6): every emitter reports a
physically sensible roofline so benchmark rows can carry '% of floor'."""
import cv2
import numpy as np

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.exec import (pallas_frame, pallas_warp,
                                   pallas_warp_general, pallas_warp_universal)


def _check(fl, lo_us=1.0, hi_us=5000.0):
    assert fl is not None
    assert fl["hbm_bytes"] > 0
    assert fl["floor_s"] == max(fl["hbm_bytes"] / 819e9, fl["mxu_s"])
    assert lo_us * 1e-6 < fl["floor_s"] < hi_us * 1e-6, fl


def test_frame_floor(rng):
    img = rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8)
    pipe = cvgs.build_pipeline(
        cvgs.resize(cvgs.image(img), cvgs.Size(640, 360)),
        cvgs.convert_to(np.float32, alpha=1 / 255.0), cvgs.split_tensor())
    fl = pallas_frame.analytic_floor(pipe)
    _check(fl)
    # HBM term must cover source reads + f32 planar writes
    assert fl["hbm_bytes"] >= 1080 * 1920 * 3 + 360 * 640 * 3 * 4


def test_warp_floors(rng):
    img = rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8)
    sep = cvgs.build_pipeline(
        cvgs.warp(cvgs.image(img), np.array([[0.55, 0.0, 23.0],
                                             [0.0, 0.62, 11.0]]),
                  cvgs.Size(640, 360)), cvgs.split_tensor())
    _check(pallas_warp.analytic_floor(sep))
    rot = cvgs.build_pipeline(
        cvgs.warp(img, cv2.getRotationMatrix2D((960, 540), 10.0, 1 / 3.0),
                  cvgs.Size(640, 360)), cvgs.split_tensor())
    _check(pallas_warp_general.analytic_floor(rot))
    ups = cvgs.build_pipeline(
        cvgs.warp(img, cv2.getRotationMatrix2D((960, 540), 10.0, 1.2),
                  cvgs.Size(1280, 768)), cvgs.split_tensor())
    _check(pallas_warp_universal.analytic_floor(ups))
    # batched plan scales the floor with the plane count
    mats = [cv2.getRotationMatrix2D((960, 540), 3.0 * i, 1.1)
            for i in range(4)]
    shared = cvgs.image(img)
    bat = cvgs.build_pipeline(
        cvgs.warp_batch([shared] * 4, mats, cvgs.Size(640, 360)),
        cvgs.split_tensor())
    fb = pallas_warp_universal.analytic_floor(bat)
    one = cvgs.build_pipeline(
        cvgs.warp_batch([shared], mats[:1], cvgs.Size(640, 360)),
        cvgs.split_tensor())
    f1 = pallas_warp_universal.analytic_floor(one)
    assert fb["hbm_bytes"] > 2 * f1["hbm_bytes"]


def test_floor_none_for_unsupported(rng):
    img = rng.integers(0, 256, (1080, 1920, 3)).astype(np.uint8)
    rot = cvgs.build_pipeline(
        cvgs.warp(img, cv2.getRotationMatrix2D((960, 540), 10.0, 1 / 3.0),
                  cvgs.Size(640, 360)), cvgs.split_tensor())
    assert pallas_frame.analytic_floor(rot) is None
    assert pallas_warp.analytic_floor(rot) is None
