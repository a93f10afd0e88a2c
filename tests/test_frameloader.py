"""Native streaming frame loader: C++ prefetch ring + ctypes binding,
including the NV12-stream -> fused-pipeline integration (the reference's
raw6K.nv12 streaming scenario, ``tests/resize/test_fused_resize.cu:159-211``
— run here on synthesized NV12 data since the upstream blobs are missing)."""

import numpy as np
import pytest

import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.utils.frameloader import FrameLoader, frame_shape_nv12
from conftest import check_exact

H, W = 32, 64
NFRAMES = 9


@pytest.fixture(scope="module")
def nv12_file(tmp_path_factory):
    rng = np.random.default_rng(5)
    path = tmp_path_factory.mktemp("frames") / "stream.nv12"
    frames = rng.integers(0, 256, (NFRAMES,) + frame_shape_nv12(W, H)).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(frames.tobytes())
    return str(path), frames


def test_native_lib_builds(nv12_file):
    path, _ = nv12_file
    with FrameLoader(path, frame_shape_nv12(W, H)) as fl:
        assert fl.native, "C++ loader must build in this environment (g++ present)"


def test_iterates_all_frames_in_order(nv12_file):
    path, frames = nv12_file
    with FrameLoader(path, frame_shape_nv12(W, H), ring_depth=3) as fl:
        assert fl.num_frames == NFRAMES
        for k, frame in enumerate(fl):
            check_exact(frame, frames[k], f"frame {k}")
        assert k == NFRAMES - 1


def test_frames_feed_fused_pipeline(nv12_file):
    path, frames = nv12_file
    with FrameLoader(path, frame_shape_nv12(W, H)) as fl:
        outs = []
        for frame in fl:
            out = cvgs.execute_operations(
                cvgs.read_yuv(frame.copy()),
                cvgs.convert_yuv_to_rgb(standard=cvgs.ColorStandard.BT709),
            )
            outs.append(np.asarray(out))
    assert len(outs) == NFRAMES and outs[0].shape == (H, W, 3)
    ref0 = np.asarray(cvgs.execute_operations(
        cvgs.read_yuv(frames[0]),
        cvgs.convert_yuv_to_rgb(standard=cvgs.ColorStandard.BT709),
    ))
    check_exact(outs[0], ref0, "loader frame -> pipeline")


def test_python_fallback_equivalent(nv12_file, monkeypatch):
    path, frames = nv12_file
    import cvgpuspeedup_tpu.utils.frameloader as m
    monkeypatch.setattr(m, "_lib", None)
    monkeypatch.setattr(m, "_lib_tried", True)
    with FrameLoader(path, frame_shape_nv12(W, H)) as fl:
        assert not fl.native
        got = list(fl)
    assert len(got) == NFRAMES
    check_exact(got[3], frames[3], "fallback frame 3")


def test_truncated_tail_dropped(tmp_path):
    rng = np.random.default_rng(1)
    shape = frame_shape_nv12(W, H)
    data = rng.integers(0, 256, (2,) + shape).astype(np.uint8)
    path = tmp_path / "trunc.nv12"
    with open(path, "wb") as f:
        f.write(data.tobytes())
        f.write(b"\x00" * 17)  # partial frame tail
    with FrameLoader(str(path), shape) as fl:
        assert fl.num_frames == 2
        assert len(list(fl)) == 2
