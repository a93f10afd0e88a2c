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


def test_video_stream_preset(tmp_path):
    """video_stream: raw packed-RGB file -> loader -> packed ingestion ->
    fused resize+normalize+split per frame, vs the cv2 oracle."""
    import cv2
    from cvgpuspeedup_tpu.pipelines.presets import video_stream
    from conftest import check_float

    rng = np.random.default_rng(11)
    w, h, n = 64, 32, 4
    frames = rng.integers(0, 256, (n, h, w, 3)).astype(np.uint8)
    path = tmp_path / "stream.rgb"
    with open(path, "wb") as f:
        f.write(frames.tobytes())

    mean, scale = (0.4, 0.5, 0.6), (0.2, 0.3, 0.4)
    stream = video_stream(str(path), w, h, dsize=cvgs.Size(32, 16),
                          mean=mean, scale=scale,
                          backend=cvgs.ParBackend.XLA)
    outs = [np.asarray(o) for o in stream]
    assert len(outs) == n and outs[0].shape == (3, 16, 32)
    for k, o in enumerate(outs):
        r = cv2.resize(frames[k].astype(np.float32), (32, 16), interpolation=cv2.INTER_LINEAR)
        ref = ((r / np.float32(255.0)) - np.float32(mean)) / np.float32(scale)
        check_float(o, ref.transpose(2, 0, 1), tol=1e-5, msg=f"stream frame {k}")


def test_video_stream_preset_nv12(tmp_path):
    from cvgpuspeedup_tpu.pipelines.presets import video_stream
    from conftest import check_float

    rng = np.random.default_rng(12)
    w, h, n = 64, 32, 3
    bufs = rng.integers(0, 256, (n,) + frame_shape_nv12(w, h)).astype(np.uint8)
    path = tmp_path / "stream.nv12"
    with open(path, "wb") as f:
        f.write(bufs.tobytes())

    stream = video_stream(str(path), w, h, fmt="nv12",
                          dsize=cvgs.Size(32, 16),
                          backend=cvgs.ParBackend.XLA)
    outs = [np.asarray(o) for o in stream]
    assert len(outs) == n and outs[0].shape == (3, 16, 32)
    # oracle: the library's own unfused reference path per frame
    for k, o in enumerate(outs):
        rgb = cvgs.execute_operations(
            cvgs.read_yuv(bufs[k]),
            cvgs.convert_yuv_to_rgb(out_dtype=np.float32),
            backend=cvgs.ParBackend.XLA,
        )
        ref = cvgs.execute_operations(
            cvgs.resize(cvgs.image(np.asarray(rgb)), cvgs.Size(32, 16)),
            cvgs.convert_to(np.float32, alpha=1 / 255.0),
            cvgs.split_tensor(),
            backend=cvgs.ParBackend.XLA,
        )
        check_float(o, np.asarray(ref), tol=1e-4, msg=f"nv12 stream frame {k}")
