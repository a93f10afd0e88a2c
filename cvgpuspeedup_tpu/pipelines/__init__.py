"""Preset end-to-end pipelines (detection preproc, temporal window, NV12
camera, raw video streaming)."""

from .presets import (camera_pipeline, detection_preprocessor,
                      temporal_window, video_stream)

__all__ = ["camera_pipeline", "detection_preprocessor", "temporal_window",
           "video_stream"]
