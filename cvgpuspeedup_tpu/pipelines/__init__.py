"""Preset end-to-end pipelines (detection preproc, temporal window, NV12 camera)."""
