"""Interop layers (cv2-typed convenience shim)."""
