"""Dtype, profiling, and misc utilities."""
