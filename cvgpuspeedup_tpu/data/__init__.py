"""Stateful data structures (CircularTensor)."""
