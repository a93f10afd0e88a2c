"""Executors and backends (XLA fuser + Pallas emitters)."""
