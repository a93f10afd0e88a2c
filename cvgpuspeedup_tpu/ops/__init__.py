"""Operation nodes (reads, computes, writes) — see package docstring."""
