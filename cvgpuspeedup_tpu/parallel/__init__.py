"""Multi-chip / multi-host sharding layer."""
