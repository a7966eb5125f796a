"""Multi-chip / multi-host sharding of the encode pipeline."""
