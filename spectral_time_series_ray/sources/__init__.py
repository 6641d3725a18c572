"""Dataset sources: Parquet table readers and the deterministic
synthetic transcript generator used by tests and benchmarks."""
