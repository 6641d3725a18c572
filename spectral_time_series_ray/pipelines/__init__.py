"""End-to-end pipelines composed from stages."""
