"""Ray Data stages: batch transforms, grouped per-series ops, rollups,
compression / downsampling actor pools, dedup, similarity, text."""
