"""Pure-numpy numeric kernels (no Ray dependency).

These are the per-series / per-chunk inner loops used inside
``map_batches`` / ``map_groups`` stages. Kept Ray-free so they unit-test
fast and can be reused in any execution context.
"""
