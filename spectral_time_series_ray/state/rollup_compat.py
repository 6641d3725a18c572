"""Shared column-name constants (kept import-light so ``state`` does
not depend on the stage modules)."""

BUCKET_COL = "bucket_ts"
