"""Checkpoint manifests, per-partition lineage, retention policy."""
