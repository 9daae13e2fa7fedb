"""Shared mutable state helpers: union-find, checkpoint/lineage manifests."""
