"""Readers: Parquet transcript tables and deterministic derivations."""
