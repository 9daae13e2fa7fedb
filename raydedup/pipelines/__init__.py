"""End-to-end DAGs composed from stages; each phase checkpointable."""
