"""Small execution helpers shared by pipelines."""

from __future__ import annotations

import ray


def fan_out(ds, factor: int = 3):
    """Ensure enough blocks for full task parallelism.

    A single-file ``read_parquet`` (or a driver-built table) arrives as one
    block, which would serialize every map stage downstream — the measured
    dominant cost at small scale. Repartition is cheap relative to running
    a per-row kernel on one core. At 100 TB the input is thousands of
    fragments and this becomes a near-no-op split."""
    target = int(ray.cluster_resources().get("CPU", 8)) * factor
    return ds.repartition(target)
