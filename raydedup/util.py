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


def join_partitions(n_rows: int, rows_per_partition: int = 8192,
                    max_parts: int = 64) -> int:
    """Partition count for ``Dataset.join`` sized so every hash partition
    is statistically guaranteed non-empty (P(empty) ~ e^-rows_per_part).

    Ray 2.49's hash-join aggregator builds an empty ZERO-COLUMN table for
    a partition that received no shards from a side whose upstream plan
    can't expose a schema (join / map_groups outputs), and pyarrow then
    fails the key lookup — sizing partitions by row count sidesteps the
    bug and is the right shuffle granularity anyway."""
    return max(1, min(max_parts, n_rows // rows_per_partition + 1))


def repeated_keys(ds, key_col: str):
    """Keys appearing on >= 2 rows of ``ds``, as a one-column Dataset —
    the standard pre-filter semi-join side that drops singleton groups
    BEFORE a heavy groupby (a Python call per singleton group is the
    measured ``map_groups`` tax). Shared by the embedding-LSH and
    suffix-span candidate stages."""
    import pyarrow as pa
    import pyarrow.compute as pc

    counts = ds.groupby(key_col).count()

    def strip(batch: pa.Table) -> pa.Table:
        mask = pc.greater_equal(batch["count()"], pa.scalar(2))
        return batch.filter(mask).select([key_col])

    return counts.map_batches(strip, batch_format="pyarrow")


def hash_sample_fixed(ds, key_col: str, k: int, seed: int = 0x5EED):
    """Deterministic uniform sample of ~``k`` rows WITHOUT knowing the
    row count: global bottom-k by an avalanche hash of the key.

    Unlike ``limit(k)`` (a PREFIX — biased when the table is sorted by
    source/time) the hash order is independent of physical order, and
    unlike ``random_sample`` the outcome depends only on (key, seed), so
    retries/resumes pick identical rows. One streaming pass: each batch
    keeps only its LOCAL bottom-k, so the final sort+limit shuffles at
    most k rows per input block. Integer keys hash vectorized (fmix64);
    other types hash once per distinct value (dictionary-encode + md5,
    the ``asof._part_array`` idiom)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from raydedup.functions.minhash import _fmix64_batch

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[key_col].combine_chunks()
        if pa.types.is_integer(col.type):
            x = col.to_numpy(zero_copy_only=False).astype(np.int64)
            h = _fmix64_batch(x.view(np.uint64) ^ np.uint64(seed))
        else:
            enc = col.dictionary_encode()
            dh = np.fromiter(
                (int.from_bytes(
                    hashlib.md5(f"{seed}:{v}".encode()).digest()[:8],
                    "big") for v in enc.dictionary.to_pylist()),
                dtype=np.uint64, count=len(enc.dictionary))
            idx = enc.indices.to_numpy(zero_copy_only=False).astype(
                np.int64)
            h = dh[idx]
        sel = np.argsort(h, kind="stable")[:k]
        out = batch.take(pa.array(sel))
        # uint64 Arrow column: int64 .view would invert the order of
        # hashes >= 2^63 under the global sort
        return out.append_column("__h", pa.array(h[sel],
                                                 type=pa.uint64()))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .sort("__h").limit(k).drop_columns(["__h"]))


def round_half_away(x):
    """Exact round-half-to-away-from-zero on a float64 array — C
    ``std::round`` / DuckDB ``round()`` parity. ``floor(|x| + 0.5)``
    is NOT equivalent: when |x| sits one ulp below an exact .5
    boundary the addition rounds up and floor lands one integer too
    high. ``np.rint`` (half-to-even) is exact for non-halves; exact
    halves are patched to away-from-zero."""
    import numpy as np

    r = np.rint(x)
    fl = np.floor(x)
    half = (x - fl) == 0.5
    return np.where(half, np.where(x > 0, fl + 1.0, fl), r)
