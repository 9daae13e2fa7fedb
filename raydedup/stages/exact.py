"""Exact duplicate detection: hash-partition on text_sha256, per-group
representative assignment.

Generalizes the reference's identical-simhash grouping
(``bin/cluster_by_simhash:82-86`` — DBSCAN whose metric degenerates to an
equality indicator, so clusters are just groups of >= 2 identical values)
to identical-TEXT grouping keyed by sha256, which is both stricter and
shuffle-friendly.

This stage is also the hot-bucket killer for LSH (SURVEY §7.5): thousands
of copies of trivial turns ("ok", tool boilerplate) collapse to ONE
representative row here, so downstream near-dup candidate generation never
sees them as an O(n^2) bucket.

Canonical representative = lexicographic min row_key within the group
(order-independent, deterministic under any parallelism).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def add_row_key(ds, key_cols: list[str]):
    """Append a scalar sortable ``row_key`` string column: the key column
    values cast to string and joined with ':'. Mirrored in DuckDB oracles as
    ``concat(cast(c1 as varchar), ':', ...)`` so canonical-min choices agree.
    """

    def _add(batch: pa.Table) -> pa.Table:
        parts = [pc.cast(batch[c], pa.string()) for c in key_cols]
        key = parts[0]
        for p in parts[1:]:
            key = pc.binary_join_element_wise(key, p, ":")
        return batch.append_column("row_key", key)

    return ds.map_batches(_add, batch_format="pyarrow")


def _assign_rep(group: pa.Table) -> pa.Table:
    rep = pc.min(group["row_key"]).as_py()
    n = group.num_rows
    return (
        group.append_column("rep_key", pa.array([rep] * n, type=pa.string()))
        .append_column("n_exact", pa.array([n] * n, type=pa.int32()))
        .append_column(
            "is_rep", pc.equal(group["row_key"], pa.scalar(rep, type=pa.string()))
        )
    )


def exact_dedup(sigs_ds):
    """signatures → same rows + (rep_key, n_exact, is_rep).

    One all-to-all shuffle keyed on ``text_sha256``. At 10^12-row scale the
    key is uniform (a cryptographic hash), so no skew handling is needed
    beyond Ray's sort-based shuffle; group sizes are the number of exact
    copies, which IS the skew we are collapsing.
    """
    return sigs_ds.groupby("text_sha256").map_groups(
        _assign_rep, batch_format="pyarrow"
    )


def exact_clusters(assigned_ds, min_size: int = 2):
    """Reference-parity cluster table: one row per member of each exact
    group with >= min_size members, cluster id = representative key; rows in
    smaller groups are 'noise' (cluster_id = '-1', matching the DBSCAN
    label -1 at bin/cluster_by_simhash:86)."""

    def _label(batch: pa.Table) -> pa.Table:
        big = pc.greater_equal(batch["n_exact"], min_size)
        cluster = pc.if_else(big, batch["rep_key"], pa.scalar("-1"))
        return pa.table(
            {
                "row_key": batch["row_key"],
                "cluster_id": cluster,
                "cluster_size": batch["n_exact"],
            }
        )

    return assigned_ds.map_batches(_label, batch_format="pyarrow")
