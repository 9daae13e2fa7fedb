"""The storytelling/dedup chain — the reference's four-script pipeline
``detect_off_topic → slice_by_datetime → cluster_by_simhash →
select_high_quality`` (SURVEY §3.2) as ONE lazy DAG with Parquet
checkpoints instead of JSON/TSV file hand-offs.

Faithful semantics per stage:
  - signatures: per-row 64-bit simhash (≡ detect_off_topic's phase-3
    "raw memento simhash value");
  - slices: equal-count datetime slices with the flush/drop quirks
    (stages/slicing.py);
  - clusters: per-slice groups of >= 2 IDENTICAL simhash values, noise -1
    (≡ cluster_by_simhash's degenerate DBSCAN, bin/cluster_by_simhash:82-86);
  - survivors: chain-scan suppression (stages/chain_scan.py);
  - story: top-1 by quality per (slice, cluster) (stages/quality.py).
"""

from __future__ import annotations

import pyarrow as pa

from raydedup.config import DedupConfig, DEFAULT_CONFIG
from raydedup.pipelines.neardup import signatures_with_rep
from raydedup.stages.chain_scan import chain_scan_survivors
from raydedup.stages.quality import select_high_quality, uri_scores
from raydedup.stages.slicing import slice_by_time


def cluster_by_simhash_per_slice(sigs_with_slices):
    """(slice_number, simhash) groups of >= 2 identical values get a
    cluster id (min row_key); everything else is noise '-1'."""

    def label(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = group.num_rows
        if n >= 2:
            cid = pc.min(group["row_key"]).as_py()
        else:
            cid = "-1"
        return pa.table(
            {
                "slice_number": group["slice_number"],
                "cluster_id": pa.array([cid] * n, type=pa.string()),
                "row_key": group["row_key"],
            }
        )

    return sigs_with_slices.groupby(["slice_number", "simhash"]).map_groups(
        label, batch_format="pyarrow"
    )


def storytelling_chain(ds, cfg: DedupConfig = DEFAULT_CONFIG,
                       key_cols: list[str] | None = None,
                       ts_col: str = "ts"):
    """transcripts → (slices, clusters, survivors, story) datasets."""
    key_cols = key_cols or ["conv_id", "turn_idx"]
    keep = ds.select_columns(key_cols + ["text", ts_col])
    sigs = signatures_with_rep(keep.drop_columns([ts_col]), cfg,
                               key_cols=key_cols).materialize()
    if sigs.count() == 0:
        # zero-row short-circuit with the documented schemas (Ray 2.49's
        # hash join cannot finalize over all-empty partitions)
        import ray.data as rd

        empty_str = pa.array([], type=pa.string())
        slices = rd.from_arrow(pa.table(
            {"slice_number": pa.array([], type=pa.int32()),
             "row_key": empty_str}))
        clusters = rd.from_arrow(pa.table(
            {"slice_number": pa.array([], type=pa.int32()),
             "cluster_id": empty_str, "row_key": empty_str}))
        survivors = rd.from_arrow(pa.table({"row_key": empty_str}))
        story = clusters
        return slices, clusters, survivors, story

    # reattach ts for slicing (kept separate so signature shuffles move
    # hashes only)
    ts_keyed = ds.select_columns(key_cols + [ts_col])
    from raydedup.stages.exact import add_row_key

    ts_keyed = add_row_key(ts_keyed, key_cols).select_columns(
        ["row_key", ts_col]
    )
    slices = slice_by_time(ts_keyed, ts_col=ts_col).materialize()

    # join slice assignments onto signatures. Distributed hash join on
    # row_key — rows the slicer dropped (the reference's tail-drop quirk)
    # vanish via the inner join; nothing is ever collected on the driver.
    # (Arrow's hash join rejects fixed_size_list payload columns — project
    # down to the two columns clustering needs before the shuffle, which is
    # also the right scale move: hashes only across the exchange.)
    n_parts = max(2, min(64, sigs.num_blocks()))
    sigs_sliced = sigs.select_columns(["row_key", "simhash"]).join(
        slices, join_type="inner", num_partitions=n_parts, on=("row_key",)
    )

    clusters = cluster_by_simhash_per_slice(sigs_sliced)

    survivors = chain_scan_survivors(sigs, threshold=cfg.chain_scan_threshold)

    # synthesize a URI per row for the quality scorer (the reference scores
    # archived-page URIs; transcript rows carry none, so the engine derives
    # a stable pseudo-URI from the key — documented deviation)
    def with_uri(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        uri = pc.binary_join_element_wise(
            pa.array(["https://corpus.example/"] * batch.num_rows),
            pc.replace_substring(batch["row_key"], ":", "/"),
            "",
        )
        return batch.append_column("uri", uri)

    scored = uri_scores(
        clusters.map_batches(with_uri, batch_format="pyarrow"), uri_col="uri"
    )
    story = select_high_quality(
        scored.filter(expr="cluster_id != '-1'"),
        group_cols=("slice_number", "cluster_id"),
    )
    return slices, clusters, survivors, story
