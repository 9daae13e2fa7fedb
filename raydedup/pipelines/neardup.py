"""The flagship near-duplicate detection + clustering DAG.

    read → signatures (actor pool) → exact dedup (sha256 groupby)
         → LSH band explode → bucket groupby → verified pairs
         → union-find components → cluster assignment → clusters / survivors

This is the new-engine replacement for the reference's storytelling chain
``detect_off_topic → slice_by_datetime → cluster_by_simhash →
exclude_duplicates → select_high_quality`` (SURVEY §3.2): file hand-offs
become one lazy Dataset DAG; the per-slice identical-simhash DBSCAN becomes
exact-text groups ∪ verified MinHash-LSH near-dup components.

Scale notes (10^12-turn design):
- only hashes cross the wide shuffles (text dropped after signatures);
- exact dedup first ⇒ LSH never sees hot identical-text buckets;
- verified edges are sparse ⇒ driver-side components are safe and run
  fully vectorized (dictionary-encode + numpy pointer jumping); the
  distributed label-propagation backend (state/unionfind.py) is the
  fallback when the component map itself outgrows the driver;
- the final cluster map is broadcast once via ``ray.put`` and read inside
  each assignment task — never re-shipped per batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray

from raydedup.config import DedupConfig, DEFAULT_CONFIG
from raydedup.stages.exact import add_row_key, exact_dedup
from raydedup.stages.lsh import lsh_verified_pairs
from raydedup.stages.signatures import compute_signatures


def transcript_key_cols() -> list[str]:
    return ["conv_id", "turn_idx"]


def signatures_with_rep(ds, cfg: DedupConfig = DEFAULT_CONFIG,
                        key_cols: list[str] | None = None,
                        text_col: str = "text"):
    """rows → signature rows with exact-dup representative assignment.

    Parallelism note: block fan-out is the SOURCE's job
    (``read_parquet(override_num_blocks=...)``) — a mid-pipeline
    ``repartition`` here was measured to stall the streaming executor
    behind an AllToAll barrier for longer than the compute it parallelized.
    """
    key_cols = key_cols or transcript_key_cols()
    keyed = add_row_key(ds.select_columns(key_cols + [text_col]), key_cols)
    sigs = compute_signatures(keyed, cfg, text_col=text_col)
    return exact_dedup(sigs)


def near_dup_pairs(assigned_sigs, cfg: DedupConfig = DEFAULT_CONFIG,
                   min_jaccard: float | None = None):
    """exact-dedup-assigned signatures → verified near-dup pairs between
    REPRESENTATIVE keys (exact-dup members are reattached at clustering)."""
    reps = assigned_sigs.filter(expr="is_rep")
    reps = reps.select_columns(
        ["row_key", "band_hashes", "shingle_hashes", "n_shingles"]
    )
    return lsh_verified_pairs(reps, cfg, min_jaccard=min_jaccard)


def cluster_assignments(assigned_sigs, pairs_ds,
                        cfg: DedupConfig = DEFAULT_CONFIG):
    """→ Dataset(row_key, rep_key, cluster_id, is_duplicate).

    cluster_id = lexicographic min row_key of the connected component of
    the row's exact-dup representative; a row whose component has a single
    member (n_exact == 1 and no near-dup edge) keeps its own key and
    is_duplicate = False. is_duplicate = True for every member of a >= 2
    cluster except the canonical (min-key) one — the 'survivor'.
    """
    import numpy as np

    # near-dup edges between representatives: the verified pair set is
    # sparse (orders of magnitude below row count), so components are
    # computed on the driver — but fully vectorized: dictionary-encode
    # the pair keys (C hash probe), rank them lexicographically, and run
    # pointer-jumping min-label propagation in numpy. The previous
    # per-edge Python union-find was ~1 s of SERIAL time at 280k pairs —
    # a direct hit on the two-cluster-size scaling ratio.
    pairs_tbl = pa.concat_tables(
        b for b in pairs_ds.select_columns(["a_key", "b_key"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    ) if pairs_ds.count() else None
    if pairs_tbl is not None and pairs_tbl.num_rows:
        both = pa.concat_arrays(
            [pairs_tbl["a_key"].combine_chunks(),
             pairs_tbl["b_key"].combine_chunks()]
        )
        enc = pc.dictionary_encode(both)
        idx = enc.indices.to_numpy().astype(np.int64)
        dictionary = enc.dictionary
        n = len(dictionary)
        m = pairs_tbl.num_rows
        a_i, b_i = idx[:m], idx[m:]
        # lexicographic rank of each dictionary entry: node labels live in
        # rank space so min-label == lexicographic-min row_key
        sort_idx = pc.sort_indices(dictionary).to_numpy().astype(np.int64)
        rank = np.empty(n, dtype=np.int64)
        rank[sort_idx] = np.arange(n, dtype=np.int64)
        a_r, b_r = rank[a_i], rank[b_i]
        label = np.arange(n, dtype=np.int64)
        while True:
            lo = np.minimum(label[a_r], label[b_r])
            np.minimum.at(label, a_r, lo)
            np.minimum.at(label, b_r, lo)
            nxt = label[label]
            while not np.array_equal(nxt, label):
                label, nxt = nxt, nxt[nxt]
            if np.array_equal(label[a_r], label[b_r]):
                break
        sorted_keys = dictionary.take(pa.array(sort_idx))
        cluster_of_node = sorted_keys.take(pa.array(label[rank]))
        cluster_ref = ray.put((dictionary, cluster_of_node))
    else:
        empty = pa.array([], type=pa.string())
        cluster_ref = ray.put((empty, empty))

    def assign(batch: pa.Table) -> pa.Table:
        node_keys, node_cluster = ray.get(cluster_ref)
        at = pc.index_in(batch["rep_key"], value_set=node_keys)
        cluster = pc.coalesce(pc.take(node_cluster, at), batch["rep_key"])
        is_dup = pc.not_equal(batch["row_key"], cluster)
        return pa.table(
            {
                "row_key": batch["row_key"].combine_chunks(),
                "rep_key": batch["rep_key"].combine_chunks(),
                "cluster_id": cluster,
                "is_duplicate": is_dup,
            }
        )

    return assigned_sigs.map_batches(assign, batch_format="pyarrow")


def near_dup_pipeline(ds, cfg: DedupConfig = DEFAULT_CONFIG,
                      key_cols: list[str] | None = None,
                      text_col: str = "text"):
    """Full DAG; returns (clusters_ds, pairs_ds)."""
    assigned = signatures_with_rep(ds, cfg, key_cols, text_col)
    # signatures feed two consumers (LSH and final assignment): materialize
    # once so the signature actors run a single pass over the input.
    assigned = assigned.materialize()
    pairs = near_dup_pairs(assigned, cfg).materialize()
    clusters = cluster_assignments(assigned, pairs, cfg)
    return clusters, pairs


def survivors(clusters_ds):
    """Canonical one-row-per-cluster keep list (≡ the reference's
    'nonduplicates' output files, bin/exclude_duplicates:108-111)."""
    return clusters_ds.filter(expr="is_duplicate == False")


def pair_threshold_sweep(pairs_ds, thresholds: list[float],
                         jaccard_col: str = "jaccard",
                         key_cols: tuple[str, str] = ("a_key", "b_key")):
    """Dedup sensitivity curve: for each candidate threshold t (each must
    be >= the config threshold the pairs were verified at, so LSH recall
    is unaffected), count the verified near-dup pairs with jaccard >= t
    and the DISTINCT representative docs appearing in such a pair — the
    one-pass report a curation run reads before committing to a dedup
    aggressiveness level.

    Scale shape: the pairs Dataset is consumed twice (pair histogram +
    per-doc max), so it is materialized once; each consumer is a per-batch
    partial count over the (tiny, fixed) threshold grid followed by a
    grid-sized groupby-sum, and the per-doc side reduces through a native
    Max aggregate keyed by doc — nothing corpus-sized ever reaches the
    driver. Threshold comparisons are exact both sides: jaccard is a
    correctly-rounded float64 division of exact ints in the engine and in
    the DuckDB oracle, and the grid literals parse to the same float64.

    Returns a (tiny) pyarrow Table: threshold, n_pairs, n_dup_docs.
    """
    import numpy as np

    from ray.data.aggregate import Max, Sum

    ts = np.array(sorted(thresholds), dtype=np.float64)
    pairs_ds = pairs_ds.materialize()
    zeros = pa.table({"threshold": pa.array(ts, pa.float64()),
                      "n_pairs": pa.array([0] * len(ts), pa.int64()),
                      "n_dup_docs": pa.array([0] * len(ts), pa.int64())})
    if pairs_ds.count() == 0:
        return zeros

    def pair_partial(batch: pa.Table) -> pa.Table:
        import numpy as np
        j = batch[jaccard_col].combine_chunks().to_numpy(
            zero_copy_only=False)
        n = (j[None, :] >= ts[:, None]).sum(axis=1).astype(np.int64)
        return pa.table({"threshold": pa.array(ts, pa.float64()),
                         "n": pa.array(n, pa.int64())})

    n_pairs = (pairs_ds.map_batches(pair_partial, batch_format="pyarrow")
               .groupby("threshold").aggregate(Sum("n", alias_name="n")))

    a_col, b_col = key_cols

    def explode(batch: pa.Table) -> pa.Table:
        j = batch[jaccard_col].combine_chunks()
        keys = pa.concat_arrays([batch[a_col].combine_chunks(),
                                 batch[b_col].combine_chunks()])
        return pa.table({"key": keys,
                         "j": pa.concat_arrays([j, j])})

    docmax = (pairs_ds.map_batches(explode, batch_format="pyarrow")
              .groupby("key").aggregate(Max("j", alias_name="mj")))

    def doc_partial(batch: pa.Table) -> pa.Table:
        import numpy as np
        mj = batch["mj"].combine_chunks().to_numpy(zero_copy_only=False)
        n = (mj[None, :] >= ts[:, None]).sum(axis=1).astype(np.int64)
        return pa.table({"threshold": pa.array(ts, pa.float64()),
                         "n": pa.array(n, pa.int64())})

    n_docs = (docmax.map_batches(doc_partial, batch_format="pyarrow")
              .groupby("threshold").aggregate(Sum("n", alias_name="n")))

    # grid-sized merges: len(ts) rows each
    pmap = {r["threshold"]: r["n"] for r in n_pairs.take_all()}
    dmap = {r["threshold"]: r["n"] for r in n_docs.take_all()}
    return pa.table({
        "threshold": pa.array(ts, pa.float64()),
        "n_pairs": pa.array([int(pmap.get(t, 0)) for t in ts], pa.int64()),
        "n_dup_docs": pa.array([int(dmap.get(t, 0)) for t in ts],
                               pa.int64()),
    })
