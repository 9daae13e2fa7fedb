"""Dup-graph analytics: exact integer PageRank over the duplicate graph.

The duplicate graph is the same one the clustering stage walks
(reference semantics: otmt's per-memento similarity scores induce
duplicate relations; ``bin/exclude_duplicates`` collapses them — here
generalized to collection-scale centrality): nodes are every input row
(``row_key``); undirected edges are

* **star edges** member <-> representative inside each exact-text group
  (the sparse, scale-correct form of the exact-dup clique — O(m) edges
  per group instead of O(m^2)), and
* **near edges** between representatives: the LSH-verified pair set
  (``raydedup.pipelines.neardup.near_dup_pairs``).

PageRank runs in EXACT integer fixed-point so a DuckDB oracle can
reproduce it bit-for-bit (no float-summation-order contract needed):
with scale ``S``, node count ``N`` and damping 0.85 written as 85/100,

    r_0(v)     = S // N
    c_k(u)     = r_k(u) // deg(u)
    r_{k+1}(v) = (15*S) // (100*N) + (85 * sum_{(u,v) in E} c_k(u)) // 100

Floor division on both sides; no dangling-mass redistribution, so an
isolated node settles at the base term after one iteration (closed
form the driver never has to iterate for). With S = 1e12 every
intermediate stays far below 2^63 (85 * sum <= ~85 * S), so the
per-component numpy kernel uses int64 ``np.add.at`` scatter adds —
exact, unlike float-weighted ``bincount``.

Scale shape: contributions only flow along edges, so PageRank
decomposes per connected component (the base term needs only the
global N, a driver scalar). The engine therefore ships ONE distributed
hash join (pair edges -> component labels) plus ONE groupby shuffle of
the edge list — which is dup-subset-sized, orders of magnitude below
the corpus — and a vectorized numpy kernel per component. Isolated
nodes (singleton clusters) never enter the shuffle: they are labeled
by an anti-join and painted with the closed-form base rank.
Partitioning assumption: a single component's edge list fits one
worker — guaranteed upstream by the LSH pair budget that bounds
component fan-in.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.util import join_partitions

PR_SCALE = 10 ** 12
PR_ITERS = 3


def _component_pagerank(group: pa.Table, iters: int, scale: int,
                        n_total: int) -> pa.Table:
    """One connected component's edge list -> (row_key, pr) rows."""
    src = group["src"].combine_chunks()
    dst = group["dst"].combine_chunks()
    nodes = pc.unique(pa.chunked_array([src, dst]))
    s_codes = pc.index_in(src, nodes).to_numpy().astype(np.int64)
    d_codes = pc.index_in(dst, nodes).to_numpy().astype(np.int64)
    # stored edges are one row per undirected edge: symmetrize locally
    srcs = np.concatenate([s_codes, d_codes])
    dsts = np.concatenate([d_codes, s_codes])
    n = len(nodes)
    deg = np.bincount(srcs, minlength=n).astype(np.int64)
    base = (15 * scale) // (100 * n_total)
    r = np.full(n, scale // n_total, dtype=np.int64)
    for _ in range(iters):
        contrib = r // deg
        acc = np.zeros(n, dtype=np.int64)
        np.add.at(acc, dsts, contrib[srcs])
        r = base + (85 * acc) // 100
    return pa.table({"row_key": nodes,
                     "pr": pa.array(r, type=pa.int64())})


MEDOID_SCALE = 10 ** 12


def _medoid_group(group: pa.Table, scale: int) -> pa.Table:
    """One cluster's representative rows (row_key, blob, cluster_id) ->
    the medoid row. Pairwise exact shingle intersections inside the
    group; score_i = sum_j (scale * c_ij) // (n_i + n_j - c_ij), exact
    int64. Partitioning assumption: representative count per cluster is
    bounded by the upstream LSH pair budget, so the O(k^2) pair loop is
    group-local and small."""
    from raydedup.stages.incremental import _blob_views

    flat, offs = _blob_views(group["blob"])
    keys = np.asarray(group["row_key"].to_pylist())
    n = group.num_rows
    sizes = np.diff(offs).astype(np.int64)
    sets = [flat[offs[i]: offs[i + 1]] for i in range(n)]
    scores = np.zeros(n, dtype=np.int64)
    for i in range(n):
        for j in range(i + 1, n):
            c = int(np.intersect1d(sets[i], sets[j],
                                   assume_unique=True).size)
            denom = int(sizes[i] + sizes[j]) - c
            ps = (scale * c) // denom if denom > 0 else 0
            scores[i] += ps
            scores[j] += ps
    best = int(np.lexsort((keys, -scores))[0])
    return pa.table({
        "cluster_id": group["cluster_id"][:1],
        "medoid_key": pa.array([str(keys[best])], pa.string()),
        "score": pa.array([int(scores[best])], pa.int64()),
    })


def cluster_medoids(assigned_sigs, clusters, scale: int = MEDOID_SCALE,
                    num_partitions: int | None = None):
    """One canonical row per cluster: the MEDOID representative — the
    rep whose summed scaled-jaccard similarity to the cluster's other
    reps is highest (ties -> lexicographic min key). This is the
    'which copy do we keep' upgrade over min-key survivors: the most
    central text wins, not the accidentally-smallest key.

    Shape: reps' shingle sets cross ONE hash join to their cluster
    label as length-prefixed binary blobs (Acero rejects list payloads);
    singleton-rep clusters — the overwhelming majority — are split off
    by a repeated-keys semi-join and painted with the closed form
    (medoid = the rep, score 0) without ever entering the groupby; only
    multi-rep clusters shuffle into the per-component medoid kernel."""
    from raydedup.stages.incremental import _lists_to_blob
    from raydedup.stages.relational import semi_join
    from raydedup.util import repeated_keys

    def to_blob(b: pa.Table) -> pa.Table:
        return pa.table({"row_key": b["row_key"],
                         "blob": _lists_to_blob(b["shingle_hashes"])})

    reps_b = (assigned_sigs.filter(expr="is_rep")
              .select_columns(["row_key", "shingle_hashes"])
              .map_batches(to_blob, batch_format="pyarrow"))
    labels = clusters.select_columns(["row_key", "cluster_id"]).materialize()
    n_parts = num_partitions or join_partitions(labels.count())
    rc = reps_b.join(labels, join_type="inner", num_partitions=n_parts,
                     on=("row_key",)).materialize()

    def paint_self(b: pa.Table) -> pa.Table:
        return pa.table({
            "cluster_id": b["cluster_id"],
            "medoid_key": b["row_key"],
            "score": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
        })

    multi_keys = repeated_keys(rc, "cluster_id").materialize()
    if multi_keys.count() == 0:
        return rc.map_batches(paint_self, batch_format="pyarrow")
    single = semi_join(rc, multi_keys, on="cluster_id", anti=True)
    multi = semi_join(rc, multi_keys, on="cluster_id")
    medoids = multi.groupby("cluster_id").map_groups(
        lambda g: _medoid_group(g, scale), batch_format="pyarrow")
    return medoids.union(
        single.map_batches(paint_self, batch_format="pyarrow"))


def dup_pagerank(clusters, pairs, iters: int = PR_ITERS,
                 scale: int = PR_SCALE, num_partitions: int | None = None):
    """clusters (row_key, rep_key, cluster_id, ...) + verified near-dup
    pairs (a_key, b_key) -> Dataset(row_key, pr): integer fixed-point
    PageRank of every row over the duplicate graph. ``pr`` is rank
    scaled by ``scale`` (divide by it for the conventional value)."""
    if iters < 1:
        raise ValueError("iters must be >= 1 (isolated-node closed form)")
    from raydedup.stages.relational import semi_join

    labels = clusters.select_columns(["row_key", "rep_key", "cluster_id"])
    labels = labels.materialize()
    n_total = labels.count()
    if n_total == 0:
        return clusters.select_columns(["row_key"])  # empty in, empty out
    base = (15 * scale) // (100 * n_total)

    def star_edges(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.invert(
            pc.equal(batch["row_key"], batch["rep_key"])))
        return pa.table({"src": keep["row_key"], "dst": keep["rep_key"],
                         "cluster_id": keep["cluster_id"]})

    star = labels.map_batches(star_edges, batch_format="pyarrow")

    # near edges need their component label: one distributed hash join
    # (pairs are dup-subset-sized; partitions sized by the LARGER side so
    # the label build parallelizes — see BASELINE.md probe-join lesson).
    # An all-empty pairs side would hit Ray 2.49's zero-column hash-join
    # partition bug, so skip the join outright when there are no pairs.
    key_only = labels.select_columns(["row_key", "cluster_id"])
    edges = star
    if pairs.count() > 0:
        n_parts = num_partitions or join_partitions(n_total)
        near = pairs.select_columns(["a_key", "b_key"]).join(
            key_only, join_type="inner", num_partitions=n_parts,
            on=("a_key",), right_on=("row_key",))

        def near_edges(batch: pa.Table) -> pa.Table:
            return pa.table({"src": batch["a_key"], "dst": batch["b_key"],
                             "cluster_id": batch["cluster_id"]})

        edges = star.union(near.map_batches(near_edges,
                                            batch_format="pyarrow"))
    edges = edges.materialize()

    def paint_base(batch: pa.Table) -> pa.Table:
        return pa.table({
            "row_key": batch["row_key"],
            "pr": pa.array(np.full(batch.num_rows, base, dtype=np.int64)),
        })

    if edges.count() == 0:
        # no duplicates anywhere: every node is isolated (closed form)
        return key_only.select_columns(["row_key"]).map_batches(
            paint_base, batch_format="pyarrow")

    ranked = edges.groupby("cluster_id").map_groups(
        lambda g: _component_pagerank(g, iters, scale, n_total),
        batch_format="pyarrow").materialize()

    isolated = semi_join(labels.select_columns(["row_key"]),
                         ranked.select_columns(["row_key"]),
                         on="row_key", anti=True)
    return ranked.union(
        isolated.map_batches(paint_base, batch_format="pyarrow"))


def clustering_agreement(a, b, key_col: str = "row_key",
                         a_col: str = "label_a", b_col: str = "label_b",
                         num_partitions: int | None = None):
    """Pair-counting agreement between two clusterings of the same
    corpus (Rand 1971 — 'do two dedup methods see the same duplicate
    structure?'): given two full labelings ``a = (key, a_col)`` and
    ``b = (key, b_col)``, emit ONE row with the exact pair-counting
    components and the Rand index:

        n            rows in the joined universe
        pairs_both   pairs co-clustered by BOTH   = Σ_ij C(n_ij, 2)
        pairs_a      pairs co-clustered by A      = Σ_i  C(a_i, 2)
        pairs_b      pairs co-clustered by B      = Σ_j  C(b_j, 2)
        pairs_total  C(n, 2)
        rand_index   (2·pairs_both + pairs_total − pairs_a − pairs_b)
                     / pairs_total        (1.0 when n < 2)

    Everything is exact int64 combinatorics (one int division at the
    end — bit-identical to the SQL oracle); C(x, 2) overflow is guarded
    (raises beyond ~4.3e9-member clusters / corpora — switch the
    accumulators to HUGEINT-style Python ints before running there).

    Scale shape (100-TB design): one distributed inner hash join on the
    key, one counting groupby over (label_a, label_b) CELLS with
    per-batch Acero partial counts (cells << rows — bounded by the
    cluster structure, not the corpus), two marginal groupbys over the
    cell table, then scalar sums. The driver sees six numbers.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    def one_row(n, both, sa, sb):
        if n * (n - 1) // 2 >= 2 ** 63:
            raise OverflowError(
                f"clustering_agreement: C({n}, 2) overflows int64")
        total = n * (n - 1) // 2
        ri = 1.0 if total == 0 else (2 * both + total - sa - sb) / total
        return ray.data.from_arrow(pa.table({
            "n": pa.array([n], pa.int64()),
            "pairs_both": pa.array([both], pa.int64()),
            "pairs_a": pa.array([sa], pa.int64()),
            "pairs_b": pa.array([sb], pa.int64()),
            "pairs_total": pa.array([total], pa.int64()),
            "rand_index": pa.array([ri], pa.float64()),
        }))

    a = a.select_columns([key_col, a_col])
    b = b.select_columns([key_col, b_col])
    if num_partitions is None:
        nrows = a.count()
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = min(join_partitions(nrows), max(2, 2 * ncpu))
    joined = a.join(b, join_type="inner", num_partitions=num_partitions,
                    on=(key_col,))

    def cell_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({a_col: batch[a_col], b_col: batch[b_col],
                             "c": pa.array([], pa.int64())})
        g = batch.group_by([a_col, b_col]).aggregate([([], "count_all")])
        # select by NAME (the relational.py convention: positional
        # order of keys vs aggregates differs across pyarrow versions)
        return pa.table({a_col: g[a_col], b_col: g[b_col],
                         "c": g["count_all"]})

    cells = (joined.map_batches(cell_partial, batch_format="pyarrow")
             .groupby([a_col, b_col]).aggregate(Sum("c", alias_name="c"))
             .materialize())
    if cells.count() == 0:
        return one_row(0, 0, 0, 0)

    def comb2_partial(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            c = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            if c.size and int(c.max()) >= 3_037_000_500:
                raise OverflowError(
                    "clustering_agreement: a cluster of "
                    f"{int(c.max())} members overflows int64 C(x, 2)")
            return pa.table({"v": pa.array([int((c * (c - 1) // 2).sum())],
                                           pa.int64()),
                             "s": pa.array([int(c.sum())], pa.int64())})
        return fn

    both_t = cells.map_batches(comb2_partial("c"), batch_format="pyarrow")
    both, n = both_t.sum("v"), both_t.sum("s")
    ma = cells.groupby(a_col).aggregate(Sum("c", alias_name="ca"))
    sa = ma.map_batches(comb2_partial("ca"), batch_format="pyarrow").sum("v")
    mb = cells.groupby(b_col).aggregate(Sum("c", alias_name="cb"))
    sb = mb.map_batches(comb2_partial("cb"), batch_format="pyarrow").sum("v")
    return one_row(int(n), int(both), int(sa), int(sb))
