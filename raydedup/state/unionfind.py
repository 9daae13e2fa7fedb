"""Connected components over verified duplicate pair edges.

Two interchangeable backends (SURVEY §7.3 step 7):

- ``connected_components_driver``: classic union-find with path compression
  on the driver. Verified edges are SPARSE (near-dup pairs of distinct
  texts), so collecting them is safe far beyond test scale; this is the
  default.
- ``connected_components_distributed``: iterative min-label propagation as
  rounds of ``groupby(node).aggregate(min)`` — the 10^12-row path where
  even the edge list must stay distributed. Converges in O(diameter)
  rounds; near-dup clusters are shallow (diameter rarely > 3), and each
  round is a small shuffle over the edge set only.

Both return the same canonical labeling: every node maps to the
lexicographic MIN row_key of its component (order-independent, stable
under any parallelism — the "cluster ids may differ, pair-set must not"
contract in SURVEY §7.5).
"""

from __future__ import annotations

import pandas as pd


class UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        parent = self.parent
        root = parent.setdefault(x, x)
        while parent[root] != root:
            root = parent[root]
        # path compression
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # canonical: smaller key becomes the root
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra

    def components(self) -> dict[str, str]:
        """node → min-key root for every node ever seen."""
        return {x: self.find(x) for x in list(self.parent)}


def connected_components_driver(pairs_ds, a_col: str = "a_key",
                                b_col: str = "b_key") -> dict[str, str]:
    """Verified-pairs Dataset (a_col, b_col, ...) → {row_key: component_min}.

    Streams edge batches to the driver (iter_batches — never a full
    materialize) and unions incrementally."""
    uf = UnionFind()
    for batch in pairs_ds.select_columns([a_col, b_col]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for a, b in zip(batch[a_col].to_pylist(), batch[b_col].to_pylist()):
            uf.union(a, b)
    return uf.components()


def connected_components_distributed(pairs_ds, max_rounds: int = 50,
                                      num_partitions: int | None = None):
    """Distributed min-label propagation; returns a Dataset
    (node, label) for every node that appears in an edge.

    Each round: label(node) = min(label(node), min over neighbors'
    labels); the neighbor-label lookup is a distributed ``Dataset.join``
    of the edge list against the current labels, the reduction a
    ``groupby(node).min``, and convergence a ``sum`` aggregate over a
    changed-flag column — nothing ever lands on the driver. Each round
    also POINTER-JUMPS (label(node) <- label(label(node)) via a second
    join), so reach doubles per round and ``max_rounds=50`` covers any
    realizable component diameter; a non-converged exit raises instead
    of silently returning split components.
    """
    from ray.data.aggregate import Min, Sum

    # edges both directions: (node, peer)
    def both_dirs(batch):
        import pyarrow as pa

        return pa.table(
            {
                "node": pa.concat_arrays(
                    [batch["a_key"].combine_chunks(), batch["b_key"].combine_chunks()]
                ),
                "peer": pa.concat_arrays(
                    [batch["b_key"].combine_chunks(), batch["a_key"].combine_chunks()]
                ),
            }
        )

    edges = pairs_ds.select_columns(["a_key", "b_key"]).map_batches(
        both_dirs, batch_format="pyarrow"
    ).materialize()
    n_parts = num_partitions or max(2, min(64, edges.num_blocks()))

    # label(node) = min(node, min(peer)) initially
    labels = edges.groupby("node").aggregate(Min("peer", alias_name="label"))

    def clamp(batch):
        import pyarrow.compute as pc

        return batch.set_column(
            batch.schema.get_field_index("label"),
            "label",
            pc.min_element_wise(batch["label"], batch["node"]),
        )

    labels = labels.map_batches(clamp, batch_format="pyarrow").materialize()

    def as_peer_label(batch):
        import pyarrow as pa

        return pa.table({"peer": batch["node"], "peer_label": batch["label"]})

    for _ in range(max_rounds):
        peer_labels = labels.map_batches(as_peer_label, batch_format="pyarrow")
        cand = (
            edges.join(peer_labels, join_type="inner",
                       num_partitions=n_parts, on=("peer",))
            .groupby("node")
            .aggregate(Min("peer_label", alias_name="cand"))
        )
        merged = labels.join(cand, join_type="left_outer",
                             num_partitions=n_parts, on=("node",))

        def relabel(batch):
            import pyarrow as pa
            import pyarrow.compute as pc

            new_label = pc.min_element_wise(
                batch["label"],
                pc.coalesce(batch["cand"], batch["label"]),
            )
            changed = pc.cast(
                pc.not_equal(new_label, batch["label"]), pa.int64()
            )
            return pa.table(
                {"node": batch["node"], "label": new_label, "changed": changed}
            )

        stepped = merged.map_batches(relabel, batch_format="pyarrow")

        # pointer jumping: label(node) <- label(label(node)). One-hop
        # propagation alone needs O(diameter) rounds and the suffix-span
        # hot-fingerprint ROTATED CHAINS produce path graphs of diameter
        # ~m; flattening each round doubles the effective reach, so
        # max_rounds=50 covers any component a physical machine can hold.
        def as_jump(batch):
            import pyarrow as pa

            return pa.table(
                {"label": batch["node"], "jump": batch["label"]}
            )

        jump = stepped.map_batches(as_jump, batch_format="pyarrow")
        flat = stepped.join(jump, join_type="left_outer",
                            num_partitions=n_parts, on=("label",))

        def flatten(batch):
            import pyarrow as pa
            import pyarrow.compute as pc

            nl = pc.min_element_wise(
                batch["label"], pc.coalesce(batch["jump"], batch["label"])
            )
            changed = pc.cast(
                pc.or_(pc.cast(batch["changed"], pa.bool_()),
                       pc.not_equal(nl, batch["label"])),
                pa.int64(),
            )
            return pa.table(
                {"node": batch["node"], "label": nl, "changed": changed}
            )

        new_labels = flat.map_batches(
            flatten, batch_format="pyarrow"
        ).materialize()
        changed = new_labels.aggregate(Sum("changed", alias_name="n"))["n"] or 0
        labels = new_labels.drop_columns(["changed"])
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_distributed did not converge in "
            f"{max_rounds} rounds — component diameter exceeds the "
            f"doubling reach; raise max_rounds"
        )
    return labels


def connected_components_altstar(pairs_ds, max_rounds: int = 30,
                                 num_partitions: int | None = None,
                                 a_col: str = "a_key",
                                 b_col: str = "b_key"):
    """Alternating large-star / small-star connected components
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — a THIRD backend next to driver union-find and min-label
    propagation, with the same contract: Dataset (node, label) for
    every node appearing in a pair, label = lexicographic component
    min.

    Why it exists: label propagation does work proportional to the
    full edge set every round and needs pointer-jumping joins to tame
    diameter; the alternating star operations provably converge in
    O(log^2 n) rounds (O(log n) in practice) on ANY edge structure,
    and every large-star step re-roots each node's larger neighbors at
    the current minimum — so hot nodes shed their neighborhoods
    instead of accumulating them, the built-in skew mitigation. Each
    round costs two groupby-min shuffles + two hash joins over the
    (shrinking) edge set only; rows/texts never enter.

    Mechanics per round over the canonically-oriented edge set
    {(u, v) : u > v}:

    - large-star: for every node x with undirected neighborhood G(x),
      m = min(G(x) + {x}); emit (n, m) for each neighbor n > x.
    - small-star: for every node u over incoming oriented edges
      (u, v < u), m = min neighbors; emit (v, m) for v != m and (u, m).

    Both preserve orientation and connectivity; the fixed point is one
    star per component rooted at its min. Convergence is detected as
    edge-set stability (equal counts + new-minus-old anti-join empty —
    the deduped sets are equal), and a non-converged exit raises
    rather than returning split components.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data
    from ray.data.aggregate import Count, Min, Sum

    key_type = pa.string()
    empty = pa.table({"node": pa.array([], key_type),
                      "label": pa.array([], key_type)})
    if pairs_ds.count() == 0:
        return ray.data.from_arrow(empty)

    def canon(batch: pa.Table) -> pa.Table:
        a = batch[a_col].combine_chunks()
        b = batch[b_col].combine_chunks()
        hi = pc.max_element_wise(a, b)
        lo = pc.min_element_wise(a, b)
        return pa.table({"u": hi, "v": lo}).filter(pc.not_equal(hi, lo))

    raw = pairs_ds.select_columns([a_col, b_col])

    def node_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [batch[a_col].combine_chunks().cast(key_type),
             batch[b_col].combine_chunks().cast(key_type)])})

    # every node ever seen (self-pairs keep their node, like both_dirs
    # does in the label-propagation backend)
    nodes = (raw.map_batches(node_rows, batch_format="pyarrow")
             .groupby("node").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]).materialize())

    def dedupe(es):
        return (es.groupby(["u", "v"]).aggregate(Count(alias_name="_c"))
                .drop_columns(["_c"]))

    edges = dedupe(raw.map_batches(canon, batch_format="pyarrow")
                   ).materialize()
    n_edges = edges.count()
    if n_edges == 0:  # only self-pairs
        return nodes.map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["node"]}),
            batch_format="pyarrow")
    if num_partitions is None:
        # sized so every hash partition is statistically non-empty
        # (Ray 2.49 mishandles all-empty join partitions — see
        # util.join_partitions) and capped at 2x CPUs
        import ray

        from raydedup.util import join_partitions

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = min(join_partitions(n_edges), max(2, 2 * ncpu))
    n_parts = num_partitions

    def both_dirs(batch: pa.Table) -> pa.Table:
        return pa.table({
            "x": pa.concat_arrays([batch["u"].combine_chunks(),
                                   batch["v"].combine_chunks()]),
            "nbr": pa.concat_arrays([batch["v"].combine_chunks(),
                                     batch["u"].combine_chunks()]),
        })

    def large_star(es):
        bid = es.map_batches(both_dirs, batch_format="pyarrow")
        mins = bid.groupby("x").aggregate(Min("nbr", alias_name="m"))

        def clamp(batch: pa.Table) -> pa.Table:
            return pa.table({"x": batch["x"], "m": pc.min_element_wise(
                batch["m"], batch["x"])})

        mins = mins.map_batches(clamp, batch_format="pyarrow")
        joined = bid.join(mins, join_type="inner",
                          num_partitions=n_parts, on=("x",))

        def emit(batch: pa.Table) -> pa.Table:
            keep = pc.greater(batch["nbr"], batch["x"])
            t = batch.filter(keep)
            return pa.table({"u": t["nbr"], "v": t["m"]})

        return dedupe(joined.map_batches(emit, batch_format="pyarrow"))

    def small_star(es):
        mins = es.groupby("u").aggregate(Min("v", alias_name="m"))
        joined = es.join(mins, join_type="inner",
                         num_partitions=n_parts, on=("u",))

        def emit(batch: pa.Table) -> pa.Table:
            v = batch["v"].combine_chunks()
            m = batch["m"].combine_chunks()
            u = batch["u"].combine_chunks()
            keep = pc.not_equal(v, m)
            return pa.table({
                "u": pa.concat_arrays([v.filter(keep), u]),
                "v": pa.concat_arrays([m.filter(keep), m]),
            })

        return dedupe(joined.map_batches(emit, batch_format="pyarrow"))

    for _ in range(max_rounds):
        new_edges = small_star(large_star(edges)).materialize()
        if new_edges.count() == edges.count():

            def mark(batch: pa.Table) -> pa.Table:
                return batch.append_column(
                    "_old", pa.array([1] * batch.num_rows, pa.int64()))

            chk = new_edges.join(
                edges.map_batches(mark, batch_format="pyarrow"),
                join_type="left_outer", num_partitions=n_parts,
                on=("u", "v"))

            def miss(batch: pa.Table) -> pa.Table:
                return pa.table({"miss": pc.cast(
                    pc.is_null(batch["_old"]), pa.int64())})

            missing = chk.map_batches(
                miss, batch_format="pyarrow").aggregate(
                    Sum("miss", alias_name="n"))["n"] or 0
            if missing == 0:
                edges = new_edges
                break
        edges = new_edges
    else:
        raise RuntimeError(
            f"connected_components_altstar did not converge in "
            f"{max_rounds} rounds — this exceeds the proven O(log^2 n) "
            f"bound for any physical input; raise max_rounds")

    # converged: one star per component, rooted at the component min
    stars = edges.map_batches(
        lambda b: pa.table({"node": b["u"], "label": b["v"]}),
        batch_format="pyarrow")
    roots = (edges.groupby("v").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"])
             .map_batches(lambda b: pa.table({"node": b["v"],
                                              "label": b["v"]}),
                          batch_format="pyarrow"))
    known = stars.union(roots)
    out = nodes.join(known, join_type="left_outer",
                     num_partitions=n_parts, on=("node",))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["node"],
            "label": pc.coalesce(batch["label"], batch["node"]),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def components_to_frame(components: dict[str, str]) -> pd.DataFrame:
    return pd.DataFrame(
        {"row_key": list(components.keys()), "component": list(components.values())}
    )


def merge_components(labels_ds, new_edges_ds,
                     node_col: str = "node", label_col: str = "label",
                     a_col: str = "a_key", b_col: str = "b_key",
                     backend: str = "driver"):
    """INCREMENTAL connected-components maintenance: an existing complete
    labeling (every node → min-key label of its component) plus a batch
    of NEW edges → the updated labeling, with work proportional to the
    NEW edges, not the corpus.

    The trick is label-graph contraction: a new edge (a, b) merges the
    COMPONENTS of a and b, so it suffices to project every new edge to
    (label(a), label(b)), run components over that tiny label graph
    (≤ 2·|new edges| nodes), and repaint — one hash join to project
    edges, one components pass bounded by the touched clusters, one
    left join to repaint (untouched labels coalesce through unchanged).
    This is exact: within-cluster connectivity is already witnessed by
    the star edges the labeling encodes, so merged components of
    (star ∪ new) equal components of the label graph expanded back.

    Contract: ``labels_ds`` must cover every endpoint of
    ``new_edges_ds`` (label new nodes with themselves first). Labels
    remain the lexicographic MIN key of each merged component because
    min is associative: min over merged clusters' labels = min over
    their union of keys.

    ``backend``: "driver" (default — the label graph is new-edge-sized,
    orders below the corpus) or "altstar" for the fully distributed
    label-graph pass.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray
    import ray.data

    from raydedup.util import join_partitions

    labels_ds = labels_ds.materialize()
    new_edges_ds = new_edges_ds.materialize()
    if new_edges_ds.count() == 0:
        return labels_ds

    lab = labels_ds.map_batches(
        lambda b: pa.table({"jkey": pc.cast(b[node_col], pa.string()),
                            "_lab": pc.cast(b[label_col], pa.string())}),
        batch_format="pyarrow")
    n_edges = new_edges_ds.count()
    jp = join_partitions(2 * n_edges)

    def sides(b: pa.Table) -> pa.Table:
        a_s = pc.cast(b[a_col], pa.string()).combine_chunks()
        b_s = pc.cast(b[b_col], pa.string()).combine_chunks()
        # edge id must be GLOBALLY unique (a per-batch counter would
        # cross-pair edges of different blocks): the pair key itself is
        eid = pc.binary_join_element_wise(a_s, b_s, "\x1f")
        return pa.table({
            "jkey": pa.concat_arrays([a_s, b_s]),
            "eid": pa.concat_arrays([eid.combine_chunks()
                                     if isinstance(eid, pa.ChunkedArray)
                                     else eid] * 2),
            "side": pa.array([0] * len(a_s) + [1] * len(b_s),
                             pa.int32()),
        })

    # project new edges into label space: (eid, side) rows join labels
    proj = new_edges_ds.map_batches(
        sides, batch_format="pyarrow").join(
        lab, join_type="inner", num_partitions=jp, on=("jkey",))

    def pair_up(group: pa.Table) -> pa.Table:
        if group.num_rows < 2 or "eid" not in group.column_names:
            return pa.table({"a_key": pa.array([], pa.string()),
                             "b_key": pa.array([], pa.string())})
        eids = np.asarray(group["eid"].to_pylist())
        side = group["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, eids))
        se = eids[order]
        both = np.flatnonzero(se[:-1] == se[1:])
        labs = group["_lab"].combine_chunks()
        la = pc.take(labs, pa.array(order[both]))
        lb = pc.take(labs, pa.array(order[both + 1]))
        keep = pc.invert(pc.equal(la, lb)).to_numpy(zero_copy_only=False)
        sel = pa.array(np.flatnonzero(keep))
        return pa.table({"a_key": la.take(sel), "b_key": lb.take(sel)})

    # one Python call per edge-hash bucket, not per edge
    from raydedup.stages.asof import _part_array

    proj = proj.map_batches(
        lambda b: b.append_column(
            "_ep", _part_array(b["eid"], 64)),
        batch_format="pyarrow")
    label_edges = proj.groupby("_ep").map_groups(
        pair_up, batch_format="pyarrow").materialize()

    if label_edges.count() == 0:
        return labels_ds
    if backend == "altstar":
        lab_map = connected_components_altstar(label_edges)
        map_tbl = lab_map.map_batches(
            lambda b: pa.table({"_old": b["node"], "_new": b["label"]}),
            batch_format="pyarrow").materialize()
    else:
        comp = connected_components_driver(label_edges)
        items = sorted(comp.items())
        map_tbl = ray.data.from_arrow(pa.table({
            "_old": pa.array([k for k, _ in items], pa.string()),
            "_new": pa.array([v for _, v in items], pa.string()),
        })).materialize()

    out = labels_ds.map_batches(
        lambda b: pa.table({node_col: pc.cast(b[node_col], pa.string()),
                            "_old": pc.cast(b[label_col], pa.string())}),
        batch_format="pyarrow").join(
        map_tbl, join_type="left_outer",
        num_partitions=join_partitions(labels_ds.count()), on=("_old",))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            node_col: b[node_col],
            label_col: pc.coalesce(b["_new"], b["_old"]),
        })

    return out.map_batches(finish, batch_format="pyarrow")
