"""dup_pagerank: brute-force recurrence parity, isolated-node closed
form, empty-pairs short-circuit, leakage-safe split consistency."""

import pyarrow as pa

import ray.data

from raydedup.stages.graph import PR_SCALE, dup_pagerank


def _brute_pagerank(keys, edges, iters=3, scale=PR_SCALE):
    """Reference implementation: the documented integer recurrence over
    the full symmetric edge list, pure python dicts."""
    n = len(keys)
    sym = edges + [(b, a) for a, b in edges]
    deg = {k: 0 for k in keys}
    for a, _ in sym:
        deg[a] += 1
    base = (15 * scale) // (100 * n)
    r = {k: scale // n for k in keys}
    for _ in range(iters):
        acc = {k: 0 for k in keys}
        for a, b in sym:
            acc[b] += r[a] // deg[a]
        r = {k: base + (85 * acc[k]) // 100 for k in keys}
    return r


def _clusters_ds(rows):
    return ray.data.from_arrow(pa.table({
        "row_key": pa.array([r[0] for r in rows]),
        "rep_key": pa.array([r[1] for r in rows]),
        "cluster_id": pa.array([r[2] for r in rows]),
    }))


def _pairs_ds(pairs):
    return ray.data.from_arrow(pa.table({
        "a_key": pa.array([p[0] for p in pairs], pa.string()),
        "b_key": pa.array([p[1] for p in pairs], pa.string()),
    }))


def test_pagerank_matches_brute_recurrence():
    # component 1: exact group {01,02,03} (rep 01) near-linked to rep 04;
    # component 2: reps {05,06}; 07 isolated
    clusters = _clusters_ds([
        ("01", "01", "01"), ("02", "01", "01"), ("03", "01", "01"),
        ("04", "04", "01"), ("05", "05", "05"), ("06", "06", "05"),
        ("07", "07", "07"),
    ])
    pairs = _pairs_ds([("01", "04"), ("05", "06")])
    got = {r["row_key"]: r["pr"]
           for r in dup_pagerank(clusters, pairs).take_all()}
    keys = [f"{i:02d}" for i in range(1, 8)]
    edges = [("02", "01"), ("03", "01"), ("01", "04"), ("05", "06")]
    assert got == _brute_pagerank(keys, edges)
    # the exact-group hub out-ranks its leaves; isolated settles at base
    assert got["01"] > got["02"] == got["03"]
    assert got["07"] == (15 * PR_SCALE) // (100 * 7)


def test_pagerank_all_in_components():
    # no isolated nodes: the anti-join side is empty
    clusters = _clusters_ds([("a", "a", "a"), ("b", "a", "a")])
    got = {r["row_key"]: r["pr"]
           for r in dup_pagerank(clusters, _pairs_ds([])).take_all()}
    assert got == _brute_pagerank(["a", "b"], [("b", "a")])


def test_pagerank_no_dups_closed_form():
    rows = [(f"k{i}", f"k{i}", f"k{i}") for i in range(9)]
    got = dup_pagerank(_clusters_ds(rows), _pairs_ds([])).take_all()
    base = (15 * PR_SCALE) // (100 * 9)
    assert sorted(r["row_key"] for r in got) == sorted(r[0] for r in rows)
    assert all(r["pr"] == base for r in got)


def test_leakage_safe_split_cluster_consistent():
    from raydedup.config import DEFAULT_CONFIG
    from raydedup.pipelines.neardup import near_dup_pipeline
    from raydedup.stages.textstats import split_assign

    texts = []
    for i in range(30):
        body = f"alpha beta gamma delta epsilon zeta {i} common tail words"
        texts.append(body)
        texts.append(body)  # exact dup
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
    }))
    cfg = DEFAULT_CONFIG.with_overrides(stemming=False,
                                        remove_stopwords=False)
    clusters, _ = near_dup_pipeline(docs, cfg, key_cols=["doc_id"])
    out = split_assign(clusters, key_col="cluster_id")
    rows = out.select_columns(["cluster_id", "split"]).take_all()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    assert len({next(iter(s)) for s in by_cluster.values()}) > 1


def test_cluster_medoids_brute_parity():
    from raydedup.config import DEFAULT_CONFIG
    from raydedup.pipelines.neardup import (cluster_assignments,
                                            near_dup_pairs,
                                            signatures_with_rep)
    from raydedup.stages.graph import MEDOID_SCALE, cluster_medoids

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls on the quiet green hills beyond the river").split()
    texts = [" ".join(base)]
    for k in (1, 2, 3):  # drop k leading words: chain of near-dups
        texts.append(" ".join(base[k:]))
    texts += ["totally unrelated content here", "another lone document",
              texts[0]]  # exact dup of doc 0
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
    }))
    cfg = DEFAULT_CONFIG.with_overrides(stemming=False,
                                        remove_stopwords=False)
    assigned = signatures_with_rep(docs, cfg,
                                   key_cols=["doc_id"]).materialize()
    pairs = near_dup_pairs(assigned, cfg).materialize()
    clusters = cluster_assignments(assigned, pairs, cfg)
    got = {r["cluster_id"]: (r["medoid_key"], r["score"])
           for r in cluster_medoids(assigned, clusters).take_all()}

    # brute: reps' hashed shingle sets + cluster labels, python loops
    sigs = {r["row_key"]: set(r["shingle_hashes"])
            for r in assigned.take_all() if r["is_rep"]}
    labels = {r["row_key"]: r["cluster_id"]
              for r in clusters.take_all() if r["row_key"] in sigs}
    by_cluster = {}
    for k, cid in labels.items():
        by_cluster.setdefault(cid, []).append(k)
    want = {}
    for cid, members in by_cluster.items():
        scores = {}
        for a in members:
            s = 0
            for b in members:
                if a == b:
                    continue
                c = len(sigs[a] & sigs[b])
                denom = len(sigs[a]) + len(sigs[b]) - c
                s += (MEDOID_SCALE * c) // denom if denom else 0
            scores[a] = s
        best = sorted(members, key=lambda k: (-scores[k], k))[0]
        want[cid] = (best, scores[best])
    assert got == want
    # the chain has >= 3 reps in one cluster and an interior medoid
    big = max(by_cluster.values(), key=len)
    assert len(big) >= 3


def test_cluster_medoids_all_singletons():
    from raydedup.config import DEFAULT_CONFIG
    from raydedup.pipelines.neardup import (cluster_assignments,
                                            near_dup_pairs,
                                            signatures_with_rep)
    from raydedup.stages.graph import cluster_medoids

    texts = [f"unique document number {i} with its own words {i * 7}"
             for i in range(6)]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
    }))
    cfg = DEFAULT_CONFIG.with_overrides(stemming=False,
                                        remove_stopwords=False)
    assigned = signatures_with_rep(docs, cfg,
                                   key_cols=["doc_id"]).materialize()
    pairs = near_dup_pairs(assigned, cfg).materialize()
    clusters = cluster_assignments(assigned, pairs, cfg)
    got = cluster_medoids(assigned, clusters).take_all()
    assert sorted(r["medoid_key"] for r in got) == [str(i) for i in
                                                    range(6)]
    assert all(r["score"] == 0 and r["cluster_id"] == r["medoid_key"]
               for r in got)


def test_value_deciles_exact_contract():
    import numpy as np

    from raydedup.stages.stats import value_deciles

    vals = [5, 5, 5, 5, 7, 7, 9, 12, 12, 40]  # n=10, with ties
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(10)), pa.int64()),
        "v": pa.array(vals, pa.int64()),
    }))
    got = {r["doc_id"]: r["decile"]
           for r in value_deciles(ds, "v").take_all()}
    # brute: bucket = ceil(k * cume_dist)
    arr = np.array(vals)
    want = {}
    for i, v in enumerate(vals):
        cume = int((arr <= v).sum())
        want[i] = (10 * cume + 10 - 1) // 10
    assert got == want
    # quartiles variant, same rows
    got4 = {r["doc_id"]: r["q"]
            for r in value_deciles(ds, "v", k=4, out="q").take_all()}
    for i, v in enumerate(vals):
        cume = int((arr <= v).sum())
        assert got4[i] == (4 * cume + 10 - 1) // 10


def test_value_deciles_distributed_path_free_form_keys(ray_session):
    """The distributed sorted-block prefix-carry path (forced with
    driver_max_distinct=1) must bucket FREE-FORM STRING keys — the
    cardinality class the old driver-walk contract excluded — and agree
    bucket-for-bucket with the broadcast driver path on the same data."""
    import numpy as np

    from raydedup.stages.stats import value_deciles

    rng = np.random.default_rng(11)
    keys = [f"tok-{rng.integers(0, 60):03d}-{i % 7}" for i in range(400)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(400)), pa.int64()),
        "s": pa.array(keys, pa.string()),
    })).repartition(8)
    driver = {r["doc_id"]: r["decile"]
              for r in value_deciles(ds, "s").take_all()}
    dist = {r["doc_id"]: r["decile"]
            for r in value_deciles(ds, "s",
                                   driver_max_distinct=1).take_all()}
    assert dist == driver
    # brute-force cume_dist on the string ordering
    arr = np.array(keys)
    for i, v in enumerate(keys):
        cume = int((arr <= v).sum())
        assert driver[i] == (10 * cume + 400 - 1) // 400


def test_clustering_agreement_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data

    from raydedup.stages.graph import clustering_agreement

    # A: {1,2,3}{4,5}{6}   B: {1,2}{3,4,5}{6}
    a = ray.data.from_arrow(pa.table({
        "row_key": ["1", "2", "3", "4", "5", "6"],
        "label_a": ["x", "x", "x", "y", "y", "z"]}))
    b = ray.data.from_arrow(pa.table({
        "row_key": ["1", "2", "3", "4", "5", "6"],
        "label_b": ["p", "p", "q", "q", "q", "r"]}))
    row = clustering_agreement(a, b).take_all()[0]
    # both: {1,2} and {4,5} -> 2; A pairs: C(3,2)+C(2,2)=4; B: 1+3=4
    assert row["n"] == 6
    assert row["pairs_both"] == 2
    assert row["pairs_a"] == 4 and row["pairs_b"] == 4
    assert row["pairs_total"] == 15
    # agreements = 2 + (15 - 4 - 4 + 2) = 11
    assert row["rand_index"] == 11 / 15


def test_clustering_agreement_identical_and_disjoint(ray_session):
    import pyarrow as pa
    import ray.data

    from raydedup.stages.graph import clustering_agreement

    keys = [str(i) for i in range(8)]
    same = pa.table({"row_key": keys,
                     "label_a": ["g" + str(i % 2) for i in range(8)]})
    b_same = same.rename_columns(["row_key", "label_b"])
    row = clustering_agreement(ray.data.from_arrow(same),
                               ray.data.from_arrow(b_same)).take_all()[0]
    assert row["rand_index"] == 1.0
    singl = pa.table({"row_key": keys, "label_b": keys})
    row2 = clustering_agreement(
        ray.data.from_arrow(same),
        ray.data.from_arrow(singl).rename_columns(
            ["row_key", "label_b"])).take_all()[0]
    assert row2["pairs_both"] == 0 and row2["pairs_b"] == 0
    # agreement = pairs co-separated by both = total - pairs_a
    assert row2["rand_index"] == (row2["pairs_total"] - row2["pairs_a"]) \
        / row2["pairs_total"]


def test_text_label_groups_full_partition(ray_session):
    import pyarrow as pa
    import ray.data

    from raydedup.stages.exact import text_label_groups

    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["a b", "b a", "a b", "c"]})
    ds = ray.data.from_arrow(t)
    exact = {r["row_key"]: r["label"] for r in
             text_label_groups(ds, canonical=False).take_all()}
    bag = {r["row_key"]: r["label"] for r in
           text_label_groups(ds, canonical=True).take_all()}
    assert len(exact) == 4 and len(bag) == 4  # full partition
    assert exact["1"] == exact["3"] != exact["2"]
    assert bag["1"] == bag["2"] == bag["3"]
    assert exact["4"] == "4" and bag["4"] == "4"  # singleton self-label


class TestMergeComponents:
    """state/unionfind.py:merge_components — incremental CC maintenance
    via label-graph contraction."""

    def _merge(self, labels, edges, backend="driver", parallelism=4):
        import pyarrow as pa
        import ray.data

        from raydedup.state.unionfind import merge_components

        lab = ray.data.from_arrow(pa.table({
            "node": pa.array([n for n, _ in labels], pa.string()),
            "label": pa.array([l for _, l in labels], pa.string()),
        }))
        ed = ray.data.from_arrow(pa.table({
            "a_key": pa.array([a for a, _ in edges], pa.string()),
            "b_key": pa.array([b for _, b in edges], pa.string()),
        }))
        if parallelism and edges:
            ed = ed.repartition(parallelism)
        out = merge_components(lab, ed, backend=backend)
        return {r["node"]: r["label"] for r in out.take_all()}

    def _brute(self, labels, edges):
        from raydedup.state.unionfind import UnionFind

        uf = UnionFind()
        for n, l in labels:
            uf.union(n, l)
        for a, b in edges:
            uf.union(a, b)
        return {n: uf.find(n) for n, _ in labels}

    def test_matches_full_recompute_random(self, ray_session):
        import random

        rng = random.Random(61)
        for trial in range(3):
            nodes = [f"n{i:03d}" for i in range(40)]
            # a valid complete labeling: components of some base edges
            base = [(rng.choice(nodes), rng.choice(nodes))
                    for _ in range(25)]
            from raydedup.state.unionfind import UnionFind

            uf = UnionFind()
            for n in nodes:
                uf.union(n, n)
            for a, b in base:
                uf.union(a, b)
            labels = [(n, uf.find(n)) for n in nodes]
            new = [(rng.choice(nodes), rng.choice(nodes))
                   for _ in range(10)]
            assert self._merge(labels, new) == self._brute(labels, new)

    def test_multibatch_edges_do_not_cross_pair(self, ray_session):
        # regression: per-batch edge counters cross-paired edges from
        # different blocks and glued unrelated clusters
        labels = [(f"x{i}", f"x{i}") for i in range(20)]
        edges = [(f"x{i}", f"x{i + 1}") for i in range(0, 18, 2)]
        got = self._merge(labels, edges, parallelism=6)
        assert got == self._brute(labels, edges)
        # pairs (x0,x1), (x2,x3)... must NOT merge across
        assert got["x0"] == "x0" and got["x2"] == "x2"
        assert got["x3"] == "x2" and got["x19"] == "x19"

    def test_untouched_labels_unchanged_and_empty_edges(self, ray_session):
        labels = [("a", "a"), ("b", "a"), ("c", "c"), ("d", "d")]
        assert self._merge(labels, []) == dict(labels)
        got = self._merge(labels, [("c", "d")])
        assert got == {"a": "a", "b": "a", "c": "c", "d": "c"}

    def test_altstar_backend_agrees(self, ray_session):
        labels = [(f"n{i}", f"n{i}") for i in range(12)]
        edges = [("n0", "n5"), ("n5", "n9"), ("n1", "n2")]
        assert (self._merge(labels, edges, backend="altstar")
                == self._merge(labels, edges, backend="driver"))
