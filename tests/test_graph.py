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
