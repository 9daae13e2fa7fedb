"""Tiered dedup cascade (pipelines/tiered.py) vs a brute-force oracle:
tier 1 = identical-text groups (min-id rep), tier 2 = exact shingle-set
Jaccard >= t components over reps. Both component backends and both
paint paths must agree bit-for-bit with the brute result."""

import numpy as np

import ray.data

from raydedup.config import DEFAULT_CONFIG
from raydedup.pipelines.tiered import tiered_dedup
from raydedup.stages.setjoin import shingle_sets

CFG = DEFAULT_CONFIG.with_overrides(stemming=False, remove_stopwords=False)
VOCAB = [f"w{i}" for i in range(50)]


def _docs(rng, n=40):
    rows = []
    for i in range(n):
        k = int(rng.integers(5, 30))
        words = [VOCAB[int(rng.integers(0, len(VOCAB)))] for _ in range(k)]
        rows.append({"doc_id": i, "text": " ".join(words)})
    # exact-dup families: byte-identical copies
    for j, i in enumerate(range(0, n, 6)):
        rows.append({"doc_id": n + j, "text": rows[i]["text"]})
    # near-dup variants: one inserted word (high Jaccard, not identical)
    m = len(rows)
    for j, i in enumerate(range(0, n, 5)):
        words = rows[i]["text"].split()
        words.insert(len(words) // 2, "extra")
        rows.append({"doc_id": m + j, "text": " ".join(words)})
    return rows


def _brute(rows, threshold):
    # tier 1: identical-text groups
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], []).append(r["doc_id"])
    rep_of = {}
    n_of = {}
    for ids in by_text.values():
        rep = min(ids)
        for i in ids:
            rep_of[i] = rep
            n_of[i] = len(ids)
    reps = sorted(set(rep_of.values()))
    # tier 2: exact Jaccard over the ENGINE's own shingle sets (the
    # contract under test is the cascade, not the shingler — which has
    # its own brute-force test in test_setjoin.py)
    ds = ray.data.from_items([r for r in rows if r["doc_id"] in reps])
    sets = {r["doc_id"]: frozenset(r["sh"])
            for r in shingle_sets(ds, CFG).take_all()}
    parent = {r: r for r in reps}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x in range(len(reps)):
        for y in range(x + 1, len(reps)):
            a = sets.get(reps[x], frozenset())
            b = sets.get(reps[y], frozenset())
            u = len(a | b)
            if u and len(a & b) / u >= threshold:
                ra, rb = find(reps[x]), find(reps[y])
                parent[max(ra, rb)] = min(ra, rb)
    cluster_of_rep = {r: find(r) for r in reps}
    expected = {}
    for r in rows:
        i = r["doc_id"]
        rep = rep_of[i]
        cluster = cluster_of_rep[rep]
        tier = ("exact" if i != rep
                else ("near" if cluster != i else "keep"))
        expected[i] = (rep, n_of[i], cluster, tier)
    return expected


def _run(rows, threshold, **kw):
    out = tiered_dedup(ray.data.from_items(rows), threshold, CFG, **kw)
    got = {}
    for r in out.take_all():
        got[r["doc_id"]] = (r["exact_rep"], r["n_exact"],
                            r["cluster_id"], r["tier"])
    return got


def test_tiered_matches_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    rows = _docs(rng)
    for threshold in (0.4, 0.7):
        assert _run(rows, threshold) == _brute(rows, threshold)


def test_tiered_backends_agree(ray_session):
    # driver_max=0 forces the distributed components + join-paint path
    # at toy scale; output must be identical to the broadcast path
    rng = np.random.default_rng(3)
    rows = _docs(rng, n=25)
    expected = _brute(rows, 0.5)
    assert _run(rows, 0.5) == expected
    assert _run(rows, 0.5, driver_max=0) == expected


def test_tiered_survivor_invariants(ray_session):
    rng = np.random.default_rng(5)
    rows = _docs(rng, n=30)
    got = _run(rows, 0.5)
    # exactly one 'keep' per cluster, and it is the cluster min id
    by_cluster = {}
    for i, (rep, n, cluster, tier) in got.items():
        by_cluster.setdefault(cluster, []).append((i, tier))
    for cluster, members in by_cluster.items():
        keeps = [i for i, t in members if t == "keep"]
        assert keeps == [cluster]
        assert cluster == min(i for i, _ in members)
    # every exact-dup doc shares its rep's cluster
    for i, (rep, n, cluster, tier) in got.items():
        if tier == "exact":
            assert got[rep][2] == cluster


def test_tiered_empty_and_all_unique(ray_session):
    empty = ray.data.from_items([{"doc_id": 1, "text": "a"}]).filter(
        lambda r: False)
    out = tiered_dedup(empty, 0.5, CFG)
    assert out.count() == 0
    assert set(out.schema().names) == {
        "doc_id", "exact_rep", "n_exact", "cluster_id", "tier"}
    uniq = ray.data.from_items([
        {"doc_id": 1, "text": "one two three four"},
        {"doc_id": 2, "text": "five six seven eight"},
    ])
    got = {r["doc_id"]: r["tier"]
           for r in tiered_dedup(uniq, 0.5, CFG).take_all()}
    assert got == {1: "keep", 2: "keep"}


# ---- tier 3: semantic (tiered_dedup_semantic) ----

def _embs(rows, dim=16):
    """deterministic embeddings: doc_id % 10 picks a one-hot direction,
    so same-group docs have cosine 1.0 and cross-group 0.0 — exactly
    representable, no float-threshold ambiguity."""
    out = []
    for r in rows:
        v = [0.0] * dim
        v[r["doc_id"] % 10] = 1.0
        out.append({"vec_id": r["doc_id"], "embedding": v})
    return out


def _brute_semantic(rows, threshold, sem_threshold):
    base = _brute(rows, threshold)
    surv = sorted(i for i, (_, _, c, t) in base.items() if t == "keep")
    parent = {s: s for s in surv}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x in range(len(surv)):
        for y in range(x + 1, len(surv)):
            cos = 1.0 if surv[x] % 10 == surv[y] % 10 else 0.0
            if cos >= sem_threshold:
                ra, rb = find(surv[x]), find(surv[y])
                parent[max(ra, rb)] = min(ra, rb)
    root3 = {s: find(s) for s in surv}
    expected = {}
    for i, (rep, n, c2, t2) in base.items():
        c3 = root3[c2]
        tier = t2 if t2 != "keep" else ("semantic" if c3 != i else "keep")
        expected[i] = (rep, n, c2, c3, tier)
    return expected


def _run_semantic(rows, threshold, sem_threshold, **kw):
    from raydedup.pipelines.tiered import tiered_dedup_semantic

    out = tiered_dedup_semantic(
        ray.data.from_items(rows), ray.data.from_items(_embs(rows)),
        threshold, sem_threshold, CFG, **kw)
    return {r["doc_id"]: (r["exact_rep"], r["n_exact"], r["near_cluster"],
                          r["cluster_id"], r["tier"])
            for r in out.take_all()}


def test_tiered_semantic_matches_bruteforce(ray_session):
    rng = np.random.default_rng(29)
    rows = _docs(rng)
    expected = _brute_semantic(rows, 0.5, 0.8)
    assert _run_semantic(rows, 0.5, 0.8) == expected
    # all four tiers must actually fire in the fixture
    assert {t for (_, _, _, _, t) in expected.values()} == {
        "exact", "near", "semantic", "keep"}


def test_tiered_semantic_backends_agree(ray_session):
    rng = np.random.default_rng(31)
    rows = _docs(rng, n=25)
    expected = _brute_semantic(rows, 0.5, 0.8)
    assert _run_semantic(rows, 0.5, 0.8) == expected
    # driver_max=0 forces distributed components + join paint end-to-end
    assert _run_semantic(rows, 0.5, 0.8, driver_max=0) == expected


def test_tiered_semantic_no_edges_keeps_tier2(ray_session):
    rng = np.random.default_rng(37)
    rows = _docs(rng, n=12)
    # sem_threshold above any attainable cosine -> tier-2 labels pass
    # through and near_cluster == cluster_id everywhere
    got = _run_semantic(rows, 0.5, 1.5)
    base = _brute(rows, 0.5)
    assert {i: (r, n, c, t) for i, (r, n, c, _, t) in got.items()} == base
    assert all(c2 == c3 for (_, _, c2, c3, _) in got.values())
