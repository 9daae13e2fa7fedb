"""Exact prefix-filter set-similarity join (stages/setjoin.py) vs
brute force: the AllPairs/PPJoin guarantee is recall == 1.0 at the
threshold, so the test recomputes every pairwise Jaccard from the
stage's own shingle sets and demands set equality, not containment."""

import numpy as np
import pyarrow as pa

import ray.data

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.setjoin import (
    hot_shingle_hashes,
    set_similarity_self_join,
    shingle_sets,
)

VOCAB = [f"tok{i}" for i in range(60)]


def _random_docs(rng, n, boiler=""):
    rows = []
    for i in range(n):
        k = int(rng.integers(4, 40))
        words = [VOCAB[int(rng.integers(0, len(VOCAB)))] for _ in range(k)]
        if boiler and rng.random() < 0.9:
            words = boiler.split() + words
        rows.append({"doc_id": f"d{i:04d}", "text": " ".join(words)})
    # planted near-dup families: copy with light edits
    for i in range(0, n, 7):
        words = rows[i]["text"].split()
        j = int(rng.integers(0, max(1, len(words))))
        words.insert(j, "extra")
        rows.append({"doc_id": f"d{i:04d}x", "text": " ".join(words)})
    return rows


def _brute_pairs(rows, threshold):
    ds = ray.data.from_items(rows)
    sets = {
        r["doc_id"]: frozenset(r["sh"])
        for r in shingle_sets(ds, DEFAULT_CONFIG).take_all()
    }
    ids = sorted(sets)
    expected = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            c = len(a & b)
            u = len(a | b)
            if u and c / u >= threshold:
                expected[(ids[x], ids[y])] = (c, len(a), len(b))
    return expected


def _run(rows, threshold, **kw):
    ds = ray.data.from_items(rows)
    got = {}
    for r in set_similarity_self_join(ds, threshold, DEFAULT_CONFIG,
                                      **kw).take_all():
        got[(r["a_id"], r["b_id"])] = (r["common"], r["na"], r["nb"])
        u = r["na"] + r["nb"] - r["common"]
        assert r["jaccard"] == r["common"] / u
    return got


def test_setjoin_matches_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    rows = _random_docs(rng, 60)
    for threshold in (0.3, 0.5, 0.9):
        assert _run(rows, threshold) == _brute_pairs(rows, threshold)


def test_setjoin_hot_shingle_skew(ray_session):
    # 90% of docs share one boilerplate prefix: the hot-last order must
    # keep those shingles out of prefixes, and the result stays exact.
    rng = np.random.default_rng(13)
    boiler = "the quick brown fox jumps over the lazy dog again"
    rows = _random_docs(rng, 50, boiler=boiler)
    expected = _brute_pairs(rows, 0.4)
    assert _run(rows, 0.4) == expected
    # hot_k=0 disables frequency ordering entirely: still exact (any
    # total order satisfies the prefix theorem), just slower
    assert _run(rows, 0.4, hot_k=0) == expected


def test_hot_shingle_hashes_topk(ray_session):
    rows = [{"doc_id": f"p{i}", "text": "alpha beta gamma delta "
             + f"uniq{i} uniq{i}b uniq{i}c"} for i in range(20)]
    sets = shingle_sets(ray.data.from_items(rows), DEFAULT_CONFIG)
    sets = sets.materialize()
    hot = hot_shingle_hashes(sets, 3)
    assert hot.size == 3 and hot.dtype == np.uint64
    assert np.array_equal(hot, np.sort(hot))
    # brute: count document frequency of every shingle hash
    from collections import Counter

    cnt = Counter()
    for r in sets.take_all():
        cnt.update(set(r["sh"]))
    top = sorted(cnt.values(), reverse=True)[:3]
    assert sorted((cnt[int(h)] for h in hot), reverse=True) == top


def test_setjoin_empty_and_no_match(ray_session):
    empty = ray.data.from_items([{"doc_id": "a", "text": ""}]).filter(
        lambda r: False)
    out = set_similarity_self_join(empty, 0.5, DEFAULT_CONFIG)
    assert out.count() == 0
    disjoint = ray.data.from_items([
        {"doc_id": "a", "text": "one two three four five"},
        {"doc_id": "b", "text": "six seven eight nine ten"},
    ])
    out = set_similarity_self_join(disjoint, 0.5, DEFAULT_CONFIG)
    assert out.count() == 0
    assert set(out.schema().names) == {
        "a_id", "b_id", "common", "na", "nb", "jaccard"}


def test_similar_docs_topk_vs_bruteforce(ray_session):
    """Partial-top-k + final reduce must equal brute-force shingle
    Jaccard ranking (jaccard desc, id asc), self excluded, zero-overlap
    rows never returned."""
    import numpy as np

    from raydedup.functions.minhash import MinHasher
    from raydedup.stages.setjoin import similar_docs_topk
    from raydedup.textnorm import full_tokenize

    cfg = DEFAULT_CONFIG.with_overrides(stemming=False,
                                        remove_stopwords=False)
    rng = np.random.default_rng(17)
    vocab = ["red", "blue", "green", "lime", "teal", "pink", "gray"]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    texts[5] = texts[0]                     # exact copy of a query doc
    texts[7] = texts[1] + " extra tail here"
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = [(r["query_id"], r["doc_id"], r["rank"], r["jaccard"])
           for r in similar_docs_topk(ds, [0, 1, 2], k=4,
                                      cfg=cfg).take_all()]

    hasher = MinHasher(1, cfg.minhash_seed)
    shs = []
    for t in texts:
        toks = full_tokenize(t, stemming=False, remove_stopwords=False)
        flat, offs = hasher.shingle_hash_arrays(
            [toks], cfg.minhash_shingle_words)
        shs.append(set(flat.tolist()))
    expect = []
    for q in (0, 1, 2):
        scored = []
        for d in range(40):
            if d == q:
                continue
            c = len(shs[q] & shs[d])
            if c:
                scored.append((c / (len(shs[q] | shs[d])), -d))
        scored.sort(reverse=True)
        for rk, (j, nd) in enumerate(scored[:4], 1):
            expect.append((q, -nd, rk, j))
    assert sorted(got) == sorted(expect)


def test_temporal_novelty_vs_bruteforce(ray_session):
    """First-introduction counts equal the brute sequential-set scan;
    the first doc is 100% novel; an exact late copy is 0% novel."""
    import numpy as np

    from raydedup.functions.minhash import MinHasher
    from raydedup.stages.setjoin import temporal_novelty
    from raydedup.textnorm import full_tokenize

    cfg = DEFAULT_CONFIG.with_overrides(stemming=False,
                                        remove_stopwords=False)
    rng = np.random.default_rng(23)
    vocab = ["ant", "bee", "cat", "dog", "elk", "fox"]
    texts = [" ".join(rng.choice(vocab, 25)) for _ in range(20)]
    texts[15] = texts[2]  # exact late copy -> zero novelty
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = {r["doc_id"]: (r["n_grams"], r["n_first_seen"])
           for r in temporal_novelty(ds, cfg=cfg).take_all()}

    hasher = MinHasher(1, cfg.minhash_seed)
    seen: set = set()
    for d, t in enumerate(texts):
        toks = full_tokenize(t, stemming=False, remove_stopwords=False)
        flat, _ = hasher.shingle_hash_arrays(
            [toks], cfg.minhash_shingle_words)
        s = set(flat.tolist())
        first = len(s - seen)
        seen |= s
        assert got[d] == (len(s), first), d
    assert got[15][1] == 0
    assert got[0][0] == got[0][1]


def test_setjoin_distributed_verify_path(ray_session):
    """Force the pair-exploded join + partition-sweep verify (the path
    corpora above ``verify_broadcast_max_rows`` take) and demand the
    exact same pair set as the broadcast path / brute force."""
    rng = np.random.default_rng(23)
    rows = _random_docs(rng, 60)
    for threshold in (0.4, 0.8):
        expected = _brute_pairs(rows, threshold)
        assert _run(rows, threshold,
                    verify_broadcast_max_rows=0) == expected


def test_setjoin_distributed_verify_int_ids(ray_session):
    """Distributed verify with int64 ids (pid building casts to string;
    id columns keep their native type end-to-end)."""
    rng = np.random.default_rng(29)
    texts = [" ".join(VOCAB[int(rng.integers(0, len(VOCAB)))]
                      for _ in range(20)) for _ in range(30)]
    texts[11] = texts[3]
    texts[17] = texts[3] + " extra"
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(30)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    big = set_similarity_self_join(ds, 0.5, DEFAULT_CONFIG,
                                   verify_broadcast_max_rows=0)
    small = set_similarity_self_join(ds, 0.5, DEFAULT_CONFIG)
    key = lambda t: sorted((r["a_id"], r["b_id"], r["common"],
                            r["na"], r["nb"]) for r in t.take_all())
    got = key(big)
    assert got == key(small)
    assert any(a == 3 or b == 3 for a, b, *_ in got)
    sch = big.schema()
    assert dict(zip(sch.names, sch.types))["a_id"] == pa.int64()
