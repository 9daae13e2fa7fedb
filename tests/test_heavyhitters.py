"""Guaranteed heavy hitters (stages/heavyhitters.py).

The contract is exactness: the output must equal {token : n·(k+1) > N}
with exact counts, for ANY input batching — the Misra-Gries merge-tree
bound guarantees candidate recall, the recount pass guarantees
precision and exact values. Pinned against a brute-force Counter oracle
on Zipf-ish corpora with vocabulary ≫ k (so compression genuinely
fires), plus compress-semantics unit checks.
"""

import random
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from raydedup.stages.heavyhitters import _compress, guaranteed_heavy_hitters
from raydedup.textnorm import simple_tokenize


def _brute(rows, k):
    c = Counter()
    for r in rows:
        c.update(simple_tokenize(r["text"] or ""))
    n_total = sum(c.values())
    return {(t, n) for t, n in c.items() if n * (k + 1) > n_total}


def _run(rows, k, parallelism=8):
    import ray.data

    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    if parallelism:
        ds = ds.repartition(parallelism)
    out = guaranteed_heavy_hitters(ds, k=k)
    got = set()
    for b in out.iter_batches(batch_format="pyarrow"):
        got |= set(zip(b["token"].to_pylist(), b["n"].to_pylist()))
    return got


def _zipf_corpus(seed, n_docs=80, doc_len=60, vocab=2000, hot=6):
    rng = random.Random(seed)
    words = [f"tok{i}" for i in range(vocab)]
    hot_words = [f"hh{i}" for i in range(hot)]
    rows = []
    for d in range(n_docs):
        toks = []
        for _ in range(doc_len):
            if rng.random() < 0.35:
                toks.append(rng.choice(hot_words))
            else:
                toks.append(rng.choice(words))
        rows.append({"doc_id": d, "text": " ".join(toks)})
    return rows


def test_compress_bounds_and_determinism():
    rng = np.random.default_rng(1)
    wt = rng.integers(1, 1000, size=500).astype(np.int64)
    toks = pa.array([f"t{i}" for i in range(500)], pa.string())
    t2, w2 = _compress(toks, wt, 64)
    assert len(t2) <= 64 and (w2 > 0).all()
    # subtracted mass per entry is exactly the (k+1)-th largest weight
    d = np.partition(wt, wt.size - 65)[wt.size - 65]
    kept = {t.as_py(): w for t, w in zip(t2, w2)}
    for t, w in zip(toks, wt):
        if w - d > 0:
            assert kept[t.as_py()] == w - d


def test_matches_brute_with_vocab_much_larger_than_k(ray_session):
    rows = _zipf_corpus(seed=7)
    k = 32  # vocabulary ~2000 ≫ k: every batch genuinely compresses
    assert _run(rows, k) == _brute(rows, k)


def test_batching_invariance(ray_session):
    rows = _zipf_corpus(seed=9, n_docs=60)
    k = 16
    exp = _brute(rows, k)
    assert _run(rows, k, parallelism=1) == exp
    assert _run(rows, k, parallelism=16) == exp
    shuffled = rows[::-1]
    assert _run(shuffled, k, parallelism=8) == exp


def test_exact_when_vocab_below_k(ray_session):
    rows = [{"doc_id": 0, "text": "a a a b b c"},
            {"doc_id": 1, "text": "a b c c c c"}]
    # N=12; k=3 → threshold n*4 > 12 → n ≥ 4: a(4), c(5)
    assert _run(rows, 3, parallelism=2) == {("a", 4), ("c", 5)}


def test_empty_and_null(ray_session):
    rows = [{"doc_id": 0, "text": ""}, {"doc_id": 1, "text": None}]
    assert _run(rows, 8, parallelism=2) == set()


def test_grouped_matches_brute(ray_session):
    from raydedup.stages.heavyhitters import grouped_heavy_hitters

    import ray.data

    rng = random.Random(77)
    words = [f"tok{i}" for i in range(1500)]
    hot = {g: [f"hh{g}{i}" for i in range(4)] for g in ("s0", "s1", "s2")}
    rows = []
    for d in range(90):
        g = f"s{d % 3}"
        toks = [rng.choice(hot[g]) if rng.random() < 0.3
                else rng.choice(words) for _ in range(50)]
        rows.append({"source": g, "text": " ".join(toks)})
    k = 16
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(8)
    got = {(r["group"], r["token"], r["n"])
           for r in grouped_heavy_hitters(ds, "source", k).take_all()}
    cnt, tot = {}, Counter()
    for r in rows:
        for t in simple_tokenize(r["text"]):
            cnt[(r["source"], t)] = cnt.get((r["source"], t), 0) + 1
            tot[r["source"]] += 1
    exp = {(g, t, n) for (g, t), n in cnt.items()
           if n * (k + 1) > tot[g]}
    assert got == exp and len(exp) >= 9


def test_grouped_empty_and_single_group(ray_session):
    from raydedup.stages.heavyhitters import grouped_heavy_hitters

    import ray.data

    rows = [{"source": "s", "text": "a a a b"},
            {"source": "s", "text": "a c"}]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    # N=6, k=2 → n*3 > 6 → n ≥ 3: a(4)
    got = {(r["group"], r["token"], r["n"])
           for r in grouped_heavy_hitters(ds, "source", 2).take_all()}
    assert got == {("s", "a", 4)}
