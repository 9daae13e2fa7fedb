"""unigram_logppl (stages/textstats.py) vs a brute-force corpus LM:
logppl = ln(N) - mean ln(c(token)) over token occurrences; ASCII RE2
token contract; zero-token docs omitted."""

import math
import re

import numpy as np
import pytest

import ray.data

from raydedup.stages.textstats import unigram_logppl

TOK = re.compile(r"[0-9a-z_]+")


def _brute(rows):
    from collections import Counter

    cnt = Counter()
    toks = {}
    for r in rows:
        ts = TOK.findall(r["text"].lower())
        toks[r["doc_id"]] = ts
        cnt.update(ts)
    n = sum(cnt.values())
    out = {}
    for i, ts in toks.items():
        if not ts:
            continue
        s = sum(math.log(cnt[t]) for t in ts)
        out[i] = (len(ts), math.log(n) - s / len(ts))
    return out


def _run(rows, **kw):
    got = unigram_logppl(ray.data.from_items(rows), **kw).take_all()
    return {r["doc_id"]: (r["n_tokens"], r["logppl"]) for r in got}


def test_unigram_logppl_matches_bruteforce(ray_session):
    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        k = int(rng.integers(1, 50))
        rows.append({"doc_id": i, "text": " ".join(
            vocab[int(rng.integers(0, len(vocab)))] for _ in range(k))})
    rows.append({"doc_id": 60, "text": ""})       # zero tokens: omitted
    rows.append({"doc_id": 61, "text": "...!?"})  # punct only: omitted
    expected = _brute(rows)
    got = _run(rows)
    assert set(got) == set(expected)
    assert 60 not in got and 61 not in got
    for i, (n, v) in expected.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(v, abs=1e-9)


def test_unigram_logppl_uniform_corpus(ray_session):
    # every token equally frequent -> logppl = ln(V) exactly, for all docs
    rows = [{"doc_id": i, "text": f"a{i} b{i} c{i}"} for i in range(10)]
    got = _run(rows)
    for n, v in got.values():
        assert n == 3
        assert v == pytest.approx(math.log(30), abs=1e-12)


def test_unigram_logppl_empty_input(ray_session):
    empty = ray.data.from_items([{"doc_id": 1, "text": "x"}]).filter(
        lambda r: False)
    out = unigram_logppl(empty)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "n_tokens", "logppl"}


# ---- assign_shards / shard_manifest (same module) ----

def test_assign_shards_deterministic_and_manifest(ray_session):
    import hashlib

    from raydedup.stages.textstats import assign_shards, shard_manifest

    rows = [{"doc_id": i} for i in range(200)]
    ds = ray.data.from_items(rows)
    got = {r["doc_id"]: r["shard"]
           for r in assign_shards(ds, 8, seed="s9").take_all()}

    def brute(i):
        h = int.from_bytes(
            hashlib.md5(f"s9:{i}".encode()).digest()[:8], "big") >> 4
        return h % 8

    assert got == {i: brute(i) for i in range(200)}
    # stable across runs / block layouts
    got2 = {r["doc_id"]: r["shard"]
            for r in assign_shards(ds.repartition(7), 8,
                                   seed="s9").take_all()}
    assert got2 == got

    man = {r["shard"]: (r["n_docs"], r["min_id"], r["max_id"])
           for r in shard_manifest(ds, 8, seed="s9").take_all()}
    for s, (n, lo, hi) in man.items():
        members = [i for i, sh in got.items() if sh == s]
        assert (n, lo, hi) == (len(members), min(members), max(members))
    assert sum(n for n, _, _ in man.values()) == 200


# ---- bigram_logppl (same module) ----

def test_bigram_logppl_matches_bruteforce(ray_session):
    from collections import Counter

    from raydedup.stages.textstats import bigram_logppl

    rng = np.random.default_rng(47)
    vocab = [f"w{i}" for i in range(15)]
    rows = []
    for i in range(40):
        k = int(rng.integers(1, 30))
        rows.append({"doc_id": i, "text": " ".join(
            vocab[int(rng.integers(0, len(vocab)))] for _ in range(k))})
    rows.append({"doc_id": 40, "text": "solo"})   # 1 token: omitted
    rows.append({"doc_id": 41, "text": ""})       # 0 tokens: omitted

    c2, bis = Counter(), {}
    for r in rows:
        ts = TOK.findall(r["text"].lower())
        b = list(zip(ts, ts[1:]))
        bis[r["doc_id"]] = b
        c2.update(b)
    cctx = Counter()
    for (p, _), c in c2.items():
        cctx[p] += c
    expected = {}
    for i, b in bis.items():
        if not b:
            continue
        s = sum(math.log(cctx[p]) - math.log(c2[(p, n)]) for p, n in b)
        expected[i] = (len(b), s / len(b))

    got = {r["doc_id"]: (r["n_bigrams"], r["logppl2"])
           for r in bigram_logppl(ray.data.from_items(rows)).take_all()}
    assert set(got) == set(expected)
    for i, (n, v) in expected.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(v, abs=1e-9)
    # conditional probabilities are well-normalized: every score >= 0
    assert all(v >= -1e-12 for _, v in got.values())


def test_dsir_logweights_matches_bruteforce(ray_session):
    import hashlib
    from collections import Counter

    import pyarrow as pa

    from raydedup.stages.textstats import dsir_logweights

    B = 64  # small bucket count to force collisions
    rows = [
        (0, "the cat sat on the mat", "t"),
        (1, "the dog ate the cat food", "t"),
        (2, "stack trace null pointer exception", "r"),
        (3, "the cat sat", "r"),
        (4, "merge sort quick sort heap sort", "r"),
        (5, "", "r"),  # zero tokens -> omitted
    ]

    def feats(text):
        toks = TOK.findall(text.lower())
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(f):
        h = int.from_bytes(
            hashlib.md5(b"dsir0:" + f.encode()).digest()[:8], "big") >> 4
        return h % B

    cr = Counter(bucket(f) for _, t, _ in rows for f in feats(t))
    ct = Counter(bucket(f) for _, t, s in rows if s == "t"
                 for f in feats(t))
    nr, nt = sum(cr.values()), sum(ct.values())
    expected = {}
    for i, text, _ in rows:
        fs = feats(text)
        if not fs:
            continue
        s = sum(math.log(ct.get(bucket(f), 0) + 1)
                - math.log(cr[bucket(f)] + 1) for f in fs)
        expected[i] = (len(fs),
                       s + len(fs) * (math.log(nr + B) - math.log(nt + B)))

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [r[0] for r in rows],
        "text": [r[1] for r in rows],
        "src": [r[2] for r in rows]}))
    target = docs.filter(expr="src == 't'")
    got = {r["doc_id"]: r for r in
           dsir_logweights(docs, target, n_buckets=B).take_all()}
    assert set(got) == set(expected)
    for i, (nf, lw) in expected.items():
        assert got[i]["n_feats"] == nf, i
        assert got[i]["log_w"] == pytest.approx(lw, abs=1e-9), i
    # target-membership sanity: target docs score above the
    # out-of-distribution doc
    assert min(got[0]["log_w"], got[1]["log_w"]) > got[2]["log_w"]


def test_effective_tokens_by_group_closed_form(ray_session):
    import pyarrow as pa

    from raydedup.stages.textstats import effective_tokens_by_group

    # text A (3 tokens): 2 copies in s1, 1 in s2; text B (2 tokens):
    # s2 only; text C (1 token): s1 only
    t = pa.table({
        "source": ["s1", "s1", "s2", "s2", "s1"],
        "text": ["a b c", "a b c", "a b c", "x y", "z"]})
    got = {r["source"]: r for r in
           effective_tokens_by_group(
               ray.data.from_arrow(t)).take_all()}
    assert got["s1"]["n_docs"] == 3 and got["s2"]["n_docs"] == 2
    assert got["s1"]["n_tokens"] == 7 and got["s2"]["n_tokens"] == 5
    assert got["s1"]["eff_tokens"] == pytest.approx(3 * 2 / 3 + 1)
    assert got["s2"]["eff_tokens"] == pytest.approx(3 * 1 / 3 + 2)


def test_effective_tokens_no_dups_equals_raw(ray_session):
    import pyarrow as pa

    from raydedup.stages.textstats import effective_tokens_by_group

    t = pa.table({"source": ["s1", "s1", "s2"],
                  "text": ["one two", "three", "four five six"]})
    for r in effective_tokens_by_group(
            ray.data.from_arrow(t)).take_all():
        assert r["eff_tokens"] == pytest.approx(r["n_tokens"])
