"""CDC chunk dedup stats (stages/cdc.py) vs a brute single-process
replay of the same boundary rule, plus the shift-robustness property
the paradigm exists for."""

import random
from collections import Counter

import pyarrow as pa

import ray.data

from raydedup.stages.cdc import cdc_dup_stats

W, DIV = 6, 32


def _brute_chunks(t):
    codes = [ord(c) % 251 for c in t]
    n = len(codes)
    out, cur = [], ""
    for i, ch in enumerate(t):
        cur += ch
        h = sum(codes[i - j] * (256 ** j)
                for j in range(W) if i - j >= 0)
        if i >= W - 1 and h % DIV == 0:
            out.append(cur)
            cur = ""
    if cur:
        out.append(cur)
    return out


def _brute_stats(rows):
    allc = {i: _brute_chunks(t) for i, t in rows}
    per = Counter()
    for cs in allc.values():
        for c in set(cs):
            per[c] += 1
    return {i: (len(cs), sum(1 for c in cs if per[c] >= 2))
            for i, cs in allc.items()}


def test_cdc_dup_stats_matches_bruteforce(ray_session):
    rng = random.Random(17)
    alpha = "abcdef ghé"  # include a non-ASCII code point
    rows = [(i, "".join(rng.choice(alpha)
                        for _ in range(rng.randrange(0, 250))))
            for i in range(40)]
    rows.append((40, rows[3][1]))          # exact copy
    rows.append((41, "xy-" + rows[5][1]))  # shifted copy
    got = {r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"])
           for r in cdc_dup_stats(ray.data.from_arrow(pa.table({
               "doc_id": [r[0] for r in rows],
               "text": [r[1] for r in rows]}))).take_all()}
    assert got == _brute_stats(rows)


def test_cdc_shift_robustness(ray_session):
    """a prefixed copy re-synchronizes: most chunks still match."""
    rng = random.Random(9)
    base = "".join(rng.choice("abcdefg hij") for _ in range(400))
    out = {r["doc_id"]: r for r in cdc_dup_stats(
        ray.data.from_arrow(pa.table({
            "doc_id": [1, 2],
            "text": [base, "INSERTED PREFIX " + base]}))).take_all()}
    assert out[1]["n_chunks"] > 5
    # all but the first (pre-resync) chunks are shared
    assert out[1]["n_dup_chunks"] >= out[1]["n_chunks"] - 2
    assert out[2]["n_dup_chunks"] >= out[1]["n_chunks"] - 2


def test_cdc_empty_and_short_docs(ray_session):
    out = {r["doc_id"]: r for r in cdc_dup_stats(
        ray.data.from_arrow(pa.table({
            "doc_id": [1, 2, 3],
            "text": ["", "abc", None]}))).take_all()}
    assert out[1] == {"doc_id": 1, "n_chunks": 0, "n_dup_chunks": 0}
    # < w chars -> one whole-doc chunk, no boundary possible
    assert out[2]["n_chunks"] == 1 and out[2]["n_dup_chunks"] == 0
    assert out[3] == {"doc_id": 3, "n_chunks": 0, "n_dup_chunks": 0}
