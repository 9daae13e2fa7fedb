"""Sorted-neighborhood candidate generation (stages/snm.py) against a
brute-force rank oracle."""

import numpy as np
import pyarrow as pa
import ray.data

from raydedup.stages.snm import _norm_key, sorted_neighborhood_pairs


def _brute(docs, window=3, block_chars=8, key_chars=64):
    rows = []
    for i, t in docs:
        s = " ".join(
            "".join(c if c.isalnum() else " " for c in t.lower()).split())
        if not s:
            continue
        rows.append((s[:block_chars], s[:key_chars], str(i), i))
    out = set()
    buckets: dict[str, list] = {}
    for b, s, ids, i in rows:
        buckets.setdefault(b, []).append((s, ids, i))
    for b, members in buckets.items():
        members.sort()
        for x in range(len(members)):
            for d in range(1, window + 1):
                if x + d < len(members):
                    out.add((members[x][2], members[x + d][2], d))
    return out


def test_snm_pairs_match_brute_force(ray_session):
    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    docs = []
    for i in range(40):
        # force shared buckets: few distinct 8-char prefixes
        head = words[int(rng.integers(0, 3))]
        tail = " ".join(rng.choice(words, size=6))
        docs.append((i, f"{head} {tail}"))
    docs.append((100, ""))          # empty -> excluded
    docs.append((101, "@@@ !!!"))   # normalizes to empty -> excluded
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    }))
    got = {(r["a_id"], r["b_id"], r["gap"])
           for r in sorted_neighborhood_pairs(ds).take_all()}
    assert got == _brute(docs)
    assert got  # the planted shared heads produce pairs
    assert not any(a in (100, 101) or b in (100, 101) for a, b, _ in got)


def test_snm_window_never_crosses_buckets(ray_session):
    docs = [(1, "aaaaaaaa one"), (2, "aaaaaaaa two"),
            (3, "bbbbbbbb one"), (4, "bbbbbbbb two")]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    }))
    got = {(r["a_id"], r["b_id"])
           for r in sorted_neighborhood_pairs(ds, window=3).take_all()}
    assert got == {(1, 2), (3, 4)}


def test_snm_empty_keeps_schema(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["only one doc"], pa.string()),
    }))
    out = sorted_neighborhood_pairs(ds)
    assert set(out.schema().names) == {"a_id", "b_id", "gap"}
    assert out.count() == 0


def test_norm_key_matches_normalize_text_rule():
    arr = pa.array(["  Hello, WORLD!!  x ", "a\tb\nc", None])
    got = _norm_key(arr).to_pylist()
    assert got == ["hello world x", "a b c", None]
