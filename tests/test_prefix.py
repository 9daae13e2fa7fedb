"""Prefix (boilerplate-head) dup grouping vs a brute-force oracle:
short docs, null/empty texts, punctuation-only texts, and multi-block
partitioning."""

import random
import re

import pyarrow as pa

import ray.data

from raydedup.stages.prefix import prefix_dup_groups


def _brute(ids, texts, w):
    pref = {}
    for i, t in zip(ids, texts):
        toks = [x for x in re.split(r"[^0-9a-z_]+", (t or "").lower())
                if x]
        pref[i] = " ".join(toks[:w])
    groups = {}
    for i, p in pref.items():
        groups.setdefault(p, []).append(i)
    out = {}
    for p, members in groups.items():
        if len(members) >= 2:
            m = min(members)
            for i in members:
                out[i] = m
    return out


def test_prefix_dup_groups_vs_brute(ray_session):
    rng = random.Random(3)
    heads = ["the quick brown fox", "lorem ipsum dolor",
             "SELECT * FROM t", ""]
    ids, texts = [], []
    for i in range(300):
        ids.append(i)
        h = heads[rng.randrange(4)]
        tail = " ".join(f"w{rng.randrange(50)}"
                        for _ in range(rng.randrange(0, 8)))
        texts.append(f"{h} {tail}".strip() or None)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(5)
    for w in (2, 4, 10):
        got = {r["doc_id"]: r["cluster_id"] for r in
               prefix_dup_groups(ds, w=w, num_partitions=7).take_all()}
        assert got == _brute(ids, texts, w), w


def test_prefix_dup_groups_all_distinct_empty(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["alpha beta", "gamma delta", "epsilon zeta"],
    }))
    assert prefix_dup_groups(ds, w=5).count() == 0
