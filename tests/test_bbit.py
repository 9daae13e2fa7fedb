"""b-bit minhash sketch + estimator tests (stages/bbit.py).

Brute parity re-derives every permutation minimum from scratch
(md5 + Kirsch-Mitzenmacher derive in pure Python ints) — the same
replay the SQL oracle performs — so the packed-sketch fast path is
pinned to the published construction, not to itself.
"""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

import ray

from raydedup.stages.bbit import bbit_jaccard_pairs, bbit_sketches
from raydedup.stages.decontam import _ngrams


def _brute_sketch(text: str, k: int, b: int, n: int) -> int | None:
    grams = set(_ngrams(text, n))
    if not grams:
        return None
    packed = 0
    for s in range(k):
        best = None
        for g in grams:
            d = hashlib.md5(g.encode()).digest()
            h1 = int.from_bytes(d[8:], "big")
            h2 = int.from_bytes(d[:8], "big")
            v = (h1 + s * h2) % (1 << 64)
            if best is None or v < best:
                best = v
        packed |= (best & ((1 << b) - 1)) << (s * b)
    return packed


def test_bbit_sketches_brute_parity(ray_session):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a b c d e f g h i j k l m n o p",
        "short",          # < 3 tokens: no grams, row drops out
        "",
        "table scan merge join filter sort window batch stream vector",
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = {r["doc_id"]: r["sketch"]
           for r in bbit_sketches(ds, k=16, b=2).take_all()}
    want = {i: _brute_sketch(t, 16, 2, 3) for i, t in enumerate(texts)
            if _brute_sketch(t, 16, 2, 3) is not None}
    assert got == want
    assert 2 not in got and 3 not in got  # gramless rows dropped


def test_bbit_estimator_discriminates(ray_session):
    """Planted near-duplicates (shared prefix, small tail edit) must
    estimate far above unrelated pairs, and identical texts estimate
    exactly 1.0 (all k fields match)."""
    base = " ".join(f"tok{i}" for i in range(60))
    texts = [base,                       # 0
             base + " extra tail words here",  # 1: near-dup of 0
             base,                       # 2: identical to 0
             " ".join(f"other{i}" for i in range(60))]  # 3: unrelated
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    pairs = ray.data.from_arrow(pa.table({
        "a_id": pa.array([0, 0, 0], pa.int64()),
        "b_id": pa.array([1, 2, 3], pa.int64()),
    }))
    got = {r["b_id"]: r for r in bbit_jaccard_pairs(
        ds, pairs, k=32, b=2).take_all()}
    assert got[2]["n_match"] == 32 and got[2]["jaccard_est"] == 1.0
    assert got[1]["jaccard_est"] > 0.5
    assert got[3]["jaccard_est"] < got[1]["jaccard_est"]


def test_bbit_missing_side_dropped_and_validation(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["one two three four", "x"], pa.string()),
    }))
    pairs = ray.data.from_arrow(pa.table({
        "a_id": pa.array([1, 1], pa.int64()),
        "b_id": pa.array([2, 99], pa.int64()),
    }))
    # doc 2 has no 3-grams, doc 99 doesn't exist: both pairs drop
    assert bbit_jaccard_pairs(ds, pairs).count() == 0
    with pytest.raises(ValueError):
        bbit_sketches(ds, k=33, b=2)  # k*b > 64
    with pytest.raises(ValueError):
        bbit_sketches(ds, k=0)
    # boundary: k*b == 64 packs exactly
    assert bbit_sketches(ds, k=32, b=2).count() == 1


def test_bbit_match_count_vs_unpacked_fields(ray_session):
    """n_match equals the per-field equality count of the two packed
    sketches (the XOR kernel is pinned to a direct unpack)."""
    t1 = " ".join(f"w{i}" for i in range(40))
    t2 = " ".join(f"w{i}" for i in range(20)) + " " + " ".join(
        f"z{i}" for i in range(20))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([t1, t2], pa.string()),
    }))
    k, b = 16, 2
    sk = {r["doc_id"]: r["sketch"]
          for r in bbit_sketches(ds, k=k, b=b).take_all()}
    pairs = ray.data.from_arrow(pa.table({
        "a_id": pa.array([1], pa.int64()),
        "b_id": pa.array([2], pa.int64()),
    }))
    row = bbit_jaccard_pairs(ds, pairs, k=k, b=b).take_all()[0]
    mask = (1 << b) - 1
    want = sum(((sk[1] >> (s * b)) & mask) == ((sk[2] >> (s * b)) & mask)
               for s in range(k))
    assert row["n_match"] == want
    c = 1.0 / (1 << b)
    assert row["jaccard_est"] == pytest.approx((want / k - c) / (1 - c))
