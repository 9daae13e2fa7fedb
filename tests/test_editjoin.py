"""FastSS deletion-variant edit-distance join tests (stages/editjoin.py)."""

import itertools
import random

import numpy as np
import pyarrow as pa
import pytest

import ray

from raydedup.stages.editjoin import _lev_le1, typo_pairs


def _lev(a: str, b: str) -> int:
    """Reference DP Levenshtein."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_lev_le1_kernel_vs_dp_fuzz():
    rng = random.Random(11)
    alpha = "abc"
    pool = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 6)))
            for _ in range(120)]
    for a, b in itertools.combinations(pool, 2):
        if a == b:
            continue
        assert _lev_le1(a, b) == (_lev(a, b) == 1), (a, b)


def test_typo_pairs_exact_pair_set_fuzz(ray_session):
    """Engine pair set == brute-force DP over all distinct-text pairs
    (min-id reps) on a small-alphabet random corpus where lev-1
    collisions of every kind (sub/ins/del) occur naturally."""
    rng = random.Random(5)
    alpha = "ab"
    texts = ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 5)))
             for _ in range(150)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = {(r["a_id"], r["b_id"]) for r in typo_pairs(ds).take_all()}
    rep: dict[str, int] = {}
    for i, t in enumerate(texts):
        rep.setdefault(t, i)
    want = set()
    for x, y in itertools.combinations(sorted(rep), 2):
        if _lev(x, y) == 1:
            want.add((min(rep[x], rep[y]), max(rep[x], rep[y])))
    assert got == want and len(want) > 10


def test_typo_pairs_scope_and_edges(ray_session):
    """max_len exclusion, empty text exclusion, identical-text collapse
    (no dist-0 pairs, min-id rep used), typed empty output."""
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array(["hello", "hellq", "hello", "", None,
                          "x" * 65], pa.string()),
    }))
    rows = typo_pairs(ds, max_len=64).take_all()
    assert {(r["a_id"], r["b_id"]) for r in rows} == {(1, 2)}

    none = typo_pairs(ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["lonely"], pa.string()),
    })))
    assert set(none.schema().names) == {"a_id", "b_id"}
    assert none.count() == 0


def test_typo_pairs_insert_delete_substitute(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["table scan", "table scans",   # insert
                          "tabl scan",                    # delete
                          "table scam",                   # substitute
                          "completely different"], pa.string()),
    }))
    got = {(r["a_id"], r["b_id"]) for r in typo_pairs(ds).take_all()}
    assert got == {(1, 2), (1, 3), (1, 4)}


class TestPairEditStats:
    """pair_edit_stats: token-level DP over an already-verified pair set."""

    def _run(self, pairs, docs):
        import pyarrow as pa
        import ray.data

        from raydedup.stages.editjoin import pair_edit_stats

        p = ray.data.from_arrow(pa.table({
            "a_key": pa.array([a for a, _ in pairs], pa.string()),
            "b_key": pa.array([b for _, b in pairs], pa.string()),
        }))
        d = ray.data.from_arrow(pa.Table.from_pylist(
            [{"doc_id": k, "text": t} for k, t in docs.items()]))
        out = {}
        for r in pair_edit_stats(p, d, key_col="doc_id").take_all():
            out[(r["a_key"], r["b_key"])] = (
                r["n_a"], r["n_b"], r["token_lev"], round(r["nlev"], 9))
        return out

    def test_known_edit_scripts(self, ray_session):
        from raydedup.functions.setsim import levenshtein_tokens

        docs = {
            "1": "a b c d e",
            "2": "a b x d e",        # 1 substitution
            "3": "a b c d e f g h",  # 3 insertions vs doc 1
            "4": "",                 # empty vs doc 1 → 5 deletions
        }
        got = self._run([("1", "2"), ("1", "3"), ("1", "4")], docs)
        assert got[("1", "2")] == (5, 5, 1, round(1 / 5, 9))
        assert got[("1", "3")] == (5, 8, 3, round(3 / 8, 9))
        assert got[("1", "4")] == (5, 0, 5, 1.0)
        # DP function parity on a reordering (order-sensitive!)
        assert levenshtein_tokens("a b c".split(), "c b a".split()) == 2

    def test_empty_pairs(self, ray_session):
        assert self._run([], {"1": "x"}) == {}
