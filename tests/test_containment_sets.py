"""Asymmetric set-containment self-join (setjoin.set_containment_self_join).

Pinned against a brute-force shingle-set containment oracle in pure
Python (same word_shingles short-doc rule), including the properties
the operator exists for: concatenation containment (inner's shingles
are a subset of any doc that embeds inner verbatim between other
material), ORDERED output (both directions independently), blindness
of Jaccard at extreme size ratios, the min_inner floor, and the
broadcast ≡ partitioned verify-path equality.
"""

import itertools
import random

import pyarrow as pa
import pytest

from raydedup.config import DedupConfig
from raydedup.stages.setjoin import set_containment_self_join
from raydedup.textnorm import simple_tokenize, word_shingles

CFG = DedupConfig().with_overrides(stemming=False, remove_stopwords=False)


def _shset(text: str) -> frozenset:
    toks = simple_tokenize(text)
    if not toks:
        return frozenset()
    return frozenset(word_shingles(toks, 3))


def _brute(rows, t, min_inner):
    out = set()
    sets = {str(r["doc_id"]): _shset(r["text"]) for r in rows}
    for (ka, sa), (kb, sb) in itertools.permutations(sets.items(), 2):
        if len(sa) < min_inner or not sa:
            continue
        c = len(sa & sb)
        if c / len(sa) >= t:
            out.add((ka, kb, c, len(sa), len(sb), round(c / len(sa), 9)))
    return out


def _run(rows, t, min_inner, **kw):
    import ray.data

    ds = ray.data.from_arrow(pa.Table.from_pylist(
        [{"doc_id": str(r["doc_id"]), "text": r["text"]} for r in rows]))
    got = set()
    for b in set_containment_self_join(
            ds, t, CFG, min_inner=min_inner, **kw).iter_batches(
            batch_format="pyarrow"):
        got |= set(zip(
            b["inner_id"].to_pylist(), b["outer_id"].to_pylist(),
            b["common"].to_pylist(), b["n_inner"].to_pylist(),
            b["n_outer"].to_pylist(),
            [round(c, 9) for c in b["containment"].to_pylist()]))
    return got


def _corpus(seed=3):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(80)]
    rows = []
    for fam in range(6):
        inner = " ".join(rng.choice(words) for _ in range(20))
        filler1 = " ".join(rng.choice(words) for _ in range(40))
        filler2 = " ".join(rng.choice(words) for _ in range(40))
        rows.append({"doc_id": fam * 10, "text": inner})
        # inner embedded verbatim inside a 5x larger doc
        rows.append({"doc_id": fam * 10 + 1,
                     "text": f"{filler1} {inner} {filler2}"})
    for i in range(25):
        rows.append({"doc_id": 1000 + i,
                     "text": " ".join(rng.choice(words) for _ in range(30))})
    return rows


def test_matches_brute_oracle(ray_session):
    rows = _corpus()
    brute = _brute(rows, 0.9, 5)
    got = _run(rows, 0.9, 5)
    assert len(brute) >= 6  # every planted embedding found
    assert got == brute


def test_jaccard_blind_pairs_are_found(ray_session):
    # the planted (inner, 5x outer) pairs have Jaccard well below 0.5 —
    # the containment join must still find all of them
    rows = _corpus(seed=4)
    got = _run(rows, 0.9, 5)
    planted = {(str(f * 10), str(f * 10 + 1)) for f in range(6)}
    assert planted <= {(a, b) for a, b, *_ in got}
    for a, b, c, na, nb, _ in got:
        if (a, b) in planted:
            jac = c / (na + nb - c)
            assert jac < 0.5


def test_identical_sets_pair_both_directions(ray_session):
    rows = [{"doc_id": 1, "text": "a b c d e f g h"},
            {"doc_id": 2, "text": "a b c d e f g h"},
            {"doc_id": 3, "text": "q r s t u v"}]
    got = {(a, b) for a, b, *_ in _run(rows, 0.9, 2)}
    assert got == {("1", "2"), ("2", "1")}


def test_min_inner_floor_drops_tiny_sets(ray_session):
    rows = [{"doc_id": 1, "text": "a b c"},          # 1 shingle
            {"doc_id": 2, "text": "a b c d e f g"}]  # contains it
    assert _run(rows, 0.9, 5) == set()
    small = _run(rows, 0.9, 1)
    assert ("1", "2") in {(a, b) for a, b, *_ in small}


def test_partitioned_verify_path_equals_broadcast(ray_session):
    rows = _corpus(seed=5)
    a = _run(rows, 0.9, 5)
    b = _run(rows, 0.9, 5, verify_broadcast_max_rows=0)
    assert a == b


def test_empty_input(ray_session):
    assert _run([], 0.9, 5) == set()
