"""Kernel unit tests: simhash, minhash, set measures (no Ray needed)."""

import random

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from raydedup.functions.minhash import MinHasher
from raydedup.functions.setsim import (
    jaccard_distance,
    levenshtein_tokens,
    nlevenshtein_tokens,
    sorensen_distance,
    tfintersection,
    top_terms,
)
from raydedup.functions.simhash import (
    hamming_batch,
    hamming_distance,
    simhash64,
    simhash64_batch,
)


# --- simhash ---------------------------------------------------------------

def test_simhash_batch_matches_scalar():
    texts = [
        "The quick brown fox jumps over the lazy dog",
        "the quick brown fox jumped over a lazy dog",
        "", "ok", "word " * 500,
    ]
    batch = simhash64_batch(texts)
    for t, v in zip(texts, batch):
        assert simhash64(t) == int(v)


def test_simhash_batch_fuzz_mixed_unicode():
    """Regression guard for the ASCII fast path: random mixed
    ascii/unicode/whitespace/null inputs (forcing both the 1 B/char and
    the UTF-32 batch encodings, short and long docs, shared windows)
    must match the scalar oracle exactly, with and without a shared
    cache."""
    import random

    rng = random.Random(5)
    pool = "abc XYZ 0_9 !@# \t\n éü日本 ~%"
    texts = ["".join(rng.choice(pool) for _ in range(rng.randrange(0, 300)))
             for _ in range(200)]
    texts += [None, "", "A!B", "____", "¡Hola señor!", "ascii only text"]
    cache: dict = {}
    batch = simhash64_batch(texts, cache=cache)
    again = simhash64_batch(texts, cache=cache)  # warm-cache identical
    assert batch.tolist() == again.tolist()
    for t, v in zip(texts, batch):
        assert simhash64(t if t is not None else "") == int(v), repr(t)
    # all-ascii batch exercises the narrow path end to end
    ascii_texts = [t for t in texts if t is not None and t.isascii()]
    for t, v in zip(ascii_texts, simhash64_batch(ascii_texts)):
        assert simhash64(t) == int(v)


def test_simhash_identity_and_near():
    a = simhash64("The quick brown fox jumps over the lazy dog")
    b = simhash64("The quick brown fox jumps over the lazy dog")
    c = simhash64("The quick brown fox jumps over the lazy cat")
    d = simhash64("completely unrelated text about databases and queries")
    assert a == b
    assert hamming_distance(a, c) < hamming_distance(a, d)


def test_simhash_case_and_punct_invariance():
    # preprocessing lowercases and strips non-word chars (lib defaults)
    assert simhash64("Hello, World!") == simhash64("hello world")


def test_hamming_batch():
    arr = np.array([0, 0xFFFFFFFFFFFFFFFF, 0b1011], dtype=np.uint64)
    out = hamming_batch(arr, np.uint64(0))
    assert out.tolist() == [0, 64, 3]


def test_simhash_cache_consistency():
    cache = {}
    t = ["some shared shingle text here"] * 3
    v1 = simhash64_batch(t, cache=cache)
    v2 = simhash64_batch(t, cache=cache)  # all cache hits
    assert v1.tolist() == v2.tolist()


# --- minhash ---------------------------------------------------------------

def test_minhash_deterministic_across_instances():
    a = MinHasher(128, 4242)
    b = MinHasher(128, 4242)
    s = [f"sh{i}" for i in range(50)]
    assert (a.signature(s) == b.signature(s)).all()


def test_minhash_estimates_jaccard():
    mh = MinHasher(128, 4242)
    rng = random.Random(7)
    errs = []
    for _ in range(30):
        n = rng.randint(50, 300)
        base = [f"w{rng.randrange(10**6)}" for _ in range(n)]
        k = int(n * rng.random())
        other = base[:k] + [f"x{rng.randrange(10**6)}" for _ in range(n - k)]
        tj = len(set(base) & set(other)) / len(set(base) | set(other))
        est = MinHasher.estimate_jaccard(mh.signature(base), mh.signature(other))
        errs.append(abs(tj - est))
    assert np.mean(errs) < 0.05
    assert max(errs) < 0.2


def test_minhash_batch_matches_single():
    mh = MinHasher(64, 1)
    lists = [["a", "b", "c"], [], ["x"], ["a", "b", "c"]]
    batch = mh.signatures_batch(lists)
    for i, sl in enumerate(lists):
        assert (batch[i] == mh.signature(sl)).all()


# --- set measures ----------------------------------------------------------

def test_identity_scores():
    """Reference identity table (tests/timemap_measures_test.py:22-42):
    same doc ⇒ jaccard 0, sorensen 0, levenshtein 0, nlevenshtein 0."""
    toks = ["alpha", "beta", "gamma", "beta"]
    assert jaccard_distance(toks, toks) == 0.0
    assert sorensen_distance(toks, toks) == 0.0
    assert levenshtein_tokens(toks, toks) == 0
    assert nlevenshtein_tokens(toks, toks) == 0.0
    assert tfintersection(toks, toks) == 3  # 3 distinct terms, all shared


def test_set_measures_both_empty():
    assert jaccard_distance([], []) == 0.0
    assert sorensen_distance([], []) == 0.0
    assert nlevenshtein_tokens([], []) == 0.0


def test_jaccard_golden():
    a = ["a", "b", "c", "d"]
    b = ["c", "d", "e", "f"]
    assert jaccard_distance(a, b) == pytest.approx(1 - 2 / 6)
    assert sorensen_distance(a, b) == pytest.approx(1 - 4 / 8)


def _naive_lev(a, b):
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        dp[i][0] = i
    for j in range(len(b) + 1):
        dp[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = min(
                dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                dp[i - 1][j] + 1,
                dp[i][j - 1] + 1,
            )
    return dp[-1][-1]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.sampled_from("abcd"), max_size=15),
    st.lists(st.sampled_from("abcd"), max_size=15),
)
def test_levenshtein_property(a, b):
    assert levenshtein_tokens(a, b) == _naive_lev(a, b)


def test_top_terms_tiebreak():
    # ties in count break by reverse-lexicographic token (tuple sort desc)
    toks = ["b", "a", "c", "a", "b", "c"]
    assert top_terms(toks, 2) == ["c", "b"]


def test_tfintersection_asymmetric_top20():
    a = [f"t{i}" for i in range(30) for _ in range(30 - i)]  # t0 most frequent
    b = [f"t{i}" for i in range(15)]
    # a's top 20 = t0..t19; b's top 20 = all 15 → overlap 15
    assert tfintersection(a, b) == 15


def test_shingle_hash_batch_matches_scalar_reference():
    """The vectorized token-polynomial shingle hash must agree exactly
    with the scalar reference over random token lists, all widths,
    including empty docs and docs shorter than the window."""
    import numpy as np

    from raydedup.functions.minhash import MinHasher, shingle_hashes_ref

    rng = np.random.default_rng(3)
    vocab = [f"tok{j}" for j in range(50)]
    mh = MinHasher(64, 7)
    lists = []
    for _ in range(300):
        n = int(rng.integers(0, 12))
        lists.append([vocab[int(rng.integers(0, 50))] for _ in range(n)])
    for w in (1, 2, 3, 5):
        flat, offs = mh.shingle_hash_arrays(lists, w)
        for d, toks in enumerate(lists):
            got = flat[offs[d]: offs[d + 1]].tolist()
            assert got == shingle_hashes_ref(toks, w), (w, d, toks)
