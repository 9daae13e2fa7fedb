"""Set/sequence similarity kernels matching the reference's ``distance``
library semantics (otmt/timemap_measures.py:359-545).

The reference's ``distance.jaccard``/``distance.sorensen`` coerce their
sequence arguments to sets; ``distance.levenshtein`` is a token-LEVEL edit
distance (absolute count); ``distance.nlevenshtein`` is method-1
(normalized by the longer length). All reimplemented from the public
definitions.

The 0-if-both-empty guard mirrors ``compute_scores_on_distance_measure``
(otmt/timemap_measures.py:359-377).
"""

from __future__ import annotations

import numpy as np


def jaccard_distance(a, b) -> float:
    """1 - |A∩B|/|A∪B| over sets; 0.0 when both empty (reference: the
    distance lib returns 0 for two empty sets)."""
    sa, sb = set(a), set(b)
    union = len(sa | sb)
    if union == 0:
        return 0.0
    return 1.0 - len(sa & sb) / union


def sorensen_distance(a, b) -> float:
    """1 - 2|A∩B|/(|A|+|B|) over sets; 0.0 when both empty."""
    sa, sb = set(a), set(b)
    total = len(sa) + len(sb)
    if total == 0:
        return 0.0
    return 1.0 - 2.0 * len(sa & sb) / total


def levenshtein_tokens(a: list[str], b: list[str]) -> int:
    """Token-level edit distance (absolute), two-row DP vectorized with
    numpy over the inner loop (O(len(a)*len(b)) but constant-factor small)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    # map tokens to ints for fast equality
    vocab: dict[str, int] = {}
    ai = np.array([vocab.setdefault(t, len(vocab)) for t in a], dtype=np.int32)
    bi = np.array([vocab.setdefault(t, len(vocab)) for t in b], dtype=np.int32)
    idx = np.arange(1, len(bi) + 1, dtype=np.int32)
    prev = np.arange(len(bi) + 1, dtype=np.int32)
    chain = np.empty(len(bi) + 1, dtype=np.int32)
    for i, av in enumerate(ai, start=1):
        cur = np.empty_like(prev)
        cur[0] = i
        # cand[j-1] = min(substitution via prev[j-1], deletion via prev[j])
        cand = np.minimum(prev[:-1] + (bi != av), prev[1:] + 1)
        # insertion adds a left-to-right dependency cur[j] = min(cand, cur[j-1]+1);
        # solved in one pass via the d[j] = cur[j]-j prefix-min transform.
        chain[0] = i  # d[0] = cur[0] - 0
        chain[1:] = cand - idx
        cur[1:] = np.minimum.accumulate(chain)[1:] + idx
        prev = cur
    return int(prev[-1])


def nlevenshtein_tokens(a: list[str], b: list[str]) -> float:
    """Method-1 normalized Levenshtein: dist / max(len(a), len(b));
    0.0 when both empty."""
    m = max(len(a), len(b))
    if m == 0:
        return 0.0
    return levenshtein_tokens(a, b) / m


def top_terms(tokens: list[str], k: int = 20) -> list[str]:
    """Top-k terms by (count, token) tuple-sorted DESCENDING — the exact
    tie-break of calculate_term_frequencies (otmt/timemap_measures.py:474-491):
    ties in count are broken by reverse-lexicographic token order."""
    counts: dict[str, int] = {}
    for t in tokens:
        counts[t] = counts.get(t, 0) + 1
    tf = sorted(((c, t) for t, c in counts.items()), reverse=True)
    return [t for _, t in tf[:k]]


def tfintersection(a: list[str], b: list[str], k: int = 20) -> int:
    """Count of a's top-k terms present in b's top-k
    (otmt/timemap_measures.py:493-545)."""
    ta, tb = top_terms(a, k), set(top_terms(b, k))
    return sum(1 for t in ta if t in tb)
