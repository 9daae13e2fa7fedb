"""Improved Consistent Weighted Sampling (ICWS) — weighted MinHash.

Public algorithm: Ioffe 2010, "Improved Consistent Weighted Sampling,
Weighted Minhash and L1 Sketching" (ICDM). For a weighted set
S = {(t, w_t)} each of K independent samples draws, per token,
``r ~ Gamma(2,1)``, ``c ~ Gamma(2,1)``, ``beta ~ U(0,1)`` (all
deterministic functions of (token, k) here), sets

    t_z  = floor(ln(w_t)/r + beta)
    ln_y = r * (t_z - beta)
    ln_a = ln(c) - ln_y - r

and keeps the token minimizing ``ln_a``; the sample identity is the
pair ``(t, t_z)``. Ioffe's theorem: two weighted sets collide on one
sample with probability exactly their weighted Jaccard
``J_w = sum_t min(a_w, b_w) / sum_t max(a_w, b_w)``.

Why this kernel exists next to the exact expansion reduction
(``stages/wjaccard.py``): the expansion trick materializes one element
per token INSTANCE, so its signature cost is linear in the total
multiset mass ``sum w_t``; ICWS is linear in the number of DISTINCT
tokens regardless of multiplicity — the scale path for
heavy-multiplicity bags (counts in the thousands: token histograms,
n-gram profiles, bag-of-clicks), where expansion blows up by the mean
count. Both feed the same banding + EXACT Sigma-min/Sigma-max verify, so
the final pair set is exact either way; only candidate generation is
probabilistic (standard LSH banding guarantees).

Determinism: all randomness is hash-derived (splitmix64/fmix64 chains
over the 64-bit token hash and the sample index), so signatures are
reproducible across processes and runs — the repo-wide contract.
"""

from __future__ import annotations

import numpy as np

from raydedup.functions.minhash import _fmix64_batch

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_C3 = np.uint64(0xD6E8FEB86659FD93)
_C4 = np.uint64(0xA0761D6478BD642F)
_C5 = np.uint64(0xE7037ED1A0B428DB)
_TZ_OFF = np.uint64(1 << 32)  # t_z can be negative; shift before mixing

# (0, 1) uniform from the top 53 bits, strictly inside the open interval
_U_SCALE = float(2.0 ** -53)
_U_EPS = float(2.0 ** -54)


def _uniforms(base: np.ndarray, salt: np.uint64) -> np.ndarray:
    """base uint64 array -> deterministic floats strictly in (0, 1)."""
    h = _fmix64_batch(base + salt)
    return (h >> np.uint64(11)).astype(np.float64) * _U_SCALE + _U_EPS


def icws_samples(tok_hashes: np.ndarray, weights: np.ndarray,
                 doc_offsets: np.ndarray, num_samples: int,
                 seed: int = 0x1C35) -> np.ndarray:
    """Per-document ICWS sample hashes.

    ``tok_hashes``: uint64 (n,) — 64-bit hashes of the distinct tokens,
    concatenated per document. ``weights``: (n,) positive counts.
    ``doc_offsets``: int64 (n_docs + 1,) — CSR offsets into both arrays.
    Returns uint64 (n_docs, num_samples): the k-th column is the 64-bit
    hash of the k-th sample's identity ``(token, t_z, k)``; by Ioffe's
    theorem two documents agree on column k with probability J_w
    (modulo 2^-64 hash collisions). Zero-token documents get the
    per-k empty sentinel (hash of the seed alone), which only ever
    collides with other empty documents.

    Vectorized per column: each of the K samples is one (n,) pass of
    fmix64 chains + Gamma/log arithmetic, then one
    ``minimum.reduceat`` + first-match scan extracts the per-document
    argmin — no Python work per token, peak memory O(n) floats.
    """
    n = int(tok_hashes.size)
    n_docs = int(doc_offsets.size - 1)
    K = int(num_samples)
    out = np.empty((n_docs, K), dtype=np.uint64)
    ks = np.arange(K, dtype=np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the intent
        ksalt = ks * _GOLD
    empty = _fmix64_batch(np.uint64(seed) + ksalt)
    if n == 0:
        out[:] = empty[None, :]
        return out

    th = tok_hashes.astype(np.uint64)
    lnw = np.log(weights.astype(np.float64))
    starts = doc_offsets[:-1]
    lens = np.diff(doc_offsets).astype(np.int64)
    nonempty = lens > 0
    ne_idx = np.flatnonzero(nonempty)
    ne_starts = starts[nonempty]
    rep = np.repeat(np.arange(ne_starts.size, dtype=np.int64),
                    lens[nonempty])
    # per-column derivation keeps peak memory at O(n) floats per
    # temporary instead of O(n * K) — at a quarter-million distinct
    # (doc, token) rows the blocked form would hold ~1 GB of doubles
    for k in range(K):
        base = _fmix64_batch((th + np.uint64(seed)) ^ ksalt[k])
        u1 = _uniforms(base, _C1)
        u2 = _uniforms(base, _C2)
        u3 = _uniforms(base, _C3)
        u4 = _uniforms(base, _C4)
        beta = _uniforms(base, _C5)
        r = -(np.log(u1) + np.log(u2))          # Gamma(2,1)
        ln_c = np.log(-(np.log(u3) + np.log(u4)))
        t_z = np.floor(lnw / r + beta)
        vals = ln_c - r * (t_z - beta) - r
        mins = np.minimum.reduceat(vals, ne_starts)
        # first row in each doc segment achieving the minimum
        eq = np.flatnonzero(vals == mins[rep])
        seg = rep[eq]
        first = eq[np.r_[True, seg[1:] != seg[:-1]]]
        t_u = (t_z[first].astype(np.int64).astype(np.uint64) + _TZ_OFF)
        sample = _fmix64_batch(
            (th[first] ^ _fmix64_batch(t_u + _C3))
            + ksalt[k] + np.uint64(seed))
        col = np.empty(n_docs, dtype=np.uint64)
        col[:] = empty[k]
        col[ne_idx] = sample
        out[:, k] = col
    return out


def icws_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of agreeing samples — the unbiased J_w estimator."""
    return float(np.mean(sig_a == sig_b))
