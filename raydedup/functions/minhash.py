"""MinHash signatures over w-word shingles, vectorized over batches.

The engine's scale replacement for the reference's exact per-pair set
Jaccard (otmt/timemap_measures.py:380-401): K independent min-wise hashes
estimate Jaccard without materializing pairwise token sets; LSH banding over
the signature (raydedup/stages/lsh.py) turns candidate generation into a
groupby instead of an O(n^2) scan (Broder 1997; Leskovec/Rajaraman/Ullman,
"Mining of Massive Datasets" ch.3 — public algorithms).

Permutations are ``h_i(x) = (a_i * x + b_i) mod 2^64`` with a_i ODD — an
exact bijection of the 64-bit space (odd multiplier mod a power of two is
invertible), so each h_i is a genuine permutation of hash values; the
min-wise estimator needs exactly that. Seeded deterministically from the
config seed — same seed ⇒ identical signatures on every worker of every run.

The base shingle hash is the full 64-bit blake2b-64 of the shingle text
(cached per actor). All K mins for all docs in a batch are computed with two
numpy ops (broadcast multiply-add with natural uint64 wraparound +
``np.minimum.reduceat``).
"""

from __future__ import annotations

import hashlib

import numpy as np

_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)


def _blake64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


# token-polynomial shingle hash: h(shingle) = fmix64(poly_C over the
# per-token blake2b-64 hashes). Equivalent in role to hashing the joined
# shingle string, but the blake step runs once per DISTINCT TOKEN
# (Zipf-small) instead of once per distinct shingle, and the polynomial
# combine over sliding windows vectorizes — the per-shingle Python
# dict loop was ~25% of the signature kernel. Order-sensitive (poly) and
# avalanche-mixed (murmur fmix64) — engine-internal; no SQL oracle
# depends on the hash values (oracles compare shingle STRINGS).
_POLY_C = 0x9E3779B97F4A7C15
_M64 = (1 << 64) - 1


def _fmix64_scalar(x: int) -> int:
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & _M64
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & _M64
    x ^= x >> 33
    return x


def _fmix64_batch(x: np.ndarray) -> np.ndarray:
    x = x.copy()
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def shingle_hashes_ref(tokens: list[str], w: int,
                       token_hash=_blake64) -> list[int]:
    """Scalar REFERENCE implementation of the token-polynomial shingle
    hash (mirrors ``word_shingles`` windowing: a doc with 0 < n <= w
    tokens yields one shingle over all its tokens; 0 tokens yield none).
    The vectorized batch path must agree exactly (pytest parity test)."""
    if not tokens:
        return []
    th = [token_hash(t) for t in tokens]

    def poly(seg: list[int]) -> int:
        h = 0
        for v in seg:
            h = (h * _POLY_C + v) & _M64
        return _fmix64_scalar(h)

    if len(tokens) <= w:
        return [poly(th)]
    return [poly(th[i: i + w]) for i in range(len(th) - w + 1)]


class MinHasher:
    """Stateful (cache-carrying) minhash kernel; one per actor."""

    def __init__(self, num_perms: int, seed: int):
        self.num_perms = num_perms
        rng = np.random.default_rng(seed)
        # odd 64-bit multipliers → each h_i is a bijection of Z_2^64
        self.a = (
            rng.integers(0, 1 << 62, size=num_perms, dtype=np.uint64) * np.uint64(2)
            + np.uint64(1)
        )
        self.b = rng.integers(0, 1 << 63, size=num_perms, dtype=np.uint64)
        self._cache: dict[str, int] = {}

    def _base_hashes(self, shingles: list[str]) -> np.ndarray:
        cache = self._cache
        out = np.empty(len(shingles), dtype=np.uint64)
        for i, sh in enumerate(shingles):
            h = cache.get(sh)
            if h is None:
                h = _blake64(sh)
                cache[sh] = h
            out[i] = h
        return out

    def signature(self, shingles: list[str]) -> np.ndarray:
        """(K,) uint64 signature of one shingle list. Empty list → all-ones
        sentinel (an 'empty' signature that never collides with real ones)."""
        if not shingles:
            return np.full(self.num_perms, _EMPTY, dtype=np.uint64)
        x = self._base_hashes(shingles)
        vals = self.a[None, :] * x[:, None] + self.b[None, :]  # uint64 wrap
        return vals.min(axis=0)

    def signatures_batch(self, shingle_lists: list[list[str]]) -> np.ndarray:
        """(n_docs, K) uint64 signatures; chunked segment-min so the
        (shingles, K) permutation matrix stays cache-resident (the
        unchunked version is DRAM-bound and kills multi-task scaling)."""
        n = len(shingle_lists)
        out = np.full((n, self.num_perms), _EMPTY, dtype=np.uint64)
        flat: list[str] = []
        doc_ids: list[int] = []
        for d, shingles in enumerate(shingle_lists):
            flat.extend(shingles)
            doc_ids.extend([d] * len(shingles))
        if not flat:
            return out
        x = self._base_hashes(flat)
        doc_arr = np.array(doc_ids, dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, doc_arr[1:] != doc_arr[:-1]])
        seg_docs = doc_arr[starts]
        bounds = np.r_[starts, len(flat)]
        CHUNK = 2048
        seg_lo = 0
        n_segs = len(starts)
        while seg_lo < n_segs:
            seg_hi = seg_lo + 1
            while (seg_hi < n_segs
                   and bounds[seg_hi + 1] - bounds[seg_lo] <= CHUNK):
                seg_hi += 1
            s_lo, s_hi = bounds[seg_lo], bounds[seg_hi]
            vals = (self.a[None, :] * x[s_lo:s_hi, None]
                    + self.b[None, :])  # uint64 wrap
            mins = np.minimum.reduceat(vals, starts[seg_lo:seg_hi] - s_lo,
                                       axis=0)
            out[seg_docs[seg_lo:seg_hi]] = mins
            seg_lo = seg_hi
        return out

    def shingle_hash_arrays(
        self, token_lists: list[list[str]], w: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batch token-polynomial shingle hashes → (flat uint64 hashes,
        per-doc int64 offsets). blake2b runs only on tokens NOT yet in the
        per-actor cache; instance lookups are a C-speed
        ``pc.dictionary_encode`` + numpy gather; window combines are a
        w-step vectorized polynomial with doc boundaries masked by a
        range diff. Agrees exactly with ``shingle_hashes_ref``."""
        import pyarrow as pa
        import pyarrow.compute as pc

        n_docs = len(token_lists)
        lens = np.array([len(t) for t in token_lists], dtype=np.int64)
        counts = np.where(lens == 0, 0,
                          np.where(lens <= w, 1, lens - w + 1))
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        out = np.empty(int(offsets[-1]), dtype=np.uint64)
        flat_tokens = [t for lst in token_lists for t in lst]
        if not flat_tokens:
            return out, offsets
        enc = pc.dictionary_encode(pa.array(flat_tokens, type=pa.string()))
        idx = enc.indices.to_numpy().astype(np.int64)
        cache = self._cache
        cache_get = cache.get
        dvals = enc.dictionary.to_pylist()
        dh = np.empty(len(dvals), dtype=np.uint64)
        for i, s in enumerate(dvals):
            h = cache_get(s)
            if h is None:
                h = _blake64(s)
                cache[s] = h
            dh[i] = h
        th = dh[idx]
        tok_off = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(lens, out=tok_off[1:])
        C = np.uint64(_POLY_C)
        is_short = (lens > 0) & (lens < w)  # len == w rides the window path
        n_pos = th.size - w + 1
        if n_pos > 0 and bool((lens >= w).any()):
            acc = np.zeros(n_pos, dtype=np.uint64)
            for j in range(w):
                acc = acc * C + th[j: j + n_pos]
            bad = np.zeros(n_pos + 1, dtype=np.int64)
            inner = tok_off[1:-1]
            np.add.at(bad, np.clip(inner - w + 1, 0, n_pos), 1)
            np.add.at(bad, np.clip(inner, 0, n_pos), -1)
            valid = np.cumsum(bad[:-1]) == 0
            long_sel = np.ones(int(offsets[-1]), dtype=bool)
            long_sel[offsets[:-1][is_short]] = False
            out[long_sel] = _fmix64_batch(acc[valid])
        for d in np.flatnonzero(is_short):
            h = 0
            for v in th[tok_off[d]: tok_off[d + 1]]:
                h = (h * _POLY_C + int(v)) & _M64
            out[offsets[d]] = _fmix64_scalar(h)
        return out, offsets

    def signatures_from_flat(self, flat: np.ndarray,
                             offsets: np.ndarray) -> np.ndarray:
        """(flat shingle hashes, per-doc offsets) → (n_docs, K) uint64
        signatures; empty docs get the all-ones sentinel. Same chunked
        segment-min as ``signatures_batch``."""
        n = len(offsets) - 1
        out = np.full((n, self.num_perms), _EMPTY, dtype=np.uint64)
        if flat.size == 0:
            return out
        seg_len = np.diff(offsets)
        nonempty = np.flatnonzero(seg_len > 0)
        starts = offsets[nonempty]
        bounds = np.r_[starts, offsets[-1]]
        CHUNK = 2048
        n_segs = len(nonempty)
        seg_lo = 0
        while seg_lo < n_segs:
            seg_hi = seg_lo + 1
            while (seg_hi < n_segs
                   and bounds[seg_hi + 1] - bounds[seg_lo] <= CHUNK):
                seg_hi += 1
            s_lo, s_hi = bounds[seg_lo], bounds[seg_hi]
            vals = (self.a[None, :] * flat[s_lo:s_hi, None]
                    + self.b[None, :])  # uint64 wrap
            mins = np.minimum.reduceat(vals, starts[seg_lo:seg_hi] - s_lo,
                                       axis=0)
            out[nonempty[seg_lo:seg_hi]] = mins
            seg_lo = seg_hi
        return out

    @staticmethod
    def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())


# ---------------------------------------------------------------------------
# One-permutation hashing (OPH) with rotation densification.
#
# Li, Owen & Zhang 2012 ("One Permutation Hashing") partition the hash
# space into K bins and keep the minimum hash value per bin — ONE pass
# over the shingles instead of K independent permutations, so the
# per-shingle signature cost drops from K multiply-adds (the measured
# memory-bandwidth bottleneck of the k-perm kernel under full task
# concurrency; see BASELINE.md kernel notes) to one modulo + one min.
# Empty bins are filled by rotation densification (Shrivastava & Li 2014,
# "Densifying One Permutation Hashing via Rotation"): an empty bin j
# borrows the value of the nearest non-empty bin t positions to its right
# (circularly), offset by t*C so distinct-distance borrows cannot
# spuriously collide. The densified signature is a valid minwise sketch —
# P[sig_a[i] == sig_b[i]] ≈ J(A, B) — so the LSH banding math
# (1-(1-J^r)^b) is unchanged and band_hashes_from_minhash applies as-is.
#
# Deterministic: bins and values derive only from the 64-bit shingle
# hashes, so identical text ⇒ identical OPH signature on every worker.
# Public algorithms (Li/Owen/Zhang 2012; Shrivastava/Li 2014); no
# reference-repo counterpart — this is the engine's scale path for the
# signature stage, selectable via DedupConfig.minhash_kernel = "oph".
# ---------------------------------------------------------------------------

_OPH_C = np.uint64(0x9E3779B97F4A7C15)  # odd 64-bit offset constant


def oph_signature_ref(hashes: list[int], k: int) -> list[int]:
    """Scalar REFERENCE implementation (pytest parity oracle for the
    vectorized batch path). Empty input → all-ones sentinel row, matching
    MinHasher's empty-doc convention."""
    sig = [int(_EMPTY)] * k
    if not hashes:
        return sig
    filled = [False] * k
    for x in hashes:
        x &= _M64
        b = x % k
        if not filled[b] or x < sig[b]:
            sig[b] = x
            filled[b] = True
    if not any(filled):
        return [int(_EMPTY)] * k
    out = list(sig)
    for j in range(k):
        if filled[j]:
            continue
        t = 1
        while not filled[(j + t) % k]:
            t += 1
        out[j] = (sig[(j + t) % k] + t * int(_OPH_C)) & _M64
    return out


def oph_signatures_from_flat(flat: np.ndarray, offsets: np.ndarray,
                             k: int,
                             values_ascending: bool = False) -> np.ndarray:
    """(flat uint64 shingle hashes, per-doc int64 offsets) → (n_docs, k)
    uint64 densified OPH signatures. Fully vectorized, sort-free when the
    caller's flat array is already value-ascending WITHIN each doc
    (``values_ascending=True`` — signature_batch has that order for free
    from its sorted-unique shingle lexsort): per-(doc, bin) minima fall
    out of one reversed scatter store (descending values ⇒ the LAST write
    per key is the min); rotation densification is a reverse running-min
    over a circularly doubled index plane. Agrees exactly with
    ``oph_signature_ref``."""
    n = len(offsets) - 1
    out = np.full((n, k), _EMPTY, dtype=np.uint64)
    if flat.size == 0 or n == 0:
        return out
    d_ids = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    if not values_ascending:
        order = np.argsort(flat, kind="stable")
        flat, d_ids = flat[order], d_ids[order]
    keys = d_ids * k + (flat % np.uint64(k)).astype(np.int64)
    rk = keys[::-1]
    out.reshape(-1)[rk] = flat[::-1]

    filled = np.zeros(n * k, dtype=bool)
    filled[keys] = True
    filled = filled.reshape(n, k)
    rows = np.flatnonzero(filled.any(axis=1) & ~filled.all(axis=1))
    if rows.size:
        sub = out[rows]
        m = filled[rows]
        big = 2 * k + 1
        col = np.arange(k, dtype=np.int64)
        # nearest non-empty index at-or-right of j in circular space:
        # reverse running-min over [idx, idx+k] with empties masked BIG
        ext = np.concatenate(
            [np.where(m, col[None, :], big),
             np.where(m, col[None, :] + k, big)], axis=1)
        nxt = np.minimum.accumulate(ext[:, ::-1], axis=1)[:, ::-1][:, :k]
        t = (nxt - col[None, :]).astype(np.uint64)
        src = (nxt % k).astype(np.int64)
        borrowed = (np.take_along_axis(sub, src, axis=1)
                    + t * _OPH_C)  # uint64 wrap
        out[rows] = np.where(m, sub, borrowed)
    return out
