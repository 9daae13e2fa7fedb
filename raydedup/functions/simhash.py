"""64-bit Simhash with reference-parity semantics, vectorized over batches.

The reference calls ``simhash.Simhash(value)`` with library defaults
(otmt/metadata_calcluations.py:56-58, otmt/timemap_measures.py:235-247).
Those defaults — reimplemented here from the algorithm's public description
(Charikar, "Similarity estimation techniques from rounding algorithms",
STOC 2002; and the de-facto behavior of the open-source ``simhash``
package) — are:

- string input: lowercase, keep only word characters, slide width-4
  character shingles (always at least one shingle, possibly short/empty),
  count shingle occurrences;
- each unique shingle is md5-hashed; only the LOW 64 bits participate
  (the vote loop masks bits 0..63);
- weighted bit vote: for bit i, sum +count for shingles with bit i set,
  -count otherwise; result bit i is 1 iff the sum is STRICTLY > 0;
- integer input: the value is taken verbatim (used by the chain-scan's
  Simhash(previous_simhash) round-trip, bin/exclude_duplicates:84);
- distance(a, b) = popcount((a ^ b) & (2^64 - 1)).

Vectorization strategy (the hot path at 100 TB): per batch, all documents'
shingles are flattened into one (hash, weight) array pair with per-doc
offsets; the 64-bit → (S, 64) bit expansion, the signed weighting and the
per-doc vote all run as single numpy ops (``np.add.reduceat``). The only
per-row Python work is shingle extraction + md5 of *cache-missing* unique
shingles; actors keep a shingle→hash cache across batches (state lives in
the actor, raydedup/stages/signatures.py).
"""

from __future__ import annotations

import hashlib

import numpy as np

from raydedup.textnorm import char_shingles, simhash_preprocess

_SHIFTS = np.arange(64, dtype=np.uint64)
_POW2 = (np.uint64(1) << _SHIFTS)

_MASK64 = (1 << 64) - 1


def _md5_low64(shingle: str) -> int:
    return int.from_bytes(hashlib.md5(shingle.encode("utf-8")).digest()[8:16], "big")


def simhash64(text: str, width: int = 4, cache: dict[str, int] | None = None) -> int:
    """Reference-parity simhash of one string (slow path / oracle)."""
    content = simhash_preprocess(text)
    counts: dict[str, int] = {}
    for sh in char_shingles(content, width):
        counts[sh] = counts.get(sh, 0) + 1
    v = np.zeros(64, dtype=np.int64)
    for sh, w in counts.items():
        if cache is not None:
            h = cache.get(sh)
            if h is None:
                h = _md5_low64(sh)
                cache[sh] = h
        else:
            h = _md5_low64(sh)
        bits = (np.uint64(h) >> _SHIFTS) & np.uint64(1)
        v += np.where(bits.astype(bool), w, -w)
    return int(((v > 0).astype(np.uint64) * _POW2).sum())


def simhash64_batch(
    texts,
    width: int = 4,
    cache: dict[bytes, int] | None = None,
) -> np.ndarray:
    """Vectorized simhash over a sequence of strings → uint64 ndarray.

    Per-row shingle counting runs as numpy sliding windows over the
    UTF-32 code-point array + a void-dtype ``np.unique`` (C-speed sort)
    instead of a Python char-slicing loop — the measured hot spot.
    ``cache`` maps the 16-byte window representation → low-64 md5; pass a
    persistent per-worker dict so repeated shingles (overwhelming at
    corpus scale) md5-hash once per worker.
    """
    if cache is None:
        cache = {}
    all_hashes: list[int] = []
    weight_arrays: list[np.ndarray] = []
    offsets = np.empty(len(texts) + 1, dtype=np.int64)
    offsets[0] = 0
    cache_get = cache.get
    void16 = np.dtype((np.void, 4 * width))
    count = 0
    for row, text in enumerate(texts):
        content = simhash_preprocess(text if text is not None else "")
        if len(content) <= width:
            # the slide rule's single (short) shingle
            sh = content
            key = sh.encode("utf-32-le")
            h = cache_get(key)
            if h is None:
                h = _md5_low64(sh)
                cache[key] = h
            all_hashes.append(h)
            weight_arrays.append(_ONE)
            count += 1
        else:
            cps = np.frombuffer(content.encode("utf-32-le"), dtype=np.uint32)
            win = np.lib.stride_tricks.sliding_window_view(cps, width)
            keys = np.ascontiguousarray(win).view(void16).ravel()
            uniq, counts = np.unique(keys, return_counts=True)
            for key in uniq:
                kb = key.tobytes()
                h = cache_get(kb)
                if h is None:
                    h = _md5_low64(kb.decode("utf-32-le"))
                    cache[kb] = h
                all_hashes.append(h)
            weight_arrays.append(counts.astype(np.int32))
            count += len(uniq)
        offsets[row + 1] = count
    if not texts:
        return np.empty(0, dtype=np.uint64)

    hashes = np.array(all_hashes, dtype=np.uint64)
    weights = np.concatenate(weight_arrays).astype(np.int32)
    return bit_vote_batch(hashes, weights, offsets)


def bit_vote_batch(hashes: np.ndarray, weights: np.ndarray,
                   offsets: np.ndarray) -> np.ndarray:
    """Weighted 64-bit majority vote per segment → uint64 simhash values.

    Chunked: the (S, 64) expansion is processed in segment ranges of
    ~4096 feature rows so the int8/int32 temporaries stay L2-resident. The
    unchunked version is DRAM-bandwidth-bound, which destroys multi-task
    scaling (measured: 32 concurrent tasks ran 5x slower per task).
    Every segment must be non-empty (reduceat quirk)."""
    n_docs = len(offsets) - 1
    sums = np.empty((n_docs, 64), dtype=np.int32)
    CHUNK = 4096
    doc_lo = 0
    while doc_lo < n_docs:
        doc_hi = doc_lo + 1
        while doc_hi < n_docs and offsets[doc_hi + 1] - offsets[doc_lo] <= CHUNK:
            doc_hi += 1
        s_lo, s_hi = offsets[doc_lo], offsets[doc_hi]
        h = hashes[s_lo:s_hi]
        w = weights[s_lo:s_hi]
        bits = ((h[:, None] >> _SHIFTS[None, :]) & np.uint64(1)).astype(np.int8)
        signed = (2 * bits - 1).astype(np.int32) * w[:, None]
        sums[doc_lo:doc_hi] = np.add.reduceat(
            signed, (offsets[doc_lo:doc_hi] - s_lo)
        )
        doc_lo = doc_hi
    return ((sums > 0).astype(np.uint64) * _POW2[None, :]).sum(axis=1, dtype=np.uint64)


_ONE = np.array([1], dtype=np.int32)


def hamming_distance(a: int, b: int) -> int:
    return ((a ^ b) & _MASK64).bit_count()


def hamming_batch(a: np.ndarray, b) -> np.ndarray:
    """Vectorized popcount(xor). ``b`` may be a scalar or an ndarray."""
    x = np.bitwise_xor(a.astype(np.uint64), np.asarray(b, dtype=np.uint64))
    # numpy >= 2 has bit_count; emulate for 1.x via byte-view popcount LUT
    if hasattr(x, "bit_count"):
        return x.bit_count()
    lut = _POPCOUNT_LUT
    bytes_view = x.view(np.uint8).reshape(*x.shape, 8)
    return lut[bytes_view].sum(axis=-1).astype(np.int32)


_POPCOUNT_LUT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
