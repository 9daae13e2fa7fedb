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
    code-point array — ONE byte per char when the whole batch is ASCII
    (the overwhelming case for \\w-preprocessed text; 4× narrower
    window temporaries and dictionary keys), UTF-32 otherwise.
    ``cache`` maps the shingle STRING → low-64 md5 (the same key the
    scalar ``simhash64`` uses, so both paths share entries); pass a
    persistent per-worker dict so repeated shingles (overwhelming at
    corpus scale) md5-hash once per worker.
    """
    if cache is None:
        cache = {}
    if not texts:
        return np.empty(0, dtype=np.uint64)
    cache_get = cache.get

    # ONE encode of the whole batch + ONE sliding window over the
    # concatenated code points; windows that straddle a doc boundary are
    # masked out by a vectorized range-diff (the per-doc encode/window
    # loop was ~25 us/doc of pure Python overhead). Docs with
    # len < width take a single whole-content shingle (exactly what the
    # scalar slide rule yields; a < width-char key can never collide
    # with a width-char window key).
    #
    # Preprocessing (lowercase + keep word chars) runs as Arrow RE2
    # kernels for ASCII texts — identical output to simhash_preprocess
    # there, since Python \\w restricted to ASCII is [0-9a-z_] after
    # lower() — with the Python regex as the non-ASCII fallback.
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array([t if t is not None else "" for t in texts],
                   type=pa.string())
    kept = pc.replace_substring_regex(
        pc.utf8_lower(arr), pattern=r"[^0-9a-z_]+", replacement="")
    contents = kept.to_pylist()
    for i, t in enumerate(texts):
        if t is not None and not t.isascii():
            contents[i] = simhash_preprocess(t)
    lens = np.array([len(c) for c in contents], dtype=np.int64)
    counts = np.where(lens >= width, lens - width + 1, 1)
    offsets = np.empty(len(texts) + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(counts, out=offsets[1:])
    n_win = int(offsets[-1])
    is_short = lens < width
    joined = "".join(contents)
    if joined.isascii():
        cps = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
        char_bytes, codec = 1, "ascii"
    else:
        cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        char_bytes, codec = 4, "utf-32-le"
    doc_off = np.empty(len(texts) + 1, dtype=np.int64)
    doc_off[0] = 0
    np.cumsum(lens, out=doc_off[1:])
    n_pos = cps.size - width + 1

    # No per-doc dedup: voting every window with weight 1 is identical to
    # weighting per-doc-unique shingles by their counts. Batch-distinct
    # windows are found EXACTLY by one hash-table pass: the boundary-valid
    # window matrix is viewed as fixed_size_binary[4·width] and
    # ``pc.dictionary_encode`` (C++ hash grouping on the raw 16-byte
    # content) returns group codes + first-occurrence dictionary in O(n).
    # This replaced a mix-hash + full 2M-element np.unique SORT + gather
    # verification — the sort was the batch's single largest
    # memory-bandwidth consumer (measured 309 ms → ~50 ms per 2M windows)
    # and collisions are impossible by construction, so the lexsort
    # fallback is gone. The Python md5/cache loop touches only
    # batch-distinct shingles (~100x fewer).
    hashes = np.empty(n_win, dtype=np.uint64)
    if n_pos > 0 and not is_short.all():
        import pyarrow as pa
        import pyarrow.compute as pc

        # a start p is invalid iff its window crosses a doc boundary b:
        # p in [b-width+1, b-1]; overlapping ranges stack in the diff
        bad = np.zeros(n_pos + 1, dtype=np.int64)
        inner = doc_off[1:-1]
        np.add.at(bad, np.clip(inner - width + 1, 0, n_pos), 1)
        np.add.at(bad, np.clip(inner, 0, n_pos), -1)
        valid = np.cumsum(bad[:-1]) == 0
        aw = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(cps, width)[valid]
        )
        wb = char_bytes * width
        fsb = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(wb), len(aw), [None, pa.py_buffer(aw)]
        )
        enc = pc.dictionary_encode(fsb)
        inv = enc.indices.to_numpy(zero_copy_only=False)
        d = enc.dictionary
        dbytes = np.frombuffer(d.buffers()[1], dtype=np.uint8)[
            d.offset * wb : (d.offset + len(d)) * wb].reshape(len(d), wb)
        bh = np.empty(len(d), dtype=np.uint64)
        for i in range(len(d)):
            sh = dbytes[i].tobytes().decode(codec)
            h = cache_get(sh)
            if h is None:
                h = _md5_low64(sh)
                cache[sh] = h
            bh[i] = h
        long_sel = np.ones(n_win, dtype=bool)
        long_sel[offsets[:-1][is_short]] = False
        hashes[long_sel] = bh[inv]
    for i in np.flatnonzero(is_short):
        sh = contents[i]
        h = cache_get(sh)
        if h is None:
            h = _md5_low64(sh)
            cache[sh] = h
        hashes[offsets[i]] = h
    weights = np.ones(n_win, dtype=np.int32)
    return bit_vote_batch(hashes, weights, offsets)


# (256, 8) byte-value → ±1 per bit table for the byte-plane vote
_SIGN_TABLE = (
    2 * ((np.arange(256)[:, None] >> np.arange(8)[None, :]) & 1) - 1
).astype(np.int64)
_SIGN_TABLE_F = _SIGN_TABLE.astype(np.float64)


def bit_vote_batch(hashes: np.ndarray, weights: np.ndarray,
                   offsets: np.ndarray) -> np.ndarray:
    """Weighted 64-bit majority vote per segment → uint64 simhash values.

    Byte-plane bincount formulation: instead of expanding every feature
    to a (S, 64) signed matrix (64-256 B of DRAM traffic per feature —
    bandwidth-bound, which destroyed multi-task scaling), each of the 8
    bytes of the hash is bincounted per doc (9 B/feature/plane) and the
    256-entry ±1 sign table turns byte counts into the 8 bit sums. Exact:
    integer counts stay below 2^53 in the float64 bincount.

    Docs are processed in CHUNKS of ``chunk_docs`` so the per-chunk key
    buffer (~windows-of-512-docs × 8 B) and the bincount bins
    (512 × 256 × 8 B = 1 MB) both stay L2-resident across the 8 plane
    passes — the whole-batch formulation wrote a 16 MB bins array with
    scattered DRAM stores per plane, which was the vote's main
    memory-bandwidth draw (measured ~30% slower single-thread and the
    dominant multi-worker bus contender). The plane byte is written into
    the (zeroed) low byte of the reused key in place (little-endian fast
    path; the | fallback keeps other byte orders correct)."""
    import sys

    n_docs = len(offsets) - 1
    if n_docs == 0:
        return np.empty(0, dtype=np.uint64)
    chunk_docs = 512
    seg_len = np.diff(offsets)
    planes = hashes.view(np.uint8).reshape(-1, 8)
    little = sys.byteorder == "little"
    if not little:
        planes = planes[:, ::-1]  # byte 0 must be the LOW hash byte
    all_ones = bool(weights.size == 0 or (weights == 1).all())
    wf = None if all_ones else weights.astype(np.float64)
    sums = np.empty((n_docs, 64), dtype=np.int64)
    for c0 in range(0, n_docs, chunk_docs):
        c1 = min(c0 + chunk_docs, n_docs)
        w0, w1 = int(offsets[c0]), int(offsets[c1])
        nd = c1 - c0
        doc_key = np.repeat(np.arange(nd, dtype=np.int64),
                            seg_len[c0:c1]) << 8
        kb = doc_key.view(np.uint8).reshape(-1, 8) if little else None
        pl = planes[w0:w1]
        wc = None if all_ones else wf[w0:w1]
        for p in range(8):
            if kb is not None:
                kb[:, 0] = pl[:, p]
                key = doc_key
            else:
                key = doc_key | pl[:, p]
            if all_ones:
                counts = np.bincount(key, minlength=nd * 256)
                counts = counts.reshape(nd, 256)
                sums[c0:c1, 8 * p : 8 * p + 8] = counts @ _SIGN_TABLE
            else:
                counts = np.bincount(key, weights=wc, minlength=nd * 256)
                counts = counts.reshape(nd, 256)
                sums[c0:c1, 8 * p : 8 * p + 8] = (
                    counts @ _SIGN_TABLE_F).astype(np.int64)
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
