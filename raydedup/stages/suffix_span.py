"""Exact long-span duplicate detection (suffix-array substring pass).

north_rule requirement: find pairs of rows sharing a verbatim span of at
least ``cfg.min_span_chars`` characters, collection-wide.

Two-phase Ray-Data design:

1. **Candidate generation via winnowing** (Schleimer/Wilkerson/Aiken,
   SIGMOD 2003): per-row rolling-hash k-gram fingerprints with window
   w = span - k + 1 guarantee that any shared substring of length >= span
   produces at least one IDENTICAL fingerprint on both sides. Exploding
   (fingerprint → row) and grouping by fingerprint is the shuffle; it
   moves 8-byte hashes, never text.
2. **Exact verification via suffix array**: candidate pairs re-read their
   two texts, build a suffix array + Kasai LCP over the sentinel-joined
   pair, and report the true longest common substring; pairs below the
   span threshold are dropped. (Suffix array by prefix doubling,
   O(n log n) numpy — public textbook algorithms.)

The verify step needs the pair's texts: the text store is broadcast once
via ``ray.put`` keyed by row_key (candidate sets are sparse; the 100 TB
path co-partitions pairs with a text checkpoint by key-range instead —
documented partitioning assumption).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

import ray

from raydedup.config import DedupConfig


def suffix_array(s: bytes) -> np.ndarray:
    """Prefix-doubling suffix array of ``s`` (uint8 view), O(n log n)."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    data = np.frombuffer(s, dtype=np.uint8)
    rank = data.astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        # sort by (rank[i], rank[i+k]) — vectorized radix via lexsort
        rank2 = np.full(n, -1, dtype=np.int64)
        rank2[: n - k] = rank[k:]
        sa = np.lexsort((rank2, rank))
        tmp[sa[0]] = 0
        prev = sa[:-1]
        cur = sa[1:]
        neq = (rank[cur] != rank[prev]) | (rank2[cur] != rank2[prev])
        tmp[cur] = np.cumsum(neq)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def lcp_array(s: bytes, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = longest common prefix of sa[i] and sa[i-1]."""
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring(a: str, b: str) -> int:
    """Exact LCS length of two strings via suffix array + LCP over the
    sentinel-joined concatenation."""
    ab = a.encode("utf-8")
    bb = b.encode("utf-8")
    if not ab or not bb:
        return 0
    joined = ab + b"\x00" + bb
    sa = suffix_array(joined)
    lcp = lcp_array(joined, sa)
    split = len(ab)
    best = 0
    sides = sa < split  # suffix starts in a?
    for i in range(1, len(sa)):
        if sides[i] != sides[i - 1]:
            # adjacent suffixes from different docs
            v = int(lcp[i])
            # cap at distance to the sentinel for the a-side suffix
            if v > best:
                best = v
    return best


def _winnow_hashes(text: str, k: int, window: int) -> np.ndarray:
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if data.size < k:
        return np.empty(0, dtype=np.uint64)
    B = np.uint64(1000003)
    powers = B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    n = data.size - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h += data[j : j + n].astype(np.uint64) * powers[j]
    if h.size <= window:
        return np.unique(h.min(keepdims=True))
    w = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(w.min(axis=1))


def long_span_pairs(ds, cfg: DedupConfig, k: int = 48,
                    text_col: str = "text", key_col: str = "row_key"):
    """→ Dataset(a_key, b_key, span_len) for pairs sharing a verbatim span
    of >= cfg.min_span_chars characters. Winnowing guarantee: detection is
    exact for spans >= window + k - 1 == min_span_chars."""
    span = cfg.min_span_chars
    window = span - k + 1
    assert window >= 1, "min_span_chars must exceed k-gram size"

    def fp(batch: pa.Table) -> pa.Table:
        keys, hashes = [], []
        for i in range(batch.num_rows):
            t = batch[text_col][i].as_py() or ""
            hs = _winnow_hashes(t, k, window)
            keys.extend([batch[key_col][i].as_py()] * hs.size)
            hashes.extend(hs.tolist())
        return pa.table(
            {
                "fp": pa.array(np.array(hashes, dtype=np.uint64).view(np.int64))
                if hashes else pa.array([], type=pa.int64()),
                key_col: pa.array(keys, type=pa.string()),
            }
        )

    exploded = ds.map_batches(fp, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        keys = sorted(set(group[key_col].to_pylist()))
        a_out, b_out = [], []
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                a_out.append(keys[i])
                b_out.append(keys[j])
        return pa.table(
            {"a_key": pa.array(a_out, type=pa.string()),
             "b_key": pa.array(b_out, type=pa.string())}
        )

    candidates = exploded.groupby("fp").map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    # candidate pair set is sparse; dedupe driver-side and verify exactly
    pair_set = set()
    for b in candidates.iter_batches(batch_size=65536, batch_format="pyarrow"):
        pair_set.update(zip(b["a_key"].to_pylist(), b["b_key"].to_pylist()))
    if not pair_set:
        return ray.data.from_arrow(
            pa.table({"a_key": pa.array([], type=pa.string()),
                      "b_key": pa.array([], type=pa.string()),
                      "span_len": pa.array([], type=pa.int64())})
        )
    needed = {k for p in pair_set for k in p}

    # broadcast the needed texts (sparse subset)
    def pick(batch: pa.Table) -> pa.Table:
        mask = pa.array([kk in needed for kk in batch[key_col].to_pylist()])
        return batch.filter(mask).select([key_col, text_col])

    texts = {}
    for b in ds.map_batches(pick, batch_format="pyarrow").iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        texts.update(zip(b[key_col].to_pylist(), b[text_col].to_pylist()))
    text_ref = ray.put(texts)

    import ray.data as rd

    pairs_tbl = pa.table(
        {
            "a_key": pa.array([p[0] for p in sorted(pair_set)], type=pa.string()),
            "b_key": pa.array([p[1] for p in sorted(pair_set)], type=pa.string()),
        }
    )

    class Verify:
        def __init__(self, ref, span):
            self.texts = ray.get(ref)
            self.span = span

        def __call__(self, batch: pa.Table) -> pa.Table:
            a_out, b_out, l_out = [], [], []
            for a, b in zip(batch["a_key"].to_pylist(), batch["b_key"].to_pylist()):
                lcs = longest_common_substring(
                    self.texts.get(a, ""), self.texts.get(b, "")
                )
                if lcs >= self.span:
                    a_out.append(a)
                    b_out.append(b)
                    l_out.append(lcs)
            return pa.table(
                {"a_key": pa.array(a_out, type=pa.string()),
                 "b_key": pa.array(b_out, type=pa.string()),
                 "span_len": pa.array(l_out, type=pa.int64())}
            )

    return rd.from_arrow(pairs_tbl).map_batches(
        Verify,
        fn_constructor_args=(text_ref, span),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
        num_cpus=1,
    )
