"""b-bit minhash Jaccard estimation (Li & Konig, WWW 2010).

Signature COMPRESSION — the missing point on the sketch-size axis
between full 64-bit minhash signatures (stages/signatures.py) and the
KMV set sketch (collection.py): keep only the lowest ``b`` bits of each
of ``k`` permutation minima, a 64/b-fold smaller sketch, and correct
the collision bias in the estimator. With C = 2^-b,

    E[match fraction] = C + (1 - C) * J   =>   J_hat = (M/k - C)/(1 - C)

per Li & Konig's Eq. (5) at their r1 = r2 = J boundary case (the
standard practical form). At b = 2, k = 16 the whole sketch is ONE
uint64 per document — pairs estimate Jaccard from a single XOR +
field-count, no shingle payloads cross any join.

Determinism contract (the repo's md5-low64 convention, same as
``collection.source_similarity_kmv``): a gram hashes ONCE with md5;
h1 = digest bytes 8..16 big-endian (SQL ``substr(md5(g), 17, 16)``),
h2 = bytes 0..8 (``substr(md5(g), 1, 16)``); permutation ``s`` uses the
Kirsch-Mitzenmacher derived value (h1 + s * h2) mod 2^64 — so a DuckDB
oracle replays every minimum, every b-bit field, and the estimate
bit-for-bit, while the engine pays ONE md5 per distinct gram (not k).

Scale shape: sketches are built in one vectorized pass per batch
(per-batch gram-digest cache, one (grams x k) uint64 derive + one
``np.minimum.reduceat`` per batch — no per-permutation re-hash), only
(id, uint64) rows cross the two pair joins, and join partitions are
sized by ``util.join_partitions`` (the Ray 2.49 empty-partition
gotcha). Nothing corpus-scale lands on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.stages.decontam import _ngrams

_U64 = 0xFFFFFFFFFFFFFFFF


def bbit_sketches(ds, id_col: str = "doc_id", text_col: str = "text",
                  k: int = 16, b: int = 2, n: int = 3):
    """rows -> Dataset(id_col, sketch: uint64) for every row with at
    least one word n-gram (rows without grams drop out — the same rule
    as the KMV sketch's zero-gram sources). Requires k * b <= 64 so
    the sketch packs into one value; field ``s`` occupies bits
    [s*b, (s+1)*b)."""
    if k < 1 or b < 1 or k * b > 64:
        raise ValueError("need k >= 1, b >= 1 and k * b <= 64")
    mask = np.uint64((1 << b) - 1)
    shifts = (np.arange(k, dtype=np.uint64) * np.uint64(b))
    seeds = np.arange(k, dtype=np.uint64)

    def sketch(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(
            batch[text_col].combine_chunks(), "").to_pylist()
        cache: dict[str, tuple[int, int]] = {}
        keep, counts, h1s, h2s = [], [], [], []
        for i, t in enumerate(texts):
            grams = set(_ngrams(t, n))
            if not grams:
                continue
            keep.append(i)
            counts.append(len(grams))
            for g in grams:
                hv = cache.get(g)
                if hv is None:
                    d = hashlib.md5(g.encode()).digest()
                    hv = (int.from_bytes(d[8:], "big"),
                          int.from_bytes(d[:8], "big"))
                    cache[g] = hv
                h1s.append(hv[0])
                h2s.append(hv[1])
        if not keep:
            return pa.table({id_col: pa.array([],
                                              batch[id_col].type),
                             "sketch": pa.array([], pa.uint64())})
        h1 = np.array(h1s, np.uint64)
        h2 = np.array(h2s, np.uint64)
        with np.errstate(over="ignore"):
            derived = h1[:, None] + seeds[None, :] * h2[:, None]
        starts = np.zeros(len(counts), np.int64)
        starts[1:] = np.cumsum(counts, dtype=np.int64)[:-1]
        mins = np.minimum.reduceat(derived, starts, axis=0)  # (docs, k)
        fields = (mins & mask) << shifts[None, :]
        packed = np.bitwise_or.reduce(fields, axis=1)
        return pa.table({
            id_col: batch[id_col].take(pa.array(keep, pa.int64())),
            "sketch": pa.array(packed, pa.uint64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        sketch, batch_format="pyarrow")


def bbit_jaccard_pairs(ds, pairs, id_col: str = "doc_id",
                       text_col: str = "text",
                       a_col: str = "a_id", b_col: str = "b_id",
                       k: int = 16, b: int = 2, n: int = 3,
                       num_partitions: int | None = None):
    """candidate pairs (a_col, b_col) + corpus rows -> Dataset
    (a_col, b_col, n_match, jaccard_est): the Li-Konig bias-corrected
    Jaccard estimate per pair from the packed b-bit sketches. Pairs
    where either side has no n-grams are dropped (inner joins), the
    same rule both the sketch builder and the SQL oracle apply. The
    raw estimator can go slightly negative for dissimilar pairs —
    left uncorrected on both sides (clipping would hide the sketch's
    actual behavior)."""
    import ray

    from raydedup.util import join_partitions

    sketches = bbit_sketches(ds, id_col=id_col, text_col=text_col,
                             k=k, b=b, n=n).materialize()
    if num_partitions is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = min(join_partitions(sketches.count()),
                             max(2, 2 * ncpu))

    def as_a(batch: pa.Table) -> pa.Table:
        return pa.table({a_col: batch[id_col], "_sa": batch["sketch"]})

    def as_b(batch: pa.Table) -> pa.Table:
        return pa.table({b_col: batch[id_col], "_sb": batch["sketch"]})

    j = (pairs.select_columns([a_col, b_col])
         .join(sketches.map_batches(as_a, batch_format="pyarrow"),
               join_type="inner", num_partitions=num_partitions,
               on=(a_col,))
         .join(sketches.map_batches(as_b, batch_format="pyarrow"),
               join_type="inner", num_partitions=num_partitions,
               on=(b_col,)))
    mask = np.uint64((1 << b) - 1)
    c = 1.0 / (1 << b)

    def estimate(batch: pa.Table) -> pa.Table:
        sa = batch["_sa"].combine_chunks().to_numpy(zero_copy_only=False)
        sb = batch["_sb"].combine_chunks().to_numpy(zero_copy_only=False)
        x = sa ^ sb
        m = np.zeros(len(x), np.int64)
        for s in range(k):
            m += ((x >> np.uint64(s * b)) & mask) == 0
        est = (m / k - c) / (1.0 - c)
        return pa.table({
            a_col: batch[a_col],
            b_col: batch[b_col],
            "n_match": pa.array(m),
            "jaccard_est": pa.array(est, pa.float64()),
        })

    return j.map_batches(estimate, batch_format="pyarrow")
