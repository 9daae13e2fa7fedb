"""Simhash near-duplicate pairs via pigeonhole block LSH.

Generalizes the reference's sequential within-group hamming scan
(bin/exclude_duplicates) to a COLLECTION-WIDE near-pair search: if
hamming(a, b) <= h, then splitting the 64 bits into h+1 blocks guarantees
at least one block is identical (pigeonhole), so grouping by
(block_id, block_bits) finds every such pair (HmSearch-style multi-index —
public algorithm).

With the default h=12 → 13 blocks of ~5 bits each, block keys are LOW
entropy, so this stage MUST run after exact dedup (representatives only)
and uses in-bucket vectorized hamming verification with the same
first-colliding-block dedup rule as the minhash LSH stage. A seeded bit
PERMUTATION is applied before the block split (hamming-invariant, so the
pigeonhole guarantee is exact): correlated/biased bit positions — the
usual cause of a near-constant block — are scattered uniformly across
blocks instead of concentrating. Residual caveat at 10^12-row scale:
overall simhash entropy bounds what any reordering can do, so the
documented partitioning assumption remains that simhash-near search runs
per partition (e.g. per time slice, like the reference's per-slice
DBSCAN) or with a tighter h; the config default targets correctness on
collection scales where bucket size ~ n / 2^5 stays workable after exact
dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.config import DedupConfig
from raydedup.functions.simhash import hamming_batch


def _bit_perm(f: int, seed: int) -> np.ndarray:
    """Seeded permutation of bit positions. Applied to every simhash
    before block split: hamming distance is invariant under a fixed bit
    permutation, so the pigeonhole guarantee is untouched, while
    correlated/biased bit positions (the low-entropy degeneracy the
    module docstring warns about) are scattered uniformly across blocks
    instead of leaving whole blocks constant."""
    return np.random.default_rng(seed).permutation(f).astype(np.uint64)


def _permute_bits(sims: np.ndarray, perm: np.ndarray) -> np.ndarray:
    out = np.zeros_like(sims)
    one = np.uint64(1)
    for i, p in enumerate(perm):
        out |= ((sims >> p) & one) << np.uint64(i)
    return out


def _block_bounds(f: int, n_blocks: int) -> list[tuple[int, int]]:
    base = f // n_blocks
    rem = f % n_blocks
    bounds = []
    start = 0
    for i in range(n_blocks):
        width = base + (1 if i < rem else 0)
        bounds.append((start, width))
        start += width
    return bounds


class SimhashBlockExplode:
    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        self.bounds = _block_bounds(cfg.simhash_f, cfg.simhash_dup_hamming + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sims = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        psims = _permute_bits(sims, _bit_perm(self.cfg.simhash_f,
                                              self.cfg.simhash_block_seed))
        block_ids, block_bits, idx = [], [], []
        for bid, (start, width) in enumerate(self.bounds):
            mask = np.uint64((1 << width) - 1)
            bits = (psims >> np.uint64(start)) & mask
            block_ids.append(np.full(n, bid, dtype=np.int32))
            block_bits.append(bits)
            idx.append(np.arange(n, dtype=np.int64))
        take = pa.array(np.concatenate(idx))
        return pa.table(
            {
                "block_id": pa.array(np.concatenate(block_ids)),
                "block_bits": pa.array(np.concatenate(block_bits).view(np.int64)),
                "row_key": pc.take(batch["row_key"], take),
                "simhash": pc.take(batch["simhash"], take),
            }
        )


def simhash_near_pairs(rep_sigs_ds, cfg: DedupConfig):
    """representative signatures → pairs with hamming(simhash) <= h
    (a_key < b_key, each pair emitted once)."""
    bounds = _block_bounds(cfg.simhash_f, cfg.simhash_dup_hamming + 1)
    h_max = cfg.simhash_dup_hamming
    cap = cfg.lsh_bucket_pair_cap

    exploded = rep_sigs_ds.select_columns(["row_key", "simhash"]).map_batches(
        SimhashBlockExplode(cfg), batch_format="pyarrow", batch_size=cfg.batch_size
    )

    def verify(group: pa.Table) -> pa.Table:
        m = group.num_rows
        empty = pa.table(
            {
                "a_key": pa.array([], type=pa.string()),
                "b_key": pa.array([], type=pa.string()),
                "hamming": pa.array([], type=pa.int32()),
            }
        )
        if m < 2:
            return empty
        bid = group["block_id"][0].as_py()
        sims = group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        psims = _permute_bits(sims, _bit_perm(cfg.simhash_f,
                                              cfg.simhash_block_seed))
        keys = group["row_key"].to_pylist()
        # pairwise hamming matrix (m small after exact dedup + 2^width split)
        ham = np.zeros((m, m), dtype=np.int32)
        for i in range(m):
            ham[i] = hamming_batch(sims, sims[i])
        # first-colliding-block rule (over PERMUTED bits, matching the
        # explode): emit only if no earlier block matches
        prior = np.zeros((m, m), dtype=bool)
        for pb in range(bid):
            start, width = bounds[pb]
            mask = np.uint64((1 << width) - 1)
            bits = (psims >> np.uint64(start)) & mask
            prior |= bits[:, None] == bits[None, :]
        a_out, b_out, h_out = [], [], []
        emitted = 0
        for i in range(m):
            for j in range(i + 1, m):
                if prior[i, j] or ham[i, j] > h_max:
                    continue
                ka, kb = keys[i], keys[j]
                if kb < ka:
                    ka, kb = kb, ka
                a_out.append(ka)
                b_out.append(kb)
                h_out.append(int(ham[i, j]))
                emitted += 1
                if emitted >= cap:
                    break
            if emitted >= cap:
                break
        return pa.table(
            {
                "a_key": pa.array(a_out, type=pa.string()),
                "b_key": pa.array(b_out, type=pa.string()),
                "hamming": pa.array(h_out, type=pa.int32()),
            }
        )

    return exploded.groupby(["block_id", "block_bits"]).map_groups(
        verify, batch_format="pyarrow"
    )
