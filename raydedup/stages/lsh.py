"""LSH candidate generation + in-bucket exact verification.

The wide step of the near-dup pipeline (SURVEY §4.2). Minhash signatures
were already folded into b band hashes by the signature stage; this stage
finds colliding (band_id, band_hash) buckets and verifies exact
shingle-hash Jaccard inside them — pairs leave verified, no second
shuffle or join.

Execution shape (measured-fast path): with n rows × b bands exploded, the
overwhelming majority of buckets are singletons, and a naive
``groupby().map_groups`` pays a Python call per bucket — millions of
calls producing nothing. Instead:

  1. LIGHT explode: (band_id, band_hash, row_key) only — 3 skinny columns
     through the native count aggregate (vectorized sort shuffle);
  2. surviving buckets (count >= 2) are collected (sparse: one entry per
     actual collision) and broadcast via ``ray.put``;
  3. HEAVY explode re-emits rows (with band-hash vectors + shingle hashes)
     ONLY for surviving buckets — most input rows emit nothing;
  4. a second, tiny ``groupby().map_groups`` runs the pairwise verify.

Cross-band de-duplication uses the classic "first collision wins" rule:
each row carries all b band hashes, and a pair found in band j is emitted
only if NO earlier band i < j also collides for that pair, so every true
candidate pair is verified exactly once globally with no pair-level
groupby.

Skew handling (SURVEY §7.5): exact duplicates were collapsed before this
stage, so a bucket's size is the number of DISTINCT near-identical texts.
Buckets larger than ``cfg.lsh_bucket_salt_above`` fall back to
sorted-window pairing and per-bucket pair caps (documented lossy guards;
never triggered by the planted-family corpora).

Rows with zero shingles (empty/stopword-only text) are excluded: they have
no shingle-set semantics to be "near" anything.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count

from raydedup.config import DedupConfig

_PAIR_SCHEMA = pa.schema(
    [
        ("a_key", pa.string()),
        ("b_key", pa.string()),
        ("jaccard", pa.float64()),
    ]
)


def _bands_matrix(batch: pa.Table, b: int) -> np.ndarray:
    return (
        batch["band_hashes"].combine_chunks().flatten()
        .to_numpy(zero_copy_only=False).reshape(batch.num_rows, b)
    )


def light_explode(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """rows → (band_id, band_hash, row_key), one per (row, band)."""
    batch = batch.filter(pc.greater(batch["n_shingles"], 0))
    n = batch.num_rows
    b = cfg.lsh_bands
    if n == 0:
        return pa.table(
            {
                "band_id": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.int64()),
                "row_key": pa.array([], type=pa.string()),
            }
        )
    bh = _bands_matrix(batch, b)
    idx = np.repeat(np.arange(n, dtype=np.int64), b)
    return pa.table(
        {
            "band_id": pa.array(np.tile(np.arange(b, dtype=np.int32), n)),
            # int64 reinterpret: equality-only key, friendlier to sort
            "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
            "row_key": pc.take(batch["row_key"], pa.array(idx)),
        }
    )


def heavy_explode(batch: pa.Table, cfg: DedupConfig,
                  surviving: set[tuple[int, int]]) -> pa.Table:
    """rows → bucket rows (with payloads) for SURVIVING buckets only."""
    batch = batch.filter(pc.greater(batch["n_shingles"], 0))
    n = batch.num_rows
    b = cfg.lsh_bands
    empty = pa.table(
        {
            "band_id": pa.array([], type=pa.int32()),
            "band_hash": pa.array([], type=pa.int64()),
            "row_key": pa.array([], type=pa.string()),
            "band_hashes": pa.array([], type=pa.list_(pa.uint64())),
            "shingle_hashes": pa.array([], type=pa.list_(pa.uint64())),
        }
    )
    if n == 0:
        return empty
    bh = _bands_matrix(batch, b)
    signed = bh.view(np.int64)
    rows_out, bands_out = [], []
    for i in range(n):
        for j in range(b):
            if (j, int(signed[i, j])) in surviving:
                rows_out.append(i)
                bands_out.append(j)
    if not rows_out:
        return empty
    idx = pa.array(np.array(rows_out, dtype=np.int64))
    bands_arr = np.array(bands_out, dtype=np.int64)
    bh_list = pa.FixedSizeListArray.from_arrays(
        pa.array(bh.reshape(-1), type=pa.uint64()), b
    )
    return pa.table(
        {
            "band_id": pa.array(bands_arr.astype(np.int32)),
            "band_hash": pa.array(
                signed[np.array(rows_out), bands_arr]
            ),
            "row_key": pc.take(batch["row_key"], idx),
            "band_hashes": pc.take(bh_list, idx),
            "shingle_hashes": pc.take(
                batch["shingle_hashes"].combine_chunks(), idx
            ),
        }
    )


def _exact_jaccard(x: np.ndarray, y: np.ndarray) -> float:
    inter = np.intersect1d(x, y, assume_unique=True).size
    union = x.size + y.size - inter
    return inter / union if union else 0.0


class BucketVerify:
    """map_groups body over surviving (band_id, band_hash) buckets →
    verified pairs."""

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
            shingle_col[i].values.to_numpy(zero_copy_only=False)
            for i in range(m)
        ]

        order = np.arange(m)
        window = m
        if m > cfg.lsh_bucket_salt_above:
            # hot bucket: sort rows by their band-hash vector and only pair
            # within a sliding window — documented lossy fallback
            order = np.lexsort(bh.T[::-1])
            window = cfg.lsh_bucket_salt_above

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
                jac = _exact_jaccard(shingles[order[ii]], shingles[order[jj]])
                if jac >= thr:
                    ka, kb = keys[order[ii]], keys[order[jj]]
                    if kb < ka:
                        ka, kb = kb, ka
                    a_out.append(ka)
                    b_out.append(kb)
                    j_out.append(jac)
                emitted += 1
                if emitted >= cap:
                    break
            if emitted >= cap:
                break
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
    rep_sigs_ds = rep_sigs_ds.materialize()

    light = rep_sigs_ds.map_batches(
        lambda t: light_explode(t, cfg),
        batch_format="pyarrow", batch_size=cfg.batch_size,
    )
    counts = light.groupby(["band_id", "band_hash"]).aggregate(
        Count(alias_name="n")
    )
    surviving: set[tuple[int, int]] = set()
    for b in counts.filter(expr="n >= 2").iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        surviving.update(
            zip(b["band_id"].to_pylist(), b["band_hash"].to_pylist())
        )
    if not surviving:
        import ray.data as rd

        return rd.from_arrow(_PAIR_SCHEMA.empty_table())
    surv_ref = ray.put(surviving)

    def heavy(batch: pa.Table) -> pa.Table:
        return heavy_explode(batch, cfg, ray.get(surv_ref))

    exploded = rep_sigs_ds.map_batches(
        heavy, batch_format="pyarrow", batch_size=cfg.batch_size
    )
    bv = BucketVerify(cfg, min_jaccard)

    def verify_bucket(group: pa.Table) -> pa.Table:
        return bv(group)

    return exploded.groupby(["band_id", "band_hash"]).map_groups(
        verify_bucket, batch_format="pyarrow"
    )
