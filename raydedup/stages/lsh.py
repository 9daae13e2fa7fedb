"""LSH candidate generation + in-bucket exact verification.

The wide step of the near-dup pipeline (SURVEY §4.2). Minhash signatures
were already folded into b band hashes by the signature stage; this stage
finds colliding buckets and verifies exact shingle-hash Jaccard inside
them — pairs leave verified, no second shuffle or join.

Two interchangeable execution paths (equal output — asserted by
tests/test_pipeline.py::test_lsh_copartition_path_matches_driver_path);
``lsh_verified_pairs`` picks one by input size unless forced:

DRIVER (small/medium inputs) — a hand-rolled ref-based shuffle tuned for
minimal serial time: bundled map tasks emit per-partition
(bucket, row_id) numpy arrays as separate ObjectRefs; per-partition
reducers run vectorized run-length pair generation (tiled for hot runs —
full coverage, bounded memory); candidate pairs are deduped with
lexsort+diff and verified (exact shingle-hash Jaccard) by parallel tasks
reading zero-copy numpy block stores. Row identity is a composite
(bundle << 40 | row) id — collision-FREE by construction at any scale
(the earlier 63-bit key hashes had certain birthday collisions above
~2^31 rows). The driver only routes refs and merges the final small pair
arrays.

SCALE (``copartition_verify=True``, the default above
``cfg.lsh_driver_max_rows``) — pure Dataset ops for corpora whose
exploded bucket membership outgrows one machine: a skinny light explode
through a count aggregate finds >= 2-member buckets (naive
``groupby().map_groups`` would pay a Python call per singleton bucket —
millions of calls producing nothing); a heavy explode re-emits payloads
for surviving buckets only; a groupby co-locates buckets and an in-bucket
verify applies the first-colliding-band rule so each pair is verified
once.

Skew handling (SURVEY §7.5): REAL salting, exact coverage. Exact
duplicates were collapsed before this stage, so a bucket's size is the
number of DISTINCT near-identical texts. A bucket whose global count
exceeds ``cfg.lsh_bucket_salt_above`` is split into s = ceil(n / limit)
salt classes at heavy-explode time; each member is re-emitted to every
(salt_i, salt_j) pair-group (s copies), so the groupby distributes the
bucket across s*(s+1)/2 bounded-size tasks and EVERY cross pair is still
verified exactly once — no window, no pair cap, no recall loss (asserted
by a planted-hot-bucket recall test). Total work stays O(n^2) per hot
bucket — inherent to pair-level semantics — but per-task memory and the
prior-band matrix are bounded by ~2*limit rows.

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

# odd 64-bit mixing constant: fused bucket key = band_hash ^ (band_id * MIX)
_MIX = np.uint64(0x9E3779B97F4A7C15)

# composite row id: (bundle index << _ID_BITS) | row index within bundle
_ID_BITS = 40
_ID_MASK = (1 << _ID_BITS) - 1

# salt pair-group encoding: sgrp = salt_i * _MAXS + salt_j (salt_i <= salt_j)
_MAXS = 1 << 15


def _unique_pairs(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sorted-unique over (a, b) int64 pairs via lexsort + diff — ~20x
    faster than np.unique on a 16-byte structured view (void-compare
    mergesort), which was the measured driver bottleneck."""
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    if a.size == 0:
        return a, b
    keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    return a[keep], b[keep]


def _key_class_hash(keys) -> np.ndarray:
    """Vectorized 64-bit identity hash of row-key strings → nonnegative
    int64 (salt-class assignment). Salt-class COVERAGE is exact for ANY
    assignment (module docstring), so the kernel only needs balance and
    within-run determinism — polars' vectorized xxhash gives both with
    zero per-row Python; the blake2b loop is the no-polars fallback."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    try:
        import polars as pl

        h = pl.from_arrow(keys).hash(seed=0).to_numpy()
        return (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    except ImportError:  # pragma: no cover - polars is baked in
        import hashlib

        return np.array([
            int.from_bytes(hashlib.blake2b(
                k.encode("utf-8"), digest_size=4).digest(), "big")
            for k in keys.to_pylist()], dtype=np.int64)


def _bands_matrix(batch: pa.Table, b: int) -> np.ndarray:
    return (
        batch["band_hashes"].combine_chunks().flatten()
        .to_numpy(zero_copy_only=False).reshape(batch.num_rows, b)
    )


def _fused_buckets(bh: np.ndarray, b: int) -> np.ndarray:
    """(n, b) band hashes → (n, b) fused int64 bucket keys."""
    band_ids = np.arange(b, dtype=np.uint64)
    return (bh ^ (band_ids[None, :] * _MIX)).view(np.int64)


def light_explode(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """rows → (bucket, row_key), one per (row, band)."""
    batch = batch.filter(pc.greater(batch["n_shingles"], 0))
    n = batch.num_rows
    b = cfg.lsh_bands
    if n == 0:
        return pa.table(
            {
                "bucket": pa.array([], type=pa.int64()),
                "row_key": pa.array([], type=pa.string()),
            }
        )
    fused = _fused_buckets(_bands_matrix(batch, b), b)
    idx = np.repeat(np.arange(n, dtype=np.int64), b)
    return pa.table(
        {
            "bucket": pa.array(fused.reshape(-1)),
            "row_key": pc.take(batch["row_key"], pa.array(idx)),
        }
    )


def heavy_explode(batch: pa.Table, cfg: DedupConfig,
                  surviving: np.ndarray,
                  hot_sizes: dict[int, int],
                  salt_limit: int | None = None) -> pa.Table:
    """rows → bucket rows (with payloads) for SURVIVING buckets only.

    ``surviving`` is a SORTED int64 array of >= 2-member bucket keys;
    ``hot_sizes`` maps bucket → global member count for buckets above the
    salt limit. Hot-bucket members are replicated into every
    (salt_i, salt_j) pair-group (see module docstring). ``salt_limit``
    overrides ``cfg.lsh_bucket_salt_above`` as the per-class size
    target — the hybrid ScanCount route uses a larger class (its cost
    is posting mass, invariant to the split; replication volume shrinks
    linearly with class size)."""
    batch = batch.filter(pc.greater(batch["n_shingles"], 0))
    n = batch.num_rows
    b = cfg.lsh_bands
    weighted = "shingle_weights" in batch.column_names
    empty_cols = {
        "bucket": pa.array([], type=pa.int64()),
        "sgrp": pa.array([], type=pa.int64()),
        "salt": pa.array([], type=pa.int32()),
        "band_id": pa.array([], type=pa.int32()),
        "row_key": pa.array([], type=pa.string()),
        "band_hashes": pa.array([], type=pa.list_(pa.uint64())),
        "shingle_hashes": pa.array([], type=pa.list_(pa.uint64())),
    }
    if weighted:
        empty_cols["shingle_weights"] = pa.array([], type=pa.list_(pa.int64()))
    empty = pa.table(empty_cols)
    if n == 0:
        return empty
    bh = _bands_matrix(batch, b)
    fused = _fused_buckets(bh, b)
    # vectorized membership against the broadcast sorted survivors array
    mask = np.isin(fused, surviving)
    rows_out, bands_out = np.nonzero(mask)
    if rows_out.size == 0:
        return empty
    buckets = fused[rows_out, bands_out]

    sgrp = np.zeros(rows_out.size, dtype=np.int64)
    salt = np.zeros(rows_out.size, dtype=np.int32)
    if hot_sizes:
        limit = (cfg.lsh_bucket_salt_above if salt_limit is None
                 else salt_limit)
        if limit < 1:
            raise ValueError(f"salt_limit must be >= 1, got {limit}")
        hot_here = np.isin(buckets, np.fromiter(
            hot_sizes, dtype=np.int64, count=len(hot_sizes)))
        if hot_here.any():
            # salt class = hash of the GLOBAL row identity (row_key), not
            # batch-local position: members of one hot bucket arrive
            # scattered across many batches, and a positional assignment
            # would put every batch's first member in class 0 — one
            # (bucket, sgrp) group would then receive the whole bucket,
            # recreating the O(n^2) single-task blowup salting prevents.
            # Coverage is exact for ANY salt assignment; identity hashing
            # keeps the classes balanced w.h.p. Hash ONLY the rows with a
            # hot incidence (a batch-wide pass would run on nearly every
            # batch once one bucket is globally hot).
            hot_pre = np.nonzero(hot_here)[0]
            need_rows = np.unique(rows_out[hot_pre])
            key_hash = np.zeros(n, dtype=np.int64)
            key_hash[need_rows] = _key_class_hash(
                pc.take(batch["row_key"], pa.array(need_rows)))
            cold_idx = np.nonzero(~hot_here)[0]
            parts_r = [rows_out[cold_idx]]
            parts_b = [bands_out[cold_idx]]
            parts_bk = [buckets[cold_idx]]
            parts_sg = [sgrp[cold_idx]]
            parts_sa = [salt[cold_idx]]
            hot_idx = np.nonzero(hot_here)[0]
            for hb in np.unique(buckets[hot_idx]):
                p = hot_idx[buckets[hot_idx] == hb]
                s = -(-hot_sizes[int(hb)] // limit)  # ceil
                # sgrp packs (lo, hi) as lo*_MAXS+hi: cap s so the
                # encoding cannot overflow (degenerate > limit*_MAXS
                # member buckets trade bounded class size for validity)
                s = int(min(s, _MAXS - 1))
                salts_local = (key_hash[rows_out[p]] % s).astype(np.int32)
                reps = np.repeat(p, s)
                k = np.repeat(salts_local, s)
                j = np.tile(np.arange(s, dtype=np.int32), p.size)
                lo = np.minimum(k, j).astype(np.int64)
                hi = np.maximum(k, j).astype(np.int64)
                parts_r.append(rows_out[reps])
                parts_b.append(bands_out[reps])
                parts_bk.append(buckets[reps])
                parts_sg.append(lo * _MAXS + hi)
                parts_sa.append(k)
            rows_out = np.concatenate(parts_r)
            bands_out = np.concatenate(parts_b)
            buckets = np.concatenate(parts_bk)
            sgrp = np.concatenate(parts_sg)
            salt = np.concatenate(parts_sa)

    idx = pa.array(rows_out)
    bh_list = pa.FixedSizeListArray.from_arrays(
        pa.array(bh.reshape(-1), type=pa.uint64()), b
    )
    out_cols = {
        "bucket": pa.array(buckets),
        "sgrp": pa.array(sgrp),
        "salt": pa.array(salt),
        "band_id": pa.array(bands_out.astype(np.int32)),
        "row_key": pc.take(batch["row_key"], idx),
        "band_hashes": pc.take(bh_list, idx),
        "shingle_hashes": pc.take(
            batch["shingle_hashes"].combine_chunks(), idx
        ),
    }
    if weighted:
        out_cols["shingle_weights"] = pc.take(
            batch["shingle_weights"].combine_chunks(), idx
        )
    return pa.table(out_cols)


def _exact_jaccard(x: np.ndarray, y: np.ndarray) -> float:
    inter = np.intersect1d(x, y, assume_unique=True).size
    union = x.size + y.size - inter
    return inter / union if union else 0.0


_PAIR_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)
_PAIR_TILE_ELEMS = 1 << 19  # 4 MB of uint64 per tile: stays cache-resident


def _tiled_intersections(la: np.ndarray, lb: np.ndarray,
                         fill) -> np.ndarray:
    """Intersection sizes for pairs of per-row SORTED-UNIQUE uint64 sets.
    Pairs are tiled by combined length; each tile pads both sides into
    one (P, Lmax) row-sorted buffer and counts adjacent equals — a value
    present on both sides of a pair appears exactly twice, padding
    sentinels are masked by the per-pair length. ONE np.sort per tile
    replaces a per-pair ``np.intersect1d`` Python loop (~80 us/pair of
    numpy call overhead; 32 concurrent copies contended on the shared
    store — measured anti-scaling 8 -> 32 CPUs). ``fill(buf_row, i)``
    writes pair i's two segments into ``buf_row[:la[i]+lb[i]]``."""
    n = la.size
    tot = la + lb
    inter = np.empty(n, dtype=np.int64)
    order = np.argsort(tot, kind="stable")
    pos = 0
    while pos < n:
        hi_pos = pos + 1
        lmax = int(tot[order[pos]])
        while hi_pos < n:
            cand = max(lmax, int(tot[order[hi_pos]]))
            if (hi_pos + 1 - pos) * cand > _PAIR_TILE_ELEMS and hi_pos > pos:
                break
            lmax = cand
            hi_pos += 1
        idx = order[pos:hi_pos]
        buf = np.full((idx.size, max(lmax, 1)), _PAIR_SENTINEL,
                      dtype=np.uint64)
        for k, i in enumerate(idx):
            fill(buf[k], i)
        buf.sort(axis=1)
        eq = buf[:, 1:] == buf[:, :-1]
        valid = np.arange(buf.shape[1] - 1)[None, :] < (tot[idx] - 1)[:, None]
        inter[idx] = (eq & valid).sum(axis=1)
        pos = hi_pos
    return inter


def _tiled_pair_jaccard(flat: np.ndarray, offs: np.ndarray,
                        pi: np.ndarray, pj: np.ndarray) -> np.ndarray:
    """Exact Jaccard for index pairs over a flattened list column of
    per-row sorted-unique uint64 sets (shared kernel:
    ``_tiled_intersections``)."""
    la = (offs[pi + 1] - offs[pi]).astype(np.int64)
    lb = (offs[pj + 1] - offs[pj]).astype(np.int64)

    def fill(row: np.ndarray, i: int) -> None:
        m = la[i]
        row[:m] = flat[offs[pi[i]]: offs[pi[i] + 1]]
        row[m: m + lb[i]] = flat[offs[pj[i]]: offs[pj[i] + 1]]

    inter = _tiled_intersections(la, lb, fill)
    union = la + lb - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


def _tiled_pair_weighted_jaccard(flat: np.ndarray, wflat: np.ndarray,
                                 offs: np.ndarray, pi: np.ndarray,
                                 pj: np.ndarray) -> np.ndarray:
    """Exact WEIGHTED Jaccard (Σmin/Σmax of per-element counts) for index
    pairs over a flattened list column of per-row sorted-unique uint64
    element sets with a parallel int64 weight column. Same tiling scheme
    as ``_tiled_intersections``, but the combined buffer sorts via
    argsort so each element's weight rides along: a value present on
    both sides appears adjacent after the sort, contributing
    min(w_a, w_b) to Σmin; Σmax = W_a + W_b − Σmin. Equals plain Jaccard
    of the EXPANDED (element, occurrence) multisets — the contract the
    expansion kernel verifies against — without ever materializing
    O(multiset-mass) arrays."""
    la = (offs[pi + 1] - offs[pi]).astype(np.int64)
    lb = (offs[pj + 1] - offs[pj]).astype(np.int64)
    # per-row weight totals via one cumsum over the VALUES buffer
    # (offs holds positions into wflat, possibly starting nonzero on a
    # sliced array — same addressing contract as _tiled_pair_jaccard)
    cw = np.zeros(wflat.size + 1, dtype=np.int64)
    np.cumsum(wflat, out=cw[1:])
    row_w = cw[offs[1:]] - cw[offs[:-1]]
    wa = row_w[pi]
    wb = row_w[pj]
    n = la.size
    tot = la + lb
    smin = np.zeros(n, dtype=np.int64)
    order = np.argsort(tot, kind="stable")
    pos = 0
    while pos < n:
        hi_pos = pos + 1
        lmax = int(tot[order[pos]])
        while hi_pos < n:
            cand = max(lmax, int(tot[order[hi_pos]]))
            if (hi_pos + 1 - pos) * cand > _PAIR_TILE_ELEMS and hi_pos > pos:
                break
            lmax = cand
            hi_pos += 1
        idx = order[pos:hi_pos]
        buf = np.full((idx.size, max(lmax, 1)), _PAIR_SENTINEL,
                      dtype=np.uint64)
        wbuf = np.zeros((idx.size, max(lmax, 1)), dtype=np.int64)
        for k, i in enumerate(idx):
            m = la[i]
            buf[k, :m] = flat[offs[pi[i]]: offs[pi[i] + 1]]
            buf[k, m: m + lb[i]] = flat[offs[pj[i]]: offs[pj[i] + 1]]
            wbuf[k, :m] = wflat[offs[pi[i]]: offs[pi[i] + 1]]
            wbuf[k, m: m + lb[i]] = wflat[offs[pj[i]]: offs[pj[i] + 1]]
        srt = np.argsort(buf, axis=1, kind="stable")
        buf = np.take_along_axis(buf, srt, axis=1)
        wbuf = np.take_along_axis(wbuf, srt, axis=1)
        eq = buf[:, 1:] == buf[:, :-1]
        valid = np.arange(buf.shape[1] - 1)[None, :] < (tot[idx] - 1)[:, None]
        minw = np.minimum(wbuf[:, 1:], wbuf[:, :-1])
        smin[idx] = np.where(eq & valid, minw, 0).sum(axis=1)
        pos = hi_pos
    smax = wa + wb - smin
    return np.where(smax > 0, smin / np.maximum(smax, 1), 0.0)


class BucketVerify:
    """map_groups body over surviving (bucket, sgrp) groups → verified
    pairs. Within-salt groups (i == j) pair all members; cross-salt groups
    pair only across the two salt classes — together this covers every
    in-bucket pair exactly once. The first-colliding-band rule (skip pairs
    already sharing an earlier band) dedups across bands; it is checked
    VECTORIZED over the candidate pair arrays, never as an O(m^2 * b)
    broadcast.

    Groups of >= ``scan_min`` members verify through the SCANCOUNT
    kernel instead of per-pair sorted merges: pair intersection sizes
    accumulate through per-ELEMENT posting lists (work proportional to
    Σ|A∩B| — for the boilerplate hot-bucket pathology, ~1/9 of the
    merge kernel's Σ(|A|+|B|) — all bincount/triu numpy, no per-pair
    Python), then the exact threshold c >= t·(la+lb)/(1+t), the salt
    masks and the first-band rule apply to the extracted counts. A pair
    at J >= t must share elements, so it always has a nonzero count and
    is always extracted: output is IDENTICAL to the merge kernel
    (asserted in tests), only the arithmetic route differs."""

    def __init__(self, cfg: DedupConfig, min_jaccard: float | None = None,
                 scan_min: int = 128):
        self.cfg = cfg
        self.scan_min = scan_min
        self.min_jaccard = (
            cfg.jaccard_dup_threshold if min_jaccard is None else min_jaccard
        )

    def _scan_pairs(self, group: pa.Table, m: int,
                    si: int, sj: int, band_j: int,
                    bh: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                             np.ndarray]:
        """ScanCount: (ci, cj, jaccard) arrays of verified pairs."""
        shingle_col = group["shingle_hashes"].combine_chunks()
        flat_all = shingle_col.values.to_numpy(zero_copy_only=False)
        offs = shingle_col.offsets.to_numpy().astype(np.int64)
        sub = flat_all[offs[0]: offs[-1]]
        lens = offs[1:] - offs[:-1]
        inv = np.unique(sub, return_inverse=True)[1]
        docidx = np.repeat(np.arange(m, dtype=np.int64), lens)
        order = np.argsort(inv, kind="stable")  # docidx ascending per run
        e_s, d_s = inv[order], docidx[order]
        starts = np.flatnonzero(np.r_[True, e_s[1:] != e_s[:-1]])
        run_lens = np.diff(np.r_[starts, e_s.size])
        counts = np.zeros(m * m, dtype=np.int64)
        # DENSE elements (df > m/2 — the bucket's band minima and any
        # template core) contribute through their COMPLEMENT: +1 to
        # every pair as a constant, −1 for each pair involving a member
        # that LACKS the element — q·m increments instead of C(df, 2),
        # the bulk of a boilerplate bucket's posting mass
        dense = run_lens > m // 2
        base_dense = int(dense.sum())
        if base_dense:
            present = np.zeros(m, dtype=bool)
            all_j = np.arange(m, dtype=np.int64)
            for s0, L in zip(starts[dense], run_lens[dense]):
                present[:] = False
                present[d_s[s0: s0 + L]] = True
                miss = np.flatnonzero(~present)
                for i in miss:
                    keys = np.concatenate(
                        (i * m + all_j[i + 1:], all_j[:i] * m + i))
                    counts[keys] -= 1
                if miss.size >= 2:
                    # inclusion-exclusion: a pair BOTH of whose members
                    # lack the element was subtracted twice above —
                    # its true contribution is 0, so add one back
                    iu, ju = np.triu_indices(miss.size, k=1)
                    counts[miss[iu] * m + miss[ju]] += 1
        # sparse runs: plain posting-pair accumulation, batched by
        # posting length (the _emit_run_pairs idiom), chunked so the
        # scratch keys stay ~tens of MB
        for L in np.unique(run_lens[~dense]):
            if L < 2:
                continue
            rs = starts[~dense & (run_lens == L)]
            Li = int(L)
            step = max(1, (1 << 22) // (Li * Li))
            iu, ju = np.triu_indices(Li, k=1)
            for lo in range(0, rs.size, step):
                M = d_s[rs[lo: lo + step, None] + np.arange(Li)[None, :]]
                keys = (M[:, iu] * m + M[:, ju]).ravel()
                counts += np.bincount(keys, minlength=m * m)
        # extraction bound: any pair at J >= t needs inter >=
        # ceil(t(la+lb)/(1+t)) >= ceil(2 t lmin/(1+t)); with inter =
        # base_dense + counts, only slots with counts >= that bound
        # minus base_dense can survive — on boilerplate buckets this
        # extracts ~nothing instead of C(m, 2)
        lmin = int(lens.min()) if lens.size else 0
        needed_min = int(np.ceil(2 * self.min_jaccard * lmin
                                 / (1 + self.min_jaccard)))
        cmin = needed_min - base_dense
        if cmin > 0:
            cand = np.flatnonzero(counts >= cmin)
        else:
            iu, ju = np.triu_indices(m, k=1)
            cand = (iu * m + ju).astype(np.int64)
        if cand.size == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.float64))
        ci, cj = cand // m, cand % m  # ci < cj by run-ascending docidx
        inter = counts[cand] + base_dense
        if si != sj:
            # cross-class pairs in either index order (the triu path
            # pairs a_idx x b_idx irrespective of member-index order)
            salts = group["salt"].to_numpy()
            keep = (((salts[ci] == si) & (salts[cj] == sj))
                    | ((salts[ci] == sj) & (salts[cj] == si)))
            ci, cj, inter = ci[keep], cj[keep], inter[keep]
        la, lb = lens[ci], lens[cj]
        union = la + lb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = jac >= self.min_jaccard
        ci, cj, jac = ci[keep], cj[keep], jac[keep]
        if band_j > 0 and ci.size:
            prior = bh[:, :band_j]
            fresh = ~(prior[ci] == prior[cj]).any(axis=1)
            ci, cj, jac = ci[fresh], cj[fresh], jac[fresh]
        return ci, cj, jac

    def __call__(self, group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2:
            return _PAIR_SCHEMA.empty_table()
        cfg = self.cfg
        band_j = group["band_id"][0].as_py()
        sgrp = group["sgrp"][0].as_py()
        si, sj = sgrp // _MAXS, sgrp % _MAXS
        keys = group["row_key"].to_pylist()
        bh = (
            group["band_hashes"].combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).reshape(m, cfg.lsh_bands)
        )
        if (m >= self.scan_min and self.min_jaccard > 0
                and "shingle_weights" not in group.column_names):
            ci, cj, jac_arr = self._scan_pairs(group, m, si, sj, band_j, bh)
            a_out, b_out, j_out = [], [], []
            for i in range(ci.size):
                ka, kb = keys[ci[i]], keys[cj[i]]
                if kb < ka:
                    ka, kb = kb, ka
                a_out.append(ka)
                b_out.append(kb)
                j_out.append(float(jac_arr[i]))
            return pa.table(
                {
                    "a_key": pa.array(a_out, type=pa.string()),
                    "b_key": pa.array(b_out, type=pa.string()),
                    "jaccard": pa.array(j_out, type=pa.float64()),
                }
            )
        shingle_col = group["shingle_hashes"].combine_chunks()

        if si == sj:
            pi, pj = np.triu_indices(m, k=1)
        else:
            salts = group["salt"].to_numpy()
            a_idx = np.nonzero(salts == si)[0]
            b_idx = np.nonzero(salts == sj)[0]
            pi = np.repeat(a_idx, b_idx.size)
            pj = np.tile(b_idx, a_idx.size)
        if pi.size == 0:
            return _PAIR_SCHEMA.empty_table()
        if band_j > 0:
            # first-colliding-band rule, vectorized over the pair arrays
            prior = bh[:, :band_j]
            fresh = ~(prior[pi] == prior[pj]).any(axis=1)
            pi, pj = pi[fresh], pj[fresh]

        flat = shingle_col.values.to_numpy(zero_copy_only=False)
        offs = shingle_col.offsets.to_numpy().astype(np.int64)
        if "shingle_weights" in group.column_names:
            # weighted (ICWS / bag) sets: distinct elements + counts —
            # Σmin/Σmax weighted Jaccard, exactly the expanded-multiset
            # Jaccard without the O(mass) expansion
            wcol = group["shingle_weights"].combine_chunks()
            wflat = wcol.values.to_numpy(zero_copy_only=False)
            jac = _tiled_pair_weighted_jaccard(flat, wflat, offs, pi, pj)
        else:
            jac = _tiled_pair_jaccard(flat, offs, pi, pj)
        keep = np.flatnonzero(jac >= self.min_jaccard)
        a_out: list[str] = []
        b_out: list[str] = []
        j_out: list[float] = []
        for i in keep:
            ka, kb = keys[pi[i]], keys[pj[i]]
            if kb < ka:
                ka, kb = kb, ka
            a_out.append(ka)
            b_out.append(kb)
            j_out.append(float(jac[i]))
        return pa.table(
            {
                "a_key": pa.array(a_out, type=pa.string()),
                "b_key": pa.array(b_out, type=pa.string()),
                "jaccard": pa.array(j_out, type=pa.float64()),
            }
        )


_N_PARTS = 32


@ray.remote(num_cpus=1, num_returns=_N_PARTS + 5)
def _light_part_task(bundle_idx: int, bands: int, *tbls: pa.Table):
    """A bundle of signature blocks → _N_PARTS per-partition
    (bucket, row_id) stacked arrays (each a (2, m) int64) followed by the
    bundle's store columns (shingle flat values/offsets, OPTIONAL
    per-element weights aligned to the same offsets — empty when the
    sets are unweighted — and key bytes/offsets). Row ids are composite
    (bundle << 40 | row) — globally unique, zero collisions. Separate
    returns → reducers address exactly their partition's ref; everything
    numpy → zero-copy."""
    tbls = [t for t in tbls if t.num_rows > 0]  # empty blocks keep the
    n = 0                                       # pre-map schema — drop
    if tbls:
        tbl = pa.concat_tables(tbls).combine_chunks()
        tbl = tbl.filter(pc.greater(tbl["n_shingles"], 0))
        n = tbl.num_rows
    if n == 0:
        e2 = np.empty((2, 0), dtype=np.int64)
        eu = np.empty(0, dtype=np.uint64)
        e8 = np.empty(0, dtype=np.uint8)
        return tuple([e2] * _N_PARTS) + (
            eu, np.zeros(1, np.int64), np.empty(0, np.int64),
            e8, np.zeros(1, np.int64),
        )
    fused = _fused_buckets(_bands_matrix(tbl, bands), bands)
    ids = (np.int64(bundle_idx) << _ID_BITS) | np.arange(n, dtype=np.int64)
    flat_b = fused.reshape(-1)
    flat_h = np.repeat(ids, bands)
    part = flat_b & (_N_PARTS - 1)
    order = np.argsort(part, kind="stable")
    sorted_part = part[order]
    cuts = np.searchsorted(sorted_part, np.arange(_N_PARTS + 1))
    parts = tuple(
        np.stack([flat_b[order[cuts[p]: cuts[p + 1]]],
                  flat_h[order[cuts[p]: cuts[p + 1]]]])
        for p in range(_N_PARTS)
    )
    sh_col = tbl["shingle_hashes"].combine_chunks()
    sh_values = sh_col.values.to_numpy(zero_copy_only=False).copy()
    sh_offsets = sh_col.offsets.to_numpy().astype(np.int64)
    if "shingle_weights" in tbl.column_names:
        # align the weight buffer so sh_offsets index it directly
        # (parallel list columns can carry a constant offset delta)
        w_col = tbl["shingle_weights"].combine_chunks()
        w_vals = w_col.values.to_numpy(zero_copy_only=False)
        w_offs = w_col.offsets.to_numpy().astype(np.int64)
        w_store = np.zeros(int(sh_offsets[-1]), dtype=np.int64)
        w_store[sh_offsets[0]:] = w_vals[w_offs[0]: w_offs[-1]]
    else:
        w_store = np.empty(0, dtype=np.int64)
    key_enc = [k.encode("utf-8") for k in tbl["row_key"].to_pylist()]
    key_offsets = np.zeros(len(key_enc) + 1, dtype=np.int64)
    np.cumsum([len(e) for e in key_enc], out=key_offsets[1:])
    key_bytes = np.frombuffer(b"".join(key_enc), dtype=np.uint8)
    return parts + (sh_values, sh_offsets, w_store, key_bytes, key_offsets)


_PAIR_TILE = 4096


def _emit_run_pairs(sh: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                    out_a: list, out_b: list) -> None:
    """All unordered pairs within each >= 2-member run of the sorted
    (bucket, id) arrays. Runs up to _PAIR_TILE are batched per length
    (vectorized triu); longer (hot) runs are emitted in (i-tile, j-tile)
    blocks — full coverage, bounded memory, NO pair cap."""
    for L in np.unique(lens):
        if L < 2:
            continue
        run_starts = starts[lens == L]
        if L <= _PAIR_TILE:
            M = sh[run_starts[:, None] + np.arange(int(L))[None, :]]
            iu, ju = np.triu_indices(int(L), k=1)
            out_a.append(M[:, iu].ravel())
            out_b.append(M[:, ju].ravel())
            continue
        for st in run_starts:
            row = sh[st: st + int(L)]
            for i0 in range(0, int(L), _PAIR_TILE):
                a_blk = row[i0: i0 + _PAIR_TILE]
                iu, ju = np.triu_indices(a_blk.size, k=1)
                out_a.append(a_blk[iu])
                out_b.append(a_blk[ju])
                for j0 in range(i0 + _PAIR_TILE, int(L), _PAIR_TILE):
                    b_blk = row[j0: j0 + _PAIR_TILE]
                    out_a.append(np.repeat(a_blk, b_blk.size))
                    out_b.append(np.tile(b_blk, a_blk.size))


def _partition_pairs(lo: np.ndarray, hi: np.ndarray) -> tuple:
    """Split canonical pair arrays into _N_PARTS stacked (2, m) arrays by
    a symmetric pair hash, so cross-partition dedup can run in parallel
    tasks instead of one driver merge."""
    mix = ((lo.view(np.uint64) * _MIX) ^ hi.view(np.uint64)).view(np.int64)
    part = mix & (_N_PARTS - 1)
    order = np.argsort(part, kind="stable")
    sorted_part = part[order]
    cuts = np.searchsorted(sorted_part, np.arange(_N_PARTS + 1))
    return tuple(
        np.stack([lo[order[cuts[p]: cuts[p + 1]]],
                  hi[order[cuts[p]: cuts[p + 1]]]])
        for p in range(_N_PARTS)
    )


@ray.remote(num_cpus=1, num_returns=_N_PARTS + 1)
def _pairgen_reducer(exclude, defer_floor, defer_budget, *parts):
    """Reducer for one bucket partition: concat the mappers' stacked
    (2, m) arrays, run run-length pair generation, dedup locally, and
    re-partition the candidate pairs by pair hash for the parallel
    cross-partition dedup+verify tasks. ``exclude`` (sorted int64 array
    or None) drops whole bucket runs outright.

    Lazy hot-bucket deferral (``defer_floor > 0``): because incidences
    are partitioned BY BUCKET, a run's length here is the bucket's exact
    GLOBAL member count — so pathological boilerplate buckets are
    detected for free, with no sampling probe or extra count pass. Runs
    are deferred largest-pair-mass-first until the reducer's remaining
    inline mass is within ``defer_budget`` (runs at or below
    ``defer_floor`` members never defer — small buckets are cheaper
    inline than through the salted ScanCount groupby). Deferred
    (bucket, global_count) rows come back in the extra return slot; the
    driver routes exactly those buckets through the ScanCount hot half.
    Routing is performance-only: both routes verify exactly, so the
    merged pair set is identical for ANY defer decision."""
    b_arr = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
    h_arr = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
    empty = np.empty((2, 0), dtype=np.int64)
    hot_report = np.empty((2, 0), dtype=np.int64)
    if b_arr.size == 0:
        return tuple([empty] * _N_PARTS) + (hot_report,)
    order = np.lexsort((h_arr, b_arr))
    sb, sh = b_arr[order], h_arr[order]
    starts = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]])
    lens = np.diff(np.r_[starts, sb.size])
    if exclude is not None and exclude.size and starts.size:
        rb = sb[starts]
        hot = exclude[np.clip(np.searchsorted(exclude, rb), 0,
                              exclude.size - 1)] == rb
        starts, lens = starts[~hot], lens[~hot]
    if defer_floor and starts.size:
        mass = lens * (lens - 1) // 2
        eligible = np.flatnonzero(lens > defer_floor)
        if eligible.size:
            by_mass = eligible[np.argsort(-mass[eligible], kind="stable")]
            total = int(mass.sum())
            defer_idx = []
            for i in by_mass:
                if total <= defer_budget:
                    break
                defer_idx.append(int(i))
                total -= int(mass[i])
            if defer_idx:
                d = np.asarray(defer_idx, dtype=np.int64)
                hot_report = np.stack([sb[starts[d]], lens[d]])
                keep_run = np.ones(starts.size, dtype=bool)
                keep_run[d] = False
                starts, lens = starts[keep_run], lens[keep_run]
    pa_l: list = []
    pb_l: list = []
    _emit_run_pairs(sh, starts, lens, pa_l, pb_l)
    if not pa_l:
        return tuple([empty] * _N_PARTS) + (hot_report,)
    a = np.concatenate(pa_l)
    b = np.concatenate(pb_l)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    lo, hi = _unique_pairs(lo, hi)
    keep = lo != hi  # same row colliding via two bands
    return _partition_pairs(lo[keep], hi[keep]) + (hot_report,)


def _batch_intersections(blocks, ba, ra, bb, rb) -> tuple:
    """Intersection sizes for candidate pairs whose sides are per-row
    sorted-unique uint64 shingle sets inside the per-bundle stores
    (composite (bundle, row) addressing; shared kernel:
    ``_tiled_intersections``). Returns (inter, la, lb) int64 arrays."""
    n = ba.size
    la = np.empty(n, dtype=np.int64)
    lb = np.empty(n, dtype=np.int64)
    for side_b, side_r, out in ((ba, ra, la), (bb, rb, lb)):
        for bu in np.unique(side_b):
            m = side_b == bu
            sho = blocks[bu][1]
            r = side_r[m]
            out[m] = sho[r + 1] - sho[r]

    def fill(row: np.ndarray, i: int) -> None:
        shv_x, sho_x = blocks[ba[i]][0], blocks[ba[i]][1]
        shv_y, sho_y = blocks[bb[i]][0], blocks[bb[i]][1]
        m = la[i]
        row[:m] = shv_x[sho_x[ra[i]]: sho_x[ra[i] + 1]]
        row[m: m + lb[i]] = shv_y[sho_y[rb[i]]: sho_y[rb[i] + 1]]

    inter = _tiled_intersections(la, lb, fill)
    return inter, la, lb


def _batch_weighted(blocks, ba, ra, bb, rb) -> tuple:
    """Σmin / per-side weight totals for WEIGHTED candidate pairs (the
    bundle stores hold (sorted distinct hash, count) sets; block slot 2
    is the offset-aligned weight buffer). Same tiling scheme as
    ``_tiled_intersections`` but the combined buffer argsorts so each
    element's weight rides along — cf. ``_tiled_pair_weighted_jaccard``.
    Returns (smin, wa, wb) int64 arrays; weighted jaccard =
    smin / (wa + wb − smin) equals expanded-multiset Jaccard exactly."""
    n = ba.size
    la = np.empty(n, dtype=np.int64)
    lb = np.empty(n, dtype=np.int64)
    wa = np.empty(n, dtype=np.int64)
    wb = np.empty(n, dtype=np.int64)
    cws: dict[int, np.ndarray] = {}

    def cw_for(bu: int) -> np.ndarray:
        c = cws.get(bu)
        if c is None:
            wv = blocks[bu][2]
            c = np.zeros(wv.size + 1, dtype=np.int64)
            np.cumsum(wv, out=c[1:])
            cws[bu] = c
        return c

    for side_b, side_r, out_l, out_w in ((ba, ra, la, wa),
                                         (bb, rb, lb, wb)):
        for bu in np.unique(side_b):
            m = side_b == bu
            sho = blocks[bu][1]
            cw = cw_for(int(bu))
            r = side_r[m]
            out_l[m] = sho[r + 1] - sho[r]
            out_w[m] = cw[sho[r + 1]] - cw[sho[r]]

    tot = la + lb
    smin = np.zeros(n, dtype=np.int64)
    order = np.argsort(tot, kind="stable")
    pos = 0
    while pos < n:
        hi_pos = pos + 1
        lmax = int(tot[order[pos]])
        while hi_pos < n:
            cand = max(lmax, int(tot[order[hi_pos]]))
            if (hi_pos + 1 - pos) * cand > _PAIR_TILE_ELEMS and hi_pos > pos:
                break
            lmax = cand
            hi_pos += 1
        idx = order[pos:hi_pos]
        buf = np.full((idx.size, max(lmax, 1)), _PAIR_SENTINEL,
                      dtype=np.uint64)
        wbuf = np.zeros((idx.size, max(lmax, 1)), dtype=np.int64)
        for k, i in enumerate(idx):
            shv_x, sho_x, wv_x = blocks[ba[i]][:3]
            shv_y, sho_y, wv_y = blocks[bb[i]][:3]
            m0 = la[i]
            buf[k, :m0] = shv_x[sho_x[ra[i]]: sho_x[ra[i] + 1]]
            buf[k, m0: m0 + lb[i]] = shv_y[sho_y[rb[i]]: sho_y[rb[i] + 1]]
            wbuf[k, :m0] = wv_x[sho_x[ra[i]]: sho_x[ra[i] + 1]]
            wbuf[k, m0: m0 + lb[i]] = wv_y[sho_y[rb[i]]: sho_y[rb[i] + 1]]
        srt = np.argsort(buf, axis=1, kind="stable")
        buf = np.take_along_axis(buf, srt, axis=1)
        wbuf = np.take_along_axis(wbuf, srt, axis=1)
        eq = buf[:, 1:] == buf[:, :-1]
        valid = np.arange(buf.shape[1] - 1)[None, :] < (tot[idx] - 1)[:, None]
        minw = np.minimum(wbuf[:, 1:], wbuf[:, :-1])
        smin[idx] = np.where(eq & valid, minw, 0).sum(axis=1)
        pos = hi_pos
    return smin, wa, wb


@ray.remote(num_cpus=1)
def _dedup_verify_task(min_jaccard: float, n_bundles: int, *flat) -> pa.Table:
    """One pair-hash partition: concat the reducers' candidate arrays,
    cross-partition dedup (every copy of a pair lands here), then verify.
    Composite ids resolve directly to (bundle, row) — no hash index, no
    collisions. ``flat`` = 4*n_bundles per-bundle store arrays (shingle
    values/offsets, key bytes/offsets) followed by the candidate parts —
    passed as TOP-LEVEL refs so every array arrives zero-copy from the
    local plasma store (a prior design gathered the whole store into one
    re-serialized object through a single task: a serial full-store copy
    that dominated the stage and anti-scaled with CPUs)."""
    blocks = [tuple(flat[5 * i: 5 * i + 5]) for i in range(n_bundles)]
    parts = flat[5 * n_bundles:]
    lo = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
    hi = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
    if lo.size == 0:
        return _PAIR_SCHEMA.empty_table()
    pair_a, pair_b = _unique_pairs(lo, hi)
    ba = (pair_a >> _ID_BITS).astype(np.int64)
    ra = (pair_a & _ID_MASK).astype(np.int64)
    bb = (pair_b >> _ID_BITS).astype(np.int64)
    rb = (pair_b & _ID_MASK).astype(np.int64)
    if any(blocks[i][2].size for i in range(n_bundles)):
        # weighted (ICWS / bag) stores: exact Σmin/Σmax weighted jaccard
        smin, wwa, wwb = _batch_weighted(blocks, ba, ra, bb, rb)
        denom = wwa + wwb - smin
        jac = np.where(denom > 0, smin / np.maximum(denom, 1), 0.0)
    else:
        inter, la, lb = _batch_intersections(blocks, ba, ra, bb, rb)
        union = la + lb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    keep = np.flatnonzero(jac >= min_jaccard)
    a_out, b_out, j_out = [], [], []
    for i in keep:
        _, _, _, kb_x, ko_x = blocks[ba[i]]
        _, _, _, kb_y, ko_y = blocks[bb[i]]
        ka = kb_x[ko_x[ra[i]]: ko_x[ra[i] + 1]].tobytes().decode("utf-8")
        kb = kb_y[ko_y[rb[i]]: ko_y[rb[i] + 1]].tobytes().decode("utf-8")
        if kb < ka:
            ka, kb = kb, ka
        a_out.append(ka)
        b_out.append(kb)
        j_out.append(float(jac[i]))
    return pa.table(
        {
            "a_key": pa.array(a_out, type=pa.string()),
            "b_key": pa.array(b_out, type=pa.string()),
            "jaccard": pa.array(j_out, type=pa.float64()),
        }
    )


def _driver_pair_verify(rep_sigs_ds, cfg: DedupConfig, min_jaccard: float,
                        exclude_buckets: np.ndarray | None = None,
                        defer_hot: bool = False,
                        defer_budget: int | None = None):
    """Single-node-fast LSH tail as a hand-rolled ref-based shuffle: every
    phase (partitioned light explode, per-bucket-partition pair
    generation, pair-hash-partitioned cross dedup + verification) runs in
    parallel Ray tasks over zero-copy numpy blocks; the DRIVER ONLY
    ROUTES OBJECTREFS — no candidate-pair merge, no table concat — which
    keeps the serial fraction near zero (what the two-cluster-size
    scaling criterion actually measures). The verified pair tables feed
    ``from_arrow_refs`` directly. (The co-partitioned Dataset groupby
    path is the default for corpora whose exploded bucket membership
    outgrows single-machine memory.)

    With ``defer_hot=True`` returns ``(pairs_ds, hot_keys, hot_sizes)``:
    the reducers skip pathologically hot bucket runs (exact global
    counts — each bucket lives wholly in one reducer partition) and
    report them; the caller verifies those through the salted ScanCount
    groupby (``_hot_scan_pairs``) and merges distinct. Healthy corpora
    report nothing and pay nothing — there is no probe pass."""
    import ray.data as rd

    block_refs = rep_sigs_ds.materialize().to_arrow_refs()
    # bundle blocks into ~2x-CPU map tasks (per-task overhead amortized)
    n_bundles = max(1, min(64, len(block_refs)))
    per = -(-len(block_refs) // n_bundles)
    bundles = [block_refs[o: o + per] for o in range(0, len(block_refs), per)]
    map_futs = [
        _light_part_task.remote(i, cfg.lsh_bands, *bundle)
        for i, bundle in enumerate(bundles)
    ]

    # reducers get only their own bucket partition's refs; each returns
    # its candidate pairs re-partitioned by pair hash (+ a hot report)
    excl_ref = ray.put(exclude_buckets)
    defer_floor = 2 * cfg.lsh_bucket_salt_above if defer_hot else 0
    if defer_budget is None:
        defer_budget = _DEFER_BUDGET_PER_REDUCER
    red_futs = [
        _pairgen_reducer.remote(excl_ref, defer_floor, defer_budget,
                                *[f[p] for f in map_futs])
        for p in range(_N_PARTS)
    ]

    # per-bundle store arrays passed straight through as top-level refs
    store_refs = [
        r for f in map_futs
        for r in (f[_N_PARTS], f[_N_PARTS + 1], f[_N_PARTS + 2],
                  f[_N_PARTS + 3], f[_N_PARTS + 4])
    ]
    ver_futs = [
        _dedup_verify_task.remote(
            min_jaccard, len(map_futs), *store_refs,
            *[r[q] for r in red_futs]
        )
        for q in range(_N_PARTS)
    ]
    pairs_ds = rd.from_arrow_refs(ver_futs)
    if not defer_hot:
        return pairs_ds
    # hot reports are tiny ((2, h) per reducer); reducers finish before
    # the already-submitted verify tasks, so this sync adds no pass
    reports = ray.get([r[_N_PARTS] for r in red_futs])
    hk = np.concatenate([r[0] for r in reports])
    hn = np.concatenate([r[1] for r in reports])
    order = np.argsort(hk)  # buckets are unique across reducer partitions
    hot_keys = hk[order]
    hot_sizes = dict(zip(hot_keys.tolist(), hn[order].tolist()))
    return pairs_ds, hot_keys, hot_sizes


# hot-bucket pair mass above which a reducer starts deferring its
# largest runs to the salted ScanCount groupby. PER-REDUCER budget, set
# to 1/4 of the round-4 hybrid's 20M GLOBAL trigger — NOT 20M/_N_PARTS:
# pathological boilerplate mass concentrates in a handful of buckets
# (and therefore reducers), so a uniform split would fire on healthy
# corpora whose few-M-pair family buckets the inline path chews through
# faster than the ScanCount half's ~2-3 s fixed cost (measured: the
# weighted-bag bench corpora carry 0.8k-1.9k-member buckets ≈ 2M pairs
# per hottest reducer and regressed 1.7-2x under a 625k budget). 5M
# pairs ≈ the point where the reducer's own pairgen materialization
# (16 B x 2 per pair) plus the downstream verify mass clearly exceed
# that fixed cost.
_HYBRID_PAIR_MASS = 20_000_000
_DEFER_BUDGET_PER_REDUCER = _HYBRID_PAIR_MASS // 4


def _hot_scan_pairs(rep_sigs_ds, cfg: DedupConfig, thr: float,
                    hot_keys: np.ndarray, hot_sizes: dict[int, int]):
    """Verify the DEFERRED hot buckets through the salted (bucket, sgrp)
    groupby whose ScanCount kernel costs posting-list time (Σ|A∩B|,
    ~1/9 of per-pair merges on template-heavy candidates). A pair whose
    first shared band is hot but that also shares a later cold band is
    emitted by both halves (the first-band rule only dedups within the
    hot half), so the caller merges distinct — jaccard is exact and
    identical on both routes."""
    surv_ref = ray.put((hot_keys, hot_sizes))
    # ScanCount groups tolerate ~4x larger salt classes than the triu
    # kernel (cost is posting mass, invariant to the split) — the
    # replication volume of a B-member bucket is B * ceil(B / class),
    # so the bigger class cuts the hot half's payload shuffle ~4x
    scan_salt = max(4 * cfg.lsh_bucket_salt_above, 1024)

    def heavy(batch: pa.Table) -> pa.Table:
        surv, hs = ray.get(surv_ref)
        return heavy_explode(batch, cfg, surv, hs, salt_limit=scan_salt)

    exploded = rep_sigs_ds.map_batches(
        heavy, batch_format="pyarrow", batch_size=cfg.batch_size)
    bv = BucketVerify(cfg, thr)

    def verify_bucket(group: pa.Table) -> pa.Table:
        return bv(group)

    return exploded.groupby(["bucket", "sgrp"]).map_groups(
        verify_bucket, batch_format="pyarrow")


def _merge_distinct_pairs(hot_pairs, cold_pairs):
    """Union the hot/cold halves and aggregate distinct (both routes are
    exact, so a doubly-emitted pair carries identical jaccard)."""
    from ray.data.aggregate import Min

    merged = (hot_pairs.union(cold_pairs)
              .groupby(["a_key", "b_key"])
              .aggregate(Min("jaccard", alias_name="jaccard")))

    def project(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        return pa.table({n: b[n] for n in _PAIR_SCHEMA.names},
                        schema=_PAIR_SCHEMA)

    return merged.map_batches(project, batch_format="pyarrow")


def lsh_verified_pairs(rep_sigs_ds, cfg: DedupConfig,
                       min_jaccard: float | None = None,
                       distributed_counts: bool | None = None,
                       copartition_verify: bool | None = None):
    """representatives' signatures → verified near-dup pairs
    (a_key < b_key, exact shingle Jaccard >= threshold). Each true pair is
    emitted exactly once.

    Path selection (``copartition_verify=None``): the driver-routed
    ref-shuffle below ``cfg.lsh_driver_max_rows`` representatives (lowest
    serial overhead), the co-partitioned Dataset path above it — so the
    pipeline that runs by default at scale IS the scale pipeline. Below
    the cutover the driver path defers pathologically hot buckets
    LAZILY: its bucket-partitioned reducers see exact global bucket
    sizes for free and report runs past the per-reducer pair-mass
    budget, which then verify through the salted ScanCount groupby
    (``_hot_scan_pairs``) and merge distinct — exact either way, no
    probe pass, and healthy corpora pay nothing."""
    thr = cfg.jaccard_dup_threshold if min_jaccard is None else min_jaccard
    rep_sigs_ds = rep_sigs_ds.materialize()
    if copartition_verify is None:
        n_reps = rep_sigs_ds.count()
        copartition_verify = n_reps > cfg.lsh_driver_max_rows
        if distributed_counts is None:
            distributed_counts = n_reps > cfg.lsh_driver_max_rows
    if distributed_counts is None:
        distributed_counts = False
    if not copartition_verify:
        if thr <= 0:
            # no threshold to prune by → ScanCount's count bound is
            # vacuous; run everything through the per-pair verify
            return _driver_pair_verify(rep_sigs_ds, cfg, thr)
        cold, hot_keys, hot_sizes = _driver_pair_verify(
            rep_sigs_ds, cfg, thr, defer_hot=True)
        if hot_keys.size == 0:
            return cold
        hot = _hot_scan_pairs(rep_sigs_ds, cfg, thr, hot_keys, hot_sizes)
        return _merge_distinct_pairs(hot, cold)

    # materialized once: the skinny (bucket, row_key) explode is consumed
    # twice (count pass + surviving-membership collect)
    light = rep_sigs_ds.map_batches(
        lambda t: light_explode(t, cfg),
        batch_format="pyarrow", batch_size=cfg.batch_size,
    ).materialize()
    salt_limit = cfg.lsh_bucket_salt_above
    hot_sizes: dict[int, int] = {}
    if distributed_counts:
        # 10^12-row path: bucket cardinality outgrows the driver → native
        # grouped count (sort shuffle), stream the survivors back
        counts = light.groupby("bucket").aggregate(Count(alias_name="n"))
        surv_parts: list[np.ndarray] = []
        for b in counts.filter(expr="n >= 2").iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            bk = b["bucket"].to_numpy()
            nn = b["n"].to_numpy()
            surv_parts.append(bk)
            hot = nn > salt_limit
            if hot.any():
                hot_sizes.update(zip(bk[hot].tolist(), nn[hot].tolist()))
        surviving = (np.sort(np.concatenate(surv_parts))
                     if surv_parts else np.empty(0, np.int64))
    else:
        # partial per-batch counts + one numpy merge on the driver: for
        # collection sizes whose bucket keys fit memory this is ~10x
        # faster than the distributed sort-aggregate (measured 16.5s → <1s
        # on 2.3M exploded rows)
        def partial(batch: pa.Table) -> pa.Table:
            u, c = np.unique(batch["bucket"].to_numpy(), return_counts=True)
            return pa.table(
                {"bucket": pa.array(u), "n": pa.array(c.astype(np.int64))}
            )

        bucket_arrs, count_arrs = [], []
        for b in light.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            bucket_arrs.append(b["bucket"].to_numpy())
            count_arrs.append(b["n"].to_numpy())
        if bucket_arrs:
            all_b = np.concatenate(bucket_arrs)
            all_c = np.concatenate(count_arrs)
            u, inv = np.unique(all_b, return_inverse=True)
            totals = np.bincount(inv, weights=all_c)
            keep = totals >= 2
            surviving = np.sort(u[keep])
            hot = totals > salt_limit
            hot_sizes = dict(zip(
                u[hot].tolist(), totals[hot].astype(np.int64).tolist()
            ))
        else:
            surviving = np.empty(0, np.int64)
    if surviving.size == 0:
        import ray.data as rd

        return rd.from_arrow(_PAIR_SCHEMA.empty_table())

    surv_ref = ray.put((surviving, hot_sizes))

    def heavy(batch: pa.Table) -> pa.Table:
        surv, hot = ray.get(surv_ref)
        return heavy_explode(batch, cfg, surv, hot)

    exploded = rep_sigs_ds.map_batches(
        heavy, batch_format="pyarrow", batch_size=cfg.batch_size
    )
    bv = BucketVerify(cfg, min_jaccard)

    def verify_bucket(group: pa.Table) -> pa.Table:
        return bv(group)

    return exploded.groupby(["bucket", "sgrp"]).map_groups(
        verify_bucket, batch_format="pyarrow"
    )
