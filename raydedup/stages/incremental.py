"""Incremental deduplication against a PERSISTED signature index.

Why this exists (the 100-TB operational story): a production corpus is
deduped once, then new crawl / transcript shards arrive continuously.
Re-running the full self-join over old+new re-pays the old corpus's
signature and shuffle cost on every arrival. Instead:

- ``build_dedup_index(corpus)`` computes signatures ONCE, collapses
  exact-duplicate texts to their representative (min key per sha — the
  same survivor contract as ``stages/exact.py``), and persists one
  Parquet directory of ``(row_key, text_sha256, band_hashes,
  shingle_hashes, n_shingles)`` rows plus a config manifest. The old
  corpus's TEXT is never needed again.
- ``dedup_against_index(new_shard, index_dir)`` labels every new row
  ``exact`` (sha match in the index), ``near`` (LSH band collision with
  a stored representative, exact-verified shingle-set Jaccard >=
  threshold), or ``new`` — with cost proportional to the NEW shard plus
  the sparse collision set, never to the old corpus.

Ray-Data shape:
- the index is ONE parquet directory; each probe phase reads only the
  columns it needs (``columns=[...]`` pruning): the exact phase moves
  ~100 B/row, the candidate phase moves band hashes, and only the
  (sparse) verified-candidate set ever touches the stored shingle sets;
- every phase is a distributed ``Dataset.join`` — nothing corpus-scale
  lands on the driver and the new shard streams through ``map_batches``
  signature tasks exactly like the self-join DAG (same per-worker
  cached kernel, ``stages/signatures.py``);
- shingle sets cross the verify joins as length-prefixed ``binary``
  blobs because Acero hash joins reject ``list<...>`` payload columns;
  the encode/decode is offsets-buffer arithmetic, no per-row Python;
- candidate verification reuses the shared tiled intersection kernel
  (``stages/lsh.py``) — exact set Jaccard, so output correctness does
  not depend on MinHash estimation; candidate recall is the standard
  LSH band guarantee at the index's (bands, rows) config.

Reference semantics: same shingle/signature config as the self-join
dedup DAG; ``exact`` mirrors otmt's identical-content collapse
(reference cluster semantics, otmt/archivecrawl.py's one-URI-one-row
contract generalized), ``near`` mirrors the verified-pair threshold of
``pipelines/neardup.py``. blake64 shingle hashing is the engine-wide
documented collision contract.

Endianness note: blobs and stored hashes are native little-endian
uint64; an index is portable across any LE cluster (x86/arm), which is
every supported Ray target.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from raydedup.config import DedupConfig, DEFAULT_CONFIG
from raydedup.util import join_partitions

_SIGS_SUBDIR = "sigs"
_META_FILE = "meta.json"
_GEN_FMT = "sigs-{:03d}"

# DedupConfig fields that must be IDENTICAL at build and probe time —
# they change the stored signatures, so probing with a different value
# is a silent-correctness bug, not a knob.
_SIG_FIELDS = (
    "minhash_num_perms", "minhash_shingle_words", "minhash_seed",
    "lsh_bands", "lsh_rows", "stemming", "remove_stopwords",
)

_OUT_SCHEMA = pa.schema([
    pa.field("key", pa.string()),
    pa.field("status", pa.string()),
    pa.field("match_key", pa.string()),
    pa.field("jaccard", pa.float64()),
])


def _lists_to_blob(col) -> pa.Array:
    """list<uint64> column → binary column (8 bytes per element), via
    offsets-buffer arithmetic only — the join-safe encoding of a
    shingle set (Acero rejects list payloads in hash joins)."""
    la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(la)
    if n == 0:
        return pa.array([], type=pa.binary())
    offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = la.flatten().to_numpy(zero_copy_only=False)
    boffs = ((offs - offs[0]) * 8).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(boffs.tobytes()), pa.py_buffer(flat.tobytes())])


def _blob_views(col) -> tuple[np.ndarray, np.ndarray]:
    """binary column → (flat uint64 values, int64 element offsets);
    blob i is ``flat[offs[i]:offs[i+1]]``. Zero-copy buffer views."""
    ba = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(ba)
    if n == 0:
        return np.empty(0, np.uint64), np.zeros(1, np.int64)
    off_buf = np.frombuffer(ba.buffers()[1], dtype=np.int32)
    boffs = off_buf[ba.offset: ba.offset + n + 1].astype(np.int64)
    count = int(boffs[-1]) // 8
    flat = np.frombuffer(ba.buffers()[2], dtype=np.uint64, count=count)
    return flat, boffs // 8


def build_dedup_index(ds, out_dir: str, cfg: DedupConfig = DEFAULT_CONFIG,
                      key_cols: list[str] | None = None,
                      text_col: str = "text") -> dict:
    """Corpus → persisted dedup index at ``out_dir``; returns the
    manifest dict. One signature pass, one exact-dedup collapse, one
    column-pruned parquet write — the corpus text never persists."""
    from raydedup.pipelines.neardup import signatures_with_rep

    assigned = signatures_with_rep(ds, cfg, key_cols=key_cols,
                                   text_col=text_col)
    reps = assigned.filter(expr="is_rep").select_columns([
        "row_key", "text_sha256", "band_hashes", "shingle_hashes",
        "n_shingles",
    ])
    sigs_path = os.path.join(out_dir, _SIGS_SUBDIR)
    # Ray's write_parquet APPENDS into an existing dir — a re-run over
    # a half-written previous attempt would duplicate rows (or trip on
    # a truncated file), so clear the target first; the manifest is
    # only (re)published after a complete write
    shutil.rmtree(sigs_path, ignore_errors=True)
    reps.write_parquet(sigs_path)
    # an empty corpus writes no files (and possibly no directory) —
    # still a valid index: every probe row comes back 'new'
    os.makedirs(sigs_path, exist_ok=True)
    manifest = {
        "n_reps": _count_rows(sigs_path),
        "generations": [_SIGS_SUBDIR],
        "config": {f: getattr(cfg, f) for f in _SIG_FIELDS},
    }
    _write_manifest(out_dir, manifest)
    return manifest


def _count_rows(path: str) -> int:
    return int(sum(
        pq.read_metadata(os.path.join(path, f)).num_rows
        for f in os.listdir(path) if f.endswith(".parquet")
    ))


def _write_manifest(out_dir: str, manifest: dict) -> None:
    # atomic publish: a crashed extend never leaves a manifest that
    # references a half-written generation
    tmp = os.path.join(out_dir, _META_FILE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, _META_FILE))


def extend_dedup_index(new_ds, index_dir: str, labels_ds,
                       cfg: DedupConfig = DEFAULT_CONFIG,
                       key_cols: list[str] | None = None,
                       text_col: str = "text",
                       statuses: tuple = ("new",),
                       shard_id: str | None = None) -> dict:
    """Append a probed shard's SURVIVORS to the index as a new
    generation — the second half of the continuous-ingestion loop:
    probe shard → keep rows ``dedup_against_index`` labeled ``'new'``
    (the default policy; pass ``statuses=('new', 'near')`` to also
    index near-dup survivors) → ``extend`` → the next shard dedups
    against old + all appended generations.

    Within-shard exact duplicates collapse to their min-key rep before
    writing (same contract as build). Because ``'exact'``-labeled rows
    are excluded by default, generations stay disjoint on text — the
    stored min-key rep of any text is unique across the whole index.
    Each generation is its own parquet directory and the manifest is
    republished atomically, so a crashed extend is invisible and the
    write is resumable by simply re-running it.

    ``shard_id`` (optional) makes the append IDEMPOTENT per shard: an
    id already recorded in the manifest's ``shards`` list returns the
    manifest unchanged, so a resumed ingestion loop can replay every
    shard unconditionally without double-indexing any of them.
    """
    from raydedup.pipelines.neardup import signatures_with_rep

    manifest = _load_manifest(index_dir, cfg)
    if shard_id is not None and shard_id in manifest.get("shards", []):
        return manifest
    keep = labels_ds.filter(
        expr=" or ".join(f"status == '{s}'" for s in statuses))
    key_batches = list(keep.select_columns(["key"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"))
    keys = (pa.concat_tables(key_batches)["key"].combine_chunks()
            if key_batches else pa.array([], pa.string()))
    key_ref = ray.put(keys)

    assigned = signatures_with_rep(new_ds, cfg, key_cols=key_cols,
                                   text_col=text_col)

    def survivors(batch: pa.Table) -> pa.Table:
        wanted = ray.get(key_ref)
        mask = pc.and_(
            pc.is_valid(pc.index_in(batch["row_key"], value_set=wanted)),
            batch["is_rep"].combine_chunks())
        return batch.filter(mask)

    # smallest free slot, NOT len(generations): after a compaction the
    # surviving generation keeps its original name (e.g. 'sigs-003'
    # with len == 1), so a pure length counter would eventually collide
    # with — and clobber — a live generation
    n = len(manifest["generations"])
    while _GEN_FMT.format(n) in manifest["generations"]:
        n += 1
    gen = _GEN_FMT.format(n)
    gen_path = os.path.join(index_dir, gen)
    # a run killed between this write and the manifest publish leaves
    # orphan files in gen_path; Ray's write_parquet APPENDS, so the
    # replay must clear them or the generation double-counts (and a
    # truncated orphan would brick every later read)
    shutil.rmtree(gen_path, ignore_errors=True)
    assigned.map_batches(
        survivors, batch_format="pyarrow",
    ).select_columns([
        "row_key", "text_sha256", "band_hashes", "shingle_hashes",
        "n_shingles",
    ]).write_parquet(gen_path)
    os.makedirs(gen_path, exist_ok=True)
    manifest["generations"].append(gen)
    manifest["n_reps"] += _count_rows(gen_path)
    if shard_id is not None:
        manifest.setdefault("shards", []).append(shard_id)
    _write_manifest(index_dir, manifest)
    return manifest


def _load_manifest(index_dir: str, cfg: DedupConfig) -> dict:
    with open(os.path.join(index_dir, _META_FILE)) as fh:
        manifest = json.load(fh)
    bad = {f: (manifest["config"][f], getattr(cfg, f))
           for f in _SIG_FIELDS if manifest["config"][f] != getattr(cfg, f)}
    if bad:
        raise ValueError(
            "dedup index was built with a different signature config; "
            f"probing it would be silently wrong: {bad}")
    return manifest


def _project(ds, schema: pa.Schema):
    """Fixed-schema projection barrier between chained Dataset.joins
    (join outputs can't expose a schema to the next join's planner) —
    also pins the schema of zero-row blocks."""
    names = schema.names

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return schema.empty_table()
        return pa.table({n: batch[n] for n in names}, schema=schema)

    return ds.map_batches(fn, batch_format="pyarrow")


# a (new-side count x old-side count) bucket product above which the
# candidate equi-join + per-pair verify would dominate the probe (the
# boilerplate-index pathology: sub-threshold template docs accumulate
# as 'new' and every future shard's template docs cross-join against
# them quadratically); such HOT buckets route to the R-S ScanCount
# groupby instead — exact either way, the split only moves work
_PROBE_HOT_PRODUCT = 1_000_000


def _hot_bucket_rs_verify(nsig, sigs_paths, hot_keys, old_counts,
                          new_counts, cfg: DedupConfig, thr: float,
                          class_target: int = 1024):
    """Exact R-S verification of the HOT probe buckets: both sides'
    members co-group per (bucket, old-class, new-class) — classes of
    ~``class_target`` members per side, every class pair its own group,
    so coverage is the exact cross product with bounded group memory —
    and each group runs a cross-side SCANCOUNT: pair intersections
    accumulate through per-element posting lists, elements present in
    EVERY group member enter as a constant with inclusion-exclusion
    complement corrections (the boilerplate template core), and
    extraction uses the exact bound c >= ceil(2t*lmin/(1+t)) - base.
    Returns Dataset(key, okey, jaccard >= thr) — same schema the cold
    join-verify emits; duplicated (key, okey) rows across the two
    routes carry identical jaccard and reduce away in the shared
    argmax."""
    from raydedup.stages.lsh import (_fused_buckets, _bands_matrix,
                                     _key_class_hash)

    hot_sorted = np.sort(hot_keys)
    so_arr = np.array(
        [max(1, -(-int(old_counts[b]) // class_target))
         for b in hot_sorted], dtype=np.int64)
    sn_arr = np.array(
        [max(1, -(-int(new_counts[b]) // class_target))
         for b in hot_sorted], dtype=np.int64)
    plan_ref = ray.put((hot_sorted, so_arr, sn_arr))
    out_schema = pa.schema([
        pa.field("key", pa.string()), pa.field("okey", pa.string()),
        pa.field("jaccard", pa.float64()),
    ])
    grp_schema = pa.schema([
        pa.field("bucket", pa.int64()), pa.field("co", pa.int32()),
        pa.field("cn", pa.int32()), pa.field("side", pa.int32()),
        pa.field("key", pa.string()), pa.field("blob", pa.binary()),
    ])

    def explode_side(side: int):
        def fn(b: pa.Table) -> pa.Table:
            hs, so, sn = ray.get(plan_ref)
            b = b.filter(pc.greater(b["n_shingles"], 0))
            n = b.num_rows
            if n == 0:
                return grp_schema.empty_table()
            fused = _fused_buckets(_bands_matrix(b, cfg.lsh_bands),
                                   cfg.lsh_bands)
            mask = np.isin(fused, hs)
            rows, bands = np.nonzero(mask)
            if rows.size == 0:
                return grp_schema.empty_table()
            # one incidence per (row, DISTINCT hot bucket); everything
            # below is vectorized, including the salt-class identity
            # hash (_key_class_hash over the distinct source rows)
            bk = fused[rows, bands]
            # collision-free dedup key: dense index into the sorted hot
            # array (NOT a truncated bucket hash — two hot buckets
            # colliding on low bits would silently drop an incidence)
            pos = np.searchsorted(hs, bk)
            pairkey = rows.astype(np.int64) * np.int64(len(hs)) + pos
            _, first = np.unique(pairkey, return_index=True)
            rows, bk, pos = rows[first], bk[first], pos[first]
            keys = b["row_key"].combine_chunks()
            blobs = _lists_to_blob(b["shingle_hashes"])
            need = np.unique(rows)
            key_h = np.zeros(b.num_rows, dtype=np.int64)
            key_h[need] = _key_class_hash(pc.take(keys, pa.array(need)))
            s_self = (so if side == 1 else sn)[pos]
            s_other = (sn if side == 1 else so)[pos]
            ci_self = key_h[rows] % s_self
            reps = s_other
            total = int(reps.sum())
            rep_inc = np.repeat(np.arange(rows.size, dtype=np.int64),
                                reps)
            cum = np.concatenate(([0], np.cumsum(reps)))
            j = np.arange(total, dtype=np.int64) - cum[rep_inc]
            take = pa.array(rows[rep_inc])
            co_out = (ci_self[rep_inc] if side == 1 else j)
            cn_out = (j if side == 1 else ci_self[rep_inc])
            return pa.table({
                "bucket": pa.array(bk[rep_inc], pa.int64()),
                "co": pa.array(co_out.astype(np.int32), pa.int32()),
                "cn": pa.array(cn_out.astype(np.int32), pa.int32()),
                "side": pa.array(
                    np.full(total, side, np.int32), pa.int32()),
                "key": pc.take(keys, take),
                "blob": pc.take(blobs, take),
            })

        return fn

    old_side = ray.data.read_parquet(
        sigs_paths,
        columns=["row_key", "band_hashes", "n_shingles",
                 "shingle_hashes"]).map_batches(
        explode_side(1), batch_format="pyarrow")
    new_side = nsig.select_columns(
        ["row_key", "band_hashes", "n_shingles",
         "shingle_hashes"]).map_batches(
        explode_side(0), batch_format="pyarrow")

    def verify_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "side" not in g.column_names:
            return out_schema.empty_table()
        side = g["side"].to_numpy(zero_copy_only=False)
        new_i = np.flatnonzero(side == 0)
        old_i = np.flatnonzero(side == 1)
        if new_i.size == 0 or old_i.size == 0:
            return out_schema.empty_table()
        flat, offs = _blob_views(g["blob"])
        lens = offs[1:] - offs[:-1]
        nn, no_ = new_i.size, old_i.size
        # dense ids over the group's elements
        inv = np.unique(flat[offs[0]: offs[-1]],
                        return_inverse=True)[1]
        m = g.num_rows
        docidx = np.repeat(np.arange(m, dtype=np.int64),
                           lens)
        order = np.argsort(inv, kind="stable")
        e_s, d_s = inv[order], docidx[order]
        starts = np.flatnonzero(np.r_[True, e_s[1:] != e_s[:-1]])
        run_lens = np.diff(np.r_[starts, e_s.size])
        # member index -> (new rank | old rank)
        rank = np.empty(m, dtype=np.int64)
        rank[new_i] = np.arange(nn)
        rank[old_i] = np.arange(no_)
        is_new = np.zeros(m, dtype=bool)
        is_new[new_i] = True
        counts = np.zeros(nn * no_, dtype=np.int64)
        dense = run_lens > m // 2
        base_dense = int(dense.sum())
        if base_dense:
            present = np.zeros(m, dtype=bool)
            for s0, L in zip(starts[dense], run_lens[dense]):
                present[:] = False
                present[d_s[s0: s0 + L]] = True
                miss = np.flatnonzero(~present)
                miss_new = miss[is_new[miss]]
                miss_old = miss[~is_new[miss]]
                for i in miss_new:
                    counts[rank[i] * no_: (rank[i] + 1) * no_] -= 1
                for j in miss_old:
                    counts[rank[j]::no_] -= 1
                if miss_new.size and miss_old.size:
                    rn = rank[miss_new]
                    ro = rank[miss_old]
                    counts[(rn[:, None] * no_ + ro[None, :]).ravel()] += 1
        for L in np.unique(run_lens[~dense]):
            if L < 2:
                continue
            rs = starts[~dense & (run_lens == L)]
            Li = int(L)
            step = max(1, (1 << 22) // (Li * Li))
            for lo in range(0, rs.size, step):
                M = d_s[rs[lo: lo + step, None] + np.arange(Li)[None, :]]
                mn = is_new[M]
                # cross pairs only: per row of M, new members x old members
                for row, rown in zip(M, mn):
                    nr = row[rown]
                    orr = row[~rown]
                    if nr.size and orr.size:
                        keys_ = (rank[nr][:, None] * no_
                                 + rank[orr][None, :]).ravel()
                        counts[keys_] += 1
        lmin = int(lens.min()) if lens.size else 0
        needed_min = int(np.ceil(2 * thr * lmin / (1 + thr)))
        cmin = needed_min - base_dense
        if cmin > 0:
            cand = np.flatnonzero(counts >= cmin)
        else:
            cand = np.arange(nn * no_, dtype=np.int64)
        if cand.size == 0:
            return out_schema.empty_table()
        ci = cand // no_
        cj = cand % no_
        inter = counts[cand] + base_dense
        la = lens[new_i][ci]
        lb = lens[old_i][cj]
        union = la + lb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = jac >= thr
        if not keep.any():
            return out_schema.empty_table()
        ci, cj, jac = ci[keep], cj[keep], jac[keep]
        keys_col = g["key"].combine_chunks()
        nk = pc.take(keys_col, pa.array(new_i[ci]))
        ok = pc.take(keys_col, pa.array(old_i[cj]))
        return pa.table({"key": nk, "okey": ok,
                         "jaccard": pa.array(jac, pa.float64())})

    return (old_side.union(new_side)
            .groupby(["bucket", "co", "cn"])
            .map_groups(verify_group, batch_format="pyarrow"))


def dedup_against_index(new_ds, index_dir: str,
                        cfg: DedupConfig = DEFAULT_CONFIG,
                        key_cols: list[str] | None = None,
                        text_col: str = "text",
                        min_jaccard: float | None = None,
                        compose_max: int = 5_000_000):
    """New shard → Dataset ``(key, status, match_key, jaccard)``:
    ``status`` is ``'exact'`` (text sha stored in the index — match_key
    is the stored representative, jaccard null), ``'near'`` (verified
    shingle-set Jaccard >= threshold vs a stored representative —
    match_key is the max-jaccard match, ties broken by min key; jaccard
    is the raw verified value), or ``'new'``. No intra-shard dedup —
    that is the self-join DAG's job; this operator answers "is it
    already in the corpus".
    """
    from raydedup.pipelines.neardup import signatures_with_rep
    from raydedup.stages.lsh import _tiled_intersections, light_explode

    manifest = _load_manifest(index_dir, cfg)
    thr = cfg.jaccard_dup_threshold if min_jaccard is None else min_jaccard
    # explicit file list across every generation dir (read_parquet
    # given a LIST expects file paths, and empty generations hold none)
    sigs_paths = [
        os.path.join(p, f)
        for p in (os.path.join(index_dir, g)
                  for g in manifest.get("generations", [_SIGS_SUBDIR]))
        if os.path.isdir(p)
        for f in sorted(os.listdir(p)) if f.endswith(".parquet")
    ]

    nsig = signatures_with_rep(new_ds, cfg, key_cols=key_cols,
                               text_col=text_col).drop_columns(
        ["rep_key", "n_exact", "is_rep"]).materialize()
    n_new = nsig.count()
    if n_new == 0:
        return ray.data.from_arrow(_OUT_SCHEMA.empty_table())
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    # size the probe joins by the LARGER side: the index side is the
    # big one and a shard-sized partition count would hash-build it
    # serially (measured 3x slower at a 200:1 index:shard ratio); both
    # join inputs here are _project-pinned map outputs, so over-
    # partitioning the small side is safe (schemas are exposed)
    jp = min(join_partitions(max(n_new, manifest["n_reps"])),
             max(2, 2 * ncpu))

    def all_new_status() -> ray.data.Dataset:
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "key": batch["row_key"],
                "status": pa.array(["new"] * n, pa.string()),
                "match_key": pa.array([None] * n, pa.string()),
                "jaccard": pa.array([None] * n, pa.float64()),
            }, schema=_OUT_SCHEMA)

        return nsig.select_columns(["row_key"]).map_batches(
            fn, batch_format="pyarrow")

    if manifest["n_reps"] == 0:
        return all_new_status()

    # ---- phase 1: exact (sha equi-join; index read prunes to 2 cols) ----
    old_exact = ray.data.read_parquet(
        sigs_paths, columns=["row_key", "text_sha256"])
    old_exact = _project(old_exact.map_batches(
        lambda b: b.rename_columns(["okey", "text_sha256"]),
        batch_format="pyarrow"),
        pa.schema([pa.field("okey", pa.string()),
                   pa.field("text_sha256", pa.string())]))
    new_sha = _project(
        nsig.select_columns(["row_key", "text_sha256"]).map_batches(
            lambda b: b.rename_columns(["key", "text_sha256"]),
            batch_format="pyarrow"),
        pa.schema([pa.field("key", pa.string()),
                   pa.field("text_sha256", pa.string())]))
    from ray.data.aggregate import Count, Max, Min
    ex_best = new_sha.join(
        old_exact, join_type="inner", num_partitions=jp,
        on=("text_sha256",),
    ).groupby("key").aggregate(Min("okey", alias_name="exact_match"))
    ex_best = _project(ex_best, pa.schema([
        pa.field("key", pa.string()),
        pa.field("exact_match", pa.string())])).materialize()

    # ---- phase 2: LSH candidates (band bucket equi-join) ----
    old_band_src = ray.data.read_parquet(
        sigs_paths, columns=["row_key", "band_hashes", "n_shingles"])
    old_bands = _project(
        old_band_src.map_batches(
            lambda b, _cfg=cfg: light_explode(b, _cfg).rename_columns(
                ["bucket", "okey"]),
            batch_format="pyarrow"),
        pa.schema([pa.field("bucket", pa.int64()),
                   pa.field("okey", pa.string())]))
    new_bands = _project(
        nsig.select_columns(
            ["row_key", "band_hashes", "n_shingles"]).map_batches(
            lambda b, _cfg=cfg: light_explode(b, _cfg),
            batch_format="pyarrow"),
        pa.schema([pa.field("bucket", pa.int64()),
                   pa.field("row_key", pa.string())]))

    # HOT-bucket split: per-side bucket counts (cheap partial merges);
    # a bucket whose |new| x |old| cross product exceeds
    # _PROBE_HOT_PRODUCT would dominate both the equi-join output and
    # the per-pair blob verify — route it to the R-S ScanCount groupby
    # (exact either way; duplicated pairs reduce in the shared argmax)
    def _bucket_counts(ds_):
        arrs_u, arrs_c = [], []
        for b in ds_.iter_batches(batch_size=1 << 20,
                                  batch_format="pyarrow"):
            u, c = np.unique(b["bucket"].to_numpy(), return_counts=True)
            arrs_u.append(u)
            arrs_c.append(c)
        if not arrs_u:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        u, inv = np.unique(np.concatenate(arrs_u), return_inverse=True)
        tot = np.bincount(inv, weights=np.concatenate(arrs_c))
        return u, tot.astype(np.int64)

    o_u, o_c = _bucket_counts(old_bands)
    n_u, n_c = _bucket_counts(new_bands)
    common, io_, in_ = np.intersect1d(o_u, n_u, return_indices=True)
    prod = o_c[io_] * n_c[in_]
    hot_mask = prod > _PROBE_HOT_PRODUCT
    hot_keys = common[hot_mask]
    hot_verified = None
    if hot_keys.size:
        old_counts = dict(zip(common[hot_mask].tolist(),
                              o_c[io_][hot_mask].tolist()))
        new_counts = dict(zip(common[hot_mask].tolist(),
                              n_c[in_][hot_mask].tolist()))
        hot_verified = _hot_bucket_rs_verify(
            nsig, sigs_paths, hot_keys, old_counts, new_counts, cfg, thr)
        hot_sorted = np.sort(hot_keys)
        cold_ref = ray.put(hot_sorted)

        def drop_hot(b: pa.Table) -> pa.Table:
            hs = ray.get(cold_ref)
            bk = b["bucket"].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(~np.isin(bk, hs)))

        old_bands = old_bands.map_batches(drop_hot, batch_format="pyarrow")
        new_bands = new_bands.map_batches(drop_hot, batch_format="pyarrow")

    cand = new_bands.join(
        old_bands, join_type="inner", num_partitions=jp, on=("bucket",),
    ).groupby(["row_key", "okey"]).aggregate(Count(alias_name="_nb"))
    cand = _project(cand, pa.schema([
        pa.field("row_key", pa.string()),
        pa.field("okey", pa.string())])).materialize()
    n_cand = cand.count()

    near_best = None
    verified = None
    jp_c = min(join_partitions(max(n_cand, 1)), max(2, 2 * ncpu))
    if n_cand:
        # ---- phase 3: exact verify over stored shingle sets ----
        # semi-filter the stored shingle sets down to the CANDIDATE
        # okeys before the verify join: candidates are shard-
        # proportional (LSH collisions), so this turns an index-wide
        # blob build side into a sparse one. The okey set is collected
        # once (bounded by n_cand, which is already materialized);
        # above semi_max it would be corpus-scale, so fall back to the
        # unfiltered join rather than a giant broadcast.
        semi_max = 2_000_000
        okeys = None
        if n_cand <= semi_max:
            ok_tbls = list(cand.select_columns(["okey"]).iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"))
            okeys = pc.unique(
                pa.concat_tables(ok_tbls)["okey"].combine_chunks())
        okeys_ref = ray.put(okeys)

        def old_to_blob(b: pa.Table) -> pa.Table:
            wanted = ray.get(okeys_ref)
            if wanted is not None:
                b = b.filter(pc.is_valid(
                    pc.index_in(b["row_key"], value_set=wanted)))
            return pa.table({
                "okey": b["row_key"],
                "oblob": _lists_to_blob(b["shingle_hashes"]),
            })

        old_blob = _project(
            ray.data.read_parquet(
                sigs_paths, columns=["row_key", "shingle_hashes"],
            ).map_batches(old_to_blob, batch_format="pyarrow"),
            pa.schema([pa.field("okey", pa.string()),
                       pa.field("oblob", pa.binary())]))
        new_blob = _project(
            nsig.select_columns(["row_key", "shingle_hashes"]).map_batches(
                lambda b: pa.table({
                    "row_key": b["row_key"],
                    "nblob": _lists_to_blob(b["shingle_hashes"]),
                }),
                batch_format="pyarrow"),
            pa.schema([pa.field("row_key", pa.string()),
                       pa.field("nblob", pa.binary())]))
        with_old = _project(
            cand.join(old_blob, join_type="inner",
                      num_partitions=jp_c, on=("okey",)),
            pa.schema([pa.field("row_key", pa.string()),
                       pa.field("okey", pa.string()),
                       pa.field("oblob", pa.binary())]))
        # materialize between the two joins: two chained join pools in
        # ONE streaming plan is the documented deadlock shape (their
        # memory reservations starve each other once the candidate
        # volume is real — reproduced at a 50k-index/10k-shard
        # boilerplate probe, which hung indefinitely without this
        # barrier and completes in ~2 min with it); the barrier is
        # candidate-pair-sized, the store spills it if needed
        with_old = with_old.materialize()
        with_both = _project(
            with_old.join(new_blob, join_type="inner",
                          num_partitions=jp_c, on=("row_key",)),
            pa.schema([pa.field("row_key", pa.string()),
                       pa.field("okey", pa.string()),
                       pa.field("oblob", pa.binary()),
                       pa.field("nblob", pa.binary())]))

        def verify(batch: pa.Table) -> pa.Table:
            empty = pa.table({"key": pa.array([], pa.string()),
                              "okey": pa.array([], pa.string()),
                              "jaccard": pa.array([], pa.float64())})
            if batch.num_rows == 0:
                return empty
            nf, no = _blob_views(batch["nblob"])
            of, oo = _blob_views(batch["oblob"])
            la = (no[1:] - no[:-1]).astype(np.int64)
            lb = (oo[1:] - oo[:-1]).astype(np.int64)
            nz = np.flatnonzero((la > 0) & (lb > 0))
            if nz.size == 0:
                return empty
            lan, lbn = la[nz], lb[nz]

            def fill(row: np.ndarray, i: int) -> None:
                r = nz[i]
                row[: lan[i]] = nf[no[r]: no[r + 1]]
                row[lan[i]: lan[i] + lbn[i]] = of[oo[r]: oo[r + 1]]

            inter = _tiled_intersections(lan, lbn, fill)
            jac = inter / (lan + lbn - inter)
            keep = jac >= thr
            sel = pa.array(nz[keep])
            return pa.table({
                "key": pc.take(batch["row_key"].combine_chunks(), sel),
                "okey": pc.take(batch["okey"].combine_chunks(), sel),
                "jaccard": pa.array(jac[keep], pa.float64()),
            })

        verified = with_both.map_batches(
            verify, batch_format="pyarrow").materialize()
    if hot_verified is not None:
        # the HOT-bucket ScanCount route's verified matches join the
        # cold route's before the shared argmax; duplicated (key, okey)
        # rows carry identical exact jaccard and reduce away there
        hv = hot_verified.map_batches(
            lambda b: pa.table(
                {"key": b["key"], "okey": b["okey"],
                 "jaccard": b["jaccard"]}),
            batch_format="pyarrow").materialize()
        verified = hv if verified is None else verified.union(hv)
    if verified is not None:
        if verified.count():
            # argmax jaccard per key, ties broken by min okey; raw
            # float ranking is safe — both engine and oracle compute
            # the identical exact-int division (c / (na + nb - c))
            best_j = verified.groupby("key").aggregate(
                Max("jaccard", alias_name="_bj"))
            best_j = _project(best_j, pa.schema([
                pa.field("key", pa.string()),
                pa.field("_bj", pa.float64())]))
            at_best = _project(
                verified.join(best_j, join_type="inner",
                              num_partitions=jp_c, on=("key",)),
                pa.schema([pa.field("key", pa.string()),
                           pa.field("okey", pa.string()),
                           pa.field("jaccard", pa.float64()),
                           pa.field("_bj", pa.float64())]))
            at_best = at_best.map_batches(
                lambda b: b.filter(pc.equal(b["jaccard"], b["_bj"])),
                batch_format="pyarrow")
            near_best = at_best.groupby("key").aggregate(
                Min("okey", alias_name="near_match"),
                Max("_bj", alias_name="_nj"),
            )
            near_best = _project(near_best, pa.schema([
                pa.field("key", pa.string()),
                pa.field("near_match", pa.string()),
                pa.field("_nj", pa.float64())])).materialize()
            if near_best.count() == 0:
                near_best = None

    # ---- compose: exact > near > new ----
    def _compose(em, nm, nj, keys):
        has_e = pc.is_valid(em)
        status = pc.if_else(
            has_e, pa.scalar("exact", pa.string()),
            pc.if_else(pc.is_valid(nm), pa.scalar("near", pa.string()),
                       pa.scalar("new", pa.string())))
        return pa.table({
            "key": keys,
            "status": status,
            "match_key": pc.if_else(has_e, em, nm),
            "jaccard": pc.if_else(has_e, pa.scalar(None, pa.float64()), nj),
        }, schema=_OUT_SCHEMA)

    n_ex = ex_best.count()
    n_nb = near_best.count() if near_best is not None else 0
    if n_ex + n_nb <= compose_max:
        # both match tables are SHARD-bounded (<= one row per new key)
        # — broadcast them once and paint, instead of two more
        # left-outer joins (~2 s of fixed stage spin-up each; the same
        # pc.index_in idiom as exact.py's dup paint)
        def _flat(ds_, cols, types):
            tbls = [] if ds_ is None else list(ds_.iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"))
            if tbls:
                t = pa.concat_tables(tbls)
                return tuple(t[c].combine_chunks() for c in cols)
            return tuple(pa.array([], ty) for ty in types)

        ex_k, ex_m = _flat(ex_best if n_ex else None,
                           ["key", "exact_match"],
                           [pa.string(), pa.string()])
        nb_k, nb_m, nb_j = _flat(near_best,
                                 ["key", "near_match", "_nj"],
                                 [pa.string(), pa.string(), pa.float64()])
        paint_ref = ray.put((ex_k, ex_m, nb_k, nb_m, nb_j))

        def paint(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _OUT_SCHEMA.empty_table()
            exk, exm, nbk, nbm, nbj = ray.get(paint_ref)
            keys = batch["row_key"].combine_chunks()
            ei = pc.index_in(keys, value_set=exk)
            ni = pc.index_in(keys, value_set=nbk)
            return _compose(pc.take(exm, ei), pc.take(nbm, ni),
                            pc.take(nbj, ni), keys)

        return nsig.select_columns(["row_key"]).map_batches(
            paint, batch_format="pyarrow")

    # distributed fallback: left-outer joins (match tables too large to
    # broadcast — only possible when the shard itself is that large)
    base = _project(
        nsig.select_columns(["row_key"]).map_batches(
            lambda b: b.rename_columns(["key"]), batch_format="pyarrow"),
        pa.schema([pa.field("key", pa.string())]))
    if n_ex:
        base = _project(
            base.join(ex_best, join_type="left_outer",
                      num_partitions=jp, on=("key",)),
            pa.schema([pa.field("key", pa.string()),
                       pa.field("exact_match", pa.string())]))
    else:
        base = base.map_batches(
            lambda b: b.append_column(
                "exact_match", pa.array([None] * b.num_rows, pa.string())),
            batch_format="pyarrow")
    if near_best is not None:
        merged = base.join(near_best, join_type="left_outer",
                           num_partitions=jp, on=("key",))
    else:
        merged = base.map_batches(
            lambda b: b.append_column(
                "near_match", pa.array([None] * b.num_rows, pa.string()),
            ).append_column(
                "_nj", pa.array([None] * b.num_rows, pa.float64())),
            batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        return _compose(batch["exact_match"].combine_chunks(),
                        batch["near_match"].combine_chunks(),
                        batch["_nj"].combine_chunks(),
                        batch["key"])

    return merged.map_batches(finish, batch_format="pyarrow")


def corpus_diff(old_ds, new_ds, key_col: str = "doc_id",
                text_col: str = "text"):
    """Snapshot diff between two corpus versions: one row per key with
    ``status`` in {added, removed, changed, unchanged} — the audit
    artifact an incremental ingest publishes alongside its index
    extension (which keys this generation touched and how).

    Scale shape: each side reduces to (key, content sha256) INSIDE
    map_batches — per-batch dictionary_encode dedups repeated texts
    before hashing (same idiom as stages/signatures.py), and the text
    itself never crosses the exchange. The diff is ONE groupby shuffle
    of hash-sized rows: both sides union as (key, old_sha, new_sha)
    with the other side null, then null-skipping Max aggregates rebuild
    the per-key pair (each key has at most one non-null per column) —
    no reliance on outer-join key coalescing. Equal-sha <=> equal-text
    is the engine-wide sha256 exactness contract."""
    import hashlib

    from ray.data.aggregate import Max

    def hashed(self_col: str, other_col: str):
        def fn(b: pa.Table) -> pa.Table:
            enc = pc.dictionary_encode(b[text_col].combine_chunks())
            u_sha = pa.array(
                [hashlib.sha256(t.encode("utf-8")).hexdigest()
                 for t in enc.dictionary.to_pylist()], pa.string())
            sha = pc.take(u_sha, enc.indices)
            n = b.num_rows
            cols = {key_col: b[key_col], self_col: sha,
                    other_col: pa.nulls(n, pa.string())}
            return pa.table({key_col: cols[key_col],
                             "old_sha": cols["old_sha"],
                             "new_sha": cols["new_sha"]})
        return fn

    tagged = old_ds.select_columns([key_col, text_col]).map_batches(
        hashed("old_sha", "new_sha"), batch_format="pyarrow").union(
        new_ds.select_columns([key_col, text_col]).map_batches(
            hashed("new_sha", "old_sha"), batch_format="pyarrow"))
    agg = tagged.groupby(key_col).aggregate(
        Max("old_sha", alias_name="old_sha"),
        Max("new_sha", alias_name="new_sha"))

    statuses = np.array(["added", "removed", "changed", "unchanged"])

    def label(b: pa.Table) -> pa.Table:
        old = b["old_sha"]
        new = b["new_sha"]
        no_old = pc.is_null(old).to_numpy(zero_copy_only=False)
        no_new = pc.is_null(new).to_numpy(zero_copy_only=False)
        same = pc.equal(old, new).fill_null(False).to_numpy(
            zero_copy_only=False)
        code = np.select([no_old, no_new, ~same], [0, 1, 2], default=3)
        return pa.table({key_col: b[key_col],
                         "status": pa.array(statuses[code], pa.string())})

    return agg.map_batches(label, batch_format="pyarrow")


def _index_files(index_dir: str, gens: list[str]) -> list[str]:
    return [os.path.join(index_dir, g, f)
            for g in gens
            for f in sorted(os.listdir(os.path.join(index_dir, g)))
            if f.endswith(".parquet")]


def compact_dedup_index(index_dir: str,
                        cfg: DedupConfig = DEFAULT_CONFIG) -> dict:
    """Rewrite every generation into ONE — the maintenance step of the
    continuous-ingestion loop. Each ``extend_dedup_index`` appends a
    small generation directory; after many shards a probe fans out over
    hundreds of small parquet files (per-file reader overhead, tiny row
    groups). Compaction streams all generations through one
    column-complete read -> one partitioned write, republishes the
    manifest atomically (a crash anywhere leaves the old manifest and
    its generations fully intact), then deletes the superseded
    generation directories. Also sweeps orphan ``sigs*`` directories a
    crashed extend/compact left behind (the manifest is the only source
    of truth; anything it doesn't reference is garbage).

    Generations written by the supported ingest flow are DISJOINT on
    text ('exact'-labeled rows never re-index), so compaction is a pure
    concatenation; the invariant is verified with one hash-sized
    groupby and a violation raises rather than silently double-listing
    a representative. Idempotent: a single-generation index is a no-op
    (after the orphan sweep)."""
    manifest = _load_manifest(index_dir, cfg)
    gens = manifest["generations"]
    known = set(gens)

    def sweep_orphans() -> None:
        for d in os.listdir(index_dir):
            p = os.path.join(index_dir, d)
            if (os.path.isdir(p) and d not in known
                    and (d == _SIGS_SUBDIR
                         or d.startswith(_SIGS_SUBDIR + "-"))):
                shutil.rmtree(p, ignore_errors=True)

    if len(gens) <= 1:
        sweep_orphans()
        return manifest

    n = len(gens)
    while _GEN_FMT.format(n) in gens:  # never reuse a live generation name
        n += 1
    target = _GEN_FMT.format(n)
    tpath = os.path.join(index_dir, target)
    shutil.rmtree(tpath, ignore_errors=True)
    files = _index_files(index_dir, gens)
    if files:
        from raydedup.util import repeated_keys

        ds = ray.data.read_parquet(files)
        n_dup = repeated_keys(ds.select_columns(["text_sha256"]),
                              "text_sha256").count()
        if n_dup:
            raise RuntimeError(
                f"index generations are not text-disjoint ({n_dup} "
                "shas stored twice) — refusing to compact; rebuild "
                "with build_dedup_index instead")
        ds.write_parquet(tpath)
    os.makedirs(tpath, exist_ok=True)
    manifest = {
        **manifest,
        "generations": [target],
        "n_reps": _count_rows(tpath),
    }
    _write_manifest(index_dir, manifest)
    known = {target}
    sweep_orphans()
    return manifest
