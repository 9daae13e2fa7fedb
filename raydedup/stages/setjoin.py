"""Exact set-similarity self-join via prefix filtering (the
AllPairs / PPJoin family: Bayardo, Ma & Srikant, WWW 2007; Xiao, Wang,
Lin & Yu, WWW 2008). Public-algorithm implementation from the papers.

Where MinHash-LSH (stages/lsh.py) generates candidates
*probabilistically* (recall < 1 is possible at any banding), the prefix
filter is **exact by construction**: under any one global total order of
the shingle universe, two sets with Jaccard >= t MUST share at least one
element inside each one's length-``(n - ceil(t*n) + 1)`` prefix, so
bucketing by prefix shingles and verifying inside buckets finds *every*
qualifying pair. This gives the engine a second, deterministic
candidate-generation family — the right tool when the dedup policy is
"recall exactly 1.0 at threshold t" (e.g. legal / contractual dedup
guarantees) and the LSH path when approximate-but-cheaper is acceptable.

Reference parity: OTMT scores Jaccard per memento against one anchor
(``otmt/timemap_measures.py`` jaccard handler); this operator is the
collection-scale generalization — all pairs over the same token/shingle
contract the near-dup oracles already pin down.

Scale shape (10^12-turn design):
- Stage 1 tokenize+shingle is a stateless ``map_batches`` reusing the
  per-worker blake-cache'd shingle kernel (functions/minhash.py); only
  ``(id, n, sorted-unique shingle hashes)`` survive — text is dropped
  before any shuffle.
- The global order is **hot-last**: the top-``hot_k`` most-frequent
  shingle hashes (exact distributed count over hashes, bounded top-k
  broadcast via ``ray.put``) sort AFTER all others, so corpus-hot
  boilerplate shingles almost never land in a prefix and the classic
  prefix-join skew failure (one bucket holding every doc that contains
  "the end") cannot form. Any total order is *correct* (the theorem
  quantifies over a fixed order); frequency-aware ordering is purely the
  skew/pruning optimization the papers recommend.
- Prefix explode replicates each doc's shingle list ``p ~ (1-t)*n + 1``
  times — the documented payload cost of the exact guarantee; at low
  thresholds prefer the LSH path. Singleton buckets (no possible pair)
  are dropped by a count-filter semi-join BEFORE the per-group verify,
  so no Python call is paid for them (util.repeated_keys, the same
  pre-filter the embedding-LSH and suffix-span stages use).
- Verification is the shared tiled pad-sort-count intersection kernel
  (stages/lsh.py:_tiled_intersections) — one vectorized sort per tile,
  never a per-pair ``np.intersect1d``; pairs found in several buckets
  collapse in one final (a, b) groupby.
- Exact-float contract: ``jaccard = common / (na + nb - common)`` is a
  single correctly-rounded division of exact ints, recomputed AFTER the
  dedup groupby — bit-identical to the DuckDB oracle's
  ``CAST(c AS DOUBLE) / (na + nb - c)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from raydedup.config import DedupConfig, DEFAULT_CONFIG
from raydedup.functions.minhash import MinHasher
from raydedup.stages.lsh import _tiled_intersections
from raydedup.textnorm import full_tokenize

# per-worker-process caches (module-level = once per Ray worker, shared
# across the stateless map_batches tasks that land on it)
_HASHERS: dict[tuple, MinHasher] = {}
_STEM_CACHES: dict[tuple, dict] = {}
_HOT_CACHE: dict[bytes, np.ndarray] = {}


def _hasher_for(cfg: DedupConfig) -> tuple[MinHasher, dict]:
    key = (cfg.minhash_seed, cfg.stemming, cfg.remove_stopwords)
    h = _HASHERS.get(key)
    if h is None:
        # num_perms=1: only the shingle-hash kernel (and its token blake
        # cache) is used here — no minhash permutations are evaluated
        h = MinHasher(1, cfg.minhash_seed)
        _HASHERS[key] = h
        _STEM_CACHES[key] = {}
    return h, _STEM_CACHES[key]


def _sets_schema(id_field: pa.Field) -> pa.Schema:
    return pa.schema([id_field,
                      pa.field("nsh", pa.int64()),
                      pa.field("sh", pa.list_(pa.uint64()))])


def shingle_sets(ds, cfg: DedupConfig = DEFAULT_CONFIG,
                 id_col: str = "doc_id", text_col: str = "text"):
    """rows → ``(id, nsh, sh)`` where ``sh`` is the doc's sorted-unique
    w-word-shingle hash set (same kernel + short-doc rule as the minhash
    signature stage, so the near-dup oracles' shingle CTE is the exact
    SQL mirror). Zero-shingle docs are dropped (they cannot reach any
    threshold > 0; the oracle's ``len(arr) > 0`` filter matches)."""

    def fn(batch: pa.Table) -> pa.Table:
        schema = _sets_schema(pa.field(id_col, batch.schema.field(id_col).type))
        if batch.num_rows == 0:
            return schema.empty_table()
        hasher, stem_cache = _hasher_for(cfg)
        enc = pc.dictionary_encode(
            pc.fill_null(batch[text_col].combine_chunks(), ""))
        row_to_uniq = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        token_lists = [
            full_tokenize(t, stemming=cfg.stemming,
                          remove_stopwords=cfg.remove_stopwords,
                          stem_cache=stem_cache)
            for t in enc.dictionary.to_pylist()
        ]
        flat_sh, offs = hasher.shingle_hash_arrays(
            token_lists, cfg.minhash_shingle_words)
        # per-doc sorted-unique in one batch lexsort (signature_batch's
        # trick — raydedup/stages/signatures.py)
        n_u = len(token_lists)
        d_ids = np.repeat(np.arange(n_u, dtype=np.int64), np.diff(offs))
        order = np.lexsort((flat_sh, d_ids))
        fs, fd = flat_sh[order], d_ids[order]
        keep = (np.r_[True, (fd[1:] != fd[:-1]) | (fs[1:] != fs[:-1])]
                if fs.size else np.empty(0, dtype=bool))
        values, vdocs = fs[keep], fd[keep]
        u_nsh = np.bincount(vdocs, minlength=n_u).astype(np.int64)
        u_offs = np.zeros(n_u + 1, dtype=np.int64)
        np.cumsum(u_nsh, out=u_offs[1:])
        u_lists = pa.ListArray.from_arrays(
            pa.array(u_offs, type=pa.int32()),
            pa.array(values, type=pa.uint64()))
        sel = pa.array(row_to_uniq)
        nsh = pa.array(u_nsh[row_to_uniq], type=pa.int64())
        out = pa.table({id_col: batch[id_col],
                        "nsh": nsh,
                        "sh": pc.take(u_lists, sel)})
        return out.filter(pc.greater(out["nsh"], pa.scalar(0)))

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def hot_shingle_hashes(sets_ds, k: int) -> np.ndarray:
    """Top-``k`` shingle hashes by corpus frequency, as a SORTED uint64
    array (the hot-last order's "late" set). Per-batch ``np.unique``
    partials PRUNED to the local top-``4k`` before the shuffle → one
    hash-keyed groupby sum over the pruned partials → per-block top-k
    combiner → bounded driver merge (≤ k rows per block).

    The per-batch prune makes the result approximate on the long tail
    (a hash hot in aggregate but below every batch's local top-4k can
    be missed), which is sound here by construction: the hot set only
    picks the global ORDER of the prefix-filter theorem, and the
    theorem holds under ANY fixed order — boilerplate hot enough to
    skew a bucket is per-batch frequent and always survives the local
    cut. What the prune buys at scale: the groupby shuffles ≤ 4k rows
    per input block instead of every distinct (hash, block) pair —
    orders of magnitude less exchange on a 100-TB corpus."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        shc = batch["sh"].combine_chunks()
        flat = shc.values.to_numpy(zero_copy_only=False)
        u, c = np.unique(flat, return_counts=True)
        if u.size > 4 * k:
            keep = np.lexsort((u, -c))[: 4 * k]
            u, c = u[keep], c[keep]
        return pa.table({"h": pa.array(u.view(np.int64), type=pa.int64()),
                         "c": pa.array(c.astype(np.int64), type=pa.int64())})

    counts = (sets_ds.select_columns(["sh"])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("h").aggregate(Sum("c", alias_name="c")))

    def topk_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "c" not in batch.column_names:
            return pa.table({"h": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        h = batch["h"].to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h, -c))[:k]
        return pa.table({"h": pa.array(h[order], type=pa.int64()),
                         "c": pa.array(c[order], type=pa.int64())})

    parts = [t for t in counts.map_batches(
        topk_part, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow") if t.num_rows]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    merged = pa.concat_tables(parts)
    h = merged["h"].to_numpy(zero_copy_only=False)
    c = merged["c"].to_numpy(zero_copy_only=False)
    order = np.lexsort((h, -c))[:k]
    return np.sort(h[order].view(np.uint64))


def _pack_u64_lists(shc: pa.ListArray) -> pa.BinaryArray:
    """list<uint64> rows → one binary blob per row (8 bytes/element).
    Ray's hash join (Acero) rejects list<> payload columns; a binary
    column is the standard length-prefix-free encoding (offsets carry
    the lengths). Zero-copy on the values buffer."""
    offs = shc.offsets.to_numpy().astype(np.int64)
    vals = shc.values.to_numpy(zero_copy_only=False)
    data = vals[offs[0]: offs[-1]].tobytes()
    rel = ((offs - offs[0]) * 8).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), len(shc),
        [None, pa.py_buffer(rel.tobytes()), pa.py_buffer(data)])


def _unpack_u64_binary(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """binary column → (flat uint64 values, int64 element offsets)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    buffers = col.buffers()
    byte_offs = np.frombuffer(buffers[1], dtype=np.int32,
                              count=len(col) + 1,
                              offset=col.offset * 4).astype(np.int64)
    flat = np.frombuffer(buffers[2], dtype=np.uint64,
                         count=byte_offs[-1] // 8)
    return flat[byte_offs[0] // 8:], (byte_offs - byte_offs[0]) // 8


def _prefix_len(lens: np.ndarray, threshold: float) -> np.ndarray:
    """Per-doc prefix length ``n - ceil(t*n) + 1``. The 1e-9 slack only
    ever LENGTHENS the prefix (more candidates, never fewer) — float
    error cannot cost a qualifying pair."""
    o_min = np.ceil(threshold * lens - 1e-9).astype(np.int64)
    return np.clip(lens - o_min + 1, 1, lens)


def _finish_pairs(verified, pair_schema: pa.Schema):
    """Append the exact-division jaccard column and pin the schema on an
    empty result (Ray 2.49 loses the schema when no block ever flows —
    same empty-pin idiom as stages/lsh.py)."""

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "common" not in batch.column_names:
            return pair_schema.empty_table()
        c = batch["common"].to_numpy(zero_copy_only=False).astype(np.float64)
        u = (batch["na"].to_numpy(zero_copy_only=False)
             + batch["nb"].to_numpy(zero_copy_only=False)
             - batch["common"].to_numpy(zero_copy_only=False)).astype(
                 np.float64)
        return batch.append_column(
            "jaccard", pa.array(c / u, type=pa.float64()))

    out = verified.map_batches(finish, batch_format="pyarrow").materialize()
    if out.count() == 0:
        return ray.data.from_arrow(pair_schema.empty_table())
    return out


def set_similarity_self_join(ds, threshold: float,
                             cfg: DedupConfig = DEFAULT_CONFIG,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             hot_k: int = 1024,
                             num_partitions: int | None = None,
                             verify_broadcast_max_rows: int = 200_000):
    """All pairs with token-shingle-set Jaccard >= ``threshold``, exactly.

    Returns a Dataset ``(a_id, b_id, common, na, nb, jaccard)`` with
    ``a_id < b_id`` — ``common``/``na``/``nb`` are exact intersection /
    set sizes so the float is auditable downstream.
    """
    sets = shingle_sets(ds, cfg, id_col=id_col, text_col=text_col)
    # ds.filter(lambda)-emptied inputs report schema() None (Ray 2.49);
    # fall back to the materialized sets' schema, then to string ids
    id_type = None
    sch = ds.schema()
    if sch is not None and id_col in sch.names:
        id_type = dict(zip(sch.names, sch.types))[id_col]
    return set_similarity_join_sets(
        sets, threshold, id_col=id_col, hot_k=hot_k,
        num_partitions=num_partitions,
        verify_broadcast_max_rows=verify_broadcast_max_rows,
        id_type=id_type)


def set_similarity_join_sets(sets, threshold: float,
                             id_col: str = "doc_id",
                             hot_k: int = 1024,
                             num_partitions: int | None = None,
                             verify_broadcast_max_rows: int = 200_000,
                             id_type: pa.DataType | None = None):
    """Exact prefix-filter self-join over a PRE-BUILT sets Dataset
    ``(id, nsh, sh: list<uint64>)`` — the :func:`shingle_sets` contract.
    The sets-level entry point lets non-text token universes (video
    frame hashes, CDC chunk hashes, any integer feature space) reuse the
    full AllPairs machinery — hot-last ordering, singleton-bucket
    semi-join, tiled verify, broadcast/distributed auto-switch —
    without faking a text column. Same output contract as
    :func:`set_similarity_self_join`."""
    from raydedup.util import join_partitions

    sets = sets.materialize()  # consumed by hot-count AND explode
    if id_type is None:
        id_type = pa.string()
        sch = sets.schema()
        if sch is not None and id_col in sch.names:
            id_type = dict(zip(sch.names, sch.types))[id_col]
    id_field = pa.field(id_col, id_type)
    pair_schema = pa.schema([
        pa.field("a_id", id_field.type), pa.field("b_id", id_field.type),
        pa.field("common", pa.int64()), pa.field("na", pa.int64()),
        pa.field("nb", pa.int64()), pa.field("jaccard", pa.float64()),
    ])
    if sets.count() == 0:
        return ray.data.from_arrow(pair_schema.empty_table())

    hot_sorted = (hot_shingle_hashes(sets, hot_k) if hot_k > 0
                  else np.empty(0, dtype=np.uint64))
    hot_ref = ray.put(hot_sorted)

    explode_schema = pa.schema([
        pa.field("bucket", pa.int64()), id_field,
        pa.field("nsh", pa.int64()),
    ])

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return explode_schema.empty_table()
        ck = hot_ref.binary()
        hot = _HOT_CACHE.get(ck)
        if hot is None:
            hot = ray.get(hot_ref)
            _HOT_CACHE.clear()
            _HOT_CACHE[ck] = hot
        shc = batch["sh"].combine_chunks()
        flat = shc.values.to_numpy(zero_copy_only=False)
        lens = batch["nsh"].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        docidx = np.repeat(np.arange(n, dtype=np.int64), lens)
        is_hot = (np.zeros(flat.size, dtype=bool) if hot.size == 0
                  else (hot[np.clip(np.searchsorted(hot, flat), 0,
                                    hot.size - 1)] == flat))
        # hot-last within each doc: (doc, is_hot, hash) ascending
        order = np.lexsort((flat, is_hot, docidx))
        f2 = flat[order]
        pos = np.arange(flat.size, dtype=np.int64) - np.repeat(starts, lens)
        p = _prefix_len(lens, threshold)
        sel = pos < np.repeat(p, lens)
        d_sel = docidx[sel]
        take = pa.array(d_sel)
        # shingle payloads do NOT ride the bucket join: candidate
        # generation needs only (bucket, id, nsh); the sets attach to
        # the DISTINCT pairs later — verification happens once per
        # pair, not once per shared prefix bucket (at low thresholds a
        # pair can share hundreds of buckets; re-intersecting in each
        # was the measured 10x+ drag on long-document corpora)
        return pa.table({
            "bucket": pa.array(f2[sel].view(np.int64), type=pa.int64()),
            id_col: pc.take(batch[id_col].combine_chunks(), take),
            "nsh": pa.array(lens[d_sel], type=pa.int64()),
        })

    exploded = sets.map_batches(explode, batch_format="pyarrow").materialize()
    n_exploded = exploded.count()
    if n_exploded == 0:
        return ray.data.from_arrow(pair_schema.empty_table())

    cand_schema = pa.schema([pa.field("a_id", id_field.type),
                             pa.field("b_id", id_field.type)])

    # Candidate generation is ONE partition sweep (the ordered.py
    # idiom): buckets hash-partition once, one map_groups call per
    # PARTITION lexsorts its rows bucket-major and emits every
    # length-filtered in-bucket pair. This replaces the former
    # three-shuffle chain (repeated-bucket counting groupby →
    # singleton-drop semi-join → per-bucket groupby) with a single
    # all-to-all over the exploded table — at 100 TB the exploded
    # prefix table is the largest intermediate of this operator, so
    # exchange volume drops ~3x — while singleton buckets now cost one
    # vectorized run-length row instead of a Python call.
    import ray as _ray

    from raydedup.stages.asof import _part_array

    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    n_sweep = num_partitions or max(
        2 * ncpu, n_exploded // 500_000 + 1)  # no ceiling: ~500k rows/part

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column("__part",
                               _part_array(b["bucket"], n_sweep))

    def sweep_pairs(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2 or "bucket" not in group.column_names:
            return cand_schema.empty_table()
        bkt = group["bucket"].to_numpy(zero_copy_only=False)
        nsh = group["nsh"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nsh, bkt))
        b_s, n_s = bkt[order], nsh[order]
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        ends = np.r_[starts[1:], m]
        ai_all, bi_all = [], []
        for s, e in zip(starts, ends):
            mm = e - s
            if mm < 2:
                continue
            pi, pj = np.triu_indices(mm, k=1)
            # length filter: jac >= t needs min(na,nb) >= t * max(na,nb)
            lo = np.minimum(n_s[s + pi], n_s[s + pj])
            hi = np.maximum(n_s[s + pi], n_s[s + pj])
            ok = lo >= threshold * hi - 1e-9
            if ok.any():
                ai_all.append(order[s + pi[ok]])
                bi_all.append(order[s + pj[ok]])
        if not ai_all:
            return cand_schema.empty_table()
        ai = np.concatenate(ai_all)
        bi = np.concatenate(bi_all)
        ids = group[id_col].combine_chunks()
        a = pc.take(ids, pa.array(ai))
        b = pc.take(ids, pa.array(bi))
        swap = pc.greater(a, b)
        return pa.table({"a_id": pc.if_else(swap, b, a),
                         "b_id": pc.if_else(swap, a, b)})

    raw_pairs = (exploded.map_batches(add_part, batch_format="pyarrow")
                 .groupby("__part")
                 .map_groups(sweep_pairs, batch_format="pyarrow"))
    # DISTINCT candidate pairs (native counting groupby) — each pair is
    # verified exactly once below regardless of shared-bucket count
    pairs = raw_pairs.groupby(["a_id", "b_id"]).count().drop_columns(
        ["count()"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(pair_schema.empty_table())

    raw_schema_b = pa.schema([
        pa.field("a_id", id_field.type), pa.field("b_id", id_field.type),
        pa.field("common", pa.int64()), pa.field("na", pa.int64()),
        pa.field("nb", pa.int64()),
    ])

    if sets.count() <= verify_broadcast_max_rows:
        # small-corpus verify path (the exact.py auto-switch idiom):
        # the packed set table fits comfortably in worker heaps, so
        # broadcast it once and verify pairs in a stateless
        # map_batches — no pair-exploded join, no partition groupby
        # (measured ~2x on the sf0.1 documents bench, where the two
        # extra barrier stages dominated the sparse pair volume)
        chunks = [pa.table(b) for b in
                  sets.map_batches(lambda t: pa.table(
                      {"jkey": t[id_col],
                       "shbin": _pack_u64_lists(t["sh"].combine_chunks())}),
                      batch_format="pyarrow")
                  .iter_batches(batch_size=1 << 20,
                                batch_format="pyarrow")]
        alltbl = pa.concat_tables(chunks).combine_chunks()
        bflat, boffs = _unpack_u64_binary(alltbl["shbin"])
        bref = ray.put((alltbl["jkey"].combine_chunks(), bflat, boffs))

        def verify_bcast(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return raw_schema_b.empty_table()
            ids_arr, flat, offs = ray.get(bref)
            ia = pc.index_in(b["a_id"], value_set=ids_arr).to_numpy(
                zero_copy_only=False).astype(np.int64)
            ib = pc.index_in(b["b_id"], value_set=ids_arr).to_numpy(
                zero_copy_only=False).astype(np.int64)
            la = (offs[ia + 1] - offs[ia]).astype(np.int64)
            lb = (offs[ib + 1] - offs[ib]).astype(np.int64)

            def fill(row: np.ndarray, i: int) -> None:
                k = la[i]
                row[:k] = flat[offs[ia[i]]: offs[ia[i] + 1]]
                row[k: k + lb[i]] = flat[offs[ib[i]]: offs[ib[i] + 1]]

            inter = _tiled_intersections(la, lb, fill)
            union = la + lb - inter
            jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
            keep = np.flatnonzero(jac >= threshold)
            if keep.size == 0:
                return raw_schema_b.empty_table()
            sel = pa.array(keep)
            return pa.table({
                "a_id": b["a_id"].take(sel), "b_id": b["b_id"].take(sel),
                "common": pa.array(inter[keep], type=pa.int64()),
                "na": pa.array(la[keep], type=pa.int64()),
                "nb": pa.array(lb[keep], type=pa.int64()),
            })

        verified = pairs.map_batches(verify_bcast, batch_format="pyarrow")
        return _finish_pairs(verified, pair_schema)

    jp = join_partitions(2 * n_pairs)
    n_vparts = max(1, n_pairs // 4096 + 1)  # no ceiling: scale with pairs

    def explode_pairs(b: pa.Table) -> pa.Table:
        a_s = pc.cast(b["a_id"], pa.string())
        b_s = pc.cast(b["b_id"], pa.string())
        pid = pc.binary_join_element_wise(a_s, b_s, "\x1f")
        pidc = pa.concat_arrays([pid.combine_chunks()] * 2)
        from raydedup.stages.asof import _part_array

        return pa.table({
            "jkey": pa.concat_arrays([b["a_id"].combine_chunks(),
                                      b["b_id"].combine_chunks()]),
            "pid": pidc,
            "side": pa.array([0] * b.num_rows + [1] * b.num_rows,
                             pa.int32()),
            "vpart": _part_array(pa.chunked_array([pidc]), n_vparts),
        })

    exp = pairs.map_batches(explode_pairs, batch_format="pyarrow")

    def pack_sets(b: pa.Table) -> pa.Table:
        return pa.table({"jkey": b[id_col],
                         "shbin": _pack_u64_lists(
                             b["sh"].combine_chunks())})

    packed = sets.map_batches(pack_sets, batch_format="pyarrow")
    joined = exp.join(packed, join_type="inner", num_partitions=jp,
                      on=("jkey",))

    raw_schema = pa.schema([
        pa.field("a_id", id_field.type), pa.field("b_id", id_field.type),
        pa.field("common", pa.int64()), pa.field("na", pa.int64()),
        pa.field("nb", pa.int64()),
    ])

    def verify_part(group: pa.Table) -> pa.Table:
        # one Python call per hash partition of pairs (not per pair):
        # sort rows by (pid, side), pair up adjacent same-pid rows, and
        # run the shared tiled intersection kernel over the whole
        # partition's pairs at once
        if group.num_rows < 2 or "pid" not in group.column_names:
            return raw_schema.empty_table()
        pids = np.asarray(group["pid"].to_pylist())
        sides = group["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sides, pids))
        sp = pids[order]
        both = np.flatnonzero(sp[:-1] == sp[1:])
        if both.size == 0:
            return raw_schema.empty_table()
        ia = order[both]        # side 0 row of each complete pair
        ib = order[both + 1]    # side 1 row
        flat, offs = _unpack_u64_binary(group["shbin"])
        la = (offs[ia + 1] - offs[ia]).astype(np.int64)
        lb = (offs[ib + 1] - offs[ib]).astype(np.int64)

        def fill(row: np.ndarray, i: int) -> None:
            k = la[i]
            row[:k] = flat[offs[ia[i]]: offs[ia[i] + 1]]
            row[k: k + lb[i]] = flat[offs[ib[i]]: offs[ib[i] + 1]]

        inter = _tiled_intersections(la, lb, fill)
        union = la + lb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = np.flatnonzero(jac >= threshold)
        if keep.size == 0:
            return raw_schema.empty_table()
        jkeys = group["jkey"].combine_chunks()
        return pa.table({
            "a_id": pc.take(jkeys, pa.array(ia[keep])),
            "b_id": pc.take(jkeys, pa.array(ib[keep])),
            "common": pa.array(inter[keep], type=pa.int64()),
            "na": pa.array(la[keep], type=pa.int64()),
            "nb": pa.array(lb[keep], type=pa.int64()),
        })

    verified = joined.groupby("vpart").map_groups(
        verify_part, batch_format="pyarrow")
    return _finish_pairs(verified, pair_schema)


def similar_docs_topk(ds, query_ids: list, k: int = 5,
                      cfg: DedupConfig = DEFAULT_CONFIG,
                      id_col: str = "doc_id", text_col: str = "text"):
    """Query-by-document similarity search: for each query row, the
    top-``k`` most similar OTHER rows by exact token-shingle-set Jaccard
    (the set-based counterpart of the embedding ANN family — same
    shingle contract as the near-dup oracles). → Dataset(query_id,
    doc_id, rank, jaccard); only rows with jaccard > 0 are ranked, so a
    query may return fewer than k rows.

    Scale shape: the query side is genuinely small (an explicit id
    list) — its shingle sets broadcast once via ``ray.put``; the corpus
    streams ONCE through a vectorized scoring pass (one searchsorted
    membership probe + reduceat per query per batch, no per-row
    Python), each batch emits at most ``k`` candidates per query (the
    partial-top-k combiner), and the final reduce ranks
    blocks x queries x k candidate rows under a query-keyed groupby —
    nothing corpus-sized shuffles or lands on the driver.
    """
    import ray

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    sets = shingle_sets(ds, cfg, id_col=id_col, text_col=text_col)

    def only_queries(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b[id_col],
                                 value_set=pa.array(query_ids)))

    qrows = sets.map_batches(only_queries,
                             batch_format="pyarrow").take_all()
    qdata = [(r[id_col], np.asarray(sorted(r["sh"]), dtype=np.uint64),
              int(r["nsh"])) for r in qrows]
    ref = ray.put(qdata)
    id_type = ds.schema().types[ds.schema().names.index(id_col)]

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], id_type),
                          id_col: pa.array([], id_type),
                          "jaccard": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        queries = ray.get(ref)
        if not queries:
            return empty
        sh = batch["sh"].combine_chunks()
        flat = sh.values.to_numpy(zero_copy_only=False)
        offs = sh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        nsh = batch["nsh"].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_q, out_d, out_j = [], [], []
        for qid, qs, qn in queries:
            if qs.size == 0:
                continue
            pos = np.searchsorted(qs, flat)
            np.minimum(pos, qs.size - 1, out=pos)
            hit = (qs[pos] == flat).astype(np.int64)
            common = (np.add.reduceat(hit, offs[:-1])
                      if flat.size else np.zeros(len(nsh), np.int64))
            j = common / (nsh + qn - common)
            j[ids == qid] = 0.0
            cand = np.flatnonzero(j > 0)
            if cand.size == 0:
                continue
            top = cand[np.lexsort((ids[cand], -j[cand]))[:k]]
            out_q.append(np.full(top.size, qid))
            out_d.append(ids[top])
            out_j.append(j[top])
        if not out_q:
            return empty
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), id_type),
            id_col: pa.array(np.concatenate(out_d), id_type),
            "jaccard": pa.array(np.concatenate(out_j), pa.float64()),
        })

    cands = sets.map_batches(score, batch_format="pyarrow")

    def final_topk(g: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], id_type),
                          id_col: pa.array([], id_type),
                          "rank": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        if g.num_rows == 0 or "jaccard" not in g.column_names:
            return empty
        j = g["jaccard"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        top = np.lexsort((ids, -j))[:k]
        return pa.table({
            "query_id": g["query_id"].take(pa.array(top)),
            id_col: g[id_col].take(pa.array(top)),
            "rank": pa.array(np.arange(1, top.size + 1, dtype=np.int64)),
            "jaccard": g["jaccard"].take(pa.array(top)),
        })

    return cands.groupby("query_id").map_groups(final_topk,
                                                batch_format="pyarrow")


def temporal_novelty(ds, cfg: DedupConfig = DEFAULT_CONFIG,
                     id_col: str = "doc_id", text_col: str = "text",
                     num_partitions: int | None = None):
    """First-introduction novelty per row: of a doc's DISTINCT w-word
    shingles, how many first appear in THIS doc under ascending id
    (arrival) order — the crawl/snapshot growth audit ("this re-crawl
    introduced 3% new content"), the temporal complement of
    ``decontam.ngram_novelty``'s symmetric redundancy. → Dataset(id,
    n_grams, n_first_seen, novelty_frac); zero-shingle docs are dropped
    (same contract as ``shingle_sets``).

    Scale shape: the corpus reduces to skinny (shingle_hash, id) rows;
    one gram-keyed ``Min`` groupby finds each gram's first owner (the
    irreducible exchange — hashes only, never text); per-doc
    first-introduction counts reduce from the one-row-per-distinct-gram
    owner table through a counting groupby; the two doc-level tables
    meet in ONE id-keyed hash join. novelty_frac divides the same two
    int64s the SQL oracle divides.
    """
    import ray
    from ray.data.aggregate import Min, Sum

    from raydedup.util import join_partitions

    sets = shingle_sets(ds, cfg, id_col=id_col,
                        text_col=text_col).materialize()
    id_type = ds.schema().types[ds.schema().names.index(id_col)]

    def sizes(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b[id_col], "n_grams": b["nsh"]})

    sz = sets.map_batches(sizes, batch_format="pyarrow")

    def explode(b: pa.Table) -> pa.Table:
        sh = b["sh"].combine_chunks()
        lens = np.diff(sh.offsets.to_numpy(zero_copy_only=False)
                       .astype(np.int64))
        ids = b[id_col].take(pa.array(
            np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)))
        return pa.table({"h": sh.values, id_col: ids})

    firsts = (sets.map_batches(explode, batch_format="pyarrow")
              .groupby("h").aggregate(Min(id_col, alias_name="fid")))

    def count_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "fid" not in b.column_names:
            return pa.table({id_col: pa.array([], id_type),
                             "n_first_seen": pa.array([], pa.int64())})
        t = pa.table({id_col: b["fid"],
                      "n_first_seen": pa.array(
                          np.ones(b.num_rows, dtype=np.int64))})
        agg = t.group_by([id_col]).aggregate([("n_first_seen", "sum")])
        return pa.table({id_col: agg[id_col],
                         "n_first_seen": agg["n_first_seen_sum"]})

    nf = (firsts.map_batches(count_partial, batch_format="pyarrow")
          .groupby(id_col).aggregate(Sum("n_first_seen",
                                         alias_name="n_first_seen")))

    n_docs = sz.count()
    jp = num_partitions or join_partitions(n_docs)
    joined = sz.join(nf, join_type="left_outer", num_partitions=jp,
                     on=(id_col,))

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], id_type),
                             "n_grams": pa.array([], pa.int64()),
                             "n_first_seen": pa.array([], pa.int64()),
                             "novelty_frac": pa.array([], pa.float64())})
        nfs = pc.fill_null(pc.cast(b["n_first_seen"], pa.int64()), 0)
        ng = pc.cast(b["n_grams"], pa.int64())
        frac = pc.divide(pc.cast(nfs, pa.float64()),
                         pc.cast(ng, pa.float64()))
        return pa.table({id_col: b[id_col], "n_grams": ng,
                         "n_first_seen": nfs, "novelty_frac": frac})

    return joined.map_batches(finish, batch_format="pyarrow")


def set_containment_self_join(ds, threshold: float,
                              cfg: DedupConfig = DEFAULT_CONFIG,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              min_inner: int = 1,
                              hot_k: int = 1024,
                              num_partitions: int | None = None,
                              verify_broadcast_max_rows: int = 200_000,
                              sets_ds=None):
    """Exact ASYMMETRIC set-containment self-join: all ORDERED pairs
    (inner, outer), inner != outer, with Broder containment

        c(inner → outer) = |inner ∩ outer| / |inner| >= threshold

    and |inner| >= ``min_inner`` shingles (tiny sets reach containment
    1.0 from a single shared shingle; the floor is part of the contract
    and mirrored in the SQL oracle).

    This is the SET-level quote / subset-reuse detector next to
    ``suffix_span.containment_pairs`` (verbatim substring): robust to
    reordering and interleaving, which substring containment is not,
    and with no constraint on the outer document's size — exactly the
    regime where a Jaccard join goes blind (a small doc swallowed by a
    huge one has near-zero Jaccard at any threshold).

    Prefix-filter soundness (same theorem family as the Jaccard join,
    asymmetric form): c >= t means inner misses at most
    ``(1-t)*|inner|`` of its own elements, so ANY
    ``floor((1-t)*|inner|) + 1`` of them — in particular the hot-last
    prefix ``_prefix_len`` computes — must share one with outer. The
    INNER side therefore explodes only its prefix; the OUTER side must
    index its FULL set (no length bound exists on the outer). Payload
    stays (bucket, id, nsh, flag) — shingle lists attach to DISTINCT
    ordered pairs once, exactly like the Jaccard join.

    Scale shape: the index-side explode is one row per shingle
    INSTANCE of the corpus — the same volume `temporal_novelty` already
    shuffles; hot-last ordering keeps corpus-hot shingles out of
    prefixes so the classic hot-bucket cartesian cannot form on the
    probe side. Candidate volume per bucket is (prefix members ×
    members), linear in bucket size per probe.
    """
    from raydedup.util import join_partitions

    # sets_ds overrides the element universe: any (id, nsh, sh) table
    # with per-id DISTINCT uint64 elements works — e.g. the expanded
    # (token, occurrence) elements of wjaccard.bag_element_sets, which
    # turn this join into exact WEIGHTED (multiset) containment
    sets = (sets_ds if sets_ds is not None
            else shingle_sets(ds, cfg, id_col=id_col, text_col=text_col))
    sets = sets.materialize()
    id_type = pa.string()
    for sch in (ds.schema(), sets.schema()):
        if sch is not None and id_col in sch.names:
            id_type = dict(zip(sch.names, sch.types))[id_col]
            break
    id_field = pa.field(id_col, id_type)
    pair_schema = pa.schema([
        pa.field("inner_id", id_field.type),
        pa.field("outer_id", id_field.type),
        pa.field("common", pa.int64()), pa.field("n_inner", pa.int64()),
        pa.field("n_outer", pa.int64()),
        pa.field("containment", pa.float64()),
    ])
    if sets.count() == 0:
        return ray.data.from_arrow(pair_schema.empty_table())

    hot_sorted = (hot_shingle_hashes(sets, hot_k) if hot_k > 0
                  else np.empty(0, dtype=np.uint64))
    hot_ref = ray.put(hot_sorted)

    explode_schema = pa.schema([
        pa.field("bucket", pa.int64()), id_field,
        pa.field("nsh", pa.int64()), pa.field("pfx", pa.bool_()),
    ])

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return explode_schema.empty_table()
        ck = hot_ref.binary()
        hot = _HOT_CACHE.get(ck)
        if hot is None:
            hot = ray.get(hot_ref)
            _HOT_CACHE.clear()
            _HOT_CACHE[ck] = hot
        shc = batch["sh"].combine_chunks()
        flat = shc.values.to_numpy(zero_copy_only=False)
        lens = batch["nsh"].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        docidx = np.repeat(np.arange(n, dtype=np.int64), lens)
        is_hot = (np.zeros(flat.size, dtype=bool) if hot.size == 0
                  else (hot[np.clip(np.searchsorted(hot, flat), 0,
                                    hot.size - 1)] == flat))
        order = np.lexsort((flat, is_hot, docidx))
        f2 = flat[order]
        pos = np.arange(flat.size, dtype=np.int64) - np.repeat(starts, lens)
        p = _prefix_len(lens, threshold)
        in_prefix = pos < np.repeat(p, lens)
        take = pa.array(docidx)
        return pa.table({
            "bucket": pa.array(f2.view(np.int64), type=pa.int64()),
            id_col: pc.take(batch[id_col].combine_chunks(), take),
            "nsh": pa.array(lens[docidx], type=pa.int64()),
            "pfx": pa.array(in_prefix),
        })

    exploded = sets.map_batches(explode, batch_format="pyarrow").materialize()
    n_exploded = exploded.count()
    if n_exploded == 0:
        return ray.data.from_arrow(pair_schema.empty_table())

    cand_schema = pa.schema([pa.field("inner_id", id_field.type),
                             pa.field("outer_id", id_field.type)])

    # ONE partition sweep replaces the former three-shuffle candidate
    # chain — see set_similarity_join_sets for the rationale; the
    # containment variant keeps the asymmetric (inner-prefix × every
    # member) rule per bucket run.
    import ray as _ray

    from raydedup.stages.asof import _part_array

    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    n_sweep = num_partitions or max(
        2 * ncpu, n_exploded // 500_000 + 1)  # no ceiling: ~500k rows/part

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column("__part",
                               _part_array(b["bucket"], n_sweep))

    def sweep_pairs(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2 or "bucket" not in group.column_names:
            return cand_schema.empty_table()
        bkt = group["bucket"].to_numpy(zero_copy_only=False)
        nsh = group["nsh"].to_numpy(zero_copy_only=False)
        pfx = group["pfx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nsh, bkt))
        b_s, n_s, p_s = bkt[order], nsh[order], pfx[order]
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        ends = np.r_[starts[1:], m]
        pi_all, pj_all = [], []
        for s, e in zip(starts, ends):
            mm = e - s
            if mm < 2:
                continue
            inner = np.flatnonzero(p_s[s:e] & (n_s[s:e] >= min_inner))
            if inner.size == 0:
                continue
            # ordered (inner, outer) candidates: every prefix member of
            # the bucket against every member; self-pairs drop below
            pi = np.repeat(inner, mm)
            pj = np.tile(np.arange(mm, dtype=np.int64), inner.size)
            keep = pi != pj
            # containment >= t needs |outer| >= common >= t*|inner|
            keep &= n_s[s + pj] >= threshold * n_s[s + pi] - 1e-9
            if keep.any():
                pi_all.append(order[s + pi[keep]])
                pj_all.append(order[s + pj[keep]])
        if not pi_all:
            return cand_schema.empty_table()
        ids = group[id_col].combine_chunks()
        return pa.table({
            "inner_id": pc.take(ids, pa.array(np.concatenate(pi_all))),
            "outer_id": pc.take(ids, pa.array(np.concatenate(pj_all))),
        })

    raw_pairs = (exploded.map_batches(add_part, batch_format="pyarrow")
                 .groupby("__part")
                 .map_groups(sweep_pairs, batch_format="pyarrow"))
    pairs = raw_pairs.groupby(["inner_id", "outer_id"]).count().drop_columns(
        ["count()"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(pair_schema.empty_table())

    def _with_containment(tbl_cols):
        c = tbl_cols["common"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        na = tbl_cols["n_inner"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        return pa.array(c / na, type=pa.float64())

    if sets.count() <= verify_broadcast_max_rows:
        chunks = [pa.table(b) for b in
                  sets.map_batches(lambda t: pa.table(
                      {"jkey": t[id_col],
                       "shbin": _pack_u64_lists(t["sh"].combine_chunks())}),
                      batch_format="pyarrow")
                  .iter_batches(batch_size=1 << 20,
                                batch_format="pyarrow")]
        alltbl = pa.concat_tables(chunks).combine_chunks()
        bflat, boffs = _unpack_u64_binary(alltbl["shbin"])
        bref = ray.put((alltbl["jkey"].combine_chunks(), bflat, boffs))

        def verify_bcast(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pair_schema.empty_table()
            ids_arr, flat, offs = ray.get(bref)
            ia = pc.index_in(b["inner_id"], value_set=ids_arr).to_numpy(
                zero_copy_only=False).astype(np.int64)
            ib = pc.index_in(b["outer_id"], value_set=ids_arr).to_numpy(
                zero_copy_only=False).astype(np.int64)
            la = (offs[ia + 1] - offs[ia]).astype(np.int64)
            lb = (offs[ib + 1] - offs[ib]).astype(np.int64)

            def fill(row: np.ndarray, i: int) -> None:
                k = la[i]
                row[:k] = flat[offs[ia[i]]: offs[ia[i] + 1]]
                row[k: k + lb[i]] = flat[offs[ib[i]]: offs[ib[i] + 1]]

            inter = _tiled_intersections(la, lb, fill)
            cont = np.where(la > 0, inter / np.maximum(la, 1), 0.0)
            keep = np.flatnonzero(cont >= threshold)
            if keep.size == 0:
                return pair_schema.empty_table()
            sel = pa.array(keep)
            out = pa.table({
                "inner_id": b["inner_id"].take(sel),
                "outer_id": b["outer_id"].take(sel),
                "common": pa.array(inter[keep], type=pa.int64()),
                "n_inner": pa.array(la[keep], type=pa.int64()),
                "n_outer": pa.array(lb[keep], type=pa.int64()),
            })
            return out.append_column("containment", _with_containment(out))

        out = pairs.map_batches(verify_bcast,
                                batch_format="pyarrow").materialize()
        if out.count() == 0:
            return ray.data.from_arrow(pair_schema.empty_table())
        return out

    jp = join_partitions(2 * n_pairs)
    n_vparts = max(1, n_pairs // 4096 + 1)  # no ceiling: scale with pairs

    def explode_pairs(b: pa.Table) -> pa.Table:
        a_s = pc.cast(b["inner_id"], pa.string())
        b_s = pc.cast(b["outer_id"], pa.string())
        pid = pc.binary_join_element_wise(a_s, b_s, "\x1f")
        pidc = pa.concat_arrays([pid.combine_chunks()] * 2)
        from raydedup.stages.asof import _part_array

        return pa.table({
            "jkey": pa.concat_arrays([b["inner_id"].combine_chunks(),
                                      b["outer_id"].combine_chunks()]),
            "pid": pidc,
            "side": pa.array([0] * b.num_rows + [1] * b.num_rows,
                             pa.int32()),
            "vpart": _part_array(pa.chunked_array([pidc]), n_vparts),
        })

    exp = pairs.map_batches(explode_pairs, batch_format="pyarrow")

    def pack_sets(b: pa.Table) -> pa.Table:
        return pa.table({"jkey": b[id_col],
                         "shbin": _pack_u64_lists(
                             b["sh"].combine_chunks())})

    packed = sets.map_batches(pack_sets, batch_format="pyarrow")
    joined = exp.join(packed, join_type="inner", num_partitions=jp,
                      on=("jkey",))

    def verify_part(group: pa.Table) -> pa.Table:
        if group.num_rows < 2 or "pid" not in group.column_names:
            return pair_schema.empty_table()
        pids = np.asarray(group["pid"].to_pylist())
        sides = group["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sides, pids))
        sp = pids[order]
        both = np.flatnonzero(sp[:-1] == sp[1:])
        if both.size == 0:
            return pair_schema.empty_table()
        ia = order[both]        # side 0 = inner
        ib = order[both + 1]    # side 1 = outer
        flat, offs = _unpack_u64_binary(group["shbin"])
        la = (offs[ia + 1] - offs[ia]).astype(np.int64)
        lb = (offs[ib + 1] - offs[ib]).astype(np.int64)

        def fill(row: np.ndarray, i: int) -> None:
            k = la[i]
            row[:k] = flat[offs[ia[i]]: offs[ia[i] + 1]]
            row[k: k + lb[i]] = flat[offs[ib[i]]: offs[ib[i] + 1]]

        inter = _tiled_intersections(la, lb, fill)
        cont = np.where(la > 0, inter / np.maximum(la, 1), 0.0)
        keep = np.flatnonzero(cont >= threshold)
        if keep.size == 0:
            return pair_schema.empty_table()
        jkeys = group["jkey"].combine_chunks()
        out = pa.table({
            "inner_id": pc.take(jkeys, pa.array(ia[keep])),
            "outer_id": pc.take(jkeys, pa.array(ib[keep])),
            "common": pa.array(inter[keep], type=pa.int64()),
            "n_inner": pa.array(la[keep], type=pa.int64()),
            "n_outer": pa.array(lb[keep], type=pa.int64()),
        })
        return out.append_column("containment", _with_containment(out))

    out = joined.groupby("vpart").map_groups(
        verify_part, batch_format="pyarrow").materialize()
    if out.count() == 0:
        return ray.data.from_arrow(pair_schema.empty_table())
    return out


def _rs_verify_partitioned(pairs, sets_a, sets_b, threshold: float,
                           id_col: str, id_field: pa.Field,
                           pair_schema: pa.Schema, n_pairs: int,
                           num_partitions: int | None):
    """Distributed R-S verification (the self-join's pair-exploded-join
    shape): each candidate pair explodes to two ``(jkey, pid, side)``
    rows with SIDE-TAGGED keys (``'a\\x1f<id>'`` / ``'b\\x1f<id>'`` —
    a_ids and b_ids may coincide numerically across corpora), both
    sides' packed sets union under the same tagged keys, one hash join
    co-partitions each pair with its two sets, and a per-vpart sweep
    runs the shared tiled intersection kernel over the whole
    partition's pairs — the 100-TB path where neither side's packed
    sets fit a worker heap."""
    from raydedup.stages.asof import _part_array
    from raydedup.util import join_partitions

    jp = num_partitions or join_partitions(2 * n_pairs)
    n_vparts = max(1, n_pairs // 4096 + 1)  # no ceiling: scale with pairs

    def _arr(x):
        return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

    def explode_pairs(b: pa.Table) -> pa.Table:
        a_s = _arr(pc.cast(b["a_id"], pa.string()))
        b_s = _arr(pc.cast(b["b_id"], pa.string()))
        pid = _arr(pc.binary_join_element_wise(a_s, b_s, "\x1f"))
        pidc = pa.concat_arrays([pid] * 2)
        ja = _arr(pc.binary_join_element_wise(
            pa.array(["a"] * b.num_rows), a_s, "\x1f"))
        jb = _arr(pc.binary_join_element_wise(
            pa.array(["b"] * b.num_rows), b_s, "\x1f"))
        return pa.table({
            "jkey": pa.concat_arrays([ja, jb]),
            "pid": pidc,
            "side": pa.array([0] * b.num_rows + [1] * b.num_rows,
                             pa.int32()),
            "vpart": _part_array(pa.chunked_array([pidc]), n_vparts),
        })

    exp = pairs.map_batches(explode_pairs, batch_format="pyarrow")

    def pack_tagged(tag: str):
        def fn(b: pa.Table) -> pa.Table:
            ids = pc.cast(b[id_col], pa.string()).combine_chunks()
            return pa.table({
                "jkey": pc.binary_join_element_wise(
                    pa.array([tag] * b.num_rows), ids, "\x1f"),
                "shbin": _pack_u64_lists(b["sh"].combine_chunks()),
            })
        return fn

    packed = (sets_a.map_batches(pack_tagged("a"), batch_format="pyarrow")
              .union(sets_b.map_batches(pack_tagged("b"),
                                        batch_format="pyarrow")))
    joined = exp.join(packed, join_type="inner", num_partitions=jp,
                      on=("jkey",))

    raw_schema = pa.schema([
        pa.field("a_id", id_field.type), pa.field("b_id", id_field.type),
        pa.field("common", pa.int64()), pa.field("na", pa.int64()),
        pa.field("nb", pa.int64()),
    ])

    def verify_part(group: pa.Table) -> pa.Table:
        if group.num_rows < 2 or "pid" not in group.column_names:
            return raw_schema.empty_table()
        pids = np.asarray(group["pid"].to_pylist())
        sides = group["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sides, pids))
        sp = pids[order]
        both = np.flatnonzero(sp[:-1] == sp[1:])
        if both.size == 0:
            return raw_schema.empty_table()
        ia = order[both]        # side 0 (corpus a) row of each pair
        ib = order[both + 1]    # side 1 (corpus b) row
        flat, offs = _unpack_u64_binary(group["shbin"])
        la = (offs[ia + 1] - offs[ia]).astype(np.int64)
        lb = (offs[ib + 1] - offs[ib]).astype(np.int64)

        def fill(row: np.ndarray, i: int) -> None:
            k = la[i]
            row[:k] = flat[offs[ia[i]]: offs[ia[i] + 1]]
            row[k: k + lb[i]] = flat[offs[ib[i]]: offs[ib[i] + 1]]

        inter = _tiled_intersections(la, lb, fill)
        union = la + lb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = np.flatnonzero(jac >= threshold)
        if keep.size == 0:
            return raw_schema.empty_table()
        # strip the 2-char side tag back off the join keys
        jkeys = pc.utf8_slice_codeunits(
            group["jkey"].combine_chunks(), start=2)
        return pa.table({
            "a_id": pc.cast(pc.take(jkeys, pa.array(ia[keep])),
                            id_field.type),
            "b_id": pc.cast(pc.take(jkeys, pa.array(ib[keep])),
                            id_field.type),
            "common": pa.array(inter[keep], type=pa.int64()),
            "na": pa.array(la[keep], type=pa.int64()),
            "nb": pa.array(lb[keep], type=pa.int64()),
        })

    verified = joined.groupby("vpart").map_groups(
        verify_part, batch_format="pyarrow")
    return _finish_pairs(verified, pair_schema)


def set_similarity_join(ds_a, ds_b, threshold: float,
                        cfg: DedupConfig = DEFAULT_CONFIG,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        hot_k: int = 1024,
                        num_partitions: int | None = None,
                        verify_broadcast_max_rows: int = 200_000):
    """Exact TWO-CORPUS (R-S) set-similarity join: all cross pairs
    (a ∈ ds_a, b ∈ ds_b) with shingle-set Jaccard >= ``threshold`` —
    the decontamination / cross-corpus-audit API with recall exactly
    1.0 by construction, where the LSH decontam path
    (stages/decontam.py) is probabilistic. Within-corpus pairs are
    never emitted (that is ``set_similarity_self_join``'s contract).

    Soundness uses the one-sided prefix form (same theorem as the
    containment join): Jaccard >= t implies |a ∩ b| >= t·|a|, so a
    misses at most (1-t)·|a| of its own elements and ANY
    ``_prefix_len`` of them must hit b. The PROBE side (ds_a) explodes
    hot-last prefixes only; the INDEX side (ds_b) explodes its full
    sets — no assumption about ds_b's sizes is needed, so ds_b can be
    the unbounded corpus and ds_a the (smaller) reference/benchmark
    side. Verification is the shared tiled intersection kernel over
    DISTINCT pairs; both verify paths (broadcast / pair-exploded
    partition groupby) are inherited.

    Returns (a_id, b_id, common, na, nb, jaccard); ids keep ds_a /
    ds_b's native ``id_col`` type and MAY coincide across corpora —
    they identify rows within their own side.
    """
    sets_a = shingle_sets(ds_a, cfg, id_col=id_col,
                          text_col=text_col).materialize()
    sets_b = shingle_sets(ds_b, cfg, id_col=id_col,
                          text_col=text_col).materialize()
    id_type = pa.string()
    for sch in (ds_a.schema(), sets_a.schema()):
        if sch is not None and id_col in sch.names:
            id_type = dict(zip(sch.names, sch.types))[id_col]
            break
    id_field = pa.field(id_col, id_type)
    pair_schema = pa.schema([
        pa.field("a_id", id_field.type), pa.field("b_id", id_field.type),
        pa.field("common", pa.int64()), pa.field("na", pa.int64()),
        pa.field("nb", pa.int64()), pa.field("jaccard", pa.float64()),
    ])
    if sets_a.count() == 0 or sets_b.count() == 0:
        return ray.data.from_arrow(pair_schema.empty_table())

    # hot order from the INDEX side (the corpus): its frequencies are
    # the ones that create hot buckets; any total order is correct
    hot_sorted = (hot_shingle_hashes(sets_b, hot_k) if hot_k > 0
                  else np.empty(0, dtype=np.uint64))
    hot_ref = ray.put(hot_sorted)

    explode_schema = pa.schema([
        pa.field("bucket", pa.int64()), id_field,
        pa.field("nsh", pa.int64()), pa.field("probe", pa.bool_()),
    ])

    def make_explode(probe_side: bool):
        def explode(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return explode_schema.empty_table()
            ck = hot_ref.binary()
            hot = _HOT_CACHE.get(ck)
            if hot is None:
                hot = ray.get(hot_ref)
                _HOT_CACHE.clear()
                _HOT_CACHE[ck] = hot
            shc = batch["sh"].combine_chunks()
            flat = shc.values.to_numpy(zero_copy_only=False)
            lens = batch["nsh"].to_numpy(zero_copy_only=False)
            n = batch.num_rows
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            docidx = np.repeat(np.arange(n, dtype=np.int64), lens)
            if probe_side:
                is_hot = (np.zeros(flat.size, dtype=bool) if hot.size == 0
                          else (hot[np.clip(np.searchsorted(hot, flat), 0,
                                            hot.size - 1)] == flat))
                order = np.lexsort((flat, is_hot, docidx))
                f2 = flat[order]
                pos = (np.arange(flat.size, dtype=np.int64)
                       - np.repeat(starts, lens))
                sel = pos < np.repeat(_prefix_len(lens, threshold), lens)
                d_sel = docidx[sel]
                f_sel = f2[sel]
            else:
                d_sel, f_sel = docidx, flat
            return pa.table({
                "bucket": pa.array(f_sel.view(np.int64), type=pa.int64()),
                id_col: pc.take(batch[id_col].combine_chunks(),
                                pa.array(d_sel)),
                "nsh": pa.array(lens[d_sel], type=pa.int64()),
                "probe": pa.array(
                    np.full(d_sel.size, probe_side, dtype=bool)),
            })
        return explode

    exploded = (sets_a.map_batches(make_explode(True),
                                   batch_format="pyarrow")
                .union(sets_b.map_batches(make_explode(False),
                                          batch_format="pyarrow"))
                ).materialize()
    n_exploded = exploded.count()
    if n_exploded == 0:
        return ray.data.from_arrow(pair_schema.empty_table())

    cand_schema = pa.schema([pa.field("a_id", id_field.type),
                             pa.field("b_id", id_field.type)])

    # ONE partition sweep replaces the former three-shuffle candidate
    # chain — see set_similarity_join_sets for the rationale; the R-S
    # variant keeps the probe-side x index-side cross rule per bucket
    # run.
    import ray as _ray

    from raydedup.stages.asof import _part_array

    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    n_sweep = num_partitions or max(
        2 * ncpu, n_exploded // 500_000 + 1)  # no ceiling: ~500k rows/part

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column("__part",
                               _part_array(b["bucket"], n_sweep))

    def sweep_pairs(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2 or "bucket" not in group.column_names:
            return cand_schema.empty_table()
        bkt = group["bucket"].to_numpy(zero_copy_only=False)
        nsh = group["nsh"].to_numpy(zero_copy_only=False)
        probe = group["probe"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nsh, bkt))
        b_s, n_s, p_s = bkt[order], nsh[order], probe[order]
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        ends = np.r_[starts[1:], m]
        pi_all, pj_all = [], []
        for s, e in zip(starts, ends):
            mm = e - s
            if mm < 2:
                continue
            ai = np.flatnonzero(p_s[s:e])
            bi = np.flatnonzero(~p_s[s:e])
            if ai.size == 0 or bi.size == 0:
                continue
            pi = np.repeat(ai, bi.size)
            pj = np.tile(bi, ai.size)
            lo = np.minimum(n_s[s + pi], n_s[s + pj])
            hi = np.maximum(n_s[s + pi], n_s[s + pj])
            keep = lo >= threshold * hi - 1e-9
            if keep.any():
                pi_all.append(order[s + pi[keep]])
                pj_all.append(order[s + pj[keep]])
        if not pi_all:
            return cand_schema.empty_table()
        ids = group[id_col].combine_chunks()
        return pa.table({
            "a_id": pc.take(ids, pa.array(np.concatenate(pi_all))),
            "b_id": pc.take(ids, pa.array(np.concatenate(pj_all))),
        })

    raw_pairs = (exploded.map_batches(add_part, batch_format="pyarrow")
                 .groupby("__part")
                 .map_groups(sweep_pairs, batch_format="pyarrow"))
    pairs = raw_pairs.groupby(["a_id", "b_id"]).count().drop_columns(
        ["count()"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(pair_schema.empty_table())

    if (sets_a.count() + sets_b.count()) > verify_broadcast_max_rows:
        # partitioned verify (the self-join's pair-exploded-join shape,
        # made R-S-safe by SIDE-TAGGED join keys — a_ids and b_ids may
        # coincide numerically across corpora): pairs explode to two
        # (jkey, pid, side) rows with jkey = 'a\\x1f<id>' / 'b\\x1f<id>',
        # both sides' packed sets union under the same tagged keys, one
        # distributed hash join co-partitions sets with their pairs, and
        # the per-vpart sweep verifies every pair with the shared tiled
        # intersection kernel — nothing corpus-sized on the driver.
        return _rs_verify_partitioned(
            pairs, sets_a, sets_b, threshold, id_col, id_field,
            pair_schema, n_pairs, num_partitions)

    # broadcast verify — the measured-faster path while both sides'
    # packed sets fit worker heaps
    def packed_of(sets):
        chunks = [pa.table(b) for b in
                  sets.map_batches(lambda t: pa.table(
                      {"jkey": t[id_col],
                       "shbin": _pack_u64_lists(t["sh"].combine_chunks())}),
                      batch_format="pyarrow")
                  .iter_batches(batch_size=1 << 20,
                                batch_format="pyarrow")]
        alltbl = pa.concat_tables(chunks).combine_chunks()
        flat, offs = _unpack_u64_binary(alltbl["shbin"])
        return alltbl["jkey"].combine_chunks(), flat, offs

    aref = ray.put(packed_of(sets_a))
    bref = ray.put(packed_of(sets_b))

    def verify_bcast(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pair_schema.empty_table()
        ids_a, flat_a, offs_a = ray.get(aref)
        ids_b, flat_b, offs_b = ray.get(bref)
        ia = pc.index_in(b["a_id"], value_set=ids_a).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ib = pc.index_in(b["b_id"], value_set=ids_b).to_numpy(
            zero_copy_only=False).astype(np.int64)
        la = (offs_a[ia + 1] - offs_a[ia]).astype(np.int64)
        lb = (offs_b[ib + 1] - offs_b[ib]).astype(np.int64)

        def fill(row: np.ndarray, i: int) -> None:
            k = la[i]
            row[:k] = flat_a[offs_a[ia[i]]: offs_a[ia[i] + 1]]
            row[k: k + lb[i]] = flat_b[offs_b[ib[i]]: offs_b[ib[i] + 1]]

        inter = _tiled_intersections(la, lb, fill)
        union = la + lb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = np.flatnonzero(jac >= threshold)
        if keep.size == 0:
            return pair_schema.empty_table()
        sel = pa.array(keep)
        out = pa.table({
            "a_id": b["a_id"].take(sel), "b_id": b["b_id"].take(sel),
            "common": pa.array(inter[keep], type=pa.int64()),
            "na": pa.array(la[keep], type=pa.int64()),
            "nb": pa.array(lb[keep], type=pa.int64()),
        })
        return out.append_column(
            "jaccard", pa.array(inter[keep] / union[keep].astype(np.float64),
                                type=pa.float64()))

    out = pairs.map_batches(verify_bcast,
                            batch_format="pyarrow").materialize()
    if out.count() == 0:
        return ray.data.from_arrow(pair_schema.empty_table())
    return out


def idf_weighted_rescore(pairs_ds, rep_sigs_ds, key_col: str = "row_key",
                         sh_col: str = "shingle_hashes"):
    """Rarity-aware RE-SCORING of an already-verified pair set: per pair,

        idf_jaccard = Σ_{sh ∈ A∩B} idf(sh) / Σ_{sh ∈ A∪B} idf(sh),
        idf(sh) = ln(N / df(sh)),

    over the representative corpus (N = rep count, df = rep document
    frequency of the shingle). The unweighted jaccard the verifier
    attached counts every shingle equally; this lens separates pairs
    glued by CORPUS-HOT boilerplate (idf ≈ 0 → low idf_jaccard) from
    pairs sharing DISTINCTIVE content (rare shingles dominate both
    sums) — the over-merge diagnosis complement to cluster cohesion.

    Scale shape: everything is hash-skinny and pair-sparse. df is one
    (hash)-keyed counting groupby over the rep corpus' exploded shingle
    hashes; per-key and per-pair idf sums touch ONLY the paired keys
    (broadcast key set — bounded by 2·pairs — filters the corpus before
    any explode); intersections fall out of a (pid, hash) counting
    groupby (each side's hashes are distinct, so count == 2 ⇔ shared).
    Float contract: idf = ln(N/df) with the division done first, summed
    per key/pair — mirror the same shape in SQL and round the final
    ratio (the cosine-measure float precedent).
    """
    import ray
    import ray.data

    from raydedup.util import join_partitions

    out_schema = pa.schema([
        pa.field("a_key", pa.string()), pa.field("b_key", pa.string()),
        pa.field("idf_jaccard", pa.float64()),
    ])
    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    rep_sigs_ds = rep_sigs_ds.materialize()
    n_reps = rep_sigs_ds.count()

    # df over the rep corpus: hash-only explode + counting groupby.
    # int64 VIEW of the uint64 hash — Ray's hash shuffle pickles
    # unsigned keys into extension objects, which then cannot join
    # against plain columns (same idiom as lsh.py's bucket columns)
    def explode_hashes(b: pa.Table) -> pa.Table:
        shc = b[sh_col].combine_chunks()
        h = shc.values.to_numpy(zero_copy_only=False).view(np.int64)
        return pa.table({"h": pa.array(h, pa.int64())})

    from ray.data.aggregate import Count

    df_ds = (rep_sigs_ds.map_batches(explode_hashes,
                                     batch_format="pyarrow")
             .groupby("h").aggregate(Count(alias_name="df"))).materialize()

    # paired keys only (2·pairs, sparse) — broadcast the key set
    keyset = set()
    for b in pairs_ds.select_columns(["a_key", "b_key"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"):
        keyset.update(b["a_key"].to_pylist())
        keyset.update(b["b_key"].to_pylist())
    keys_ref = ray.put(pa.array(sorted(keyset), pa.string()))

    def paired_rows(b: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        sel = pc.is_valid(pc.index_in(pc.cast(b[key_col], pa.string()),
                                      value_set=ks))
        t = b.filter(sel)
        shc = t[sh_col].combine_chunks()
        lens = pc.list_value_length(shc).to_numpy(zero_copy_only=False)
        keys = pc.cast(t[key_col], pa.string()).combine_chunks()
        h = shc.values.to_numpy(zero_copy_only=False).view(np.int64)
        return pa.table({
            "k": pc.take(keys, pa.array(
                np.repeat(np.arange(len(lens), dtype=np.int64), lens))),
            "h": pa.array(h, pa.int64()),
        })

    kh = rep_sigs_ds.map_batches(paired_rows,
                                 batch_format="pyarrow").materialize()
    jp = join_partitions(max(kh.count(), 1))
    kh_df = kh.join(df_ds, join_type="inner", num_partitions=jp, on=("h",))

    def idf_partial(b: pa.Table) -> pa.Table:
        df = b["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        idf = np.log(float(n_reps) / df)
        return pa.table({"k": b["k"],
                         "w": pa.array(idf, pa.float64())})

    from ray.data.aggregate import Sum

    key_sums = (kh_df.map_batches(idf_partial, batch_format="pyarrow")
                .groupby("k").aggregate(Sum("w", alias_name="sw"))
                ).materialize()

    # per-pair shared-hash idf sums: (pid, hash) counting groupby over
    # both sides' hashes; count == 2 ⇔ shared (per-doc hashes distinct)
    def pair_sides(b: pa.Table) -> pa.Table:
        a_s = pc.cast(b["a_key"], pa.string())
        b_s = pc.cast(b["b_key"], pa.string())
        pid = pc.binary_join_element_wise(a_s, b_s, "\x1f")
        return pa.table({
            "k": pa.concat_arrays([a_s.combine_chunks(),
                                   b_s.combine_chunks()]),
            "pid": pa.concat_arrays([pid.combine_chunks()] * 2),
        })

    sides = pairs_ds.map_batches(pair_sides, batch_format="pyarrow")
    sides_h = sides.join(kh, join_type="inner",
                         num_partitions=jp, on=("k",))
    # union a typed empty block: groupby→filter outputs lose their
    # schema when a partition is empty, and Ray 2.49's join aggregator
    # then builds a zero-column table (the cdc.py / join_partitions
    # idiom)
    shared_schema = pa.schema([pa.field("pid", pa.string()),
                               pa.field("h", pa.int64()),
                               pa.field("c", pa.int64())])
    shared = (sides_h.map_batches(
        lambda b: pa.table({"pid": b["pid"], "h": b["h"]}),
        batch_format="pyarrow")
        .groupby(["pid", "h"]).aggregate(Count(alias_name="c"))
        .filter(expr="c == 2")
        .union(ray.data.from_arrow(shared_schema.empty_table()))
        .materialize())
    def pair_partial(b: pa.Table) -> pa.Table:
        df = b["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"pid": b["pid"],
                         "w": pa.array(np.log(float(n_reps) / df),
                                       pa.float64())})

    if shared.count() == 0:
        # pairs sharing no shingles at all: nothing to join (Ray 2.49
        # rejects an all-empty join side — the cdc.py guard idiom)
        inter_sums = ray.data.from_arrow(pa.table(
            {"pid": pa.array([], pa.string()),
             "iw": pa.array([], pa.float64())}))
    else:
        shared_df = shared.join(df_ds, join_type="inner",
                                num_partitions=jp, on=("h",))
        inter_sums = (shared_df.map_batches(pair_partial,
                                            batch_format="pyarrow")
                      .groupby("pid").aggregate(Sum("w", alias_name="iw"))
                      ).materialize()

    # final assembly on the driver: pairs, per-key sums and per-pair
    # intersections are ALL pair-sparse tables
    ks = {r["k"]: r["sw"] for r in key_sums.iter_rows()}
    iw = {r["pid"]: r["iw"] for r in inter_sums.iter_rows()}
    a_out, b_out, j_out = [], [], []
    for b in pairs_ds.select_columns(["a_key", "b_key"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"):
        for a, bb in zip(b["a_key"].to_pylist(), b["b_key"].to_pylist()):
            pid = f"{a}\x1f{bb}"
            inter = iw.get(pid, 0.0)
            union = ks.get(a, 0.0) + ks.get(bb, 0.0) - inter
            a_out.append(a)
            b_out.append(bb)
            j_out.append(inter / union if union > 0 else 0.0)
    return ray.data.from_arrow(pa.table({
        "a_key": pa.array(a_out, pa.string()),
        "b_key": pa.array(b_out, pa.string()),
        "idf_jaccard": pa.array(j_out, pa.float64()),
    }))
