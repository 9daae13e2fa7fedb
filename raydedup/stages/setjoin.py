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
    """Top-``k`` shingle hashes by exact corpus document frequency, as a
    SORTED uint64 array (the hot-last order's "late" set). Per-batch
    ``np.unique`` partials → one hash-keyed groupby sum → per-block
    top-k combiner → bounded driver merge (≤ k rows per block)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        shc = batch["sh"].combine_chunks()
        flat = shc.values.to_numpy(zero_copy_only=False)
        u, c = np.unique(flat, return_counts=True)
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


def set_similarity_self_join(ds, threshold: float,
                             cfg: DedupConfig = DEFAULT_CONFIG,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             hot_k: int = 1024,
                             num_partitions: int | None = None):
    """All pairs with token-shingle-set Jaccard >= ``threshold``, exactly.

    Returns a Dataset ``(a_id, b_id, common, na, nb, jaccard)`` with
    ``a_id < b_id`` — ``common``/``na``/``nb`` are exact intersection /
    set sizes so the float is auditable downstream.
    """
    from ray.data.aggregate import Max

    from raydedup.util import join_partitions, repeated_keys

    sets = shingle_sets(ds, cfg, id_col=id_col, text_col=text_col)
    sets = sets.materialize()  # consumed by hot-count AND explode
    # ds.filter(lambda)-emptied inputs report schema() None (Ray 2.49);
    # fall back to the materialized sets' schema, then to string ids
    id_type = pa.string()
    for sch in (ds.schema(), sets.schema()):
        if sch is not None and id_col in sch.names:
            id_type = dict(zip(sch.names, sch.types))[id_col]
            break
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
        pa.field("nsh", pa.int64()), pa.field("shbin", pa.binary()),
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
        packed = _pack_u64_lists(shc)
        return pa.table({
            "bucket": pa.array(f2[sel].view(np.int64), type=pa.int64()),
            id_col: pc.take(batch[id_col].combine_chunks(), take),
            "nsh": pa.array(lens[d_sel], type=pa.int64()),
            "shbin": pc.take(packed, take),
        })

    exploded = sets.map_batches(explode, batch_format="pyarrow").materialize()
    n_exploded = exploded.count()
    if n_exploded == 0:
        return ray.data.from_arrow(pair_schema.empty_table())
    hot_buckets = repeated_keys(exploded, "bucket").materialize()
    if hot_buckets.count() == 0:
        return ray.data.from_arrow(pair_schema.empty_table())
    n_parts = num_partitions or join_partitions(n_exploded)
    cands = exploded.join(hot_buckets, join_type="inner",
                          num_partitions=n_parts, on=("bucket",))

    raw_schema = pa.schema([
        pa.field("a_id", id_field.type), pa.field("b_id", id_field.type),
        pa.field("common", pa.int64()), pa.field("na", pa.int64()),
        pa.field("nb", pa.int64()),
    ])

    def verify(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2:
            return raw_schema.empty_table()
        nsh = group["nsh"].to_numpy(zero_copy_only=False)
        pi, pj = np.triu_indices(m, k=1)
        # length filter: jac >= t needs min(na, nb) >= t * max(na, nb)
        lo = np.minimum(nsh[pi], nsh[pj])
        hi = np.maximum(nsh[pi], nsh[pj])
        ok = lo >= threshold * hi - 1e-9
        pi, pj = pi[ok], pj[ok]
        if pi.size == 0:
            return raw_schema.empty_table()
        flat, offs = _unpack_u64_binary(group["shbin"])
        la = (offs[pi + 1] - offs[pi]).astype(np.int64)
        lb = (offs[pj + 1] - offs[pj]).astype(np.int64)

        def fill(row: np.ndarray, i: int) -> None:
            k = la[i]
            row[:k] = flat[offs[pi[i]]: offs[pi[i] + 1]]
            row[k: k + lb[i]] = flat[offs[pj[i]]: offs[pj[i] + 1]]

        inter = _tiled_intersections(la, lb, fill)
        union = la + lb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = np.flatnonzero(jac >= threshold)
        if keep.size == 0:
            return raw_schema.empty_table()
        ids = group[id_col].combine_chunks()
        ai = pc.take(ids, pa.array(pi[keep]))
        bi = pc.take(ids, pa.array(pj[keep]))
        swap = pc.greater(ai, bi)
        return pa.table({
            "a_id": pc.if_else(swap, bi, ai),
            "b_id": pc.if_else(swap, ai, bi),
            "common": pa.array(inter[keep], type=pa.int64()),
            "na": pa.array(np.where(swap.to_numpy(zero_copy_only=False),
                                    lb[keep], la[keep]), type=pa.int64()),
            "nb": pa.array(np.where(swap.to_numpy(zero_copy_only=False),
                                    la[keep], lb[keep]), type=pa.int64()),
        })

    raw = cands.groupby("bucket").map_groups(verify, batch_format="pyarrow")
    # a pair verified in several shared-prefix buckets emits identical
    # rows — collapse, then recompute the float from the exact ints
    deduped = raw.groupby(["a_id", "b_id"]).aggregate(
        Max("common", alias_name="common"),
        Max("na", alias_name="na"),
        Max("nb", alias_name="nb"),
    )

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

    out = deduped.map_batches(finish, batch_format="pyarrow")
    # a fully-empty Dataset loses its schema (Ray 2.49: when the
    # aggregate emits nothing, no block ever flows, map_batches is
    # never called, and union CANNOT restore the schema — the union of
    # a schema-less side and a schema-pinned empty block still reports
    # zero columns). Zero matches is a normal outcome here, so pin it
    # explicitly: materialize (the pair set is output-sized, sparse by
    # construction) and swap in a schema-pinned empty when nothing
    # survived.
    out = out.materialize()
    if out.count() == 0:
        return ray.data.from_arrow(pair_schema.empty_table())
    return out


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
