"""Similarity search over an embedding column (``list<float>``).

- ``knn_brute``: exact cosine top-k per query — the baseline. Queries are
  a SMALL side: collected once, L2-normalized, broadcast via ``ray.put``;
  each batch does one float64 matmul against the broadcast matrix and
  emits only its LOCAL top-k per query, so the final per-query merge
  (groupby + take-k) shuffles k·Q·num_batches rows, not n·Q.
- ``embedding_near_pairs``: all-pairs cosine >= t near-duplicate pairs.
  Three backends behind one front door:
    * ``broadcast`` — full normalized matrix broadcast once, one matmul
      per batch. Fastest when the matrix fits comfortably in a worker.
    * ``blockwise`` — EXACT distributed all-pairs: the table is chunked,
      each chunk normalized into an object-store numpy block, and one Ray
      task per chunk-pair does the matmul. Nothing is collected on the
      driver; results stream back as Arrow block refs. Same float64
      dot products as broadcast ⇒ bit-identical pairs.
    * ``lsh`` — approximate scale path: random-hyperplane bucketing
      (``rp_bucket``) over ``n_tables`` independent plane sets confines
      comparisons to buckets; recall for pairs at cosine >= t is
      1-(1-p^b)^T with p = 1-acos(t)/pi (>=0.99 at t=0.95 with the
      defaults b=8, T=12 — asserted by a planted-pair recall test).
  ``method="auto"`` picks broadcast under ``broadcast_limit`` rows and
  blockwise above it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _to_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _l2norm(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return m / norms[:, None]


def _collect_queries(ds, query_ids, id_col: str, vec_col: str):
    """Pull the query rows (a small side) to the driver: one streaming
    filter scan, rows sorted by id, matrix L2-normalized."""
    wanted = np.unique(np.asarray(list(query_ids), dtype=np.int64))

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        return batch.filter(pa.array(np.isin(ids, wanted)))

    q_rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    order = np.argsort(q_ids)
    q_ids = q_ids[order]
    Q = _l2norm(np.array([q_rows[i][vec_col] for i in order],
                         dtype=np.float64))
    return q_ids, Q


def _rank_topk(k: int):
    """Per-query final merge: global top-k by (cosine desc, id asc) over
    the per-batch partial top-ks, with a 1-based rank column."""

    def final_topk(g: pa.Table) -> pa.Table:
        cos = g["cosine"].to_numpy(zero_copy_only=False)
        nid = g["neighbor_id"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((nid, -cos))[:k]
        out = g.take(pa.array(sel))
        return out.append_column(
            "rank", pa.array(np.arange(1, len(sel) + 1, dtype=np.int64))
        )

    return final_topk


def knn_brute(ds, query_ids: list[int], k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding"):
    """→ Dataset(query_id, neighbor_id, cosine, rank) — exact top-k by
    cosine, ties broken by neighbor_id ascending; self-matches excluded."""
    q_ids, Q = _collect_queries(ds, query_ids, id_col, vec_col)
    q_ref = ray.put((q_ids, Q))

    class PartialTopK:
        def __init__(self, ref, k):
            self.q_ids, self.Q = ray.get(ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = _l2norm(_to_matrix(batch, vec_col))
            ids = batch[id_col].to_numpy().astype(np.int64)
            sims = X @ self.Q.T  # (n, q)
            out_q, out_n, out_c = [], [], []
            for qi in range(len(self.q_ids)):
                col = sims[:, qi]
                mask = ids != self.q_ids[qi]
                cand_ids, cand = ids[mask], col[mask]
                if cand.size == 0:
                    continue
                kk = min(self.k, cand.size)
                # top-k by (cosine desc, id asc)
                sel = np.lexsort((cand_ids, -cand))[:kk]
                out_q.extend([int(self.q_ids[qi])] * kk)
                out_n.extend(cand_ids[sel].tolist())
                out_c.extend(cand[sel].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "neighbor_id": pa.array(out_n, type=pa.int64()),
                    "cosine": pa.array(out_c, type=pa.float64()),
                }
            )

    partial = ds.map_batches(
        PartialTopK,
        fn_constructor_args=(q_ref, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 16),
        num_cpus=1,
    )

    return partial.groupby("query_id").map_groups(_rank_topk(k),
                                                  batch_format="pyarrow")


def embedding_near_pairs(ds, threshold: float = 0.95,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         method: str = "auto",
                         broadcast_limit: int = 200_000):
    """All-pairs cosine >= threshold (a_id < b_id). See module docstring
    for the backend trade-offs; ``auto`` = broadcast below
    ``broadcast_limit`` rows, exact blockwise above."""
    if method == "auto":
        # materialize BEFORE counting so the backend below reuses the
        # executed blocks (a bare count() on a lazy ds ran the upstream
        # pipeline once for the size probe and again in the backend)
        ds = ds.materialize()
        method = "broadcast" if ds.count() <= broadcast_limit else "blockwise"
    if method == "blockwise":
        return embedding_near_pairs_blockwise(
            ds, threshold, id_col=id_col, vec_col=vec_col
        )
    if method == "lsh":
        return embedding_near_pairs_lsh(
            ds, threshold, id_col=id_col, vec_col=vec_col
        )
    all_rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in all_rows], dtype=np.int64)
    M = _l2norm(np.array([r[vec_col] for r in all_rows], dtype=np.float64))
    ref = ray.put((ids, M))

    class Pairs:
        def __init__(self, ref, thr):
            self.ids, self.M = ray.get(ref)
            self.thr = thr

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = _l2norm(_to_matrix(batch, vec_col))
            bids = batch[id_col].to_numpy().astype(np.int64)
            sims = X @ self.M.T
            rows, cols = np.nonzero(sims >= self.thr)
            a = bids[rows]
            b = self.ids[cols]
            keep = a < b  # canonical + drops self
            return pa.table(
                {
                    "a_id": pa.array(a[keep], type=pa.int64()),
                    "b_id": pa.array(b[keep], type=pa.int64()),
                    "cosine": pa.array(sims[rows, cols][keep], type=pa.float64()),
                }
            )

    return ds.map_batches(
        Pairs,
        fn_constructor_args=(ref, threshold),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 16),
        num_cpus=1,
    )


def _pair_table(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "a_id": pa.array(a, type=pa.int64()),
            "b_id": pa.array(b, type=pa.int64()),
            "cosine": pa.array(c, type=pa.float64()),
        }
    )


@ray.remote
def _prep_chunk(tbl: pa.Table, id_col: str, vec_col: str):
    ids = tbl[id_col].to_numpy().astype(np.int64)
    return ids, _l2norm(_to_matrix(tbl, vec_col))


@ray.remote
def _cross_chunk(chunk_a, chunk_b, thr: float, same: bool) -> pa.Table:
    ia, Ma = chunk_a
    ib, Mb = chunk_b
    sims = Ma @ Mb.T
    mask = sims >= thr
    if same:
        mask &= ia[:, None] < ib[None, :]
    rows, cols = np.nonzero(mask)
    a, b, c = ia[rows], ib[cols], sims[rows, cols]
    if not same:
        swap = a > b
        a2 = np.where(swap, b, a)
        b = np.where(swap, a, b)
        a = a2
        keep = a != b
        a, b, c = a[keep], b[keep], c[keep]
    return _pair_table(a, b, c)


def embedding_near_pairs_blockwise(ds, threshold: float = 0.95,
                                   id_col: str = "vec_id",
                                   vec_col: str = "embedding",
                                   rows_per_chunk: int = 8192,
                                   max_chunks: int = 256):
    """EXACT distributed all-pairs cosine: chunk → normalize once per
    chunk into the object store → one Ray task per chunk pair. O(n²/K²)
    memory per task, zero driver materialization (results come back as
    Arrow block refs feeding ``from_arrow_refs``). The Dataset API has no
    triangular self-join, hence raw tasks for exactly this exchange."""
    import math

    import ray.data

    slim = ds.select_columns([id_col, vec_col]).materialize()
    n = slim.count()
    if n == 0:
        return ray.data.from_arrow(_pair_table(
            np.array([], dtype=np.int64), np.array([], dtype=np.int64),
            np.array([], dtype=np.float64)))
    k = max(1, min(max_chunks, math.ceil(n / rows_per_chunk)))
    parts = slim.repartition(k).to_arrow_refs()
    chunks = [_prep_chunk.remote(p, id_col, vec_col) for p in parts]
    out_refs = []
    for i in range(len(chunks)):
        for j in range(i, len(chunks)):
            out_refs.append(
                _cross_chunk.remote(chunks[i], chunks[j], threshold, i == j)
            )
    return ray.data.from_arrow_refs(out_refs)


def _pack_matrix(M: np.ndarray) -> pa.Array:
    """(n, d) float64 → fixed_size_binary[d*8] column (vectorized; lets
    vectors cross Arrow hash joins, which reject list columns)."""
    n, d = M.shape
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(d * 8), n,
        [None, pa.py_buffer(np.ascontiguousarray(M).tobytes())],
    )


def _unpack_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """fixed_size_binary column → (n, d) float64, zero-copy."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    width = arr.type.byte_width
    d = width // 8
    data = np.frombuffer(arr.buffers()[1], dtype=np.float64)
    start = arr.offset * d
    return data[start:start + len(arr) * d].reshape(len(arr), d)


def embedding_near_pairs_lsh(ds, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             n_planes: int = 8, n_tables: int = 12,
                             seed: int = 99,
                             num_partitions: int | None = None):
    """Approximate scale path: ``n_tables`` independent random-hyperplane
    bucketings; candidate pairs are verified (exact cosine) ONLY inside a
    shared bucket, then deduped across tables with a groupby. Singleton
    buckets (the vast majority) are dropped by a count-filter semi-join
    before the per-group verify, so no Python call is paid for them.
    Vectors ride the shuffle packed as fixed_size_binary (normalized once,
    up front)."""
    from ray.data.aggregate import Max

    def pack(batch: pa.Table) -> pa.Table:
        M = _l2norm(_to_matrix(batch, vec_col))
        return pa.table(
            {id_col: batch[id_col], "vecbin": _pack_matrix(M)}
        )

    packed = ds.select_columns([id_col, vec_col]).map_batches(
        pack, batch_format="pyarrow"
    ).materialize()

    planes_by_table = {}

    def bucket_all(batch: pa.Table) -> pa.Table:
        M = _unpack_matrix(batch["vecbin"])
        if not planes_by_table:
            for t in range(n_tables):
                rng = np.random.default_rng(seed * 1000 + t)
                planes_by_table[t] = rng.standard_normal(
                    (M.shape[1], n_planes)
                )
        parts = []
        for t in range(n_tables):
            signs = (M @ planes_by_table[t]) > 0
            bits = (signs.astype(np.int64) <<
                    np.arange(n_planes, dtype=np.int64)).sum(axis=1)
            parts.append(pa.table(
                {
                    "bucket": pa.array(bits * n_tables + t, type=pa.int64()),
                    id_col: batch[id_col],
                    "vecbin": batch["vecbin"],
                }
            ))
        return pa.concat_tables(parts)

    tagged = packed.map_batches(bucket_all, batch_format="pyarrow").materialize()
    n_parts = num_partitions or max(2, min(64, tagged.num_blocks()))

    from raydedup.util import repeated_keys

    hot = repeated_keys(tagged, "bucket")
    cands = tagged.join(hot, join_type="inner", num_partitions=n_parts,
                        on=("bucket",))

    def verify(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy().astype(np.int64)
        M = _unpack_matrix(group["vecbin"])  # already normalized
        sims = M @ M.T
        mask = (sims >= threshold) & (ids[:, None] < ids[None, :])
        rows, cols = np.nonzero(mask)
        return _pair_table(ids[rows], ids[cols], sims[rows, cols])

    pairs = cands.groupby("bucket").map_groups(verify, batch_format="pyarrow")
    return pairs.groupby(["a_id", "b_id"]).aggregate(
        Max("cosine", alias_name="cosine")
    )


def rp_bucket(ds, n_planes: int = 12, seed: int = 99,
              vec_col: str = "embedding"):
    """Random-hyperplane LSH bucket id per row (sign bits of fixed seeded
    projections) — the scale path for confining cosine comparisons."""
    state = {"planes": None}

    def bucket(batch: pa.Table) -> pa.Table:
        X = _to_matrix(batch, vec_col)
        if state["planes"] is None:
            rng = np.random.default_rng(seed)
            state["planes"] = rng.standard_normal((X.shape[1], n_planes))
        signs = (X @ state["planes"]) > 0
        bits = (signs.astype(np.uint64) <<
                np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
        return batch.append_column("bucket", pa.array(bits.view(np.int64)))

    return ds.map_batches(bucket, batch_format="pyarrow")


# --- IVF (inverted-file) ANN: the coarse-quantizer scale path ------------

def _kmeans_centroids(sample: np.ndarray, n_centroids: int, seed: int,
                      iters: int = 8) -> np.ndarray:
    """Deterministic Lloyd k-means over an L2-normalized SAMPLE (numpy,
    driver-side — the sample is a small side by construction). Seeding
    is greedy FARTHEST-POINT (k-means++ without the randomness): start
    at the first sample row, repeatedly add the point with the smallest
    max-cosine to the chosen set — separated clusters each get a seed,
    where a uniform random draw can put two seeds in one cluster and
    split it. Empty cells re-seed to the farthest point, so exactly
    n_centroids cells survive."""
    del seed  # kept in the signature for call-site stability; the
    #           farthest-point seeding is fully deterministic without it
    n = sample.shape[0]
    k = min(n_centroids, n)
    chosen = [0]
    best = sample @ sample[0]
    for _ in range(k - 1):
        nxt = int(np.argmin(best))
        chosen.append(nxt)
        best = np.maximum(best, sample @ sample[nxt])
    cent = sample[chosen].copy()
    for _ in range(iters):
        sims = sample @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                cent[c] = v / nv if nv else cent[c]
            else:  # re-seed dead cell to the overall worst-served point
                far = np.argmin(sims.max(axis=1))
                cent[c] = sample[far]
    return cent


def knn_ivf(ds, query_ids: list[int], k: int = 10,
            n_centroids: int = 16, nprobe: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 7, sample_size: int = 4096):
    """Approximate top-k via an inverted file: each row belongs to its
    nearest of ``n_centroids`` k-means cells; a query scores ONLY rows
    whose cell is among its ``nprobe`` nearest centroids, so per-query
    dot-product work drops by ~n_centroids/nprobe versus brute force.
    ``nprobe == n_centroids`` degenerates to EXACT brute-force results
    (same tie-break — the basis of the value-level oracle); lower nprobe
    trades recall for speed, the standard IVF knob (Johnson et al.,
    "Billion-scale similarity search", public algorithm).

    Scale shape: centroids come from a bounded deterministic UNIFORM
    sample (``util.hash_sample_fixed`` — global bottom-``sample_size``
    by key hash; a ``limit()`` prefix would see one stratum of a
    source/time-sorted corpus); the scoring pass is a single streaming
    ``map_batches`` that assigns cells AND emits per-batch partial
    top-ks in one matmul — no vector shuffle, no full materialization;
    the input is scanned twice (query pick + scoring), which beats
    spilling 100 TB to the object store. Only k·Q·num_batches partial
    rows reach the final per-query merge. Same output schema as
    ``knn_brute``."""
    q_ids, Q = _collect_queries(ds, query_ids, id_col, vec_col)

    from raydedup.util import hash_sample_fixed

    sample_tbl = hash_sample_fixed(
        ds.select_columns([id_col, vec_col]), id_col, sample_size
    ).take_all()
    S = _l2norm(np.array([r[vec_col] for r in sample_tbl], dtype=np.float64))
    cent = _kmeans_centroids(S, n_centroids, seed)
    probe = min(nprobe, cent.shape[0])
    # per-query probed cells (nprobe nearest centroids)
    q_cell_sims = Q @ cent.T
    probes = np.argsort(-q_cell_sims, axis=1)[:, :probe]  # (q, probe)
    cell_to_queries: dict[int, np.ndarray] = {}
    for c in np.unique(probes):
        qsel = np.nonzero((probes == c).any(axis=1))[0]
        cell_to_queries[int(c)] = qsel
    ref = ray.put((q_ids, Q, cent, cell_to_queries))

    class IVFPartial:
        """Assign cells and emit this batch's top-k per probing query —
        one pass, state loaded once per actor."""

        def __init__(self, ref, k):
            self.q_ids, self.Q, self.cent, self.c2q = ray.get(ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = _l2norm(_to_matrix(batch, vec_col))
            ids = batch[id_col].to_numpy().astype(np.int64)
            cell = np.argmax(X @ self.cent.T, axis=1)
            out_q, out_n, out_c = [], [], []
            for c in np.unique(cell):
                wanted = self.c2q.get(int(c))
                if wanted is None:
                    continue
                rmask = cell == c
                rids = ids[rmask]
                sims = X[rmask] @ self.Q[wanted].T  # (rows_in_cell, |wanted|)
                for col, qi in enumerate(wanted):
                    m = rids != self.q_ids[qi]
                    cand_ids, cand = rids[m], sims[:, col][m]
                    if cand.size == 0:
                        continue
                    sel = np.lexsort((cand_ids, -cand))[: min(self.k,
                                                              cand.size)]
                    out_q.extend([int(self.q_ids[qi])] * sel.size)
                    out_n.extend(cand_ids[sel].tolist())
                    out_c.extend(cand[sel].tolist())
            return pa.table(
                {"query_id": pa.array(out_q, type=pa.int64()),
                 "neighbor_id": pa.array(out_n, type=pa.int64()),
                 "cosine": pa.array(out_c, type=pa.float64())}
            )

    partial = ds.select_columns([id_col, vec_col]).map_batches(
        IVFPartial,
        fn_constructor_args=(ref, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 16),
        num_cpus=1,
    )
    return partial.groupby("query_id").map_groups(_rank_topk(k),
                                                  batch_format="pyarrow")


def _partial_topk_rows(qids: np.ndarray, nids: np.ndarray,
                       sims: np.ndarray, k: int) -> pa.Table:
    """(na, nb) similarity block → the ≤(k + ties) best (query, neighbor,
    cosine) rows PER QUERY ROW under (cosine desc, id asc), fully
    vectorized: a row-wise kth-value threshold keeps every boundary tie
    (so the exact global top-k is always a subset of the union of these
    partials), then one lexsort ranks the kept triples."""
    na, nb = sims.shape
    kk = min(k, nb)
    if na == 0 or nb == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    thr = -np.partition(-sims, kk - 1, axis=1)[:, kk - 1]
    rows, cols = np.nonzero(sims >= thr[:, None])
    cos = sims[rows, cols]
    finite = np.isfinite(cos)  # -inf self-mask never survives
    rows, cols, cos = rows[finite], cols[finite], cos[finite]
    nid = nids[cols]
    order = np.lexsort((nid, -cos, rows))
    r = rows[order]
    starts = np.flatnonzero(np.r_[True, r[1:] != r[:-1]])
    rank = np.arange(len(r)) - np.repeat(starts, np.diff(
        np.r_[starts, len(r)]))
    keep = order[rank < kk]
    return pa.table({"query_id": pa.array(qids[rows[keep]]),
                     "neighbor_id": pa.array(nids[cols[keep]]),
                     "cosine": pa.array(cos[keep])})


@ray.remote
def _prep_chunk_grouped(tbl: pa.Table, id_col: str, vec_col: str,
                        group_col: str):
    import hashlib

    import pyarrow.compute as pc

    ids = tbl[id_col].to_numpy().astype(np.int64)
    # group values → process-stable uint64 codes (blake2b of the repr,
    # once per DISTINCT value) so the cross-chunk same-group mask is one
    # C-speed integer broadcast compare regardless of the group type
    enc = pc.dictionary_encode(tbl[group_col].combine_chunks())
    dh = np.fromiter(
        (int.from_bytes(hashlib.blake2b(str(v).encode(),
                                        digest_size=8).digest(), "big")
         for v in enc.dictionary.to_pylist()),
        dtype=np.uint64, count=len(enc.dictionary))
    g = dh[enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
    return ids, _l2norm(_to_matrix(tbl, vec_col)), g


@ray.remote
def _cross_chunk_hardneg(chunk_a, chunk_b, k: int, same: bool) -> pa.Table:
    """Chunk-pair partial top-k restricted to CROSS-group neighbors
    (hard-negative mining): same-group similarities are masked out."""
    ia, Ma, ga = chunk_a
    ib, Mb, gb = chunk_b
    sims = Ma @ Mb.T
    sims[ga[:, None] == gb[None, :]] = -np.inf
    t1 = _partial_topk_rows(ia, ib, sims, k)
    if same:
        return t1
    t2 = _partial_topk_rows(ib, ia, np.ascontiguousarray(sims.T), k)
    return pa.concat_tables([t1, t2])


def knn_hard_negatives(ds, k: int = 3, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       group_col: str = "source",
                       rows_per_chunk: int = 8192,
                       max_chunks: int = 256, num_partitions: int = 64):
    """→ Dataset(query_id, neighbor_id, cosine, rank): every row's top-k
    most similar vectors from a DIFFERENT ``group_col`` value — the
    hard-negative mining primitive for contrastive training (nearest
    confusable examples that are not same-source). Same exchange as
    :func:`knn_self_join` (chunk-pair partial top-ks + hash-partition
    sweep merge), with same-group pairs masked inside each task."""
    import math

    import ray.data

    slim = ds.select_columns([id_col, vec_col, group_col]).materialize()
    n = slim.count()
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64()),
                      "rank": pa.array([], pa.int64())})
    if n == 0:
        return ray.data.from_arrow(empty)
    n_chunks = max(1, min(max_chunks, math.ceil(n / rows_per_chunk)))
    parts = slim.repartition(n_chunks).to_arrow_refs()
    chunks = [_prep_chunk_grouped.remote(p, id_col, vec_col, group_col)
              for p in parts]
    out_refs = []
    for i in range(len(chunks)):
        for j in range(i, len(chunks)):
            out_refs.append(_cross_chunk_hardneg.remote(
                chunks[i], chunks[j], k, i == j))
    partial = ray.data.from_arrow_refs(out_refs)
    return _merge_partial_topk(partial, k, num_partitions)


@ray.remote
def _cross_chunk_topk(chunk_a, chunk_b, k: int, same: bool) -> pa.Table:
    """Both directions of one chunk pair: A's rows' local top-k against
    B's columns, and (for distinct chunks) B's against A's."""
    ia, Ma = chunk_a
    ib, Mb = chunk_b
    sims = Ma @ Mb.T
    if same:
        sims[ia[:, None] == ib[None, :]] = -np.inf
        return _partial_topk_rows(ia, ib, sims, k)
    t1 = _partial_topk_rows(ia, ib, sims, k)
    t2 = _partial_topk_rows(ib, ia, np.ascontiguousarray(sims.T), k)
    return pa.concat_tables([t1, t2])


def knn_self_join(ds, k: int = 10, id_col: str = "vec_id",
                  vec_col: str = "embedding", rows_per_chunk: int = 8192,
                  max_chunks: int = 256, num_partitions: int = 64):
    """→ Dataset(query_id, neighbor_id, cosine, rank): EVERY row's exact
    top-k cosine neighbors (the all-pairs similarity join that feeds
    hard-negative mining / dedup triage), ties broken by neighbor_id
    ascending, rank 1-based.

    Scale shape: the ``embedding_near_pairs_blockwise`` exchange — chunks
    normalized once into the object store, one task per chunk pair, each
    emitting only its LOCAL per-row top-k (+boundary ties), so the merge
    shuffle carries ≤ (k+ties)·n·K rows, never n². The final per-query
    merge is a hash-PARTITION sweep (one lexsort per partition covers
    every query in it) — NOT a map_groups Python call per query id,
    which at corpus scale would be millions of calls."""
    import math

    import ray.data

    slim = ds.select_columns([id_col, vec_col]).materialize()
    n = slim.count()
    if n == 0:
        return ray.data.from_arrow(pa.table(
            {"query_id": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64()),
             "rank": pa.array([], pa.int64())}))
    n_chunks = max(1, min(max_chunks, math.ceil(n / rows_per_chunk)))
    parts = slim.repartition(n_chunks).to_arrow_refs()
    chunks = [_prep_chunk.remote(p, id_col, vec_col) for p in parts]
    out_refs = []
    for i in range(len(chunks)):
        for j in range(i, len(chunks)):
            out_refs.append(
                _cross_chunk_topk.remote(chunks[i], chunks[j], k, i == j))
    partial = ray.data.from_arrow_refs(out_refs)
    return _merge_partial_topk(partial, k, num_partitions)


def _merge_partial_topk(partial, k: int, num_partitions: int):
    """Shared final merge for the chunk-pair top-k family: hash-PARTITION
    sweep — one lexsort per partition ranks every query in it; never a
    Python call per query id."""

    def tag(batch: pa.Table) -> pa.Table:
        q = batch["query_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__part", pa.array(q % num_partitions))

    def merge(g: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64()),
                          "rank": pa.array([], pa.int64())})
        if g.num_rows == 0 or "query_id" not in g.column_names:
            return empty
        q = g["query_id"].to_numpy(zero_copy_only=False)
        nid = g["neighbor_id"].to_numpy(zero_copy_only=False)
        cos = g["cosine"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -cos, q))
        qs = q[order]
        starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
        rank = (np.arange(len(qs))
                - np.repeat(starts, np.diff(np.r_[starts, len(qs)])))
        # cross-chunk duplicates cannot exist (each (i,j) pair runs once)
        keep = rank < k
        sel = order[keep]
        return pa.table({"query_id": pa.array(q[sel]),
                         "neighbor_id": pa.array(nid[sel]),
                         "cosine": pa.array(cos[sel]),
                         "rank": pa.array(rank[keep] + 1)})

    return (partial.map_batches(tag, batch_format="pyarrow")
            .groupby("__part").map_groups(merge, batch_format="pyarrow"))


# size-1 per-worker cache of the broadcast (dup_ids, cluster_ids) arrays
_SEMDEDUP_CACHE: dict[bytes, tuple] = {}


def _semdedup_components_driver(pairs) -> tuple[np.ndarray, np.ndarray]:
    """Edges Dataset(a_id, b_id) → (sorted dup node ids, component min
    id per node), both int64 numpy — the fully vectorized driver path
    (dictionary rank space + pointer-jumping min-label propagation, the
    ``pipelines/neardup.py`` idiom specialized to integer ids where
    numeric order IS the canonical order)."""
    batches = list(pairs.select_columns(["a_id", "b_id"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"))
    a = np.concatenate(
        [b["a_id"].to_numpy(zero_copy_only=False) for b in batches]
    ).astype(np.int64)
    b_ = np.concatenate(
        [b["b_id"].to_numpy(zero_copy_only=False) for b in batches]
    ).astype(np.int64)
    nodes, inv = np.unique(np.r_[a, b_], return_inverse=True)
    m = len(a)
    a_r, b_r = inv[:m], inv[m:]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        lo = np.minimum(label[a_r], label[b_r])
        np.minimum.at(label, a_r, lo)
        np.minimum.at(label, b_r, lo)
        nxt = label[label]
        while not np.array_equal(nxt, label):
            label, nxt = nxt, nxt[nxt]
        if np.array_equal(label[a_r], label[b_r]):
            break
    return nodes, nodes[label]


def semantic_dedup(ds, threshold: float = 0.95, id_col: str = "vec_id",
                   vec_col: str = "embedding", method: str = "auto",
                   components: str = "auto",
                   driver_max_edges: int = 2_000_000,
                   num_partitions: int | None = None):
    """SemDeDup-style semantic deduplication (public recipe: cosine
    near-pairs over an embedding column -> connected components -> keep
    one representative per component). Emits ``(id, cluster_id, keep)``
    for EVERY input row: ``cluster_id`` is the component's min id
    (singletons label themselves), ``keep`` marks the survivor.

    Scale shape: pairs come from :func:`embedding_near_pairs` (broadcast
    / exact-blockwise / LSH backends). ``components`` picks the
    clustering backend: ``driver`` runs the vectorized numpy
    pointer-jumping union-find and broadcasts two int64 arrays painted
    with ``pc.index_in`` (NO Python dict, no per-row loop);
    ``distributed`` routes the edges through
    ``state.unionfind.connected_components_distributed`` (min-label
    propagation, everything stays a Dataset) and paints labels with a
    distributed left join — the path for a realistic 20-50% semantic-dup
    rate at 100 TB where even the dup-id set is corpus-scale. ``auto``
    switches on the edge count at ``driver_max_edges`` (the
    ``exact.py``/``lsh.py`` auto-switch idiom).
    """
    import ray
    import ray.data

    pairs = embedding_near_pairs(
        ds, threshold, id_col, vec_col, method).materialize()
    n_edges = pairs.count()
    if components == "auto":
        components = ("driver" if n_edges <= driver_max_edges
                      else "distributed")

    id_type = ds.schema().types[ds.schema().names.index(id_col)]

    if n_edges == 0 or components == "driver":
        if n_edges == 0:
            nodes = np.array([], dtype=np.int64)
            clusters = np.array([], dtype=np.int64)
        else:
            nodes, clusters = _semdedup_components_driver(pairs)
        labels_ref = ray.put((nodes, clusters))

        def label(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ck = labels_ref.binary()
            cached = _SEMDEDUP_CACHE.get(ck)
            if cached is None:
                cached = ray.get(labels_ref)
                _SEMDEDUP_CACHE.clear()
                _SEMDEDUP_CACHE[ck] = cached
            node_arr = pa.array(cached[0], type=id_type)
            clus_arr = pa.array(cached[1], type=id_type)
            at = pc.index_in(batch[id_col], value_set=node_arr)
            cluster = pc.coalesce(pc.take(clus_arr, at),
                                  batch[id_col].combine_chunks())
            keep = pc.equal(batch[id_col], cluster)
            return pa.table({id_col: batch[id_col],
                             "cluster_id": cluster,
                             "keep": keep})

        return ds.select_columns([id_col]).map_batches(
            label, batch_format="pyarrow")

    # distributed: edges -> min-label propagation -> left-join paint
    def as_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"a_key": batch["a_id"], "b_key": batch["b_id"]})

    from raydedup.state.unionfind import connected_components_distributed

    labels = connected_components_distributed(
        pairs.map_batches(as_edges, batch_format="pyarrow"),
        num_partitions=num_partitions)

    def as_lookup(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch["node"].cast(id_type),
                         "__cluster": batch["label"].cast(id_type)})

    lookup = labels.map_batches(as_lookup,
                                batch_format="pyarrow").materialize()
    if num_partitions is None:
        # sized so every hash partition is statistically non-empty
        # (Ray 2.49 mishandles all-empty join partitions) and capped at
        # 2x CPUs (aggregator-pool deadlock far above that)
        from raydedup.util import join_partitions

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = min(join_partitions(lookup.count()),
                             max(2, 2 * ncpu))
    joined = ds.select_columns([id_col]).join(
        lookup, join_type="left_outer", num_partitions=num_partitions,
        on=(id_col,))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], id_type),
                             "cluster_id": pa.array([], id_type),
                             "keep": pa.array([], pa.bool_())})
        cluster = pc.coalesce(batch["__cluster"],
                              batch[id_col].combine_chunks())
        return pa.table({id_col: batch[id_col],
                         "cluster_id": cluster,
                         "keep": pc.equal(batch[id_col], cluster)})

    return joined.map_batches(finish, batch_format="pyarrow")


def kmeans_fit(ds, n_clusters: int = 8, iters: int = 8, seed: int = 7,
               sample_size: int = 2048, id_col: str = "vec_id",
               vec_col: str = "embedding"):
    """Distributed deterministic Lloyd k-means over an embedding column
    (cosine assignment on L2-normalized vectors, the same metric the IVF
    coarse quantizer uses). Returns ``(centroids ndarray (k, d),
    labels_fn)`` where ``labels_fn(ds)`` maps any dataset with the same
    columns to ``(id, cluster)``.

    Scale shape per iteration: centroids broadcast via ``ray.put``; one
    streaming ``map_batches`` assigns cells and emits EXACT per-cell
    partials — counts + micro-quantized int64 component sums (the
    ``label_centroids`` trick), so the reduce is order-independent and
    the whole fit is bit-deterministic under any partitioning; the
    shuffle carries ≤ k rows per block. Init is the deterministic
    ``hash_sample_fixed`` bottom-k sample (physical-order independent).
    Iterative ⇒ no SQL oracle (same class as otmt_lda — the driver
    records a rows-only check); determinism and recovery are pinned by
    pytest instead (planted clusters, partitioning invariance)."""
    import ray

    from raydedup.util import hash_sample_fixed, round_half_away

    scale = 1e6
    sample = hash_sample_fixed(
        ds.select_columns([id_col, vec_col]), id_col, sample_size,
        seed=seed).take_all()
    S = _l2norm(np.array([r[vec_col] for r in sample], dtype=np.float64))
    cent = _kmeans_centroids(S, n_clusters, seed)
    k, d = cent.shape

    def partial_factory(cent_ref):
        def partial(batch: pa.Table) -> pa.Table:
            cols = {"cell": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    **{f"s{i}": pa.array([], pa.int64())
                       for i in range(d)}}
            if batch.num_rows == 0:
                return pa.table(cols)
            C = ray.get(cent_ref)
            X = _l2norm(_to_matrix(batch, vec_col))
            cell = np.argmax(X @ C.T, axis=1)
            q = round_half_away(X * scale).astype(np.int64)
            order = np.argsort(cell, kind="stable")
            cs = cell[order]
            starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
            sums = np.add.reduceat(q[order], starts, axis=0)
            counts = np.diff(np.r_[starts, len(cs)])
            out = {"cell": pa.array(cs[starts]),
                   "n": pa.array(counts.astype(np.int64))}
            for i in range(d):
                out[f"s{i}"] = pa.array(sums[:, i])
            return pa.table(out)
        return partial

    from ray.data.aggregate import Sum

    slim = ds.select_columns([id_col, vec_col]).materialize()
    for _ in range(iters):
        cent_ref = ray.put(cent)
        agg = (slim.map_batches(partial_factory(cent_ref),
                                batch_format="pyarrow")
               .groupby("cell").aggregate(
                   Sum("n", alias_name="n"),
                   *[Sum(f"s{i}", alias_name=f"s{i}")
                     for i in range(d)]))
        rows = agg.take_all()  # ≤ k rows
        new = cent.copy()
        for r in rows:
            if r["n"]:
                v = np.array([r[f"s{i}"] for i in range(d)],
                             dtype=np.float64) / (r["n"] * scale)
                nv = np.linalg.norm(v)
                if nv:
                    new[int(r["cell"])] = v / nv
        if np.array_equal(new, cent):
            break
        cent = new

    final_ref = ray.put(cent)

    def labels_fn(dsx):
        def assign(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "cluster": pa.array([], pa.int64())})
            C = ray.get(final_ref)
            X = _l2norm(_to_matrix(batch, vec_col))
            return pa.table({id_col: batch[id_col],
                             "cluster": pa.array(
                                 np.argmax(X @ C.T, axis=1))})

        return dsx.select_columns([id_col, vec_col]).map_batches(
            assign, batch_format="pyarrow")

    return cent, labels_fn


def quantize_embeddings_stats(ds, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              levels: int = 127):
    """→ Dataset(vec_id, scale, q_sum, q_min, q_max): symmetric int8-style
    quantization summary per vector — q_i = round(x_i / scale · levels)
    with scale = max|x_i| (the standard absmax scheme embedding stores
    ship), zero vectors quantize to all-zeros. Emitting the integer
    SUMMARY (sum/min/max of the quantized components) rather than the
    list keeps the value oracle exact and list-free; ``round`` is
    half-away-from-zero on both sides (numpy ``round_half_away`` ≡
    DuckDB/std::round for doubles). One streaming ``map_batches``, one
    matrix pass per batch, no shuffle."""
    from raydedup.util import round_half_away

    def q(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "scale": pa.array([], pa.float64()),
                             "q_sum": pa.array([], pa.int64()),
                             "q_min": pa.array([], pa.int64()),
                             "q_max": pa.array([], pa.int64())})
        M = _to_matrix(batch, vec_col)
        scale = np.abs(M).max(axis=1)
        safe = np.where(scale == 0.0, 1.0, scale)
        Q = round_half_away(M / safe[:, None] * float(levels))
        Q[scale == 0.0] = 0.0
        return pa.table({
            id_col: batch[id_col],
            "scale": pa.array(scale),
            "q_sum": pa.array(Q.sum(axis=1).astype(np.int64)),
            "q_min": pa.array(Q.min(axis=1).astype(np.int64)),
            "q_max": pa.array(Q.max(axis=1).astype(np.int64)),
        })

    return ds.select_columns([id_col, vec_col]).map_batches(
        q, batch_format="pyarrow")


def label_centroids(ds, dims: int, label_col: str = "label",
                    vec_col: str = "embedding", scale: float = 1e6):
    """→ Dataset(label, n, c0..c{dims-1}): per-label centroid (mean
    vector) — the building block for k-means-style clustering and
    class-prototype analysis. Components quantize to
    round(v·scale) int64 (half away from zero, DuckDB round parity)
    and sum EXACTLY per label inside each batch (one lexsort +
    reduceat per batch, so the shuffle carries ≤ labels rows per
    block). Output carries BOTH the exact integer sums (s0..s{d-1} —
    the oracle-able contract: bit-exact under any accumulation order)
    and the derived float centroids (c0..c{d-1} = s/n/scale; mean
    floats near a decimal rounding boundary can differ in the last
    printed digit from a SQL engine's round(), so value-level gates
    should compare the sums). Overflow bound: n·max|v|·scale per
    component must stay under 2^63.
    """
    from ray.data.aggregate import Sum

    if dims < 1:
        raise ValueError("dims must be >= 1")
    sums = [f"s{i}" for i in range(dims)]

    def partial(b: pa.Table) -> pa.Table:
        lab_t = b[label_col].combine_chunks()
        gtype = lab_t.type
        if b.num_rows == 0:
            return pa.table({label_col: pa.array([], gtype),
                             "n": pa.array([], pa.int64()),
                             **{s: pa.array([], pa.int64())
                                for s in sums}})
        M = _to_matrix(b, vec_col)
        if M.shape[1] != dims:
            raise ValueError(
                f"expected {dims}-dim vectors, got {M.shape[1]}")
        from raydedup.util import round_half_away

        q = round_half_away(M * scale).astype(np.int64)
        lab = lab_t.to_numpy(zero_copy_only=False)
        order = np.argsort(lab, kind="stable")
        lab_s = lab[order]
        starts = np.flatnonzero(np.r_[True, lab_s[1:] != lab_s[:-1]])
        seg_sums = np.add.reduceat(q[order], starts, axis=0)
        counts = np.diff(np.r_[starts, len(lab_s)])
        cols = {label_col: pa.array(lab_s[starts], gtype),
                "n": pa.array(counts.astype(np.int64))}
        for i, s in enumerate(sums):
            cols[s] = pa.array(seg_sums[:, i])
        return pa.table(cols)

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(label_col).aggregate(
                  Sum("n", alias_name="n"),
                  *[Sum(s, alias_name=s) for s in sums]))

    lab_type = ds.schema().types[ds.schema().names.index(label_col)]

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n" not in b.column_names:
            return pa.table({label_col: pa.array([], lab_type),
                             "n": pa.array([], pa.int64()),
                             **{f"s{i}": pa.array([], pa.int64())
                                for i in range(dims)},
                             **{f"c{i}": pa.array([], pa.float64())
                                for i in range(dims)}})
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        cols = {label_col: b[label_col], "n": b["n"]}
        for i in range(dims):
            cols[f"s{i}"] = b[f"s{i}"]
        for i in range(dims):
            s = b[f"s{i}"].to_numpy(
                zero_copy_only=False).astype(np.float64)
            cols[f"c{i}"] = pa.array(s / n / scale)
        return pa.table(cols)

    return merged.map_batches(finish, batch_format="pyarrow")


# per-worker cache of the broadcast prototype tables (size-1, keyed by ref)
_PROTO_CACHE: dict[bytes, tuple] = {}


def prototype_prune(ds, dims: int, prune_frac: float = 0.25,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    label_col: str = "label", scale: float = 1e6,
                    num_partitions: int = 64):
    """→ Dataset(id, label, proto_score): D4-style prototypicality
    pruning (Tirumala et al. 2023, public): within each label (cluster)
    drop the ``floor(prune_frac · n_label)`` rows MOST similar to the
    label centroid — the near-prototype region of a cluster is the most
    redundant for training — and keep the diverse remainder, each with
    its centroid cosine. Replaces OTMT's keep/drop-by-similarity
    selection (otmt/timemap_measures.py scoring + threshold filter)
    with a cluster-relative selection rule.

    Exactness contract (shared with the SQL oracle): vectors quantize
    to round-half-away(v·scale) int64; the per-label centroid direction
    is the EXACT integer component sum s (cos(x, s) == cos(x, mean)
    since positive scaling preserves cosine); per-row score =
    float64(dot)/sqrt(float64(‖q‖²))/sqrt(float64(‖s‖²)) — every
    operand an exact integer and /,sqrt correctly rounded in IEEE, so
    both sides produce bit-identical doubles and identical ranks
    (ties broken by ascending id). Zero vectors (or a zero sum vector)
    score 0.0.

    Scale shape: one partial-sum groupby over labels (≤ labels rows
    shuffle — label_centroids' kernel), the (label, s, n) table
    broadcast once via ``ray.put`` (bounded by cluster count; D4
    clusters number ~sqrt(corpus) — beyond ~10^7 labels switch the
    paint to a hash join), one stateless scoring pass, then the
    ordered.py partition sweep (hash-partition by label, ONE lexsort
    per partition ranks every label in it — no Python call per label,
    no driver materialization of rows). int64 overflow is guarded per
    batch: max|q|·Σ|s| must stay under 2^63 (raises otherwise);
    ‖s‖² is computed in arbitrary-precision Python int.
    """
    import math

    from raydedup.stages.asof import _part_array
    from raydedup.util import round_half_away

    if not 0.0 <= prune_frac < 1.0:
        raise ValueError(f"prune_frac must be in [0, 1), got {prune_frac}")

    slim = ds.select_columns([id_col, label_col, vec_col]).materialize()
    schema = slim.schema()
    if schema is None:  # fully empty input: no blocks survive
        from ray.data import from_arrow
        return from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            label_col: pa.array([], pa.int64()),
            "proto_score": pa.array([], pa.float64())}))
    lab_type = schema.types[schema.names.index(label_col)]
    id_type = schema.types[schema.names.index(id_col)]
    empty = pa.table({id_col: pa.array([], id_type),
                      label_col: pa.array([], lab_type),
                      "proto_score": pa.array([], pa.float64())})
    sums = label_centroids(
        slim.select_columns([label_col, vec_col]), dims=dims,
        label_col=label_col, vec_col=vec_col, scale=scale)
    rows = sums.select_columns(
        [label_col, "n"] + [f"s{i}" for i in range(dims)]).take_all()
    if not rows:
        from ray.data import from_arrow
        return from_arrow(empty)

    labels = pa.array([r[label_col] for r in rows], lab_type)
    S = np.array([[r[f"s{i}"] for i in range(dims)] for r in rows],
                 dtype=np.int64)
    n_lab = np.array([r["n"] for r in rows], dtype=np.int64)
    # ‖s‖² in python ints (exact at any magnitude), k_drop per label
    snorm = np.array([math.sqrt(float(sum(int(v) * int(v) for v in row)))
                      for row in S], dtype=np.float64)
    abs_s = np.array([float(sum(abs(int(v)) for v in row)) for row in S],
                     dtype=np.float64)
    k_drop = np.floor(n_lab * prune_frac).astype(np.int64)
    proto_ref = ray.put((labels, S, snorm, abs_s, k_drop))

    def _lut():
        ck = proto_ref.binary()
        lut = _PROTO_CACHE.get(ck)
        if lut is None:
            lut = ray.get(proto_ref)
            _PROTO_CACHE.clear()
            _PROTO_CACHE[ck] = lut
        return lut

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        garr, Sm, sn, asum, _ = _lut()
        lab = batch[label_col].combine_chunks()
        if pc.any(pc.is_null(lab)).as_py():
            raise ValueError("prototype_prune: null labels — a NaN "
                             "index would silently misroute rows; "
                             "filter or fill nulls upstream")
        idx = pc.index_in(lab, garr).to_numpy(zero_copy_only=False)
        idx = idx.astype(np.int64)
        M = _to_matrix(batch, vec_col)
        if M.shape[1] != dims:
            raise ValueError(f"expected {dims}-dim vectors, got {M.shape[1]}")
        q = round_half_away(M * scale).astype(np.int64)
        qmax = float(np.abs(q).max()) if q.size else 0.0
        if qmax and (qmax * asum[idx].max()) >= float(2 ** 63):
            raise ValueError("prototype_prune: |q|·Σ|s| would overflow "
                             "int64 — lower scale or split labels")
        Srows = Sm[idx]
        dot = (q * Srows).sum(axis=1)
        xnormsq = (q * q).sum(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            sc = (dot.astype(np.float64)
                  / np.sqrt(xnormsq.astype(np.float64)) / sn[idx])
        sc = np.where((xnormsq == 0) | (sn[idx] == 0.0), 0.0, sc)
        return pa.table({id_col: batch[id_col],
                         label_col: batch[label_col],
                         "proto_score": pa.array(sc)})

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.append_column(
            "__part", _part_array(batch[label_col], num_partitions))

    def prune(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__part" not in g.column_names:
            return empty
        garr, _, _, _, kd = _lut()
        from raydedup.stages.asof import _group_codes

        codes, _ = _group_codes(g[label_col])
        ids = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        sc = g["proto_score"].combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.lexsort((ids, -sc, codes))
        codes_s = codes[order]
        n = len(order)
        starts = np.r_[0, np.flatnonzero(codes_s[1:] != codes_s[:-1]) + 1]
        lens = np.diff(np.r_[starts, n])
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        kidx = pc.index_in(g[label_col].combine_chunks(),
                           garr).to_numpy(zero_copy_only=False)
        kidx = kidx.astype(np.int64)
        keep = order[rank >= kd[kidx[order]]]
        oi = pa.array(np.sort(keep))
        return pa.table({id_col: g[id_col].take(oi),
                         label_col: g[label_col].take(oi),
                         "proto_score": g["proto_score"].take(oi)})

    scored = slim.map_batches(score, batch_format="pyarrow")
    return (scored.map_batches(tag, batch_format="pyarrow")
            .groupby("__part").map_groups(prune, batch_format="pyarrow"))


# --- Product-quantization ANN (IP-ADC + exact in-batch re-rank) ------------
#
# PQ (Jégou, Douze, Schmid 2011, public) scores a query against a
# whole batch with m table lookups per vector (ADC) instead of a d-dim
# dot product — a COMPUTE win for candidate generation. The m-uint8
# codes-per-vector layout (16 bytes vs 256 for a 64-dim float32 row)
# is what a PERSISTED PQ index would store; this operator recomputes
# codes per batch and keeps the batch's float vectors in memory for
# the exact re-rank, so its resident memory matches knn_brute — the
# codes here buy cheaper scoring, not a smaller footprint. Codebooks
# are per-subspace Euclidean k-means over a deterministic hash sample
# (the standard training recipe — every production PQ index trains on
# a sample), broadcast once via ray.put.
#
# Exactness contract: each batch shortlists `shortlist*k` candidates
# per query by ADC score, then re-ranks the shortlist with EXACT cosine
# against the batch's own (still-in-memory) vectors — so the emitted
# partials are exact whenever a batch's true top-k all land in its own
# shortlist (a per-batch condition, far weaker than global PQ recall).
# The final merge is the same (cosine desc, id asc) top-k as knn_brute,
# so with adequate shortlist the output EQUALS the brute-force oracle;
# shortlist is the documented recall/speed knob, mirroring knn_ivf's
# nprobe.


def _pq_train(sample: np.ndarray, m: int, k_codes: int,
              iters: int = 10) -> np.ndarray:
    """(n, d) L2-normalized sample → (m, k_codes, d//m) Euclidean-Lloyd
    codebooks, farthest-point seeded — deterministic, no RNG."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    kc = min(k_codes, n)
    books = np.empty((m, kc, sub), dtype=np.float64)
    for j in range(m):
        X = sample[:, j * sub: (j + 1) * sub]
        sq = (X * X).sum(axis=1)
        chosen = [0]
        best = sq + sq[0] - 2.0 * (X @ X[0])
        for _ in range(kc - 1):
            nxt = int(np.argmax(best))
            chosen.append(nxt)
            best = np.minimum(best, sq + sq[nxt] - 2.0 * (X @ X[nxt]))
        cent = X[chosen].copy()
        for _ in range(iters):
            d2 = sq[:, None] - 2.0 * (X @ cent.T) + (cent * cent).sum(axis=1)
            assign = np.argmin(d2, axis=1)
            for c in range(kc):
                members = X[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
                else:  # dead cell: re-seed to the worst-served point
                    cent[c] = X[int(np.argmax(d2.min(axis=1)))]
        books[j] = cent
    return books


def _pq_codes(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) → (m, n) int codes: per-subspace Euclidean argmin."""
    m, kc, sub = books.shape
    n = X.shape[0]
    codes = np.empty((m, n), dtype=np.int64)
    for j in range(m):
        Xj = X[:, j * sub: (j + 1) * sub]
        d2 = -2.0 * (Xj @ books[j].T) + (books[j] * books[j]).sum(axis=1)
        codes[j] = np.argmin(d2, axis=1)  # ||x||² constant per row
    return codes


def knn_pq(ds, query_ids: list[int], k: int = 10, m: int = 16,
           k_codes: int = 64, shortlist: int = 16,
           sample_size: int = 2048, id_col: str = "vec_id",
           vec_col: str = "embedding"):
    """→ Dataset(query_id, neighbor_id, cosine, rank): PQ-ADC shortlist
    per batch, exact in-batch cosine re-rank, knn_brute's merge — same
    output contract (exact cosine, ties by neighbor_id asc, self
    excluded)."""
    from raydedup.util import hash_sample_fixed

    q_ids, Q = _collect_queries(ds, query_ids, id_col, vec_col)
    sample_rows = hash_sample_fixed(
        ds.select_columns([id_col, vec_col]), id_col, sample_size
    ).take_all()
    S = _l2norm(np.array([r[vec_col] for r in sample_rows],
                         dtype=np.float64))
    books = _pq_train(S, m, k_codes)
    mm, kc, sub = books.shape
    # LUT[j] (q, kc): <Q_j, c> — ADC inner-product tables, built once
    lut = np.stack([
        Q[:, j * sub: (j + 1) * sub] @ books[j].T for j in range(mm)
    ])  # (m, q, kc)
    ref = ray.put((q_ids, Q, books, lut))

    class PartialPQ:
        def __init__(self, ref, k, shortlist):
            self.q_ids, self.Q, self.books, self.lut = ray.get(ref)
            self.k = k
            self.sl = max(k * shortlist, k)

        def __call__(self, batch: pa.Table) -> pa.Table:
            empty = pa.table({
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            })
            if batch.num_rows == 0:
                return empty
            X = _l2norm(_to_matrix(batch, vec_col))
            ids = batch[id_col].to_numpy().astype(np.int64)
            codes = _pq_codes(X, self.books)        # (m, n)
            # ADC: approx (q, n) = Σ_j lut[j][:, codes[j]]
            approx = self.lut[0][:, codes[0]]
            for j in range(1, codes.shape[0]):
                approx = approx + self.lut[j][:, codes[j]]
            out_q, out_n, out_c = [], [], []
            for qi in range(len(self.q_ids)):
                # index gather, not a boolean-masked (n, d) copy per
                # query — only the s shortlist rows are materialized
                idx = np.flatnonzero(ids != self.q_ids[qi])
                cand_ids = ids[idx]
                if cand_ids.size == 0:
                    continue
                a = approx[qi][idx]
                s = min(self.sl, cand_ids.size)
                # shortlist by (ADC desc, id asc) — deterministic
                short = np.lexsort((cand_ids, -a))[:s]
                # exact re-rank of the shortlist only
                exact = X[idx[short]] @ self.Q[qi]
                kk = min(self.k, s)
                sel = np.lexsort((cand_ids[short], -exact))[:kk]
                out_q.extend([int(self.q_ids[qi])] * kk)
                out_n.extend(cand_ids[short][sel].tolist())
                out_c.extend(exact[sel].tolist())
            return pa.table({
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cosine": pa.array(out_c, type=pa.float64()),
            })

    partial = ds.map_batches(
        PartialPQ,
        fn_constructor_args=(ref, k, shortlist),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 16),
        num_cpus=1,
    )
    return partial.groupby("query_id").map_groups(_rank_topk(k),
                                                  batch_format="pyarrow")


def cross_corpus_nn(ds, bench_ds, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    bench_max_rows: int = 500_000):
    """Embedding-space decontamination scan: for every corpus vector its
    nearest BENCHMARK vector by cosine (ties -> min benchmark id) — the
    semantic analogue of the n-gram ``decontaminate`` stage (an eval
    paraphrase shares no 8-gram but sits at cosine ~1). Thresholding the
    returned ``cosine`` is the caller's one-line filter; the expensive
    part is this cross-corpus max-similarity, and it streams.

    Scale shape: the benchmark side is genuinely small (eval suites), so
    it is collected once, L2-normalized, sorted by id and broadcast via
    ``ray.put`` (guarded by ``bench_max_rows``); the corpus streams
    through an actor-pool matmul with a per-batch argmax — no shuffle.
    ``np.argmax`` takes the FIRST maximum, and benchmark rows are sorted
    by id, so exact-tie handling matches the SQL ``row_number ... ORDER
    BY cosine DESC, id`` contract.
    """
    rows = bench_ds.select_columns([id_col, vec_col]).take_all()
    if len(rows) > bench_max_rows:
        raise ValueError(
            f"benchmark side has {len(rows)} rows > {bench_max_rows}; "
            "a benchmark this large should go through the bucketed "
            "embedding_near_pairs path instead")
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "bench_id": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    if not rows:
        return empty
    rows.sort(key=lambda r: r[id_col])
    b_ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    B = _l2norm(np.array([r[vec_col] for r in rows], dtype=np.float64))
    ref = ray.put((b_ids, B))

    class NearestBench:
        def __init__(self, ref):
            self.b_ids, self.B = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return empty
            X = _l2norm(_to_matrix(batch, vec_col))
            sims = X @ self.B.T
            j = np.argmax(sims, axis=1)
            return pa.table({
                id_col: pc.cast(batch[id_col], pa.int64()),
                "bench_id": pa.array(self.b_ids[j], type=pa.int64()),
                "cosine": pa.array(sims[np.arange(len(j)), j],
                                   type=pa.float64()),
            })

    return ds.map_batches(NearestBench, fn_constructor_args=(ref,),
                          batch_format="pyarrow", batch_size=4096,
                          concurrency=(1, 16), num_cpus=1)


def label_centroid_similarity(ds, dims: int, label_col: str = "label",
                              vec_col: str = "embedding",
                              scale: float = 1e6):
    """Pairwise cosine similarity between per-label centroids — the
    embedding-space analogue of the inter-source trigram matrix
    (collection.source_similarity): which classes/sources occupy the
    same region of embedding space. Cosine is computed over the EXACT
    integer sum vectors from ``label_centroids`` (the n divisor cancels
    out of cosine, so cos(sum_a, sum_b) == cos(mean_a, mean_b)); the
    dot/norm arithmetic runs driver-side in arbitrary-precision Python
    ints over the label-sized centroid table, then ONE float division —
    deterministic, so a SQL oracle (HUGEINT dot/norms) reproduces it
    bit-for-bit. Zero-norm centroids (no direction) are excluded.

    Distributed cost is exactly label_centroids' (per-batch lexsort +
    reduceat partials, shuffle <= labels rows per block); the driver
    touches labels x (dims + 2) integers."""
    import math

    cents = label_centroids(ds, dims, label_col, vec_col, scale)
    rows = sorted(cents.take_all(), key=lambda r: r[label_col])
    sums = [f"s{i}" for i in range(dims)]
    la, lb, cos = [], [], []
    vecs = [(r[label_col], [int(r[s]) for s in sums]) for r in rows]
    norms = {lab: sum(v * v for v in vec) for lab, vec in vecs}
    for i, (a, va) in enumerate(vecs):
        if norms[a] == 0:
            continue
        for b, vb in vecs[i + 1:]:
            if norms[b] == 0:
                continue
            dot = sum(x * y for x, y in zip(va, vb))
            la.append(int(a))
            lb.append(int(b))
            cos.append(dot / (math.sqrt(norms[a]) * math.sqrt(norms[b])))
    return pa.table({"label_a": pa.array(la, pa.int64()),
                     "label_b": pa.array(lb, pa.int64()),
                     "cosine": pa.array(cos, pa.float64())})


def _gather_pair_arrays(pairs) -> tuple[np.ndarray, np.ndarray]:
    """Edges Dataset(a_id, b_id) -> two int64 numpy arrays (driver path;
    callers gate on an edge-count budget before materializing)."""
    batches = list(pairs.select_columns(["a_id", "b_id"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"))
    if not batches:
        e = np.array([], dtype=np.int64)
        return e, e.copy()
    a = np.concatenate(
        [b["a_id"].to_numpy(zero_copy_only=False) for b in batches]
    ).astype(np.int64)
    b_ = np.concatenate(
        [b["b_id"].to_numpy(zero_copy_only=False) for b in batches]
    ).astype(np.int64)
    return a, b_


def _minlabel_prop(a_r: np.ndarray, b_r: np.ndarray, n: int) -> np.ndarray:
    """Pointer-jumping min-label propagation over rank-space edges:
    label[i] = rank of the smallest node in i's connected component
    (the `_semdedup_components_driver` loop, factored for reuse)."""
    label = np.arange(n, dtype=np.int64)
    if len(a_r) == 0:
        return label
    while True:
        lo = np.minimum(label[a_r], label[b_r])
        np.minimum.at(label, a_r, lo)
        np.minimum.at(label, b_r, lo)
        nxt = label[label]
        while not np.array_equal(nxt, label):
            label, nxt = nxt, nxt[nxt]
        if np.array_equal(label[a_r], label[b_r]):
            break
    return label


# size-1 per-worker cache of the broadcast dbscan paint arrays
_DBSCAN_CACHE: dict[bytes, tuple] = {}


def dbscan_embeddings(ds, threshold: float = 0.35, min_pts: int = 3,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      method: str = "auto", components: str = "auto",
                      driver_max_edges: int = 2_000_000,
                      num_partitions: int | None = None):
    """Deterministic DBSCAN over an embedding column with the cosine
    eps-ball (sim >= ``threshold``), Ester et al. 1996 semantics made
    order-independent: a point is CORE if its eps-neighbor count + 1
    (itself) >= ``min_pts``; clusters are connected components of the
    core-core eps-graph labeled by their min core id; a non-core point
    within eps of >= 1 core is a BORDER point assigned the MIN cluster
    label among its core neighbors (classic DBSCAN gives border ties to
    whichever core was scanned first — nondeterministic; min is the
    canonical deterministic choice); everything else is NOISE
    (cluster_id = -1). Emits ``(id, cluster_id, kind)`` for every row.

    Scale shape: eps-pairs come from :func:`embedding_near_pairs`
    (broadcast / exact-blockwise / LSH backends — pairs, never a
    distance matrix, cross the cluster). ``components='driver'`` runs
    degrees + min-label propagation + border mins fully vectorized on
    numpy edge arrays and paints with broadcast ``pc.index_in`` arrays;
    ``'distributed'`` keeps edges a Dataset: partial-count degree
    groupby, core semi-joins, ``connected_components_distributed``
    min-label propagation, border = directed-edges-to-core join +
    groupby min, two left-join paints. ``auto`` switches on the edge
    count at ``driver_max_edges`` (the ``exact.py``/``lsh.py`` idiom).
    """
    import ray
    import ray.data

    pairs = embedding_near_pairs(
        ds, threshold, id_col, vec_col, method).materialize()
    n_edges = pairs.count()
    if components == "auto":
        components = ("driver" if n_edges <= driver_max_edges
                      else "distributed")
    id_type = ds.schema().types[ds.schema().names.index(id_col)]
    kinds = pa.array(["core", "border", "noise"], pa.string())
    # a pair-less row has 1 eps-neighbor (itself): core iff min_pts <= 1
    lone_cluster = 0 if min_pts <= 1 else -1  # 0 = "own id" sentinel
    lone_kind = 0 if min_pts <= 1 else 2

    if n_edges == 0 or components == "driver":
        a, b = _gather_pair_arrays(pairs)
        nodes, inv = np.unique(np.r_[a, b], return_inverse=True)
        m = len(a)
        a_r, b_r = inv[:m], inv[m:]
        deg = np.bincount(np.r_[a_r, b_r], minlength=len(nodes))
        core = (deg + 1) >= min_pts
        ce = core[a_r] & core[b_r]
        label = _minlabel_prop(a_r[ce], b_r[ce], len(nodes))
        clab = nodes[label]  # min core id per component (core rows only)
        # border: min core-neighbor cluster per non-core node
        blab = np.full(len(nodes), np.iinfo(np.int64).max, dtype=np.int64)
        for src, dst in ((a_r, b_r), (b_r, a_r)):
            sel = core[dst] & ~core[src]
            np.minimum.at(blab, src[sel], clab[dst[sel]])
        cluster = np.where(
            core, clab,
            np.where(blab < np.iinfo(np.int64).max, blab, -1))
        kind_code = np.where(
            core, 0, np.where(blab < np.iinfo(np.int64).max, 1, 2)
        ).astype(np.int64)
        paint_ref = ray.put((nodes, cluster, kind_code))

        def paint(batch: pa.Table) -> pa.Table:
            ck = paint_ref.binary()
            cached = _DBSCAN_CACHE.get(ck)
            if cached is None:
                cached = ray.get(paint_ref)
                _DBSCAN_CACHE.clear()
                _DBSCAN_CACHE[ck] = cached
            node_arr = pa.array(cached[0], type=id_type)
            clus_arr = pa.array(cached[1], type=pa.int64())
            kind_arr = pa.array(cached[2], type=pa.int64())
            ids = batch[id_col].combine_chunks()
            at = pc.index_in(ids, value_set=node_arr)
            lone = pc.is_null(at)
            lone_cl = (ids.cast(pa.int64()) if lone_cluster == 0
                       else pa.array(np.full(len(ids), -1), pa.int64()))
            cluster = pc.if_else(lone, lone_cl, pc.take(clus_arr, at))
            kcode = pc.if_else(
                lone, pa.scalar(lone_kind, pa.int64()),
                pc.take(kind_arr, at))
            return pa.table({id_col: ids,
                             "cluster_id": cluster.cast(pa.int64()),
                             "kind": pc.take(kinds, kcode)})

        return ds.select_columns([id_col]).map_batches(
            paint, batch_format="pyarrow")

    # ---- distributed path: edges stay Datasets end to end ----
    from raydedup.state.unionfind import connected_components_distributed
    from raydedup.util import join_partitions

    def deg_partial(batch: pa.Table) -> pa.Table:
        ids = np.r_[batch["a_id"].to_numpy(zero_copy_only=False),
                    batch["b_id"].to_numpy(zero_copy_only=False)]
        u, c = np.unique(ids, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    deg = (pairs.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").sum("c"))

    def core_only(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(pc.add(batch["sum(c)"], 1), min_pts)
        kept = pc.filter(batch["node"], keep)
        return pa.table({"cnode": kept,
                         "__is_core": pa.array(np.ones(len(kept), np.int8))})

    core_nodes = deg.map_batches(
        core_only, batch_format="pyarrow").materialize()
    n_core = core_nodes.count()
    if num_partitions is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = min(join_partitions(max(n_core, n_edges)),
                             max(2, 2 * ncpu))

    def _sj(left, col, right):
        """inner semi-join: keep left rows whose `col` is in right.cnode
        (flag column projected away so chained joins never stack it)."""
        j = left.join(right, join_type="inner",
                      num_partitions=num_partitions,
                      on=(col,), right_on=("cnode",))
        return j.select_columns(["a_key", "b_key"])

    # Ray 2.49's hash join can't take a fully-EMPTY side (zero blocks
    # reach the aggregator, so the per-partition Arrow join sees a
    # columnless table) — every join below is guarded by a count on its
    # materialized small side, falling back to the closed-form result.
    if n_core == 0:
        clab = None
    else:
        edges = pairs.map_batches(
            lambda b: pa.table({"a_key": b["a_id"], "b_key": b["b_id"]}),
            batch_format="pyarrow")
        cc = _sj(_sj(edges, "a_key", core_nodes),
                 "b_key", core_nodes).materialize()
        if cc.count() == 0:
            # no core-core edge: every core is its own singleton cluster
            clab = core_nodes.map_batches(
                lambda b: pa.table({"cnode": b["cnode"],
                                    "lab": b["cnode"]}),
                batch_format="pyarrow").materialize()
        else:
            comp = connected_components_distributed(
                cc, num_partitions=num_partitions)
            # component min-label; own id for edge-isolated cores
            clab = core_nodes.join(
                comp.map_batches(
                    lambda b: pa.table({"cnode": b["node"],
                                        "lab": b["label"]}),
                    batch_format="pyarrow"),
                join_type="left_outer", num_partitions=num_partitions,
                on=("cnode",)).map_batches(
                    lambda b: pa.table({
                        "cnode": b["cnode"],
                        "lab": pc.coalesce(b["lab"],
                                           b["cnode"].combine_chunks())}),
                    batch_format="pyarrow").materialize()

    if clab is None:
        blab = None
    else:
        # border: directed edges whose DST is core pick up dst's label;
        # groupby-min per src, then drop srcs that are themselves core
        directed = pairs.map_batches(
            lambda b: pa.table({
                "src": pa.concat_arrays(
                    [b["a_id"].combine_chunks().cast(pa.int64()),
                     b["b_id"].combine_chunks().cast(pa.int64())]),
                "dst": pa.concat_arrays(
                    [b["b_id"].combine_chunks().cast(pa.int64()),
                     b["a_id"].combine_chunks().cast(pa.int64())]),
            }), batch_format="pyarrow")
        to_core = directed.join(clab, join_type="inner",
                                num_partitions=num_partitions,
                                on=("dst",), right_on=("cnode",))
        bmin = (to_core.select_columns(["src", "lab"])
                .groupby("src").min("lab"))
        blab = bmin.join(
            core_nodes, join_type="left_outer",
            num_partitions=num_partitions, on=("src",),
            right_on=("cnode",)
        ).map_batches(
            lambda b: (lambda keep: pa.table({
                "bnode": pc.filter(b["src"], keep),
                "blab": pc.filter(b["min(lab)"], keep)}))(
                    pc.is_null(b["__is_core"])),
            batch_format="pyarrow")

    def _attach(left, side, colname: str):
        """left_outer-join `side` ({id, colname}) onto `left`, or append
        an all-null column when the side is empty/absent (see above)."""
        side = side.materialize() if side is not None else None
        if side is None or side.count() == 0:
            return left.map_batches(
                lambda b: b.append_column(
                    colname, pa.nulls(b.num_rows, pa.int64())),
                batch_format="pyarrow")
        return left.join(side, join_type="left_outer",
                         num_partitions=num_partitions, on=(id_col,))

    clab_side = clab.map_batches(lambda b: pa.table(
        {id_col: b["cnode"].cast(id_type),
         "__clab": b["lab"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow") if clab is not None else None
    blab_side = blab.map_batches(lambda b: pa.table(
        {id_col: b["bnode"].cast(id_type),
         "__blab": b["blab"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow") if blab is not None else None
    out = _attach(_attach(ds.select_columns([id_col]), clab_side,
                          "__clab"), blab_side, "__blab")

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], id_type),
                             "cluster_id": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.string())})
        ids = batch[id_col].combine_chunks()
        cl = batch["__clab"].combine_chunks().cast(pa.int64())
        bl = batch["__blab"].combine_chunks().cast(pa.int64())
        lone_cl = (ids.cast(pa.int64()) if lone_cluster == 0
                   else pa.array(np.full(len(ids), -1), pa.int64()))
        cluster = pc.coalesce(cl, bl, lone_cl)
        kcode = pc.if_else(
            pc.is_valid(cl), pa.scalar(0, pa.int64()),
            pc.if_else(pc.is_valid(bl), pa.scalar(1, pa.int64()),
                       pa.scalar(lone_kind, pa.int64())))
        return pa.table({id_col: ids, "cluster_id": cluster,
                         "kind": pc.take(kinds, kcode)})

    return out.map_batches(finish, batch_format="pyarrow")


def kcenter_select(ds, k: int = 8, dims: int = 64, id_col: str = "vec_id",
                   vec_col: str = "embedding", scale: float = 1e6):
    """k-center greedy coreset / diversity selection (Gonzalez 1985
    farthest-point traversal; coreset-based data selection per Sener &
    Savarese 2018): seed with the min id, then k-1 times select the row
    FARTHEST from the selected set (max over rows of min squared
    euclidean distance to any selected center, ties -> min id). The
    training-data use is picking a small maximally-diverse exemplar set
    (dedup's complement: instead of dropping redundancy, choose the
    spanning skeleton).

    Exactness contract (shared with the SQL oracle): vectors quantize
    to round-half-away(v * scale) int64 (the ``prototype_prune``
    contract) and every distance is an exact int64 sum, so the argmax
    and its min-id tie-break are bit-reproducible; the oracle replays
    the whole traversal with a recursive CTE. Returns ``(id, rank)``
    for the k selected rows, rank = selection order 1..k.

    Scale shape (100-TB design): iterative by construction — k rounds,
    each ONE streaming tighten pass (per-row running min-dist² against
    the single newly-selected center: 64 ints riding the closure) +
    ONE argmax-partial pass emitting a single row per block (max d2,
    tie-min id, and that row's packed vector — so the driver never
    fetches a row by id). The quantized Dataset re-materializes once
    per round (bounded lineage); only block-count rows reach the
    driver per round. k is small by use-case (a coreset << corpus);
    per-batch overflow is guarded like ``prototype_prune``.
    """
    from raydedup.util import round_half_away

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def quantize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                id_col: batch[id_col] if id_col in batch.column_names
                else pa.array([], pa.int64()),
                "__q": pa.array([], pa.binary(dims * 8)),
                "__d2": pa.array([], pa.int64())})
        M = _to_matrix(batch, vec_col)
        Q = round_half_away(M.astype(np.float64) * scale).astype(np.int64)
        # int64 packed through the float64 pack helper — same 8-byte
        # lanes, bit-exact round trip via .view()
        return pa.table({
            id_col: batch[id_col],
            "__q": _pack_matrix(Q.view(np.float64)),
            "__d2": pa.array(np.full(batch.num_rows, np.iinfo(np.int64).max,
                                     dtype=np.int64)),
        })

    state = ds.select_columns([id_col, vec_col]).map_batches(
        quantize, batch_format="pyarrow").materialize()
    n = state.count()
    if n == 0:
        import ray.data
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64())}))
    k = min(k, n)

    def block_best(batch: pa.Table) -> pa.Table:
        """one row per block: the (max d2, tie min id) candidate."""
        empty = pa.table({id_col: batch[id_col].slice(0, 0),
                          "__q": pa.array([], pa.binary(dims * 8)),
                          "__d2": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        d2 = batch["__d2"].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        live = d2 >= 0
        if not live.any():
            return empty
        order = np.lexsort((ids[live], -d2[live]))
        at = np.flatnonzero(live)[order[0]]
        return batch.take(pa.array([at]))

    def tighten(center: np.ndarray, sel_id) -> "callable":
        def fn(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            Q = _unpack_matrix(batch["__q"]).view(np.int64)
            maxq = int(np.abs(Q).max(initial=0))
            maxc = int(np.abs(center).max(initial=0))
            if dims * (maxq + maxc) ** 2 >= 2 ** 63:
                raise OverflowError(
                    "kcenter_select: quantized magnitudes overflow int64 "
                    f"distance (max|q|={maxq}, max|c|={maxc}); lower scale")
            diff = Q - center[None, :]
            nd2 = np.einsum("ij,ij->i", diff, diff)
            d2 = np.minimum(batch["__d2"].to_numpy(zero_copy_only=False),
                            nd2)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            d2 = np.where(ids == sel_id, np.int64(-1), d2)
            return batch.set_column(
                batch.schema.get_field_index("__d2"), "__d2",
                pa.array(d2, pa.int64()))
        return fn

    # round 1: seed = global min id (argmax over the +inf d2 column ties
    # every row, so block_best's min-id tie-break IS the seed rule)
    picked: list = []
    for rank in range(1, k + 1):
        cands = state.map_batches(block_best,
                                  batch_format="pyarrow").take_all()
        best = min(cands, key=lambda r: (-int(r["__d2"]), r[id_col]))
        center = np.frombuffer(best["__q"], dtype=np.int64).copy()
        picked.append(best[id_col])
        if rank < k:
            state = state.map_batches(
                tighten(center, best[id_col]),
                batch_format="pyarrow").materialize()

    import ray.data
    id_type = state.schema().types[state.schema().names.index(id_col)]
    return ray.data.from_arrow(pa.table({
        id_col: pa.array(picked, id_type),
        "rank": pa.array(np.arange(1, k + 1), pa.int64())}))
