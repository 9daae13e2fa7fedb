"""Similarity search over an embedding column (``list<float>``).

- ``knn_brute``: exact cosine top-k per query — the baseline. Queries are
  a SMALL side: collected once, L2-normalized, broadcast via ``ray.put``;
  each batch does one float64 matmul against the broadcast matrix and
  emits only its LOCAL top-k per query, so the final per-query merge
  (groupby + take-k) shuffles k·Q·num_batches rows, not n·Q.
- ``embedding_near_pairs``: all-pairs cosine >= t near-duplicate pairs,
  with the full (small) matrix broadcast and each batch matmul'd against
  it — the embedding-cosine near-dup operator. Scale path: random
  hyperplane LSH bucketing (``rp_bucket``) to confine comparisons to
  buckets, same verify kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

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


def knn_brute(ds, query_ids: list[int], k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding"):
    """→ Dataset(query_id, neighbor_id, cosine, rank) — exact top-k by
    cosine, ties broken by neighbor_id ascending; self-matches excluded."""
    qset = set(int(q) for q in query_ids)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        mask = np.isin(ids, list(qset))
        return batch.filter(pa.array(mask))

    q_rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    order = np.argsort(q_ids)
    q_ids = q_ids[order]
    Q = _l2norm(np.array([q_rows[i][vec_col] for i in order], dtype=np.float64))
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

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partial.groupby("query_id").map_groups(final_topk,
                                                  batch_format="pandas")


def embedding_near_pairs(ds, threshold: float = 0.95,
                         id_col: str = "vec_id", vec_col: str = "embedding"):
    """All-pairs cosine >= threshold (a_id < b_id). The full normalized
    matrix is broadcast once (embeddings are the small side relative to
    text); per-batch work is one matmul + threshold mask."""
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
