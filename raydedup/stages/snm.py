"""Sorted-neighborhood candidate generation (Hernández & Stolfo,
SIGMOD 1995; blocked multi-pass variant per Kolb et al. 2012) — the
third candidate paradigm next to MinHash-LSH (``stages/lsh.py``) and
simhash pigeonhole (``stages/simhash_near.py``): sort records by a
normalized key and compare each record only with its ``window`` sorted
neighbors inside a blocking bucket (bucket = first ``block_chars`` of
the key). Complements LSH where edits keep the document HEAD stable
(boilerplate prefixes, re-crawls with appended footers): those pairs sit
adjacent in sort order regardless of how much tail text changed, which
shingle Jaccard may miss below threshold.

Contract (mirrored exactly by the SQL oracle): rank = row_number within
bucket ordered by (first ``key_chars`` of the normalized key, id as
string); emit (a, b) for every rank gap 1..window. Deterministic — no
hashing, no sampling. The window does NOT cross bucket boundaries: the
standard blocked-SNM tradeoff, recovered in practice by multiple passes
with different key functions (pass a different ``key_fn``).

Scale shape: only (id, ``key_chars``-char sort key) rows shuffle —
never full text (the normalized key is TRUNCATED before the exchange;
that truncation is part of the pair contract, not an approximation of
it). Partitioning is by bucket via the ordered.py partition sweep: one
lexsort per partition handles every bucket, pair emission is ``window``
vectorized shifts. Pair volume is <= window * n BY CONSTRUCTION — a hot
bucket cannot go quadratic, unlike an unsalted LSH bucket.

Reference anchor: the reference compares each memento against its
TimeMap neighbors in datetime order (otmt/timemap_measures.py walks
sorted mementos); SNM is that "compare sorted neighbors" idea lifted to
a content-derived sort key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.stages.asof import _part_array


def _chunked(a):
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def _norm_key(arr) -> pa.Array:
    """textstats.normalize_text's exact kernel chain (lower, strip
    non-alnum, collapse whitespace, trim) — RE2 patterns identical to
    the DuckDB oracle's regexp_replace chain."""
    x = pc.utf8_lower(_chunked(arr))
    x = pc.replace_substring_regex(x, pattern=r"[^0-9a-z\s]",
                                   replacement=" ")
    x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(x)


def sorted_neighborhood_pairs(ds, id_col: str = "doc_id",
                              text_col: str = "text", window: int = 3,
                              block_chars: int = 8, key_chars: int = 64,
                              num_partitions: int = 64,
                              key_fn=_norm_key):
    """Candidate pairs (a_id, b_id, gap): b is within ``window``
    positions after a in the per-bucket sorted order (see module
    docstring for the exact rank contract). Rows whose normalized key
    is empty are excluded (no sort position)."""
    import ray.data

    id_t = ds.schema().types[list(ds.schema().names).index(id_col)]

    def prep(b: pa.Table) -> pa.Table:
        skey = key_fn(b[text_col].combine_chunks())
        t = pa.table({id_col: b[id_col], "__skey": skey})
        t = t.filter(pc.and_(pc.is_valid(t["__skey"]),
                             pc.not_equal(t["__skey"], "")))
        t = t.set_column(
            t.column_names.index("__skey"), "__skey",
            pc.utf8_slice_codeunits(t["__skey"], 0, key_chars))
        bucket = pc.utf8_slice_codeunits(t["__skey"], 0, block_chars)
        t = t.append_column("__bucket", bucket)
        return t.append_column(
            "__part", _part_array(t["__bucket"], num_partitions))

    empty = pa.schema([pa.field("a_id", id_t), pa.field("b_id", id_t),
                       pa.field("gap", pa.int64())]).empty_table()

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__part" not in g.column_names:
            return empty
        ids = _chunked(g[id_col])
        ids_s = pc.cast(ids, pa.string()).to_numpy(zero_copy_only=False)
        skey = _chunked(g["__skey"]).to_numpy(zero_copy_only=False)
        benc = pc.dictionary_encode(_chunked(g["__bucket"]))
        bcodes = benc.indices.to_numpy(zero_copy_only=False)
        # one lexsort for every bucket in the partition: id-string
        # tie-break mirrors the oracle's ORDER BY skey, CAST(id AS
        # VARCHAR). Bucket codes are dictionary indices — arbitrary but
        # consistent within the partition, which is all segmenting needs.
        order = np.lexsort((ids_s, skey, bcodes))
        bs = bcodes[order]
        ia: list[np.ndarray] = []
        ib: list[np.ndarray] = []
        gp: list[np.ndarray] = []
        n = len(order)
        for d in range(1, window + 1):
            if n <= d:
                break
            same = bs[:-d] == bs[d:]
            ia.append(order[:-d][same])
            ib.append(order[d:][same])
            gp.append(np.full(int(same.sum()), d, dtype=np.int64))
        if not ia or not sum(len(x) for x in ia):
            return empty
        ai = pa.array(np.concatenate(ia))
        bi = pa.array(np.concatenate(ib))
        return pa.table({"a_id": ids.take(ai), "b_id": ids.take(bi),
                         "gap": pa.array(np.concatenate(gp))})

    out = (ds.map_batches(prep, batch_format="pyarrow")
           .groupby("__part").map_groups(merge, batch_format="pyarrow")
           .materialize())
    if out.count() == 0:
        return ray.data.from_arrow(empty)
    return out
