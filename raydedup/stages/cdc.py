"""Content-defined chunking (CDC) duplicate statistics — the storage-
dedup paradigm (Muthitacharoen et al. 2001, LBFS; Rabin fingerprinting)
applied to corpus text: cut every document at positions where a rolling
hash of the trailing ``w`` code points is 0 mod ``div``, then count how
much of each document's chunk content recurs in OTHER documents.
Because boundaries depend only on local content, an inserted prefix or
edit re-synchronizes after at most one chunk — the SHIFT-ROBUST
duplicate signal that fixed-stride chunking (``textstats.chunk_text``)
and line dedup (newline-anchored) both miss.

Hash contract (shared with the SQL oracle, which replays it with LAG
windows): code(ch) = unicode(ch) % 251; h_i = sum_{j=0..w-1}
code(ch_{i-j}) * 256^j; position i (0-based) is a boundary iff
i >= w-1 and h_i % div == 0; a boundary ENDS its chunk (the boundary
char is the chunk's last). Chunk identity engine-side is blake2b-64
over the chunk's UTF-32 code points — the oracle compares chunk
strings; collisions are negligible at any testable scale (the
``linededup`` contract).

Scale shape (100-TB design): a document's chars never leave its batch —
chunking is ONE streaming map_batches (one UTF-32 expand + w vectorized
shift-adds per batch; blake2b once per CHUNK, ~chars/div calls). Only
skinny (id, hash-int64) instance rows shuffle. Distinct-doc counts per
hash reuse the ``linededup`` partial trick (each doc is one input row,
so all its chunks live in one batch — per-batch distinct pairs sum to
the global distinct-doc count). The duplicated-hash set stays a Dataset
joined back to instances (no corpus-scale broadcast), and per-doc stats
come from two counting groupbys over instance rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from raydedup.util import join_partitions


def _chunk_rows(batch: pa.Table, id_col: str, text_col: str,
                w: int, div: int):
    """batch → (chunk_doc_row_idx, chunk_hash int64) numpy pair."""
    texts = pc.fill_null(batch[text_col].combine_chunks(), "").to_pylist()
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                       count=len(texts))
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    joined = "".join(texts)
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    codes = (cps % np.uint32(251)).astype(np.int64)
    starts = np.r_[0, np.cumsum(lens)[:-1]]
    dchar = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    h = np.zeros(total, dtype=np.int64)
    for j in range(min(w, total)):
        h[j:] += codes[:total - j] << (8 * j)
    boundary = (pos >= w - 1) & (h % div == 0)
    # a chunk is a maximal run of chars sharing (doc, boundaries-before)
    run_start = np.r_[True, (dchar[1:] != dchar[:-1]) | boundary[:-1]]
    cs = np.flatnonzero(run_start)
    ce = np.r_[cs[1:], total]
    hashes = np.fromiter(
        (int.from_bytes(
            hashlib.blake2b(cps[s:e].tobytes(), digest_size=8).digest(),
            "big") for s, e in zip(cs, ce)),
        dtype=np.uint64, count=len(cs)).view(np.int64)
    return dchar[cs], hashes


def cdc_dup_stats(ds, w: int = 6, div: int = 32, id_col: str = "doc_id",
                  text_col: str = "text",
                  num_partitions: int | None = None):
    """→ Dataset ``(id, n_chunks, n_dup_chunks)``, one row per input
    row: CDC-chunk every document and count its chunk instances whose
    content also occurs in >= 2 DISTINCT documents (the cross-document
    duplicated-content exposure, chunk-granular and shift-robust).
    Empty documents report ``(0, 0)``. See the module docstring for the
    boundary/hash contract and scale shape.
    """
    from ray.data.aggregate import Sum

    def instances(batch: pa.Table) -> pa.Table:
        empty = pa.table({id_col: batch[id_col].slice(0, 0),
                          "h": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        cd, hs = _chunk_rows(batch, id_col, text_col, w, div)
        if cd.size == 0:
            return empty
        return pa.table({
            id_col: batch[id_col].combine_chunks().take(pa.array(cd)),
            "h": pa.array(hs, pa.int64())})

    inst = (ds.select_columns([id_col, text_col])
            .map_batches(instances, batch_format="pyarrow").materialize())

    # distinct docs per hash: re-chunk from the DOC-per-row input (a
    # row can never split across blocks, unlike the exploded `inst`
    # table whose output blocks slice at target_max_block_size), so
    # per-batch distinct (doc, h) partials sum to the global count
    def nd_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"h": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        d, hs = _chunk_rows(batch, id_col, text_col, w, div)
        if d.size == 0:
            return empty
        order = np.lexsort((hs, d))
        ds_, hs_ = d[order], hs[order]
        first = np.r_[True, (ds_[1:] != ds_[:-1]) | (hs_[1:] != hs_[:-1])]
        hu, cnt = np.unique(hs_[first], return_counts=True)
        return pa.table({"h": pa.array(hu, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64))})

    sch = ds.schema()
    id_type = (sch.types[sch.names.index(id_col)]
               if sch is not None and id_col in sch.names else pa.int64())
    # legitimately-empty intermediates lose their schema; union a typed
    # empty block so the joins/groupbys below keep their key columns
    dup = (ds.select_columns([id_col, text_col])
           .map_batches(nd_partial, batch_format="pyarrow")
           .groupby("h").aggregate(Sum("c", alias_name="nd"))
           .filter(expr="nd >= 2").select_columns(["h"])
           .union(ray.data.from_arrow(pa.schema(
               [pa.field("h", pa.int64())]).empty_table()))
           .materialize())

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    # hash-join actor pools are sized to num_partitions and hold their
    # slot while waiting for input; the FINAL plan chains TWO id-joins,
    # so size each by its own input — the (id)-joins see doc-count rows,
    # not instance rows. Sizing both by the instance count put
    # 2 × 33 join actors on 32 CPUs and deadlocked the streaming
    # executor at sf0.1 (observed: every worker blocked in ray.get).
    n_docs = ds.count()
    # a join's partition-actor pool must leave at least one CPU for the
    # upstream producer tasks, or the plan starves (observed: 2 join
    # actors on 2 CPUs never receive input)
    jp = num_partitions or min(join_partitions(max(inst.count(), 1)),
                               max(1, ncpu - 1))
    jp_id = num_partitions or min(join_partitions(max(n_docs, 1)),
                                  max(1, ncpu // 2))

    from ray.data.aggregate import Count

    empty_counts = pa.schema([pa.field(id_col, id_type),
                              pa.field("n_chunks", pa.int64())])
    # materialized: an Aggregate (all-to-all) and a JoinOperator in one
    # streaming plan starve each other below ~4 CPUs (both reserve
    # slots up front); the barrier table is doc-count-sized
    n_chunks = inst.groupby(id_col).aggregate(
        Count(alias_name="n_chunks")).union(
            ray.data.from_arrow(empty_counts.empty_table())).materialize()
    empty_dups = pa.schema([pa.field(id_col, id_type),
                            pa.field("n_dup_chunks", pa.int64())])
    if dup.count() == 0:
        # Ray 2.49 joins reject an all-empty right side — and there is
        # nothing to join anyway
        n_dup = ray.data.from_arrow(empty_dups.empty_table())
    else:
        dup_inst = inst.join(dup, join_type="inner", num_partitions=jp,
                             on=("h",))
        # materialized: every hash-join actor pool in ONE streaming plan
        # pins its slots while waiting for input, so two joins in one
        # plan deadlock whenever their pools together reach the CPU
        # count (observed at both 32 and 2 CPUs). One join per
        # execution; the barrier tables are doc-count-sized.
        n_dup = dup_inst.groupby(id_col).aggregate(
            Count(alias_name="n_dup_chunks")).union(
                ray.data.from_arrow(empty_dups.empty_table())).materialize()

    def attach(left, right, col):
        """left ⋈ right, tolerating an all-empty right side (Ray 2.49
        joins reject it): paint an all-null column instead."""
        if right.count() == 0:
            def add_null(batch: pa.Table) -> pa.Table:
                return batch.append_column(
                    col, pa.nulls(batch.num_rows, pa.int64()))
            return left.map_batches(add_null, batch_format="pyarrow")
        return left.join(right, join_type="left_outer",
                         num_partitions=jp_id, on=(id_col,))

    base = ds.select_columns([id_col])
    out = attach(base, n_chunks, "n_chunks").materialize()
    out = attach(out, n_dup, "n_dup_chunks")

    def finish(batch: pa.Table) -> pa.Table:
        z = pa.scalar(0, pa.int64())
        return pa.table({
            id_col: batch[id_col],
            "n_chunks": pc.coalesce(
                pc.cast(batch["n_chunks"], pa.int64()), z),
            "n_dup_chunks": pc.coalesce(
                pc.cast(batch["n_dup_chunks"], pa.int64()), z),
        })

    out_schema = pa.schema([
        pa.field(id_col, id_type), pa.field("n_chunks", pa.int64()),
        pa.field("n_dup_chunks", pa.int64())])
    return (out.map_batches(finish, batch_format="pyarrow")
            .union(ray.data.from_arrow(out_schema.empty_table())))
