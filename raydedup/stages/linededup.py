"""Line-level corpus deduplication (the C4 / MassiveText / FineWeb
line-dedup recipe, public descriptions: Raffel et al. 2020 §2.2 "we
discard ... any line that occurred more than once"; Penedo et al. 2024):
a line whose EXACT content occurs in >= ``min_docs`` distinct documents
is removed from every document; survivors are re-joined in original
line order. Complements the doc-granularity tiers (``pipelines/tiered``)
— boilerplate headers/footers duplicate at line level long before whole
documents do.

Scale shape (100-TB design):
- lines never shuffle as text: the count pass pre-aggregates per-batch
  DISTINCT (doc, line-hash) pairs and shuffles only (hash, partial
  count) rows; blake2b-64 line hashes make collisions negligible and
  the comparison contract is documented in the oracle;
- the duplicated-line set (far smaller than the line universe) is
  broadcast once via ``ray.put`` below ``driver_max`` entries — above
  it the rewrite switches to a distributed hash join over exploded
  (doc, idx, line) rows plus the ``assemble_by_key`` ordered
  reassembly sweep (``method='join'``), so nothing corpus-scale ever
  lands on the driver;
- the broadcast rewrite is ONE streaming ``map_batches`` over the
  original docs (split → mask → in-batch rejoin): a doc's lines never
  leave its batch, so there is no reassembly shuffle at all.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from raydedup.util import join_partitions

_LD_CACHE: dict = {}


def _line_hashes(flat: pa.Array) -> np.ndarray:
    """string array → uint64 blake2b-64 per element; hashed once per
    DISTINCT value (dictionary_encode collapses boilerplate repeats)."""
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64)
    enc = pc.dictionary_encode(flat)
    uniq = np.fromiter(
        (int.from_bytes(
            hashlib.blake2b(u.encode("utf-8"), digest_size=8).digest(),
            "big")
         for u in enc.dictionary.to_pylist()),
        dtype=np.uint64, count=len(enc.dictionary))
    return uniq[enc.indices.to_numpy(zero_copy_only=False)]


def _split_lines(batch: pa.Table, text_col: str, sep: str = "\n"):
    """batch → (ListArray of lines, flat line values, docidx, lens)."""
    lists = pc.split_pattern(
        pc.fill_null(batch[text_col].combine_chunks(), ""), pattern=sep)
    lists = lists.combine_chunks() if isinstance(
        lists, pa.ChunkedArray) else lists
    flat = lists.values
    offs = lists.offsets.to_numpy(zero_copy_only=False)
    lens = np.diff(offs).astype(np.int64)
    docidx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
    return lists, flat, docidx, lens


def _count_partials(text_col: str, sep: str = "\n"):
    """per-batch partial: DISTINCT (doc, line-hash) collapsed to
    (h, c) rows — sum of c across batches = distinct-doc frequency
    (each doc's lines live in exactly one batch). Empty lines are
    never counted (and thus never removed)."""

    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({"h": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        _, flat, docidx, _ = _split_lines(batch, text_col, sep)
        nonempty = pc.not_equal(flat, pa.scalar("")).to_numpy(
            zero_copy_only=False)
        h = _line_hashes(flat)[nonempty]
        d = docidx[nonempty]
        if h.size == 0:
            return empty
        order = np.lexsort((h, d))
        hs, ds_ = h[order], d[order]
        first = np.r_[True, (ds_[1:] != ds_[:-1]) | (hs[1:] != hs[:-1])]
        hu, cnt = np.unique(hs[first], return_counts=True)
        return pa.table({"h": pa.array(hu.view(np.int64)),
                         "c": pa.array(cnt.astype(np.int64))})

    return fn


def _dup_hashes(ds, text_col: str, min_docs: int, sep: str = "\n"):
    """docs → materialized Dataset (h,) of duplicated line hashes."""
    from ray.data.aggregate import Sum

    partials = ds.select_columns([text_col]).map_batches(
        _count_partials(text_col, sep), batch_format="pyarrow")
    counts = partials.groupby("h").aggregate(Sum("c", alias_name="nd"))
    return counts.filter(expr=f"nd >= {int(min_docs)}").select_columns(
        ["h"]).materialize()


def line_dedup(ds, min_docs: int = 2, id_col: str = "doc_id",
               text_col: str = "text", method: str = "auto",
               driver_max: int = 5_000_000,
               num_partitions: int | None = None, sep: str = "\n"):
    """docs → ``(id, text, n_lines, n_removed)``: ``text`` keeps only
    lines occurring in fewer than ``min_docs`` distinct docs (empty
    lines always survive), re-joined by ``sep`` in original order; a doc
    whose every line is removed keeps its row with ``text=''``.
    ``sep`` picks the granularity: ``"\\n"`` (default) = C4 line dedup,
    ``"\\n\\n"`` = paragraph dedup, ``". "`` = sentence-ish dedup.

    ``method``: 'broadcast' (dup-hash set via ``ray.put``, one-pass
    in-batch rewrite), 'join' (distributed — exploded lines hash-join
    the dup set, ordered reassembly sweep), or 'auto' (switch on
    ``driver_max`` dup entries).
    """
    sch = ds.schema()
    id_type = (dict(zip(sch.names, sch.types))[id_col]
               if sch is not None and id_col in sch.names else pa.int64())
    out_schema = pa.schema([
        pa.field(id_col, id_type), pa.field(text_col, pa.string()),
        pa.field("n_lines", pa.int64()), pa.field("n_removed", pa.int64()),
    ])
    docs = ds.select_columns([id_col, text_col]).materialize()
    if docs.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    dup = _dup_hashes(docs, text_col, min_docs, sep)
    n_dup = dup.count()
    if method == "auto":
        method = "broadcast" if n_dup <= driver_max else "join"
    if n_dup == 0:
        method = "broadcast"  # identical output; dodges an empty-side join

    if method == "broadcast":
        if n_dup:
            harr = np.sort(np.concatenate([
                b["h"].to_numpy(zero_copy_only=False)
                for b in dup.iter_batches(batch_size=1 << 20,
                                          batch_format="pyarrow")
            ]).view(np.uint64))
        else:
            harr = np.empty(0, dtype=np.uint64)
        href = ray.put(harr)

        def rewrite(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return out_schema.empty_table()
            key = href.binary()
            hot = _LD_CACHE.get(key)
            if hot is None:
                hot = ray.get(href)
                _LD_CACHE.clear()
                _LD_CACHE[key] = hot
            _, flat, docidx, lens = _split_lines(batch, text_col, sep)
            h = _line_hashes(flat)
            if hot.size:
                at = np.clip(np.searchsorted(hot, h), 0, hot.size - 1)
                keep = hot[at] != h
            else:
                keep = np.ones(h.size, dtype=bool)
            kept_lens = np.bincount(docidx[keep],
                                    minlength=batch.num_rows).astype(
                                        np.int64)
            offs = np.zeros(batch.num_rows + 1, dtype=np.int64)
            np.cumsum(kept_lens, out=offs[1:])
            kept_list = pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()),
                flat.filter(pa.array(keep)))
            return pa.table({
                id_col: batch[id_col],
                text_col: pc.binary_join(kept_list, pa.scalar(sep)),
                "n_lines": pa.array(lens),
                "n_removed": pa.array(lens - kept_lens),
            })

        return docs.map_batches(rewrite, batch_format="pyarrow")

    # ---- distributed join path ----
    from ray.data.aggregate import Count, Sum

    from raydedup.stages.ordered import assemble_by_key

    exploded_schema = pa.schema([
        pa.field(id_col, id_type), pa.field("idx", pa.int64()),
        pa.field("line", pa.string()), pa.field("h", pa.int64()),
    ])

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return exploded_schema.empty_table()
        _, flat, docidx, lens = _split_lines(batch, text_col, sep)
        idx = (np.arange(len(flat), dtype=np.int64)
               - np.repeat(np.cumsum(np.r_[0, lens[:-1]]), lens))
        return pa.table({
            id_col: pc.take(batch[id_col].combine_chunks(),
                            pa.array(docidx)),
            "idx": pa.array(idx),
            "line": flat,
            "h": pa.array(_line_hashes(flat).view(np.int64)),
        })

    exploded = docs.map_batches(explode,
                                batch_format="pyarrow").materialize()
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_parts = num_partitions or min(join_partitions(max(n_dup, 1)),
                                    max(2, 2 * ncpu))

    def mark(batch: pa.Table) -> pa.Table:
        return pa.table({"h": batch["h"],
                         "__dup": pa.array(np.ones(batch.num_rows,
                                                   dtype=np.int8))})

    dup_marked = dup.map_batches(mark, batch_format="pyarrow")
    joined = exploded.join(dup_marked, join_type="left_outer",
                           num_partitions=n_parts, on=("h",))

    def keep_unmarked(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_null(batch["__dup"]))
        return t.select([id_col, "idx", "line"])

    kept = joined.map_batches(keep_unmarked,
                              batch_format="pyarrow").materialize()

    assembled = assemble_by_key(kept, by=id_col, order_cols=["idx"],
                                text_col="line", sep=sep, out="__text")
    n_kept = kept.groupby(id_col).aggregate(Count(alias_name="__nk"))
    base = exploded.groupby(id_col).aggregate(Count(alias_name="n_lines"))

    jp = min(join_partitions(docs.count()), max(2, 2 * ncpu))
    out = base.join(assembled, join_type="left_outer",
                    num_partitions=jp, on=(id_col,))
    out = out.select_columns([id_col, "n_lines", "__text"]).join(
        n_kept, join_type="left_outer", num_partitions=jp, on=(id_col,))

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        nk = pc.coalesce(batch["__nk"], pa.scalar(0, pa.int64()))
        return pa.table({
            id_col: batch[id_col],
            text_col: pc.coalesce(batch["__text"], pa.scalar("")),
            "n_lines": batch["n_lines"],
            "n_removed": pc.subtract(batch["n_lines"], nk),
        })

    final = out.map_batches(finish, batch_format="pyarrow")
    return final.union(ray.data.from_arrow(out_schema.empty_table()))


def self_line_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                    sep: str = "\n"):
    """WITHIN-document repeated-line removal: keep the FIRST occurrence
    of each distinct line inside a document, drop its later repeats,
    re-join survivors in original order. The within-doc counterpart of
    :func:`line_dedup` (which removes lines duplicated ACROSS >=
    min_docs documents) — this one targets templated pages whose OWN
    sections repeat (nav blocks, retry loops in agent transcripts,
    scraper stutter), the "deduplicate lines within a page" step of
    C4-style cleaning (Raffel et al. 2020 §2.2).

    Scale shape (100-TB design): ZERO shuffle — a document's lines never
    leave its batch. One streaming ``map_batches`` does split →
    first-occurrence mask (one stable lexsort over (doc, line-code);
    dictionary codes, never text comparisons) → in-batch ListArray
    regroup + ``binary_join``. Output one row per input doc:
    ``(id, text, n_lines, n_removed)``. Empty lines dedup like any
    other line (the first '' survives, later '' repeats drop).
    """
    out_schema = pa.schema([
        pa.field(id_col, pa.int64()), pa.field(text_col, pa.string()),
        pa.field("n_lines", pa.int64()), pa.field("n_removed", pa.int64()),
    ])

    def rewrite(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        lists = pc.split_pattern(
            pc.fill_null(batch[text_col].combine_chunks(), ""),
            pattern=sep)
        lists = lists.combine_chunks() if isinstance(
            lists, pa.ChunkedArray) else lists
        offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off0 = int(offs[0])
        flat = lists.values.slice(off0, int(offs[-1]) - off0)
        lens = np.diff(offs)
        docidx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        codes = pc.dictionary_encode(flat).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        # stable lexsort => within equal (doc, code) original position
        # ascending; first-of-run = the occurrence to keep
        order = np.lexsort((codes, docidx))
        d_s, c_s = docidx[order], codes[order]
        first = np.r_[True, (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])]
        keep = np.zeros(len(docidx), dtype=bool)
        keep[order[first]] = True
        kept_flat = flat.filter(pa.array(keep))
        nk = np.bincount(docidx[keep], minlength=batch.num_rows)
        k_offs = np.r_[0, np.cumsum(nk)].astype(np.int32)
        text2 = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(k_offs, pa.int32()),
                                     kept_flat),
            pa.scalar(sep))
        return pa.table({
            id_col: batch[id_col],
            text_col: text2.cast(pa.string()),
            "n_lines": pa.array(lens, pa.int64()),
            "n_removed": pa.array(lens - nk, pa.int64()),
        })

    return (ds.select_columns([id_col, text_col])
            .map_batches(rewrite, batch_format="pyarrow")
            .union(ray.data.from_arrow(out_schema.empty_table())))
