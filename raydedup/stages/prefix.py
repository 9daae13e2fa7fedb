"""Prefix (boilerplate-head) duplicate grouping — documents sharing an
identical first-``w``-token normalized prefix collapse into one group
(cluster id = min doc id). This is the near-exact dedup pass web-scale
curation pipelines run between exact-sha dedup and MinHash: crawl
mirrors and template farms share long constant heads while tails
differ, so full-text equality misses them and shingle Jaccard pays for
what a bounded prefix key already decides. [Reference parity: OTMT's
exact-match path compares whole tokenized texts
(``otmt/timemap_measures.py``); this is that idea keyed on the
tokenized head instead of the full body.]

Scale shape: one vectorized batch pass (RE2 split + integer rank
selection + ``binary_join`` — no per-row Python) derives the bounded
(≤ ``w`` tokens) prefix key; the shuffle then moves only
``(id, prefix)`` rows hash-partitioned by prefix, and each partition
resolves its groups with one C++ ``Table.group_by`` plus an
``index_in`` paint. No corpus-scale driver state; the group key is
size-bounded, so the only skew is a genuinely hot prefix, which lands
in one partition and costs O(rows in that partition).

Token contract: the repo-wide ASCII RE2 rule — split the lowercased
text on ``[^0-9a-z_]+`` and drop empties — the exact complement of the
oracle's ``regexp_extract_all(lower(text), '[0-9a-z_]+')`` (see
``textstats._doc_term_codes``). Null texts count as empty (all-empty
prefixes group together like any other shared head).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.stages.asof import _part_array


def _prefix_batch(batch: pa.Table, id_col: str, text_col: str,
                  w: int) -> pa.Table:
    """(id, text) rows → (id, prefix) with prefix = first ``w`` tokens
    joined by a single space. Entirely Arrow/numpy: one RE2 split, one
    bincount rank selection, one ``binary_join``."""
    def _arr(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    low = pc.utf8_lower(_arr(pc.fill_null(batch[text_col], "")))
    toks = pc.split_pattern_regex(low, pattern=r"[^0-9a-z_]+")
    lens = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = _arr(pc.list_flatten(toks))
    docidx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    nonempty = pc.not_equal(flat, pa.scalar("")).to_numpy(
        zero_copy_only=False)
    if len(nonempty) and not nonempty.all():
        flat = flat.filter(pa.array(nonempty))
        docidx = docidx[nonempty]
    counts = np.bincount(docidx, minlength=batch.num_rows).astype(
        np.int64)
    starts = np.r_[0, np.cumsum(counts)[:-1]]
    rank = np.arange(len(docidx), dtype=np.int64) - np.repeat(
        starts, counts)
    sel = rank < w
    if len(sel) and not sel.all():
        flat = flat.filter(pa.array(sel))
    newlens = np.minimum(counts, w)
    offsets = pa.array(np.r_[0, np.cumsum(newlens)].astype(np.int64))
    lists = pa.LargeListArray.from_arrays(
        offsets, _arr(pc.cast(flat, pa.large_string())))
    pref = pc.cast(
        pc.binary_join(lists, pa.scalar(" ", pa.large_string())),
        pa.string())
    return pa.table({id_col: batch[id_col], "prefix": pref})


def prefix_dup_groups(ds, id_col: str = "doc_id",
                      text_col: str = "text", w: int = 10,
                      num_partitions: int = 64):
    """→ one row per document whose first-``w``-token prefix is shared
    by ≥ 2 documents: ``(id_col, cluster_id)`` with cluster id = min
    id over the group (ties impossible — ids are unique)."""
    schema = ds.schema()
    id_type = dict(zip(schema.names, schema.types))[id_col]
    empty = pa.table({id_col: pa.array([], id_type),
                      "cluster_id": pa.array([], id_type)})

    def tag(batch: pa.Table) -> pa.Table:
        t = _prefix_batch(batch, id_col, text_col, w)
        return t.append_column(
            "__part", _part_array(t["prefix"], num_partitions))

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__part" not in g.column_names:
            return empty
        agg = (pa.table({"prefix": g["prefix"], id_col: g[id_col]})
               .group_by("prefix")
               .aggregate([(id_col, "min"), (id_col, "count")]))
        keep = agg.filter(
            pc.greater_equal(agg[f"{id_col}_count"], pa.scalar(2)))
        if keep.num_rows == 0:
            return empty
        idx = pc.index_in(g["prefix"].combine_chunks(),
                          value_set=keep["prefix"].combine_chunks())
        mask = pc.is_valid(idx)
        return pa.table({
            id_col: g[id_col].filter(mask),
            "cluster_id": keep[f"{id_col}_min"].take(idx.filter(mask)),
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__part").map_groups(merge,
                                          batch_format="pyarrow"))
