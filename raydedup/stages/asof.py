"""As-of join and range (interval) join — the temporal joins Ray Data
lacks, composed from union + hash-partitioned groupby + vectorized
sweeps (the task brief names both as custom operators to build).

Shape: both sides are normalised to one schema (shared ``by``/time sort
columns + side tag + each side's payload columns, right's renamed with a
suffix), unioned, hash-partitioned by ``hash(by) % num_partitions``, and
merged one PARTITION at a time — the per-partition sweep handles every
``by`` group in the partition with one lexsort (group-code-major), so
the cost per *group* is O(1) numpy work, not a Python ``map_groups``
call. At 100 TB with millions of keys this is the difference between
``num_partitions`` vectorized merges and millions of per-group calls.

Partitioning assumption (documented per the brief): one hash PARTITION
(not one group) fits in a worker; raise ``num_partitions`` to shrink
partitions. A single pathological hot key still lands in one partition —
a secondary time-bucket split with boundary carry-over would be the next
step; not implemented.

Tie semantics (asof): at equal ``on`` the right row still matches
(inclusive); among right rows sharing the same ``on`` value, the one
with the greatest ``tie_col`` wins (deterministic across
partitionings). With ``tie_col=None`` equal-``on`` right rows are
ordered arbitrarily. Null ``on`` values are not supported (raised).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _part_array(col: pa.ChunkedArray, num_partitions: int) -> pa.Array:
    """Stable partition id per row: int keys use ``% P`` (numpy keeps
    Python modulo semantics, so negatives land in range); other types
    hash the utf-8 repr with md5 (process-stable, unlike ``hash()``).
    Null keys land in partition 0 — they never match (SQL semantics,
    enforced in the merge), any placement works."""
    if pa.types.is_integer(col.type):
        knp = pc.fill_null(col, 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.array(knp % num_partitions, type=pa.int64())
    import hashlib

    return pa.array(
        [0 if k is None else
         int.from_bytes(hashlib.md5(str(k).encode()).digest()[:4], "big")
         % num_partitions for k in col.to_pylist()],
        type=pa.int64())


def _group_codes(col) -> tuple[np.ndarray, np.ndarray]:
    """(codes, is_null) per row for a (chunked) key column — group
    identity within a partition; any code order works, groups only need
    to be contiguous after sorting by code. Null keys share code -1 but
    are flagged so the merges can exclude them from matching (SQL join
    semantics: NULL keys never match, not even each other)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    isnull = pc.is_null(arr).to_numpy(zero_copy_only=False)
    idx = pc.fill_null(pc.dictionary_encode(arr).indices, -1)
    return idx.to_numpy(zero_copy_only=False).astype(np.int64), isnull


def _pad0(n: int, t: pa.DataType) -> pa.Array:
    """All-zeros column of a numeric/temporal type — padding for sort-key
    slots of the opposite side. Nulls would decay int64 to float64 in
    ``to_numpy`` (silently corrupting values above 2^53); the padded
    values are never read, only carried through the lexsort."""
    return pc.cast(pa.array(np.zeros(n, dtype=np.int64)), t)


def asof_join(left, right, by: str, on: str, rsuffix: str = "r_",
              tie_col: str | None = None, num_partitions: int = 64):
    """Backward (inclusive) as-of join of two Datasets. Emits every left
    row with its left columns plus the matched right row's non-``by``
    columns renamed ``rsuffix + name`` (nulls when the key has no right
    row at or before the left row's ``on``)."""
    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c != by]
    rtypes = {c: rschema.types[rschema.names.index(c)] for c in rschema.names}
    ltypes = {c: lschema.types[lschema.names.index(c)] for c in lcols}
    out_rcols = [rsuffix + c for c in rcols]
    if set(out_rcols) & set(lcols):
        raise ValueError(f"suffix {rsuffix!r} collides with left columns")
    if tie_col is not None and tie_col not in rcols:
        raise ValueError(f"tie_col {tie_col!r} not a right column")

    def norm_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {by: batch[by], "__on": batch[on].combine_chunks(),
                "__side": pa.array(np.ones(n, dtype=np.int8)),
                "__tie": _pad0(n, rtypes[tie_col]) if tie_col else
                pa.array(np.zeros(n, dtype=np.int8)),
                "__part": _part_array(batch[by], num_partitions)}
        for c in lcols:
            if c not in (by, on):
                cols[c] = batch[c]
        for c, oc in zip(rcols, out_rcols):
            cols[oc] = pa.nulls(n, rtypes[c])
        return pa.table(cols)

    def norm_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {by: batch[by], "__on": batch[on].combine_chunks(),
                "__side": pa.array(np.zeros(n, dtype=np.int8)),
                "__tie": batch[tie_col] if tie_col else
                pa.array(np.zeros(n, dtype=np.int8)),
                "__part": _part_array(batch[by], num_partitions)}
        for c in lcols:
            if c not in (by, on):
                cols[c] = pa.nulls(n, ltypes[c])
        for c, oc in zip(rcols, out_rcols):
            cols[oc] = batch[c]
        return pa.table(cols)

    out_names = lcols + out_rcols

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__side" not in g.column_names:
            return pa.table({c: pa.array([], ltypes.get(
                c, rtypes.get(c[len(rsuffix):], pa.null())))
                for c in out_names})
        side = g["__side"].to_numpy(zero_copy_only=False)
        ts = g["__on"].to_numpy(zero_copy_only=False)
        if pc.any(pc.is_null(g["__on"])).as_py():
            raise ValueError("asof_join: null `on` values are unsupported")
        tie = g["__tie"].to_numpy(zero_copy_only=False)
        if tie.dtype == object:
            raise ValueError("asof_join: tie_col must be numeric")
        codes, keynull = _group_codes(g[by])
        n = len(side)
        # group-major, then time, then side (right before left at equal
        # ts → inclusive), then tie (max tie_col wins among equal-ts)
        order = np.lexsort((tie, side, ts, codes))
        codes_s = codes[order]
        starts = np.r_[0, np.flatnonzero(codes_s[1:] != codes_s[:-1]) + 1]
        lens = np.diff(np.r_[starts, n])
        seg_start = np.repeat(starts, lens)
        side_s = side[order]
        keynull_s = keynull[order]
        # SQL join semantics: NULL keys never match, not even each other
        pos_right = np.where((side_s == 0) & ~keynull_s, np.arange(n), -1)
        last_r = np.maximum.accumulate(pos_right)
        # a match from a PREVIOUS group sits before this group's segment
        # start; mask it out instead of resetting the accumulator
        last_r = np.where((last_r >= seg_start) & ~keynull_s, last_r, -1)
        left_pos = np.flatnonzero(side_s == 1)
        left_orig = order[left_pos]
        match_sorted = last_r[left_pos]
        li = pa.array(left_orig)
        ri = pa.array(order[np.clip(match_sorted, 0, None)],
                      mask=match_sorted < 0)
        cols = {}
        for c in lcols:
            src = g["__on"] if c == on else g[c]
            cols[c] = src.take(li)
        for oc in out_rcols:
            cols[oc] = g[oc].take(ri)
        return pa.table(cols)

    unioned = (left.map_batches(norm_left, batch_format="pyarrow")
               .union(right.map_batches(norm_right, batch_format="pyarrow")))
    return unioned.groupby("__part").map_groups(merge,
                                                batch_format="pyarrow")


def interval_join(points, intervals, by: str, ts_col: str,
                  start_col: str, end_col: str, rsuffix: str = "r_",
                  num_partitions: int = 64):
    """Range (interval-containment) join: every point row joins every
    interval row of the same ``by`` key with ``start <= ts <= end``
    (inclusive, many-to-many) — the brief's "range join".

    Per group the intervals are sorted by start; each point probes only
    the band ``start in [ts - L, ts]`` (L = the group's longest interval)
    via two searchsorteds, then filters ``end >= ts`` — O((n+m) log m +
    matches) per group, not O(n*m), as long as interval lengths are
    bounded (true for session/window-derived intervals; an interval tree
    would be needed for wildly mixed lengths). Groups are processed
    per hash PARTITION (see module docstring): the per-group work inside
    a partition is a handful of numpy calls on sorted views.
    """
    pschema = points.schema()
    ischema = intervals.schema()
    pcols = list(pschema.names)
    icols = [c for c in ischema.names if c != by]
    itypes = {c: ischema.types[ischema.names.index(c)]
              for c in ischema.names}
    ptypes = {c: pschema.types[pschema.names.index(c)] for c in pcols}
    out_icols = [rsuffix + c for c in icols]
    if set(out_icols) & set(pcols):
        raise ValueError(f"suffix {rsuffix!r} collides with point columns")

    def norm_points(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {by: batch[by], "__t": batch[ts_col].combine_chunks(),
                "__s": _pad0(n, itypes[start_col]),
                "__e": _pad0(n, itypes[end_col]),
                "__side": pa.array(np.ones(n, dtype=np.int8)),
                "__part": _part_array(batch[by], num_partitions)}
        for c in pcols:
            if c not in (by, ts_col):
                cols[c] = batch[c]
        for c, oc in zip(icols, out_icols):
            cols[oc] = pa.nulls(n, itypes[c])
        return pa.table(cols)

    def norm_intervals(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {by: batch[by], "__t": _pad0(n, ptypes[ts_col]),
                "__s": batch[start_col].combine_chunks(),
                "__e": batch[end_col].combine_chunks(),
                "__side": pa.array(np.zeros(n, dtype=np.int8)),
                "__part": _part_array(batch[by], num_partitions)}
        for c in pcols:
            if c not in (by, ts_col):
                cols[c] = pa.nulls(n, ptypes[c])
        for c, oc in zip(icols, out_icols):
            cols[oc] = batch[c]
        return pa.table(cols)

    out_names = pcols + out_icols

    def merge(g: pa.Table) -> pa.Table:
        def empty() -> pa.Table:
            return pa.table({c: pa.array([], ptypes.get(
                c, itypes.get(c[len(rsuffix):], pa.null())))
                for c in out_names})

        if g.num_rows == 0 or "__side" not in g.column_names:
            return empty()
        side = g["__side"].to_numpy(zero_copy_only=False)
        codes, keynull = _group_codes(g[by])
        # SQL join semantics: NULL keys never match, not even each other
        pidx0 = np.flatnonzero((side == 1) & ~keynull)
        iidx0 = np.flatnonzero((side == 0) & ~keynull)
        if len(pidx0) == 0 or len(iidx0) == 0:
            return empty()
        t = g["__t"].to_numpy(zero_copy_only=False)[pidx0]
        s = g["__s"].to_numpy(zero_copy_only=False)[iidx0]
        e = g["__e"].to_numpy(zero_copy_only=False)[iidx0]
        pcode = codes[pidx0]
        icode = codes[iidx0]
        po = np.lexsort((t, pcode))
        io = np.lexsort((s, icode))
        t, pcode, pidx0 = t[po], pcode[po], pidx0[po]
        s, e, icode, iidx0 = s[io], e[io], icode[io], iidx0[io]
        istarts = np.r_[0, np.flatnonzero(icode[1:] != icode[:-1]) + 1]
        iends = np.r_[istarts[1:], len(icode)]
        out_p, out_i = [], []
        for ist, ien in zip(istarts, iends):
            code = icode[ist]
            plo = np.searchsorted(pcode, code, side="left")
            phi = np.searchsorted(pcode, code, side="right")
            if plo == phi:
                continue
            gs, ge = s[ist:ien], e[ist:ien]
            gt = t[plo:phi]
            span = (ge - gs).max()
            lo = np.searchsorted(gs, gt - span, side="left")
            hi = np.searchsorted(gs, gt, side="right")
            m = np.maximum(hi - lo, 0)
            total = int(m.sum())
            if total == 0:
                continue
            prow = np.repeat(np.arange(len(gt)), m)
            cums = np.concatenate(([0], np.cumsum(m)))
            within = np.arange(total) - np.repeat(cums[:-1], m)
            irow = np.repeat(lo, m) + within
            keep = (ge[irow] >= gt[prow]) & (gs[irow] <= gt[prow])
            out_p.append(pidx0[plo:phi][prow[keep]])
            out_i.append(iidx0[ist:ien][irow[keep]])
        if not out_p:
            return empty()
        li = pa.array(np.concatenate(out_p))
        ri = pa.array(np.concatenate(out_i))
        cols = {}
        for c in pcols:
            src = g["__t"] if c == ts_col else g[c]
            cols[c] = src.take(li)
        for oc in out_icols:
            cols[oc] = g[oc].take(ri)
        return pa.table(cols)

    unioned = (points.map_batches(norm_points, batch_format="pyarrow")
               .union(intervals.map_batches(norm_intervals,
                                            batch_format="pyarrow")))
    return unioned.groupby("__part").map_groups(merge,
                                                batch_format="pyarrow")
