"""As-of join — for every left row, the most recent right row at or
before it (``right.on <= left.on``), matched within a ``by`` key.

Ray Data has no asof/range join; the task brief names it as a custom
operator to compose from primitives. Shape: both sides are normalised to
one schema (shared ``by``/``on`` sort columns + side tag + each side's
payload columns, right's renamed with a suffix), unioned, and
``groupby(by).map_groups`` merges each key group with one vectorized
lexsort + maximum-accumulate sweep — a textbook sort-merge asof, no
driver materialization.

Partitioning assumption (documented per the brief): one ``by`` group
(e.g. one user's event history) fits in a worker — the standard shape
for user-keyed event streams. A pathological single hot key would need a
secondary time-bucket split with boundary carry-over; not implemented.

Tie semantics: at equal ``on`` the right row still matches (inclusive);
among right rows sharing the same ``on`` value, the one with the
greatest ``tie_col`` wins (deterministic across partitionings). With
``tie_col=None`` equal-``on`` right rows are ordered arbitrarily.
Null ``on`` values are not supported (asserted).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def asof_join(left, right, by: str, on: str, rsuffix: str = "r_",
              tie_col: str | None = None):
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
                "__tie": pa.nulls(n, rtypes[tie_col]) if tie_col else
                pa.array(np.zeros(n, dtype=np.int8))}
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
                pa.array(np.zeros(n, dtype=np.int8))}
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
        if pa.compute.any(pa.compute.is_null(g["__on"])).as_py():
            raise ValueError("asof_join: null `on` values are unsupported")
        tie = g["__tie"].to_numpy(zero_copy_only=False)
        if tie.dtype == object:
            raise ValueError("asof_join: tie_col must be numeric")
        n = len(side)
        order = np.lexsort((tie, side, ts))
        side_s = side[order]
        pos_right = np.where(side_s == 0, np.arange(n), -1)
        last_r = np.maximum.accumulate(pos_right)
        left_pos = np.flatnonzero(side_s == 1)
        left_orig = order[left_pos]
        match_sorted = last_r[left_pos]
        match_list = [int(order[m]) if m >= 0 else None
                      for m in match_sorted]
        li = pa.array(left_orig)
        ri = pa.array(match_list, type=pa.int64())
        cols = {}
        for c in lcols:
            src = g["__on"] if c == on else g[c]
            cols[c] = src.take(li)
        for oc in out_rcols:
            cols[oc] = g[oc].take(ri)
        return pa.table(cols)

    unioned = (left.map_batches(norm_left, batch_format="pyarrow")
               .union(right.map_batches(norm_right, batch_format="pyarrow")))
    return unioned.groupby(by).map_groups(merge, batch_format="pyarrow")


def interval_join(points, intervals, by: str, ts_col: str,
                  start_col: str, end_col: str, rsuffix: str = "r_"):
    """Range (interval-containment) join: every point row joins every
    interval row of the same ``by`` key with ``start <= ts <= end``
    (inclusive, many-to-many) — the brief's "range join" composed from
    union + groupby + a banded vectorized sweep.

    Per group the intervals are sorted by start; each point probes only
    the band ``start in [ts - L, ts]`` (L = the group's longest interval)
    via two searchsorteds, then filters ``end >= ts`` — O((n+m) log m +
    matches), not O(n*m), as long as interval lengths are bounded (true
    for session/window-derived intervals; an interval tree would be
    needed for wildly mixed lengths). Same partitioning assumption as
    :func:`asof_join`: one ``by`` group fits in a worker.
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
                "__s": pa.nulls(n, itypes[start_col]),
                "__e": pa.nulls(n, itypes[end_col]),
                "__side": pa.array(np.ones(n, dtype=np.int8))}
        for c in pcols:
            if c not in (by, ts_col):
                cols[c] = batch[c]
        for c, oc in zip(icols, out_icols):
            cols[oc] = pa.nulls(n, itypes[c])
        return pa.table(cols)

    def norm_intervals(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {by: batch[by], "__t": pa.nulls(n, ptypes[ts_col]),
                "__s": batch[start_col].combine_chunks(),
                "__e": batch[end_col].combine_chunks(),
                "__side": pa.array(np.zeros(n, dtype=np.int8))}
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
        pidx0 = np.flatnonzero(side == 1)
        iidx0 = np.flatnonzero(side == 0)
        if len(pidx0) == 0 or len(iidx0) == 0:
            return empty()
        t = g["__t"].to_numpy(zero_copy_only=False)[pidx0]
        s = g["__s"].to_numpy(zero_copy_only=False)[iidx0]
        e = g["__e"].to_numpy(zero_copy_only=False)[iidx0]
        order = np.argsort(s, kind="stable")
        s, e, iidx0 = s[order], e[order], iidx0[order]
        span = (e - s).max()
        lo = np.searchsorted(s, t - span, side="left")
        hi = np.searchsorted(s, t, side="right")
        m = np.maximum(hi - lo, 0)
        total = int(m.sum())
        if total == 0:
            return empty()
        prow = np.repeat(np.arange(len(t)), m)
        cums = np.concatenate(([0], np.cumsum(m)))
        within = np.arange(total) - np.repeat(cums[:-1], m)
        irow = np.repeat(lo, m) + within
        keep = (e[irow] >= t[prow]) & (s[irow] <= t[prow])
        prow, irow = prow[keep], irow[keep]
        li = pa.array(pidx0[prow])
        ri = pa.array(iidx0[irow])
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
    return unioned.groupby(by).map_groups(merge, batch_format="pyarrow")
