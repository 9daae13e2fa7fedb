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
partitions. For ``asof_join`` a single pathological hot key is handled
by ``time_buckets=B`` — a secondary equal-width time-bucket split with
a prefix-carry pass (see the function docstring) that spreads the key
over B partitions while keeping output identical. ``interval_join``
takes the same parameter: points bucket by ts and intervals replicate
into every bucket they overlap (fan-out bounded by
span/bucket_width + 1), meeting each matching point exactly once.

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
    enforced in the merge), any placement works.

    md5 runs once per DISTINCT value per batch (``pc.dictionary_encode``
    + numpy gather — the signatures.py idiom); string by-keys repeat
    heavily (user/conv/doc ids), so the Python hashing loop is bounded
    by batch cardinality, not row count. Partition ids are byte-identical
    to the historical per-row formula."""
    if pa.types.is_integer(col.type):
        knp = pc.fill_null(col, 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.array(knp % num_partitions, type=pa.int64())
    import hashlib

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    enc = pc.dictionary_encode(arr)
    dvals = enc.dictionary.to_pylist()
    dpart = np.fromiter(
        (int.from_bytes(hashlib.md5(str(k).encode()).digest()[:4], "big")
         % num_partitions for k in dvals),
        dtype=np.int64, count=len(dvals))
    idx = pc.fill_null(enc.indices, -1).to_numpy(
        zero_copy_only=False).astype(np.int64)
    out = np.zeros(len(idx), dtype=np.int64)  # nulls → partition 0
    valid = idx >= 0
    out[valid] = dpart[idx[valid]]
    return pa.array(out, type=pa.int64())


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


def _scalar_i64(v) -> int | None:
    """Aggregate min/max scalar (int or datetime-like) → int64 (us)."""
    if v is None:
        return None
    if isinstance(v, (int, np.integer)):
        return int(v)
    return int(np.datetime64(v, "us").astype(np.int64))


def _on_i64(arr: np.ndarray) -> np.ndarray:
    """On-column numpy values → int64 (us for datetimes)."""
    if arr.dtype.kind == "M":
        return arr.astype("datetime64[us]").astype(np.int64)
    return arr.astype(np.int64)


def _bucket_of(t: np.ndarray, lo: int, width: int, B: int) -> np.ndarray:
    """Monotone time → bucket-id map, overflow-safe: (t-lo)*B can wrap
    int64 for wide ranges (centuries of microseconds × large B), so the
    scale factor is applied in float64 — float division by a positive
    constant is monotone non-decreasing, which is all the bucketed
    paths' disjoint-and-increasing invariant needs (bucket BOUNDARIES
    need not be exact, only consistent between the two call sites)."""
    # subtract in float64: an int64 (t - lo) wraps when the global range
    # exceeds the int64 span (e.g. INT64_MIN-adjacent sentinels mixed
    # with large timestamps), silently breaking monotonicity
    f = np.floor((t.astype(np.float64) - float(lo))
                 * (float(B) / float(width)))
    return np.clip(f, 0, B - 1).astype(np.int64)


def asof_join(left, right, by: str, on: str, rsuffix: str = "r_",
              tie_col: str | None = None, num_partitions: int = 64,
              time_buckets: int | None = None):
    """Backward (inclusive) as-of join of two Datasets. Emits every left
    row with its left columns plus the matched right row's non-``by``
    columns renamed ``rsuffix + name`` (nulls when the key has no right
    row at or before the left row's ``on``).

    ``time_buckets=B`` (B > 1) enables the hot-key scale path: rows are
    partitioned by (key-hash, time-bucket) — B equal-width slices of the
    global ``on`` range — so a single pathological key spreads over B
    partitions instead of melting one worker. Correctness across bucket
    boundaries comes from a prefix-carry pass: per (key, bucket) the
    best right row (max ``on``, then ``tie_col``) is extracted (a
    dataset of at most keys × B rows), and each such row is replicated
    into the buckets after it up to the key's next right-occupied bucket
    (bounded fan-out ≤ B per key) — exactly the row a left row at the
    start of a later bucket would otherwise miss. Total partitions
    become ``num_partitions × B``; output is identical to the default
    path (asserted by tests). Costs two extra passes over the small
    best-rows dataset plus a min/max aggregate of ``on`` per side.
    """
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

    B = time_buckets if time_buckets and time_buckets > 1 else 1
    lo = width = None
    if B > 1:
        from ray.data.aggregate import Max, Min

        los, his = [], []
        for side in (left, right):
            mm = side.aggregate(Min(on, alias_name="lo"),
                                Max(on, alias_name="hi"))
            los.append(_scalar_i64(mm["lo"]))
            his.append(_scalar_i64(mm["hi"]))
        los = [v for v in los if v is not None]
        his = [v for v in his if v is not None]
        if not los or not his:
            B = 1  # an empty side: nothing to bucket
        else:
            lo = min(los)
            width = max(max(his) - lo, 0) + 1

    def _pid(keycol, on_pa) -> pa.Array:
        base = _part_array(keycol, num_partitions)
        if B == 1:
            return base
        t = _on_i64(on_pa.to_numpy(zero_copy_only=False))
        bkt = _bucket_of(t, lo, width, B)
        return pa.array(base.to_numpy(zero_copy_only=False) * B + bkt)

    def norm_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        onc = batch[on].combine_chunks()
        cols = {by: batch[by], "__on": onc,
                "__side": pa.array(np.ones(n, dtype=np.int8)),
                "__tie": _pad0(n, rtypes[tie_col]) if tie_col else
                pa.array(np.zeros(n, dtype=np.int8)),
                "__part": _pid(batch[by], onc)}
        for c in lcols:
            if c not in (by, on):
                cols[c] = batch[c]
        for c, oc in zip(rcols, out_rcols):
            cols[oc] = pa.nulls(n, rtypes[c])
        return pa.table(cols)

    def norm_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        onc = batch[on].combine_chunks()
        cols = {by: batch[by], "__on": onc,
                "__side": pa.array(np.zeros(n, dtype=np.int8)),
                "__tie": batch[tie_col] if tie_col else
                pa.array(np.zeros(n, dtype=np.int8)),
                "__part": _pid(batch[by], onc)}
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

    left_norm = left.map_batches(norm_left, batch_format="pyarrow")
    right_norm = right.map_batches(norm_right, batch_format="pyarrow")
    if B > 1:
        # the bucketed path consumes right_norm TWICE (final union +
        # best-row carry extraction); materialize once so Ray doesn't
        # re-execute the right side's read + normalization per consumer
        right_norm = right_norm.materialize()
    unioned = left_norm.union(right_norm)

    if B > 1:
        norm_types = {by: ltypes[by], "__on": ltypes[on],
                      "__side": pa.int8(),
                      "__tie": rtypes[tie_col] if tie_col else pa.int8(),
                      "__part": pa.int64()}
        for c in lcols:
            if c not in (by, on):
                norm_types[c] = ltypes[c]
        for c, oc in zip(rcols, out_rcols):
            norm_types[oc] = rtypes[c]

        def empty_norm() -> pa.Table:
            return pa.table({c: pa.array([], t)
                             for c, t in norm_types.items()})

        def best_rows(g: pa.Table) -> pa.Table:
            """Per (key, bucket) partition: the right row a LATER bucket
            would carry — max (__on, __tie) per key (one __part = one
            bucket, so a key has one best row here)."""
            if g.num_rows == 0 or "__side" not in g.column_names:
                return empty_norm()
            codes, keynull = _group_codes(g[by])
            ts = g["__on"].to_numpy(zero_copy_only=False)
            tie = g["__tie"].to_numpy(zero_copy_only=False)
            order = np.lexsort((tie, ts, codes))
            codes_s = codes[order]
            is_end = np.r_[codes_s[1:] != codes_s[:-1], True]
            sel = order[is_end]
            sel = sel[~keynull[sel]]
            return g.take(pa.array(sel)) if len(sel) else empty_norm()

        def fanout(g: pa.Table) -> pa.Table:
            """Per key-hash partition of best rows: replicate each
            bucket's best into the buckets after it, up to the key's
            next right-occupied bucket (bounded ≤ B per key). Bucket
            on-ranges are disjoint and increasing, so the carry into
            any bucket is exactly the best of the nearest earlier
            occupied bucket."""
            if g.num_rows == 0 or "__part" not in g.column_names:
                return empty_norm()
            codes, _ = _group_codes(g[by])
            part = g["__part"].to_numpy(zero_copy_only=False)
            bkt = part % B
            kp = part // B
            order = np.lexsort((bkt, codes))
            codes_s = codes[order]
            b_s = bkt[order]
            is_end = np.r_[codes_s[1:] != codes_s[:-1], True]
            nxt = np.r_[b_s[1:], np.int64(B - 1)]
            nxt[is_end] = B - 1
            counts = nxt - b_s
            total = int(counts.sum())
            if total == 0:
                return empty_norm()
            src = np.repeat(np.arange(len(order)), counts)
            cum = np.concatenate(([0], np.cumsum(counts)))
            within = np.arange(total) - np.repeat(cum[:-1], counts)
            targets = b_s[src] + 1 + within
            rows = order[src]
            newpid = kp[order][src] * B + targets
            t = g.take(pa.array(rows)).drop_columns(["__kp"])
            i = t.schema.get_field_index("__part")
            return t.set_column(i, "__part", pa.array(newpid))

        best = right_norm.groupby("__part").map_groups(
            best_rows, batch_format="pyarrow")

        def add_kp(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "__part" not in b.column_names:
                # zero-row blocks can carry the pre-map schema
                return empty_norm().append_column(
                    "__kp", pa.array([], pa.int64()))
            kp = b["__part"].combine_chunks().to_numpy(
                zero_copy_only=False) // B
            return b.append_column("__kp", pa.array(kp, type=pa.int64()))

        carries = (best.map_batches(add_kp, batch_format="pyarrow")
                   .groupby("__kp").map_groups(fanout,
                                               batch_format="pyarrow"))
        unioned = unioned.union(carries)

    return unioned.groupby("__part").map_groups(merge,
                                                batch_format="pyarrow")


def interval_join(points, intervals, by: str, ts_col: str,
                  start_col: str, end_col: str, rsuffix: str = "r_",
                  num_partitions: int = 64,
                  time_buckets: int | None = None):
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

    ``time_buckets=B`` (B > 1) enables the hot-key scale path: points
    partition by (key-hash, time-bucket of ts); each interval is
    REPLICATED into every bucket its [start, end] overlaps (fan-out
    bounded by span/bucket_width + 1; intervals outside the points'
    global ts range are dropped, null-bounded intervals never match).
    A matching (point, interval) pair meets in exactly one partition —
    the point's bucket — so no dedup pass is needed and the output is
    identical to the default path (asserted by tests).
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

    B = time_buckets if time_buckets and time_buckets > 1 else 1
    lo = width = None
    if B > 1:
        from ray.data.aggregate import Max, Min

        mm = points.aggregate(Min(ts_col, alias_name="lo"),
                              Max(ts_col, alias_name="hi"))
        plo = _scalar_i64(mm["lo"])
        phi = _scalar_i64(mm["hi"])
        if plo is None or phi is None:
            B = 1  # no points: nothing can match
        else:
            lo = plo
            width = max(phi - plo, 0) + 1

    def _bucket(x: np.ndarray) -> np.ndarray:
        return _bucket_of(x, lo, width, B)

    def norm_points(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        tc = batch[ts_col].combine_chunks()
        pid = _part_array(batch[by], num_partitions)
        if B > 1:
            pid = pa.array(
                pid.to_numpy(zero_copy_only=False) * B
                + _bucket(_on_i64(tc.to_numpy(zero_copy_only=False))))
        cols = {by: batch[by], "__t": tc,
                "__s": _pad0(n, itypes[start_col]),
                "__e": _pad0(n, itypes[end_col]),
                "__side": pa.array(np.ones(n, dtype=np.int8)),
                "__part": pid}
        for c in pcols:
            if c not in (by, ts_col):
                cols[c] = batch[c]
        for c, oc in zip(icols, out_icols):
            cols[oc] = pa.nulls(n, itypes[c])
        return pa.table(cols)

    def norm_intervals(batch: pa.Table) -> pa.Table:
        pid = _part_array(batch[by], num_partitions)
        if B > 1:
            sc = batch[start_col].combine_chunks()
            ec = batch[end_col].combine_chunks()
            isnull = pc.or_(pc.is_null(sc), pc.is_null(ec)).to_numpy(
                zero_copy_only=False)
            idx0 = np.flatnonzero(~isnull)
            i0 = pa.array(idx0)
            s64 = _on_i64(sc.take(i0).to_numpy(zero_copy_only=False))
            e64 = _on_i64(ec.take(i0).to_numpy(zero_copy_only=False))
            # inverted intervals (end < start) match nothing in the
            # default path; drop them here too instead of fanning out a
            # negative replication count
            keep = (e64 >= lo) & (s64 <= lo + width - 1) & (s64 <= e64)
            idx = idx0[keep]
            b0 = _bucket(s64[keep])
            b1 = _bucket(e64[keep])
            counts = b1 - b0 + 1
            total = int(counts.sum())
            src = np.repeat(idx, counts)
            cum = np.concatenate(([0], np.cumsum(counts)))
            within = np.arange(total) - np.repeat(cum[:-1], counts)
            bkt = np.repeat(b0, counts) + within
            base = pid.to_numpy(zero_copy_only=False)[src]
            batch = batch.take(pa.array(src))
            pid = pa.array(base * B + bkt)
        n = batch.num_rows
        cols = {by: batch[by], "__t": _pad0(n, ptypes[ts_col]),
                "__s": batch[start_col].combine_chunks(),
                "__e": batch[end_col].combine_chunks(),
                "__side": pa.array(np.zeros(n, dtype=np.int8)),
                "__part": pid}
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
