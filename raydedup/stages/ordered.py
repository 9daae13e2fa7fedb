"""Per-key ordered scans — running totals and lag deltas, the
``SUM(...) OVER (PARTITION BY k ORDER BY ...)`` / ``lag(...)`` window
family the reference's timemap loops imply (every per-TimeMap pass in
``otmt/timemap_measures.py`` walks mementos in datetime order) and a
training-data pipeline needs for per-source token budgets and event-gap
features.

Same execution shape as ``stages/asof.py`` (whose helpers this reuses):
hash-partition rows by ``hash(by) % num_partitions``, then one
``groupby("__part").map_groups`` merge per PARTITION that handles every
``by`` group with a single lexsort + segment arithmetic — O(n log n)
numpy work per partition, not a Python call per key. The shuffle carries
only the projected columns; at 100 TB the partition count is the first
knob (one partition must fit a worker). A single pathological hot key
has a scale path for the flagship scan: ``running_totals_bucketed``
splits keys over (key-hash, order-bucket) partitions with an exact
prefix-carry pass (asof_join's pattern applied to cumulative sums);
rolling/lag would carry the trailing k rows / last row the same way —
not implemented until a workload needs them.

Determinism: callers pass ``order_cols`` that totally order rows within
a key (e.g. ts + a unique id); the scan raises on null order values.
NULL ``by`` keys form their own group (SQL PARTITION BY semantics —
unlike joins, window partitions group nulls together).

Exactness: running sums over integer columns are exact (int64 cumsum
with segment-offset subtraction is exact integer arithmetic). For float
columns the segment-offset subtraction takes a different FP path than a
sequential per-key sum, so parity with a SQL window sum is only to ~1
ulp — use an integer-scaled column when bit-exact output matters (the
driver query casts integral ``l_quantity`` to int64).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.stages.asof import _group_codes, _part_array


def _order_and_segments(g: pa.Table, by: str, order_cols: list[str]):
    """Lexsort rows group-major then by order_cols; return (order,
    starts, lens) where starts/lens delimit each key's contiguous
    segment in the sorted view."""
    codes, _ = _group_codes(g[by])
    keys = []
    for c in reversed(order_cols):
        col = g[c]
        if pc.any(pc.is_null(col)).as_py():
            raise ValueError(f"ordered scan: null values in order col {c!r}")
        keys.append(col.combine_chunks().to_numpy(zero_copy_only=False))
    keys.append(codes)
    order = np.lexsort(tuple(keys))
    codes_s = codes[order]
    n = len(codes_s)
    starts = np.r_[0, np.flatnonzero(codes_s[1:] != codes_s[:-1]) + 1]
    lens = np.diff(np.r_[starts, n])
    return order, starts, lens


def _windowed_totals(ds, by: str, order_cols: list[str], value_col: str,
                     window_rows: int | None, out_n: str, out_sum: str,
                     num_partitions: int):
    """Shared sweep for running (window_rows=None → unbounded) and
    trailing-window totals. Raises on null ``value_col`` values — a
    NaN from a null decay would silently poison the partition-wide
    prefix sum for every later key (SQL's skip-null SUM is not offered;
    fill or filter nulls upstream)."""
    schema = ds.schema()
    names = list(schema.names)
    types = dict(zip(schema.names, schema.types))
    for c in (out_n, out_sum):
        if c in names:
            raise ValueError(f"output column {c!r} collides with input")
    out_names = names + [out_n, out_sum]
    sum_t = types[value_col]

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _part_array(batch[by], num_partitions))

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__part" not in g.column_names:
            return pa.table({c: pa.array(
                [], pa.int64() if c == out_n else
                sum_t if c == out_sum else types[c]) for c in out_names})
        if pc.any(pc.is_null(g[value_col])).as_py():
            raise ValueError(
                f"ordered scan: null values in value col {value_col!r}")
        order, starts, lens = _order_and_segments(g, by, order_cols)
        n = len(order)
        seg_start = np.repeat(starts, lens)
        rank = np.arange(n, dtype=np.int64) - seg_start + 1
        v = g[value_col].combine_chunks().to_numpy(
            zero_copy_only=False)[order]
        cum = np.cumsum(v)
        # prefix sum of everything before each row's segment
        offset = np.repeat(cum[starts] - v[starts], lens)
        if window_rows is None:
            total = cum - offset
            count = rank
        else:
            back = np.arange(n) - window_rows
            # prefix sum just BEFORE the window: cum[i-k] when the
            # window fits inside the segment, else the segment offset
            prev = np.where(back >= seg_start, cum[np.maximum(back, 0)],
                            offset)
            total = cum - prev
            count = np.minimum(rank, window_rows)
        oi = pa.array(order)
        cols = {c: g[c].take(oi) for c in names}
        cols[out_n] = pa.array(count)
        cols[out_sum] = pc.cast(pa.array(total), sum_t)
        return pa.table(cols)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__part").map_groups(merge, batch_format="pyarrow"))


def running_totals(ds, by: str, order_cols: list[str], value_col: str,
                   out_n: str = "running_n", out_sum: str = "running_sum",
                   num_partitions: int = 64):
    """Cumulative count + cumulative sum of ``value_col`` per ``by``
    key in ``order_cols`` order (ROWS UNBOUNDED PRECEDING .. CURRENT
    ROW). Emits every input row plus ``out_n`` (int64 rank within key)
    and ``out_sum`` (value_col's type). Null values raise (see
    ``_windowed_totals``)."""
    return _windowed_totals(ds, by, order_cols, value_col, None,
                            out_n, out_sum, num_partitions)


def rolling_totals(ds, by: str, order_cols: list[str], value_col: str,
                   window_rows: int, out_n: str = "rolling_n",
                   out_sum: str = "rolling_sum", num_partitions: int = 64):
    """Trailing-window count + sum of ``value_col`` per ``by`` key over
    the last ``window_rows`` rows in ``order_cols`` order (ROWS BETWEEN
    window_rows-1 PRECEDING AND CURRENT ROW). Integer columns stay
    exact (differences of exact integer prefix sums); null values
    raise (see ``_windowed_totals``)."""
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    return _windowed_totals(ds, by, order_cols, value_col, window_rows,
                            out_n, out_sum, num_partitions)


def lag_delta(ds, by: str, ts_col: str, tie_cols: list[str],
              out: str = "gap", num_partitions: int = 64):
    """Per-key delta to the previous row: ``ts - lag(ts)`` over
    (PARTITION BY by ORDER BY ts_col, tie_cols...). First row of each
    key gets null. Timestamps yield an int64 microsecond gap; integer
    columns yield their plain difference."""
    schema = ds.schema()
    names = list(schema.names)
    types = dict(zip(schema.names, schema.types))
    if out in names:
        raise ValueError(f"output column {out!r} collides with input")
    out_names = names + [out]

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _part_array(batch[by], num_partitions))

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__part" not in g.column_names:
            return pa.table({c: pa.array(
                [], pa.int64() if c == out else types[c])
                for c in out_names})
        order, starts, _lens = _order_and_segments(
            g, by, [ts_col, *tie_cols])
        t = g[ts_col].combine_chunks().to_numpy(
            zero_copy_only=False)[order]
        delta = np.empty(len(t), dtype="int64")
        d = np.diff(t)
        delta[1:] = d.astype("timedelta64[us]").astype(np.int64) \
            if d.dtype.kind == "m" else d.astype(np.int64)
        delta[0] = 0
        first = np.zeros(len(t), dtype=bool)
        first[starts] = True
        oi = pa.array(order)
        cols = {c: g[c].take(oi) for c in names}
        cols[out] = pa.array(delta, mask=first)
        return pa.table(cols)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__part").map_groups(merge, batch_format="pyarrow"))


def assemble_by_key(ds, by: str, order_cols: list[str], text_col: str,
                    sep: str = " ", out: str = "assembled",
                    num_partitions: int = 64):
    """Ordered per-group string assembly — ``string_agg(text, sep ORDER
    BY ...)``: one output row per ``by`` key with its ``text_col``
    values concatenated in ``order_cols`` order (conversation
    reconstruction from turn rows). Same partition sweep as the other
    ordered scans; the join itself is one vectorized
    ``pc.binary_join`` over a ListArray built from segment offsets —
    no per-group Python string work. Null texts are skipped (SQL
    ``string_agg`` semantics), with one documented deviation: a key
    whose texts are ALL null is omitted entirely, where SQL would emit
    the key with a NULL aggregate. Partitioning note: a key's full
    text lands in one output row, so per-key payload must fit a worker
    (same contract as any string_agg)."""
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    btype = types[by]

    def tag(batch: pa.Table) -> pa.Table:
        keep = [by, text_col, *order_cols]
        t = pa.table({c: batch[c] for c in keep})
        t = t.filter(pc.is_valid(t[text_col]))
        return t.append_column(
            "__part", _part_array(t[by], num_partitions))

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__part" not in g.column_names:
            return pa.table({by: pa.array([], btype),
                             out: pa.array([], pa.string())})
        order, starts, _lens = _order_and_segments(g, by, order_cols)
        n = len(order)
        oi = pa.array(order)
        # large_string + int64 offsets: a partition's assembled text may
        # exceed the 2 GiB cliff of 32-bit string offsets
        texts = pc.cast(g[text_col].take(oi), pa.large_string())
        offsets = pa.array(np.r_[starts, n].astype(np.int64))
        lists = pa.LargeListArray.from_arrays(offsets,
                                              texts.combine_chunks())
        joined = pc.cast(
            pc.binary_join(lists, pa.scalar(sep, pa.large_string())),
            pa.string())
        keys = g[by].take(pa.array(order[starts]))
        return pa.table({by: keys, out: joined})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__part").map_groups(merge, batch_format="pyarrow"))


def running_totals_bucketed(ds, by: str, order_cols: list[str],
                            value_col: str, order_buckets: int,
                            out_n: str = "running_n",
                            out_sum: str = "running_sum",
                            num_partitions: int = 64):
    """Hot-key SCALE path for ``running_totals``: rows partition by
    (key-hash, order-bucket) — equal-width slices of the global range
    of ``order_cols[0]`` — so one pathological key spreads over
    ``order_buckets`` partitions. Cross-bucket correctness comes from a
    prefix-carry pass, the same shape as ``asof_join``'s: per-batch
    Arrow partials reduce each (key, bucket) to one (count, sum) row,
    a per-key-hash pass turns them into EXCLUSIVE prefix offsets, and
    the offset rows ride the same partitioning into the final merge,
    where each key's local scan adds its offsets. Output is identical
    to the default path (asserted by tests); offsets are exact int64
    sums, so the int-column exactness contract carries over. Costs vs
    the default path: one min/max aggregate over the input, one
    materialization of the tagged dataset (object-store resident,
    spillable — it feeds both the partials branch and the final
    union), two passes over the tiny per-(key, bucket) partials, and
    ~17 bytes/row of carry-slot padding through the main shuffle.
    ``order_cols[0]`` must be integer or timestamp (bucketable)."""
    from ray.data.aggregate import Max, Min

    from raydedup.stages.asof import _bucket_of, _on_i64, _scalar_i64

    B = order_buckets
    if B < 2:
        return running_totals(ds, by, order_cols, value_col,
                              out_n=out_n, out_sum=out_sum,
                              num_partitions=num_partitions)
    schema = ds.schema()
    names = list(schema.names)
    types = dict(zip(schema.names, schema.types))
    for c in (out_n, out_sum):
        if c in names:
            raise ValueError(f"output column {c!r} collides with input")
    out_names = names + [out_n, out_sum]
    sum_t = types[value_col]
    oc0 = order_cols[0]
    if not (pa.types.is_integer(types[oc0])
            or pa.types.is_timestamp(types[oc0])):
        raise ValueError(
            f"running_totals_bucketed: order_cols[0] ({oc0!r}) must be "
            f"integer or timestamp to bucket; got {types[oc0]} — use "
            f"the default running_totals or quantize the column")

    mm = ds.aggregate(Min(oc0, alias_name="lo"),
                      Max(oc0, alias_name="hi"))
    lo = _scalar_i64(mm["lo"])
    hi = _scalar_i64(mm["hi"])
    if lo is None or hi is None:
        return running_totals(ds, by, order_cols, value_col,
                              out_n=out_n, out_sum=out_sum,
                              num_partitions=num_partitions)
    width = max(hi - lo, 0) + 1

    def tag(batch: pa.Table) -> pa.Table:
        kp = _part_array(batch[by], num_partitions).to_numpy(
            zero_copy_only=False)
        t64 = _on_i64(batch[oc0].combine_chunks().to_numpy(
            zero_copy_only=False))
        bkt = _bucket_of(t64, lo, width, B)
        cols = {c: batch[c] for c in names}
        cols["__part"] = pa.array(kp * B + bkt)
        cols["__carry"] = pa.array(
            np.zeros(batch.num_rows, dtype=np.int8))
        cols["__n_off"] = pa.array(
            np.zeros(batch.num_rows, dtype=np.int64))
        cols["__s_off"] = pc.cast(pa.array(
            np.zeros(batch.num_rows, dtype=np.int64)), sum_t)
        return pa.table(cols)

    # materialize ONCE: the tagged lineage feeds BOTH the partials
    # branch and the final union — without this, Ray re-executes the
    # read + hashing for each consumer (no common-subexpression cache);
    # the blocks live in the (spillable) object store instead
    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    # phase 1: per-batch (key, bucket) partial count/sum — tiny rows
    def bucket_partials(batch: pa.Table) -> pa.Table:
        b = batch
        # fail fast BEFORE the shuffle: phase 3 raises on null values
        # anyway (the module's no-skip-null contract)
        if b.num_rows and pc.any(pc.is_null(b[value_col])).as_py():
            raise ValueError(
                f"ordered scan: null values in value col {value_col!r}")
        if b.num_rows == 0:
            return pa.table({by: pa.array([], types[by]),
                             "__part": pa.array([], pa.int64()),
                             "__cnt": pa.array([], pa.int64()),
                             "__sum": pa.array([], sum_t)})
        t = pa.table({by: b[by], "__part": b["__part"],
                      "__cnt": pa.array(
                          np.ones(b.num_rows, dtype=np.int64)),
                      "__sum": b[value_col]})
        agg = t.group_by([by, "__part"]).aggregate(
            [("__cnt", "sum"), ("__sum", "sum")])
        return pa.table({by: agg[by], "__part": agg["__part"],
                         "__cnt": agg["__cnt_sum"],
                         "__sum": pc.cast(agg["__sum_sum"], sum_t)})

    partials = tagged.map_batches(bucket_partials,
                                  batch_format="pyarrow")

    def add_kp(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "__part" not in b.column_names:
            return pa.table({by: pa.array([], types[by]),
                             "__part": pa.array([], pa.int64()),
                             "__cnt": pa.array([], pa.int64()),
                             "__sum": pa.array([], sum_t),
                             "__kp": pa.array([], pa.int64())})
        kp = b["__part"].combine_chunks().to_numpy(
            zero_copy_only=False) // B
        return b.append_column("__kp", pa.array(kp, type=pa.int64()))

    # phase 2: per key-hash, exclusive prefix over buckets → carry rows
    def prefix(g: pa.Table) -> pa.Table:
        def empty() -> pa.Table:
            cols = {c: pa.array([], types[c]) for c in names}
            cols["__part"] = pa.array([], pa.int64())
            cols["__carry"] = pa.array([], pa.int8())
            cols["__n_off"] = pa.array([], pa.int64())
            cols["__s_off"] = pa.array([], sum_t)
            return pa.table(cols)

        if g.num_rows == 0 or "__part" not in g.column_names:
            return empty()
        from raydedup.stages.asof import _group_codes

        codes, _ = _group_codes(g[by])
        part = g["__part"].to_numpy(zero_copy_only=False)
        cnt = g["__cnt"].to_numpy(zero_copy_only=False)
        s = g["__sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((part, codes))
        codes_o, part_o = codes[order], part[order]
        # combine the per-batch partials: one row per (key, bucket)
        new = np.r_[True, (codes_o[1:] != codes_o[:-1])
                    | (part_o[1:] != part_o[:-1])]
        rstarts = np.flatnonzero(new)
        cnt_s = np.add.reduceat(cnt[order], rstarts)
        s_s = np.add.reduceat(s[order], rstarts)
        codes_s, part_s = codes_o[rstarts], part_o[rstarts]
        rep = order[rstarts]  # a source row per reduced run (for `by`)
        starts = np.flatnonzero(
            np.r_[True, codes_s[1:] != codes_s[:-1]])
        lens = np.diff(np.r_[starts, len(codes_s)])
        ccum = np.cumsum(cnt_s)
        scum = np.cumsum(s_s)
        coff = np.repeat(ccum[starts] - cnt_s[starts], lens)
        soff = np.repeat(scum[starts] - s_s[starts], lens)
        # EXCLUSIVE prefix: totals of this key's EARLIER buckets
        n_off = ccum - cnt_s - coff
        s_off = scum - s_s - soff
        keep = n_off > 0  # first occupied bucket needs no carry
        if not keep.any():
            return empty()
        sel = pa.array(rep[keep])
        cols = {c: (g[c].take(sel) if c == by
                    else pa.nulls(int(keep.sum()), types[c]))
                for c in names}
        cols["__part"] = pa.array(part_s[keep])
        cols["__carry"] = pa.array(
            np.ones(int(keep.sum()), dtype=np.int8))
        cols["__n_off"] = pa.array(n_off[keep])
        cols["__s_off"] = pc.cast(pa.array(s_off[keep]), sum_t)
        return pa.table(cols)

    carries = (partials.map_batches(add_kp, batch_format="pyarrow")
               .groupby("__kp").map_groups(prefix,
                                           batch_format="pyarrow"))

    # phase 3: local scan + per-key carry offsets
    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__carry" not in g.column_names:
            return pa.table({c: pa.array(
                [], pa.int64() if c == out_n else
                sum_t if c == out_sum else types[c]) for c in out_names})
        from raydedup.stages.asof import _group_codes

        carry = g["__carry"].to_numpy(zero_copy_only=False) == 1
        codes, _ = _group_codes(g[by])
        didx = np.flatnonzero(~carry)
        if len(didx) == 0:
            return pa.table({c: pa.array(
                [], pa.int64() if c == out_n else
                sum_t if c == out_sum else types[c]) for c in out_names})
        sub = g.take(pa.array(didx))
        if pc.any(pc.is_null(sub[value_col])).as_py():
            raise ValueError(
                f"ordered scan: null values in value col {value_col!r}")
        order, starts, lens = _order_and_segments(sub, by, order_cols)
        n = len(order)
        seg_start = np.repeat(starts, lens)
        rank = np.arange(n, dtype=np.int64) - seg_start + 1
        v = sub[value_col].combine_chunks().to_numpy(
            zero_copy_only=False)[order]
        cum = np.cumsum(v)
        cum = cum - np.repeat(cum[starts] - v[starts], lens)
        # per-key carry offsets (≤ 1 carry row per key per partition)
        dcodes = codes[didx][order]
        n_off = np.zeros(n, dtype=np.int64)
        s_off = np.zeros(n, dtype=v.dtype)
        cidx = np.flatnonzero(carry)
        if len(cidx):
            ccodes = codes[cidx]
            cn = g["__n_off"].to_numpy(zero_copy_only=False)[cidx]
            cs = g["__s_off"].combine_chunks().to_numpy(
                zero_copy_only=False)[cidx]
            co = np.argsort(ccodes, kind="stable")
            ck, cn, cs = ccodes[co], cn[co], cs[co]
            pos = np.clip(np.searchsorted(ck, dcodes),
                          0, len(ck) - 1)
            hit = ck[pos] == dcodes
            n_off[hit] = cn[pos[hit]]
            s_off[hit] = cs[pos[hit]]
        oi = pa.array(didx[order])
        cols = {c: g[c].take(oi) for c in names}
        cols[out_n] = pa.array(rank + n_off)
        cols[out_sum] = pc.cast(pa.array(cum + s_off), sum_t)
        return pa.table(cols)

    unioned = tagged.union(carries)
    return unioned.groupby("__part").map_groups(merge,
                                                batch_format="pyarrow")


def transition_counts(ds, by: str, order_cols: list[str], type_col: str,
                      num_partitions: int = 64):
    """Adjacent-pair category transition counts — the (prev → next)
    bigram matrix of ``type_col`` per ``by`` key in ``order_cols``
    order (the Markov transition table a behavioral / agent-trace
    pipeline feeds downstream; the reference's chain scan walks
    mementos pairwise the same way, ``otmt/timemap_measures.py``'s
    in-order loops). Pairs with a null ``type_col`` on either side are
    dropped (SQL ``WHERE lag(t) IS NOT NULL AND t IS NOT NULL``);
    null ``by`` keys form one group (window semantics).

    Scale shape: one partition sweep (lexsort + shifted-compare — no
    Python call per key) emits PARTIAL counts of at most
    |types|² rows per partition; the final grouped sum therefore
    shuffles ≤ num_partitions × |types|² tiny rows regardless of
    corpus size."""
    def tag(batch: pa.Table) -> pa.Table:
        keep = [by, type_col, *order_cols]
        t = pa.table({c: batch[c] for c in keep})
        return t.append_column(
            "__part", _part_array(t[by], num_partitions))

    empty = pa.table({"prev_type": pa.array([], pa.string()),
                      "next_type": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows < 2 or "__part" not in g.column_names:
            return empty
        order, starts, _lens = _order_and_segments(g, by, order_cols)
        enc = pc.dictionary_encode(
            pc.cast(g[type_col].combine_chunks(), pa.string()))
        tcodes = pc.fill_null(enc.indices, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)[order]
        n = len(tcodes)
        first = np.zeros(n, dtype=bool)
        first[starts] = True
        prev, cur = tcodes[:-1], tcodes[1:]
        ok = (~first[1:]) & (prev >= 0) & (cur >= 0)
        if not ok.any():
            return empty
        k = len(enc.dictionary)
        key = prev[ok] * k + cur[ok]
        uk, counts = np.unique(key, return_counts=True)
        d = enc.dictionary
        return pa.table({
            "prev_type": d.take(pa.array(uk // k)),
            "next_type": d.take(pa.array(uk % k)),
            "n": pa.array(counts.astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    partials = (ds.map_batches(tag, batch_format="pyarrow")
                .groupby("__part").map_groups(merge,
                                              batch_format="pyarrow"))
    return partials.groupby(["prev_type", "next_type"]).aggregate(
        Sum("n", alias_name="n"))


def integrity_stats(ds, by: str, idx_col: str, ts_col: str,
                    text_col: str, num_partitions: int = 64):
    """Per-key schema/ordering validation — the data-quality gate a
    transcript corpus runs before any dedup pass (the reference trusts
    its TimeMap ordering implicitly; at corpus scale that trust is a
    checked invariant). One row per ``by`` key with:

    - ``n_turns``   — row count;
    - ``dup_turns`` — ``count(*) - count(DISTINCT idx_col)`` (repeated
      turn indices);
    - ``n_empty``   — null or empty ``text_col`` rows;
    - ``ts_monotone`` — ``ts_col`` nondecreasing under the
      deterministic (idx_col, ts_col) ordering.

    Same partition-sweep shape as the other ordered scans: one lexsort
    per hash partition handles every key; all four stats fall out of
    segment arithmetic (``bincount`` over segment ids). Null
    ``idx_col``/``ts_col`` raise (order columns must totally order);
    null ``by`` keys form one group (window semantics)."""
    def tag(batch: pa.Table) -> pa.Table:
        keep = [by, idx_col, ts_col, text_col]
        t = pa.table({c: batch[c] for c in keep})
        return t.append_column(
            "__part", _part_array(t[by], num_partitions))

    schema = ds.schema()
    btype = dict(zip(schema.names, schema.types))[by]
    empty = pa.table({by: pa.array([], btype),
                      "n_turns": pa.array([], pa.int64()),
                      "dup_turns": pa.array([], pa.int64()),
                      "n_empty": pa.array([], pa.int64()),
                      "ts_monotone": pa.array([], pa.bool_())})

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__part" not in g.column_names:
            return empty
        order, starts, lens = _order_and_segments(
            g, by, [idx_col, ts_col])
        nseg = len(starts)
        seg = np.repeat(np.arange(nseg, dtype=np.int64), lens)
        first = np.zeros(len(order), dtype=bool)
        first[starts] = True
        ti = g[idx_col].combine_chunks().to_numpy(
            zero_copy_only=False)[order]
        ts = g[ts_col].combine_chunks().to_numpy(
            zero_copy_only=False)[order]
        txt = g[text_col].combine_chunks()
        emp = pc.or_kleene(
            pc.is_null(txt),
            pc.equal(pc.fill_null(txt, ""), pa.scalar(""))
        ).to_numpy(zero_copy_only=False)[order]
        dup_pair = (ti[1:] == ti[:-1]) & ~first[1:]
        dup_turns = np.bincount(seg[1:][dup_pair], minlength=nseg)
        n_empty = np.bincount(seg[emp], minlength=nseg)
        viol = (ts[1:] < ts[:-1]) & ~first[1:]
        n_viol = np.bincount(seg[1:][viol], minlength=nseg)
        return pa.table({
            by: g[by].take(pa.array(order[starts])),
            "n_turns": pa.array(lens.astype(np.int64)),
            "dup_turns": pa.array(dup_turns.astype(np.int64)),
            "n_empty": pa.array(n_empty.astype(np.int64)),
            "ts_monotone": pa.array(n_viol == 0),
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__part").map_groups(merge,
                                          batch_format="pyarrow"))
