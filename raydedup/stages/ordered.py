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
only the projected columns; at 100 TB the partition count is the only
knob (one partition must fit a worker; a single pathological hot key is
the documented limitation shared with asof_join).

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
