"""Stream-shaped operators over an ordered, partitioned event log.

Ray Data has no event-time watermarks; the engine treats the ``events``
table as a keyed log (partition by ``user_id``, order by ``ts`` within the
partition) and implements windows as grouped, sorted computations —
deterministic regardless of arrival order (the engine-wide ordering
contract, SURVEY §2.9):

- ``tumbling_window_agg``: fixed-size event-time windows per key, one
  shuffle (groupby on (key, window)) done as a vectorized map (window id
  computed per batch) + native aggregate.
- ``sessionize``: gap-based session ids per key — the order-sensitive
  scan runs inside ``groupby(key).map_groups`` over the ts-sorted group
  (same execution pattern as the chain scan), with the session-id rule
  expressible in SQL via lag + cumulative sum for the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Mean, Sum


def tumbling_window_agg(ds, window_sec: int = 3600,
                        key_col: str = "user_id", ts_col: str = "ts",
                        value_col: str = "value"):
    """→ Dataset(key, window_start (epoch sec), n_events, sum_value,
    mean_value). Window id is a vectorized per-batch computation; the only
    shuffle is the final grouped aggregate on (key, window_start)."""

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy()  # microseconds
        win = (ts // (window_sec * 1_000_000)) * window_sec
        return pa.table(
            {
                key_col: batch[key_col],
                "window_start": pa.array(win, type=pa.int64()),
                value_col: batch[value_col],
            }
        )

    return (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
            Mean(value_col, alias_name="mean_value"),
        )
    )


def _session_segments(g: pa.Table, ts_col: str, id_col: str,
                      gap_sec: int):
    """Shared ordering + boundary rule for the session operators: sort
    by (floored-second ts, id), mark a new session when the gap to the
    previous event exceeds ``gap_sec``. One definition so sessionize
    and session_stats can never disagree. Returns (order, ts_seconds
    sorted, new_session bool mask)."""
    ts = g[ts_col].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").astype(np.int64) // 1_000_000
    ids = g[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, ts))
    ts = ts[order]
    new_session = np.r_[True, np.diff(ts) > gap_sec]
    return order, ts, new_session


def sessionize(ds, gap_sec: int = 1800, key_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id"):
    """→ Dataset(event_id, user_id, session_id) where session_id increments
    within a user whenever the gap to the previous event exceeds
    ``gap_sec`` (1-based; events sorted by (ts, event_id) within user)."""

    def scan(g: pa.Table) -> pa.Table:
        order, _ts, new_session = _session_segments(
            g, ts_col, id_col, gap_sec)
        sel = pa.array(order)
        return pa.table(
            {
                id_col: g[id_col].take(sel),
                key_col: g[key_col].take(sel),
                "session_id": pa.array(np.cumsum(new_session)),
            }
        )

    return ds.groupby(key_col).map_groups(scan, batch_format="pyarrow")


def sliding_window_agg(ds, window_sec: int = 3600, hop_sec: int = 900,
                       key_col: str = "user_id", ts_col: str = "ts",
                       value_col: str = "value"):
    """→ Dataset(key, window_start (epoch sec), n_events, sum_value,
    mean_value) for HOPPING windows: starts at every multiple of
    ``hop_sec``, each ``window_sec`` long, so an event lands in up to
    ``ceil(window_sec / hop_sec)`` windows. The fan-out is a vectorized
    per-batch repeat (bounded ×m row expansion, no Python loop); the
    only shuffle is the same grouped aggregate tumbling uses. With
    ``hop_sec == window_sec`` this degenerates to tumbling."""
    if window_sec <= 0 or hop_sec <= 0:
        raise ValueError("window_sec and hop_sec must be positive")
    m = -(-window_sec // hop_sec)  # ceil
    hop_us = hop_sec * 1_000_000
    win_us = window_sec * 1_000_000

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({key_col: batch[key_col],
                             "window_start": pa.array([], pa.int64()),
                             value_col: batch[value_col]})
        tus = batch[ts_col].cast(pa.int64()).to_numpy()
        idx = tus // hop_us
        j = np.tile(np.arange(m, dtype=np.int64), n)
        rep = np.repeat(np.arange(n), m)
        starts = (idx[rep] - j)
        valid = starts * hop_us + win_us > tus[rep]
        rep, starts = rep[valid], starts[valid]
        ri = pa.array(rep)
        return pa.table(
            {key_col: batch[key_col].take(ri),
             "window_start": pa.array(starts * hop_sec),
             value_col: batch[value_col].take(ri)})

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
            Mean(value_col, alias_name="mean_value"),
        )
    )


def session_stats(ds, gap_sec: int = 1800, key_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id"):
    """→ Dataset(key, session_id, n_events, duration_sec): per-session
    aggregates in the same single per-key scan ``sessionize`` uses —
    no join back to the raw events. session_id is 1-based within the
    key; duration is last-event − first-event in whole seconds
    (exact int arithmetic on epoch seconds)."""

    def scan(g: pa.Table) -> pa.Table:
        _order, ts, new_session = _session_segments(
            g, ts_col, id_col, gap_sec)
        starts = np.flatnonzero(new_session)
        ends = np.r_[starts[1:], len(ts)]
        return pa.table({
            key_col: g[key_col].take(pa.array(starts)),
            "session_id": pa.array(
                np.arange(1, len(starts) + 1, dtype=np.int64)),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "duration_sec": pa.array(ts[ends - 1] - ts[starts]),
        })

    return ds.groupby(key_col).map_groups(scan, batch_format="pyarrow")
