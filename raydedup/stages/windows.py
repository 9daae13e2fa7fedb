"""Stream-shaped operators over an ordered, partitioned event log.

Ray Data has no event-time watermarks; the engine treats the ``events``
table as a keyed log (partition by ``user_id``, order by ``ts`` within the
partition) and implements windows as grouped, sorted computations —
deterministic regardless of arrival order (the engine-wide ordering
contract, SURVEY §2.9):

- ``tumbling_window_agg``: fixed-size event-time windows per key, one
  shuffle (groupby on (key, window)) done as a vectorized map (window id
  computed per batch) + native aggregate.
- ``sessionize`` / ``session_stats``: gap-based session ids per key —
  the order-sensitive scan runs as a hash-PARTITION sweep (the
  ``stages/ordered.py`` execution shape): rows are tagged
  ``hash(key) % num_partitions`` and one ``map_groups`` call per
  PARTITION handles every key in it with a single lexsort + boundary
  masks — O(n log n) numpy work per partition, not a Python call per
  key (millions of keys at 100 TB). The session-id rule stays
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


def _session_sweep(ds, gap_sec: int, key_col: str, ts_col: str,
                   id_col: str, num_partitions: int, stats: bool):
    """Shared partition sweep for the session operators: one lexsort
    (key-code major, then floored-second ts, then id) per hash
    PARTITION marks every key's session boundaries at once — a new
    session starts at each key change or when the gap to the previous
    event exceeds ``gap_sec``. One definition so sessionize and
    session_stats can never disagree; a hot key costs one partition's
    sort, never a per-key Python call."""
    from raydedup.stages.asof import _group_codes, _part_array

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))

    def tag(batch: pa.Table) -> pa.Table:
        t = pa.table({c: batch[c] for c in (id_col, key_col, ts_col)})
        return t.append_column(
            "__part", _part_array(t[key_col], num_partitions))

    def empty() -> pa.Table:
        if stats:
            return pa.table({key_col: pa.array([], types[key_col]),
                             "session_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "duration_sec": pa.array([], pa.int64())})
        return pa.table({id_col: pa.array([], types[id_col]),
                         key_col: pa.array([], types[key_col]),
                         "session_id": pa.array([], pa.int64())})

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__part" not in g.column_names:
            return empty()
        codes, _ = _group_codes(g[key_col])
        ts = g[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64) // 1_000_000
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, codes))
        codes_s, ts_s = codes[order], ts[order]
        key_change = np.r_[True, codes_s[1:] != codes_s[:-1]]
        new_session = key_change | np.r_[True, np.diff(ts_s) > gap_sec]
        sess = np.cumsum(new_session)  # global 1-based
        key_starts = np.flatnonzero(key_change)
        key_lens = np.diff(np.r_[key_starts, len(ts_s)])
        # session_id restarts at 1 within each key
        session_id = sess - np.repeat(sess[key_starts], key_lens) + 1
        if not stats:
            sel = pa.array(order)
            return pa.table({id_col: g[id_col].take(sel),
                             key_col: g[key_col].take(sel),
                             "session_id": pa.array(session_id)})
        starts = np.flatnonzero(new_session)
        ends = np.r_[starts[1:], len(ts_s)]
        return pa.table({
            key_col: g[key_col].take(pa.array(order[starts])),
            "session_id": pa.array(session_id[starts]),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "duration_sec": pa.array(ts_s[ends - 1] - ts_s[starts]),
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__part").map_groups(merge, batch_format="pyarrow"))


def sessionize(ds, gap_sec: int = 1800, key_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               num_partitions: int = 64):
    """→ Dataset(event_id, user_id, session_id) where session_id increments
    within a user whenever the gap to the previous event exceeds
    ``gap_sec`` (1-based; events sorted by (ts, event_id) within user)."""
    return _session_sweep(ds, gap_sec, key_col, ts_col, id_col,
                          num_partitions, stats=False)


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
                  ts_col: str = "ts", id_col: str = "event_id",
                  num_partitions: int = 64):
    """→ Dataset(key, session_id, n_events, duration_sec): per-session
    aggregates in the same single partition sweep ``sessionize`` uses —
    no join back to the raw events. session_id is 1-based within the
    key; duration is last-event − first-event in whole seconds
    (exact int arithmetic on epoch seconds)."""
    return _session_sweep(ds, gap_sec, key_col, ts_col, id_col,
                          num_partitions, stats=True)


def first_conversion(ds, from_type: str, to_type: str,
                     within_sec: int, key_col: str = "user_id",
                     ts_col: str = "ts", type_col: str = "event_type"):
    """→ Dataset(key, from_ts, to_ts, latency_sec): per key, the FIRST
    ``from_type`` event and the first ``to_type`` event at-or-after it
    within ``within_sec`` (whole-second event times, the session-family
    contract); keys that never convert are omitted — the classic funnel
    conversion measure.

    Scale shape: two native keyed groupbys (min from-ts per key; min
    to-ts per (key) over candidates) around one distributed hash join —
    the to-side is pre-filtered to ``to_type`` rows only, so the join
    moves conversion-relevant rows, never the corpus."""
    import ray
    from ray.data.aggregate import Min

    import ray.data

    def to_secs(batch: pa.Table, want: str) -> pa.Table:
        # null keys can never equi-join ⇒ never convert (exact SQL
        # semantics); they would also crash Ray's sort-based groupby
        t = batch.filter(pc.and_(
            pc.equal(pc.fill_null(batch[type_col], ""), pa.scalar(want)),
            pc.is_valid(batch[key_col])))
        # integer microseconds // 1e6 (positive epoch ⇒ truncation
        # IS floor, matching the oracle's epoch_us(ts) // 1000000)
        secs = pc.divide(pc.cast(t[ts_col], pa.int64()),
                         pa.scalar(1_000_000, pa.int64()))
        return pa.table({key_col: t[key_col], "sec": secs})

    base = ds.select_columns([key_col, ts_col, type_col])
    firsts = (base.map_batches(lambda b: to_secs(b, from_type),
                               batch_format="pyarrow")
              .groupby(key_col).aggregate(Min("sec", alias_name="from_sec"))
              .materialize())
    n_firsts = firsts.count()
    if n_firsts == 0:
        return ray.data.from_arrow(pa.table(
            {key_col: pa.array([], pa.int64()),
             "from_sec": pa.array([], pa.int64()),
             "to_sec": pa.array([], pa.int64()),
             "latency_sec": pa.array([], pa.int64())}))
    tos = base.map_batches(lambda b: to_secs(b, to_type),
                           batch_format="pyarrow")

    # partitions sized so every hash partition is statistically
    # non-empty (Ray 2.49 mishandles all-empty join partitions) and
    # capped at 2x CPUs (its aggregator pool deadlocks far above that)
    from raydedup.util import join_partitions

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_parts = min(join_partitions(n_firsts), max(2, 2 * ncpu))
    joined = tos.join(firsts, join_type="inner",
                      num_partitions=n_parts, on=(key_col,))

    def in_window(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "from_sec": pa.array([], pa.int64()),
                             "sec": pa.array([], pa.int64())})
        ok = pc.and_(
            pc.greater_equal(batch["sec"], batch["from_sec"]),
            pc.less_equal(batch["sec"],
                          pc.add(batch["from_sec"],
                                 pa.scalar(within_sec, pa.int64()))))
        return batch.filter(ok).select([key_col, "from_sec", "sec"])

    conv = (joined.map_batches(in_window, batch_format="pyarrow")
            .groupby(key_col).aggregate(Min("sec", alias_name="to_sec"),
                                        Min("from_sec",
                                            alias_name="from_sec")))

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "to_sec" not in batch.column_names:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "from_sec": pa.array([], pa.int64()),
                             "to_sec": pa.array([], pa.int64()),
                             "latency_sec": pa.array([], pa.int64())})
        return pa.table({
            key_col: batch[key_col],
            "from_sec": batch["from_sec"],
            "to_sec": batch["to_sec"],
            "latency_sec": pc.subtract(batch["to_sec"],
                                       batch["from_sec"]),
        })

    return conv.map_batches(finish, batch_format="pyarrow")
