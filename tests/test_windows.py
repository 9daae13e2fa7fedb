"""Sessionization partition-sweep tests (VERDICT r2 item 4): the
gap-based session scan must be a hash-PARTITION sweep (one lexsort per
partition handles every key), never a Python call per user key — and a
single dominant hot key must produce identical output to the brute
per-key reference (bin/ reference has no sessions; this is an engine
addition, SURVEY §2.9)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from raydedup.stages.windows import session_stats, sessionize


def brute_sessions(users, tss, ids, gap_sec):
    """Per-key reference: sort each user's events by (floored-second
    ts, id), new session when gap > gap_sec. Returns
    {event_id: (user, session_id)} and per-session stats rows."""
    by_user: dict = {}
    for u, t, i in zip(users, tss, ids):
        by_user.setdefault(u, []).append((t // 1_000_000, i))
    labels = {}
    stats = []
    for u, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        start = None
        n = 0
        for t, i in evs:
            if prev is None or t - prev > gap_sec:
                if prev is not None:
                    stats.append((u, sid, n, prev - start))
                sid += 1
                start = t
                n = 0
            labels[i] = (u, sid)
            n += 1
            prev = t
        stats.append((u, sid, n, prev - start))
    return labels, stats


def _fixture(hot_frac=0.0, n=4000, seed=7):
    rng = np.random.default_rng(seed)
    n_hot = int(n * hot_frac)
    users = np.r_[np.zeros(n_hot, np.int64),
                  rng.integers(1, 50, n - n_hot)]
    # microsecond timestamps with gaps straddling the 600 s threshold
    tss = rng.integers(0, 3_000_000, n) * 1_000_000 + rng.integers(
        0, 1_000_000, n)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({
        "event_id": pa.array(ids),
        "user_id": pa.array(users),
        "ts": pa.array(tss.astype("datetime64[us]")),
    })
    return users.tolist(), tss.tolist(), ids.tolist(), tbl


@pytest.mark.parametrize("hot_frac", [0.0, 0.9])
def test_sessionize_matches_brute_reference(ray_session, hot_frac):
    users, tss, ids, tbl = _fixture(hot_frac)
    labels, stats = brute_sessions(users, tss, ids, gap_sec=600)
    ds = ray.data.from_arrow(tbl)
    got = {r["event_id"]: (r["user_id"], r["session_id"])
           for r in sessionize(ds, gap_sec=600,
                               num_partitions=8).take_all()}
    assert got == labels
    got_stats = sorted(
        (r["user_id"], r["session_id"], r["n_events"], r["duration_sec"])
        for r in session_stats(ds, gap_sec=600,
                               num_partitions=8).take_all())
    assert got_stats == sorted(stats)


def test_sessionize_partition_count_invariant(ray_session):
    """Output must not depend on the partition fan-out."""
    _, _, _, tbl = _fixture(hot_frac=0.5, n=800)
    ds = ray.data.from_arrow(tbl)
    outs = []
    for np_ in (1, 3, 16):
        outs.append(sorted(
            (r["event_id"], r["user_id"], r["session_id"])
            for r in sessionize(ds, gap_sec=600,
                                num_partitions=np_).take_all()))
    assert outs[0] == outs[1] == outs[2]


def test_first_conversion_vs_brute(ray_session):
    """Funnel conversion (first A -> first B within W) against a brute
    per-user scan, including users with B before A (no conversion),
    boundary-exact windows, and users with only one side."""
    from raydedup.stages.windows import first_conversion

    rng = np.random.default_rng(9)
    n = 1200
    users = rng.integers(0, 60, n)
    types = rng.choice(["click", "purchase", "view"], n,
                       p=[0.4, 0.2, 0.4])
    secs = rng.integers(0, 200_000, n)
    tbl = pa.table({
        "user_id": pa.array(users),
        "event_type": pa.array(types.tolist()),
        "ts": pa.array((secs * 1_000_000
                        + rng.integers(0, 1_000_000, n)
                        ).astype("datetime64[us]")),
    })
    W = 50_000
    got = {r["user_id"]: (r["from_sec"], r["to_sec"], r["latency_sec"])
           for r in first_conversion(
               ray.data.from_arrow(tbl).repartition(4), "click",
               "purchase", within_sec=W).take_all()}
    want = {}
    for u in set(users.tolist()):
        clicks = sorted(int(s) for s, uu, t in zip(secs, users, types)
                        if uu == u and t == "click")
        if not clicks:
            continue
        f = clicks[0]
        purch = sorted(int(s) for s, uu, t in zip(secs, users, types)
                       if uu == u and t == "purchase"
                       and f <= int(s) <= f + W)
        if purch:
            want[u] = (f, purch[0], purch[0] - f)
    assert got == want
    assert want  # fixture actually converts someone


def test_part_array_string_keys_match_historical_formula(ray_session):
    """_part_array's dictionary-encoded md5 path (VERDICT r2 item 5)
    must stay byte-identical to the per-row formula it replaced —
    checkpoints and bucketed scale paths depend on stable placement."""
    from raydedup.stages.asof import _part_array

    keys = ["u%03d" % (i % 37) for i in range(500)] + [None, "", "x"]
    col = pa.chunked_array([pa.array(keys, pa.string())])
    got = _part_array(col, 13).to_pylist()
    want = [0 if k is None else
            int.from_bytes(hashlib.md5(str(k).encode()).digest()[:4],
                           "big") % 13 for k in keys]
    assert got == want
