"""asof_join edge semantics: inclusive equal-ts match, deterministic
tie-break, unmatched-left nulls, one-sided keys, suffix collision."""

import pyarrow as pa
import pytest

import ray.data

from raydedup.stages.asof import asof_join


def _ds(rows: dict) -> "ray.data.Dataset":
    return ray.data.from_arrow(pa.table(rows))


def test_asof_basic_semantics(ray_session):
    left = _ds({"k": [1, 1, 1, 2, 3], "t": [5, 10, 20, 7, 1],
                "lid": [0, 1, 2, 3, 4]})
    right = _ds({"k": [1, 1, 2, 9], "t": [10, 15, 30, 0],
                 "rid": [100, 101, 102, 103], "v": [1.0, 2.0, 3.0, 4.0]})
    out = {r["lid"]: r for r in
           asof_join(left, right, by="k", on="t",
                     tie_col="rid").take_all()}
    assert len(out) == 5
    assert out[0]["r_rid"] is None          # t=5 before any right
    assert out[1]["r_rid"] == 100           # equal ts matches (inclusive)
    assert out[1]["r_t"] == 10 and out[1]["r_v"] == 1.0
    assert out[2]["r_rid"] == 101           # latest at-or-before 20
    assert out[3]["r_rid"] is None          # right t=30 is after left 7
    assert out[4]["r_rid"] is None          # key 3 has no right rows
    # right-only key 9 emits nothing
    assert {r["k"] for r in out.values()} == {1, 2, 3}


def test_asof_tiebreak_max_tie_col(ray_session):
    left = _ds({"k": [1], "t": [10], "lid": [0]})
    right = _ds({"k": [1, 1, 1], "t": [10, 10, 10], "rid": [7, 9, 8]})
    (r,) = asof_join(left, right, by="k", on="t",
                     tie_col="rid").take_all()
    assert r["r_rid"] == 9


def test_asof_string_by_key_and_partitioning(ray_session):
    import random

    rng = random.Random(7)
    lk = [f"u{rng.randrange(5)}" for _ in range(200)]
    lt = [rng.randrange(1000) for _ in range(200)]
    rk = [f"u{rng.randrange(5)}" for _ in range(80)]
    rt = [rng.randrange(1000) for _ in range(80)]
    left = _ds({"k": lk, "t": lt, "lid": list(range(200))}).repartition(7)
    right = _ds({"k": rk, "t": rt,
                 "rid": list(range(80))}).repartition(3)
    got = {r["lid"]: (r["r_rid"],) for r in
           asof_join(left, right, by="k", on="t",
                     tie_col="rid").take_all()}
    # brute-force oracle: max (t, rid) among right rows with t <= left t
    by_key = {}
    for k, t, rid in zip(rk, rt, range(80)):
        by_key.setdefault(k, []).append((t, rid))
    for lid, (k, t) in enumerate(zip(lk, lt)):
        cands = [(rt_, rid) for rt_, rid in by_key.get(k, [])
                 if rt_ <= t]
        expect = max(cands)[1] if cands else None
        assert got[lid] == (expect,), lid
    assert len(got) == 200


def test_asof_suffix_collision_raises(ray_session):
    left = _ds({"k": [1], "t": [1], "r_x": [1]})
    right = _ds({"k": [1], "t": [1], "x": [1]})
    with pytest.raises(ValueError):
        asof_join(left, right, by="k", on="t")
    with pytest.raises(ValueError):
        asof_join(left, right, by="k", on="t", rsuffix="z_",
                  tie_col="nope")


def test_interval_join_inclusive_bounds_and_m2m(ray_session):
    from raydedup.stages.asof import interval_join

    pts = _ds({"k": [1, 1, 1, 2], "t": [5, 10, 15, 5],
               "pid": [0, 1, 2, 3]})
    iv = _ds({"k": [1, 1, 2, 3], "s": [5, 10, 50, 0],
              "e": [10, 20, 60, 100], "iid": [100, 101, 102, 103]})
    got = {(r["pid"], r["r_iid"]) for r in
           interval_join(pts, iv, by="k", ts_col="t", start_col="s",
                         end_col="e").take_all()}
    # t=5 in [5,10] (start-inclusive); t=10 in both [5,10] (end-inclusive)
    # and [10,20]; t=15 only [10,20]; k=2 point at 5 misses [50,60];
    # k=3 interval has no points
    assert got == {(0, 100), (1, 100), (1, 101), (2, 101)}


def test_interval_join_mixed_lengths_band_filter(ray_session):
    import random

    from raydedup.stages.asof import interval_join

    rng = random.Random(11)
    # wildly mixed interval lengths: the band is set by the LONGEST, so
    # short intervals far before t enter the band and must be filtered
    ivs = [(rng.randrange(0, 10_000),
            rng.choice([1, 2, 5, 5000])) for _ in range(300)]
    iv = _ds({"k": [1] * 300, "s": [s for s, _ in ivs],
              "e": [s + l for s, l in ivs], "iid": list(range(300))})
    ts = [rng.randrange(0, 10_000) for _ in range(200)]
    pts = _ds({"k": [1] * 200, "t": ts, "pid": list(range(200))})
    got = {(r["pid"], r["r_iid"]) for r in
           interval_join(pts.repartition(5), iv.repartition(3), by="k",
                         ts_col="t", start_col="s",
                         end_col="e").take_all()}
    expect = {(p, i) for p, t in enumerate(ts)
              for i, (s, l) in enumerate(ivs) if s <= t <= s + l}
    assert got == expect


def test_asof_many_groups_share_partitions(ray_session):
    import random

    rng = random.Random(3)
    nl, nr = 400, 150
    lk = [rng.randrange(40) for _ in range(nl)]
    lt = [rng.randrange(100) for _ in range(nl)]
    rk = [rng.randrange(40) for _ in range(nr)]
    rt = [rng.randrange(100) for _ in range(nr)]
    left = _ds({"k": lk, "t": lt, "lid": list(range(nl))}).repartition(6)
    right = _ds({"k": rk, "t": rt,
                 "rid": list(range(nr))}).repartition(4)
    # num_partitions=4 << 40 keys: ~10 groups per partition — the sweep
    # must not leak a right row across the group boundary
    got = {r["lid"]: r["r_rid"] for r in
           asof_join(left, right, by="k", on="t", tie_col="rid",
                     num_partitions=4).take_all()}
    by_key = {}
    for k, t, rid in zip(rk, rt, range(nr)):
        by_key.setdefault(k, []).append((t, rid))
    for lid, (k, t) in enumerate(zip(lk, lt)):
        cands = [(rt_, rid) for rt_, rid in by_key.get(k, []) if rt_ <= t]
        assert got[lid] == (max(cands)[1] if cands else None), lid
    assert len(got) == nl


def test_interval_join_many_groups_share_partitions(ray_session):
    import random

    from raydedup.stages.asof import interval_join

    rng = random.Random(4)
    ivs = [(rng.randrange(30), rng.randrange(100),
            rng.randrange(1, 20)) for _ in range(120)]
    pts_ = [(rng.randrange(30), rng.randrange(100)) for _ in range(250)]
    iv = _ds({"k": [k for k, _, _ in ivs], "s": [s for _, s, _ in ivs],
              "e": [s + l for _, s, l in ivs],
              "iid": list(range(120))}).repartition(5)
    pts = _ds({"k": [k for k, _ in pts_], "t": [t for _, t in pts_],
               "pid": list(range(250))}).repartition(7)
    got = {(r["pid"], r["r_iid"]) for r in
           interval_join(pts, iv, by="k", ts_col="t", start_col="s",
                         end_col="e", num_partitions=3).take_all()}
    expect = {(p, i) for p, (pk, t) in enumerate(pts_)
              for i, (ik, s, l) in enumerate(ivs)
              if pk == ik and s <= t <= s + l}
    assert got == expect


def test_asof_null_keys_and_big_int64_ties(ray_session):
    # null by-keys never match (SQL semantics); int64 tie ids above 2^53
    # must not decay to float64 (adjacent ids would compare equal)
    big = 1 << 62
    left = _ds({"k": pa.array([1, None, 1], pa.int64()),
                "t": [10, 10, 10], "lid": [0, 1, 2]})
    right = _ds({"k": pa.array([1, None, 1], pa.int64()),
                 "t": [10, 10, 10],
                 "rid": pa.array([big + 1, big + 9, big + 2], pa.int64())})
    out = {r["lid"]: r["r_rid"] for r in
           asof_join(left, right, by="k", on="t",
                     tie_col="rid").take_all()}
    assert out[1] is None                 # null-key left: no match
    assert out[0] == big + 2 and out[2] == big + 2  # exact max tie, not
    # the float64-rounded arbitrary pick (big+1 == big+2 in float64)


def test_interval_join_null_keys(ray_session):
    from raydedup.stages.asof import interval_join

    pts = _ds({"k": pa.array([1, None], pa.int64()), "t": [5, 5],
               "pid": [0, 1]})
    iv = _ds({"k": pa.array([1, None], pa.int64()), "s": [0, 0],
              "e": [10, 10], "iid": [100, 101]})
    got = {(r["pid"], r["r_iid"]) for r in
           interval_join(pts, iv, by="k", ts_col="t", start_col="s",
                         end_col="e").take_all()}
    assert got == {(0, 100)}              # null keys joined nothing


def test_asof_time_buckets_equals_default_random(ray_session):
    import random

    rng = random.Random(31)
    n_l, n_r = 400, 150
    lk = [f"u{rng.randrange(6)}" for _ in range(n_l)]
    lt = [rng.randrange(1000) for _ in range(n_l)]
    rk = [f"u{rng.randrange(6)}" for _ in range(n_r)]
    rt = [rng.randrange(1000) for _ in range(n_r)]
    left = _ds({"k": lk, "t": lt, "lid": list(range(n_l))}).repartition(6)
    right = _ds({"k": rk, "t": rt, "rid": list(range(n_r)),
                 "v": [float(i) for i in range(n_r)]}).repartition(4)

    def run(**kw):
        return sorted(
            (r["lid"], r["r_rid"], r["r_t"], r["r_v"])
            for r in asof_join(left, right, by="k", on="t",
                               tie_col="rid", **kw).take_all())

    base = run()
    assert run(time_buckets=5, num_partitions=8) == base
    # B larger than the distinct-time count still works
    assert run(time_buckets=64, num_partitions=3) == base


def test_asof_time_buckets_hot_key(ray_session):
    import random

    rng = random.Random(47)
    # one pathological key holds ~all rows; ties included
    n = 3000
    lt = [rng.randrange(500) for _ in range(n)]
    rt = [rng.randrange(500) for _ in range(n // 3)]
    left = _ds({"k": ["hot"] * n, "t": lt,
                "lid": list(range(n))}).repartition(8)
    right = _ds({"k": ["hot"] * (n // 3), "t": rt,
                 "rid": list(range(n // 3))}).repartition(8)
    got = {r["lid"]: r["r_rid"] for r in
           asof_join(left, right, by="k", on="t", tie_col="rid",
                     time_buckets=16, num_partitions=4).take_all()}
    assert len(got) == n
    # brute-force oracle
    cands = sorted(zip(rt, range(len(rt))))
    import bisect

    for lid, t in enumerate(lt):
        i = bisect.bisect_right(cands, (t, float("inf")))
        expect = cands[i - 1][1] if i else None
        assert got[lid] == expect, (lid, t)


def test_asof_time_buckets_degenerate_cases(ray_session):
    # all timestamps equal (zero width); empty right side
    left = _ds({"k": [1, 2], "t": [7, 7], "lid": [0, 1]})
    right = _ds({"k": [1], "t": [7], "rid": [9]})
    out = {r["lid"]: r["r_rid"] for r in
           asof_join(left, right, by="k", on="t", tie_col="rid",
                     time_buckets=8).take_all()}
    assert out == {0: 9, 1: None}
    empty = _ds({"k": [1], "t": [1], "rid": [1]}).filter(
        expr="k == 99")
    out2 = [r for r in asof_join(left, empty, by="k", on="t",
                                 tie_col="rid",
                                 time_buckets=8).take_all()]
    assert sorted(r["lid"] for r in out2) == [0, 1]
    assert all(r["r_rid"] is None for r in out2)


def test_interval_time_buckets_equals_default(ray_session):
    import random

    from raydedup.stages.asof import interval_join

    rng = random.Random(59)
    n_p, n_i = 300, 120
    pk = [f"u{rng.randrange(5)}" for _ in range(n_p)]
    pt = [rng.randrange(2000) for _ in range(n_p)]
    ik = [f"u{rng.randrange(5)}" for _ in range(n_i)]
    ivs = [(rng.randrange(-100, 2100),
            rng.choice([1, 5, 40, 900])) for _ in range(n_i)]
    pts = _ds({"k": pk, "t": pt, "pid": list(range(n_p))}).repartition(5)
    iv = _ds({"k": ik, "s": [s for s, _ in ivs],
              "e": [s + w for s, w in ivs],
              "iid": list(range(n_i))}).repartition(3)

    def run(**kw):
        return sorted(
            (r["pid"], r["r_iid"])
            for r in interval_join(pts, iv, by="k", ts_col="t",
                                   start_col="s", end_col="e",
                                   **kw).take_all())

    base = run()
    assert base  # non-trivial fixture
    assert run(time_buckets=6, num_partitions=4) == base
    assert run(time_buckets=64, num_partitions=2) == base


def test_interval_time_buckets_hot_key(ray_session):
    import random

    from raydedup.stages.asof import interval_join

    rng = random.Random(61)
    n = 2000
    pts = _ds({"k": ["hot"] * n, "t": [rng.randrange(1000)
                                       for _ in range(n)],
               "pid": list(range(n))}).repartition(8)
    ivs = [(rng.randrange(1000), rng.randrange(1, 60))
           for _ in range(n // 4)]
    iv = _ds({"k": ["hot"] * (n // 4), "s": [s for s, _ in ivs],
              "e": [s + w for s, w in ivs],
              "iid": list(range(n // 4))}).repartition(4)
    got = sorted((r["pid"], r["r_iid"]) for r in interval_join(
        pts, iv, by="k", ts_col="t", start_col="s", end_col="e",
        time_buckets=16, num_partitions=4).take_all())
    base = sorted((r["pid"], r["r_iid"]) for r in interval_join(
        pts, iv, by="k", ts_col="t", start_col="s",
        end_col="e").take_all())
    assert got == base
