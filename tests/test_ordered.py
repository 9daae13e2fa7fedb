"""Per-key ordered scans (running_totals / lag_delta) vs brute-force
oracles, including multi-block partitioning, string keys, null keys
(own group — window semantics), and exact integer sums."""

import random

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from raydedup.stages.ordered import lag_delta, running_totals


def _ds(rows: dict) -> "ray.data.Dataset":
    return ray.data.from_arrow(pa.table(rows))


def test_running_totals_basic(ray_session):
    ds = _ds({"k": [1, 1, 1, 2, 2], "t": [3, 1, 2, 5, 4],
              "rid": [0, 1, 2, 3, 4], "v": [10, 20, 30, 40, 50]})
    out = {r["rid"]: r for r in running_totals(
        ds, by="k", order_cols=["t", "rid"], value_col="v").take_all()}
    # key 1 ordered by t: rid 1 (v=20), rid 2 (v=30), rid 0 (v=10)
    assert (out[1]["running_n"], out[1]["running_sum"]) == (1, 20)
    assert (out[2]["running_n"], out[2]["running_sum"]) == (2, 50)
    assert (out[0]["running_n"], out[0]["running_sum"]) == (3, 60)
    # key 2 ordered by t: rid 4 then rid 3
    assert (out[4]["running_n"], out[4]["running_sum"]) == (1, 50)
    assert (out[3]["running_n"], out[3]["running_sum"]) == (2, 90)


def test_running_totals_random_vs_oracle(ray_session):
    rng = random.Random(11)
    n = 500
    k = [f"u{rng.randrange(9)}" for _ in range(n)]
    t = [rng.randrange(40) for _ in range(n)]  # many ties → tie col used
    v = [rng.randrange(-50, 100) for _ in range(n)]
    ds = _ds({"k": k, "t": t, "rid": list(range(n)),
              "v": v}).repartition(7)
    got = {r["rid"]: (r["running_n"], r["running_sum"]) for r in
           running_totals(ds, by="k", order_cols=["t", "rid"],
                          value_col="v", num_partitions=5).take_all()}
    assert len(got) == n
    rows = sorted(zip(k, t, range(n), v))
    seen = {}
    for kk, _tt, rid, vv in rows:
        cnt, s = seen.get(kk, (0, 0))
        seen[kk] = (cnt + 1, s + vv)
        assert got[rid] == seen[kk], rid


def test_running_totals_null_key_groups_together(ray_session):
    ds = _ds({"k": pa.array([None, 1, None], type=pa.int64()),
              "t": [1, 1, 2], "rid": [0, 1, 2], "v": [5, 7, 9]})
    out = {r["rid"]: r for r in running_totals(
        ds, by="k", order_cols=["t", "rid"], value_col="v").take_all()}
    # SQL PARTITION BY: nulls form one group (unlike join keys)
    assert (out[0]["running_n"], out[0]["running_sum"]) == (1, 5)
    assert (out[2]["running_n"], out[2]["running_sum"]) == (2, 14)
    assert (out[1]["running_n"], out[1]["running_sum"]) == (1, 7)


def test_running_totals_rejects_null_order_and_collision(ray_session):
    ds = _ds({"k": [1], "t": pa.array([None], type=pa.int64()),
              "v": [1], "running_n": [0]})
    with pytest.raises(ValueError, match="collides"):
        running_totals(ds, by="k", order_cols=["t"], value_col="v")
    ds2 = _ds({"k": [1, 1], "t": pa.array([1, None], type=pa.int64()),
               "v": [1, 2]})
    with pytest.raises(Exception, match="null values in order col"):
        running_totals(ds2, by="k", order_cols=["t"],
                       value_col="v").take_all()


def test_lag_delta_timestamps_and_ints(ray_session):
    ts = pa.array(np.array([100, 250, 250, 900], dtype="datetime64[us]"))
    ds = _ds({"k": [1, 1, 1, 2], "ts": ts, "rid": [0, 1, 2, 3]})
    out = {r["rid"]: r["gap"] for r in lag_delta(
        ds, by="k", ts_col="ts", tie_cols=["rid"]).take_all()}
    assert out[0] is None          # first row of key 1
    assert out[1] == 150           # 250 - 100 us
    assert out[2] == 0             # equal ts, ordered by rid
    assert out[3] is None          # only row of key 2
    # plain int64 column works too
    ds2 = _ds({"k": [7, 7], "t": [5, 12], "rid": [0, 1]})
    out2 = {r["rid"]: r["gap"] for r in lag_delta(
        ds2, by="k", ts_col="t", tie_cols=["rid"]).take_all()}
    assert out2 == {0: None, 1: 7}


def test_lag_delta_random_vs_oracle(ray_session):
    rng = random.Random(23)
    n = 400
    k = [rng.randrange(6) for _ in range(n)]
    t = [rng.randrange(30) for _ in range(n)]
    ds = _ds({"k": k, "t": t, "rid": list(range(n))}).repartition(5)
    got = {r["rid"]: r["gap"] for r in lag_delta(
        ds, by="k", ts_col="t", tie_cols=["rid"],
        num_partitions=3).take_all()}
    assert len(got) == n
    prev = {}
    for kk, tt, rid in sorted(zip(k, t, range(n))):
        if kk in prev:
            assert got[rid] == tt - prev[kk], rid
        else:
            assert got[rid] is None, rid
        prev[kk] = tt


def test_rolling_totals_basic_and_oracle(ray_session):
    # key 1 ordered: v = 10, 20, 30, 40 → k=2 sums 10, 30, 50, 70
    ds = _ds({"k": [1, 1, 1, 1, 2], "t": [1, 2, 3, 4, 1],
              "rid": [0, 1, 2, 3, 4], "v": [10, 20, 30, 40, 7]})
    from raydedup.stages.ordered import rolling_totals

    out = {r["rid"]: (r["rolling_n"], r["rolling_sum"])
           for r in rolling_totals(ds, by="k", order_cols=["t", "rid"],
                                   value_col="v",
                                   window_rows=2).take_all()}
    assert out == {0: (1, 10), 1: (2, 30), 2: (2, 50), 3: (2, 70),
                   4: (1, 7)}


def test_rolling_totals_random_vs_oracle(ray_session):
    from raydedup.stages.ordered import rolling_totals

    rng = random.Random(13)
    n, k = 400, 5
    key = [f"u{rng.randrange(7)}" for _ in range(n)]
    t = [rng.randrange(50) for _ in range(n)]
    v = [rng.randrange(-20, 50) for _ in range(n)]
    ds = _ds({"k": key, "t": t, "rid": list(range(n)),
              "v": v}).repartition(6)
    got = {r["rid"]: (r["rolling_n"], r["rolling_sum"]) for r in
           rolling_totals(ds, by="k", order_cols=["t", "rid"],
                          value_col="v", window_rows=k,
                          num_partitions=4).take_all()}
    assert len(got) == n
    seqs = {}
    for kk, _tt, rid, vv in sorted(zip(key, t, range(n), v)):
        seq = seqs.setdefault(kk, [])
        seq.append(vv)
        w = seq[-k:]
        assert got[rid] == (len(w), sum(w)), rid


def test_rolling_totals_window_one_and_validation(ray_session):
    from raydedup.stages.ordered import rolling_totals

    ds = _ds({"k": [1, 1], "t": [1, 2], "rid": [0, 1], "v": [3, 4]})
    out = {r["rid"]: (r["rolling_n"], r["rolling_sum"])
           for r in rolling_totals(ds, by="k", order_cols=["t"],
                                   value_col="v",
                                   window_rows=1).take_all()}
    assert out == {0: (1, 3), 1: (1, 4)}
    with pytest.raises(ValueError, match="window_rows"):
        rolling_totals(ds, by="k", order_cols=["t"], value_col="v",
                       window_rows=0)


def test_distinct_count_by_group(ray_session):
    from raydedup.stages.stats import distinct_count_by_group

    rng = random.Random(5)
    g = [f"g{rng.randrange(4)}" for _ in range(300)]
    v = [rng.randrange(40) for _ in range(300)]
    ds = _ds({"g": g, "v": v}).repartition(6)
    got = {r["g"]: r["n_distinct"] for r in
           distinct_count_by_group(ds, "g", "v").take_all()}
    brute = {}
    for gg, vv in zip(g, v):
        brute.setdefault(gg, set()).add(vv)
    assert got == {k: len(s) for k, s in brute.items()}
    # int group keys exercise the zero-row schema fallback type
    ds2 = _ds({"g": [1, 1, 2], "v": ["a", "a", "b"]})
    got2 = {r["g"]: r["n_distinct"] for r in
            distinct_count_by_group(ds2, "g", "v").take_all()}
    assert got2 == {1: 1, 2: 1}


def test_stratified_sample_matches_per_group_rule(ray_session):
    from raydedup.stages.textstats import (
        _hash60,
        sample_by_hash,
        stratified_sample,
    )

    n = 400
    g = [["a", "b", "c", "d"][i % 4] for i in range(n)]
    ds = _ds({"g": g, "key": [str(i) for i in range(n)]})
    rates = {"a": 1.0, "b": 0.5, "c": 0.0}
    kept = {r["key"]: r["g"] for r in stratified_sample(
        ds, "g", "key", rates, default_rate=0.25).take_all()}
    h = _hash60([str(i) for i in range(n)], b"s0:")
    for i in range(n):
        rate = rates.get(g[i], 0.25)
        expect = bool(h[i] < np.uint64(int(rate * (1 << 60))))
        assert (str(i) in kept) == expect, i
    assert set(kept.values()) <= {"a", "b", "d"}  # c rate 0 → dropped
    # empty rates map degenerates to flat sampling
    flat = {r["key"] for r in stratified_sample(
        ds, "g", "key", {}, default_rate=0.25).take_all()}
    base = {r["key"] for r in sample_by_hash(
        ds, "key", 0.25).take_all()}
    assert flat == base
    with pytest.raises(ValueError, match="rate"):
        stratified_sample(ds, "g", "key", {"a": 1.5})


def test_approx_distinct_by_group(ray_session):
    from raydedup.stages.stats import approx_distinct_by_group

    # int values (splitmix64 path) with very different cardinalities
    g, v = [], []
    for i in range(20000):
        g.append("big")
        v.append(i % 17000)
    for i in range(3000):
        g.append("mid")
        v.append(i % 800)
    g += ["tiny"] * 50
    v += list(range(10)) * 5
    ds = _ds({"g": g, "v": v}).repartition(9)
    got = {r["g"]: r["approx_distinct"] for r in
           approx_distinct_by_group(ds, "g", "v").take_all()}
    for name, true in (("big", 17000), ("mid", 800), ("tiny", 10)):
        assert abs(got[name] - true) / true < 0.05, (name, got[name])
    # string values (md5 path) + determinism across partitionings
    ds2 = _ds({"g": ["s"] * 5000,
               "v": [f"val{i % 1200}" for i in range(5000)]})
    e1 = approx_distinct_by_group(ds2, "g", "v").take_all()[0]
    e2 = approx_distinct_by_group(
        ds2.repartition(7), "g", "v").take_all()[0]
    assert e1["approx_distinct"] == e2["approx_distinct"]
    assert abs(e1["approx_distinct"] - 1200) / 1200 < 0.05
    with pytest.raises(ValueError, match="precision"):
        approx_distinct_by_group(ds2, "g", "v", precision=2)


def test_review_fixes_null_and_edge_semantics(ray_session):
    from raydedup.stages.ordered import assemble_by_key, rolling_totals
    from raydedup.stages.stats import (
        approx_distinct_by_group,
        distinct_count_by_group,
    )

    # null value_col raises instead of silently poisoning prefix sums
    ds = _ds({"k": [1, 1], "t": [1, 2],
              "v": pa.array([1.0, None])})
    with pytest.raises(Exception, match="null values in value col"):
        running_totals(ds, by="k", order_cols=["t"],
                       value_col="v").take_all()
    with pytest.raises(Exception, match="null values in value col"):
        rolling_totals(ds, by="k", order_cols=["t"], value_col="v",
                       window_rows=2).take_all()
    # COUNT(DISTINCT) excludes nulls (SQL semantics) — both exact + HLL
    ds2 = _ds({"g": ["a", "a", "a"],
               "v": pa.array([1, None, 1], type=pa.int64())})
    (row,) = distinct_count_by_group(ds2, "g", "v").take_all()
    assert (row["g"], row["n_distinct"]) == ("a", 1)
    ds3 = _ds({"g": ["a", "a", "b"],
               "v": pa.array([None, "x", None])})
    got = {r["g"]: r["approx_distinct"] for r in
           approx_distinct_by_group(ds3, "g", "v").take_all()}
    # all-null group 'b' contributes an empty register set → estimate 0
    assert got["a"] == 1 and got.get("b", 0) == 0


def test_review_fix_interval_inverted_and_asof_wide_range(ray_session):
    import datetime

    from raydedup.stages.asof import asof_join, interval_join

    # inverted interval (end < start): no match on BOTH paths, no crash
    pts = _ds({"k": [1], "t": [500], "pid": [0]})
    iv = _ds({"k": [1, 1], "s": [900, 400], "e": [100, 600],
              "iid": [7, 8]})
    for tb in (None, 8):
        got = [(r["pid"], r["r_iid"]) for r in interval_join(
            pts, iv, by="k", ts_col="t", start_col="s", end_col="e",
            time_buckets=tb).take_all()]
        assert got == [(0, 8)], tb
    # centuries-wide timestamp range: (t-lo)*B would wrap int64; the
    # float bucketing keeps the bucketed path equal to the default
    wide = [datetime.datetime(1970, 1, 1),
            datetime.datetime(2200, 1, 1),
            datetime.datetime(2260, 1, 1)]
    left = _ds({"k": [1, 1, 1],
                "t": pa.array(np.array(wide, dtype="datetime64[us]")),
                "lid": [0, 1, 2]})
    right = _ds({"k": [1, 1],
                 "t": pa.array(np.array(wide[:2],
                                        dtype="datetime64[us]")),
                 "rid": [10, 11]})
    base = sorted((r["lid"], r["r_rid"]) for r in asof_join(
        left, right, by="k", on="t", tie_col="rid").take_all())
    buck = sorted((r["lid"], r["r_rid"]) for r in asof_join(
        left, right, by="k", on="t", tie_col="rid",
        time_buckets=4096).take_all())
    assert buck == base == [(0, 10), (1, 11), (2, 11)]


def test_mode_by_group(ray_session):
    from raydedup.stages.stats import mode_by_group

    ds = _ds({"g": ["a"] * 5 + ["b"] * 4 + ["c"],
              "v": pa.array(["x", "x", "y", "y", "z",
                             "q", None, "q", "r", "s"])}).repartition(4)
    got = {r["g"]: (r["mode_value"], r["mode_count"]) for r in
           mode_by_group(ds, "g", "v").take_all()}
    # a: x and y tie at 2 → smallest value wins; b: null excluded
    assert got == {"a": ("x", 2), "b": ("q", 2), "c": ("s", 1)}
    # int values + single group
    ds2 = _ds({"g": [1, 1, 1], "v": [7, 9, 9]})
    (r,) = mode_by_group(ds2, "g", "v").take_all()
    assert (r["g"], r["mode_value"], r["mode_count"]) == (1, 9, 2)


def test_windowed_totals_hypothesis(ray_session):
    """Property: running/rolling totals match a brute-force per-key
    scan for arbitrary key/order/value combinations (negative values,
    heavy ties, singleton and giant keys)."""
    from hypothesis import given, settings, strategies as st

    from raydedup.stages.ordered import rolling_totals

    @settings(max_examples=15, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 4),      # key
                      st.integers(0, 6),      # order value (ties!)
                      st.integers(-50, 50)),  # value
            min_size=1, max_size=60),
        k=st.integers(1, 5),
    )
    def check(rows, k):
        key = [r[0] for r in rows]
        t = [r[1] for r in rows]
        v = [r[2] for r in rows]
        ds = _ds({"k": key, "t": t, "rid": list(range(len(rows))),
                  "v": v})
        run = {r["rid"]: (r["running_n"], r["running_sum"]) for r in
               running_totals(ds, by="k", order_cols=["t", "rid"],
                              value_col="v",
                              num_partitions=3).take_all()}
        roll = {r["rid"]: (r["rolling_n"], r["rolling_sum"]) for r in
                rolling_totals(ds, by="k", order_cols=["t", "rid"],
                               value_col="v", window_rows=k,
                               num_partitions=3).take_all()}
        seqs = {}
        for kk, _tt, rid, vv in sorted(zip(key, t, range(len(rows)), v)):
            seq = seqs.setdefault(kk, [])
            seq.append(vv)
            assert run[rid] == (len(seq), sum(seq)), rid
            w = seq[-k:]
            assert roll[rid] == (len(w), sum(w)), rid

    check()


def test_grouped_corr(ray_session):
    from raydedup.stages.stats import grouped_corr

    # perfect positive, perfect negative, zero-variance, singleton,
    # and a null-holed group
    ds = _ds({"g": ["p", "p", "p", "q", "q", "z", "z", "s", "h", "h",
                    "h"],
              "x": pa.array([1, 2, 3, 1, 2, 5, 5, 1, 1, 2, None],
                            type=pa.int64()),
              "y": pa.array([10, 20, 30, 9, 3, 1, 2, 4, 1, 3, 7],
                            type=pa.int64())}).repartition(3)
    got = {r["g"]: (r["n"], r["corr"]) for r in
           grouped_corr(ds, "g", "x", "y").take_all()}
    assert got["p"][0] == 3 and abs(got["p"][1] - 1.0) < 1e-12
    assert got["q"][0] == 2 and abs(got["q"][1] + 1.0) < 1e-12
    assert got["z"] == (2, None)      # zero x-variance
    assert got["s"] == (1, None)      # n < 2
    assert got["h"][0] == 2           # null row excluded
    with pytest.raises(ValueError, match="integer columns"):
        grouped_corr(_ds({"g": [1], "x": [1.0], "y": [1]}),
                     "g", "x", "y")


def test_histogram_by_group(ray_session):
    from raydedup.stages.stats import histogram_by_group

    ds = _ds({"g": ["a"] * 6 + ["b"],
              "v": pa.array([-5, 0, 9, 10, 99, 250, 15],
                            type=pa.int64())}).repartition(3)
    got = {(r["g"], r["bin"]): (r["bin_lo"], r["n"]) for r in
           histogram_by_group(ds, "g", "v", lo=0, hi=100,
                              nbins=10).take_all()}
    # -5 clamps to bin 0; 250 clamps to bin 9; 0 and 9 share bin 0
    assert got[("a", 0)] == (0.0, 3)
    assert got[("a", 1)] == (10.0, 1)
    assert got[("a", 9)] == (90.0, 2)
    assert got[("b", 1)] == (10.0, 1)
    assert sum(n for _, n in got.values()) == 7
    with pytest.raises(ValueError, match="nbins"):
        histogram_by_group(ds, "g", "v", lo=5, hi=5, nbins=3)


def test_chunk_text(ray_session):
    from raydedup.stages.textstats import chunk_text

    ds = _ds({"doc_id": [1, 2, 3],
              "text": ["abcdefghij", "xy", ""]})
    got = sorted((r["doc_id"], r["chunk_idx"], r["chunk"]) for r in
                 chunk_text(ds, size=4, stride=3).take_all())
    assert got == [(1, 0, "abcd"), (1, 1, "defg"), (1, 2, "ghij"),
                   (1, 3, "j"), (2, 0, "xy")]
    # multibyte text slices by codepoints, not bytes
    ds2 = _ds({"doc_id": [7], "text": ["αβγδε"]})
    got2 = sorted((r["chunk_idx"], r["chunk"]) for r in
                  chunk_text(ds2, size=2, stride=2).take_all())
    assert got2 == [(0, "αβ"), (1, "γδ"), (2, "ε")]
    with pytest.raises(ValueError, match="size and stride"):
        chunk_text(ds, size=0, stride=1)


def test_rollup_counts(ray_session):
    from raydedup.stages.stats import rollup_counts

    ds = _ds({"g": ["a", "a", "b"],
              "v": pa.array([5, None, 7], type=pa.int64())}
             ).repartition(2)
    got = {r["g"]: (r["n_rows"], r["sum_value"]) for r in
           rollup_counts(ds, "g", "v").take_all()}
    # null counts toward n_rows but adds 0 to the sum
    assert got == {"a": (2, 5), "b": (1, 7), "__all__": (3, 12)}


def test_running_totals_bucketed_equals_default(ray_session):
    from raydedup.stages.ordered import running_totals_bucketed

    rng = random.Random(97)
    n = 600
    k = [f"u{rng.randrange(5)}" for _ in range(n)]
    t = [rng.randrange(300) for _ in range(n)]
    v = [rng.randrange(-30, 60) for _ in range(n)]
    ds = _ds({"k": k, "t": t, "rid": list(range(n)),
              "v": v}).repartition(7)

    def run(fn, **kw):
        return sorted(
            (r["rid"], r["running_n"], r["running_sum"])
            for r in fn(ds, by="k", order_cols=["t", "rid"],
                        value_col="v", **kw).take_all())

    base = run(running_totals)
    assert run(running_totals_bucketed, order_buckets=6,
               num_partitions=4) == base
    # B larger than the distinct-order-value count still works
    assert run(running_totals_bucketed, order_buckets=512,
               num_partitions=2) == base


def test_running_totals_bucketed_hot_key(ray_session):
    from raydedup.stages.ordered import running_totals_bucketed

    rng = random.Random(101)
    n = 4000
    t = [rng.randrange(1000) for _ in range(n)]
    v = [rng.randrange(100) for _ in range(n)]
    ds = _ds({"k": ["hot"] * n, "t": t, "rid": list(range(n)),
              "v": v}).repartition(8)
    got = {r["rid"]: (r["running_n"], r["running_sum"]) for r in
           running_totals_bucketed(
               ds, by="k", order_cols=["t", "rid"], value_col="v",
               order_buckets=16, num_partitions=4).take_all()}
    assert len(got) == n
    seen_n, seen_s = 0, 0
    for _tt, rid, vv in sorted(zip(t, range(n), v)):
        seen_n += 1
        seen_s += vv
        assert got[rid] == (seen_n, seen_s), rid
    # degenerate: all order values equal (zero width) → single bucket
    ds2 = _ds({"k": [1, 1], "t": [7, 7], "rid": [0, 1], "v": [3, 4]})
    got2 = {r["rid"]: (r["running_n"], r["running_sum"]) for r in
            running_totals_bucketed(
                ds2, by="k", order_cols=["t", "rid"], value_col="v",
                order_buckets=8).take_all()}
    assert got2 == {0: (1, 3), 1: (2, 7)}


def test_review4_guards(ray_session):
    from raydedup.stages.asof import _bucket_of
    from raydedup.stages.ordered import running_totals_bucketed
    from raydedup.stages.stats import rollup_counts

    # int64-span-wide order range: buckets stay monotone (no wrap)
    t = np.array([-2**62, -2**61, 2**61, 2**62], dtype=np.int64)
    b = _bucket_of(t, int(t.min()), int(t.max()) - int(t.min()) + 1, 4)
    assert (np.diff(b) >= 0).all() and b[0] == 0 and b[-1] == 3
    ds = _ds({"k": [1] * 4, "t": t.tolist(), "rid": [0, 1, 2, 3],
              "v": [1, 2, 3, 4]})
    got = {r["rid"]: (r["running_n"], r["running_sum"]) for r in
           running_totals_bucketed(ds, by="k", order_cols=["t", "rid"],
                                   value_col="v",
                                   order_buckets=4).take_all()}
    assert got == {0: (1, 1), 1: (2, 3), 2: (3, 6), 3: (4, 10)}
    # float order column → clear error, not a datetime cast crash
    ds2 = _ds({"k": [1], "t": [1.5], "v": [1]})
    with pytest.raises(ValueError, match="integer or timestamp"):
        running_totals_bucketed(ds2, by="k", order_cols=["t"],
                                value_col="v", order_buckets=4)
    # rollup sentinel collision and null keys are loud
    ds3 = _ds({"g": ["__all__", "b"], "v": [1, 2]})
    with pytest.raises(Exception, match="total_key"):
        rollup_counts(ds3, "g", "v").take_all()
    ds4 = _ds({"g": pa.array(["a", None]), "v": [1, 2]})
    with pytest.raises(Exception, match="null group keys"):
        rollup_counts(ds4, "g", "v").take_all()


def test_cumulative_distinct_multiday(ray_session):
    """Growth curve over a planted multi-day corpus with revisits and
    nulls: per-day first-seen counts and the running cumulative distinct
    must match a brute set-scan."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from raydedup.stages.stats import cumulative_distinct

    rng = np.random.default_rng(6)
    days = rng.integers(0, 12, 600)
    users = rng.integers(0, 80, 600).astype(object)
    users[::37] = None  # null users drop out
    ts = (days * 86_400_000_000 + rng.integers(0, 86_400_000_000, 600))
    tbl = pa.table({
        "user_id": pa.array([None if u is None else int(u)
                             for u in users], pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
    })
    out = [(r["day"], r["new_keys"], r["cum_keys"]) for r in
           cumulative_distinct(ray.data.from_arrow(tbl).repartition(5),
                               "user_id", "ts").take_all()]
    # brute
    seen: set = set()
    want = []
    for d in sorted(set(days.tolist())):
        new = {int(u) for u, dd in zip(users, days)
               if u is not None and dd == d and int(u) not in seen}
        if new or any(dd == d and u is not None
                      for u, dd in zip(users, days)):
            pass
        if new:
            seen |= new
            want.append((d, len(new), len(seen)))
    got = [((np.datetime64(ts_, "D") - np.datetime64(0, "D")).astype(int),
            n, c) for ts_, n, c in out]
    assert got == want


def test_transition_counts_vs_brute(ray_session):
    from raydedup.stages.ordered import transition_counts

    rng = random.Random(7)
    n = 400
    k = [rng.randrange(8) for _ in range(n)]
    t = [rng.randrange(30) for _ in range(n)]  # ties → rid breaks them
    types = [None, "a", "b", "c"]
    ty = [types[rng.randrange(4)] for _ in range(n)]
    ds = _ds({"k": k, "t": t, "rid": list(range(n)),
              "ty": ty}).repartition(5)
    got = {(r["prev_type"], r["next_type"]): r["n"] for r in
           transition_counts(ds, by="k", order_cols=["t", "rid"],
                             type_col="ty",
                             num_partitions=3).take_all()}
    brute: dict = {}
    rows = sorted(zip(k, t, range(n), ty))
    last: dict = {}
    for kk, _tt, _rid, tt in rows:
        pv = last.get(kk)
        if pv is not None and tt is not None:
            brute[(pv, tt)] = brute.get((pv, tt), 0) + 1
        last[kk] = tt
    assert got == brute


def test_transition_counts_single_rows_empty(ray_session):
    from raydedup.stages.ordered import transition_counts

    ds = _ds({"k": [1, 2, 3], "t": [1, 1, 1], "rid": [0, 1, 2],
              "ty": ["a", "b", "c"]})
    assert transition_counts(
        ds, by="k", order_cols=["t", "rid"], type_col="ty").count() == 0


def test_integrity_stats_planted_dirty(ray_session):
    from datetime import datetime

    from raydedup.stages.ordered import integrity_stats

    us = lambda s: datetime(2025, 1, 1, 0, 0, s)
    rows = {
        # conv a: clean, 3 turns
        # conv b: dup turn_idx (1 twice), ts regression at turn 2
        # conv c: empty + null text, single null-key conv d row
        "conv": ["a", "a", "a", "b", "b", "b", "b", "c", "c", "d"],
        "turn": [0, 1, 2, 0, 1, 1, 2, 0, 1, 0],
        "ts": [us(0), us(1), us(2),
               us(5), us(6), us(7), us(3),
               us(0), us(1), us(9)],
        "text": ["x", "y", "z", "p", "q", "r", "s", "", None, "ok"],
    }
    ds = ray.data.from_arrow(pa.table(rows)).repartition(4)
    got = {r["conv"]: r for r in integrity_stats(
        ds, by="conv", idx_col="turn", ts_col="ts", text_col="text",
        num_partitions=3).take_all()}
    a, b, c, d = got["a"], got["b"], got["c"], got["d"]
    assert (a["n_turns"], a["dup_turns"], a["n_empty"],
            a["ts_monotone"]) == (3, 0, 0, True)
    assert (b["n_turns"], b["dup_turns"], b["n_empty"],
            b["ts_monotone"]) == (4, 1, 0, False)
    assert (c["n_turns"], c["dup_turns"], c["n_empty"],
            c["ts_monotone"]) == (2, 0, 2, True)
    assert (d["n_turns"], d["ts_monotone"]) == (1, True)


def test_token_budget_mix_vs_brute(ray_session):
    import hashlib
    import re as _re

    from raydedup.stages.textstats import token_budget_mix

    rng = random.Random(13)
    n = 200
    ids = list(range(n))
    srcs = [f"s{rng.randrange(4)}" for _ in range(n)]
    texts = [None if rng.random() < 0.05 else
             " ".join(f"w{rng.randrange(9)}"
                      for _ in range(rng.randrange(0, 12)))
             for _ in range(n)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "source": srcs, "text": texts})).repartition(6)
    budget = 60
    got = {r["doc_id"]: (r["source"], r["n_tokens"]) for r in
           token_budget_mix(ds, budget=budget).take_all()}

    def h60(k):
        return int.from_bytes(
            hashlib.md5(f"mix:{k}".encode()).digest()[:8], "big") >> 4

    brute = {}
    per_src: dict = {}
    rows = sorted(zip(ids, srcs, texts), key=lambda r: (r[1], h60(r[0]),
                                                        r[0]))
    for i, s, t in rows:
        nt = len([x for x in _re.split(r"[^0-9a-z_]+",
                                       (t or "").lower()) if x])
        cum = per_src.get(s, 0) + nt
        per_src[s] = cum
        if cum <= budget:
            brute[i] = (s, nt)
    assert got == brute


def test_conversation_stats_vs_brute(ray_session):
    import re as _re

    from raydedup.stages.stats import conversation_stats

    rng = random.Random(5)
    convs, roles, texts = [], [], []
    for i in range(150):
        convs.append(f"c{rng.randrange(12)}")
        roles.append([None, "user", "assistant", "tool",
                      "system"][rng.randrange(5)])
        texts.append(None if rng.random() < 0.1 else
                     " ".join(f"t{rng.randrange(20)}"
                              for _ in range(rng.randrange(6))))
    ds = ray.data.from_arrow(pa.table({
        "conv_id": convs, "role": roles, "text": texts})).repartition(4)
    got = {r["conv_id"]: r for r in conversation_stats(ds).take_all()}
    brute: dict = {}
    for c, r, t in zip(convs, roles, texts):
        b = brute.setdefault(c, dict(n_turns=0, n_user=0,
                                     n_assistant=0, n_tool=0,
                                     n_tokens=0))
        b["n_turns"] += 1
        for name in ("user", "assistant", "tool"):
            b[f"n_{name}"] += int(r == name)
        b["n_tokens"] += len([x for x in _re.split(
            r"[^0-9a-z_]+", (t or "").lower()) if x])
    assert set(got) == set(brute)
    for c, b in brute.items():
        for k, v in b.items():
            assert got[c][k] == v, (c, k)
