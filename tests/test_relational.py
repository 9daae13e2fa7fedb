"""Relational pipelines (pricing_summary / revenue_by_nation) on small
synthetic tables: exact integer money math, cutoff filtering, dim-chain
filtering, unmatched keys, and the broadcast-limit guard."""

import datetime

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from raydedup.stages.relational import pricing_summary, revenue_by_nation


def _ds(rows: dict) -> "ray.data.Dataset":
    return ray.data.from_arrow(pa.table(rows))


def _li(n, seed=3):
    rng = np.random.default_rng(seed)
    d0 = datetime.datetime(1996, 1, 1)
    return {
        "l_orderkey": rng.integers(1, 20, n),
        "l_returnflag": [["A", "N", "R"][i % 3] for i in range(n)],
        "l_linestatus": [["F", "O"][i % 2] for i in range(n)],
        "l_quantity": rng.integers(1, 50, n).astype(float),
        "l_extendedprice": np.round(rng.uniform(1, 1000, n), 2),
        "l_discount": np.round(rng.integers(0, 11, n) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n) / 100.0, 2),
        "l_shipdate": [d0 + datetime.timedelta(days=int(x))
                       for x in rng.integers(0, 400, n)],
    }


def test_pricing_summary_exact_vs_brute(ray_session):
    rows = _li(300)
    out = {(r["l_returnflag"], r["l_linestatus"]): r
           for r in pricing_summary(
               _ds(rows).repartition(5), cutoff_days=100).take_all()}
    hi = max(rows["l_shipdate"]) - datetime.timedelta(days=100)
    brute = {}
    for i in range(300):
        if rows["l_shipdate"][i] > hi:
            continue
        k = (rows["l_returnflag"][i], rows["l_linestatus"][i])
        ep = round(rows["l_extendedprice"][i] * 100)
        disc = round(rows["l_discount"][i] * 100)
        tax = round(rows["l_tax"][i] * 100)
        agg = brute.setdefault(k, [0, 0, 0, 0, 0])
        agg[0] += int(rows["l_quantity"][i])
        agg[1] += ep
        agg[2] += ep * (100 - disc)
        agg[3] += ep * (100 - disc) * (100 + tax)
        agg[4] += 1
    assert set(out) == set(brute)
    for k, (sq, sb, sd, sc, n) in brute.items():
        r = out[k]
        assert (r["sum_qty"], r["sum_base_cents"], r["sum_disc_e4"],
                r["sum_charge_e6"], r["count_order"]) == (sq, sb, sd, sc, n)
        assert r["avg_qty"] == sq / n
        assert r["avg_price_cents"] == sb / n


def test_revenue_by_nation_dim_chain_and_filters(ray_session):
    li = _ds({"l_orderkey": [1, 1, 2, 3, 4],
              "l_extendedprice": [10.00, 20.00, 30.00, 40.00, 50.00],
              "l_discount": [0.10, 0.00, 0.05, 0.00, 0.00]})
    orders = _ds({"o_orderkey": [1, 2, 3, 4],
                  "o_custkey": [100, 200, 300, 999],
                  "o_orderdate": [datetime.datetime(1996, 6, 1),
                                  datetime.datetime(1996, 6, 1),
                                  datetime.datetime(1990, 1, 1),
                                  datetime.datetime(1996, 6, 1)]})
    # cust 100 → nation 1 (region 1), 200 → nation 2 (region 2),
    # 300 → nation 1; order 4's custkey 999 has no customer row
    cust = _ds({"c_custkey": [100, 200, 300],
                "c_nationkey": [1, 2, 1]})
    nat = _ds({"n_nationkey": [1, 2], "n_name": ["ALPHA", "BETA"],
               "n_regionkey": [1, 2]})
    reg = _ds({"r_regionkey": [1, 2], "r_name": ["EAST", "WEST"]})
    got = {r["n_name"]: r for r in revenue_by_nation(
        li, orders, cust, nat, reg, region_name="EAST",
        date_lo=datetime.datetime(1996, 1, 1),
        date_hi=datetime.datetime(1997, 1, 1)).take_all()}
    # order 3 fails the date filter, nation BETA fails the region
    # filter, order 4 has no customer → only order 1's two lines remain
    assert set(got) == {"ALPHA"}
    assert got["ALPHA"]["n_rows"] == 2
    assert got["ALPHA"]["revenue_e4"] == 1000 * 90 + 2000 * 100


def test_revenue_by_nation_join_route_equals_broadcast(ray_session):
    # broadcast_limit=1 forces the second distributed hash join on
    # o_custkey; output must equal the broadcast route exactly
    li = _ds({"l_orderkey": [1, 1, 2, 3],
              "l_extendedprice": [10.00, 20.00, 30.00, 40.00],
              "l_discount": [0.10, 0.00, 0.05, 0.00]})
    orders = _ds({"o_orderkey": [1, 2, 3],
                  "o_custkey": [100, 200, 999],
                  "o_orderdate": [datetime.datetime(1996, 6, 1)] * 3})
    cust = _ds({"c_custkey": [100, 200], "c_nationkey": [1, 2]})
    nat = _ds({"n_nationkey": [1, 2], "n_name": ["ALPHA", "BETA"],
               "n_regionkey": [1, 2]})
    reg = _ds({"r_regionkey": [1, 2], "r_name": ["EAST", "WEST"]})

    def run(limit):
        return sorted(
            (r["n_name"], r["n_rows"], r["revenue_e4"])
            for r in revenue_by_nation(
                li, orders, cust, nat, reg,
                broadcast_limit=limit).take_all())

    assert run(1) == run(10**6)
    assert [x[0] for x in run(1)] == ["ALPHA", "BETA"]


def test_filtered_revenue_vs_brute(ray_session):
    from raydedup.stages.relational import filtered_revenue

    rows = _li(400, seed=9)
    lo, hi = datetime.datetime(1996, 3, 1), datetime.datetime(1996, 9, 1)
    out = filtered_revenue(_ds(rows).repartition(6), date_lo=lo,
                           date_hi=hi, disc_lo_cents=2, disc_hi_cents=6,
                           qty_below=25.0).take_all()
    assert len(out) == 1
    n = rev = 0
    for i in range(400):
        d = int(round(rows["l_discount"][i] * 100))
        if (lo <= rows["l_shipdate"][i] < hi and 2 <= d <= 6
                and rows["l_quantity"][i] < 25.0):
            n += 1
            rev += int(round(rows["l_extendedprice"][i] * 100)) * d
    assert (out[0]["n_rows"], out[0]["revenue_e4"]) == (n, rev)
    # empty selection still yields one exact zero row (matches the
    # oracle's count(*)=0 / coalesce(sum,0))
    none = filtered_revenue(_ds(rows), date_lo=lo, date_hi=lo,
                            disc_lo_cents=2, disc_hi_cents=6,
                            qty_below=25.0).take_all()
    assert [(r["n_rows"], r["revenue_e4"]) for r in none] == [(0, 0)]


def test_top_unshipped_orders_routes_agree(ray_session):
    # broadcast_limit=0 forces the distributed semi-join route; output
    # must equal the broadcast-custkey route exactly (incl. tie order)
    from raydedup.stages.relational import top_unshipped_orders

    cutoff = datetime.datetime(1996, 6, 1)
    li = _ds({"l_orderkey": [1, 1, 2, 3, 4],
              "l_extendedprice": [10.00, 20.00, 30.00, 40.00, 5.00],
              "l_discount": [0.10, 0.00, 0.05, 0.00, 0.02],
              "l_shipdate": [cutoff + datetime.timedelta(days=d)
                             for d in (1, 2, 3, 4, -1)]})
    orders = _ds({"o_orderkey": [1, 2, 3, 4],
                  "o_custkey": [100, 200, 999, 100],
                  "o_orderdate": [cutoff - datetime.timedelta(days=d)
                                  for d in (10, 5, 3, -1)]})
    cust = _ds({"c_custkey": [100, 200, 300],
                "c_mktsegment": ["BUILDING", "BUILDING", "AUTO"]})

    def run(limit):
        return [(r["l_orderkey"], r["o_orderdate"], r["revenue_e4"])
                for r in top_unshipped_orders(
                    li, orders, cust, segment="BUILDING", cutoff=cutoff,
                    k=10, broadcast_limit=limit).take_all()]

    got = run(10**6)
    # order 3: non-segment customer; order 4: placed after cutoff and
    # its only line shipped before it — both excluded
    assert got == [(1, datetime.datetime(1996, 5, 22),
                    10_00 * 90 + 20_00 * 100),
                   (2, datetime.datetime(1996, 5, 27), 30_00 * 95)]
    assert run(0) == got


def test_semi_and_anti_join(ray_session):
    from raydedup.stages.relational import semi_join

    left = _ds({"k": pa.array([1, 2, 3, 4, None], type=pa.int64()),
                "v": ["a", "b", "c", "d", "e"]}).repartition(3)
    right = _ds({"k": pa.array([2, 2, 4, 9, None],
                               type=pa.int64())}).repartition(2)
    semi = sorted(r["v"] for r in semi_join(
        left, right, on="k").take_all())
    anti = sorted(r["v"] for r in semi_join(
        left, right, on="k", anti=True).take_all())
    # NOT EXISTS null semantics: the null-keyed left row matches
    # nothing — dropped by semi, KEPT by anti; the null right key
    # matches nothing either
    assert semi == ["b", "d"]
    assert anti == ["a", "c", "e"]
    with pytest.raises(ValueError, match="join key"):
        semi_join(left, right, on="nope")


def test_semi_join_random_vs_python_sets(ray_session):
    import random

    from raydedup.stages.relational import semi_join

    rng = random.Random(71)
    lk = [rng.randrange(100) for _ in range(500)]
    rk = [rng.randrange(100) for _ in range(80)]
    left = _ds({"k": lk, "rid": list(range(500))}).repartition(7)
    right = _ds({"k": rk}).repartition(3)
    semi = {r["rid"] for r in semi_join(left, right, on="k",
                                        num_partitions=5).take_all()}
    anti = {r["rid"] for r in semi_join(left, right, on="k", anti=True,
                                        num_partitions=5).take_all()}
    rset = set(rk)
    assert semi == {i for i, k in enumerate(lk) if k in rset}
    assert anti == {i for i, k in enumerate(lk) if k not in rset}


def test_pivot_counts(ray_session):
    from raydedup.stages.relational import pivot_counts

    ds = _ds({"u": [1, 1, 1, 2, 2, 3],
              "c": pa.array(["a", "a", "b", "zz", None, "b"])}
             ).repartition(3)
    got = {r["u"]: (r["n_a"], r["n_b"], r["n_other"]) for r in
           pivot_counts(ds, "u", "c", ["a", "b"]).take_all()}
    # null and unlisted categories both land in n_other
    assert got == {1: (2, 1, 0), 2: (0, 0, 2), 3: (0, 1, 0)}
    with pytest.raises(ValueError, match="categories"):
        pivot_counts(ds, "u", "c", [])


def test_assemble_by_key(ray_session):
    from raydedup.stages.ordered import assemble_by_key

    ds = _ds({"conv": ["x", "y", "x", "x", "y"],
              "idx": [2, 1, 0, 1, 0],
              "text": pa.array(["c", "B", "a", None, "A"])}
             ).repartition(3)
    got = {r["conv"]: r["convo"] for r in assemble_by_key(
        ds, by="conv", order_cols=["idx"], text_col="text",
        out="convo", num_partitions=3).take_all()}
    # SQL string_agg semantics: null texts are skipped (no separator)
    assert got == {"x": "a c", "y": "A B"}
    # all-null key omitted (documented deviation: SQL emits NULL row)
    ds2 = _ds({"conv": ["z", "w"], "idx": [0, 0],
               "text": pa.array([None, "t"])})
    got2 = {r["conv"]: r["convo"] for r in assemble_by_key(
        ds2, by="conv", order_cols=["idx"], text_col="text",
        out="convo").take_all()}
    assert got2 == {"w": "t"}
