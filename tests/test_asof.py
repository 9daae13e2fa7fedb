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
