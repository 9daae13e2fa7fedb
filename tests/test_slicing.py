"""Equal-count slicing parity vs the reference flush loop
(bin/slice_by_datetime:60-109)."""

import math

import pyarrow as pa
import pytest

import ray.data

from raydedup.stages.slicing import slice_by_time, slice_params


def reference_slices(sorted_keys: list[str]) -> dict[str, int]:
    """Literal restatement of the reference loop for the oracle."""
    n = len(sorted_keys)
    slice_count = math.floor(28 + math.log10(n)) if n > 28 else n
    per = math.floor(n / slice_count)
    out: dict[str, int] = {}
    current: list[str] = []
    slice_number = 0
    for i, k in enumerate(sorted_keys):
        current.append(k)
        if i % per == 0:
            for kk in current:
                out[kk] = slice_number
            slice_number += 1
            current = []
    # tail after the last flush is dropped (faithful quirk)
    return out


def _make_ds(n: int):
    keys = [f"k{i:05d}" for i in range(n)]
    ts = list(range(n))
    return keys, ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, type=pa.int64()),
                "row_key": pa.array(keys, type=pa.string()),
            }
        )
    )


@pytest.mark.parametrize("n", [5, 29, 100, 317])
def test_slicing_matches_reference(n):
    keys, ds = _make_ds(n)
    got = {
        r["row_key"]: r["slice_number"]
        for r in slice_by_time(ds, ts_col="ts").take_all()
    }
    assert got == reference_slices(keys)


def test_slice_zero_has_one_row():
    _, ds = _make_ds(100)
    rows = slice_by_time(ds, ts_col="ts").take_all()
    assert sum(1 for r in rows if r["slice_number"] == 0) == 1


def test_slice_params():
    assert slice_params(10) == (10, 1)
    assert slice_params(1000) == (31, 32)


def test_sliding_window_agg(ray_session):
    import pyarrow as pa

    import ray.data

    from raydedup.stages.windows import sliding_window_agg, tumbling_window_agg

    # events at epoch seconds 0, 1000, 3599, 3600 for one user
    tss = [0, 1000, 3599, 3600]
    tbl = pa.table({
        "user_id": [1] * 4,
        "ts": pa.array([t * 1_000_000 for t in tss],
                       pa.timestamp("us")),
        "value": [1.0, 2.0, 4.0, 8.0],
    })
    ds = ray.data.from_arrow(tbl)
    out = {(r["user_id"], r["window_start"]): r for r in
           sliding_window_agg(ds, window_sec=3600,
                              hop_sec=900).take_all()}
    # event@0 -> only window 0 (windows -900.. etc. start<=0<start+3600:
    # starts 0, -900, -1800, -2700 all contain it)
    assert out[(1, 0)]["n_events"] == 3        # ts 0, 1000, 3599
    assert out[(1, -900)]["n_events"] == 2     # ts 0 and 1000 < -900+3600
    assert out[(1, 900)]["n_events"] == 3      # 1000, 3599, 3600 < 4500
    assert out[(1, 3600)]["n_events"] == 1 and \
        out[(1, 3600)]["sum_value"] == 8.0
    assert out[(1, 0)]["sum_value"] == 7.0
    # hop == window degenerates to tumbling
    slid = sorted((r["user_id"], r["window_start"], r["n_events"])
                  for r in sliding_window_agg(
                      ds, 3600, 3600).take_all())
    tumb = sorted((r["user_id"], r["window_start"], r["n_events"])
                  for r in tumbling_window_agg(ds, 3600).take_all())
    assert slid == tumb
