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
