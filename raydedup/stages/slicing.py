"""Equal-count datetime slicing — reference parity for
``bin/slice_by_datetime:60-109``.

Reference semantics (verbatim quirks preserved):

- N = number of considered rows; ``slice_count = floor(28 + log10(N))``
  when N > 28, else N;
- rows sorted globally by (datetime, key);
- walking the sorted list with index i, the current slice is FLUSHED when
  ``i % per_slice == 0`` (per_slice = floor(N / slice_count)); therefore
  slice 0 contains exactly ONE row (the flush at i=0), subsequent slices
  contain per_slice rows, and the tail after the last flush is DROPPED
  (the reference never writes the final partial slice).

Closed form used here (and mirrored in the DuckDB oracle):
  rn = 0-based rank in the (ts, key) sort;
  slice(rn) = ceil(rn / per_slice);
  row kept iff rn <= per_slice * floor((N-1) / per_slice).

Ray Data mapping: one global ``sort`` (the only stage that genuinely needs
a total order) followed by ``split_at_indices`` — exact row-position
splitting without a driver collect — then a constant-column union.
"""

from __future__ import annotations

import math

import pyarrow as pa


def slice_params(n: int) -> tuple[int, int]:
    """(slice_count, per_slice) per the reference formula."""
    slice_count = math.floor(28 + math.log10(n)) if n > 28 else n
    per_slice = math.floor(n / slice_count) if slice_count else 0
    return slice_count, per_slice


def slice_by_time(ds, ts_col: str = "ts", key_col: str = "row_key"):
    """→ Dataset(slice_number:int32, {key_col}) with reference slice/drop
    semantics. One global sort shuffle; everything else is narrow."""
    n = ds.count()
    if n == 0:
        return ds.select_columns([key_col]).map_batches(
            lambda t: pa.table(
                {"slice_number": pa.array([], type=pa.int32()),
                 key_col: pa.array([], type=pa.string())}
            ),
            batch_format="pyarrow",
        )
    _, per = slice_params(n)
    # the reference does NOT cap flushes at slice_count: one flush per
    # multiple of per_slice below N, so the real slice count is
    # floor((N-1)/per) + 1 (faithful quirk)
    s_max = (n - 1) // per if per else 0
    sorted_ds = ds.select_columns([ts_col, key_col]).sort([ts_col, key_col])

    # flush positions: ranks 0, per, 2per, … → boundaries at 1, per+1, …
    boundaries = [s * per + 1 for s in range(0, s_max + 1)]
    splits = sorted_ds.split_at_indices(boundaries)

    out = None
    for slice_number, part in enumerate(splits[: s_max + 1]):

        def tag(batch: pa.Table, s=slice_number) -> pa.Table:
            return pa.table(
                {
                    "slice_number": pa.array([s] * batch.num_rows, type=pa.int32()),
                    key_col: batch[key_col],
                }
            )

        tagged = part.map_batches(tag, batch_format="pyarrow")
        out = tagged if out is None else out.union(tagged)
    return out
