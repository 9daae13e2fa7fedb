"""Distributed exact order statistics over integer-valued columns.

``grouped_quantiles`` computes exact discrete percentiles per group via
the counting-merge trick: each batch emits partial ``(group, value,
count)`` rows (distinct values only), a groupby merges the partials, and
the percentile is read off the merged cumulative counts. The shuffle
carries one row per distinct (group, value) pair — bounded by value
cardinality, not corpus size — which is exactly right for bounded
integer features (lengths, token counts, scores scaled to ints).
Continuous columns would need a mergeable sketch (t-digest); not
implemented here.

Quantile semantics mirror DuckDB's ``quantile_disc``: the element at
sorted index ``max(0, ceil(q * n) - 1)`` (verified empirically; the
index is computed with the same double arithmetic the oracle uses).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def grouped_quantiles(ds, group_col: str, value_col: str,
                      qs: list[float], prefix: str = "p"):
    """→ Dataset(group, p<q1>, p<q2>, ...): exact per-group discrete
    quantiles of an integer column. Column names are ``prefix`` + the
    percent with dots stripped (0.5 → p50, 0.99 → p99)."""
    if not qs or any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"qs must be within [0, 1], got {qs}")
    vtype = ds.schema().types[ds.schema().names.index(value_col)]
    if not pa.types.is_integer(vtype):
        raise ValueError(
            f"grouped_quantiles is exact for integer columns only; "
            f"{value_col} is {vtype} — scale to ints or use a sketch")
    names = [f"{prefix}{str(round(q * 100, 4)).rstrip('0').rstrip('.').replace('.', '_')}"
             for q in qs]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"g": pa.array([], batch.schema.field(group_col).type),
                 "v": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64())})
        grp = batch[group_col].to_numpy(zero_copy_only=False)
        val = batch[value_col].to_numpy(zero_copy_only=False).astype(
            np.int64)
        order = np.lexsort((val, grp))
        sg, sv = grp[order], val[order]
        new = np.r_[True, (sg[1:] != sg[:-1]) | (sv[1:] != sv[:-1])]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(sv)])
        return pa.table(
            {"g": pa.array(sg[starts].tolist(),
                           batch.schema.field(group_col).type),
             "v": pa.array(sv[starts]),
             "c": pa.array(counts.astype(np.int64))})

    gtype = ds.schema().types[ds.schema().names.index(group_col)]

    def reduce_q(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "v" not in g.column_names:
            return pa.table({group_col: pa.array([], gtype),
                             **{nm: pa.array([], pa.int64())
                                for nm in names}})
        v = g["v"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        # merge duplicate values coming from different batches
        new = np.r_[True, v[1:] != v[:-1]]
        starts = np.flatnonzero(new)
        vu = v[starts]
        cu = np.add.reduceat(c, starts)
        cum = np.cumsum(cu)
        n = int(cum[-1])
        out = {group_col: g["g"][:1]}
        for q, nm in zip(qs, names):
            idx = max(0, math.ceil(q * n) - 1)
            pos = int(np.searchsorted(cum, idx + 1, side="left"))
            out[nm] = pa.array([int(vu[pos])], pa.int64())
        return pa.table(out)

    return (ds.select_columns([group_col, value_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("g").map_groups(reduce_q, batch_format="pyarrow"))
