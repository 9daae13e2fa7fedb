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


def distinct_count_by_group(ds, group_col: str, value_col: str,
                            out: str = "n_distinct"):
    """→ Dataset(group, n_distinct): exact COUNT(DISTINCT value) per
    group. Each batch first collapses to its distinct (group, value)
    pairs (Arrow group_by — the shuffle then carries distinct pairs,
    bounded by value cardinality per block, not row count); one keyed
    groupby dedups pairs globally; per-batch partial counts of the
    now-unique pairs merge through a tiny second groupby. For
    cardinalities where even distinct pairs are too wide, swap in a
    mergeable sketch (HLL) — not implemented (exactness is the
    contract here, matching the SQL oracle)."""
    from ray.data.aggregate import Sum

    schema = ds.schema()
    gtype = schema.types[schema.names.index(group_col)]

    def distinct_pairs(b: pa.Table) -> pa.Table:
        t = pa.table({group_col: b[group_col], value_col: b[value_col]})
        return t.group_by([group_col, value_col]).aggregate([])

    uniq = (ds.map_batches(distinct_pairs, batch_format="pyarrow")
            .groupby([group_col, value_col]).count())

    def partial_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or group_col not in b.column_names:
            return pa.table({group_col: pa.array([], gtype),
                             out: pa.array([], pa.int64())})
        t = pa.table({group_col: b[group_col],
                      out: pa.array(np.ones(b.num_rows, dtype=np.int64))})
        agg = t.group_by([group_col]).aggregate([(out, "sum")])
        return pa.table({group_col: agg[group_col],
                         out: agg[f"{out}_sum"]})

    return (uniq.map_batches(partial_counts, batch_format="pyarrow")
            .groupby(group_col).aggregate(Sum(out, alias_name=out)))
