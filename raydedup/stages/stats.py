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
import pyarrow.compute as pc

import ray


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
        # SQL quantile_disc ignores NULLs — drop them (a null int64
        # would otherwise decay to NaN and astype to INT64_MIN garbage)
        batch = batch.filter(pc.is_valid(batch[value_col]))
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
    cardinalities where even distinct pairs are too wide to shuffle,
    use ``approx_distinct_by_group`` (HLL sketch, O(groups) shuffle) —
    exactness is the contract HERE, matching the SQL oracle."""
    from ray.data.aggregate import Sum

    schema = ds.schema()
    gtype = schema.types[schema.names.index(group_col)]

    def distinct_pairs(b: pa.Table) -> pa.Table:
        t = pa.table({group_col: b[group_col], value_col: b[value_col]})
        # SQL COUNT(DISTINCT x) excludes nulls
        t = t.filter(pc.is_valid(t[value_col]))
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


def approx_distinct_by_group(ds, group_col: str, value_col: str,
                             precision: int = 12,
                             out: str = "approx_distinct"):
    """→ Dataset(group, approx_distinct): HyperLogLog estimate of
    COUNT(DISTINCT value) per group — the scale path
    ``distinct_count_by_group`` documents, for when even the distinct
    (group, value) pairs are too wide to shuffle. Each batch reduces to
    one row per present group carrying a 2^precision-byte register
    vector; registers merge by elementwise max in a per-group reduce,
    so shuffle volume is O(groups × 2^p) regardless of row count.
    Standard HLL bias correction + linear counting for the small range
    (Flajolet et al. 2007, public algorithm); relative error
    ≈ 1.04/sqrt(2^p) (~1.6% at p=12).

    Hashing is vectorized: integer values mix through splitmix64;
    strings hash once per DISTINCT value in the batch (md5, after a
    dictionary encode) then scatter. Estimates are deterministic for a
    fixed dataset (no RNG)."""
    if not 4 <= precision <= 16:
        raise ValueError("precision must be in [4, 16]")
    m = 1 << precision
    schema = ds.schema()
    gtype = schema.types[schema.names.index(group_col)]

    def _hash64(col: pa.ChunkedArray) -> np.ndarray:
        arr = col.combine_chunks()  # caller has already dropped nulls
        if pa.types.is_integer(arr.type):
            x = arr.to_numpy(
                zero_copy_only=False).astype(np.uint64)
            # splitmix64 finalizer (public domain constant mix)
            x = x + np.uint64(0x9E3779B97F4A7C15)
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return x ^ (x >> np.uint64(31))
        import hashlib

        dic = pc.dictionary_encode(arr)
        uniq = dic.dictionary.to_pylist()
        hu = np.fromiter(
            (int.from_bytes(
                hashlib.md5(str(u).encode()).digest()[:8], "big")
             for u in uniq), dtype=np.uint64, count=len(uniq))
        idx = dic.indices.to_numpy(zero_copy_only=False)
        return hu[idx]

    def partial(b: pa.Table) -> pa.Table:
        # COUNT(DISTINCT x) excludes nulls — drop them before hashing
        # (also: an all-null string batch would dictionary-encode to an
        # empty dictionary and crash the scatter)
        b = b.filter(pc.is_valid(b[value_col]))
        if b.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "__regs": pa.array([], pa.binary())})
        from raydedup.stages.asof import _group_codes

        h = _hash64(b[value_col])
        codes, _ = _group_codes(b[group_col])
        # null group keys form their own group (SQL GROUP BY semantics)
        reg_idx = (h >> np.uint64(64 - precision)).astype(np.int64)
        rest = h << np.uint64(precision)
        # rho = leading zeros of the remaining bits + 1 (capped)
        nlz = np.full(len(h), 64 - precision + 1, dtype=np.uint8)
        nz = rest != 0
        bl = np.zeros(len(h), dtype=np.uint8)
        bl[nz] = np.floor(np.log2(rest[nz].astype(np.float64))).astype(
            np.uint8)
        nlz[nz] = (63 - bl[nz]) + 1
        uniq_codes, first_pos, inv = np.unique(
            codes, return_index=True, return_inverse=True)
        regs = np.zeros((len(uniq_codes), m), dtype=np.uint8)
        np.maximum.at(regs, (inv, reg_idx), nlz)
        gvals = b[group_col].take(pa.array(first_pos))
        return pa.table({group_col: gvals,
                         "__regs": pa.array(
                             [r.tobytes() for r in regs], pa.binary())})

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__regs" not in g.column_names:
            return pa.table({group_col: pa.array([], gtype),
                             out: pa.array([], pa.int64())})
        regs = np.frombuffer(
            b"".join(g["__regs"].to_pylist()), dtype=np.uint8
        ).reshape(g.num_rows, m)
        merged = regs.max(axis=0)
        # HLL estimate with small-range (linear counting) correction
        est = (0.7213 / (1 + 1.079 / m)) * m * m / np.sum(
            2.0 ** -merged.astype(np.float64))
        zeros = int(np.sum(merged == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        return pa.table({group_col: g[group_col].take(pa.array([0])),
                         out: pa.array([int(round(est))], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col).map_groups(merge, batch_format="pyarrow"))


def mode_by_group(ds, group_col: str, value_col: str,
                  out: str = "mode_value"):
    """→ Dataset(group, mode_value, mode_count): the most frequent
    value per group, ties broken by the SMALLEST value (deterministic
    under any partitioning — SQL's ``mode()`` leaves ties unspecified,
    so oracles should use a row_number window with the same tie rule).
    Same shuffle discipline as ``grouped_quantiles``: batches emit
    (group, value, count) partials, one keyed groupby merges counts,
    and a per-group argmax reads the winner — the exchange carries
    distinct pairs, not rows. Nulls are excluded (SQL aggregate
    semantics)."""
    from ray.data.aggregate import Sum

    schema = ds.schema()
    gtype = schema.types[schema.names.index(group_col)]
    vtype = schema.types[schema.names.index(value_col)]

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({group_col: b[group_col], value_col: b[value_col]})
        t = t.filter(pc.is_valid(t[value_col]))
        agg = t.group_by([group_col, value_col]).aggregate(
            [([], "count_all")])
        return pa.table({group_col: agg[group_col],
                         value_col: agg[value_col],
                         "__n": agg["count_all"]})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby([group_col, value_col])
              .aggregate(Sum("__n", alias_name="__n")))

    def argmax(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__n" not in g.column_names:
            return pa.table({group_col: pa.array([], gtype),
                             out: pa.array([], vtype),
                             "mode_count": pa.array([], pa.int64())})
        n = g["__n"].to_numpy(zero_copy_only=False)
        v = g[value_col].combine_chunks()
        # max count, then smallest value: sort by (-count, value) and
        # take the first row — group_by partitions are per-group here
        order = pc.sort_indices(
            pa.table({"a": pa.array(-n), "b": v}),
            sort_keys=[("a", "ascending"), ("b", "ascending")])
        best = order[0].as_py()
        return pa.table({group_col: g[group_col].take(pa.array([best])),
                         out: v.take(pa.array([best])),
                         "mode_count": pa.array([int(n[best])])})

    return counts.groupby(group_col).map_groups(argmax,
                                                batch_format="pyarrow")


def top_values_by_group(ds, group_col: str, value_col: str, k: int = 3):
    """→ Dataset(group, value, n, rank): the ``k`` most frequent values
    per group, ties broken count-desc then SMALLEST value (the
    ``mode_by_group`` rule generalized to k > 1 — deterministic under
    any partitioning, exactly replayable by a row_number window).

    Scale shape: per-batch (group, value, count) partials → one keyed
    Sum merge (exchange = distinct pairs, not rows) → a per-BLOCK
    per-group top-k pre-filter, so the final per-group reduce receives
    at most k rows per (group, block) instead of every distinct value —
    the grouped analogue of the partial-top-k combiner the ANN stages
    use. Union of per-block top-ks ⊇ global top-k, so the pre-filter
    never drops a winner. Nulls are excluded (SQL aggregate
    semantics)."""
    from ray.data.aggregate import Sum

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    schema = ds.schema()
    gtype = schema.types[schema.names.index(group_col)]
    vtype = schema.types[schema.names.index(value_col)]
    empty = pa.table({group_col: pa.array([], gtype),
                      value_col: pa.array([], vtype),
                      "n": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64())})

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({group_col: b[group_col], value_col: b[value_col]})
        t = t.filter(pc.and_(pc.is_valid(t[group_col]),
                             pc.is_valid(t[value_col])))
        agg = t.group_by([group_col, value_col]).aggregate(
            [([], "count_all")])
        return pa.table({group_col: agg[group_col],
                         value_col: agg[value_col],
                         "__n": agg["count_all"]})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby([group_col, value_col])
              .aggregate(Sum("__n", alias_name="__n")))

    def _ordered(g: pa.Table):
        n = pc.cast(g["__n"], pa.int64())
        return pc.sort_indices(
            pa.table({"g": g[group_col],
                      "a": pc.negate_checked(n),
                      "b": g[value_col]}),
            sort_keys=[("g", "ascending"), ("a", "ascending"),
                       ("b", "ascending")])

    def block_topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             value_col: pa.array([], vtype),
                             "__n": pa.array([], pa.int64())})
        order = _ordered(g).to_numpy(zero_copy_only=False)
        genc = pc.dictionary_encode(
            pc.cast(g[group_col].combine_chunks(), pa.string()))
        gcodes = genc.indices.to_numpy(zero_copy_only=False)[order]
        new_run = np.r_[True, gcodes[1:] != gcodes[:-1]]
        run_id = np.cumsum(new_run) - 1
        run_start = np.flatnonzero(new_run)
        pos_in_run = np.arange(len(order)) - run_start[run_id]
        keep = order[pos_in_run < k]
        t = g.take(pa.array(keep))
        return pa.table({group_col: t[group_col],
                         value_col: t[value_col],
                         "__n": pc.cast(t["__n"], pa.int64())})

    pre = counts.map_batches(block_topk, batch_format="pyarrow")

    def final_topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__n" not in g.column_names:
            return empty
        order = _ordered(g).to_numpy(zero_copy_only=False)[:k]
        t = g.take(pa.array(order))
        return pa.table({group_col: t[group_col],
                         value_col: t[value_col],
                         "n": pc.cast(t["__n"], pa.int64()),
                         "rank": pa.array(
                             np.arange(1, len(order) + 1), pa.int64())})

    return pre.groupby(group_col).map_groups(final_topk,
                                             batch_format="pyarrow")


def grouped_corr(ds, group_col: str, x_col: str, y_col: str,
                 out: str = "corr"):
    """→ Dataset(group, n, corr): exact Pearson correlation per group
    over INTEGER-VALUED columns (quantize floats upstream, same recipe
    as the percentile queries). All six moments (n, Σx, Σy, Σx², Σy²,
    Σxy) accumulate as exact int64 — per-batch Arrow group_by partials,
    one keyed merge — so the final float math runs on identical
    operands on both engine and oracle sides and the result is
    bit-identical. The naive formula is exact-rational here, not the
    numerically-unstable float version (moments are integers).
    Overflow bound: |Σxy| ≤ n·max|x|·max|y| must stay under 2^63 —
    fine for quantized features at ≤1e6 scale and ≤1e6 rows per
    group; rescale otherwise. Rows with a null in either column are
    excluded (SQL corr() semantics). Groups with < 2 rows or zero
    variance emit NULL corr."""
    from ray.data.aggregate import Sum

    schema = ds.schema()
    gtype = schema.types[schema.names.index(group_col)]
    for c in (x_col, y_col):
        if not pa.types.is_integer(
                schema.types[schema.names.index(c)]):
            raise ValueError(
                f"grouped_corr is exact for integer columns only; "
                f"{c} is not — quantize upstream")

    moments = ["n", "sx", "sy", "sxx", "syy", "sxy"]

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({group_col: b[group_col], "x": b[x_col],
                      "y": b[y_col]})
        t = t.filter(pc.and_(pc.is_valid(t["x"]), pc.is_valid(t["y"])))
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             **{m: pa.array([], pa.int64())
                                for m in moments}})
        x = t["x"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = t["y"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        t2 = pa.table({group_col: t[group_col],
                       "n": pa.array(np.ones(len(x), dtype=np.int64)),
                       "sx": pa.array(x), "sy": pa.array(y),
                       "sxx": pa.array(x * x), "syy": pa.array(y * y),
                       "sxy": pa.array(x * y)})
        agg = t2.group_by([group_col]).aggregate(
            [(m, "sum") for m in moments])
        return pa.table({group_col: agg[group_col],
                         **{m: agg[f"{m}_sum"] for m in moments}})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(group_col).aggregate(
                  *[Sum(m, alias_name=m) for m in moments]))

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sxy" not in b.column_names:
            return pa.table({group_col: pa.array([], gtype),
                             "n": pa.array([], pa.int64()),
                             out: pa.array([], pa.float64())})
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = b["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = b["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = b["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        syy = b["syy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = b["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        num = n * sxy - sx * sy
        den = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        valid = (b["n"].to_numpy(zero_copy_only=False) >= 2) & (den > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = np.where(valid, num / np.where(den > 0, den, 1.0),
                            np.nan)
        return pa.table({group_col: b[group_col],
                         "n": b["n"],
                         out: pa.array(corr, mask=~valid)})

    return merged.map_batches(finish, batch_format="pyarrow")


def histogram_by_group(ds, group_col: str, value_col: str,
                       lo: int, hi: int, nbins: int):
    """→ Dataset(group, bin, bin_lo, n): fixed-width histogram of an
    integer column per group — distribution profiling for curation
    reports. Bin = clip((v - lo) * nbins // (hi - lo), 0, nbins-1)
    (values outside [lo, hi) clamp into the edge bins, so counts total
    the row count). Per-batch partial counts collapse each batch to at
    most groups × nbins rows before the shuffle; exact int64 counts
    bit-match a floor-arithmetic SQL oracle. Null values excluded."""
    from ray.data.aggregate import Sum

    if nbins < 1 or hi <= lo:
        raise ValueError("need nbins >= 1 and hi > lo")
    schema = ds.schema()
    gtype = schema.types[schema.names.index(group_col)]
    width = hi - lo

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({group_col: b[group_col], "v": b[value_col]})
        t = t.filter(pc.is_valid(t["v"]))
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "bin": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        v = t["v"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        bins = np.clip((v - lo) * nbins // width, 0, nbins - 1)
        t2 = pa.table({group_col: t[group_col], "bin": pa.array(bins),
                       "n": pa.array(np.ones(len(v), dtype=np.int64))})
        agg = t2.group_by([group_col, "bin"]).aggregate([("n", "sum")])
        return pa.table({group_col: agg[group_col],
                         "bin": agg["bin"], "n": agg["n_sum"]})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby([group_col, "bin"])
              .aggregate(Sum("n", alias_name="n")))

    def add_lo(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "bin" not in b.column_names:
            return pa.table({group_col: pa.array([], gtype),
                             "bin": pa.array([], pa.int64()),
                             "bin_lo": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        bins = b["bin"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({group_col: b[group_col], "bin": b["bin"],
                         "bin_lo": pa.array(
                             lo + bins * (float(width) / nbins)),
                         "n": b["n"]})

    return merged.map_batches(add_lo, batch_format="pyarrow")


def rollup_counts(ds, group_col: str, value_col: str,
                  total_key: str = "__all__"):
    """→ Dataset(group, n_rows, sum_value): per-group AND grand-total
    aggregates in ONE pass (GROUPING SETS ((group), ()) shape) — each
    batch emits its partials twice, once under the real key and once
    under ``total_key``, so a single keyed merge produces both levels
    without a second scan. Exact int64 sums; null values count toward
    n_rows but add 0 to the sum (SQL SUM skips nulls, COUNT(*) does
    not). The group column is cast to string so the sentinel total key
    can share it."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        g = pc.cast(b[group_col], pa.string())
        # loud beats wrong: a real group equal to the sentinel would
        # silently merge into the grand total, and a NULL group key
        # crashes Ray's sort-based groupby downstream (SQL would emit
        # a NULL-group row; pre-fill nulls upstream if wanted)
        if b.num_rows and pc.any(pc.equal(g, total_key)).as_py():
            raise ValueError(
                f"rollup_counts: group value collides with "
                f"total_key {total_key!r}")
        if b.num_rows and pc.any(pc.is_null(g)).as_py():
            raise ValueError(
                "rollup_counts: null group keys are unsupported "
                "(fill upstream)")
        v = pc.fill_null(pc.cast(b[value_col], pa.int64()), 0)
        ones = pa.array(np.ones(b.num_rows, dtype=np.int64))
        t = pa.table({group_col: g, "n_rows": ones, "sum_value": v})
        agg = t.group_by([group_col]).aggregate(
            [("n_rows", "sum"), ("sum_value", "sum")])
        per_group = pa.table({group_col: agg[group_col],
                              "n_rows": agg["n_rows_sum"],
                              "sum_value": agg["sum_value_sum"]})
        total = pa.table({
            group_col: pa.array([total_key], pa.string()),
            "n_rows": pa.array([b.num_rows], pa.int64()),
            "sum_value": pa.array(
                [pc.sum(v).as_py() or 0], pa.int64())})
        return pa.concat_tables([per_group, total])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col).aggregate(
                Sum("n_rows", alias_name="n_rows"),
                Sum("sum_value", alias_name="sum_value")))


def cumulative_distinct(ds, key_col: str = "user_id",
                        ts_col: str = "ts"):
    """→ Dataset(day, new_keys, cum_keys): per-day count of FIRST-SEEN
    keys and the running cumulative distinct-key total — the standard
    growth-curve query (DAU/WAU-style "distinct users to date").

    A windowed COUNT(DISTINCT) is not directly shuffleable; the
    first-seen decomposition is: min(day) per key (one key-partitioned
    groupby — the only corpus-scale shuffle), count per first-seen day
    (day-keyed groupby, ≤ one row per day), then one prefix sum over
    the day rows, which are bounded by the calendar, not the corpus
    (collected to the driver — thousands of rows at most, documented).
    Output day is date32; counts are int64. Null keys or timestamps
    are excluded (SQL COUNT(DISTINCT)/GROUP BY semantics: the oracle's
    min() ignores null ts and a null key forms no user row)."""
    from ray.data.aggregate import Min

    import ray.data

    def to_day(batch: pa.Table) -> pa.Table:
        t = pa.table({key_col: batch[key_col],
                      "day": pc.cast(batch[ts_col], pa.date32())})
        mask = pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t["day"]))
        t = t.filter(mask)
        return pa.table({key_col: t[key_col],
                         "day": pc.cast(t["day"], pa.int32())})

    first_seen = (ds.select_columns([key_col, ts_col])
                  .map_batches(to_day, batch_format="pyarrow")
                  .groupby(key_col)
                  .aggregate(Min("day", alias_name="day")))
    daily = first_seen.groupby("day").count()

    rows = sorted((r["day"], r["count()"]) for r in daily.take_all())
    # midnight timestamps rather than date32: pandas renders date32 as
    # Python-object dates, which value-compare unequal to a SQL DATE
    # column's datetime64 — same instant, different dtype
    days = pa.array(np.array([d for d, _ in rows], dtype=np.int32),
                    pa.date32()).cast(pa.timestamp("us"))
    new = np.array([c for _, c in rows], dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "day": days,
        "new_keys": pa.array(new),
        "cum_keys": pa.array(np.cumsum(new)),
    }))


def conversation_stats(ds, conv_col: str = "conv_id",
                       role_col: str = "role",
                       text_col: str = "text"):
    """Per-conversation rollup — turn count, per-role turn counts and
    total ASCII-contract tokens — the corpus profile an agent-trace
    curation run reads before choosing mixing weights. Classic
    pre-aggregated shape: each batch collapses to at most one row per
    (batch, conversation) with a C++ ``Table.group_by``, so the global
    groupby-sum shuffles partial rows, never turns."""
    import ray.data
    from ray.data.aggregate import Sum

    from raydedup.stages.textstats import ascii_token_counts

    out_cols = ["n_turns", "n_user", "n_assistant", "n_tool",
                "n_tokens"]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({conv_col: pa.array([], pa.string()),
                             **{c: pa.array([], pa.int64())
                                for c in out_cols}})
        roles = batch[role_col]
        ones = np.ones(batch.num_rows, dtype=np.int64)

        def role_flag(name: str):
            return pc.cast(pc.fill_null(pc.equal(roles, name), False),
                           pa.int64())

        t = pa.table({
            conv_col: batch[conv_col],
            "n_turns": pa.array(ones),
            "n_user": role_flag("user"),
            "n_assistant": role_flag("assistant"),
            "n_tool": role_flag("tool"),
            "n_tokens": pa.array(ascii_token_counts(batch[text_col])),
        })
        agg = t.group_by(conv_col).aggregate(
            [(c, "sum") for c in out_cols])
        return agg.rename_columns([conv_col] + out_cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(conv_col).aggregate(
        *[Sum(c, alias_name=c) for c in out_cols])


def value_deciles(ds, value_col: str, k: int = 10,
                  out: str = "decile",
                  driver_max_distinct: int = 2_000_000):
    """Global exact quantile binning: bucket i of ``k`` by cumulative
    distribution over the VALUE (ties share a bucket; bucket =
    ceil(k * cume_dist) in exact integer arithmetic, so both sides of
    the oracle agree bit-for-bit) — the quality-binning primitive a
    curation run uses to, e.g., drop the bottom length decile.

    Scale shape (auto-switch on the distinct-value count): the corpus
    always reduces first to one row per DISTINCT value (one counting
    groupby — the only corpus-scale exchange). At or below
    ``driver_max_distinct`` distinct values the cumulative walk runs on
    the driver and the value -> bucket map broadcasts back (``ray.put``
    once, vectorized ``pc.index_in`` paint) — the fast path for integer
    measurement columns. ABOVE it (free-form/text keys, unbounded
    cardinality) nothing corpus-sized touches the driver: the distinct
    table range-sorts by value, per-block (first-value, row-count,
    value-count) summaries — bounded by the BLOCK count, not the value
    count — compute exclusive prefix offsets on the driver, a second
    pass over the same materialized blocks adds offset + local cumsum
    (the ordered.py partition-boundary-carry idiom), and the resulting
    (value, bucket) table attaches to the corpus through a distributed
    hash join. Both paths produce identical buckets.

    Contract: ``value_col`` must be NON-NULL (a null has no rank in a
    cumulative distribution; the two paths would otherwise diverge —
    the join drops nulls, the driver paint would crash). Both paths
    assert this explicitly on the distinct-value table."""
    if k < 1:
        raise ValueError("k must be >= 1")
    counts = ds.groupby(value_col).count().materialize()
    n_distinct = counts.count()
    if n_distinct == 0:
        def noop(b: pa.Table) -> pa.Table:
            return b.append_column(out, pa.array([], pa.int64()))
        return ds.map_batches(noop, batch_format="pyarrow")

    if n_distinct <= driver_max_distinct:
        rows = [(r[value_col], r["count()"]) for r in counts.iter_rows()]
        if any(v is None for v, _ in rows):
            raise ValueError(
                "value_deciles: value_col contains nulls (non-null "
                "contract — see docstring)")
        rows.sort()
        n = sum(m for _, m in rows)
        vals = pa.array([v for v, _ in rows])
        cum = np.cumsum([m for _, m in rows], dtype=np.int64)
        buckets = (k * cum + n - 1) // n
        vals_ref = ray.put(vals)
        buckets_ref = ray.put(buckets)

        def paint(b: pa.Table) -> pa.Table:
            v = ray.get(vals_ref)
            bk = ray.get(buckets_ref)
            idx = pc.index_in(b[value_col], value_set=v).to_numpy(
                zero_copy_only=False)
            return b.append_column(out, pa.array(bk[idx], pa.int64()))

        return ds.map_batches(paint, batch_format="pyarrow")

    # ---- distributed path: two passes over the SAME materialized sorted
    # blocks (batch_size=None → one zero-copy batch per block, identical
    # block boundaries both passes); distinct values never collide across
    # blocks (post-groupby uniqueness), so a block's FIRST value is a
    # collision-free block id
    sorted_counts = counts.sort(value_col).materialize()

    def block_summary(b: pa.Table) -> pa.Table:
        if b[value_col].null_count:
            raise ValueError(
                "value_deciles: value_col contains nulls (non-null "
                "contract — see docstring)")
        if b.num_rows == 0:
            return pa.table({"lo": pa.array([], b[value_col].type),
                             "rows_total": pa.array([], pa.int64())})
        return pa.table({
            "lo": b[value_col].slice(0, 1),
            "rows_total": pa.array(
                [int(pc.sum(b["count()"]).as_py())], pa.int64()),
        })

    summaries = sorted_counts.map_batches(
        block_summary, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True).take_all()  # one row per BLOCK — bounded
    summaries.sort(key=lambda r: r["lo"])
    lo_vals = [r["lo"] for r in summaries]
    blk_rows = np.asarray([r["rows_total"] for r in summaries],
                          dtype=np.int64)
    n = int(blk_rows.sum())
    offsets = np.concatenate(([0], np.cumsum(blk_rows)[:-1]))
    lo_to_offset = {v: int(o) for v, o in zip(lo_vals, offsets)}
    off_ref = ray.put(lo_to_offset)

    def bucketize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({value_col: pa.array([], b[value_col].type),
                             out: pa.array([], pa.int64())})
        offs = ray.get(off_ref)
        base = offs[b[value_col][0].as_py()]
        local = np.cumsum(
            b["count()"].to_numpy(zero_copy_only=False).astype(np.int64))
        cum = base + local
        return pa.table({value_col: b[value_col],
                         out: pa.array((k * cum + n - 1) // n, pa.int64())})

    vmap = sorted_counts.map_batches(
        bucketize, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    from raydedup.util import join_partitions

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_parts = min(join_partitions(n_distinct), max(2, 2 * ncpu))
    return ds.join(vmap, join_type="inner", num_partitions=n_parts,
                   on=(value_col,))


def ecdf_drift_by_group(ds, by: str = "source", value_col: str = "n_chars"):
    """Distribution-drift monitor: the exact two-sample Kolmogorov-
    Smirnov statistic between each ``by`` group and the REST of the
    corpus over an integer measurement column — sup_x |F_group(x) -
    F_rest(x)| evaluated at every distinct value (the exact KS supremum
    for step ECDFs). The per-source drift report a curation run reads
    to catch a crawl whose length/quality distribution silently shifted.

    Scale shape: the corpus reduces to one row per (group, distinct
    value) through a counting groupby — the only exchange; that table is
    bounded by groups x distinct values (value_deciles' driver-walk
    contract: fine for integer measurement columns, not free-form keys),
    and the driver does one cumsum sweep over it. ECDF ratios are single
    correctly-rounded divisions of exact ints on both engine and oracle
    sides, so the max and the 6-decimal round agree bit-for-bit.

    Groups equal to the whole corpus (n_rest = 0) are dropped; null
    group keys are dropped (SQL grouping of NULL never joins back).
    Returns a small pyarrow Table: group, n_docs, ks_stat (unrounded).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({by: batch[by], value_col: batch[value_col]})
        t = t.filter(pc.and_(pc.is_valid(t[by]), pc.is_valid(t[value_col])))
        if t.num_rows == 0:
            return pa.table({by: pa.array([], batch[by].type),
                             "x": pa.array([], batch[value_col].type),
                             "c": pa.array([], pa.int64())})
        g = t.group_by([by, value_col]).aggregate([([], "count_all")])
        return pa.table({by: g[by], "x": g[value_col],
                         "c": pc.cast(g["count_all"], pa.int64())})

    counts = (ds.select_columns([by, value_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby([by, "x"]).aggregate(Sum("c", alias_name="c")))
    rows = counts.take_all()
    empty = pa.table({by: pa.array([], pa.string()),
                      "n_docs": pa.array([], pa.int64()),
                      "ks_stat": pa.array([], pa.float64())})
    if not rows:
        return empty
    groups = sorted({r[by] for r in rows})
    xs = sorted({r["x"] for r in rows})
    gi = {g: i for i, g in enumerate(groups)}
    xi = {x: i for i, x in enumerate(xs)}
    M = np.zeros((len(groups), len(xs)), dtype=np.int64)
    for r in rows:
        M[gi[r[by]], xi[r["x"]]] = r["c"]
    cum = np.cumsum(M, axis=1)
    tot_le = cum.sum(axis=0)
    n_g = M.sum(axis=1)
    n = int(n_g.sum())
    out_g: list = []
    out_n: list[int] = []
    out_ks: list[float] = []
    for i, g in enumerate(groups):
        n_rest = n - int(n_g[i])
        if n_rest == 0:
            continue
        f_g = cum[i] / n_g[i]
        f_rest = (tot_le - cum[i]) / n_rest
        out_g.append(g)
        out_n.append(int(n_g[i]))
        out_ks.append(float(np.max(np.abs(f_g - f_rest))))
    if not out_g:
        return empty
    return pa.table({by: out_g, "n_docs": pa.array(out_n, pa.int64()),
                     "ks_stat": pa.array(out_ks, pa.float64())})


def kl_divergence_by_group(ds, by: str = "source", text_col: str = "text",
                           n_buckets: int = 1024, alpha: float = 1.0):
    """Per-group unigram KL divergence vs the REST of the corpus over
    hashed token buckets — the information-theoretic drift monitor next
    to ``ecdf_drift_by_group``'s KS statistic: KS sees a shifted length
    distribution, KL sees a shifted VOCABULARY (a crawl that switched
    language, template, or domain mix). With add-``alpha`` smoothing
    over ``n_buckets`` md5 buckets (the DSIR fixed-size-state idiom —
    model size is n_buckets by construction, never vocabulary-scale):

        p_b = (c(g, b) + alpha) / (n_g + alpha * B)
        q_b = (c(rest, b) + alpha) / (n_rest + alpha * B)
        KL(g || rest) = sum_b p_b * ln(p_b / q_b)    [nats]

    bucket(t) = md5-low64(t) % B, so a DuckDB oracle replays every cell
    (``CAST('0x' || substr(md5(tok), 17, 16) AS UBIGINT) % B``).

    Scale shape: per batch, one vectorized tokenize + dictionary_encode,
    md5 once per DISTINCT token, one bincount over (group, bucket)
    composite codes — the corpus reduces to <= groups x B partial rows
    per batch and one grouped sum. The driver walk is bounded by
    groups x B (the ``ecdf_drift_by_group`` contract), never by corpus
    or vocabulary. NULL group keys are dropped; a group equal to the
    whole corpus (empty rest) is dropped. Returns pyarrow Table
    (by, n_tokens, kl), kl unrounded."""
    import hashlib

    from ray.data.aggregate import Sum

    from raydedup.stages.collection import _flat_tokens

    def partial(batch: pa.Table) -> pa.Table:
        empty_p = pa.table({by: pa.array([], pa.string()),
                            "bkt": pa.array([], pa.int64()),
                            "c": pa.array([], pa.int64())})
        gcol = pc.cast(batch[by].combine_chunks(), pa.string())
        flat, rowidx = _flat_tokens(batch[text_col])
        if len(rowidx) == 0:
            return empty_p
        genc = pc.dictionary_encode(gcol)
        gcodes = pc.fill_null(genc.indices, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tok_g = gcodes[rowidx]
        keep = tok_g >= 0  # drop NULL group keys
        if not keep.all():
            flat = flat.filter(pa.array(keep))
            tok_g = tok_g[keep]
        if len(tok_g) == 0:
            return empty_p
        tenc = pc.dictionary_encode(flat)
        tcodes = tenc.indices.to_numpy(zero_copy_only=False)
        bkt_of = np.fromiter(
            (int.from_bytes(hashlib.md5(t.encode()).digest()[8:],
                            "big") % n_buckets
             for t in tenc.dictionary.to_pylist()),
            dtype=np.int64, count=len(tenc.dictionary))
        comp = tok_g * n_buckets + bkt_of[tcodes]
        counts = np.bincount(comp)
        present = np.flatnonzero(counts)
        return pa.table({
            by: genc.dictionary.take(pa.array(present // n_buckets)),
            "bkt": pa.array(present % n_buckets, pa.int64()),
            "c": pa.array(counts[present], pa.int64()),
        })

    cells = (ds.select_columns([by, text_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby([by, "bkt"]).aggregate(Sum("c", alias_name="c")))
    rows = cells.take_all()  # bounded by groups x n_buckets
    empty = pa.table({by: pa.array([], pa.string()),
                      "n_tokens": pa.array([], pa.int64()),
                      "kl": pa.array([], pa.float64())})
    if not rows:
        return empty
    groups = sorted({r[by] for r in rows})
    gi = {g: i for i, g in enumerate(groups)}
    M = np.zeros((len(groups), n_buckets), dtype=np.int64)
    for r in rows:
        M[gi[r[by]], r["bkt"]] = r["c"]
    n_g = M.sum(axis=1)
    tot_b = M.sum(axis=0)
    n = int(n_g.sum())
    out_g, out_n, out_kl = [], [], []
    for i, g in enumerate(groups):
        n_rest = n - int(n_g[i])
        if n_rest == 0:
            continue
        p = (M[i] + alpha) / (n_g[i] + alpha * n_buckets)
        q = (tot_b - M[i] + alpha) / (n_rest + alpha * n_buckets)
        out_g.append(g)
        out_n.append(int(n_g[i]))
        out_kl.append(float(np.sum(p * np.log(p / q))))
    if not out_g:
        return empty
    return pa.table({by: out_g,
                     "n_tokens": pa.array(out_n, pa.int64()),
                     "kl": pa.array(out_kl, pa.float64())})
