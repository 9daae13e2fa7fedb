"""General relational pipelines over the TPC-H-shaped tables — the
engine's demonstration that classic scan→join→aggregate queries are
first-class alongside the dedup operators (the reference's measure
tables are tiny; a 100-TB curation run also needs fact-table joins for
metadata enrichment and per-source accounting).

Execution shape:

* ``pricing_summary`` (TPC-H Q1 shape): pruned read → per-batch Arrow
  ``Table.group_by`` partial aggregation (a handful of groups, so each
  batch collapses to a few rows BEFORE the shuffle) → tiny global
  ``groupby().aggregate`` → derived averages. The shuffle moves
  O(groups × blocks) rows, never the fact table.
* ``revenue_by_nation`` (TPC-H Q5 shape): big-big hash join
  (lineitem ⋈ orders via ``Dataset.join``) with pre-join projection +
  row-group predicate pushdown, then a broadcast dim chain
  (customer ⋈ nation ⋈ region collapsed to one custkey→nation lookup
  shipped once via ``ray.put``) and the same partial-then-merge
  aggregate. Dims are genuinely small sides (25 nations, 5 regions);
  the customer side broadcasts when under ``broadcast_limit`` rows and
  otherwise routes through a second distributed hash join on
  o_custkey, shipping only surviving-nation customers with an int
  nation key (both routes produce identical output — tested).

Exactness: money columns are fixed-point decimals (2 dp), so all sums
run in integer cents — ``sum_base_cents`` (¢), ``sum_disc_e4``
(¢ × discount%, 1e-4 units), ``sum_charge_e6`` (1e-6 units) — exact
int64 arithmetic that bit-matches a SQL oracle regardless of
accumulation order. int64 holds the e6-scaled charge up to ~8e7 rows
per group; beyond that emit the e4/e2 columns or widen to float with a
documented tolerance. Averages are exact-int ÷ exact-int in float64 —
the same two operands on both sides, hence bit-identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _cents(col: pa.ChunkedArray) -> np.ndarray:
    """Exact 2-dp decimal column → integer cents (int64). The doubles
    are the nearest-representable of 2-dp decimals, so *100 lands
    within 1 ulp of the integer and rint recovers it exactly."""
    v = col.combine_chunks().to_numpy(zero_copy_only=False)
    return np.rint(v * 100.0).astype(np.int64)


def pricing_summary(lineitem, cutoff_days: int | None = None):
    """TPC-H Q1-shaped pricing summary report.

    → Dataset(l_returnflag, l_linestatus, sum_qty, sum_base_cents,
    sum_disc_e4, sum_charge_e6, avg_qty, avg_price_cents, count_order)
    where disc_price = price·(1−discount) and charge =
    disc_price·(1+tax), carried in scaled integers (see module
    docstring). ``cutoff_days`` optionally keeps only rows with
    ``l_shipdate <= max_date − cutoff_days`` (Q1's DELTA predicate) —
    applied per batch; at 100 TB pass a literal date filter to the read
    instead so row groups prune.
    """
    from ray.data.aggregate import Sum

    keys = ["l_returnflag", "l_linestatus"]

    cutoff = None
    if cutoff_days is not None:
        import datetime

        hi = lineitem.max("l_shipdate")
        cutoff = hi - datetime.timedelta(days=cutoff_days)

    sums = ["sum_qty", "sum_base_cents", "sum_disc_e4", "sum_charge_e6",
            "count_order"]

    def partial(b: pa.Table) -> pa.Table:
        if cutoff is not None:
            b = b.filter(pc.less_equal(b["l_shipdate"], pa.scalar(cutoff)))
        qty = pc.cast(pc.round(b["l_quantity"]), pa.int64())
        ep = _cents(b["l_extendedprice"])
        disc = _cents(b["l_discount"])
        tax = _cents(b["l_tax"])
        disc_e4 = ep * (100 - disc)
        charge_e6 = disc_e4 * (100 + tax)
        t = pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "sum_qty": qty,
            "sum_base_cents": pa.array(ep),
            "sum_disc_e4": pa.array(disc_e4),
            "sum_charge_e6": pa.array(charge_e6),
            "count_order": pa.array(np.ones(b.num_rows, dtype=np.int64)),
        })
        agg = t.group_by(keys).aggregate([(c, "sum") for c in sums])
        # select by NAME (pyarrow emits "<col>_sum" + keys; relying on
        # positional order would break across pyarrow versions)
        return pa.table({**{c: agg[f"{c}_sum"] for c in sums},
                         **{k: agg[k] for k in keys}})

    partials = lineitem.map_batches(partial, batch_format="pyarrow")
    merged = partials.groupby(keys).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_cents", alias_name="sum_base_cents"),
        Sum("sum_disc_e4", alias_name="sum_disc_e4"),
        Sum("sum_charge_e6", alias_name="sum_charge_e6"),
        Sum("count_order", alias_name="count_order"),
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "count_order" not in b.column_names:
            # zero-row blocks can carry the pre-map schema
            return pa.table(
                {**{k: pa.array([], pa.string()) for k in keys},
                 **{c: pa.array([], pa.int64()) for c in sums},
                 "avg_qty": pa.array([], pa.float64()),
                 "avg_price_cents": pa.array([], pa.float64())})
        n = b["count_order"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        q = b["sum_qty"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        p = b["sum_base_cents"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        return b.append_column("avg_qty", pa.array(q / n)).append_column(
            "avg_price_cents", pa.array(p / n))

    return merged.map_batches(finish, batch_format="pyarrow")


def revenue_by_nation(lineitem, orders, customer, nation, region,
                      region_name: str | None = None,
                      date_lo=None, date_hi=None,
                      num_partitions: int | None = None,
                      broadcast_limit: int = 5_000_000):
    """TPC-H Q5-shaped revenue rollup: lineitem ⋈ orders ⋈ customer ⋈
    nation (⋈ region filter) → Dataset(n_name, n_rows, revenue_e4).

    ``revenue_e4`` = Σ price·(1−discount) in exact 1e-4 units (integer
    cents × integer discount%). The customer→nation chain collapses to
    one broadcast int64→string lookup when the customer table is under
    ``broadcast_limit`` rows; above it, a second distributed hash join
    on o_custkey takes over (see module docstring). The
    lineitem⋈orders fact join is always a distributed hash join.
    """
    import ray
    from ray.data.aggregate import Sum

    if num_partitions is None:
        # Ray 2.49's hash join DEADLOCKS when num_partitions far exceeds
        # the cluster's CPUs (measured: 4× CPUs fine, 8× hangs — the
        # aggregator pool starves the upstream map tasks). Auto-size to
        # 2× CPUs; on a multi-node cluster pass an explicit value sized
        # to total cores ÷ per-partition memory.
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(32, 2 * ncpu))

    # --- dim chain: nation (⋈ region) → custkey → n_name lookup -------
    nat = nation.to_arrow_refs()
    nat_t = pa.concat_tables([ray.get(r) for r in nat])
    if region_name is not None:
        reg_t = pa.concat_tables([ray.get(r) for r in region.to_arrow_refs()])
        keep = reg_t.filter(
            pc.equal(reg_t["r_name"], region_name))["r_regionkey"]
        nat_t = nat_t.filter(pc.is_in(nat_t["n_regionkey"],
                                      value_set=keep.combine_chunks()))
    nkey_to_name = dict(zip(nat_t["n_nationkey"].to_pylist(),
                            nat_t["n_name"].to_pylist()))

    # nation lookup: always tiny (25 rows), closure-captured
    nat_keys = np.asarray(sorted(nkey_to_name), dtype=np.int64)
    nat_names = np.asarray([nkey_to_name[k] for k in nat_keys],
                           dtype=object)

    # materialize once: count() would otherwise execute the lineage and
    # discard it, then to_arrow_refs()/the join would re-execute it
    customer = customer.materialize()
    cust_count = customer.count()
    broadcast_cust = cust_count <= broadcast_limit
    lookup_keys = lookup_names = None
    if broadcast_cust:
        cust_t = pa.concat_tables(
            [ray.get(r) for r in customer.select_columns(
                ["c_custkey", "c_nationkey"]).to_arrow_refs()])
        cnk = cust_t["c_nationkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(nat_keys):
            pos_c = np.clip(np.searchsorted(nat_keys, cnk),
                            0, len(nat_keys) - 1)
            hit = nat_keys[pos_c] == cnk
        else:
            pos_c = np.zeros(len(cnk), dtype=np.int64)
            hit = np.zeros(len(cnk), dtype=bool)
        ck_all = cust_t["c_custkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)[hit]
        nn_all = nat_names[pos_c[hit]]
        # sorted ONCE on the driver; tasks binary-search shared arrays
        order = np.argsort(ck_all, kind="stable")
        lookup_keys = ray.put(ck_all[order])
        lookup_names = ray.put(nn_all[order])

    # --- fact side: prune + pre-aggregate projection ------------------
    def ord_proj(b: pa.Table) -> pa.Table:
        m = None
        if date_lo is not None:
            m = pc.greater_equal(b["o_orderdate"], pa.scalar(date_lo))
        if date_hi is not None:
            hi = pc.less(b["o_orderdate"], pa.scalar(date_hi))
            m = hi if m is None else pc.and_(m, hi)
        if m is not None:
            b = b.filter(m)
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_custkey": b["o_custkey"]})

    def li_proj(b: pa.Table) -> pa.Table:
        ep = _cents(b["l_extendedprice"])
        disc = _cents(b["l_discount"])
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "rev_e4": pa.array(ep * (100 - disc))})

    ord_small = orders.map_batches(ord_proj, batch_format="pyarrow")
    li_small = lineitem.map_batches(li_proj, batch_format="pyarrow")
    joined = li_small.join(ord_small, join_type="inner",
                           num_partitions=num_partitions,
                           on=("l_orderkey",), right_on=("o_orderkey",))

    def _empty_out() -> pa.Table:
        return pa.table({"n_name": pa.array([], pa.string()),
                         "n_rows": pa.array([], pa.int64()),
                         "revenue_e4": pa.array([], pa.int64())})

    def _agg_partial(nn: np.ndarray, rev: np.ndarray) -> pa.Table:
        t = pa.table({"n_name": pa.array(nn, pa.string()),
                      "n_rows": pa.array(
                          np.ones(len(rev), dtype=np.int64)),
                      "revenue_e4": pa.array(rev)})
        agg = t.group_by(["n_name"]).aggregate(
            [("n_rows", "sum"), ("revenue_e4", "sum")])
        return pa.table({"n_name": agg["n_name"],
                         "n_rows": agg["n_rows_sum"],
                         "revenue_e4": agg["revenue_e4_sum"]})

    def partial_broadcast(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return _empty_out()
        keys = ray.get(lookup_keys)
        names = ray.get(lookup_names)
        if len(keys) == 0:
            return _empty_out()
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        pos_c = np.clip(np.searchsorted(keys, ck), 0, len(keys) - 1)
        hit = keys[pos_c] == ck
        if not hit.any():
            return _empty_out()
        rev = b["rev_e4"].to_numpy(zero_copy_only=False)[hit]
        return _agg_partial(names[pos_c[hit]], rev)

    if broadcast_cust:
        partials = joined.map_batches(partial_broadcast,
                                      batch_format="pyarrow")
    else:
        # customer outgrows a broadcast: second distributed hash join
        # (same shape as the fact join); only the surviving-nation
        # customers ship, carrying a small int nation key
        def cust_proj(b: pa.Table) -> pa.Table:
            keep = pc.is_in(
                pc.cast(b["c_nationkey"], pa.int64()),
                value_set=pa.array(nat_keys, pa.int64()))
            b = b.filter(pc.fill_null(keep, False))
            # int64 on BOTH join keys (proj_fix emits o_custkey int64;
            # mixed-width keys break the hash join)
            return pa.table({"c_custkey": pc.cast(b["c_custkey"],
                                                  pa.int64()),
                             "c_nationkey": pc.cast(b["c_nationkey"],
                                                    pa.int64())})

        cust_small = customer.map_batches(cust_proj,
                                          batch_format="pyarrow")

        # Ray 2.49's join emits zero-row blocks with an EMPTY schema
        # from empty hash partitions; a second join downstream then
        # fails to resolve its key ("No match ... for key field").
        # Re-project to a fixed two-column schema (also slims the
        # shuffle to the only columns the second join needs).
        def proj_fix(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "o_custkey" not in b.column_names:
                return pa.table({"o_custkey": pa.array([], pa.int64()),
                                 "rev_e4": pa.array([], pa.int64())})
            return pa.table(
                {"o_custkey": pc.cast(b["o_custkey"], pa.int64()),
                 "rev_e4": b["rev_e4"]})

        joined2 = joined.map_batches(
            proj_fix, batch_format="pyarrow").join(
            cust_small, join_type="inner",
            num_partitions=num_partitions,
            on=("o_custkey",), right_on=("c_custkey",))

        def partial_joined(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "c_nationkey" not in b.column_names:
                return _empty_out()
            cnk = b["c_nationkey"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(nat_keys, cnk),
                          0, max(len(nat_keys) - 1, 0))
            rev = b["rev_e4"].to_numpy(zero_copy_only=False)
            return _agg_partial(nat_names[pos], rev)

        partials = joined2.map_batches(partial_joined,
                                       batch_format="pyarrow")

    return partials.groupby("n_name").aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("revenue_e4", alias_name="revenue_e4"),
    )


def filtered_revenue(lineitem, date_lo, date_hi,
                     disc_lo_cents: int, disc_hi_cents: int,
                     qty_below: float):
    """TPC-H Q6-shaped forecast-revenue scan: one pruned pass over
    lineitem, no joins, no shuffle beyond a constant-key merge of
    one-row partials. → Dataset(n_rows, revenue_e4) (exactly one row)
    where revenue = Σ price·discount over rows with ``date_lo <=
    l_shipdate < date_hi``, ``disc_lo <= l_discount <= disc_hi`` (in
    integer cents — exact, no float epsilon games) and ``l_quantity <
    qty_below``. At 100 TB the date predicate belongs in the
    ``read_parquet`` filter so row groups prune before the scan; here
    it is also applied per batch so the stage is correct standalone.
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["l_shipdate"], pa.scalar(date_lo)),
                    pc.less(b["l_shipdate"], pa.scalar(date_hi)))
        m = pc.and_(m, pc.less(b["l_quantity"], pa.scalar(qty_below)))
        b = b.filter(pc.fill_null(m, False))
        ep = _cents(b["l_extendedprice"])
        disc = _cents(b["l_discount"])
        keep = (disc >= disc_lo_cents) & (disc <= disc_hi_cents)
        return pa.table({
            "__all": pa.array([0], pa.int64()),
            "n_rows": pa.array([int(keep.sum())], pa.int64()),
            "revenue_e4": pa.array([int((ep[keep] * disc[keep]).sum())],
                                   pa.int64())})

    merged = (lineitem.map_batches(partial, batch_format="pyarrow")
              .groupby("__all")
              .aggregate(Sum("n_rows", alias_name="n_rows"),
                         Sum("revenue_e4", alias_name="revenue_e4")))
    return merged.select_columns(["n_rows", "revenue_e4"])


def top_unshipped_orders(lineitem, orders, customer, segment: str,
                         cutoff, k: int = 10,
                         num_partitions: int | None = None,
                         broadcast_limit: int = 5_000_000):
    """TPC-H Q3-shaped shipping-priority report: the ``k``
    highest-revenue orders from ``segment`` customers that were placed
    before ``cutoff`` but still have line items shipping after it.
    → Dataset(l_orderkey, o_orderdate, revenue_e4), revenue in exact
    1e-4 integer units, ties broken by orderkey asc (shared with the
    oracle).

    Shape: both fact sides prune + project per batch before the
    distributed lineitem ⋈ orders hash join; the segment-customer
    filter broadcasts a sorted custkey array when the customer table is
    under ``broadcast_limit`` rows and otherwise routes through the
    distributed ``semi_join`` (same auto-switch idiom as
    ``revenue_by_nation``). Per-batch Arrow group_by partials collapse
    the join output to (orderkey, date, Σrev) rows before the final
    small groupby, and the top-k runs as sort+limit on the aggregated
    table (O(orders-in-window) rows, not lineitem).
    """
    import ray
    from ray.data.aggregate import Sum

    if num_partitions is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(32, 2 * ncpu))

    def cust_proj(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["c_mktsegment"], segment)
        b = b.filter(pc.fill_null(keep, False))
        return pa.table({"o_custkey": pc.cast(b["c_custkey"], pa.int64())})

    cust_keys = customer.map_batches(cust_proj, batch_format="pyarrow")
    cust_keys = cust_keys.materialize()  # count() + reuse below

    def ord_proj(b: pa.Table) -> pa.Table:
        m = pc.less(b["o_orderdate"], pa.scalar(cutoff))
        b = b.filter(pc.fill_null(m, False))
        return pa.table({"o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                         "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
                         "o_orderdate": b["o_orderdate"]})

    ord_small = orders.map_batches(ord_proj, batch_format="pyarrow")

    if cust_keys.count() <= broadcast_limit:
        keys = np.sort(np.concatenate(
            [t["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False)
             for t in (ray.get(r) for r in cust_keys.to_arrow_refs())
             if t.num_rows] or [np.array([], dtype=np.int64)]))
        keys_ref = ray.put(keys)

        def ord_in_segment(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "o_custkey" not in b.column_names:
                return pa.table(
                    {"o_orderkey": pa.array([], pa.int64()),
                     "o_custkey": pa.array([], pa.int64()),
                     "o_orderdate": pa.array([], pa.timestamp("us"))})
            ks = ray.get(keys_ref)
            ck = b["o_custkey"].to_numpy(zero_copy_only=False)
            if len(ks) == 0:
                return b.slice(0, 0)
            pos = np.clip(np.searchsorted(ks, ck), 0, len(ks) - 1)
            return b.filter(pa.array(ks[pos] == ck))

        ord_seg = ord_small.map_batches(ord_in_segment,
                                        batch_format="pyarrow")
    else:
        ord_seg = semi_join(ord_small, cust_keys, on="o_custkey",
                            num_partitions=num_partitions)

    def li_proj(b: pa.Table) -> pa.Table:
        m = pc.greater(b["l_shipdate"], pa.scalar(cutoff))
        b = b.filter(pc.fill_null(m, False))
        ep = _cents(b["l_extendedprice"])
        disc = _cents(b["l_discount"])
        return pa.table({"l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                         "rev_e4": pa.array(ep * (100 - disc))})

    li_small = lineitem.map_batches(li_proj, batch_format="pyarrow")
    joined = li_small.join(ord_seg, join_type="inner",
                           num_partitions=num_partitions,
                           on=("l_orderkey",), right_on=("o_orderkey",))

    def agg_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "rev_e4" not in b.column_names:
            return pa.table(
                {"l_orderkey": pa.array([], pa.int64()),
                 "o_orderdate": pa.array([], pa.timestamp("us")),
                 "revenue_e4": pa.array([], pa.int64())})
        t = pa.table({"l_orderkey": b["l_orderkey"],
                      "o_orderdate": b["o_orderdate"],
                      "revenue_e4": b["rev_e4"]})
        agg = t.group_by(["l_orderkey", "o_orderdate"]).aggregate(
            [("revenue_e4", "sum")])
        return pa.table({"l_orderkey": agg["l_orderkey"],
                         "o_orderdate": agg["o_orderdate"],
                         "revenue_e4": agg["revenue_e4_sum"]})

    merged = (joined.map_batches(agg_partial, batch_format="pyarrow")
              .groupby(["l_orderkey", "o_orderdate"])
              .aggregate(Sum("revenue_e4", alias_name="revenue_e4")))
    return merged.sort(["revenue_e4", "l_orderkey"],
                       descending=[True, False]).limit(k)


def semi_join(left, right, on: str, anti: bool = False,
              num_partitions: int = 64):
    """Distributed semi-join (``anti=True`` → anti-join): every left row
    whose ``on`` key has at least one (resp. no) right row — the
    relational primitive behind decontamination-style filters when the
    filter side is too big to broadcast. Right reduces to per-batch
    DISTINCT keys before the shuffle; both sides hash-partition by key
    and one vectorized membership test per partition emits the
    survivors. NOT EXISTS null semantics: a NULL left key matches
    nothing (dropped by semi, kept by anti).
    """
    from raydedup.stages.asof import _group_codes, _part_array

    lschema = left.schema()
    lcols = list(lschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))
    if on not in lcols or on not in right.schema().names:
        raise ValueError(f"join key {on!r} missing from a side")

    def norm_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in lcols}
        cols["__side"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        cols["__part"] = _part_array(b[on], num_partitions)
        return pa.table(cols)

    def norm_right(b: pa.Table) -> pa.Table:
        keys = pa.table({on: b[on]}).group_by([on]).aggregate([])
        n = keys.num_rows
        cols = {c: keys[on] if c == on else pa.nulls(n, ltypes[c])
                for c in lcols}
        cols["__side"] = pa.array(np.zeros(n, dtype=np.int8))
        cols["__part"] = _part_array(keys[on], num_partitions)
        return pa.table(cols)

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__side" not in g.column_names:
            return pa.table({c: pa.array([], ltypes[c]) for c in lcols})
        side = g["__side"].to_numpy(zero_copy_only=False)
        codes, keynull = _group_codes(g[on])
        rcodes = np.unique(codes[(side == 0) & ~keynull])
        is_left = side == 1
        hit = np.isin(codes, rcodes) & ~keynull
        keep = is_left & (~hit if anti else hit)
        sel = pa.array(np.flatnonzero(keep))
        return pa.table({c: g[c].take(sel) for c in lcols})

    unioned = (left.map_batches(norm_left, batch_format="pyarrow")
               .union(right.map_batches(norm_right,
                                        batch_format="pyarrow")))
    return unioned.groupby("__part").map_groups(merge,
                                                batch_format="pyarrow")


def pivot_counts(ds, key_col: str, cat_col: str, categories: list[str],
                 prefix: str = "n_", other: str = "n_other"):
    """Pivot a category column into per-category COUNT columns per key
    (warehouse PIVOT / COUNT(*) FILTER): → Dataset(key, n_<cat>...,
    n_other). Each batch collapses to one row per key present (Arrow
    group_by over masked 0/1 columns) BEFORE the shuffle, so the
    exchange carries O(keys × blocks) rows of int64 — exact counts,
    bit-matching the FILTER oracle. Categories must be an explicit
    (small) list — pivots with unbounded category sets should stay long
    (key, cat, n) via a plain groupby instead."""
    from ray.data.aggregate import Sum

    if not categories:
        raise ValueError("categories must be a non-empty list")
    names = [f"{prefix}{c}" for c in categories] + [other]

    def partial(b: pa.Table) -> pa.Table:
        cat = b[cat_col]
        cols = {key_col: b[key_col]}
        seen = None
        for c, nm in zip(categories, names):
            m = pc.equal(cat, c)
            cols[nm] = pc.cast(pc.fill_null(m, False), pa.int64())
            seen = cols[nm] if seen is None else pc.add(seen, cols[nm])
        cols[other] = pc.subtract(
            pa.array(np.ones(b.num_rows, dtype=np.int64)), seen)
        t = pa.table(cols)
        agg = t.group_by([key_col]).aggregate(
            [(nm, "sum") for nm in names])
        return pa.table({key_col: agg[key_col],
                         **{nm: agg[f"{nm}_sum"] for nm in names}})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(key_col).aggregate(
        *[Sum(nm, alias_name=nm) for nm in names])
