"""Declarative data-expectations gate — the schema/content validation
stage a production ingest runs before any expensive compute (the
Great-Expectations-style contract check, engine addition beyond the
reference: OTMT's only input validation is per-memento error records,
``otmt/input_types.py:535-539`` / ``otmt/measuremodel.py:278-288``; this
generalizes those error rows to declarative corpus-wide rules).

``expect(ds, rules)`` → Dataset(rule, n_violations) with ONE row per
rule (zero-violation rules included, so the report is the full
contract). Rule kinds:

  ("name", "not_null",   col)            — value IS NULL
  ("name", "non_empty",  col)            — NULL or '' after fold
  ("name", "len_between", col, lo, hi)   — length(coalesce(col,''))
                                            outside [lo, hi]
  ("name", "in_set",     col, values)    — value not in the closed set
                                            (NULL counts as violation)
  ("name", "len_equals", col, text_col)  — int col != length(text_col)
                                            (cross-column consistency)
  ("name", "unique",     col)            — sum(n-1) over values with
                                            n >= 2 (extra copies)

Scale shape: every kind except ``unique`` is a per-batch vectorized
Arrow mask reduced to ONE (rule, count) partial row per batch — the
final groupby moves #rules × #blocks tiny rows. ``unique`` needs the
one genuine exchange: batches reduce to (value, count) partials via
``pc.value_counts`` (one row per DISTINCT value per batch), a
value-keyed counting groupby merges them, and the extra-copy total
reduces through a second partial sum — the `_text_group_counts` idiom;
raw rows never shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

_KINDS = {"not_null", "non_empty", "len_between", "in_set",
          "len_equals", "unique"}


def _violation_mask(batch: pa.Table, rule: tuple):
    kind, col = rule[1], rule[2]
    arr = batch[col]
    if kind == "not_null":
        return pc.is_null(arr)
    if kind == "non_empty":
        return pc.equal(pc.fill_null(pc.cast(arr, pa.string()), ""), "")
    if kind == "len_between":
        lo, hi = rule[3], rule[4]
        n = pc.utf8_length(pc.fill_null(arr, ""))
        return pc.or_(pc.less(n, lo), pc.greater(n, hi))
    if kind == "in_set":
        ok = pc.is_in(arr, value_set=pa.array(rule[3], arr.type))
        return pc.invert(pc.fill_null(ok, False))
    if kind == "len_equals":
        n = pc.cast(pc.utf8_length(pc.fill_null(batch[rule[3]], "")),
                    arr.type)
        return pc.invert(pc.fill_null(pc.equal(arr, n), False))
    raise AssertionError(kind)


def expect(ds, rules: list[tuple]):
    """→ Dataset(rule:string, n_violations:int64), one row per rule."""
    if not rules:
        raise ValueError("rules must be non-empty")
    names = [r[0] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("duplicate rule names")
    for r in rules:
        if r[1] not in _KINDS:
            raise ValueError(f"unknown rule kind {r[1]!r}")
    mask_rules = [r for r in rules if r[1] != "unique"]
    uniq_rules = [r for r in rules if r[1] == "unique"]

    parts = []
    if mask_rules:
        def count_partial(batch: pa.Table) -> pa.Table:
            ns = [int(pc.sum(pc.cast(_violation_mask(batch, r),
                                     pa.int64())).as_py() or 0)
                  for r in mask_rules]
            return pa.table({
                "rule": pa.array([r[0] for r in mask_rules], pa.string()),
                "n_violations": pa.array(ns, pa.int64()),
            })

        parts.append(ds.map_batches(count_partial, batch_format="pyarrow")
                     .groupby("rule")
                     .aggregate(Sum("n_violations",
                                    alias_name="n_violations")))

    for r in uniq_rules:
        name, col = r[0], r[2]

        def val_partial(batch: pa.Table, col=col) -> pa.Table:
            vc = pc.value_counts(
                pc.cast(batch[col].combine_chunks(), pa.string()))
            return pa.table({"v": vc.field("values"),
                             "n": pc.cast(vc.field("counts"), pa.int64())})

        merged = (ds.select_columns([col])
                  .map_batches(val_partial, batch_format="pyarrow")
                  .groupby("v").aggregate(Sum("n", alias_name="n")))

        def extras_partial(b: pa.Table, name=name) -> pa.Table:
            if b.num_rows == 0 or "n" not in b.column_names:
                tot = 0
            else:
                n = b["n"].to_numpy(zero_copy_only=False)
                tot = int((n[n >= 2] - 1).sum())
            return pa.table({"rule": pa.array([name], pa.string()),
                             "n_violations": pa.array([tot], pa.int64())})

        parts.append(merged.map_batches(extras_partial,
                                        batch_format="pyarrow")
                     .groupby("rule")
                     .aggregate(Sum("n_violations",
                                    alias_name="n_violations")))

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
