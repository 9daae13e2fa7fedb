"""Exact duplicate detection: hash-partition on text_sha256, per-group
representative assignment.

Generalizes the reference's identical-simhash grouping
(``bin/cluster_by_simhash:82-86`` — DBSCAN whose metric degenerates to an
equality indicator, so clusters are just groups of >= 2 identical values)
to identical-TEXT grouping keyed by sha256, which is both stricter and
shuffle-friendly.

This stage is also the hot-bucket killer for LSH (SURVEY §7.5): thousands
of copies of trivial turns ("ok", tool boilerplate) collapse to ONE
representative row here, so downstream near-dup candidate generation never
sees them as an O(n^2) bucket.

Execution shape (the measured-fast path): in real corpora the vast
majority of sha groups are singletons, and a ``groupby().map_groups``
pays a Python call per group — millions of calls for zero information.
Instead:

  1. the duplicated-text table ``(text_sha256, n_exact,
     rep_key=min(row_key))`` is computed either by sha-prefix-partitioned
     partial/merge tasks (small inputs; no shuffle) or by one NATIVE
     grouped aggregate (vectorized sort-shuffle) above the row threshold
     — no Python call per group on either path;
  2. only groups with n_exact >= 2 are broadcast (``ray.put`` once) and a
     stateless vectorized ``map_batches`` (``pc.index_in`` probe) paints
     rep_key/n_exact/is_rep onto every row — singletons take the fast
     default path.

Scale note: the broadcast map holds one entry per DUPLICATED text. If that
outgrows driver memory (extreme corpora), swap step 2 for
``Dataset.join`` on text_sha256 — same semantics, one more shuffle; the
broadcast path is chosen because the duplicated-text dictionary is
typically millions of entries even at 10^12 rows (hot rows collapse).

Canonical representative = lexicographic min row_key within the group
(order-independent, deterministic under any parallelism).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count, Min


def _text_filled(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Combine chunks, coalesce NULL text to '' — tolerating blocks whose
    column is Arrow ``null``-typed (an all-null block from a row-based
    source infers no string type, and ``fill_null(null_arr, '')`` throws)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    return pc.fill_null(arr, "")


def add_row_key(ds, key_cols: list[str]):
    """Append a scalar sortable ``row_key`` string column: the key column
    values cast to string and joined with ':'. Mirrored in DuckDB oracles as
    ``concat(cast(c1 as varchar), ':', ...)`` so canonical-min choices agree.
    """

    def _add(batch: pa.Table) -> pa.Table:
        parts = [pc.cast(batch[c], pa.string()) for c in key_cols]
        key = parts[0]
        for p in parts[1:]:
            key = pc.binary_join_element_wise(key, p, ":")
        return batch.append_column("row_key", key)

    return ds.map_batches(_add, batch_format="pyarrow")


_EX_PARTS = 16


@ray.remote(num_cpus=1, num_returns=_EX_PARTS)
def _exact_partial_task(*tbls: pa.Table):
    """Bundle of (text_sha256, row_key) blocks → per-partition
    (sha, min_key, count) partial tables, partitioned by sha prefix."""
    agg: dict[str, list] = {}
    for t in tbls:
        if t.num_rows == 0:
            # empty pass-through blocks keep the pre-map schema — skip
            continue
        for sha, key in zip(t["text_sha256"].to_pylist(),
                            t["row_key"].to_pylist()):
            hit = agg.get(sha)
            if hit is None:
                agg[sha] = [key, 1]
            else:
                if key < hit[0]:
                    hit[0] = key
                hit[1] += 1
    outs: list[tuple[list, list, list]] = [
        ([], [], []) for _ in range(_EX_PARTS)
    ]
    for sha, (rep, n) in agg.items():
        o = outs[int(sha[:2], 16) & (_EX_PARTS - 1)]
        o[0].append(sha)
        o[1].append(rep)
        o[2].append(n)
    return tuple(
        pa.table(
            {
                "text_sha256": pa.array(o[0], type=pa.string()),
                "rep_key": pa.array(o[1], type=pa.string()),
                "n_exact": pa.array(o[2], type=pa.int64()),
            }
        )
        for o in outs
    )


@ray.remote(num_cpus=1)
def _exact_merge_task(*parts: pa.Table) -> pa.Table:
    """Merge one sha partition across bundles; emit ONLY dup entries."""
    merged: dict[str, list] = {}
    for t in parts:
        for sha, rep, n in zip(t["text_sha256"].to_pylist(),
                               t["rep_key"].to_pylist(),
                               t["n_exact"].to_pylist()):
            hit = merged.get(sha)
            if hit is None:
                merged[sha] = [rep, n]
            else:
                if rep < hit[0]:
                    hit[0] = rep
                hit[1] += n
    dups = [(sha, v[0], v[1]) for sha, v in merged.items() if v[1] >= 2]
    return pa.table(
        {
            "text_sha256": pa.array([d[0] for d in dups], type=pa.string()),
            "rep_key": pa.array([d[1] for d in dups], type=pa.string()),
            "n_exact": pa.array([d[2] for d in dups], type=pa.int64()),
        }
    )


def exact_dedup(sigs_ds, distributed_counts: bool | None = None,
                driver_max_rows: int = 5_000_000):
    """signatures → same rows + (rep_key, n_exact, is_rep).

    Small-input path (at or below ``driver_max_rows``): ref-based
    parallel merge — bundle tasks build (sha → count, min_key) partials
    partitioned by sha prefix; one merge task per partition combines
    across bundles and returns ONLY the duplicated entries, so neither
    the driver nor any single task ever holds the distinct-sha table.
    Above the threshold (``distributed_counts=None`` auto-picks, or force
    with True) a native grouped aggregate (sort shuffle) computes the
    groups and streams back the duplicated entries. Either way only the
    DUPLICATED-text set — far smaller than the corpus (hot rows
    collapse) — is broadcast for the vectorized paint. The sha key is
    uniform (cryptographic), so the shuffle needs no skew handling.
    """
    sigs_ds = sigs_ds.materialize()
    if distributed_counts is None:
        distributed_counts = sigs_ds.count() > driver_max_rows
    if distributed_counts:
        groups = sigs_ds.groupby("text_sha256").aggregate(
            Count(alias_name="n_exact"),
            Min("row_key", alias_name="rep_key"),
        )
        dup_groups = groups.filter(expr="n_exact >= 2")
        dup_tbls = list(
            dup_groups.select_columns(["text_sha256", "rep_key", "n_exact"])
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
    else:
        # ref-based parallel merge: bundle tasks aggregate (sha → min_key,
        # count) partials and re-partition them by sha prefix; one merge
        # task per partition combines across bundles and returns ONLY the
        # duplicated entries. The driver never touches the distinct-sha
        # table — it collects the (small) dup partitions. (A per-batch
        # dict beats a pandas object-dtype groupby ~20x, and the sha key
        # is itself uniform so the prefix partitioning is balanced.)
        # skinny two-column blocks: select_columns executes a zero-copy
        # projection pass, so off-node partial tasks pull ~100 B/row
        # instead of the full signature block (shingle lists dominate)
        block_refs = (
            sigs_ds.select_columns(["text_sha256", "row_key"])
            .to_arrow_refs()
        )
        n_bundles = max(1, min(64, len(block_refs)))
        per = -(-len(block_refs) // n_bundles)
        bundles = [block_refs[o: o + per]
                   for o in range(0, len(block_refs), per)]
        part_futs = [_exact_partial_task.remote(*b) for b in bundles]
        if _EX_PARTS == 1:
            part_futs = [[f] for f in part_futs]
        merge_futs = [
            _exact_merge_task.remote(*[f[p] for f in part_futs])
            for p in range(_EX_PARTS)
        ]
        # partitions are disjoint by sha prefix — concat IS the merge
        dup_tbls = ray.get(merge_futs)
    if dup_tbls:
        dup = pa.concat_tables(dup_tbls).combine_chunks()
    else:
        dup = pa.table({"text_sha256": pa.array([], pa.string()),
                        "rep_key": pa.array([], pa.string()),
                        "n_exact": pa.array([], pa.int64())})
    # broadcast three flat arrays once; paint is fully vectorized
    # (pc.index_in hash probe — the per-row dict loop was the measured
    # serial drag at 32 CPUs)
    ref = ray.put((dup["text_sha256"].combine_chunks(),
                   dup["rep_key"].combine_chunks(),
                   pc.cast(dup["n_exact"], pa.int32()).combine_chunks()))

    def paint(batch: pa.Table) -> pa.Table:
        shas, reps, ns = ray.get(ref)
        idx = pc.index_in(batch["text_sha256"], value_set=shas)
        rep = pc.coalesce(pc.take(reps, idx), batch["row_key"])
        n = pc.coalesce(pc.take(ns, idx), pa.scalar(1, pa.int32()))
        is_rep = pc.equal(batch["row_key"], rep)
        return (
            batch.append_column("rep_key", rep)
            .append_column("n_exact", n)
            .append_column("is_rep", is_rep)
        )

    return sigs_ds.map_batches(paint, batch_format="pyarrow")


def exact_clusters(assigned_ds, min_size: int = 2):
    """Reference-parity cluster table: one row per member of each exact
    group with >= min_size members, cluster id = representative key; rows in
    smaller groups are 'noise' (cluster_id = '-1', matching the DBSCAN
    label -1 at bin/cluster_by_simhash:86)."""

    def _label(batch: pa.Table) -> pa.Table:
        big = pc.greater_equal(batch["n_exact"], min_size)
        cluster = pc.if_else(big, batch["rep_key"], pa.scalar("-1"))
        return pa.table(
            {
                "row_key": batch["row_key"],
                "cluster_id": cluster,
                "cluster_size": batch["n_exact"],
            }
        )

    return assigned_ds.map_batches(_label, batch_format="pyarrow")


def _text_group_counts(ds, text_col: str, group_col: str | None = None):
    """→ Dataset(group?, h, n): row count per distinct text (per group
    when ``group_col`` is given). Texts leave the batch as a sha256 per
    DISTINCT value (one hash per dictionary entry, same idiom as
    signatures.py), so the dedup shuffle carries 64-char keys + counts,
    never the documents. NULL text folds to '' — mirror with
    coalesce(text, '') in SQL oracles."""
    import hashlib

    import numpy as np

    from ray.data.aggregate import Sum

    keys = ([group_col] if group_col else []) + ["h"]

    def partial(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            _text_filled(b[text_col]))
        u_sha = [hashlib.sha256(t.encode("utf-8")).hexdigest()
                 for t in enc.dictionary.to_pylist()]
        cols = {"h": pc.take(pa.array(u_sha, pa.string()), enc.indices),
                "n": pa.array(np.ones(b.num_rows, dtype=np.int64))}
        if group_col:
            cols[group_col] = b[group_col]
        agg = pa.table(cols).group_by(keys).aggregate([("n", "sum")])
        return pa.table({**{k: agg[k] for k in keys}, "n": agg["n_sum"]})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(keys).aggregate(Sum("n", alias_name="n")))


def cluster_size_histogram(ds, text_col: str = "text"):
    """→ Dataset(cluster_size, n_clusters): the exact-text group size
    distribution — the first dashboard a dedup run reports (singletons
    included, so the result is non-empty on clean corpora and the
    singleton row doubles as the unique count). Built on the
    distinct-text counts above; the histogram groupby moves one row per
    distinct text, then one per size."""
    import numpy as np

    from ray.data.aggregate import Sum

    counts = _text_group_counts(ds, text_col)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n" not in b.column_names:
            return pa.table({"cluster_size": pa.array([], pa.int64()),
                             "n_clusters": pa.array([], pa.int64())})
        t = pa.table({"cluster_size": b["n"],
                      "n_clusters": pa.array(
                          np.ones(b.num_rows, dtype=np.int64))})
        agg = t.group_by(["cluster_size"]).aggregate([("n_clusters",
                                                       "sum")])
        return pa.table({"cluster_size": agg["cluster_size"],
                         "n_clusters": agg["n_clusters_sum"]})

    return (counts.map_batches(partial, batch_format="pyarrow")
            .groupby("cluster_size")
            .aggregate(Sum("n_clusters", alias_name="n_clusters")))


def dup_rate_by_group(ds, group_col: str = "source",
                      text_col: str = "text"):
    """→ Dataset(group, n_rows, n_uniq, dup_rows, dup_frac): per-group
    exact-duplicate accounting (the per-source dedup scorecard).
    ``dup_frac`` divides the same two exact int64s the SQL oracle
    divides, hence bit-identical. Duplicate scope is per (group, text):
    the same text in two sources counts against each source separately
    — cross-source accounting is ``cluster_size_histogram``'s job."""
    import numpy as np

    from ray.data.aggregate import Sum

    schema = ds.schema()
    gtype = schema.types[schema.names.index(group_col)]
    counts = _text_group_counts(ds, text_col, group_col=group_col)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n" not in b.column_names:
            return pa.table({group_col: pa.array([], gtype),
                             "n_rows": pa.array([], pa.int64()),
                             "n_uniq": pa.array([], pa.int64())})
        t = pa.table({group_col: b[group_col], "n_rows": b["n"],
                      "n_uniq": pa.array(
                          np.ones(b.num_rows, dtype=np.int64))})
        agg = t.group_by([group_col]).aggregate(
            [("n_rows", "sum"), ("n_uniq", "sum")])
        return pa.table({group_col: agg[group_col],
                         "n_rows": agg["n_rows_sum"],
                         "n_uniq": agg["n_uniq_sum"]})

    merged = (counts.map_batches(partial, batch_format="pyarrow")
              .groupby(group_col)
              .aggregate(Sum("n_rows", alias_name="n_rows"),
                         Sum("n_uniq", alias_name="n_uniq")))

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n_rows" not in b.column_names:
            return pa.table({group_col: pa.array([], gtype),
                             "n_rows": pa.array([], pa.int64()),
                             "n_uniq": pa.array([], pa.int64()),
                             "dup_rows": pa.array([], pa.int64()),
                             "dup_frac": pa.array([], pa.float64())})
        nr = b["n_rows"].combine_chunks().to_numpy(zero_copy_only=False)
        nu = b["n_uniq"].combine_chunks().to_numpy(zero_copy_only=False)
        dup = nr - nu
        return (b.append_column("dup_rows", pa.array(dup))
                .append_column("dup_frac", pa.array(
                    dup.astype(np.float64) / nr.astype(np.float64))))

    return merged.map_batches(finish, batch_format="pyarrow")


def drop_boilerplate_turns(ds, min_convs: int = 2,
                           conv_col: str = "conv_id",
                           text_col: str = "text"):
    """Remove boilerplate turns: rows whose exact text occurs in >=
    ``min_convs`` DISTINCT conversations (tool preambles, canned
    greetings — the cross-conversation analogue of exact dedup, which
    keeps one copy; boilerplate is noise in every copy, so all go).

    Shape: texts reduce to a sha256 per dictionary entry; distinct
    (hash, conv) pairs shuffle to a hash-keyed count; the boilerplate
    hash set stays a DATASET and filters the corpus through the
    distributed anti ``semi_join`` — never a driver-side set, because a
    boilerplate dictionary at 100 TB is itself corpus-scale. NULL text
    folds to '' (mirror with coalesce in SQL)."""
    import hashlib

    import numpy as np

    from raydedup.stages.relational import semi_join

    def add_h(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            _text_filled(b[text_col]))
        u_sha = [hashlib.sha256(t.encode("utf-8")).hexdigest()
                 for t in enc.dictionary.to_pylist()]
        return b.append_column(
            "__h", pc.take(pa.array(u_sha, pa.string()), enc.indices))

    hashed = ds.map_batches(add_h, batch_format="pyarrow")

    def pair_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"__h": b["__h"], "c": b[conv_col]})
        return t.group_by(["__h", "c"]).aggregate([])

    from ray.data.aggregate import Sum

    def count_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "__h" not in b.column_names:
            return pa.table({"__h": pa.array([], pa.string()),
                             "nc": pa.array([], pa.int64())})
        t = pa.table({"__h": b["__h"], "nc": pa.array(
            np.ones(b.num_rows, dtype=np.int64))})
        agg = t.group_by(["__h"]).aggregate([("nc", "sum")])
        return pa.table({"__h": agg["__h"], "nc": agg["nc_sum"]})

    hot = (hashed.map_batches(pair_partial, batch_format="pyarrow")
           .groupby(["__h", "c"]).count()   # global distinct pairs
           .map_batches(count_partial, batch_format="pyarrow")
           .groupby("__h").aggregate(Sum("nc", alias_name="nc")))

    def hot_keys(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "nc" not in b.column_names:
            return pa.table({"__h": pa.array([], pa.string())})
        return pa.table(
            {"__h": b.filter(pc.greater_equal(b["nc"],
                                              min_convs))["__h"]})

    hot = hot.map_batches(hot_keys, batch_format="pyarrow")
    kept = semi_join(hashed, hot, on="__h", anti=True)

    def strip(b: pa.Table) -> pa.Table:
        return b.drop_columns(["__h"])

    return kept.map_batches(strip, batch_format="pyarrow")


def priority_dedup(ds, key_col: str = "doc_id",
                   priority_col: str = "source", text_col: str = "text"):
    """Multi-source exact dedup with provenance priority: identical
    texts collapse to ONE surviving copy — the row whose
    ``priority_col`` value sorts FIRST (callers encode their real source
    ranking as sortable strings), ties by min ``key_col`` — the
    'prefer the curated source when crawls collide' rule of C4-style
    multi-corpus merges. Emits one row per distinct text:
    (key_col int64, priority_col, n_copies).

    Scale shape: texts never cross a shuffle — every batch reduces to
    one (sha256(text), min composite, count) row per distinct text (the
    combiner), the only exchange is a sha-keyed groupby with native
    Min/Sum aggregates, and the winner is decoded from the composite
    with vectorized Arrow kernels. Identity is sha256-of-text, the
    exact.py contract (collision odds ~ n^2/2^256). The composite is
    ``priority || US || zero-padded key``: the 0x1f separator sorts
    below every printable byte, so composite string order equals
    (priority, key) order even when one priority value prefixes another;
    priority values containing 0x1f are rejected.
    """
    import hashlib

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        agg: dict[str, list] = {}
        for t, p, k in zip(batch[text_col].to_pylist(),
                           batch[priority_col].to_pylist(),
                           batch[key_col].to_pylist()):
            if t is None or p is None:
                continue
            if "\x1f" in p:
                raise ValueError(
                    f"priority value {p!r} contains the 0x1f separator")
            sha = hashlib.sha256(t.encode()).hexdigest()
            comp = f"{p}\x1f{int(k):019d}"
            hit = agg.get(sha)
            if hit is None:
                agg[sha] = [comp, 1]
            else:
                if comp < hit[0]:
                    hit[0] = comp
                hit[1] += 1
        return pa.table({
            "sha": pa.array(list(agg.keys()), pa.string()),
            "comp": pa.array([v[0] for v in agg.values()], pa.string()),
            "c": pa.array([v[1] for v in agg.values()], pa.int64()),
        })

    merged = (ds.select_columns([key_col, priority_col, text_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("sha")
              .aggregate(Min("comp", alias_name="comp"),
                         Sum("c", alias_name="n_copies")))

    def decode(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["comp"], "\x1f")
        return pa.table({
            key_col: pc.cast(pc.list_element(parts, 1), pa.int64()),
            priority_col: pc.list_element(parts, 0),
            "n_copies": pc.cast(batch["n_copies"], pa.int64()),
        })

    return merged.map_batches(decode, batch_format="pyarrow")


def cap_duplicates(ds, k: int = 2, key_col: str = "doc_id",
                   text_col: str = "text", n_parts: int = 32):
    """Frequency capping: keep at most ``k`` copies of every exact-text
    group — the 'keep a few copies' relaxation of exact dedup some
    pretraining recipes apply to moderately repeated pages instead of
    hard-unique. Survivors are the ``k`` smallest ``key_col`` values per
    group (deterministic under any parallelism); emits
    ``(key_col, n_copies)`` where ``n_copies`` is the group's ORIGINAL
    size, so downstream loss accounting stays exact. Generalizes the
    reference's keep-first suppression (``bin/exclude_duplicates:81-98``)
    from keep-1 to keep-k.

    Scale shape: texts never shuffle — each batch reduces them to a
    sha256 per DISTINCT value; group sizes come from the counting
    groupby of ``_text_group_counts``; only groups with n >= 2 are
    broadcast (the exact_dedup dup-set boundedness argument), and only
    rows of OVER-CAP groups (n > k, smaller still) enter the ranking
    shuffle, as skinny (sha, key) pairs swept with one lexsort per hash
    partition (the ordered.py idiom — no Python call per group). Rows
    in groups of size <= k stream straight through pass 2. NULL text
    folds to '' (mirror with coalesce in SQL oracles).
    """
    import hashlib

    import numpy as np

    from raydedup.stages.asof import _part_array

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    counts = _text_group_counts(ds, text_col)
    dup_tbls = list(counts.filter(expr="n >= 2")
                    .iter_batches(batch_size=1 << 20,
                                  batch_format="pyarrow"))
    if dup_tbls:
        dup = pa.concat_tables(dup_tbls).combine_chunks()
    else:
        dup = pa.table({"h": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64())})
    ref = ray.put((dup["h"].combine_chunks(),
                   pc.cast(dup["n"], pa.int64()).combine_chunks()))

    schema = ds.schema()
    key_type = schema.types[schema.names.index(key_col)]

    def _sha(b: pa.Table) -> pa.Array:
        enc = pc.dictionary_encode(
            _text_filled(b[text_col]))
        u = [hashlib.sha256(t.encode("utf-8")).hexdigest()
             for t in enc.dictionary.to_pylist()]
        return pc.take(pa.array(u, pa.string()), enc.indices)

    def keep_small(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({key_col: pa.array([], key_type),
                             "n_copies": pa.array([], pa.int64())})
        hs, ns = ray.get(ref)
        idx = pc.index_in(_sha(b), value_set=hs)
        n = pc.coalesce(pc.take(ns, idx), pa.scalar(1, pa.int64()))
        t = pa.table({key_col: b[key_col], "n_copies": n})
        return t.filter(pc.less_equal(n, k))

    def over_rows(b: pa.Table) -> pa.Table:
        empty = pa.table({"__h": pa.array([], pa.string()),
                          key_col: pa.array([], key_type),
                          "n_copies": pa.array([], pa.int64()),
                          "__part": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        hs, ns = ray.get(ref)
        sha = _sha(b)
        idx = pc.index_in(sha, value_set=hs)
        n = pc.coalesce(pc.take(ns, idx), pa.scalar(1, pa.int64()))
        t = pa.table({"__h": sha, key_col: b[key_col], "n_copies": n})
        t = t.filter(pc.greater(n, k))
        if t.num_rows == 0:
            return empty
        return t.append_column(
            "__part", _part_array(t["__h"].combine_chunks(), n_parts))

    def sweep(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__h" not in g.column_names:
            return pa.table({key_col: pa.array([], key_type),
                             "n_copies": pa.array([], pa.int64())})
        hs = np.asarray(g["__h"].to_pylist())
        keys = np.asarray(g[key_col].to_pylist())
        order = np.lexsort((keys, hs))
        sh = hs[order]
        starts = np.r_[0, np.flatnonzero(sh[1:] != sh[:-1]) + 1]
        lens = np.diff(np.r_[starts, len(sh)])
        rank = np.arange(len(sh)) - np.repeat(starts, lens)
        keep = order[rank < k]
        return pa.table({
            key_col: g[key_col].take(pa.array(keep, pa.int64())),
            "n_copies": g["n_copies"].take(pa.array(keep, pa.int64())),
        })

    slim = ds.select_columns([key_col, text_col])
    kept_small = slim.map_batches(keep_small, batch_format="pyarrow")
    kept_over = (slim.map_batches(over_rows, batch_format="pyarrow")
                 .groupby("__part")
                 .map_groups(sweep, batch_format="pyarrow"))
    return kept_small.union(kept_over)


def soft_dedup_weights(ds, key_col: str = "doc_id",
                       text_col: str = "text",
                       method: str = "auto",
                       broadcast_max_groups: int = 2_000_000,
                       num_partitions: int | None = None):
    """Soft deduplication: instead of DROPPING duplicates, emit a
    per-row training weight ``1 / n_copies`` so each exact-text group
    contributes one document's worth of gradient in aggregate (the
    reweight-not-remove recipe — SoftDedup, He et al., ACL 2024; public
    method, implemented from the paper's description). → Dataset
    ``(key_col, n_copies, weight)`` for EVERY input row; the weights of
    a group sum to exactly 1.0. The keep-one counterpart is
    :func:`exact_dedup`; the keep-k counterpart is
    :func:`cap_duplicates`.

    Scale shape: texts reduce to a sha256 per DISTINCT value inside
    ``map_batches`` (the :func:`_text_group_counts` idiom — documents
    never shuffle). ``method='broadcast'`` ships only the n >= 2 groups
    (one 64-char hash + count each) via ``ray.put`` and paints rows
    with ``pc.index_in`` — right when dup GROUPS are bounded.
    ``method='join'`` keeps the count table a Dataset and hash-joins it
    to the rows' hashes — the path for a realistic 20-50%% dup rate at
    100 TB where even the dup-group set is corpus-scale. ``auto``
    switches on the dup-group count at ``broadcast_max_groups`` (the
    ``exact.py``/``lsh.py`` auto-switch idiom). Both backends are
    value-identical (pinned by pytest).
    """
    import hashlib

    from raydedup.util import join_partitions

    schema = ds.schema()
    key_type = schema.types[schema.names.index(key_col)]
    out_schema = pa.schema([pa.field(key_col, key_type),
                            pa.field("n_copies", pa.int64()),
                            pa.field("weight", pa.float64())])

    def _sha(b: pa.Table) -> pa.Array:
        enc = pc.dictionary_encode(
            _text_filled(b[text_col]))
        u = [hashlib.sha256(t.encode("utf-8")).hexdigest()
             for t in enc.dictionary.to_pylist()]
        return pc.take(pa.array(u, pa.string()), enc.indices)

    def _finish(key_arr, n_arr) -> pa.Table:
        import numpy as np

        n = pc.cast(n_arr, pa.int64())
        nf = n.to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({key_col: key_arr, "n_copies": n,
                         "weight": pa.array(1.0 / nf, pa.float64())})

    counts = _text_group_counts(ds, text_col).materialize()
    dups = counts.filter(expr="n >= 2").materialize()
    n_groups = dups.count()
    if method == "auto":
        method = ("broadcast" if n_groups <= broadcast_max_groups
                  else "join")
    slim = ds.select_columns([key_col, text_col])

    if method == "broadcast":
        tbls = list(dups.iter_batches(batch_size=1 << 20,
                                      batch_format="pyarrow"))
        dup = (pa.concat_tables(tbls).combine_chunks() if tbls
               else pa.table({"h": pa.array([], pa.string()),
                              "n": pa.array([], pa.int64())}))
        ref = ray.put((dup["h"].combine_chunks(),
                       pc.cast(dup["n"], pa.int64()).combine_chunks()))

        def paint(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return out_schema.empty_table()
            hs, ns = ray.get(ref)
            idx = pc.index_in(_sha(b), value_set=hs)
            n = pc.coalesce(pc.take(ns, idx), pa.scalar(1, pa.int64()))
            return _finish(b[key_col].combine_chunks(), n)

        return slim.map_batches(paint, batch_format="pyarrow")

    # join backend: rows reduce to (key, h); the count table stays a
    # Dataset; one hash join on the 64-char hash, coalesce misses to 1
    def keyed(b: pa.Table) -> pa.Table:
        return pa.table({key_col: b[key_col], "h": _sha(b)})

    rows = slim.map_batches(keyed, batch_format="pyarrow")
    jp = num_partitions or join_partitions(ds.count())
    joined = rows.join(dups.rename_columns({"h": "h", "n": "__n"}),
                       join_type="left_outer", num_partitions=jp,
                       on=("h",))

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        n = pc.coalesce(pc.cast(b["__n"], pa.int64()),
                        pa.scalar(1, pa.int64()))
        return _finish(b[key_col].combine_chunks(), n.combine_chunks())

    return joined.map_batches(finish, batch_format="pyarrow")


def dup_rate_estimate(ds, rate: float = 0.5, text_col: str = "text",
                      seed: str = "s0"):
    """Plan-before-you-pay duplication estimator: exact-duplicate
    statistics over a deterministic CONTENT-hash sample —
    → one row (n_sampled, n_uniq, dup_rows, dup_frac). Sampling gates
    on md5 of the TEXT (not the row key), so every copy of a sampled
    text is sampled together: duplicate groups are atomic under the
    sample and ``dup_frac`` is an unbiased estimate of the corpus's
    extra-copy fraction. (Key-hash sampling would keep each copy
    independently and quadratically under-count pairs.) Deterministic
    and rerun-stable like ``sample_by_hash`` — same md5-low60 gate,
    mirrored in SQL.

    Scale shape: the gate runs once per DISTINCT text per batch
    (dictionary-encode idiom); the surviving rows reduce through
    ``_text_group_counts`` (hashes shuffle, text never does) and a
    constant-key counting merge — one row reaches the driver.
    """
    import hashlib

    import numpy as np

    from ray.data.aggregate import Sum

    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thr = int(rate * (1 << 60))
    prefix = f"{seed}:".encode()

    def gate(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        enc = pc.dictionary_encode(
            _text_filled(b[text_col]))
        keep_u = pa.array(
            [int.from_bytes(
                hashlib.md5(prefix + t.encode("utf-8")).digest()[:8],
                "big") >> 4 < thr
             for t in enc.dictionary.to_pylist()], pa.bool_())
        return b.filter(pc.take(keep_u, enc.indices))

    sampled = ds.select_columns([text_col]).map_batches(
        gate, batch_format="pyarrow")
    counts = _text_group_counts(sampled, text_col)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n" not in b.column_names:
            return pa.table({"k": pa.array([], pa.int64()),
                             "n_sampled": pa.array([], pa.int64()),
                             "n_uniq": pa.array([], pa.int64())})
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array([0], pa.int64()),
                         "n_sampled": pa.array([int(n.sum())], pa.int64()),
                         "n_uniq": pa.array([b.num_rows], pa.int64())})

    merged = (counts.map_batches(partial, batch_format="pyarrow")
              .groupby("k")
              .aggregate(Sum("n_sampled", alias_name="n_sampled"),
                         Sum("n_uniq", alias_name="n_uniq")))

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"n_sampled": pa.array([], pa.int64()),
                             "n_uniq": pa.array([], pa.int64()),
                             "dup_rows": pa.array([], pa.int64()),
                             "dup_frac": pa.array([], pa.float64())})
        ns = b["n_sampled"].to_numpy(zero_copy_only=False)
        nu = b["n_uniq"].to_numpy(zero_copy_only=False)
        dup = ns - nu
        return pa.table({
            "n_sampled": pa.array(ns), "n_uniq": pa.array(nu),
            "dup_rows": pa.array(dup),
            "dup_frac": pa.array(dup.astype(np.float64) /
                                 ns.astype(np.float64)),
        })

    return merged.map_batches(finish, batch_format="pyarrow")


def text_label_groups(ds, key_cols: list[str] | None = None,
                      text_col: str = "text", canonical: bool = False,
                      min_size: int = 1, label_col: str = "label"):
    """Full-corpus text-identity labeling: one row per input row with
    ``(row_key, <label_col> = min member key, n_members)``, grouped by
    EXACT text (``canonical=False``: sha256 of the raw text) or by
    word-multiset identity (``canonical=True``: tokens split on single
    spaces, sorted, rejoined — the bag contract). Singletons label
    themselves, so the output is a complete partition of the corpus —
    the labeling primitive behind :func:`bag_dup_groups` and
    ``graph.clustering_agreement``.

    Scale shape: exact dedup's — the (canonical) sha runs once per
    DISTINCT text per batch (dictionary-encode idiom), only 64-char
    hashes shuffle, and the group paint reuses ``exact_dedup``'s
    dup-set broadcast + vectorized ``pc.index_in``. NULL text folds to
    '' (mirror with coalesce in SQL oracles).
    """
    import hashlib

    key_cols = key_cols or ["doc_id"]
    keyed = add_row_key(ds.select_columns(key_cols + [text_col]), key_cols)

    def sha(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(_text_filled(b[text_col]))
        if canonical:
            u = [hashlib.sha256(
                    " ".join(sorted(t.split(" "))).encode("utf-8"))
                 .hexdigest() for t in enc.dictionary.to_pylist()]
        else:
            u = [hashlib.sha256(t.encode("utf-8")).hexdigest()
                 for t in enc.dictionary.to_pylist()]
        return pa.table({
            "row_key": b["row_key"],
            "text_sha256": pc.take(pa.array(u, pa.string()), enc.indices),
        })

    assigned = exact_dedup(keyed.map_batches(sha, batch_format="pyarrow"))

    def out(b: pa.Table) -> pa.Table:
        t = pa.table({"row_key": b["row_key"], label_col: b["rep_key"],
                      "n_members": pc.cast(b["n_exact"], pa.int64())})
        if min_size > 1:
            t = t.filter(pc.greater_equal(b["n_exact"], min_size))
        return t

    return assigned.map_batches(out, batch_format="pyarrow")


def bag_dup_groups(ds, key_cols: list[str] | None = None,
                   text_col: str = "text", min_size: int = 2):
    """Word-multiset (bag) duplicate groups: rows whose whitespace-token
    MULTISET is identical — catches reordered boilerplate and shuffled
    copies that exact hashing misses entirely and similarity methods
    only score. Emits one row per member of every group with >=
    ``min_size`` members: (row_key, bag_id = min member row_key,
    n_members). Thin wrapper over :func:`text_label_groups`
    (canonical=True) — see it for the hashing + scale contract.
    """
    return text_label_groups(ds, key_cols, text_col, canonical=True,
                             min_size=min_size, label_col="bag_id")


def normalized_dup_groups(ds, key_cols: list[str] | None = None,
                          text_col: str = "text", min_size: int = 2):
    """Normalization-robust exact duplicate groups: rows identical
    after casefold + collapsing every non-alphanumeric run to one
    space + trim — the 'soft-exact' tier between byte-exact dedup and
    similarity methods, catching SHOUTING copies, re-punctuated and
    re-whitespaced boilerplate that sha-exact misses while similarity
    pipelines pay a full candidate/verify pass for them.

    Normalization contract (mirrored by the SQL oracle verbatim):
    ``trim(regexp_replace(lower(coalesce(text, '')), '[^0-9a-z]+',
    ' ', 'g'))`` — both sides RE2-class char sets, applied with Arrow
    kernels per batch, so the normalized text never leaves the task.
    Emits one row per member of every group with >= ``min_size``
    members: (row_key, norm_id = min member row_key, n_members). Thin
    wrapper over :func:`text_label_groups` — see it for the hashing +
    scale contract."""
    def norm(b: pa.Table) -> pa.Table:
        t = pc.utf8_trim(
            pc.replace_substring_regex(
                pc.utf8_lower(_text_filled(b[text_col])),
                pattern="[^0-9a-z]+", replacement=" "),
            characters=" ")
        i = b.schema.get_field_index(text_col)
        return b.set_column(i, text_col, t)

    return text_label_groups(
        ds.map_batches(norm, batch_format="pyarrow"), key_cols,
        text_col, canonical=False, min_size=min_size,
        label_col="norm_id")


def stitch_candidates(ds, key_col: str = "doc_id", text_col: str = "text",
                      k: int = 64):
    """Fragment-reassembly candidates: pairs (a_id, b_id) where the
    LAST ``k`` characters of a's text equal the FIRST ``k`` characters
    of b's (a != b, both texts >= k chars) — the inverse primitive of
    fixed-overlap chunking (textstats.chunk_documents): a splitter that
    broke documents into chunks sharing a k-char overlap window leaves
    exactly this signature at every seam, so reassembly is this join.

    Scale shape: each side leaves its batch as (id, k-char gram) — the
    head via one vectorized slice, the tail via reverse→slice→reverse
    (pyarrow has no per-row-variable slice; double-reverse gets 'last k
    codepoints' with scalar kernels only). Only the k-char grams
    shuffle, never full text; one distributed hash join on the literal
    gram (no hashing → no collision caveat). Output is candidates:
    transitive seams (a→b→c) appear as both pairs."""
    import numpy as np

    import ray.data

    from raydedup.util import join_partitions

    def _long_enough(b: pa.Table) -> pa.Table:
        t = _text_filled(b[text_col])
        ok = pc.greater_equal(pc.utf8_length(t), k)
        out = pa.table({key_col: b[key_col], text_col: t})
        return out.filter(ok)

    def heads(b: pa.Table) -> pa.Table:
        b = _long_enough(b)
        return pa.table({
            "b_id": b[key_col],
            "gram": pc.utf8_slice_codeunits(b[text_col], 0, k),
        })

    def tails(b: pa.Table) -> pa.Table:
        b = _long_enough(b)
        rev = pc.utf8_reverse(b[text_col])
        tail = pc.utf8_reverse(pc.utf8_slice_codeunits(rev, 0, k))
        return pa.table({"a_id": b[key_col], "gram": tail})

    h = ds.map_batches(heads, batch_format="pyarrow")
    t = ds.map_batches(tails, batch_format="pyarrow")
    n_parts = join_partitions(max(ds.count(), 1))
    out = (t.join(h, join_type="inner", num_partitions=n_parts,
                  on=("gram",))
           .filter(expr="a_id != b_id")
           .select_columns(["a_id", "b_id"])
           .materialize())
    if out.count() == 0:
        ktype = ds.schema().types[list(ds.schema().names).index(key_col)]
        return ray.data.from_arrow(pa.schema([
            pa.field("a_id", ktype), pa.field("b_id", ktype),
        ]).empty_table())
    return out
