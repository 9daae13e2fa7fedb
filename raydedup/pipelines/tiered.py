"""Tiered deduplication cascade: exact tier → near tier → labeled docs.

The composition a web-scale curation run ships (the public two-tier
recipe — e.g. RefinedWeb / FineWeb / Dolma all collapse byte-identical
texts BEFORE any fuzzy pass): tier 1 groups sha256-identical texts and
keeps the min-id representative; tier 2 runs the EXACT prefix-filter
set-similarity self-join (AllPairs/PPJoin, ``stages/setjoin.py``) over
the tier-1 survivors only, so the expensive near-dup tier never sees hot
identical-text groups; the union of both tiers' edges labels every input
row with its final cluster and the tier that removed it.

Reference analogue: the exact-suppression pass of ``exclude_duplicates``
(reference ``bin/exclude_duplicates``, Simhash-identical groups) chained
with the cluster pass — generalized here to the deterministic
shingle-Jaccard tier with an exact SQL oracle (brute-force Jaccard +
recursive-CTE components), which the MinHash-LSH flagship can't give.

Output: one row per input doc ``(id, exact_rep, n_exact, cluster_id,
tier)`` — ``exact_rep`` = min id of the identical-text group,
``cluster_id`` = min id over the rep's near-dup component (singleton
reps label themselves), ``tier`` ∈ {'exact', 'near', 'keep'}: the tier
that removed the doc, or 'keep' for the one survivor per cluster.

Scale shape (100-TB design):
- the sha shuffle carries (sha, id) only — text never crosses a wide op;
- tier 2's input is reps only (dup mass already collapsed), and the
  prefix-filter join itself shuffles hashes, not text;
- the dup-group map and the component map are broadcast once via
  ``ray.put`` below ``driver_max`` rows/edges and switch to distributed
  ``Dataset.join`` painting + min-label-propagation components above it
  (the ``exact.py``/``lsh.py``/``embeddings.semantic_dedup`` auto-switch
  idiom).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from raydedup.config import DedupConfig, DEFAULT_CONFIG
from raydedup.stages.embeddings import _semdedup_components_driver
from raydedup.stages.setjoin import set_similarity_self_join
from raydedup.util import join_partitions

# per-worker single-entry broadcast cache (the exact.py idiom: ray.get
# once per object per worker, not per batch)
_TIER_CACHE: dict = {}


def _cached(ref):
    key = ref.binary()
    val = _TIER_CACHE.get(key)
    if val is None:
        val = ray.get(ref)
        _TIER_CACHE.clear()
        _TIER_CACHE[key] = val
    return val


def _out_schema(id_type: pa.DataType, id_col: str) -> pa.Schema:
    return pa.schema([
        pa.field(id_col, id_type),
        pa.field("exact_rep", id_type),
        pa.field("n_exact", pa.int64()),
        pa.field("cluster_id", id_type),
        pa.field("tier", pa.string()),
    ])


def _sha_stage(id_col: str, text_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        # one sha per DISTINCT text in the batch (signature-stage idiom:
        # dictionary_encode collapses hot repeats before any Python call)
        enc = pc.dictionary_encode(
            pc.fill_null(batch[text_col].combine_chunks(), ""))
        shas = pa.array(
            [hashlib.sha256(t.encode("utf-8")).hexdigest()
             for t in enc.dictionary.to_pylist()],
            type=pa.string())
        return pa.table({
            id_col: batch[id_col],
            text_col: batch[text_col],
            "text_sha256": pc.take(shas, enc.indices),
        })

    return fn


def tiered_dedup(ds, threshold: float = 0.5,
                 cfg: DedupConfig = DEFAULT_CONFIG,
                 id_col: str = "doc_id", text_col: str = "text",
                 components: str = "auto",
                 driver_max: int = 2_000_000,
                 num_partitions: int | None = None):
    """docs → ``(id, exact_rep, n_exact, cluster_id, tier)`` per row.

    ``threshold`` is the tier-2 shingle-set Jaccard bar (exact join —
    recall 1.0 by construction). ``components``: 'driver' (vectorized
    numpy pointer jumping + broadcast paint), 'distributed' (min-label
    propagation + join paint), or 'auto' (switch on ``driver_max``).
    The driver components path requires integer ids (numeric min is the
    canonical label); the distributed path works for any orderable id.
    """
    sha_ds = ds.select_columns([id_col, text_col]).map_batches(
        _sha_stage(id_col, text_col), batch_format="pyarrow").materialize()

    id_type = pa.int64()
    sch = ds.schema() or sha_ds.schema()
    if sch is not None and id_col in sch.names:
        id_type = dict(zip(sch.names, sch.types))[id_col]
    schema = _out_schema(id_type, id_col)
    if sha_ds.count() == 0:
        return ray.data.from_arrow(schema.empty_table())

    # ---- tier 1: exact groups over the sha key (uniform — no skew) ----
    from ray.data.aggregate import Count, Min

    groups = sha_ds.groupby("text_sha256").aggregate(
        Min(id_col, alias_name="exact_rep"),
        Count(alias_name="n_exact"),
    )
    dup = groups.filter(expr="n_exact >= 2").materialize()
    n_dup_groups = dup.count()
    painted_schema = pa.schema([
        pa.field(id_col, id_type), pa.field(text_col, pa.string()),
        pa.field("exact_rep", id_type), pa.field("n_exact", pa.int64()),
    ])

    if n_dup_groups <= driver_max:
        # broadcast paint: three flat arrays, pc.index_in probe
        if n_dup_groups:
            dtbl = pa.concat_tables(
                dup.select_columns(["text_sha256", "exact_rep", "n_exact"])
                .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            ).combine_chunks()
        else:
            dtbl = pa.table({"text_sha256": pa.array([], pa.string()),
                             "exact_rep": pa.array([], id_type),
                             "n_exact": pa.array([], pa.int64())})
        dref = ray.put((dtbl["text_sha256"].combine_chunks(),
                        dtbl["exact_rep"].combine_chunks(),
                        dtbl["n_exact"].combine_chunks()))

        def paint(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return painted_schema.empty_table()
            shas, reps, ns = _cached(dref)
            at = pc.index_in(batch["text_sha256"], value_set=shas)
            rep = pc.coalesce(pc.take(reps, at),
                              batch[id_col].combine_chunks())
            n = pc.coalesce(pc.take(ns, at), pa.scalar(1, pa.int64()))
            return pa.table({id_col: batch[id_col], text_col: batch[text_col],
                             "exact_rep": rep, "n_exact": n})

        painted = sha_ds.map_batches(paint, batch_format="pyarrow")
    else:
        # distributed paint: left join on the sha key; non-dup rows
        # label themselves
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        n_parts = num_partitions or min(join_partitions(n_dup_groups),
                                        max(2, 2 * ncpu))
        joined = sha_ds.join(
            dup.select_columns(["text_sha256", "exact_rep", "n_exact"]),
            join_type="left_outer", num_partitions=n_parts,
            on=("text_sha256",))

        def paint_joined(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return painted_schema.empty_table()
            rep = pc.coalesce(batch["exact_rep"],
                              batch[id_col].combine_chunks())
            n = pc.coalesce(batch["n_exact"], pa.scalar(1, pa.int64()))
            return pa.table({id_col: batch[id_col], text_col: batch[text_col],
                             "exact_rep": rep, "n_exact": n})

        painted = joined.map_batches(paint_joined, batch_format="pyarrow")
    painted = painted.materialize()  # consumed by reps filter AND label

    # ---- tier 2: exact set-similarity join over reps only ----
    def reps_only(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select([id_col, text_col])
        keep = pc.equal(batch[id_col], batch["exact_rep"])
        return batch.filter(keep).select([id_col, text_col])

    reps = painted.map_batches(reps_only, batch_format="pyarrow")
    pairs = set_similarity_self_join(
        reps, threshold, cfg, id_col=id_col, text_col=text_col,
        num_partitions=num_partitions).materialize()
    n_edges = pairs.count()
    if components == "auto":
        components = "driver" if n_edges <= driver_max else "distributed"

    def finish(batch: pa.Table, cluster: pa.Array) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        is_exact = pc.not_equal(ids, batch["exact_rep"].combine_chunks())
        is_near = pc.not_equal(cluster, ids)
        tier = pc.if_else(
            is_exact, pa.scalar("exact"),
            pc.if_else(is_near, pa.scalar("near"), pa.scalar("keep")))
        return pa.table({id_col: ids,
                         "exact_rep": batch["exact_rep"],
                         "n_exact": batch["n_exact"],
                         "cluster_id": cluster,
                         "tier": tier})

    if n_edges == 0 or components == "driver":
        if n_edges == 0:
            nodes = np.array([], dtype=np.int64)
            clusters = np.array([], dtype=np.int64)
        else:
            nodes, clusters = _semdedup_components_driver(pairs)
        cref = ray.put((nodes, clusters))

        def label(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return schema.empty_table()
            nd, cl = _cached(cref)
            at = pc.index_in(batch["exact_rep"],
                             value_set=pa.array(nd, type=id_type))
            cluster = pc.coalesce(pc.take(pa.array(cl, type=id_type), at),
                                  batch["exact_rep"].combine_chunks())
            return finish(batch, cluster)

        return painted.map_batches(label, batch_format="pyarrow")

    # distributed components + join paint on exact_rep
    from raydedup.state.unionfind import connected_components_distributed

    def as_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"a_key": batch["a_id"], "b_key": batch["b_id"]})

    labels = connected_components_distributed(
        pairs.map_batches(as_edges, batch_format="pyarrow"),
        num_partitions=num_partitions)

    def as_lookup(batch: pa.Table) -> pa.Table:
        return pa.table({"exact_rep": batch["node"].cast(id_type),
                         "__cluster": batch["label"].cast(id_type)})

    lookup = labels.map_batches(as_lookup,
                                batch_format="pyarrow").materialize()
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_parts = num_partitions or min(join_partitions(lookup.count()),
                                    max(2, 2 * ncpu))
    joined = painted.select_columns(
        [id_col, "exact_rep", "n_exact"]).join(
        lookup, join_type="left_outer", num_partitions=n_parts,
        on=("exact_rep",))

    def label_joined(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return schema.empty_table()
        cluster = pc.coalesce(batch["__cluster"],
                              batch["exact_rep"].combine_chunks())
        return finish(batch, cluster)

    out = joined.map_batches(label_joined, batch_format="pyarrow")
    return out.union(ray.data.from_arrow(schema.empty_table()))


def tiered_dedup_semantic(ds, emb, threshold: float = 0.5,
                          sem_threshold: float = 0.95,
                          cfg: DedupConfig = DEFAULT_CONFIG,
                          id_col: str = "doc_id", text_col: str = "text",
                          emb_id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          components: str = "auto",
                          driver_max: int = 2_000_000,
                          num_partitions: int | None = None,
                          sem_method: str = "blockwise"):
    """THREE-tier cascade: exact → near (prefix-filter Jaccard) →
    semantic (SemDeDup embedding cosine, run over tier-2 SURVIVORS only
    — the cheap tiers shrink the input before the expensive one, the
    published cascade ordering of RefinedWeb/FineWeb + SemDeDup).

    Output: one row per input doc ``(id, exact_rep, n_exact,
    near_cluster, cluster_id, tier)`` — ``near_cluster`` = tier-2
    component root of the doc's exact rep, ``cluster_id`` = tier-3 root
    of that (final label), ``tier`` ∈ {'exact', 'near', 'semantic',
    'keep'}: the FIRST tier that removed the doc.

    Scale shape: tier-1/2 as ``tiered_dedup``; survivor embeddings come
    from a distributed ``semi_join`` (list columns never cross an Acero
    join); tier-3 pairs use the chunk-pair blockwise cosine (zero driver
    materialization); components + final paint reuse the auto-switch
    driver/distributed idiom. Docs without an embedding row are isolated
    at tier 3 (they keep their tier-2 label).
    """
    from raydedup.stages.embeddings import embedding_near_pairs
    from raydedup.stages.relational import semi_join

    base = tiered_dedup(ds, threshold, cfg, id_col=id_col,
                        text_col=text_col, components=components,
                        driver_max=driver_max,
                        num_partitions=num_partitions).materialize()
    id_type = pa.int64()
    bsch = base.schema()
    if bsch is not None and id_col in bsch.names:
        id_type = dict(zip(bsch.names, bsch.types))[id_col]
    schema = pa.schema([
        pa.field(id_col, id_type),
        pa.field("exact_rep", id_type),
        pa.field("n_exact", pa.int64()),
        pa.field("near_cluster", id_type),
        pa.field("cluster_id", id_type),
        pa.field("tier", pa.string()),
    ])
    if base.count() == 0:
        return ray.data.from_arrow(schema.empty_table())

    def surv_ids(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["cluster_id"],
                        batch[id_col].combine_chunks())
        return pa.table({emb_id_col: batch.filter(keep)[id_col]})

    surv = base.map_batches(surv_ids, batch_format="pyarrow")
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    semi_parts = min(64, max(2, 2 * ncpu))
    surv_emb = semi_join(emb.select_columns([emb_id_col, vec_col]), surv,
                         on=emb_id_col, num_partitions=semi_parts)
    spairs = embedding_near_pairs(
        surv_emb, sem_threshold, id_col=emb_id_col, vec_col=vec_col,
        method=sem_method).materialize()
    n_edges = spairs.count()
    mode = components
    if mode == "auto":
        mode = "driver" if n_edges <= driver_max else "distributed"

    def finish(batch: pa.Table, root3: pa.Array) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        tier2 = batch["tier"].combine_chunks()
        was_keep = pc.equal(tier2, pa.scalar("keep"))
        sem = pc.and_(was_keep, pc.not_equal(root3, ids))
        tier = pc.if_else(sem, pa.scalar("semantic"), tier2)
        return pa.table({id_col: ids,
                         "exact_rep": batch["exact_rep"],
                         "n_exact": batch["n_exact"],
                         "near_cluster": batch["cluster_id"],
                         "cluster_id": root3,
                         "tier": tier})

    if n_edges == 0 or mode == "driver":
        if n_edges == 0:
            nodes = np.array([], dtype=np.int64)
            roots = np.array([], dtype=np.int64)
        else:
            nodes, roots = _semdedup_components_driver(spairs)
        cref = ray.put((nodes, roots))

        def label(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return schema.empty_table()
            nd, rt = _cached(cref)
            at = pc.index_in(batch["cluster_id"],
                             value_set=pa.array(nd, type=id_type))
            root3 = pc.coalesce(pc.take(pa.array(rt, type=id_type), at),
                                batch["cluster_id"].combine_chunks())
            return finish(batch, root3)

        return base.map_batches(label, batch_format="pyarrow")

    from raydedup.state.unionfind import connected_components_distributed

    def as_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"a_key": batch["a_id"], "b_key": batch["b_id"]})

    labels = connected_components_distributed(
        spairs.map_batches(as_edges, batch_format="pyarrow"),
        num_partitions=num_partitions)

    def as_lookup(batch: pa.Table) -> pa.Table:
        return pa.table({"cluster_id": batch["node"].cast(id_type),
                         "__root3": batch["label"].cast(id_type)})

    lookup = labels.map_batches(as_lookup,
                                batch_format="pyarrow").materialize()
    n_parts = num_partitions or min(join_partitions(lookup.count()),
                                    max(2, 2 * ncpu))
    joined = base.join(lookup, join_type="left_outer",
                       num_partitions=n_parts, on=("cluster_id",))

    def label_joined(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return schema.empty_table()
        root3 = pc.coalesce(batch["__root3"],
                            batch["cluster_id"].combine_chunks())
        return finish(batch, root3)

    out = joined.map_batches(label_joined, batch_format="pyarrow")
    return out.union(ray.data.from_arrow(schema.empty_table()))
