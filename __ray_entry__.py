"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship near-dup pipeline on sf0.001 transcripts;
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query (same column names, floats rounded to 6 decimals on
both sides so value-hashes compare).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the raydedup library) calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.config import DEFAULT_CONFIG
from raydedup.sources.lined import LINED_SQL as _LINED_SQL
from raydedup.sources.transcripts import (
    TRANSCRIPTS_SQL,
    transcripts_from_documents,
)
from raydedup.textnorm import STOPWORDS

# Simple-token config: no stemming/stopwords → expressible in ANSI SQL, so
# the whole near-dup DAG gets a value-level DuckDB oracle. The stemmed
# reference config is exercised by the pytest suite against the
# single-process oracle instead (SURVEY §5).
SIMPLE_CFG = DEFAULT_CONFIG.with_overrides(stemming=False, remove_stopwords=False)

_ROUND = 6


def _round_vals(v: np.ndarray, nudge: float = 0.0) -> np.ndarray:
    """Correctly-rounded half-away-from-zero to ``_ROUND`` decimals,
    bit-for-bit equal to Decimal half-up quantize (= DuckDB ``round()``).

    pc.round can land one ulp off (breaks value comparison when the two
    sides sum in different orders) and Python round() breaks ties
    half-to-even, so the reference semantics are Decimal's. The hot path
    is the vectorized kernel sign(x) * floor(|x|*1e6 + 0.5) / 1e6, which
    can only misdecide when the float product |x|*1e6 sits within its
    own ~ulp error of a .5 tie boundary — exactly those values (plus
    signed zeros and non-finites) fall back to per-value Decimal, a
    vanishing minority on real score columns.

    ``nudge`` is for measures whose engine arithmetic takes a different
    FP path than the oracle (e.g. LSI via SVD vs. direct BoW cosine):
    when a true value is an exact half-boundary dyadic rational, 1e-16
    ulp noise flips the rounded digit; adding the same tiny epsilon on
    BOTH sides (round(v + nudge) here, round(v + nudge) in SQL) moves
    ties off the boundary consistently."""
    scale = 10.0 ** _ROUND
    x = v + nudge if nudge else v.astype(np.float64, copy=True)
    ax = np.abs(x) * scale
    with np.errstate(invalid="ignore"):
        res = np.where(x < 0, -1.0, 1.0) * np.floor(ax + 0.5) / scale
        # guard band: distance of |x|*1e6 from its nearest .5 tie
        # boundary, in (generous) ulps of the product
        d = np.abs((ax + 0.5) - np.floor(ax + 0.5) - 0.5)
        unsafe = np.abs(d - 0.5) <= np.maximum(1e-9, ax * 1e-12)
    unsafe |= ~np.isfinite(x) | ((ax == 0) & np.signbit(x))
    if unsafe.any():
        from decimal import ROUND_HALF_UP, Decimal

        quant = Decimal(1).scaleb(-_ROUND)
        idx = np.flatnonzero(unsafe)
        res[idx] = [
            float(Decimal(float(v[i]) + nudge).quantize(
                quant, rounding=ROUND_HALF_UP))
            for i in idx
        ]
    return res


def _round_arr(arr, nudge: float = 0.0) -> pa.Array:
    """Arrow float column → rounded float64 array, nulls preserved."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vals = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    if arr.null_count:
        mask = np.asarray(pc.is_null(arr))
        vals = np.where(mask, 0.0, vals)
        return pa.array(_round_vals(vals, nudge), type=pa.float64(),
                        mask=mask)
    return pa.array(_round_vals(vals, nudge), type=pa.float64())


def _round_col(ds, col, nudge: float = 0.0):
    def r(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(col)
        return batch.set_column(i, col, _round_arr(batch[col], nudge))

    return ds.map_batches(r, batch_format="pyarrow")


def _round_tbl(tbl: pa.Table, col: str) -> pa.Table:
    """_round_col for an in-memory (small) pyarrow Table result."""
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(i, col, _round_arr(tbl[col]))


def _docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"],
                                 override_num_blocks=64)


_ATTACH_CACHE: dict = {}


def _attach_col(left, side, key: str, col: str,
                broadcast_max: int = 2_000_000):
    """Attach ``side``'s ``col`` to ``left`` on ``key`` with the
    broadcast/join auto-switch idiom (exact.py/lsh.py): at or below
    ``broadcast_max`` side rows the (key → value) arrays broadcast once
    via ``ray.put`` and paint with one vectorized ``pc.index_in`` per
    batch — no join actor pool, no shuffle of ``left``; above it, the
    distributed hash join (the 100-TB path, where the side is
    corpus-sized). Inner-join semantics: left rows without a side match
    are dropped on both paths. Contract: side keys are UNIQUE (the
    broadcast paint keeps one match per key); a matched row whose side
    VALUE is null survives with a null column, same as a hash join."""
    import ray as _ray

    from raydedup.util import join_partitions

    side = side.select_columns([key, col]).materialize()
    n = side.count()
    if n > broadcast_max:
        ncpu = int(_ray.cluster_resources().get("CPU", 8))
        n_parts = min(join_partitions(n), max(2, 2 * ncpu))
        return left.join(side, join_type="inner",
                         num_partitions=n_parts, on=(key,))

    tbls = [pa.table(b) for b in
            side.iter_batches(batch_size=1 << 20,
                              batch_format="pyarrow")]
    allt = (pa.concat_tables(tbls).combine_chunks() if tbls
            else None)
    # empty-side arrays take their types from the side SCHEMA (a
    # hardcoded int64/string pair makes pc.index_in raise on any other
    # key type); the match mask below comes from the KEY lookup, not the
    # painted value, so a matched row whose side value is genuinely NULL
    # survives — same inner-join semantics as the distributed path.
    side_schema = side.schema().base_schema
    ref = _ray.put((allt[key].combine_chunks() if allt is not None
                    else pa.array([], side_schema.field(key).type),
                    allt[col].combine_chunks() if allt is not None
                    else pa.array([], side_schema.field(col).type)))

    def paint(b: pa.Table) -> pa.Table:
        ck = ref.binary()
        cached = _ATTACH_CACHE.get(ck)
        if cached is None:
            cached = _ray.get(ref)
            _ATTACH_CACHE.clear()
            _ATTACH_CACHE[ck] = cached
        keys_arr, vals_arr = cached
        at = pc.index_in(b[key], value_set=keys_arr)
        out = b.append_column(col, pc.take(vals_arr, at))
        return out.filter(pc.is_valid(at))

    return left.map_batches(paint, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_exact_dedup_survivors(sf_dir: str):
    from raydedup.pipelines.neardup import signatures_with_rep

    assigned = signatures_with_rep(_docs(sf_dir), SIMPLE_CFG, key_cols=["doc_id"])
    return assigned.filter(expr="is_rep == True").select_columns(["row_key"])


def q_exact_dup_clusters(sf_dir: str):
    from raydedup.pipelines.neardup import signatures_with_rep
    from raydedup.stages.exact import exact_clusters

    assigned = signatures_with_rep(_docs(sf_dir), SIMPLE_CFG, key_cols=["doc_id"])
    return exact_clusters(assigned)


def q_near_dup_pairs_docs(sf_dir: str):
    from raydedup.pipelines.neardup import near_dup_pairs, signatures_with_rep

    assigned = signatures_with_rep(
        _docs(sf_dir), SIMPLE_CFG, key_cols=["doc_id"]
    ).materialize()
    return _round_col(near_dup_pairs(assigned, SIMPLE_CFG), "jaccard")


def q_near_dup_pairs_kperm(sf_dir: str):
    """Same verified near-dup pair question, answered through the
    K-independent-permutations minhash kernel (the classic
    Broder/MMDS construction; ``minhash_kernel="kperm"``) — kept
    value-gated alongside the OPH default so BOTH kernels stay pinned
    to the same brute-force SQL truth."""
    from raydedup.pipelines.neardup import near_dup_pairs, signatures_with_rep

    cfg = SIMPLE_CFG.with_overrides(minhash_kernel="kperm")
    assigned = signatures_with_rep(
        _docs(sf_dir), cfg, key_cols=["doc_id"]
    ).materialize()
    return _round_col(near_dup_pairs(assigned, cfg), "jaccard")


def q_near_dup_pairs_oph(sf_dir: str):
    """Same verified near-dup pair question as near_dup_pairs_docs,
    answered through the ONE-PERMUTATION-HASHING signature kernel
    (Li/Owen/Zhang 2012 + Shrivastava/Li 2014 rotation densification;
    functions/minhash.py) instead of K independent permutations: one
    modulo + bin-min per shingle rather than K multiply-adds — the scale
    path for the bandwidth-bound signature stage. Candidates differ only
    probabilistically; verification is exact shingle Jaccard either way,
    so the same brute-force SQL is the truth. One SQL oracle, another
    execution path — like the altstar/bucketed twins."""
    from raydedup.pipelines.neardup import near_dup_pairs, signatures_with_rep

    cfg = SIMPLE_CFG.with_overrides(minhash_kernel="oph")
    assigned = signatures_with_rep(
        _docs(sf_dir), cfg, key_cols=["doc_id"]
    ).materialize()
    return _round_col(near_dup_pairs(assigned, cfg), "jaccard")


def q_bag_near_dup_pairs(sf_dir: str):
    """WEIGHTED (token-multiset) Jaccard near-dup pairs between
    exact-text reps — the bag-similarity contract that catches reordered
    AND lightly edited copies (order-invariant, count-sensitive), which
    exact bag hashing (any edit breaks) and word-shingle LSH (reordering
    destroys n-grams) both miss. Exact reduction: counts expand to
    (token, occurrence) elements, set Jaccard of expanded sets ≡ weighted
    Jaccard, so the flagship LSH machinery runs unchanged and its exact
    in-bucket verification IS the exact weighted Jaccard
    (stages/wjaccard.py). Oracle replays Σmin/Σmax from per-(doc, token)
    counts."""
    from raydedup.stages.wjaccard import bag_near_dup_pairs

    return _round_col(
        bag_near_dup_pairs(_docs(sf_dir), SIMPLE_CFG, key_cols=["doc_id"]),
        "jaccard")


def q_bag_near_dup_pairs_icws(sf_dir: str):
    """Weighted-Jaccard near-dup pairs via the ICWS weighted-minhash
    kernel (Ioffe 2010 Improved Consistent Weighted Sampling,
    functions/icws.py) instead of the expansion reduction: per-column
    sample collision probability is exactly J_w, so the flagship
    banding + exact Σmin/Σmax verification run unchanged and the
    OUTPUT pair set is exact — the same oracle as bag_near_dup_pairs
    gates both kernels. ICWS signature cost is linear in DISTINCT
    (doc, token) pairs rather than total multiset mass: the scale path
    for heavy-multiplicity bags where expansion blows up by the mean
    count. Deterministic hash-derived Gamma/Uniform draws (repo
    contract: reproducible across processes and runs)."""
    from raydedup.stages.wjaccard import bag_near_dup_pairs

    return _round_col(
        bag_near_dup_pairs(_docs(sf_dir), SIMPLE_CFG, key_cols=["doc_id"],
                           bag_kernel="icws"),
        "jaccard")


def q_near_dup_clusters_docs(sf_dir: str):
    from raydedup.pipelines.neardup import near_dup_pipeline

    clusters, _ = near_dup_pipeline(_docs(sf_dir), SIMPLE_CFG, key_cols=["doc_id"])
    return clusters.select_columns(["row_key", "cluster_id"])


def q_cluster_common_tokens(sf_dir: str):
    """Per-cluster BOILERPLATE commonality over the flagship's dup
    clusters: for every >= 2-member cluster, the count of distinct
    tokens present in EVERY member (the shared template core), the
    smallest member's distinct-token count, and their ratio — the
    'how much of this duplicate family is shared template' report
    (stages/collection.py:cluster_common_tokens — one label-hash
    partition sweep over skinny (label, token-hash) rows). Oracle:
    the shared recursive cluster CTE + per-(cluster, token) document
    frequencies, common = df == cluster size."""
    from raydedup.pipelines.neardup import near_dup_pipeline
    from raydedup.stages.collection import cluster_common_tokens

    clusters, _ = near_dup_pipeline(_docs(sf_dir), SIMPLE_CFG,
                                    key_cols=["doc_id"])
    labels = clusters.select_columns(["row_key", "cluster_id"])

    def keyed(b: pa.Table) -> pa.Table:
        return pa.table({
            "row_key": pc.cast(b["doc_id"], pa.string()),
            "text": b["text"],
        })

    kd = _docs(sf_dir).map_batches(keyed, batch_format="pyarrow")
    labeled = _attach_col(kd, labels, "row_key", "cluster_id")
    return _round_col(
        cluster_common_tokens(labeled, id_col="row_key",
                              text_col="text"),
        "commonality")


def q_cluster_template_text(sf_dir: str):
    """Per-cluster TEMPLATE EXTRACTION over the flagship's dup
    clusters: the tokens present in every member rendered in
    first-occurrence order of the cluster's representative (the
    cluster_id member — labels are min member keys), as an actual
    boilerplate string (stages/collection.py:cluster_template_text —
    the label-hash sweep reduced to one small row per cluster + one
    rep-sized join). Oracle: shared recursive cluster CTE, per-token
    document frequency == cluster size, string_agg ordered by the
    rep's first token positions."""
    from raydedup.pipelines.neardup import near_dup_pipeline
    from raydedup.stages.collection import cluster_template_text

    clusters, _ = near_dup_pipeline(_docs(sf_dir), SIMPLE_CFG,
                                    key_cols=["doc_id"])
    labels = clusters.select_columns(["row_key", "cluster_id"])

    def keyed(b: pa.Table) -> pa.Table:
        return pa.table({
            "row_key": pc.cast(b["doc_id"], pa.string()),
            "text": b["text"],
        })

    kd = _docs(sf_dir).map_batches(keyed, batch_format="pyarrow")
    labeled = _attach_col(kd, labels, "row_key", "cluster_id")
    return cluster_template_text(labeled, id_col="row_key",
                                 text_col="text")


def q_near_dup_clusters_altstar(sf_dir: str):
    """Same cluster question as near_dup_clusters_docs, answered
    through the THIRD components backend: alternating large-star /
    small-star (Kiveris et al. 2014) in state/unionfind.py — O(log n)
    rounds on any edge structure with built-in hot-node splitting,
    labels painted onto rows via a distributed left join (no driver
    dict). One SQL truth, another execution path, like the bucketed
    asof twins."""
    from raydedup.pipelines.neardup import near_dup_pairs, signatures_with_rep
    from raydedup.state.unionfind import connected_components_altstar

    assigned = signatures_with_rep(
        _docs(sf_dir), SIMPLE_CFG, key_cols=["doc_id"]).materialize()
    pairs = near_dup_pairs(assigned, SIMPLE_CFG).materialize()
    labels = connected_components_altstar(pairs)
    lab = labels.map_batches(
        lambda b: pa.table({"rep_key": b["node"], "_cl": b["label"]}),
        batch_format="pyarrow").materialize()
    from raydedup.util import join_partitions

    rows = assigned.select_columns(["row_key", "rep_key"])
    out = rows.join(lab, join_type="left_outer",
                    num_partitions=join_partitions(lab.count()),
                    on=("rep_key",))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"row_key": b["row_key"],
                         "cluster_id": pc.coalesce(b["_cl"],
                                                   b["rep_key"])})

    return out.map_batches(fin, batch_format="pyarrow")


def q_near_dup_clusters_incremental(sf_dir: str):
    """Same cluster question as near_dup_clusters_docs, answered through
    the FOURTH components path: INCREMENTAL maintenance
    (state/unionfind.py:merge_components). Start from the exact-dedup
    labeling (every row → its exact rep, a complete partition), then
    merge the verified near-dup edges via LABEL-GRAPH contraction —
    each new edge projects to (label(a), label(b)), components run over
    that new-edge-sized graph only, and one left join repaints. This is
    the continuous-ingestion shape: shard N+1's edges never recluster
    the corpus, they contract against the standing labels. One SQL
    truth, a fourth execution path."""
    from raydedup.pipelines.neardup import near_dup_pairs, signatures_with_rep
    from raydedup.state.unionfind import merge_components

    assigned = signatures_with_rep(
        _docs(sf_dir), SIMPLE_CFG, key_cols=["doc_id"]).materialize()
    labels0 = assigned.map_batches(
        lambda b: pa.table({"node": b["row_key"], "label": b["rep_key"]}),
        batch_format="pyarrow")
    pairs = near_dup_pairs(assigned, SIMPLE_CFG)
    merged = merge_components(labels0, pairs)
    return merged.map_batches(
        lambda b: pa.table({"row_key": b["node"],
                            "cluster_id": b["label"]}),
        batch_format="pyarrow")


def q_cluster_cohesion(sf_dir: str):
    """Transitive-chaining audit of connected-component dedup: per
    near-dup cluster (over exact-text reps), member count, verified
    in-cluster pair count, and pair DENSITY n_pairs / C(m, 2) — a
    large low-density cluster is glued by chains (a~b~c without a~c),
    the classic way CC-based dedup over-merges. Components via the
    alternating-star backend; pairs attach to clusters by one label
    join; the final table is cluster-count sized."""
    import ray.data
    from ray.data.aggregate import Count

    from raydedup.pipelines.neardup import near_dup_pairs, signatures_with_rep
    from raydedup.state.unionfind import connected_components_altstar
    from raydedup.util import join_partitions

    assigned = signatures_with_rep(
        _docs(sf_dir), SIMPLE_CFG, key_cols=["doc_id"]).materialize()
    pairs = near_dup_pairs(assigned, SIMPLE_CFG).materialize()
    empty = pa.table({"cluster_id": pa.array([], pa.string()),
                      "n_members": pa.array([], pa.int64()),
                      "n_pairs": pa.array([], pa.int64()),
                      "density": pa.array([], pa.float64())})
    if pairs.count() == 0:
        return ray.data.from_arrow(empty)
    labels = connected_components_altstar(pairs).materialize()
    n_parts = join_partitions(labels.count())
    members = labels.groupby("label").aggregate(
        Count(alias_name="n_members"))
    pl = (pairs.map_batches(
        lambda b: pa.table({"node": b["a_key"]}), batch_format="pyarrow")
        .join(labels, join_type="inner", num_partitions=n_parts,
              on=("node",))
        .groupby("label").aggregate(Count(alias_name="n_pairs")))
    joined = members.join(pl, join_type="inner",
                          num_partitions=n_parts, on=("label",))

    def fin(b: pa.Table) -> pa.Table:
        m = pc.cast(b["n_members"], pa.int64())
        npair = pc.cast(b["n_pairs"], pa.int64())
        mn = m.to_numpy(zero_copy_only=False).astype(np.float64)
        dens = npair.to_numpy(zero_copy_only=False) / (mn * (mn - 1) / 2)
        return pa.table({"cluster_id": b["label"], "n_members": m,
                         "n_pairs": npair,
                         "density": pa.array(dens, pa.float64())})

    return _round_col(joined.map_batches(fin, batch_format="pyarrow"),
                      "density")


def q_cluster_survivor_by_score(sf_dir: str):
    """Score-based survivor selection: per near-dup cluster keep the
    member with the MOST content (max n_chars, tie min row_key) — the
    curation choice of 'keep the most complete copy' instead of the
    arbitrary min-key canonical. Singleton clusters bypass the grouped
    arg-max entirely (repeated_keys semi-split — the map_groups-tax
    idiom from cluster_medoids); only multi-member clusters reach
    quality.select_high_quality."""
    import ray.data

    from raydedup.pipelines.neardup import near_dup_pipeline
    from raydedup.stages.quality import select_high_quality
    from raydedup.stages.relational import semi_join
    from raydedup.util import join_partitions, repeated_keys

    clusters, _ = near_dup_pipeline(_docs(sf_dir), SIMPLE_CFG,
                                    key_cols=["doc_id"])
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "n_chars"],
                                 override_num_blocks=64)

    def rk(b: pa.Table) -> pa.Table:
        return pa.table({"row_key": pc.cast(b["doc_id"], pa.string()),
                         "n_chars": pc.cast(b["n_chars"], pa.int64())})

    keyed = docs.map_batches(rk, batch_format="pyarrow").materialize()
    scored = (clusters.select_columns(["row_key", "cluster_id"])
              .join(keyed, join_type="inner",
                    num_partitions=join_partitions(keyed.count()),
                    on=("row_key",)).materialize())
    multi_ids = repeated_keys(
        scored.select_columns(["cluster_id"]), "cluster_id")
    singles = semi_join(scored, multi_ids, on="cluster_id", anti=True)
    multi = semi_join(scored, multi_ids, on="cluster_id")
    winners = select_high_quality(multi, group_cols=("cluster_id",),
                                  quality_col="n_chars")
    cols = ["row_key", "cluster_id", "n_chars"]
    return singles.select_columns(cols).union(
        winners.select_columns(cols))


def q_leakage_safe_split(sf_dir: str):
    """Leakage-safe train/val/test split: near-dup CLUSTERS (not docs)
    are the split unit, so no near-duplicate of a training doc can land
    in val/test — the contamination-safe split a curation run needs.
    Composition: near_dup_pipeline clusters -> split_assign keyed by
    cluster_id (one stateless vectorized pass, no extra shuffle)."""
    from raydedup.pipelines.neardup import near_dup_pipeline
    from raydedup.stages.textstats import split_assign

    clusters, _ = near_dup_pipeline(_docs(sf_dir), SIMPLE_CFG,
                                    key_cols=["doc_id"])
    out = split_assign(clusters, key_col="cluster_id")
    return out.select_columns(["row_key", "cluster_id", "split"])


def q_dup_pagerank(sf_dir: str):
    """Integer fixed-point PageRank over the duplicate graph (star
    exact edges + LSH-verified near edges): 'duplicate centrality' —
    which documents sit at the heart of duplication families. Exact
    BIGINT arithmetic both sides (see stages/graph.py contract), so the
    oracle is the same recurrence unrolled in SQL."""
    from raydedup.pipelines.neardup import near_dup_pipeline
    from raydedup.stages.graph import dup_pagerank

    clusters, pairs = near_dup_pipeline(_docs(sf_dir), SIMPLE_CFG,
                                        key_cols=["doc_id"])
    return dup_pagerank(clusters, pairs)


def _docs_v2(sf_dir: str):
    """Deterministic 'next snapshot' of the documents table for the
    corpus_diff query (no external data): doc_id % 11 == 0 rows are
    dropped (removed), % 7 == 0 survivors get ' v2' appended (changed),
    and % 13 == 0 rows spawn a doc_id + 1000000 'new doc <id>' row
    (added). Mirrored verbatim by the oracle's v2 CTE."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def v2_rows(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        text = b["text"].combine_chunks()
        keep = ids % 11 != 0
        kept_ids = ids[keep]
        kept_text = text.filter(pa.array(keep))
        changed = kept_ids % 7 == 0
        new_text = pc.if_else(pa.array(changed),
                              pc.binary_join_element_wise(
                                  kept_text, pa.scalar(" v2"), ""),
                              kept_text)
        addmask = ids % 13 == 0
        add_ids = ids[addmask] + 1000000
        add_text = pa.array([f"new doc {i}" for i in ids[addmask]],
                            pa.string())
        return pa.table({
            "doc_id": pa.array(np.concatenate([kept_ids, add_ids]),
                               pa.int64()),
            "text": pa.concat_arrays([new_text.combine_chunks()
                                      if isinstance(new_text,
                                                    pa.ChunkedArray)
                                      else new_text, add_text]),
        })

    return _docs(sf_dir).map_batches(v2_rows, batch_format="pyarrow")


def q_event_dedup_window(sf_dir: str):
    """Telemetry debounce: drop an event whose previous event with the
    same (user_id, event_type) is <= 2 h older — lag semantics (gap to
    the previous ROW, not the previous kept row), deterministic
    (ts, event_id) ordering. One composite-key pass through the
    ordered.lag_delta partition sweep; no per-key Python calls."""
    import ray.data

    from raydedup.stages.ordered import lag_delta

    window_us = 2 * 3600 * 1_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])

    def keyed(b: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(b["user_id"], pa.string()), b["event_type"], ":")
        return b.append_column("__key", k)

    lagged = lag_delta(ev.map_batches(keyed, batch_format="pyarrow"),
                       by="__key", ts_col="ts", tie_cols=["event_id"],
                       out="__gap")

    def keep(b: pa.Table) -> pa.Table:
        m = pc.or_kleene(pc.is_null(b["__gap"]),
                         pc.greater(b["__gap"], window_us))
        return b.filter(m).drop_columns(["__key", "__gap"])

    return lagged.map_batches(keep, batch_format="pyarrow")


def q_length_deciles(sf_dir: str):
    """Global exact decile binning of document length: bucket =
    ceil(10 * cume_dist(n_chars)) in pure integer arithmetic — the
    quality-binning primitive (drop the bottom decile, stratify by
    decile). Corpus reduces to one row per distinct length before the
    driver walk; the paint is a broadcast pc.index_in."""
    import ray.data

    from raydedup.stages.stats import value_deciles

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "n_chars"])
    return value_deciles(docs, "n_chars")


def q_source_similarity(sf_dir: str):
    """Inter-source overlap matrix: Jaccard between every source pair
    over DISTINCT word trigrams (group-vs-group lift of the reference's
    collection measures, otmt/collection_measures.py:96-214). Gram
    strings never shuffle — 64-bit fingerprints partition-reduce to a
    k x k matrix (see stages/collection.py:source_similarity)."""
    import ray.data

    from raydedup.stages.collection import source_similarity

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "text"],
                                 override_num_blocks=64)
    return _round_tbl(source_similarity(docs), "jaccard")


def _docs_with_fragments(sf_dir: str):
    """Deterministic 'fragmented corpus' view (no external data): every
    7th sufficiently-long doc also appears as two fragments sharing an
    exact 64-char overlap seam at the midpoint (ids +2e6 / +3e6) — the
    fixed-overlap chunker output stitch_candidates exists to reassemble.
    Mirrored verbatim by the oracle's frags CTE. The per-row Python
    split runs only over the %7 fixture subset (a derived test view,
    not a scale operator — same contract as _docs_v2)."""
    def frag(b: pa.Table) -> pa.Table:
        base = pa.table({"doc_id": b["doc_id"], "text": b["text"]})
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        texts = b["text"].to_pylist()
        fid, ftext = [], []
        for i, t in zip(ids, texts):
            if i % 7 or t is None or len(t) < 130:
                continue
            p = len(t) // 2
            fid.append(int(i) + 2000000)
            ftext.append(t[:p + 64])
            fid.append(int(i) + 3000000)
            ftext.append(t[p:])
        if not fid:
            return base
        return pa.concat_tables([base, pa.table({
            "doc_id": pa.array(fid, pa.int64()),
            "text": pa.array(ftext, pa.string()),
        })])

    return _docs(sf_dir).map_batches(frag, batch_format="pyarrow")


def _docs_with_repeats(sf_dir: str, extra_cols: tuple = ()):
    """Deterministic 'repeated corpus' view (no external data): every
    5th doc appears 4 times in total (copies at ids +1e6/+2e6/+3e6) —
    the driver tables carry no exact duplicates, so frequency-capping
    queries need planted repeats. Mirrored verbatim by the oracle's
    reps CTE. Vectorized numpy fan-out; a derived test view, same
    contract as _docs_with_fragments. ``extra_cols`` carries further
    document columns (e.g. ``source``) through the copies."""
    import ray.data

    cols = ["doc_id", "text", *extra_cols]

    def rep(b: pa.Table) -> pa.Table:
        base = pa.table({c: b[c] for c in cols})
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        m = ids % 5 == 0
        if not m.any():
            return base
        mask = pa.array(m)
        extra = pa.table({
            "doc_id": pa.array(np.concatenate(
                [ids[m] + 1_000_000, ids[m] + 2_000_000,
                 ids[m] + 3_000_000]), pa.int64()),
            **{c: pa.concat_arrays(
                [b[c].filter(mask).combine_chunks()] * 3)
               for c in cols[1:]},
        })
        return pa.concat_tables([base, extra])

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=cols, override_num_blocks=64)
    return docs.map_batches(rep, batch_format="pyarrow")


def q_cap_duplicates(sf_dir: str):
    """Frequency capping: keep at most 2 copies of every exact-text
    group (smallest doc_ids survive), reporting each survivor's original
    group size — the keep-a-few relaxation of exact dedup
    (see stages/exact.py:cap_duplicates; texts never shuffle, only
    over-cap groups' skinny (sha, key) rows enter the ranking sweep)."""
    from raydedup.stages.exact import cap_duplicates

    return cap_duplicates(_docs_with_repeats(sf_dir), k=2)


def q_dup_rate_estimate(sf_dir: str):
    """Sampled duplication estimate over the repeated-corpus view:
    exact dup stats on a 50% content-hash sample (groups are atomic
    under the text-hash gate, so dup_frac is unbiased; see
    stages/exact.py:dup_rate_estimate)."""
    from raydedup.stages.exact import dup_rate_estimate

    return _round_col(dup_rate_estimate(_docs_with_repeats(sf_dir),
                                        rate=0.5), "dup_frac")


def q_soft_dedup_weights(sf_dir: str):
    """Reweight-not-remove dedup (SoftDedup): every row of the
    repeated-corpus view keeps flowing, annotated with its exact-text
    group size and a 1/n training weight so each group contributes one
    document of gradient in aggregate (see
    stages/exact.py:soft_dedup_weights — texts reduce to a sha per
    distinct value in-batch; only (hash, count) rows shuffle)."""
    from raydedup.stages.exact import soft_dedup_weights

    return _round_col(soft_dedup_weights(_docs_with_repeats(sf_dir)),
                      "weight")


def q_blocklist_hits(sf_dir: str):
    """Banned-phrase compliance scan: (doc_id, phrase, n_hits) for every
    document containing a blocklist phrase — zero shuffle, one
    vectorized substring-count pass per phrase per batch; counts are
    non-overlapping left-to-right on both sides (see
    stages/textstats.py:blocklist_scan). 'drop table' plants a
    zero-hit phrase so absent phrases are exercised."""
    from raydedup.stages.textstats import blocklist_scan

    return blocklist_scan(
        _docs(sf_dir),
        ["slow scan", "hash join", "spark", "drop table"])


# shared by q_blocklist_hits_rk and its oracle: a blocklist big enough
# that per-phrase substring passes stop being the right kernel (mixed
# 1-3 word phrases over the corpus vocabulary + planted absent entries)
_RK_PHRASES = [
    "slow scan", "hash join", "spark", "drop table", "table part",
    "fast merge", "value table", "sort table", "window table",
    "big table", "group value", "batch part", "row fast", "key agg",
    "order data", "data column", "small line", "customer query",
    "line value", "scan query", "stream fast", "filter value",
    "vector table", "agg row scan", "the line sort", "no such phrase",
    "zebra", "query line",
]


def q_blocklist_hits_rk(sf_dir: str):
    """Large-blocklist banned-phrase scan via the Rabin-Karp
    multi-pattern kernel: one rolling-hash pass per distinct phrase
    LENGTH over the batch's raw Arrow data buffer (zero-copy), instead
    of one substring pass per phrase — the kernel a thousands-entry
    compliance blocklist needs. Same (doc_id, phrase, n_hits)
    non-overlapping-count contract as blocklist_hits; candidates are
    byte-verified exactly, so hash collisions never reach the output
    (see stages/textstats.py:blocklist_scan_rk)."""
    from raydedup.stages.textstats import blocklist_scan_rk

    return blocklist_scan_rk(_docs(sf_dir), _RK_PHRASES)


def q_blocklist_hits_ac(sf_dir: str):
    """Large-blocklist banned-phrase scan via the THIRD kernel: an
    Aho-Corasick automaton in a Ray ACTOR POOL — goto/fail/output
    tables build once per actor in __init__, each batch scans every
    character ONCE regardless of blocklist size (the asymptotic win
    over both the per-phrase substring pass and the per-length
    Rabin-Karp pass when P reaches tens of thousands). Same
    (doc_id, phrase, n_hits) non-overlapping contract — all three
    kernels share one SQL oracle
    (stages/textstats.py:AhoCorasickScanner)."""
    from raydedup.stages.textstats import blocklist_scan_ac

    return blocklist_scan_ac(_docs(sf_dir), _RK_PHRASES)


def _docs_with_reordered(sf_dir: str):
    """Deterministic 'reordered corpus' view: every 9th doc also appears
    with its words REVERSED (id +4e6) — the shuffled-copy pattern bag
    dedup exists to catch; exact hashing misses these by construction.
    Mirrored verbatim by the oracle's reord CTE (list_reverse)."""
    def reord(b: pa.Table) -> pa.Table:
        base = pa.table({"doc_id": b["doc_id"],
                         "text": pc.fill_null(b["text"], "")})
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        m = ids % 9 == 0
        if not m.any():
            return base
        rev = [" ".join(t.split(" ")[::-1])
               for t in base["text"].filter(pa.array(m)).to_pylist()]
        extra = pa.table({
            "doc_id": pa.array(ids[m] + 4_000_000, pa.int64()),
            "text": pa.array(rev, pa.string()),
        })
        return pa.concat_tables([base, extra])

    return _docs(sf_dir).map_batches(reord, batch_format="pyarrow")


# fixed 10-word tail for the suffixed-variant corpus view (vocabulary
# words, so variant grams blend into the corpus distribution)
_SUFFIX_WORDS = ("spark filter window merge column batch stream "
                 "vector sort small")


def _docs_with_suffixed(sf_dir: str):
    """Deterministic 'suffixed corpus' view: every 7th doc also appears
    with a fixed 10-word tail appended (id +5e6) — a TRUE near-duplicate
    at 3-gram Jaccard ~0.8, the similarity regime a compressed-sketch
    estimator has to resolve. Mirrored verbatim by the oracle's varnt
    CTE (text || ' ...')."""
    def suff(b: pa.Table) -> pa.Table:
        base = pa.table({"doc_id": b["doc_id"],
                         "text": pc.fill_null(b["text"], "")})
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        m = ids % 7 == 0
        if not m.any():
            return base
        extra = pa.table({
            "doc_id": pa.array(ids[m] + 5_000_000, pa.int64()),
            "text": pc.binary_join_element_wise(
                base["text"].filter(pa.array(m)),
                " " + _SUFFIX_WORDS, ""),
        })
        return pa.concat_tables([base, extra])

    return _docs(sf_dir).map_batches(suff, batch_format="pyarrow")


def q_bbit_minhash_pairs(sf_dir: str):
    """b-bit minhash Jaccard estimation (Li & Konig 2010) — signature
    COMPRESSION: k=16 permutation minima keep only their low b=2 bits,
    so a document's whole sketch is ONE uint64 and a pair's estimate is
    one XOR + field count, with the collision bias corrected by
    J_hat = (M/k - 2^-b)/(1 - 2^-b). Pairs mix planted suffixed
    near-duplicates (J ~0.8) with adjacent-id dissimilar pairs, so the
    estimator is exercised across the range. md5-derived permutations
    (Kirsch-Mitzenmacher) make the estimate deterministic — the oracle
    replays it bit-for-bit (see stages/bbit.py)."""
    from raydedup.stages.bbit import bbit_jaccard_pairs

    def mk_pairs(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        a7 = ids[ids % 7 == 0]
        a11 = ids[ids % 11 == 0]
        return pa.table({
            "a_id": pa.array(np.concatenate([a7, a11]), pa.int64()),
            "b_id": pa.array(np.concatenate([a7 + 5_000_000, a11 + 1]),
                             pa.int64()),
        })

    pairs = _docs(sf_dir).select_columns(["doc_id"]).map_batches(
        mk_pairs, batch_format="pyarrow")
    return _round_col(
        bbit_jaccard_pairs(_docs_with_suffixed(sf_dir), pairs),
        "jaccard_est")


def _docs_with_typos(sf_dir: str):
    """Deterministic 'typo corpus' view: fixed 40-char prefixes of every
    long-enough doc, plus a single-SUBSTITUTION copy (position 6 -> 'q',
    id +6e6) for every 13th doc — the lev-1 class the deletion-variant
    join exists to catch. Mirrored verbatim by the oracle's base/v
    CTEs."""
    def typo(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        txt = pc.fill_null(b["text"].combine_chunks(), "")
        s = pc.utf8_slice_codeunits(txt, 0, 40)
        keep = pc.equal(pc.utf8_length(s), 40).to_numpy(
            zero_copy_only=False)
        base = pa.table({"doc_id": b["doc_id"],
                         "text": s}).filter(pa.array(keep))
        bids = ids[keep]
        m = bids % 13 == 0
        if not m.any():
            return base
        ss = base["text"].filter(pa.array(m)).to_pylist()
        extra = pa.table({
            "doc_id": pa.array(bids[m] + 6_000_000, pa.int64()),
            "text": pa.array([t[:5] + "q" + t[6:] for t in ss],
                             pa.string()),
        })
        return pa.concat_tables([base, extra])

    return _docs(sf_dir).map_batches(typo, batch_format="pyarrow")


def q_typo_dedup_pairs(sf_dir: str):
    """Edit-distance self-join: the EXACT set of distinct-text pairs at
    Levenshtein distance 1, via FastSS deletion-variant hash collisions
    + exact verify (stages/editjoin.py) — the typo/near-identical dedup
    class where shingle methods have nothing to band. The oracle's
    candidate prefilter is different math (equal-length lev-1 is a
    substitution, so one 20-char half must match exactly), making the
    two sides independent derivations of the same pair set."""
    from raydedup.stages.editjoin import typo_pairs

    return typo_pairs(_docs_with_typos(sf_dir))


def _docs_with_loops(sf_dir: str):
    """Deterministic 'loop corpus' view: 270-char prefixes of every
    doc, plus — for every 17th doc — a LOOPED copy (id +7e6) that
    re-emits its own first 130 chars, the verbatim-cycle pattern a
    stuck generator produces. Mirrored by the oracle's base/v CTEs."""
    def loops(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        s = pc.utf8_slice_codeunits(
            pc.fill_null(b["text"].combine_chunks(), ""), 0, 270)
        base = pa.table({"doc_id": b["doc_id"], "text": s})
        m = ids % 17 == 0
        if not m.any():
            return base
        ss = s.filter(pa.array(m))
        extra = pa.table({
            "doc_id": pa.array(ids[m] + 7_000_000, pa.int64()),
            "text": pc.binary_join_element_wise(
                ss, pc.utf8_slice_codeunits(ss, 0, 130), " "),
        })
        return pa.concat_tables([base, extra])

    return _docs(sf_dir).map_batches(loops, batch_format="pyarrow")


def q_max_repeat_len(sf_dir: str):
    """Loop detector: grid-quantized longest-repeated-substring length
    per document — the quality signal that catches a generator stuck in
    a long verbatim cycle, which Gopher's small-n-gram fractions
    dilute. Zero shuffle; every grid length reuses one shared
    rolling-hash cumsum per batch, equal-window runs are byte-verified
    (stages/textstats.py:max_repeat_len). The view plants 130-char
    self-loops so the 128 bin is exercised alongside natural 8/16-char
    repeats."""
    from raydedup.stages.textstats import max_repeat_len

    return max_repeat_len(_docs_with_loops(sf_dir))


def q_bag_dup_groups(sf_dir: str):
    """Word-multiset duplicate groups over the reordered-corpus view:
    reversed copies land in the same bag as their originals even though
    no exact or prefix method pairs them (see
    stages/exact.py:bag_dup_groups — canonical hashes shuffle, texts
    never do)."""
    from raydedup.stages.exact import bag_dup_groups

    return bag_dup_groups(_docs_with_reordered(sf_dir))


def _docs_with_snippets(sf_dir: str):
    """Deterministic 'snippet corpus' view: every 6th sufficiently-long
    doc also appears as a 160-char mid-document excerpt (id +5e6) — the
    quote/chunk-reingestion pattern containment detection exists for.
    Mirrored verbatim by the oracle's snips CTE (substr is 1-based and
    char-indexed on both sides)."""
    def snip(b: pa.Table) -> pa.Table:
        base = pa.table({"doc_id": b["doc_id"], "text": b["text"]})
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        texts = b["text"].to_pylist()
        sid, stext = [], []
        for i, t in zip(ids, texts):
            if i % 6 or t is None or len(t) < 260:
                continue
            sid.append(int(i) + 5_000_000)
            stext.append(t[39:199])  # == substr(text, 40, 160)
        if not sid:
            return base
        return pa.concat_tables([base, pa.table({
            "doc_id": pa.array(sid, pa.int64()),
            "text": pa.array(stext, pa.string()),
        })])

    return _docs(sf_dir).map_batches(snip, batch_format="pyarrow")


def q_doc_containment_pairs(sf_dir: str):
    """Strict whole-document containment over the snippet-corpus view:
    winnowing-fingerprint candidates (perfect recall for inner texts >=
    window+k-1 = 63 chars, Schleimer et al. 2003) verified by an exact
    substring check — quote/chunk leakage detection (see
    stages/suffix_span.py:containment_pairs)."""
    from raydedup.stages.exact import add_row_key
    from raydedup.stages.suffix_span import containment_pairs

    keyed = add_row_key(_docs_with_snippets(sf_dir), ["doc_id"])
    return containment_pairs(keyed, k=16, window=48)


def q_token_entropy(sf_dir: str):
    """Per-doc Shannon entropy of the token distribution — the
    corpus-free repetition/gibberish quality signal (zero shuffle, one
    vectorized pass; see stages/textstats.py:token_entropy)."""
    from raydedup.stages.textstats import token_entropy

    return _round_col(token_entropy(_docs(sf_dir)), "entropy")


def q_similar_docs_topk(sf_dir: str):
    """Text-side similarity search (query-by-document): top-5 most
    similar docs per query id by EXACT shingle-set Jaccard — the
    set-based counterpart of ann_topk; query sets broadcast once, the
    corpus streams through a vectorized partial-top-k scoring pass
    (see stages/setjoin.py:similar_docs_topk)."""
    from raydedup.stages.setjoin import similar_docs_topk

    return _round_col(
        similar_docs_topk(_docs(sf_dir), list(range(10)), k=5,
                          cfg=SIMPLE_CFG),
        "jaccard")


def q_temporal_novelty(sf_dir: str):
    """First-introduction novelty per doc under ascending-id arrival
    order: how many of a doc's distinct shingles first appear in it —
    the crawl/snapshot growth audit (see
    stages/setjoin.py:temporal_novelty; hashes shuffle, text never
    does)."""
    from raydedup.stages.setjoin import temporal_novelty

    return _round_col(temporal_novelty(_docs(sf_dir), cfg=SIMPLE_CFG),
                      "novelty_frac")


def q_prepare_training_transcripts(sf_dir: str):
    """END-TO-END transcript training-data prep — the composed pipeline
    a transcript-pretraining run ships: assemble conversations under
    stable (conv_id, turn_idx) order → conversation-level near-dup
    pairs (exact prefix-filter join, threshold 0.1) → connected
    components → min-conv_id survivor per cluster → whitespace token
    counts → deterministic md5 shard assignment → per-shard manifest
    (shard, n_convs, n_tokens, min_conv, max_conv). Every stage is the
    already-oracled operator; the duplicate-conv set broadcast is
    pair-bounded (components exist only where edges do)."""
    import ray
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    from raydedup.stages.ordered import assemble_by_key
    from raydedup.stages.setjoin import set_similarity_self_join
    from raydedup.stages.textstats import assign_shards
    from raydedup.state.unionfind import connected_components_driver

    ts = transcripts_from_documents(sf_dir)
    convs = assemble_by_key(ts, by="conv_id", order_cols=["turn_idx"],
                            text_col="text", sep="\n",
                            out="conv_text").materialize()
    pairs = set_similarity_self_join(convs, 0.1, SIMPLE_CFG,
                                     id_col="conv_id",
                                     text_col="conv_text")
    comp = connected_components_driver(pairs, a_col="a_id", b_col="b_id")
    dup_keys = pa.array([k for k, v in comp.items() if v != k],
                        pa.string())
    ref = ray.put(dup_keys)

    def survivors(b: pa.Table) -> pa.Table:
        dups = ray.get(ref)
        keep = pc.invert(pc.is_in(b["conv_id"], value_set=dups))
        t = b.filter(keep)
        n_tok = pc.cast(pc.count_substring_regex(
            pc.fill_null(t["conv_text"].combine_chunks(), ""), r"\S+"),
            pa.int64())
        return pa.table({"conv_id": t["conv_id"], "n_tokens": n_tok})

    surv = convs.map_batches(survivors, batch_format="pyarrow")
    sharded = assign_shards(surv, n_shards=4, key_col="conv_id")
    return (sharded.groupby("shard")
            .aggregate(Count(alias_name="n_convs"),
                       Sum("n_tokens", alias_name="n_tokens"),
                       Min("conv_id", alias_name="min_conv"),
                       Max("conv_id", alias_name="max_conv")))


def q_data_expectations(sf_dir: str):
    """Declarative ingest contract check: one (rule, n_violations) row
    per expectation — null/empty text, length range, closed language
    set, cross-column n_chars consistency, doc_id uniqueness. All mask
    rules reduce to one partial row per batch; only the uniqueness rule
    shuffles, and it moves (value, count) partials, never rows (see
    stages/expectations.py)."""
    import ray.data

    from raydedup.stages.expectations import expect

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 override_num_blocks=64)
    return expect(docs, [
        ("text_not_null", "not_null", "text"),
        ("text_non_empty", "non_empty", "text"),
        ("text_len_100_10000", "len_between", "text", 100, 10000),
        ("lang_known", "in_set", "lang", ["en", "de", "fr"]),
        ("n_chars_consistent", "len_equals", "n_chars", "text"),
        ("doc_id_unique", "unique", "doc_id"),
    ])


def q_stitch_candidates(sf_dir: str):
    """Fragment reassembly: pairs where the last 64 chars of one doc
    equal the first 64 of another — the seam signature a fixed-overlap
    chunker leaves. Only 64-char grams shuffle; one distributed hash
    join on the literal gram (see stages/exact.py:stitch_candidates)."""
    from raydedup.stages.exact import stitch_candidates

    return stitch_candidates(_docs_with_fragments(sf_dir))


def q_snm_candidate_pairs(sf_dir: str):
    """Sorted-neighborhood candidate pairs (Hernández-Stolfo blocked
    SNM, window 3, bucket = first 8 normalized chars): the third
    candidate paradigm next to LSH and simhash pigeonhole — catches
    stable-head edits regardless of tail churn, pair volume bounded by
    window * n by construction (see stages/snm.py)."""
    from raydedup.stages.snm import sorted_neighborhood_pairs

    return sorted_neighborhood_pairs(_docs(sf_dir))


def q_snm_multipass_pairs(sf_dir: str):
    """Multi-pass SNM (the standard blocked-SNM recall recovery): one
    forward pass over the normalized key plus one pass over the
    REVERSED key (stable-tail edits sort adjacent there), each row
    tagged with its pass. Two independent partition sweeps; same
    bounded pair volume per pass."""
    from raydedup.stages.snm import _norm_key, sorted_neighborhood_pairs

    def rev_key(arr):
        return pc.utf8_reverse(_norm_key(arr))

    def tag(pass_name):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column(
                "pass", pa.array([pass_name] * b.num_rows, pa.string()))
        return f

    fwd = sorted_neighborhood_pairs(_docs(sf_dir)).map_batches(
        tag("fwd"), batch_format="pyarrow")
    rev = sorted_neighborhood_pairs(_docs(sf_dir), key_fn=rev_key
                                    ).map_batches(
        tag("rev"), batch_format="pyarrow")
    return fwd.union(rev)


def q_dup_flow_matrix(sf_dir: str):
    """Cross-source duplicate FLOW matrix: for every unordered source
    pair, how many exact star edges (member → its exact-text rep; star,
    not clique, so a viral text never explodes quadratically — the
    dup_pagerank edge contract) and verified near-dup rep pairs connect
    them — 'which crawls copy from which'. Edges are key pairs only;
    sources attach via two hash joins to a pruned (key, source)
    projection; one combiner-friendly 3-key counting groupby."""
    import ray.data
    from ray.data.aggregate import Count

    from raydedup.pipelines.neardup import (near_dup_pairs,
                                            signatures_with_rep)
    from raydedup.util import join_partitions

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source", "text"],
                                 override_num_blocks=64)
    assigned = signatures_with_rep(docs, SIMPLE_CFG,
                                   key_cols=["doc_id"]).materialize()

    def srcmap(b: pa.Table) -> pa.Table:
        return pa.table({"ka": pc.cast(b["doc_id"], pa.string()),
                         "src": b["source"]})

    srcs = docs.map_batches(srcmap, batch_format="pyarrow").materialize()

    def as_edge(ka: str, kb: str, kind: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                "ka": b[ka], "kb": b[kb],
                "kind": pa.array([kind] * b.num_rows, pa.string()),
            })
        return f

    exact = (assigned.filter(expr="is_rep == False")
             .map_batches(as_edge("row_key", "rep_key", "exact"),
                          batch_format="pyarrow"))
    near = near_dup_pairs(assigned, SIMPLE_CFG).map_batches(
        as_edge("a_key", "b_key", "near"), batch_format="pyarrow")
    edges = exact.union(near)

    n_parts = join_partitions(max(assigned.count(), 1))
    j = edges.join(srcs, join_type="inner", num_partitions=n_parts,
                   on=("ka",))
    j = j.map_batches(
        lambda b: b.rename_columns(
            ["kb" if c == "ka" else "ka" if c == "kb" else
             "sa" if c == "src" else c for c in b.column_names]),
        batch_format="pyarrow")
    # after the swap the second join also keys on "ka" (originally kb)
    j = j.join(srcs, join_type="inner", num_partitions=n_parts,
               on=("ka",))

    def unordered(b: pa.Table) -> pa.Table:
        lo = pc.if_else(pc.less_equal(b["sa"], b["src"]), b["sa"],
                        b["src"])
        hi = pc.if_else(pc.less_equal(b["sa"], b["src"]), b["src"],
                        b["sa"])
        return pa.table({"source_a": lo, "source_b": hi,
                         "kind": b["kind"]})

    return (j.map_batches(unordered, batch_format="pyarrow")
            .groupby(["source_a", "source_b", "kind"])
            .aggregate(Count(alias_name="n_edges")))


def _transcripts_with_forks(sf_dir: str):
    """Deterministic 'fork' view (no external data): every 4th
    conversation spawns a replica under conv_id + '-fork' whose turns
    from index 5 onward have ' forked' appended — a rerun that diverged
    at turn 5. Mirrored verbatim by the oracle's fork CTE."""
    import numpy as np

    ts = transcripts_from_documents(sf_dir)

    def add_fork(b: pa.Table) -> pa.Table:
        num = pc.cast(pc.utf8_slice_codeunits(b["conv_id"], 5, 99),
                      pa.int64()).to_numpy(zero_copy_only=False)
        mask = pa.array(num % 4 == 0)
        rep = b.filter(mask)
        late = pc.greater_equal(rep["turn_idx"], 5)
        new_text = pc.if_else(
            late,
            pc.binary_join_element_wise(rep["text"],
                                        pa.scalar(" forked"), ""),
            rep["text"])
        rep = rep.set_column(rep.column_names.index("text"), "text",
                             new_text)
        rep = rep.set_column(
            rep.column_names.index("conv_id"), "conv_id",
            pc.binary_join_element_wise(rep["conv_id"],
                                        pa.scalar("-fork"), ""))
        return pa.concat_tables([b, rep])

    return ts.map_batches(add_fork, batch_format="pyarrow")


def q_conv_divergence(sf_dir: str):
    """Fork divergence report: for each (conversation, its fork
    replica) pair, the longest common turn prefix plus both lengths —
    'where did the rerun diverge'. Linear in paired turns; no text
    shuffles (see stages/convdedup.py:conv_divergence)."""
    import ray.data

    from raydedup.stages.convdedup import conv_divergence

    tall = _transcripts_with_forks(sf_dir)

    def pair_rows(b: pa.Table) -> pa.Table:
        num = pc.cast(pc.utf8_slice_codeunits(b["conv_id"], 5, 99),
                      pa.int64()).to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(num % 4 == 0))
        t = t.filter(pc.equal(t["turn_idx"], 0))
        return pa.table({
            "conv_a": t["conv_id"],
            "conv_b": pc.binary_join_element_wise(
                t["conv_id"], pa.scalar("-fork"), ""),
        })

    pairs = transcripts_from_documents(sf_dir).map_batches(
        pair_rows, batch_format="pyarrow")
    return conv_divergence(tall, pairs)


def q_source_similarity_kmv(sf_dir: str):
    """Bounded-memory KMV-sketch estimate of the inter-source overlap
    matrix (k-minimum-values, k=256): per-source state is capped at k
    md5-low64 values no matter the vocabulary — the 100-TB path where
    the exact matrix's distinct-fingerprint shuffle gets expensive.
    Deterministic given the hash, so the DuckDB oracle reproduces the
    ESTIMATE bit-for-bit (see stages/collection.py:source_similarity_kmv)."""
    import ray.data

    from raydedup.stages.collection import source_similarity_kmv

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "text"],
                                 override_num_blocks=64)
    return _round_tbl(source_similarity_kmv(docs), "jaccard_est")


_SWEEP_GRID = [0.8, 0.85, 0.9, 0.95, 1.0]


def q_dedup_threshold_sweep(sf_dir: str):
    """Dedup sensitivity curve: verified near-dup pair count and
    distinct-rep-doc-with-a-dup count at each candidate Jaccard
    threshold >= the config threshold (so LSH recall is untouched).
    One verified-pairs pass, two grid-sized aggregates (see
    pipelines/neardup.py:pair_threshold_sweep)."""
    from raydedup.pipelines.neardup import (near_dup_pairs,
                                            pair_threshold_sweep,
                                            signatures_with_rep)

    assigned = signatures_with_rep(
        _docs(sf_dir), SIMPLE_CFG, key_cols=["doc_id"]
    ).materialize()
    return pair_threshold_sweep(near_dup_pairs(assigned, SIMPLE_CFG),
                                _SWEEP_GRID)


def q_corpus_diff(sf_dir: str):
    """Snapshot diff old -> new corpus version by content sha256:
    added / removed / changed / unchanged per key, one hash-sized
    groupby shuffle (see stages/incremental.py corpus_diff)."""
    from raydedup.stages.incremental import corpus_diff

    return corpus_diff(_docs(sf_dir), _docs_v2(sf_dir))


def q_cluster_medoids(sf_dir: str):
    """Canonical-copy selection per near-dup cluster: the MEDOID rep —
    highest summed scaled-jaccard similarity to the cluster's other
    reps (exact integer scores; ties -> min key). Singleton-rep
    clusters never enter the groupby (repeated-keys semi-join split)."""
    from raydedup.pipelines.neardup import (cluster_assignments,
                                            near_dup_pairs,
                                            signatures_with_rep)
    from raydedup.stages.graph import cluster_medoids

    assigned = signatures_with_rep(_docs(sf_dir), SIMPLE_CFG,
                                   key_cols=["doc_id"]).materialize()
    pairs = near_dup_pairs(assigned, SIMPLE_CFG).materialize()
    clusters = cluster_assignments(assigned, pairs, SIMPLE_CFG)
    return cluster_medoids(assigned, clusters)


def q_near_dup_clusters_transcripts(sf_dir: str):
    """Flagship: full near-dup DAG over the derived transcript table with
    the reference (stemmed) config. Value-level DuckDB oracle: Porter
    stemming itself is not ANSI-SQL-expressible, but the testdata
    vocabulary is a closed 31-word set, so the oracle embeds a literal
    stem lookup (_PORTER_SQL_STEMS — asserted equal to porter_stem and to
    cover the testdata vocab by tests/test_registry_misc.py) and then
    independently recomputes EVERYTHING downstream of per-token stemming:
    post-stem stopword filter, 3-word shingles, rep grouping, brute-force
    pair jaccard >= 0.8, and recursive-CTE connected components."""
    from raydedup.pipelines.neardup import near_dup_pipeline

    ts = transcripts_from_documents(sf_dir)
    clusters, _ = near_dup_pipeline(ts, DEFAULT_CONFIG)
    return clusters


def q_otmt_bytecount(sf_dir: str):
    from raydedup.stages.exact import add_row_key
    from raydedup.stages.measures import anchor_measures

    ts = add_row_key(transcripts_from_documents(sf_dir), ["conv_id", "turn_idx"])
    scores = anchor_measures(ts, ["bytecount"], DEFAULT_CONFIG)
    out = scores.select_columns(["conv_id", "turn_idx", "bytecount"])
    return _round_col(out, "bytecount")


def q_otmt_wordcount_simple(sf_dir: str):
    """wordcount with the SQL-mirrorable tokenizer (lower \\w+ runs)."""
    from raydedup.stages.exact import add_row_key
    from raydedup.stages.measures import anchor_measures

    ts = add_row_key(transcripts_from_documents(sf_dir), ["conv_id", "turn_idx"])
    scores = anchor_measures(ts, ["wordcount"], SIMPLE_CFG)
    out = scores.select_columns(["conv_id", "turn_idx", "wordcount"])
    return _round_col(out, "wordcount")


def q_otmt_jaccard_simple(sf_dir: str):
    from raydedup.stages.exact import add_row_key
    from raydedup.stages.measures import anchor_measures

    ts = add_row_key(transcripts_from_documents(sf_dir), ["conv_id", "turn_idx"])
    scores = anchor_measures(ts, ["jaccard"], SIMPLE_CFG)
    out = scores.select_columns(["conv_id", "turn_idx", "jaccard"])
    return _round_col(out, "jaccard")


def q_otmt_sorensen_simple(sf_dir: str):
    from raydedup.stages.exact import add_row_key
    from raydedup.stages.measures import anchor_measures

    ts = add_row_key(transcripts_from_documents(sf_dir), ["conv_id", "turn_idx"])
    scores = anchor_measures(ts, ["sorensen"], SIMPLE_CFG)
    out = scores.select_columns(["conv_id", "turn_idx", "sorensen"])
    return _round_col(out, "sorensen")


def _anchor_measure_query(sf_dir: str, measure: str, cfg=None):
    from raydedup.stages.exact import add_row_key
    from raydedup.stages.measures import anchor_measures

    ts = add_row_key(transcripts_from_documents(sf_dir), ["conv_id", "turn_idx"])
    scores = anchor_measures(ts, [measure], cfg or SIMPLE_CFG)
    out = scores.select_columns(["conv_id", "turn_idx", measure])
    return _round_col(out, measure)


def q_otmt_levenshtein_simple(sf_dir: str):
    """Token-level edit distance vs the conversation anchor."""
    return _anchor_measure_query(sf_dir, "levenshtein")


def q_otmt_nlevenshtein_simple(sf_dir: str):
    """Method-1 normalized Levenshtein (dist / max(len))."""
    return _anchor_measure_query(sf_dir, "nlevenshtein")


def q_otmt_tfintersection_simple(sf_dir: str):
    """|top-20 terms(anchor) ∩ top-20 terms(member)|."""
    return _anchor_measure_query(sf_dir, "tfintersection")


def q_otmt_raw_simhash(sf_dir: str):
    """Hamming distance of raw-content simhashes vs the anchor (raw
    measure — tokenizer config is irrelevant)."""
    return _anchor_measure_query(sf_dir, "raw_simhash", DEFAULT_CONFIG)


def q_otmt_tf_simhash_simple(sf_dir: str):
    """Hamming distance of token-feature simhashes vs the anchor."""
    return _anchor_measure_query(sf_dir, "tf_simhash")


def q_otmt_cosine_simple(sf_dir: str):
    """Group-local TF-IDF cosine vs the anchor (group-corpus measure —
    exercises the groupby path rather than the broadcast path)."""
    return _anchor_measure_query(sf_dir, "cosine")


def q_otmt_lsi_simple(sf_dir: str):
    """LSI cosine over the first 10 turns of every conversation — each
    group then has <= num_topics docs, the rank <= num_topics regime where
    the truncated-SVD projection is an isometry on the row space, so
    topic-space cosine PROVABLY equals plain BoW cosine
    (tests/test_measures.py::test_lsi_equals_bow_cosine_when_rank_small);
    that equality is what the DuckDB oracle recomputes. The turn-idx
    filter is an oracle-domain restriction, not an engine limit (the full
    engine path runs on every turn count)."""
    from raydedup.stages.exact import add_row_key
    from raydedup.stages.measures import anchor_measures

    ts = add_row_key(transcripts_from_documents(sf_dir),
                     ["conv_id", "turn_idx"])

    def fl(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less_equal(batch["turn_idx"], 9))

    scores = anchor_measures(ts.map_batches(fl, batch_format="pyarrow"),
                             ["gensim_lsi"], SIMPLE_CFG)
    out = scores.select_columns(["conv_id", "turn_idx", "gensim_lsi"])
    return _round_col(out, "gensim_lsi", nudge=1e-9)


def q_otmt_lda(sf_dir: str):
    """Deterministic pLSA stand-in for gensim LDA (iterative EM — not
    SQL-expressible; rows-only driver check, value parity bounded by
    pytest as in the reference's own LDA test)."""
    return _anchor_measure_query(sf_dir, "gensim_lda")


def q_collection_jaccard(sf_dir: str):
    from raydedup.stages.collection import collection_measures

    out = collection_measures(
        _docs(sf_dir), key_cols=["doc_id"], simple_tokens=True
    )
    out = _round_col(out, "collection_jaccard")
    out = _round_col(out, "collection_sorensen")
    return out.select_columns(
        ["doc_id", "n_distinct_tokens", "collection_jaccard", "collection_sorensen"]
    )


def q_top_terms_global(sf_dir: str):
    """Global term-frequency top-20 with the reference tie-break (count
    desc, token reverse-lex — otmt/timemap_measures.py:474-491)."""
    from raydedup.stages.collection import global_top_terms

    return global_top_terms(_docs(sf_dir), k=20, simple_tokens=True)


def q_top_terms_global_sketch(sf_dir: str):
    """Same top-20 via the Misra-Gries heavy-hitters scale path: the
    shuffle carries <= sketch_size terms per block (not each block's
    vocabulary), candidates re-counted exactly, certificate checked
    (exact k-th count > summed deductions) with an exact fallback —
    output bit-identical to top_terms_global, oracle shared."""
    from raydedup.stages.collection import global_top_terms_sketch

    return global_top_terms_sketch(_docs(sf_dir), k=20,
                                   simple_tokens=True, sketch_size=64)


# Closed-form synthetic URI corpus for the select_high_quality oracle:
# host class and path depth derive from doc_id alone, so DuckDB recomputes
# the quality score arithmetic while the ENGINE side still runs the real
# regex classifier in uri_scores (same pattern as the multimodal oracle).
_SHQ_HOSTS = ["twitter.com", "youtube.com", "flickr.com",
              "wordpress.org", "cnn.com", "example.org"]
_SHQ_WEIGHTS = [1.0, 0.9, 0.8, 0.5, 0.3, 0.0]


def q_select_high_quality(sf_dir: str):
    import ray.data

    from raydedup.stages.quality import select_high_quality, uri_scores

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        uris = ["http://%s/%s" % (_SHQ_HOSTS[int(i) % 6], "a/" * (int(i) % 8))
                for i in ids]
        return pa.table(
            {
                "row_key": pc.cast(batch["doc_id"], pa.string()),
                "cluster_id": pa.array(ids % 37, type=pa.int64()),
                "uri": pa.array(uris, type=pa.string()),
            }
        )

    scored = uri_scores(docs.map_batches(attach, batch_format="pyarrow"))
    top = select_high_quality(scored, group_cols=("cluster_id",))
    top = _round_col(top, "quality_score")
    return top.select_columns(["cluster_id", "row_key", "quality_score"])


def q_select_by_language(sf_dir: str):
    from raydedup.stages.quality import select_by_language
    from raydedup.stages.textstats import detect_language

    kept = select_by_language(detect_language(_docs(sf_dir)), "en")
    return kept.select_columns(["doc_id", "detected_lang"])


def q_slice_events(sf_dir: str):
    import ray.data

    from raydedup.stages.slicing import slice_by_time

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts"])

    def key(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ts": batch["ts"],
                "row_key": pc.cast(batch["event_id"], pa.string()),
            }
        )

    keyed = ev.map_batches(key, batch_format="pyarrow")
    return slice_by_time(keyed, ts_col="ts")


_DECON_RATE = 0.1
_DECON_N = 8


def q_decontaminate_docs(sf_dir: str):
    """Benchmark decontamination: the md5-keyed 10% sample of documents is
    the held-out 'benchmark'; every remaining document is flagged with the
    count of DISTINCT word 8-grams it shares with the benchmark. The
    oracle recomputes the identical split and n-gram semi-join in SQL."""
    from raydedup.stages.decontam import decontaminate
    from raydedup.stages.textstats import sample_by_hash

    docs = _docs(sf_dir)
    bench = sample_by_hash(docs, "doc_id", _DECON_RATE, _SAMPLE_SEED)
    bench_ids = {r["doc_id"] for r in
                 bench.select_columns(["doc_id"]).take_all()}

    def corpus_only(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(
            batch["doc_id"],
            value_set=pa.array(sorted(bench_ids),
                               type=batch.schema.field("doc_id").type)))
        return batch.filter(mask)

    corpus = docs.map_batches(corpus_only, batch_format="pyarrow")
    out = decontaminate(corpus, bench, n=_DECON_N)
    return out.select_columns(["doc_id", "contaminated", "n_hit"])


_PACK_BUDGET = 256
_PACK_PARTS = 8


def q_pack_sequences(sf_dir: str):
    """Partition-local deterministic sequence packing (token budget 256,
    8 hash partitions): each partition scans its documents in key order
    and fills packs greedily. The oracle replays the identical scan with
    a recursive CTE (one recursion step per row rank, all partitions in
    lockstep)."""
    from raydedup.stages.textstats import pack_sequences

    return pack_sequences(_docs(sf_dir), _PACK_BUDGET,
                          num_partitions=_PACK_PARTS)


def q_redact_pii(sf_dir: str):
    """PII detection/redaction over documents deterministically decorated
    with synthetic contact strings (every doc_id % 10 == 0 gains an email
    + phone + IP suffix — the raw testdata contains no PII, so the
    decoration makes the oracle non-trivial). The oracle applies the
    IDENTICAL decoration and RE2 regexes in SQL; the full redacted string
    is value-compared, not just the counts."""
    from raydedup.stages.textstats import redact_pii

    def decorate(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        out = [
            (t + f" contact: user{d}@example.com or +1 555 010 "
                 f"{d % 100:02d} from 10.0.{d % 256}.1")
            if d % 10 == 0 else t
            for d, t in zip(ids, texts)
        ]
        return batch.set_column(batch.schema.get_field_index("text"),
                                "text", pa.array(out, type=pa.string()))

    out = redact_pii(_docs(sf_dir).map_batches(decorate,
                                               batch_format="pyarrow"))
    return out.select_columns(
        ["doc_id", "n_email", "n_phone", "n_ip", "redacted"])


def q_repetition_stats(sf_dir: str):
    """Gopher-style per-document repetition signals (dup-line fraction,
    top-2-gram fraction, duplicated-3-gram fraction) — pure counting over
    lines / lowercase word runs, recomputed exactly by the DuckDB oracle."""
    from raydedup.stages.textstats import repetition_stats

    out = repetition_stats(_docs(sf_dir))
    for c in ("dup_line_frac", "top_2gram_frac", "dup_3gram_frac"):
        out = _round_col(out, c)
    return out.select_columns(
        ["doc_id", "dup_line_frac", "top_2gram_frac", "dup_3gram_frac"]
    )


_SAMPLE_RATE = 0.25
_SAMPLE_SEED = "s0"


def q_sample_docs(sf_dir: str):
    """Deterministic md5-keyed down-sampling at rate 0.25 — stable across
    reruns/retries and consistent across tables sharing the key (the
    resumable-sampling story for a 100-TB corpus). Oracle recomputes the
    identical md5-prefix threshold test in SQL."""
    from raydedup.stages.textstats import sample_by_hash

    docs = _docs(sf_dir).map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("doc_id"), "doc_id",
            pc.cast(b["doc_id"], pa.string())),
        batch_format="pyarrow")
    return sample_by_hash(
        docs, "doc_id", _SAMPLE_RATE, _SAMPLE_SEED
    ).select_columns(["doc_id"])


def q_quota_sample_docs(sf_dir: str):
    """Per-source quota cap (k=10 per source domain, the training-data
    mixing primitive): keep the 10 rows per source with the smallest
    (md5('s0:'||doc_id), doc_id). The oracle replays the identical hash
    order with a row_number window."""
    import ray.data

    from raydedup.stages.textstats import quota_by_group

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"],
                                 override_num_blocks=16)
    return quota_by_group(docs, "source", "doc_id", 10, "s0")


def q_topk_per_source(sf_dir: str):
    """Best-k-per-group curation: the 3 longest documents per source
    (n_chars desc, doc_id asc tie-break) via the partial-top-k combiner +
    broadcast-threshold filter. Oracle is a row_number window."""
    import ray.data

    from raydedup.stages.textstats import topk_by_group

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source", "n_chars"],
                                 override_num_blocks=16)
    return topk_by_group(docs, "source", "doc_id", "n_chars", 3)


def q_characteristic_terms(sf_dir: str):
    """Per-doc TF-IDF-style salient term with a float-free (tf desc,
    df asc, token asc) ranking; global df table built as vocab-sized
    partial counts, broadcast for the streaming argmax pass."""
    from raydedup.stages.textstats import characteristic_terms

    return characteristic_terms(_docs(sf_dir))


def q_length_percentiles(sf_dir: str):
    """Exact per-source p50/p90/p99 of document length via the
    counting-merge trick (shuffle = distinct (source, n_chars) pairs).
    Index semantics mirror DuckDB quantile_disc."""
    import ray.data

    from raydedup.stages.stats import grouped_quantiles

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "n_chars"],
                                 override_num_blocks=16)
    return grouped_quantiles(docs, "source", "n_chars", [0.5, 0.9, 0.99])


def q_dedup_survivors_docs(sf_dir: str):
    """Composition pipeline: near-dup clusters → join per-doc length →
    best-1-per-cluster survivor selection (largest n_chars, ties to the
    smallest key) — the full curation chain a training-data run would
    ship: dedup, enrich, select. Distributed hash join + the
    partial-top-k combiner; oracled end-to-end by the recursive-CTE
    clusters + a row_number window."""
    import ray

    import ray.data

    from raydedup.pipelines.neardup import near_dup_pipeline

    clusters, _ = near_dup_pipeline(_docs(sf_dir), SIMPLE_CFG,
                                    key_cols=["doc_id"])

    def keyed_meta(b: pa.Table) -> pa.Table:
        return pa.table({"row_key": pc.cast(b["doc_id"], pa.string()),
                         "n_chars": b["n_chars"]})

    meta = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).map_batches(keyed_meta, batch_format="pyarrow")
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    joined = clusters.select_columns(["row_key", "cluster_id"]).join(
        meta, join_type="inner",
        num_partitions=max(2, min(32, 2 * ncpu)), on=("row_key",))

    # Ray 2.49's join emits zero-row blocks with an EMPTY schema from
    # empty hash partitions; rebuild a fixed schema before downstream
    # stages touch column types (same guard as relational.proj_fix)
    def fix_schema(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "cluster_id" not in b.column_names:
            return pa.table({"row_key": pa.array([], pa.string()),
                             "cluster_id": pa.array([], pa.string()),
                             "n_chars": pa.array([], pa.int64())})
        return pa.table({"row_key": b["row_key"],
                         "cluster_id": b["cluster_id"],
                         "n_chars": b["n_chars"]})

    from raydedup.stages.textstats import topk_by_group

    out = topk_by_group(
        joined.map_batches(fix_schema, batch_format="pyarrow"),
        "cluster_id", "row_key", "n_chars", k=1)
    return out.select_columns(["row_key", "cluster_id", "n_chars"])


def q_fuzzy_decontam_transcripts(sf_dir: str):
    """Cross-corpus FUZZY decontamination: transcript turns whose
    shingle-set Jaccard vs any of the first-50 benchmark documents is
    ≥ 0.8 — benchmark band index + shingle sets broadcast once, one
    streaming LSH probe + exact verify pass over the corpus, no
    shuffle. Oracle is the brute-force cross jaccard join."""
    import ray.data

    from raydedup.stages.decontam import cross_corpus_near_dups
    from raydedup.stages.exact import add_row_key

    ts = add_row_key(transcripts_from_documents(sf_dir),
                     ["conv_id", "turn_idx"])
    bench = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).filter(expr="doc_id < 50")
    out = cross_corpus_near_dups(ts, bench, SIMPLE_CFG,
                                 corpus_key="row_key",
                                 bench_key="doc_id")
    return _round_col(out, "jaccard")


def q_value_percentiles_by_type(sf_dir: str):
    """Float-column percentiles via the documented scale-to-ints
    recipe: event values quantize to milli-units (round(v*1000) int64),
    run through the exact counting-merge quantile operator, and divide
    back — both sides quantize identically, so the final doubles are
    bit-identical (same int operand, same literal divisor)."""
    import ray.data

    from raydedup.stages.stats import grouped_quantiles

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def to_milli(b: pa.Table) -> pa.Table:
        from raydedup.util import round_half_away

        # drop nulls (quantile_disc skips them) and quantize with the
        # exact half-away rule (DuckDB round parity)
        b = b.filter(pc.is_valid(b["value"]))
        v = b["value"].combine_chunks().to_numpy(
            zero_copy_only=False) * 1000.0
        milli = pa.array(round_half_away(v).astype(np.int64))
        i = b.schema.get_field_index("value")
        return b.set_column(i, "v_milli", milli)

    out = grouped_quantiles(ev.map_batches(to_milli,
                                           batch_format="pyarrow"),
                            "event_type", "v_milli", [0.5, 0.9, 0.99])

    def back(b: pa.Table) -> pa.Table:
        cols = {"event_type": b["event_type"]}
        for nm in ("p50", "p90", "p99"):
            v = b[nm].combine_chunks().to_numpy(zero_copy_only=False)
            cols[nm] = pa.array(v.astype(np.float64) / 1000.0)
        return pa.table(cols)

    return out.map_batches(back, batch_format="pyarrow")


def q_cross_corpus_matches(sf_dir: str):
    """Exact cross-corpus contamination: transcript turns whose text is
    byte-identical to a document (broadcast sha map, streaming corpus,
    no shuffle); many-to-many over duplicated doc texts."""
    from raydedup.stages.decontam import cross_corpus_exact_matches

    ts = transcripts_from_documents(sf_dir)
    out = cross_corpus_exact_matches(
        ts.select_columns(["conv_id", "turn_idx", "text"]),
        _docs(sf_dir), ref_key_col="doc_id")
    return out.select_columns(["conv_id", "turn_idx", "ref_doc_id"])


def q_normalize_text(sf_dir: str):
    """All-Arrow-kernel text canonicalization (lower / strip punct /
    collapse whitespace / trim); oracle runs the identical RE2
    expressions."""
    from raydedup.stages.textstats import normalize_text

    return normalize_text(_docs(sf_dir)).select_columns(
        ["doc_id", "norm_text"])


def q_ngram_novelty(sf_dir: str):
    """Per-doc inter-document redundancy: distinct 3-gram count and how
    many of those grams appear in another doc (df >= 2 grams broadcast
    dup-only, corpus streams)."""
    from raydedup.stages.decontam import ngram_novelty

    return ngram_novelty(_docs(sf_dir))


def q_inverted_index(sf_dir: str):
    """Posting lists: term -> comma-joined ascending distinct doc ids +
    document frequency; string postings so string_agg compares exactly."""
    from raydedup.stages.collection import inverted_index

    return inverted_index(_docs(sf_dir))


def q_token_counts(sf_dir: str):
    from raydedup.stages.textstats import token_counts

    return token_counts(_docs(sf_dir)).select_columns(
        ["doc_id", "ws_tokens", "bpe_tokens"]
    )


def q_quality_scores(sf_dir: str):
    from raydedup.stages.textstats import quality_scores

    out = quality_scores(_docs(sf_dir))
    for c in ("stopword_ratio", "punct_ratio", "mean_word_len"):
        out = _round_col(out, c)
    return out.select_columns(
        ["doc_id", "n_chars_q", "n_words", "stopword_ratio", "punct_ratio",
         "mean_word_len"]
    )


def q_ann_topk(sf_dir: str):
    import ray.data

    from raydedup.stages.embeddings import knn_brute

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = knn_brute(emb, query_ids=list(range(10)), k=10)
    return _round_col(out, "cosine").select_columns(
        ["query_id", "neighbor_id", "cosine", "rank"]
    )


def q_ann_topk_ivf(sf_dir: str):
    """IVF coarse-quantizer ANN run with nprobe == n_centroids — exact by
    construction (every cell probed), so the brute-force SQL oracle
    applies; lower nprobe is the documented recall/speed knob."""
    import ray.data

    from raydedup.stages.embeddings import knn_ivf

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = knn_ivf(emb, query_ids=list(range(10)), k=10,
                  n_centroids=16, nprobe=16)
    return _round_col(out, "cosine").select_columns(
        ["query_id", "neighbor_id", "cosine", "rank"]
    )


def q_ann_topk_pq(sf_dir: str):
    """Product-quantization ANN (Jégou et al. 2011): per-subspace
    Euclidean codebooks over a deterministic hash sample, ADC
    inner-product shortlist per batch, EXACT in-batch cosine re-rank,
    knn_brute's merge. Shares the brute-force SQL oracle: the output is
    exact whenever each batch's true top-k lands in its own PQ
    shortlist (shortlist=16·k per batch is the documented recall/speed
    knob — the nprobe analog). The win is COMPUTE: m table lookups
    per vector instead of a d-dim dot for candidate scoring; the
    16-uint8-codes layout is what a persisted PQ index would store —
    this operator recomputes codes per batch and keeps the float
    vectors for the exact re-rank, so resident memory matches
    knn_brute."""
    import ray.data

    from raydedup.stages.embeddings import knn_pq

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = knn_pq(emb, query_ids=list(range(10)), k=10)
    return _round_col(out, "cosine").select_columns(
        ["query_id", "neighbor_id", "cosine", "rank"]
    )


def q_knn_self_join(sf_dir: str):
    """Exact top-3 cosine neighbors for EVERY vector (the all-pairs
    similarity join): blockwise chunk-pair partial top-ks merged by a
    hash-partition sweep — never an n^2 shuffle, never a Python call
    per query id."""
    import ray.data

    from raydedup.stages.embeddings import knn_self_join

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = knn_self_join(emb, k=3, rows_per_chunk=128)
    return _round_col(out, "cosine").select_columns(
        ["query_id", "neighbor_id", "cosine", "rank"]
    )


def q_bm25_topk(sf_dir: str):
    """BM25 top-10 docs for a fixed bag-of-terms query; two streaming
    passes (corpus stats, then vectorized scoring with per-batch
    partial top-k)."""
    from raydedup.stages.textstats import bm25_topk

    out = bm25_topk(_docs(sf_dir), terms=["data", "merge", "window"],
                    k=10)
    return _round_col(out, "bm25", nudge=1e-9)


def q_hard_negatives(sf_dir: str):
    """Top-3 most-similar vectors from a DIFFERENT label per vector —
    the contrastive-training hard-negative mining primitive (knn_self_join
    exchange with same-group pairs masked inside each chunk-pair task)."""
    import ray.data

    from raydedup.stages.embeddings import knn_hard_negatives

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = knn_hard_negatives(emb, k=3, group_col="label",
                             rows_per_chunk=128)
    return _round_col(out, "cosine").select_columns(
        ["query_id", "neighbor_id", "cosine", "rank"]
    )


def q_kmeans_clusters(sf_dir: str):
    """Distributed deterministic Lloyd k-means labels over the embedding
    table (cosine metric, exact order-independent integer partials, 8
    iterations). PERMANENTLY rows-only: an iterative fixed-point loop is
    not SQL-expressible (same class as otmt_lda); determinism,
    partitioning-invariance and planted-cluster recovery are pinned by
    pytest (tests/test_embeddings.py::test_kmeans_*) instead."""
    import ray.data

    from raydedup.stages.embeddings import kmeans_fit

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    _, labels_fn = kmeans_fit(emb, n_clusters=4, iters=6)
    return labels_fn(emb)


def q_quantize_embeddings(sf_dir: str):
    """Absmax int8 quantization summary per vector (scale + exact
    integer sum/min/max of the quantized components — list-free value
    contract; round is half-away on both sides)."""
    import ray.data

    from raydedup.stages.embeddings import quantize_embeddings_stats

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return _round_col(quantize_embeddings_stats(emb), "scale", nudge=1e-9)


def q_embedding_near_pairs(sf_dir: str):
    import ray.data

    from raydedup.stages.embeddings import embedding_near_pairs

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    # exercise the distributed-exact blockwise path (the 100-TB default)
    out = embedding_near_pairs(emb, threshold=0.35, method="blockwise")
    return _round_col(out, "cosine")


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-style embedding dedup: cosine >= 0.35 pairs -> connected
    components -> min-id survivor per component, labels for every vector.
    Oracle re-derives the pairs with list_cosine_similarity and the
    components with a recursive CTE."""
    import ray.data

    from raydedup.stages.embeddings import semantic_dedup

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return semantic_dedup(emb, threshold=0.35, method="blockwise")


def q_dbscan_embeddings(sf_dir: str):
    """Deterministic DBSCAN over the embedding table (cosine eps-ball
    >= 0.35, min_pts=3): core = eps-degree+1 >= min_pts, clusters =
    min-id connected components of the core-core graph, border = min
    core-neighbor cluster, noise = -1. Pairs come from the exact
    blockwise backend (the 100-TB path); components auto-switch
    driver/distributed on edge count (see embeddings.dbscan_embeddings;
    both backends pinned value-equal by pytest)."""
    import ray.data

    from raydedup.stages.embeddings import dbscan_embeddings

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return dbscan_embeddings(emb, threshold=0.35, min_pts=3,
                             method="blockwise")


def _dbscan_embeddings_sql(thr: float = 0.35, min_pts: int = 3) -> str:
    return f"""
        WITH RECURSIVE pairs AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(
                      CAST(a.embedding AS DOUBLE[]),
                      CAST(b.embedding AS DOUBLE[])) >= {thr}
        ),
        edges AS (
            SELECT a_id AS u, b_id AS v FROM pairs
            UNION ALL SELECT b_id, a_id FROM pairs
        ),
        deg AS (SELECT u AS node, COUNT(*) AS c FROM edges GROUP BY u),
        core AS (
            SELECT node AS vec_id FROM deg WHERE c + 1 >= {min_pts}
        ),
        cedges AS (
            SELECT u, v FROM edges
            WHERE u IN (SELECT vec_id FROM core)
              AND v IN (SELECT vec_id FROM core)
        ),
        reach(node, r) AS (
            SELECT vec_id, vec_id FROM core
            UNION
            SELECT reach.node, cedges.v
            FROM reach JOIN cedges ON reach.r = cedges.u
        ),
        clab AS (SELECT node, min(r) AS lab FROM reach GROUP BY node),
        blab AS (
            SELECT e.u AS node, min(c2.lab) AS lab
            FROM edges e JOIN clab c2 ON c2.node = e.v
            WHERE e.u NOT IN (SELECT vec_id FROM core)
            GROUP BY e.u
        )
        SELECT emb.vec_id,
               CASE WHEN cl.node IS NOT NULL THEN cl.lab
                    WHEN bl.node IS NOT NULL THEN bl.lab
                    ELSE -1 END AS cluster_id,
               CASE WHEN cl.node IS NOT NULL THEN 'core'
                    WHEN bl.node IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS kind
        FROM embeddings emb
        LEFT JOIN clab cl ON cl.node = emb.vec_id
        LEFT JOIN blab bl ON bl.node = emb.vec_id
    """


def q_langid(sf_dir: str):
    from raydedup.stages.textstats import detect_language

    return detect_language(_docs(sf_dir)).select_columns(
        ["doc_id", "detected_lang"]
    )


def q_chain_scan_transcripts(sf_dir: str):
    from raydedup.pipelines.neardup import signatures_with_rep
    from raydedup.stages.chain_scan import chain_scan_survivors

    ts = transcripts_from_documents(sf_dir)
    sigs = signatures_with_rep(ts, DEFAULT_CONFIG)
    return chain_scan_survivors(sigs)


def q_long_span_pairs(sf_dir: str):
    from raydedup.stages.exact import add_row_key
    from raydedup.stages.suffix_span import long_span_pairs

    docs = add_row_key(_docs(sf_dir), ["doc_id"])
    return long_span_pairs(docs, DEFAULT_CONFIG)


def q_simhash_near_docs(sf_dir: str):
    from raydedup.pipelines.neardup import signatures_with_rep
    from raydedup.stages.simhash_near import simhash_near_pairs

    assigned = signatures_with_rep(_docs(sf_dir), DEFAULT_CONFIG,
                                   key_cols=["doc_id"])
    reps = assigned.filter(expr="is_rep == True")
    return simhash_near_pairs(reps, DEFAULT_CONFIG)


def q_simhash_calibration(sf_dir: str):
    """Fingerprint-family calibration audit: for every Hamming distance
    h <= simhash_dup_hamming among exact-text reps, how many simhash
    pairs exist and how many are TRUE near-duplicates (word-shingle
    Jaccard >= 0.8, the near_pairs contract) — the table an operator
    reads to pick a simhash radius ('at h <= 4, precision is X').
    One signature pass provides both fingerprints (simhash is
    char-shingle based, config-independent); shingle sets for the
    verify are fetched only for PAIRED keys (pair-bounded broadcast,
    the prepare_training_transcripts precedent); the final reduce is a
    <= h_max+1-row groupby."""
    import ray
    from ray.data.aggregate import Count, Sum

    from raydedup.pipelines.neardup import signatures_with_rep
    from raydedup.stages.simhash_near import simhash_near_pairs

    assigned = signatures_with_rep(
        _docs(sf_dir), SIMPLE_CFG, key_cols=["doc_id"]).materialize()
    reps = assigned.filter(expr="is_rep == True").materialize()
    pairs = simhash_near_pairs(reps, SIMPLE_CFG).materialize()
    empty = pa.table({"hamming": pa.array([], pa.int32()),
                      "n_pairs": pa.array([], pa.int64()),
                      "n_true": pa.array([], pa.int64()),
                      "precision": pa.array([], pa.float64())})
    if pairs.count() == 0:
        import ray.data

        return ray.data.from_arrow(empty)
    keyset: set = set()
    for b in pairs.select_columns(["a_key", "b_key"]).iter_batches(
            batch_size=1 << 16, batch_format="pyarrow"):
        keyset.update(b["a_key"].to_pylist())
        keyset.update(b["b_key"].to_pylist())
    kref = ray.put(pa.array(sorted(keyset), pa.string()))

    def pick(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["row_key"], value_set=ray.get(kref))
        t = b.filter(m)
        return pa.table({"row_key": t["row_key"],
                         "shingle_hashes": t["shingle_hashes"]})

    lut: dict = {}
    for b in reps.map_batches(pick, batch_format="pyarrow").iter_batches(
            batch_size=1 << 14, batch_format="pyarrow"):
        for k, s in zip(b["row_key"].to_pylist(),
                        b["shingle_hashes"].to_pylist()):
            lut[k] = np.unique(np.asarray(s, dtype=np.uint64))
    lref = ray.put(lut)

    def score(b: pa.Table) -> pa.Table:
        lu = ray.get(lref)
        nil = np.empty(0, np.uint64)
        truth = []
        for a, bb in zip(b["a_key"].to_pylist(), b["b_key"].to_pylist()):
            sa, sb = lu.get(a, nil), lu.get(bb, nil)
            c = len(np.intersect1d(sa, sb))
            u = len(sa) + len(sb) - c
            truth.append(int(u > 0 and c / u >= 0.8))
        return pa.table({"hamming": b["hamming"],
                         "t": pa.array(truth, pa.int64())})

    grouped = (pairs.map_batches(score, batch_format="pyarrow")
               .groupby("hamming")
               .aggregate(Count(alias_name="n_pairs"),
                          Sum("t", alias_name="n_true")))

    def finish(b: pa.Table) -> pa.Table:
        npairs = pc.cast(b["n_pairs"], pa.int64())
        ntrue = pc.cast(b["n_true"], pa.int64())
        prec = pc.divide(pc.cast(ntrue, pa.float64()),
                         pc.cast(npairs, pa.float64()))
        return pa.table({"hamming": b["hamming"], "n_pairs": npairs,
                         "n_true": ntrue, "precision": prec})

    return _round_col(grouped.map_batches(finish, batch_format="pyarrow"),
                      "precision")


def q_fingerprints(sf_dir: str):
    from raydedup.stages.textstats import fingerprints

    out = fingerprints(_docs(sf_dir))

    def summarize(batch: pa.Table) -> pa.Table:
        fps = batch["fingerprints"].combine_chunks()
        n = [len(fps[i]) for i in range(len(fps))]
        return pa.table({"doc_id": batch["doc_id"],
                         "n_fingerprints": pa.array(n, type=pa.int64())})

    return out.map_batches(summarize, batch_format="pyarrow")


def q_asof_clicks_purchases(sf_dir: str):
    """As-of join: every click event picks up the user's most recent
    purchase at or before it (sort-merge within per-user groups; ties on
    ts broken by max event_id). Unmatched clicks surface sentinel -1 so
    the value hash is null-free; the oracle is DuckDB's native ASOF LEFT
    JOIN over the identically deduplicated right side."""
    import ray.data

    from raydedup.stages.asof import asof_join

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type", "value"])
    left = (ev.filter(expr="event_type == 'click'")
            .drop_columns(["event_type", "value"]))
    right = ev.filter(expr="event_type == 'purchase'").drop_columns(
        ["event_type"])
    out = asof_join(left, right, by="user_id", on="ts", tie_col="event_id")

    def fill(batch: pa.Table) -> pa.Table:
        for c, v in (("r_event_id", -1), ("r_value", -1.0)):
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(i, c, pc.fill_null(batch[c], v))
        return batch

    return out.map_batches(fill, batch_format="pyarrow").select_columns(
        ["event_id", "user_id", "ts", "r_event_id", "r_value"])


def q_asof_clicks_purchases_bucketed(sf_dir: str):
    """The asof hot-key SCALE path: same join as asof_clicks_purchases
    but partitioned by (key-hash, time-bucket) with the prefix-carry
    pass (time_buckets=8) — the oracle is identical, proving the
    bucketed path bit-matches the default."""
    import ray.data

    from raydedup.stages.asof import asof_join

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type", "value"])
    left = (ev.filter(expr="event_type == 'click'")
            .drop_columns(["event_type", "value"]))
    right = ev.filter(expr="event_type == 'purchase'").drop_columns(
        ["event_type"])
    out = asof_join(left, right, by="user_id", on="ts",
                    tie_col="event_id", time_buckets=8,
                    num_partitions=16)

    def fill(batch: pa.Table) -> pa.Table:
        for c, v in (("r_event_id", -1), ("r_value", -1.0)):
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(i, c, pc.fill_null(batch[c], v))
        return batch

    return out.map_batches(fill, batch_format="pyarrow").select_columns(
        ["event_id", "user_id", "ts", "r_event_id", "r_value"])


def q_range_join_events(sf_dir: str):
    """Range (interval-containment) join: each click joins every purchase
    window [purchase_ts, purchase_ts + 1 day] of the same user —
    many-to-many, inclusive bounds, banded sweep per user group. Oracle
    is a plain BETWEEN join."""
    import ray.data

    from raydedup.stages.asof import interval_join

    base = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["event_id", "ts", "user_id",
                                          "event_type", "value"])
    pts = (base.filter(expr="event_type == 'click'")
           .drop_columns(["event_type", "value"]))

    def mk_iv(b: pa.Table) -> pa.Table:
        end = pc.add(b["ts"], pa.scalar(86400_000_000, pa.duration("us")))
        return pa.table({"user_id": b["user_id"], "start": b["ts"],
                         "end": end, "iv_id": b["event_id"],
                         "iv_value": b["value"]})

    iv = base.filter(expr="event_type == 'purchase'").map_batches(
        mk_iv, batch_format="pyarrow")
    out = interval_join(pts, iv, by="user_id", ts_col="ts",
                        start_col="start", end_col="end")
    return out.select_columns(
        ["event_id", "user_id", "ts", "r_iv_id", "r_iv_value"])


def q_range_join_events_bucketed(sf_dir: str):
    """The interval-join hot-key SCALE path: same join as
    range_join_events but with (key-hash, time-bucket) partitioning and
    bounded interval replication (time_buckets=8) — identical BETWEEN
    oracle proves the bucketed path bit-matches the default."""
    import ray.data

    from raydedup.stages.asof import interval_join

    base = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["event_id", "ts", "user_id",
                                          "event_type", "value"])
    pts = (base.filter(expr="event_type == 'click'")
           .drop_columns(["event_type", "value"]))

    def mk_iv(b: pa.Table) -> pa.Table:
        end = pc.add(b["ts"], pa.scalar(86400_000_000, pa.duration("us")))
        return pa.table({"user_id": b["user_id"], "start": b["ts"],
                         "end": end, "iv_id": b["event_id"],
                         "iv_value": b["value"]})

    iv = base.filter(expr="event_type == 'purchase'").map_batches(
        mk_iv, batch_format="pyarrow")
    out = interval_join(pts, iv, by="user_id", ts_col="ts",
                        start_col="start", end_col="end",
                        time_buckets=8, num_partitions=16)
    return out.select_columns(
        ["event_id", "user_id", "ts", "r_iv_id", "r_iv_value"])


def q_windowed_events(sf_dir: str):
    import ray.data

    from raydedup.stages.windows import tumbling_window_agg

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])
    out = tumbling_window_agg(ev, window_sec=3600)
    out = _round_col(out, "sum_value")
    out = _round_col(out, "mean_value")
    return out.select_columns(
        ["user_id", "window_start", "n_events", "sum_value", "mean_value"]
    )


def q_sliding_window_events(sf_dir: str):
    """Hopping windows (1h window, 15min hop — each event in up to 4
    windows): vectorized bounded fan-out + the same grouped aggregate as
    tumbling. Oracle expands via generate_series."""
    import ray.data

    from raydedup.stages.windows import sliding_window_agg

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])
    out = sliding_window_agg(ev, window_sec=3600, hop_sec=900)
    out = _round_col(out, "sum_value")
    out = _round_col(out, "mean_value")
    return out.select_columns(
        ["user_id", "window_start", "n_events", "sum_value", "mean_value"]
    )


def q_sessionize_events(sf_dir: str):
    import ray.data

    from raydedup.stages.windows import sessionize

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts"])
    return sessionize(ev, gap_sec=1800)


def q_running_qty_per_part(sf_dir: str):
    """Per-key running totals (SUM/COUNT OVER PARTITION BY .. ORDER BY
    .. ROWS UNBOUNDED PRECEDING): cumulative shipped quantity per part
    in shipdate order. l_quantity is integral, so the cast to int64
    makes the running sum exact integer arithmetic on both sides —
    bit-exact parity with the window-function oracle."""
    import ray.data

    from raydedup.stages.ordered import running_totals

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_orderkey", "l_linenumber",
                 "l_shipdate", "l_quantity"])

    def to_int(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("l_quantity")
        return b.set_column(i, "qty", pc.cast(b["l_quantity"], pa.int64()))

    out = running_totals(
        li.map_batches(to_int, batch_format="pyarrow"),
        by="l_partkey",
        order_cols=["l_shipdate", "l_orderkey", "l_linenumber"],
        value_col="qty")
    return out.select_columns(
        ["l_partkey", "l_orderkey", "l_linenumber",
         "running_n", "running_sum"])


def q_running_qty_per_part_bucketed(sf_dir: str):
    """The running-totals hot-key SCALE path: same cumulative quantity
    scan as running_qty_per_part but partitioned by (key-hash,
    shipdate-bucket) with exact prefix-carry offsets (order_buckets=8)
    — identical window oracle proves the two paths bit-match."""
    import ray.data

    from raydedup.stages.ordered import running_totals_bucketed

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_orderkey", "l_linenumber",
                 "l_shipdate", "l_quantity"])

    def to_int(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("l_quantity")
        return b.set_column(i, "qty", pc.cast(b["l_quantity"], pa.int64()))

    out = running_totals_bucketed(
        li.map_batches(to_int, batch_format="pyarrow"),
        by="l_partkey",
        order_cols=["l_shipdate", "l_orderkey", "l_linenumber"],
        value_col="qty", order_buckets=8, num_partitions=16)
    return out.select_columns(
        ["l_partkey", "l_orderkey", "l_linenumber",
         "running_n", "running_sum"])


def q_rolling_order_spend(sf_dir: str):
    """Bounded ROWS-frame window: per-customer trailing-3-order spend in
    orderdate order, money carried in exact integer cents (differences
    of exact prefix sums — bit-exact vs the window oracle)."""
    import ray.data

    from raydedup.stages.ordered import rolling_totals

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        cents = pa.array(np.rint(
            b["o_totalprice"].combine_chunks().to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64))
        i = b.schema.get_field_index("o_totalprice")
        return b.set_column(i, "spend_cents", cents)

    out = rolling_totals(
        orders.map_batches(to_cents, batch_format="pyarrow"),
        by="o_custkey", order_cols=["o_orderdate", "o_orderkey"],
        value_col="spend_cents", window_rows=3)
    return out.select_columns(
        ["o_orderkey", "o_custkey", "rolling_n", "rolling_sum"])


def q_event_gaps(sf_dir: str):
    """Per-user gap to the previous event (ts - lag(ts), microseconds)
    with deterministic (ts, event_id) ordering; first event per user
    surfaces sentinel -1 so the value hash is null-free."""
    import ray.data

    from raydedup.stages.ordered import lag_delta

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id"])
    out = lag_delta(ev, by="user_id", ts_col="ts",
                    tie_cols=["event_id"], out="gap_us")

    def fill(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("gap_us")
        return batch.set_column(
            i, "gap_us", pc.fill_null(batch["gap_us"], -1))

    return out.map_batches(fill, batch_format="pyarrow").select_columns(
        ["event_id", "user_id", "ts", "gap_us"])


def q_event_transitions(sf_dir: str):
    """Markov transition matrix of event types: per-user ordered scan
    (one lexsort per hash partition, no Python call per key) emits
    partial (prev_type, next_type) counts — at most |types|² rows per
    partition — then one tiny grouped sum. The oracle replays it with
    a window lag."""
    import ray.data

    from raydedup.stages.ordered import transition_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    return transition_counts(ev, by="user_id",
                             order_cols=["ts", "event_id"],
                             type_col="event_type")


def q_top_bigrams(sf_dir: str):
    """Global top-50 adjacent-token bigrams (collocation / boilerplate
    phrase profile): vectorized per-batch pair counts, one grouped sum
    over (bigram, n), sort+limit on the aggregated table."""
    from raydedup.stages.collection import top_bigrams

    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    return top_bigrams(docs, k=50)


def q_pmi_bigrams(sf_dir: str):
    """Top-30 collocations by PMI (n_ab >= 5): unigram/bigram count
    Datasets joined distributed (no vocabulary broadcast), scalar
    totals only on the driver, shared nudge+round float contract with
    the oracle."""
    from raydedup.stages.collection import pmi_bigrams

    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    return pmi_bigrams(docs, k=30, min_n=5)


def q_trim_context_window(sf_dir: str):
    """Per-conversation context trimming: keep the latest turns within
    a 60-token budget — reverse running totals via the hash-partitioned
    ordered sweep, then a stateless filter."""
    from raydedup.stages.textstats import trim_context_window

    ts = transcripts_from_documents(sf_dir)
    return trim_context_window(ts, budget=60).select_columns(
        ["conv_id", "turn_idx", "n_tok", "cum_tokens"])


def q_drop_boilerplate_turns(sf_dir: str):
    """Boilerplate-turn removal: drop turns whose exact text occurs in
    >= 2 distinct conversations; the hot-text set stays a Dataset and
    filters through the distributed anti-join."""
    from raydedup.stages.exact import drop_boilerplate_turns

    ts = transcripts_from_documents(sf_dir)
    return drop_boilerplate_turns(ts, min_convs=2).select_columns(
        ["conv_id", "turn_idx", "role"])


def q_training_shards(sf_dir: str):
    """The ship-a-training-set composition: reassemble conversations
    (ordered string_agg sweep) → deterministic hash split, keep train →
    partition-local sequence packing under a 512-token budget. Each
    stage is the already-oracled operator; the composition is what a
    curation run actually executes end-to-end."""
    from raydedup.stages.ordered import assemble_by_key
    from raydedup.stages.textstats import pack_sequences, split_assign

    ts = transcripts_from_documents(sf_dir)
    conv = assemble_by_key(ts, by="conv_id", order_cols=["turn_idx"],
                           text_col="text", sep=" ", out="convo")
    tr = split_assign(conv, key_col="conv_id")

    def keep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "split" not in b.column_names:
            return pa.table({"conv_num": pa.array([], pa.int64()),
                             "convo": pa.array([], pa.string())})
        b = b.filter(pc.equal(b["split"], "train"))
        num = pc.cast(pc.utf8_slice_codeunits(b["conv_id"], 5, 1 << 30),
                      pa.int64())
        return pa.table({"conv_num": num, "convo": b["convo"]})

    return pack_sequences(tr.map_batches(keep, batch_format="pyarrow"),
                          token_budget=512, key_col="conv_num",
                          text_col="convo", num_partitions=4)


def q_train_val_test_split(sf_dir: str):
    """Deterministic hash split (80/10/10): one stateless vectorized
    pass, stable across reruns and group-consistent by key — the split
    every training run needs before packing."""
    from raydedup.stages.textstats import split_assign

    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    return split_assign(docs, key_col="doc_id").select_columns(
        ["doc_id", "split"])


def q_vocab_coverage(sf_dir: str):
    """Vocabulary-coverage curve: minimal most-frequent-first term
    counts covering 50/90/99% of tokens. Corpus reduces to one row per
    distinct frequency value before the driver walk."""
    from raydedup.stages.collection import vocab_coverage

    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    return vocab_coverage(docs)


def q_conversation_stats(sf_dir: str):
    """Per-conversation rollup (turns, per-role turns, total ASCII
    tokens): batch-local C++ group_by partials, then one grouped sum —
    the shuffle carries partial rows, never turn text."""
    from raydedup.stages.stats import conversation_stats

    return conversation_stats(transcripts_from_documents(sf_dir))


def q_token_budget_mix(sf_dir: str):
    """Per-source token-budget data mixing: keep documents, in the
    deterministic md5 sample order, while each source's running ASCII
    token total stays ≤ 700 — the running_totals sweep plus a
    stateless threshold filter; the oracle replays it with a window
    sum over the same UBIGINT hash order."""
    from raydedup.stages.textstats import token_budget_mix

    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "text"])
    return token_budget_mix(docs, budget=700)


def q_transcript_integrity(sf_dir: str):
    """Per-conversation validation gate (turn count, duplicated turn
    indices, empty texts, timestamp monotonicity under the
    deterministic (turn_idx, ts) order) — one lexsort per hash
    partition, stats from segment bincounts."""
    from raydedup.stages.ordered import integrity_stats

    ts = transcripts_from_documents(sf_dir)
    return integrity_stats(ts, by="conv_id", idx_col="turn_idx",
                           ts_col="ts", text_col="text")


def q_prefix_dup_groups(sf_dir: str):
    """Boilerplate-head dedup: documents sharing the identical first-10
    normalized tokens group under the min doc_id (crawl mirrors /
    template farms — the near-exact pass between sha dedup and
    MinHash). Bounded prefix key → bounded shuffle rows; groups resolve
    per hash partition with one C++ group_by."""
    from raydedup.stages.prefix import prefix_dup_groups

    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return prefix_dup_groups(docs, w=10)


# mixing weights for stratified_sample_docs — thresholds are computed
# ONCE here so the engine and the SQL oracle share the exact integers
_STRAT_RATES = {"en": 0.5, "de": 1.0, "es": 0.25, "zh": 0.1, "fr": 0.05}
_STRAT_DEFAULT = 0.0


def q_stratified_sample_docs(sf_dir: str):
    """Per-language deterministic mixing-weight sampler (keep 100% of
    scarce German, 10% of Chinese, ...): the md5 keep-rule of
    sample_docs with a per-group threshold looked up from a broadcast
    rate map. The oracle recomputes the identical rule with a CASE."""
    from raydedup.stages.textstats import stratified_sample

    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang"])
    docs = docs.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("doc_id"), "doc_id",
            pc.cast(b["doc_id"], pa.string())),
        batch_format="pyarrow")
    return stratified_sample(docs, "lang", "doc_id", _STRAT_RATES,
                             default_rate=_STRAT_DEFAULT)


def _stratified_sql() -> str:
    cases = " ".join(
        f"WHEN '{g}' THEN {int(r * (1 << 60))}"
        for g, r in _STRAT_RATES.items())
    return f"""
        SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang
        FROM documents
        WHERE CAST(('0x' || substr(
                  md5('s0:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS UBIGINT)
              < CASE lang {cases}
                ELSE {int(_STRAT_DEFAULT * (1 << 60))} END
    """


def q_distinct_users_per_type(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type: per-batch distinct
    pairs → keyed dedup groupby → partial-count merge (the shuffle
    carries distinct pairs, never raw rows)."""
    import ray.data

    from raydedup.stages.stats import distinct_count_by_group

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    return distinct_count_by_group(ev, "event_type", "user_id")


def q_latest_event_per_user(sf_dir: str):
    """Keep-newest-per-key (snapshot dedup — the keep-latest-memento /
    keep-newest-page-version curation rule): per user, the most recent
    event, ties to the smallest event_id. Reuses the partial-top-k
    combiner over epoch-microseconds."""
    import ray.data

    from raydedup.stages.textstats import topk_by_group

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts"])

    def to_us(b: pa.Table) -> pa.Table:
        return b.append_column(
            "ts_us", pc.cast(b["ts"], pa.int64()))

    out = topk_by_group(ev.map_batches(to_us, batch_format="pyarrow"),
                        "user_id", "event_id", "ts_us", k=1)
    return out.select_columns(["user_id", "event_id", "ts_us"])


def q_rollup_chars_by_source(sf_dir: str):
    """GROUPING SETS shape: per-source row counts + char sums AND the
    grand total in one pass (each batch emits its partials under both
    the real key and the '__all__' sentinel; one keyed merge)."""
    import ray.data

    from raydedup.stages.stats import rollup_counts

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "n_chars"])
    return rollup_counts(docs, "source", "n_chars")


def q_corr_qty_price_by_flag(sf_dir: str):
    """Exact grouped Pearson correlation: quantity vs whole-dollar
    price per returnflag. All six moments accumulate as exact int64, so
    the final float formula runs on identical operands both sides."""
    import ray.data

    from raydedup.stages.stats import grouped_corr

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def quantize(b: pa.Table) -> pa.Table:
        from raydedup.util import round_half_away

        q = b["l_quantity"].combine_chunks().to_numpy(
            zero_copy_only=False)
        p = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False)
        # whole dollars, exact half-away (DuckDB round parity; see
        # util.round_half_away for why floor(|x|+0.5) is wrong);
        # cents squared would overflow the int64 moments
        qty = pa.array(round_half_away(q).astype(np.int64))
        dollars = pa.array(round_half_away(p).astype(np.int64))
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "qty": qty, "dollars": dollars})

    out = grouped_corr(li.map_batches(quantize, batch_format="pyarrow"),
                       "l_returnflag", "qty", "dollars")
    return _round_col(out, "corr")


def q_length_histogram_by_source(sf_dir: str):
    """Fixed-bin length histogram per source (distribution profiling):
    20 bins over [0, 600), out-of-range clamped to edge bins; exact
    counts vs a floor-arithmetic oracle."""
    import ray.data

    from raydedup.stages.stats import histogram_by_group

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "n_chars"])
    return histogram_by_group(docs, "source", "n_chars",
                              lo=0, hi=600, nbins=20)


def q_mode_event_type_per_user(sf_dir: str):
    """Per-group mode: each user's most frequent event type (ties to
    the smallest value — SQL mode() leaves ties unspecified, so the
    oracle uses a row_number window with the same rule). Shuffle
    carries distinct (user, type, count) partials only."""
    import ray.data

    from raydedup.stages.stats import mode_by_group

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return mode_by_group(ev, "user_id", "event_type")


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped scan→partial-aggregate→merge over lineitem with
    exact integer-cents money math (bit-exact vs the SQL oracle; see
    stages/relational.py). Shuffle carries O(groups) rows only."""
    import ray.data

    from raydedup.stages.relational import pricing_summary

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])
    return pricing_summary(li, cutoff_days=90)


def q_revenue_by_nation(sf_dir: str):
    """TPC-H Q5-shaped pipeline: distributed lineitem⋈orders hash join
    (pre-join projection + date predicate), customer⋈nation⋈region dim
    chain collapsed to one broadcast custkey→nation lookup, exact
    integer revenue sums."""
    import datetime

    import ray.data

    from raydedup.stages.relational import revenue_by_nation

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"])
    nat = ray.data.read_parquet(f"{sf_dir}/nation.parquet")
    reg = ray.data.read_parquet(f"{sf_dir}/region.parquet")
    return revenue_by_nation(
        li, orders, cust, nat, reg, region_name="ASIA",
        date_lo=datetime.datetime(1996, 1, 1),
        date_hi=datetime.datetime(1998, 1, 1))


def q_filtered_revenue(sf_dir: str):
    """TPC-H Q6-shaped forecast-revenue scan: one pruned pass, no join;
    per-batch one-row partials merged by a constant-key groupby.
    Discount band tested in exact integer cents."""
    import datetime

    import ray.data

    from raydedup.stages.relational import filtered_revenue

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_quantity", "l_extendedprice",
                 "l_discount"])
    return filtered_revenue(li,
                            date_lo=datetime.datetime(1997, 1, 1),
                            date_hi=datetime.datetime(1998, 1, 1),
                            disc_lo_cents=2, disc_hi_cents=6,
                            qty_below=25.0)


def q_top_unshipped_orders(sf_dir: str):
    """TPC-H Q3-shaped shipping-priority report: segment-customer
    filter (broadcast custkeys / distributed semi-join auto-switch),
    pruned lineitem⋈orders hash join, per-batch partial aggregation,
    top-10 by exact integer revenue."""
    import datetime

    import ray.data

    from raydedup.stages.relational import top_unshipped_orders

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    return top_unshipped_orders(li, orders, cust, segment="BUILDING",
                                cutoff=datetime.datetime(1998, 6, 1),
                                k=10)


def q_cluster_size_histogram(sf_dir: str):
    """Exact-dup cluster-size distribution over documents: distinct-text
    counts shuffle sha keys only; the histogram moves one row per
    duplicated text then one per size."""
    from raydedup.stages.exact import cluster_size_histogram

    return cluster_size_histogram(_docs(sf_dir))


def q_exact_dup_rate_by_source(sf_dir: str):
    """Per-source exact-duplicate scorecard (rows, uniques, dup rows,
    dup fraction) — dup_frac divides the same exact int64s as the SQL
    oracle."""
    import ray.data

    from raydedup.stages.exact import dup_rate_by_group

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "text"])
    return dup_rate_by_group(docs, group_col="source")


_PIVOT_CATS = ["click", "purchase", "view", "signup"]


def q_pivot_event_counts(sf_dir: str):
    """Warehouse PIVOT: per-user COUNT columns per event type ('error'
    deliberately unlisted → lands in n_other). Batches collapse to one
    row per present user before the shuffle; counts are exact ints."""
    import ray.data

    from raydedup.stages.relational import pivot_counts

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return pivot_counts(ev, "user_id", "event_type", _PIVOT_CATS)


def q_assemble_conversations(sf_dir: str):
    """Ordered per-group string assembly (string_agg ... ORDER BY):
    reconstruct each conversation from its turn rows — one vectorized
    binary_join over segment-offset lists per partition."""
    from raydedup.stages.ordered import assemble_by_key

    ts = transcripts_from_documents(sf_dir)
    return assemble_by_key(ts, by="conv_id", order_cols=["turn_idx"],
                           text_col="text", sep=" ", out="convo")


def q_customers_without_recent_orders(sf_dir: str):
    """Distributed anti-join (NOT EXISTS): customers with no order in
    1996 — right side reduces to distinct keys per batch, both sides
    hash-partition, one vectorized membership test per partition."""
    import ray.data

    from raydedup.stages.relational import semi_join

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_orderdate"])

    def rekey(b: pa.Table) -> pa.Table:
        import datetime

        m = pc.and_(
            pc.greater_equal(b["o_orderdate"],
                             pa.scalar(datetime.datetime(1996, 1, 1))),
            pc.less(b["o_orderdate"],
                    pa.scalar(datetime.datetime(1997, 1, 1))))
        return pa.table({"c_custkey": b.filter(m)["o_custkey"]})

    right = orders.map_batches(rekey, batch_format="pyarrow")
    return semi_join(cust, right, on="c_custkey", anti=True)


def q_label_centroids(sf_dir: str):
    """Per-label centroid sums (64 dims): components quantize to exact
    micro-unit int64 sums — bit-exact under any accumulation order, so
    the sums (not the derived float means, which sit on decimal
    rounding boundaries for small n) are the value-compared contract."""
    import ray.data

    from raydedup.stages.embeddings import label_centroids

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["label", "embedding"])
    out = label_centroids(emb, dims=64)
    return out.select_columns(
        ["label", "n"] + [f"s{i}" for i in range(64)])


def _label_centroids_sql() -> str:
    comps = ",\n                   ".join(
        f"CAST(sum(CAST(round("
        f"CAST(embedding[{i + 1}] AS DOUBLE) * 1000000, 0)"
        f" AS BIGINT)) AS BIGINT) AS s{i}"
        for i in range(64))
    return f"""
        SELECT label, count(*) AS n,
               {comps}
        FROM embeddings GROUP BY label
    """


def q_label_centroid_similarity(sf_dir: str):
    """Embedding-space class-overlap matrix: pairwise cosine between
    per-label centroids, computed over EXACT integer sum vectors (the
    n divisor cancels out of cosine) so the HUGEINT SQL oracle
    reproduces it bit-for-bit (see embeddings.label_centroid_similarity)."""
    import ray.data

    from raydedup.stages.embeddings import label_centroid_similarity

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["label", "embedding"])
    return _round_tbl(label_centroid_similarity(emb, dims=64), "cosine")


def _label_centroid_similarity_sql() -> str:
    dot = " + ".join(f"CAST(a.s{i} AS HUGEINT) * b.s{i}"
                     for i in range(64))
    na = " + ".join(f"CAST(a.s{i} AS HUGEINT) * a.s{i}"
                    for i in range(64))
    nb = " + ".join(f"CAST(b.s{i} AS HUGEINT) * b.s{i}"
                    for i in range(64))
    return f"""
        WITH cent AS ({_label_centroids_sql()}),
        p AS (
            SELECT CAST(a.label AS BIGINT) AS label_a,
                   CAST(b.label AS BIGINT) AS label_b,
                   ({dot}) AS dot, ({na}) AS naq, ({nb}) AS nbq
            FROM cent a JOIN cent b ON a.label < b.label)
        SELECT label_a, label_b,
               round(CAST(dot AS DOUBLE)
                     / (sqrt(CAST(naq AS DOUBLE))
                        * sqrt(CAST(nbq AS DOUBLE))), {_ROUND}) AS cosine
        FROM p WHERE naq > 0 AND nbq > 0
    """


def q_cross_corpus_matches_bloom(sf_dir: str):
    """Exact cross-corpus contamination via the BLOOM scale path (ref
    side never collected: distributed tree-OR bloom build, bounded bits
    broadcast, streaming probe, sparse sha join kills false positives)
    — bit-identical output to cross_corpus_matches, shared oracle."""
    from raydedup.stages.decontam import cross_corpus_matches_bloom

    ts = transcripts_from_documents(sf_dir)
    out = cross_corpus_matches_bloom(
        ts.select_columns(["conv_id", "turn_idx", "text"]),
        _docs(sf_dir), ref_key_col="doc_id", m_bits=1 << 16)
    return out.select_columns(["conv_id", "turn_idx", "ref_doc_id"])


def q_remove_dup_spans(sf_dir: str):
    """Long-span duplicate REMOVAL (Lee et al. 2022): every verbatim
    span >= min_span_chars shared by two turns survives only in the
    smallest row_key; all occurrences of the pair's canonical span are
    cut from the other row. ROWS-ONLY by necessity: the span content
    comes out of a suffix-array longest-common-substring pass, which is
    not SQL-expressible; value-level correctness is covered by the
    brute-force pytest oracle (test_spans_multimodal.py — planted
    spans, exact length reconciliation, LCS-vs-DP parity fuzz)."""
    from raydedup.stages.exact import add_row_key
    from raydedup.stages.suffix_span import remove_dup_spans

    ts = add_row_key(transcripts_from_documents(sf_dir),
                     ["conv_id", "turn_idx"])
    return remove_dup_spans(ts.select_columns(["row_key", "text"]),
                            DEFAULT_CONFIG, key_col="row_key")


_MIX_WEIGHTS = {"src0": 2.5, "src1": 3.0, "src2": 0.25, "src3": 0.0}


def q_upsample_mix(sf_dir: str):
    """Fractional source-weight mixing (the LLM data-recipe step):
    src0 ×2.5, src1 ×3, src2 ×0.25, src3 dropped, everything else ×1.
    floor(w) deterministic copies per row plus one md5-hash-gated extra
    for the fractional part — reruns and resumes mix identically."""
    import ray.data

    from raydedup.stages.textstats import upsample_by_weight

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])
    return upsample_by_weight(docs, "source", _MIX_WEIGHTS,
                              key_col="doc_id", default=1.0, seed="mix0")


def _upsample_mix_sql() -> str:
    import math

    base = " ".join(
        f"WHEN '{g}' THEN {int(math.floor(w))}"
        for g, w in _MIX_WEIGHTS.items())
    thr = " ".join(
        f"WHEN '{g}' THEN {int((w - math.floor(w)) * (1 << 60))}"
        for g, w in _MIX_WEIGHTS.items())
    maxn = max(int(math.floor(w)) + (1 if w != math.floor(w) else 0)
               for w in list(_MIX_WEIGHTS.values()) + [1.0])
    return f"""
        SELECT doc_id, source, gs.rep
        FROM (
          SELECT doc_id, source,
                 (CASE source {base} ELSE 1 END
                  + CASE WHEN CAST(('0x' || substr(
                        md5('mix0:' || CAST(doc_id AS VARCHAR)), 1, 15))
                      AS UBIGINT)
                      < (CASE source {thr} ELSE 0 END)
                    THEN 1 ELSE 0 END) AS ncopies
          FROM documents) t
        JOIN generate_series(0, {maxn - 1}) AS gs(rep)
          ON gs.rep < t.ncopies
    """


def q_prototype_prune(sf_dir: str):
    """D4-style prototypicality pruning: within each label drop the
    floor(0.25·n) vectors most similar to the label centroid; survivors
    carry their centroid cosine. Every score operand is an exact
    integer (micro-quantized components, exact int sums), so the
    float64 scores — and therefore the per-label ranks — are
    bit-identical to the SQL oracle's."""
    import ray.data

    from raydedup.stages.embeddings import prototype_prune

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "label", "embedding"])
    return prototype_prune(emb, dims=64, prune_frac=0.25)


def _prototype_prune_sql() -> str:
    qcols = ",\n             ".join(
        f"CAST(round(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000, 0)"
        f" AS BIGINT) AS q{i}" for i in range(64))
    scols = ",\n             ".join(
        f"CAST(sum(q{i}) AS BIGINT) AS s{i}" for i in range(64))
    dot = " + ".join(f"q{i} * s{i}" for i in range(64))
    xn = " + ".join(f"q{i} * q{i}" for i in range(64))
    sn = " + ".join(f"CAST(s{i} AS HUGEINT) * s{i}" for i in range(64))
    return f"""
        WITH q AS (
          SELECT vec_id, label,
             {qcols}
          FROM embeddings
        ),
        sums AS (
          SELECT label, count(*) AS n,
             {scols}
          FROM q GROUP BY label
        ),
        scored AS (
          SELECT q.vec_id, q.label, s.n AS nl,
                 ({dot}) AS dot,
                 ({xn}) AS xnormsq,
                 ({sn}) AS snormsq
          FROM q JOIN sums s USING (label)
        ),
        sc2 AS (
          SELECT vec_id, label, nl,
                 CASE WHEN xnormsq = 0 OR snormsq = 0 THEN 0.0
                      ELSE CAST(dot AS DOUBLE)
                           / sqrt(CAST(xnormsq AS DOUBLE))
                           / sqrt(CAST(snormsq AS DOUBLE)) END
                     AS proto_score
          FROM scored
        )
        SELECT vec_id, label, proto_score
        FROM (SELECT *, row_number() OVER (
                 PARTITION BY label
                 ORDER BY proto_score DESC, vec_id) AS rk
              FROM sc2)
        WHERE rk > CAST(floor(nl * 0.25) AS BIGINT)
    """


def q_chunk_documents(sf_dir: str):
    """Context-window chunking: 200-char windows every 150 chars
    (overlapping), one row per chunk — the pre-tokenization step for
    long documents. Oracle recomputes with substr arithmetic."""
    from raydedup.stages.textstats import chunk_text

    return chunk_text(_docs(sf_dir), size=200, stride=150)


def q_session_stats(sf_dir: str):
    """Per-session aggregates (count + duration) computed in the same
    single per-key scan sessionize uses — no join back to raw events;
    exact integer seconds."""
    import ray.data

    from raydedup.stages.windows import session_stats

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts"])
    return session_stats(ev, gap_sec=1800)


def q_trim_length_outliers(sf_dir: str):
    """Percentile-based outlier trimming (curation): keep documents
    whose length sits within the per-source [p5, p95] band. The exact
    per-group percentiles are a tiny result — broadcast once, then a
    streaming filter; at 100 TB this is one counting-merge aggregate
    plus one stateless pass."""
    import ray

    import ray.data

    from raydedup.stages.stats import grouped_quantiles

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source", "n_chars"])
    bounds = grouped_quantiles(docs, "source", "n_chars", [0.05, 0.95])
    bmap = {r["source"]: (r["p5"], r["p95"])
            for r in bounds.take_all()}
    ref = ray.put(bmap)

    def keep(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        src = b["source"].to_pylist()
        n = b["n_chars"].to_numpy(zero_copy_only=False)
        lo = np.array([m[s][0] if s in m else 1 for s in src])
        hi = np.array([m[s][1] if s in m else 0 for s in src])
        return b.filter(pa.array((n >= lo) & (n <= hi)))

    return docs.map_batches(keep, batch_format="pyarrow")


def q_multimodal_decode(sf_dir: str):
    """REAL image decode: genuine PPM payloads (closed-form content per
    doc_id) parsed by the numpy codec; the oracle recomputes width /
    height / pixel checksum from doc_id alone."""
    from raydedup.stages.multimodal import attach_synthetic_images, decode_images

    decoded = decode_images(attach_synthetic_images(_docs(sf_dir)))
    return decoded.select_columns(
        ["doc_id", "media_type", "meta_w", "meta_h", "pix_sum"]
    )


def q_funnel_click_purchase(sf_dir: str):
    """Per-user first click -> first purchase within 24 h (funnel
    conversion): two keyed groupby-mins around one hash join on the
    pre-filtered purchase rows."""
    import ray.data

    from raydedup.stages.windows import first_conversion

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"])
    return first_conversion(ev, "click", "purchase", within_sec=86400)


def q_cumulative_distinct_users(sf_dir: str):
    """Distinct-users-to-date growth curve via the shuffleable
    first-seen decomposition (min day per user -> count per day ->
    prefix sum over calendar-bounded day rows)."""
    import ray.data

    from raydedup.stages.stats import cumulative_distinct

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    return cumulative_distinct(ev, key_col="user_id", ts_col="ts")


def q_multimodal_resize(sf_dir: str):
    """REAL decode → nearest RESIZE → integer channel feature extract:
    genuine PPM payloads (closed-form pixels per doc_id), resized to
    16×16 with the same floor-division index rule the oracle replays in
    SQL (generate_series over the output raster), per-channel sums
    bit-exact."""
    from raydedup.stages.multimodal import attach_synthetic_images, image_features

    out = image_features(attach_synthetic_images(_docs(sf_dir)),
                         resize_to=(16, 16))
    return out.select_columns(
        ["doc_id", "out_w", "out_h", "pix_sum", "r_sum", "g_sum", "b_sum"]
    )


def q_multimodal_frames(sf_dir: str):
    """REAL video frame sampling: genuine uncompressed-AVI payloads
    (closed-form frames per doc_id) parsed by the pure-numpy RIFF
    walker; every 2nd frame is emitted with its pixel checksum, and
    the oracle recomputes (frame_idx, w, h, frame_sum) from doc_id
    alone."""
    from raydedup.stages.multimodal import (
        attach_synthetic_videos,
        sample_video_frames,
    )

    return sample_video_frames(
        attach_synthetic_videos(_docs(sf_dir)), every_n=2, id_col="doc_id"
    )


def q_image_dup_groups(sf_dir: str):
    """Perceptual IMAGE dedup (dHash) over REAL decoded PPM payloads
    with planted brightness-variant duplicates: every payload is
    decoded by the numpy codec, difference-hashed (9×8 grayscale
    downsample → 64 adjacent-comparison bits), and rows with identical
    hashes cluster (label = min doc_id). Brightness variants of one
    image share a cluster — dHash is provably invariant to a uniform
    shift — while a byte checksum would scatter them. The oracle
    replays every hash bit closed-form from doc_id alone, so the real
    decoder + hash kernel are value-checked end-to-end."""
    import ray.data

    from raydedup.stages.multimodal import (
        attach_synthetic_image_variants,
        image_dup_groups,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"],
                                 override_num_blocks=64)
    return image_dup_groups(attach_synthetic_image_variants(docs))


def q_image_near_dup_pairs(sf_dir: str):
    """Perceptual image NEAR-dup pairs: the spot-perturbed variant
    corpus plants images 1-2 dHash bits away from their clean group
    (a single white pixel at a sampled grid cell), and the engine finds
    every representative pair with hamming <= 6 via the EXACT pigeonhole
    block search after collapsing identical hashes. The oracle replays
    the hashes closed-form from doc_id and brute-forces pairwise
    bit_count(xor) over the distinct-hash representatives, so both the
    candidate generation (no missed pair) and the verify (no spurious
    pair, exact hamming) are value-gated."""
    import ray.data

    from raydedup.stages.multimodal import (
        attach_synthetic_image_variants,
        image_near_dup_pairs,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"],
                                 override_num_blocks=64)
    return image_near_dup_pairs(
        attach_synthetic_image_variants(docs, spot_from=4), hamming_max=6)


def q_audio_dup_groups(sf_dir: str):
    """Perceptual AUDIO dedup over REAL decoded WAV payloads with
    planted volume-variant duplicates: every payload passes through the
    RIFF/PCM16 decoder, gets a sign-of-energy-delta fingerprint (frame
    energies, 32 comparison bits — the 1-D analogue of dHash), and rows
    with identical fingerprints cluster (label = min doc_id). Volume
    variants of one recording share a cluster — positive amplitude
    scaling multiplies every frame energy equally — while a byte
    checksum would scatter them. The oracle replays every sample value
    closed-form from doc_id alone."""
    import ray.data

    from raydedup.stages.multimodal import (
        attach_synthetic_audio_variants,
        audio_dup_groups,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"],
                                 override_num_blocks=64)
    return audio_dup_groups(attach_synthetic_audio_variants(docs))


def q_video_dup_groups(sf_dir: str):
    """Perceptual VIDEO dedup over REAL AVI payloads with planted
    brightness-variant duplicates: the RIFF walker extracts every
    uncompressed DIB frame, each frame is dHashed, and the ORDERED
    per-frame hash sequence is the identity key (re-cut or reversed
    clips do not collapse). Brightness variants of one clip share a
    cluster. The oracle replays every frame's hash bits closed-form
    from doc_id and rebuilds the same ordered key via string_agg."""
    import ray.data

    from raydedup.stages.multimodal import (
        attach_synthetic_video_variants,
        video_dup_groups,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"],
                                 override_num_blocks=64)
    return video_dup_groups(attach_synthetic_video_variants(docs))


def q_image_near_dup_clusters(sf_dir: str):
    """Unified perceptual image CLUSTERING over the spot-perturbed
    corpus: exact tier (identical dHash → representative) ∪ near tier
    (hamming <= 6 pairs among representatives) → connected components →
    per-row label = min doc_id of the component. The image analogue of
    the flagship text cascade (exact dedup → LSH pairs → union-find);
    the oracle replays the hashes closed-form and walks the same pair
    graph with a recursive reachability CTE."""
    import ray.data

    from raydedup.stages.multimodal import (
        attach_synthetic_image_variants,
        image_near_dup_clusters,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"],
                                 override_num_blocks=64)
    return image_near_dup_clusters(
        attach_synthetic_image_variants(docs, spot_from=4), hamming_max=6)


def q_audio_near_dup_pairs(sf_dir: str):
    """Perceptual audio NEAR-dup pairs: the spiked variant corpus
    (one frame's amplitude doubled on variants v >= 4 of the
    64-frame/63-bit fingerprint corpus) plants clips 1-2 energy-delta
    bits away from their clean group, and the engine finds every
    representative pair with hamming <= 4 via the EXACT pigeonhole
    block search after collapsing identical fingerprints — the audio
    analogue of image_near_dup_pairs (localized loudness burst vs
    global volume change). The oracle replays every sample closed-form
    from doc_id and brute-forces bit_count(xor) over the distinct-
    fingerprint representatives, so candidate generation and verify
    are both value-gated."""
    import ray.data

    from raydedup.stages.multimodal import (
        attach_synthetic_audio_variants,
        audio_near_dup_pairs,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"],
                                 override_num_blocks=64)
    return audio_near_dup_pairs(
        attach_synthetic_audio_variants(docs, n_frames=64, spike_from=4),
        hamming_max=4)


def q_audio_near_dup_clusters(sf_dir: str):
    """Unified perceptual audio CLUSTERING over the spiked corpus:
    exact tier (identical fingerprint → representative) ∪ near tier
    (hamming <= 4 pairs among representatives) → connected components →
    per-row label = min doc_id of the component — the audio analogue of
    image_near_dup_clusters, recursive-reachability oracle over the
    closed-form fingerprint replay."""
    import ray.data

    from raydedup.stages.multimodal import (
        attach_synthetic_audio_variants,
        audio_near_dup_clusters,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"],
                                 override_num_blocks=64)
    return audio_near_dup_clusters(
        attach_synthetic_audio_variants(docs, n_frames=64, spike_from=4),
        hamming_max=4)


def q_video_near_dup_pairs(sf_dir: str):
    """RE-CUT video detection over the recut variant corpus (v == 4
    reverses the frame order — same frame set, different ordered key;
    v > 4 drops the last frame — set-Jaccard (nf-1)/nf): representative
    pairs whose distinct per-frame dHash SETS overlap with Jaccard >=
    0.5, found by the EXACT prefix-filter AllPairs join over the
    frame-hash universe (stages/setjoin.set_similarity_join_sets) after
    the ordered-key exact collapse. The oracle replays every frame hash
    closed-form from doc_id, rebuilds the ordered keys (reversed
    string_agg for the re-cut variant), collapses identical cuts and
    brute-forces set intersections over the representatives — exact
    candidate generation AND exact verify are both value-gated."""
    import ray.data

    from raydedup.stages.multimodal import (
        attach_synthetic_video_variants,
        video_near_dup_pairs,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"],
                                 override_num_blocks=64)
    return _round_col(
        video_near_dup_pairs(
            attach_synthetic_video_variants(docs, recut_from=4),
            threshold=0.5),
        "jaccard")


def q_audio_shift_near_dup_pairs(sf_dir: str):
    """TIME-SHIFT-robust audio near-dup pairs over the trim+volume
    corpus (variant v cuts the first v frames AND scales amplitude —
    the avalanche-hash frame levels make each group's delta-bit stream
    effectively random, so only true trims overlap): representative
    pairs (one rep per distinct delta-bit STREAM — volume variants of
    one cut collapse exactly) whose overlapping 16-bit window-word SETS
    have Jaccard >= 0.6, via the exact prefix-filter AllPairs join —
    the audio twin of video re-cut detection, catching what the packed
    single-fingerprint hamming tier provably cannot (a trim shifts
    every bit position). The oracle replays the samples closed-form
    from doc_id, rebuilds streams/windows in SQL, and brute-forces set
    intersections over the representatives."""
    import ray.data

    from raydedup.stages.multimodal import (
        attach_synthetic_audio_trims,
        audio_shift_near_dup_pairs,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"],
                                 override_num_blocks=64)
    return _round_col(
        audio_shift_near_dup_pairs(
            attach_synthetic_audio_trims(docs), threshold=0.6),
        "jaccard")


def q_multimodal_dup_clusters(sf_dir: str):
    """UNIFIED CROSS-MODAL dedup clusters: connected components over the
    union of every PERCEPTUAL duplicate-evidence family — image exact ∪
    image hamming ≤ 6 pairs ∪ audio exact ∪ audio hamming ≤ 4 pairs ∪
    video ordered-key exact ∪ video frame-set Jaccard ≥ 0.5 pairs —
    'collapse any row any perceptual detector flags in ANY modality',
    the multimodal twin of unified_dedup_clusters. Composed as ONE
    incremental merge: the image clustering supplies the standing
    labeling and merge_components contracts the UNION of the audio
    label edges, the video label edges and the video re-cut pairs
    against it (min-label associativity ≡ the chained per-family
    merges at one repaint join instead of three). Evidence
    differs genuinely per modality on this corpus (audio's fingerprint
    space merges some planted groups the image/video spaces keep
    apart), so the unified labels match no single modality's. Oracle:
    one recursive reach over the union of all six edge CTEs."""
    import ray.data

    from raydedup.stages.multimodal import (
        attach_synthetic_audio_variants,
        attach_synthetic_image_variants,
        attach_synthetic_video_variants,
        audio_near_dup_clusters,
        image_near_dup_clusters,
        video_dup_groups,
        video_near_dup_pairs,
    )
    from raydedup.state.unionfind import merge_components

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"],
                                 override_num_blocks=64)

    def pad2(b: pa.Table, a: str, c: str, na: str, nc: str) -> pa.Table:
        return pa.table({
            na: pa.array([f"{int(x):020d}" for x in b[a].to_pylist()],
                         pa.string()),
            nc: pa.array([f"{int(x):020d}" for x in b[c].to_pylist()],
                         pa.string()),
        })

    img = image_near_dup_clusters(
        attach_synthetic_image_variants(docs, spot_from=4), hamming_max=6)
    labels = img.map_batches(
        lambda b: pad2(b, "doc_id", "img_cluster", "node", "label"),
        batch_format="pyarrow")
    aud = audio_near_dup_clusters(
        attach_synthetic_audio_variants(docs, n_frames=64, spike_from=4),
        hamming_max=4).map_batches(
        lambda b: pad2(b, "doc_id", "audio_cluster", "a_key", "b_key"),
        batch_format="pyarrow")
    vid = video_dup_groups(
        attach_synthetic_video_variants(docs, recut_from=4)).map_batches(
        lambda b: pad2(b, "doc_id", "video_cluster", "a_key", "b_key"),
        batch_format="pyarrow")
    vpairs = video_near_dup_pairs(
        attach_synthetic_video_variants(docs, recut_from=4),
        threshold=0.5).map_batches(
        lambda b: pad2(b, "a_id", "b_id", "a_key", "b_key"),
        batch_format="pyarrow")

    # one label-graph contraction over the union of the audio, video
    # and re-cut edge families (min-label associativity — the
    # unified_dedup_clusters idiom): one repaint join instead of three
    merged = merge_components(labels, aud.union(vid).union(vpairs))
    return merged.map_batches(
        lambda b: pa.table({
            "doc_id": pc.cast(b["node"], pa.int64()),
            "mm_cluster": pc.cast(b["label"], pa.int64()),
        }),
        batch_format="pyarrow")


def q_set_sim_pairs_docs(sf_dir: str):
    """EXACT all-pairs shingle-set Jaccard >= 0.5 via prefix filtering
    (AllPairs/PPJoin — Bayardo et al. 2007, Xiao et al. 2008): the
    deterministic counterpart of the MinHash-LSH candidate path, recall
    exactly 1.0 at the threshold by construction. The oracle recomputes
    brute-force shingle-set Jaccard in SQL, so any missed or spurious
    pair fails the value gate."""
    from raydedup.stages.setjoin import set_similarity_self_join

    return _round_col(
        set_similarity_self_join(_docs(sf_dir), 0.5, SIMPLE_CFG),
        "jaccard")


def q_idf_weighted_near_pairs(sf_dir: str):
    """Rarity-aware RE-SCORING of the verified near-dup pairs:
    idf_jaccard = Σ idf(shared shingles) / Σ idf(union shingles), idf =
    ln(N_reps / df). Separates pairs glued by corpus-hot boilerplate
    (idf ≈ 0 → score collapses) from pairs sharing DISTINCTIVE content —
    the over-merge diagnosis complement of cluster cohesion. Hash-skinny
    and pair-sparse throughout: df is one counting groupby over rep
    shingle hashes, idf sums touch only PAIRED keys
    (stages/setjoin.py:idf_weighted_rescore). Float-sum contract as in
    the cosine measure (identical ln/division shape both sides, final
    round)."""
    from raydedup.pipelines.neardup import near_dup_pairs, signatures_with_rep
    from raydedup.stages.setjoin import idf_weighted_rescore

    assigned = signatures_with_rep(
        _docs(sf_dir), SIMPLE_CFG, key_cols=["doc_id"]).materialize()
    pairs = near_dup_pairs(assigned, SIMPLE_CFG)
    reps = assigned.filter(expr="is_rep").select_columns(
        ["row_key", "shingle_hashes"])
    return _round_col(idf_weighted_rescore(pairs, reps), "idf_jaccard")


def q_near_dup_pair_edits(sf_dir: str):
    """Edit-script forensics for the verified near-dup pair set: per
    pair, TOKEN-level Levenshtein distance between the two docs'
    ordered token streams + max-length normalization — 'what kind of
    edit separates these near-dups' (few substitutions vs a block
    insertion), the ORDER-SENSITIVE complement of the set-level jaccard
    the verifier attached. Pairs explode to (pid, side) rows, texts
    attach via one inner hash join (only PAIRED keys leave the corpus),
    per-pair numpy DP on the sparse pair set only
    (stages/editjoin.py:pair_edit_stats). Oracle: the byte-encoded
    token-alphabet trick (dense_rank → chr → DuckDB levenshtein), same
    idiom as otmt_levenshtein_simple."""
    from raydedup.pipelines.neardup import near_dup_pairs, signatures_with_rep
    from raydedup.stages.editjoin import pair_edit_stats

    assigned = signatures_with_rep(
        _docs(sf_dir), SIMPLE_CFG, key_cols=["doc_id"]).materialize()
    pairs = near_dup_pairs(assigned, SIMPLE_CFG)
    return _round_col(
        pair_edit_stats(pairs, _docs(sf_dir), key_col="doc_id"), "nlev")


def q_turn_dedup_in_conv(sf_dir: str):
    """WITHIN-conversation turn dedup: keep only the first occurrence
    (by turn_idx) of each distinct turn text per conversation — the
    agent-loop repeated-message cleaner (retry storms, stuck tool
    loops), conversation twin of self_line_dedup. ordered.py partition
    sweep: convs hash-partition once, ONE lexsort per partition handles
    every conv, group identity via dictionary codes (no crypto, no
    per-conv Python call). The synthetic corpus has no within-conv
    exact repeats (the planted copies never share a conv), so the
    oracle verifies the identity-preserving side of the contract here;
    the removal side is pinned by the planted-fixture pytest."""
    from raydedup.sources.transcripts import transcripts_from_documents
    from raydedup.stages.convdedup import dedup_turns_within_conv

    ts = transcripts_from_documents(sf_dir)
    return dedup_turns_within_conv(ts).select_columns(
        ["conv_id", "turn_idx"])


def q_unified_dedup_clusters(sf_dir: str):
    """UNIFIED multi-paradigm dedup clusters: connected components over
    the union of every duplicate-evidence family the engine computes —
    exact-text groups ∪ verified shingle near-dup pairs (J ≥ 0.8) ∪
    weighted-bag pairs (J_w ≥ 0.8) ∪ set-containment pairs (c ≥ 0.9,
    inner ≥ 5) — the most aggressive curation setting ('collapse
    anything any detector flags'). Composed as ONE incremental merge:
    text_label_groups supplies the standing exact labeling and
    merge_components contracts the UNION of the three edge families
    against it (min-label is associative, so this equals the chained
    per-family merges at one repaint join instead of three — the
    ablation query keeps the chain because its report needs the
    intermediate labelings). Oracle: one recursive reach over the
    union of all four edge CTEs."""
    from raydedup.pipelines.neardup import near_dup_pairs, signatures_with_rep
    from raydedup.stages.exact import text_label_groups
    from raydedup.stages.setjoin import set_containment_self_join
    from raydedup.stages.wjaccard import bag_near_dup_pairs
    from raydedup.state.unionfind import merge_components

    docs = _docs(sf_dir)
    labels = text_label_groups(docs, key_cols=["doc_id"]).map_batches(
        lambda b: pa.table({"node": b["row_key"], "label": b["label"]}),
        batch_format="pyarrow")
    assigned = signatures_with_rep(
        docs, SIMPLE_CFG, key_cols=["doc_id"]).materialize()
    near = near_dup_pairs(assigned, SIMPLE_CFG).select_columns(
        ["a_key", "b_key"])
    bag = bag_near_dup_pairs(
        docs, SIMPLE_CFG, key_cols=["doc_id"]).select_columns(
        ["a_key", "b_key"])
    cont = set_containment_self_join(
        docs, 0.9, SIMPLE_CFG, min_inner=5).map_batches(
        lambda b: pa.table({"a_key": pc.cast(b["inner_id"], pa.string()),
                            "b_key": pc.cast(b["outer_id"], pa.string())}),
        batch_format="pyarrow")
    # components of (star ∪ near ∪ bag ∪ cont) equal the chained
    # per-family contraction (min-label is associative), so the three
    # edge families union into ONE label-graph contraction — one
    # repaint join instead of three; the ablation query keeps the
    # stage-by-stage chain because its REPORT needs the intermediate
    # labelings
    merged = merge_components(labels, near.union(bag).union(cont))
    return merged.map_batches(
        lambda b: pa.table({"row_key": b["node"],
                            "cluster_id": b["label"]}),
        batch_format="pyarrow")


def q_dedup_ablation_report(sf_dir: str):
    """Marginal-yield ABLATION of the unified dedup cascade: after each
    detector family joins the evidence union (exact → +near → +bag →
    +containment), how many clusters remain and how many rows are
    duplicates (rows − clusters) — the table that tells a curation run
    which detector actually pays for its compute on this corpus.
    Engine: the same chained merge_components as unified_dedup_clusters
    with a distinct-label count after each stage (a native groupby
    count, label-count-sized). Oracle: four recursive reach CTEs over
    the growing edge unions."""
    from ray.data.aggregate import Count

    from raydedup.pipelines.neardup import near_dup_pairs, signatures_with_rep
    from raydedup.stages.exact import text_label_groups
    from raydedup.stages.setjoin import set_containment_self_join
    from raydedup.stages.wjaccard import bag_near_dup_pairs
    from raydedup.state.unionfind import merge_components

    docs = _docs(sf_dir)
    labels = text_label_groups(docs, key_cols=["doc_id"]).map_batches(
        lambda b: pa.table({"node": b["row_key"], "label": b["label"]}),
        batch_format="pyarrow").materialize()
    assigned = signatures_with_rep(
        docs, SIMPLE_CFG, key_cols=["doc_id"]).materialize()
    near = near_dup_pairs(assigned, SIMPLE_CFG)
    bag = bag_near_dup_pairs(docs, SIMPLE_CFG, key_cols=["doc_id"])
    cont = set_containment_self_join(
        docs, 0.9, SIMPLE_CFG, min_inner=5).map_batches(
        lambda b: pa.table({"a_key": pc.cast(b["inner_id"], pa.string()),
                            "b_key": pc.cast(b["outer_id"], pa.string())}),
        batch_format="pyarrow")

    def stats(lab_ds, stage: str):
        n_rows = lab_ds.count()
        n_clusters = lab_ds.groupby("label").aggregate(
            Count(alias_name="c")).count()
        return {"stage": stage, "n_clusters": n_clusters,
                "n_duplicates": n_rows - n_clusters}

    rows = [stats(labels, "exact")]
    merged = merge_components(labels, near).materialize()
    rows.append(stats(merged, "exact+near"))
    merged = merge_components(merged, bag).materialize()
    rows.append(stats(merged, "exact+near+bag"))
    merged = merge_components(merged, cont).materialize()
    rows.append(stats(merged, "exact+near+bag+containment"))
    return pa.table({
        "stage": pa.array([r["stage"] for r in rows], pa.string()),
        "n_clusters": pa.array([r["n_clusters"] for r in rows],
                               pa.int64()),
        "n_duplicates": pa.array([r["n_duplicates"] for r in rows],
                                 pa.int64()),
    })


def q_heavy_hitters_by_source(sf_dir: str):
    """Per-SOURCE guaranteed heavy hitters (k=32): for each source,
    exactly the tokens with n·(k+1) > that source's token-instance
    total, exact counts — bounded-memory Misra-Gries state kept per
    group (≤ k counters × groups per task; the merge-tree recall bound
    applies per group independently), exact recount of the surviving
    (group, token) candidates, strict integer threshold
    (stages/heavyhitters.py:grouped_heavy_hitters)."""
    from raydedup.stages.heavyhitters import grouped_heavy_hitters

    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return grouped_heavy_hitters(docs, "source", k=32)


def q_cross_corpus_sim_pairs(sf_dir: str):
    """Exact TWO-CORPUS (R-S) set-similarity join: every cross pair
    between the 'src0' slice (probe side — the benchmark/reference role)
    and the rest of the corpus (index side) with shingle-set Jaccard
    >= 0.5 — recall exactly 1.0 by the one-sided prefix theorem, where
    the LSH decontam path is probabilistic. Probe side explodes hot-last
    prefixes only; the corpus side indexes full sets (no size assumption
    on the corpus). Within-corpus pairs are never emitted
    (stages/setjoin.py:set_similarity_join)."""
    import ray.data

    from raydedup.stages.setjoin import set_similarity_join

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    ds_a = docs.filter(expr='source == "src0"')
    ds_b = docs.filter(expr='source != "src0"')
    return _round_col(
        set_similarity_join(ds_a, ds_b, 0.5, SIMPLE_CFG), "jaccard")


def q_bag_containment_pairs(sf_dir: str):
    """WEIGHTED (multiset) containment pairs: ordered (inner, outer)
    with Σ_t min(c_inner(t), c_outer(t)) / Σ_t c_inner(t) >= 0.9 and
    >= 5 inner token instances — 'is this doc's token BAG swallowed by
    that one', counting multiplicity (a doc of 30 'the's is NOT
    contained in a doc with one 'the'). Pure composition of the two new
    machines: wjaccard.bag_element_sets expands counts into (token,
    occurrence) elements, and set_containment_self_join's asymmetric
    prefix filter + exact verify run UNCHANGED on them — set containment
    of expanded sets ≡ weighted containment, exactly."""
    from raydedup.stages.setjoin import set_containment_self_join
    from raydedup.stages.wjaccard import bag_element_sets

    docs = _docs(sf_dir)
    sets = bag_element_sets(docs, SIMPLE_CFG)
    return _round_col(
        set_containment_self_join(docs, 0.9, SIMPLE_CFG, min_inner=5,
                                  sets_ds=sets),
        "containment")


def q_bag_near_dup_clusters(sf_dir: str):
    """Clusters over the WEIGHTED-Jaccard (multiset) near-dup graph:
    exact-text groups ∪ verified bag pairs → connected components,
    cluster_id = min member key — the cluster/survivor story for the
    bag-similarity paradigm, composed from two session machines:
    text_label_groups supplies the standing exact-text labeling and
    merge_components contracts the bag edges against it (work ∝ pairs,
    one repaint join). Oracle: the recursive reach CTE over exact-text
    edges + the weighted-pair CTE."""
    import ray.data

    from raydedup.stages.exact import text_label_groups
    from raydedup.stages.wjaccard import bag_near_dup_pairs
    from raydedup.state.unionfind import merge_components

    docs = _docs(sf_dir)
    labels0 = text_label_groups(docs, key_cols=["doc_id"]).map_batches(
        lambda b: pa.table({"node": b["row_key"], "label": b["label"]}),
        batch_format="pyarrow")
    pairs = bag_near_dup_pairs(docs, SIMPLE_CFG, key_cols=["doc_id"])
    merged = merge_components(labels0, pairs)
    return merged.map_batches(
        lambda b: pa.table({"row_key": b["node"],
                            "cluster_id": b["label"]}),
        batch_format="pyarrow")


def q_heavy_hitter_tokens(sf_dir: str):
    """GUARANTEED heavy hitters over documents: exactly the tokens with
    corpus frequency n·(k+1) > N (k=64, N = total token instances),
    EXACT counts — via mergeable Misra-Gries summaries (≤ k counters
    per task regardless of vocabulary; Agarwal et al. 2012 merge-tree
    bound keeps every qualifying token alive under any Ray batching)
    + an exact broadcast recount of the ≤ k candidates. The
    bounded-memory scale path next to the vocabulary-sized exact
    groupbys (top_terms_global, hot_ngrams); strict integer threshold,
    so the SQL HAVING replays it bit-for-bit."""
    from raydedup.stages.heavyhitters import guaranteed_heavy_hitters

    return guaranteed_heavy_hitters(_docs(sf_dir), k=64)


def q_set_containment_pairs(sf_dir: str):
    """Exact ASYMMETRIC shingle-set containment pairs
    (|inner ∩ outer| / |inner| >= 0.9, |inner| >= 5 shingles, ordered,
    inner != outer) via the asymmetric prefix filter: only the INNER
    side prefixes (floor((1-t)n)+1 hot-last shingles), the outer side
    indexes its full set — no outer length bound exists, which is
    exactly where the Jaccard join goes blind (a small doc swallowed by
    a huge one has near-zero Jaccard). SET-level counterpart of
    doc_containment_pairs' verbatim-substring contract: robust to
    reordering/interleaving of the reused material. Recall exactly 1.0
    at threshold by the prefix theorem; the oracle recomputes brute
    containment in SQL."""
    from raydedup.stages.setjoin import set_containment_self_join

    return _round_col(
        set_containment_self_join(_docs(sf_dir), 0.9, SIMPLE_CFG,
                                  min_inner=5),
        "containment")


def q_conv_near_dup_pairs(sf_dir: str):
    """CONVERSATION-granularity near-dup pairs: reassemble each
    conversation under stable (conv_id, turn_idx) ordering, then run
    the exact prefix-filter set-similarity join over whole-conversation
    shingle sets. Conversation granularity dilutes per-turn duplication
    (five turns share one near-dup turn → conv Jaccard ~0.1-0.2), hence
    the low threshold — exactly where LSH banding would need recall
    tuning and the exact join needs none."""
    from raydedup.stages.ordered import assemble_by_key
    from raydedup.stages.setjoin import set_similarity_self_join

    ts = transcripts_from_documents(sf_dir)
    convs = assemble_by_key(ts, by="conv_id", order_cols=["turn_idx"],
                            text_col="text", sep="\n", out="conv_text")
    out = _round_col(
        set_similarity_self_join(convs, 0.1, SIMPLE_CFG,
                                 id_col="conv_id", text_col="conv_text"),
        "jaccard").materialize()
    if out.count() == 0:
        # zero pairs IS the correct answer at some scales (sf0.1's
        # conversations dilute below the 0.1 threshold) — but Ray 2.49
        # Dataset.to_pandas() drops ALL columns from a fully-empty
        # Dataset, which would fail the driver's schema compare; hand
        # it a schema-carrying Arrow table instead
        return pa.schema([
            pa.field("a_id", pa.string()), pa.field("b_id", pa.string()),
            pa.field("common", pa.int64()), pa.field("na", pa.int64()),
            pa.field("nb", pa.int64()), pa.field("jaccard", pa.float64()),
        ]).empty_table()
    return out


def q_conv_turn_edit_pairs(sf_dir: str):
    """TURN-sequence edit forensics for conversation near-dup pairs:
    per conv pair (shingle Jaccard >= 0.1 over assembled text, the
    conv_near_dup_pairs contract), the TURN-level Levenshtein distance
    — each turn reduced to its md5 identity, so the sequences compare
    whole turns ('how many turns were inserted / replaced between the
    two runs'), the conversation-granularity twin of
    near_dup_pair_edits. Pure composition: assemble_by_key over
    per-turn md5 streams + pair_edit_stats (md5 hex is one \\w+ token
    per turn). Oracle: the conv-pair CTE + the dense_rank→chr
    token-alphabet levenshtein idiom over turn hashes."""
    import hashlib

    from raydedup.stages.editjoin import pair_edit_stats
    from raydedup.stages.ordered import assemble_by_key
    from raydedup.stages.setjoin import set_similarity_self_join

    ts = transcripts_from_documents(sf_dir).materialize()
    convs = assemble_by_key(ts, by="conv_id", order_cols=["turn_idx"],
                            text_col="text", sep="\n", out="conv_text")
    pairs = set_similarity_self_join(
        convs, 0.1, SIMPLE_CFG, id_col="conv_id", text_col="conv_text")
    pr = pairs.map_batches(
        lambda b: pa.table({"a_key": b["a_id"], "b_key": b["b_id"]}),
        batch_format="pyarrow")

    def md5s(b: pa.Table) -> pa.Table:
        hs = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
              for t in b["text"].to_pylist()]
        return pa.table({"conv_id": b["conv_id"],
                         "turn_idx": b["turn_idx"],
                         "tsha": pa.array(hs, pa.string())})

    streams = assemble_by_key(
        ts.map_batches(md5s, batch_format="pyarrow"), by="conv_id",
        order_cols=["turn_idx"], text_col="tsha", sep=" ",
        out="sha_stream")
    out = _round_col(
        pair_edit_stats(pr, streams, key_col="conv_id",
                        text_col="sha_stream"),
        "nlev").materialize()
    if out.count() == 0:
        # zero conv pairs IS the correct answer at some scales, but Ray
        # 2.49 to_pandas() drops all columns from a fully-empty Dataset
        # — hand the driver a schema-carrying Arrow table instead (the
        # conv_near_dup_pairs idiom)
        return pa.schema([
            pa.field("a_key", pa.string()), pa.field("b_key", pa.string()),
            pa.field("n_a", pa.int64()), pa.field("n_b", pa.int64()),
            pa.field("token_lev", pa.int64()),
            pa.field("nlev", pa.float64()),
        ]).empty_table()
    return out


def q_conv_turn_containment(sf_dir: str):
    """Conversation TURN-MULTISET containment: ordered conv pairs where
    every turn of the inner conv (as an md5 identity, WITH multiplicity)
    also occurs in the outer conv — the rearranged-rerun-with-extra-
    turns detector that prefix containment (order-bound) and whole-conv
    Jaccard (dilution-bound) both miss. Composition: per-turn md5
    streams → bag_element_sets (one (hash, occurrence) element per
    turn) → the asymmetric prefix-filter containment join at t = 1.0,
    inner ≥ 2 turns. Oracle replays Σmin(counts) = inner turn count
    over per-(conv, turn-hash) counts."""
    import hashlib

    from raydedup.stages.ordered import assemble_by_key
    from raydedup.stages.setjoin import set_containment_self_join
    from raydedup.stages.wjaccard import bag_element_sets

    ts = transcripts_from_documents(sf_dir)

    def md5s(b: pa.Table) -> pa.Table:
        hs = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
              for t in b["text"].to_pylist()]
        return pa.table({"conv_id": b["conv_id"],
                         "turn_idx": b["turn_idx"],
                         "tsha": pa.array(hs, pa.string())})

    streams = assemble_by_key(
        ts.map_batches(md5s, batch_format="pyarrow"), by="conv_id",
        order_cols=["turn_idx"], text_col="tsha", sep=" ",
        out="sha_stream").materialize()
    sets = bag_element_sets(streams, SIMPLE_CFG, id_col="conv_id",
                            text_col="sha_stream")
    out = _round_col(
        set_containment_self_join(streams, 1.0, SIMPLE_CFG, min_inner=2,
                                  id_col="conv_id",
                                  text_col="sha_stream", sets_ds=sets),
        "containment").materialize()
    if out.count() == 0:
        return pa.schema([
            pa.field("inner_id", pa.string()),
            pa.field("outer_id", pa.string()),
            pa.field("common", pa.int64()),
            pa.field("n_inner", pa.int64()),
            pa.field("n_outer", pa.int64()),
            pa.field("containment", pa.float64()),
        ]).empty_table()
    return out


def q_tiered_dedup_docs(sf_dir: str):
    """TIERED dedup cascade (the composition a web-scale curation run
    ships): tier 1 collapses sha256-identical texts to the min-id rep;
    tier 2 runs the EXACT prefix-filter set-similarity join (AllPairs/
    PPJoin) at Jaccard >= 0.5 over tier-1 survivors only; every input
    doc gets (exact_rep, n_exact, cluster_id, tier in {exact,near,keep}).
    The oracle recomputes both tiers in SQL — window-partition exact
    groups, brute-force shingle Jaccard over reps, recursive-CTE
    min-label components — so survivors, cluster labels AND tier
    attribution are all value-checked."""
    from raydedup.pipelines.tiered import tiered_dedup

    return tiered_dedup(_docs(sf_dir), 0.5, SIMPLE_CFG)


def q_dup_rate_by_source(sf_dir: str):
    """Curation report: per-source dedup attribution — how many docs
    each source loses to each tier of the cascade (the table a data
    audit reads before dropping a source). Composition: tiered cascade
    → join back the pruned (doc_id, source) projection → one
    combiner-friendly pivot groupby."""
    import ray.data

    from raydedup.pipelines.tiered import tiered_dedup

    tiers = tiered_dedup(_docs(sf_dir), 0.5, SIMPLE_CFG)
    src = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "source"])
    joined = _attach_col(tiers.select_columns(["doc_id", "tier"]),
                         src, "doc_id", "source")

    def pivot(batch: pa.Table) -> pa.Table:
        t = batch["tier"]
        cols = {"source": batch["source"],
                "n_docs": pa.array(np.ones(batch.num_rows, np.int64))}
        for name in ("exact", "near", "keep"):
            cols[f"n_{name}"] = pc.cast(
                pc.equal(t, pa.scalar(name)), pa.int64())
        return pa.table(cols)

    from ray.data.aggregate import Sum

    return (joined.map_batches(pivot, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_exact", alias_name="n_exact"),
                       Sum("n_near", alias_name="n_near"),
                       Sum("n_keep", alias_name="n_keep")))


def q_embedding_decontam(sf_dir: str):
    """Embedding-space decontamination: every corpus vector (vec_id %
    10 != 0) scored with its nearest 'benchmark' vector (vec_id % 10 ==
    0) by cosine — the semantic complement of the n-gram decontaminate
    stage (see stages/embeddings.py:cross_corpus_nn — benchmark
    broadcast once, corpus streams, no shuffle)."""
    import ray.data

    from raydedup.stages.embeddings import cross_corpus_nn

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])

    def pick(want_bench: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy()
            mask = (ids % 10 == 0) if want_bench else (ids % 10 != 0)
            return batch.filter(pa.array(mask))
        return f

    bench = emb.map_batches(pick(True), batch_format="pyarrow")
    corpus = emb.map_batches(pick(False), batch_format="pyarrow")
    return _round_col(cross_corpus_nn(corpus, bench), "cosine")


def _transcripts_with_retries(sf_dir: str):
    """Deterministic 'retry' view of the derived transcripts (no
    external data): every 5th conversation spawns a truncated replica
    (first 3 turns) under conv_id + '-retry' — the crashed-run-
    resubmitted pattern prefix_containment_convs exists to catch.
    Mirrored verbatim by the oracle's retry CTE."""
    import numpy as np

    ts = transcripts_from_documents(sf_dir)

    def add_retry(b: pa.Table) -> pa.Table:
        num = pc.cast(pc.utf8_slice_codeunits(b["conv_id"], 5, 99),
                      pa.int64()).to_numpy(zero_copy_only=False)
        turn = b["turn_idx"].to_numpy(zero_copy_only=False)
        mask = pa.array((num % 5 == 0) & (turn < 3))
        rep = b.filter(mask)
        rep = rep.set_column(
            rep.column_names.index("conv_id"), "conv_id",
            pc.binary_join_element_wise(
                rep["conv_id"], pa.scalar("-retry"), ""))
        return pa.concat_tables([b, rep])

    return ts.map_batches(add_retry, batch_format="pyarrow")


def q_prefix_containment_convs(sf_dir: str):
    """Retry/continuation dedup for agent transcripts: conversations
    whose full (role, text) turn sequence is a strict prefix of another
    conversation's (or an exact whole-sequence duplicate, emitted once)
    — OTMT's "shorter rerun of the same capture" pattern lifted to
    conversations. Linear candidate generation (one rolling-hash row
    per TURN, ordered.py partition sweep), hash-join on (hash, pos),
    text-verified exact output (see stages/convdedup.py)."""
    from raydedup.stages.convdedup import (PAIR_SCHEMA,
                                           prefix_containment_pairs)

    out = prefix_containment_pairs(
        _transcripts_with_retries(sf_dir)).materialize()
    if out.count() == 0:
        # empty Datasets drop columns through to_pandas (Ray 2.49) —
        # hand the driver a schema-carrying Arrow table
        return PAIR_SCHEMA.empty_table()
    return out


def q_tool_seq_clusters(sf_dir: str):
    """Structural conversation dedup: clusters of conversations sharing
    the exact ordered tool-call sequence (text ignored — 'same tool
    script, different wording'), cluster id = min conv_id, size >= 2.
    Only tool names shuffle (see stages/convdedup.py)."""
    from raydedup.stages.convdedup import tool_sequence_clusters

    out = tool_sequence_clusters(
        transcripts_from_documents(sf_dir)).materialize()
    if out.count() == 0:
        return pa.schema([
            pa.field("conv_id", pa.string()),
            pa.field("cluster_id", pa.string()),
            pa.field("cluster_size", pa.int64()),
        ]).empty_table()
    return out


def q_priority_dedup(sf_dir: str):
    """Provenance-priority exact dedup: identical texts keep the copy
    from the lexicographically-first source (ties: min doc_id), with
    the collapse count — the multi-corpus merge rule (see
    stages/exact.py:priority_dedup; texts never shuffle)."""
    import ray.data

    from raydedup.stages.exact import priority_dedup

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source", "text"],
                                 override_num_blocks=64)
    return priority_dedup(docs)


def q_length_drift_by_source(sf_dir: str):
    """Distribution-drift monitor: exact two-sample KS statistic of each
    source's length distribution vs the rest of the corpus (see
    stages/stats.py:ecdf_drift_by_group — one counting groupby, driver
    walk bounded by sources x distinct lengths)."""
    import ray.data

    from raydedup.stages.stats import ecdf_drift_by_group

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "n_chars"],
                                 override_num_blocks=64)
    return _round_tbl(ecdf_drift_by_group(docs), "ks_stat")


def q_dup_rate_by_lang(sf_dir: str):
    """Curation report: per-LANGUAGE dedup attribution — the language
    crosstab of the tiered cascade (a multilingual curation run reads
    this before re-weighting languages whose crawl is mostly
    duplicates). Composition: tiered cascade → distributed join to the
    langid stage output → one combiner-friendly pivot groupby (same
    shape as dup_rate_by_source, keyed by the MODEL'S language call
    rather than a stored column)."""
    from raydedup.pipelines.tiered import tiered_dedup
    from raydedup.stages.textstats import detect_language

    tiers = tiered_dedup(_docs(sf_dir), 0.5, SIMPLE_CFG)
    langs = detect_language(_docs(sf_dir)).select_columns(
        ["doc_id", "detected_lang"])
    joined = _attach_col(tiers.select_columns(["doc_id", "tier"]),
                         langs, "doc_id", "detected_lang")

    def pivot(batch: pa.Table) -> pa.Table:
        t = batch["tier"]
        cols = {"detected_lang": batch["detected_lang"],
                "n_docs": pa.array(np.ones(batch.num_rows, np.int64))}
        for name in ("exact", "near", "keep"):
            cols[f"n_{name}"] = pc.cast(
                pc.equal(t, pa.scalar(name)), pa.int64())
        return pa.table(cols)

    from ray.data.aggregate import Sum

    return (joined.map_batches(pivot, batch_format="pyarrow")
            .groupby("detected_lang")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_exact", alias_name="n_exact"),
                       Sum("n_near", alias_name="n_near"),
                       Sum("n_keep", alias_name="n_keep")))


def q_shard_manifest(sf_dir: str):
    """Deterministic output-shard manifest (the resumable-write
    primitive): shard = md5-low60('shard0:' || doc_id) % 16, with
    per-shard count/min/max — what sharded_stage checks on resume."""
    from raydedup.stages.textstats import shard_manifest

    return shard_manifest(_docs(sf_dir), n_shards=16)


def q_bigram_logppl(sf_dir: str):
    """Bigram conditional log-perplexity under the corpus's own bigram
    LM (one step toward the CCNet KenLM scorer): mean ln(cctx/c2) over
    a doc's bigrams, exact-normalizer contexts. Same two-Dataset join
    shape as unigram_logppl — nothing vocabulary-sized is broadcast."""
    from raydedup.stages.textstats import bigram_logppl

    return _round_col(bigram_logppl(_docs(sf_dir)), "logppl2")


def q_curate_docs(sf_dir: str):
    """FLAGSHIP COMPOSITION — the full curation recipe a pretraining run
    ships: integer-exact Gopher-style filters (25 <= n_words <= 90,
    max_tf*5 <= n_words) → three-tier dedup cascade (exact → near 0.5 →
    semantic 0.35 over survivors) → CCNet-ordered unigram-LM scoring of
    the survivors under the filtered corpus's LM. The oracle recomposes
    every stage in one SQL statement (filter CTEs feeding the tiered
    CTE chain via text substitution, tier-3 cosine pass, LM join)."""
    import ray.data

    from raydedup.pipelines.curate import curate_docs

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return _round_col(curate_docs(_docs(sf_dir), emb, cfg=SIMPLE_CFG),
                      "logppl")


def q_self_line_dedup_docs(sf_dir: str):
    """WITHIN-doc repeated-line removal (the 'dedup lines inside a page'
    step of C4-style cleaning; within-doc counterpart of line_dedup):
    over the word-per-line lined view (lined_documents(n=1) — the small
    closed vocabulary makes within-doc word repeats dense), keep the
    FIRST occurrence of each distinct line per doc, drop later repeats,
    rejoin in original order. Zero shuffle — a doc's lines never leave
    its batch (stages/linededup.py:self_line_dedup). Oracle replays
    split → min-position-per-(doc, line) → ordered string_agg."""
    from raydedup.sources.lined import lined_documents
    from raydedup.stages.linededup import self_line_dedup

    return self_line_dedup(lined_documents(sf_dir, n=1))


def q_dsir_logweights(sf_dir: str):
    """DSIR importance log-weights (Xie et al. 2023): score every
    document by target-likeness under bag-of-hashed-ngrams (unigram +
    adjacent bigram, md5-low60 % 4096 buckets — the sample_by_hash
    contract) models of target (source = 'src0') vs the full corpus,
    add-1 smoothed. Model state is two FIXED 4096-long count vectors —
    the fixed-size-by-construction state is DSIR's point, so nothing
    corpus-scale is broadcast (stages/textstats.py:dsir_logweights).
    Oracle replays the bucket hash, both count passes and the per-doc
    feature-instance sum in SQL; 6-decimal float contract."""
    import ray.data

    from raydedup.stages.textstats import dsir_logweights

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "source"],
                                 override_num_blocks=64)
    target = docs.filter(expr="source == 'src0'")
    return _round_col(dsir_logweights(docs, target), "log_w")


def q_top_event_types_per_user(sf_dir: str):
    """Grouped top-k by frequency: each user's 2 most frequent event
    types with deterministic tie-break (count desc, value asc) — the
    k>1 generalization of mode_by_group with a per-block top-k
    pre-filter, so the final per-group reduce sees at most k rows per
    (group, block) (stages/stats.py:top_values_by_group)."""
    import ray.data

    from raydedup.stages.stats import top_values_by_group

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"],
                               override_num_blocks=64)
    return top_values_by_group(ev, "user_id", "event_type", k=2)


def q_normalized_dedup_groups(sf_dir: str):
    """Normalization-robust exact dedup: identical after casefold +
    punctuation/whitespace collapse — the 'soft-exact' tier catching
    SHOUTING/re-punctuated copies that sha-exact misses while
    similarity pipelines pay a full candidate pass for them. The view
    plants upper-cased, re-punctuated copies (id +8e6) for every 19th
    doc (stages/exact.py:normalized_dup_groups)."""
    from raydedup.stages.exact import normalized_dup_groups

    def shout(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        txt = pc.fill_null(b["text"].combine_chunks(), "")
        base = pa.table({"doc_id": b["doc_id"], "text": txt})
        m = ids % 19 == 0
        if not m.any():
            return base
        extra = pa.table({
            "doc_id": pa.array(ids[m] + 8_000_000, pa.int64()),
            "text": pc.binary_join_element_wise(
                pc.utf8_upper(txt.filter(pa.array(m))), "!!  ", ""),
        })
        return pa.concat_tables([base, extra])

    view = _docs(sf_dir).map_batches(shout, batch_format="pyarrow")
    return normalized_dup_groups(view)


def q_weighted_sample_docs(sf_dir: str):
    """Weight-proportional sample without replacement (Efraimidis-
    Spirakis priority sampling): top-50 docs by ln(u)/n_chars with
    deterministic md5 uniforms — longer docs proportionally likelier,
    reruns identical, each batch ships only its local top-k
    (stages/textstats.py:weighted_sample). Oracle replays the exact
    priority arithmetic and selection."""
    import ray.data

    from raydedup.stages.textstats import weighted_sample

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "n_chars"],
                                 override_num_blocks=64)
    return weighted_sample(docs, key_col="doc_id",
                           weight_col="n_chars", k=50)


def q_token_freq_spectrum(sf_dir: str):
    """Zipf/Heaps frequency spectrum: for every global token occurrence
    count tf, the number of distinct token types occurring exactly that
    often — the one-glance power-law health check (a tf=2..4 bulge
    means boilerplate duplication; a depleted hapax count means the
    crawl re-visited itself). Corpus reduces to the vocabulary-sized
    count table, then to |distinct tf| rows
    (stages/collection.py:token_frequency_spectrum)."""
    from raydedup.stages.collection import token_frequency_spectrum

    return token_frequency_spectrum(_docs(sf_dir))


def q_kl_by_source(sf_dir: str):
    """Information-theoretic drift monitor: per-source unigram KL
    divergence vs the rest of the corpus over 1024 md5-hashed token
    buckets, add-1 smoothed — KS (length_drift_by_source) sees a
    shifted length distribution, KL sees a shifted VOCABULARY. Fixed
    n_buckets state (the DSIR idiom); driver walk bounded by
    sources x 1024 (stages/stats.py:kl_divergence_by_group)."""
    import ray.data

    from raydedup.stages.stats import kl_divergence_by_group

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "text"],
                                 override_num_blocks=64)
    return _round_tbl(kl_divergence_by_group(docs), "kl")


def q_dedup_method_agreement(sf_dir: str):
    """Pair-counting Rand agreement between two dedup methods over the
    reordered-corpus view: exact-text groups vs word-multiset (bag)
    groups. The reversed copies are exactly where the partitions
    disagree (bag co-clusters them, exact cannot), so pairs_b >
    pairs_both by construction. Exact int64 pair combinatorics + one
    final division — bit-identical to the SQL replay
    (stages/graph.py:clustering_agreement)."""
    from raydedup.stages.exact import text_label_groups
    from raydedup.stages.graph import clustering_agreement

    view = _docs_with_reordered(sf_dir)
    la = text_label_groups(view, canonical=False, label_col="label_a")
    lb = text_label_groups(view, canonical=True, label_col="label_b")
    return _round_col(clustering_agreement(la, lb), "rand_index")


def q_effective_tokens(sf_dir: str):
    """Soft-dedup effective token census per source over the repeated
    corpus view: raw n_docs / n_tokens and eff_tokens = sum of
    tok(t) * copies(t, source) / copies(t, total) — the unique-signal
    share each source contributes under reweight-not-remove dedup
    (stages/textstats.py:effective_tokens_by_group; 6-decimal float
    contract)."""
    from raydedup.stages.textstats import effective_tokens_by_group

    return _round_col(
        effective_tokens_by_group(
            _docs_with_repeats(sf_dir, extra_cols=("source",))),
        "eff_tokens")


def q_hot_ngrams(sf_dir: str):
    """Hot boilerplate n-grams: every word 5-gram in >= T distinct
    documents, T = max(2, the 10th-largest distinct-doc count) — the
    threshold-VALUE contract needs no tie-break, so ties at the cutoff
    are all included and the SQL replay is exact. Pass 1 shuffles only
    64-bit hashes; gram STRINGS are built only for winner instances and
    final counts recount per string (collision contract documented,
    stages/collection.py:hot_ngrams)."""
    from raydedup.stages.collection import hot_ngrams

    return hot_ngrams(_docs(sf_dir), n=5, k=10)


def q_cdc_dup_stats(sf_dir: str):
    """Content-defined-chunking duplicate exposure (LBFS/Rabin CDC, the
    storage-dedup paradigm): cut each document where the rolling hash
    of the trailing 6 code points is 0 mod 32, then per doc count chunk
    instances whose content recurs in >= 2 distinct documents —
    chunk-granular, SHIFT-ROBUST cross-doc duplication that fixed-stride
    chunking and line dedup miss (stages/cdc.py:cdc_dup_stats). Engine
    compares chunks by blake2b-64, oracle by exact string (documented
    collision contract). Oracle replays the rolling hash with LAG
    windows and reassembles chunks with ordered string_agg."""
    from raydedup.stages.cdc import cdc_dup_stats

    return cdc_dup_stats(_docs(sf_dir))


def q_kcenter_coreset(sf_dir: str):
    """k-center greedy coreset (Gonzalez farthest-point traversal;
    coreset data selection per Sener & Savarese 2018): 8 maximally
    diverse exemplars over the embeddings table, exact-integer distance
    contract (round-half-away 1e6 quantization — the prototype_prune
    contract) so the selection order and min-id tie-breaks are
    bit-reproducible; oracle replays the full traversal with a
    recursive CTE (stages/embeddings.py:kcenter_select)."""
    import ray.data

    from raydedup.stages.embeddings import kcenter_select

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return kcenter_select(emb, k=8, dims=64)


def _kcenter_sql(k: int = 8, dims: int = 64) -> str:
    qcols = ", ".join(
        f"CAST(round(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000, 0)"
        f" AS BIGINT) AS q{i}" for i in range(dims))
    dist = " + ".join(f"(x.q{i} - c.q{i}) * (x.q{i} - c.q{i})"
                      for i in range(dims))
    return f"""
        WITH RECURSIVE q AS MATERIALIZED (
            SELECT vec_id, {qcols} FROM embeddings),
        sel(t, vids) AS (
            SELECT 1, [(SELECT min(vec_id) FROM q)]
            UNION ALL
            SELECT t + 1, list_append(vids, (
                SELECT x.vec_id FROM q x
                WHERE NOT list_contains(vids, x.vec_id)
                ORDER BY (SELECT min({dist}) FROM q c
                          WHERE list_contains(vids, c.vec_id)) DESC,
                         x.vec_id
                LIMIT 1))
            FROM sel WHERE t < {k}
        )
        SELECT unnest(vids) AS vec_id,
               unnest(generate_series(1, len(vids))) AS rank
        FROM sel WHERE t = {k}
    """


def q_unigram_logppl(sf_dir: str):
    """Per-doc unigram log-perplexity under the corpus's own unigram LM
    (CCNet-style quality signal): ln(N) - (1/n_d) * sum tf*ln(c). Counts
    stay a Dataset hash-joined to exploded per-doc tf rows (no
    vocabulary broadcast). Oracle recomputes counts + the join in SQL;
    both sides round to 6 decimals (the repo float contract)."""
    from raydedup.stages.textstats import unigram_logppl

    return _round_col(unigram_logppl(_docs(sf_dir)), "logppl")


def q_tiered_semantic_docs(sf_dir: str):
    """THREE-tier cascade (exact sha → near prefix-filter Jaccard >= 0.5
    → SemDeDup cosine >= 0.35 over tier-2 survivors only), the full
    published curation ordering. Every doc gets (exact_rep, n_exact,
    near_cluster, cluster_id, tier in {exact,near,semantic,keep}). The
    oracle recomputes all three tiers: window exact groups, brute-force
    shingle Jaccard + recursive-CTE components, then
    list_cosine_similarity pairs restricted to tier-2 survivors and a
    second recursive-CTE component pass."""
    import ray.data

    from raydedup.pipelines.tiered import tiered_dedup_semantic

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return tiered_dedup_semantic(_docs(sf_dir), emb, threshold=0.5,
                                 sem_threshold=0.35, cfg=SIMPLE_CFG)


def q_line_dedup_docs(sf_dir: str):
    """LINE-level corpus dedup (the C4 / MassiveText / FineWeb recipe —
    Raffel et al. 2020 §2.2): over the lined-documents view (word-trigram
    lines, sources/lined.py — derivation mirrored by the LINED_SQL CTE),
    any line occurring in >= 2 distinct documents is removed everywhere;
    survivors rejoin in original order. ~34% of line instances are
    cross-doc duplicates at sf0.01, so the oracle checks real removal,
    reassembly order, and the per-doc (n_lines, n_removed) accounting.
    Engine compares lines by blake2b-64 hash, oracle by exact string —
    collision-free at any testable scale (documented contract,
    stages/linededup.py)."""
    from raydedup.sources.lined import lined_documents
    from raydedup.stages.linededup import line_dedup

    return line_dedup(lined_documents(sf_dir), min_docs=2)


def q_incremental_dedup(sf_dir: str):
    """Incremental dedup against a PERSISTED signature index (the
    continuous-ingestion primitive a 100-TB corpus lives on): documents
    split by the sample_by_hash md5 contract
    (md5-low60('incr0:' || doc_id) % 5 — ~80% 'old', ~20% 'new'); the
    old side is indexed ONCE (signatures only, exact-rep collapsed,
    parquet on disk — its text is never read again), then the new shard
    is labeled exact / near / new via column-pruned joins against the
    index. Near = LSH band candidates exact-verified at shingle-set
    jaccard >= 0.8 against the STORED sets; match_key = max-jaccard
    match, ties broken by min key. The brute-force SQL oracle assumes
    LSH candidate recall 1.0 on this fixture — the same assumption
    near_dup_pairs_docs validates at the identical config."""
    import shutil
    import tempfile

    from raydedup.stages.incremental import (build_dedup_index,
                                             dedup_against_index)
    from raydedup.stages.textstats import _hash60

    docs = _docs(sf_dir)

    def side(want_new: bool):
        def fn(batch: pa.Table) -> pa.Table:
            h = _hash60(batch["doc_id"].to_pylist(), b"incr0:")
            m = (h % 5 == 0) if want_new else (h % 5 != 0)
            return batch.filter(pa.array(m))

        return docs.map_batches(fn, batch_format="pyarrow")

    index_dir = tempfile.mkdtemp(prefix="raydedup-incr-")
    try:
        build_dedup_index(side(False), index_dir, SIMPLE_CFG,
                          key_cols=["doc_id"])
        res = dedup_against_index(side(True), index_dir, SIMPLE_CFG,
                                  key_cols=["doc_id"])
        return _round_col(res, "jaccard").materialize()
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


def q_incremental_dedup_rolling(sf_dir: str):
    """The FULL continuous-ingestion loop: build index on ~60% of
    documents (md5-low60('incr0:'||doc_id) % 5 > 1), probe shard 1
    (% 5 == 1), EXTEND the index with shard 1's 'new'-labeled
    survivors (within-shard exact-rep collapsed, appended as a second
    index generation with an atomically republished manifest), then
    probe shard 2 (% 5 == 0) against the extended index and return its
    labels. Exercises what the single-probe query cannot: multi-
    generation reads, the survivor policy, and cross-shard matches
    (a shard-2 dup of a shard-1 doc is caught without ever re-reading
    shard 1's text). Oracle replays both probe rounds brute-force."""
    import shutil
    import tempfile

    from raydedup.stages.incremental import (build_dedup_index,
                                             dedup_against_index,
                                             extend_dedup_index)
    from raydedup.stages.textstats import _hash60

    docs = _docs(sf_dir)

    def side(*classes):
        want = set(classes)

        def fn(batch: pa.Table) -> pa.Table:
            h = _hash60(batch["doc_id"].to_pylist(), b"incr0:")
            m = np.isin((h % 5).astype(np.int64), list(want))
            return batch.filter(pa.array(m))

        return docs.map_batches(fn, batch_format="pyarrow")

    index_dir = tempfile.mkdtemp(prefix="raydedup-roll-")
    try:
        build_dedup_index(side(2, 3, 4), index_dir, SIMPLE_CFG,
                          key_cols=["doc_id"])
        s1 = side(1)
        r1 = dedup_against_index(s1, index_dir, SIMPLE_CFG,
                                 key_cols=["doc_id"]).materialize()
        extend_dedup_index(s1, index_dir, r1, SIMPLE_CFG,
                           key_cols=["doc_id"])
        r2 = dedup_against_index(side(0), index_dir, SIMPLE_CFG,
                                 key_cols=["doc_id"])
        return _round_col(r2, "jaccard").materialize()
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


def entry() -> Any:
    """Flagship pipeline on sf0.001 (driver smoke check)."""
    return q_near_dup_clusters_transcripts("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "exact_dedup_survivors": q_exact_dedup_survivors,
        "exact_dup_clusters": q_exact_dup_clusters,
        "near_dup_pairs_docs": q_near_dup_pairs_docs,
        "near_dup_pairs_oph": q_near_dup_pairs_oph,
        "near_dup_pairs_kperm": q_near_dup_pairs_kperm,
        "bag_near_dup_pairs": q_bag_near_dup_pairs,
        "bag_near_dup_pairs_icws": q_bag_near_dup_pairs_icws,
        "near_dup_clusters_docs": q_near_dup_clusters_docs,
        "cluster_common_tokens": q_cluster_common_tokens,
        "cluster_template_text": q_cluster_template_text,
        "near_dup_clusters_altstar": q_near_dup_clusters_altstar,
        "near_dup_clusters_incremental": q_near_dup_clusters_incremental,
        "cluster_cohesion": q_cluster_cohesion,
        "cluster_survivor_by_score": q_cluster_survivor_by_score,
        "leakage_safe_split": q_leakage_safe_split,
        "dup_pagerank": q_dup_pagerank,
        "cluster_medoids": q_cluster_medoids,
        "corpus_diff": q_corpus_diff,
        "event_dedup_window": q_event_dedup_window,
        "length_deciles": q_length_deciles,
        "source_similarity": q_source_similarity,
        "source_similarity_kmv": q_source_similarity_kmv,
        "stitch_candidates": q_stitch_candidates,
        "cap_duplicates": q_cap_duplicates,
        "blocklist_hits": q_blocklist_hits,
        "blocklist_hits_rk": q_blocklist_hits_rk,
        "blocklist_hits_ac": q_blocklist_hits_ac,
        "bbit_minhash_pairs": q_bbit_minhash_pairs,
        "typo_dedup_pairs": q_typo_dedup_pairs,
        "token_freq_spectrum": q_token_freq_spectrum,
        "max_repeat_len": q_max_repeat_len,
        "weighted_sample_docs": q_weighted_sample_docs,
        "normalized_dedup_groups": q_normalized_dedup_groups,
        "top_event_types_per_user": q_top_event_types_per_user,
        "kl_by_source": q_kl_by_source,
        "data_expectations": q_data_expectations,
        "bag_dup_groups": q_bag_dup_groups,
        "doc_containment_pairs": q_doc_containment_pairs,
        "token_entropy": q_token_entropy,
        "similar_docs_topk": q_similar_docs_topk,
        "temporal_novelty": q_temporal_novelty,
        "dup_rate_estimate": q_dup_rate_estimate,
        "soft_dedup_weights": q_soft_dedup_weights,
        "prepare_training_transcripts": q_prepare_training_transcripts,
        "conv_divergence": q_conv_divergence,
        "dup_flow_matrix": q_dup_flow_matrix,
        "snm_candidate_pairs": q_snm_candidate_pairs,
        "snm_multipass_pairs": q_snm_multipass_pairs,
        "label_centroid_similarity": q_label_centroid_similarity,
        "dedup_threshold_sweep": q_dedup_threshold_sweep,
        "near_dup_clusters_transcripts": q_near_dup_clusters_transcripts,
        "otmt_bytecount": q_otmt_bytecount,
        "otmt_wordcount_simple": q_otmt_wordcount_simple,
        "otmt_jaccard_simple": q_otmt_jaccard_simple,
        "otmt_sorensen_simple": q_otmt_sorensen_simple,
        "otmt_levenshtein_simple": q_otmt_levenshtein_simple,
        "otmt_nlevenshtein_simple": q_otmt_nlevenshtein_simple,
        "otmt_tfintersection_simple": q_otmt_tfintersection_simple,
        "otmt_raw_simhash": q_otmt_raw_simhash,
        "otmt_tf_simhash_simple": q_otmt_tf_simhash_simple,
        "otmt_cosine_simple": q_otmt_cosine_simple,
        "otmt_lsi_simple": q_otmt_lsi_simple,
        "otmt_lda": q_otmt_lda,
        "collection_jaccard": q_collection_jaccard,
        "top_terms_global": q_top_terms_global,
        "select_high_quality": q_select_high_quality,
        "select_by_language": q_select_by_language,
        "slice_events": q_slice_events,
        "decontaminate_docs": q_decontaminate_docs,
        "pack_sequences": q_pack_sequences,
        "redact_pii": q_redact_pii,
        "repetition_stats": q_repetition_stats,
        "sample_docs": q_sample_docs,
        "quota_sample_docs": q_quota_sample_docs,
        "topk_per_source": q_topk_per_source,
        "characteristic_terms": q_characteristic_terms,
        "length_percentiles": q_length_percentiles,
        "value_percentiles_by_type": q_value_percentiles_by_type,
        "fuzzy_decontam_transcripts": q_fuzzy_decontam_transcripts,
        "dedup_survivors_docs": q_dedup_survivors_docs,
        "inverted_index": q_inverted_index,
        "cross_corpus_matches": q_cross_corpus_matches,
        "ngram_novelty": q_ngram_novelty,
        "normalize_text": q_normalize_text,
        "token_counts": q_token_counts,
        "quality_scores": q_quality_scores,
        "ann_topk": q_ann_topk,
        "ann_topk_pq": q_ann_topk_pq,
        "ann_topk_ivf": q_ann_topk_ivf,
        "knn_self_join": q_knn_self_join,
        "bm25_topk": q_bm25_topk,
        "quantize_embeddings": q_quantize_embeddings,
        "kmeans_clusters": q_kmeans_clusters,
        "hard_negatives": q_hard_negatives,
        "embedding_near_pairs": q_embedding_near_pairs,
        "semantic_dedup": q_semantic_dedup,
        "dbscan_embeddings": q_dbscan_embeddings,
        "langid": q_langid,
        "chain_scan_transcripts": q_chain_scan_transcripts,
        "long_span_pairs": q_long_span_pairs,
        "simhash_near_docs": q_simhash_near_docs,
        "simhash_calibration": q_simhash_calibration,
        "fingerprints": q_fingerprints,
        "customers_without_recent_orders": q_customers_without_recent_orders,
        "pivot_event_counts": q_pivot_event_counts,
        "assemble_conversations": q_assemble_conversations,
        "funnel_click_purchase": q_funnel_click_purchase,
        "cumulative_distinct_users": q_cumulative_distinct_users,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_frames": q_multimodal_frames,
        "image_dup_groups": q_image_dup_groups,
        "image_near_dup_pairs": q_image_near_dup_pairs,
        "audio_dup_groups": q_audio_dup_groups,
        "video_dup_groups": q_video_dup_groups,
        "image_near_dup_clusters": q_image_near_dup_clusters,
        "audio_near_dup_pairs": q_audio_near_dup_pairs,
        "audio_near_dup_clusters": q_audio_near_dup_clusters,
        "video_near_dup_pairs": q_video_near_dup_pairs,
        "audio_shift_near_dup_pairs": q_audio_shift_near_dup_pairs,
        "multimodal_dup_clusters": q_multimodal_dup_clusters,
        "asof_clicks_purchases": q_asof_clicks_purchases,
        "asof_clicks_purchases_bucketed": q_asof_clicks_purchases_bucketed,
        "range_join_events": q_range_join_events,
        "range_join_events_bucketed": q_range_join_events_bucketed,
        "windowed_events": q_windowed_events,
        "sliding_window_events": q_sliding_window_events,
        "sessionize_events": q_sessionize_events,
        "session_stats": q_session_stats,
        "trim_length_outliers": q_trim_length_outliers,
        "chunk_documents": q_chunk_documents,
        "label_centroids": q_label_centroids,
        "running_qty_per_part": q_running_qty_per_part,
        "running_qty_per_part_bucketed": q_running_qty_per_part_bucketed,
        "rolling_order_spend": q_rolling_order_spend,
        "event_gaps": q_event_gaps,
        "event_transitions": q_event_transitions,
        "prefix_dup_groups": q_prefix_dup_groups,
        "transcript_integrity": q_transcript_integrity,
        "token_budget_mix": q_token_budget_mix,
        "conversation_stats": q_conversation_stats,
        "top_bigrams": q_top_bigrams,
        "pmi_bigrams": q_pmi_bigrams,
        "train_val_test_split": q_train_val_test_split,
        "vocab_coverage": q_vocab_coverage,
        "trim_context_window": q_trim_context_window,
        "drop_boilerplate_turns": q_drop_boilerplate_turns,
        "training_shards": q_training_shards,
        "stratified_sample_docs": q_stratified_sample_docs,
        "distinct_users_per_type": q_distinct_users_per_type,
        "mode_event_type_per_user": q_mode_event_type_per_user,
        "latest_event_per_user": q_latest_event_per_user,
        "corr_qty_price_by_flag": q_corr_qty_price_by_flag,
        "rollup_chars_by_source": q_rollup_chars_by_source,
        "length_histogram_by_source": q_length_histogram_by_source,
        "pricing_summary": q_pricing_summary,
        "revenue_by_nation": q_revenue_by_nation,
        "filtered_revenue": q_filtered_revenue,
        "top_unshipped_orders": q_top_unshipped_orders,
        "cluster_size_histogram": q_cluster_size_histogram,
        "exact_dup_rate_by_source": q_exact_dup_rate_by_source,
        "prototype_prune": q_prototype_prune,
        "upsample_mix": q_upsample_mix,
        "remove_dup_spans": q_remove_dup_spans,
        "cross_corpus_matches_bloom": q_cross_corpus_matches_bloom,
        "top_terms_global_sketch": q_top_terms_global_sketch,
        "set_sim_pairs_docs": q_set_sim_pairs_docs,
        "set_containment_pairs": q_set_containment_pairs,
        "heavy_hitter_tokens": q_heavy_hitter_tokens,
        "bag_containment_pairs": q_bag_containment_pairs,
        "bag_near_dup_clusters": q_bag_near_dup_clusters,
        "heavy_hitters_by_source": q_heavy_hitters_by_source,
        "conv_turn_edit_pairs": q_conv_turn_edit_pairs,
        "conv_turn_containment": q_conv_turn_containment,
        "unified_dedup_clusters": q_unified_dedup_clusters,
        "dedup_ablation_report": q_dedup_ablation_report,
        "cross_corpus_sim_pairs": q_cross_corpus_sim_pairs,
        "turn_dedup_in_conv": q_turn_dedup_in_conv,
        "near_dup_pair_edits": q_near_dup_pair_edits,
        "idf_weighted_near_pairs": q_idf_weighted_near_pairs,
        "conv_near_dup_pairs": q_conv_near_dup_pairs,
        "tiered_dedup_docs": q_tiered_dedup_docs,
        "tiered_semantic_docs": q_tiered_semantic_docs,
        "unigram_logppl": q_unigram_logppl,
        "bigram_logppl": q_bigram_logppl,
        "curate_docs": q_curate_docs,
        "dup_rate_by_source": q_dup_rate_by_source,
        "dup_rate_by_lang": q_dup_rate_by_lang,
        "length_drift_by_source": q_length_drift_by_source,
        "embedding_decontam": q_embedding_decontam,
        "priority_dedup": q_priority_dedup,
        "prefix_containment_convs": q_prefix_containment_convs,
        "tool_seq_clusters": q_tool_seq_clusters,
        "shard_manifest": q_shard_manifest,
        "line_dedup_docs": q_line_dedup_docs,
        "self_line_dedup_docs": q_self_line_dedup_docs,
        "dsir_logweights": q_dsir_logweights,
        "kcenter_coreset": q_kcenter_coreset,
        "dedup_method_agreement": q_dedup_method_agreement,
        "cdc_dup_stats": q_cdc_dup_stats,
        "hot_ngrams": q_hot_ngrams,
        "effective_tokens": q_effective_tokens,
        "incremental_dedup": q_incremental_dedup,
        "incremental_dedup_rolling": q_incremental_dedup_rolling,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_TOKENS_CTE = """
tokens AS (
    SELECT conv_id, turn_idx, t.tok
    FROM transcripts,
         UNNEST(regexp_extract_all(lower(text), '[0-9a-zA-Z_]+')) AS t(tok)
),
tokset AS (
    SELECT DISTINCT conv_id, turn_idx, tok FROM tokens
),
setsize AS (
    SELECT conv_id, turn_idx, count(*) AS n FROM tokset GROUP BY 1, 2
)
"""

# ordered token instances (position-preserving) for the sequence measures
_ORDERED_TOKENS_CTE = """
arrs AS (
    SELECT conv_id, turn_idx,
           regexp_extract_all(lower(text), '[0-9a-zA-Z_]+') AS arr
    FROM transcripts
),
tokpos AS (
    SELECT conv_id, turn_idx, CAST(t.i AS BIGINT) AS p, arr[t.i + 1] AS tok
    FROM arrs, UNNEST(range(len(arr))) AS t(i)
)
"""

# token-feature simhash per turn (md5-low64 per token, every occurrence
# votes weight 1, strict >0 bit rule — stages/measures.py:tf_simhash_batch);
# empty-token turns coalesce to simhash 0
_TF_SIMHASH_CTE = """
tfcnt AS (
    SELECT conv_id, turn_idx, tok, count(*) AS w FROM tokpos GROUP BY 1, 2, 3
),
tfhash AS (
    SELECT conv_id, turn_idx, w,
           CAST('0x' || substr(md5(tok), 17, 16) AS UBIGINT) AS h
    FROM tfcnt
),
tfvotes AS (
    SELECT conv_id, turn_idx, CAST(b.bit AS INTEGER) AS bit,
           sum(CASE WHEN (h >> CAST(b.bit AS UBIGINT)) & 1 = 1
               THEN w ELSE -w END) AS v
    FROM tfhash, UNNEST(range(64)) AS b(bit)
    GROUP BY 1, 2, 3
),
tfsh AS (
    SELECT conv_id, turn_idx,
           bit_or(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << bit
                       ELSE CAST(0 AS UBIGINT) END) AS sh
    FROM tfvotes GROUP BY 1, 2
),
allsh AS (
    SELECT t.conv_id, t.turn_idx, coalesce(x.sh, CAST(0 AS UBIGINT)) AS sh
    FROM transcripts t
    LEFT JOIN tfsh x ON x.conv_id = t.conv_id AND x.turn_idx = t.turn_idx
)
"""

# token sequences of member and anchor encoded as single-byte-per-token
# strings with a PER-PAIR local alphabet, so DuckDB's (byte-based)
# levenshtein() equals the engine's token-level edit distance. Tokens only
# matter up to equality within one (anchor, member) pair, and the max
# per-pair distinct-token vocabulary in the test tables is 31 (measured at
# sf0.1) — far under the 126 single-byte codepoints chr(1..126).
_LEV_ENC_CTE = """
pairtok AS (
    SELECT m.conv_id, m.turn_idx, 0 AS side, p.p, p.tok
    FROM arrs m JOIN tokpos p
      ON p.conv_id = m.conv_id AND p.turn_idx = m.turn_idx
    UNION ALL
    SELECT m.conv_id, m.turn_idx, 1, p.p, p.tok
    FROM arrs m JOIN tokpos p
      ON p.conv_id = m.conv_id AND p.turn_idx = 0
),
ranked AS (
    SELECT conv_id, turn_idx, side, p,
           dense_rank() OVER (PARTITION BY conv_id, turn_idx
                              ORDER BY tok) AS r
    FROM pairtok
),
enc AS (
    SELECT conv_id, turn_idx,
           coalesce(string_agg(CASE WHEN side = 0
               THEN chr(CAST(r AS INTEGER)) END, '' ORDER BY p), '') AS s_m,
           coalesce(string_agg(CASE WHEN side = 1
               THEN chr(CAST(r AS INTEGER)) END, '' ORDER BY p), '') AS s_a
    FROM ranked GROUP BY 1, 2
)
"""

# 3-word shingle set per doc with the simple tokenizer (mirrors
# full_tokenize(stemming=False, remove_stopwords=False) + word_shingles;
# DuckDB 1.0 lacks WITH ORDINALITY → list_transform over index ranges)
_DOC_SHINGLES_CTE = """
-- near-dup pairs are defined BETWEEN exact-text representatives
-- (min doc_id per identical text), mirroring the engine contract:
-- exact-dup members collapse in exact_dedup and reattach at CLUSTERING,
-- so the pairs operator never emits member pairs (identical-text pairs
-- are exact pairs, not near pairs)
doc_reps AS (
    SELECT min(CAST(doc_id AS VARCHAR)) AS rep FROM documents GROUP BY text
),
arrs AS (
    SELECT doc_id,
           regexp_extract_all(lower(text), '[0-9a-zA-Z_]+') AS arr
    FROM documents
    WHERE CAST(doc_id AS VARCHAR) IN (SELECT rep FROM doc_reps)
),
shingle_lists AS (
    -- docs with > 3 tokens: sliding 3-grams; docs with 1..3 tokens: one
    -- shingle of all tokens (word_shingles short-doc rule); 0 tokens: none
    SELECT doc_id,
           CASE WHEN len(arr) > 3 THEN
               list_transform(range(len(arr) - 2),
                   i -> arr[i + 1] || ' ' || arr[i + 2] || ' ' || arr[i + 3])
           ELSE [array_to_string(arr, ' ')] END AS shl
    FROM arrs WHERE len(arr) > 0
),
shingles AS (
    SELECT DISTINCT doc_id, s.sh
    FROM shingle_lists, UNNEST(shl) AS s(sh)
),
shsize AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
pair_common AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
    FROM shingles a JOIN shingles b
      ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
near_pairs AS (
    SELECT p.a_id, p.b_id,
           CAST(p.c AS DOUBLE) / (sa.n + sb.n - p.c) AS jaccard
    FROM pair_common p
    JOIN shsize sa ON sa.doc_id = p.a_id
    JOIN shsize sb ON sb.doc_id = p.b_id
    WHERE CAST(p.c AS DOUBLE) / (sa.n + sb.n - p.c) >= 0.8
)
"""

# Connected-component clustering over the dup graph (exact-text cliques +
# near_pairs edges), shared by every cluster-consuming oracle. Requires
# _DOC_SHINGLES_CTE spliced first and a RECURSIVE WITH head. Yields
# ``clust (row_key, cluster_id)``.
_DOC_CLUSTERS_CTE = """
exact_edges AS (
    SELECT CAST(a.doc_id AS VARCHAR) AS a_key,
           CAST(b.doc_id AS VARCHAR) AS b_key
    FROM documents a JOIN documents b
      ON a.text = b.text AND a.doc_id <> b.doc_id
),
near_edges AS (
    SELECT CAST(a_id AS VARCHAR) AS a_key,
           CAST(b_id AS VARCHAR) AS b_key
    FROM near_pairs
),
edges AS (
    SELECT a_key, b_key FROM exact_edges
    UNION SELECT b_key, a_key FROM exact_edges
    UNION SELECT a_key, b_key FROM near_edges
    UNION SELECT b_key, a_key FROM near_edges
),
reach(node, r) AS (
    SELECT CAST(doc_id AS VARCHAR), CAST(doc_id AS VARCHAR)
    FROM documents
    UNION
    SELECT reach.node, edges.b_key
    FROM reach JOIN edges ON reach.r = edges.a_key
),
clust AS (
    SELECT node AS row_key, min(r) AS cluster_id
    FROM reach GROUP BY node
)
"""


def _dup_pagerank_sql(iters: int = 3, scale: int = 10 ** 12) -> str:
    """Unrolled integer PageRank recurrence (stages/graph.py contract):
    floor division everywhere, BIGINT casts around DuckDB's
    sum(BIGINT) -> HUGEINT widening. Edges mirror the engine's star
    form (member<->rep per exact-text group, not the clique) + the
    shared near_pairs CTE, UNION ALL'd in both directions."""
    body = f"""
        WITH {_DOC_SHINGLES_CTE},
        star AS (
            SELECT CAST(d.doc_id AS VARCHAR) AS a, r.rep AS b
            FROM documents d
            JOIN (SELECT text, min(CAST(doc_id AS VARCHAR)) AS rep
                  FROM documents GROUP BY text) r ON d.text = r.text
            WHERE CAST(d.doc_id AS VARCHAR) <> r.rep
        ),
        nedges AS (
            SELECT CAST(a_id AS VARCHAR) AS a, CAST(b_id AS VARCHAR) AS b
            FROM near_pairs
        ),
        edges AS (
            SELECT a, b FROM star UNION ALL SELECT b, a FROM star
            UNION ALL SELECT a, b FROM nedges
            UNION ALL SELECT b, a FROM nedges
        ),
        deg AS (SELECT a AS node, count(*) AS d FROM edges GROUP BY 1),
        nn AS (SELECT count(*) AS n FROM documents),
        allnodes AS (SELECT CAST(doc_id AS VARCHAR) AS node FROM documents),
        r0 AS (SELECT node, {scale} // (SELECT n FROM nn) AS r
               FROM allnodes)"""
    prev = "r0"
    for k in range(1, iters + 1):
        body += f""",
        s{k} AS (
            SELECT e.b AS node,
                   CAST(sum({prev}.r // deg.d) AS BIGINT) AS s
            FROM edges e
            JOIN {prev} ON {prev}.node = e.a
            JOIN deg ON deg.node = e.a
            GROUP BY 1
        ),
        r{k} AS (
            SELECT a.node,
                   (15 * {scale}) // (100 * (SELECT n FROM nn))
                   + (85 * coalesce(s{k}.s, 0)) // 100 AS r
            FROM allnodes a LEFT JOIN s{k} ON s{k}.node = a.node
        )"""
        prev = f"r{k}"
    return body + f"""
        SELECT node AS row_key, CAST(r AS BIGINT) AS pr FROM {prev}
    """


def _cluster_medoids_sql(scale: int = 10 ** 12) -> str:
    """Medoid mirror: pairwise common-shingle counts between same-cluster
    reps, per-pair (scale*c) // (n_a + n_b - c) floor-division scores
    (exact BIGINT both sides), argmax per cluster with min-key tie-break
    via row_number."""
    return f"""
        WITH RECURSIVE {_DOC_SHINGLES_CTE}, {_DOC_CLUSTERS_CTE},
        rep_clust AS (
            SELECT c.row_key, c.cluster_id FROM clust c
            WHERE c.row_key IN (SELECT rep FROM doc_reps)
        ),
        pc2 AS (
            SELECT ra.row_key AS a, rb.row_key AS b, count(*) AS c
            FROM rep_clust ra
            JOIN rep_clust rb ON ra.cluster_id = rb.cluster_id
                             AND ra.row_key <> rb.row_key
            JOIN shingles sa ON CAST(sa.doc_id AS VARCHAR) = ra.row_key
            JOIN shingles sb ON CAST(sb.doc_id AS VARCHAR) = rb.row_key
                            AND sb.sh = sa.sh
            GROUP BY 1, 2
        ),
        pair_scores AS (
            SELECT p.a, ({scale} * p.c) // (na.n + nb.n - p.c) AS ps
            FROM pc2 p
            JOIN shsize na ON CAST(na.doc_id AS VARCHAR) = p.a
            JOIN shsize nb ON CAST(nb.doc_id AS VARCHAR) = p.b
        ),
        agg AS (SELECT a, CAST(sum(ps) AS BIGINT) AS score
                FROM pair_scores GROUP BY 1),
        scores AS (
            SELECT rc.cluster_id, rc.row_key,
                   coalesce(g.score, CAST(0 AS BIGINT)) AS score
            FROM rep_clust rc LEFT JOIN agg g ON g.a = rc.row_key
        )
        SELECT cluster_id, row_key AS medoid_key, score
        FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
                  ORDER BY score DESC, row_key ASC) AS rn FROM scores)
        WHERE rn = 1
    """


def _leakage_safe_split_sql() -> str:
    """Cluster-consistent split mirror: the split_assign md5/2^60
    contract keyed by cluster_id instead of doc_id, so every member of
    a near-dup cluster lands in the same split."""
    from raydedup.stages.textstats import split_thresholds

    names, cuts = split_thresholds()
    case = f"WHEN h < {cuts[0]} THEN '{names[0]}' " \
           f"WHEN h < {cuts[1]} THEN '{names[1]}' ELSE '{names[2]}' END"
    return f"""
        WITH RECURSIVE {_DOC_SHINGLES_CTE}, {_DOC_CLUSTERS_CTE}
        SELECT row_key, cluster_id, CASE {case} AS split
        FROM (
            SELECT row_key, cluster_id,
                   CAST(('0x' || substr(md5('s0:' || cluster_id), 1, 15))
                   AS UBIGINT) AS h
            FROM clust
        )
    """

_STOPWORD_LIST = ", ".join(
    "'" + w.replace("'", "''") + "'" for w in sorted(STOPWORDS)
)

# Literal Porter-stem lookup for the CLOSED testdata vocabulary: the
# scalar stemmer (textnorm.porter_stem, golden-tested against the Porter
# 1980 paper) is not SQL-expressible, so stemmed-config oracles embed its
# output for the 31 words that occur in /root/testdata documents.
# tests/test_registry_misc.py asserts (a) every entry equals porter_stem
# and (b) the testdata vocabulary is covered; an uncovered word falls
# through AS-IS in SQL, which fails the gate loudly rather than silently.
_PORTER_SQL_STEMS = {
    "a": "a", "agg": "agg", "batch": "batch", "big": "big",
    "column": "column", "customer": "custom", "data": "data", "dup": "dup",
    "fast": "fast", "filter": "filter", "group": "group", "hash": "hash",
    "join": "join", "key": "kei", "line": "line", "merge": "merg",
    "order": "order", "part": "part", "query": "queri", "row": "row",
    "scan": "scan", "slow": "slow", "small": "small", "sort": "sort",
    "spark": "spark", "stream": "stream", "table": "tabl", "the": "the",
    "value": "valu", "vector": "vector", "window": "window",
}

_STEM_CASE = "CASE t " + " ".join(
    f"WHEN '{w}' THEN '{s}'"
    for w, s in sorted(_PORTER_SQL_STEMS.items()) if w != s
) + " ELSE t END"


def _simhash_cte(src: str, key_expr: str) -> str:
    """CTE chain computing the reference-parity 64-bit simhash
    (lowercase, strip non-word chars, width-4 char shingles, md5 low-64,
    strict >0 weighted bit vote — functions/simhash.py) for every row of
    ``src``; yields ``simhashes(sh_key, simhash)``. Parity asserted by
    tests and the hash-green driver rows that consume it."""
    return f"""
sh_prep AS (
    SELECT {key_expr} AS sh_key,
           coalesce(array_to_string(
               regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+'), ''), '')
               AS content
    FROM {src}
),
sh_lists AS (
    SELECT sh_key,
           CASE WHEN length(content) <= 4 THEN [content]
                ELSE list_transform(range(length(content) - 3),
                                    i -> substr(content, i + 1, 4)) END AS shl
    FROM sh_prep
),
sh_inst AS (SELECT sh_key, s.g FROM sh_lists, UNNEST(shl) AS s(g)),
sh_cnt AS (SELECT sh_key, g, count(*) AS w FROM sh_inst GROUP BY 1, 2),
sh_hash AS (
    SELECT sh_key, w,
           CAST('0x' || substr(md5(g), 17, 16) AS UBIGINT) AS h
    FROM sh_cnt
),
sh_votes AS (
    SELECT sh_key, CAST(b.bit AS INTEGER) AS bit,
           sum(CASE WHEN (h >> CAST(b.bit AS UBIGINT)) & 1 = 1
               THEN w ELSE -w END) AS v
    FROM sh_hash, UNNEST(range(64)) AS b(bit)
    GROUP BY 1, 2
),
simhashes AS (
    SELECT sh_key,
           bit_or(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << bit
                       ELSE CAST(0 AS UBIGINT) END) AS simhash
    FROM sh_votes GROUP BY 1
)
"""


def _langid_sql() -> str:
    """SQL mirror of stages/textstats.py LangId: script ranges over the
    first 400 chars, then distinct-marker-word hit counts with
    first-maximal tie-break in the fixed language order."""
    from raydedup.stages.textstats import LANG_MARKERS, LANG_SCRIPTS

    langs = list(LANG_MARKERS)
    hit_cols = []
    for lang in langs:
        lst = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        hit_cols.append(f"len(list_intersect(w, [{lst}])) AS h_{lang}")
    script_cases = "\n".join(
        f"        WHEN regexp_matches(head, '[{lo}-{hi}]') THEN '{lang}'"
        for lang, lo, hi in LANG_SCRIPTS
    )
    all_hits = ", ".join(f"h_{lang}" for lang in langs)
    tie_cases = []
    for i, lang in enumerate(langs[:-1]):
        rest = ", ".join(f"h_{l2}" for l2 in langs[i + 1:])
        greatest = f"greatest({rest})" if "," in rest else rest
        tie_cases.append(f"        WHEN h_{lang} >= {greatest} THEN '{lang}'")
    tie = "\n".join(tie_cases)
    return f"""
        WITH words AS (
            SELECT doc_id,
                   list_distinct(regexp_extract_all(
                       lower(text), '[a-zà-ÿäöüß]+')) AS w,
                   substr(text, 1, 400) AS head
            FROM documents
        ),
        hits AS (
            SELECT doc_id, head, {", ".join(hit_cols)}
            FROM words
        )
        SELECT doc_id, CASE
{script_cases}
        WHEN greatest({all_hits}) = 0 THEN 'unknown'
{tie}
        ELSE '{langs[-1]}' END AS detected_lang
        FROM hits
    """


def _fingerprints_sql() -> str:
    """SQL mirror of stages/textstats.py fingerprints: rolling polynomial
    k-gram hash (B=1000003 mod 2^64, k=32), min per 64-wide window,
    distinct-min count per doc. Powers are precomputed modpow constants;
    per-gram sums stay in HUGEINT (< 2^77) before the mod."""
    k, window, b = 32, 64, 1000003
    pw_vals = ", ".join(
        f"({j}, CAST('{pow(b, k - 1 - j, 1 << 64)}' AS UBIGINT))"
        for j in range(k)
    )
    return f"""
        WITH bytes AS (
            SELECT doc_id, CAST(t.i AS BIGINT) AS i,
                   ascii(substr(text, CAST(t.i + 1 AS INTEGER), 1)) AS b
            FROM documents, UNNEST(range(length(text))) AS t(i)
        ),
        pw(j, p) AS (VALUES {pw_vals}),
        grams AS (
            SELECT b.doc_id, b.i - p.j AS pos,
                   CAST(sum(CAST(b.b AS HUGEINT) * CAST(p.p AS HUGEINT))
                        % CAST('18446744073709551616' AS HUGEINT)
                        AS UBIGINT) AS h
            FROM bytes b JOIN pw p ON b.i - p.j >= 0
            GROUP BY 1, 2 HAVING count(*) = {k}
        ),
        wm AS (
            SELECT doc_id, pos,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN CURRENT ROW
                                AND {window - 1} FOLLOWING) AS mh,
                   count(*) OVER (PARTITION BY doc_id) AS ng
            FROM grams
        )
        SELECT d.doc_id, count(DISTINCT w.mh) AS n_fingerprints
        FROM documents d
        LEFT JOIN (SELECT doc_id, mh FROM wm
                   WHERE pos <= greatest(ng - {window}, 0)) w
          ON w.doc_id = d.doc_id
        GROUP BY 1
    """


def _long_span_sql(span: int) -> str:
    """Pairs sharing a verbatim span >= ``span`` chars, with the exact
    longest-common-substring length: matched span-grams on a (pos_a -
    pos_b) diagonal form gaps-and-islands runs; LCS = span + maxrun - 1."""
    return f"""
        WITH grams AS (
            SELECT CAST(doc_id AS VARCHAR) AS key, CAST(t.i AS BIGINT) AS pos,
                   substr(text, CAST(t.i + 1 AS INTEGER), {span}) AS g
            FROM documents,
                 UNNEST(range(greatest(length(text) - {span - 1}, 0))) AS t(i)
        ),
        m AS (
            SELECT a.key AS a_key, b.key AS b_key, a.pos AS i,
                   a.pos - b.pos AS diag
            FROM grams a JOIN grams b ON a.g = b.g AND a.key < b.key
        ),
        runs AS (
            SELECT a_key, b_key, diag, i,
                   i - row_number() OVER (PARTITION BY a_key, b_key, diag
                                          ORDER BY i) AS grp
            FROM m
        ),
        spans AS (
            SELECT a_key, b_key, max(cnt) AS maxrun FROM (
                SELECT a_key, b_key, diag, grp, count(*) AS cnt
                FROM runs GROUP BY 1, 2, 3, 4
            ) GROUP BY 1, 2
        )
        SELECT a_key, b_key, CAST({span - 1} + maxrun AS BIGINT) AS span_len
        FROM spans
    """


def _split_sql() -> str:
    """Mirror of split_assign's thresholds (same ints both sides)."""
    from raydedup.stages.textstats import split_thresholds

    names, cuts = split_thresholds()
    case = f"WHEN h < {cuts[0]} THEN '{names[0]}' " \
           f"WHEN h < {cuts[1]} THEN '{names[1]}' ELSE '{names[2]}' END"
    return f"""
        SELECT doc_id, CASE {case} AS split
        FROM (
            SELECT doc_id,
                   CAST(('0x' || substr(
                       md5('s0:' || CAST(doc_id AS VARCHAR)), 1, 15))
                   AS UBIGINT) AS h
            FROM documents
        )
    """


_SPLIT_SQL = _split_sql()


def _training_shards_sql() -> str:
    """Composition oracle: assemble → train split → recursive-CTE pack
    (same scan rule as the pack_sequences oracle, budget 512, 4 parts;
    conv key = numeric suffix of 'conv-<n>')."""
    from raydedup.stages.textstats import split_thresholds

    _, cuts = split_thresholds()
    head = TRANSCRIPTS_SQL.replace("WITH transcripts",
                                   "WITH RECURSIVE transcripts", 1)
    return head + f"""
        , conv AS (
            SELECT conv_id,
                   string_agg(text, ' ' ORDER BY turn_idx) AS convo
            FROM transcripts GROUP BY 1
        ), tr AS (
            SELECT CAST(substr(conv_id, 6) AS BIGINT) AS conv_num, convo
            FROM (
                SELECT conv_id, convo,
                       CAST(('0x' || substr(md5('s0:' || conv_id), 1, 15))
                            AS UBIGINT) AS h
                FROM conv
            ) WHERE h < {cuts[0]}
        ), counts AS (
            SELECT conv_num, conv_num % 4 AS part,
                   len(regexp_extract_all(convo, '\\S+')) AS ws_tokens
            FROM tr
        ), ordered AS (
            SELECT conv_num, part, ws_tokens,
                   row_number() OVER (PARTITION BY part
                                      ORDER BY conv_num) AS rn
            FROM counts
        ), scan(part, rn, conv_num, ws_tokens, acc, pack) AS (
            SELECT part, rn, conv_num, ws_tokens, ws_tokens, 0
            FROM ordered WHERE rn = 1
            UNION ALL
            SELECT o.part, o.rn, o.conv_num, o.ws_tokens,
                   CASE WHEN s.acc + o.ws_tokens > 512
                        THEN o.ws_tokens
                        ELSE s.acc + o.ws_tokens END,
                   CASE WHEN s.acc + o.ws_tokens > 512
                        THEN s.pack + 1 ELSE s.pack END
            FROM scan s
            JOIN ordered o ON o.part = s.part AND o.rn = s.rn + 1
        )
        SELECT conv_num, part, part * 4294967296 + pack AS pack_id,
               ws_tokens
        FROM scan
    """


# Shared tier-1/tier-2 CTE chain for the tiered-cascade oracles:
# window exact groups over text, brute-force 3-word-shingle Jaccard
# >= 0.5 over exact reps, recursive-CTE min-label components (see
# q_tiered_dedup_docs docstring for the hashing-vs-string contract).
_TIERED_CTES = """
            WITH RECURSIVE g AS (
                SELECT doc_id, text,
                       min(doc_id) OVER (PARTITION BY text) AS exact_rep,
                       count(*) OVER (PARTITION BY text) AS n_exact
                FROM documents
            ),
            reps AS (SELECT doc_id, text FROM g WHERE doc_id = exact_rep),
            arrs AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[0-9a-zA-Z_]+')
                           AS arr
                FROM reps
            ),
            sl AS (
                SELECT doc_id,
                       CASE WHEN len(arr) > 3 THEN
                           list_transform(range(len(arr) - 2),
                               i -> arr[i + 1] || ' ' || arr[i + 2]
                                    || ' ' || arr[i + 3])
                       ELSE [array_to_string(arr, ' ')] END AS shl
                FROM arrs WHERE len(arr) > 0
            ),
            sh AS (SELECT DISTINCT doc_id, s.sh
                   FROM sl, UNNEST(shl) AS s(sh)),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
                FROM sh a JOIN sh b
                  ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            pairs AS (
                SELECT i.a_id, i.b_id
                FROM inter i
                JOIN sz x ON x.doc_id = i.a_id
                JOIN sz y ON y.doc_id = i.b_id
                WHERE CAST(i.c AS DOUBLE) / (x.n + y.n - i.c) >= 0.5
            ),
            edges AS (
                SELECT a_id, b_id FROM pairs
                UNION SELECT b_id AS a_id, a_id AS b_id FROM pairs
            ),
            reach(node, r) AS (
                SELECT doc_id, doc_id FROM reps
                UNION
                SELECT reach.node, edges.b_id
                FROM reach JOIN edges ON reach.r = edges.a_id
            ),
            comp AS (SELECT node, min(r) AS root FROM reach GROUP BY node)
"""


# curate_docs oracle = the tiered CTE chain re-rooted onto the
# rule-filtered corpus (text substitution below), plus the tier-3 and
# LM tails. Substitution order matters: "FROM documents" (g's only
# occurrence) is rewritten BEFORE the prelude (which itself reads
# documents) is spliced in.
_CURATE_PRELUDE = """
            WITH RECURSIVE toks0 AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text),
                                                 '[0-9a-zA-Z_]+')) AS tok
                FROM documents
            ),
            tf0 AS (SELECT doc_id, tok, count(*) AS tf
                    FROM toks0 GROUP BY 1, 2),
            agg0 AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words,
                            CAST(max(tf) AS BIGINT) AS max_tf
                     FROM tf0 GROUP BY 1),
            qdocs AS (
                SELECT d.doc_id, d.text, a.n_words, a.max_tf
                FROM documents d JOIN agg0 a USING (doc_id)
                WHERE a.n_words BETWEEN 25 AND 90
                  AND a.max_tf * 5 <= a.n_words
            ),
            g AS"""

_CURATE_TAIL = """,
            surv AS (SELECT node FROM comp WHERE root = node),
            spairs AS (
                SELECT a.vec_id AS a_id, b.vec_id AS b_id
                FROM embeddings a
                JOIN embeddings b ON a.vec_id < b.vec_id
                JOIN surv sa ON sa.node = a.vec_id
                JOIN surv sb ON sb.node = b.vec_id
                WHERE list_cosine_similarity(
                          CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) >= 0.35
            ),
            sedges AS (
                SELECT a_id, b_id FROM spairs
                UNION SELECT b_id AS a_id, a_id AS b_id FROM spairs
            ),
            reach3(node, r) AS (
                SELECT node, node FROM surv
                UNION
                SELECT reach3.node, sedges.b_id
                FROM reach3 JOIN sedges ON reach3.r = sedges.a_id
            ),
            comp3 AS (SELECT node, min(r) AS root FROM reach3
                      GROUP BY node),
            tfq AS (SELECT t.doc_id, t.tok, t.tf
                    FROM tf0 t JOIN qdocs q USING (doc_id)),
            cnt AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS c
                    FROM tfq GROUP BY 1),
            tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
            per AS (
                SELECT t.doc_id,
                       sum(t.tf * ln(CAST(c.c AS DOUBLE))) AS s,
                       CAST(sum(t.tf) AS BIGINT) AS nd
                FROM tfq t JOIN cnt c USING (tok) GROUP BY 1
            )
            SELECT c3.node AS doc_id, q.n_words, q.max_tf,
                   round(ln(CAST(tot.n AS DOUBLE)) - p.s / p.nd,
                         {round}) AS logppl
            FROM comp3 c3
            JOIN qdocs q ON q.doc_id = c3.node
            JOIN per p ON p.doc_id = c3.node
            CROSS JOIN tot
            WHERE c3.root = c3.node
        """


def _shingle_ctes(pfx: str, src: str, id_expr: str) -> str:
    """CTE fragment: ``{pfx}_sh (id, sh)`` distinct word-3-shingles and
    ``{pfx}_n (id, n)`` set sizes for table ``src`` — the shared
    shingle rule of the near-dup oracles (short-doc single shingle,
    zero-token docs excluded)."""
    return f"""
            {pfx}_arrs AS (
                SELECT {id_expr} AS id,
                       regexp_extract_all(lower(text),
                                          '[0-9a-zA-Z_]+') AS arr
                FROM {src}
            ),
            {pfx}_shl AS (
                SELECT id,
                       CASE WHEN len(arr) > 3 THEN
                           list_transform(range(len(arr) - 2),
                               i -> arr[i + 1] || ' ' || arr[i + 2]
                                    || ' ' || arr[i + 3])
                       ELSE [array_to_string(arr, ' ')] END AS shl
                FROM {pfx}_arrs WHERE len(arr) > 0
            ),
            {pfx}_sh AS (
                SELECT DISTINCT id, s.sh
                FROM {pfx}_shl, UNNEST(shl) AS s(sh)
            ),
            {pfx}_n AS (SELECT id, count(*) AS n FROM {pfx}_sh
                        GROUP BY 1)"""


def _oracle_sql_base() -> dict[str, str]:
    return {
        "exact_dedup_survivors": """
            SELECT min(CAST(doc_id AS VARCHAR)) AS row_key
            FROM documents GROUP BY text
        """,
        "exact_dup_clusters": """
            SELECT CAST(doc_id AS VARCHAR) AS row_key,
                   CASE WHEN count(*) OVER (PARTITION BY text) >= 2
                        THEN min(CAST(doc_id AS VARCHAR)) OVER (PARTITION BY text)
                        ELSE '-1' END AS cluster_id,
                   CAST(count(*) OVER (PARTITION BY text) AS INTEGER)
                       AS cluster_size
            FROM documents
        """,
        "bag_near_dup_pairs": f"""
            WITH bag_reps AS (
                SELECT min(CAST(doc_id AS VARCHAR)) AS rep
                FROM documents GROUP BY text
            ),
            arrs AS (
                SELECT CAST(doc_id AS VARCHAR) AS id,
                       regexp_extract_all(lower(text),
                                          '[0-9a-zA-Z_]+') AS arr
                FROM documents
                WHERE CAST(doc_id AS VARCHAR) IN (SELECT rep FROM bag_reps)
            ),
            toks AS (SELECT id, t.t FROM arrs, UNNEST(arr) AS t(t)),
            cnts AS (SELECT id, t, count(*) AS c FROM toks GROUP BY 1, 2),
            tot AS (SELECT id, sum(c) AS n FROM cnts GROUP BY 1),
            inter AS (
                SELECT a.id AS ai, b.id AS bi, sum(least(a.c, b.c)) AS m
                FROM cnts a JOIN cnts b ON a.t = b.t AND a.id < b.id
                GROUP BY 1, 2
            )
            SELECT ai AS a_key, bi AS b_key,
                   round(CAST(m AS DOUBLE) / (x.n + y.n - m), {_ROUND})
                       AS jaccard
            FROM inter
            JOIN tot x ON x.id = ai JOIN tot y ON y.id = bi
            WHERE CAST(m AS DOUBLE) / (x.n + y.n - m) >= 0.8
        """,
        "near_dup_pairs_docs": f"""
            WITH {_DOC_SHINGLES_CTE}
            SELECT CAST(a_id AS VARCHAR) AS a_key,
                   CAST(b_id AS VARCHAR) AS b_key,
                   round(jaccard, {_ROUND}) AS jaccard
            FROM near_pairs
            WHERE CAST(a_id AS VARCHAR) < CAST(b_id AS VARCHAR)
            UNION ALL
            SELECT CAST(b_id AS VARCHAR), CAST(a_id AS VARCHAR),
                   round(jaccard, {_ROUND})
            FROM near_pairs
            WHERE CAST(b_id AS VARCHAR) < CAST(a_id AS VARCHAR)
        """,
        "source_similarity": f"""
            WITH arrs AS (
                SELECT source,
                       regexp_extract_all(lower(text),
                                          '[0-9a-zA-Z_]+') AS arr
                FROM documents
            ),
            gl AS (
                SELECT source,
                       list_transform(range(len(arr) - 2),
                           i -> arr[i + 1] || ' ' || arr[i + 2] || ' '
                                || arr[i + 3]) AS l
                FROM arrs WHERE len(arr) >= 3
            ),
            grams AS (SELECT DISTINCT source, g.g FROM gl,
                      UNNEST(l) AS g(g)),
            sz AS (SELECT source, count(*) AS n FROM grams GROUP BY source),
            co AS (
                SELECT a.source AS sa, b.source AS sb, count(*) AS c
                FROM grams a JOIN grams b
                  ON a.g = b.g AND a.source < b.source
                GROUP BY 1, 2
            )
            SELECT x.source AS source_a, y.source AS source_b,
                   x.n AS n_a, y.n AS n_b,
                   coalesce(co.c, 0) AS n_common,
                   round(CAST(coalesce(co.c, 0) AS DOUBLE)
                         / (x.n + y.n - coalesce(co.c, 0)),
                         {_ROUND}) AS jaccard
            FROM sz x JOIN sz y ON x.source < y.source
            LEFT JOIN co ON co.sa = x.source AND co.sb = y.source
        """,
        "source_similarity_kmv": f"""
            WITH arrs AS (
                SELECT source,
                       regexp_extract_all(lower(text),
                                          '[0-9a-zA-Z_]+') AS arr
                FROM documents
            ),
            gl AS (
                SELECT source,
                       list_transform(range(len(arr) - 2),
                           i -> arr[i + 1] || ' ' || arr[i + 2] || ' '
                                || arr[i + 3]) AS l
                FROM arrs WHERE len(arr) >= 3
            ),
            grams AS (SELECT DISTINCT source, g.g FROM gl,
                      UNNEST(l) AS g(g)),
            hs AS (SELECT DISTINCT source,
                          CAST('0x' || substr(md5(g), 17, 16) AS UBIGINT)
                              AS h
                   FROM grams),
            sk AS (SELECT source, h FROM (
                     SELECT source, h,
                            row_number() OVER (PARTITION BY source
                                               ORDER BY h) AS rn
                     FROM hs) WHERE rn <= 256),
            ps AS (SELECT DISTINCT source FROM sk),
            pairs AS (SELECT a.source AS sa, b.source AS sb
                      FROM ps a JOIN ps b ON a.source < b.source),
            u AS (SELECT p.sa, p.sb, s.h
                  FROM pairs p JOIN sk s
                    ON s.source = p.sa OR s.source = p.sb
                  GROUP BY 1, 2, 3),
            uk AS (SELECT sa, sb, h FROM (
                     SELECT sa, sb, h,
                            row_number() OVER (PARTITION BY sa, sb
                                               ORDER BY h) AS rn
                     FROM u) WHERE rn <= 256),
            inter AS (SELECT uk.sa, uk.sb, count(*) AS c
                      FROM uk
                      JOIN sk x ON x.source = uk.sa AND x.h = uk.h
                      JOIN sk y ON y.source = uk.sb AND y.h = uk.h
                      GROUP BY 1, 2),
            usz AS (SELECT sa, sb, count(*) AS ku FROM uk GROUP BY 1, 2)
            SELECT z.sa AS source_a, z.sb AS source_b,
                   CAST(z.ku AS BIGINT) AS k_union,
                   CAST(coalesce(i.c, 0) AS BIGINT) AS n_inter,
                   round(CAST(coalesce(i.c, 0) AS DOUBLE) / z.ku,
                         {_ROUND}) AS jaccard_est
            FROM usz z LEFT JOIN inter i
              ON i.sa = z.sa AND i.sb = z.sb
        """,
        "prepare_training_transcripts": TRANSCRIPTS_SQL.replace(
            "WITH transcripts", "WITH RECURSIVE transcripts", 1) + """,
            conv AS (
                SELECT conv_id,
                       string_agg(text, chr(10) ORDER BY turn_idx)
                           AS conv_text
                FROM transcripts GROUP BY conv_id
            ),
            arrs AS (
                SELECT conv_id,
                       regexp_extract_all(lower(conv_text),
                                          '[0-9a-zA-Z_]+') AS arr
                FROM conv
            ),
            sl AS (
                SELECT conv_id,
                       CASE WHEN len(arr) > 3 THEN
                           list_transform(range(len(arr) - 2),
                               i -> arr[i + 1] || ' ' || arr[i + 2]
                                    || ' ' || arr[i + 3])
                       ELSE [array_to_string(arr, ' ')] END AS shl
                FROM arrs WHERE len(arr) > 0
            ),
            sh AS (SELECT DISTINCT conv_id, s.sh
                   FROM sl, UNNEST(shl) AS s(sh)),
            sz AS (SELECT conv_id, count(*) AS n FROM sh GROUP BY 1),
            np AS (
                SELECT i.a_id, i.b_id
                FROM (SELECT a.conv_id AS a_id, b.conv_id AS b_id,
                             count(*) AS c
                      FROM sh a JOIN sh b
                        ON a.sh = b.sh AND a.conv_id < b.conv_id
                      GROUP BY 1, 2) i
                JOIN sz x ON x.conv_id = i.a_id
                JOIN sz y ON y.conv_id = i.b_id
                WHERE CAST(i.c AS DOUBLE) / (x.n + y.n - i.c) >= 0.1
            ),
            edges AS (SELECT a_id AS a, b_id AS b FROM np
                      UNION SELECT b_id, a_id FROM np),
            reach(node, r) AS (
                SELECT conv_id, conv_id FROM conv
                UNION
                SELECT reach.node, edges.b
                FROM reach JOIN edges ON reach.r = edges.a
            ),
            clust AS (SELECT node, min(r) AS label
                      FROM reach GROUP BY node),
            surv AS (
                SELECT c.conv_id, c.conv_text
                FROM conv c JOIN clust ON clust.node = c.conv_id
                WHERE clust.label = c.conv_id
            ),
            tok AS (
                SELECT conv_id,
                       CAST(len(regexp_extract_all(conv_text, '\\S+'))
                            AS BIGINT) AS n_tokens,
                       CAST(CAST(('0x' || substr(
                                md5('shard0:' || conv_id), 1, 15))
                            AS UBIGINT) % 4 AS BIGINT) AS shard
                FROM surv
            )
            SELECT shard, CAST(count(*) AS BIGINT) AS n_convs,
                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                   min(conv_id) AS min_conv, max(conv_id) AS max_conv
            FROM tok GROUP BY shard
        """,
        "dup_rate_estimate": f"""
            WITH reps AS (
                SELECT doc_id + 1000000 * j AS doc_id, text
                FROM documents, range(1, 4) AS t(j)
                WHERE doc_id % 5 = 0),
            tall AS (SELECT doc_id, text FROM documents
                     UNION ALL SELECT doc_id, text FROM reps),
            g AS (SELECT coalesce(text, '') AS txt FROM tall),
            s AS (SELECT txt FROM g
                  WHERE CAST(('0x' || substr(md5('s0:' || txt), 1, 15))
                             AS UBIGINT) < {int(0.5 * (1 << 60))}),
            agg AS (SELECT CAST(count(*) AS BIGINT) AS n_sampled,
                           CAST(count(DISTINCT txt) AS BIGINT) AS n_uniq
                    FROM s)
            SELECT n_sampled, n_uniq,
                   n_sampled - n_uniq AS dup_rows,
                   round(CAST(n_sampled - n_uniq AS DOUBLE) / n_sampled,
                         {_ROUND}) AS dup_frac
            FROM agg
        """,
        "temporal_novelty": f"""
            WITH arrs AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[0-9a-zA-Z_]+')
                           AS arr
                FROM documents
            ),
            sl AS (
                SELECT doc_id,
                       CASE WHEN len(arr) > 3 THEN
                           list_transform(range(len(arr) - 2),
                               i -> arr[i + 1] || ' ' || arr[i + 2]
                                    || ' ' || arr[i + 3])
                       ELSE [array_to_string(arr, ' ')] END AS shl
                FROM arrs WHERE len(arr) > 0
            ),
            sh AS (SELECT DISTINCT doc_id, s.sh
                   FROM sl, UNNEST(shl) AS s(sh)),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            f AS (SELECT sh, min(doc_id) AS fid FROM sh GROUP BY 1),
            nf AS (SELECT fid AS doc_id, count(*) AS n_first
                   FROM f GROUP BY 1)
            SELECT sz.doc_id, CAST(sz.n AS BIGINT) AS n_grams,
                   CAST(coalesce(nf.n_first, 0) AS BIGINT)
                       AS n_first_seen,
                   round(CAST(coalesce(nf.n_first, 0) AS DOUBLE) / sz.n,
                         {_ROUND}) AS novelty_frac
            FROM sz LEFT JOIN nf USING (doc_id)
        """,
        "similar_docs_topk": f"""
            WITH arrs AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[0-9a-zA-Z_]+')
                           AS arr
                FROM documents
            ),
            sl AS (
                SELECT doc_id,
                       CASE WHEN len(arr) > 3 THEN
                           list_transform(range(len(arr) - 2),
                               i -> arr[i + 1] || ' ' || arr[i + 2]
                                    || ' ' || arr[i + 3])
                       ELSE [array_to_string(arr, ' ')] END AS shl
                FROM arrs WHERE len(arr) > 0
            ),
            sh AS (SELECT DISTINCT doc_id, s.sh
                   FROM sl, UNNEST(shl) AS s(sh)),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
                SELECT q.doc_id AS query_id, b.doc_id AS doc_id,
                       count(*) AS c
                FROM sh q JOIN sh b
                  ON q.sh = b.sh AND q.doc_id <> b.doc_id
                WHERE q.doc_id BETWEEN 0 AND 9
                GROUP BY 1, 2
            ),
            scored AS (
                SELECT i.query_id, i.doc_id,
                       CAST(i.c AS DOUBLE) / (x.n + y.n - i.c) AS j
                FROM inter i
                JOIN sz x ON x.doc_id = i.query_id
                JOIN sz y ON y.doc_id = i.doc_id
            ),
            r AS (SELECT query_id, doc_id, j,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY j DESC, doc_id)
                             AS rank
                  FROM scored)
            SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank,
                   round(j, {_ROUND}) AS jaccard
            FROM r WHERE rank <= 5
        """,
        "token_entropy": f"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text),
                                                 '[0-9a-zA-Z_]+')) AS tok
                FROM documents),
            tf AS (SELECT doc_id, tok, count(*) AS tf
                   FROM toks GROUP BY 1, 2),
            per AS (SELECT doc_id,
                           sum(tf * ln(CAST(tf AS DOUBLE))) AS s,
                           CAST(sum(tf) AS BIGINT) AS nd
                    FROM tf GROUP BY 1)
            SELECT doc_id, nd AS n_tokens,
                   round(ln(CAST(nd AS DOUBLE)) - s / nd,
                         {_ROUND}) AS entropy
            FROM per
        """,
        "doc_containment_pairs": """
            WITH snips AS (
                SELECT doc_id + 5000000 AS doc_id,
                       substr(text, 40, 160) AS text
                FROM documents
                WHERE doc_id % 6 = 0 AND length(text) >= 260),
            tall AS (SELECT doc_id, coalesce(text, '') AS text
                     FROM documents
                     UNION ALL SELECT doc_id, text FROM snips)
            SELECT CAST(a.doc_id AS VARCHAR) AS inner_key,
                   CAST(b.doc_id AS VARCHAR) AS outer_key,
                   CAST(length(a.text) AS BIGINT) AS inner_len
            FROM tall a JOIN tall b
              ON length(a.text) >= 63
             AND length(a.text) < length(b.text)
             AND contains(b.text, a.text)
        """,
        "bag_dup_groups": """
            WITH reord AS (
                SELECT doc_id + 4000000 AS doc_id,
                       array_to_string(
                           list_reverse(str_split(coalesce(text, ''), ' ')),
                           ' ') AS text
                FROM documents WHERE doc_id % 9 = 0),
            tall AS (SELECT doc_id, coalesce(text, '') AS text
                     FROM documents
                     UNION ALL SELECT doc_id, text FROM reord),
            k AS (SELECT doc_id,
                         array_to_string(list_sort(str_split(text, ' ')),
                                         ' ') AS canon
                  FROM tall),
            c AS (SELECT canon, count(*) AS n,
                         min(CAST(doc_id AS VARCHAR)) AS bag_id
                  FROM k GROUP BY canon)
            SELECT CAST(k.doc_id AS VARCHAR) AS row_key, c.bag_id,
                   CAST(c.n AS BIGINT) AS n_members
            FROM k JOIN c USING (canon)
            WHERE c.n >= 2
        """,
        "data_expectations": """
            SELECT 'text_not_null' AS rule,
                   CAST(count(*) FILTER (WHERE text IS NULL) AS BIGINT)
                       AS n_violations
            FROM documents
            UNION ALL
            SELECT 'text_non_empty',
                   CAST(count(*) FILTER (WHERE coalesce(text, '') = '')
                        AS BIGINT)
            FROM documents
            UNION ALL
            SELECT 'text_len_100_10000',
                   CAST(count(*) FILTER (WHERE length(coalesce(text, ''))
                                         NOT BETWEEN 100 AND 10000)
                        AS BIGINT)
            FROM documents
            UNION ALL
            SELECT 'lang_known',
                   CAST(count(*) FILTER (WHERE lang IS NULL
                                         OR lang NOT IN ('en', 'de', 'fr'))
                        AS BIGINT)
            FROM documents
            UNION ALL
            SELECT 'n_chars_consistent',
                   CAST(count(*) FILTER (
                            WHERE n_chars IS NULL
                            OR n_chars <> length(coalesce(text, '')))
                        AS BIGINT)
            FROM documents
            UNION ALL
            SELECT 'doc_id_unique',
                   CAST(coalesce((SELECT sum(c - 1)
                                  FROM (SELECT count(*) AS c
                                        FROM documents
                                        GROUP BY doc_id)
                                  WHERE c >= 2), 0) AS BIGINT)
        """,
        "blocklist_hits": """
            WITH p AS (SELECT * FROM (VALUES ('slow scan'), ('hash join'),
                                             ('spark'), ('drop table'))
                       AS v(phrase)),
            d AS (SELECT doc_id, lower(coalesce(text, '')) AS t
                  FROM documents)
            SELECT d.doc_id, p.phrase,
                   CAST((length(d.t) - length(replace(d.t, p.phrase, '')))
                        // length(p.phrase) AS BIGINT) AS n_hits
            FROM d CROSS JOIN p
            WHERE contains(d.t, p.phrase)
        """,
        "top_event_types_per_user": """
            WITH c AS (
                SELECT user_id, event_type,
                       CAST(count(*) AS BIGINT) AS n
                FROM events
                WHERE user_id IS NOT NULL AND event_type IS NOT NULL
                GROUP BY 1, 2)
            SELECT user_id, event_type, n, CAST(rn AS BIGINT) AS rank
            FROM (SELECT user_id, event_type, n,
                         row_number() OVER (PARTITION BY user_id
                             ORDER BY n DESC, event_type) AS rn
                  FROM c)
            WHERE rn <= 2
        """,
        "normalized_dedup_groups": """
            WITH base AS (SELECT doc_id, coalesce(text, '') AS text
                          FROM documents),
            v AS (SELECT doc_id, text FROM base
                  UNION ALL
                  SELECT doc_id + 8000000, upper(text) || '!!  '
                  FROM base WHERE doc_id % 19 = 0),
            n AS (SELECT CAST(doc_id AS VARCHAR) AS row_key,
                         trim(regexp_replace(lower(text),
                                             '[^0-9a-z]+', ' ', 'g'))
                             AS nt
                  FROM v),
            g AS (SELECT nt, min(row_key) AS norm_id,
                         CAST(count(*) AS BIGINT) AS n_members
                  FROM n GROUP BY nt)
            SELECT n.row_key, g.norm_id, g.n_members
            FROM n JOIN g USING (nt)
            WHERE g.n_members >= 2
        """,
        "weighted_sample_docs": """
            WITH w AS (
                SELECT doc_id, n_chars,
                       ln((CAST(CAST('0x' || substr(
                                md5('ws0:' || CAST(doc_id AS VARCHAR)),
                                1, 15) AS UBIGINT) AS DOUBLE) + 1)
                          / 1152921504606846976.0)
                       / CAST(n_chars AS DOUBLE) AS p
                FROM documents
                WHERE n_chars IS NOT NULL AND n_chars > 0)
            SELECT doc_id, n_chars
            FROM w ORDER BY p DESC, doc_id LIMIT 50
        """,
        "max_repeat_len": """
            WITH base AS (
                SELECT doc_id,
                       substr(coalesce(text, ''), 1, 270) AS s
                FROM documents),
            v AS (SELECT doc_id, s FROM base
                  UNION ALL
                  SELECT doc_id + 7000000,
                         s || ' ' || substr(s, 1, 130)
                  FROM base WHERE doc_id % 17 = 0),
            g AS (SELECT L FROM (VALUES (8), (16), (32), (64),
                                        (128)) t(L)),
            win AS (SELECT doc_id, L,
                           unnest(list_transform(
                               range(1, length(s) - L + 2),
                               i -> substr(s, CAST(i AS INT), L))) AS w
                    FROM v, g WHERE length(s) >= L),
            rep AS (SELECT DISTINCT doc_id, L FROM (
                        SELECT doc_id, L, w FROM win
                        GROUP BY doc_id, L, w HAVING count(*) >= 2))
            SELECT v.doc_id,
                   CAST(coalesce(max(rep.L), 0) AS BIGINT)
                       AS max_repeat_len
            FROM v LEFT JOIN rep USING (doc_id) GROUP BY 1
        """,
        "token_freq_spectrum": """
            WITH toks AS (
                SELECT unnest(regexp_extract_all(
                           lower(coalesce(text, '')),
                           '[0-9a-zA-Z_]+')) AS tok
                FROM documents),
            c AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok)
            SELECT CAST(c AS BIGINT) AS tf,
                   CAST(count(*) AS BIGINT) AS n_types
            FROM c GROUP BY c
        """,
        "kl_by_source": f"""
            WITH toks AS (
                SELECT source,
                       unnest(regexp_extract_all(
                           lower(coalesce(text, '')),
                           '[0-9a-zA-Z_]+')) AS tok
                FROM documents WHERE source IS NOT NULL),
            b AS (SELECT source,
                         CAST(CAST('0x' || substr(md5(tok), 17, 16)
                                   AS UBIGINT) % 1024 AS BIGINT) AS bkt
                  FROM toks),
            cnt AS (SELECT source, bkt, CAST(count(*) AS DOUBLE) AS c
                    FROM b GROUP BY 1, 2),
            tot AS (SELECT source, sum(c) AS n FROM cnt GROUP BY 1),
            ab AS (SELECT bkt, sum(c) AS cb FROM cnt GROUP BY 1),
            alln AS (SELECT sum(c) AS na FROM cnt),
            grid AS (SELECT t.source, t.n, r.range AS bkt
                     FROM tot t CROSS JOIN range(1024) r),
            cell AS (SELECT g.source, g.n, g.bkt,
                            coalesce(c.c, 0) AS cg,
                            coalesce(a.cb, 0) AS cb
                     FROM grid g
                     LEFT JOIN cnt c ON c.source = g.source
                                        AND c.bkt = g.bkt
                     LEFT JOIN ab a ON a.bkt = g.bkt),
            term AS (SELECT source, n,
                            (cg + 1.0) / (n + 1024.0) AS p,
                            (cb - cg + 1.0)
                                / ((SELECT na FROM alln) - n + 1024.0)
                                AS q
                     FROM cell
                     WHERE n < (SELECT na FROM alln))
            SELECT source, CAST(n AS BIGINT) AS n_tokens,
                   round(sum(p * ln(p / q)), {_ROUND}) AS kl
            FROM term GROUP BY 1, 2
        """,
        "typo_dedup_pairs": """
            WITH base AS (
                SELECT doc_id, substr(coalesce(text, ''), 1, 40) AS s
                FROM documents
                WHERE length(coalesce(text, '')) >= 40),
            v AS (
                SELECT doc_id, s FROM base
                UNION ALL
                SELECT doc_id + 6000000,
                       substr(s, 1, 5) || 'q' || substr(s, 7)
                FROM base WHERE doc_id % 13 = 0),
            dist AS (SELECT s, CAST(min(doc_id) AS BIGINT) AS id
                     FROM v GROUP BY s),
            pre AS (
                SELECT a.id AS a_id, b.id AS b_id, a.s AS sa, b.s AS sb
                FROM dist a JOIN dist b
                  ON substr(a.s, 1, 20) = substr(b.s, 1, 20)
                     AND a.id < b.id
                UNION
                SELECT a.id, b.id, a.s, b.s
                FROM dist a JOIN dist b
                  ON substr(a.s, 21) = substr(b.s, 21) AND a.id < b.id)
            SELECT a_id, b_id FROM pre WHERE levenshtein(sa, sb) = 1
        """,
        "bbit_minhash_pairs": f"""
            WITH varnt AS (
                SELECT doc_id, coalesce(text, '') AS text FROM documents
                UNION ALL
                SELECT doc_id + 5000000,
                       coalesce(text, '') || ' {_SUFFIX_WORDS}'
                FROM documents WHERE doc_id % 7 = 0),
            cand AS (
                SELECT doc_id AS a_id, doc_id + 5000000 AS b_id
                FROM documents WHERE doc_id % 7 = 0
                UNION ALL
                SELECT doc_id, doc_id + 1
                FROM documents WHERE doc_id % 11 = 0),
            arrs AS (SELECT doc_id,
                            regexp_extract_all(lower(text),
                                               '[0-9a-zA-Z_]+') AS arr
                     FROM varnt),
            gl AS (SELECT doc_id,
                          list_transform(range(len(arr) - 2),
                              i -> arr[i + 1] || ' ' || arr[i + 2]
                                   || ' ' || arr[i + 3]) AS l
                   FROM arrs WHERE len(arr) >= 3),
            grams AS (SELECT DISTINCT doc_id, g.g FROM gl,
                      UNNEST(l) AS g(g)),
            hs AS (SELECT doc_id,
                          CAST('0x' || substr(md5(g), 17, 16) AS UBIGINT)
                              AS h1,
                          CAST('0x' || substr(md5(g), 1, 16) AS UBIGINT)
                              AS h2
                   FROM grams),
            mins AS (SELECT doc_id, s,
                            min((CAST(h1 AS HUGEINT)
                                 + s * CAST(h2 AS HUGEINT))
                                % 18446744073709551616) AS mn
                     FROM hs, range(16) t(s) GROUP BY 1, 2),
            bb AS (SELECT doc_id, s, mn % 4 AS v FROM mins)
            SELECT c.a_id, c.b_id,
                   CAST(count(*) FILTER (WHERE a.v = b.v) AS BIGINT)
                       AS n_match,
                   round((CAST(count(*) FILTER (WHERE a.v = b.v)
                               AS DOUBLE) / 16 - 0.25) / 0.75,
                         {_ROUND}) AS jaccard_est
            FROM cand c
            JOIN bb a ON a.doc_id = c.a_id
            JOIN bb b ON b.doc_id = c.b_id AND b.s = a.s
            GROUP BY 1, 2
        """,
        "blocklist_hits_rk": f"""
            WITH p AS (SELECT * FROM (VALUES
                           {", ".join(f"('{p}')" for p in _RK_PHRASES)})
                       AS v(phrase)),
            d AS (SELECT doc_id, lower(coalesce(text, '')) AS t
                  FROM documents)
            SELECT d.doc_id, p.phrase,
                   CAST((length(d.t) - length(replace(d.t, p.phrase, '')))
                        // length(p.phrase) AS BIGINT) AS n_hits
            FROM d CROSS JOIN p
            WHERE contains(d.t, p.phrase)
        """,
        "soft_dedup_weights": f"""
            WITH reps AS (
                SELECT doc_id + 1000000 * j AS doc_id, text
                FROM documents, range(1, 4) AS t(j)
                WHERE doc_id % 5 = 0),
            tall AS (SELECT doc_id, text FROM documents
                     UNION ALL SELECT doc_id, text FROM reps),
            g AS (SELECT doc_id, coalesce(text, '') AS txt FROM tall),
            c AS (SELECT txt, CAST(count(*) AS BIGINT) AS n
                  FROM g GROUP BY txt)
            SELECT g.doc_id, c.n AS n_copies,
                   round(1.0 / c.n, {_ROUND}) AS weight
            FROM g JOIN c USING (txt)
        """,
        "cap_duplicates": """
            WITH reps AS (
                SELECT doc_id + 1000000 * j AS doc_id, text
                FROM documents, range(1, 4) AS t(j)
                WHERE doc_id % 5 = 0),
            tall AS (SELECT doc_id, text FROM documents
                     UNION ALL SELECT doc_id, text FROM reps),
            g AS (SELECT doc_id, coalesce(text, '') AS txt FROM tall),
            c AS (SELECT txt, count(*) AS n FROM g GROUP BY txt),
            r AS (SELECT doc_id, txt,
                         row_number() OVER (PARTITION BY txt
                                            ORDER BY doc_id) AS rn
                  FROM g)
            SELECT r.doc_id, CAST(c.n AS BIGINT) AS n_copies
            FROM r JOIN c ON r.txt = c.txt
            WHERE r.rn <= 2
        """,
        "stitch_candidates": """
            WITH frags AS (
                SELECT doc_id + 2000000 AS doc_id,
                       substr(text, 1, (length(text) // 2) + 64) AS text
                FROM documents
                WHERE doc_id % 7 = 0 AND length(text) >= 130
                UNION ALL
                SELECT doc_id + 3000000,
                       substr(text, (length(text) // 2) + 1)
                FROM documents
                WHERE doc_id % 7 = 0 AND length(text) >= 130),
            tall AS (SELECT doc_id, text FROM documents
                     UNION ALL SELECT * FROM frags),
            heads AS (SELECT doc_id AS b_id, substr(text, 1, 64) AS gram
                      FROM tall WHERE length(text) >= 64),
            tails AS (SELECT doc_id AS a_id,
                             substr(text, length(text) - 63) AS gram
                      FROM tall WHERE length(text) >= 64)
            SELECT t.a_id, h.b_id
            FROM tails t JOIN heads h USING (gram)
            WHERE t.a_id <> h.b_id
        """,
        "snm_multipass_pairs": """
            WITH norm AS (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(lower(text),
                           '[^0-9a-z\\s]', ' ', 'g'), '\\s+', ' ', 'g'))
                           AS skey
                FROM documents),
            keys AS (
                SELECT doc_id, skey, reverse(skey) AS rkey,
                       CAST(doc_id AS VARCHAR) AS ids
                FROM norm WHERE skey IS NOT NULL AND skey <> ''),
            fr AS (SELECT doc_id,
                          substr(skey, 1, 8) AS bucket,
                          row_number() OVER (
                              PARTITION BY substr(skey, 1, 8)
                              ORDER BY substr(skey, 1, 64), ids) AS rn
                   FROM keys),
            rr AS (SELECT doc_id,
                          substr(rkey, 1, 8) AS bucket,
                          row_number() OVER (
                              PARTITION BY substr(rkey, 1, 8)
                              ORDER BY substr(rkey, 1, 64), ids) AS rn
                   FROM keys)
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   b.rn - a.rn AS gap, 'fwd' AS pass
            FROM fr a JOIN fr b
              ON a.bucket = b.bucket AND b.rn - a.rn BETWEEN 1 AND 3
            UNION ALL
            SELECT a.doc_id, b.doc_id, b.rn - a.rn, 'rev'
            FROM rr a JOIN rr b
              ON a.bucket = b.bucket AND b.rn - a.rn BETWEEN 1 AND 3
        """,
        "snm_candidate_pairs": """
            WITH norm AS (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(lower(text),
                           '[^0-9a-z\\s]', ' ', 'g'), '\\s+', ' ', 'g'))
                           AS skey
                FROM documents),
            r AS (SELECT doc_id,
                         substr(skey, 1, 8) AS bucket,
                         substr(skey, 1, 64) AS skey64,
                         CAST(doc_id AS VARCHAR) AS ids
                  FROM norm WHERE skey IS NOT NULL AND skey <> ''),
            rr AS (SELECT doc_id, bucket,
                          row_number() OVER (PARTITION BY bucket
                                             ORDER BY skey64, ids) AS rn
                   FROM r)
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   b.rn - a.rn AS gap
            FROM rr a JOIN rr b
              ON a.bucket = b.bucket AND b.rn - a.rn BETWEEN 1 AND 3
        """,
        "dup_flow_matrix": f"""
            WITH {_DOC_SHINGLES_CTE},
            reps AS (
                SELECT text, min(CAST(doc_id AS VARCHAR)) AS rep
                FROM documents GROUP BY text),
            exact_edges AS (
                SELECT CAST(d.doc_id AS VARCHAR) AS ka, r.rep AS kb
                FROM documents d JOIN reps r ON d.text = r.text
                WHERE CAST(d.doc_id AS VARCHAR) <> r.rep),
            near_edges AS (
                SELECT CAST(a_id AS VARCHAR) AS ka,
                       CAST(b_id AS VARCHAR) AS kb
                FROM near_pairs),
            edges AS (
                SELECT ka, kb, 'exact' AS kind FROM exact_edges
                UNION ALL SELECT ka, kb, 'near' FROM near_edges),
            es AS (
                SELECT e.kind,
                       least(da.source, db.source) AS source_a,
                       greatest(da.source, db.source) AS source_b
                FROM edges e
                JOIN documents da ON CAST(da.doc_id AS VARCHAR) = e.ka
                JOIN documents db ON CAST(db.doc_id AS VARCHAR) = e.kb)
            SELECT source_a, source_b, kind, count(*) AS n_edges
            FROM es GROUP BY 1, 2, 3
        """,
        "conv_divergence": TRANSCRIPTS_SQL + """
            , forks AS (
                SELECT conv_id || '-fork' AS conv_id, turn_idx, role,
                       CASE WHEN turn_idx >= 5 THEN text || ' forked'
                            ELSE text END AS text
                FROM transcripts
                WHERE CAST(substr(conv_id, 6) AS INTEGER) % 4 = 0),
            tall AS (
                SELECT conv_id, turn_idx, role, text FROM transcripts
                UNION ALL SELECT * FROM forks),
            pairs AS (
                SELECT DISTINCT conv_id AS conv_a,
                       conv_id || '-fork' AS conv_b
                FROM transcripts
                WHERE CAST(substr(conv_id, 6) AS INTEGER) % 4 = 0),
            lens AS (SELECT conv_id, count(*) AS len FROM tall
                     GROUP BY 1),
            j AS (
                SELECT p.conv_a, p.conv_b, a.turn_idx,
                       (a.role = b.role AND a.text = b.text) AS eq
                FROM pairs p
                JOIN tall a ON a.conv_id = p.conv_a
                JOIN tall b ON b.conv_id = p.conv_b
                           AND b.turn_idx = a.turn_idx),
            d AS (
                SELECT conv_a, conv_b,
                       min(turn_idx) FILTER (WHERE NOT eq) AS first_diff,
                       count(*) AS aligned
                FROM j GROUP BY 1, 2)
            SELECT d.conv_a, d.conv_b,
                   CAST(coalesce(d.first_diff, d.aligned) AS BIGINT)
                       AS lcp,
                   CAST(la.len AS BIGINT) AS a_len,
                   CAST(lb.len AS BIGINT) AS b_len
            FROM d JOIN lens la ON la.conv_id = d.conv_a
                   JOIN lens lb ON lb.conv_id = d.conv_b
        """,
        "dedup_threshold_sweep": f"""
            WITH {_DOC_SHINGLES_CTE},
            grid AS (SELECT unnest([0.8, 0.85, 0.9, 0.95, 1.0])
                     AS threshold),
            docmax AS (
                SELECT id, max(jaccard) AS mj FROM (
                    SELECT CAST(a_id AS VARCHAR) AS id, jaccard
                    FROM near_pairs
                    UNION ALL
                    SELECT CAST(b_id AS VARCHAR) AS id, jaccard
                    FROM near_pairs
                ) u GROUP BY id
            )
            SELECT g.threshold,
                   (SELECT count(*) FROM near_pairs p
                    WHERE p.jaccard >= g.threshold) AS n_pairs,
                   (SELECT count(*) FROM docmax d
                    WHERE d.mj >= g.threshold) AS n_dup_docs
            FROM grid g
        """,
        "near_dup_clusters_docs": f"""
            WITH RECURSIVE {_DOC_SHINGLES_CTE}, {_DOC_CLUSTERS_CTE}
            SELECT row_key, cluster_id FROM clust
        """,
        # per-cluster boilerplate commonality: distinct (cluster, doc,
        # token) flags, common = per-(cluster, token) doc frequency ==
        # cluster size; empty members force min 0 / common 0 via the
        # LEFT JOIN count
        "cluster_common_tokens": f"""
            WITH RECURSIVE {_DOC_SHINGLES_CTE}, {_DOC_CLUSTERS_CTE},
            sizes AS (
                SELECT cluster_id, count(*) AS n_members
                FROM clust GROUP BY 1),
            doctoks AS (
                SELECT DISTINCT c.cluster_id, c.row_key, t.tok
                FROM clust c
                JOIN documents d ON CAST(d.doc_id AS VARCHAR) = c.row_key,
                UNNEST(regexp_extract_all(lower(d.text),
                                          '[0-9a-zA-Z_]+')) AS t(tok)
            ),
            permem AS (
                SELECT c.cluster_id, c.row_key, count(t.tok) AS nt
                FROM clust c LEFT JOIN doctoks t
                  ON t.cluster_id = c.cluster_id
                 AND t.row_key = c.row_key
                GROUP BY 1, 2
            ),
            tokcnt AS (
                SELECT cluster_id, tok, count(*) AS c
                FROM doctoks GROUP BY 1, 2),
            agg AS (
                SELECT t.cluster_id,
                       SUM(CASE WHEN t.c = s.n_members
                                THEN 1 ELSE 0 END) AS nc
                FROM tokcnt t JOIN sizes s USING (cluster_id)
                GROUP BY 1
            ),
            mins AS (
                SELECT cluster_id, MIN(nt) AS mn FROM permem GROUP BY 1)
            SELECT s.cluster_id, s.n_members,
                   CAST(COALESCE(a.nc, 0) AS BIGINT) AS n_common_tokens,
                   m.mn AS min_member_tokens,
                   CASE WHEN m.mn = 0 THEN 0.0
                        ELSE round(CAST(COALESCE(a.nc, 0) AS DOUBLE)
                                   / m.mn, {_ROUND}) END AS commonality
            FROM sizes s
            JOIN mins m USING (cluster_id)
            LEFT JOIN agg a USING (cluster_id)
            WHERE s.n_members >= 2
        """,
        # template extraction: common tokens (df == cluster size)
        # string_agg'd in the REP member's first-occurrence order (the
        # rep IS the cluster_id doc — labels are min member keys)
        "cluster_template_text": f"""
            WITH RECURSIVE {_DOC_SHINGLES_CTE}, {_DOC_CLUSTERS_CTE},
            sizes AS (
                SELECT cluster_id, count(*) AS n_members
                FROM clust GROUP BY 1),
            doctoks AS (
                SELECT DISTINCT c.cluster_id, c.row_key, t.tok
                FROM clust c
                JOIN documents d ON CAST(d.doc_id AS VARCHAR) = c.row_key,
                UNNEST(regexp_extract_all(lower(d.text),
                                          '[0-9a-zA-Z_]+')) AS t(tok)
            ),
            tokcnt AS (
                SELECT cluster_id, tok, count(*) AS c
                FROM doctoks GROUP BY 1, 2),
            reparr AS (
                SELECT s.cluster_id, s.n_members,
                       regexp_extract_all(lower(d.text),
                                          '[0-9a-zA-Z_]+') AS arr
                FROM sizes s
                JOIN documents d
                  ON CAST(d.doc_id AS VARCHAR) = s.cluster_id
                WHERE s.n_members >= 2),
            reppos AS (
                SELECT r.cluster_id, x.i AS pos, r.arr[x.i + 1] AS tok
                FROM reparr r, UNNEST(range(len(r.arr))) AS x(i)),
            firstpos AS (
                SELECT cluster_id, tok, MIN(pos) AS p
                FROM reppos GROUP BY 1, 2),
            tmpl AS (
                SELECT f.cluster_id,
                       string_agg(f.tok, ' ' ORDER BY f.p) AS template
                FROM firstpos f
                JOIN tokcnt t ON t.cluster_id = f.cluster_id
                             AND t.tok = f.tok
                JOIN sizes s ON s.cluster_id = f.cluster_id
                WHERE t.c = s.n_members
                GROUP BY 1)
            SELECT s.cluster_id, s.n_members,
                   COALESCE(m.template, '') AS template
            FROM sizes s LEFT JOIN tmpl m USING (cluster_id)
            WHERE s.n_members >= 2
        """,
        "cluster_survivor_by_score": f"""
            WITH RECURSIVE {_DOC_SHINGLES_CTE}, {_DOC_CLUSTERS_CTE},
            scored AS (
                SELECT c.row_key, c.cluster_id,
                       CAST(d.n_chars AS BIGINT) AS n_chars
                FROM clust c
                JOIN documents d
                  ON CAST(d.doc_id AS VARCHAR) = c.row_key)
            SELECT row_key, cluster_id, n_chars
            FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
                      ORDER BY n_chars DESC, row_key) AS rn
                  FROM scored)
            WHERE rn = 1
        """,
        "cluster_cohesion": f"""
            WITH RECURSIVE {_DOC_SHINGLES_CTE},
            pnodes AS (
                SELECT DISTINCT CAST(a_id AS VARCHAR) AS k
                FROM near_pairs
                UNION
                SELECT DISTINCT CAST(b_id AS VARCHAR) FROM near_pairs),
            pedges AS (
                SELECT CAST(a_id AS VARCHAR) AS a,
                       CAST(b_id AS VARCHAR) AS b
                FROM near_pairs
                UNION
                SELECT CAST(b_id AS VARCHAR), CAST(a_id AS VARCHAR)
                FROM near_pairs),
            reach(node, r) AS (
                SELECT k, k FROM pnodes
                UNION
                SELECT reach.node, pedges.b
                FROM reach JOIN pedges ON reach.r = pedges.a),
            comp AS (SELECT node, min(r) AS cid
                     FROM reach GROUP BY node),
            m AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_members
                  FROM comp GROUP BY cid),
            np AS (SELECT c.cid, CAST(count(*) AS BIGINT) AS n_pairs
                   FROM near_pairs p
                   JOIN comp c ON c.node = CAST(p.a_id AS VARCHAR)
                   GROUP BY 1)
            SELECT m.cid AS cluster_id, m.n_members, np.n_pairs,
                   round(CAST(np.n_pairs AS DOUBLE)
                         / (m.n_members * (m.n_members - 1) / 2),
                         {_ROUND}) AS density
            FROM m JOIN np USING (cid)
        """,
        "leakage_safe_split": _leakage_safe_split_sql(),
        "dup_pagerank": _dup_pagerank_sql(),
        "cluster_medoids": _cluster_medoids_sql(),
        "corpus_diff": """
            WITH v2 AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                            ELSE text END AS text
                FROM documents WHERE doc_id % 11 <> 0
                UNION ALL
                SELECT doc_id + 1000000,
                       'new doc ' || CAST(doc_id AS VARCHAR)
                FROM documents WHERE doc_id % 13 = 0
            )
            SELECT coalesce(o.doc_id, v2.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN v2.doc_id IS NULL THEN 'removed'
                        WHEN o.text <> v2.text THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM documents o FULL OUTER JOIN v2 ON o.doc_id = v2.doc_id
        """,
        "otmt_bytecount": TRANSCRIPTS_SQL + f"""
            SELECT t.conv_id, t.turn_idx,
                   round(CAST(length(t.text) AS DOUBLE)
                         / length(a.text) - 1, {_ROUND}) AS bytecount
            FROM transcripts t
            JOIN transcripts a
              ON a.conv_id = t.conv_id AND a.turn_idx = 0
        """,
        "otmt_wordcount_simple": TRANSCRIPTS_SQL + f"""
            , wc AS (
                SELECT conv_id, turn_idx,
                       len(regexp_extract_all(lower(text), '[0-9a-zA-Z_]+'))
                           AS n
                FROM transcripts
            )
            SELECT t.conv_id, t.turn_idx,
                   round(CAST(t.n AS DOUBLE) / a.n - 1, {_ROUND}) AS wordcount
            FROM wc t JOIN wc a
              ON a.conv_id = t.conv_id AND a.turn_idx = 0
        """,
        "otmt_jaccard_simple": TRANSCRIPTS_SQL + f""", {_TOKENS_CTE},
            inter AS (
                SELECT m.conv_id, m.turn_idx, count(*) AS c
                FROM tokset m
                JOIN tokset a
                  ON a.conv_id = m.conv_id AND a.turn_idx = 0
                 AND a.tok = m.tok
                GROUP BY 1, 2
            )
            SELECT m.conv_id, m.turn_idx,
                   round(1.0 - CAST(coalesce(i.c, 0) AS DOUBLE)
                         / (m.n + a.n - coalesce(i.c, 0)), {_ROUND}) AS jaccard
            FROM setsize m
            JOIN setsize a ON a.conv_id = m.conv_id AND a.turn_idx = 0
            LEFT JOIN inter i
              ON i.conv_id = m.conv_id AND i.turn_idx = m.turn_idx
        """,
        "otmt_sorensen_simple": TRANSCRIPTS_SQL + f""", {_TOKENS_CTE},
            inter AS (
                SELECT m.conv_id, m.turn_idx, count(*) AS c
                FROM tokset m
                JOIN tokset a
                  ON a.conv_id = m.conv_id AND a.turn_idx = 0
                 AND a.tok = m.tok
                GROUP BY 1, 2
            )
            SELECT m.conv_id, m.turn_idx,
                   round(1.0 - 2.0 * CAST(coalesce(i.c, 0) AS DOUBLE)
                         / (m.n + a.n), {_ROUND}) AS sorensen
            FROM setsize m
            JOIN setsize a ON a.conv_id = m.conv_id AND a.turn_idx = 0
            LEFT JOIN inter i
              ON i.conv_id = m.conv_id AND i.turn_idx = m.turn_idx
        """,
        "otmt_levenshtein_simple": TRANSCRIPTS_SQL + f""",
            {_ORDERED_TOKENS_CTE}, {_LEV_ENC_CTE}
            SELECT conv_id, turn_idx,
                   round(CAST(levenshtein(s_a, s_m) AS DOUBLE), {_ROUND})
                       AS levenshtein
            FROM enc
        """,
        "otmt_nlevenshtein_simple": TRANSCRIPTS_SQL + f""",
            {_ORDERED_TOKENS_CTE}, {_LEV_ENC_CTE}
            SELECT conv_id, turn_idx,
                   round(CASE WHEN greatest(length(s_a), length(s_m)) = 0
                         THEN 0.0e0
                         ELSE CAST(levenshtein(s_a, s_m) AS DOUBLE)
                              / greatest(length(s_a), length(s_m)) END,
                         {_ROUND}) AS nlevenshtein
            FROM enc
        """,
        "otmt_tfintersection_simple": TRANSCRIPTS_SQL + f""",
            {_ORDERED_TOKENS_CTE},
            cnt AS (
                SELECT conv_id, turn_idx, tok, count(*) AS c
                FROM tokpos GROUP BY 1, 2, 3
            ),
            -- top-20 by (count desc, token reverse-lex) — the reference
            -- tuple-sort tie-break (functions/setsim.py:top_terms)
            topk AS (
                SELECT conv_id, turn_idx, tok FROM (
                    SELECT conv_id, turn_idx, tok,
                           row_number() OVER (PARTITION BY conv_id, turn_idx
                                              ORDER BY c DESC, tok DESC) AS rn
                    FROM cnt
                ) WHERE rn <= 20
            ),
            inter AS (
                SELECT m.conv_id, m.turn_idx, count(*) AS c
                FROM topk m JOIN topk a
                  ON a.conv_id = m.conv_id AND a.turn_idx = 0
                 AND a.tok = m.tok
                GROUP BY 1, 2
            )
            SELECT t.conv_id, t.turn_idx,
                   round(CAST(coalesce(i.c, 0) AS DOUBLE), {_ROUND})
                       AS tfintersection
            FROM transcripts t
            LEFT JOIN inter i
              ON i.conv_id = t.conv_id AND i.turn_idx = t.turn_idx
        """,
        "otmt_raw_simhash": TRANSCRIPTS_SQL + f""",
            ts_keyed AS (
                SELECT conv_id, turn_idx,
                       conv_id || ':' || CAST(turn_idx AS VARCHAR) AS k,
                       text
                FROM transcripts
            ),
            {_simhash_cte("ts_keyed", "k")},
            sh AS (
                SELECT t.conv_id, t.turn_idx, s.simhash
                FROM ts_keyed t JOIN simhashes s ON s.sh_key = t.k
            )
            SELECT m.conv_id, m.turn_idx,
                   round(CAST(bit_count(xor(m.simhash, a.simhash)) AS DOUBLE),
                         {_ROUND}) AS raw_simhash
            FROM sh m JOIN sh a ON a.conv_id = m.conv_id AND a.turn_idx = 0
        """,
        "otmt_tf_simhash_simple": TRANSCRIPTS_SQL + f""",
            {_ORDERED_TOKENS_CTE}, {_TF_SIMHASH_CTE}
            SELECT m.conv_id, m.turn_idx,
                   round(CAST(bit_count(xor(m.sh, a.sh)) AS DOUBLE),
                         {_ROUND}) AS tf_simhash
            FROM allsh m JOIN allsh a
              ON a.conv_id = m.conv_id AND a.turn_idx = 0
        """,
        "otmt_cosine_simple": TRANSCRIPTS_SQL + f""",
            {_ORDERED_TOKENS_CTE},
            cnt AS (
                SELECT conv_id, turn_idx, tok, count(*) AS c
                FROM tokpos GROUP BY 1, 2, 3
            ),
            nconv AS (SELECT conv_id, count(*) AS n FROM transcripts GROUP BY 1),
            dft AS (SELECT conv_id, tok, count(*) AS df FROM cnt GROUP BY 1, 2),
            -- sklearn-default tf-idf: raw tf, idf = ln((1+n)/(1+df)) + 1
            w AS (
                SELECT c.conv_id, c.turn_idx, c.tok,
                       CAST(c.c AS DOUBLE)
                       * (ln((1.0e0 + n.n) / (1.0e0 + d.df)) + 1.0e0) AS w
                FROM cnt c
                JOIN nconv n ON n.conv_id = c.conv_id
                JOIN dft d ON d.conv_id = c.conv_id AND d.tok = c.tok
            ),
            nrm AS (
                SELECT conv_id, turn_idx, sqrt(sum(w * w)) AS nn
                FROM w GROUP BY 1, 2
            ),
            dot AS (
                SELECT m.conv_id, m.turn_idx, sum(m.w * a.w) AS d
                FROM w m JOIN w a
                  ON a.conv_id = m.conv_id AND a.turn_idx = 0
                 AND a.tok = m.tok
                GROUP BY 1, 2
            )
            SELECT t.conv_id, t.turn_idx,
                   round(CASE WHEN nm.nn IS NULL OR na.nn IS NULL
                              OR d.d IS NULL THEN 0.0e0
                         ELSE d.d / (nm.nn * na.nn) END, {_ROUND}) AS cosine
            FROM transcripts t
            LEFT JOIN nrm nm
              ON nm.conv_id = t.conv_id AND nm.turn_idx = t.turn_idx
            LEFT JOIN nrm na ON na.conv_id = t.conv_id AND na.turn_idx = 0
            LEFT JOIN dot d
              ON d.conv_id = t.conv_id AND d.turn_idx = t.turn_idx
        """,
        # LSI on rank-small conversations == plain BoW cosine (see
        # q_otmt_lsi_simple docstring for the isometry argument)
        "otmt_lsi_simple": TRANSCRIPTS_SQL + f""",
            tcap AS (
                SELECT * FROM transcripts WHERE turn_idx <= 9
            ),
            tokpos AS (
                SELECT conv_id, turn_idx, t.tok
                FROM tcap,
                     UNNEST(regexp_extract_all(lower(text), '[0-9a-zA-Z_]+'))
                         AS t(tok)
            ),
            cnt AS (
                SELECT conv_id, turn_idx, tok,
                       CAST(count(*) AS DOUBLE) AS c
                FROM tokpos GROUP BY 1, 2, 3
            ),
            nrm AS (
                SELECT conv_id, turn_idx, sqrt(sum(c * c)) AS nn
                FROM cnt GROUP BY 1, 2
            ),
            dot AS (
                SELECT m.conv_id, m.turn_idx, sum(m.c * a.c) AS d
                FROM cnt m JOIN cnt a
                  ON a.conv_id = m.conv_id AND a.turn_idx = 0
                 AND a.tok = m.tok
                GROUP BY 1, 2
            )
            SELECT t.conv_id, t.turn_idx,
                   round(CASE WHEN nm.nn IS NULL OR na.nn IS NULL
                              OR d.d IS NULL THEN 0.0e0
                         ELSE d.d / (nm.nn * na.nn) END + 1.0e-9, {_ROUND})
                       AS gensim_lsi
            FROM tcap t
            LEFT JOIN nrm nm
              ON nm.conv_id = t.conv_id AND nm.turn_idx = t.turn_idx
            LEFT JOIN nrm na ON na.conv_id = t.conv_id AND na.turn_idx = 0
            LEFT JOIN dot d
              ON d.conv_id = t.conv_id AND d.turn_idx = t.turn_idx
        """,
        # Full stemmed-config dedup DAG over transcripts; see
        # q_near_dup_clusters_transcripts docstring for the stem-lookup
        # argument. Structure mirrors near_dup_clusters_docs: rows attach
        # to their exact-text rep, near edges are brute-force jaccard
        # >= 0.8 between reps, cluster_id = lexicographic component min.
        "near_dup_clusters_transcripts": TRANSCRIPTS_SQL.replace(
            "WITH ", "WITH RECURSIVE ", 1) + f""",
            rk AS (
                SELECT conv_id || ':' || CAST(turn_idx AS VARCHAR)
                           AS row_key,
                       text
                FROM transcripts
            ),
            reps AS (
                SELECT min(row_key) AS row_key, text FROM rk GROUP BY text
            ),
            rep_of AS (
                SELECT r.row_key, p.row_key AS rep_key
                FROM rk r JOIN reps p USING (text)
            ),
            tok_lists AS (
                SELECT row_key,
                       list_filter(
                           list_transform(
                               regexp_extract_all(text, '[0-9a-zA-Z_]+'),
                               t -> {_STEM_CASE}),
                           t -> t NOT IN ({_STOPWORD_LIST})) AS ftoks
                FROM reps
            ),
            shingle_lists AS (
                SELECT row_key,
                       CASE WHEN len(ftoks) > 3 THEN
                           list_transform(range(len(ftoks) - 2),
                               i -> ftoks[i + 1] || ' ' || ftoks[i + 2]
                                    || ' ' || ftoks[i + 3])
                       ELSE [array_to_string(ftoks, ' ')] END AS shl
                FROM tok_lists WHERE len(ftoks) > 0
            ),
            shingles AS (
                SELECT DISTINCT row_key, s.sh
                FROM shingle_lists, UNNEST(shl) AS s(sh)
            ),
            shsize AS (
                SELECT row_key, count(*) AS n FROM shingles GROUP BY 1
            ),
            pair_common AS (
                SELECT a.row_key AS a_id, b.row_key AS b_id, count(*) AS c
                FROM shingles a JOIN shingles b
                  ON a.sh = b.sh AND a.row_key < b.row_key
                GROUP BY 1, 2
            ),
            near_pairs AS (
                SELECT p.a_id, p.b_id
                FROM pair_common p
                JOIN shsize sa ON sa.row_key = p.a_id
                JOIN shsize sb ON sb.row_key = p.b_id
                WHERE CAST(p.c AS DOUBLE) / (sa.n + sb.n - p.c) >= 0.8
            ),
            edges AS (
                SELECT row_key AS a_key, rep_key AS b_key FROM rep_of
                UNION SELECT rep_key, row_key FROM rep_of
                UNION SELECT a_id, b_id FROM near_pairs
                UNION SELECT b_id, a_id FROM near_pairs
            ),
            reach(node, r) AS (
                SELECT row_key, row_key FROM rk
                UNION
                SELECT reach.node, edges.b_key
                FROM reach JOIN edges ON reach.r = edges.a_key
            ),
            comp AS (
                SELECT node AS row_key, min(r) AS cluster_id
                FROM reach GROUP BY node
            )
            SELECT c.row_key, ro.rep_key, c.cluster_id,
                   c.row_key <> c.cluster_id AS is_duplicate
            FROM comp c JOIN rep_of ro USING (row_key)
        """,
        "collection_jaccard": f"""
            WITH tok AS (
                SELECT doc_id, t.tok
                FROM documents,
                     UNNEST(regexp_extract_all(lower(text), '[0-9a-zA-Z_]+'))
                         AS t(tok)
            ),
            per_doc AS (
                SELECT doc_id, count(DISTINCT tok) AS a FROM tok GROUP BY 1
            ),
            g AS (SELECT count(DISTINCT tok) AS g FROM tok)
            SELECT d.doc_id,
                   coalesce(p.a, 0) AS n_distinct_tokens,
                   round(1.0 - CAST(coalesce(p.a, 0) AS DOUBLE) / g.g,
                         {_ROUND}) AS collection_jaccard,
                   round(1.0 - 2.0 * CAST(coalesce(p.a, 0) AS DOUBLE)
                         / (coalesce(p.a, 0) + g.g), {_ROUND})
                       AS collection_sorensen
            FROM documents d
            LEFT JOIN per_doc p ON p.doc_id = d.doc_id
            CROSS JOIN g
        """,
        "top_terms_global": """
            WITH tok AS (
                SELECT t.tok
                FROM documents,
                     UNNEST(regexp_extract_all(lower(text), '[0-9a-zA-Z_]+'))
                         AS t(tok)
            )
            SELECT tok AS term, count(*) AS n
            FROM tok GROUP BY 1
            ORDER BY n DESC, term DESC
            LIMIT 20
        """,
        "top_terms_global_sketch": """
            WITH tok AS (
                SELECT t.tok
                FROM documents,
                     UNNEST(regexp_extract_all(lower(text), '[0-9a-zA-Z_]+'))
                         AS t(tok)
            )
            SELECT tok AS term, count(*) AS n
            FROM tok GROUP BY 1
            ORDER BY n DESC, term DESC
            LIMIT 20
        """,
        # quality_score arithmetic in DOUBLE (e-notation literals) so
        # equal-score TIES are bit-identical to the numpy side — the
        # row_number tie-break (score desc, row_key asc) then picks the
        # same survivor as select_high_quality's min-key rule
        "select_high_quality": f"""
            WITH scored AS (
                SELECT doc_id % 37 AS cluster_id,
                       CAST(doc_id AS VARCHAR) AS row_key,
                       0.15e0 * (CASE doc_id % 6
                                 WHEN 0 THEN 1.0e0 WHEN 1 THEN 0.9e0
                                 WHEN 2 THEN 0.8e0 WHEN 3 THEN 0.5e0
                                 WHEN 4 THEN 0.3e0 ELSE 0.0e0 END)
                       + 0.45e0 * (CAST(1 + doc_id % 8 AS DOUBLE) / 10.0e0)
                           AS quality_score
                FROM documents
            ),
            ranked AS (
                SELECT cluster_id, row_key, quality_score,
                       row_number() OVER (PARTITION BY cluster_id
                                          ORDER BY quality_score DESC,
                                                   row_key) AS rn
                FROM scored
            )
            SELECT cluster_id, row_key,
                   round(quality_score, {_ROUND}) AS quality_score
            FROM ranked WHERE rn = 1
        """,
        "select_by_language": f"""
            SELECT doc_id, detected_lang
            FROM ({_langid_sql()})
            WHERE detected_lang = 'en'
        """,
        "slice_events": """
            WITH ranked AS (
                SELECT CAST(event_id AS VARCHAR) AS row_key,
                       row_number() OVER
                           (ORDER BY ts, CAST(event_id AS VARCHAR)) - 1 AS rn,
                       count(*) OVER () AS n
                FROM events
            ),
            params AS (
                SELECT n,
                       CASE WHEN n > 28
                            THEN CAST(floor(28 + log10(n)) AS BIGINT)
                            ELSE n END AS slice_count
                FROM (SELECT DISTINCT n FROM ranked)
            ),
            p2 AS (
                SELECT n, CAST(floor(CAST(n AS DOUBLE) / slice_count) AS BIGINT)
                           AS per FROM params
            )
            SELECT CAST(CAST(ceil(CAST(r.rn AS DOUBLE) / p.per) AS BIGINT)
                        AS INTEGER) AS slice_number,
                   r.row_key
            FROM ranked r CROSS JOIN p2 p
            WHERE r.rn <= p.per * CAST(floor(CAST(r.n - 1 AS DOUBLE) / p.per)
                                       AS BIGINT)
        """,
        "decontaminate_docs": """
            WITH bench AS (
                SELECT doc_id, text FROM documents
                WHERE CAST(('0x' || substr(
                          md5('s0:' || CAST(doc_id AS VARCHAR)), 1, 15))
                      AS UBIGINT) < 115292150460684704
            ),
            corpus AS (
                SELECT doc_id, text FROM documents
                WHERE doc_id NOT IN (SELECT doc_id FROM bench)
            ),
            bgrams AS (
                SELECT DISTINCT g.gm FROM (
                    SELECT UNNEST(list_transform(range(len(arr) - 7),
                        i -> arr[i+1]||' '||arr[i+2]||' '||arr[i+3]||' '||arr[i+4]||' '||arr[i+5]||' '||arr[i+6]||' '||arr[i+7]||' '||arr[i+8])) AS gm
                    FROM (SELECT regexp_extract_all(lower(text),
                                 '[0-9a-z_]+') AS arr FROM bench)
                    WHERE len(arr) >= 8
                ) g
            ),
            cg AS (
                SELECT doc_id, g.gm FROM (
                    SELECT doc_id,
                           UNNEST(list_transform(range(len(arr) - 7),
                        i -> arr[i+1]||' '||arr[i+2]||' '||arr[i+3]||' '||arr[i+4]||' '||arr[i+5]||' '||arr[i+6]||' '||arr[i+7]||' '||arr[i+8])) AS gm
                    FROM (SELECT doc_id, regexp_extract_all(lower(text),
                                 '[0-9a-z_]+') AS arr FROM corpus)
                    WHERE len(arr) >= 8
                ) g GROUP BY 1, 2
            ),
            hits AS (
                SELECT cg.doc_id, count(*) AS n_hit
                FROM cg JOIN bgrams ON cg.gm = bgrams.gm GROUP BY 1
            )
            SELECT c.doc_id,
                   coalesce(h.n_hit, 0) > 0 AS contaminated,
                   coalesce(h.n_hit, 0) AS n_hit
            FROM corpus c LEFT JOIN hits h ON h.doc_id = c.doc_id
        """,
        "pack_sequences": """
            WITH RECURSIVE counts AS (
                SELECT doc_id, doc_id % 8 AS part,
                       len(regexp_extract_all(text, '\\S+')) AS ws_tokens
                FROM documents
            ),
            ordered AS (
                SELECT doc_id, part, ws_tokens,
                       row_number() OVER (PARTITION BY part
                                          ORDER BY doc_id) AS rn
                FROM counts
            ),
            scan(part, rn, doc_id, ws_tokens, acc, pack) AS (
                SELECT part, rn, doc_id, ws_tokens, ws_tokens, 0
                FROM ordered WHERE rn = 1
                UNION ALL
                SELECT o.part, o.rn, o.doc_id, o.ws_tokens,
                       CASE WHEN s.acc + o.ws_tokens > 256
                            THEN o.ws_tokens
                            ELSE s.acc + o.ws_tokens END,
                       CASE WHEN s.acc + o.ws_tokens > 256
                            THEN s.pack + 1 ELSE s.pack END
                FROM scan s
                JOIN ordered o ON o.part = s.part AND o.rn = s.rn + 1
            )
            SELECT doc_id, part, part * 4294967296 + pack AS pack_id,
                   ws_tokens
            FROM scan
        """,
        "redact_pii": """
            WITH deco AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 10 = 0 THEN
                           text || ' contact: user' ||
                           CAST(doc_id AS VARCHAR) ||
                           '@example.com or +1 555 010 ' ||
                           lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
                           ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                           || '.1'
                       ELSE text END AS text
                FROM documents
            )
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}'
                       )) AS n_email,
                   len(regexp_extract_all(text,
                       '\\+[0-9]{1,3}[ \\-][0-9]{3}[ \\-][0-9]{3}[ \\-]?[0-9]{2,4}'
                       )) AS n_phone,
                   len(regexp_extract_all(text,
                       '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'
                       )) AS n_ip,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text,
                               '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}',
                               '[EMAIL]', 'g'),
                           '\\+[0-9]{1,3}[ \\-][0-9]{3}[ \\-][0-9]{3}[ \\-]?[0-9]{2,4}',
                           '[PHONE]', 'g'),
                       '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
                       '[IP]', 'g') AS redacted
            FROM deco
        """,
        "repetition_stats": f"""
            WITH lines AS (
                SELECT doc_id,
                       count(*) FILTER (ln <> '') AS n_lines,
                       count(DISTINCT ln) FILTER (ln <> '') AS d_lines
                FROM (
                    SELECT doc_id, l.ln
                    FROM documents,
                         UNNEST(string_split(text, chr(10))) AS l(ln)
                )
                GROUP BY 1
            ),
            toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[0-9a-z_]+') AS arr
                FROM documents
            ),
            g2 AS (
                SELECT doc_id, g.gm, count(*) AS c
                FROM (
                    SELECT doc_id,
                           UNNEST(list_transform(range(len(arr) - 1),
                               i -> arr[i + 1] || ' ' || arr[i + 2])) AS gm
                    FROM toks WHERE len(arr) >= 2
                ) g
                GROUP BY 1, 2
            ),
            top2 AS (
                SELECT doc_id, max(c) AS top_c, sum(c) AS tot
                FROM g2 GROUP BY 1
            ),
            g3 AS (
                SELECT doc_id, g.gm, count(*) AS c
                FROM (
                    SELECT doc_id,
                           UNNEST(list_transform(range(len(arr) - 2),
                               i -> arr[i + 1] || ' ' || arr[i + 2]
                                    || ' ' || arr[i + 3])) AS gm
                    FROM toks WHERE len(arr) >= 3
                ) g
                GROUP BY 1, 2
            ),
            dup3 AS (
                SELECT doc_id,
                       sum(c) FILTER (c >= 2) AS dup_occ,
                       sum(c) AS tot
                FROM g3 GROUP BY 1
            )
            SELECT d.doc_id,
                   round(CASE WHEN coalesce(l.n_lines, 0) = 0 THEN 0.0e0
                         ELSE 1.0e0 - CAST(l.d_lines AS DOUBLE) / l.n_lines
                         END, {_ROUND}) AS dup_line_frac,
                   round(coalesce(CAST(t.top_c AS DOUBLE) / t.tot, 0.0e0),
                         {_ROUND}) AS top_2gram_frac,
                   round(coalesce(CAST(d3.dup_occ AS DOUBLE) / d3.tot,
                                  0.0e0), {_ROUND}) AS dup_3gram_frac
            FROM documents d
            LEFT JOIN lines l ON l.doc_id = d.doc_id
            LEFT JOIN top2 t ON t.doc_id = d.doc_id
            LEFT JOIN dup3 d3 ON d3.doc_id = d.doc_id
        """,
        "sample_docs": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id
            FROM documents
            WHERE CAST(('0x' || substr(
                      md5('s0:' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS UBIGINT) < 288230376151711744
        """,
        "quota_sample_docs": """
            SELECT doc_id, source
            FROM (
                SELECT doc_id, source,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY CAST(('0x' || substr(
                                         md5('s0:' || CAST(doc_id AS VARCHAR)),
                                         1, 15)) AS UBIGINT),
                                    doc_id
                       ) AS rn
                FROM documents
            )
            WHERE rn <= 10
        """,
        "topk_per_source": """
            SELECT doc_id, source, n_chars
            FROM (
                SELECT doc_id, source, n_chars,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY n_chars DESC, doc_id
                       ) AS rn
                FROM documents
            )
            WHERE rn <= 3
        """,
        "cross_corpus_matches": TRANSCRIPTS_SQL + """
            SELECT t.conv_id, t.turn_idx, d.doc_id AS ref_doc_id
            FROM transcripts t JOIN documents d ON t.text = d.text
            WHERE length(t.text) > 0
        """,
        "cross_corpus_matches_bloom": TRANSCRIPTS_SQL + """
            SELECT t.conv_id, t.turn_idx, d.doc_id AS ref_doc_id
            FROM transcripts t JOIN documents d ON t.text = d.text
            WHERE length(t.text) > 0
        """,
        "normalize_text": """
            SELECT doc_id,
                   trim(regexp_replace(
                       regexp_replace(lower(text), '[^0-9a-z\\s]', ' ',
                                      'g'),
                       '\\s+', ' ', 'g')) AS norm_text
            FROM documents
        """,
        "ngram_novelty": """
            WITH arrs AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text),
                                          '[0-9a-zA-Z_]+') AS arr
                FROM documents
            ),
            gl AS (
                SELECT doc_id,
                       list_transform(range(len(arr) - 2),
                           i -> arr[i + 1] || ' ' || arr[i + 2] || ' '
                                || arr[i + 3]) AS l
                FROM arrs WHERE len(arr) >= 3
            ),
            grams AS (
                SELECT DISTINCT doc_id, g.g FROM gl, UNNEST(l) AS g(g)
            ),
            df AS (SELECT g, count(*) AS d FROM grams GROUP BY g)
            SELECT grams.doc_id,
                   count(*) AS n_grams,
                   CAST(sum(CASE WHEN df.d >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_shared
            FROM grams JOIN df ON grams.g = df.g
            GROUP BY grams.doc_id
        """,
        "inverted_index": """
            WITH tokens AS (
                SELECT DISTINCT doc_id, t.tok
                FROM documents,
                     UNNEST(regexp_extract_all(lower(text),
                                               '[0-9a-zA-Z_]+')) AS t(tok)
            )
            SELECT tok AS term,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id) AS postings,
                   count(*) AS df
            FROM tokens GROUP BY tok
        """,
        "length_percentiles": """
            SELECT source,
                   quantile_disc(n_chars, 0.5) AS p50,
                   quantile_disc(n_chars, 0.9) AS p90,
                   quantile_disc(n_chars, 0.99) AS p99
            FROM documents GROUP BY source
        """,
        "dedup_survivors_docs": f"""
            WITH RECURSIVE {_DOC_SHINGLES_CTE},
            exact_edges AS (
                SELECT CAST(a.doc_id AS VARCHAR) AS a_key,
                       CAST(b.doc_id AS VARCHAR) AS b_key
                FROM documents a JOIN documents b
                  ON a.text = b.text AND a.doc_id <> b.doc_id
            ),
            near_edges AS (
                SELECT CAST(a_id AS VARCHAR) AS a_key,
                       CAST(b_id AS VARCHAR) AS b_key
                FROM near_pairs
            ),
            edges AS (
                SELECT a_key, b_key FROM exact_edges
                UNION SELECT b_key, a_key FROM exact_edges
                UNION SELECT a_key, b_key FROM near_edges
                UNION SELECT b_key, a_key FROM near_edges
            ),
            reach(node, r) AS (
                SELECT CAST(doc_id AS VARCHAR), CAST(doc_id AS VARCHAR)
                FROM documents
                UNION
                SELECT reach.node, edges.b_key
                FROM reach JOIN edges ON reach.r = edges.a_key
            ),
            clusters AS (
                SELECT node AS row_key, min(r) AS cluster_id
                FROM reach GROUP BY node
            ),
            ranked AS (
                SELECT c.row_key, c.cluster_id, d.n_chars,
                       row_number() OVER (
                           PARTITION BY c.cluster_id
                           ORDER BY d.n_chars DESC, c.row_key ASC
                       ) AS rn
                FROM clusters c
                JOIN documents d
                  ON CAST(d.doc_id AS VARCHAR) = c.row_key
            )
            SELECT row_key, cluster_id, n_chars
            FROM ranked WHERE rn = 1
        """,
        "fuzzy_decontam_transcripts": TRANSCRIPTS_SQL + f"""
            , corpus_arrs AS (
                SELECT conv_id || ':' || CAST(turn_idx AS VARCHAR) AS ck,
                       regexp_extract_all(lower(text),
                                          '[0-9a-zA-Z_]+') AS arr
                FROM transcripts
            ),
            corpus_shl AS (
                SELECT ck,
                       CASE WHEN len(arr) > 3 THEN
                           list_transform(range(len(arr) - 2),
                               i -> arr[i + 1] || ' ' || arr[i + 2]
                                    || ' ' || arr[i + 3])
                       ELSE [array_to_string(arr, ' ')] END AS shl
                FROM corpus_arrs WHERE len(arr) > 0
            ),
            corpus_sh AS (
                SELECT DISTINCT ck, s.sh
                FROM corpus_shl, UNNEST(shl) AS s(sh)
            ),
            corpus_n AS (
                SELECT ck, count(*) AS n FROM corpus_sh GROUP BY 1
            ),
            bench_arrs AS (
                SELECT CAST(doc_id AS VARCHAR) AS qk,
                       regexp_extract_all(lower(text),
                                          '[0-9a-zA-Z_]+') AS arr
                FROM documents WHERE doc_id < 50
            ),
            bench_shl AS (
                SELECT qk,
                       CASE WHEN len(arr) > 3 THEN
                           list_transform(range(len(arr) - 2),
                               i -> arr[i + 1] || ' ' || arr[i + 2]
                                    || ' ' || arr[i + 3])
                       ELSE [array_to_string(arr, ' ')] END AS shl
                FROM bench_arrs WHERE len(arr) > 0
            ),
            bench_sh AS (
                SELECT DISTINCT qk, s.sh
                FROM bench_shl, UNNEST(shl) AS s(sh)
            ),
            bench_n AS (
                SELECT qk, count(*) AS n FROM bench_sh GROUP BY 1
            ),
            common AS (
                SELECT c.ck, q.qk, count(*) AS c
                FROM corpus_sh c JOIN bench_sh q ON c.sh = q.sh
                GROUP BY 1, 2
            )
            SELECT p.ck AS corpus_key, p.qk AS bench_key,
                   round(CAST(p.c AS DOUBLE)
                         / (cn.n + bn.n - p.c), {_ROUND}) AS jaccard
            FROM common p
            JOIN corpus_n cn ON cn.ck = p.ck
            JOIN bench_n bn ON bn.qk = p.qk
            WHERE CAST(p.c AS DOUBLE) / (cn.n + bn.n - p.c) >= 0.8
        """,
        "value_percentiles_by_type": """
            WITH q AS (
                SELECT event_type,
                       CAST(round(value * 1000, 0) AS BIGINT) AS vm
                FROM events
            )
            SELECT event_type,
                   CAST(quantile_disc(vm, 0.5) AS DOUBLE) / 1000.0
                       AS p50,
                   CAST(quantile_disc(vm, 0.9) AS DOUBLE) / 1000.0
                       AS p90,
                   CAST(quantile_disc(vm, 0.99) AS DOUBLE) / 1000.0
                       AS p99
            FROM q GROUP BY event_type
        """,
        "characteristic_terms": """
            WITH tokens AS (
                SELECT doc_id, t.tok
                FROM documents,
                     UNNEST(regexp_extract_all(lower(text),
                                               '[0-9a-zA-Z_]+')) AS t(tok)
            ),
            tf AS (
                SELECT doc_id, tok, count(*) AS tf
                FROM tokens GROUP BY 1, 2
            ),
            df AS (
                SELECT tok, count(DISTINCT doc_id) AS df
                FROM tokens GROUP BY 1
            )
            SELECT tf.doc_id, tf.tok AS top_term, tf.tf, df.df
            FROM tf JOIN df ON tf.tok = df.tok
            QUALIFY row_number() OVER (
                PARTITION BY tf.doc_id
                ORDER BY tf.tf DESC, df.df, tf.tok) = 1
        """,
        "token_counts": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\S+')) AS ws_tokens,
                   len(regexp_extract_all(
                       text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS bpe_tokens
            FROM documents
        """,
        "quality_scores": f"""
            WITH words AS (
                SELECT doc_id, w.word
                FROM documents,
                     UNNEST(regexp_extract_all(lower(text), '\\S+')) AS w(word)
            ),
            agg AS (
                SELECT doc_id,
                       count(*) AS n_words,
                       sum(CASE WHEN word IN ({_STOPWORD_LIST})
                           THEN 1 ELSE 0 END) AS n_stop,
                       sum(length(word)) AS word_chars
                FROM words GROUP BY 1
            ),
            punct AS (
                SELECT doc_id, length(text) AS n_chars,
                       len(regexp_extract_all(
                           text, '[.,;:!?''"()\\[\\]{{}}]')) AS n_punct
                FROM documents
            )
            SELECT p.doc_id,
                   p.n_chars AS n_chars_q,
                   coalesce(a.n_words, 0) AS n_words,
                   round(CAST(coalesce(a.n_stop, 0) AS DOUBLE)
                         / greatest(coalesce(a.n_words, 0), 1), {_ROUND})
                       AS stopword_ratio,
                   round(CAST(p.n_punct AS DOUBLE)
                         / greatest(p.n_chars, 1), {_ROUND}) AS punct_ratio,
                   round(CAST(coalesce(a.word_chars, 0) AS DOUBLE)
                         / greatest(coalesce(a.n_words, 0), 1), {_ROUND})
                       AS mean_word_len
            FROM punct p LEFT JOIN agg a ON a.doc_id = p.doc_id
        """,
        "ann_topk": f"""
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qv
                FROM embeddings WHERE vec_id < 10
            ),
            sims AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]),
                           CAST(q.qv AS DOUBLE[])) AS cosine
                FROM embeddings e CROSS JOIN q
                WHERE e.vec_id <> q.query_id
            ),
            ranked AS (
                SELECT query_id, neighbor_id, cosine,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) AS rank
                FROM sims
            )
            SELECT query_id, neighbor_id,
                   round(cosine, {_ROUND}) AS cosine, rank
            FROM ranked WHERE rank <= 10
        """,
        "hard_negatives": f"""
            WITH sims AS (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]),
                           CAST(q.embedding AS DOUBLE[])) AS cosine
                FROM embeddings e CROSS JOIN embeddings q
                WHERE e.vec_id <> q.vec_id AND e.label <> q.label
            ),
            ranked AS (
                SELECT query_id, neighbor_id, cosine,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) AS rank
                FROM sims
            )
            SELECT query_id, neighbor_id,
                   round(cosine, {_ROUND}) AS cosine, rank
            FROM ranked WHERE rank <= 3
        """,
        "quantize_embeddings": f"""
            WITH s AS (
                SELECT vec_id,
                       list_max(list_transform(
                           CAST(embedding AS DOUBLE[]),
                           x -> abs(x))) AS scale
                FROM embeddings
            ),
            q AS (
                SELECT e.vec_id, s.scale,
                       CASE WHEN s.scale = 0 THEN 0.0
                            ELSE round(t.x / s.scale * 127) END AS qv
                FROM embeddings e
                JOIN s USING (vec_id),
                     UNNEST(CAST(e.embedding AS DOUBLE[])) AS t(x)
            )
            SELECT vec_id,
                   round(any_value(scale) + 1e-9, {_ROUND}) AS scale,
                   CAST(sum(qv) AS BIGINT) AS q_sum,
                   CAST(min(qv) AS BIGINT) AS q_min,
                   CAST(max(qv) AS BIGINT) AS q_max
            FROM q GROUP BY vec_id
        """,
        "knn_self_join": f"""
            WITH sims AS (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]),
                           CAST(q.embedding AS DOUBLE[])) AS cosine
                FROM embeddings e CROSS JOIN embeddings q
                WHERE e.vec_id <> q.vec_id
            ),
            ranked AS (
                SELECT query_id, neighbor_id, cosine,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) AS rank
                FROM sims
            )
            SELECT query_id, neighbor_id,
                   round(cosine, {_ROUND}) AS cosine, rank
            FROM ranked WHERE rank <= 3
        """,
        "bm25_topk": f"""
            WITH tokens AS (
                SELECT doc_id, t.tok
                FROM documents,
                     UNNEST(regexp_extract_all(lower(text),
                                               '[0-9a-zA-Z_]+')) AS t(tok)
            ),
            corpus AS (
                SELECT (SELECT count(*) FROM documents) AS n,
                       (SELECT count(*) FROM tokens) AS total_tokens
            ),
            dl AS (
                SELECT doc_id, count(*) AS dl FROM tokens GROUP BY 1
            ),
            q(tok) AS (VALUES ('data'), ('merge'), ('window')),
            df AS (
                SELECT tok, count(DISTINCT doc_id) AS df
                FROM tokens WHERE tok IN (SELECT tok FROM q) GROUP BY 1
            ),
            tf AS (
                SELECT doc_id, tok, count(*) AS tf
                FROM tokens WHERE tok IN (SELECT tok FROM q) GROUP BY 1, 2
            ),
            scored AS (
                SELECT tf.doc_id,
                       sum(ln(1.0 + (corpus.n - df.df + 0.5)
                                    / (df.df + 0.5))
                           * (tf.tf * (1.2 + 1.0))
                           / (tf.tf + 1.2 * (1.0 - 0.75
                              + 0.75 * dl.dl
                                / (corpus.total_tokens * 1.0 / corpus.n)))
                          ) AS bm25
                FROM tf
                JOIN df USING (tok)
                JOIN dl ON dl.doc_id = tf.doc_id
                CROSS JOIN corpus
                GROUP BY tf.doc_id
            )
            SELECT doc_id, round(bm25 + 1e-9, {_ROUND}) AS bm25
            FROM scored
            ORDER BY scored.bm25 DESC, doc_id
            LIMIT 10
        """,
        "ann_topk_ivf": f"""
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qv
                FROM embeddings WHERE vec_id < 10
            ),
            sims AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]),
                           CAST(q.qv AS DOUBLE[])) AS cosine
                FROM embeddings e CROSS JOIN q
                WHERE e.vec_id <> q.query_id
            ),
            ranked AS (
                SELECT query_id, neighbor_id, cosine,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) AS rank
                FROM sims
            )
            SELECT query_id, neighbor_id,
                   round(cosine, {_ROUND}) AS cosine, rank
            FROM ranked WHERE rank <= 10
        """,
        "embedding_near_pairs": f"""
            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                   round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), {_ROUND}) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(
                      CAST(a.embedding AS DOUBLE[]),
                      CAST(b.embedding AS DOUBLE[])) >= 0.35
        """,
        "dbscan_embeddings": _dbscan_embeddings_sql(),
        "semantic_dedup": """
            WITH RECURSIVE pairs AS (
                SELECT a.vec_id AS a_id, b.vec_id AS b_id
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(
                          CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) >= 0.35
            ),
            edges AS (
                SELECT a_id, b_id FROM pairs
                UNION SELECT b_id, a_id FROM pairs
            ),
            reach(node, r) AS (
                SELECT vec_id, vec_id FROM embeddings
                UNION
                SELECT reach.node, edges.b_id
                FROM reach JOIN edges ON reach.r = edges.a_id
            )
            SELECT node AS vec_id, min(r) AS cluster_id,
                   (node = min(r)) AS keep
            FROM reach GROUP BY node
        """,
        "asof_clicks_purchases": """
            WITH r0 AS (
                SELECT * FROM events WHERE event_type = 'purchase'
            ),
            r AS (
                SELECT * FROM r0
                QUALIFY row_number() OVER (
                    PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
            ),
            l AS (SELECT * FROM events WHERE event_type = 'click')
            SELECT l.event_id,
                   l.user_id,
                   l.ts,
                   COALESCE(r.event_id, -1) AS r_event_id,
                   COALESCE(r.value, -1.0) AS r_value
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "range_join_events": """
            WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
            r AS (SELECT * FROM events WHERE event_type = 'purchase')
            SELECT l.event_id,
                   l.user_id,
                   l.ts,
                   r.event_id AS r_iv_id,
                   r.value AS r_iv_value
            FROM l JOIN r
              ON l.user_id = r.user_id
             AND l.ts BETWEEN r.ts AND r.ts + INTERVAL 1 DAY
        """,
        "sliding_window_events": f"""
            WITH ev AS (
                SELECT user_id, value, epoch_us(ts) AS tus FROM events
            ),
            ex AS (
                SELECT user_id, value,
                       ((tus // 900000000) - t.j) * 900 AS window_start
                FROM ev, UNNEST(generate_series(0, 3)) AS t(j)
                WHERE ((tus // 900000000) - t.j) * 900000000
                      + 3600000000 > tus
            )
            SELECT user_id, window_start, count(*) AS n_events,
                   round(sum(value), {_ROUND}) AS sum_value,
                   round(avg(value), {_ROUND}) AS mean_value
            FROM ex GROUP BY 1, 2
        """,
        "windowed_events": f"""
            SELECT user_id,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600
                       AS window_start,
                   count(*) AS n_events,
                   round(sum(value), {_ROUND}) AS sum_value,
                   round(avg(value), {_ROUND}) AS mean_value
            FROM events GROUP BY 1, 2
        """,
        "sessionize_events": """
            WITH ordered AS (
                -- order by FLOORED-second then id on both the marker
                -- and the cumsum (the engine sorts by (tss, id); a
                -- microsecond-ordered lag could attach the boundary
                -- to a different row within a shared second)
                SELECT event_id, user_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS tss,
                       lag(CAST(floor(epoch(ts)) AS BIGINT))
                           OVER (PARTITION BY user_id
                                 ORDER BY CAST(floor(epoch(ts))
                                               AS BIGINT), event_id)
                           AS prev
                FROM events
            )
            SELECT event_id, user_id,
                   CAST(sum(CASE WHEN prev IS NULL OR tss - prev > 1800
                                 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY tss, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS session_id
            FROM ordered
        """,
        "running_qty_per_part": """
            SELECT l_partkey, l_orderkey, l_linenumber,
                   count(*) OVER w AS running_n,
                   CAST(sum(CAST(l_quantity AS BIGINT)) OVER w AS BIGINT)
                       AS running_sum
            FROM lineitem
            WINDOW w AS (PARTITION BY l_partkey
                         ORDER BY l_shipdate, l_orderkey, l_linenumber
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "rolling_order_spend": """
            SELECT o_orderkey, o_custkey,
                   count(*) OVER w AS rolling_n,
                   CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                        OVER w AS BIGINT) AS rolling_sum
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "length_deciles": """
            WITH c AS (SELECT n_chars, count(*) AS m
                       FROM documents GROUP BY 1),
            cum AS (SELECT n_chars,
                           sum(m) OVER (ORDER BY n_chars) AS cm
                    FROM c),
            tot AS (SELECT count(*) AS n FROM documents)
            SELECT d.doc_id, d.n_chars,
                   CAST((10 * cum.cm + tot.n - 1) // tot.n AS BIGINT)
                       AS decile
            FROM documents d
            JOIN cum ON cum.n_chars = d.n_chars
            CROSS JOIN tot
        """,
        "event_dedup_window": """
            WITH g AS (
                SELECT event_id, ts, user_id, event_type,
                       date_diff('microsecond',
                           lag(ts) OVER (PARTITION BY user_id, event_type
                                         ORDER BY ts, event_id),
                           ts) AS gap
                FROM events
            )
            SELECT event_id, ts, user_id, event_type
            FROM g WHERE gap IS NULL OR gap > 7200000000
        """,
        "event_gaps": """
            SELECT event_id, user_id, ts,
                   COALESCE(date_diff(
                       'microsecond',
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                       ts), -1) AS gap_us
            FROM events
        """,
        "top_bigrams": """
            WITH arrs AS (
                SELECT regexp_extract_all(lower(coalesce(text, '')),
                                          '[0-9a-z_]+') AS arr
                FROM documents
            ), pairs AS (
                SELECT arr[t.i + 1] || ' ' || arr[t.i + 2] AS bigram
                FROM arrs,
                     UNNEST(range(greatest(len(arr) - 1, 0))) AS t(i)
            )
            SELECT bigram, count(*) AS n
            FROM pairs GROUP BY 1
            ORDER BY n DESC, bigram DESC
            LIMIT 50
        """,
        "train_val_test_split": _SPLIT_SQL,
        "training_shards": _training_shards_sql(),
        "trim_context_window": TRANSCRIPTS_SQL + """
            SELECT conv_id, turn_idx, n_tok, cum_tokens FROM (
                SELECT conv_id, turn_idx, n_tok,
                       CAST(sum(n_tok) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx DESC
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                           AS cum_tokens
                FROM (
                    SELECT conv_id, turn_idx,
                           CAST(len(regexp_extract_all(
                               lower(coalesce(text, '')),
                               '[0-9a-z_]+')) AS BIGINT) AS n_tok
                    FROM transcripts
                )
            ) WHERE cum_tokens <= 60
        """,
        "drop_boilerplate_turns": TRANSCRIPTS_SQL + """
            SELECT conv_id, turn_idx, role
            FROM transcripts
            WHERE coalesce(text, '') NOT IN (
                SELECT txt FROM (
                    SELECT coalesce(text, '') AS txt,
                           count(DISTINCT conv_id) AS c
                    FROM transcripts GROUP BY 1
                ) WHERE c >= 2
            )
        """,
        "vocab_coverage": """
            WITH arrs AS (
                SELECT regexp_extract_all(lower(coalesce(text, '')),
                                          '[0-9a-z_]+') AS arr
                FROM documents
            ), toks AS (
                SELECT t.tok FROM arrs, UNNEST(arr) AS t(tok)
            ), uni AS (
                SELECT tok, count(*) AS n FROM toks GROUP BY 1
            ), byn AS (
                SELECT n, count(*) AS n_terms,
                       CAST(n * count(*) AS BIGINT) AS tokens
                FROM uni GROUP BY 1
            ), cum AS (
                SELECT n, n_terms, tokens,
                       CAST(sum(tokens) OVER (ORDER BY n DESC)
                            AS BIGINT) AS cumtok,
                       CAST(sum(n_terms) OVER (ORDER BY n DESC)
                            AS BIGINT) AS cumterms
                FROM byn
            ), tot AS (
                SELECT CAST(sum(tokens) AS BIGINT) AS T FROM byn
            ), covs AS (
                SELECT * FROM (VALUES (0.5), (0.9), (0.99)) AS v(c)
            )
            SELECT c AS coverage,
                   q.cumterms - q.n_terms
                     + CAST(ceil((c * T - (q.cumtok - q.tokens)) / q.n)
                            AS BIGINT) AS n_terms,
                   (q.cumtok - q.tokens)
                     + CAST(ceil((c * T - (q.cumtok - q.tokens)) / q.n)
                            AS BIGINT) * q.n AS covered_tokens
            FROM covs, tot,
            LATERAL (SELECT * FROM cum
                     WHERE CAST(cumtok AS DOUBLE) >= c * T
                     ORDER BY cumtok LIMIT 1) q
        """,
        "pmi_bigrams": """
            WITH arrs AS (
                SELECT regexp_extract_all(lower(coalesce(text, '')),
                                          '[0-9a-z_]+') AS arr
                FROM documents
            ), toks AS (
                SELECT t.tok FROM arrs, UNNEST(arr) AS t(tok)
            ), uni AS (
                SELECT tok AS term, count(*) AS n_term
                FROM toks GROUP BY 1
            ), pairs AS (
                SELECT arr[t.i + 1] AS w1, arr[t.i + 2] AS w2
                FROM arrs,
                     UNNEST(range(greatest(len(arr) - 1, 0))) AS t(i)
            ), big AS (
                SELECT w1, w2, count(*) AS n_ab
                FROM pairs GROUP BY 1, 2
            ), tot AS (
                SELECT (SELECT count(*) FROM toks) AS n_tok,
                       (SELECT count(*) FROM pairs) AS n_big
            )
            SELECT w1 || ' ' || w2 AS bigram, n_ab,
                   round(ln((CAST(n_ab AS DOUBLE) * n_tok * n_tok)
                            / (CAST(n_big AS DOUBLE) * u1.n_term
                               * u2.n_term))
                         + 1e-9, 6) AS pmi
            FROM big
            JOIN uni u1 ON big.w1 = u1.term
            JOIN uni u2 ON big.w2 = u2.term, tot
            WHERE n_ab >= 5
            ORDER BY pmi DESC, bigram
            LIMIT 30
        """,
        "conversation_stats": TRANSCRIPTS_SQL + """
            SELECT conv_id,
                   count(*) AS n_turns,
                   count(*) FILTER (WHERE role = 'user') AS n_user,
                   count(*) FILTER (WHERE role = 'assistant')
                       AS n_assistant,
                   count(*) FILTER (WHERE role = 'tool') AS n_tool,
                   sum(len(regexp_extract_all(lower(coalesce(text, '')),
                                              '[0-9a-z_]+')))
                       AS n_tokens
            FROM transcripts
            GROUP BY conv_id
        """,
        "token_budget_mix": """
            WITH tok AS (
                SELECT doc_id, source,
                       len(regexp_extract_all(lower(coalesce(text, '')),
                                              '[0-9a-z_]+')) AS n_tokens,
                       CAST(('0x' || substr(
                           md5('mix:' || CAST(doc_id AS VARCHAR)),
                           1, 15)) AS UBIGINT) AS hkey
                FROM documents
            ), run AS (
                SELECT doc_id, source, n_tokens,
                       sum(n_tokens) OVER (
                           PARTITION BY source ORDER BY hkey, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
                FROM tok
            )
            SELECT doc_id, source, n_tokens FROM run WHERE cum <= 700
        """,
        "transcript_integrity": TRANSCRIPTS_SQL + """,
            ord AS (
                SELECT conv_id, turn_idx, ts, text,
                       lag(ts) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx, ts) AS pts
                FROM transcripts
            )
            SELECT conv_id,
                   count(*) AS n_turns,
                   count(*) - count(DISTINCT turn_idx) AS dup_turns,
                   count(*) FILTER (WHERE text IS NULL OR text = '')
                       AS n_empty,
                   coalesce(bool_and(ts >= pts)
                            FILTER (WHERE pts IS NOT NULL), TRUE)
                       AS ts_monotone
            FROM ord
            GROUP BY conv_id
        """,
        "prefix_dup_groups": """
            WITH pref AS (
                SELECT doc_id,
                       array_to_string(list_slice(
                           regexp_extract_all(lower(coalesce(text, '')),
                                              '[0-9a-z_]+'),
                           1, 10), ' ') AS p
                FROM documents
            )
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY p) AS cluster_id
            FROM pref
            QUALIFY count(*) OVER (PARTITION BY p) >= 2
        """,
        "event_transitions": """
            WITH w AS (
                SELECT event_type,
                       lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                           AS prev_type
                FROM events
            )
            SELECT prev_type, event_type AS next_type, count(*) AS n
            FROM w
            WHERE prev_type IS NOT NULL AND event_type IS NOT NULL
            GROUP BY 1, 2
        """,
        "pivot_event_counts": f"""
            SELECT user_id,
                   {", ".join(
                       f"count(*) FILTER (WHERE event_type = '{c}')"
                       f" AS n_{c}" for c in _PIVOT_CATS)},
                   count(*) FILTER (WHERE event_type IS NULL
                       OR event_type NOT IN (
                           {", ".join(f"'{c}'" for c in _PIVOT_CATS)}))
                       AS n_other
            FROM events GROUP BY 1
        """,
        "assemble_conversations": TRANSCRIPTS_SQL + """
            SELECT conv_id,
                   string_agg(text, ' ' ORDER BY turn_idx) AS convo
            FROM transcripts GROUP BY 1
        """,
        "customers_without_recent_orders": """
            SELECT c_custkey, c_mktsegment FROM customer c
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= DATE '1996-01-01'
                  AND o.o_orderdate < DATE '1997-01-01')
        """,
        "stratified_sample_docs": _stratified_sql(),
        "distinct_users_per_type": """
            SELECT event_type, count(DISTINCT user_id) AS n_distinct
            FROM events GROUP BY 1
        """,
        "rollup_chars_by_source": """
            SELECT source, count(*) AS n_rows,
                   CAST(sum(COALESCE(n_chars, 0)) AS BIGINT)
                       AS sum_value
            FROM documents GROUP BY source
            UNION ALL
            SELECT '__all__' AS source, count(*) AS n_rows,
                   CAST(sum(COALESCE(n_chars, 0)) AS BIGINT)
                       AS sum_value
            FROM documents
        """,
        "corr_qty_price_by_flag": f"""
            WITH q AS (
                SELECT l_returnflag,
                       CAST(round(l_quantity, 0) AS BIGINT) AS x,
                       CAST(round(l_extendedprice, 0) AS BIGINT) AS y
                FROM lineitem
            ),
            mo AS (
                SELECT l_returnflag,
                       count(*) AS n,
                       CAST(sum(x) AS BIGINT) AS sx,
                       CAST(sum(y) AS BIGINT) AS sy,
                       CAST(sum(x * x) AS BIGINT) AS sxx,
                       CAST(sum(y * y) AS BIGINT) AS syy,
                       CAST(sum(x * y) AS BIGINT) AS sxy
                FROM q GROUP BY 1
            )
            SELECT l_returnflag, n,
                   round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                   - CAST(sy AS DOUBLE)
                                     * CAST(sy AS DOUBLE))),
                         {_ROUND}) AS corr
            FROM mo
        """,
        "length_histogram_by_source": """
            WITH binned AS (
                SELECT source,
                       LEAST(GREATEST((n_chars - 0) * 20 // 600,
                                      0), 19) AS bin
                FROM documents WHERE n_chars IS NOT NULL
            )
            SELECT source, bin,
                   CAST(bin AS DOUBLE) * 30.0 AS bin_lo,
                   count(*) AS n
            FROM binned GROUP BY 1, 2
        """,
        "latest_event_per_user": """
            SELECT user_id, event_id, epoch_us(ts) AS ts_us
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id
                ORDER BY ts DESC, event_id ASC) = 1
        """,
        "mode_event_type_per_user": """
            WITH counts AS (
                -- engine mode excludes NULL values (SQL aggregate
                -- semantics); mirror that here
                SELECT user_id, event_type, count(*) AS n
                FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
            ),
            ranked AS (
                SELECT user_id, event_type, n,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY n DESC, event_type ASC) AS rn
                FROM counts
            )
            SELECT user_id, event_type AS mode_value,
                   n AS mode_count
            FROM ranked WHERE rn = 1
        """,
        "pricing_summary": """
            WITH c AS (
                SELECT l_returnflag, l_linestatus,
                       CAST(round(l_quantity, 0) AS BIGINT) AS qty,
                       CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                           AS ep,
                       CAST(round(l_discount * 100, 0) AS BIGINT) AS disc,
                       CAST(round(l_tax * 100, 0) AS BIGINT) AS tax
                FROM lineitem
                WHERE l_shipdate <= (SELECT max(l_shipdate) FROM lineitem)
                                    - INTERVAL 90 DAY
            )
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(qty) AS BIGINT) AS sum_qty,
                   CAST(sum(ep) AS BIGINT) AS sum_base_cents,
                   CAST(sum(ep * (100 - disc)) AS BIGINT) AS sum_disc_e4,
                   CAST(sum(ep * (100 - disc) * (100 + tax)) AS BIGINT)
                       AS sum_charge_e6,
                   count(*) AS count_order,
                   CAST(CAST(sum(qty) AS BIGINT) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS avg_qty,
                   CAST(CAST(sum(ep) AS BIGINT) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS avg_price_cents
            FROM c GROUP BY 1, 2
        """,
        "cluster_size_histogram": """
            WITH g AS (
                SELECT count(*) AS n
                FROM documents GROUP BY coalesce(text, '')
            )
            SELECT n AS cluster_size, count(*) AS n_clusters
            FROM g GROUP BY 1
        """,
        "exact_dup_rate_by_source": """
            WITH g AS (
                SELECT source, count(*) AS n
                FROM documents GROUP BY source, coalesce(text, '')
            )
            SELECT source,
                   CAST(sum(n) AS BIGINT) AS n_rows,
                   count(*) AS n_uniq,
                   CAST(sum(n) AS BIGINT) - count(*) AS dup_rows,
                   CAST(CAST(sum(n) AS BIGINT) - count(*) AS DOUBLE)
                       / CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) AS dup_frac
            FROM g GROUP BY 1
        """,
        "filtered_revenue": """
            SELECT count(*) AS n_rows,
                   coalesce(CAST(sum(
                       CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                       * CAST(round(l_discount * 100, 0) AS BIGINT)
                   ) AS BIGINT), 0) AS revenue_e4
            FROM lineitem
            WHERE l_shipdate >= DATE '1997-01-01'
              AND l_shipdate < DATE '1998-01-01'
              AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN 2 AND 6
              AND l_quantity < 25
        """,
        "top_unshipped_orders": """
            SELECT l_orderkey, o_orderdate,
                   CAST(sum(
                       CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                   ) AS BIGINT) AS revenue_e4
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < DATE '1998-06-01'
              AND l_shipdate > DATE '1998-06-01'
            GROUP BY 1, 2
            ORDER BY revenue_e4 DESC, l_orderkey
            LIMIT 10
        """,
        "revenue_by_nation": """
            SELECT n_name, count(*) AS n_rows,
                   CAST(sum(
                       CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                   ) AS BIGINT) AS revenue_e4
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= DATE '1996-01-01'
              AND o_orderdate < DATE '1998-01-01'
            GROUP BY 1
        """,
        "session_stats": """
            WITH ordered AS (
                -- same (floored-second, id) ordering as the engine's
                -- _session_segments on both marker and cumsum
                SELECT user_id, event_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS tss,
                       lag(CAST(floor(epoch(ts)) AS BIGINT))
                           OVER (PARTITION BY user_id
                                 ORDER BY CAST(floor(epoch(ts))
                                               AS BIGINT), event_id)
                           AS prev
                FROM events
            ),
            tagged AS (
                SELECT user_id, tss,
                       CAST(sum(CASE WHEN prev IS NULL
                                          OR tss - prev > 1800
                                     THEN 1 ELSE 0 END)
                            OVER (PARTITION BY user_id
                                  ORDER BY tss, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                           AS session_id
                FROM ordered
            )
            SELECT user_id, session_id,
                   count(*) AS n_events,
                   max(tss) - min(tss) AS duration_sec
            FROM tagged GROUP BY 1, 2
        """,
        "label_centroids": _label_centroids_sql(),
        "label_centroid_similarity": _label_centroid_similarity_sql(),
        "prototype_prune": _prototype_prune_sql(),
        "upsample_mix": _upsample_mix_sql(),
        "chunk_documents": """
            WITH seq AS (
                SELECT doc_id, text, len(text) AS L
                FROM documents WHERE len(text) > 0
            ),
            ex AS (
                SELECT doc_id, text, t.i AS chunk_idx
                FROM seq, UNNEST(range(CAST(ceil(
                    CAST(L AS DOUBLE) / 150) AS BIGINT))) AS t(i)
            )
            SELECT doc_id, chunk_idx,
                   substr(text, CAST(chunk_idx * 150 + 1 AS BIGINT),
                          200) AS chunk
            FROM ex
        """,
        "trim_length_outliers": """
            WITH qs AS (
                SELECT source,
                       quantile_disc(n_chars, 0.05) AS lo,
                       quantile_disc(n_chars, 0.95) AS hi
                FROM documents GROUP BY 1
            )
            SELECT doc_id, d.source, n_chars
            FROM documents d JOIN qs ON d.source = qs.source
            WHERE n_chars BETWEEN lo AND hi
        """,
        "langid": _langid_sql(),
        "fingerprints": _fingerprints_sql(),
        "long_span_pairs": _long_span_sql(DEFAULT_CONFIG.min_span_chars),
        "simhash_near_docs": f"""
            WITH reps AS (
                SELECT min(CAST(doc_id AS VARCHAR)) AS k, text
                FROM documents GROUP BY text
            ),
            {_simhash_cte("reps", "k")}
            SELECT a.sh_key AS a_key, b.sh_key AS b_key,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
                       AS hamming
            FROM simhashes a JOIN simhashes b ON a.sh_key < b.sh_key
            WHERE bit_count(xor(a.simhash, b.simhash))
                  <= {DEFAULT_CONFIG.simhash_dup_hamming}
        """,
        "simhash_calibration": f"""
            WITH reps_text AS (
                SELECT min(CAST(doc_id AS VARCHAR)) AS k, text
                FROM documents GROUP BY text
            ),
            {_simhash_cte("reps_text", "k")},
            sp AS (
                SELECT least(CAST(a.sh_key AS BIGINT),
                             CAST(b.sh_key AS BIGINT)) AS a_id,
                       greatest(CAST(a.sh_key AS BIGINT),
                                CAST(b.sh_key AS BIGINT)) AS b_id,
                       CAST(bit_count(xor(a.simhash, b.simhash))
                            AS INTEGER) AS hamming
                FROM simhashes a JOIN simhashes b ON a.sh_key < b.sh_key
                WHERE bit_count(xor(a.simhash, b.simhash))
                      <= {DEFAULT_CONFIG.simhash_dup_hamming}
            ),
            {_DOC_SHINGLES_CTE},
            j AS (
                SELECT sp.hamming,
                       coalesce(c.c, 0) AS c,
                       coalesce(sa.n, 0) + coalesce(sb.n, 0)
                           - coalesce(c.c, 0) AS u
                FROM sp
                LEFT JOIN pair_common c
                  ON c.a_id = sp.a_id AND c.b_id = sp.b_id
                LEFT JOIN shsize sa ON sa.doc_id = sp.a_id
                LEFT JOIN shsize sb ON sb.doc_id = sp.b_id
            )
            SELECT hamming,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(count(*) FILTER (WHERE u > 0
                            AND CAST(c AS DOUBLE) / u >= 0.8)
                        AS BIGINT) AS n_true,
                   round(CAST(count(*) FILTER (WHERE u > 0
                            AND CAST(c AS DOUBLE) / u >= 0.8) AS DOUBLE)
                         / count(*), {_ROUND}) AS precision
            FROM j GROUP BY hamming
        """,
        "chain_scan_transcripts": TRANSCRIPTS_SQL + f"""
            , ts_keyed AS (
                SELECT conv_id, turn_idx,
                       conv_id || ':' || CAST(turn_idx AS VARCHAR) AS k,
                       text
                FROM transcripts
            ),
            {_simhash_cte("ts_keyed", "k")},
            scan AS (
                SELECT t.k, s.simhash,
                       lag(s.simhash, 1, CAST(0 AS UBIGINT)) OVER
                           (PARTITION BY t.conv_id ORDER BY t.turn_idx)
                           AS prev
                FROM ts_keyed t JOIN simhashes s ON s.sh_key = t.k
            )
            SELECT k AS row_key FROM scan
            WHERE CAST(bit_count(xor(simhash, prev)) AS DOUBLE) / 64
                  > {DEFAULT_CONFIG.chain_scan_threshold}
        """,
        "funnel_click_purchase": """
            WITH f AS (
                SELECT user_id,
                       min(epoch_us(ts) // 1000000) AS from_sec
                FROM events WHERE event_type = 'click' GROUP BY 1
            ),
            conv AS (
                SELECT e.user_id, f.from_sec,
                       min(epoch_us(e.ts) // 1000000) AS to_sec
                FROM events e JOIN f USING (user_id)
                WHERE e.event_type = 'purchase'
                  AND epoch_us(e.ts) // 1000000 >= f.from_sec
                  AND epoch_us(e.ts) // 1000000 <= f.from_sec + 86400
                GROUP BY 1, 2
            )
            SELECT user_id, from_sec, to_sec,
                   to_sec - from_sec AS latency_sec
            FROM conv
        """,
        "cumulative_distinct_users": """
            WITH first_seen AS (
                SELECT user_id, min(CAST(ts AS DATE)) AS day
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                GROUP BY 1
            ),
            daily AS (
                SELECT day, count(*) AS new_keys FROM first_seen GROUP BY 1
            )
            SELECT day, CAST(new_keys AS BIGINT) AS new_keys,
                   CAST(sum(new_keys) OVER (ORDER BY day) AS BIGINT)
                       AS cum_keys
            FROM daily
        """,
        "multimodal_resize": """
            WITH px AS (
                SELECT d.doc_id,
                       (7 * d.doc_id
                        + (((oy.g * (16 + d.doc_id % 13)) // 16)
                             * (16 + d.doc_id % 17)
                           + (ox.g * (16 + d.doc_id % 17)) // 16) * 3
                        + c.g) % 256 AS v,
                       c.g AS ch
                FROM documents d,
                     generate_series(0, 15) oy(g),
                     generate_series(0, 15) ox(g),
                     generate_series(0, 2) c(g)
            )
            SELECT doc_id,
                   CAST(16 AS INTEGER) AS out_w,
                   CAST(16 AS INTEGER) AS out_h,
                   CAST(sum(v) AS BIGINT) AS pix_sum,
                   CAST(sum(CASE WHEN ch = 0 THEN v ELSE 0 END) AS BIGINT)
                       AS r_sum,
                   CAST(sum(CASE WHEN ch = 1 THEN v ELSE 0 END) AS BIGINT)
                       AS g_sum,
                   CAST(sum(CASE WHEN ch = 2 THEN v ELSE 0 END) AS BIGINT)
                       AS b_sum
            FROM px GROUP BY 1
        """,
        "multimodal_decode": """
            WITH dims AS (
                SELECT doc_id,
                       16 + doc_id % 17 AS w,
                       16 + doc_id % 13 AS h,
                       (7 * doc_id) % 256 AS a
                FROM documents
            ),
            sums AS (
                SELECT doc_id, w, h,
                       3 * w * h AS n, a,
                       (3 * w * h) // 256 AS cycles,
                       (3 * w * h) % 256 AS rem
                FROM dims
            )
            SELECT doc_id,
                   'image/ppm' AS media_type,
                   CAST(w AS INTEGER) AS meta_w,
                   CAST(h AS INTEGER) AS meta_h,
                   CAST(cycles * 32640 +
                        CASE WHEN a + rem <= 256
                             THEN rem * a + (rem * (rem - 1)) // 2
                             ELSE (256 - a) * a
                                  + ((256 - a) * (256 - a - 1)) // 2
                                  + ((rem - (256 - a))
                                     * (rem - (256 - a) - 1)) // 2
                        END AS BIGINT) AS pix_sum
            FROM sums
        """,
        "multimodal_frames": """
            WITH f AS (
                SELECT doc_id,
                       8 + doc_id % 9 AS w,
                       8 + doc_id % 7 AS h,
                       g.f AS frame_idx,
                       (11 * doc_id + 5 * g.f) % 256 AS a
                FROM documents, generate_series(0, 6) AS g(f)
                WHERE g.f <= 1 + doc_id % 5 AND g.f % 2 = 0
            ),
            s AS (
                SELECT doc_id, frame_idx, w, h, a,
                       (3 * w * h) // 256 AS cycles,
                       (3 * w * h) % 256 AS rem
                FROM f
            )
            SELECT doc_id,
                   CAST(frame_idx AS INTEGER) AS frame_idx,
                   CAST(w AS INTEGER) AS meta_w,
                   CAST(h AS INTEGER) AS meta_h,
                   CAST(cycles * 32640 +
                        CASE WHEN a + rem <= 256
                             THEN rem * a + (rem * (rem - 1)) // 2
                             ELSE (256 - a) * a
                                  + ((256 - a) * (256 - a - 1)) // 2
                                  + ((rem - (256 - a))
                                     * (rem - (256 - a) - 1)) // 2
                        END AS BIGINT) AS frame_sum
            FROM s
        """,
        # dHash replay: grid = 9x8 nearest-downsampled integer grayscale
        # of the closed-form variant image (group g = doc_id % 40,
        # w = 20 + g%9, h = 20 + g%7, channel value (3g + 5i) % 200 at
        # raster index i, + brightness v on every channel — v shifts
        # both sides of every strict comparison equally, so it is
        # omitted); bit(y,x) = gray(y,x+1) > gray(y,x), k = y*8 + x,
        # packed into two BIGINT halves exactly as dhash64 does.
        "image_dup_groups": """
            WITH p AS (
                SELECT doc_id,
                       doc_id % 40 AS g,
                       20 + (doc_id % 40) % 9 AS w,
                       20 + (doc_id % 40) % 7 AS h
                FROM documents
            ),
            grid AS (
                SELECT p.doc_id, y.g AS y, x.g AS x,
                       (((3 * p.g + 5 * (3 * (((y.g * p.h) // 8) * p.w
                                              + ((x.g * p.w) // 9)))) % 200)
                        + ((3 * p.g + 5 * (3 * (((y.g * p.h) // 8) * p.w
                                               + ((x.g * p.w) // 9)))
                            + 5) % 200)
                        + ((3 * p.g + 5 * (3 * (((y.g * p.h) // 8) * p.w
                                               + ((x.g * p.w) // 9)))
                            + 10) % 200)) // 3 AS gray
                FROM p,
                     generate_series(0, 7) y(g),
                     generate_series(0, 8) x(g)
            ),
            bits AS (
                SELECT a.doc_id, (a.y * 8 + a.x) AS k,
                       CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
                FROM grid a
                JOIN grid b ON a.doc_id = b.doc_id AND a.y = b.y
                           AND b.x = a.x + 1
                WHERE a.x < 8
            ),
            hash AS (
                SELECT doc_id,
                       CAST(SUM(CASE WHEN k >= 32
                                THEN bit * (CAST(1 AS BIGINT) << (k - 32))
                                ELSE 0 END) AS BIGINT) AS dhash_hi,
                       CAST(SUM(CASE WHEN k < 32
                                THEN bit * (CAST(1 AS BIGINT) << k)
                                ELSE 0 END) AS BIGINT) AS dhash_lo
                FROM bits GROUP BY doc_id
            )
            SELECT doc_id, dhash_hi, dhash_lo,
                   MIN(doc_id) OVER (PARTITION BY dhash_hi, dhash_lo)
                       AS img_cluster,
                   COUNT(*) OVER (PARTITION BY dhash_hi, dhash_lo)
                       AS n_members
            FROM hash
        """,
        # Same dHash replay, over the spot-perturbed corpus (v >= 4 rows
        # carry one 255-white pixel at the source of grid cell y=3,x=4 —
        # cell gray becomes exactly 255, everything else shifts by the
        # brightness v which cancels), then brute-force bit_count(xor)
        # pairs over the distinct-hash representatives.
        "image_near_dup_pairs": """
            WITH p AS (
                SELECT doc_id,
                       doc_id % 40 AS g,
                       (doc_id // 40) % 7 AS v,
                       20 + (doc_id % 40) % 9 AS w,
                       20 + (doc_id % 40) % 7 AS h
                FROM documents
            ),
            cells AS (
                SELECT p.doc_id, p.g, p.v, y.g AS y, x.g AS x,
                       3 * (((y.g * p.h) // 8) * p.w
                            + ((x.g * p.w) // 9)) AS e,
                       3 * (((3 * p.h) // 8) * p.w
                            + ((4 * p.w) // 9)) AS s
                FROM p,
                     generate_series(0, 7) y(g),
                     generate_series(0, 8) x(g)
            ),
            grid AS (
                SELECT doc_id, y, x,
                       CASE WHEN v >= 4 AND e = s THEN 255
                            ELSE ((3 * g + 5 * e) % 200
                                  + (3 * g + 5 * e + 5) % 200
                                  + (3 * g + 5 * e + 10) % 200
                                  + 3 * v) // 3 END AS gray
                FROM cells
            ),
            bits AS (
                SELECT a.doc_id, (a.y * 8 + a.x) AS k,
                       CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
                FROM grid a
                JOIN grid b ON a.doc_id = b.doc_id AND a.y = b.y
                           AND b.x = a.x + 1
                WHERE a.x < 8
            ),
            hash AS (
                SELECT doc_id,
                       CAST(SUM(CASE WHEN k >= 32
                                THEN bit * (CAST(1 AS BIGINT) << (k - 32))
                                ELSE 0 END) AS BIGINT) AS dhash_hi,
                       CAST(SUM(CASE WHEN k < 32
                                THEN bit * (CAST(1 AS BIGINT) << k)
                                ELSE 0 END) AS BIGINT) AS dhash_lo
                FROM bits GROUP BY doc_id
            ),
            reps AS (
                SELECT MIN(doc_id) AS doc_id, dhash_hi, dhash_lo
                FROM hash GROUP BY dhash_hi, dhash_lo
            )
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(bit_count(xor(a.dhash_hi, b.dhash_hi))
                        + bit_count(xor(a.dhash_lo, b.dhash_lo))
                        AS INTEGER) AS hamming
            FROM reps a JOIN reps b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.dhash_hi, b.dhash_hi))
                  + bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 6
        """,
        # Audio fingerprint replay: sample u of doc d is
        # (((13g + step*u) % mod) - mod//2) * (1+v) with g = d % 40,
        # step = 3 + g%11, mod = 1024 + 37g, v = (d // 40) % 7; frame
        # energy = sum |sample| over 64-sample frames, bit f =
        # E(f+1) > E(f), 32 bits packed LSB-first exactly as
        # audio_fingerprint64 does.
        "audio_dup_groups": """
            WITH p AS (
                SELECT doc_id,
                       doc_id % 40 AS g,
                       (doc_id // 40) % 7 AS v,
                       3 + (doc_id % 40) % 11 AS st,
                       1024 + 37 * (doc_id % 40) AS md
                FROM documents
            ),
            e AS (
                SELECT p.doc_id, f.g AS f,
                       SUM(abs(((13 * p.g + p.st * (f.g * 64 + t.g)) % p.md)
                               - p.md // 2) * (1 + p.v)) AS en
                FROM p,
                     generate_series(0, 32) f(g),
                     generate_series(0, 63) t(g)
                GROUP BY p.doc_id, f.g
            ),
            bits AS (
                SELECT a.doc_id, a.f AS k,
                       CASE WHEN b.en > a.en THEN 1 ELSE 0 END AS bit
                FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.f = a.f + 1
                WHERE a.f < 32
            ),
            fp AS (
                SELECT doc_id,
                       CAST(SUM(bit * (CAST(1 AS BIGINT) << k))
                            AS BIGINT) AS afp
                FROM bits GROUP BY doc_id
            )
            SELECT doc_id, afp,
                   MIN(doc_id) OVER (PARTITION BY afp) AS audio_cluster,
                   COUNT(*) OVER (PARTITION BY afp) AS n_members
            FROM fp
        """,
        # Per-frame dHash replay over the closed-form video corpus
        # (group g = doc_id % 40, w = 16+g%9, h = 16+g%7, 2+g%3 frames,
        # frame f channel value (7g + 11f + 5i) % 200 at raster index i,
        # brightness v omitted — cancels in strict comparisons), ordered
        # frame hashes joined 'hi:lo;hi:lo' exactly as VideoDHash does.
        "video_dup_groups": """
            WITH p AS (
                SELECT doc_id,
                       doc_id % 40 AS g,
                       16 + (doc_id % 40) % 9 AS w,
                       16 + (doc_id % 40) % 7 AS h,
                       2 + (doc_id % 40) % 3 AS nf
                FROM documents
            ),
            grid AS (
                SELECT p.doc_id, f.g AS f, y.g AS y, x.g AS x,
                       (((7 * p.g + 11 * f.g
                          + 5 * (3 * (((y.g * p.h) // 8) * p.w
                                      + ((x.g * p.w) // 9)))) % 200)
                        + ((7 * p.g + 11 * f.g
                            + 5 * (3 * (((y.g * p.h) // 8) * p.w
                                        + ((x.g * p.w) // 9)))
                            + 5) % 200)
                        + ((7 * p.g + 11 * f.g
                            + 5 * (3 * (((y.g * p.h) // 8) * p.w
                                        + ((x.g * p.w) // 9)))
                            + 10) % 200)) // 3 AS gray
                FROM p,
                     generate_series(0, 3) f(g),
                     generate_series(0, 7) y(g),
                     generate_series(0, 8) x(g)
                WHERE f.g < p.nf
            ),
            bits AS (
                SELECT a.doc_id, a.f, (a.y * 8 + a.x) AS k,
                       CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
                FROM grid a
                JOIN grid b ON a.doc_id = b.doc_id AND a.f = b.f
                           AND a.y = b.y AND b.x = a.x + 1
                WHERE a.x < 8
            ),
            fhash AS (
                SELECT doc_id, f,
                       CAST(SUM(CASE WHEN k >= 32
                                THEN bit * (CAST(1 AS BIGINT) << (k - 32))
                                ELSE 0 END) AS BIGINT) AS hi,
                       CAST(SUM(CASE WHEN k < 32
                                THEN bit * (CAST(1 AS BIGINT) << k)
                                ELSE 0 END) AS BIGINT) AS lo
                FROM bits GROUP BY doc_id, f
            ),
            vh AS (
                SELECT doc_id,
                       string_agg(CAST(hi AS VARCHAR) || ':'
                                  || CAST(lo AS VARCHAR),
                                  ';' ORDER BY f) AS vhash
                FROM fhash GROUP BY doc_id
            )
            SELECT doc_id, vhash,
                   MIN(doc_id) OVER (PARTITION BY vhash) AS video_cluster,
                   COUNT(*) OVER (PARTITION BY vhash) AS n_members
            FROM vh
        """,
        # Recut-corpus frame-hash replay (v == 4 reverses frame order,
        # v > 4 drops the last frame), ordered-key rep collapse, then
        # brute-force frame-SET Jaccard >= 0.5 over representatives —
        # set elements are the 'hi:lo' frame-hash strings (identical
        # membership to the engine's packed uint64s).
        "video_near_dup_pairs": f"""
            WITH p AS (
                SELECT doc_id,
                       doc_id % 40 AS g,
                       (doc_id // 40) % 7 AS v,
                       16 + (doc_id % 40) % 9 AS w,
                       16 + (doc_id % 40) % 7 AS h,
                       2 + (doc_id % 40) % 3 AS nf
                FROM documents
            ),
            grid AS (
                SELECT p.doc_id, p.v, f.g AS f, y.g AS y, x.g AS x,
                       (((7 * p.g + 11 * f.g
                          + 5 * (3 * (((y.g * p.h) // 8) * p.w
                                      + ((x.g * p.w) // 9)))) % 200)
                        + ((7 * p.g + 11 * f.g
                            + 5 * (3 * (((y.g * p.h) // 8) * p.w
                                        + ((x.g * p.w) // 9)))
                            + 5) % 200)
                        + ((7 * p.g + 11 * f.g
                            + 5 * (3 * (((y.g * p.h) // 8) * p.w
                                        + ((x.g * p.w) // 9)))
                            + 10) % 200)) // 3 AS gray
                FROM p,
                     generate_series(0, 3) f(g),
                     generate_series(0, 7) y(g),
                     generate_series(0, 8) x(g)
                WHERE f.g < CASE WHEN p.v > 4 THEN p.nf - 1 ELSE p.nf END
            ),
            bits AS (
                SELECT a.doc_id, a.v, a.f, (a.y * 8 + a.x) AS k,
                       CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
                FROM grid a
                JOIN grid b ON a.doc_id = b.doc_id AND a.f = b.f
                           AND a.y = b.y AND b.x = a.x + 1
                WHERE a.x < 8
            ),
            fhash AS (
                SELECT doc_id, v, f,
                       CAST(SUM(CASE WHEN k >= 32
                                THEN bit * (CAST(1 AS BIGINT) << (k - 32))
                                ELSE 0 END) AS VARCHAR) || ':' ||
                       CAST(SUM(CASE WHEN k < 32
                                THEN bit * (CAST(1 AS BIGINT) << k)
                                ELSE 0 END) AS VARCHAR) AS fh
                FROM bits GROUP BY doc_id, v, f
            ),
            vh AS (
                SELECT doc_id,
                       string_agg(fh, ';' ORDER BY
                                  CASE WHEN v = 4 THEN -f ELSE f END)
                           AS vhash
                FROM fhash GROUP BY doc_id
            ),
            reps AS (SELECT MIN(doc_id) AS doc_id FROM vh GROUP BY vhash),
            fset AS (
                SELECT DISTINCT h.doc_id, h.fh
                FROM fhash h JOIN reps r ON r.doc_id = h.doc_id
            ),
            sz AS (SELECT doc_id, count(*) AS n FROM fset GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
                FROM fset a JOIN fset b
                  ON a.fh = b.fh AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT i.a_id, i.b_id, i.c AS common, x.n AS na, y.n AS nb,
                   round(CAST(i.c AS DOUBLE) / (x.n + y.n - i.c),
                         {_ROUND}) AS jaccard
            FROM inter i
            JOIN sz x ON x.doc_id = i.a_id
            JOIN sz y ON y.doc_id = i.b_id
            WHERE CAST(i.c AS DOUBLE) / (x.n + y.n - i.c) >= 0.5
        """,
        # Shift-robust audio: closed-form avalanche frame levels
        # (energy comparisons reduce to level comparisons — frame_len
        # and the (1+v) volume factor are positive constants), exact
        # collapse on the delta-bit STREAM, overlapping 16-bit window
        # words per rep, brute-force set Jaccard >= 0.6 among reps.
        "audio_shift_near_dup_pairs": f"""
            WITH p AS (
                SELECT doc_id,
                       doc_id % 40 AS g,
                       (doc_id // 40) % 7 AS v
                FROM documents
            ),
            lv AS (
                SELECT doc_id, v, f, xor(h2, h2 // 8192) % 4000 AS lvl
                FROM (
                    SELECT doc_id, v, f,
                           (xor(h1, h1 // 32768) * 2246822519)
                               % 2147483648 AS h2
                    FROM (
                        SELECT p.doc_id, p.v, f.g AS f,
                               ((64 * p.g + f.g) * 2654435761)
                                   % 2147483648 AS h1
                        FROM p, generate_series(0, 63) f(g)
                        WHERE f.g >= p.v
                    )
                )
            ),
            bits AS (
                SELECT a.doc_id, a.f AS k,
                       CASE WHEN b.lvl > a.lvl THEN 1 ELSE 0 END AS bit
                FROM lv a JOIN lv b
                  ON a.doc_id = b.doc_id AND b.f = a.f + 1
            ),
            fp AS (
                SELECT doc_id,
                       string_agg(CAST(bit AS VARCHAR), '' ORDER BY k)
                           AS stream
                FROM bits GROUP BY doc_id
            ),
            reps AS (SELECT MIN(doc_id) AS rid FROM fp GROUP BY stream),
            win AS (
                SELECT b.doc_id, w.g AS i,
                       CAST(SUM(b.bit *
                                (CAST(1 AS BIGINT) << (b.k - w.g)))
                            AS BIGINT) AS wv
                FROM bits b, generate_series(0, 47) w(g)
                WHERE b.k >= w.g AND b.k <= w.g + 15
                GROUP BY b.doc_id, w.g
                HAVING COUNT(*) = 16
            ),
            wset AS (
                SELECT DISTINCT r.rid, w.wv
                FROM reps r JOIN win w ON w.doc_id = r.rid
            ),
            sz AS (SELECT rid, COUNT(*) AS n FROM wset GROUP BY rid),
            inter AS (
                SELECT a.rid AS a_id, b.rid AS b_id, COUNT(*) AS c
                FROM wset a JOIN wset b
                  ON a.wv = b.wv AND a.rid < b.rid
                GROUP BY 1, 2
            )
            SELECT i.a_id, i.b_id, i.c AS common, x.n AS na, y.n AS nb,
                   round(CAST(i.c AS DOUBLE) / (x.n + y.n - i.c),
                         {_ROUND}) AS jaccard
            FROM inter i
            JOIN sz x ON x.rid = i.a_id
            JOIN sz y ON y.rid = i.b_id
            WHERE CAST(i.c AS DOUBLE) / (x.n + y.n - i.c) >= 0.6
        """,
        # Cross-modal components: union of image (spot corpus: exact
        # dHash + hamming<=6 rep pairs), audio (spiked corpus: exact
        # fingerprint + hamming<=4 rep pairs) and video (recut corpus:
        # ordered-key exact + frame-set Jaccard>=0.5 rep pairs)
        # evidence, one recursive reach, min-doc_id labels.
        "multimodal_dup_clusters": """
            WITH RECURSIVE ip AS (
                SELECT doc_id,
                       doc_id % 40 AS g,
                       (doc_id // 40) % 7 AS v,
                       20 + (doc_id % 40) % 9 AS w,
                       20 + (doc_id % 40) % 7 AS h
                FROM documents
            ),
            icells AS (
                SELECT ip.doc_id, ip.g, ip.v, y.g AS y, x.g AS x,
                       3 * (((y.g * ip.h) // 8) * ip.w
                            + ((x.g * ip.w) // 9)) AS e,
                       3 * (((3 * ip.h) // 8) * ip.w
                            + ((4 * ip.w) // 9)) AS s
                FROM ip,
                     generate_series(0, 7) y(g),
                     generate_series(0, 8) x(g)
            ),
            igrid AS (
                SELECT doc_id, y, x,
                       CASE WHEN v >= 4 AND e = s THEN 255
                            ELSE ((3 * g + 5 * e) % 200
                                  + (3 * g + 5 * e + 5) % 200
                                  + (3 * g + 5 * e + 10) % 200
                                  + 3 * v) // 3 END AS gray
                FROM icells
            ),
            ibits AS (
                SELECT a.doc_id, (a.y * 8 + a.x) AS k,
                       CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
                FROM igrid a
                JOIN igrid b ON a.doc_id = b.doc_id AND a.y = b.y
                           AND b.x = a.x + 1
                WHERE a.x < 8
            ),
            ihash AS (
                SELECT doc_id,
                       CAST(SUM(CASE WHEN k >= 32
                                THEN bit * (CAST(1 AS BIGINT) << (k - 32))
                                ELSE 0 END) AS BIGINT) AS hh,
                       CAST(SUM(CASE WHEN k < 32
                                THEN bit * (CAST(1 AS BIGINT) << k)
                                ELSE 0 END) AS BIGINT) AS hl
                FROM ibits GROUP BY doc_id
            ),
            ireps AS (SELECT MIN(doc_id) AS rid, hh, hl
                      FROM ihash GROUP BY hh, hl),
            iedges AS (
                SELECT h.doc_id AS s, r.rid AS t
                FROM ihash h JOIN ireps r ON h.hh = r.hh AND h.hl = r.hl
            ),
            ipairs AS (
                SELECT a.rid AS s, b.rid AS t
                FROM ireps a JOIN ireps b ON a.rid < b.rid
                WHERE bit_count(xor(a.hh, b.hh))
                      + bit_count(xor(a.hl, b.hl)) <= 6
            ),
            aparams AS (
                SELECT doc_id,
                       doc_id % 40 AS g,
                       (doc_id // 40) % 7 AS v,
                       3 + (doc_id % 40) % 11 AS st,
                       1024 + 37 * (doc_id % 40) AS md,
                       1 + (doc_id % 40) % 62 AS kf
                FROM documents
            ),
            aener AS (
                SELECT ap.doc_id, f.g AS f,
                       SUM(abs(((13 * ap.g + ap.st * (f.g * 64 + t.g))
                                % ap.md) - ap.md // 2) * (1 + ap.v)
                           * CASE WHEN ap.v >= 4 AND f.g = ap.kf
                                  THEN 2 ELSE 1 END) AS en
                FROM aparams ap,
                     generate_series(0, 63) f(g),
                     generate_series(0, 63) t(g)
                GROUP BY ap.doc_id, f.g
            ),
            abits AS (
                SELECT a.doc_id, a.f AS k,
                       CASE WHEN b.en > a.en THEN 1 ELSE 0 END AS bit
                FROM aener a JOIN aener b ON a.doc_id = b.doc_id
                       AND b.f = a.f + 1
                WHERE a.f < 63
            ),
            afp AS (
                SELECT doc_id,
                       CAST(SUM(bit * (CAST(1 AS BIGINT) << k))
                            AS BIGINT) AS fp
                FROM abits GROUP BY doc_id
            ),
            areps AS (SELECT MIN(doc_id) AS rid, fp FROM afp GROUP BY fp),
            aedges AS (
                SELECT f.doc_id AS s, r.rid AS t
                FROM afp f JOIN areps r ON f.fp = r.fp
            ),
            apairs AS (
                SELECT a.rid AS s, b.rid AS t
                FROM areps a JOIN areps b ON a.rid < b.rid
                WHERE bit_count(xor(a.fp, b.fp)) <= 4
            ),
            vparams AS (
                SELECT doc_id,
                       doc_id % 40 AS g,
                       (doc_id // 40) % 7 AS v,
                       16 + (doc_id % 40) % 9 AS w,
                       16 + (doc_id % 40) % 7 AS h,
                       2 + (doc_id % 40) % 3 AS nf
                FROM documents
            ),
            vgrid AS (
                SELECT vp.doc_id, vp.v, f.g AS f, y.g AS y, x.g AS x,
                       (((7 * vp.g + 11 * f.g
                          + 5 * (3 * (((y.g * vp.h) // 8) * vp.w
                                      + ((x.g * vp.w) // 9)))) % 200)
                        + ((7 * vp.g + 11 * f.g
                            + 5 * (3 * (((y.g * vp.h) // 8) * vp.w
                                        + ((x.g * vp.w) // 9)))
                            + 5) % 200)
                        + ((7 * vp.g + 11 * f.g
                            + 5 * (3 * (((y.g * vp.h) // 8) * vp.w
                                        + ((x.g * vp.w) // 9)))
                            + 10) % 200)) // 3 AS gray
                FROM vparams vp,
                     generate_series(0, 3) f(g),
                     generate_series(0, 7) y(g),
                     generate_series(0, 8) x(g)
                WHERE f.g < CASE WHEN vp.v > 4 THEN vp.nf - 1
                            ELSE vp.nf END
            ),
            vbits AS (
                SELECT a.doc_id, a.v, a.f, (a.y * 8 + a.x) AS k,
                       CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
                FROM vgrid a
                JOIN vgrid b ON a.doc_id = b.doc_id AND a.f = b.f
                           AND a.y = b.y AND b.x = a.x + 1
                WHERE a.x < 8
            ),
            vfhash AS (
                SELECT doc_id, v, f,
                       CAST(SUM(CASE WHEN k >= 32
                                THEN bit * (CAST(1 AS BIGINT) << (k - 32))
                                ELSE 0 END) AS VARCHAR) || ':' ||
                       CAST(SUM(CASE WHEN k < 32
                                THEN bit * (CAST(1 AS BIGINT) << k)
                                ELSE 0 END) AS VARCHAR) AS fh
                FROM vbits GROUP BY doc_id, v, f
            ),
            vvh AS (
                SELECT doc_id,
                       string_agg(fh, ';' ORDER BY
                                  CASE WHEN v = 4 THEN -f ELSE f END)
                           AS vhash
                FROM vfhash GROUP BY doc_id
            ),
            vreps AS (SELECT vhash, MIN(doc_id) AS rid
                      FROM vvh GROUP BY vhash),
            vedges AS (
                SELECT h.doc_id AS s, r.rid AS t
                FROM vvh h JOIN vreps r ON h.vhash = r.vhash
            ),
            vfset AS (
                SELECT DISTINCT h.doc_id, h.fh
                FROM vfhash h JOIN vreps r ON r.rid = h.doc_id
            ),
            vsz AS (SELECT doc_id, count(*) AS n FROM vfset GROUP BY 1),
            vinter AS (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
                FROM vfset a JOIN vfset b
                  ON a.fh = b.fh AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            vpairs AS (
                SELECT i.a_id AS s, i.b_id AS t
                FROM vinter i
                JOIN vsz x ON x.doc_id = i.a_id
                JOIN vsz y ON y.doc_id = i.b_id
                WHERE CAST(i.c AS DOUBLE) / (x.n + y.n - i.c) >= 0.5
            ),
            halfedges AS (
                SELECT s, t FROM iedges UNION SELECT s, t FROM ipairs
                UNION SELECT s, t FROM aedges
                UNION SELECT s, t FROM apairs
                UNION SELECT s, t FROM vedges
                UNION SELECT s, t FROM vpairs
            ),
            alledges AS (
                SELECT s, t FROM halfedges
                UNION SELECT t, s FROM halfedges
            ),
            reach(node, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT reach.node, alledges.t
                FROM reach JOIN alledges ON reach.r = alledges.s
            )
            SELECT node AS doc_id, MIN(r) AS mm_cluster
            FROM reach GROUP BY node
        """,
        # Spot-corpus dHash replay (as image_near_dup_pairs), then the
        # unified clustering: reps per distinct hash, hamming<=6 pair
        # edges, recursive reachability -> component min label, painted
        # back onto every row through its hash's representative.
        "image_near_dup_clusters": """
            WITH RECURSIVE p AS (
                SELECT doc_id,
                       doc_id % 40 AS g,
                       (doc_id // 40) % 7 AS v,
                       20 + (doc_id % 40) % 9 AS w,
                       20 + (doc_id % 40) % 7 AS h
                FROM documents
            ),
            cells AS (
                SELECT p.doc_id, p.g, p.v, y.g AS y, x.g AS x,
                       3 * (((y.g * p.h) // 8) * p.w
                            + ((x.g * p.w) // 9)) AS e,
                       3 * (((3 * p.h) // 8) * p.w
                            + ((4 * p.w) // 9)) AS s
                FROM p,
                     generate_series(0, 7) y(g),
                     generate_series(0, 8) x(g)
            ),
            grid AS (
                SELECT doc_id, y, x,
                       CASE WHEN v >= 4 AND e = s THEN 255
                            ELSE ((3 * g + 5 * e) % 200
                                  + (3 * g + 5 * e + 5) % 200
                                  + (3 * g + 5 * e + 10) % 200
                                  + 3 * v) // 3 END AS gray
                FROM cells
            ),
            bits AS (
                SELECT a.doc_id, (a.y * 8 + a.x) AS k,
                       CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
                FROM grid a
                JOIN grid b ON a.doc_id = b.doc_id AND a.y = b.y
                           AND b.x = a.x + 1
                WHERE a.x < 8
            ),
            hash AS (
                SELECT doc_id,
                       CAST(SUM(CASE WHEN k >= 32
                                THEN bit * (CAST(1 AS BIGINT) << (k - 32))
                                ELSE 0 END) AS BIGINT) AS dhash_hi,
                       CAST(SUM(CASE WHEN k < 32
                                THEN bit * (CAST(1 AS BIGINT) << k)
                                ELSE 0 END) AS BIGINT) AS dhash_lo
                FROM bits GROUP BY doc_id
            ),
            reps AS (
                SELECT MIN(doc_id) AS rid, dhash_hi, dhash_lo
                FROM hash GROUP BY dhash_hi, dhash_lo
            ),
            nedges AS (
                SELECT a.rid AS a_id, b.rid AS b_id
                FROM reps a JOIN reps b ON a.rid < b.rid
                WHERE bit_count(xor(a.dhash_hi, b.dhash_hi))
                      + bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 6
            ),
            edges AS (
                SELECT a_id, b_id FROM nedges
                UNION SELECT b_id, a_id FROM nedges
            ),
            reach(node, r) AS (
                SELECT rid, rid FROM reps
                UNION
                SELECT reach.node, edges.b_id
                FROM reach JOIN edges ON reach.r = edges.a_id
            ),
            comp AS (
                SELECT node AS rid, MIN(r) AS lab FROM reach GROUP BY node
            )
            SELECT h.doc_id, c.lab AS img_cluster
            FROM hash h
            JOIN reps r ON h.dhash_hi = r.dhash_hi
                       AND h.dhash_lo = r.dhash_lo
            JOIN comp c ON c.rid = r.rid
        """,
        # Spiked-corpus fingerprint replay (64 frames -> 63 bits; frame
        # kf = 1 + g%62 doubled on v >= 4), reps per distinct
        # fingerprint, brute-force hamming <= 4 over reps.
        "audio_near_dup_pairs": """
            WITH p AS (
                SELECT doc_id,
                       doc_id % 40 AS g,
                       (doc_id // 40) % 7 AS v,
                       3 + (doc_id % 40) % 11 AS st,
                       1024 + 37 * (doc_id % 40) AS md,
                       1 + (doc_id % 40) % 62 AS kf
                FROM documents
            ),
            e AS (
                SELECT p.doc_id, f.g AS f,
                       SUM(abs(((13 * p.g + p.st * (f.g * 64 + t.g))
                                % p.md) - p.md // 2) * (1 + p.v)
                           * CASE WHEN p.v >= 4 AND f.g = p.kf
                                  THEN 2 ELSE 1 END) AS en
                FROM p,
                     generate_series(0, 63) f(g),
                     generate_series(0, 63) t(g)
                GROUP BY p.doc_id, f.g
            ),
            bits AS (
                SELECT a.doc_id, a.f AS k,
                       CASE WHEN b.en > a.en THEN 1 ELSE 0 END AS bit
                FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.f = a.f + 1
                WHERE a.f < 63
            ),
            fp AS (
                SELECT doc_id,
                       CAST(SUM(bit * (CAST(1 AS BIGINT) << k))
                            AS BIGINT) AS afp
                FROM bits GROUP BY doc_id
            ),
            reps AS (SELECT MIN(doc_id) AS doc_id, afp
                     FROM fp GROUP BY afp)
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(bit_count(xor(a.afp, b.afp)) AS INTEGER) AS hamming
            FROM reps a JOIN reps b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.afp, b.afp)) <= 4
        """,
        # Same replay, then the unified clustering: hamming<=4 edges
        # among reps, recursive reachability -> component min label,
        # painted back through each row's fingerprint representative.
        "audio_near_dup_clusters": """
            WITH RECURSIVE p AS (
                SELECT doc_id,
                       doc_id % 40 AS g,
                       (doc_id // 40) % 7 AS v,
                       3 + (doc_id % 40) % 11 AS st,
                       1024 + 37 * (doc_id % 40) AS md,
                       1 + (doc_id % 40) % 62 AS kf
                FROM documents
            ),
            e AS (
                SELECT p.doc_id, f.g AS f,
                       SUM(abs(((13 * p.g + p.st * (f.g * 64 + t.g))
                                % p.md) - p.md // 2) * (1 + p.v)
                           * CASE WHEN p.v >= 4 AND f.g = p.kf
                                  THEN 2 ELSE 1 END) AS en
                FROM p,
                     generate_series(0, 63) f(g),
                     generate_series(0, 63) t(g)
                GROUP BY p.doc_id, f.g
            ),
            bits AS (
                SELECT a.doc_id, a.f AS k,
                       CASE WHEN b.en > a.en THEN 1 ELSE 0 END AS bit
                FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.f = a.f + 1
                WHERE a.f < 63
            ),
            fp AS (
                SELECT doc_id,
                       CAST(SUM(bit * (CAST(1 AS BIGINT) << k))
                            AS BIGINT) AS afp
                FROM bits GROUP BY doc_id
            ),
            reps AS (SELECT MIN(doc_id) AS rid, afp FROM fp GROUP BY afp),
            nedges AS (
                SELECT a.rid AS a_id, b.rid AS b_id
                FROM reps a JOIN reps b ON a.rid < b.rid
                WHERE bit_count(xor(a.afp, b.afp)) <= 4
            ),
            edges AS (
                SELECT a_id, b_id FROM nedges
                UNION SELECT b_id, a_id FROM nedges
            ),
            reach(node, r) AS (
                SELECT rid, rid FROM reps
                UNION
                SELECT reach.node, edges.b_id
                FROM reach JOIN edges ON reach.r = edges.a_id
            ),
            comp AS (
                SELECT node AS rid, MIN(r) AS lab FROM reach GROUP BY node
            )
            SELECT f.doc_id, c.lab AS audio_cluster
            FROM fp f
            JOIN reps r ON f.afp = r.afp
            JOIN comp c ON c.rid = r.rid
        """,
        # near_dup_clusters_transcripts: the flagship runs the stemmed
        # reference config (Porter stemmer — not SQL-expressible); its
        # value-level parity is covered by tests/test_pipeline.py against
        # the single-process oracle → rows-only here.
        # set_sim_pairs_docs: prefix-filter join is EXACT, so the oracle
        # is brute-force shingle-set Jaccard over ALL docs (no rep
        # collapse — this operator scores identical-text pairs too)
        "set_sim_pairs_docs": f"""
            WITH arrs AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[0-9a-zA-Z_]+')
                           AS arr
                FROM documents
            ),
            sl AS (
                SELECT doc_id,
                       CASE WHEN len(arr) > 3 THEN
                           list_transform(range(len(arr) - 2),
                               i -> arr[i + 1] || ' ' || arr[i + 2]
                                    || ' ' || arr[i + 3])
                       ELSE [array_to_string(arr, ' ')] END AS shl
                FROM arrs WHERE len(arr) > 0
            ),
            sh AS (SELECT DISTINCT doc_id, s.sh
                   FROM sl, UNNEST(shl) AS s(sh)),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
                FROM sh a JOIN sh b
                  ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT i.a_id, i.b_id, i.c AS common, x.n AS na, y.n AS nb,
                   round(CAST(i.c AS DOUBLE) / (x.n + y.n - i.c),
                         {_ROUND}) AS jaccard
            FROM inter i
            JOIN sz x ON x.doc_id = i.a_id
            JOIN sz y ON y.doc_id = i.b_id
            WHERE CAST(i.c AS DOUBLE) / (x.n + y.n - i.c) >= 0.5
        """,
        "idf_weighted_near_pairs": f"""
            WITH {_DOC_SHINGLES_CTE},
            nreps AS (SELECT count(*) AS n FROM doc_reps),
            idf AS (
                SELECT sh,
                       ln(CAST((SELECT n FROM nreps) AS DOUBLE)
                          / count(DISTINCT doc_id)) AS w
                FROM shingles GROUP BY sh
            ),
            ksum AS (
                SELECT s.doc_id, sum(i.w) AS sw
                FROM shingles s JOIN idf i ON i.sh = s.sh
                GROUP BY 1
            ),
            isum AS (
                SELECT p.a_id, p.b_id, sum(i.w) AS iw
                FROM near_pairs p
                JOIN shingles a ON a.doc_id = p.a_id
                JOIN shingles b ON b.doc_id = p.b_id AND b.sh = a.sh
                JOIN idf i ON i.sh = a.sh
                GROUP BY 1, 2
            ),
            scored AS (
                SELECT i.a_id, i.b_id,
                       i.iw / (ka.sw + kb.sw - i.iw) AS j
                FROM isum i
                JOIN ksum ka ON ka.doc_id = i.a_id
                JOIN ksum kb ON kb.doc_id = i.b_id
            )
            SELECT CAST(a_id AS VARCHAR) AS a_key,
                   CAST(b_id AS VARCHAR) AS b_key,
                   round(j, {_ROUND}) AS idf_jaccard
            FROM scored
            WHERE CAST(a_id AS VARCHAR) < CAST(b_id AS VARCHAR)
            UNION ALL
            SELECT CAST(b_id AS VARCHAR), CAST(a_id AS VARCHAR),
                   round(j, {_ROUND})
            FROM scored
            WHERE CAST(b_id AS VARCHAR) < CAST(a_id AS VARCHAR)
        """,
        "near_dup_pair_edits": f"""
            WITH {_DOC_SHINGLES_CTE},
            p2 AS (
                SELECT CAST(a_id AS VARCHAR) AS a_key,
                       CAST(b_id AS VARCHAR) AS b_key,
                       a_id AS ai, b_id AS bi
                FROM near_pairs
                WHERE CAST(a_id AS VARCHAR) < CAST(b_id AS VARCHAR)
                UNION ALL
                SELECT CAST(b_id AS VARCHAR), CAST(a_id AS VARCHAR),
                       b_id, a_id
                FROM near_pairs
                WHERE CAST(b_id AS VARCHAR) < CAST(a_id AS VARCHAR)
            ),
            tokpos AS (
                SELECT doc_id, CAST(i.i AS INTEGER) AS p,
                       arr[CAST(i.i AS INTEGER) + 1] AS tok
                FROM arrs, UNNEST(range(len(arr))) AS i(i)
            ),
            pairtok AS (
                SELECT p2.a_key, p2.b_key, 0 AS side, t.p, t.tok
                FROM p2 JOIN tokpos t ON t.doc_id = p2.ai
                UNION ALL
                SELECT p2.a_key, p2.b_key, 1, t.p, t.tok
                FROM p2 JOIN tokpos t ON t.doc_id = p2.bi
            ),
            ranked AS (
                SELECT a_key, b_key, side, p,
                       dense_rank() OVER (PARTITION BY a_key, b_key
                                          ORDER BY tok) AS r
                FROM pairtok
            ),
            enc AS (
                SELECT a_key, b_key,
                       coalesce(string_agg(CASE WHEN side = 0 THEN
                           chr(CAST(r AS INTEGER)) END, '' ORDER BY p),
                           '') AS s_a,
                       coalesce(string_agg(CASE WHEN side = 1 THEN
                           chr(CAST(r AS INTEGER)) END, '' ORDER BY p),
                           '') AS s_b
                FROM ranked GROUP BY 1, 2
            )
            SELECT a_key, b_key,
                   length(s_a) AS n_a, length(s_b) AS n_b,
                   levenshtein(s_a, s_b) AS token_lev,
                   round(CASE WHEN greatest(length(s_a),
                                            length(s_b)) = 0
                         THEN 0.0e0
                         ELSE CAST(levenshtein(s_a, s_b) AS DOUBLE)
                              / greatest(length(s_a), length(s_b)) END,
                         {_ROUND}) AS nlev
            FROM enc
        """,
        "turn_dedup_in_conv": TRANSCRIPTS_SQL + """,
            ranked AS (
                SELECT conv_id, turn_idx,
                       row_number() OVER (
                           PARTITION BY conv_id, coalesce(text, '')
                           ORDER BY turn_idx) AS rn
                FROM transcripts
            )
            SELECT conv_id, turn_idx FROM ranked WHERE rn = 1
        """,
        "cross_corpus_sim_pairs": f"""
            WITH arrs AS (
                SELECT doc_id, source,
                       regexp_extract_all(lower(text), '[0-9a-zA-Z_]+')
                           AS arr
                FROM documents
            ),
            sl AS (
                SELECT doc_id, source,
                       CASE WHEN len(arr) > 3 THEN
                           list_transform(range(len(arr) - 2),
                               i -> arr[i + 1] || ' ' || arr[i + 2]
                                    || ' ' || arr[i + 3])
                       ELSE [array_to_string(arr, ' ')] END AS shl
                FROM arrs WHERE len(arr) > 0
            ),
            sh AS (SELECT DISTINCT doc_id, source, s.sh
                   FROM sl, UNNEST(shl) AS s(sh)),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS ai, b.doc_id AS bi, count(*) AS c
                FROM sh a JOIN sh b ON a.sh = b.sh
                WHERE a.source = 'src0' AND b.source <> 'src0'
                GROUP BY 1, 2
            )
            SELECT i.ai AS a_id, i.bi AS b_id, i.c AS common,
                   x.n AS na, y.n AS nb,
                   round(CAST(i.c AS DOUBLE) / (x.n + y.n - i.c),
                         {_ROUND}) AS jaccard
            FROM inter i
            JOIN sz x ON x.doc_id = i.ai
            JOIN sz y ON y.doc_id = i.bi
            WHERE CAST(i.c AS DOUBLE) / (x.n + y.n - i.c) >= 0.5
        """,
        "bag_near_dup_clusters": f"""
            WITH RECURSIVE bag_reps AS (
                SELECT min(CAST(doc_id AS VARCHAR)) AS rep
                FROM documents GROUP BY text
            ),
            barrs AS (
                SELECT CAST(doc_id AS VARCHAR) AS id,
                       regexp_extract_all(lower(text),
                                          '[0-9a-zA-Z_]+') AS arr
                FROM documents
                WHERE CAST(doc_id AS VARCHAR) IN (SELECT rep FROM bag_reps)
            ),
            btoks AS (SELECT id, t.t FROM barrs, UNNEST(arr) AS t(t)),
            bcnts AS (SELECT id, t, count(*) AS c
                      FROM btoks GROUP BY 1, 2),
            btot AS (SELECT id, sum(c) AS n FROM bcnts GROUP BY 1),
            binter AS (
                SELECT a.id AS ai, b.id AS bi, sum(least(a.c, b.c)) AS m
                FROM bcnts a JOIN bcnts b ON a.t = b.t AND a.id < b.id
                GROUP BY 1, 2
            ),
            near_pairs AS (
                SELECT i.ai AS a_id, i.bi AS b_id
                FROM binter i
                JOIN btot x ON x.id = i.ai
                JOIN btot y ON y.id = i.bi
                WHERE CAST(i.m AS DOUBLE) / (x.n + y.n - i.m) >= 0.8
            ),
            {_DOC_CLUSTERS_CTE.lstrip()}
            SELECT row_key, cluster_id FROM clust
        """,
        "bag_containment_pairs": f"""
            WITH arrs AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[0-9a-zA-Z_]+')
                           AS arr
                FROM documents
            ),
            toks AS (SELECT doc_id, t.t FROM arrs, UNNEST(arr) AS t(t)),
            cnts AS (SELECT doc_id, t, count(*) AS c
                     FROM toks GROUP BY 1, 2),
            tot AS (SELECT doc_id, sum(c) AS n FROM cnts GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS ai, b.doc_id AS bi,
                       sum(least(a.c, b.c)) AS m
                FROM cnts a JOIN cnts b
                  ON a.t = b.t AND a.doc_id <> b.doc_id
                GROUP BY 1, 2
            )
            SELECT i.ai AS inner_id, i.bi AS outer_id,
                   CAST(i.m AS BIGINT) AS common,
                   CAST(x.n AS BIGINT) AS n_inner,
                   CAST(y.n AS BIGINT) AS n_outer,
                   round(CAST(i.m AS DOUBLE) / x.n, {_ROUND})
                       AS containment
            FROM inter i
            JOIN tot x ON x.doc_id = i.ai
            JOIN tot y ON y.doc_id = i.bi
            WHERE x.n >= 5 AND CAST(i.m AS DOUBLE) / x.n >= 0.9
        """,
        "heavy_hitters_by_source": """
            WITH toks AS (
                SELECT source, t.t
                FROM (SELECT source,
                             regexp_extract_all(lower(text),
                                                '[0-9a-zA-Z_]+') AS arr
                      FROM documents) a, UNNEST(arr) AS t(t)
            ),
            tot AS (SELECT source, count(*) AS n
                    FROM toks GROUP BY source)
            SELECT k.source AS "group", k.t AS token,
                   count(*) AS n
            FROM toks k JOIN tot ON tot.source = k.source
            GROUP BY k.source, k.t, tot.n
            HAVING count(*) * 33 > tot.n
        """,
        "heavy_hitter_tokens": """
            WITH toks AS (
                SELECT t.t
                FROM (SELECT regexp_extract_all(lower(text),
                                                '[0-9a-zA-Z_]+') AS arr
                      FROM documents) a, UNNEST(arr) AS t(t)
            ),
            tot AS (SELECT count(*) AS n FROM toks)
            SELECT t AS token, count(*) AS n
            FROM toks, tot
            GROUP BY t, tot.n
            HAVING count(*) * 65 > tot.n
        """,
        "set_containment_pairs": f"""
            WITH arrs AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[0-9a-zA-Z_]+')
                           AS arr
                FROM documents
            ),
            sl AS (
                SELECT doc_id,
                       CASE WHEN len(arr) > 3 THEN
                           list_transform(range(len(arr) - 2),
                               i -> arr[i + 1] || ' ' || arr[i + 2]
                                    || ' ' || arr[i + 3])
                       ELSE [array_to_string(arr, ' ')] END AS shl
                FROM arrs WHERE len(arr) > 0
            ),
            sh AS (SELECT DISTINCT doc_id, s.sh
                   FROM sl, UNNEST(shl) AS s(sh)),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS ai, b.doc_id AS bi, count(*) AS c
                FROM sh a JOIN sh b
                  ON a.sh = b.sh AND a.doc_id <> b.doc_id
                GROUP BY 1, 2
            )
            SELECT i.ai AS inner_id, i.bi AS outer_id, i.c AS common,
                   x.n AS n_inner, y.n AS n_outer,
                   round(CAST(i.c AS DOUBLE) / x.n, {_ROUND})
                       AS containment
            FROM inter i
            JOIN sz x ON x.doc_id = i.ai
            JOIN sz y ON y.doc_id = i.bi
            WHERE x.n >= 5 AND CAST(i.c AS DOUBLE) / x.n >= 0.9
        """,
        "dedup_ablation_report": f"""
            WITH RECURSIVE {_DOC_SHINGLES_CTE},
            btoks AS (SELECT doc_id, t.t FROM arrs, UNNEST(arr) AS t(t)),
            bcnts AS (SELECT doc_id, t, count(*) AS c
                      FROM btoks GROUP BY 1, 2),
            btot AS (SELECT doc_id, sum(c) AS n FROM bcnts GROUP BY 1),
            binter AS MATERIALIZED (
                SELECT a.doc_id AS ai, b.doc_id AS bi,
                       sum(least(a.c, b.c)) AS m
                FROM bcnts a JOIN bcnts b
                  ON a.t = b.t AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            bagpairs AS MATERIALIZED (
                SELECT i.ai, i.bi
                FROM binter i
                JOIN btot x ON x.doc_id = i.ai
                JOIN btot y ON y.doc_id = i.bi
                WHERE CAST(i.m AS DOUBLE) / (x.n + y.n - i.m) >= 0.8
            ),
            -- containment edges BETWEEN exact-text reps, reusing the
            -- shared shingles/pair_common CTEs: containment is a pure
            -- function of text, and rep↔member connectivity is already
            -- carried by the exact edges in the closure, so component
            -- counts and min-key labels are identical to the
            -- all-members formulation — which re-derived shingles over
            -- EVERY doc and self-joined the full posting lists
            -- (common-shingle blowup; the sf0.1 ablation oracle spilled
            -- >75 GB of DuckDB temp and died on disk)
            contpairs AS MATERIALIZED (
                SELECT p.a_id AS ai, p.b_id AS bi
                FROM pair_common p JOIN shsize x ON x.doc_id = p.a_id
                WHERE x.n >= 5 AND CAST(p.c AS DOUBLE) / x.n >= 0.9
                UNION
                SELECT p.b_id, p.a_id
                FROM pair_common p JOIN shsize x ON x.doc_id = p.b_id
                WHERE x.n >= 5 AND CAST(p.c AS DOUBLE) / x.n >= 0.9
            ),
            exe AS MATERIALIZED (
                SELECT CAST(a.doc_id AS VARCHAR) AS ak,
                       CAST(b.doc_id AS VARCHAR) AS bk
                FROM documents a JOIN documents b
                  ON a.text = b.text AND a.doc_id <> b.doc_id
            ),
            ne AS MATERIALIZED (SELECT CAST(a_id AS VARCHAR) AS ak,
                          CAST(b_id AS VARCHAR) AS bk FROM near_pairs),
            be AS MATERIALIZED (SELECT CAST(ai AS VARCHAR) AS ak,
                          CAST(bi AS VARCHAR) AS bk FROM bagpairs),
            ce AS MATERIALIZED (SELECT CAST(ai AS VARCHAR) AS ak,
                          CAST(bi AS VARCHAR) AS bk FROM contpairs),
            e1 AS MATERIALIZED (SELECT ak, bk FROM exe UNION SELECT bk, ak FROM exe),
            e2 AS MATERIALIZED (SELECT * FROM e1
                   UNION SELECT ak, bk FROM ne
                   UNION SELECT bk, ak FROM ne),
            e3 AS MATERIALIZED (SELECT * FROM e2
                   UNION SELECT ak, bk FROM be
                   UNION SELECT bk, ak FROM be),
            e4 AS MATERIALIZED (SELECT * FROM e3
                   UNION SELECT ak, bk FROM ce
                   UNION SELECT bk, ak FROM ce),
            base AS (SELECT CAST(doc_id AS VARCHAR) AS node
                     FROM documents),
            r1(node, r) AS (
                SELECT node, node FROM base
                UNION SELECT r1.node, e1.bk
                FROM r1 JOIN e1 ON r1.r = e1.ak),
            r2(node, r) AS (
                SELECT node, node FROM base
                UNION SELECT r2.node, e2.bk
                FROM r2 JOIN e2 ON r2.r = e2.ak),
            r3(node, r) AS (
                SELECT node, node FROM base
                UNION SELECT r3.node, e3.bk
                FROM r3 JOIN e3 ON r3.r = e3.ak),
            r4(node, r) AS (
                SELECT node, node FROM base
                UNION SELECT r4.node, e4.bk
                FROM r4 JOIN e4 ON r4.r = e4.ak),
            nn AS (SELECT count(*) AS total FROM documents),
            s1 AS (SELECT count(DISTINCT cid) AS c FROM (
                SELECT min(r) AS cid FROM r1 GROUP BY node)),
            s2 AS (SELECT count(DISTINCT cid) AS c FROM (
                SELECT min(r) AS cid FROM r2 GROUP BY node)),
            s3 AS (SELECT count(DISTINCT cid) AS c FROM (
                SELECT min(r) AS cid FROM r3 GROUP BY node)),
            s4 AS (SELECT count(DISTINCT cid) AS c FROM (
                SELECT min(r) AS cid FROM r4 GROUP BY node))
            SELECT 'exact' AS stage, s1.c AS n_clusters,
                   nn.total - s1.c AS n_duplicates FROM s1, nn
            UNION ALL
            SELECT 'exact+near', s2.c, nn.total - s2.c FROM s2, nn
            UNION ALL
            SELECT 'exact+near+bag', s3.c, nn.total - s3.c FROM s3, nn
            UNION ALL
            SELECT 'exact+near+bag+containment', s4.c, nn.total - s4.c
            FROM s4, nn
        """,
        "unified_dedup_clusters": f"""
            WITH RECURSIVE {_DOC_SHINGLES_CTE},
            btoks AS MATERIALIZED (SELECT doc_id, t.t FROM arrs, UNNEST(arr) AS t(t)),
            bcnts AS MATERIALIZED (SELECT doc_id, t, count(*) AS c
                      FROM btoks GROUP BY 1, 2),
            btot AS MATERIALIZED (SELECT doc_id, sum(c) AS n FROM bcnts GROUP BY 1),
            binter AS MATERIALIZED (
                SELECT a.doc_id AS ai, b.doc_id AS bi,
                       sum(least(a.c, b.c)) AS m
                FROM bcnts a JOIN bcnts b
                  ON a.t = b.t AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            bagpairs AS MATERIALIZED (
                SELECT i.ai, i.bi
                FROM binter i
                JOIN btot x ON x.doc_id = i.ai
                JOIN btot y ON y.doc_id = i.bi
                WHERE CAST(i.m AS DOUBLE) / (x.n + y.n - i.m) >= 0.8
            ),
            -- containment edges BETWEEN exact-text reps, reusing the
            -- shared shingles/pair_common CTEs: containment is a pure
            -- function of text, and rep↔member connectivity is already
            -- carried by the exact edges in the closure, so component
            -- counts and min-key labels are identical to the
            -- all-members formulation — which re-derived shingles over
            -- EVERY doc and self-joined the full posting lists
            -- (common-shingle blowup; the sf0.1 ablation oracle spilled
            -- >75 GB of DuckDB temp and died on disk)
            contpairs AS MATERIALIZED (
                SELECT p.a_id AS ai, p.b_id AS bi
                FROM pair_common p JOIN shsize x ON x.doc_id = p.a_id
                WHERE x.n >= 5 AND CAST(p.c AS DOUBLE) / x.n >= 0.9
                UNION
                SELECT p.b_id, p.a_id
                FROM pair_common p JOIN shsize x ON x.doc_id = p.b_id
                WHERE x.n >= 5 AND CAST(p.c AS DOUBLE) / x.n >= 0.9
            ),
            edges0 AS MATERIALIZED (
                SELECT CAST(a.doc_id AS VARCHAR) AS ak,
                       CAST(b.doc_id AS VARCHAR) AS bk
                FROM documents a JOIN documents b
                  ON a.text = b.text AND a.doc_id <> b.doc_id
                UNION
                SELECT CAST(a_id AS VARCHAR), CAST(b_id AS VARCHAR)
                FROM near_pairs
                UNION
                SELECT CAST(ai AS VARCHAR), CAST(bi AS VARCHAR)
                FROM bagpairs
                UNION
                SELECT CAST(ai AS VARCHAR), CAST(bi AS VARCHAR)
                FROM contpairs
            ),
            edges AS MATERIALIZED (
                SELECT ak AS a_key, bk AS b_key FROM edges0
                UNION SELECT bk, ak FROM edges0
            ),
            reach(node, r) AS (
                SELECT CAST(doc_id AS VARCHAR), CAST(doc_id AS VARCHAR)
                FROM documents
                UNION
                SELECT reach.node, edges.b_key
                FROM reach JOIN edges ON reach.r = edges.a_key
            )
            SELECT node AS row_key, min(r) AS cluster_id
            FROM reach GROUP BY node
        """,
        "conv_turn_containment": TRANSCRIPTS_SQL + f""",
            tsha AS (
                SELECT conv_id, md5(coalesce(text, '')) AS h
                FROM transcripts
            ),
            cnts AS (SELECT conv_id, h, count(*) AS c
                     FROM tsha GROUP BY 1, 2),
            tot AS (SELECT conv_id, sum(c) AS n FROM cnts GROUP BY 1),
            inter AS (
                SELECT a.conv_id AS ai, b.conv_id AS bi,
                       sum(least(a.c, b.c)) AS m
                FROM cnts a JOIN cnts b
                  ON a.h = b.h AND a.conv_id <> b.conv_id
                GROUP BY 1, 2
            )
            SELECT i.ai AS inner_id, i.bi AS outer_id,
                   CAST(i.m AS BIGINT) AS common,
                   CAST(x.n AS BIGINT) AS n_inner,
                   CAST(y.n AS BIGINT) AS n_outer,
                   round(CAST(i.m AS DOUBLE) / x.n, {_ROUND})
                       AS containment
            FROM inter i
            JOIN tot x ON x.conv_id = i.ai
            JOIN tot y ON y.conv_id = i.bi
            WHERE x.n >= 2 AND i.m = x.n
        """,
        "conv_turn_edit_pairs": TRANSCRIPTS_SQL + f""",
            conv AS (
                SELECT conv_id,
                       string_agg(text, chr(10) ORDER BY turn_idx)
                           AS conv_text
                FROM transcripts GROUP BY conv_id
            ),
            arrs AS (
                SELECT conv_id,
                       regexp_extract_all(lower(conv_text),
                                          '[0-9a-zA-Z_]+') AS arr
                FROM conv
            ),
            sl AS (
                SELECT conv_id,
                       CASE WHEN len(arr) > 3 THEN
                           list_transform(range(len(arr) - 2),
                               i -> arr[i + 1] || ' ' || arr[i + 2]
                                    || ' ' || arr[i + 3])
                       ELSE [array_to_string(arr, ' ')] END AS shl
                FROM arrs WHERE len(arr) > 0
            ),
            sh AS (SELECT DISTINCT conv_id, s.sh
                   FROM sl, UNNEST(shl) AS s(sh)),
            sz AS (SELECT conv_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
                SELECT a.conv_id AS a_id, b.conv_id AS b_id,
                       count(*) AS c
                FROM sh a JOIN sh b
                  ON a.sh = b.sh AND a.conv_id < b.conv_id
                GROUP BY 1, 2
            ),
            cpairs AS (
                SELECT i.a_id, i.b_id
                FROM inter i
                JOIN sz x ON x.conv_id = i.a_id
                JOIN sz y ON y.conv_id = i.b_id
                WHERE CAST(i.c AS DOUBLE) / (x.n + y.n - i.c) >= 0.1
            ),
            tsha AS (
                SELECT conv_id, turn_idx,
                       md5(coalesce(text, '')) AS h
                FROM transcripts
            ),
            pairtok AS (
                SELECT p.a_id AS a_key, p.b_id AS b_key, 0 AS side,
                       t.turn_idx AS p, t.h AS tok
                FROM cpairs p JOIN tsha t ON t.conv_id = p.a_id
                UNION ALL
                SELECT p.a_id, p.b_id, 1, t.turn_idx, t.h
                FROM cpairs p JOIN tsha t ON t.conv_id = p.b_id
            ),
            ranked AS (
                SELECT a_key, b_key, side, p,
                       dense_rank() OVER (PARTITION BY a_key, b_key
                                          ORDER BY tok) AS r
                FROM pairtok
            ),
            enc AS (
                SELECT a_key, b_key,
                       coalesce(string_agg(CASE WHEN side = 0 THEN
                           chr(CAST(r AS INTEGER)) END, '' ORDER BY p),
                           '') AS s_a,
                       coalesce(string_agg(CASE WHEN side = 1 THEN
                           chr(CAST(r AS INTEGER)) END, '' ORDER BY p),
                           '') AS s_b
                FROM ranked GROUP BY 1, 2
            )
            SELECT a_key, b_key,
                   length(s_a) AS n_a, length(s_b) AS n_b,
                   levenshtein(s_a, s_b) AS token_lev,
                   round(CASE WHEN greatest(length(s_a),
                                            length(s_b)) = 0
                         THEN 0.0e0
                         ELSE CAST(levenshtein(s_a, s_b) AS DOUBLE)
                              / greatest(length(s_a), length(s_b)) END,
                         {_ROUND}) AS nlev
            FROM enc
        """,
        "conv_near_dup_pairs": TRANSCRIPTS_SQL + f""",
            conv AS (
                SELECT conv_id,
                       string_agg(text, chr(10) ORDER BY turn_idx)
                           AS conv_text
                FROM transcripts GROUP BY conv_id
            ),
            arrs AS (
                SELECT conv_id,
                       regexp_extract_all(lower(conv_text),
                                          '[0-9a-zA-Z_]+') AS arr
                FROM conv
            ),
            sl AS (
                SELECT conv_id,
                       CASE WHEN len(arr) > 3 THEN
                           list_transform(range(len(arr) - 2),
                               i -> arr[i + 1] || ' ' || arr[i + 2]
                                    || ' ' || arr[i + 3])
                       ELSE [array_to_string(arr, ' ')] END AS shl
                FROM arrs WHERE len(arr) > 0
            ),
            sh AS (SELECT DISTINCT conv_id, s.sh
                   FROM sl, UNNEST(shl) AS s(sh)),
            sz AS (SELECT conv_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
                SELECT a.conv_id AS a_id, b.conv_id AS b_id,
                       count(*) AS c
                FROM sh a JOIN sh b
                  ON a.sh = b.sh AND a.conv_id < b.conv_id
                GROUP BY 1, 2
            )
            SELECT i.a_id, i.b_id, i.c AS common, x.n AS na, y.n AS nb,
                   round(CAST(i.c AS DOUBLE) / (x.n + y.n - i.c),
                         {_ROUND}) AS jaccard
            FROM inter i
            JOIN sz x ON x.conv_id = i.a_id
            JOIN sz y ON y.conv_id = i.b_id
            WHERE CAST(i.c AS DOUBLE) / (x.n + y.n - i.c) >= 0.1
        """,
        # tiered_dedup_docs: tier 1 = identical-text groups (window
        # min/count); tier 2 = brute-force shingle Jaccard >= 0.5 over
        # reps + recursive-CTE min-label components (the semantic_dedup
        # oracle's component idiom). Engine shas/hashes vs SQL
        # text/strings partition identically (collision-free at any
        # testable scale; documented in stages/setjoin.py).
        "tiered_dedup_docs": _TIERED_CTES + """
            SELECT g.doc_id, g.exact_rep, g.n_exact,
                   c.root AS cluster_id,
                   CASE WHEN g.doc_id != g.exact_rep THEN 'exact'
                        WHEN c.root != g.doc_id THEN 'near'
                        ELSE 'keep' END AS tier
            FROM g JOIN comp c ON c.node = g.exact_rep
        """,
        # tiered_semantic_docs: tier 3 = list_cosine_similarity >= 0.35
        # pairs restricted to tier-2 survivors (comp.root = node) + a
        # second recursive component pass; final label composes
        # doc -> exact_rep -> tier-2 root -> tier-3 root.
        "tiered_semantic_docs": _TIERED_CTES + """,
            surv AS (SELECT node FROM comp WHERE root = node),
            spairs AS (
                SELECT a.vec_id AS a_id, b.vec_id AS b_id
                FROM embeddings a
                JOIN embeddings b ON a.vec_id < b.vec_id
                JOIN surv sa ON sa.node = a.vec_id
                JOIN surv sb ON sb.node = b.vec_id
                WHERE list_cosine_similarity(
                          CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) >= 0.35
            ),
            sedges AS (
                SELECT a_id, b_id FROM spairs
                UNION SELECT b_id AS a_id, a_id AS b_id FROM spairs
            ),
            reach3(node, r) AS (
                SELECT node, node FROM surv
                UNION
                SELECT reach3.node, sedges.b_id
                FROM reach3 JOIN sedges ON reach3.r = sedges.a_id
            ),
            comp3 AS (SELECT node, min(r) AS root FROM reach3
                      GROUP BY node)
            SELECT g.doc_id, g.exact_rep, g.n_exact,
                   c.root AS near_cluster,
                   c3.root AS cluster_id,
                   CASE WHEN g.doc_id != g.exact_rep THEN 'exact'
                        WHEN c.root != g.doc_id THEN 'near'
                        WHEN c3.root != g.doc_id THEN 'semantic'
                        ELSE 'keep' END AS tier
            FROM g
            JOIN comp c ON c.node = g.exact_rep
            JOIN comp3 c3 ON c3.node = c.root
        """,
        "curate_docs": (_TIERED_CTES
                        .replace("FROM documents", "FROM qdocs")
                        .replace("WITH RECURSIVE g AS", _CURATE_PRELUDE)
                        + _CURATE_TAIL.replace("{round}", str(_ROUND))),
        # bigram_logppl: bigram key = prev || ' ' || next (tokens can't
        # contain spaces); cctx = bigram-table marginal, the exact
        # conditional normalizer. range(1, len) gives 1-based i with
        # arr[i], arr[i+1] = each consecutive pair.
        "bigram_logppl": f"""
            WITH w AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text),
                                          '[0-9a-zA-Z_]+') AS arr
                FROM documents
            ),
            bg AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(arr)),
                           i -> arr[i] || ' ' || arr[i + 1])) AS bi
                FROM w WHERE len(arr) >= 2
            ),
            tf2 AS (SELECT doc_id, bi, count(*) AS tf
                    FROM bg GROUP BY 1, 2),
            c2 AS (SELECT bi, CAST(sum(tf) AS BIGINT) AS c
                   FROM tf2 GROUP BY 1),
            cctx AS (SELECT split_part(bi, ' ', 1) AS prev,
                            CAST(sum(c) AS BIGINT) AS cc
                     FROM c2 GROUP BY 1),
            per AS (
                SELECT t.doc_id,
                       sum(t.tf * (ln(CAST(x.cc AS DOUBLE))
                                   - ln(CAST(c.c AS DOUBLE)))) AS s,
                       CAST(sum(t.tf) AS BIGINT) AS nb
                FROM tf2 t
                JOIN c2 c USING (bi)
                JOIN cctx x ON x.prev = split_part(t.bi, ' ', 1)
                GROUP BY 1
            )
            SELECT doc_id, nb AS n_bigrams,
                   round(s / nb, {_ROUND}) AS logppl2
            FROM per
        """,
        "dup_rate_by_source": _TIERED_CTES + """
            SELECT d.source,
                   count(*) AS n_docs,
                   CAST(sum(CASE WHEN t.tier = 'exact' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_exact,
                   CAST(sum(CASE WHEN t.tier = 'near' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_near,
                   CAST(sum(CASE WHEN t.tier = 'keep' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_keep
            FROM (
                SELECT g.doc_id,
                       CASE WHEN g.doc_id != g.exact_rep THEN 'exact'
                            WHEN c.root != g.doc_id THEN 'near'
                            ELSE 'keep' END AS tier
                FROM g JOIN comp c ON c.node = g.exact_rep
            ) t
            JOIN documents d ON d.doc_id = t.doc_id
            GROUP BY 1
        """,
        "embedding_decontam": f"""
            WITH b AS (
                SELECT vec_id, embedding FROM embeddings
                WHERE vec_id % 10 = 0
            ),
            c AS (
                SELECT vec_id, embedding FROM embeddings
                WHERE vec_id % 10 <> 0
            ),
            sims AS (
                SELECT c.vec_id, b.vec_id AS bench_id,
                       list_cosine_similarity(
                           CAST(c.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[])) AS cosine
                FROM c CROSS JOIN b
            ),
            ranked AS (
                SELECT vec_id, bench_id, cosine,
                       row_number() OVER (
                           PARTITION BY vec_id
                           ORDER BY cosine DESC, bench_id) AS rn
                FROM sims
            )
            SELECT vec_id, bench_id, round(cosine, {_ROUND}) AS cosine
            FROM ranked WHERE rn = 1
        """,
        "priority_dedup": """
            WITH ranked AS (
                SELECT doc_id, source,
                       row_number() OVER (
                           PARTITION BY text
                           ORDER BY source, doc_id) AS rn,
                       count(*) OVER (PARTITION BY text) AS n_copies
                FROM documents
            )
            SELECT doc_id, source, CAST(n_copies AS BIGINT) AS n_copies
            FROM ranked WHERE rn = 1
        """,
        "prefix_containment_convs": TRANSCRIPTS_SQL + """
            , retry AS (
                SELECT conv_id || '-retry' AS conv_id, turn_idx, role,
                       text
                FROM transcripts
                WHERE CAST(substr(conv_id, 6) AS INTEGER) % 5 = 0
                  AND turn_idx < 3),
            tall AS (
                SELECT conv_id, turn_idx, role, text FROM transcripts
                UNION ALL SELECT * FROM retry),
            conv AS (
                SELECT conv_id,
                       string_agg(role || chr(30) || text, chr(31)
                                  ORDER BY turn_idx) AS s,
                       count(*) AS len
                FROM tall GROUP BY 1)
            SELECT a.conv_id AS conv_a, b.conv_id AS conv_b,
                   CAST(a.len AS BIGINT) AS prefix_len,
                   (a.len = b.len) AS full_match
            FROM conv a JOIN conv b ON a.conv_id <> b.conv_id
            WHERE (b.len > a.len AND starts_with(b.s, a.s || chr(31)))
               OR (b.len = a.len AND a.conv_id < b.conv_id AND a.s = b.s)
        """,
        "tool_seq_clusters": TRANSCRIPTS_SQL + """
            , seqs AS (
                SELECT conv_id,
                       string_agg(tool, ',' ORDER BY turn_idx) AS tool_seq
                FROM transcripts
                WHERE tool IS NOT NULL AND tool <> '' GROUP BY 1),
            cl AS (
                SELECT tool_seq, count(*) AS cluster_size,
                       min(conv_id) AS cluster_id
                FROM seqs GROUP BY 1 HAVING count(*) >= 2)
            SELECT s.conv_id, c.cluster_id,
                   CAST(c.cluster_size AS BIGINT) AS cluster_size
            FROM seqs s JOIN cl c USING (tool_seq)
        """,
        "length_drift_by_source": f"""
            WITH grid AS (SELECT DISTINCT n_chars AS x FROM documents),
            srcs AS (SELECT source, count(*) AS n_s FROM documents
                     GROUP BY 1),
            tot AS (SELECT count(*) AS n FROM documents),
            counts AS (SELECT source, n_chars AS x, count(*) AS c
                       FROM documents GROUP BY 1, 2),
            sx AS (
                SELECT s.source, g.x, coalesce(c.c, 0) AS c
                FROM srcs s CROSS JOIN grid g
                LEFT JOIN counts c
                  ON c.source = s.source AND c.x = g.x
            ),
            cum AS (
                SELECT source, x,
                       sum(c) OVER (PARTITION BY source ORDER BY x) AS cle
                FROM sx
            ),
            tcum AS (
                SELECT x, sum(c) OVER (ORDER BY x) AS tle
                FROM (SELECT x, sum(c) AS c FROM sx GROUP BY x) q
            ),
            stat AS (
                SELECT cum.source,
                       max(abs(CAST(cum.cle AS DOUBLE) / s.n_s
                               - CAST(tcum.tle - cum.cle AS DOUBLE)
                                 / (t.n - s.n_s))) AS ks
                FROM cum JOIN tcum USING (x)
                JOIN srcs s ON s.source = cum.source
                CROSS JOIN tot t
                WHERE s.n_s < t.n
                GROUP BY 1
            )
            SELECT s.source, s.n_s AS n_docs,
                   round(st.ks, {_ROUND}) AS ks_stat
            FROM stat st JOIN srcs s USING (source)
        """,
        "dup_rate_by_lang": _TIERED_CTES + f"""
            SELECT l.detected_lang,
                   count(*) AS n_docs,
                   CAST(sum(CASE WHEN t.tier = 'exact' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_exact,
                   CAST(sum(CASE WHEN t.tier = 'near' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_near,
                   CAST(sum(CASE WHEN t.tier = 'keep' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_keep
            FROM (
                SELECT g.doc_id,
                       CASE WHEN g.doc_id != g.exact_rep THEN 'exact'
                            WHEN c.root != g.doc_id THEN 'near'
                            ELSE 'keep' END AS tier
                FROM g JOIN comp c ON c.node = g.exact_rep
            ) t
            JOIN ({_langid_sql()}) l ON l.doc_id = t.doc_id
            GROUP BY 1
        """,
        "shard_manifest": """
            SELECT shard, count(*) AS n_docs,
                   min(doc_id) AS min_id, max(doc_id) AS max_id
            FROM (
                SELECT doc_id,
                       CAST(CAST(('0x' || substr(
                                md5('shard0:' || CAST(doc_id AS VARCHAR)),
                                1, 15)) AS UBIGINT) % 16 AS BIGINT)
                           AS shard
                FROM documents
            )
            GROUP BY 1
        """,
        # incremental_dedup: brute-force replay — md5 split, exact =
        # text equality vs min-key old rep, near = shingle jaccard >=
        # 0.8 (same CASE shingle rule as near_dup_pairs_docs), best
        # match by raw jaccard DESC then min key; raw float ranking is
        # safe because both sides compute the identical exact-int
        # division c / (na + nb - c).
        "incremental_dedup": f"""
            WITH split AS (
                SELECT CAST(doc_id AS VARCHAR) AS k,
                       coalesce(text, '') AS text,
                       CAST(('0x' || substr(
                            md5('incr0:' || CAST(doc_id AS VARCHAR)),
                            1, 15)) AS UBIGINT) % 5 AS b
                FROM documents
            ),
            old_side AS (SELECT k, text FROM split WHERE b <> 0),
            new_side AS (SELECT k, text FROM split WHERE b = 0),
            old_reps AS (
                SELECT min(k) AS okey, text FROM old_side GROUP BY text
            ),
            ex AS (
                SELECT n.k, min(r.okey) AS exact_match
                FROM new_side n JOIN old_reps r ON n.text = r.text
                GROUP BY 1
            ),
            {_shingle_ctes('o', 'old_reps', 'okey')},
            {_shingle_ctes('n', 'new_side', 'k')},
            common AS (
                SELECT n.id AS k, o.id AS okey, count(*) AS c
                FROM n_sh n JOIN o_sh o ON n.sh = o.sh GROUP BY 1, 2
            ),
            near AS (
                SELECT c.k, c.okey,
                       CAST(c.c AS DOUBLE) / (nn.n + onn.n - c.c) AS j
                FROM common c
                JOIN n_n nn ON nn.id = c.k
                JOIN o_n onn ON onn.id = c.okey
                WHERE CAST(c.c AS DOUBLE) / (nn.n + onn.n - c.c) >= 0.8
            ),
            near_best AS (
                SELECT k, okey AS near_match, j FROM (
                    SELECT k, okey, j,
                           row_number() OVER (PARTITION BY k
                                              ORDER BY j DESC, okey)
                               AS rn
                    FROM near
                ) WHERE rn = 1
            )
            SELECT n.k AS key,
                   CASE WHEN e.exact_match IS NOT NULL THEN 'exact'
                        WHEN nb.near_match IS NOT NULL THEN 'near'
                        ELSE 'new' END AS status,
                   coalesce(e.exact_match, nb.near_match) AS match_key,
                   CASE WHEN e.exact_match IS NOT NULL THEN NULL
                        ELSE round(nb.j, 6) END AS jaccard
            FROM new_side n
            LEFT JOIN ex e ON e.k = n.k
            LEFT JOIN near_best nb ON nb.k = n.k
        """,
        # incremental_dedup_rolling: replay BOTH probe rounds brute
        # force — shard-1 labels decide which min-key within-shard reps
        # join the index (statuses=('new',) policy), then shard 2 is
        # labeled against the two-generation union.
        "incremental_dedup_rolling": f"""
            WITH split AS (
                SELECT CAST(doc_id AS VARCHAR) AS k,
                       coalesce(text, '') AS text,
                       CAST(('0x' || substr(
                            md5('incr0:' || CAST(doc_id AS VARCHAR)),
                            1, 15)) AS UBIGINT) % 5 AS b
                FROM documents
            ),
            old_side AS (SELECT k, text FROM split WHERE b > 1),
            s1 AS (SELECT k, text FROM split WHERE b = 1),
            s2 AS (SELECT k, text FROM split WHERE b = 0),
            i1 AS (SELECT min(k) AS okey, text FROM old_side
                   GROUP BY text),
            {_shingle_ctes('i1', 'i1', 'okey')},
            {_shingle_ctes('s1', 's1', 'k')},
            s1_ex AS (
                SELECT DISTINCT s.k FROM s1 s JOIN i1 r
                ON s.text = r.text
            ),
            s1_common AS (
                SELECT a.id AS k, b.id AS okey, count(*) AS c
                FROM s1_sh a JOIN i1_sh b ON a.sh = b.sh GROUP BY 1, 2
            ),
            s1_near AS (
                SELECT DISTINCT c.k
                FROM s1_common c
                JOIN s1_n nn ON nn.id = c.k
                JOIN i1_n onn ON onn.id = c.okey
                WHERE CAST(c.c AS DOUBLE) / (nn.n + onn.n - c.c) >= 0.8
            ),
            s1_new AS (
                SELECT k, text FROM s1
                WHERE k NOT IN (SELECT k FROM s1_ex)
                  AND k NOT IN (SELECT k FROM s1_near)
            ),
            s1_reps AS (SELECT min(k) AS okey, text FROM s1_new
                        GROUP BY text),
            i2 AS (
                SELECT okey, text FROM i1
                UNION ALL SELECT okey, text FROM s1_reps
            ),
            i2_sh AS (
                SELECT id, sh FROM i1_sh
                UNION ALL
                SELECT r.okey AS id, a.sh
                FROM s1_sh a JOIN s1_reps r ON r.okey = a.id
            ),
            i2_n AS (SELECT id, count(*) AS n FROM i2_sh GROUP BY 1),
            {_shingle_ctes('s2', 's2', 'k')},
            ex2 AS (
                SELECT s.k, min(r.okey) AS exact_match
                FROM s2 s JOIN i2 r ON s.text = r.text GROUP BY 1
            ),
            common2 AS (
                SELECT a.id AS k, b.id AS okey, count(*) AS c
                FROM s2_sh a JOIN i2_sh b ON a.sh = b.sh GROUP BY 1, 2
            ),
            near2 AS (
                SELECT c.k, c.okey,
                       CAST(c.c AS DOUBLE) / (nn.n + onn.n - c.c) AS j
                FROM common2 c
                JOIN s2_n nn ON nn.id = c.k
                JOIN i2_n onn ON onn.id = c.okey
                WHERE CAST(c.c AS DOUBLE) / (nn.n + onn.n - c.c) >= 0.8
            ),
            near_best2 AS (
                SELECT k, okey AS near_match, j FROM (
                    SELECT k, okey, j,
                           row_number() OVER (PARTITION BY k
                                              ORDER BY j DESC, okey)
                               AS rn
                    FROM near2
                ) WHERE rn = 1
            )
            SELECT s.k AS key,
                   CASE WHEN e.exact_match IS NOT NULL THEN 'exact'
                        WHEN nb.near_match IS NOT NULL THEN 'near'
                        ELSE 'new' END AS status,
                   coalesce(e.exact_match, nb.near_match) AS match_key,
                   CASE WHEN e.exact_match IS NOT NULL THEN NULL
                        ELSE round(nb.j, 6) END AS jaccard
            FROM s2 s
            LEFT JOIN ex2 e ON e.k = s.k
            LEFT JOIN near_best2 nb ON nb.k = s.k
        """,
        # unigram_logppl: same token contract as token_counts; HUGEINT
        # sums cast back to BIGINT/DOUBLE before the float math.
        "unigram_logppl": f"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text),
                                                 '[0-9a-zA-Z_]+')) AS tok
                FROM documents
            ),
            tf AS (SELECT doc_id, tok, count(*) AS tf
                   FROM toks GROUP BY 1, 2),
            cnt AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS c
                    FROM tf GROUP BY 1),
            tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
            per AS (
                SELECT t.doc_id,
                       sum(t.tf * ln(CAST(c.c AS DOUBLE))) AS s,
                       CAST(sum(t.tf) AS BIGINT) AS nd
                FROM tf t JOIN cnt c USING (tok) GROUP BY 1
            )
            SELECT p.doc_id, p.nd AS n_tokens,
                   round(ln(CAST(tot.n AS DOUBLE)) - p.s / p.nd,
                         {_ROUND}) AS logppl
            FROM per p CROSS JOIN tot
        """,
        # line_dedup_docs: explode the lined view, count DISTINCT docs
        # per non-empty line, collect the dup set as ONE list and
        # list_filter each doc's lines against it (order-preserving —
        # dodges DuckDB's missing WITH ORDINALITY).
        "effective_tokens": f"""
            WITH reps AS (
                SELECT doc_id + 1000000 * j AS doc_id, text, source
                FROM documents, range(1, 4) AS t(j)
                WHERE doc_id % 5 = 0),
            tall AS (SELECT doc_id, text, source FROM documents
                     UNION ALL SELECT doc_id, text, source FROM reps),
            g AS (SELECT source, coalesce(text, '') AS txt FROM tall),
            tk AS (SELECT txt,
                          len(regexp_extract_all(lower(txt),
                                                 '[0-9a-z_]+')) AS tok
                   FROM (SELECT DISTINCT txt FROM g)),
            c AS (SELECT txt, source, count(*) AS c FROM g GROUP BY 1, 2),
            n AS (SELECT txt, CAST(sum(c) AS BIGINT) AS n
                  FROM c GROUP BY 1)
            SELECT c.source,
                   CAST(sum(c.c) AS BIGINT) AS n_docs,
                   CAST(sum(c.c * tk.tok) AS BIGINT) AS n_tokens,
                   round(sum(c.c * tk.tok / CAST(n.n AS DOUBLE)),
                         {_ROUND}) AS eff_tokens
            FROM c JOIN tk USING (txt) JOIN n USING (txt)
            GROUP BY 1
        """,
        "hot_ngrams": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text),
                                          '[0-9a-zA-Z_]+') AS tk
                FROM documents
            ),
            grams AS (
                SELECT DISTINCT doc_id,
                       unnest(list_transform(range(1, len(tk) - 3),
                              i -> array_to_string(tk[i : i + 4], ' ')))
                           AS g
                FROM toks
            ),
            counts AS (SELECT g, count(DISTINCT doc_id) AS n_docs
                       FROM grams GROUP BY 1),
            thr AS (SELECT greatest(coalesce(
                        (SELECT n_docs FROM counts
                         ORDER BY n_docs DESC LIMIT 1 OFFSET 9), 2), 2)
                        AS t)
            SELECT g AS gram, CAST(n_docs AS BIGINT) AS n_docs
            FROM counts, thr WHERE n_docs >= thr.t
        """,
        "cdc_dup_stats": """
            WITH ch AS (
                SELECT doc_id, text,
                       unnest(generate_series(1, len(text))) AS i
                FROM documents WHERE len(text) > 0
            ),
            cp AS (
                SELECT doc_id, i, substr(text, i, 1) AS s,
                       unicode(substr(text, i, 1)) % 251 AS c
                FROM ch
            ),
            hs AS (
                SELECT doc_id, i, s,
                       c + coalesce(lag(c, 1) OVER w, 0) * 256
                         + coalesce(lag(c, 2) OVER w, 0) * 65536
                         + coalesce(lag(c, 3) OVER w, 0) * 16777216
                         + coalesce(lag(c, 4) OVER w, 0) * 4294967296
                         + coalesce(lag(c, 5) OVER w, 0) * 1099511627776
                           AS h
                FROM cp WINDOW w AS (PARTITION BY doc_id ORDER BY i)
            ),
            bd AS (
                SELECT doc_id, i, s,
                       CASE WHEN i >= 6 AND h % 32 = 0 THEN 1 ELSE 0 END
                           AS b
                FROM hs
            ),
            cid AS (
                SELECT doc_id, i, s,
                       coalesce(sum(b) OVER (
                           PARTITION BY doc_id ORDER BY i
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS k
                FROM bd
            ),
            chunks AS (
                SELECT doc_id, k, string_agg(s, '' ORDER BY i) AS chunk
                FROM cid GROUP BY 1, 2
            ),
            nd AS (SELECT chunk
                   FROM (SELECT chunk, count(DISTINCT doc_id) AS n
                         FROM chunks GROUP BY 1)
                   WHERE n >= 2),
            st AS (
                SELECT c.doc_id, count(*) AS n_chunks,
                       count(*) FILTER (
                           WHERE c.chunk IN (SELECT chunk FROM nd))
                           AS n_dup_chunks
                FROM chunks c GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(coalesce(st.n_chunks, 0) AS BIGINT) AS n_chunks,
                   CAST(coalesce(st.n_dup_chunks, 0) AS BIGINT)
                       AS n_dup_chunks
            FROM documents d LEFT JOIN st USING (doc_id)
        """,
        "kcenter_coreset": _kcenter_sql(),
        # dedup_method_agreement: Rand pair-counting components between
        # exact-text and bag partitions of the reordered view; label
        # VALUES differ between engine (varchar min key) and SQL
        # (bigint min id) but only the PARTITIONS enter the counts.
        "dedup_method_agreement": f"""
            WITH reord AS (
                SELECT doc_id + 4000000 AS doc_id,
                       array_to_string(
                           list_reverse(str_split(coalesce(text, ''), ' ')),
                           ' ') AS text
                FROM documents WHERE doc_id % 9 = 0),
            tall AS (SELECT doc_id, coalesce(text, '') AS text
                     FROM documents
                     UNION ALL SELECT doc_id, text FROM reord),
            ga AS (SELECT text, min(doc_id) AS l FROM tall GROUP BY 1),
            ka AS (SELECT t.doc_id, g.l AS a
                   FROM tall t JOIN ga g USING (text)),
            canon AS (SELECT doc_id,
                             array_to_string(list_sort(str_split(text, ' ')),
                                             ' ') AS cn
                      FROM tall),
            gb AS (SELECT cn, min(doc_id) AS l FROM canon GROUP BY 1),
            kb AS (SELECT c.doc_id, g.l AS b
                   FROM canon c JOIN gb g USING (cn)),
            j AS (SELECT ka.a, kb.b FROM ka JOIN kb USING (doc_id)),
            cells AS (SELECT a, b, count(*) AS c FROM j GROUP BY 1, 2),
            sab AS (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS v,
                           CAST(sum(c) AS BIGINT) AS n FROM cells),
            ma AS (SELECT a, CAST(sum(c) AS BIGINT) AS c
                   FROM cells GROUP BY 1),
            sa AS (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS v
                   FROM ma),
            mb AS (SELECT b, CAST(sum(c) AS BIGINT) AS c
                   FROM cells GROUP BY 1),
            sb AS (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS v
                   FROM mb)
            SELECT sab.n AS n, sab.v AS pairs_both, sa.v AS pairs_a,
                   sb.v AS pairs_b,
                   sab.n * (sab.n - 1) // 2 AS pairs_total,
                   round(CAST(2 * sab.v + sab.n * (sab.n - 1) // 2
                              - sa.v - sb.v AS DOUBLE)
                         / CAST(sab.n * (sab.n - 1) // 2 AS DOUBLE),
                         {_ROUND}) AS rand_index
            FROM sab CROSS JOIN sa CROSS JOIN sb
        """,
        # dsir_logweights: hashed unigram+bigram feature instances ->
        # md5-low60 % 4096 buckets; target = src0, raw = all docs;
        # lam(b) = ln(ct+1) - ln(cr+1); log_w = sum lam + nf * const.
        "dsir_logweights": f"""
            WITH toks AS (
                SELECT doc_id, source,
                       regexp_extract_all(lower(text),
                                          '[0-9a-zA-Z_]+') AS tk
                FROM documents
            ),
            feats AS (
                SELECT doc_id, source, unnest(tk) AS f FROM toks
                UNION ALL
                SELECT doc_id, source,
                       unnest(list_transform(range(1, len(tk)),
                              i -> tk[i] || ' ' || tk[i+1])) AS f
                FROM toks
            ),
            fb AS (
                SELECT doc_id, source,
                       CAST(CAST(('0x' || substr(md5('dsir0:' || f),
                                                 1, 15)) AS UBIGINT)
                            % 4096 AS BIGINT) AS b
                FROM feats
            ),
            cr AS (SELECT b, count(*) AS c FROM fb GROUP BY 1),
            ct AS (SELECT b, count(*) AS c FROM fb
                   WHERE source = 'src0' GROUP BY 1),
            tot AS (SELECT (SELECT count(*) FROM fb) AS nr,
                           (SELECT count(*) FROM fb
                            WHERE source = 'src0') AS nt),
            lam AS (SELECT cr.b,
                           ln(CAST(coalesce(ct.c, 0) + 1 AS DOUBLE))
                         - ln(CAST(cr.c + 1 AS DOUBLE)) AS l
                    FROM cr LEFT JOIN ct USING (b)),
            per AS (SELECT fb.doc_id, count(*) AS nf, sum(lam.l) AS s
                    FROM fb JOIN lam USING (b) GROUP BY 1)
            SELECT p.doc_id, p.nf AS n_feats,
                   round(p.s + p.nf * (ln(CAST(tot.nr + 4096 AS DOUBLE))
                                     - ln(CAST(tot.nt + 4096 AS DOUBLE))),
                         {_ROUND}) AS log_w
            FROM per p CROSS JOIN tot
        """,
        # self_line_dedup_docs: word-per-line view (n=1 => lines =
        # str_split(text, ' ')); first occurrence per (doc, line) by min
        # position (zip-unnest ordinality), ordered string_agg rejoin.
        "self_line_dedup_docs": """
            WITH lined AS (SELECT doc_id,
                                  str_split(coalesce(text, ''), ' ')
                                      AS lines
                           FROM documents),
            ex AS (SELECT doc_id, unnest(lines) AS line,
                          unnest(generate_series(1, len(lines))) AS ord
                   FROM lined),
            firsts AS (SELECT doc_id, line, min(ord) AS m
                       FROM ex GROUP BY 1, 2),
            agg AS (SELECT doc_id,
                           string_agg(line, chr(10) ORDER BY m) AS text,
                           count(*) AS nk
                    FROM firsts GROUP BY 1)
            SELECT l.doc_id, coalesce(a.text, '') AS text,
                   len(l.lines) AS n_lines,
                   len(l.lines) - a.nk AS n_removed
            FROM lined l JOIN agg a USING (doc_id)
        """,
        "line_dedup_docs": _LINED_SQL + """,
            ex AS (SELECT doc_id, unnest(lines) AS line FROM lined),
            d AS (SELECT DISTINCT doc_id, line FROM ex WHERE line <> ''),
            dup AS (SELECT line FROM d GROUP BY line
                    HAVING count(*) >= 2),
            dset AS (SELECT coalesce(list(line), []) AS dl FROM dup),
            kept AS (
                SELECT l.doc_id, l.lines,
                       list_filter(l.lines,
                           x -> x = '' OR NOT list_contains(dset.dl, x))
                           AS kl
                FROM lined l CROSS JOIN dset
            )
            SELECT doc_id,
                   -- engine contract: a fully-wiped doc keeps its row
                   -- with text = '' (DuckDB array_to_string([]) is NULL)
                   coalesce(array_to_string(kl, chr(10)), '') AS text,
                   len(lines) AS n_lines,
                   len(lines) - len(kl) AS n_removed
            FROM kept
        """,
    }


def oracle_sql() -> dict[str, str]:
    oracles = _oracle_sql_base()
    # the bucketed asof scale path answers the same question — one SQL
    # truth, two execution paths
    oracles["asof_clicks_purchases_bucketed"] = (
        oracles["asof_clicks_purchases"])
    oracles["range_join_events_bucketed"] = oracles["range_join_events"]
    oracles["running_qty_per_part_bucketed"] = (
        oracles["running_qty_per_part"])
    # PQ-shortlist + exact re-rank answers the same top-k question —
    # one SQL truth, another execution path (like the bucketed pairs)
    oracles["ann_topk_pq"] = oracles["ann_topk"]
    # the ICWS weighted-minhash kernel answers the same weighted-pair
    # question — one SQL truth, a second candidate-generation kernel
    # (the exact verify makes both outputs the exact J_w pair set)
    oracles["bag_near_dup_pairs_icws"] = oracles["bag_near_dup_pairs"]
    # the alternating-star components backend answers the same cluster
    # question — one SQL truth, a third execution path
    oracles["near_dup_clusters_altstar"] = oracles["near_dup_clusters_docs"]
    # incremental label-graph merge answers the same cluster question —
    # one SQL truth, a fourth execution path
    oracles["near_dup_clusters_incremental"] = (
        oracles["near_dup_clusters_docs"])
    # the OPH signature kernel answers the same verified-pair question —
    # one SQL truth, another signature kernel (exact verify either way)
    oracles["near_dup_pairs_oph"] = oracles["near_dup_pairs_docs"]
    oracles["near_dup_pairs_kperm"] = oracles["near_dup_pairs_docs"]
    # the Aho-Corasick actor-pool kernel answers the same blocklist
    # question as the Rabin-Karp pass — one SQL truth, a third kernel
    oracles["blocklist_hits_ac"] = oracles["blocklist_hits_rk"]
    return oracles
