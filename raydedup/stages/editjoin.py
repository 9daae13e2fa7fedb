"""Edit-distance self-join via deletion-variant candidates (FastSS,
Bocek et al. 2007, "Fast Similarity Search in Large Dictionaries").

The FOURTH candidate paradigm next to MinHash-LSH banding, SimHash
pigeonhole blocks and sorted-neighborhood windows: two strings within
Levenshtein distance 1 MUST share a single-deletion variant —
substitution pairs collide on the variant with the edited position
deleted, insert/delete pairs collide because the shorter string IS a
variant of the longer, equal strings collide on themselves. Candidates
are therefore exact hash-bucket collisions (no recall tuning at all),
and an exact verify scan removes the false positives (two different
deletions colliding), so the output is the EXACT lev-1 pair set.

This is the typo/near-identical class of dedup — short fields (titles,
user queries, tool names, single turns), where shingle-based methods
have nothing to band and a quadratic scan is the naive alternative.
Deliberately scoped to short strings: the variant explode is linear in
string length, so rows longer than ``max_len`` are excluded by contract
(long-text near-dup belongs to the LSH/shingle family; same division as
the reference's per-measure applicability rules).

Scale shape: identical texts collapse to a min-id representative first
(one groupby — the LSH-rep idiom), only 60-bit variant hashes shuffle,
candidate generation is ONE bucket-hash partition sweep (singleton
variant hashes cost a run-length row, not a Python call or a semi-join
pass — the setjoin one-shuffle idiom), candidate pairs dedupe
in a (a, b) groupby, and texts re-attach for the verify via two skinny
hash joins sized by ``join_partitions``. A hot variant bucket is a
clique of true lev-1 neighbors, so its quadratic pair emission is
output-bound, not waste.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _lev_le1(a: str, b: str) -> bool:
    """Exact test lev(a, b) == 1 (a != b assumed)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        diff = 0
        for x, y in zip(a, b):
            if x != y:
                diff += 1
                if diff > 1:
                    return False
        return diff == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _h60(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                          "big") >> 4


def typo_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
               max_len: int = 64, num_partitions: int | None = None,
               sweep_partitions: int | None = None):
    """rows -> Dataset(a_id, b_id): every unordered pair of DISTINCT
    text values at Levenshtein distance exactly 1, identified by the
    min-``id_col`` representative of each text (a_id < b_id). Rows with
    empty text or more than ``max_len`` characters are out of scope by
    contract. Identical texts are collapsed first, so dist-0 pairs
    never appear — compose with exact dedup for those."""
    import ray
    import ray.data
    from ray.data.aggregate import Min

    from raydedup.util import join_partitions

    pair_schema = pa.schema([pa.field("a_id", pa.int64()),
                             pa.field("b_id", pa.int64())])

    def in_scope(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch[text_col].combine_chunks(), "")
        n = pc.utf8_length(t)
        keep = pc.and_(pc.greater(n, 0),
                       pc.less_equal(n, pa.scalar(max_len)))
        return pa.table({id_col: batch[id_col],
                         text_col: t}).filter(keep)

    base = ds.select_columns([id_col, text_col]).map_batches(
        in_scope, batch_format="pyarrow")
    reps = base.groupby(text_col).aggregate(
        Min(id_col, alias_name="rid")).materialize()
    n_reps = reps.count()
    if n_reps < 2:
        return ray.data.from_arrow(pair_schema.empty_table())

    def variants(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        rids = batch["rid"].to_pylist()
        out_h: list[int] = []
        out_i: list[int] = []
        for t, i in zip(texts, rids):
            hs = {_h60(t)}
            for p in range(len(t)):
                hs.add(_h60(t[:p] + t[p + 1:]))
            out_h.extend(hs)
            out_i.extend([i] * len(hs))
        return pa.table({"vhash": pa.array(out_h, pa.int64()),
                         "rid": pa.array(out_i, pa.int64())})

    exploded = reps.map_batches(
        variants, batch_format="pyarrow").materialize()
    n_exploded = exploded.count()
    if n_exploded == 0:
        return ray.data.from_arrow(pair_schema.empty_table())
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_parts = num_partitions or min(
        join_partitions(n_exploded), max(2, 2 * ncpu))

    # candidate generation: one partition sweep over the variant-hash
    # table (the setjoin.set_similarity_join_sets idiom) — one
    # all-to-all instead of the former counting-groupby + semi-join +
    # per-bucket groupby chain; singleton variant hashes cost a
    # run-length row, not a Python call
    from raydedup.stages.asof import _part_array

    # sweep parallelism is its OWN knob (``sweep_partitions``), not the
    # jkey-join's ``num_partitions`` — tuning join parallelism must not
    # silently change sweep-group sizes. No fixed ceiling: the count
    # targets ~500k exploded rows per partition so single-group memory
    # stays bounded at any input size.
    n_sweep = sweep_partitions or max(
        2 * ncpu, n_exploded // 500_000 + 1)

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column("__part",
                               _part_array(b["vhash"], n_sweep))

    def sweep_pairs(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2 or "vhash" not in group.column_names:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64())})
        vh = group["vhash"].to_numpy(zero_copy_only=False)
        rid = group["rid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((rid, vh))
        v_s, r_s = vh[order], rid[order]
        starts = np.flatnonzero(np.r_[True, v_s[1:] != v_s[:-1]])
        ends = np.r_[starts[1:], m]
        a_all, b_all = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            seg = r_s[s:e]
            ids = seg[np.r_[True, seg[1:] != seg[:-1]]]  # sorted-unique
            if ids.size < 2:
                continue
            ai, bi = np.triu_indices(ids.size, k=1)
            a_all.append(ids[ai])
            b_all.append(ids[bi])
        if not a_all:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64())})
        return pa.table(
            {"a_id": pa.array(np.concatenate(a_all), pa.int64()),
             "b_id": pa.array(np.concatenate(b_all), pa.int64())})

    raw_pairs = (exploded.map_batches(add_part, batch_format="pyarrow")
                 .groupby("__part")
                 .map_groups(sweep_pairs, batch_format="pyarrow"))
    # a pair can collide in several variant buckets: verify once
    from ray.data.aggregate import Count

    uniq = (raw_pairs.groupby(["a_id", "b_id"])
            .aggregate(Count(alias_name="_c")).drop_columns(["_c"]))

    # texts attach via ONE hash join (the lsh.py / suffix_span pair
    # idiom): each pair explodes to two (jkey=rid, pid, side) rows, the
    # rep texts join once, and each hash partition of pairs verifies in
    # one Python call — replaces the former TWO chained join pools,
    # which is both an extra shuffle and the documented
    # one-join-per-streaming-plan deadlock shape at small CPU counts
    # no fixed ceiling: vparts scale with the rep count (~4k reps'
    # worth of pairs per verify group) so one verify_part call never
    # holds an unbounded candidate slice on corpus-sized inputs
    n_vparts = max(1, n_reps // 4096 + 1)

    def explode_pairs(b: pa.Table) -> pa.Table:
        a_s = pc.cast(b["a_id"], pa.string()).combine_chunks()
        b_s = pc.cast(b["b_id"], pa.string()).combine_chunks()
        pid = pc.binary_join_element_wise(a_s, b_s, "\x1f")
        pidc = pa.concat_arrays([pid] * 2)
        from raydedup.stages.asof import _part_array

        return pa.table({
            "jkey": pa.concat_arrays([b["a_id"].combine_chunks(),
                                      b["b_id"].combine_chunks()]),
            "pid": pidc,
            "side": pa.array([0] * b.num_rows + [1] * b.num_rows,
                             pa.int32()),
            "vpart": _part_array(pa.chunked_array([pidc]), n_vparts),
        })

    exp = uniq.map_batches(explode_pairs, batch_format="pyarrow")
    texts = reps.map_batches(
        lambda b: pa.table({"jkey": b["rid"], "_t": b[text_col]}),
        batch_format="pyarrow")
    joined = exp.join(texts, join_type="inner", num_partitions=n_parts,
                      on=("jkey",))

    def verify_part(group: pa.Table) -> pa.Table:
        if group.num_rows < 2 or "pid" not in group.column_names:
            return pair_schema.empty_table()
        pids = np.asarray(group["pid"].to_pylist())
        sides = group["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sides, pids))
        sp = pids[order]
        both = np.flatnonzero(sp[:-1] == sp[1:])
        if both.size == 0:
            return pair_schema.empty_table()
        ia, ib = order[both], order[both + 1]
        txt = group["_t"].to_pylist()
        keep = np.fromiter(
            (_lev_le1(txt[i], txt[j]) for i, j in zip(ia, ib)),
            dtype=bool, count=ia.size)
        if not keep.any():
            return pair_schema.empty_table()
        jk = group["jkey"].combine_chunks()
        sel_a = pa.array(ia[keep])
        sel_b = pa.array(ib[keep])
        return pa.table({"a_id": pc.take(jk, sel_a),
                         "b_id": pc.take(jk, sel_b)})

    out = joined.groupby("vpart").map_groups(
        verify_part, batch_format="pyarrow")
    return out.union(ray.data.from_arrow(pair_schema.empty_table()))


def pair_edit_stats(pairs_ds, keyed_texts_ds, key_col: str = "row_key",
                    text_col: str = "text", n_vparts: int | None = None):
    """Edit-script forensics for an ALREADY-VERIFIED pair set: for each
    (a_key, b_key) pair, the TOKEN-level Levenshtein distance between
    the two documents' ordered token streams (simple_tokenize contract)
    and its max-length normalization — "what kind of edit separates
    these near-dups" (a handful of substitutions vs a large
    insertion), the per-pair complement of the set-level jaccard the
    verifier already attached.

    Scale shape: the lsh.py pair-verify idiom — pairs explode to
    (pid, side, jkey) rows, texts attach via ONE inner hash join (only
    PAIRED keys' texts ever leave the corpus table — the pair set is
    sparse by the dup-threshold contract), and each hash partition of
    pairs is processed in one Python call. The per-pair DP
    (functions/setsim.py:levenshtein_tokens, two-row numpy sweep) is
    the only per-pair cost and is O(len_a · len_b) on the PAIRED rows
    only — never corpus-scale.
    """
    import ray
    import ray.data

    from raydedup.functions.setsim import levenshtein_tokens
    from raydedup.stages.asof import _part_array
    from raydedup.textnorm import simple_tokenize
    from raydedup.util import join_partitions

    out_schema = pa.schema([
        pa.field("a_key", pa.string()), pa.field("b_key", pa.string()),
        pa.field("n_a", pa.int64()), pa.field("n_b", pa.int64()),
        pa.field("token_lev", pa.int64()),
        pa.field("nlev", pa.float64()),
    ])
    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    nvp = n_vparts or max(1, n_pairs // 4096 + 1)  # no ceiling — scale with pairs

    def explode_pairs(b: pa.Table) -> pa.Table:
        a_s = pc.cast(b["a_key"], pa.string())
        b_s = pc.cast(b["b_key"], pa.string())
        pid = pc.binary_join_element_wise(a_s, b_s, "\x1f")
        pidc = pa.concat_arrays([pid.combine_chunks()] * 2)
        return pa.table({
            "jkey": pa.concat_arrays([a_s.combine_chunks(),
                                      b_s.combine_chunks()]),
            "pid": pidc,
            "side": pa.array([0] * b.num_rows + [1] * b.num_rows,
                             pa.int32()),
            "vpart": _part_array(pa.chunked_array([pidc]), nvp),
        })

    exp = pairs_ds.map_batches(explode_pairs, batch_format="pyarrow")

    def keyed(b: pa.Table) -> pa.Table:
        return pa.table({
            "jkey": pc.cast(b[key_col], pa.string()),
            "txt": pc.fill_null(b[text_col], ""),
        })

    texts = keyed_texts_ds.map_batches(keyed, batch_format="pyarrow")
    joined = exp.join(texts, join_type="inner",
                      num_partitions=join_partitions(2 * n_pairs),
                      on=("jkey",))

    def stats_part(group: pa.Table) -> pa.Table:
        if group.num_rows < 2 or "pid" not in group.column_names:
            return out_schema.empty_table()
        pids = np.asarray(group["pid"].to_pylist())
        sides = group["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sides, pids))
        sp = pids[order]
        both = np.flatnonzero(sp[:-1] == sp[1:])
        if both.size == 0:
            return out_schema.empty_table()
        ia, ib = order[both], order[both + 1]
        keys = group["jkey"].to_pylist()
        txts = group["txt"].to_pylist()
        tok_cache: dict[int, list] = {}

        def toks(i: int) -> list:
            t = tok_cache.get(i)
            if t is None:
                t = simple_tokenize(txts[i] or "")
                tok_cache[i] = t
            return t

        a_k, b_k, n_a, n_b, lev, nlev = [], [], [], [], [], []
        for i, j in zip(ia, ib):
            ta, tb = toks(int(i)), toks(int(j))
            d = levenshtein_tokens(ta, tb)
            m = max(len(ta), len(tb))
            a_k.append(keys[int(i)])
            b_k.append(keys[int(j)])
            n_a.append(len(ta))
            n_b.append(len(tb))
            lev.append(d)
            nlev.append(d / m if m else 0.0)
        return pa.table({
            "a_key": pa.array(a_k, pa.string()),
            "b_key": pa.array(b_k, pa.string()),
            "n_a": pa.array(n_a, pa.int64()),
            "n_b": pa.array(n_b, pa.int64()),
            "token_lev": pa.array(lev, pa.int64()),
            "nlev": pa.array(nlev, pa.float64()),
        })

    out = joined.groupby("vpart").map_groups(
        stats_part, batch_format="pyarrow").materialize()
    if out.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    return out
