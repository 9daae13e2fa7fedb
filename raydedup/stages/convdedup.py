"""Conversation-structure dedup over transcript tables.

Two transcript-native operators the reference's per-memento measures
imply but never had. OTMT scores each memento against its TimeMap
anchor (otmt/timemap_measures.py:130-230) — the unit is the single
capture. The transcript analogue of "this capture is a shorter rerun
of that one" is PREFIX CONTAINMENT over the turn sequence:

- ``prefix_containment_pairs``: conversations whose full (role, text)
  turn sequence is a strict prefix of another conversation's sequence
  — the retry / continuation duplicate pattern of agent transcripts (a
  crashed run re-submitted under a new conv_id, extending the same
  prefix), plus whole-conversation exact duplicates (equal length,
  equal sequence; emitted once with ``conv_a < conv_b``). Exact:
  candidates come from a 64-bit rolling hash, survivors are verified
  against the assembled text.

- ``tool_sequence_clusters``: conversations clustered by their exact
  ordered tool-call sequence (text ignored) — structural dedup for
  agent traces ("same tool script, different wording"). Grouping is on
  the literal sequence string, so the result is exact by construction.

Scale design:

* Candidate generation is LINEAR in turns, never quadratic in
  conversations: one prefix-hash row per turn (the ordered.py
  partition sweep — hash-partition by conv_id, ONE lexsort per
  partition, segment arithmetic; no Python call per key), then a
  distributed hash-join of full-sequence hashes against prefix hashes
  at the same position. Only (hash, pos, len) triples shuffle — never
  text.
* The rolling hash is polynomial: H_k = sum_{i<=k} d_i * B^(k-i)
  (mod 2^64), with d_i = blake2b-64 of the turn's "role\\x1e text"
  repr (hashed once per DISTINCT repr via dictionary-encode — the
  signatures.py idiom). Computed vectorized via H_k = B^k * S_k where
  S_k = segment-cumsum of d_i * Binv^i: B is odd, so Binv = B^-1 mod
  2^64 exists and every step is uint64 wraparound numpy arithmetic.
* Verification (the only stage that touches candidate text) filters
  the transcript table to candidate conversations FIRST — a broadcast
  ``pc.is_in`` below ``verify_broadcast_max`` distinct ids, a
  distributed semi-join above it — so assembled strings are
  candidate-bounded, not corpus-bounded. The final startswith check is
  a Python loop over CANDIDATE pairs only (same cost class as the LSH
  stage's verify step).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.stages.asof import _part_array
from raydedup.stages.ordered import _order_and_segments, assemble_by_key
from raydedup.util import join_partitions

# odd multiplier (64-bit golden ratio | 1) => invertible mod 2^64
_B = np.uint64(0x9E3779B97F4A7C15 | 1)
_BINV = np.uint64(pow(int(_B), -1, 1 << 64))

# unit separator between turns, record separator inside a turn's repr —
# neither occurs in natural transcript text, so "a is a turn-prefix of
# b" is exactly "assembled(b) starts with assembled(a) + \x1f"
_TURN_SEP = "\x1f"
_FIELD_SEP = "\x1e"

PAIR_SCHEMA = pa.schema([
    pa.field("conv_a", pa.string()),
    pa.field("conv_b", pa.string()),
    pa.field("prefix_len", pa.int64()),
    pa.field("full_match", pa.bool_()),
])


def _turn_repr(batch: pa.Table, text_cols: tuple[str, ...]) -> pa.Array:
    """role\\x1etext repr per row (order = text_cols order)."""
    parts = [pc.fill_null(pc.cast(batch[c], pa.string()), "")
             for c in text_cols]
    if len(parts) == 1:
        return parts[0].combine_chunks()
    return pc.binary_join_element_wise(*parts, _FIELD_SEP).combine_chunks()


def _digest64(arr: pa.Array) -> np.ndarray:
    """blake2b-64 per DISTINCT value + gather paint (signatures.py
    idiom: the Python hashing loop is bounded by batch cardinality,
    not row count)."""
    enc = pc.dictionary_encode(arr)
    dvals = enc.dictionary.to_pylist()
    dd = np.fromiter(
        (int.from_bytes(
            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(),
            "big") for s in dvals),
        dtype=np.uint64, count=len(dvals))
    idx = enc.indices.to_numpy(zero_copy_only=False)
    return dd[idx]


def _pow_tables(maxlen: int) -> tuple[np.ndarray, np.ndarray]:
    """B^k and Binv^k for k in [0, maxlen) — vectorized wraparound
    cumprod, no per-row Python."""
    bpow = np.empty(maxlen, dtype=np.uint64)
    binv = np.empty(maxlen, dtype=np.uint64)
    bpow[0] = binv[0] = np.uint64(1)
    if maxlen > 1:
        np.multiply.accumulate(
            np.full(maxlen - 1, _B, dtype=np.uint64), out=bpow[1:])
        np.multiply.accumulate(
            np.full(maxlen - 1, _BINV, dtype=np.uint64), out=binv[1:])
    return bpow, binv


def conv_prefix_hashes(ds, key_col: str = "conv_id",
                       order_col: str = "turn_idx",
                       text_cols: tuple[str, ...] = ("role", "text"),
                       num_partitions: int = 64):
    """One row per turn: (key, pos, prefix_hash, conv_len, is_last)
    where prefix_hash is the rolling hash of the conversation's first
    pos+1 turn reprs. The per-conversation sweep is the ordered.py
    partition sweep; all hash arithmetic is vectorized uint64."""

    def tag(batch: pa.Table) -> pa.Table:
        t = pa.table({key_col: batch[key_col],
                      order_col: batch[order_col],
                      "__repr": _turn_repr(batch, text_cols)})
        return t.append_column(
            "__part", _part_array(t[key_col], num_partitions))

    key_t = ds.schema().types[list(ds.schema().names).index(key_col)]

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__part" not in g.column_names:
            return pa.table({
                key_col: pa.array([], key_t),
                "pos": pa.array([], pa.int64()),
                "prefix_hash": pa.array([], pa.int64()),
                "conv_len": pa.array([], pa.int64()),
                "is_last": pa.array([], pa.bool_()),
            })
        order, starts, lens = _order_and_segments(g, key_col, [order_col])
        n = len(order)
        seg_start = np.repeat(starts, lens)
        k = np.arange(n, dtype=np.int64) - seg_start
        d = _digest64(g["__repr"].combine_chunks())[order]
        bpow, binv = _pow_tables(int(lens.max()))
        t = d * binv[k]                       # d_i * Binv^i  (uint64 wrap)
        c = np.cumsum(t)                      # wraps mod 2^64
        offset = np.repeat(c[starts] - t[starts], lens)
        h = bpow[k] * (c - offset)            # B^k * segment-cumsum
        oi = pa.array(order)
        return pa.table({
            key_col: g[key_col].take(oi),
            "pos": pa.array(k),
            "prefix_hash": pa.array(h.view(np.int64)),
            "conv_len": pa.array(np.repeat(lens, lens).astype(np.int64)),
            "is_last": pa.array(k == np.repeat(lens - 1, lens)),
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__part").map_groups(merge, batch_format="pyarrow"))


def _rename(ds, mapping: dict[str, str]):
    def ren(b: pa.Table) -> pa.Table:
        return b.rename_columns([mapping.get(c, c) for c in b.column_names])
    return ds.map_batches(ren, batch_format="pyarrow")


def prefix_containment_pairs(ds, key_col: str = "conv_id",
                             order_col: str = "turn_idx",
                             text_cols: tuple[str, ...] = ("role", "text"),
                             num_partitions: int = 64,
                             verify_broadcast_max: int = 2_000_000):
    """Pairs (conv_a, conv_b, prefix_len, full_match): conv_a's full
    turn sequence is a strict prefix of conv_b's (full_match=False), or
    the two sequences are identical and conv_a < conv_b
    (full_match=True). Text-verified exact output; see module docstring
    for the scale contract."""
    import ray.data

    ph = conv_prefix_hashes(ds, key_col, order_col, text_cols,
                            num_partitions).materialize()
    if ph.count() == 0:
        return ray.data.from_arrow(PAIR_SCHEMA.empty_table())

    full = _rename(
        ph.filter(expr="is_last == True")
          .select_columns([key_col, "pos", "prefix_hash"]),
        {key_col: "conv_a", "pos": "k", "prefix_hash": "h"})
    pref = _rename(
        ph.select_columns([key_col, "pos", "prefix_hash", "conv_len"]),
        {key_col: "conv_b", "pos": "k", "prefix_hash": "h",
         "conv_len": "b_len"})

    n_parts = join_partitions(ph.count())
    cand = full.join(pref, join_type="inner", num_partitions=n_parts,
                     on=("h", "k"))

    def keep(b: pa.Table) -> pa.Table:
        a_len = pc.add(b["k"], 1)
        strict = pc.greater(b["b_len"], a_len)
        fullm = pc.and_(pc.equal(b["b_len"], a_len),
                        pc.less(b["conv_a"], b["conv_b"]))
        m = pc.and_(pc.not_equal(b["conv_a"], b["conv_b"]),
                    pc.or_(strict, fullm))
        t = b.filter(m)
        return pa.table({
            "conv_a": t["conv_a"], "conv_b": t["conv_b"],
            "prefix_len": pc.add(t["k"], pa.scalar(1, pa.int64())),
            "full_match": pc.equal(t["b_len"], pc.add(t["k"], 1)),
        })

    cand = cand.map_batches(keep, batch_format="pyarrow").materialize()
    if cand.count() == 0:
        return ray.data.from_arrow(PAIR_SCHEMA.empty_table())

    # ---- verify against text, candidate-bounded --------------------
    ids = (cand.select_columns(["conv_a"]).union(
               _rename(cand.select_columns(["conv_b"]),
                       {"conv_b": "conv_a"}))
           .groupby("conv_a").count().select_columns(["conv_a"])
           .materialize())
    n_ids = ids.count()

    def reprcol(batch: pa.Table) -> pa.Table:
        return pa.table({key_col: batch[key_col],
                         order_col: batch[order_col],
                         "__repr": _turn_repr(batch, text_cols)})

    turns = ds.map_batches(reprcol, batch_format="pyarrow")
    if n_ids <= verify_broadcast_max:
        idset = pa.array([r["conv_a"] for r in ids.take_all()])

        def flt(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b[key_col], value_set=idset))

        turns = turns.map_batches(flt, batch_format="pyarrow")
    else:
        turns = turns.join(_rename(ids, {"conv_a": key_col}),
                           join_type="inner",
                           num_partitions=join_partitions(n_ids),
                           on=(key_col,))

    asm = assemble_by_key(turns, by=key_col, order_cols=[order_col],
                          text_col="__repr", sep=_TURN_SEP, out="__s")
    jp = join_partitions(max(n_ids, cand.count()))
    j = (cand.join(_rename(asm, {key_col: "conv_a", "__s": "__sa"}),
                   join_type="inner", num_partitions=jp, on=("conv_a",))
             .join(_rename(asm, {key_col: "conv_b", "__s": "__sb"}),
                   join_type="inner", num_partitions=jp, on=("conv_b",)))

    def verify(b: pa.Table) -> pa.Table:
        sa = b["__sa"].to_pylist()
        sb = b["__sb"].to_pylist()
        fm = b["full_match"].to_pylist()
        ok = pa.array([
            (x == y) if f else y.startswith(x + _TURN_SEP)
            for x, y, f in zip(sa, sb, fm)])
        t = b.filter(ok)
        return pa.table({c: t[c] for c in
                         ("conv_a", "conv_b", "prefix_len", "full_match")})

    out = j.map_batches(verify, batch_format="pyarrow").materialize()
    if out.count() == 0:
        return ray.data.from_arrow(PAIR_SCHEMA.empty_table())
    return out


def tool_sequence_clusters(ds, key_col: str = "conv_id",
                           order_col: str = "turn_idx",
                           tool_col: str = "tool",
                           num_partitions: int = 64):
    """(conv_id, cluster_id, cluster_size) for every conversation whose
    exact ordered tool-call sequence (empty/null tool turns skipped) is
    shared by >= 2 conversations; cluster_id = min conv_id of the
    cluster. Conversations with NO tool calls are excluded (an empty
    script is not a shared script). Grouping is on the literal joined
    sequence, so the result is exact; the sequence strings that shuffle
    are tool names only — orders of magnitude smaller than text."""
    import ray.data
    from ray.data.aggregate import Count, Min

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({key_col: b[key_col], order_col: b[order_col],
                      tool_col: b[tool_col]})
        m = pc.and_(pc.is_valid(t[tool_col]),
                    pc.not_equal(pc.fill_null(t[tool_col], ""), ""))
        return t.filter(m)

    empty = pa.schema([
        pa.field(key_col, pa.string()),
        pa.field("cluster_id", pa.string()),
        pa.field("cluster_size", pa.int64()),
    ]).empty_table()
    seqs = assemble_by_key(ds.map_batches(prep, batch_format="pyarrow"),
                           by=key_col, order_cols=[order_col],
                           text_col=tool_col, sep=",", out="tool_seq",
                           num_partitions=num_partitions).materialize()
    if seqs.count() == 0:
        # joining a fully-empty (schema-less, Ray 2.49) side crashes
        # the hash-join aggregator — short-circuit
        return ray.data.from_arrow(empty)
    agg = (seqs.groupby("tool_seq")
           .aggregate(Count(alias_name="cluster_size"),
                      Min(key_col, alias_name="cluster_id")))
    joined = seqs.join(agg, join_type="inner",
                       num_partitions=join_partitions(seqs.count()),
                       on=("tool_seq",))
    out = (joined.filter(expr="cluster_size >= 2")
           .select_columns([key_col, "cluster_id", "cluster_size"])
           .materialize())
    if out.count() == 0:
        return ray.data.from_arrow(empty)
    return out


def conv_divergence(ds, pairs, key_col: str = "conv_id",
                    order_col: str = "turn_idx",
                    text_cols: tuple[str, ...] = ("role", "text"),
                    num_partitions: int = 64):
    """Divergence analysis for conversation pairs: for every (conv_a,
    conv_b) row of ``pairs``, the length of the longest common TURN
    prefix (lcp — the turn index where a fork/retry diverged) plus both
    lengths. The agent-trace "where did the rerun go different" report,
    composable over any pair source (tool_sequence_clusters mates,
    near-dup cluster pairs, prefix_containment output).

    Execution: one prefix-hash row per turn (conv_prefix_hashes), then
    pairs ⋈ a-side rows on conv_a and an inner join to b-side rows on
    (conv_b, pos, hash) — prefix-hash equality at pos implies the first
    pos+1 turns are equal, so the per-pair MATCH COUNT is exactly the
    lcp. Work is linear in the total turns of paired conversations; no
    text ever shuffles. Equality is at 64-bit rolling-hash grain
    (collision odds ~2^-64 per compared position — same documented
    caveat as the simhash stages; downstream edits should re-verify
    text at the reported divergence turn if bit-certainty matters).

    Returns (conv_a, conv_b, lcp, a_len, b_len); pairs whose members
    share no prefix get lcp=0, pairs referencing unknown conv ids keep
    their row with null lengths (left-join semantics)."""
    import ray.data
    from ray.data.aggregate import Count

    ph = conv_prefix_hashes(ds, key_col, order_col, text_cols,
                            num_partitions).materialize()
    n_parts = join_partitions(max(ph.count(), 1))

    lens = _rename(
        ph.filter(expr="is_last == True")
          .select_columns([key_col, "conv_len"]),
        {key_col: "__k"})
    a_rows = _rename(ph.select_columns([key_col, "pos", "prefix_hash"]),
                     {key_col: "conv_a", "prefix_hash": "h"})
    b_rows = _rename(ph.select_columns([key_col, "pos", "prefix_hash"]),
                     {key_col: "conv_b", "prefix_hash": "h"})

    pairs = pairs.select_columns(["conv_a", "conv_b"]).materialize()
    np_pairs = join_partitions(max(pairs.count(), 1))
    matched = (pairs.join(a_rows, join_type="inner",
                          num_partitions=n_parts, on=("conv_a",))
               .join(b_rows, join_type="inner", num_partitions=n_parts,
                     on=("conv_b", "pos", "h")))
    lcp = (matched.groupby(["conv_a", "conv_b"])
           .aggregate(Count(alias_name="lcp")))

    out = pairs.join(lcp, join_type="left_outer",
                     num_partitions=np_pairs, on=("conv_a", "conv_b"))
    out = out.join(_rename(lens, {"__k": "conv_a",
                                  "conv_len": "a_len"}),
                   join_type="left_outer", num_partitions=np_pairs,
                   on=("conv_a",))
    out = out.join(_rename(lens, {"__k": "conv_b",
                                  "conv_len": "b_len"}),
                   join_type="left_outer", num_partitions=np_pairs,
                   on=("conv_b",))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "conv_a": b["conv_a"], "conv_b": b["conv_b"],
            "lcp": pc.cast(pc.fill_null(b["lcp"], 0), pa.int64()),
            "a_len": pc.cast(b["a_len"], pa.int64()),
            "b_len": pc.cast(b["b_len"], pa.int64()),
        })

    res = out.map_batches(finish, batch_format="pyarrow").materialize()
    if res.count() == 0:
        return ray.data.from_arrow(pa.schema([
            pa.field("conv_a", pa.string()),
            pa.field("conv_b", pa.string()),
            pa.field("lcp", pa.int64()),
            pa.field("a_len", pa.int64()),
            pa.field("b_len", pa.int64()),
        ]).empty_table())
    return res


def dedup_turns_within_conv(ds, key_col: str = "conv_id",
                            order_col: str = "turn_idx",
                            text_col: str = "text",
                            num_partitions: int = 32):
    """WITHIN-conversation turn dedup: for each conversation, keep only
    the FIRST occurrence (by ``order_col``) of each distinct turn text —
    the agent-loop repeated-message cleaner (retry storms, stuck tool
    loops, templated acknowledgements), the conversation-granularity
    twin of ``linededup.self_line_dedup``.

    Scale shape: the ``ordered.py`` partition sweep — conversations
    hash-partition once (only rows of the same conv must co-locate; a
    conversation's turns are tiny next to a partition), and ONE lexsort
    per partition handles every conversation in it: group key =
    (conv code, text code) from two dictionary_encodes, first-in-run
    selection by the (turn order)-sorted run starts. No per-conv Python
    call, no crypto hash — text identity within a partition is the
    dictionary code. NULL text folds to '' (mirror with coalesce in
    SQL).
    """
    schema = ds.schema()
    names = list(schema.names)
    types = dict(zip(schema.names, schema.types))

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _part_array(batch[key_col], num_partitions))

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__part" not in g.column_names:
            return pa.table({c: pa.array([], types[c]) for c in names})
        conv = pc.dictionary_encode(g[key_col].combine_chunks())
        txt = pc.dictionary_encode(
            pc.fill_null(g[text_col].combine_chunks(), ""))
        cc = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tc = txt.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        oi = g[order_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oi, tc, cc))
        sc, st = cc[order], tc[order]
        first = np.r_[True, (sc[1:] != sc[:-1]) | (st[1:] != st[:-1])]
        keep = pa.array(np.sort(order[first]))
        return pa.table({c: g[c].take(keep) for c in names})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__part").map_groups(merge, batch_format="pyarrow"))
