"""Exact long-span duplicate detection (suffix-array substring pass).

north_rule requirement: find pairs of rows sharing a verbatim span of at
least ``cfg.min_span_chars`` characters, collection-wide.

Two-phase Ray-Data design:

1. **Candidate generation via winnowing** (Schleimer/Wilkerson/Aiken,
   SIGMOD 2003): per-row rolling-hash k-gram fingerprints with window
   w = span - k + 1 guarantee that any shared substring of length >= span
   produces at least one IDENTICAL fingerprint on both sides. Exploding
   (fingerprint → row) and grouping by fingerprint is the shuffle; it
   moves 8-byte hashes, never text.
2. **Exact verification via suffix array**: candidate pairs re-read their
   two texts, build a suffix array + Kasai LCP over the sentinel-joined
   pair, and report the true longest common substring; pairs below the
   span threshold are dropped. (Suffix array by prefix doubling,
   O(n log n) numpy — public textbook algorithms.)

The verify step needs the pair's texts: the text store is broadcast once
via ``ray.put`` keyed by row_key (candidate sets are sparse; the 100 TB
path co-partitions pairs with a text checkpoint by key-range instead —
documented partitioning assumption).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

import ray

from raydedup.config import DedupConfig


def suffix_array(s: bytes) -> np.ndarray:
    """Prefix-doubling suffix array of ``s`` (uint8 view), O(n log n)."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    data = np.frombuffer(s, dtype=np.uint8)
    rank = data.astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        # sort by (rank[i], rank[i+k]) — vectorized radix via lexsort
        rank2 = np.full(n, -1, dtype=np.int64)
        rank2[: n - k] = rank[k:]
        sa = np.lexsort((rank2, rank))
        tmp[sa[0]] = 0
        prev = sa[:-1]
        cur = sa[1:]
        neq = (rank[cur] != rank[prev]) | (rank2[cur] != rank2[prev])
        tmp[cur] = np.cumsum(neq)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def lcp_array(s: bytes, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = longest common prefix of sa[i] and sa[i-1]."""
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring(a: str, b: str) -> int:
    """Exact LCS length of two strings via suffix array + LCP over the
    sentinel-joined concatenation."""
    ab = a.encode("utf-8")
    bb = b.encode("utf-8")
    if not ab or not bb:
        return 0
    joined = ab + b"\x00" + bb
    sa = suffix_array(joined)
    lcp = lcp_array(joined, sa)
    split = len(ab)
    best = 0
    sides = sa < split  # suffix starts in a?
    for i in range(1, len(sa)):
        if sides[i] != sides[i - 1]:
            # adjacent suffixes from different docs; cap at the distance
            # to the sentinel for the a-side suffix, else a NUL byte in
            # the text lets the common prefix run THROUGH the sentinel
            # and report a bogus cross-document span
            a_start = int(sa[i] if sides[i] else sa[i - 1])
            v = min(int(lcp[i]), split - a_start)
            if v > best:
                best = v
    return best


def _winnow_hashes(text: str, k: int, window: int) -> np.ndarray:
    """Scalar REFERENCE winnowing (kept as the parity oracle for
    ``_winnow_hashes_batch``): k-gram polynomial hashes, sliding-window
    minima, per-row distinct."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if data.size < k:
        return np.empty(0, dtype=np.uint64)
    B = np.uint64(1000003)
    powers = B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    n = data.size - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h += data[j : j + n].astype(np.uint64) * powers[j]
    if h.size <= window:
        return np.unique(h.min(keepdims=True))
    w = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(w.min(axis=1))


def _sliding_min(h: np.ndarray, w: int) -> np.ndarray:
    """Sliding-window minimum (length ``len(h) - w + 1``) via sparse-table
    doubling — O(n log w), not the O(n·w) ``sliding_window_view`` reduce
    (w is ~150 at the default span)."""
    n = h.size
    if w <= 1:
        return h
    p = 1
    st = h
    while p * 2 <= w:
        st = np.minimum(st[: st.size - p], st[p:])
        p *= 2
    # st[i] = min h[i : i+p] with w/2 < p <= w: window [i, i+w) =
    # [i, i+p) ∪ [i+w-p, i+w)
    m = n - w + 1
    return np.minimum(st[:m], st[w - p : w - p + m])


_WINNOW_B = 1000003
_WINNOW_BINV = pow(_WINNOW_B, -1, 1 << 64)  # B is odd ⇒ invertible mod 2^64


def _rolling_kgram_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """All k-gram polynomial hashes of a byte buffer in O(1) passes per
    byte (vs k passes for the naive powers loop — the measured
    bandwidth bound): with P[i] = Σ_{t<i} data[t]·B^{-t} (mod 2^64),
    h[i] = (P[i+k] − P[i])·B^{i+k-1}. All uint64 arithmetic wraps mod
    2^64 and B^{-1} is the exact modular inverse, so the values are
    bit-identical to Σ data[i+j]·B^{k-1-j}."""
    n = data.size
    n_pos = n - k + 1
    binv = np.uint64(_WINNOW_BINV)
    binv_pow = np.empty(n, dtype=np.uint64)
    binv_pow[0] = 1
    np.cumprod(np.full(n - 1, binv, dtype=np.uint64), out=binv_pow[1:])
    w = data.astype(np.uint64)
    w *= binv_pow
    P = np.empty(n + 1, dtype=np.uint64)
    P[0] = 0
    np.cumsum(w, out=P[1:])
    h = P[k:] - P[:-k]  # uint64 wraparound subtraction is exact mod 2^64
    bpow = np.full(n_pos, _WINNOW_B, dtype=np.uint64)
    bpow[0] = np.uint64(pow(_WINNOW_B, k - 1, 1 << 64))
    np.cumprod(bpow, out=bpow)
    h *= bpow
    return h


def _winnow_hashes_batch(col, k: int, window: int):
    """→ (row_idx int64, fps uint64): per-row DISTINCT winnowing
    fingerprints for a whole string column at once.

    One O(1)-per-byte rolling-hash pass over the column's CONCATENATED
    utf-8 data buffer (zero-copy — Arrow already stores the batch that
    way), one O(n log w) sparse-table sliding min, then a run-compressed
    keeper mask (adjacent sliding-min values repeat for up to ``window``
    positions, so consecutive-dup removal drops ~98% of positions before
    the exact per-row distinct); cross-row k-grams are never selected
    because each row's valid positions are bounded by its own offsets.
    Bit-identical to ``_winnow_hashes`` per row (property-tested)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    n_rows = len(col)
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    if n_rows == 0:
        return empty
    if pa.types.is_large_string(col.type):
        off_dt = np.int64
    else:
        off_dt = np.int32
    off = np.frombuffer(col.buffers()[1], dtype=off_dt)[
        col.offset : col.offset + n_rows + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    starts, lens = off[:-1], np.diff(off)
    n_pos = int(off[-1]) - k + 1
    n_hashes = lens - k + 1  # per row; <= 0 ⇒ no fingerprints
    if n_pos <= 0 or not (n_hashes > 0).any():
        return empty
    h = _rolling_kgram_hashes(data[: int(off[-1])], k)

    rids, vals = [], []
    short = (n_hashes > 0) & (n_hashes <= window)
    if short.any():
        s = starts[short]
        e = s + n_hashes[short]
        hp = np.r_[h, np.uint64(0)]  # reduceat end index may equal len(h)
        mins = np.minimum.reduceat(hp, np.c_[s, e].ravel())[::2]
        rids.append(np.flatnonzero(short))
        vals.append(mins)
    long_rows = np.flatnonzero(n_hashes > window)
    if long_rows.size:
        sm = _sliding_min(h, window)
        m = sm.size
        s_l = starts[long_rows]
        c_l = n_hashes[long_rows] - window + 1
        dv = np.zeros(m + 1, dtype=np.int64)
        dv[s_l] += 1          # row ranges are disjoint ⇒ plain fancy
        dv[s_l + c_l] -= 1    # assignment, no add.at needed
        valid = np.cumsum(dv[:m]) > 0
        chg = np.empty(m, dtype=bool)
        chg[0] = True
        np.not_equal(sm[1:], sm[:-1], out=chg[1:])
        chg[s_l] = True       # a row's first position is always a keeper
        posk = np.flatnonzero(valid & chg)
        vals.append(sm[posk])
        rids.append(long_rows[np.searchsorted(s_l, posk, side="right") - 1])
    rid = np.concatenate(rids)
    val = np.concatenate(vals)
    # exact per-row distinct over the run-compressed remainder
    order = np.lexsort((val, rid))
    rid, val = rid[order], val[order]
    keep = np.r_[True, (rid[1:] != rid[:-1]) | (val[1:] != val[:-1])]
    return rid[keep], val[keep]


_EMPTY_SPAN_TABLE = pa.table(
    {"a_key": pa.array([], type=pa.string()),
     "b_key": pa.array([], type=pa.string()),
     "span_len": pa.array([], type=pa.int64())}
)

_EMPTY_SPAN_TABLE_S = pa.table(
    {"a_key": pa.array([], type=pa.string()),
     "b_key": pa.array([], type=pa.string()),
     "span_len": pa.array([], type=pa.int64()),
     "span": pa.array([], type=pa.string())}
)


def lcs_string(a: str, b: str) -> str:
    """The longest common substring ITSELF (not just its length):
    suffix array + LCP over the sentinel-joined UTF-8 concatenation,
    deterministic tie-break = lexicographically smallest among the
    maximal-length candidates (adjacent different-side SA entries scan
    in lexicographic suffix order; strict ``>`` keeps the first).
    The byte span is snapped inward to UTF-8 character boundaries
    before decoding (byte-level matching can clip a multibyte char at
    either edge; ASCII spans are unaffected)."""
    ab = a.encode("utf-8")
    bb = b.encode("utf-8")
    if not ab or not bb:
        return ""
    joined = ab + b"\x00" + bb
    sa = suffix_array(joined)
    lcp = lcp_array(joined, sa)
    split = len(ab)
    best = 0
    pos = -1
    sides = sa < split
    for i in range(1, len(sa)):
        if sides[i] != sides[i - 1]:
            # cap at the a-side suffix's distance to the sentinel (see
            # longest_common_substring) so NUL-bearing text can't yield
            # a "span" that crosses the document boundary
            a_start = int(sa[i] if sides[i] else sa[i - 1])
            v = min(int(lcp[i]), split - a_start)
            if v > best:
                best = v
                pos = a_start
    if best <= 0:
        return ""
    raw = joined[pos:pos + best]
    # a byte-exact slice of valid UTF-8 can only be malformed at its
    # edges; errors="ignore" drops exactly those partial sequences
    return raw.decode("utf-8", errors="ignore")


def _candidate_pairs_sweep(exploded, key_col: str, cap: int,
                           n_exploded: int,
                           num_partitions: int | None):
    """(fp, key) rows → candidate (a_key, b_key) pairs in ONE partition
    sweep (the setjoin.set_similarity_join_sets idiom): fingerprints
    hash-partition once, one map_groups call per PARTITION walks its
    fingerprint runs and applies the member logic — full m²/2 pairs at
    or below ``cap`` members, the rotated linear chain above it (the
    documented hot-fingerprint budget; rotation offset = fp % m exactly
    as before). Replaces the former repeated-fp counting groupby →
    singleton-drop semi-join → per-fp groupby chain: one all-to-all
    over the winnowed fingerprint table — the stage's largest
    intermediate — instead of three, and singleton fingerprints cost a
    run-length row, not a Python call."""
    from raydedup.stages.asof import _part_array

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_sweep = num_partitions or max(
        2 * ncpu, n_exploded // 500_000 + 1)  # no ceiling: ~500k rows/part

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column("__part", _part_array(b["fp"], n_sweep))

    def sweep(group: pa.Table) -> pa.Table:
        empty = pa.table({"a_key": pa.array([], type=pa.string()),
                          "b_key": pa.array([], type=pa.string())})
        m = group.num_rows
        if m < 2 or "fp" not in group.column_names:
            return empty
        fps = group["fp"].to_numpy(zero_copy_only=False)
        keys = group[key_col].to_pylist()
        order = np.argsort(fps, kind="stable")
        f_s = fps[order]
        starts = np.flatnonzero(np.r_[True, f_s[1:] != f_s[:-1]])
        ends = np.r_[starts[1:], m]
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ks = sorted({keys[i] for i in order[s:e]})
            mm = len(ks)
            if mm < 2:
                continue
            if mm > cap:
                off = int(f_s[s]) % mm
                rot = ks[off:] + ks[:off]
                for x, y in zip(rot, rot[1:]):
                    a, b = (x, y) if x < y else (y, x)
                    a_out.append(a)
                    b_out.append(b)
            else:
                for i in range(mm):
                    for j in range(i + 1, mm):
                        a_out.append(ks[i])
                        b_out.append(ks[j])
        if not a_out:
            return empty
        return pa.table({"a_key": pa.array(a_out, type=pa.string()),
                         "b_key": pa.array(b_out, type=pa.string())})

    return (exploded.map_batches(add_part, batch_format="pyarrow")
            .groupby("__part").map_groups(sweep, batch_format="pyarrow"))


def long_span_pairs(ds, cfg: DedupConfig, k: int = 48,
                    text_col: str = "text", key_col: str = "row_key",
                    fp_member_cap: int | None = None,
                    num_partitions: int | None = None,
                    checkpoint_dir: str | None = None,
                    emit_span: bool = False):
    """→ Dataset(a_key, b_key, span_len) for pairs sharing a verbatim span
    of >= cfg.min_span_chars characters. Winnowing guarantee: detection is
    exact for spans >= window + k - 1 == min_span_chars.

    Fully distributed: candidate pairs stay a Dataset (groupby-distinct,
    never a driver set) and the verify stage receives both texts through
    two hash joins on the pair keys — no driver text broadcast. Hot
    fingerprints (boilerplate shared by m >> 2 rows would generate m²/2
    candidates EACH) are bounded by ``cfg.suffix_fp_member_cap`` members
    per fingerprint, sampled by a per-fingerprint rotation so different
    fingerprints sample different member subsets — a pair is missed only
    if it shares NO fingerprint where both members fall inside the cap;
    boilerplate families share hundreds of fingerprints, so connectivity
    survives (asserted by the hot-boilerplate test). Small corpora never
    hit the cap ⇒ exact (the SQL-oracled driver query stays hash-green).
    """
    span = cfg.min_span_chars
    empty_tbl = _EMPTY_SPAN_TABLE_S if emit_span else _EMPTY_SPAN_TABLE
    window = span - k + 1
    assert window >= 1, "min_span_chars must exceed k-gram size"
    cap = fp_member_cap or getattr(cfg, "suffix_fp_member_cap", 64)

    def fp(batch: pa.Table) -> pa.Table:
        rid, val = _winnow_hashes_batch(batch[text_col], k, window)
        return pa.table(
            {
                "fp": pa.array(val.view(np.int64)),
                key_col: batch[key_col].combine_chunks().take(
                    pa.array(rid)),
            }
        )

    exploded = ds.map_batches(fp, batch_format="pyarrow").materialize()
    n_exploded = exploded.count()
    if n_exploded == 0:
        return ray.data.from_arrow(empty_tbl)

    # candidate generation: one partition sweep with the hot-fingerprint
    # rotation budget — see _candidate_pairs_sweep
    candidates = _candidate_pairs_sweep(exploded, key_col, cap,
                                        n_exploded, num_partitions)

    # distributed distinct: one row per (a_key, b_key) via the NATIVE
    # grouped count (vectorized sort-shuffle — a map_groups first-row
    # scan pays a Python call per candidate pair)
    from raydedup.util import join_partitions

    pairs = candidates.groupby(["a_key", "b_key"]).count().drop_columns(
        ["count()"]
    ).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(empty_tbl)

    # per-stage pair checkpoint (north_rule resumability; also restores a
    # schema-bearing lineage — Ray 2.49's hash join mishandles empty
    # partitions fed by map_groups/join outputs, see util.join_partitions).
    # ``checkpoint_dir`` must be storage every node can read (shared FS /
    # object store URI) on a multi-node cluster; when None, a node-local
    # temp dir is used, the re-read is materialized (pair sets are the
    # sparse survivors, orders smaller than the corpus), and the dir is
    # removed — leaving it behind leaked the full pair set per call.
    import shutil
    import tempfile

    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="spanpairs_", dir="/tmp")
    pairs.write_parquet(ckpt)
    pairs = ray.data.read_parquet(ckpt)
    if checkpoint_dir is None:
        pairs = pairs.materialize()
        shutil.rmtree(ckpt, ignore_errors=True)

    # attach both texts with ONE join: explode each pair to two
    # (join_key, pid, side) rows, join against the text table, then
    # reassemble per pid — texts co-partition with the pairs, nothing
    # lands on the driver.

    jp = join_partitions(2 * n_pairs)

    def explode_pairs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pid = pc.binary_join_element_wise(batch["a_key"], batch["b_key"], "\x1f")
        return pa.table(
            {
                "join_key": pa.concat_arrays(
                    [batch["a_key"].combine_chunks(),
                     batch["b_key"].combine_chunks()]
                ),
                "pid": pa.concat_arrays([pid.combine_chunks()] * 2),
                "side": pa.array(
                    [0] * batch.num_rows + [1] * batch.num_rows,
                    type=pa.int32(),
                ),
            }
        )

    exp = pairs.map_batches(explode_pairs, batch_format="pyarrow")

    def as_key(batch: pa.Table) -> pa.Table:
        return pa.table({"join_key": batch[key_col], "t": batch[text_col]})

    texts = ds.map_batches(as_key, batch_format="pyarrow")
    joined = exp.join(texts, join_type="inner", num_partitions=jp,
                      on=("join_key",))

    def reassemble(group: pa.Table) -> pa.Table:
        sides = group["side"].to_pylist()
        keys = group["join_key"].to_pylist()
        txts = group["t"].to_pylist()
        a = b = None
        ta = tb = ""
        for s, kk, tt in zip(sides, keys, txts):
            if s == 0:
                a, ta = kk, tt
            else:
                b, tb = kk, tt
        if a is None or b is None:
            return empty_tbl
        if emit_span:
            s = lcs_string(ta or "", tb or "")
            lcs = len((s or "").encode("utf-8"))
            if lcs < span:
                return empty_tbl
            return pa.table(
                {"a_key": pa.array([a], type=pa.string()),
                 "b_key": pa.array([b], type=pa.string()),
                 "span_len": pa.array([lcs], type=pa.int64()),
                 "span": pa.array([s], type=pa.string())}
            )
        lcs = longest_common_substring(ta or "", tb or "")
        if lcs < span:
            return empty_tbl
        return pa.table(
            {"a_key": pa.array([a], type=pa.string()),
             "b_key": pa.array([b], type=pa.string()),
             "span_len": pa.array([lcs], type=pa.int64())}
        )

    return joined.groupby("pid").map_groups(reassemble, batch_format="pyarrow")


def remove_dup_spans(ds, cfg: DedupConfig, k: int = 48,
                     text_col: str = "text", key_col: str = "row_key",
                     num_partitions: int | None = None,
                     rounds: int = 1,
                     fp_member_cap: int | None = None):
    """→ Dataset(key, text, n_removed): long-span duplicate REMOVAL
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better" — the deduplicate-text-datasets pass, public). Per
    round: for every detected pair of rows sharing a verbatim span >=
    ``cfg.min_span_chars`` characters, ALL occurrences of the pair's
    CANONICAL span (the longest common substring, lexicographically
    smallest on length ties — :func:`lcs_string`) are cut from the
    larger-keyed row, until-fixpoint per span so a cut boundary cannot
    re-form it; the smallest-keyed row keeps its text. A victim of
    several pairs has each span removed longest-first. ``n_removed`` =
    total characters deleted across rounds.

    One round removes one (the longest) span per pair — a pair sharing
    a SECOND disjoint span >= min_span_chars still shares it after
    round 1. ``rounds > 1`` re-runs detection on the edited texts and
    keeps going until a round finds no pairs (early exit) or the
    budget is spent: each extra round is a full detection pass, priced
    openly rather than hidden. Residual caveats: Lee et al. remove
    every maximal duplicated substring in one suffix-array-over-the-
    corpus pass; this operator converges to that fixpoint pairwise.
    Very large boilerplate families are subject to ``long_span_pairs``'
    documented hot-fingerprint pair cap (``fp_member_cap``, default
    ``cfg.suffix_fp_member_cap``) — members whose chain edges are all
    capped away can keep the span; raise the cap (or run more rounds,
    each round re-chains differently as texts shrink) when exhaustive
    family coverage matters more than the pair budget.

    Scale shape: detection is :func:`long_span_pairs` (winnowing →
    fingerprint-groupby shuffle → per-pair suffix-array verify, hashes
    not text on the wire) with ``emit_span=True``; the victim → span
    list table is sparse (pairs are survivors of the span threshold),
    joins back via one distributed hash join sized by the SMALL side,
    and untouched rows stream through the mask path with zero Python
    per row. Each round's doubly-consumed lineage is materialized once.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    out = _remove_dup_spans_round(ds, cfg, k, text_col, key_col,
                                  num_partitions, fp_member_cap)
    for _ in range(rounds - 1):
        prev = out.materialize()
        nxt = _remove_dup_spans_round(prev, cfg, k, text_col, key_col,
                                      num_partitions,
                                      fp_member_cap).materialize()
        if nxt.filter(expr="n_removed > 0").count() == 0:
            return prev  # fixpoint: this round cut nothing
        out = _fold_removed(prev, nxt, key_col, text_col)
    return out


def _fold_removed(prev, nxt, key_col: str, text_col: str):
    """Combine a later round's (key, text, n_removed) with the running
    totals: text from the new round, n_removed summed. Both sides are
    keyed identically (same rows), so one hash join suffices."""
    from raydedup.util import join_partitions

    n = prev.count()
    right = nxt.map_batches(
        lambda b: pa.table({key_col: b[key_col],
                            "__t2": b[text_col],
                            "__r2": b["n_removed"]}),
        batch_format="pyarrow")
    joined = prev.join(right, join_type="inner",
                       num_partitions=join_partitions(n),
                       on=(key_col,))

    import pyarrow.compute as pc

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({key_col: b[key_col],
                         text_col: b["__t2"],
                         "n_removed": pc.add(b["n_removed"], b["__r2"])})

    return joined.map_batches(fin, batch_format="pyarrow")


def _remove_dup_spans_round(ds, cfg: DedupConfig, k: int,
                            text_col: str, key_col: str,
                            num_partitions: int | None,
                            fp_member_cap: int | None):
    from ray.data import from_arrow

    from raydedup.util import join_partitions

    slim = ds.select_columns([key_col, text_col]).materialize()
    schema = slim.schema()
    if schema is None:
        return from_arrow(pa.table({
            key_col: pa.array([], pa.string()),
            text_col: pa.array([], pa.string()),
            "n_removed": pa.array([], pa.int64())}))
    key_type = schema.types[schema.names.index(key_col)]

    def untouched(batch: pa.Table) -> pa.Table:
        return pa.table({key_col: batch[key_col],
                         text_col: batch[text_col],
                         "n_removed": pa.array(
                             np.zeros(batch.num_rows, np.int64))})

    pairs = long_span_pairs(slim, cfg, k=k, text_col=text_col,
                            key_col=key_col, emit_span=True,
                            num_partitions=num_partitions,
                            fp_member_cap=fp_member_cap)

    def victim_rows(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "span" not in g.column_names:
            return pa.table({key_col: pa.array([], key_type),
                             "__spans": pa.array([], pa.string())})
        # length-prefixed concatenation ("<len>:<span>...") — join
        # payloads must be flat strings (Acero rejects list columns)
        # and no separator byte is safe inside arbitrary span text
        spans = sorted(set(g["span"].to_pylist()))
        enc = "".join(f"{len(s)}:{s}" for s in spans)
        return pa.table({key_col: g["b_key"][:1].cast(key_type),
                         "__spans": pa.array([enc], pa.string())})

    vic = pairs.groupby("b_key").map_groups(
        victim_rows, batch_format="pyarrow").materialize()
    n_vic = vic.count()
    if n_vic == 0:
        return slim.map_batches(untouched, batch_format="pyarrow")

    joined = slim.join(vic, join_type="left_outer",
                       num_partitions=join_partitions(n_vic),
                       on=(key_col,))

    def apply(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key_col: pa.array([], key_type),
                             text_col: pa.array([], pa.string()),
                             "n_removed": pa.array([], pa.int64())})
        import pyarrow.compute as pc

        has = pc.is_valid(batch["__spans"]).to_numpy(
            zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        spans = batch["__spans"].to_pylist()
        out = list(texts)
        removed = np.zeros(batch.num_rows, np.int64)
        for i in np.flatnonzero(has):
            t = texts[i] or ""
            enc, pos, sp = spans[i], 0, []
            while pos < len(enc):
                c = enc.index(":", pos)
                ln = int(enc[pos:c])
                sp.append(enc[c + 1:c + 1 + ln])
                pos = c + 1 + ln
            new = t
            for s in sorted(sp, key=lambda x: (-len(x), x)):
                # until-fixpoint: one replace() pass can let the span
                # RE-FORM across a cut boundary (victim 'aa..bb..'
                # around a keeper 'a..b' span); each pass strictly
                # shortens, so this terminates
                while s and s in new:
                    new = new.replace(s, "")
            out[i] = new
            removed[i] = len(t) - len(new)
        return pa.table({key_col: batch[key_col],
                         text_col: pa.array(out, pa.string()),
                         "n_removed": pa.array(removed)})

    return joined.map_batches(apply, batch_format="pyarrow")


_EMPTY_CONTAIN_TABLE = pa.table(
    {"inner_key": pa.array([], type=pa.string()),
     "outer_key": pa.array([], type=pa.string()),
     "inner_len": pa.array([], type=pa.int64())}
)


def containment_pairs(ds, k: int = 16, window: int = 48,
                      key_col: str = "row_key", text_col: str = "text",
                      fp_member_cap: int = 64,
                      num_partitions: int | None = None):
    """Strict document CONTAINMENT pairs: (inner_key, outer_key,
    inner_len) where the inner row's full text occurs verbatim inside a
    strictly longer outer text — quote extraction, chunk re-ingestion
    and snippet leakage, the whole-document case of the span pass.

    Exactness: a contained text of >= ``window + k - 1`` bytes shares at
    least one selected winnowing fingerprint with its container
    (Schleimer et al. 2003's detection guarantee applied to the inner
    text itself), so fingerprint-bucket candidates have perfect recall;
    verification is an exact substring check, so precision is 1 by
    construction. Rows shorter than the guarantee threshold are
    excluded from the INNER side (documented contract — they can still
    act as containers). Equal texts are exact duplicates, not
    containment, and are excluded (inner is strictly shorter).

    Scale shape mirrors ``long_span_pairs``: per-batch whole-column
    winnowing (``_winnow_hashes_batch``), singleton fingerprints dropped
    by a counting semi-join BEFORE any Python call, hot fingerprints
    bounded by the same rotated-chain linear budget (recall caveat only
    above the cap; small corpora stay exact, which keeps the SQL oracle
    hash-green), pairs stay a Dataset, and both texts attach through ONE
    pair-exploded hash join. The verify is a candidate-bounded exact
    substring check per pair (C-level ``str.__contains__``), not a
    corpus-scale loop.
    """
    t_min = window + k - 1
    empty_tbl = _EMPTY_CONTAIN_TABLE

    def fp(batch: pa.Table) -> pa.Table:
        rid, val = _winnow_hashes_batch(batch[text_col], k, window)
        return pa.table(
            {"fp": pa.array(val.view(np.int64)),
             key_col: batch[key_col].combine_chunks().take(pa.array(rid))}
        )

    from raydedup.util import join_partitions

    exploded = ds.map_batches(fp, batch_format="pyarrow").materialize()
    n_exploded = exploded.count()
    if n_exploded == 0:
        return ray.data.from_arrow(empty_tbl)

    candidates = _candidate_pairs_sweep(exploded, key_col, fp_member_cap,
                                        n_exploded, num_partitions)
    pairs = candidates.groupby(["a_key", "b_key"]).count().drop_columns(
        ["count()"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(empty_tbl)

    jp = join_partitions(2 * n_pairs)

    def explode_pairs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pid = pc.binary_join_element_wise(batch["a_key"], batch["b_key"],
                                          "\x1f")
        return pa.table(
            {"join_key": pa.concat_arrays(
                 [batch["a_key"].combine_chunks(),
                  batch["b_key"].combine_chunks()]),
             "pid": pa.concat_arrays([pid.combine_chunks()] * 2),
             "side": pa.array([0] * batch.num_rows + [1] * batch.num_rows,
                              type=pa.int32())}
        )

    exp = pairs.map_batches(explode_pairs, batch_format="pyarrow")

    def as_key(batch: pa.Table) -> pa.Table:
        return pa.table({"join_key": batch[key_col], "t": batch[text_col]})

    texts = ds.map_batches(as_key, batch_format="pyarrow")
    joined = exp.join(texts, join_type="inner", num_partitions=jp,
                      on=("join_key",))

    def verify(group: pa.Table) -> pa.Table:
        a = b = None
        ta = tb = ""
        for s, kk, tt in zip(group["side"].to_pylist(),
                             group["join_key"].to_pylist(),
                             group["t"].to_pylist()):
            if s == 0:
                a, ta = kk, tt or ""
            else:
                b, tb = kk, tt or ""
        if a is None or b is None:
            return empty_tbl
        la, lb = len(ta), len(tb)
        inner = outer = None
        if la < lb and la >= t_min and ta in tb:
            inner, outer, li = a, b, la
        elif lb < la and lb >= t_min and tb in ta:
            inner, outer, li = b, a, lb
        if inner is None:
            return empty_tbl
        return pa.table(
            {"inner_key": pa.array([inner], type=pa.string()),
             "outer_key": pa.array([outer], type=pa.string()),
             "inner_len": pa.array([li], type=pa.int64())}
        )

    return joined.groupby("pid").map_groups(verify, batch_format="pyarrow")
