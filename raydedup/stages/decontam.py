"""Benchmark decontamination — flag or drop training documents that share
any word n-gram with a held-out evaluation set.

The standard training-data hygiene step (publicly described for GPT-3 and
The Pile: 13-gram / n-gram overlap against benchmark text; parameters are
configurable here). Ray-Data shape: the benchmark side is SMALL by
definition, so its distinct n-grams are collected once, broadcast via
``ray.put``, and every corpus batch probes them with ``pc.is_in`` — a
broadcast semi-join, no shuffle, the same pattern as the anchor-measure
broadcast. At 100 TB the corpus streams; only the benchmark n-gram set
(bounded by benchmark size, not corpus size) must fit in the object store.

No reference analogue (new-engine training-data operator, task brief).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

_WORD_RE = re.compile(r"[0-9a-zA-Z_]+")

# per-worker cache of the rebuilt value_set StringArray, keyed by the
# broadcast ObjectRef id (the payload itself is a plain python list).
# Size-1: one benchmark is live per run; unbounded ref-keyed growth would
# pin one benchmark-sized array per call in long-lived workers.
_BENCH_CACHE: dict[bytes, pa.Array] = {}


def _ngrams(text: str, n: int) -> list[str]:
    toks = _WORD_RE.findall(text.lower())
    if len(toks) < n:
        return []
    return [" ".join(toks[i: i + n]) for i in range(len(toks) - n + 1)]


def benchmark_ngram_ref(bench_ds, n: int = 8, text_col: str = "text"):
    """Distinct n-grams of the (small) benchmark dataset as a broadcast
    ref: per-batch distinct extraction in parallel, driver union (the
    result is benchmark-sized, not corpus-sized)."""
    import ray

    def extract(batch: pa.Table) -> pa.Table:
        grams: set[str] = set()
        for t in batch[text_col].to_pylist():
            if t:
                grams.update(_ngrams(t, n))
        return pa.table({"gm": pa.array(sorted(grams), type=pa.string())})

    grams: set[str] = set()
    for b in bench_ds.map_batches(
        extract, batch_format="pyarrow"
    ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        grams.update(b["gm"].to_pylist())
    return ray.put(sorted(grams))


def decontaminate(ds, bench_ds, n: int = 8, text_col: str = "text",
                  drop: bool = False):
    """corpus × benchmark n-gram overlap: appends ``contaminated`` (bool)
    and ``n_hit`` (int64, count of DISTINCT shared n-grams) per row;
    ``drop=True`` filters contaminated rows instead of flagging them."""
    import ray

    gram_ref = benchmark_ngram_ref(bench_ds, n, text_col)

    def bench_arr() -> pa.Array:
        key = gram_ref.binary()
        arr = _BENCH_CACHE.get(key)
        if arr is None:
            arr = pa.array(ray.get(gram_ref), type=pa.string())
            _BENCH_CACHE.clear()
            _BENCH_CACHE[key] = arr
        return arr

    def flag(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch[text_col].to_pylist()]
        per_row = [sorted(set(_ngrams(t, n))) for t in texts]
        lens = np.fromiter((len(g) for g in per_row), dtype=np.int64,
                           count=len(per_row))
        flat = pa.array([g for gs in per_row for g in gs], type=pa.string())
        arr = bench_arr()
        if len(arr) and len(flat):
            hit = pc.is_in(flat, value_set=arr).to_numpy(
                zero_copy_only=False).astype(np.int64)
            row_ids = np.repeat(np.arange(len(per_row)), lens)
            n_hit = np.bincount(row_ids, weights=hit,
                                minlength=len(per_row)).astype(np.int64)
        else:
            n_hit = np.zeros(len(per_row), dtype=np.int64)
        out = pa.table(
            {**{c: batch[c] for c in batch.column_names},
             "contaminated": pa.array(n_hit > 0),
             "n_hit": pa.array(n_hit)}
        )
        if drop:
            out = out.filter(pc.equal(out["contaminated"], False))
            out = out.drop_columns(["contaminated", "n_hit"])
        return out

    return ds.map_batches(flag, batch_format="pyarrow")


# per-worker cache of the broadcast {sha: [ref keys]} map
_XC_CACHE: dict[bytes, dict] = {}


def cross_corpus_exact_matches(ds, ref_ds, ref_key_col: str,
                               text_col: str = "text",
                               ref_text_col: str = "text",
                               out_col: str | None = None):
    """For every row of the (large, streaming) ``ds``, emit one output
    row per ref row with BYTE-IDENTICAL text — cross-corpus exact
    contamination (train rows duplicating a held-out/benchmark set), the
    exact-match complement of n-gram ``decontaminate``.

    The ref side is small by definition: its {sha256(text): [keys]} map
    is collected once (iter_batches, never a full materialize of ds) and
    broadcast via ``ray.put``; the corpus streams through one
    ``map_batches``, no shuffle. Many-to-many: duplicated ref texts
    yield one output row per matching ref key."""
    import hashlib

    import ray

    out_col = out_col or f"ref_{ref_key_col}"
    if out_col in ds.schema().names:
        raise ValueError(f"output column {out_col!r} collides with input")

    ref_map: dict[str, list] = {}
    for b in ref_ds.select_columns([ref_key_col, ref_text_col]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        for k, t in zip(b[ref_key_col].to_pylist(),
                        b[ref_text_col].to_pylist()):
            if t:
                sha = hashlib.sha256(t.encode("utf-8")).hexdigest()
                ref_map.setdefault(sha, []).append(k)
    ref_ref = ray.put(ref_map)
    key_type = ref_ds.schema().types[
        ref_ds.schema().names.index(ref_key_col)]

    def match(batch: pa.Table) -> pa.Table:
        ck = ref_ref.binary()
        lut = _XC_CACHE.get(ck)
        if lut is None:
            lut = ray.get(ref_ref)
            _XC_CACHE.clear()
            _XC_CACHE[ck] = lut
        rows: list[int] = []
        keys: list = []
        for i, t in enumerate(batch[text_col].to_pylist()):
            if not t:
                continue
            hits = lut.get(hashlib.sha256(t.encode("utf-8")).hexdigest())
            if hits:
                for k in hits:
                    rows.append(i)
                    keys.append(k)
        idx = pa.array(rows, pa.int64())
        cols = {c: batch[c].take(idx) for c in batch.column_names
                if c != text_col}
        cols[out_col] = pa.array(keys, key_type)
        return pa.table(cols)

    return ds.map_batches(match, batch_format="pyarrow")


# per-worker cache of the broadcast duplicated-gram array
_DUP_CACHE: dict[bytes, pa.Array] = {}


def ngram_novelty(ds, n: int = 3, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Inter-document redundancy score: per doc, the count of its
    DISTINCT word n-grams (``n_grams``) and how many of those appear in
    at least one OTHER doc (``n_shared``) — the corpus-level complement
    of the intra-doc repetition_stats. Integer outputs keep the oracle
    float-free; novelty = 1 - n_shared/n_grams is one division away.

    Scale shape: gram document-frequencies reduce from per-batch
    distinct-gram partials through a gram-keyed groupby (the irreducible
    exchange); only grams with df >= 2 — bounded by cross-doc
    duplication, not corpus size — broadcast back for the streaming
    pc.is_in scoring pass (same dup-only-broadcast idea as exact dedup's
    duplicate map). Docs with fewer than ``n`` tokens emit nothing
    (they have no n-grams, matching the SQL)."""
    import ray

    from ray.data.aggregate import Sum

    def partial_df(batch: pa.Table) -> pa.Table:
        grams: list[str] = []
        for t in batch[text_col].to_pylist():
            if t:
                grams.extend(set(_ngrams(t, n)))
        if not grams:
            return pa.table({"gm": pa.array([], pa.string()),
                             "d": pa.array([], pa.int64())})
        vc = pc.value_counts(pa.array(grams, type=pa.string()))
        return pa.table({"gm": vc.field("values"),
                         "d": pc.cast(vc.field("counts"), pa.int64())})

    df = (ds.select_columns([text_col])
          .map_batches(partial_df, batch_format="pyarrow")
          .groupby("gm").aggregate(Sum("d", alias_name="d")))
    dup: list[str] = []
    for b in df.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        dup.extend(pa.table(b).filter(
            pc.greater_equal(b["d"], 2))["gm"].to_pylist())
    dup_ref = ray.put(sorted(dup))

    def score(batch: pa.Table) -> pa.Table:
        ck = dup_ref.binary()
        arr = _DUP_CACHE.get(ck)
        if arr is None:
            arr = pa.array(ray.get(dup_ref), type=pa.string())
            _DUP_CACHE.clear()
            _DUP_CACHE[ck] = arr
        flat: list[str] = []
        lens: list[int] = []
        rows: list[int] = []
        for i, t in enumerate(batch[text_col].to_pylist()):
            g = set(_ngrams(t, n)) if t else ()
            if g:
                flat.extend(g)
                lens.append(len(g))
                rows.append(i)
        if not rows:
            return pa.table({id_col: batch[id_col].take(
                pa.array([], pa.int64())),
                "n_grams": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64())})
        hits = pc.is_in(pa.array(flat, pa.string()),
                        value_set=arr).to_numpy(zero_copy_only=False)
        bounds = np.concatenate(([0], np.cumsum(lens)))[:-1]
        shared = np.add.reduceat(hits.astype(np.int64), bounds)
        return pa.table({id_col: batch[id_col].take(pa.array(rows,
                                                             pa.int64())),
                         "n_grams": pa.array(np.asarray(lens, np.int64)),
                         "n_shared": pa.array(shared)})

    return ds.map_batches(score, batch_format="pyarrow")


def cross_corpus_near_dups(corpus, bench, cfg, corpus_key: str,
                           bench_key: str, text_col: str = "text",
                           min_jaccard: float | None = None):
    """Fuzzy decontamination: every (corpus row, benchmark row) pair
    with shingle-set Jaccard ≥ threshold — the GPT-3-style FUZZY
    complement to ``decontaminate``'s exact n-gram collision.

    Ray-Data shape: the benchmark side is SMALL by definition, so its
    MinHash band buckets and sorted-unique shingle sets are built once
    on the driver and broadcast via ``ray.put``; every corpus batch
    computes its own signatures (the same per-worker-cached kernel as
    the dedup DAG), probes the broadcast band index with one
    searchsorted per (row, band), and exact-verifies the (rare)
    candidates with sorted-set intersections — one streaming pass over
    the corpus, no shuffle. Many-to-many: all qualifying pairs emit
    (no exact-dup rep collapsing — contamination reports want every
    contaminated row). Zero-shingle rows on either side never pair.
    Candidate recall is the LSH band guarantee, identical to the
    within-corpus ``lsh_verified_pairs`` configuration.
    """
    import ray

    from raydedup.stages.lsh import (
        _bands_matrix,
        _fused_buckets,
        _tiled_intersections,
    )
    from raydedup.stages.signatures import signature_batch

    thr = cfg.jaccard_dup_threshold if min_jaccard is None else min_jaccard
    b = cfg.lsh_bands

    bench_t = pa.concat_tables(
        [ray.get(r) for r in bench.to_arrow_refs()])
    bsig = signature_batch(bench_t, cfg, text_col=text_col)
    q_nsh = bsig["n_shingles"].to_numpy(zero_copy_only=False)
    nonempty = np.flatnonzero(q_nsh > 0)
    bsig = bsig.take(pa.array(nonempty))
    m = bsig.num_rows
    fused = _fused_buckets(_bands_matrix(bsig, b), b) if m else \
        np.empty((0, b), dtype=np.int64)
    flat_keys = fused.reshape(-1)
    flat_q = np.repeat(np.arange(m, dtype=np.int64), b)
    order = np.argsort(flat_keys, kind="stable")
    bkeys_s, bq_s = flat_keys[order], flat_q[order]
    uniq_keys, ustarts = np.unique(bkeys_s, return_index=True)
    ucounts = np.diff(np.r_[ustarts, len(bkeys_s)])
    sh_list = bsig["shingle_hashes"].combine_chunks()
    q_flat = sh_list.flatten().to_numpy(zero_copy_only=False)
    q_offs = sh_list.offsets.to_numpy(zero_copy_only=False)
    q_keys = [str(k) for k in bsig[bench_key].to_pylist()]
    idx_ref = ray.put((uniq_keys, ustarts.astype(np.int64),
                       ucounts.astype(np.int64), bq_s,
                       q_flat, q_offs.astype(np.int64)))

    def probe(batch: pa.Table) -> pa.Table:
        def empty() -> pa.Table:
            return pa.table({"corpus_key": pa.array([], pa.string()),
                             "bench_key": pa.array([], pa.string()),
                             "jaccard": pa.array([], pa.float64())})

        if batch.num_rows == 0 or m == 0:
            return empty()
        (ukeys, ustart, ucnt, bq, qf, qo) = ray.get(idx_ref)
        sig = signature_batch(batch, cfg, text_col=text_col)
        n = sig.num_rows
        cf = _fused_buckets(_bands_matrix(sig, b), b).reshape(-1)
        rows = np.repeat(np.arange(n, dtype=np.int64), b)
        pos = np.clip(np.searchsorted(ukeys, cf), 0, len(ukeys) - 1)
        hit = ukeys[pos] == cf
        if not hit.any():
            return empty()
        hrow, hpos = rows[hit], pos[hit]
        counts = ucnt[hpos]
        total = int(counts.sum())
        crow = np.repeat(hrow, counts)
        cum = np.concatenate(([0], np.cumsum(counts)))
        within = np.arange(total) - np.repeat(cum[:-1], counts)
        qidx = bq[np.repeat(ustart[hpos], counts) + within]
        cand = np.unique(crow * np.int64(m) + qidx)
        crow, qidx = cand // m, cand % m
        c_list = sig["shingle_hashes"].combine_chunks()
        c_flat = c_list.flatten().to_numpy(zero_copy_only=False)
        c_offs = c_list.offsets.to_numpy(
            zero_copy_only=False).astype(np.int64)
        # exact verify through the shared tiled kernel (lsh.py) — a
        # per-pair np.intersect1d loop was the repo's measured
        # anti-scaling pattern on candidate-heavy batches
        la = (c_offs[crow + 1] - c_offs[crow]).astype(np.int64)
        lb = (qo[qidx + 1] - qo[qidx]).astype(np.int64)
        nz = la > 0
        crow, qidx, la, lb = crow[nz], qidx[nz], la[nz], lb[nz]
        if len(crow) == 0:
            return empty()

        def fill(row: np.ndarray, i: int) -> None:
            r, q = crow[i], qidx[i]
            row[: la[i]] = c_flat[c_offs[r]: c_offs[r + 1]]
            row[la[i]: la[i] + lb[i]] = qf[qo[q]: qo[q + 1]]

        inter = _tiled_intersections(la, lb, fill)
        jac = inter / (la + lb - inter)
        keep = jac >= thr
        ckeys = sig[corpus_key].to_pylist()
        return pa.table({
            "corpus_key": pa.array(
                [str(ckeys[r]) for r in crow[keep]], pa.string()),
            "bench_key": pa.array(
                [q_keys[q] for q in qidx[keep]], pa.string()),
            "jaccard": pa.array(jac[keep], pa.float64())})

    return corpus.map_batches(probe, batch_format="pyarrow")


# --- Bloom-filter decontamination scale path -------------------------------
#
# cross_corpus_exact_matches broadcasts the ref side's {sha: keys} dict —
# right when the benchmark is genuinely small, corpus-scale-wrong when
# "the ref side" is itself a reference CORPUS (dedup new crawl against
# last year's 100 TB). The bloom path bounds the broadcast at m_bits/8
# bytes regardless of ref cardinality: build packed bloom bits over the
# ref shas DISTRIBUTED (one task per block, tree-OR reduce), broadcast
# the bits once, stream the corpus through a vectorized probe (no false
# negatives ⇒ every true match survives), then resolve the SPARSE
# candidate set against the ref keys with one distributed hash join —
# false positives die in the join, so the output is EXACT and shares
# cross_corpus_matches' SQL oracle. Bloom math: k = n_hashes double
# hashes (Kirsch–Mitzenmacher 2006, public) over the sha256 digest's
# first 16 bytes; fpr ≈ (1 - e^{-kn/m})^k.


def _sha_u64_pair(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 pairs = first 16 bytes of sha256(text) per row
    (empty/null rows get h1 = h2 = 0 and are masked out by callers)."""
    import hashlib

    n = len(texts)
    buf = np.zeros((n, 2), dtype=np.uint64)
    for i, t in enumerate(texts):
        if t:
            d = hashlib.sha256(t.encode("utf-8")).digest()
            buf[i, 0] = int.from_bytes(d[:8], "big")
            buf[i, 1] = int.from_bytes(d[8:16], "big")
    return buf[:, 0], buf[:, 1]


def _bloom_set(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray,
               m_bits: int, n_hashes: int) -> None:
    mask = np.uint64(m_bits - 1)
    for i in range(n_hashes):
        idx = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))


def _bloom_get(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray,
               m_bits: int, n_hashes: int) -> np.ndarray:
    mask = np.uint64(m_bits - 1)
    hit = np.ones(len(h1), dtype=bool)
    for i in range(n_hashes):
        idx = (h1 + np.uint64(i) * h2) & mask
        word = bits[(idx >> np.uint64(6)).astype(np.int64)]
        hit &= ((word >> (idx & np.uint64(63))) & np.uint64(1)) != 0
    return hit


@ray.remote
def _bloom_block(tbl: pa.Table, text_col: str, m_bits: int,
                 n_hashes: int) -> np.ndarray:
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    if tbl.num_rows:
        texts = tbl[text_col].to_pylist()
        h1, h2 = _sha_u64_pair(texts)
        ok = np.array([bool(t) for t in texts])
        _bloom_set(bits, h1[ok], h2[ok], m_bits, n_hashes)
    return bits


@ray.remote
def _bloom_or(*arrs: np.ndarray) -> np.ndarray:
    out = arrs[0].copy()
    for a in arrs[1:]:
        out |= a
    return out


def bloom_bits_of(ds, text_col: str = "text", m_bits: int = 1 << 20,
                  n_hashes: int = 7, fan_in: int = 8) -> np.ndarray:
    """Packed bloom bits (np.uint64[m_bits/64]) over sha256(text) of
    every non-empty row — built fully distributed: one task per block,
    log-depth tree-OR reduce; the driver holds only m_bits/8 bytes."""
    if m_bits & (m_bits - 1) or m_bits < 64:
        raise ValueError("m_bits must be a power of two >= 64")
    refs = [_bloom_block.remote(b, text_col, m_bits, n_hashes)
            for b in ds.select_columns([text_col]).to_arrow_refs()]
    if not refs:
        return np.zeros(m_bits // 64, dtype=np.uint64)
    while len(refs) > 1:
        refs = [_bloom_or.remote(*refs[i:i + fan_in])
                for i in range(0, len(refs), fan_in)]
    return ray.get(refs[0])


def cross_corpus_matches_bloom(ds, ref_ds, ref_key_col: str,
                               text_col: str = "text",
                               ref_text_col: str = "text",
                               out_col: str | None = None,
                               m_bits: int = 1 << 20, n_hashes: int = 7,
                               num_partitions: int | None = None):
    """EXACT cross-corpus contamination, corpus-scale ref side: same
    output contract as :func:`cross_corpus_exact_matches` (one row per
    (corpus row, byte-identical ref row)), but the ref side is never
    collected — a bounded bloom broadcast prunes the corpus to the
    sparse candidate superset (no false negatives), and one distributed
    sha hash join against the ref keys removes bloom false positives
    and fans out many-to-many matches. Size ``m_bits`` ≈ 10–15 bits per
    ref row for ~1% candidate overhead."""
    from ray.data import from_arrow

    from raydedup.util import join_partitions

    out_col = out_col or f"ref_{ref_key_col}"
    if out_col in ds.schema().names:
        raise ValueError(f"output column {out_col!r} collides with input")
    key_type = ref_ds.schema().types[
        ref_ds.schema().names.index(ref_key_col)]
    keep_cols = [c for c in ds.schema().names if c != text_col]
    empty = pa.table({**{c: pa.array([], ds.schema().types[
        ds.schema().names.index(c)]) for c in keep_cols},
        out_col: pa.array([], key_type)})

    ref_slim = ref_ds.select_columns(
        [ref_key_col, ref_text_col]).materialize()
    bits = bloom_bits_of(ref_slim, ref_text_col, m_bits, n_hashes)
    bits_ref = ray.put(bits)

    import hashlib

    def probe(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({**{c: batch[c] for c in keep_cols},
                             "__sha": pa.array([], pa.string())})
        cols = {c: batch[c] for c in keep_cols}
        texts = batch[text_col].to_pylist()
        h1, h2 = _sha_u64_pair(texts)
        b = ray.get(bits_ref)
        hit = _bloom_get(b, h1, h2, m_bits, n_hashes)
        hit &= np.array([bool(t) for t in texts])
        idx = pa.array(np.flatnonzero(hit))
        out = {c: cols[c].take(idx) for c in keep_cols}
        out["__sha"] = pa.array(
            [hashlib.sha256(texts[i].encode("utf-8")).hexdigest()
             for i in np.flatnonzero(hit)], pa.string())
        return pa.table(out)

    cand = ds.map_batches(probe, batch_format="pyarrow").materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return from_arrow(empty)

    def ref_keyed(batch: pa.Table) -> pa.Table:
        texts = batch[ref_text_col].to_pylist()
        ok = [i for i, t in enumerate(texts) if t]
        idx = pa.array(ok, pa.int64())
        return pa.table({
            "__sha": pa.array([hashlib.sha256(
                texts[i].encode("utf-8")).hexdigest() for i in ok],
                pa.string()),
            out_col: batch[ref_key_col].take(idx)})

    refk = ref_slim.map_batches(ref_keyed, batch_format="pyarrow")
    joined = cand.join(refk, join_type="inner",
                       num_partitions=(num_partitions
                                       or join_partitions(n_cand)),
                       on=("__sha",))
    return joined.drop_columns(["__sha"])
