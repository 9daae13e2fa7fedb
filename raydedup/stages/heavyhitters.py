"""Guaranteed heavy hitters: every token whose corpus frequency exceeds
N/(k+1) — with EXACT counts — via mergeable Misra-Gries summaries plus
an exact recount of the surviving candidates.

The bounded-memory counterpart of ``collection.hot_ngrams`` /
``top_terms_global``: those shuffle one row per distinct key, which is
exact but vocabulary-sized; a 100 TB multilingual corpus' vocabulary
(Heaps' law) outgrows any single stage. Misra-Gries (Misra & Gries
1982) keeps at most k counters per task, and MG summaries are FULLY
MERGEABLE (Agarwal, Cormode, Huang, Phillips, Wei, Yi, PODS 2012:
merge = add counters, re-compress to k) with total undercount at most
N/(k+1) under ANY merge tree — so every token with true frequency
> N/(k+1) survives to the candidate set no matter how Ray batches the
partials. A second pass recounts ONLY the ≤ k candidates exactly
(broadcast token list, one vectorized ``index_in`` per batch), and the
strict integer threshold ``n · (k+1) > N`` is applied to exact counts —
output is therefore deterministic and bit-equal to the brute-force SQL
truth, while no stage ever holds more than k counters + one batch.

Token contract: the SQL-mirrorable ASCII tokenizer
(``regexp_extract_all(lower(text), '[0-9a-zA-Z_]+')``), shared with
textstats via ``_doc_term_codes``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from raydedup.stages.textstats import _doc_term_codes

_PARTIAL_SCHEMA = pa.schema([pa.field("token", pa.string()),
                             pa.field("wt", pa.int64())])
_OUT_SCHEMA = pa.schema([pa.field("token", pa.string()),
                         pa.field("n", pa.int64())])


def _compress(tokens: pa.Array, wt: np.ndarray, k: int):
    """MG compress to at most k counters: subtract the (k+1)-th largest
    weight from every counter, drop non-positives. Subtracted mass per
    compress ≤ input mass / (k+1), which is what the merge-tree error
    bound sums over."""
    if wt.size <= k:
        return tokens, wt
    d = np.partition(wt, wt.size - (k + 1))[wt.size - (k + 1)]
    w2 = wt - d
    keep = np.flatnonzero(w2 > 0)
    return tokens.take(pa.array(keep)), w2[keep]


def _merge_rows(batch: pa.Table, k: int) -> pa.Table:
    """Merge a batch of (token, wt) counter rows: group-sum, compress."""
    if batch.num_rows == 0:
        return _PARTIAL_SCHEMA.empty_table()
    g = batch.group_by("token").aggregate([("wt", "sum")])
    toks = g["token"].combine_chunks()
    wt = g["wt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    toks, wt = _compress(toks, wt, k)
    return pa.table({"token": toks, "wt": pa.array(wt, type=pa.int64())})


def guaranteed_heavy_hitters(ds, k: int = 256, text_col: str = "text"):
    """→ Dataset (token, n): EXACTLY the tokens with corpus frequency
    n satisfying n · (k+1) > N (N = total token instances), with exact
    counts. Strict integer threshold — no float in the decision."""
    # pass 1: per-batch exact counts → MG summary (≤ k rows per batch)
    def partial(batch: pa.Table) -> pa.Table:
        _, codes, vocab = _doc_term_codes(batch, text_col)
        if codes.size == 0:
            return _PARTIAL_SCHEMA.empty_table()
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        toks, wt = _compress(pa.array(vocab.to_pylist(), pa.string()),
                             cnt, k)
        return pa.table({"token": toks, "wt": pa.array(wt, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # one intermediate merge level bounds what the driver sees to
    # (input summary rows / 2^16) summaries of ≤ k rows each
    merged = partials.map_batches(
        lambda b: _merge_rows(b, k), batch_format="pyarrow",
        batch_size=1 << 16)
    final_parts = [pa.table(b) for b in merged.iter_batches(
        batch_size=1 << 20, batch_format="pyarrow")]
    if final_parts:
        summary = _merge_rows(
            pa.concat_tables(final_parts).combine_chunks(), k)
    else:
        summary = _PARTIAL_SCHEMA.empty_table()
    if summary.num_rows == 0:
        return ray.data.from_arrow(_OUT_SCHEMA.empty_table())
    cand_ref = ray.put(summary["token"].combine_chunks())

    # pass 2: exact recount of candidates only + per-batch instance total
    # (token = "" sentinel row; _doc_term_codes never emits the empty
    # string, so "" cannot collide with a real token)
    def recount(batch: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        _, codes, vocab = _doc_term_codes(batch, text_col)
        n_batch = int(codes.size)
        if n_batch == 0:
            return _PARTIAL_SCHEMA.empty_table()
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        sel = pc.index_in(cands, value_set=vocab)
        hit = pc.is_valid(sel).to_numpy(zero_copy_only=False)
        idx = sel.to_numpy(zero_copy_only=False)
        rows_t = [cands.filter(pa.array(hit))]
        rows_w = [cnt[idx[hit].astype(np.int64)]] if hit.any() else []
        tok_out = pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in rows_t] + [pa.array([""], pa.string())])
        wt_out = np.concatenate(
            (rows_w if rows_w else [np.empty(0, dtype=np.int64)])
            + [np.array([n_batch], dtype=np.int64)])
        return pa.table({"token": tok_out,
                         "wt": pa.array(wt_out, pa.int64())})

    counts = ds.map_batches(recount, batch_format="pyarrow") \
        .groupby("token").sum("wt")
    tbl_parts = [pa.table(b) for b in counts.iter_batches(
        batch_size=1 << 20, batch_format="pyarrow")]
    tbl = (pa.concat_tables(tbl_parts).combine_chunks()
           if tbl_parts else None)
    if tbl is None or tbl.num_rows == 0:
        return ray.data.from_arrow(_OUT_SCHEMA.empty_table())
    wt_col = "sum(wt)" if "sum(wt)" in tbl.column_names else "wt"
    sent_mask = pc.equal(tbl["token"], pa.scalar("")).to_numpy(
        zero_copy_only=False)
    n_total = int(np.asarray(
        tbl[wt_col].to_numpy(zero_copy_only=False))[sent_mask].sum())
    toks = tbl["token"].filter(pa.array(~sent_mask))
    n = tbl[wt_col].to_numpy(zero_copy_only=False)[~sent_mask].astype(
        np.int64)
    keep = n * (k + 1) > n_total
    out = pa.table({"token": toks.filter(pa.array(keep)),
                    "n": pa.array(n[keep], pa.int64())})
    return ray.data.from_arrow(
        out.cast(_OUT_SCHEMA) if out.num_rows else
        _OUT_SCHEMA.empty_table())


def grouped_heavy_hitters(ds, group_col: str = "source", k: int = 64,
                          text_col: str = "text"):
    """Per-GROUP guaranteed heavy hitters: for every group g, exactly
    the tokens with n·(k+1) > N_g (N_g = g's total token instances),
    exact counts — ``guaranteed_heavy_hitters`` with the Misra-Gries
    state kept PER GROUP (≤ k counters × |groups in task|; the
    merge-tree bound applies independently per group, so recall is
    still a theorem under any Ray batching). Output
    (group, token, n)."""
    SEP = "\x1f"

    def _compress_groups(tbl: pa.Table) -> pa.Table:
        """(g, token, wt) rows → per-group MG compress to ≤ k each."""
        if tbl.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "wt": pa.array([], pa.int64())})
        g = tbl.group_by(["g", "token"]).aggregate([("wt", "sum")])
        gcol = g["g"].combine_chunks()
        enc = pc.dictionary_encode(gcol)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        wt = g["wt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        keep_idx, keep_wt = [], []
        bounds = np.flatnonzero(np.r_[True, codes[order][1:]
                                      != codes[order][:-1]])
        bounds = np.r_[bounds, order.size]
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = order[s:e]
            w = wt[seg]
            if w.size <= k:
                keep_idx.append(seg)
                keep_wt.append(w)
            else:
                d = np.partition(w, w.size - (k + 1))[w.size - (k + 1)]
                w2 = w - d
                m = w2 > 0
                keep_idx.append(seg[m])
                keep_wt.append(w2[m])
        ki = np.concatenate(keep_idx)
        sel = pa.array(ki)
        return pa.table({"g": gcol.take(sel),
                         "token": g["token"].combine_chunks().take(sel),
                         "wt": pa.array(np.concatenate(keep_wt),
                                        pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        docidx, codes, vocab = _doc_term_codes(batch, text_col)
        if codes.size == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "wt": pa.array([], pa.int64())})
        grp = pc.cast(pc.fill_null(batch[group_col], ""),
                      pa.string()).combine_chunks()
        raw = pa.table({
            "g": grp.take(pa.array(docidx)),
            "token": pc.take(vocab, pa.array(codes)),
            "wt": pa.array(np.ones(codes.size, dtype=np.int64)),
        })
        return _compress_groups(raw)

    partials = ds.select_columns([group_col, text_col]).map_batches(
        partial, batch_format="pyarrow")
    merged = partials.map_batches(_compress_groups,
                                  batch_format="pyarrow",
                                  batch_size=1 << 16)
    parts = [pa.table(b) for b in merged.iter_batches(
        batch_size=1 << 20, batch_format="pyarrow")]
    if not parts:
        return ray.data.from_arrow(pa.table(
            {"group": pa.array([], pa.string()),
             "token": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}))
    summary = _compress_groups(pa.concat_tables(parts).combine_chunks())
    cand_keys = pc.binary_join_element_wise(
        summary["g"].combine_chunks(), summary["token"].combine_chunks(),
        SEP)
    cand_ref = ray.put(cand_keys)

    def recount(batch: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        docidx, codes, vocab = _doc_term_codes(batch, text_col)
        empty = pa.table({"key": pa.array([], pa.string()),
                          "wt": pa.array([], pa.int64())})
        if codes.size == 0:
            return empty
        grp = pc.cast(pc.fill_null(batch[group_col], ""),
                      pa.string()).combine_chunks()
        gk = grp.take(pa.array(docidx))
        keys = pc.binary_join_element_wise(
            gk, pc.take(vocab, pa.array(codes)), SEP)
        kenc = pc.dictionary_encode(keys)
        kc = kenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(kc, minlength=len(kenc.dictionary)).astype(
            np.int64)
        hit = pc.is_valid(pc.index_in(kenc.dictionary, value_set=cands))
        hm = hit.to_numpy(zero_copy_only=False)
        # per-group instance totals ride as ("<g><SEP>", total) rows —
        # the empty token never occurs (see _doc_term_codes)
        genc = pc.dictionary_encode(gk)
        gc = genc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        gtot = np.bincount(gc, minlength=len(genc.dictionary)).astype(
            np.int64)
        tot_keys = pc.binary_join_element_wise(
            genc.dictionary, pa.array([""] * len(genc.dictionary),
                                      pa.string()), SEP)
        return pa.table({
            "key": pa.concat_arrays(
                [kenc.dictionary.filter(hit),
                 tot_keys.combine_chunks()
                 if isinstance(tot_keys, pa.ChunkedArray) else tot_keys]),
            "wt": pa.array(np.concatenate([cnt[hm], gtot]), pa.int64()),
        })

    counts = ds.select_columns([group_col, text_col]).map_batches(
        recount, batch_format="pyarrow").groupby("key").sum("wt")
    parts2 = [pa.table(b) for b in counts.iter_batches(
        batch_size=1 << 20, batch_format="pyarrow")]
    tbl = pa.concat_tables(parts2).combine_chunks() if parts2 else None
    out_schema = pa.schema([pa.field("group", pa.string()),
                            pa.field("token", pa.string()),
                            pa.field("n", pa.int64())])
    if tbl is None or tbl.num_rows == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    wt_col = "sum(wt)" if "sum(wt)" in tbl.column_names else "wt"
    keys = tbl["key"].to_pylist()
    wts = tbl[wt_col].to_numpy(zero_copy_only=False).astype(np.int64)
    totals: dict[str, int] = {}
    rows_g, rows_t, rows_n = [], [], []
    for ky, w in zip(keys, wts):
        g, t = ky.split(SEP, 1)
        if t == "":
            totals[g] = totals.get(g, 0) + int(w)
    for ky, w in zip(keys, wts):
        g, t = ky.split(SEP, 1)
        if t and int(w) * (k + 1) > totals.get(g, 0):
            rows_g.append(g)
            rows_t.append(t)
            rows_n.append(int(w))
    return ray.data.from_arrow(pa.table({
        "group": pa.array(rows_g, pa.string()),
        "token": pa.array(rows_t, pa.string()),
        "n": pa.array(rows_n, pa.int64()),
    }))
