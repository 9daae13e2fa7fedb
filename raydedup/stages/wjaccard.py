"""Weighted (multiset / bag) near-duplicate pairs.

The FIFTH similarity contract next to set-Jaccard LSH, simhash
pigeonhole, SNM and FastSS: WEIGHTED Jaccard over token multisets,

    J_w(A, B) = Σ_t min(c_A(t), c_B(t)) / Σ_t max(c_A(t), c_B(t)),

the bag generalization of ``exact.bag_dup_groups`` (which only catches
IDENTICAL multisets). Token-level J_w is order-invariant, so it finds
reordered AND lightly edited copies that both exact bag hashing (any
edit breaks it) and set-shingle LSH (reordering destroys word n-grams)
miss — the classic shuffled-boilerplate / template-with-substitutions
case.

Reduction (exact, for integer counts — Kleinberg/Tardos-style element
expansion; see also Haveliwala et al. 2000): expand each token t with
count c into c distinct elements (t, 1) … (t, c). Then

    set-Jaccard(expand(A), expand(B)) ≡ weighted-Jaccard(A, B)

because the expanded sets share exactly Σ min(c_A, c_B) elements and
union to Σ max. So the ENTIRE existing pipeline applies unchanged:
minhash (k-perm or OPH per ``cfg.minhash_kernel``) over the expanded
element hashes, band-fold, ``lsh_verified_pairs``' bucket groupby +
exact set-Jaccard verification — whose verified jaccard IS the exact
weighted Jaccard. Salting, pair budgets, driver/co-partitioned paths,
everything is inherited.

Scale shape: identical to the flagship — texts are dropped at this
stage, only hashes shuffle; expansion does not blow up the data (the
expanded set of a doc has exactly one element per TOKEN INSTANCE, the
same size as the token stream the tokenizer already produced).

Tokenizer: ``simple_tokenize`` (lowercase ``\\w+``) — the
SQL-mirrorable contract (``regexp_extract_all(lower(text),
'[0-9a-zA-Z_]+')``), so the DuckDB oracle can replay exact weighted
Jaccard from per-(doc, token) counts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.config import DedupConfig, DEFAULT_CONFIG
from raydedup.functions.minhash import (
    MinHasher,
    _blake64,
    _fmix64_batch,
    _POLY_C,
    oph_signatures_from_flat,
)
from raydedup.stages.exact import add_row_key, exact_dedup
from raydedup.stages.lsh import lsh_verified_pairs
from raydedup.stages.signatures import band_hashes_from_minhash
from raydedup.textnorm import simple_tokenize

# per-worker-process state: (num_perms, seed) → (MinHasher, token-hash
# cache). Pure-function values — process reuse cannot change results.
_STATE: dict[tuple, tuple[MinHasher, dict]] = {}


def _state_for(cfg: DedupConfig) -> tuple[MinHasher, dict]:
    key = (cfg.minhash_num_perms, cfg.minhash_seed)
    st = _STATE.get(key)
    if st is None:
        st = (MinHasher(cfg.minhash_num_perms, cfg.minhash_seed), {})
        _STATE[key] = st
    return st


def expanded_elements_ref(tokens: list[str]) -> list[int]:
    """Scalar REFERENCE of the (token, occurrence) element hashing
    (pytest parity oracle for the vectorized batch path): the i-th
    occurrence of token t (1-based) hashes to
    fmix64(blake64(t) + i * POLY_C)."""
    seen: dict[str, int] = {}
    out = []
    for t in tokens:
        occ = seen.get(t, 0) + 1
        seen[t] = occ
        x = np.uint64((_blake64(t) + occ * _POLY_C) & ((1 << 64) - 1))
        out.append(int(_fmix64_batch(np.array([x], dtype=np.uint64))[0]))
    return out


def _bag_signature_batch(batch: pa.Table, cfg: DedupConfig,
                         text_col: str,
                         bag_kernel: str = "expand") -> pa.Table:
    minhasher, tok_cache = _state_for(cfg)

    enc = pc.dictionary_encode(
        pc.fill_null(batch[text_col].combine_chunks(), ""))
    row_to_uniq = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq_texts: list[str] = enc.dictionary.to_pylist()
    u_sha = [hashlib.sha256(t.encode("utf-8")).hexdigest()
             for t in uniq_texts]

    token_lists = [simple_tokenize(t) for t in uniq_texts]
    n_u = len(token_lists)
    lens = np.array([len(t) for t in token_lists], dtype=np.int64)
    offsets = np.zeros(n_u + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])

    flat_tokens = [t for lst in token_lists for t in lst]
    if flat_tokens:
        tenc = pc.dictionary_encode(pa.array(flat_tokens, type=pa.string()))
        idx = tenc.indices.to_numpy().astype(np.int64)
        dvals = tenc.dictionary.to_pylist()
        dh = np.empty(len(dvals), dtype=np.uint64)
        get = tok_cache.get
        for i, s in enumerate(dvals):
            h = get(s)
            if h is None:
                h = _blake64(s)
                tok_cache[s] = h
            dh[i] = h
        th = dh[idx]
        # (doc, token-hash) lexsort → runs of equal (doc, token); run
        # length = multiplicity. Everything both kernels need derives
        # from this ONE sort.
        d_ids = np.repeat(np.arange(n_u, dtype=np.int64), lens)
        order = np.lexsort((th, d_ids))
        ts, td = th[order], d_ids[order]
        run_start = np.r_[True, (td[1:] != td[:-1]) | (ts[1:] != ts[:-1])]
    else:
        ts = np.empty(0, dtype=np.uint64)
        td = np.empty(0, dtype=np.int64)
        run_start = np.empty(0, dtype=bool)

    if bag_kernel == "icws":
        # ICWS weighted minhash (functions/icws.py — Ioffe 2010):
        # signature AND verify-set cost linear in DISTINCT (doc, token)
        # pairs — the expanded per-instance element hashes (the 'else'
        # branch's occ/elem/fs, O(total multiset mass) work + shuffle
        # payload) are never materialized. The verify sets ship as
        # (distinct hash, count) list pairs; lsh.BucketVerify's weighted
        # Σmin/Σmax kernel equals expanded-multiset Jaccard exactly, so
        # the verified pair set is unchanged.
        from raydedup.functions.icws import icws_samples

        if flat_tokens:
            d_starts = np.flatnonzero(run_start)
            d_counts = np.diff(np.r_[d_starts, ts.size]).astype(np.int64)
            d_toks = ts[d_starts]
            d_docs = td[d_starts]
            d_offsets = np.zeros(n_u + 1, dtype=np.int64)
            np.add.at(d_offsets, d_docs + 1, 1)
            np.cumsum(d_offsets, out=d_offsets)
        else:
            d_toks = np.empty(0, dtype=np.uint64)
            d_counts = np.empty(0, dtype=np.int64)
            d_offsets = np.zeros(n_u + 1, dtype=np.int64)
        u_minhash = icws_samples(d_toks, d_counts, d_offsets,
                                 cfg.minhash_num_perms,
                                 seed=cfg.minhash_seed)
        # per-doc hash-ascending by construction (lexsort above)
        sh_list = pa.ListArray.from_arrays(
            pa.array(d_offsets, type=pa.int32()),
            pa.array(d_toks, type=pa.uint64()))
        w_list = pa.ListArray.from_arrays(
            pa.array(d_offsets, type=pa.int32()),
            pa.array(d_counts, type=pa.int64()))
    else:
        # expansion kernel: occurrence index per (doc, token) → element
        # hash fmix64(th + occ * POLY_C), per-doc value-ascending
        if flat_tokens:
            pos = np.arange(ts.size, dtype=np.int64)
            occ = (pos - np.maximum.accumulate(
                np.where(run_start, pos, 0)) + 1)
            elem = _fmix64_batch(
                ts + occ.astype(np.uint64) * np.uint64(_POLY_C))
            eorder = np.lexsort((elem, td))
            fs = elem[eorder]
        else:
            fs = np.empty(0, dtype=np.uint64)
        if cfg.minhash_kernel == "oph":
            u_minhash = oph_signatures_from_flat(
                fs, offsets, cfg.minhash_num_perms, values_ascending=True)
        else:
            u_minhash = minhasher.signatures_from_flat(fs, offsets)
        sh_list = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(fs, type=pa.uint64()))
        w_list = None
    u_bands = band_hashes_from_minhash(u_minhash, cfg.lsh_bands, cfg.lsh_rows)

    sel = pa.array(row_to_uniq)
    cols = {name: batch[name] for name in batch.column_names
            if name != text_col}
    cols["text_sha256"] = pc.take(pa.array(u_sha, type=pa.string()), sel)
    cols["band_hashes"] = pc.take(
        pa.FixedSizeListArray.from_arrays(
            pa.array(u_bands.reshape(-1), type=pa.uint64()), cfg.lsh_bands),
        sel)
    cols["shingle_hashes"] = pc.take(sh_list, sel)
    if w_list is not None:
        cols["shingle_weights"] = pc.take(w_list, sel)
    cols["n_shingles"] = pc.take(
        pa.array(lens.astype(np.int32), type=pa.int32()), sel)
    return pa.table(cols)


def bag_near_dup_pairs(ds, cfg: DedupConfig = DEFAULT_CONFIG,
                       key_cols: list[str] | None = None,
                       text_col: str = "text",
                       min_jaccard: float | None = None,
                       bag_kernel: str = "expand"):
    """rows → verified weighted-Jaccard near-dup pairs between exact-text
    representatives: (a_key < b_key, jaccard = EXACT token-multiset
    weighted Jaccard ≥ cfg.jaccard_dup_threshold). Exact-text duplicates
    collapse first (identical text ⇒ J_w = 1 trivially — those are exact
    pairs, not bag pairs), mirroring the flagship's rep contract.

    ``bag_kernel``: 'expand' (default — minhash over the expanded
    (token, occurrence) elements) or 'icws' (Ioffe 2010 consistent
    weighted sampling over (token, count) pairs — signature cost linear
    in DISTINCT tokens instead of total multiset mass, the scale path
    for heavy-multiplicity bags). Both estimate J_w per banding column
    and share the SAME exact Σmin/Σmax in-bucket verification, so the
    output pair set is exact under either kernel; only the candidate
    recall is probabilistic (standard banding guarantees)."""
    key_cols = key_cols or ["doc_id"]
    keyed = add_row_key(ds.select_columns(key_cols + [text_col]), key_cols)
    sigs = keyed.map_batches(
        lambda b: _bag_signature_batch(b, cfg, text_col,
                                       bag_kernel=bag_kernel),
        batch_format="pyarrow", batch_size=cfg.batch_size)
    assigned = exact_dedup(sigs)
    rep_cols = ["row_key", "band_hashes", "shingle_hashes", "n_shingles"]
    if bag_kernel == "icws":
        rep_cols.append("shingle_weights")
    reps = assigned.filter(expr="is_rep").select_columns(rep_cols)
    # icws ships (distinct hash, count) verify sets; BOTH verify paths
    # carry the weighted Σmin/Σmax kernel (BucketVerify's weighted
    # tiled kernel on the co-partitioned path, _batch_weighted on the
    # driver ref-shuffle), so the normal auto-switch applies
    return lsh_verified_pairs(reps, cfg, min_jaccard=min_jaccard)


def bag_element_sets(ds, cfg: DedupConfig = DEFAULT_CONFIG,
                     id_col: str = "doc_id", text_col: str = "text"):
    """rows → (id, nsh, sh) element-set table in ``shingle_sets``'
    schema, where the per-doc elements are the expanded (token,
    occurrence) hashes — so any set operator downstream (prefix-filter
    joins, containment, tiled intersections) computes the exact
    WEIGHTED (multiset) counterpart of its set semantics. nsh = total
    token count (every instance contributes one distinct element)."""

    def fn(batch: pa.Table) -> pa.Table:
        minhasher, tok_cache = _state_for(cfg)
        enc = pc.dictionary_encode(
            pc.fill_null(batch[text_col].combine_chunks(), ""))
        row_to_uniq = enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq_texts: list[str] = enc.dictionary.to_pylist()
        from raydedup.textnorm import simple_tokenize

        token_lists = [simple_tokenize(t) for t in uniq_texts]
        n_u = len(token_lists)
        lens = np.array([len(t) for t in token_lists], dtype=np.int64)
        offsets = np.zeros(n_u + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        flat_tokens = [t for lst in token_lists for t in lst]
        if flat_tokens:
            tenc = pc.dictionary_encode(
                pa.array(flat_tokens, type=pa.string()))
            idx = tenc.indices.to_numpy().astype(np.int64)
            dvals = tenc.dictionary.to_pylist()
            dh = np.empty(len(dvals), dtype=np.uint64)
            get = tok_cache.get
            for i, s in enumerate(dvals):
                h = get(s)
                if h is None:
                    h = _blake64(s)
                    tok_cache[s] = h
                dh[i] = h
            th = dh[idx]
            d_ids = np.repeat(np.arange(n_u, dtype=np.int64), lens)
            order = np.lexsort((th, d_ids))
            ts, td = th[order], d_ids[order]
            pos = np.arange(ts.size, dtype=np.int64)
            run_start = np.r_[True,
                              (td[1:] != td[:-1]) | (ts[1:] != ts[:-1])]
            occ = pos - np.maximum.accumulate(
                np.where(run_start, pos, 0)) + 1
            elem = _fmix64_batch(
                ts + occ.astype(np.uint64) * np.uint64(_POLY_C))
            eorder = np.lexsort((elem, td))
            fs = elem[eorder]
        else:
            fs = np.empty(0, dtype=np.uint64)
        sets_list = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(fs, type=pa.uint64()))
        sel = pa.array(row_to_uniq)
        return pa.table({
            id_col: batch[id_col],
            "nsh": pc.take(pa.array(lens, pa.int64()), sel),
            "sh": pc.take(sets_list, sel),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", batch_size=cfg.batch_size)
