"""Signature stage: per-row text → (sha256, simhash64, band hashes,
shingle hashes).

The engine's replacement for the reference's per-memento Simhash pass
(otmt/metadata_calcluations.py:20-67) plus the prep work its per-pair
Jaccard would redo for every comparison (otmt/timemap_measures.py:45-62,
380-401): tokenization, shingling and hashing happen ONCE per row here, and
every downstream comparison is hash arithmetic.

Ray Data shape: a STATELESS task function over Arrow batches. Worker
processes are reused across tasks, so the expensive state (MinHasher
permutation table, shingle→hash caches) lives in a module-level
per-process registry keyed by config — the amortization of an actor pool
without its spin-up latency or fixed pool sizing (measured: actor-pool
ramp dominated wall time at small scale).

LSH band hashes are folded HERE (rather than shipping the full K-perm
minhash downstream): the K × 8B signature never leaves the task; only b
band hashes (rows× smaller) cross the exact-dedup and LSH shuffles. Set
``keep_minhash=True`` to retain the full signature column. Signatures are
computed once per DISTINCT text within each batch and scattered to rows.

Output schema (key columns passed through):
    text_sha256: string (hex)     — exact-dup key
    simhash:     uint64           — reference-parity 64-bit simhash
    band_hashes: fixed_size_list<uint64, b>
    shingle_hashes: list<uint64>  — sorted unique 64-bit shingle hashes
                                    (exact Jaccard on these ≡ exact shingle
                                    Jaccard w.h.p.)
    n_tokens, n_shingles: int32
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.config import DedupConfig
from raydedup.functions.minhash import MinHasher, oph_signatures_from_flat
from raydedup.functions.simhash import simhash64_batch
from raydedup.textnorm import full_tokenize

# per-worker-process state registry: config fingerprint → (MinHasher,
# simhash cache, stem cache). Deterministic (pure-function values, seeded
# permutations), so process reuse across tasks cannot change results —
# only skip rebuilds and re-hashing of repeated shingles/tokens.
_STATE: dict[tuple, tuple[MinHasher, dict, dict]] = {}


def _state_for(cfg: DedupConfig) -> tuple[MinHasher, dict, dict]:
    key = (cfg.minhash_num_perms, cfg.minhash_seed)
    st = _STATE.get(key)
    if st is None:
        st = (MinHasher(cfg.minhash_num_perms, cfg.minhash_seed), {}, {})
        _STATE[key] = st
    return st


def band_hashes_from_minhash(minhash: np.ndarray, bands: int,
                             rows: int) -> np.ndarray:
    """(n, K) minhash → (n, bands) uint64 FNV-1a band folds."""
    n = minhash.shape[0]
    grouped = minhash.reshape(n, bands, rows)
    h = np.full((n, bands), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for j in range(rows):
        h = (h ^ grouped[:, :, j]) * prime
    return h


def signature_batch(batch: pa.Table, cfg: DedupConfig,
                    text_col: str = "text",
                    keep_minhash: bool = False) -> pa.Table:
    minhasher, simhash_cache, stem_cache = _state_for(cfg)

    # compute once per DISTINCT text in the batch, scatter to rows:
    # identical text ⇒ identical signature by construction, and dedup
    # corpora repeat texts heavily — this cuts the bandwidth-bound hashing
    # work by the batch's duplication factor. The row→distinct map is one
    # C-hash ``dictionary_encode`` (the Python dict probe over every row
    # was ~1 µs/row of pure interpreter time); only the DISTINCT texts
    # are unboxed to Python strings.
    enc = pc.dictionary_encode(
        pc.fill_null(batch[text_col].combine_chunks(), ""))
    row_to_uniq = enc.indices.to_numpy(zero_copy_only=False).astype(
        np.int64)
    uniq_texts: list[str] = enc.dictionary.to_pylist()

    u_sha = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in uniq_texts]
    u_simhash = simhash64_batch(
        uniq_texts, width=cfg.simhash_shingle_width, cache=simhash_cache
    )

    token_lists = [
        full_tokenize(t, stemming=cfg.stemming,
                      remove_stopwords=cfg.remove_stopwords,
                      stem_cache=stem_cache)
        for t in uniq_texts
    ]
    flat_sh, sh_doc_offs = minhasher.shingle_hash_arrays(
        token_lists, cfg.minhash_shingle_words
    )
    # per-doc sorted-unique shingle hashes in ONE batch lexsort + diff
    # (a per-doc np.unique loop was ~0.15 s/batch of call overhead);
    # hoisted above the minhash kernel because the OPH path reuses the
    # (doc-contiguous, value-ascending) order to take its bin minima
    # sort-free
    n_u = len(token_lists)
    d_ids = np.repeat(np.arange(n_u, dtype=np.int64),
                      np.diff(sh_doc_offs))
    order = np.lexsort((flat_sh, d_ids))
    fs, fd = flat_sh[order], d_ids[order]

    if cfg.minhash_kernel == "oph":
        # one-permutation hashing + rotation densification: one modulo
        # + one scatter-min per shingle instead of K multiply-adds — the
        # scale path for the bandwidth-bound stage (functions/minhash.py).
        # fs has the same per-doc multiset as flat_sh, so sh_doc_offs
        # still describes it.
        u_minhash = oph_signatures_from_flat(
            fs, sh_doc_offs, cfg.minhash_num_perms, values_ascending=True)
    else:
        u_minhash = minhasher.signatures_from_flat(flat_sh, sh_doc_offs)
    u_bands = band_hashes_from_minhash(u_minhash, cfg.lsh_bands, cfg.lsh_rows)
    keep = np.r_[True, (fd[1:] != fd[:-1]) | (fs[1:] != fs[:-1])] \
        if fs.size else np.empty(0, dtype=bool)
    sh_values = fs[keep]
    u_nsh = np.bincount(fd[keep], minlength=n_u).astype(np.int32)

    sel = pa.array(row_to_uniq)
    cols = {name: batch[name] for name in batch.column_names
            if name != text_col}
    cols["text_sha256"] = pc.take(
        pa.array(u_sha, type=pa.string()), sel
    )
    cols["simhash"] = pa.array(u_simhash[row_to_uniq], type=pa.uint64())
    cols["band_hashes"] = pa.FixedSizeListArray.from_arrays(
        pa.array(u_bands[row_to_uniq].reshape(-1), type=pa.uint64()),
        cfg.lsh_bands,
    )
    if keep_minhash:
        cols["minhash"] = pa.FixedSizeListArray.from_arrays(
            pa.array(u_minhash[row_to_uniq].reshape(-1), type=pa.uint64()),
            cfg.minhash_num_perms,
        )
    # ListArray straight from offsets + concatenated values — boxing each
    # uint64 through Python (`.tolist()`) was a measured per-batch drag
    sh_offs = np.zeros(n_u + 1, dtype=np.int32)
    np.cumsum(u_nsh, out=sh_offs[1:])
    u_shingle_arr = pa.ListArray.from_arrays(
        pa.array(sh_offs), pa.array(sh_values, type=pa.uint64())
    )
    cols["shingle_hashes"] = pc.take(u_shingle_arr, sel)
    u_ntok = np.array([len(t) for t in token_lists], dtype=np.int32)
    cols["n_tokens"] = pa.array(u_ntok[row_to_uniq])
    cols["n_shingles"] = pa.array(u_nsh[row_to_uniq])
    return pa.table(cols)


def compute_signatures(ds, cfg: DedupConfig, text_col: str = "text",
                       keep_minhash: bool = False):
    """read → signature tasks. The raw text column is dropped in-stage so
    the wide shuffles that follow move hashes, not payloads — the single
    biggest byte-saver at 100 TB scale."""

    def fn(batch: pa.Table) -> pa.Table:
        return signature_batch(batch, cfg, text_col=text_col,
                               keep_minhash=keep_minhash)

    return ds.map_batches(fn, batch_format="pyarrow",
                          batch_size=cfg.batch_size)


class SignatureStage:
    """Actor-pool variant of the same kernel (kept for callers that want
    explicit pool sizing, e.g. constant-memory streaming over 100 TB)."""

    def __init__(self, cfg: DedupConfig, text_col: str = "text",
                 keep_minhash: bool = False):
        self.cfg = cfg
        self.text_col = text_col
        self.keep_minhash = keep_minhash
        _state_for(cfg)  # build state at actor init

    def __call__(self, batch: pa.Table) -> pa.Table:
        return signature_batch(batch, self.cfg, self.text_col,
                               self.keep_minhash)
