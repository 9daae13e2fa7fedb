"""Signature stage: per-row text → (sha256, simhash64, minhash, shingle hashes).

The engine's replacement for the reference's per-memento Simhash pass
(otmt/metadata_calcluations.py:20-67) plus the prep work its per-pair
Jaccard would redo for every comparison (otmt/timemap_measures.py:45-62,
380-401): tokenization, shingling and hashing happen ONCE per row here, and
every downstream comparison is hash arithmetic.

Ray Data shape: a CALLABLE CLASS passed to ``map_batches`` → actor pool.
``__init__`` (once per actor) builds the MinHasher permutation table and the
shingle-hash caches; ``__call__`` (per batch) is numpy-vectorized. Batches
are Arrow in / Arrow out (zero-copy from the object store).

Output schema (key columns passed through):
    text_sha256: string (hex)     — exact-dup key
    simhash:     uint64           — reference-parity 64-bit simhash
    minhash:     fixed_size_list<uint64, K>
    shingle_hashes: list<uint64>  — sorted unique 64-bit shingle hashes
                                    (exact Jaccard on these ≡ exact shingle
                                    Jaccard w.h.p.; avoids re-tokenizing in
                                    the verify stage)
    n_tokens, n_shingles: int32
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from raydedup.config import DedupConfig
from raydedup.functions.minhash import MinHasher
from raydedup.functions.simhash import simhash64_batch
from raydedup.textnorm import full_tokenize, word_shingles


class SignatureStage:
    """Stateful signature computer; one instance per actor."""

    def __init__(self, cfg: DedupConfig, text_col: str = "text"):
        self.cfg = cfg
        self.text_col = text_col
        self.minhasher = MinHasher(cfg.minhash_num_perms, cfg.minhash_seed)
        self.simhash_cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        texts = batch[self.text_col].to_pylist()
        texts = ["" if t is None else t for t in texts]

        sha = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts]
        simhashes = simhash64_batch(
            texts, width=cfg.simhash_shingle_width, cache=self.simhash_cache
        )

        token_lists = [
            full_tokenize(t, stemming=cfg.stemming,
                          remove_stopwords=cfg.remove_stopwords)
            for t in texts
        ]
        shingle_lists = [
            word_shingles(toks, cfg.minhash_shingle_words) if toks else []
            for toks in token_lists
        ]
        minhash = self.minhasher.signatures_batch(shingle_lists)

        # sorted unique shingle hashes per row (for the exact-Jaccard verify)
        shingle_hash_lists = []
        base = self.minhasher._base_hashes
        for shingles in shingle_lists:
            if shingles:
                shingle_hash_lists.append(np.unique(base(shingles)))
            else:
                shingle_hash_lists.append(np.empty(0, dtype=np.uint64))

        n_tokens = pa.array([len(t) for t in token_lists], type=pa.int32())
        n_shingles = pa.array([len(s) for s in shingle_hash_lists], type=pa.int32())

        cols = {name: batch[name] for name in batch.column_names}
        cols["text_sha256"] = pa.array(sha, type=pa.string())
        cols["simhash"] = pa.array(simhashes, type=pa.uint64())
        cols["minhash"] = pa.FixedSizeListArray.from_arrays(
            pa.array(minhash.reshape(-1), type=pa.uint64()), cfg.minhash_num_perms
        )
        cols["shingle_hashes"] = pa.array(
            [h.tolist() for h in shingle_hash_lists], type=pa.list_(pa.uint64())
        )
        cols["n_tokens"] = n_tokens
        cols["n_shingles"] = n_shingles
        return pa.table(cols)


def compute_signatures(ds, cfg: DedupConfig, text_col: str = "text",
                       keep_text: bool = False):
    """read → signature actor pool. Drops the raw text column afterwards
    (unless ``keep_text``) so the wide shuffles that follow move hashes,
    not payloads — the single biggest byte-saver at 100 TB scale."""
    out = ds.map_batches(
        SignatureStage,
        fn_constructor_kwargs={"cfg": cfg, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        # autoscaling actor pool: grows to the CPU budget under load, so
        # the same code paces itself at num_cpus=8 and num_cpus=32
        concurrency=cfg.signature_concurrency or (1, 32),
        num_cpus=1,
    )
    if not keep_text:
        out = out.drop_columns([text_col])
    return out
