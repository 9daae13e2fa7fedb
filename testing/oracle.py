"""Single-process brute-force oracle for the near-dup pipeline.

Implements the same FROZEN semantics as the Ray pipeline (SURVEY §7.1) with
none of its machinery: no LSH, no banding, no shuffles — exhaustive
pairwise exact Jaccard over distinct texts via an inverted shingle index.
Tests assert the pipeline's pair set reaches recall >= 0.99 (and exact
precision) against this oracle, which is the BASELINE.json contract.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

from raydedup.config import DedupConfig
from raydedup.functions.minhash import shingle_hashes_ref
from raydedup.state.unionfind import UnionFind
from raydedup.textnorm import full_tokenize

import hashlib


def row_key_of(conv_id: str, turn_idx: int) -> str:
    return f"{conv_id}:{turn_idx}"


def shingle_hash_set(text: str, cfg: DedupConfig) -> frozenset[int]:
    toks = full_tokenize(text, stemming=cfg.stemming,
                         remove_stopwords=cfg.remove_stopwords)
    if not toks:
        return frozenset()
    return frozenset(shingle_hashes_ref(toks, cfg.minhash_shingle_words))


def oracle_near_dup(table: pa.Table, cfg: DedupConfig,
                    key_cols=("conv_id", "turn_idx"), text_col="text"):
    """→ dict with exact groups, verified near-dup pairs (between exact-dup
    representatives), and per-row cluster assignments."""
    keys = [
        ":".join(str(table[c][i].as_py()) for c in key_cols)
        for i in range(table.num_rows)
    ]
    texts = [t if t is not None else "" for t in table[text_col].to_pylist()]

    # exact groups by sha256; representative = min key
    by_sha: dict[str, list[int]] = defaultdict(list)
    for i, t in enumerate(texts):
        by_sha[hashlib.sha256(t.encode()).hexdigest()].append(i)
    rep_of_row: dict[str, str] = {}
    reps: dict[str, str] = {}  # rep_key -> text
    for rows in by_sha.values():
        rep = min(keys[i] for i in rows)
        for i in rows:
            rep_of_row[keys[i]] = rep
        reps[rep] = texts[rows[0]]

    # distinct-text shingle sets
    shingles = {k: shingle_hash_set(t, cfg) for k, t in reps.items()}

    # inverted index → candidate pairs sharing >= 1 shingle
    index: dict[int, list[str]] = defaultdict(list)
    for k, s in shingles.items():
        for h in s:
            index[h].append(k)
    common: dict[tuple[str, str], int] = defaultdict(int)
    for docs in index.values():
        if len(docs) < 2:
            continue
        docs = sorted(docs)
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                common[(docs[i], docs[j])] += 1

    pairs: dict[tuple[str, str], float] = {}
    thr = cfg.jaccard_dup_threshold
    for (a, b), c in common.items():
        union = len(shingles[a]) + len(shingles[b]) - c
        jac = c / union if union else 0.0
        if jac >= thr:
            pairs[(a, b)] = jac

    # components over (exact membership ∪ near-dup pairs)
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    comp = uf.components()
    clusters = {k: comp.get(rep, rep) for k, rep in rep_of_row.items()}
    return {
        "rep_of_row": rep_of_row,
        "pairs": pairs,
        "clusters": clusters,
    }


def pair_recall(expected: set[tuple[str, str]],
                got: set[tuple[str, str]]) -> float:
    if not expected:
        return 1.0
    return len(expected & got) / len(expected)
