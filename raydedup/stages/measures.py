"""Group-wise anchor measures — the reference's "TimeMap measures"
(otmt/timemap_measures.py:105-970) re-expressed Ray-Data-first.

Template parity (compute_score_across_TimeMap, timemap_measures.py:105-232):
within each conversation (≡ TimeMap) the ANCHOR is the min-turn_idx row
(≡ first memento); every member is scored against it. An anchor whose
prepared data is empty poisons the whole group for that measure — every
member gets an error instead of a score (timemap_measures.py:161-176);
an individual member with empty data still gets a score (the score
functions define both-empty → 0 / identity semantics, e.g.
timemap_measures.py:274-318).

Execution shape: a stateless vectorized PREP ``map_batches`` computes all
per-row features once (token lists, counts, simhashes); ONE
``groupby(conv_id).map_groups`` then scores every requested measure inside
the group task — conversations are small (SURVEY §4.1 memory note), so the
group fits trivially and measures that need the whole group corpus
(cosine TF-IDF, LSI, LDA — group-local model fits, timemap_measures.py:
547-893) run in the same task with zero extra shuffles.

Output: one row per input row with ``<measure>`` (float64, null on error)
and ``<measure>_error`` (string, null when scored) columns.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.config import DedupConfig, DEFAULT_CONFIG
from raydedup.functions.setsim import (
    jaccard_distance,
    levenshtein_tokens,
    nlevenshtein_tokens,
    sorensen_distance,
    tfintersection,
)
from raydedup.functions.simhash import simhash64_batch, hamming_distance, _md5_low64
from raydedup.textnorm import full_tokenize

ANCHOR_EMPTY_ERROR = "anchor row has no content after preparation"

RAW_MEASURES = {"bytecount", "raw_simhash"}
TOKEN_MEASURES = {
    "wordcount", "jaccard", "sorensen", "levenshtein", "nlevenshtein",
    "tfintersection", "tf_simhash", "cosine", "gensim_lsi", "gensim_lda",
}
ALL_MEASURES = sorted(RAW_MEASURES | TOKEN_MEASURES)


def tf_simhash_of_tokens(tokens: list[str], cache: dict[str, int]) -> int:
    """Simhash built from token FEATURES (each occurrence votes weight 1) —
    the reference's Simhash(list) call path (timemap_measures.py:262-272)."""
    return int(tf_simhash_batch([tokens], cache)[0])


def tf_simhash_batch(token_lists: list[list[str]],
                     cache: dict[str, int]) -> np.ndarray:
    """Vectorized tf_simhash over many token lists: every token OCCURRENCE
    votes weight 1 (identical sums to weighting distinct tokens by count);
    instance lookups run through one C-speed ``pc.dictionary_encode`` so
    the md5/cache loop touches only batch-DISTINCT tokens. Empty token
    lists are empty vote segments → all sums 0, strict >0 rule → 0."""
    from raydedup.functions.simhash import bit_vote_batch

    n = len(token_lists)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.array([len(t) for t in token_lists], dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = [t for lst in token_lists for t in lst]
    if not flat:
        return np.zeros(n, dtype=np.uint64)
    enc = pc.dictionary_encode(pa.array(flat, type=pa.string()))
    idx = enc.indices.to_numpy().astype(np.int64)
    get = cache.get
    dvals = enc.dictionary.to_pylist()
    dh = np.empty(len(dvals), dtype=np.uint64)
    for i, s in enumerate(dvals):
        h = get(s)
        if h is None:
            h = _md5_low64(s)
            cache[s] = h
        dh[i] = h
    hashes = dh[idx]
    return bit_vote_batch(hashes, np.ones(hashes.size, dtype=np.int32),
                          offsets)


# per-worker-process hash caches (deterministic content; process reuse only
# skips rebuild — same stateless-task-with-module-state pattern as
# stages/signatures.py, chosen over an actor pool for zero spin-up latency)
_SIMHASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CACHE: dict[str, int] = {}


FULL_FEATURES = frozenset(("tokens", "raw", "tf"))


def features_needed(measures: list[str],
                    keep_features: bool = False) -> frozenset:
    """Which prep features a measure set actually reads: ``tokens`` for
    every TOKEN_MEASURE, ``raw`` for raw_simhash (and keep_features'
    ``memento_simhash`` output column), ``tf`` for tf_simhash. Gating the
    prep on this skips the most expensive kernels when they're unused —
    e.g. a bytecount-only pass never tokenizes or simhashes at all."""
    ms = set(measures)
    need = set()
    if ms & TOKEN_MEASURES:
        need.add("tokens")
    if "raw_simhash" in ms or keep_features:
        need.add("raw")
    if "tf_simhash" in ms:
        need.add("tf")
        need.add("tokens")
    return frozenset(need)


def measure_prep_batch(batch: pa.Table, cfg: DedupConfig,
                       text_col: str = "text",
                       need: frozenset = FULL_FEATURES) -> pa.Table:
    """Per-row feature extraction for the measure stage. Tokenization and
    both simhashes run once per DISTINCT text in the batch and scatter to
    rows (identical text ⇒ identical features by construction; dedup
    corpora repeat texts heavily, same pattern as the signature stage).
    ``need`` gates the feature kernels (see ``features_needed``); the
    output schema is constant for a given ``need``."""
    texts = ["" if t is None else t for t in batch[text_col].to_pylist()]
    uniq_index: dict[str, int] = {}
    row_to_uniq = np.empty(len(texts), dtype=np.int64)
    uniq_texts: list[str] = []
    for i, t in enumerate(texts):
        j = uniq_index.get(t)
        if j is None:
            j = len(uniq_texts)
            uniq_index[t] = j
            uniq_texts.append(t)
        row_to_uniq[i] = j

    sel = pa.array(row_to_uniq)
    cols = {n: batch[n] for n in batch.column_names if n != text_col}
    cols["n_chars"] = pc.take(
        pa.array([len(t) for t in uniq_texts], type=pa.int64()), sel)
    if "tokens" in need:
        token_lists = [
            full_tokenize(t, cfg.stemming, cfg.remove_stopwords)
            for t in uniq_texts
        ]
        cols["tokens"] = pc.take(
            pa.array(token_lists, type=pa.list_(pa.string())), sel)
        cols["n_tokens"] = pc.take(
            pa.array([len(t) for t in token_lists], type=pa.int32()), sel)
    if "raw" in need:
        u_raw = simhash64_batch(uniq_texts, cfg.simhash_shingle_width,
                                _SIMHASH_CACHE)
        cols["raw_simhash_val"] = pa.array(u_raw[row_to_uniq])
    if "tf" in need:
        if "tokens" not in need:  # tf implies token lists even if unemitted
            token_lists = [
                full_tokenize(t, cfg.stemming, cfg.remove_stopwords)
                for t in uniq_texts
            ]
        u_tf = tf_simhash_batch(token_lists, _TOKEN_HASH_CACHE)
        cols["tf_simhash_val"] = pa.array(u_tf[row_to_uniq])
    return pa.table(cols)


def _ratio_score(member: int, anchor: int) -> float:
    # both-empty → 0; anchor-empty is poisoned before we get here
    if member == 0 and anchor == 0:
        return 0.0
    return member / anchor - 1.0


def _tfidf_cosine_scores(token_lists: list[list[str]]) -> list[float]:
    """Group-local TF-IDF (sklearn-default formula: raw tf,
    idf=ln((1+n)/(1+df))+1, l2 norm) + cosine of each doc vs doc 0 —
    reference semantics of compute_cosine_across_TimeMap
    (timemap_measures.py:547-711) re-derived with numpy."""
    vocab: dict[str, int] = {}
    for toks in token_lists:
        for t in toks:
            vocab.setdefault(t, len(vocab))
    n, v = len(token_lists), len(vocab)
    if v == 0:
        return [0.0] * n
    X = np.zeros((n, v), dtype=np.float64)
    for i, toks in enumerate(token_lists):
        for t in toks:
            X[i, vocab[t]] += 1.0
    df = (X > 0).sum(axis=0)
    idf = np.log((1.0 + n) / (1.0 + df)) + 1.0
    W = X * idf[None, :]
    norms = np.linalg.norm(W, axis=1)
    norms[norms == 0] = 1.0
    W = W / norms[:, None]
    return (W @ W[0]).tolist()


def _lsi_scores(token_lists: list[list[str]], num_topics: int = 10) -> list[float]:
    """Group-local LSI via exact truncated SVD of the BoW matrix; score =
    cosine similarity of each doc to doc 0 in topic space — the reference's
    gensim LsiModel(num_topics=10) + MatrixSimilarity path
    (timemap_measures.py:842-862) with the stochastic SVD replaced by the
    exact one.

    Parity argument (tested): whenever rank(BoW) <= num_topics — true for
    every TimeMap with <= 10 linearly independent mementos — ANY
    rank-k SVD projection is an isometry on the row space, so the
    topic-space cosine equals the plain BoW cosine; gensim's randomized
    SVD and this exact SVD provably agree there
    (tests/test_measures.py::test_lsi_equals_bow_cosine_when_rank_small).
    Above that rank gensim's one-pass randomized SVD (power_iters
    refinement) approximates the same exact SVD computed here; scores
    coincide to approximation error, with exact-SVD the better-conditioned
    of the two. LDA remains a documented stand-in: gensim LdaModel is
    nondeterministic and the reference's own tests only bound its score
    (tests/timemap_measures_test.py:33-42)."""
    vocab: dict[str, int] = {}
    for toks in token_lists:
        for t in toks:
            vocab.setdefault(t, len(vocab))
    n, v = len(token_lists), len(vocab)
    if v == 0:
        return [0.0] * n
    X = np.zeros((n, v), dtype=np.float64)
    for i, toks in enumerate(token_lists):
        for t in toks:
            X[i, vocab[t]] += 1.0
    k = min(num_topics, n, v)
    # docs projected on the top-k right singular vectors
    _, _, vt = np.linalg.svd(X, full_matrices=False)
    proj = X @ vt[:k].T
    norms = np.linalg.norm(proj, axis=1)
    norms[norms == 0] = 1.0
    proj = proj / norms[:, None]
    return (proj @ proj[0]).tolist()


def _lda_scores(token_lists: list[list[str]], num_topics: int = 2,
                iters: int = 30, seed: int = 7) -> list[float]:
    """Deterministic 2-topic pLSA-style EM as the engine's stand-in for the
    reference's gensim LdaModel(num_topics=2) — which is NONdeterministic
    (its own tests only bound the score, reference
    tests/timemap_measures_test.py:33-42). Score = cosine of each doc's
    topic mixture vs doc 0's."""
    vocab: dict[str, int] = {}
    for toks in token_lists:
        for t in toks:
            vocab.setdefault(t, len(vocab))
    n, v = len(token_lists), len(vocab)
    if v == 0:
        return [0.0] * n
    X = np.zeros((n, v), dtype=np.float64)
    for i, toks in enumerate(token_lists):
        for t in toks:
            X[i, vocab[t]] += 1.0
    rng = np.random.default_rng(seed)
    phi = rng.dirichlet(np.ones(v), size=num_topics)          # topic-word
    theta = np.full((n, num_topics), 1.0 / num_topics)        # doc-topic
    for _ in range(iters):
        # E: responsibilities per (doc, word, topic) via matrix form
        # p[d, w, t] ∝ theta[d, t] * phi[t, w]
        weighted = theta[:, :, None] * phi[None, :, :]        # (n, T, v)
        denom = weighted.sum(axis=1, keepdims=True)
        denom[denom == 0] = 1.0
        resp = weighted / denom
        # M
        counts = resp * X[:, None, :]                         # (n, T, v)
        theta = counts.sum(axis=2) + 1e-9
        theta = theta / theta.sum(axis=1, keepdims=True)
        phi = counts.sum(axis=0) + 1e-9
        phi = phi / phi.sum(axis=1, keepdims=True)
    norms = np.linalg.norm(theta, axis=1)
    norms[norms == 0] = 1.0
    T = theta / norms[:, None]
    return (T @ T[0]).tolist()


def _score_group(group: pa.Table, measures: list[str],
                 keep_features: bool = False) -> pa.Table:
    order = np.argsort(group["turn_idx"].to_numpy(), kind="stable")
    n = group.num_rows
    idx = [int(i) for i in order]
    names = group.column_names
    tokens = group["tokens"].to_pylist() if "tokens" in names else None
    n_chars = group["n_chars"].to_numpy()
    n_tokens = (group["n_tokens"].to_numpy()
                if "n_tokens" in names else np.zeros(n, dtype=np.int64))
    raw_sim = (group["raw_simhash_val"].to_numpy(zero_copy_only=False)
               if "raw_simhash_val" in names else None)
    tf_sim = (group["tf_simhash_val"].to_numpy(zero_copy_only=False)
              if "tf_simhash_val" in names else None)

    a = idx[0]  # anchor = min turn_idx
    # combine_chunks: passthrough columns are zero-copy slices of the group
    # block; Ray's buffer-slicing serialization trips on them (ArrowIndexError)
    out: dict[str, pa.Array] = {
        "conv_id": group["conv_id"].combine_chunks(),
        "turn_idx": group["turn_idx"].combine_chunks(),
        "row_key": group["row_key"].combine_chunks(),
    }

    def emit(name: str, scores_by_row: dict[int, float] | None, err: bool):
        if err:
            out[name] = pa.array([None] * n, type=pa.float64())
            out[name + "_error"] = pa.array([ANCHOR_EMPTY_ERROR] * n,
                                            type=pa.string())
        else:
            out[name] = pa.array(
                [scores_by_row.get(i) for i in range(n)], type=pa.float64()
            )
            out[name + "_error"] = pa.array([None] * n, type=pa.string())

    group_scores_cache: dict[str, list[float]] = {}

    for m in measures:
        raw = m in RAW_MEASURES
        anchor_empty = (n_chars[a] == 0) if raw else (n_tokens[a] == 0)
        # group-corpus measures keep reference anchor-empty semantics too
        if anchor_empty:
            emit(m, None, err=True)
            continue
        scores: dict[int, float] = {}
        if m == "bytecount":
            for i in idx:
                scores[i] = _ratio_score(int(n_chars[i]), int(n_chars[a]))
        elif m == "wordcount":
            for i in idx:
                scores[i] = _ratio_score(int(n_tokens[i]), int(n_tokens[a]))
        elif m == "jaccard":
            sa = set(tokens[a])
            for i in idx:
                scores[i] = jaccard_distance(sa, tokens[i])
        elif m == "sorensen":
            sa = set(tokens[a])
            for i in idx:
                scores[i] = sorensen_distance(sa, tokens[i])
        elif m == "levenshtein":
            for i in idx:
                scores[i] = float(levenshtein_tokens(tokens[a], tokens[i]))
        elif m == "nlevenshtein":
            for i in idx:
                scores[i] = nlevenshtein_tokens(tokens[a], tokens[i])
        elif m == "tfintersection":
            for i in idx:
                scores[i] = float(tfintersection(tokens[a], tokens[i]))
        elif m == "raw_simhash":
            for i in idx:
                scores[i] = float(hamming_distance(int(raw_sim[a]), int(raw_sim[i])))
        elif m == "tf_simhash":
            for i in idx:
                scores[i] = float(hamming_distance(int(tf_sim[a]), int(tf_sim[i])))
        elif m in ("cosine", "gensim_lsi", "gensim_lda"):
            if m not in group_scores_cache:
                ordered_tokens = [tokens[i] for i in idx]
                if m == "cosine":
                    vals = _tfidf_cosine_scores(ordered_tokens)
                elif m == "gensim_lsi":
                    vals = _lsi_scores(ordered_tokens)
                else:
                    vals = _lda_scores(ordered_tokens)
                group_scores_cache[m] = vals
            vals = group_scores_cache[m]
            for pos, i in enumerate(idx):
                scores[i] = float(vals[pos])
        else:
            raise ValueError(f"unknown measure {m!r}")
        emit(m, scores, err=False)

    if keep_features:
        out["content_length"] = pa.array(n_chars, type=pa.int64())
        out["memento_simhash"] = pa.array(raw_sim.astype(np.uint64))
    return pa.table(out)


GROUP_CORPUS_MEASURES = {"cosine", "gensim_lsi", "gensim_lda"}


_LOOP_MEASURES = {"levenshtein", "nlevenshtein", "tfintersection"}

# per-worker cache of Arrow/numpy structures derived from a broadcast
# anchor payload, keyed by ObjectRef id: the payload itself is plain
# numpy/python (plasma-friendly); the pa.StringArray used by index_in is
# rebuilt once per worker, not once per batch. Size-1: only one broadcast
# payload is live per run, and unbounded ref-keyed growth would leak one
# corpus-anchor-sized tuple per invocation in long-lived workers.
_ANCHOR_DERIVED_CACHE: dict[bytes, tuple] = {}


def _segment_sorted_unique(codes: np.ndarray,
                           offs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(flat codes, offsets) → per-segment SORTED-UNIQUE (flat, offsets):
    one lexsort + boundary diff over (segment, code), no per-row
    ``np.unique`` loop (same pattern as the signature stage)."""
    n_rows = offs.size - 1
    if codes.size == 0:
        return codes.astype(np.uint64), np.zeros(n_rows + 1, dtype=np.int64)
    row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offs))
    order = np.lexsort((codes, row_ids))
    fc, fr = codes[order], row_ids[order]
    keep = np.r_[True, (fr[1:] != fr[:-1]) | (fc[1:] != fc[:-1])]
    fc, fr = fc[keep], fr[keep]
    counts = np.bincount(fr, minlength=n_rows)
    return fc.astype(np.uint64), np.r_[0, np.cumsum(counts)].astype(np.int64)


def _anchor_measures_broadcast(prepped, measures: list[str],
                               keep_features: bool = False):
    """Shuffle-free path for row-wise measures: the per-conversation
    anchors (min turn_idx) are a SMALL side — aggregate them, broadcast
    once via ``ray.put``, and score in a stateless ``map_batches``. Used
    whenever no group-corpus measure (cosine/LSI/LDA) is requested; those
    need the whole conversation in one task and take the groupby path.

    The scoring stage is VECTORIZED: ratio measures are numpy divides,
    simhash measures are popcount(xor) over the whole batch, and
    jaccard/sorensen dictionary-encode member+anchor tokens per batch and
    run ONE tiled sorted-intersection kernel (shared with LSH verify) for
    every row-vs-anchor pair. Only levenshtein/nlevenshtein/tfintersection
    (per-row DP / top-k semantics) fall back to a Python row loop.

    Scale assumption (documented): one anchor feature set per conversation
    fits the object store (conversations are ~10-50 turns, so anchors are
    2-10% of the corpus ... at extreme conversation counts force the
    groupby path via ``group_path=True``)."""
    import ray

    from raydedup.functions.simhash import hamming_batch
    from raydedup.stages.lsh import _tiled_intersections

    prepped = prepped.materialize()
    ms = set(measures)
    have_tokens = bool(ms & TOKEN_MEASURES)
    have_raw = "raw_simhash" in ms or keep_features
    have_tf = "tf_simhash" in ms
    need_sets = bool(ms & {"jaccard", "sorensen"})
    loop_ms = [m for m in measures if m in _LOOP_MEASURES]

    # per-batch partial min-turn + driver merge (a distributed groupby on
    # this skinny side costs more than the whole scoring pass)
    def partial_min(batch: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(
            batch.select(["conv_id", "turn_idx"]), "conv_id"
        ).aggregate([("turn_idx", "min")])
        # select by NAME: pyarrow group_by column order (keys first vs
        # last) has differed across versions
        return pa.table({"conv_id": agg["conv_id"],
                         "min_turn": agg["turn_idx_min"]})

    parts = list(
        prepped.select_columns(["conv_id", "turn_idx"])
        .map_batches(partial_min, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    merged = pa.TableGroupBy(
        pa.concat_tables(parts), "conv_id"
    ).aggregate([("min_turn", "min")])  # one C groupby, no row loop
    mt_vals = merged["min_turn_min"].to_numpy(
        zero_copy_only=False).astype(np.int64)
    mt_ref = ray.put((merged["conv_id"].to_pylist(), mt_vals))

    def pick_anchors(batch: pa.Table) -> pa.Table:
        key = mt_ref.binary()
        got = _ANCHOR_DERIVED_CACHE.get(key)
        if got is None:
            convs, vals = ray.get(mt_ref)
            got = (pa.array(convs, type=pa.string()), vals)
            _ANCHOR_DERIVED_CACHE.clear()
            _ANCHOR_DERIVED_CACHE[key] = got
        conv_arr, vals = got
        pos = pc.index_in(
            batch["conv_id"], value_set=conv_arr
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = vals[pos] == batch["turn_idx"].to_numpy().astype(np.int64)
        return batch.filter(pa.array(keep))

    # anchor payload: plain python/numpy only (plasma zero-copy friendly)
    a_convs: list[str] = []
    a_chars: list[int] = []
    a_ntok: list[int] = []
    a_raw: list[int] = []
    a_tf: list[int] = []
    a_tok_full: list[list[str]] = []
    seen: set[str] = set()
    for b in prepped.map_batches(
        pick_anchors, batch_format="pyarrow"
    ).iter_batches(batch_size=4096, batch_format="pyarrow"):
        cs = b["conv_id"].to_pylist()
        ncs = b["n_chars"].to_pylist()
        nts = b["n_tokens"].to_pylist() if have_tokens else None
        tks = b["tokens"].to_pylist() if have_tokens else None
        rws = b["raw_simhash_val"].to_pylist() if have_raw else None
        tfs = b["tf_simhash_val"].to_pylist() if have_tf else None
        for i, c in enumerate(cs):
            if c in seen:  # first min-turn row wins (groupby-path parity)
                continue
            seen.add(c)
            a_convs.append(c)
            a_chars.append(ncs[i])
            a_ntok.append(nts[i] if nts is not None else 0)
            a_tok_full.append(tks[i] if tks is not None else [])
            a_raw.append(rws[i] if rws is not None else 0)
            a_tf.append(tfs[i] if tfs is not None else 0)
    a_ref = ray.put((
        a_convs,
        np.asarray(a_chars, dtype=np.int64),
        np.asarray(a_ntok, dtype=np.int64),
        np.asarray(a_raw, dtype=np.uint64),
        np.asarray(a_tf, dtype=np.uint64),
        a_tok_full,
        [sorted(set(t)) for t in a_tok_full] if need_sets else None,
    ))

    def derived():
        key = a_ref.binary()
        got = _ANCHOR_DERIVED_CACHE.get(key)
        if got is None:
            convs, chars, ntok, raw, tf, tok_full, tok_dist = ray.get(a_ref)
            got = (pa.array(convs, type=pa.string()), chars, ntok, raw, tf,
                   tok_full, tok_dist)
            _ANCHOR_DERIVED_CACHE.clear()
            _ANCHOR_DERIVED_CACHE[key] = got
        return got

    def score(batch: pa.Table) -> pa.Table:
        conv_pa, A_chars, A_ntok, A_raw, A_tf, A_tok, A_dist = derived()
        n = batch.num_rows
        if n == 0:
            def _ty(name, default):
                return (batch.schema.field(name).type
                        if name in batch.column_names else default)
            cols = {
                "conv_id": pa.array([], type=_ty("conv_id", pa.string())),
                "turn_idx": pa.array([], type=_ty("turn_idx", pa.int32())),
                "row_key": pa.array([], type=_ty("row_key", pa.string())),
            }
            for m in measures:
                cols[m] = pa.array([], type=pa.float64())
                cols[m + "_error"] = pa.array([], type=pa.string())
            if keep_features:
                cols["content_length"] = pa.array([], type=pa.int64())
                cols["memento_simhash"] = pa.array([], type=pa.uint64())
            return pa.table(cols)

        aidx = pc.index_in(
            batch["conv_id"], value_set=conv_pa
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        n_chars = batch["n_chars"].to_numpy().astype(np.int64)
        raw_empty = A_chars[aidx] == 0
        if have_tokens:
            n_tokens = batch["n_tokens"].to_numpy().astype(np.int64)
            tok_empty = A_ntok[aidx] == 0
        out = {
            "conv_id": batch["conv_id"].combine_chunks(),
            "turn_idx": batch["turn_idx"].combine_chunks(),
            "row_key": batch["row_key"].combine_chunks(),
        }

        def emit(name: str, vals: np.ndarray, empty: np.ndarray) -> None:
            out[name] = pa.array(vals, type=pa.float64(),
                                 mask=empty)
            out[name + "_error"] = pc.if_else(
                pa.array(empty), pa.scalar(ANCHOR_EMPTY_ERROR),
                pa.scalar(None, type=pa.string()))

        jac = sor = None
        if need_sets:
            tok_col = batch["tokens"].combine_chunks()
            lens = pc.list_value_length(tok_col).to_numpy().astype(np.int64)
            m_offs = np.r_[0, np.cumsum(lens)]
            m_flat = pc.list_flatten(tok_col)
            uniq_a, inv = np.unique(aidx, return_inverse=True)
            a_lists = [A_dist[i] for i in uniq_a]
            a_lens = np.fromiter((len(t) for t in a_lists), dtype=np.int64,
                                 count=len(a_lists))
            a_offs = np.r_[0, np.cumsum(a_lens)]
            a_flat = pa.array(
                [t for lst in a_lists for t in lst], type=pa.string())
            all_vals = pa.concat_arrays(
                [m_flat.combine_chunks()
                 if isinstance(m_flat, pa.ChunkedArray) else m_flat, a_flat])
            codes = pc.dictionary_encode(all_vals).indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
            m_total = int(m_offs[-1])
            m_u, m_u_offs = _segment_sorted_unique(codes[:m_total], m_offs)
            a_u, a_u_offs = _segment_sorted_unique(codes[m_total:], a_offs)
            flat = np.concatenate([m_u, a_u])
            offs = np.r_[m_u_offs, m_u_offs[-1] + a_u_offs[1:]]
            pi = np.arange(n, dtype=np.int64)
            pj = n + inv
            la = offs[pi + 1] - offs[pi]
            lb = offs[pj + 1] - offs[pj]

            def fill(row: np.ndarray, i: int) -> None:
                k = la[i]
                row[:k] = flat[offs[pi[i]]: offs[pi[i] + 1]]
                row[k: k + lb[i]] = flat[offs[pj[i]]: offs[pj[i] + 1]]

            inter = _tiled_intersections(la, lb, fill)
            union = la + lb - inter
            jac = np.where(union > 0,
                           1.0 - inter / np.maximum(union, 1), 0.0)
            sor = np.where(la + lb > 0,
                           1.0 - 2.0 * inter / np.maximum(la + lb, 1), 0.0)

        loop_vals: dict[str, np.ndarray] = {}
        if loop_ms:
            toks_py = batch["tokens"].to_pylist()
            for m in loop_ms:
                loop_vals[m] = np.empty(n, dtype=np.float64)
            for i in range(n):
                a_toks = A_tok[aidx[i]]
                for m in loop_ms:
                    if m == "levenshtein":
                        loop_vals[m][i] = float(
                            levenshtein_tokens(a_toks, toks_py[i]))
                    elif m == "nlevenshtein":
                        loop_vals[m][i] = nlevenshtein_tokens(
                            a_toks, toks_py[i])
                    else:
                        loop_vals[m][i] = float(
                            tfintersection(a_toks, toks_py[i]))

        for m in measures:
            if m == "bytecount":
                denom = np.maximum(A_chars[aidx], 1)
                emit(m, n_chars / denom - 1.0, raw_empty)
            elif m == "wordcount":
                denom = np.maximum(A_ntok[aidx], 1)
                emit(m, n_tokens / denom - 1.0, tok_empty)
            elif m == "jaccard":
                emit(m, jac, tok_empty)
            elif m == "sorensen":
                emit(m, sor, tok_empty)
            elif m == "raw_simhash":
                raw_np = batch["raw_simhash_val"].to_numpy(
                    zero_copy_only=False).astype(np.uint64)
                emit(m, hamming_batch(raw_np, A_raw[aidx]).astype(
                    np.float64), raw_empty)
            elif m == "tf_simhash":
                tf_np = batch["tf_simhash_val"].to_numpy(
                    zero_copy_only=False).astype(np.uint64)
                emit(m, hamming_batch(tf_np, A_tf[aidx]).astype(
                    np.float64), tok_empty)
            else:
                emit(m, loop_vals[m], tok_empty)

        if keep_features:
            out["content_length"] = pa.array(n_chars, type=pa.int64())
            out["memento_simhash"] = pa.array(
                batch["raw_simhash_val"].to_numpy(
                    zero_copy_only=False).astype(np.uint64))
        return pa.table(out)

    return prepped.map_batches(score, batch_format="pyarrow")


def anchor_measures(ds, measures: list[str] | None = None,
                    cfg: DedupConfig = DEFAULT_CONFIG,
                    text_col: str = "text",
                    group_path: bool = False,
                    keep_features: bool = False):
    """transcripts (with row_key) → per-row measure scores vs the
    conversation anchor. ``measures`` defaults to ALL_MEASURES.

    Execution: row-wise measures take the broadcast-anchor path (no
    shuffle); any group-corpus measure (cosine/LSI/LDA) in the list — or
    ``group_path=True`` — switches to ``groupby(conv_id).map_groups``.
    """
    measures = measures or ALL_MEASURES
    unknown = set(measures) - set(ALL_MEASURES)
    if unknown:
        raise ValueError(f"unknown measures: {sorted(unknown)}")
    need = features_needed(measures, keep_features)
    prepped = ds.map_batches(
        lambda b: measure_prep_batch(b, cfg, text_col, need),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    if not group_path and not (set(measures) & GROUP_CORPUS_MEASURES):
        return _anchor_measures_broadcast(prepped, measures, keep_features)

    def score(group: pa.Table) -> pa.Table:
        return _score_group(group, measures, keep_features)

    return prepped.groupby("conv_id").map_groups(score, batch_format="pyarrow")
