"""Per-document text analysis for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

These are new-engine first-class operators (task brief: "text analysis")
layered on the same vectorized map_batches idiom as the dedup stages. The
quality/token kernels are deliberately expressible in ANSI SQL so the
DuckDB oracle can verify them value-for-value; language ID and rolling-hash
fingerprints are rows-only-checked (non-SQL).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.textnorm import STOPWORDS

# --- token counting -------------------------------------------------------

_WS_RE = re.compile(r"\s+")
# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def token_counts(ds, text_col: str = "text"):
    """whitespace token count + BPE-ish regex token count per row.
    SQL mirror: length(regexp_extract_all(...)) with the same patterns."""

    def count(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch[text_col].to_pylist()]
        ws = [len([w for w in _WS_RE.split(t) if w]) for t in texts]
        bpe = [len(_BPE_RE.findall(t)) for t in texts]
        cols = {n: batch[n] for n in batch.column_names if n != text_col}
        cols["ws_tokens"] = pa.array(ws, type=pa.int64())
        cols["bpe_tokens"] = pa.array(bpe, type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(count, batch_format="pyarrow")


# --- quality scoring ------------------------------------------------------


def quality_scores(ds, text_col: str = "text"):
    """length / punctuation-ratio / stopword-ratio / mean-word-length
    heuristics (the standard Gopher/C4-style quality signals, computed
    vectorized). All four are SQL-mirrorable."""

    def score(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch[text_col].to_pylist()]
        n_chars = np.array([len(t) for t in texts], dtype=np.int64)
        words = [t.lower().split() for t in texts]
        n_words = np.array([len(w) for w in words], dtype=np.int64)
        n_stop = np.array(
            [sum(1 for w in ws if w in STOPWORDS) for ws in words], dtype=np.int64
        )
        n_punct = np.array(
            [sum(1 for ch in t if ch in ".,;:!?'\"()[]{}") for t in texts],
            dtype=np.int64,
        )
        total_word_chars = np.array(
            [sum(len(w) for w in ws) for ws in words], dtype=np.int64
        )
        denom_w = np.maximum(n_words, 1).astype(np.float64)
        denom_c = np.maximum(n_chars, 1).astype(np.float64)
        cols = {n: batch[n] for n in batch.column_names if n != text_col}
        cols["n_chars_q"] = pa.array(n_chars)
        cols["n_words"] = pa.array(n_words)
        cols["stopword_ratio"] = pa.array(n_stop / denom_w)
        cols["punct_ratio"] = pa.array(n_punct / denom_c)
        cols["mean_word_len"] = pa.array(total_word_chars / denom_w)
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


# --- language identification ---------------------------------------------

# Deterministic two-stage classifier (reference analogue: langdetect.detect
# per memento, otmt/metadata_calcluations.py:117-164):
#   1. script detection over the first 400 chars (hiragana/katakana → ja,
#      hangul → ko, CJK ideographs → zh, Cyrillic → ru);
#   2. function-word profile scoring for Latin-script languages: the
#      distinct lowercased words are intersected with each language's
#      marker set (high-frequency function words — public knowledge);
#      label = first language (fixed order) with the maximal nonzero hit
#      count, else 'unknown'.
# Both stages are deliberately SQL-expressible so the DuckDB oracle checks
# the exact same decision function value-for-value.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ("the and of to in is you that it he was for on are with as at "
           "be this have from they which not but had his her").split(),
    "de": ("der die und das ist nicht ein ich zu mit den von sie dem auf "
           "für werden eine als auch sich nach bei einem wurde").split(),
    "es": ("el la los las de que y en un ser por con para una su del "
           "está como más pero sus le ha este cuando").split(),
    "fr": ("le la les des et en un du est une dans que pour qui sur pas "
           "plus par avec au ce il se ne sont cette").split(),
    "it": ("il di che la e un per con del non una sono nel alla più "
           "anche come dalla gli della le si da questo").split(),
    "pt": ("o de que e do da em um para é com não uma os no se na por "
           "mais dos as ao como mas foi pelo").split(),
    "nl": ("de het een van ik je dat is en niet op te zijn met voor er "
           "maar om hij ook als dan nog naar bij uit").split(),
}

# script ranges, checked in this order over the first 400 chars
LANG_SCRIPTS: list[tuple[str, str, str]] = [
    ("ja", "぀", "ヿ"),  # hiragana + katakana
    ("ko", "가", "힯"),  # hangul syllables
    ("zh", "一", "鿿"),  # CJK unified ideographs
    ("ru", "Ѐ", "ӿ"),  # Cyrillic
]

_WORD_RE_PATTERN = r"[a-zà-ÿäöüß]+"


class LangId:
    """Actor-pool language classifier (stateful: compiled tables)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(_WORD_RE_PATTERN)
        self.markers = {k: set(v) for k, v in LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch[self.text_col].to_pylist()]
        langs = []
        for t in texts:
            head = t[:400]
            script = None
            for lang, lo, hi in LANG_SCRIPTS:
                if any(lo <= ch <= hi for ch in head):
                    script = lang
                    break
            if script is not None:
                langs.append(script)
                continue
            words = set(self.word_re.findall(t.lower()))
            best, best_hits = "unknown", 0
            for lang, markers in self.markers.items():
                hits = len(words & markers)
                if hits > best_hits:
                    best, best_hits = lang, hits
            langs.append(best)
        cols = {n: batch[n] for n in batch.column_names if n != self.text_col}
        cols["detected_lang"] = pa.array(langs, type=pa.string())
        return pa.table(cols)


def detect_language(ds, text_col: str = "text"):
    return ds.map_batches(
        LangId,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        concurrency=(1, 16),
        num_cpus=1,
    )


# --- document fingerprinting ---------------------------------------------


def fingerprints(ds, text_col: str = "text", k: int = 32, window: int = 64):
    """Winnowing-style rolling-hash fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — public algorithm): polynomial rolling hash over k-char
    grams, keep the min hash of each sliding window → compact doc sketch
    usable for plagiarism-style overlap detection."""
    B = np.uint64(1000003)

    def fp(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch[text_col].to_pylist()]
        sketches = []
        for t in texts:
            data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            if data.size < k:
                sketches.append([])
                continue
            # rolling polynomial hash of all k-grams, fully vectorized:
            # h[i] = sum data[i+j] * B^(k-1-j)
            powers = B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
            n = data.size - k + 1
            h = np.zeros(n, dtype=np.uint64)
            for j in range(k):
                h += data[j : j + n].astype(np.uint64) * powers[j]
            if h.size <= window:
                mins = np.unique(h.min(keepdims=True))
            else:
                w = np.lib.stride_tricks.sliding_window_view(h, window)
                mins = np.unique(w.min(axis=1))
            sketches.append(mins.tolist())
        cols = {n: batch[n] for n in batch.column_names if n != text_col}
        cols["fingerprints"] = pa.array(sketches, type=pa.list_(pa.uint64()))
        return pa.table(cols)

    return ds.map_batches(fp, batch_format="pyarrow")


# --- repetition stats (Gopher-style quality signals) ----------------------

_REP_WORD_RE = re.compile(r"[0-9a-zA-Z_]+")


def repetition_stats(ds, text_col: str = "text"):
    """Per-document repetition signals from the Gopher data-quality rules
    (Rae et al. 2021, public): duplicate-line fraction, most-frequent
    2-gram fraction, and duplicated-3-gram fraction. All three are pure
    counting over lines / lowercase ``\\w+`` tokens, so the DuckDB oracle
    recomputes them value-for-value.

    - ``dup_line_frac``  = 1 - distinct(non-empty lines)/count(non-empty
      lines) (0 when the document has no non-empty line)
    - ``top_2gram_frac`` = occurrences of the most frequent word 2-gram /
      total 2-gram occurrences (0 when fewer than 2 tokens)
    - ``dup_3gram_frac`` = fraction of 3-gram occurrences whose 3-gram
      occurs at least twice in the document (0 when fewer than 3 tokens)
    """

    def rep(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch[text_col].to_pylist()]
        n = len(texts)
        dl = np.zeros(n, dtype=np.float64)
        t2 = np.zeros(n, dtype=np.float64)
        d3 = np.zeros(n, dtype=np.float64)
        for i, t in enumerate(texts):
            lines = [ln for ln in t.split("\n") if ln]
            if lines:
                dl[i] = 1.0 - len(set(lines)) / len(lines)
            toks = _REP_WORD_RE.findall(t.lower())
            if len(toks) >= 2:
                counts: dict[tuple, int] = {}
                for g in zip(toks, toks[1:]):
                    counts[g] = counts.get(g, 0) + 1
                t2[i] = max(counts.values()) / (len(toks) - 1)
            if len(toks) >= 3:
                counts3: dict[tuple, int] = {}
                for g in zip(toks, toks[1:], toks[2:]):
                    counts3[g] = counts3.get(g, 0) + 1
                dup_occ = sum(c for c in counts3.values() if c >= 2)
                d3[i] = dup_occ / (len(toks) - 2)
        cols = {c: batch[c] for c in batch.column_names if c != text_col}
        cols["dup_line_frac"] = pa.array(dl)
        cols["top_2gram_frac"] = pa.array(t2)
        cols["dup_3gram_frac"] = pa.array(d3)
        return pa.table(cols)

    return ds.map_batches(rep, batch_format="pyarrow")


# --- deterministic hash sampling ------------------------------------------


def sample_by_hash(ds, key_col: str, rate: float, seed: str = "s0"):
    """Deterministic, resumable down-sampling: keep a row iff the low 60
    bits of ``md5(seed || ':' || key)`` fall below ``rate`` as a fraction
    of 2^60. Unlike ``Dataset.random_sample`` this is (a) stable across
    reruns/retries — a row's fate depends only on its key, so a resumed
    100-TB job samples identically — and (b) consistent across tables
    sharing the key (sample a doc ⇒ sample all its rows everywhere).
    SQL mirror: ``CAST(('0x' || substr(md5(...), 1, 15)) AS UBIGINT)``.
    """
    import hashlib

    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(rate * (1 << 60))
    prefix = f"{seed}:".encode()

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        mask = pa.array(
            [
                int.from_bytes(
                    hashlib.md5(prefix + str(k).encode()).digest()[:8], "big"
                ) >> 4 < threshold
                for k in keys
            ]
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def _hash60(keys: list, prefix: bytes) -> np.ndarray:
    """low-60-bit md5 of ``prefix + str(key)`` per key (the
    ``sample_by_hash`` convention; SQL mirror
    ``CAST('0x' || substr(md5(seed || ':' || key), 1, 15) AS UBIGINT)``)."""
    import hashlib

    return np.fromiter(
        (int.from_bytes(hashlib.md5(prefix + str(k).encode()).digest()[:8],
                        "big") >> 4 for k in keys),
        dtype=np.uint64, count=len(keys))


# size-1 per-worker cache of the broadcast {group: threshold} map, keyed
# by ObjectRef id (one quota pass live per run; see decontam._BENCH_CACHE)
_QUOTA_CACHE: dict[bytes, dict] = {}


def quota_by_group(ds, group_col: str, key_col: str, k: int,
                   seed: str = "s0"):
    """Per-group quota sampling — cap every group (source domain, language,
    shard) at ``k`` rows, keeping the ``k`` rows with the smallest
    ``(md5(seed:key), key)`` — the standard "per-domain cap" of training-
    data mixing, deterministic and rerun-stable like ``sample_by_hash``.

    Ray-Data shape (two streaming passes, no full-table shuffle):
    pass 1 emits at most ``k`` ``(group, hash, key)`` candidates per group
    PER BATCH (a partial top-k combiner), a tiny ``groupby(group)`` over
    candidates reduces each group to its k-th-smallest threshold, and the
    one-row-per-group threshold table is broadcast via ``ray.put``; pass 2
    stream-filters rows against the thresholds. Only O(k x groups) values
    ever leave the batches — at 100 TB the corpus streams twice and the
    shuffle moves candidate hashes, not rows.
    """
    import ray

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    prefix = f"{seed}:".encode()

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"g": pa.array([], batch.schema.field(group_col).type),
                             "h": pa.array([], pa.uint64()),
                             "ky": pa.array([], batch.schema.field(key_col).type)})
        keys = batch[key_col].to_pylist()
        h = _hash60(keys, prefix)
        grp = batch[group_col].to_numpy(zero_copy_only=False)
        karr = np.asarray(keys)
        order = np.lexsort((karr, h, grp))
        sg = grp[order]
        n = len(sg)
        starts = np.r_[0, np.flatnonzero(sg[1:] != sg[:-1]) + 1]
        lens = np.diff(np.r_[starts, n])
        rank = np.arange(n) - np.repeat(starts, lens)
        keep = order[rank < k]
        return pa.table({"g": pa.array(grp[keep].tolist(),
                                       batch.schema.field(group_col).type),
                         "h": pa.array(h[keep]),
                         "ky": pa.array(karr[keep].tolist(),
                                        batch.schema.field(key_col).type)})

    def reduce_threshold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            # zero-row blocks may arrive with a stale pre-map schema
            # (see tests/conftest gotchas); emit a typed empty result
            gt = (g.schema.field("g").type
                  if "g" in g.column_names else pa.string())
            kt = (g.schema.field("ky").type
                  if "ky" in g.column_names else pa.string())
            return pa.table({"g": pa.array([], gt),
                             "h": pa.array([], pa.uint64()),
                             "ky": pa.array([], kt),
                             "full": pa.array([], pa.bool_())})
        h = g["h"].to_numpy(zero_copy_only=False)
        ky = np.asarray(g["ky"].to_pylist())
        full = len(h) >= k
        i = np.lexsort((ky, h))[min(k, len(h)) - 1]
        return pa.table({"g": g["g"][:1],
                         "h": pa.array([h[i]], pa.uint64()),
                         "ky": g["ky"].take([int(i)]),
                         "full": pa.array([full])})

    cand = ds.map_batches(partial_topk, batch_format="pyarrow")
    th_rows = cand.groupby("g").map_groups(
        reduce_threshold, batch_format="pyarrow").take_all()
    th_ref = ray.put(([r["g"] for r in th_rows],
                      np.array([r["h"] for r in th_rows], np.uint64),
                      [r["ky"] for r in th_rows],
                      np.array([r["full"] for r in th_rows], bool)))

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ck = th_ref.binary()
        lut = _QUOTA_CACHE.get(ck)
        if lut is None:
            gl, hh, kk, ff = ray.get(th_ref)
            lut = (pa.array(gl), hh, np.asarray(kk, dtype=object), ff)
            _QUOTA_CACHE.clear()
            _QUOTA_CACHE[ck] = lut
        garr, hh, kk, ff = lut
        keys = batch[key_col].to_pylist()
        h = _hash60(keys, prefix)
        mask = _threshold_mask(batch[group_col], garr, ff, hh, kk,
                               h, keys, largest=False)
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def _threshold_mask(grp_col, garr: pa.Array, full: np.ndarray,
                    tv: np.ndarray, tk: np.ndarray, vals: np.ndarray,
                    keys: list, largest: bool) -> np.ndarray:
    """Vectorized pass-2 filter shared by quota_by_group/topk_by_group:
    keep a row iff its group is missing/under-full, or its (value, key)
    ranks at or before the group's broadcast k-th threshold. One
    ``pc.index_in`` + numpy gathers — no per-row Python loop in the
    full-corpus streaming pass."""
    if len(full) == 0:
        return np.ones(len(keys), dtype=bool)
    idx = pc.index_in(grp_col.combine_chunks()
                      if isinstance(grp_col, pa.ChunkedArray) else grp_col,
                      value_set=garr).to_numpy(zero_copy_only=False)
    miss = np.array([i is None for i in idx]) if idx.dtype == object \
        else np.isnan(idx)
    ii = np.where(miss, 0, idx).astype(np.int64)
    gate = full[ii] & ~miss
    gv = tv[ii]
    gk = tk[ii]
    karr = np.asarray(keys, dtype=object)
    better = vals > gv if largest else vals < gv
    tie_ok = np.asarray(karr <= gk, dtype=bool)
    ok = better | ((vals == gv) & tie_ok)
    return np.where(gate, ok, True)


def topk_by_group(ds, group_col: str, key_col: str, value_col: str,
                  k: int, largest: bool = True):
    """Keep the ``k`` best rows per group by ``value_col`` (ties broken
    by ascending ``key_col`` — deterministic under any partitioning) —
    "best k documents per source" selection for training-data curation.

    Same two-streaming-pass shape as :func:`quota_by_group`: per-batch
    partial top-k combiner (at most k (value, key) candidates per group
    per batch), tiny groupby to each group's k-th threshold, broadcast,
    stream-filter. Only O(k x groups) values shuffle.
    """
    import ray

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def rank_keys(vals: np.ndarray, keys: np.ndarray):
        v = -vals if largest else vals
        return v, keys

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"g": pa.array([], batch.schema.field(group_col).type),
                 "v": pa.array([], batch.schema.field(value_col).type),
                 "ky": pa.array([], batch.schema.field(key_col).type)})
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        keys = np.asarray(batch[key_col].to_pylist())
        grp = batch[group_col].to_numpy(zero_copy_only=False)
        rv, rk = rank_keys(vals, keys)
        order = np.lexsort((rk, rv, grp))
        sg = grp[order]
        n = len(sg)
        starts = np.r_[0, np.flatnonzero(sg[1:] != sg[:-1]) + 1]
        lens = np.diff(np.r_[starts, n])
        rank = np.arange(n) - np.repeat(starts, lens)
        keep = order[rank < k]
        return pa.table(
            {"g": pa.array(grp[keep].tolist(),
                           batch.schema.field(group_col).type),
             "v": batch[value_col].take(pa.array(keep)),
             "ky": pa.array(keys[keep].tolist(),
                            batch.schema.field(key_col).type)})

    def reduce_threshold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "v" not in g.column_names:
            # zero-row blocks may arrive with a stale pre-map schema;
            # emit a typed empty result (see quota_by_group's twin)
            gt = (g.schema.field("g").type
                  if "g" in g.column_names else pa.string())
            vt = (g.schema.field("v").type
                  if "v" in g.column_names else pa.float64())
            kt = (g.schema.field("ky").type
                  if "ky" in g.column_names else pa.string())
            return pa.table({"g": pa.array([], gt),
                             "v": pa.array([], vt),
                             "ky": pa.array([], kt),
                             "full": pa.array([], pa.bool_())})
        vals = g["v"].to_numpy(zero_copy_only=False)
        keys = np.asarray(g["ky"].to_pylist())
        rv, rk = rank_keys(vals, keys)
        i = np.lexsort((rk, rv))[min(k, len(vals)) - 1]
        return pa.table({"g": g["g"][:1],
                         "v": g["v"].take([int(i)]),
                         "ky": g["ky"].take([int(i)]),
                         "full": pa.array([len(vals) >= k])})

    cand = ds.map_batches(partial_topk, batch_format="pyarrow")
    th_rows = cand.groupby("g").map_groups(
        reduce_threshold, batch_format="pyarrow").take_all()
    th_ref = ray.put(([r["g"] for r in th_rows],
                      np.array([r["v"] for r in th_rows]),
                      [r["ky"] for r in th_rows],
                      np.array([r["full"] for r in th_rows], bool)))

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ck = th_ref.binary()
        lut = _QUOTA_CACHE.get(ck)
        if lut is None:
            gl, vv, kk, ff = ray.get(th_ref)
            lut = (pa.array(gl), vv, np.asarray(kk, dtype=object), ff)
            _QUOTA_CACHE.clear()
            _QUOTA_CACHE[ck] = lut
        garr, vv, kk, ff = lut
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        keys = batch[key_col].to_pylist()
        mask = _threshold_mask(batch[group_col], garr, ff, vv, kk,
                               vals, keys, largest=largest)
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


# size-1 per-worker cache of the broadcast (terms, df) arrays
_DF_CACHE: dict[bytes, tuple] = {}


def _doc_term_codes(batch: pa.Table, text_col: str):
    """Vectorized batch tokenization shared by both characteristic_terms
    passes: Arrow RE2 split on ``[^0-9a-z_]+`` of the lowercased text
    (drop empties) — the exact complement of the oracle's
    ``regexp_extract_all(lower(text), '[0-9a-zA-Z_]+')``, i.e. the ASCII
    token contract BOTH sides implement in RE2 — then one
    ``dictionary_encode`` over the flat token stream. Returns
    (doc_row_idx, token_code, batch_dictionary) — everything downstream
    is integer numpy; zero per-row Python."""
    low = pc.utf8_lower(batch[text_col].combine_chunks())
    toks = pc.split_pattern_regex(low, pattern=r"[^0-9a-z_]+")
    lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    docidx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    nonempty = pc.not_equal(flat, pa.scalar("")).to_numpy(
        zero_copy_only=False)
    if not nonempty.all():
        flat = flat.filter(pa.array(nonempty))
        docidx = docidx[nonempty]
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return docidx, codes, enc.dictionary


def token_entropy(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document Shannon entropy of the token distribution (nats):

        H(d) = ln(n_d) - (1/n_d) * sum_t tf(d,t) * ln(tf(d,t))

    The low tail is repetition/boilerplate (one token repeated has
    H = 0), the high tail is maximally-spread vocabulary — the cheap
    gibberish/repetition quality signal that needs NO corpus statistics,
    complementing ``unigram_logppl`` (which ranks docs against the
    corpus LM). Token contract = the ASCII RE2 contract of
    ``_doc_term_codes``; docs with zero tokens are omitted (no token
    rows, matching SQL). Returns (id, n_tokens, entropy) at full
    precision.

    Scale shape: ZERO shuffle — a document's tokens live in its own
    row, so everything is one vectorized per-batch pass (regex split,
    dictionary_encode, lexsort run-lengths, reduceat)."""

    def ent(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        empty = pa.table({id_col: pa.array([], id_type),
                          "n_tokens": pa.array([], pa.int64()),
                          "entropy": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        docidx, codes, _ = _doc_term_codes(batch, text_col)
        if len(codes) == 0:
            return empty
        order = np.lexsort((codes, docidx))
        dc, cc = docidx[order], codes[order]
        newrun = np.r_[True, (dc[1:] != dc[:-1]) | (cc[1:] != cc[:-1])]
        starts = np.flatnonzero(newrun)
        tf = np.diff(np.r_[starts, len(dc)]).astype(np.float64)
        drun = dc[starts]
        dstarts = np.r_[0, np.flatnonzero(drun[1:] != drun[:-1]) + 1]
        s = np.add.reduceat(tf * np.log(tf), dstarts)
        nd = np.add.reduceat(tf, dstarts)
        h = np.log(nd) - s / nd
        docs = drun[dstarts]
        return pa.table({
            id_col: batch[id_col].take(pa.array(docs)),
            "n_tokens": pa.array(nd.astype(np.int64)),
            "entropy": pa.array(h),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        ent, batch_format="pyarrow")


def characteristic_terms(ds, id_col: str = "doc_id",
                         text_col: str = "text"):
    """Per-document most-characteristic term — the TF-IDF argmax with a
    float-free ranking: highest within-doc term frequency, document
    frequency ascending on ties (rarer corpus-wide wins), then token
    ascending. Integer-only comparisons keep the engine and the SQL
    oracle bit-identical (a float tf*ln(N/df) argmax can flip on the
    last ulp between numpy and the oracle's ln).

    Scale shape: pass 1 builds the global document-frequency table as
    partial per-batch counts over per-doc DISTINCT token codes (one
    batch-wide regex split + dictionary-encode + lexsort — no Python
    loop) merged by a vocabulary-sized groupby; the corpus never
    shuffles and df stays a DATASET. Only the ``df >= 2`` slice is
    broadcast — a term absent from the broadcast has df exactly 1 (the
    hapax tail is the Heaps-law bulk of the vocabulary, and 1 is the
    minimum of the ascending tie-break, so the argmax needs nothing
    else). Pass 2 streams docs, paints df onto each batch's (small)
    token dictionary with ``pc.index_in`` and picks every doc's argmax
    in one lexsort. Docs with no tokens are omitted (matching the SQL,
    where they produce no token rows)."""
    import ray

    from ray.data.aggregate import Sum

    def partial_df(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "d": pa.array([], pa.int64())})
        docidx, codes, dictionary = _doc_term_codes(batch, text_col)
        if len(codes) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "d": pa.array([], pa.int64())})
        order = np.lexsort((codes, docidx))
        dc, cc = docidx[order], codes[order]
        first = np.r_[True, (dc[1:] != dc[:-1]) | (cc[1:] != cc[:-1])]
        d = np.bincount(cc[first], minlength=len(dictionary))
        present = np.flatnonzero(d)
        return pa.table({"term": dictionary.take(pa.array(present)),
                         "d": pa.array(d[present], pa.int64())})

    df_ds = (ds.select_columns([text_col])
             .map_batches(partial_df, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("d", alias_name="d")))

    def non_hapax(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "d" not in batch.column_names:
            return pa.table({"term": pa.array([], pa.string()),
                             "d": pa.array([], pa.int64())})
        return batch.filter(pc.greater_equal(batch["d"], pa.scalar(2)))

    nh_batches = list(
        df_ds.map_batches(non_hapax, batch_format="pyarrow").iter_batches(
            batch_size=1 << 18, batch_format="pyarrow"))
    shared = (pa.concat_tables(nh_batches) if nh_batches else
              pa.table({"term": pa.array([], pa.string()),
                        "d": pa.array([], pa.int64())}))
    df_ref = ray.put((shared["term"].combine_chunks(),
                      shared["d"].to_numpy(zero_copy_only=False).astype(
                          np.int64)))

    def pick(batch: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], batch.schema.field(
                              id_col).type),
                          "top_term": pa.array([], pa.string()),
                          "tf": pa.array([], pa.int64()),
                          "df": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        ck = df_ref.binary()
        cached = _DF_CACHE.get(ck)
        if cached is None:
            cached = ray.get(df_ref)
            _DF_CACHE.clear()
            _DF_CACHE[ck] = cached
        bterms, bdf = cached
        docidx, codes, dictionary = _doc_term_codes(batch, text_col)
        if len(codes) == 0:
            return empty
        # df per batch-dictionary code: broadcast lookup, hapax -> 1
        at = pc.index_in(dictionary, value_set=bterms)
        df_code = pc.coalesce(
            pc.take(pa.array(bdf), at), pa.scalar(1, pa.int64())
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        # lexicographic rank of each dictionary entry for the final
        # token-ascending tie-break (integer compare, no string sorts
        # in the argmax)
        sort_idx = pc.sort_indices(dictionary).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rank = np.empty(len(dictionary), dtype=np.int64)
        rank[sort_idx] = np.arange(len(dictionary), dtype=np.int64)
        # per-(doc, code) tf via one lexsort + run lengths
        order = np.lexsort((codes, docidx))
        dc, cc = docidx[order], codes[order]
        starts = np.flatnonzero(
            np.r_[True, (dc[1:] != dc[:-1]) | (cc[1:] != cc[:-1])])
        tf = np.diff(np.r_[starts, len(dc)])
        seg_doc, seg_code = dc[starts], cc[starts]
        # argmax per doc by (-tf, df, token-rank): sort segments and
        # keep the first of each doc
        sorder = np.lexsort((rank[seg_code], df_code[seg_code], -tf,
                             seg_doc))
        sd = seg_doc[sorder]
        keep = np.r_[True, sd[1:] != sd[:-1]]
        win = sorder[keep]
        return pa.table({
            id_col: batch[id_col].take(pa.array(seg_doc[win])),
            "top_term": dictionary.take(pa.array(seg_code[win])),
            "tf": pa.array(tf[win], pa.int64()),
            "df": pa.array(df_code[seg_code[win]], pa.int64())})

    return ds.map_batches(pick, batch_format="pyarrow")


def bm25_topk(ds, terms: list[str], k: int = 10, k1: float = 1.2,
              b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text"):
    """→ Dataset(doc_id, bm25): the ``k`` most relevant docs for a
    bag-of-terms query under BM25 (Robertson/Spärck Jones, public
    formula), ordered selection by (score desc, id asc):

        idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        score(d)= Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    with N = total docs, dl = doc token count, avgdl = total tokens / N.
    Tokenization is the ASCII RE2 contract shared with the SQL oracle
    (``_doc_term_codes``). Only docs containing ≥ 1 query term score
    (SQL join semantics), so fewer than k rows may return.

    Scale shape: pass 1 streams one (N, Σdl, df per query term) partial
    row per batch — the query is a tiny constant side, nothing
    broadcasts but the term list; pass 2 streams docs, scores each
    batch vectorized (token-code ``pc.index_in`` against the term
    list + one bincount per batch) and keeps a per-batch top-k, so the
    final exact top-k sorts ≤ k rows per batch. The engine mirrors the
    oracle's float expression shape exactly; sums over ≤ a handful of
    terms keep reassociation noise inside the rounding the query layer
    applies."""
    import ray.data
    from ray.data.aggregate import Sum

    if not terms or len(set(terms)) != len(terms):
        raise ValueError("terms must be a non-empty list of distinct "
                         "tokens")
    terms_arr = pa.array(terms, pa.string())
    nt = len(terms)

    def stats_partial(batch: pa.Table) -> pa.Table:
        cols = {"n": pa.array([batch.num_rows], pa.int64())}
        docidx, codes, dictionary = _doc_term_codes(batch, text_col)
        cols["dl"] = pa.array([len(codes)], pa.int64())
        slot_of_code = pc.index_in(dictionary, value_set=terms_arr)
        sc = pc.fill_null(slot_of_code, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tok_slot = sc[codes] if len(codes) else np.empty(0, np.int64)
        hit = tok_slot >= 0
        # distinct (doc, term) pairs -> df partials
        key = docidx[hit] * nt + tok_slot[hit]
        df = np.zeros(nt, dtype=np.int64)
        if key.size:
            uk = np.unique(key)
            df = np.bincount(uk % nt, minlength=nt)
        for t in range(nt):
            cols[f"df{t}"] = pa.array([int(df[t])], pa.int64())
        return pa.table(cols)

    agg = (ds.select_columns([text_col])
           .map_batches(stats_partial, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("dl", alias_name="dl"),
                      *[Sum(f"df{t}", alias_name=f"df{t}")
                        for t in range(nt)]))
    n_docs = agg["n"] or 0
    if n_docs == 0:
        return ray.data.from_arrow(pa.table(
            {id_col: pa.array([], pa.int64()),
             "bm25": pa.array([], pa.float64())}))
    avgdl = (agg["dl"] or 0) / n_docs
    df = np.array([agg[f"df{t}"] or 0 for t in range(nt)], np.float64)
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], batch.schema.field(
                              id_col).type),
                          "bm25": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        docidx, codes, dictionary = _doc_term_codes(batch, text_col)
        if len(codes) == 0:
            return empty
        dl = np.bincount(docidx, minlength=batch.num_rows).astype(
            np.float64)
        slot_of_code = pc.index_in(dictionary, value_set=terms_arr)
        sc = pc.fill_null(slot_of_code, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tok_slot = sc[codes]
        hit = tok_slot >= 0
        if not hit.any():
            return empty
        tf = np.bincount(docidx[hit] * nt + tok_slot[hit],
                         minlength=batch.num_rows * nt
                         ).reshape(batch.num_rows, nt).astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * dl[:, None] / avgdl)
        contrib = np.where(tf > 0.0, idf[None, :] * (tf * (k1 + 1.0))
                           / denom, 0.0)
        s = contrib.sum(axis=1)
        live = np.flatnonzero(tf.sum(axis=1) > 0)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        kk = live[np.lexsort((ids[live], -s[live]))[:min(k, live.size)]]
        return pa.table({id_col: batch[id_col].take(pa.array(kk)),
                         "bm25": pa.array(s[kk])})

    partial = ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")
    return (partial.sort(["bm25", id_col], descending=[True, False])
            .limit(k))


def normalize_text(ds, text_col: str = "text",
                   out_col: str = "norm_text"):
    """Canonical pre-dedup text normalization: lowercase, replace every
    non-alphanumeric rune with a space, collapse whitespace runs, trim.
    Implemented entirely in pyarrow.compute kernels (utf8_lower +
    replace_substring_regex + utf8_trim_whitespace) — zero Python in the
    batch path, zero copies out of the object store. Patterns are
    RE2-compatible so the DuckDB oracle applies the identical
    expressions; nulls pass through as nulls."""

    def norm(batch: pa.Table) -> pa.Table:
        x = pc.utf8_lower(batch[text_col].combine_chunks())
        x = pc.replace_substring_regex(x, pattern=r"[^0-9a-z\s]",
                                       replacement=" ")
        x = pc.replace_substring_regex(x, pattern=r"\s+",
                                       replacement=" ")
        x = pc.utf8_trim_whitespace(x)
        return batch.append_column(out_col, x)

    return ds.map_batches(norm, batch_format="pyarrow")


# --- sequence packing ------------------------------------------------------


def pack_sequences(ds, token_budget: int, key_col: str = "doc_id",
                   text_col: str = "text", num_partitions: int = 8):
    """Deterministic partition-local sequence packing: within each hash
    partition (``key % num_partitions`` for integer keys, else a stable
    hash), documents are scanned in ascending key order and appended to
    the current pack until the next document would exceed
    ``token_budget``; a document larger than the budget gets its own pack.
    Emits ``part``, ``pack_id`` (= part * 2^32 + per-partition pack
    number) and ``ws_tokens`` per row.

    Packing is inherently sequential, so the PARTITION is the unit of
    sequentiality — the standard practice at corpus scale (each worker
    packs its own shard; `groupby(part).map_groups` streams partitions
    independently, no global order dependency). Deterministic by
    construction: a row's pack depends only on the keys and token counts
    of its partition, so retries and reruns pack identically.
    """

    def add_part(batch: pa.Table) -> pa.Table:
        # shared partitioner: vectorized int modulo / dictionary-encoded
        # md5 (byte-identical to the historical per-row formula — see
        # tests/test_windows.py::test_part_array_string_keys...)
        from raydedup.stages.asof import _part_array

        part = _part_array(batch[key_col].combine_chunks(),
                           num_partitions)
        texts = ["" if t is None else t for t in batch[text_col].to_pylist()]
        ws = pa.array(
            [len([w for w in _WS_RE.split(t) if w]) for t in texts],
            type=pa.int64())
        cols = {c: batch[c] for c in batch.column_names if c != text_col}
        cols["part"] = part
        cols["ws_tokens"] = ws
        return pa.table(cols)

    def pack(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group[key_col])
        g = group.take(order)
        toks = g["ws_tokens"].to_numpy()
        part = int(g["part"][0].as_py())
        n = g.num_rows
        packs = np.empty(n, dtype=np.int64)
        acc = 0
        cur = -1
        for i in range(n):
            t = int(toks[i])
            if cur < 0 or acc + t > token_budget:
                cur += 1
                acc = t
            else:
                acc += t
            packs[i] = cur
        return pa.table({
            key_col: g[key_col].combine_chunks(),
            "part": g["part"].combine_chunks(),
            "pack_id": pa.array(part * (1 << 32) + packs),
            "ws_tokens": g["ws_tokens"].combine_chunks(),
        })

    withp = ds.map_batches(add_part, batch_format="pyarrow")
    return withp.groupby("part").map_groups(pack, batch_format="pyarrow")


# --- PII detection / redaction --------------------------------------------

# RE2-compatible ASCII patterns (no backrefs/lookaround) so the DuckDB
# oracle applies the IDENTICAL expressions
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
              "[EMAIL]"),
    "phone": (r"\+[0-9]{1,3}[ \-][0-9]{3}[ \-][0-9]{3}[ \-]?[0-9]{2,4}",
              "[PHONE]"),
    "ip": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
           "[IP]"),
}


def redact_pii(ds, text_col: str = "text"):
    """Detect and mask common PII shapes (email / international phone /
    IPv4) — the standard pre-training hygiene pass. Appends per-row match
    counts ``n_email``/``n_phone``/``n_ip`` and a ``redacted`` text column
    with every match replaced by its tag. Patterns are RE2-compatible so
    the DuckDB oracle runs the identical regexes; replacement order is
    fixed (email, phone, ip) on both sides."""
    compiled = [(k, re.compile(p), tag) for k, (p, tag) in
                PII_PATTERNS.items()]

    def rr(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch[text_col].to_pylist()]
        counts = {k: np.zeros(len(texts), dtype=np.int64)
                  for k, _, _ in compiled}
        red = []
        for i, t in enumerate(texts):
            # counts over the ORIGINAL text (the oracle's
            # regexp_extract_all also sees the original); redaction is
            # sequential on both sides, so a phone-shaped substring
            # inside an email is counted once but masked by [EMAIL]
            for k, rx, _ in compiled:
                counts[k][i] = len(rx.findall(t))
            for _, rx, tag in compiled:
                t = rx.sub(tag, t)
            red.append(t)
        cols = {c: batch[c] for c in batch.column_names}
        for k, _, _ in compiled:
            cols[f"n_{k}"] = pa.array(counts[k])
        cols["redacted"] = pa.array(red, type=pa.string())
        return pa.table(cols)

    return ds.map_batches(rr, batch_format="pyarrow")


def blocklist_scan(ds, phrases: list[str], key_col: str = "doc_id",
                   text_col: str = "text",
                   case_insensitive: bool = True):
    """Banned-phrase scan — the safety/compliance gate of a curation
    run: → Dataset(key, phrase, n_hits), one row per (row, phrase) with
    >= 1 occurrence. ``n_hits`` counts non-overlapping left-to-right
    occurrences (``pc.count_substring``), the same rule DuckDB's
    replace-based length arithmetic computes, so the oracle is exact.

    Scale shape: zero shuffle — the phrase list rides the task closure
    once per task (genuinely small; it is the operator's CONFIG, not
    data) and each batch runs one vectorized Arrow substring-count pass
    per phrase. For blocklists beyond a few hundred entries the right
    kernel is an Aho-Corasick automaton in an actor pool (__init__
    builds the automaton once per worker) — same output contract; this
    vectorized path is the small-P fast case.
    """
    if not phrases:
        raise ValueError("phrases must be non-empty")
    plist = [p.lower() if case_insensitive else p for p in phrases]
    if any(not p for p in plist):
        raise ValueError("empty phrase in blocklist")

    def scan(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        txt = pc.fill_null(batch[text_col].combine_chunks(), "")
        if case_insensitive:
            txt = pc.utf8_lower(txt)
        out_k, out_p, out_n = [], [], []
        for p in plist:
            n = pc.count_substring(txt, p)
            mask = pc.greater(n, 0)
            hit_k = keys.filter(mask)
            if len(hit_k) == 0:
                continue
            out_k.append(hit_k)
            out_p.append(pa.array([p] * len(hit_k), pa.string()))
            out_n.append(pc.cast(n.filter(mask), pa.int64()))
        if not out_k:
            return pa.table({key_col: pa.array([], batch.schema.field(
                                 key_col).type),
                             "phrase": pa.array([], pa.string()),
                             "n_hits": pa.array([], pa.int64())})
        return pa.table({
            key_col: pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                 else c for c in out_k]),
            "phrase": pa.concat_arrays(out_p),
            "n_hits": pa.concat_arrays(out_n),
        })

    return ds.select_columns([key_col, text_col]).map_batches(
        scan, batch_format="pyarrow")


# deterministic odd bases for the Rabin-Karp rolling hash; odd => invertible
# mod 2^64, so the prefix-product trick below works. A cross-pattern 64-bit
# hash collision (~P^2 / 2^64) deterministically retries with the next base.
_RK_BASES = (0x100000001B3, 0x1000193, 0x9E3779B97F4A7C15 | 1,
             0xC2B2AE3D27D4EB4F | 1, 0x2545F4914F6CDD1D | 1)


def _rk_hash(b: bytes, base: int) -> int:
    h = 0
    for x in b:
        h = (h * base + x) & 0xFFFFFFFFFFFFFFFF
    return h


def blocklist_scan_rk(ds, phrases: list[str], key_col: str = "doc_id",
                      text_col: str = "text",
                      case_insensitive: bool = True):
    """Large-blocklist banned-phrase scan — same output contract as
    ``blocklist_scan`` (one row per (key, phrase) with >= 1 hit; n_hits
    = non-overlapping left-to-right occurrences, the
    ``pc.count_substring`` / DuckDB replace-arithmetic rule) but ONE
    vectorized pass per distinct phrase *byte length* instead of one
    pass per phrase, so cost is O(text x distinct_lengths) not
    O(text x P) — the scale path when the blocklist has thousands of
    entries (Karp & Rabin 1987 multi-pattern matching).

    Kernel: the batch's Arrow string data buffer is already the
    back-to-back concatenation of every row's utf-8 bytes, so rolling
    hashes are computed once over that buffer with zero copies — the
    window hash H[s] = sum b[s+j]*B^(L-1-j) is factored as
    B^(s+L-1) * (C[s+L] - C[s]) with C = cumsum(b[i]*B^-i) in
    wrapping uint64 (B odd => invertible mod 2^64), giving every
    length's hashes from ONE shared cumsum + two cumprods per batch.
    Candidates come from a searchsorted probe against the per-length
    sorted pattern-hash table, windows that cross a row boundary are
    dropped by offset lookup, survivors are byte-verified exactly
    (hash collisions cost time, never correctness), and the
    non-overlap rule is applied per (pattern, row) — vectorized when
    no two same-pattern matches are closer than L (the common case),
    a bounded greedy walk over just the matches otherwise.

    Matching is byte-level but utf-8 is self-synchronizing (a valid
    pattern's first byte is never a continuation byte), so byte matches
    are exactly the char matches ``pc.count_substring`` counts.
    """
    if not phrases:
        raise ValueError("phrases must be non-empty")
    plist = [p.lower() if case_insensitive else p for p in phrases]
    if any(not p for p in plist):
        raise ValueError("empty phrase in blocklist")
    # distinct patterns scanned once; duplicate list entries re-emit rows
    from collections import Counter

    mult = Counter(plist)
    pats = sorted(mult)  # deterministic order
    pbytes = [p.encode() for p in pats]
    for base in _RK_BASES:
        by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        ok = True
        for length in sorted({len(b) for b in pbytes}):
            ids = np.array([i for i, b in enumerate(pbytes)
                            if len(b) == length], dtype=np.int64)
            hs = np.array([_rk_hash(pbytes[i], base) for i in ids],
                          dtype=np.uint64)
            order = np.argsort(hs)
            hs, ids = hs[order], ids[order]
            if len(hs) > 1 and (hs[1:] == hs[:-1]).any():
                ok = False
                break
            by_len[length] = (hs, ids)
        if ok:
            break
    else:  # pragma: no cover - 5 base retries all colliding
        raise ValueError("could not find a collision-free RK base")
    binv = pow(base, -1, 1 << 64)
    u64 = np.uint64

    def scan(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].combine_chunks()
        col = batch[text_col].combine_chunks()
        if pa.types.is_null(col.type):
            col = pa.nulls(len(col), pa.string())
        txt = pc.fill_null(col, "")
        if case_insensitive:
            txt = pc.utf8_lower(txt)
        txt = txt.cast(pa.large_string())
        empty = pa.table({key_col: pa.array([], keys.type),
                          "phrase": pa.array([], pa.string()),
                          "n_hits": pa.array([], pa.int64())})
        nrows = len(txt)
        if nrows == 0:
            return empty
        off = (np.frombuffer(txt.buffers()[1], np.int64)
               [txt.offset:txt.offset + nrows + 1])
        start, stop = int(off[0]), int(off[-1])
        nbytes = stop - start
        if nbytes == 0:
            return empty
        data = np.frombuffer(txt.buffers()[2], np.uint8)[start:stop]
        off = off - start
        # shared rolling-hash state for every pattern length
        maxlen = max(by_len)
        npow = nbytes + maxlen + 1
        bpow = np.empty(npow, dtype=np.uint64)
        bipow = np.empty(npow, dtype=np.uint64)
        bpow[0] = bipow[0] = 1
        with np.errstate(over="ignore"):
            bpow[1:] = np.cumprod(np.full(npow - 1, base, np.uint64))
            bipow[1:] = np.cumprod(np.full(npow - 1, binv, np.uint64))
            csum = np.zeros(nbytes + 1, dtype=np.uint64)
            np.cumsum(data.astype(np.uint64) * bipow[:nbytes],
                      out=csum[1:])
        hit_pid, hit_doc, hit_cnt = [], [], []
        for length, (phash, pids) in by_len.items():
            if nbytes < length:
                continue
            ns = nbytes - length + 1  # candidate window starts
            with np.errstate(over="ignore"):
                h = (csum[length:length + ns] - csum[:ns]) \
                    * bpow[length - 1:length - 1 + ns]
            pos = np.searchsorted(phash, h)
            cand = np.flatnonzero(
                (pos < len(phash)) & (phash[np.minimum(pos, len(phash) - 1)]
                                      == h))
            if len(cand) == 0:
                continue
            # drop windows crossing a row boundary
            did = np.searchsorted(off, cand, side="right") - 1
            keep = cand + length <= off[did + 1]
            cand, did = cand[keep], did[keep]
            if len(cand) == 0:
                continue
            pid = pids[pos[cand]]
            # exact byte verify (removes hash false positives)
            win = np.lib.stride_tricks.sliding_window_view(data, length)
            for p in np.unique(pid):
                sel = pid == p
                target = np.frombuffer(pbytes[int(p)], np.uint8)
                real = (win[cand[sel]] == target).all(axis=1)
                cpos, cdoc = cand[sel][real], did[sel][real]
                if len(cpos) == 0:
                    continue
                # non-overlap rule: greedy left-to-right within each row
                gaps_ok = True
                if len(cpos) > 1:
                    close = (np.diff(cpos) < length) & (cdoc[1:]
                                                        == cdoc[:-1])
                    gaps_ok = not close.any()
                if gaps_ok:
                    docs, cnts = np.unique(cdoc, return_counts=True)
                else:
                    kept_docs = []
                    last_doc, nxt = -1, -1
                    for s, d in zip(cpos.tolist(), cdoc.tolist()):
                        if d != last_doc or s >= nxt:
                            kept_docs.append(d)
                            last_doc, nxt = d, s + length
                    docs, cnts = np.unique(np.array(kept_docs,
                                                    dtype=np.int64),
                                           return_counts=True)
                hit_pid.append(np.full(len(docs), p, np.int64))
                hit_doc.append(docs)
                hit_cnt.append(cnts.astype(np.int64))
        if not hit_pid:
            return empty
        pid = np.concatenate(hit_pid)
        doc = np.concatenate(hit_doc)
        cnt = np.concatenate(hit_cnt)
        order = np.lexsort((doc, pid))
        pid, doc, cnt = pid[order], doc[order], cnt[order]
        # duplicate phrase entries in the input list re-emit their rows
        rep = np.array([mult[pats[int(p)]] for p in pid], dtype=np.int64)
        if (rep > 1).any():
            pid, doc, cnt = (np.repeat(pid, rep), np.repeat(doc, rep),
                             np.repeat(cnt, rep))
        return pa.table({
            key_col: keys.take(pa.array(doc)),
            "phrase": pa.array([pats[int(p)] for p in pid], pa.string()),
            "n_hits": pa.array(cnt),
        })

    return ds.select_columns([key_col, text_col]).map_batches(
        scan, batch_format="pyarrow")


def weighted_sample(ds, key_col: str, weight_col: str, k: int,
                    seed: str = "ws0"):
    """Weight-proportional sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 priority sampling): each row gets priority
    ln(u) / w with u = (md5-low60(seed:key) + 1) / 2^60, and the
    global top-k priorities win — inclusion probability proportional
    to weight, one streaming pass, no global weight total needed. The
    data-mixing primitive next to the uniform (``sample_by_hash``),
    stratified and quota samplers: sample tokens-proportional,
    quality-proportional, or any per-row importance.

    DETERMINISTIC: u comes from the repo's md5-low60 convention
    (``_hash60``), so reruns pick identical rows and a SQL oracle
    replays the exact selection (same CAST-to-DOUBLE + ln arithmetic).
    Rows with weight <= 0 or NULL are excluded by contract.

    Scale shape: each batch keeps only its LOCAL top-k, so the final
    sort+limit shuffles at most k rows per input block (the
    ``hash_sample_fixed`` idiom)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    prefix = f"{seed}:".encode()

    def partial(batch: pa.Table) -> pa.Table:
        w_raw = pc.cast(batch[weight_col], pa.float64())
        keep = pc.and_(pc.is_valid(w_raw), pc.greater(w_raw, 0.0))
        t = batch.filter(keep)
        if t.num_rows == 0:
            return t.append_column("__p", pa.array([], pa.float64()))
        w = pc.cast(t[weight_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        h = _hash60(t[key_col].to_pylist(), prefix)
        u = (h.astype(np.float64) + 1.0) / float(1 << 60)
        p = np.log(u) / w
        sel = np.argsort(-p, kind="stable")[:k]
        out = t.take(pa.array(sel))
        return out.append_column("__p", pa.array(p[sel], pa.float64()))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .sort("__p", descending=True).limit(k)
            .drop_columns(["__p"]))


def max_repeat_len(ds, id_col: str = "doc_id", text_col: str = "text",
                   grid: tuple = (8, 16, 32, 64, 128)):
    """Grid-quantized longest-repeated-substring length per document —
    the LOOP detector for generated/agent text: a model stuck in a
    cycle emits long verbatim internal repeats that the Gopher
    small-n-gram fractions (``repetition_stats``) dilute away, but a
    repeated 64/128-byte window flags immediately.

    Output (id, max_repeat_len): the LARGEST grid length L such that
    some length-L byte window of the text occurs at >= 2 (possibly
    overlapping) positions, 0 when none does — monotone in L, so the
    grid scan runs largest-first and each doc exits at its first hit.
    Byte-window semantics == character semantics on ASCII text (the
    SQL mirror's substr windows); multi-byte text is compared at byte
    level, which can only make both positions' contents equal together.

    Kernel: zero shuffle — the batch's Arrow string buffer is already
    the row-concatenated byte stream, so every grid length reuses ONE
    shared prefix-factored rolling-hash cumsum (the
    ``blocklist_scan_rk`` machinery); per length, equal (row, hash)
    window runs come from one lexsort, and each run is byte-verified
    (``np.unique`` over the gathered windows), so hash collisions cost
    time, never a wrong answer."""
    glens = sorted({int(g) for g in grid}, reverse=True)
    if not glens or glens[-1] < 2:
        raise ValueError("grid lengths must be >= 2")
    base = _RK_BASES[0]
    binv = pow(base, -1, 1 << 64)

    def scan(batch: pa.Table) -> pa.Table:
        keys = batch[id_col].combine_chunks()
        col = batch[text_col].combine_chunks()
        if pa.types.is_null(col.type):
            col = pa.nulls(len(col), pa.string())
        txt = pc.fill_null(col, "").cast(pa.large_string())
        nrows = len(txt)
        out = np.zeros(nrows, np.int64)
        if nrows == 0:
            return pa.table({id_col: keys,
                             "max_repeat_len": pa.array(out)})
        off = (np.frombuffer(txt.buffers()[1], np.int64)
               [txt.offset:txt.offset + nrows + 1])
        start, stop = int(off[0]), int(off[-1])
        nbytes = stop - start
        if nbytes == 0:
            return pa.table({id_col: keys,
                             "max_repeat_len": pa.array(out)})
        data = np.frombuffer(txt.buffers()[2], np.uint8)[start:stop]
        off = off - start
        npow = nbytes + glens[0] + 1
        bpow = np.empty(npow, dtype=np.uint64)
        bipow = np.empty(npow, dtype=np.uint64)
        bpow[0] = bipow[0] = 1
        with np.errstate(over="ignore"):
            bpow[1:] = np.cumprod(np.full(npow - 1, base, np.uint64))
            bipow[1:] = np.cumprod(np.full(npow - 1, binv, np.uint64))
            csum = np.zeros(nbytes + 1, dtype=np.uint64)
            np.cumsum(data.astype(np.uint64) * bipow[:nbytes],
                      out=csum[1:])
        unresolved = np.ones(nrows, bool)
        for length in glens:
            if nbytes < length or not unresolved.any():
                continue
            ns = nbytes - length + 1
            with np.errstate(over="ignore"):
                h = (csum[length:length + ns] - csum[:ns]) \
                    * bpow[length - 1:length - 1 + ns]
            pos = np.arange(ns, dtype=np.int64)
            did = np.searchsorted(off, pos, side="right") - 1
            keep = (pos + length <= off[did + 1]) & unresolved[did]
            pos, did, h = pos[keep], did[keep], h[keep]
            if len(pos) < 2:
                continue
            order = np.lexsort((h, did))
            did_s, h_s, pos_s = did[order], h[order], pos[order]
            same = (did_s[1:] == did_s[:-1]) & (h_s[1:] == h_s[:-1])
            if not same.any():
                continue
            bounds = np.flatnonzero(~np.r_[False, same])
            run_starts = bounds
            run_ends = np.r_[bounds[1:], len(pos_s)]
            win = np.lib.stride_tricks.sliding_window_view(data, length)
            for s, e in zip(run_starts.tolist(), run_ends.tolist()):
                if e - s < 2:
                    continue
                d = int(did_s[s])
                if not unresolved[d]:
                    continue
                mat = win[pos_s[s:e]]
                if len(np.unique(mat, axis=0)) < e - s:
                    out[d] = length
                    unresolved[d] = False
        return pa.table({id_col: keys, "max_repeat_len": pa.array(out)})

    return ds.select_columns([id_col, text_col]).map_batches(
        scan, batch_format="pyarrow")


def stratified_sample(ds, group_col: str, key_col: str,
                      rates: dict, default_rate: float = 0.0,
                      seed: str = "s0"):
    """Per-group deterministic down-sampling — training-data mixing
    weights (e.g. keep 100% of a scarce language, 10% of a dominant
    one). Same md5 keep-rule as ``sample_by_hash`` with the threshold
    looked up per row from the broadcast ``rates`` map (groups absent
    from the map use ``default_rate``); a row's fate depends only on
    (seed, key), so reruns and sibling tables stay consistent."""
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for group {g!r} must be in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    if not rates:
        return sample_by_hash(ds, key_col, default_rate, seed)
    groups = pa.array([str(g) for g in rates])
    thresholds = np.fromiter(
        (int(r * (1 << 60)) for r in rates.values()),
        dtype=np.uint64, count=len(rates))
    default_thr = np.uint64(int(default_rate * (1 << 60)))
    prefix = f"{seed}:".encode()

    def keep(batch: pa.Table) -> pa.Table:
        gidx = pc.index_in(
            pc.cast(batch[group_col], pa.string()), value_set=groups)
        gnp = pc.fill_null(gidx, -1).to_numpy(zero_copy_only=False)
        thr = np.where(gnp >= 0,
                       thresholds[np.clip(gnp, 0, None)], default_thr)
        h = _hash60(batch[key_col].to_pylist(), prefix)
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def chunk_text(ds, size: int, stride: int, id_col: str = "doc_id",
               text_col: str = "text"):
    """Context-window chunking: split each document into overlapping
    character windows (``size`` chars every ``stride``; the final
    window may be short) → one row per (id, chunk_idx, chunk). The
    standard pre-tokenization step for long-document training corpora;
    empty texts yield no chunks. Character (codepoint) slicing so
    multi-byte text chunks exactly like SQL ``substr``. Output rows
    fan out ~len/stride per doc — a flat_map, no shuffle; chunk rows
    stream straight to the next stage or sink."""
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")

    def chunks(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        out_id, out_idx, out_chunk = [], [], []
        for i, t in zip(ids, texts):
            if not t:
                continue
            for j, start in enumerate(range(0, len(t), stride)):
                out_id.append(i)
                out_idx.append(j)
                out_chunk.append(t[start: start + size])
        return pa.table({
            id_col: pa.array(out_id,
                             b.schema.field(id_col).type),
            "chunk_idx": pa.array(out_idx, pa.int64()),
            "chunk": pa.array(out_chunk, pa.string())})

    return ds.map_batches(chunks, batch_format="pyarrow")


def ascii_token_counts(col) -> np.ndarray:
    """Per-row count of ASCII-contract tokens (split lowercased text on
    ``[^0-9a-z_]+``, count non-empty pieces; nulls count 0) — the SQL
    mirror is ``len(regexp_extract_all(lower(coalesce(text, '')),
    '[0-9a-z_]+'))``. One RE2 split + one bincount per batch."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    low = pc.utf8_lower(pc.fill_null(arr, ""))
    toks = pc.split_pattern_regex(low, pattern=r"[^0-9a-z_]+")
    lens = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    rowidx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    nonempty = pc.not_equal(flat, pa.scalar("")).to_numpy(
        zero_copy_only=False)
    return np.bincount(rowidx[nonempty],
                       minlength=len(lens)).astype(np.int64)


def token_budget_mix(ds, budget: int, group_col: str = "source",
                     key_col: str = "doc_id", text_col: str = "text",
                     seed: str = "mix"):
    """Deterministic per-group token-budget mixing — the data-mixing
    step of a training run ("take ~N tokens per source"): rows are
    ordered inside each group by the ``sample_by_hash`` md5 key (a
    uniform, resumable, rerun-stable order), then kept while the
    group's running token total stays within ``budget``. Token rule is
    the repo-wide ASCII RE2 contract (split lowercased text on
    ``[^0-9a-z_]+``, count non-empty pieces — SQL mirror
    ``len(regexp_extract_all(lower(text), '[0-9a-z_]+'))``).

    Scale shape: one vectorized counting pass, then the
    ``running_totals`` partition sweep (one lexsort per hash partition,
    exact int64 cumulative sums) and a stateless threshold filter —
    the shuffle carries only (key, group, count, hash) rows, never the
    text."""
    from raydedup.stages.ordered import running_totals

    prefix = f"{seed}:".encode()

    def tok(batch: pa.Table) -> pa.Table:
        n = ascii_token_counts(batch[text_col])
        return pa.table({
            key_col: batch[key_col],
            group_col: batch[group_col],
            "n_tokens": pa.array(n),
            "__hkey": pa.array(_hash60(batch[key_col].to_pylist(),
                                       prefix)),
        })

    counted = ds.map_batches(tok, batch_format="pyarrow")
    run = running_totals(counted, by=group_col,
                         order_cols=["__hkey", key_col],
                         value_col="n_tokens",
                         out_n="__rn", out_sum="__cum")
    return (run.filter(expr=f"__cum <= {int(budget)}")
            .select_columns([key_col, group_col, "n_tokens"]))


def split_assign(ds, key_col: str,
                 splits: list[tuple[str, float]] | None = None,
                 seed: str = "s0", out: str = "split"):
    """Deterministic train/val/test assignment: bucket =
    ``_hash60(seed || ':' || key)`` against cumulative-fraction
    thresholds in 2^60 units — stable across reruns and machines, and
    GROUP-CONSISTENT when ``key_col`` is a group key (hash a conv_id
    and every row of that conversation lands in the same split: no
    leakage across splits). One stateless vectorized pass, no shuffle.
    SQL mirror: CASE over the same integer thresholds on
    ``CAST('0x' || substr(md5(...), 1, 15) AS UBIGINT)``."""
    splits = splits or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    if abs(sum(f for _, f in splits) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    names = [n for n, _ in splits]
    cuts = []
    acc = 0.0
    for _, f in splits[:-1]:
        acc += f
        cuts.append(int(acc * (1 << 60)))
    prefix = f"{seed}:".encode()
    cuts_u = np.asarray(cuts, dtype=np.uint64)

    def assign(batch: pa.Table) -> pa.Table:
        h = _hash60(batch[key_col].to_pylist(), prefix)
        idx = np.searchsorted(cuts_u, h, side="right")
        lab = pa.DictionaryArray.from_arrays(
            pa.array(idx, pa.int32()), pa.array(names, pa.string()))
        return batch.append_column(out, pc.cast(lab, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def split_thresholds(splits: list[tuple[str, float]] | None = None):
    """The (name, lower-exclusive-upper) integer thresholds
    ``split_assign`` uses, for building the mirrored SQL CASE."""
    splits = splits or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    cuts = []
    acc = 0.0
    for _, f in splits[:-1]:
        acc += f
        cuts.append(int(acc * (1 << 60)))
    return [n for n, _ in splits], cuts


def trim_context_window(ds, budget: int, conv_col: str = "conv_id",
                        idx_col: str = "turn_idx",
                        text_col: str = "text"):
    """Context-window trimming: per conversation keep the LATEST turns
    whose cumulative ASCII-token count stays <= ``budget`` — the
    truncate-from-the-front step that fits transcripts into a model's
    context before packing. A newest turn larger than the whole budget
    drops its conversation entirely (cum > budget at the first row) —
    the same contract as the SQL window mirror.

    Shape: one vectorized token-count pass appends ``n_tok``, then the
    ``ordered.running_totals`` hash-partitioned sweep (one lexsort per
    partition, all conversations at once — not a Python call per key)
    accumulates in descending ``idx_col`` order via a negated sort key;
    a stateless filter keeps rows with ``cum_tokens <= budget``."""
    from raydedup.stages.ordered import running_totals

    def prep(b: pa.Table) -> pa.Table:
        n = ascii_token_counts(b[text_col])
        return (b.append_column("n_tok", pa.array(n))
                .append_column("__negidx", pc.multiply(
                    pc.cast(b[idx_col], pa.int64()), pa.scalar(-1))))

    swept = running_totals(
        ds.map_batches(prep, batch_format="pyarrow"),
        by=conv_col, order_cols=["__negidx"], value_col="n_tok",
        out_n="__rank", out_sum="cum_tokens")

    def keep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b["cum_tokens"], budget))
        return b.drop_columns(["__negidx", "__rank"])

    return swept.map_batches(keep, batch_format="pyarrow")


def upsample_by_weight(ds, group_col: str, weights: dict, key_col: str,
                       default: float = 1.0, seed: str = "mix0",
                       rep_col: str = "rep"):
    """Deterministic fractional source-weight mixing — the data-recipe
    primitive behind every LLM training mix ("web ×2.5, forums ×0.25"):
    each row whose ``group_col`` has weight ``w`` is emitted
    ``floor(w)`` times (``rep_col`` = 0..floor(w)-1) plus one more copy
    iff the low 60 bits of ``md5(seed || ':' || key)`` fall below
    ``frac(w)·2^60`` — the :func:`sample_by_hash` convention, so a
    row's fate depends only on its key: reruns, retries and resumed
    jobs up-sample identically, and ``w < 1`` degrades to plain
    hash down-sampling. The fractional threshold is computed ONCE as
    an exact integer on the driver (no float math per row on either
    side — the SQL oracle inlines the same integer literal).

    Scale shape: stateless vectorized map_batches (weight lookup via
    ``pc.index_in`` against the tiny closure-captured weight table,
    one ``np.repeat`` fan-out per batch); no shuffle, no driver
    materialization. Output size ≈ Σ w(row) rows — size ``batch_size``
    so ``max(w)`` × batch fits in worker heap.
    """
    for g, w in weights.items():
        if w < 0 or w > 1000:
            raise ValueError(f"weight out of range for {g!r}: {w}")
    if default < 0 or default > 1000:
        raise ValueError(f"default weight out of range: {default}")
    import math

    groups = list(weights)
    base_l = [int(math.floor(weights[g])) for g in groups]
    thr_l = [int((weights[g] - math.floor(weights[g])) * (1 << 60))
             for g in groups]
    d_base = int(math.floor(default))
    d_thr = int((default - math.floor(default)) * (1 << 60))
    prefix = f"{seed}:".encode()

    def fan(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            sch = batch.schema.append(pa.field(rep_col, pa.int64()))
            return sch.empty_table()
        garr = pa.array(groups, batch.schema.field(group_col).type)
        idx_arr = pc.index_in(batch[group_col].combine_chunks(), garr)
        # sentinel slot: unknown groups (index_in null) take the default
        # weight — also keeps an EMPTY weights dict working (both
        # np.where branches would otherwise index a zero-length array)
        ii = pc.fill_null(idx_arr, len(groups)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        base = np.asarray(base_l + [d_base], np.int64)[ii]
        thr = np.asarray(thr_l + [d_thr], np.uint64)[ii]
        h = _hash60(batch[key_col].to_pylist(), prefix)
        reps = base + (h < thr)
        src = np.repeat(np.arange(n, dtype=np.int64), reps)
        starts = np.r_[0, np.cumsum(reps)[:-1]]
        repidx = (np.arange(len(src), dtype=np.int64)
                  - np.repeat(starts, reps))
        oi = pa.array(src)
        cols = {c: batch[c].take(oi) for c in batch.column_names}
        cols[rep_col] = pa.array(repidx)
        return pa.table(cols)

    return ds.map_batches(fan, batch_format="pyarrow")


def unigram_logppl(ds, id_col: str = "doc_id", text_col: str = "text",
                   num_partitions: int | None = None):
    """Per-document unigram log-perplexity under the corpus's own
    unigram LM (the CCNet / Wenzek et al. 2020 quality-signal shape,
    with the corpus itself as the LM's training data):

        logppl(d) = ln(N) - (1/n_d) * sum_t tf(d,t) * ln(c(t))

    where c(t) is the corpus count of token t and N = sum_t c(t).
    Lower = more typical text; the extreme-high tail is noise/outliers,
    the extreme-low tail is boilerplate. Token contract = the ASCII RE2
    contract of ``_doc_term_codes`` (mirrors the oracle's
    ``regexp_extract_all(lower(text), '[0-9a-zA-Z_]+')``). Docs with
    zero tokens are omitted (they produce no token rows, matching SQL).

    Scale shape (100-TB design): pass 1 reduces per-batch token counts
    (one regex split + dictionary_encode + bincount) into a
    vocabulary-sized count Dataset — the corpus never shuffles. Pass 2
    explodes per-doc DISTINCT (id, token, tf) rows and hash-JOINS them
    to the count Dataset (the vocabulary is never driver-materialized
    or broadcast — Heaps' law makes it corpus-scale), then reduces
    per-doc partials under a doc-keyed groupby. Only the scalar N lands
    on the driver. Returns (id, n_tokens, logppl) at full precision.
    """
    import ray

    from ray.data.aggregate import Sum

    from raydedup.util import join_partitions

    def partial_counts(batch: pa.Table) -> pa.Table:
        empty = pa.table({"tok": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        _, codes, dictionary = _doc_term_codes(batch, text_col)
        if len(codes) == 0:
            return empty
        c = np.bincount(codes, minlength=len(dictionary))
        present = np.flatnonzero(c)
        return pa.table({"tok": dictionary.take(pa.array(present)),
                         "c": pa.array(c[present], pa.int64())})

    counts = (ds.select_columns([text_col])
              .map_batches(partial_counts, batch_format="pyarrow")
              .groupby("tok").aggregate(Sum("c", alias_name="c"))
              .materialize())
    n_vocab = counts.count()

    def tf_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: batch[id_col],
                             "tok": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        docidx, codes, dictionary = _doc_term_codes(batch, text_col)
        if len(codes) == 0:
            return pa.table({id_col: batch[id_col].slice(0, 0),
                             "tok": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        order = np.lexsort((codes, docidx))
        dc, cc = docidx[order], codes[order]
        first = np.r_[True, (dc[1:] != dc[:-1]) | (cc[1:] != cc[:-1])]
        starts = np.flatnonzero(first)
        tf = np.diff(np.r_[starts, len(cc)]).astype(np.int64)
        ids = batch[id_col].combine_chunks().take(pa.array(dc[starts]))
        return pa.table({id_col: ids,
                         "tok": dictionary.take(pa.array(cc[starts])),
                         "tf": pa.array(tf)})

    tf_ds = ds.select_columns([id_col, text_col]).map_batches(
        tf_rows, batch_format="pyarrow")
    if n_vocab == 0:
        sch = ds.schema()
        id_type = (dict(zip(sch.names, sch.types))[id_col]
                   if sch is not None and id_col in sch.names
                   else pa.int64())
        return ray.data.from_arrow(pa.schema(
            [pa.field(id_col, id_type), pa.field("n_tokens", pa.int64()),
             pa.field("logppl", pa.float64())]).empty_table())
    n_total = counts.sum("c")
    ln_n = float(np.log(float(n_total)))
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_parts = num_partitions or min(join_partitions(n_vocab),
                                    max(2, 2 * ncpu))
    joined = tf_ds.join(counts, join_type="inner",
                        num_partitions=n_parts, on=("tok",))

    def partial_doc(batch: pa.Table) -> pa.Table:
        empty = pa.table({id_col: batch[id_col].slice(0, 0)
                          if id_col in batch.column_names
                          else pa.array([], pa.int64()),
                          "s": pa.array([], pa.float64()),
                          "nd": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        ids = batch[id_col].combine_chunks()
        idnp = ids.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(idnp, return_inverse=True)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        # token-sorted accumulation order per doc (np.unique sorts) —
        # deterministic within a partial; cross-partial merge order is
        # absorbed by the query-level 6-decimal rounding contract
        s = np.zeros(len(uniq))
        np.add.at(s, inv, tf * np.log(c))
        nd = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(nd, inv, tf.astype(np.int64))
        first_at = np.zeros(len(uniq), dtype=np.int64)
        first_at[inv[::-1]] = np.arange(len(inv))[::-1]
        return pa.table({id_col: ids.take(pa.array(first_at)),
                         "s": pa.array(s),
                         "nd": pa.array(nd)})

    per = (joined.map_batches(partial_doc, batch_format="pyarrow")
           .groupby(id_col).aggregate(Sum("s", alias_name="s"),
                                      Sum("nd", alias_name="nd")))

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: batch[id_col],
                             "n_tokens": pa.array([], pa.int64()),
                             "logppl": pa.array([], pa.float64())})
        nd = batch["nd"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch["s"].to_numpy(zero_copy_only=False)
        return pa.table({id_col: batch[id_col],
                         "n_tokens": batch["nd"],
                         "logppl": pa.array(ln_n - s / nd)})

    return per.map_batches(finish, batch_format="pyarrow")


def assign_shards(ds, n_shards: int = 16, key_col: str = "doc_id",
                  seed: str = "shard0"):
    """Deterministic output-shard assignment: ``shard =
    md5-low60(seed || ':' || key) % n_shards`` (the ``sample_by_hash``
    md5 contract — SQL mirror in the oracle). The primitive behind
    resumable partitioned writes (``state/checkpoint.sharded_stage``):
    a failed 100-TB run re-derives identical shard membership and skips
    completed shards. Appends a ``shard`` int64 column."""
    prefix = f"{seed}:".encode()
    k = int(n_shards)

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("shard", pa.array([], pa.int64()))
        h = _hash60(batch[key_col].to_pylist(), prefix)
        return batch.append_column(
            "shard", pa.array((h % k).astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow")


def shard_manifest(ds, n_shards: int = 16, key_col: str = "doc_id",
                   seed: str = "shard0"):
    """Per-shard manifest stats ``(shard, n_docs, min_id, max_id)`` for
    the ``assign_shards`` layout — what a resume checks before skipping
    a shard. One small groupby (<= n_shards rows cross the exchange
    after per-batch partial aggregation by Ray's combiner)."""
    from ray.data.aggregate import Count, Max, Min

    return (assign_shards(ds.select_columns([key_col]), n_shards,
                          key_col, seed)
            .groupby("shard")
            .aggregate(Count(alias_name="n_docs"),
                       Min(key_col, alias_name="min_id"),
                       Max(key_col, alias_name="max_id")))


def bigram_logppl(ds, id_col: str = "doc_id", text_col: str = "text",
                  num_partitions: int | None = None):
    """Per-document BIGRAM conditional log-perplexity under the
    corpus's own bigram LM (one step toward the CCNet KenLM scorer):

        logppl2(d) = (1/b_d) * sum_i [ln(cctx(w_{i-1})) - ln(c2(w_{i-1} w_i))]

    where c2 is the corpus count of the bigram, cctx(w) = sum_v c2(w v)
    (occurrences of w as a context — the exact normalizer, so the
    conditional p(w_i|w_{i-1}) = c2/cctx sums to 1 per context), and
    b_d = n_d - 1 bigrams. Self-corpus scoring means every bigram is
    seen (no smoothing needed). Docs with < 2 tokens are omitted.

    Scale shape mirrors ``unigram_logppl``: per-batch partial bigram
    counts reduce into a bigram-vocabulary Dataset; the context table
    derives from IT (not the corpus); pass 2 hash-joins exploded
    per-doc bigram tf rows to both tables — nothing vocabulary- or
    corpus-sized touches the driver. Bigram key = ``prev || ' ' ||
    next`` (tokens cannot contain spaces under the ASCII RE2 contract).
    """
    import ray

    from ray.data.aggregate import Sum

    from raydedup.util import join_partitions

    def _bigrams(batch: pa.Table):
        """→ (docidx_of_bigram, 'prev next' string array)."""
        docidx, codes, dictionary = _doc_term_codes(batch, text_col)
        if len(codes) < 2:
            return (np.empty(0, np.int64),
                    pa.array([], pa.string()))
        same = docidx[1:] == docidx[:-1]
        at = np.flatnonzero(same)
        if at.size == 0:
            return np.empty(0, np.int64), pa.array([], pa.string())
        prev = dictionary.take(pa.array(codes[at]))
        nxt = dictionary.take(pa.array(codes[at + 1]))
        bi = pc.binary_join_element_wise(prev, nxt, pa.scalar(" "))
        return docidx[at], bi

    def partial_counts(batch: pa.Table) -> pa.Table:
        empty = pa.table({"bi": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        _, bi = _bigrams(batch)
        if len(bi) == 0:
            return empty
        enc = pc.dictionary_encode(bi)
        c = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                        minlength=len(enc.dictionary))
        present = np.flatnonzero(c)
        return pa.table({"bi": enc.dictionary.take(pa.array(present)),
                         "c": pa.array(c[present], pa.int64())})

    c2 = (ds.select_columns([text_col])
          .map_batches(partial_counts, batch_format="pyarrow")
          .groupby("bi").aggregate(Sum("c", alias_name="c"))
          .materialize())
    n_bi_vocab = c2.count()
    if n_bi_vocab == 0:
        sch = ds.schema()
        id_type = (dict(zip(sch.names, sch.types))[id_col]
                   if sch is not None and id_col in sch.names
                   else pa.int64())
        return ray.data.from_arrow(pa.schema(
            [pa.field(id_col, id_type),
             pa.field("n_bigrams", pa.int64()),
             pa.field("logppl2", pa.float64())]).empty_table())

    def ctx_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"prev": pa.array([], pa.string()),
                             "cc": pa.array([], pa.int64())})
        prev = pc.list_element(
            pc.split_pattern(batch["bi"].combine_chunks(), " "), 0)
        return pa.table({"prev": prev, "cc": batch["c"]})

    cctx = (c2.map_batches(ctx_partial, batch_format="pyarrow")
            .groupby("prev").aggregate(Sum("cc", alias_name="cc"))
            .materialize())

    def tf_rows(batch: pa.Table) -> pa.Table:
        empty = pa.table({id_col: batch[id_col].slice(0, 0)
                          if id_col in batch.column_names
                          else pa.array([], pa.int64()),
                          "bi": pa.array([], pa.string()),
                          "tf": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        docidx, bi = _bigrams(batch)
        if len(bi) == 0:
            return empty
        enc = pc.dictionary_encode(bi)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((codes, docidx))
        dc, cc = docidx[order], codes[order]
        first = np.r_[True, (dc[1:] != dc[:-1]) | (cc[1:] != cc[:-1])]
        starts = np.flatnonzero(first)
        tf = np.diff(np.r_[starts, len(cc)]).astype(np.int64)
        ids = batch[id_col].combine_chunks().take(pa.array(dc[starts]))
        return pa.table({id_col: ids,
                         "bi": enc.dictionary.take(pa.array(cc[starts])),
                         "tf": pa.array(tf)})

    tf_ds = ds.select_columns([id_col, text_col]).map_batches(
        tf_rows, batch_format="pyarrow")
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_parts = num_partitions or min(join_partitions(n_bi_vocab),
                                    max(2, 2 * ncpu))
    joined = tf_ds.join(c2, join_type="inner",
                        num_partitions=n_parts, on=("bi",))

    def add_prev(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("prev", pa.array([], pa.string()))
        prev = pc.list_element(
            pc.split_pattern(batch["bi"].combine_chunks(), " "), 0)
        return batch.append_column("prev", prev)

    joined2 = joined.map_batches(add_prev, batch_format="pyarrow").join(
        cctx, join_type="inner", num_partitions=n_parts, on=("prev",))

    def partial_doc(batch: pa.Table) -> pa.Table:
        empty = pa.table({id_col: batch[id_col].slice(0, 0)
                          if id_col in batch.column_names
                          else pa.array([], pa.int64()),
                          "s": pa.array([], pa.float64()),
                          "nb": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        ids = batch[id_col].combine_chunks()
        idnp = ids.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(idnp, return_inverse=True)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        cc = batch["cc"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.zeros(len(uniq))
        np.add.at(s, inv, tf * (np.log(cc) - np.log(c)))
        nb = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(nb, inv, tf.astype(np.int64))
        first_at = np.zeros(len(uniq), dtype=np.int64)
        first_at[inv[::-1]] = np.arange(len(inv))[::-1]
        return pa.table({id_col: ids.take(pa.array(first_at)),
                         "s": pa.array(s), "nb": pa.array(nb)})

    per = (joined2.map_batches(partial_doc, batch_format="pyarrow")
           .groupby(id_col).aggregate(Sum("s", alias_name="s"),
                                      Sum("nb", alias_name="nb")))

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: batch[id_col],
                             "n_bigrams": pa.array([], pa.int64()),
                             "logppl2": pa.array([], pa.float64())})
        nb = batch["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch["s"].to_numpy(zero_copy_only=False)
        return pa.table({id_col: batch[id_col],
                         "n_bigrams": batch["nb"],
                         "logppl2": pa.array(s / nb)})

    return per.map_batches(finish, batch_format="pyarrow")


def _dsir_feat_buckets(batch: pa.Table, text_col: str, n_buckets: int,
                       prefix: bytes):
    """batch → (doc_row_idx, bucket) rows for DSIR's hashed unigram +
    adjacent-bigram feature space. md5 runs once per DISTINCT unigram /
    DISTINCT bigram per batch (the per-distinct-value hashing idiom of
    ``asof._part_array`` / ``linededup._line_hashes``); instances map
    through integer code lookups."""
    docidx, codes, dictionary = _doc_term_codes(batch, text_col)
    if len(codes) == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    toks = dictionary.to_pylist()
    uni_b = (_hash60(toks, prefix) % np.uint64(n_buckets)).astype(np.int64)
    b_uni = uni_b[codes]
    adj = docidx[1:] == docidx[:-1]
    ci, cj = codes[:-1][adj], codes[1:][adj]
    if ci.size:
        k = np.int64(len(toks))
        upair, pinv = np.unique(ci * k + cj, return_inverse=True)
        pair_strs = [f"{toks[p // k]} {toks[p % k]}" for p in upair]
        bi_b = (_hash60(pair_strs, prefix)
                % np.uint64(n_buckets)).astype(np.int64)
        b_bi = bi_b[pinv]
    else:
        b_bi = np.empty(0, dtype=np.int64)
    docf = np.r_[docidx, docidx[:-1][adj]]
    return docf, np.r_[b_uni, b_bi]


def _dsir_bucket_counts(ds, text_col: str, n_buckets: int,
                        prefix: bytes) -> np.ndarray:
    """corpus → dense length-``n_buckets`` int64 feature-instance count
    vector. Per-batch bincount partials shuffle at most B (bucket,
    count) rows each; the groupby output is B-bounded BY CONFIG, so the
    driver materialization is fixed-size, not corpus-scale."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"b": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        _, b = _dsir_feat_buckets(batch, text_col, n_buckets, prefix)
        if b.size == 0:
            return empty
        c = np.bincount(b, minlength=n_buckets)
        present = np.flatnonzero(c)
        return pa.table({"b": pa.array(present, pa.int64()),
                         "c": pa.array(c[present], pa.int64())})

    rows = (ds.select_columns([text_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("b").aggregate(Sum("c", alias_name="c"))
            .take_all())
    out = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        out[r["b"]] = r["c"]
    return out


def dsir_logweights(raw, target, n_buckets: int = 4096,
                    id_col: str = "doc_id", text_col: str = "text",
                    seed: str = "dsir0"):
    """DSIR data-selection importance log-weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score each raw-corpus document by how target-like it looks under
    bag-of-hashed-ngrams models of the two corpora,

        log_w(d) = sum_f [ln p_t(b(f)) - ln p_r(b(f))]

    summed over d's unigram + adjacent-bigram feature INSTANCES f, with
    buckets b(f) = md5-low60(seed || ':' || f) % n_buckets (the
    ``sample_by_hash`` hash contract, so the SQL oracle replays it) and
    add-1-smoothed bucket probabilities p(b) = (c(b)+1) / (N+B).
    High-log_w docs are the target-like ones to keep / up-sample; the
    engine emits deterministic weights and leaves the sampling policy
    to ``upsample_by_weight`` / ``topk_by_group`` (the paper resamples
    proportionally with Gumbel noise — policy, not measurement).
    Token contract = the ASCII RE2 contract of ``_doc_term_codes``.
    Docs with zero tokens are omitted (they produce no feature rows,
    matching SQL). Returns ``(id, n_feats, log_w)``.

    Scale shape (100-TB design): DSIR's model state is two length-B
    count vectors — FIXED-size by construction (hashing n-grams into B
    buckets is the paper's point), unlike a vocabulary. So the ln-ratio
    table rides the scoring closure (B doubles, ~32 KB at the default),
    NOT a corpus-scale broadcast. Count pass per corpus = one streaming
    map_batches of bincount partials + one B-bounded groupby; scoring
    pass = one streaming map_batches over raw with np.add.at per-doc
    accumulation. Nothing corpus-scale ever shuffles or lands on the
    driver.
    """
    import ray.data

    prefix = f"{seed}:".encode()
    cr = _dsir_bucket_counts(raw, text_col, n_buckets, prefix)
    ct = _dsir_bucket_counts(target, text_col, n_buckets, prefix)
    lam = np.log(ct + 1.0) - np.log(cr + 1.0)
    const = float(np.log(float(cr.sum()) + n_buckets)
                  - np.log(float(ct.sum()) + n_buckets))
    out_schema = pa.schema([
        pa.field(id_col, pa.int64()), pa.field("n_feats", pa.int64()),
        pa.field("log_w", pa.float64()),
    ])

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        docf, b = _dsir_feat_buckets(batch, text_col, n_buckets, prefix)
        s = np.zeros(batch.num_rows)
        np.add.at(s, docf, lam[b])
        nf = np.bincount(docf, minlength=batch.num_rows)
        has = np.flatnonzero(nf > 0)
        ids = batch[id_col].combine_chunks().take(pa.array(has))
        return pa.table({
            id_col: ids,
            "n_feats": pa.array(nf[has], pa.int64()),
            "log_w": pa.array(s[has] + nf[has] * const),
        })

    return (raw.select_columns([id_col, text_col])
            .map_batches(score, batch_format="pyarrow")
            .union(ray.data.from_arrow(out_schema.empty_table())))


def effective_tokens_by_group(ds, group_col: str = "source",
                              text_col: str = "text",
                              num_partitions: int | None = None):
    """Effective (dedup-weighted) token census per group: under soft
    deduplication (SoftDedup, He et al. 2024 — every copy of a text
    carries weight 1/n_copies), how many tokens' worth of UNIQUE signal
    does each source actually contribute?

        eff_tokens(s) = sum over distinct texts t of
                        tok(t) * copies(t, s) / copies(t, total)

    Also reports raw n_docs / n_tokens, so (n_tokens − eff_tokens) is
    the source's redundancy tax. Token contract = the ascii RE2
    contract of :func:`ascii_token_counts`; NULL text folds to ''.
    Returns ``(group, n_docs, n_tokens, eff_tokens)``.

    Scale shape (100-TB design): rows reduce inside ``map_batches`` to
    DISTINCT (sha, group) partials carrying (c = copies, ct = copies ×
    tokens) — both LINEAR, so cross-batch Sum is exact; texts never
    shuffle and tokens are counted once per DISTINCT text per batch.
    One sha-keyed groupby totals copies per text, one skinny join feeds
    per-cell shares ct/n, one group-keyed groupby emits ≤ groups rows.
    Float accumulation lands under the query-level 6-decimal contract.
    """
    import hashlib

    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from raydedup.util import join_partitions

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"sha": pa.array([], pa.string()),
                          group_col: batch[group_col].slice(0, 0)
                          if group_col in batch.column_names
                          else pa.array([], pa.string()),
                          "c": pa.array([], pa.int64()),
                          "ct": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        filled = pc.fill_null(batch[text_col].combine_chunks(), "")
        enc = pc.dictionary_encode(filled)
        dic = enc.dictionary
        shas = pa.array([hashlib.sha256(t.encode("utf-8")).hexdigest()
                         for t in dic.to_pylist()], pa.string())
        toks = ascii_token_counts(dic)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        genc = pc.dictionary_encode(batch[group_col].combine_chunks())
        ng = len(genc.dictionary)
        gcodes = genc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        pair = codes * np.int64(ng) + gcodes
        up, cnt = np.unique(pair, return_counts=True)
        tcode, gcode = up // ng, up % ng
        c = cnt.astype(np.int64)
        return pa.table({
            "sha": pc.take(shas, pa.array(tcode)),
            group_col: pc.take(genc.dictionary, pa.array(gcode)),
            "c": pa.array(c),
            "ct": pa.array(c * toks[tcode], pa.int64())})

    cells = (ds.select_columns([group_col, text_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby(["sha", group_col])
             .aggregate(Sum("c", alias_name="c"),
                        Sum("ct", alias_name="ct"))
             .materialize())
    totals = cells.groupby("sha").aggregate(Sum("c", alias_name="n"))
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    jp = num_partitions or min(join_partitions(max(cells.count(), 1)),
                               max(2, 2 * ncpu))
    joined = cells.join(totals, join_type="inner", num_partitions=jp,
                        on=("sha",))

    def share(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: batch[group_col],
                             "nd": pa.array([], pa.int64()),
                             "nt": pa.array([], pa.int64()),
                             "eff": pa.array([], pa.float64())})
        ct = batch["ct"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({group_col: batch[group_col],
                         "nd": batch["c"],
                         "nt": batch["ct"],
                         "eff": pa.array(ct / n)})

    out = (joined.map_batches(share, batch_format="pyarrow")
           .groupby(group_col)
           .aggregate(Sum("nd", alias_name="n_docs"),
                      Sum("nt", alias_name="n_tokens"),
                      Sum("eff", alias_name="eff_tokens")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            group_col: batch[group_col],
            "n_docs": pc.cast(batch["n_docs"], pa.int64()),
            "n_tokens": pc.cast(batch["n_tokens"], pa.int64()),
            "eff_tokens": pc.cast(batch["eff_tokens"], pa.float64())})

    return out.map_batches(finish, batch_format="pyarrow")


class AhoCorasickScanner:
    """LARGE-blocklist banned-phrase scan via an Aho-Corasick automaton
    (Aho & Corasick 1975) in a Ray ACTOR POOL — the third blocklist
    kernel next to the per-phrase Arrow substring pass
    (``blocklist_scan``, small P) and the Rabin-Karp rolling-hash pass
    (``blocklist_scan_rk``, one pass per distinct LENGTH): the automaton
    visits each character ONCE regardless of blocklist size, the right
    shape when P reaches tens of thousands of phrases.

    Ray shape: a callable CLASS for ``map_batches(cls, concurrency=N,
    fn_constructor_kwargs=...)`` — the goto/fail/output tables build
    ONCE per actor in ``__init__`` (the automaton is the expensive
    state), each ``__call__`` scans a batch. Same output contract as
    the other two kernels: (key, phrase, n_hits) with NON-OVERLAPPING
    leftmost counts PER PHRASE (greedy left-to-right on that phrase's
    match ends, independent of other phrases), so all three share one
    SQL oracle.
    """

    def __init__(self, phrases: list[str], key_col: str = "doc_id",
                 text_col: str = "text", case_insensitive: bool = True):
        if not phrases:
            raise ValueError("phrases must be non-empty")
        self.key_col, self.text_col = key_col, text_col
        self.fold = case_insensitive
        plist = [p.lower() if case_insensitive else p for p in phrases]
        if any(not p for p in plist):
            raise ValueError("empty phrase in blocklist")
        self.phrases = plist
        # goto as list[dict], fail links, output = phrase indices ending
        # at each state (inherited via fail links at build time)
        goto: list[dict] = [{}]
        out: list[list[int]] = [[]]
        for pi, p in enumerate(plist):
            s = 0
            for ch in p:
                nxt = goto[s].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append([])
                    nxt = len(goto) - 1
                    goto[s][ch] = nxt
                s = nxt
            out[s].append(pi)
        from collections import deque

        fail = [0] * len(goto)
        q = deque()
        for ch, s in goto[0].items():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in goto[r].items():
                q.append(s)
                f = fail[r]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[s] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != s \
                    else 0
                out[s] = out[s] + out[fail[s]]
        self._goto, self._fail, self._out = goto, fail, out
        self._plens = [len(p) for p in plist]

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col]
        txt = pc.fill_null(batch[self.text_col].combine_chunks(), "")
        if self.fold:
            txt = pc.utf8_lower(txt)
        goto, fail, out = self._goto, self._fail, self._out
        plens = self._plens
        out_k_idx, out_p, out_n = [], [], []
        for ri, t in enumerate(txt.to_pylist()):
            if not t:
                continue
            s = 0
            ends: dict[int, list] = {}
            for i, ch in enumerate(t):
                while s and ch not in goto[s]:
                    s = fail[s]
                s = goto[s].get(ch, 0)
                if out[s]:
                    for pi in out[s]:
                        ends.setdefault(pi, []).append(i + 1)
            for pi, es in ends.items():
                L = plens[pi]
                n, prev_end = 0, -1
                for e in es:  # ends are ascending by construction
                    if e - L >= prev_end:
                        n += 1
                        prev_end = e
                out_k_idx.append(ri)
                out_p.append(self.phrases[pi])
                out_n.append(n)
        key_type = batch.schema.field(self.key_col).type
        if not out_k_idx:
            return pa.table({self.key_col: pa.array([], key_type),
                             "phrase": pa.array([], pa.string()),
                             "n_hits": pa.array([], pa.int64())})
        return pa.table({
            self.key_col: keys.take(pa.array(out_k_idx)),
            "phrase": pa.array(out_p, pa.string()),
            "n_hits": pa.array(out_n, pa.int64()),
        })


def blocklist_scan_ac(ds, phrases: list[str], key_col: str = "doc_id",
                      text_col: str = "text",
                      case_insensitive: bool = True,
                      concurrency: int = 4):
    """Aho-Corasick blocklist scan as an actor-pool stage (automaton
    built once per actor). Same (key, phrase, n_hits) contract as
    blocklist_scan / blocklist_scan_rk."""
    return ds.select_columns([key_col, text_col]).map_batches(
        AhoCorasickScanner,
        fn_constructor_kwargs=dict(phrases=phrases, key_col=key_col,
                                   text_col=text_col,
                                   case_insensitive=case_insensitive),
        batch_format="pyarrow", concurrency=concurrency)
