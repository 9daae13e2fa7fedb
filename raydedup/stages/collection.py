"""Collection-wide measures — reference parity for
``otmt/collection_measures.py:96-214``.

The reference concatenates EVERY memento's token list into one global bag
and scores each memento's tokens against it with distance.jaccard /
distance.sorensen (set semantics). Because each doc's token SET is a
subset of the global set G, the scores reduce to closed forms:

    jaccard  = 1 - |A| / |G|
    sorensen = 1 - 2|A| / (|A| + |G|)

which turns the reference's quadratic re-read into two cheap aggregates:
one distributed distinct-token count (the canonical partial-then-merge
aggregation, SURVEY §2.6) and a per-row distinct count. The tokenizer is
selectable: the stemmed engine tokenizer (reference semantics) or the
simple lowercase tokenizer (SQL-mirrorable for the DuckDB oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.textnorm import full_tokenize, simple_tokenize


def _token_prep(simple: bool):
    def prep(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch["text"].to_pylist()]
        if simple:
            sets = [set(simple_tokenize(t)) for t in texts]
        else:
            sets = [set(full_tokenize(t)) for t in texts]
        cols = {n: batch[n] for n in batch.column_names if n != "text"}
        cols["token_set"] = pa.array([sorted(s) for s in sets],
                                     type=pa.list_(pa.string()))
        cols["n_distinct_tokens"] = pa.array([len(s) for s in sets],
                                             type=pa.int64())
        return pa.table(cols)

    return prep


def collection_measures(ds, key_cols: list[str], simple_tokens: bool = False):
    """→ Dataset(key_cols..., n_distinct_tokens, collection_jaccard,
    collection_sorensen). Two passes over a small prepped projection:
    pass 1 aggregates |G| (distinct-token count via explode+groupby);
    pass 2 is a stateless map with |G| closed over."""
    prepped = ds.map_batches(_token_prep(simple_tokens),
                             batch_format="pyarrow").materialize()

    def explode(batch: pa.Table) -> pa.Table:
        toks = batch["token_set"].combine_chunks()
        return pa.table({"token": toks.flatten()})

    distinct = (
        prepped.select_columns(["token_set"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("token")
        .count()
    )
    g_size = distinct.count()

    def score(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch["n_distinct_tokens"], pa.float64())
        g = pa.scalar(float(g_size))
        jac = pc.subtract(pa.scalar(1.0), pc.divide(a, g))
        sor = pc.subtract(
            pa.scalar(1.0),
            pc.divide(pc.multiply(pa.scalar(2.0), a), pc.add(a, g)),
        )
        cols = {c: batch[c] for c in key_cols}
        cols["n_distinct_tokens"] = batch["n_distinct_tokens"]
        cols["collection_jaccard"] = jac
        cols["collection_sorensen"] = sor
        return pa.table(cols)

    return prepped.map_batches(score, batch_format="pyarrow")


def _batch_term_counts(batch: pa.Table, text_col: str, tokenize):
    """(terms Array, counts int64 ndarray) of one batch's token bag —
    the single tokenize+count kernel shared by the exact top-k path,
    the Misra-Gries partials and the candidate re-count (one place to
    keep the bit-identical-output contract)."""
    toks: list[str] = []
    for t in batch[text_col].to_pylist():
        if t:
            toks.extend(tokenize(t))
    if not toks:
        return None, None
    vc = pc.value_counts(pa.array(toks, type=pa.string()))
    counts = pc.cast(vc.field("counts"), pa.int64()).to_numpy(
        zero_copy_only=False)
    return vc.field("values"), counts


def global_top_terms(ds, k: int = 20, text_col: str = "text",
                     simple_tokens: bool = True):
    """→ Dataset(term, n): global term-frequency top-k with the reference
    tie-break — (count, token) tuple-sorted DESCENDING, i.e. count ties
    break reverse-lexicographically (calculate_term_frequencies,
    otmt/timemap_measures.py:474-491; scalar twin in
    functions/setsim.py:top_terms).

    Distributed as partial-then-merge: each batch emits its own
    (term, count) partials via one ``pc.value_counts`` call, the groupby
    sums over DISTINCT terms only (vocabulary-sized, not corpus-sized),
    and the final sort+limit runs over the vocabulary table."""
    tokenize = simple_tokenize if simple_tokens else full_tokenize
    empty = pa.table({"term": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        terms, counts = _batch_term_counts(batch, text_col, tokenize)
        if terms is None:
            return empty
        return pa.table({"term": terms, "n": pa.array(counts)})

    from ray.data.aggregate import Sum

    counts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    totals = counts.groupby("term").aggregate(Sum("n", alias_name="n"))
    return totals.sort(["n", "term"], descending=[True, True]).limit(k)


def inverted_index(ds, id_col: str = "doc_id", text_col: str = "text"):
    """→ Dataset(term, postings, df): the inverted index — for every
    token, the comma-joined ascending list of distinct doc ids containing
    it plus its document frequency. Postings are strings so the oracle
    (``string_agg(... ORDER BY doc_id)``) compares byte-for-byte.

    Scale shape: per-batch DISTINCT (term, doc) pairs (exact — one doc
    per row), one vocabulary-keyed groupby; the shuffle carries (term,
    id) pairs, i.e. the index itself, which is the irreducible exchange
    for this output. Degenerate stopword terms produce long posting rows
    — cap or drop high-df terms upstream if the downstream can't take
    them (documented, not silently truncated here)."""
    empty = pa.table({"term": pa.array([], pa.string()),
                      "doc": pa.array([], pa.int64())})

    def pairs(batch: pa.Table) -> pa.Table:
        terms: list[str] = []
        docs: list[int] = []
        ids = batch[id_col].to_pylist()
        for i, t in zip(ids, batch[text_col].to_pylist()):
            if not t:
                continue
            for tok in set(simple_tokenize(t)):
                terms.append(tok)
                docs.append(i)
        if not terms:
            return empty
        return pa.table({"term": pa.array(terms, pa.string()),
                         "doc": pa.array(docs, pa.int64())})

    def join_postings(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "doc" not in g.column_names:
            return pa.table({"term": pa.array([], pa.string()),
                             "postings": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        ids = sorted(g["doc"].to_pylist())
        return pa.table({"term": g["term"][:1],
                         "postings": pa.array(
                             [",".join(map(str, ids))], pa.string()),
                         "df": pa.array([len(ids)], pa.int64())})

    return (ds.select_columns([id_col, text_col])
            .map_batches(pairs, batch_format="pyarrow")
            .groupby("term").map_groups(join_postings,
                                        batch_format="pyarrow"))


def _flat_tokens(col) -> tuple[pa.Array, np.ndarray]:
    """Text column → (flat lowercase ASCII tokens, owning-row index):
    one RE2 split per batch, empties filtered vectorized — the shared
    tokenizer for the n-gram collocation stages (same token contract as
    the ``regexp_extract_all('[0-9a-z_]+')`` SQL oracles)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    low = pc.utf8_lower(pc.fill_null(arr, ""))
    toks = pc.split_pattern_regex(low, pattern=r"[^0-9a-z_]+")
    lens = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    rowidx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keepmask = pc.not_equal(flat, pa.scalar("")).to_numpy(
        zero_copy_only=False)
    if len(keepmask) and not keepmask.all():
        flat = flat.filter(pa.array(keepmask))
        rowidx = rowidx[keepmask]
    return flat, rowidx


def _unigram_counts(ds, text_col: str = "text", out: str = "n_term"):
    """→ Dataset(term, n_term): global token counts, vectorized partial
    (one value_counts per batch) then one grouped sum over (term, n)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch[text_col])
        vc = pc.value_counts(flat)
        return pa.table({"term": vc.field("values"),
                         out: pc.cast(vc.field("counts"), pa.int64())})

    return (ds.select_columns([text_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("term").aggregate(Sum(out, alias_name=out)))


def token_frequency_spectrum(ds, text_col: str = "text"):
    """Zipf / Heaps corpus-health audit: → Dataset(tf, n_types) — for
    every global occurrence count ``tf``, how many DISTINCT token types
    occur exactly that often. The frequency spectrum is the one-glance
    check that a corpus follows the expected power law: a bulge at
    tf = 2..4 means boilerplate duplication, a depleted hapax count
    (tf = 1) means the crawl re-visited itself, and dedup runs can be
    compared before/after by their spectra.

    Scale shape: the corpus reduces to the vocabulary-sized global
    count table via ``_unigram_counts`` (per-batch value_counts partial,
    one grouped sum), then collapses to at most |distinct tf values|
    rows in a counting groupby — output is ~log-scale in corpus size;
    nothing lands on the driver."""
    from ray.data.aggregate import Count

    spec = _unigram_counts(ds, text_col, out="c").groupby("c").aggregate(
        Count(alias_name="n_types"))

    def fix(batch: pa.Table) -> pa.Table:
        return pa.table({"tf": pc.cast(batch["c"], pa.int64()),
                         "n_types": pc.cast(batch["n_types"],
                                            pa.int64())})

    return spec.map_batches(fix, batch_format="pyarrow")


def _bigram_counts(ds, text_col: str = "text", out: str = "n_ab"):
    """→ Dataset(w1, w2, n_ab): global adjacent-token pair counts.
    Pairs come from one shifted same-row mask over the flat token
    array; each batch collapses to its distinct pairs via value_counts
    before the shuffle."""
    from ray.data.aggregate import Sum

    empty = pa.table({"w1": pa.array([], pa.string()),
                      "w2": pa.array([], pa.string()),
                      out: pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        flat, rowidx = _flat_tokens(batch[text_col])
        if len(rowidx) < 2:
            return empty
        same = rowidx[1:] == rowidx[:-1]
        if not same.any():
            return empty
        sel = pa.array(same)
        a = flat.slice(0, len(flat) - 1).filter(sel)
        b = flat.slice(1).filter(sel)
        # count distinct (w1, w2) pairs via value_counts on a joined
        # key (one hash pass), then split back — '\x1f' cannot appear
        # in [0-9a-z_]+ tokens
        vc = pc.value_counts(pc.binary_join_element_wise(a, b, "\x1f"))
        parts = pc.split_pattern(vc.field("values"), pattern="\x1f")
        w1 = pc.list_element(parts, 0)
        w2 = pc.list_element(parts, 1)
        return pa.table({"w1": w1, "w2": w2,
                         out: pc.cast(vc.field("counts"), pa.int64())})

    return (ds.select_columns([text_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["w1", "w2"]).aggregate(Sum(out, alias_name=out)))


def top_bigrams(ds, k: int = 50, text_col: str = "text"):
    """Global top-k adjacent-token bigrams under the ASCII token
    contract — the collocation profile (and boilerplate-phrase
    detector) of a corpus. Built on ``_bigram_counts``; the shuffle
    carries only (pair, partial count) rows and the final sort+limit
    runs on the aggregated table. Tie rule shared with the oracle:
    count desc, bigram desc."""

    def join(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "w1" not in b.column_names:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"bigram": pc.binary_join_element_wise(
            b["w1"], b["w2"], " "), "n": b["n_ab"]})

    counts = _bigram_counts(ds, text_col)
    totals = counts.map_batches(join, batch_format="pyarrow")
    return totals.sort(["n", "bigram"], descending=[True, True]).limit(k)


def pmi_bigrams(ds, k: int = 30, min_n: int = 5, text_col: str = "text",
                nudge: float = 1e-9, round_dp: int = 6):
    """Top-k collocations by pointwise mutual information: PMI(a,b) =
    ln(p(ab) / (p(a)·p(b))) over adjacent-token bigrams with
    ``n_ab >= min_n`` — the classic phrase detector (boilerplate
    templates and named entities float to the top).
    → Dataset(bigram, n_ab, pmi), pmi rounded half-away at
    ``round_dp`` with a shared ``nudge`` so the engine's float path
    bit-matches the SQL oracle's (same trick as bm25); ties then break
    by bigram asc.

    Shape: unigram and bigram count tables stay Datasets; the two
    frequency lookups are distributed hash joins (never a vocabulary
    broadcast — Heaps' law makes the unigram table corpus-scale at
    100 TB); only the two scalar totals (token count, bigram count)
    reduce to the driver. Sort+limit runs on the min_n-filtered
    aggregated table."""
    import ray

    from raydedup.util import join_partitions, round_half_away

    uni = _unigram_counts(ds, text_col).materialize()   # summed + joined
    big = _bigram_counts(ds, text_col).materialize()    # summed + filtered
    n_tok = float(uni.sum("n_term") or 0)
    n_big = float(big.sum("n_ab") or 0)
    if n_big == 0:
        import ray.data

        return ray.data.from_arrow(pa.table(
            {"bigram": pa.array([], pa.string()),
             "n_ab": pa.array([], pa.int64()),
             "pmi": pa.array([], pa.float64())}))

    nparts = join_partitions(big.count())

    def keep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n_ab" not in b.column_names:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n_ab": pa.array([], pa.int64())})
        return b.filter(pc.greater_equal(b["n_ab"], min_n))

    cand = big.map_batches(keep, batch_format="pyarrow")
    j1 = cand.join(uni, join_type="inner", num_partitions=nparts,
                   on=("w1",), right_on=("term",))

    # fixed-schema projection between chained joins (Ray 2.49 emits
    # empty-schema blocks from empty hash partitions)
    def fix1(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n_term" not in b.column_names:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n_ab": pa.array([], pa.int64()),
                             "n1": pa.array([], pa.int64())})
        return pa.table({"w1": b["w1"], "w2": b["w2"],
                         "n_ab": b["n_ab"], "n1": b["n_term"]})

    j2 = j1.map_batches(fix1, batch_format="pyarrow").join(
        uni, join_type="inner", num_partitions=nparts,
        on=("w2",), right_on=("term",))

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n_term" not in b.column_names:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n_ab": pa.array([], pa.int64()),
                             "pmi": pa.array([], pa.float64())})
        nab = b["n_ab"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        n1 = b["n1"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        n2 = b["n_term"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        # operand ORDER mirrors the SQL expression exactly
        pmi = np.log((nab * n_tok * n_tok) / (n_big * n1 * n2))
        scale = 10.0 ** round_dp
        pmi = round_half_away((pmi + nudge) * scale) / scale
        return pa.table({"bigram": pc.binary_join_element_wise(
            b["w1"], b["w2"], " "),
            "n_ab": b["n_ab"], "pmi": pa.array(pmi)})

    scored = j2.map_batches(score, batch_format="pyarrow")
    return scored.sort(["pmi", "bigram"],
                       descending=[True, False]).limit(k)


def vocab_coverage(ds, coverages: list[float] | None = None,
                   text_col: str = "text"):
    """→ Dataset(coverage, n_terms, covered_tokens): for each coverage
    level c, the minimal number of vocabulary terms (taken most-frequent
    first) whose occurrences cover >= c of all tokens — the curve that
    sizes a tokenizer vocabulary against a corpus.

    Scale shape: the corpus reduces to the unigram count Dataset, which
    reduces again to one row per DISTINCT FREQUENCY VALUE (n, n_terms,
    tokens) — and that table is UNCONDITIONALLY driver-bounded, not by
    assumption: d distinct frequencies are d distinct positive integers,
    so total_tokens >= 1+2+...+d >= d^2/2, i.e. d <= sqrt(2*T) (~1.4M
    rows even at 10^12 tokens). Only that table reaches the driver for
    the cumulative walk. Terms sharing a
    frequency are interchangeable, so the answer needs no term
    identities and no tie-break: within the boundary frequency group the
    minimal extra terms is ceil((c·T − cum_prev) / n), mirrored
    operation-for-operation in the SQL oracle (double compare + ceil on
    the same exact ints)."""
    import math

    import ray.data

    coverages = coverages or [0.5, 0.9, 0.99]

    from ray.data.aggregate import Sum

    uni = _unigram_counts(ds, text_col)

    def by_count(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n_term" not in b.column_names:
            return pa.table({"n": pa.array([], pa.int64()),
                             "n_terms": pa.array([], pa.int64()),
                             "tokens": pa.array([], pa.int64())})
        t = pa.table({"n": b["n_term"],
                      "n_terms": pa.array(
                          np.ones(b.num_rows, dtype=np.int64))})
        agg = t.group_by(["n"]).aggregate([("n_terms", "sum")])
        nn = agg["n"].combine_chunks().to_numpy(zero_copy_only=False)
        nt = agg["n_terms_sum"].combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({"n": agg["n"], "n_terms": agg["n_terms_sum"],
                         "tokens": pa.array(nn * nt)})

    byn = (uni.map_batches(by_count, batch_format="pyarrow")
           .groupby("n").aggregate(Sum("n_terms", alias_name="n_terms"),
                                   Sum("tokens", alias_name="tokens")))

    rows = byn.take_all()  # one row per distinct frequency — tiny
    rows.sort(key=lambda r: -r["n"])
    n_arr = np.asarray([r["n"] for r in rows], dtype=np.int64)
    terms = np.asarray([r["n_terms"] for r in rows], dtype=np.int64)
    toks = np.asarray([r["tokens"] for r in rows], dtype=np.int64)
    cumtok = np.cumsum(toks)
    cumterms = np.cumsum(terms)
    total = float(cumtok[-1]) if len(cumtok) else 0.0

    out_c, out_terms, out_cov = [], [], []
    for c in coverages:
        target = c * total
        if total == 0.0:
            continue
        idx = int(np.searchsorted(cumtok.astype(np.float64), target,
                                  side="left"))
        # first group with cumtok >= target (float compare both sides)
        while idx < len(cumtok) and float(cumtok[idx]) < target:
            idx += 1
        if idx >= len(cumtok):
            idx = len(cumtok) - 1
        prev_tok = float(cumtok[idx] - toks[idx])
        prev_terms = int(cumterms[idx] - terms[idx])
        extra = int(math.ceil((target - prev_tok) / float(n_arr[idx])))
        extra = max(extra, 0)
        out_c.append(c)
        out_terms.append(prev_terms + extra)
        out_cov.append(int(prev_tok) + extra * int(n_arr[idx]))

    return ray.data.from_arrow(pa.table({
        "coverage": pa.array(out_c, pa.float64()),
        "n_terms": pa.array(out_terms, pa.int64()),
        "covered_tokens": pa.array(out_cov, pa.int64())}))


# per-worker cache of the broadcast candidate-term array
_HH_CACHE: dict[bytes, pa.Array] = {}


def global_top_terms_sketch(ds, k: int = 20, text_col: str = "text",
                            simple_tokens: bool = True,
                            sketch_size: int | None = None):
    """EXACT global term-frequency top-k via a Misra–Gries heavy-hitters
    sketch (Misra & Gries 1982; mergeable-summaries form of Agarwal et
    al., PODS 2012 — public): bit-identical output (and shared SQL
    oracle) with :func:`global_top_terms`, but the shuffle carries at
    most ``sketch_size`` terms PER BLOCK instead of each block's full
    vocabulary — the scale path when the corpus vocabulary (Heaps' law,
    multilingual) dwarfs the heavy-hitter set you actually want.

    Exactness, not approximation. Each per-batch summary is compressed
    to ``sketch_size`` entries by the standard decrement (subtract the
    (m+1)-th count ``sub``, drop non-positives) and emits ``sub`` under
    the reserved key ``""`` (unreachable as a token: both tokenizers
    drop empties). No single term can lose more than ``sub`` per batch,
    so after the merging groupby every term satisfies
    ``c̃(t) >= true(t) − E`` with ``E = Σ sub`` — the sound per-term
    Misra-Gries bound, not the (m+1)×-looser total deducted mass.
    The certificate then covers BOTH ways a term could hide from the
    candidate set (the top ``4k`` merged rows):

    - absent from the merged summary entirely: ``true <= E``;
    - present but below the 4k cut: ``true <= excl_max + E`` where
      ``excl_max`` is the largest merged count among excluded rows.

    The candidates are re-counted EXACTLY in one more streaming pass
    (broadcast candidate set, candidate-bounded shuffle); if the exact
    k-th candidate count strictly exceeds ``max(E, excl_max + E)`` no
    hidden term can reach rank k, so the output is provably the true
    top-k. If no batch ever compressed (``E == 0``) the merged counts
    are already exact and the second pass is skipped. When the
    certificate fails (flat, non-skewed distributions) the operator
    falls back to the exact full-vocabulary :func:`global_top_terms` —
    output is identical either way, the sketch only changes the cost.
    """
    import ray

    m = sketch_size or max(64, 8 * k)
    tokenize = simple_tokenize if simple_tokens else full_tokenize
    empty = pa.table({"term": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64())})
    # the input is consumed up to three times (MG pass, exact recount,
    # fallback): materialize the one-column projection once so upstream
    # lineage never re-executes
    ds = ds.select_columns([text_col]).materialize()

    def partial_mg(batch: pa.Table) -> pa.Table:
        terms, counts = _batch_term_counts(batch, text_col, tokenize)
        if terms is None:
            return empty
        if len(counts) > m:
            order = np.argsort(-counts, kind="stable")
            sub = int(counts[order[m]])
            keep_idx = order[:m]
            kept = counts[keep_idx] - sub
            pos = kept > 0
            return pa.table({
                "term": pa.concat_arrays(
                    [terms.take(pa.array(keep_idx[pos])),
                     pa.array([""], pa.string())]),
                "n": pa.array(np.r_[kept[pos], sub])})
        return pa.table({"term": terms, "n": pa.array(counts)})

    from ray.data.aggregate import Sum

    merged = (ds.map_batches(partial_mg, batch_format="pyarrow")
              .groupby("term").aggregate(Sum("n", alias_name="n"))
              .materialize())
    err_row = merged.filter(expr='term == ""').take_all()
    err = int(err_row[0]["n"]) if err_row else 0
    if err == 0:
        # nothing was ever decremented: merged IS the exact count table
        return (merged.filter(expr='term != ""')
                .sort(["n", "term"], descending=[True, True]).limit(k))
    rows = [r for r in merged.sort(
        ["n", "term"], descending=[True, True]).limit(4 * k + 2).take_all()
        if r["term"] != ""]
    cand = [r["term"] for r in rows[:4 * k]]
    # the (4k+1)-th merged row bounds every EXCLUDED-but-present term
    excl_max = int(rows[4 * k]["n"]) if len(rows) > 4 * k else 0
    hidden_bound = max(err, excl_max + err)
    if not cand:
        if merged.count() == 0:  # genuinely empty corpus
            return ray.data.from_arrow(empty)
        # every term was compressed away (flat distribution): the
        # certificate can never pass — go exact
        return global_top_terms(ds, k=k, text_col=text_col,
                                simple_tokens=simple_tokens)

    cand_ref = ray.put(cand)

    def exact_counts(batch: pa.Table) -> pa.Table:
        ck = cand_ref.binary()
        carr = _HH_CACHE.get(ck)
        if carr is None:
            carr = pa.array(ray.get(cand_ref), pa.string())
            _HH_CACHE.clear()
            _HH_CACHE[ck] = carr
        terms, counts = _batch_term_counts(batch, text_col, tokenize)
        if terms is None:
            return empty
        keep = pc.is_in(terms, value_set=carr)
        return pa.table({"term": terms, "n": pa.array(counts)}).filter(keep)

    exact = (ds.map_batches(exact_counts, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("n", alias_name="n"))
             .sort(["n", "term"], descending=[True, True])
             .limit(k).materialize())
    got = exact.take_all()
    # certificate: the exact k-th candidate count must strictly beat
    # every hidden term's maximum possible true count
    if len(got) < k or int(got[-1]["n"]) <= hidden_bound:
        return global_top_terms(ds, k=k, text_col=text_col,
                                simple_tokens=simple_tokens)
    return exact


def source_similarity(ds, by: str = "source", text_col: str = "text",
                      n: int = 3, num_partitions: int = 64):
    """Pairwise corpus-segment similarity matrix: Jaccard between every
    pair of ``by`` groups (sources, dumps, domains) over each group's
    DISTINCT word ``n``-grams — the inter-source overlap report a
    curation run uses to decide which crawls are redundant (the
    corpus-level analogue of the reference's per-pair collection
    measures, ``otmt/collection_measures.py:96-214``, lifted from
    doc-vs-collection to group-vs-group).

    Scale shape: gram STRINGS never cross a shuffle — each batch emits
    distinct (64-bit blake2b gram fingerprint, group code) pairs; the
    only exchange hash-partitions those fixed-width rows by fingerprint;
    each partition then reduces to a k x k co-occurrence matrix (k =
    group count, small) via one lexsort + bitmask ANDs, and the global
    merge is a groupby-sum over <= k^2 * num_partitions tiny rows. The
    driver touches only the final k x k matrix. Distinct counts are over
    64-bit fingerprints: collision probability ~ m^2 / 2^64 (m = distinct
    grams) — negligible at any feasible vocabulary, and the string-exact
    DuckDB oracle agrees absent collisions. Groups producing zero
    n-grams are dropped (SQL parity: they have no row in the size CTE).

    Returns a (small) pyarrow Table: source_a < source_b, n_a, n_b,
    n_common, jaccard = n_common / (n_a + n_b - n_common), unrounded.
    """
    import hashlib

    from ray.data.aggregate import Sum

    from raydedup.stages.decontam import _ngrams

    groups = sorted(x for x in ds.unique(by) if x is not None)
    k = len(groups)
    empty_out = pa.table({
        "source_a": pa.array([], pa.string()),
        "source_b": pa.array([], pa.string()),
        "n_a": pa.array([], pa.int64()),
        "n_b": pa.array([], pa.int64()),
        "n_common": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64()),
    })
    if k == 0:
        return empty_out
    code_of = {g: i for i, g in enumerate(groups)}

    def partial(batch: pa.Table) -> pa.Table:
        per_src: dict[int, set[str]] = {}
        for s, t in zip(batch[by].to_pylist(), batch[text_col].to_pylist()):
            if s is None or not t:
                continue
            grams = _ngrams(t, n)
            if grams:
                per_src.setdefault(code_of[s], set()).update(grams)
        fps: list[np.ndarray] = []
        cds: list[np.ndarray] = []
        for c, gs in per_src.items():
            h = np.fromiter(
                (int.from_bytes(
                    hashlib.blake2b(g.encode(), digest_size=8).digest(),
                    "little") for g in gs),
                dtype=np.uint64, count=len(gs))
            fps.append(h)
            cds.append(np.full(len(h), c, dtype=np.int64))
        if not fps:
            return pa.table({"gm": pa.array([], pa.int64()),
                             "code": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        gm = np.concatenate(fps)
        return pa.table({
            "gm": gm.view(np.int64),
            "code": np.concatenate(cds),
            "__part": (gm % np.uint64(num_partitions)).astype(np.int64),
        })

    def merge(g: pa.Table) -> pa.Table:
        out_empty = pa.table({"ia": pa.array([], pa.int64()),
                              "ib": pa.array([], pa.int64()),
                              "c": pa.array([], pa.int64())})
        if g.num_rows == 0 or "gm" not in g.column_names:
            return out_empty
        gm = g["gm"].combine_chunks().to_numpy(zero_copy_only=False)
        code = g["code"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((code, gm))
        gm, code = gm[order], code[order]
        keep = np.ones(len(gm), dtype=bool)
        keep[1:] = (gm[1:] != gm[:-1]) | (code[1:] != code[:-1])
        gm, code = gm[keep], code[keep]
        new_g = np.r_[False, gm[1:] != gm[:-1]]
        gid = np.cumsum(new_g)
        n_g = int(gid[-1]) + 1 if len(gid) else 0
        mask = np.zeros((n_g, k), dtype=bool)
        mask[gid, code] = True
        ia: list[int] = []
        ib: list[int] = []
        cnt: list[int] = []
        for i in range(k):
            ci = mask[:, i]
            ia.append(i)
            ib.append(i)
            cnt.append(int(np.count_nonzero(ci)))
            for j in range(i + 1, k):
                ia.append(i)
                ib.append(j)
                cnt.append(int(np.count_nonzero(ci & mask[:, j])))
        return pa.table({"ia": pa.array(ia, pa.int64()),
                         "ib": pa.array(ib, pa.int64()),
                         "c": pa.array(cnt, pa.int64())})

    summed = (ds.select_columns([by, text_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("__part").map_groups(merge, batch_format="pyarrow")
              .groupby(["ia", "ib"]).aggregate(Sum("c", alias_name="c")))
    C = np.zeros((k, k), dtype=np.int64)
    for r in summed.take_all():
        C[r["ia"], r["ib"]] = r["c"]
    sa: list[str] = []
    sb: list[str] = []
    na: list[int] = []
    nb: list[int] = []
    ncm: list[int] = []
    jac: list[float] = []
    for i in range(k):
        if C[i, i] == 0:
            continue
        for j in range(i + 1, k):
            if C[j, j] == 0:
                continue
            c = int(C[i, j])
            sa.append(groups[i])
            sb.append(groups[j])
            na.append(int(C[i, i]))
            nb.append(int(C[j, j]))
            ncm.append(c)
            jac.append(c / (C[i, i] + C[j, j] - c))
    if not sa:
        return empty_out
    return pa.table({"source_a": pa.array(sa, pa.string()),
                     "source_b": pa.array(sb, pa.string()),
                     "n_a": pa.array(na, pa.int64()),
                     "n_b": pa.array(nb, pa.int64()),
                     "n_common": pa.array(ncm, pa.int64()),
                     "jaccard": pa.array(jac, pa.float64())})


def source_similarity_kmv(ds, by: str = "source", text_col: str = "text",
                          n: int = 3, k: int = 256):
    """Bounded-memory estimate of the ``source_similarity`` matrix via
    k-minimum-values sketches (Bar-Yossef et al. 2002; Beyer et al.
    SIGMOD 2007) — the scale path when per-source distinct-gram volume
    outgrows the exact matrix's fingerprint shuffle. The exact
    operator's exchange is linear in TOTAL distinct grams; this one
    caps per-source state at ``k`` 64-bit values regardless of
    vocabulary, so the whole reduction is sources x k values.

    Estimator per pair (A, B): U = the k smallest values of
    sketch(A) ∪ sketch(B); Ĵ = |U ∩ sketch(A) ∩ sketch(B)| / |U| —
    an unbiased Jaccard estimate with RMSE ~ 1/sqrt(k). DETERMINISTIC
    given the hash: grams hash with md5 low-64 (unsigned order), so a
    SQL oracle reproduces the estimate bit-for-bit — same contract as
    the md5-keyed samplers in textstats.

    Per batch: distinct grams per source → md5-low64 → k smallest
    (np.partition, no full sort) leave the batch; a per-source merge
    keeps the k smallest distinct of the partials; the driver sees
    only sources x k values and computes the (tiny) pairwise matrix
    vectorized. Sources with zero n-grams drop out (oracle parity).

    Returns pyarrow Table: source_a < source_b, k_union (=|U|),
    n_inter, jaccard_est (unrounded; callers round)."""
    import hashlib

    from raydedup.stages.decontam import _ngrams

    empty_out = pa.table({
        "source_a": pa.array([], pa.string()),
        "source_b": pa.array([], pa.string()),
        "k_union": pa.array([], pa.int64()),
        "n_inter": pa.array([], pa.int64()),
        "jaccard_est": pa.array([], pa.float64()),
    })

    def _ksmall(h: np.ndarray) -> np.ndarray:
        """k smallest DISTINCT values of h (uint64)."""
        u = np.unique(h)          # sorted distinct
        return u[:k]

    def partial(batch: pa.Table) -> pa.Table:
        per_src: dict[str, set[str]] = {}
        for s, t in zip(batch[by].to_pylist(),
                        batch[text_col].to_pylist()):
            if s is None or not t:
                continue
            grams = _ngrams(t, n)
            if grams:
                per_src.setdefault(s, set()).update(grams)
        srcs: list[np.ndarray] = []
        hs: list[np.ndarray] = []
        for s, gs in per_src.items():
            h = np.fromiter(
                (int.from_bytes(
                    hashlib.md5(g.encode()).digest()[8:], "big")
                 for g in gs),
                dtype=np.uint64, count=len(gs))
            h = _ksmall(h)
            hs.append(h)
            srcs.append(np.full(len(h), s, dtype=object))
        if not hs:
            return pa.table({"src": pa.array([], pa.string()),
                             "h": pa.array([], pa.int64())})
        return pa.table({
            "src": pa.array(np.concatenate(srcs), pa.string()),
            "h": pa.array(np.concatenate(hs).view(np.int64)),
        })

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "h" not in g.column_names:
            return pa.table({"src": pa.array([], pa.string()),
                             "h": pa.array([], pa.int64())})
        h = _ksmall(g["h"].combine_chunks().to_numpy(
            zero_copy_only=False).view(np.uint64))
        return pa.table({
            "src": pa.array([g["src"][0].as_py()] * len(h), pa.string()),
            "h": pa.array(h.view(np.int64)),
        })

    rows = (ds.select_columns([by, text_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("src").map_groups(merge, batch_format="pyarrow")
            .take_all())              # sources x k rows — driver-sized
    sketches: dict[str, np.ndarray] = {}
    for r in rows:
        sketches.setdefault(r["src"], []).append(r["h"])
    sketches = {s: np.sort(np.asarray(v, dtype=np.int64).view(np.uint64))
                for s, v in sketches.items()}
    srcs = sorted(sketches)
    sa, sb, ku, ni, je = [], [], [], [], []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            A, B = sketches[a], sketches[b]
            u = np.unique(np.concatenate([A, B]))[:k]
            inter = np.intersect1d(A, B, assume_unique=True)
            c = int(np.isin(u, inter).sum())
            sa.append(a)
            sb.append(b)
            ku.append(len(u))
            ni.append(c)
            je.append(c / len(u) if len(u) else 0.0)
    if not sa:
        return empty_out
    return pa.table({"source_a": pa.array(sa, pa.string()),
                     "source_b": pa.array(sb, pa.string()),
                     "k_union": pa.array(ku, pa.int64()),
                     "n_inter": pa.array(ni, pa.int64()),
                     "jaccard_est": pa.array(je, pa.float64())})


def hot_ngrams(ds, n: int = 5, k: int = 10, min_docs: int = 2,
               id_col: str = "doc_id", text_col: str = "text"):
    """Hot boilerplate word n-grams: every n-gram appearing in at least
    ``T`` distinct documents, where ``T = max(min_docs, the k-th largest
    distinct-doc count over all n-grams)`` — the threshold-VALUE
    contract makes the result deterministic without a tie-break (ties
    at the cutoff are all included), so the SQL oracle reproduces it
    exactly. The curation diagnostic behind n-gram decontamination and
    span removal: which exact phrases are the corpus's most-replicated
    content. Returns ``(gram, n_docs)``. Token contract = the ASCII RE2
    contract of ``_doc_term_codes``; n-grams joined with single spaces.

    Scale shape (100-TB design): pass 1 shuffles only 64-bit n-gram
    hashes (per-token blake2b-64 once per DISTINCT token per batch,
    polynomial window combine — the minhash kernel's trick), counts
    distinct docs via the per-batch-distinct partial (each doc is one
    row => one batch), and finds the threshold VALUE from k-sized
    per-block partial top-k rows. Pass 2 re-streams the corpus and
    builds gram STRINGS only for instances matching the (>= k, tie
    bounded) winner-hash broadcast — final counts are recomputed per
    STRING, so a pass-1 hash collision can only perturb T by one, never
    a reported row (documented contract).
    """
    import hashlib

    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from raydedup.stages.textstats import _doc_term_codes

    C = np.uint64(0x9E3779B97F4A7C15)

    def _gram_hashes(batch: pa.Table):
        """→ (docidx per gram instance, window-start flat index,
        gram hash uint64, codes, dictionary, docidx per token)."""
        docidx, codes, dictionary = _doc_term_codes(batch, text_col)
        total = len(codes)
        if total < n:
            z = np.empty(0, np.int64)
            return z, z, np.empty(0, np.uint64), codes, dictionary, docidx
        toks = dictionary.to_pylist()
        th_u = np.fromiter(
            (int.from_bytes(hashlib.blake2b(t.encode("utf-8"),
                                            digest_size=8).digest(), "big")
             for t in toks), dtype=np.uint64, count=len(toks))
        th = th_u[codes]
        h = np.zeros(total - n + 1, dtype=np.uint64)
        for j in range(n):
            h = h * C + th[j:total - n + 1 + j]
        valid = docidx[:total - n + 1] == docidx[n - 1:]
        starts = np.flatnonzero(valid)
        return (docidx[starts], starts, h[starts], codes, dictionary,
                docidx)

    def count_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"h": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        gd, _, gh, *_ = _gram_hashes(batch)
        if gd.size == 0:
            return empty
        hs = gh.view(np.int64)
        order = np.lexsort((hs, gd))
        ds_, hs_ = gd[order], hs[order]
        first = np.r_[True, (ds_[1:] != ds_[:-1]) | (hs_[1:] != hs_[:-1])]
        hu, cnt = np.unique(hs_[first], return_counts=True)
        return pa.table({"h": pa.array(hu, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64))})

    counts = (ds.select_columns([id_col, text_col])
              .map_batches(count_partial, batch_format="pyarrow")
              .groupby("h").aggregate(Sum("c", alias_name="nd"))
              .materialize())

    def topk_partial(batch: pa.Table) -> pa.Table:
        c = batch["nd"].to_numpy(zero_copy_only=False)
        if c.size > k:
            c = -np.partition(-c, k - 1)[:k]
        return pa.table({"nd": pa.array(np.sort(c)[::-1], pa.int64())})

    top = np.sort(np.concatenate(
        [b["nd"].to_numpy(zero_copy_only=False) for b in
         counts.map_batches(topk_partial,
                            batch_format="pyarrow").iter_batches(
             batch_size=None, batch_format="pyarrow")]
        or [np.empty(0, np.int64)]))[::-1]
    thr = int(top[k - 1]) if top.size >= k else min_docs
    thr = max(thr, min_docs)

    win = counts.filter(expr=f"nd >= {thr}").select_columns(["h"])
    win_hashes = np.sort(np.concatenate(
        [b["h"].to_numpy(zero_copy_only=False) for b in
         win.iter_batches(batch_size=None, batch_format="pyarrow")]
        or [np.empty(0, np.int64)]))
    out_schema = pa.schema([pa.field("gram", pa.string()),
                            pa.field("n_docs", pa.int64())])
    if win_hashes.size == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    win_ref = ray.put(win_hashes)

    def winner_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"gram": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        gd, starts, gh, codes, dictionary, _ = _gram_hashes(batch)
        if gd.size == 0:
            return empty
        wh = ray.get(win_ref)
        at = np.searchsorted(wh, gh.view(np.int64))
        at[at == len(wh)] = 0
        hit = wh[at] == gh.view(np.int64)
        if not hit.any():
            return empty
        toks = dictionary.to_pylist()
        seen = set()
        for s, d in zip(starts[hit], gd[hit]):
            seen.add((int(d),
                      " ".join(toks[codes[s + j]] for j in range(n))))
        if not seen:
            return empty
        grams = [g for _, g in seen]
        u, inv = np.unique(np.array(grams, dtype=object),
                           return_inverse=True)
        cnt = np.bincount(inv)
        return pa.table({"gram": pa.array(list(u), pa.string()),
                         "c": pa.array(cnt.astype(np.int64))})

    final = (ds.select_columns([id_col, text_col])
             .map_batches(winner_partial, batch_format="pyarrow")
             .groupby("gram").aggregate(Sum("c", alias_name="n_docs"))
             .filter(expr=f"n_docs >= {thr}"))
    return final.union(ray.data.from_arrow(out_schema.empty_table()))


def cluster_common_tokens(labeled_ds, id_col: str = "doc_id",
                          text_col: str = "text",
                          label_col: str = "cluster_id",
                          min_members: int = 2,
                          num_partitions: int | None = None):
    """Per-cluster BOILERPLATE commonality report: for every duplicate
    cluster with >= ``min_members`` members, the number of distinct
    tokens present in EVERY member (the cluster's common template core),
    the smallest member's distinct-token count, and their ratio — the
    "how much of each duplicate family is shared template" table a
    curation run reads to decide between dropping duplicates and
    extracting the template. Output: (cluster_id, n_members,
    n_common_tokens, min_member_tokens, commonality).

    Scale shape: texts reduce per batch to skinny (label, per-doc
    DISTINCT token-hash) rows plus one (label, n_tokens) row per member
    (so empty members count — an empty member forces n_common = 0 and
    min = 0), everything hash-partitions ONCE by label, and a single
    map_groups per PARTITION lexsorts label-major and counts token runs
    whose document frequency equals the cluster size — one all-to-all
    over O(Σ distinct tokens) rows, vectorized run arithmetic, no
    Python in the per-token path. Token identity is blake64 hashes
    (the engine-wide documented collision contract); the SQL oracle
    compares counts, which the hash preserves. Tokenizer:
    ``simple_tokenize`` (the SQL-mirrorable contract)."""
    import ray as _ray
    import ray.data

    from raydedup.functions.minhash import _blake64
    from raydedup.stages.asof import _part_array

    out_schema = pa.schema([
        pa.field("cluster_id", pa.string()),
        pa.field("n_members", pa.int64()),
        pa.field("n_common_tokens", pa.int64()),
        pa.field("min_member_tokens", pa.int64()),
        pa.field("commonality", pa.float64()),
    ])
    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    n_parts = num_partitions or max(2, 2 * ncpu)

    # per-worker token-hash cache (pure function values)
    cache: dict[str, int] = {}

    def explode(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            pc.fill_null(batch[text_col].combine_chunks(), ""))
        row_to_uniq = enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq_sets: list[np.ndarray] = []
        get = cache.get
        for t in enc.dictionary.to_pylist():
            hs = set()
            for tok in simple_tokenize(t):
                h = get(tok)
                if h is None:
                    h = _blake64(tok)
                    cache[tok] = h
                hs.add(h)
            uniq_sets.append(np.fromiter(hs, dtype=np.uint64,
                                         count=len(hs)))
        labels = batch[label_col].to_pylist()
        out_l: list[str] = []
        out_h: list[int] = []
        out_k: list[int] = []   # 1 = token row, 0 = member row
        out_n: list[int] = []   # member row: distinct-token count
        for lab, u in zip(labels, row_to_uniq):
            hs = uniq_sets[u]
            out_l.append(lab)
            out_h.append(0)
            out_k.append(0)
            out_n.append(int(hs.size))
            out_l.extend([lab] * hs.size)
            out_h.extend(hs.tolist())
            out_k.extend([1] * hs.size)
            out_n.extend([0] * hs.size)
        t = pa.table({
            "label": pa.array(out_l, pa.string()),
            "h": pa.array(np.array(out_h, dtype=np.uint64), pa.uint64()),
            "kind": pa.array(out_k, pa.int8()),
            "nt": pa.array(out_n, pa.int64()),
        })
        return t.append_column("__part", _part_array(t["label"], n_parts))

    def sweep(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "label" not in group.column_names:
            return out_schema.empty_table()
        lab = np.array(group["label"].to_pylist(), dtype=object)
        h = group["h"].to_numpy(zero_copy_only=False)
        kind = group["kind"].to_numpy(zero_copy_only=False)
        nt = group["nt"].to_numpy(zero_copy_only=False)
        # label-major order; member rows (kind 0) first within label
        order = np.lexsort((h, kind, lab))
        lab_s, h_s, k_s, nt_s = lab[order], h[order], kind[order], nt[order]
        lstarts = np.flatnonzero(np.r_[True, lab_s[1:] != lab_s[:-1]])
        lends = np.r_[lstarts[1:], lab_s.size]
        out_c, out_m, out_common, out_min = [], [], [], []
        for s, e in zip(lstarts, lends):
            ks = k_s[s:e]
            n_members = int((ks == 0).sum())
            if n_members < min_members:
                continue
            min_nt = int(nt_s[s:e][ks == 0].min())
            th = h_s[s:e][ks == 1]  # sorted (lexsort minor key)
            if th.size:
                rs = np.flatnonzero(np.r_[True, th[1:] != th[:-1]])
                rl = np.diff(np.r_[rs, th.size])
                n_common = int((rl == n_members).sum())
            else:
                n_common = 0
            out_c.append(str(lab_s[s]))
            out_m.append(n_members)
            out_common.append(n_common)
            out_min.append(min_nt)
        commonality = [
            0.0 if mn == 0 else c / mn
            for c, mn in zip(out_common, out_min)]
        return pa.table({
            "cluster_id": pa.array(out_c, pa.string()),
            "n_members": pa.array(out_m, pa.int64()),
            "n_common_tokens": pa.array(out_common, pa.int64()),
            "min_member_tokens": pa.array(out_min, pa.int64()),
            "commonality": pa.array(commonality, pa.float64()),
        })

    out = (labeled_ds.select_columns([id_col, text_col, label_col])
           .map_batches(explode, batch_format="pyarrow")
           .groupby("__part")
           .map_groups(sweep, batch_format="pyarrow"))
    return out.union(ray.data.from_arrow(out_schema.empty_table()))


def cluster_template_text(labeled_ds, id_col: str = "doc_id",
                          text_col: str = "text",
                          label_col: str = "cluster_id",
                          min_members: int = 2,
                          num_partitions: int | None = None):
    """Per-cluster TEMPLATE EXTRACTION: for every >= ``min_members``
    cluster, the tokens present in EVERY member, rendered in the
    ORDER of their first occurrence in the cluster's representative
    (the ``cluster_id`` member — cluster labels are min member keys by
    the engine-wide contract, so the rep needs no extra election) —
    the actual boilerplate string a curation run can subtract or ship
    to a template library, the text complement of
    :func:`cluster_common_tokens`'s counts. Output: (cluster_id,
    n_members, template).

    Scale shape: phase A is the same one-shuffle label-hash sweep as
    the commonality report, reduced to (cluster_id, n_members, packed
    common-hash blob) — one SMALL row per cluster; phase B broadcasts
    nothing corpus-sized: the rep rows (row_key == a cluster_id) join
    the cluster table and each rep re-tokenizes ITS OWN text once,
    keeping first occurrences whose blake64 hash is in the cluster's
    common set (the engine-wide hash-identity contract)."""
    import ray as _ray
    import ray.data

    from raydedup.functions.minhash import _blake64
    from raydedup.stages.asof import _part_array

    out_schema = pa.schema([
        pa.field("cluster_id", pa.string()),
        pa.field("n_members", pa.int64()),
        pa.field("template", pa.string()),
    ])
    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    n_parts = num_partitions or max(2, 2 * ncpu)
    cache: dict[str, int] = {}

    def explode(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            pc.fill_null(batch[text_col].combine_chunks(), ""))
        row_to_uniq = enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        get = cache.get
        uniq_sets: list[np.ndarray] = []
        for t in enc.dictionary.to_pylist():
            hs = set()
            for tok in simple_tokenize(t):
                h = get(tok)
                if h is None:
                    h = _blake64(tok)
                    cache[tok] = h
                hs.add(h)
            uniq_sets.append(np.fromiter(hs, dtype=np.uint64,
                                         count=len(hs)))
        labels = batch[label_col].to_pylist()
        out_l: list[str] = []
        out_h: list[int] = []
        out_k: list[int] = []
        for lab, u in zip(labels, row_to_uniq):
            hs = uniq_sets[u]
            out_l.append(lab)
            out_h.append(0)
            out_k.append(0)
            out_l.extend([lab] * hs.size)
            out_h.extend(hs.tolist())
            out_k.extend([1] * hs.size)
        t = pa.table({
            "label": pa.array(out_l, pa.string()),
            "h": pa.array(np.array(out_h, dtype=np.uint64), pa.uint64()),
            "kind": pa.array(out_k, pa.int8()),
        })
        return t.append_column("__part", _part_array(t["label"], n_parts))

    clu_schema = pa.schema([
        pa.field("cluster_id", pa.string()),
        pa.field("n_members", pa.int64()),
        pa.field("common_blob", pa.binary()),
    ])

    def sweep(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "label" not in group.column_names:
            return clu_schema.empty_table()
        lab = np.array(group["label"].to_pylist(), dtype=object)
        h = group["h"].to_numpy(zero_copy_only=False)
        kind = group["kind"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h, kind, lab))
        lab_s, h_s, k_s = lab[order], h[order], kind[order]
        lstarts = np.flatnonzero(np.r_[True, lab_s[1:] != lab_s[:-1]])
        lends = np.r_[lstarts[1:], lab_s.size]
        out_c, out_m, out_b = [], [], []
        for s, e in zip(lstarts, lends):
            ks = k_s[s:e]
            n_members = int((ks == 0).sum())
            if n_members < min_members:
                continue
            th = h_s[s:e][ks == 1]
            if th.size:
                rs = np.flatnonzero(np.r_[True, th[1:] != th[:-1]])
                rl = np.diff(np.r_[rs, th.size])
                common = th[rs[rl == n_members]]
            else:
                common = np.empty(0, np.uint64)
            out_c.append(str(lab_s[s]))
            out_m.append(n_members)
            out_b.append(common.tobytes())
        return pa.table({
            "cluster_id": pa.array(out_c, pa.string()),
            "n_members": pa.array(out_m, pa.int64()),
            "common_blob": pa.array(out_b, pa.binary()),
        })

    clusters = (labeled_ds.select_columns([id_col, text_col, label_col])
                .map_batches(explode, batch_format="pyarrow")
                .groupby("__part")
                .map_groups(sweep, batch_format="pyarrow")).materialize()

    # phase B: rep rows (id == cluster_id) render the template in
    # first-occurrence order; one inner hash join, rep-sized
    reps = labeled_ds.select_columns([id_col, text_col]).map_batches(
        lambda b: pa.table({"cluster_id": pc.cast(b[id_col], pa.string()),
                            "__rep_text": b[text_col]}),
        batch_format="pyarrow")
    from raydedup.util import join_partitions

    n_clu = clusters.count()
    if n_clu == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    jp = min(join_partitions(n_clu), max(2, 2 * ncpu))
    joined = clusters.join(reps, join_type="inner", num_partitions=jp,
                           on=("cluster_id",))

    def render(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        get = cache.get
        out_t: list[str] = []
        for raw, txt in zip(b["common_blob"].to_pylist(),
                            b["__rep_text"].to_pylist()):
            common = np.frombuffer(raw or b"", dtype=np.uint64)
            cs = set(common.tolist())
            seen: set = set()
            parts: list[str] = []
            for tok in simple_tokenize(txt or ""):
                hh = get(tok)
                if hh is None:
                    hh = _blake64(tok)
                    cache[tok] = hh
                if hh in cs and hh not in seen:
                    seen.add(hh)
                    parts.append(tok)
            out_t.append(" ".join(parts))
        return pa.table({
            "cluster_id": b["cluster_id"],
            "n_members": b["n_members"],
            "template": pa.array(out_t, pa.string()),
        })

    out = joined.map_batches(render, batch_format="pyarrow")
    return out.union(ray.data.from_arrow(out_schema.empty_table()))
