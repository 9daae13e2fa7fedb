"""simhash-near pairs, union-find backends, exact clusters, collection
measures."""

import numpy as np
import pyarrow as pa

import ray.data

from raydedup.config import DEFAULT_CONFIG
from raydedup.functions.simhash import hamming_distance
from raydedup.pipelines.neardup import signatures_with_rep
from raydedup.sources.transcripts import generate_transcripts
from raydedup.stages.collection import collection_measures
from raydedup.stages.exact import exact_clusters
from raydedup.stages.simhash_near import simhash_near_pairs
from raydedup.state.unionfind import (
    UnionFind,
    connected_components_distributed,
    connected_components_driver,
)
from raydedup.textnorm import simple_tokenize


def test_simhash_near_pairs_vs_bruteforce():
    rng = np.random.default_rng(11)
    base = int(rng.integers(0, 2**63))
    sims = [base]
    for _ in range(40):
        if rng.random() < 0.5:
            s = base
            for _ in range(int(rng.integers(1, 20))):
                s ^= 1 << int(rng.integers(0, 64))
            sims.append(s)
        else:
            sims.append(int(rng.integers(0, 2**63)))
    keys = [f"k{i:03d}" for i in range(len(sims))]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "row_key": keys,
                "simhash": pa.array(sims, type=pa.uint64()),
            }
        )
    )
    got = {
        (r["a_key"], r["b_key"]): r["hamming"]
        for r in simhash_near_pairs(ds, DEFAULT_CONFIG).take_all()
    }
    expected = {}
    h = DEFAULT_CONFIG.simhash_dup_hamming
    for i in range(len(sims)):
        for j in range(i + 1, len(sims)):
            d = hamming_distance(sims[i], sims[j])
            if d <= h:
                expected[(keys[i], keys[j])] = d
    assert got == expected  # pigeonhole blocks are exact for hamming <= h


def test_unionfind_canonical_min():
    uf = UnionFind()
    uf.union("c", "b")
    uf.union("a", "b")
    uf.union("x", "y")
    comp = uf.components()
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"


def test_distributed_components_match_driver():
    rng = np.random.default_rng(3)
    edges = []
    for _ in range(200):
        a, b = rng.integers(0, 80, size=2)
        if a != b:
            edges.append((f"n{min(a,b):03d}", f"n{max(a,b):03d}"))
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "a_key": [e[0] for e in edges],
                "b_key": [e[1] for e in edges],
            }
        )
    )
    driver = connected_components_driver(pairs)
    dist = {
        r["node"]: r["label"]
        for r in connected_components_distributed(pairs).take_all()
    }
    assert dist == driver


def test_altstar_components_match_driver():
    """Alternating large-star/small-star backend (Kiveris et al. 2014)
    == driver union-find on a seeded random multigraph (duplicate
    edges, both orientations, isolated self-pairs)."""
    from raydedup.state.unionfind import connected_components_altstar

    rng = np.random.default_rng(3)
    edges = []
    for _ in range(200):
        a, b = rng.integers(0, 80, size=2)
        if a != b:
            # mixed orientation on purpose: canonicalization is the
            # backend's job
            edges.append((f"n{a:03d}", f"n{b:03d}"))
    edges += [("s1", "s1")]  # self-pair keeps its node, label = itself
    pairs = ray.data.from_arrow(pa.table({
        "a_key": [e[0] for e in edges],
        "b_key": [e[1] for e in edges],
    }))
    driver = connected_components_driver(pairs)
    alt = {r["node"]: r["label"]
           for r in connected_components_altstar(pairs).take_all()}
    assert alt == driver
    assert alt["s1"] == "s1"


def test_altstar_long_chain_logarithmic_rounds():
    """A 200-node path graph (diameter 199) must converge well inside
    max_rounds=12: star operations contract ANY structure in O(log n)
    rounds — the property that makes this backend diameter-proof
    without pointer-jumping joins."""
    from raydedup.state.unionfind import connected_components_altstar

    keys = [f"n{i:04d}" for i in range(200)]
    pairs = ray.data.from_arrow(pa.table({
        "a_key": keys[:-1], "b_key": keys[1:],
    }))
    out = {r["node"]: r["label"]
           for r in connected_components_altstar(
               pairs, max_rounds=12).take_all()}
    assert len(out) == 200
    assert all(v == "n0000" for v in out.values())


def test_altstar_hot_star_and_empty():
    """A 500-leaf hot star (the skew case large-star exists to split)
    resolves in a round or two; empty input returns a typed empty
    (node, label) Dataset."""
    from raydedup.state.unionfind import connected_components_altstar

    hub = "m500"
    leaves = [f"m{i:03d}" for i in range(500)]
    pairs = ray.data.from_arrow(pa.table({
        "a_key": [hub] * 500, "b_key": leaves,
    }))
    out = {r["node"]: r["label"]
           for r in connected_components_altstar(pairs).take_all()}
    assert len(out) == 501
    assert set(out.values()) == {"m000"}

    empty = ray.data.from_arrow(pa.table({
        "a_key": pa.array([], pa.string()),
        "b_key": pa.array([], pa.string()),
    }))
    res = connected_components_altstar(empty)
    assert set(res.schema().names) == {"node", "label"}
    assert res.count() == 0


def test_exact_clusters_reference_noise_label():
    tbl = pa.table(
        {
            "conv_id": ["a", "b", "c", "d"],
            "turn_idx": pa.array([0, 0, 0, 0], type=pa.int32()),
            "text": ["dup text", "dup text", "unique one", "unique two"],
        }
    )
    assigned = signatures_with_rep(ray.data.from_arrow(tbl), DEFAULT_CONFIG)
    rows = exact_clusters(assigned).take_all()
    by = {r["row_key"]: r for r in rows}
    assert by["a:0"]["cluster_id"] == "a:0"
    assert by["b:0"]["cluster_id"] == "a:0"
    # groups of size 1 are 'noise' −1 (reference DBSCAN label semantics)
    assert by["c:0"]["cluster_id"] == "-1"
    assert by["d:0"]["cluster_id"] == "-1"


def test_collection_measures_closed_form():
    tbl = generate_transcripts(n_convs=10, seed=2)
    ds = ray.data.from_arrow(tbl)
    rows = collection_measures(
        ds, key_cols=["conv_id", "turn_idx"], simple_tokens=True
    ).take_all()
    texts = tbl["text"].to_pylist()
    global_set = set()
    per_row = []
    for t in texts:
        s = set(simple_tokenize(t or ""))
        per_row.append(s)
        global_set |= s
    g = len(global_set)
    by = {(r["conv_id"], r["turn_idx"]): r for r in rows}
    for i in range(tbl.num_rows):
        key = (tbl["conv_id"][i].as_py(), tbl["turn_idx"][i].as_py())
        a = len(per_row[i])
        assert by[key]["n_distinct_tokens"] == a
        assert abs(by[key]["collection_jaccard"] - (1 - a / g)) < 1e-12
        assert abs(by[key]["collection_sorensen"] - (1 - 2 * a / (a + g))) < 1e-12


def test_tiled_pair_jaccard_matches_bruteforce():
    """The tiled pad-sort-count kernel must agree exactly with per-pair
    np.intersect1d over random sorted-unique uint64 sets, including empty
    sets and pairs spanning tile boundaries."""
    from raydedup.stages.lsh import _exact_jaccard, _tiled_pair_jaccard

    rng = np.random.default_rng(7)
    sets = []
    for _ in range(200):
        n = int(rng.integers(0, 60))
        sets.append(np.unique(rng.integers(0, 80, size=n).astype(np.uint64)))
    # make some near-identical pairs so high-jaccard values occur
    for i in range(0, 40, 2):
        sets[i + 1] = np.unique(
            np.concatenate([sets[i], rng.integers(0, 80, 2).astype(np.uint64)])
        )
    flat = np.concatenate(sets) if sets else np.empty(0, np.uint64)
    offs = np.zeros(len(sets) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in sets], out=offs[1:])
    pi = rng.integers(0, len(sets), size=500).astype(np.int64)
    pj = rng.integers(0, len(sets), size=500).astype(np.int64)
    got = _tiled_pair_jaccard(flat, offs, pi, pj)
    for k in range(len(pi)):
        expect = _exact_jaccard(sets[pi[k]], sets[pj[k]])
        assert got[k] == expect, (k, pi[k], pj[k])


def test_vectorized_components_match_unionfind():
    """cluster_assignments' numpy pointer-jumping components must assign
    the same lexicographic-min cluster ids as the reference UnionFind."""
    import ray
    from raydedup.pipelines.neardup import cluster_assignments

    rng = np.random.default_rng(11)
    keys = [f"k{idx:04d}" for idx in range(120)]
    edges = set()
    while len(edges) < 150:
        a, b = rng.integers(0, len(keys), 2)
        if a != b:
            edges.add((keys[min(a, b)], keys[max(a, b)]))
    edges = sorted(edges)
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    expected = uf.components()

    pairs = ray.data.from_arrow(pa.table({
        "a_key": [e[0] for e in edges],
        "b_key": [e[1] for e in edges],
    }))
    assigned = ray.data.from_arrow(pa.table({
        "row_key": keys,
        "rep_key": keys,
    }))
    out = {r["row_key"]: r for r in
           cluster_assignments(assigned, pairs).take_all()}
    for k in keys:
        want = expected.get(k, k)
        assert out[k]["cluster_id"] == want, k
        assert out[k]["is_duplicate"] == (k != want)


def test_distributed_components_long_chain_pointer_jumping():
    """A 200-node path graph (diameter 199) must converge well inside the
    round budget: each round pointer-jumps (label <- label(label)), so
    reach doubles per round; one-hop-only propagation would need 199
    rounds and previously exited silently with split components."""
    keys = [f"n{i:04d}" for i in range(200)]
    pairs = ray.data.from_arrow(pa.table({
        "a_key": keys[:-1], "b_key": keys[1:],
    }))
    out = {r["node"]: r["label"]
           for r in connected_components_distributed(
               pairs, max_rounds=12).take_all()}
    assert len(out) == 200
    assert all(v == "n0000" for v in out.values())


def test_global_top_terms_vs_scalar_twin():
    # distributed partial-then-merge top-k == brute-force Counter with the
    # reference tie-break (count desc, token reverse-lex —
    # functions/setsim.py:top_terms)
    from collections import Counter

    from raydedup.stages.collection import global_top_terms

    tbl = generate_transcripts(n_convs=25, seed=7)
    got = global_top_terms(
        ray.data.from_arrow(tbl), k=15, simple_tokens=True
    ).take_all()
    counts = Counter()
    for t in tbl["text"].to_pylist():
        counts.update(simple_tokenize(t or ""))
    want = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]),
                  reverse=True)[:15]
    assert [(r["term"], r["n"]) for r in got] == want


def test_dup_report_operators(ray_session):
    # planted exact dups: "x"×4 (two sources), "y"×2, null+""
    # fold together (×2), "z" singleton
    from raydedup.stages.exact import (cluster_size_histogram,
                                       dup_rate_by_group)

    tbl = pa.table({
        "source": ["a", "a", "a", "b", "b", "b", "a", "b", "a"],
        "text": pa.array(["x", "x", "x", "x", "y", "y", None, "", "z"]),
    })
    ds = ray.data.from_arrow(tbl).repartition(4)

    hist = {r["cluster_size"]: r["n_clusters"]
            for r in cluster_size_histogram(ds).take_all()}
    assert hist == {4: 1, 2: 2, 1: 1}  # x:4, y:2, null/"":2, z:1

    rep = {r["source"]: r for r in dup_rate_by_group(ds).take_all()}
    # source a: texts x,x,x,null,z → 5 rows, 3 uniq (x, '', z)
    assert (rep["a"]["n_rows"], rep["a"]["n_uniq"],
            rep["a"]["dup_rows"]) == (5, 3, 2)
    assert rep["a"]["dup_frac"] == 2.0 / 5.0
    # source b: x,y,y,'' → 4 rows, 3 uniq
    assert (rep["b"]["n_rows"], rep["b"]["n_uniq"],
            rep["b"]["dup_rows"]) == (4, 3, 1)


def test_top_bigrams_vs_brute(ray_session):
    # vectorized shifted-join bigram partial == brute per-row regex walk;
    # pairs never cross row boundaries, nulls/punctuation-only rows drop,
    # tie rule shared with the oracle (count desc, bigram desc)
    import re
    from collections import Counter

    from raydedup.stages.collection import top_bigrams

    texts = [
        "the quick brown fox the quick brown",
        "THE  Quick?? brown--fox",          # case/punct fold to same pairs
        None,
        "",
        "...!!!",                            # tokenless
        "solo",                              # one token → no pair
        "a b a b a b",
        "x9_y z x9_y z",
    ]
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})).repartition(3)
    got = [(r["bigram"], r["n"]) for r in top_bigrams(ds, k=6).take_all()]

    counts = Counter()
    for t in texts:
        toks = re.findall(r"[0-9a-z_]+", (t or "").lower())
        counts.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    want = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]),
                  reverse=True)[:6]
    assert got == want


def test_trim_context_window_vs_brute(ray_session):
    from raydedup.stages.textstats import trim_context_window

    # conv a: newest-first token counts 3,2,4 → budget 5 keeps idx 3,2
    # conv b: newest turn alone exceeds budget → conversation dropped
    tbl = pa.table({
        "conv_id": ["a", "a", "a", "b", "c"],
        "turn_idx": [1, 2, 3, 1, 1],
        "text": ["w x y z", "p q", "r s_t u9", "a b c d e f", "hi"],
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = {(r["conv_id"], r["turn_idx"]): (r["n_tok"], r["cum_tokens"])
           for r in trim_context_window(ds, budget=5).take_all()}
    assert got == {("a", 3): (3, 3), ("a", 2): (2, 5), ("c", 1): (1, 1)}


def test_drop_boilerplate_turns(ray_session):
    from raydedup.stages.exact import drop_boilerplate_turns

    # "ok" appears in convs a+b (boilerplate, every copy goes);
    # "dup" twice within ONE conv (kept — not cross-conversation);
    # null text in two convs folds to '' → boilerplate
    tbl = pa.table({
        "conv_id": ["a", "a", "b", "b", "a", "c", "c"],
        "turn_idx": [0, 1, 0, 1, 2, 0, 1],
        "text": pa.array(["ok", "dup", "ok", None, "dup", "", "solo"]),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = sorted((r["conv_id"], r["turn_idx"])
                 for r in drop_boilerplate_turns(ds).take_all())
    assert got == [("a", 1), ("a", 2), ("c", 1)]


def test_split_assign_deterministic_and_group_consistent(ray_session):
    import hashlib

    from raydedup.stages.textstats import split_assign, split_thresholds

    keys = [f"conv{i % 50}" for i in range(300)]  # 6 rows per conv
    ds = ray.data.from_arrow(pa.table(
        {"k": keys, "i": list(range(300))})).repartition(5)
    rows = split_assign(ds, key_col="k").take_all()

    names, cuts = split_thresholds()
    by_conv: dict[str, set] = {}
    for r in rows:
        by_conv.setdefault(r["k"], set()).add(r["split"])
        h = int.from_bytes(
            hashlib.md5(f"s0:{r['k']}".encode()).digest()[:8], "big") >> 4
        want = (names[0] if h < cuts[0]
                else names[1] if h < cuts[1] else names[2])
        assert r["split"] == want
    # every row of a conversation lands in the same split (no leakage)
    assert all(len(s) == 1 for s in by_conv.values())
    import pytest

    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(ds, key_col="k", splits=[("a", 0.5), ("b", 0.2)])


def test_vocab_coverage_vs_brute(ray_session):
    import math
    import re
    from collections import Counter

    from raydedup.stages.collection import vocab_coverage

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, p=None, size=rng.integers(3, 30))
                      .tolist()) for _ in range(60)]
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts)})).repartition(4)
    got = {r["coverage"]: (r["n_terms"], r["covered_tokens"])
           for r in vocab_coverage(ds, coverages=[0.5, 0.9]).take_all()}

    counts = Counter()
    for t in texts:
        counts.update(re.findall(r"[0-9a-z_]+", t.lower()))
    freqs = sorted(counts.values(), reverse=True)
    total = sum(freqs)
    for c in (0.5, 0.9):
        target = c * float(total)
        cum = terms = 0
        while cum < target:
            cum += freqs[terms]
            terms += 1
        # greedy most-frequent-first is exactly the stage's contract
        assert got[c] == (terms, cum)
        assert got[c][1] >= math.floor(target)
    import math
    import re
    from collections import Counter

    from raydedup.stages.collection import pmi_bigrams
    from raydedup.util import round_half_away

    # "alpha beta" always adjacent (high PMI); "the" everywhere (low)
    texts = (["alpha beta the x%d" % i for i in range(6)]
             + ["the x1 the x2 alpha beta", None, "gamma. GAMMA gamma"])
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})).repartition(3)
    got = [(r["bigram"], r["n_ab"], r["pmi"])
           for r in pmi_bigrams(ds, k=5, min_n=3).take_all()]

    uni, big = Counter(), Counter()
    n_tok = n_big = 0
    for t in texts:
        toks = re.findall(r"[0-9a-z_]+", (t or "").lower())
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
        n_tok += len(toks)
        n_big += max(len(toks) - 1, 0)
    want = []
    for (a, b), nab in big.items():
        if nab < 3:
            continue
        pmi = math.log((float(nab) * n_tok * n_tok)
                       / (float(n_big) * uni[a] * uni[b]))
        pmi = float(round_half_away(
            np.float64((pmi + 1e-9) * 1e6))) / 1e6
        want.append((f"{a} {b}", nab, pmi))
    want.sort(key=lambda x: (-x[2], x[0]))
    assert got == want[:5]
    assert got[0][0] == "alpha beta"  # the planted collocation wins


def test_cross_corpus_near_dups(ray_session):
    import numpy as np  # noqa: F401
    import pyarrow as pa

    import ray.data

    from raydedup.stages.decontam import cross_corpus_near_dups
    from __ray_entry__ import SIMPLE_CFG

    # 32 tokens → 30 shingles; a one-token edit swaps 3 shingles →
    # jaccard = 27/33 ≈ 0.818 ≥ 0.8
    base = " ".join(f"tok{i}" for i in range(32))
    near = base.replace("tok15", "edited")
    far = "completely different words with no overlap at all here now"
    corpus = ray.data.from_arrow(pa.table({
        "ck": ["c0", "c1", "c2", "c3"],
        "text": [base, near, far, ""]})).repartition(2)
    bench = ray.data.from_arrow(pa.table({
        "qk": ["q0", "q1"], "text": [base, ""]}))
    got = {(r["corpus_key"], r["bench_key"]): r["jaccard"]
           for r in cross_corpus_near_dups(
               corpus, bench, SIMPLE_CFG, corpus_key="ck",
               bench_key="qk").take_all()}
    assert ("c0", "q0") in got and got[("c0", "q0")] == 1.0
    assert ("c1", "q0") in got and 0.8 <= got[("c1", "q0")] < 1.0
    # far text, empty corpus text, empty bench text never pair
    assert all(k[0] not in ("c2", "c3") and k[1] != "q1" for k in got)
    # empty benchmark set → empty result, not a crash
    empty_bench = ray.data.from_arrow(pa.table(
        {"qk": pa.array([], pa.string()),
         "text": pa.array([], pa.string())}))
    assert cross_corpus_near_dups(
        corpus, empty_bench, SIMPLE_CFG, corpus_key="ck",
        bench_key="qk").count() == 0


def test_upsample_by_weight(ray_session):
    import hashlib

    import pytest

    from raydedup.stages.textstats import upsample_by_weight

    ids = list(range(40))
    srcs = ["a", "b", "c", "d", "e"] * 8
    tbl = pa.table({"k": pa.array(ids, pa.int64()),
                    "src": pa.array(srcs)})
    w = {"a": 2.5, "b": 0.25, "c": 0.0, "d": 3.0}
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = upsample_by_weight(ds, "src", w, key_col="k", default=1.0,
                             seed="t0")
    got = sorted((r["k"], r["src"], r["rep"]) for r in out.take_all())

    def h60(k):
        return int.from_bytes(
            hashlib.md5(f"t0:{k}".encode()).digest()[:8], "big") >> 4

    want = []
    for k, s in zip(ids, srcs):
        ww = w.get(s, 1.0)
        n = int(ww) + (1 if h60(k) < int((ww - int(ww)) * (1 << 60))
                       else 0)
        want.extend((k, s, r) for r in range(n))
    assert got == sorted(want)
    # weight 0 drops, integer weight copies exactly, default passes through
    assert not any(s == "c" for _, s, _ in got)
    assert sum(1 for _, s, _ in got if s == "d") == 8 * 3
    assert sum(1 for _, s, _ in got if s == "e") == 8
    # deterministic across reruns
    got2 = sorted((r["k"], r["src"], r["rep"]) for r in upsample_by_weight(
        ray.data.from_arrow(tbl), "src", w, key_col="k",
        seed="t0").take_all())
    assert got2 == got

    with pytest.raises(ValueError, match="weight"):
        upsample_by_weight(ds, "src", {"a": -1.0}, key_col="k")

    # empty weights dict: every row takes the default (review finding:
    # the old np.where lookup indexed a zero-length array)
    dbl = sorted((r["k"], r["rep"]) for r in upsample_by_weight(
        ray.data.from_arrow(tbl), "src", {}, key_col="k",
        default=2.0).take_all())
    assert dbl == sorted((k, r) for k in ids for r in range(2))


def test_bloom_bits_properties(ray_session):
    import hashlib

    from raydedup.stages.decontam import (_bloom_get, _sha_u64_pair,
                                          bloom_bits_of)

    members = [f"member text {i}" for i in range(500)]
    others = [f"absent text {i}" for i in range(2000)]
    ds = ray.data.from_arrow(pa.table({"text": members})).repartition(7)
    m_bits, k = 1 << 14, 7
    bits = bloom_bits_of(ds, m_bits=m_bits, n_hashes=k)

    # zero false negatives — the load-bearing bloom property
    h1, h2 = _sha_u64_pair(members)
    assert _bloom_get(bits, h1, h2, m_bits, k).all()
    # false-positive rate near (1 - e^{-kn/m})^k ~= 2.2% at this sizing
    o1, o2 = _sha_u64_pair(others)
    fpr = _bloom_get(bits, o1, o2, m_bits, k).mean()
    assert fpr < 0.10
    # deterministic and partitioning-invariant
    bits2 = bloom_bits_of(ds.repartition(3), m_bits=m_bits, n_hashes=k)
    assert np.array_equal(bits, bits2)
    # empty input -> all-zero bits
    empty = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    assert bloom_bits_of(empty, m_bits=m_bits, n_hashes=k).sum() == 0

    import pytest
    with pytest.raises(ValueError, match="m_bits"):
        bloom_bits_of(ds, m_bits=1000)


def test_cross_corpus_matches_bloom_exact(ray_session):
    from raydedup.stages.decontam import (cross_corpus_exact_matches,
                                          cross_corpus_matches_bloom)

    corpus = ray.data.from_arrow(pa.table({
        "cid": pa.array(list(range(30)), pa.int64()),
        "text": [f"row {i}" if i % 3 else "shared contamination text"
                 for i in range(30)]}))
    # ref has a duplicated text -> many-to-many fan-out
    ref = ray.data.from_arrow(pa.table({
        "rid": pa.array([100, 101, 102], pa.int64()),
        "text": ["shared contamination text",
                 "shared contamination text", "row 7"]}))
    # tiny filter: false positives likely, join must kill them all
    got = sorted((r["cid"], r["ref_rid"]) for r in
                 cross_corpus_matches_bloom(
                     corpus, ref, ref_key_col="rid",
                     m_bits=64, n_hashes=2).take_all())
    want = sorted((r["cid"], r["ref_rid"]) for r in
                  cross_corpus_exact_matches(
                      corpus, ref, ref_key_col="rid").take_all())
    assert got == want
    assert (7, 102) in got
    assert sum(1 for c, _ in got if c % 3 == 0) == 20  # 10 rows x 2 refs

    nomatch = ray.data.from_arrow(pa.table({
        "rid": pa.array([1], pa.int64()), "text": ["nothing matches"]}))
    assert cross_corpus_matches_bloom(
        corpus, nomatch, ref_key_col="rid").count() == 0

    # zero-row blocks through the probe (review finding: bool &= empty
    # float64 array raised): over-partitioned tiny corpus
    tiny = ray.data.from_arrow(pa.table({
        "cid": pa.array([0, 1], pa.int64()),
        "text": ["row 7", "no match here"]})).repartition(6)
    got_t = sorted((r["cid"], r["ref_rid"]) for r in
                   cross_corpus_matches_bloom(
                       tiny, ref, ref_key_col="rid").take_all())
    assert got_t == [(0, 102)]


def test_global_top_terms_sketch_exact(ray_session, monkeypatch):
    import random

    import raydedup.stages.collection as colmod
    from raydedup.stages.collection import (global_top_terms,
                                            global_top_terms_sketch)

    calls = {"fallback": 0}
    real_exact = colmod.global_top_terms

    def spy(*a, **kw):
        calls["fallback"] += 1
        return real_exact(*a, **kw)

    # dominant heavy hitters + a 400-term tail: per-batch compression
    # fires AND the certificate passes -> the sketch path must answer
    # WITHOUT falling back
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(400)]
    docs = []
    for _ in range(120):
        words = [f"hot{rng.randint(0, 7)}" for _ in range(25)]
        words += [rng.choice(vocab) for _ in range(15)]
        rng.shuffle(words)
        docs.append(" ".join(words))
    ds = ray.data.from_arrow(pa.table({"text": docs})).repartition(6)

    want = [(r["term"], r["n"]) for r in
            global_top_terms(ds, k=5).take_all()]
    monkeypatch.setattr(colmod, "global_top_terms", spy)
    got = [(r["term"], r["n"]) for r in
           global_top_terms_sketch(ds, k=5, sketch_size=32).take_all()]
    assert got == want
    assert calls["fallback"] == 0, "certified sketch path must not fall back"
    assert {t for t, _ in got} <= {f"hot{i}" for i in range(8)}

    # flat distribution: certificate fails, exact fallback keeps the
    # output identical anyway
    flat = ray.data.from_arrow(pa.table(
        {"text": [f"u{i} u{i + 1} u{i + 2}" for i in range(300)]}
    )).repartition(5)
    wf = [(r["term"], r["n"]) for r in real_exact(flat, k=10).take_all()]
    gf = [(r["term"], r["n"]) for r in
          global_top_terms_sketch(flat, k=10, sketch_size=16).take_all()]
    assert gf == wf
    assert calls["fallback"] >= 1

    # regression (code-review repro): a term decremented in one batch
    # and cut from the candidate set must not be displaced — the
    # certificate sees it via the excluded-row bound and falls back
    docs2 = ["a " * 7 + "p " * 9 + "q " * 8,
             "b " * 100 + "c " * 100,
             "d " * 100 + "e " * 100,
             "a " * 94]
    tricky = ray.data.from_arrow(pa.table({"text": docs2})).repartition(4)
    wt = [(r["term"], r["n"]) for r in real_exact(tricky, k=1).take_all()]
    gt = [(r["term"], r["n"]) for r in
          global_top_terms_sketch(tricky, k=1, sketch_size=2).take_all()]
    assert gt == wt == [("a", 101)]

    # no compression anywhere (vocab <= sketch_size): merged counts are
    # exact, answered in one pass with no fallback and no recount
    calls["fallback"] = 0
    small = ray.data.from_arrow(pa.table(
        {"text": ["x y z x", "y x w", "x"]})).repartition(2)
    gs = [(r["term"], r["n"]) for r in
          global_top_terms_sketch(small, k=2, sketch_size=64).take_all()]
    assert gs == [(r["term"], r["n"]) for r in
                  real_exact(small, k=2).take_all()]
    assert calls["fallback"] == 0

    empty = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    assert global_top_terms_sketch(empty, k=5).take_all() == []


def test_priority_dedup_prefix_and_ties(ray_session):
    from raydedup.stages.exact import priority_dedup

    tbl = pa.table({
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        # "a" must beat "ab" for the same text (prefix-priority edge);
        # equal priorities fall back to min doc_id
        "source": ["ab", "a", "zz", "zz", "b", "b", "solo"],
        "text": ["t1", "t1", "t1", "t2", "t2", "t2", "t3"],
    })
    got = {r.doc_id: (r.source, r.n_copies)
           for r in priority_dedup(ray.data.from_arrow(tbl))
           .to_pandas().itertuples()}
    assert got == {2: ("a", 3), 5: ("b", 3), 7: ("solo", 1)}


def test_priority_dedup_rejects_separator(ray_session):
    import pytest

    from raydedup.stages.exact import priority_dedup

    tbl = pa.table({"doc_id": [1], "source": ["bad\x1fsrc"],
                    "text": ["t"]})
    with pytest.raises(Exception):
        priority_dedup(ray.data.from_arrow(tbl)).materialize()


def test_stitch_candidates_planted_seams(ray_session):
    from raydedup.stages.exact import stitch_candidates

    k = 64
    body = "".join(chr(97 + (i * 7) % 26) for i in range(200))
    seam = body[100:100 + k]
    rows = {
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            body[:100] + seam,          # 1: ends with seam
            seam + body[:100],          # 2: starts with seam -> (1,2)
            "short",                    # 3: < k chars, excluded
            body[:100] + seam[::-1],    # 4: ends with reversed seam
            "ü" * 50 + seam,            # 5: multi-byte prefix, ends with
                                        #    seam -> (5,2); codepoint
                                        #    slicing must not split 'ü'
        ],
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "text": pa.array(rows["text"], pa.string()),
    }))
    got = {(r["a_id"], r["b_id"])
           for r in stitch_candidates(ds, k=k).take_all()}
    assert got == {(1, 2), (5, 2)}


def test_stitch_candidates_empty_keeps_schema(ray_session):
    from raydedup.stages.exact import stitch_candidates

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a" * 80, "b" * 80], pa.string()),
    }))
    out = stitch_candidates(ds)
    assert set(out.schema().names) == {"a_id", "b_id"}
    assert out.count() == 0


def test_cap_duplicates_planted_groups(ray_session):
    """Planted group sizes 1/2/5 at k=2: singletons and exactly-k groups
    stream through pass 2 untouched; the size-5 group exercises the
    over-cap ranking sweep (smallest keys win) with original-size
    accounting."""
    from raydedup.stages.exact import cap_duplicates

    rows = (
        [("uniq", 100)]
        + [("pair", i) for i in (20, 10)]
        + [("hot", i) for i in (55, 51, 53, 52, 54)]
        + [(None, 70), ("", 71)]  # NULL folds to '' -> one group of 2
    )
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([k for _, k in rows], pa.int64()),
        "text": pa.array([t for t, _ in rows], pa.string()),
    }))
    got = {r["doc_id"]: r["n_copies"]
           for r in cap_duplicates(ds, k=2).take_all()}
    assert got == {100: 1, 10: 2, 20: 2, 51: 5, 52: 5, 70: 2, 71: 2}


def test_cap_duplicates_k1_matches_exact_dedup_survivors(ray_session):
    """k=1 degenerates to exact dedup: one (min-key) survivor per text."""
    from raydedup.stages.exact import cap_duplicates

    texts = ["a", "b", "a", "c", "b", "a"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = {r["doc_id"]: r["n_copies"]
           for r in cap_duplicates(ds, k=1).take_all()}
    assert got == {0: 3, 1: 2, 3: 1}


def test_blocklist_scan_counts_and_edges(ray_session):
    """Non-overlapping L2R counting, case folding, NULL text, zero-hit
    phrase, and the typed-empty schema when nothing matches."""
    from raydedup.stages.textstats import blocklist_scan

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(
            ["Spark SPARK spark", "aaa", None, "clean row"], pa.string()),
    }))
    got = {(r["doc_id"], r["phrase"]): r["n_hits"]
           for r in blocklist_scan(ds, ["spark", "aa", "absent"]).take_all()}
    assert got == {(1, "spark"): 3, (2, "aa"): 1}

    none = blocklist_scan(ds, ["zzz"])
    assert set(none.schema().names) == {"doc_id", "phrase", "n_hits"}
    assert none.count() == 0

    import pytest
    with pytest.raises(ValueError):
        blocklist_scan(ds, [])
    with pytest.raises(ValueError):
        blocklist_scan(ds, ["ok", ""])


def test_blocklist_rk_parity_fuzz(ray_session):
    """The Rabin-Karp multi-pattern path is row-for-row identical to
    the per-phrase vectorized path on a seeded random corpus built to
    stress the hard cases: self-overlapping patterns ('aa' in 'aaaa'),
    one pattern a substring of another, multi-byte utf-8, duplicate
    list entries, case folding, NULL/empty text."""
    import random

    from raydedup.stages.textstats import blocklist_scan, blocklist_scan_rk

    rng = random.Random(7)
    vocab = ["aa", "ab", "b", "slow", "scan", "é", "ü", " "]
    ids = list(range(300)) + [999, 1000]
    txts = ["".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
            for _ in range(300)] + [None, ""]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(txts, pa.string()),
    }))
    phr = ["aa", "aaa", "AB", "slow scan", "éü", "zzz", "aa", "b", "aab"]
    base = sorted((r["doc_id"], r["phrase"], r["n_hits"])
                  for r in blocklist_scan(ds, phr).take_all())
    rk = sorted((r["doc_id"], r["phrase"], r["n_hits"])
                for r in blocklist_scan_rk(ds, phr).take_all())
    assert base == rk and len(base) > 100


def test_blocklist_rk_row_boundaries_and_edges(ray_session):
    """A phrase spanning two adjacent rows of the Arrow data buffer
    must NOT match (the rolling hash runs over the concatenated
    buffer; boundary windows are dropped by offset lookup), and the
    empty-result schema + input validation match blocklist_scan."""
    import pytest

    from raydedup.stages.textstats import blocklist_scan_rk

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["xxslow", " scanyy"], pa.string()),
    }))
    assert blocklist_scan_rk(ds, ["slow scan"]).count() == 0
    none = blocklist_scan_rk(ds, ["zzz"])
    assert set(none.schema().names) == {"doc_id", "phrase", "n_hits"}
    assert none.count() == 0
    with pytest.raises(ValueError):
        blocklist_scan_rk(ds, [])
    with pytest.raises(ValueError):
        blocklist_scan_rk(ds, ["ok", ""])
    # non-overlap greedy path: 'aa' in 'aaaaa' counts 2, 'aba' in
    # 'ababa' counts 1 (second overlapping hit suppressed)
    ds2 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aaaaa", "ababa"], pa.string()),
    }))
    got = {(r["doc_id"], r["phrase"]): r["n_hits"]
           for r in blocklist_scan_rk(ds2, ["aa", "aba"]).take_all()}
    assert got == {(1, "aa"): 2, (2, "aba"): 1}


def test_expect_rules_planted_violations(ray_session):
    """Every rule kind with planted violations, including NULL
    semantics (NULL fails in_set/len_equals, counts in not_null) and
    the unique rule's extra-copy accounting."""
    from raydedup.stages.expectations import expect

    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "text": pa.array(["hello", "", None, "hi", "okay!"], pa.string()),
        "lang": pa.array(["en", "xx", None, "de", "en"], pa.string()),
        "n_chars": pa.array([5, 0, 0, 99, None], pa.int64()),
    }))
    got = {r["rule"]: r["n_violations"] for r in expect(ds, [
        ("t_null", "not_null", "text"),
        ("t_nonempty", "non_empty", "text"),
        ("t_len", "len_between", "text", 3, 100),
        ("lang_ok", "in_set", "lang", ["en", "de"]),
        ("nc_ok", "len_equals", "n_chars", "text"),
        ("id_uniq", "unique", "id"),
    ]).take_all()}
    assert got == {"t_null": 1, "t_nonempty": 2, "t_len": 3,
                   "lang_ok": 2, "nc_ok": 2, "id_uniq": 2}

    import pytest
    with pytest.raises(ValueError):
        expect(ds, [])
    with pytest.raises(ValueError):
        expect(ds, [("a", "not_null", "text"), ("a", "non_empty", "text")])
    with pytest.raises(ValueError):
        expect(ds, [("a", "bogus", "text")])


def test_bag_dup_groups_reordered_and_exact(ray_session):
    """Reordered copies group with originals; distinct multisets stay
    out; bag_id is the min member row_key and exact copies also count."""
    from raydedup.stages.exact import bag_dup_groups

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "a b c", "c b a",        # same bag, reordered
            "a b c",                 # exact copy of 1 -> same bag
            "a b b",                 # different multiset
            None,                    # NULL -> '' singleton
        ], pa.string()),
    }))
    rows = bag_dup_groups(ds).take_all()
    got = {(r["row_key"], r["bag_id"], r["n_members"]) for r in rows}
    assert got == {("1", "1", 3), ("2", "1", 3), ("3", "1", 3)}


def test_token_entropy_closed_form(ray_session):
    """H=0 for a single repeated token, ln(n) for all-distinct tokens,
    exact closed form for a mixed doc; empty/NULL docs omitted."""
    import math

    from raydedup.stages.textstats import token_entropy

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "spam spam spam spam",
            "a b c d",
            "x x y",          # H = ln(3) - (2 ln 2)/3
            "",
            None,
        ], pa.string()),
    }))
    got = {r["doc_id"]: (r["n_tokens"], r["entropy"])
           for r in token_entropy(ds).take_all()}
    assert set(got) == {1, 2, 3}
    assert got[1][0] == 4 and abs(got[1][1]) < 1e-12
    assert abs(got[2][1] - math.log(4)) < 1e-12
    assert abs(got[3][1] - (math.log(3) - 2 * math.log(2) / 3)) < 1e-12


def test_dup_rate_estimate_atomic_groups(ray_session):
    """rate=1.0 gives the exact corpus stats; any rate keeps duplicate
    groups atomic (n_sampled is always a whole multiple of each sampled
    text's copy count), so dup_frac never under-counts pairs the way
    key-sampling would."""
    from raydedup.stages.exact import dup_rate_estimate

    texts = ["a"] * 4 + ["b"] * 2 + ["c", "d", "e", "f"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    full = dup_rate_estimate(ds, rate=1.0).take_all()[0]
    assert (full["n_sampled"], full["n_uniq"], full["dup_rows"]) == (10, 6, 4)
    assert abs(full["dup_frac"] - 0.4) < 1e-12

    half = dup_rate_estimate(ds, rate=0.5).take_all()
    if half:  # sample may be empty at tiny n
        r = half[0]
        # group atomicity: sampled rows decompose exactly into whole
        # copy-groups of sizes from {4, 2, 1}
        assert r["n_sampled"] >= r["n_uniq"]
        from itertools import combinations
        sizes = [4, 2, 1, 1, 1, 1]
        feas = {(sum(c), len(c))
                for k in range(1, 7)
                for c in combinations(sizes, k)}
        assert (r["n_sampled"], r["n_uniq"]) in feas

    import pytest
    with pytest.raises(ValueError):
        dup_rate_estimate(ds, rate=1.5)


def test_soft_dedup_weights_backends_agree(ray_session):
    """weight = 1/n_copies for every row, group weights sum to 1.0,
    broadcast and join backends value-identical."""
    import ray.data

    from raydedup.stages.exact import soft_dedup_weights

    rows = ([{"doc_id": f"a{i}", "text": "same text here"}
             for i in range(4)]
            + [{"doc_id": f"b{i}", "text": "other copy"} for i in range(2)]
            + [{"doc_id": "u1", "text": "unique one"},
               {"doc_id": "u2", "text": None},
               {"doc_id": "u3", "text": ""}])
    ds = ray.data.from_items(rows)
    got = {r["doc_id"]: (r["n_copies"], r["weight"])
           for r in soft_dedup_weights(ds, method="broadcast").take_all()}
    assert len(got) == len(rows)
    for i in range(4):
        assert got[f"a{i}"] == (4, 0.25)
    for i in range(2):
        assert got[f"b{i}"] == (2, 0.5)
    assert got["u1"] == (1, 1.0)
    # NULL text folds to '' — u2 and u3 form one group of 2
    assert got["u2"] == (2, 0.5) and got["u3"] == (2, 0.5)
    joined = {r["doc_id"]: (r["n_copies"], r["weight"])
              for r in soft_dedup_weights(ds, method="join").take_all()}
    assert joined == got
    auto_small = {r["doc_id"]: (r["n_copies"], r["weight"])
                  for r in soft_dedup_weights(
                      ds, method="auto",
                      broadcast_max_groups=0).take_all()}
    assert auto_small == got


def test_max_repeat_len_brute_parity_fuzz(ray_session):
    """Grid-quantized longest-repeated-substring == brute-force window
    scan on a seeded random small-alphabet corpus (overlapping repeats,
    planted long loops, empty/NULL rows, multi-byte text)."""
    import random

    from raydedup.stages.textstats import max_repeat_len

    rng = random.Random(13)
    alpha = "abcé "
    texts = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 200)))
             for _ in range(120)]
    texts += [t + " " + t[:130] for t in texts[:5]]     # planted loops
    texts += ["", None, "x" * 300, "abcdefgh" * 2]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = {r["doc_id"]: r["max_repeat_len"]
           for r in max_repeat_len(ds).take_all()}

    def brute(s: str) -> int:
        b = s.encode()  # byte-window contract
        best = 0
        for L in (8, 16, 32, 64, 128):
            seen = set()
            for i in range(len(b) - L + 1):
                w = b[i:i + L]
                if w in seen:
                    best = L
                    break
                seen.add(w)
        return best

    want = {i: brute(t or "") for i, t in enumerate(texts)}
    assert got == want
    assert max(got.values()) == 128 and min(got.values()) == 0


def test_simhash_calibration_query_planted(ray_session, tmp_path):
    """Planted corpus: a near-identical pair lands at low hamming with
    n_true counting it; an unrelated pair inside the radius (if any)
    doesn't. Checks the composed calibration query end-to-end on a tiny
    parquet dir."""
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    base = " ".join(f"tok{i}" for i in range(80))
    near = base + " tail"
    other = " ".join(f"zzz{i}" for i in range(80))
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([base, near, other, base], pa.string()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = entrymod.queries()["simhash_calibration"](str(tmp_path))
    rows = out.take_all()
    # doc 4 collapses into doc 1's rep; (1,2) is the near pair
    total_true = sum(r["n_true"] for r in rows)
    assert total_true >= 1
    low = min(r["hamming"] for r in rows if r["n_true"])
    assert low <= 6  # near-identical text -> small hamming
    for r in rows:
        assert 0.0 <= r["precision"] <= 1.0
        assert r["n_true"] <= r["n_pairs"]


def test_weighted_sample_replay_and_contract(ray_session):
    """Engine selection == pure-Python replay of the Efraimidis-
    Spirakis priorities (same md5-low60 + CAST arithmetic); w <= 0 and
    NULL rows excluded; rerun identical; heavy weights overrepresented."""
    import hashlib

    from raydedup.stages.textstats import weighted_sample

    n = 400
    ids = list(range(n))
    weights = [1000 if i < 40 else 1 for i in ids]  # 40 heavy rows
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "w": pa.array(weights, pa.int64())})
    tbl = pa.concat_tables([tbl, pa.table({
        "doc_id": pa.array([900, 901], pa.int64()),
        "w": pa.array([0, None], pa.int64())})])
    ds = ray.data.from_arrow(tbl)
    got = sorted(r["doc_id"] for r in
                 weighted_sample(ds, "doc_id", "w", k=30).take_all())
    got2 = sorted(r["doc_id"] for r in
                  weighted_sample(ds, "doc_id", "w", k=30).take_all())
    assert got == got2 and len(got) == 30
    assert 900 not in got and 901 not in got

    def prio(i, w):
        h = int.from_bytes(hashlib.md5(f"ws0:{i}".encode())
                           .digest()[:8], "big") >> 4
        u = (np.float64(h) + 1.0) / float(1 << 60)
        return np.log(u) / w

    want = sorted(sorted(ids, key=lambda i: -prio(i, weights[i]))[:30])
    assert got == want
    # heavy rows (10% of rows, weight x1000) dominate the sample
    assert sum(1 for i in got if i < 40) >= 25


def test_cluster_cohesion_planted(ray_session, tmp_path):
    """A planted 3-chain (a~b, b~c, no a~c) must report density 2/3
    while a planted clique pair reports 1.0."""
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    words = [f"tok{i}" for i in range(60)]
    a = " ".join(words)
    # b: words 58,59 replaced -> J(a,b) = 56/60 ~ 0.933 (pair)
    bw = words[:58] + ["xa", "xb"]
    b = " ".join(bw)
    # c: b with words 50..53 replaced -> J(b,c) = 52/64 ~ 0.813 (pair)
    # but J(a,c) = 50/66 ~ 0.758 < 0.8 (chain, no triangle)
    cw = bw[:50] + ["ya", "yb", "yc", "yd"] + bw[54:]
    c = " ".join(cw)
    d1 = " ".join(f"zzz{i}" for i in range(60))
    d2 = " ".join([f"zzz{i}" for i in range(58)] + ["qq", "ww"])
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([a, b, c, d1, d2], pa.string()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    rows = entrymod.queries()["cluster_cohesion"](str(tmp_path)).take_all()
    by = {r["cluster_id"]: r for r in rows}
    assert by["1"]["n_members"] == 3 and by["1"]["n_pairs"] == 2
    assert abs(by["1"]["density"] - round(2 / 3, 6)) < 1e-9
    assert by["4"]["n_members"] == 2 and by["4"]["density"] == 1.0


def test_normalized_dup_groups_folds_variants(ray_session):
    """Casefold + punctuation/whitespace collapse folds SHOUTING and
    re-punctuated copies into one group; genuinely different texts stay
    apart; min_size filters singletons."""
    from raydedup.stages.exact import normalized_dup_groups

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["Hello,   world!", "HELLO WORLD", "hello world.",
                          "different text", None], pa.string()),
    }))
    rows = normalized_dup_groups(ds).take_all()
    got = {r["row_key"]: (r["norm_id"], r["n_members"]) for r in rows}
    assert got == {"1": ("1", 3), "2": ("1", 3), "3": ("1", 3)}
    # min_size=1 keeps every row, singletons label themselves
    all_rows = normalized_dup_groups(ds, min_size=1).take_all()
    assert len(all_rows) == 5


class TestAhoCorasickScanner:
    """textstats.AhoCorasickScanner / blocklist_scan_ac: third blocklist
    kernel, automaton per actor, same non-overlap contract."""

    def test_parity_with_substring_kernel_fuzz(self, ray_session):
        import random

        import pyarrow as pa
        import ray.data

        from raydedup.stages.textstats import (
            blocklist_scan,
            blocklist_scan_ac,
        )

        rng = random.Random(71)
        alpha = "ab "
        rows = [{"doc_id": i,
                 "text": "".join(rng.choice(alpha) for _ in range(120))}
                for i in range(40)]
        phrases = ["ab", "ba", "aa", "a b", "bab", "abab", "zz"]

        def collect(fn):
            ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
            out = set()
            for r in fn(ds, phrases).take_all():
                out.add((r["doc_id"], r["phrase"], r["n_hits"]))
            return out

        assert collect(blocklist_scan_ac) == collect(blocklist_scan)

    def test_overlapping_and_nested_phrases(self, ray_session):
        import pyarrow as pa
        import ray.data

        from raydedup.stages.textstats import blocklist_scan_ac

        rows = [{"doc_id": 1, "text": "aaaa"},
                {"doc_id": 2, "text": "xAbAbAbx"}]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        got = {(r["doc_id"], r["phrase"]): r["n_hits"]
               for r in blocklist_scan_ac(ds, ["aa", "abab", "bab"],
                                          concurrency=2).take_all()}
        # "aaaa".count("aa") == 2 (non-overlapping)
        assert got[(1, "aa")] == 2
        # case-folded "xababab x": abab once non-overlap, bab twice? no:
        # "ababab" -> abab at 0 (ends 4), next start must be >= 4: none
        assert got[(2, "abab")] == 1
        assert got[(2, "bab")] == 1  # bab at 1, next at 3 overlaps


def _mk_bucket_group(rng, m, sgrp, band_j, n_dense=6, bands=16):
    """Synthetic (bucket, sgrp) verify group: every member holds the
    n_dense common elements (a template core) plus a random sparse
    tail; a random fifth of members DROP one dense element each, so the
    ScanCount complement path sees partial-density runs. Random shared
    sparse elements plant a few genuinely-similar pairs."""
    import pyarrow as pa

    rows_sh = []
    bh = rng.integers(1, 1 << 48, size=(m, bands), dtype=np.int64)
    # force some prior-band equality so the first-band rule bites
    if band_j > 0:
        for _ in range(m // 4):
            i, j = rng.integers(0, m, 2)
            bh[j, : band_j // 2 + 1] = bh[i, : band_j // 2 + 1]
    dense = np.arange(1, n_dense + 1, dtype=np.uint64) * np.uint64(7919)
    for i in range(m):
        d = dense.copy()
        if i % 5 == 0 and n_dense > 1:
            d = np.delete(d, i % n_dense)
        if i % 7 == 0 and i > 0:
            # near-copy of member i-1 → a true high-jaccard pair
            prev = rows_sh[-1]
            tail = prev[np.isin(prev, dense, invert=True)]
            tail = tail.copy()
            if tail.size:
                tail[rng.integers(0, tail.size)] = np.uint64(
                    rng.integers(1 << 50, 1 << 60))
        else:
            tail = rng.integers(1 << 50, 1 << 60,
                                size=rng.integers(8, 20)).astype(np.uint64)
        rows_sh.append(np.unique(np.concatenate((d, tail))))
    offs = np.zeros(m + 1, dtype=np.int32)
    np.cumsum([s.size for s in rows_sh], out=offs[1:])
    sh = pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()),
        pa.array(np.concatenate(rows_sh), pa.uint64()))
    si, sj = sgrp
    salts = (np.full(m, si, np.int32) if si == sj
             else rng.integers(0, 2, m).astype(np.int32) * (sj - si) + si)
    return pa.table({
        "bucket": pa.array(np.full(m, 42, np.int64)),
        "sgrp": pa.array(np.full(m, si * (1 << 15) + sj, np.int64)),
        "salt": pa.array(salts),
        "band_id": pa.array(np.full(m, band_j, np.int32)),
        "row_key": pa.array([f"k{i:05d}" for i in range(m)], pa.string()),
        "band_hashes": pa.FixedSizeListArray.from_arrays(
            pa.array(bh.reshape(-1).astype(np.uint64), pa.uint64()), bands),
        "shingle_hashes": sh,
    })


def test_bucket_verify_scancount_equals_triu_kernel():
    """The ScanCount hot-group kernel must emit the EXACT pair set and
    jaccards of the per-pair merge kernel on every group shape: within-
    salt and cross-salt, with and without prior bands, dense elements
    partially missing (the inclusion-exclusion complement path), and a
    low threshold that exercises the full-enumeration extraction."""
    from raydedup.stages.lsh import BucketVerify

    rng = np.random.default_rng(23)
    for sgrp in ((0, 0), (1, 3)):
        for band_j in (0, 5):
            for thr in (0.8, 0.12):
                group = _mk_bucket_group(rng, 180, sgrp, band_j)
                scan = BucketVerify(DEFAULT_CONFIG, thr, scan_min=16)
                triu = BucketVerify(DEFAULT_CONFIG, thr, scan_min=10**9)
                a = {(r["a_key"], r["b_key"], round(r["jaccard"], 12))
                     for r in scan(group).to_pylist()}
                b = {(r["a_key"], r["b_key"], round(r["jaccard"], 12))
                     for r in triu(group).to_pylist()}
                assert a == b, (sgrp, band_j, thr, len(a), len(b),
                                list(a ^ b)[:4])
                assert a or thr > 0.5  # low threshold must find pairs


def test_bucket_verify_scancount_fuzz():
    """Property fuzz: ScanCount == merge kernel on RANDOM groups — set
    sizes, density mix, salt shapes, prior bands and thresholds all
    drawn randomly. Catches the interaction bugs a fixed fixture can't
    (e.g. the both-members-missing inclusion-exclusion case only
    appears when two members independently drop the same dense
    element)."""
    from hypothesis import given, settings, strategies as st

    from raydedup.stages.lsh import BucketVerify

    @settings(max_examples=25, deadline=None)
    @given(st.integers(0, 10**6))
    def check(seed):
        rng = np.random.default_rng(seed)
        m = int(rng.integers(20, 90))
        sgrp = ((0, 0) if rng.random() < 0.5
                else tuple(sorted(rng.integers(0, 4, 2).tolist())))
        band_j = int(rng.integers(0, 8))
        thr = float(rng.choice([0.1, 0.3, 0.5, 0.8]))
        n_dense = int(rng.integers(0, 8))
        group = _mk_bucket_group(rng, m, sgrp, band_j,
                                 n_dense=max(1, n_dense))
        scan = BucketVerify(DEFAULT_CONFIG, thr, scan_min=2)
        triu = BucketVerify(DEFAULT_CONFIG, thr, scan_min=10**9)
        a = {(r["a_key"], r["b_key"], round(r["jaccard"], 12))
             for r in scan(group).to_pylist()}
        b = {(r["a_key"], r["b_key"], round(r["jaccard"], 12))
             for r in triu(group).to_pylist()}
        assert a == b, (seed, m, sgrp, band_j, thr, len(a), len(b),
                        list(a ^ b)[:3])

    check()


def test_cluster_common_tokens_planted(ray_session):
    """Planted template families: 3 clusters whose members share a
    known 6-token template plus per-member slots, one cluster with an
    EMPTY member (forces common 0 / min 0), singletons excluded."""
    from raydedup.stages.collection import cluster_common_tokens

    rows = []
    for g in range(3):
        for m in range(3):
            rows.append((f"g{g}m{m}", f"c{g}",
                         f"tpl{g}a tpl{g}b tpl{g}c tpl{g}d tpl{g}e "
                         f"tpl{g}f slot{g}{m} extra{g}{m}"))
    rows.append(("e0", "ce", "only tokens here"))
    rows.append(("e1", "ce", ""))          # empty member
    rows.append(("s0", "cs", "lonely singleton text"))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "cluster_id": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    }))
    got = {r["cluster_id"]: r for r in cluster_common_tokens(
        ds, id_col="doc_id").take_all()}
    assert set(got) == {"c0", "c1", "c2", "ce"}  # singleton dropped
    for g in range(3):
        r = got[f"c{g}"]
        assert r["n_members"] == 3
        assert r["n_common_tokens"] == 6      # the template
        assert r["min_member_tokens"] == 8    # template + 2 slots
        assert abs(r["commonality"] - 6 / 8) < 1e-12
    r = got["ce"]
    assert (r["n_members"], r["n_common_tokens"],
            r["min_member_tokens"], r["commonality"]) == (2, 0, 0, 0.0)


def test_cluster_template_text_planted(ray_session):
    """Template extraction renders the common tokens in the REP's
    first-occurrence order (rep = the cluster_id member), deduping
    repeated template tokens and skipping slot tokens."""
    from raydedup.stages.collection import cluster_template_text

    rows = [
        ("a1", "a1", "the quick brown fox the quick slotA1 jumps"),
        ("a2", "a1", "jumps fox brown quick the slotA2 padA2"),
        ("a3", "a1", "quick the jumps brown fox slotA3"),
        ("b1", "b1", "zeta alpha slotB1"),
        ("b2", "b1", "alpha zeta slotB2"),
        ("solo", "solo", "nothing shared here"),
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "cluster_id": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    }))
    got = {r["cluster_id"]: r for r in cluster_template_text(
        ds, id_col="doc_id").take_all()}
    assert set(got) == {"a1", "b1"}
    # rep a1's first-occurrence order of {the, quick, brown, fox, jumps}
    assert got["a1"]["template"] == "the quick brown fox jumps"
    assert got["a1"]["n_members"] == 3
    assert got["b1"]["template"] == "zeta alpha"  # rep b1's order
