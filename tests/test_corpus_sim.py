"""source_similarity matrix and pair_threshold_sweep vs brute force."""

import numpy as np
import pyarrow as pa

import ray.data

from raydedup.pipelines.neardup import pair_threshold_sweep
from raydedup.stages.collection import source_similarity
from raydedup.stages.decontam import _ngrams


def test_source_similarity_vs_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    sources, texts = [], []
    for i in range(120):
        src = f"s{int(rng.integers(0, 4))}"
        n_tok = int(rng.integers(0, 12))
        sources.append(src)
        texts.append(" ".join(rng.choice(vocab, size=n_tok)))
    # a source whose docs never reach 3 tokens must drop out entirely
    sources += ["tiny", "tiny"]
    texts += ["one two", ""]
    ds = ray.data.from_arrow(pa.table({"source": sources, "text": texts}))
    got = source_similarity(ds, num_partitions=8).to_pandas()

    grams: dict[str, set] = {}
    for s, t in zip(sources, texts):
        grams.setdefault(s, set()).update(_ngrams(t, 3))
    keep = sorted(s for s in grams if grams[s])
    assert "tiny" not in keep
    exp_rows = {}
    for i, a in enumerate(keep):
        for b in keep[i + 1:]:
            c = len(grams[a] & grams[b])
            u = len(grams[a] | grams[b])
            exp_rows[(a, b)] = (len(grams[a]), len(grams[b]), c, c / u)
    assert len(got) == len(exp_rows)
    for r in got.itertuples():
        na, nb, c, j = exp_rows[(r.source_a, r.source_b)]
        assert (r.n_a, r.n_b, r.n_common) == (na, nb, c)
        assert abs(r.jaccard - j) < 1e-12
    # at least one pair must actually share grams for the test to bite
    assert got["n_common"].max() > 0


def test_pair_threshold_sweep_counts(ray_session):
    pairs = ray.data.from_arrow(pa.table({
        "a_key": ["a", "a", "b", "c"],
        "b_key": ["b", "c", "d", "e"],
        "jaccard": [0.82, 0.91, 0.95, 1.0],
    }))
    out = pair_threshold_sweep(pairs, [0.8, 0.9, 0.95, 1.0]).to_pandas()
    out = out.set_index("threshold")
    assert out.loc[0.8, "n_pairs"] == 4
    assert out.loc[0.9, "n_pairs"] == 3
    assert out.loc[0.95, "n_pairs"] == 2
    assert out.loc[1.0, "n_pairs"] == 1
    # docs with a pair >= t: t=0.9 -> {a,c,b,d,e}; t=1.0 -> {c,e}
    assert out.loc[0.8, "n_dup_docs"] == 5
    assert out.loc[0.9, "n_dup_docs"] == 5
    assert out.loc[0.95, "n_dup_docs"] == 4
    assert out.loc[1.0, "n_dup_docs"] == 2


def test_pair_threshold_sweep_empty(ray_session):
    pairs = ray.data.from_arrow(pa.table({
        "a_key": pa.array([], pa.string()),
        "b_key": pa.array([], pa.string()),
        "jaccard": pa.array([], pa.float64()),
    }))
    out = pair_threshold_sweep(pairs, [0.8, 1.0]).to_pandas()
    assert list(out["threshold"]) == [0.8, 1.0]
    assert out["n_pairs"].sum() == 0 and out["n_dup_docs"].sum() == 0


def test_ecdf_drift_vs_bruteforce(ray_session):
    from raydedup.stages.stats import ecdf_drift_by_group

    rng = np.random.default_rng(3)
    srcs = [f"s{int(rng.integers(0, 3))}" for _ in range(400)]
    # s2 drawn from a shifted distribution so drift is nonzero
    vals = [int(rng.integers(100, 200)) if s != "s2"
            else int(rng.integers(150, 260)) for s in srcs]
    ds = ray.data.from_arrow(pa.table({"source": srcs, "n_chars": vals}))
    got = {r.source: (r.n_docs, r.ks_stat)
           for r in ecdf_drift_by_group(ds).to_pandas().itertuples()}

    xs = sorted(set(vals))
    arr = np.array(vals)
    sarr = np.array(srcs)
    for s in sorted(set(srcs)):
        mine = arr[sarr == s]
        rest = arr[sarr != s]
        f_g = np.array([(mine <= x).sum() for x in xs]) / len(mine)
        f_r = np.array([(rest <= x).sum() for x in xs]) / len(rest)
        ks = np.max(np.abs(f_g - f_r))
        n_docs, got_ks = got[s]
        assert n_docs == len(mine)
        assert abs(got_ks - ks) < 1e-12
    assert got["s2"][1] > 0.2  # the planted shift is detected


def test_source_similarity_kmv_exact_when_small(ray_session):
    """With distinct grams per source <= k, the KMV union sketch IS the
    union — the estimate must equal the exact Jaccard."""
    from raydedup.stages.collection import (source_similarity,
                                            source_similarity_kmv)

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = {"source": [], "text": []}
    for s in ("a", "b", "c"):
        for _ in range(10):
            words = rng.choice(vocab, size=12, replace=True)
            rows["source"].append(s)
            rows["text"].append(" ".join(words))
    ds = ray.data.from_arrow(pa.table(rows))
    exact = {(r.source_a, r.source_b): r.jaccard
             for r in source_similarity(ds).to_pandas().itertuples()}
    est = {(r.source_a, r.source_b): r.jaccard_est
           for r in source_similarity_kmv(ds, k=100000).to_pandas()
           .itertuples()}
    assert set(exact) == set(est)
    for p, j in exact.items():
        assert abs(est[p] - j) < 1e-12


def test_source_similarity_kmv_estimate_accuracy(ray_session):
    """At k=256 the estimate must land within a few sigma
    (~3/sqrt(k) ~ 0.19) of the true Jaccard on overlapping corpora,
    and be deterministic across runs."""
    from raydedup.stages.collection import (source_similarity,
                                            source_similarity_kmv)

    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(3000)]
    rows = {"source": [], "text": []}
    shared = [" ".join(rng.choice(vocab, size=30)) for _ in range(60)]
    for s in ("a", "b"):
        rows["source"] += [s] * 60
        rows["text"] += shared  # identical half
        rows["source"] += [s] * 60
        rows["text"] += [" ".join(rng.choice(vocab, size=30))
                         for _ in range(60)]  # private half
    ds = ray.data.from_arrow(pa.table(rows))
    exact = source_similarity(ds).to_pandas().iloc[0]["jaccard"]
    e1 = source_similarity_kmv(ds, k=256).to_pandas()
    e2 = source_similarity_kmv(ds, k=256).to_pandas()
    assert abs(e1.iloc[0]["jaccard_est"] - exact) < 3 / np.sqrt(256) + 0.02
    assert e1.iloc[0]["jaccard_est"] == e2.iloc[0]["jaccard_est"]
    assert e1.iloc[0]["k_union"] == 256


def test_hot_ngrams_threshold_contract(ray_session):
    import pyarrow as pa
    import ray.data

    from raydedup.stages.collection import hot_ngrams

    texts = {
        1: "alpha beta gamma delta epsilon zeta",
        2: "alpha beta gamma delta epsilon eta",
        3: "pre alpha beta gamma delta epsilon",
        4: "unrelated words entirely different from others here",
        5: "more unrelated words entirely different from others",
    }
    ds = ray.data.from_arrow(pa.table({"doc_id": list(texts),
                                       "text": list(texts.values())}))
    got = {r["gram"]: r["n_docs"] for r in
           hot_ngrams(ds, n=5, k=1).take_all()}
    # 'alpha beta gamma delta epsilon' is the unique 3-doc gram; with
    # k=1 the threshold value is 3, so it alone survives
    assert got == {"alpha beta gamma delta epsilon": 3}
    # k large => threshold floors at min_docs=2; 2-doc grams now appear
    got2 = {r["gram"]: r["n_docs"] for r in
            hot_ngrams(ds, n=5, k=50).take_all()}
    assert got2["alpha beta gamma delta epsilon"] == 3
    assert all(v >= 2 for v in got2.values()) and len(got2) > 1


def test_hot_ngrams_no_duplicated_grams(ray_session):
    import pyarrow as pa
    import ray.data

    from raydedup.stages.collection import hot_ngrams

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["one two three four five six",
                 "seven eight nine ten eleven twelve"]}))
    assert hot_ngrams(ds, n=5, k=10).take_all() == []


def test_token_frequency_spectrum_closed_form(ray_session):
    """Hand-countable corpus: spectrum rows match exact type counts and
    the sum invariant sum(tf * n_types) == total token instances."""
    import ray.data

    from raydedup.stages.collection import token_frequency_spectrum

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["a a a b b c", "b c d", None],
    }))
    got = {r["tf"]: r["n_types"]
           for r in token_frequency_spectrum(ds).take_all()}
    # counts: a=3, b=3, c=2, d=1 -> tf 3 has 2 types, tf 2 has 1, tf 1 has 1
    assert got == {3: 2, 2: 1, 1: 1}
    assert sum(tf * n for tf, n in got.items()) == 9


def test_kl_by_group_behavior(ray_session):
    """Identical-vocabulary groups sit near KL 0; a divergent-vocabulary
    group scores far higher; NULL group keys are dropped; a lone group
    (empty rest) yields no rows."""
    import ray.data

    from raydedup.stages.stats import kl_divergence_by_group

    same = "alpha beta gamma delta " * 10
    diff = "omega psi chi phi upsilon tau " * 10
    ds = ray.data.from_arrow(pa.table({
        "source": ["s1"] * 4 + ["s2"] * 4 + ["s3"] * 4 + [None],
        "text": [same] * 8 + [diff] * 4 + [same],
    }))
    tbl = kl_divergence_by_group(ds)
    got = {tbl["source"][i].as_py(): tbl["kl"][i].as_py()
           for i in range(tbl.num_rows)}
    assert set(got) == {"s1", "s2", "s3"}
    assert got["s3"] > 2 * max(got["s1"], got["s2"])
    assert abs(got["s1"] - got["s2"]) < 1e-12  # symmetric twins

    lone = ray.data.from_arrow(pa.table({
        "source": ["only"], "text": ["some words here"],
    }))
    assert kl_divergence_by_group(lone).num_rows == 0


def test_top_values_by_group_prefilter_exact(ray_session):
    """Grouped top-k equals a brute Counter ranking (count desc, value
    asc tie-break) even when each group's values are scattered across
    many small blocks — the per-block pre-filter must never drop a
    global winner."""
    from collections import Counter

    from raydedup.stages.stats import top_values_by_group

    rng = np.random.default_rng(9)
    groups = [f"g{int(i)}" for i in rng.integers(0, 6, size=3000)]
    vals = [f"v{int(i)}" for i in rng.integers(0, 25, size=3000)]
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(groups), "v": pa.array(vals),
    })).repartition(40)
    got = {(r["g"], r["rank"]): (r["v"], r["n"])
           for r in top_values_by_group(ds, "g", "v", k=3).take_all()}
    want = {}
    for g in set(groups):
        cnt = Counter(v for gg, v in zip(groups, vals) if gg == g)
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for i, (v, n) in enumerate(ranked, 1):
            want[(g, i)] = (v, n)
    assert got == want


def test_rs_join_partitioned_verify_equals_broadcast(ray_session):
    """The partitioned R-S verify (side-tagged pair-exploded join) must
    emit exactly the broadcast path's pairs — including when a_ids and
    b_ids COINCIDE numerically across the two corpora, the case the
    side tags exist for."""
    from raydedup.config import DEFAULT_CONFIG
    from raydedup.stages.setjoin import set_similarity_join

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    words = base.split()
    rows_a, rows_b = [], []
    for i in range(25):
        t = " ".join(words)
        rows_a.append((i, t))                       # corpus A id = i
        rows_b.append((i, t + f" extra{i}"))        # corpus B SAME id
        rows_b.append((100 + i, " ".join(reversed(words)) + f" w{i}"))
        words = words[1:] + [f"tok{i}"]
    ds_a = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows_a], pa.int64()),
        "text": pa.array([r[1] for r in rows_a]),
    }))
    ds_b = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows_b], pa.int64()),
        "text": pa.array([r[1] for r in rows_b]),
    }))
    cfg = DEFAULT_CONFIG
    bc = set_similarity_join(ds_a, ds_b, 0.5, cfg).take_all()
    pt = set_similarity_join(ds_a, ds_b, 0.5, cfg,
                             verify_broadcast_max_rows=1).take_all()
    key = lambda r: (r["a_id"], r["b_id"], r["common"], r["na"], r["nb"],
                     round(r["jaccard"], 12))
    ka, kb = sorted(map(key, bc)), sorted(map(key, pt))
    assert ka == kb
    assert ka  # the shared-shingle plant produced cross pairs
    # the id-collision rows actually met: some pair has a_id == b_id
    assert any(r["a_id"] == r["b_id"] for r in bc)
