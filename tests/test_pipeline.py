"""End-to-end near-dup pipeline parity vs the single-process oracle."""

import pyarrow as pa
import pytest

import ray.data

from raydedup.config import DEFAULT_CONFIG
from raydedup.pipelines.neardup import (
    cluster_assignments,
    near_dup_pairs,
    near_dup_pipeline,
    signatures_with_rep,
    survivors,
)
from raydedup.sources.transcripts import generate_transcripts
from testing.oracle import oracle_near_dup, pair_recall


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(n_convs=80, seed=42)


@pytest.fixture(scope="module")
def pipeline_result(corpus):
    ds = ray.data.from_arrow(corpus)
    clusters, pairs = near_dup_pipeline(ds, DEFAULT_CONFIG)
    return clusters.take_all(), pairs.take_all()


@pytest.fixture(scope="module")
def oracle_result(corpus):
    return oracle_near_dup(corpus, DEFAULT_CONFIG)


def test_pair_recall_against_oracle(pipeline_result, oracle_result):
    _, pairs = pipeline_result
    got = {(r["a_key"], r["b_key"]) for r in pairs}
    expected = set(oracle_result["pairs"].keys())
    assert pair_recall(expected, got) >= 0.99  # BASELINE.json contract
    # verified-exact pipeline ⇒ no false positives at all
    assert not (got - expected)


def test_pair_jaccard_values_match_oracle(pipeline_result, oracle_result):
    _, pairs = pipeline_result
    for r in pairs:
        exp = oracle_result["pairs"].get((r["a_key"], r["b_key"]))
        assert exp is not None
        assert r["jaccard"] == pytest.approx(exp)


def test_cluster_assignments_match_oracle(pipeline_result, oracle_result):
    clusters, _ = pipeline_result
    got = {r["row_key"]: r["cluster_id"] for r in clusters}
    assert got == oracle_result["clusters"]


def test_survivors_one_per_cluster(pipeline_result):
    clusters, _ = pipeline_result
    by_cluster = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        keep = [m for m in members if not m["is_duplicate"]]
        assert len(keep) == 1
        assert keep[0]["row_key"] == cid  # canonical min member survives


def test_pipeline_deterministic_rerun(corpus):
    ds = ray.data.from_arrow(corpus)
    _, pairs1 = near_dup_pipeline(ds, DEFAULT_CONFIG)
    ds2 = ray.data.from_arrow(corpus).random_shuffle(seed=3)
    _, pairs2 = near_dup_pipeline(ds2, DEFAULT_CONFIG)
    p1 = {(r["a_key"], r["b_key"]) for r in pairs1.take_all()}
    p2 = {(r["a_key"], r["b_key"]) for r in pairs2.take_all()}
    assert p1 == p2  # arrival order must not affect results


def test_exact_dedup_representative_is_min_key():
    tbl = pa.table(
        {
            "conv_id": ["c1", "c2", "c3"],
            "turn_idx": pa.array([0, 0, 0], type=pa.int32()),
            "text": ["same text here"] * 3,
        }
    )
    assigned = signatures_with_rep(ray.data.from_arrow(tbl), DEFAULT_CONFIG)
    rows = assigned.take_all()
    assert all(r["rep_key"] == "c1:0" for r in rows)
    assert sum(r["is_rep"] for r in rows) == 1
    assert all(r["n_exact"] == 3 for r in rows)


def test_empty_texts_do_not_pair():
    tbl = pa.table(
        {
            "conv_id": ["a", "b", "c"],
            "turn_idx": pa.array([0, 0, 0], type=pa.int32()),
            "text": ["", "the of and", "   "],  # empty / stopword-only / ws
        }
    )
    assigned = signatures_with_rep(ray.data.from_arrow(tbl), DEFAULT_CONFIG)
    pairs = near_dup_pairs(assigned.materialize(), DEFAULT_CONFIG)
    assert pairs.count() == 0


def test_lsh_copartition_path_matches_driver_path(corpus):
    """The scale (co-partitioned groupby) LSH path and the driver-pair
    path must produce the same verified pair set."""
    from raydedup.stages.lsh import lsh_verified_pairs

    assigned = signatures_with_rep(
        ray.data.from_arrow(corpus), DEFAULT_CONFIG
    ).materialize()
    reps = assigned.filter(expr="is_rep").select_columns(
        ["row_key", "band_hashes", "shingle_hashes", "n_shingles"]
    )
    drv = {(r["a_key"], r["b_key"], round(r["jaccard"], 12))
           for r in lsh_verified_pairs(reps, DEFAULT_CONFIG).take_all()}
    cop = {(r["a_key"], r["b_key"], round(r["jaccard"], 12))
           for r in lsh_verified_pairs(
               reps, DEFAULT_CONFIG, copartition_verify=True,
               distributed_counts=True).take_all()}
    assert drv == cop


def test_hot_bucket_salting_exact_recall():
    """A planted hot LSH bucket (one near-dup family far above
    lsh_bucket_salt_above) must still yield EVERY true pair through the
    salted co-partition path — salting is exact coverage, not a lossy
    window (VERDICT r1 #6)."""
    import numpy as np

    from raydedup.stages.lsh import lsh_verified_pairs

    cfg = DEFAULT_CONFIG.with_overrides(lsh_bucket_salt_above=40)
    n_fam = 300  # >> salt limit ⇒ s = ceil(300/40) = 8 salt classes
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon") * 3
    rows = {"conv_id": [], "turn_idx": [], "text": []}
    words = base.split()
    for i in range(n_fam):
        w = list(words)
        w[i % len(w)] = f"tweak{i}"  # one-word tweak: high pairwise Jaccard
        rows["conv_id"].append(f"fam{i:04d}")
        rows["turn_idx"].append(0)
        rows["text"].append(" ".join(w))
    tbl = pa.table({
        "conv_id": pa.array(rows["conv_id"]),
        "turn_idx": pa.array(rows["turn_idx"], type=pa.int32()),
        "text": pa.array(rows["text"]),
    })
    assigned = signatures_with_rep(ray.data.from_arrow(tbl), cfg).materialize()
    reps = assigned.filter(expr="is_rep").select_columns(
        ["row_key", "band_hashes", "shingle_hashes", "n_shingles"]
    )
    got = {(r["a_key"], r["b_key"])
           for r in lsh_verified_pairs(
               reps, cfg, copartition_verify=True,
               distributed_counts=True).take_all()}
    # brute-force oracle over the same signatures: any banded collision
    # pair with exact shingle Jaccard >= threshold must be found
    sig_rows = reps.take_all()
    keys = [r["row_key"] for r in sig_rows]
    bands = np.array([r["band_hashes"] for r in sig_rows], dtype=np.uint64)
    shingles = [np.array(r["shingle_hashes"], dtype=np.uint64)
                for r in sig_rows]
    expected = set()
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            if not (bands[i] == bands[j]).any():
                continue
            inter = np.intersect1d(shingles[i], shingles[j],
                                   assume_unique=True).size
            union = shingles[i].size + shingles[j].size - inter
            if union and inter / union >= cfg.jaccard_dup_threshold:
                a, b = sorted((keys[i], keys[j]))
                expected.add((a, b))
    assert len(expected) > 2000  # the bucket really is hot
    assert got == expected  # exact: recall 1.0, zero false positives


def test_empty_and_single_row_inputs():
    """Zero-row and one-row corpora must flow through the full DAG (Ray
    passes empty blocks through map_batches with the PRE-map schema, so
    the ref-based tasks must skip them rather than index mapped columns)."""
    import pyarrow as pa
    import ray.data

    from raydedup.pipelines.neardup import near_dup_pipeline

    empty = pa.table({"conv_id": pa.array([], pa.string()),
                      "turn_idx": pa.array([], pa.int32()),
                      "text": pa.array([], pa.string())})
    clusters, pairs = near_dup_pipeline(ray.data.from_arrow(empty),
                                        DEFAULT_CONFIG)
    assert clusters.count() == 0
    assert pairs.count() == 0

    one = pa.table({"conv_id": ["c1"], "turn_idx": pa.array([0], pa.int32()),
                    "text": ["hello world"]})
    c2, p2 = near_dup_pipeline(ray.data.from_arrow(one), DEFAULT_CONFIG)
    rows = c2.take_all()
    assert len(rows) == 1 and rows[0]["is_duplicate"] is False
    assert p2.count() == 0


def test_hot_bucket_salt_is_global_identity_not_batch_position():
    """Hot-bucket salt classes must come from the global row identity:
    members of one hot bucket scattered one-per-batch must still spread
    across salt classes (a batch-positional assignment puts every batch's
    first member in class 0, funneling the whole bucket into one verify
    task)."""
    import numpy as np

    from raydedup.stages.lsh import heavy_explode
    from raydedup.stages.signatures import signature_batch, _state_for

    cfg = DEFAULT_CONFIG.with_overrides(lsh_bucket_salt_above=10)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    texts = []
    for i in range(80):
        w = list(words) * 3
        w[i % len(w)] = f"tweak{i}"
        texts.append(" ".join(w))
    _state_for(cfg)
    # one signature batch just to discover the family's shared buckets
    full = pa.table({
        "row_key": [f"k{i:03d}" for i in range(80)],
        "text": texts,
    })
    sigs = signature_batch(full, cfg)
    import collections
    from raydedup.stages.lsh import light_explode
    light = light_explode(sigs, cfg)
    sizes = collections.Counter(light["bucket"].to_pylist())
    hot = {b: n for b, n in sizes.items() if n > cfg.lsh_bucket_salt_above}
    assert hot, "fixture must produce at least one hot bucket"
    surviving = np.sort(np.array([b for b, n in sizes.items() if n >= 2],
                                 dtype=np.int64))
    # feed the SAME rows one-per-batch (worst-case scatter) and collect
    # the salt class of each member of the hottest bucket
    hottest = max(hot, key=hot.get)
    salts = []
    for i in range(80):
        one = signature_batch(full.slice(i, 1), cfg)
        out = heavy_explode(one, cfg, surviving, hot)
        m = [s for b, s in zip(out["bucket"].to_pylist(),
                               out["salt"].to_pylist()) if b == hottest]
        salts.extend(set(m))
    s_classes = -(-hot[hottest] // cfg.lsh_bucket_salt_above)
    assert len(set(salts)) >= max(2, s_classes // 2), (
        f"salt classes collapsed: {sorted(set(salts))} of {s_classes}")


def test_random_corpus_fuzz_vs_oracle():
    """Randomized corpora through the FULL dedup DAG vs the single-process
    brute-force oracle: planted duplicate families with random tweak
    rates, random short/empty turns, random conversation shapes. Every
    seed must give pair recall 1.0 with zero extra pairs and matching
    cluster assignment counts."""
    import numpy as np

    from raydedup.pipelines.neardup import near_dup_pipeline
    from testing.oracle import oracle_near_dup, pair_recall

    vocab = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "mu nu xi omicron rho sigma tau upsilon phi chi psi").split()
    for seed in range(4):
        rng = np.random.default_rng(1000 + seed)
        rows = {"conv_id": [], "turn_idx": [], "text": []}
        n_conv = int(rng.integers(10, 30))
        for c in range(n_conv):
            n_turns = int(rng.integers(1, 9))
            base = [vocab[int(rng.integers(0, len(vocab)))]
                    for _ in range(int(rng.integers(0, 40)))]
            for t in range(n_turns):
                kind = rng.random()
                if kind < 0.15:
                    text = ""                       # empty turn
                elif kind < 0.3:
                    text = vocab[int(rng.integers(0, len(vocab)))]  # tiny
                elif kind < 0.6 and base:
                    w = list(base)                  # near-dup of base
                    for _ in range(int(rng.integers(0, 3))):
                        w[int(rng.integers(0, len(w)))] = (
                            vocab[int(rng.integers(0, len(vocab)))])
                    text = " ".join(w)
                elif kind < 0.75 and base:
                    text = " ".join(base)           # exact dup of base
                else:
                    text = " ".join(
                        vocab[int(rng.integers(0, len(vocab)))]
                        for _ in range(int(rng.integers(1, 50))))
                rows["conv_id"].append(f"c{c:03d}")
                rows["turn_idx"].append(t)
                rows["text"].append(text)
        tbl = pa.table({
            "conv_id": pa.array(rows["conv_id"]),
            "turn_idx": pa.array(rows["turn_idx"], type=pa.int32()),
            "text": pa.array(rows["text"]),
        })
        clusters, pairs = near_dup_pipeline(
            ray.data.from_arrow(tbl), DEFAULT_CONFIG)
        got = {(r["a_key"], r["b_key"]) for r in pairs.take_all()}
        o = oracle_near_dup(tbl, DEFAULT_CONFIG)
        want = set(o["pairs"])
        assert pair_recall(want, got) == 1.0, (seed, want - got)
        assert not (got - want), (seed, got - want)
        crows = clusters.take_all()
        assert len(crows) == tbl.num_rows, seed
        want_cluster = o["clusters"]
        for r in crows:
            assert r["cluster_id"] == want_cluster[r["row_key"]], (
                seed, r["row_key"])


def test_hybrid_hot_cold_verify_matches_driver(ray_session):
    """The lazy-defer route (reducers defer hot bucket runs → salted
    ScanCount groupby; remaining cold runs → driver ref-shuffle; union
    distinct) must emit exactly the plain driver path's pair set on a
    corpus that mixes a planted HOT family (far above the salt limit)
    with ordinary cold near-dup families."""
    from raydedup.stages.lsh import (_driver_pair_verify,
                                     _hot_scan_pairs,
                                     _merge_distinct_pairs)

    cfg = DEFAULT_CONFIG.with_overrides(lsh_bucket_salt_above=40)
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon") * 3
    rows = {"conv_id": [], "turn_idx": [], "text": []}
    words = base.split()
    for i in range(260):  # hot family: one-word tweaks of one template
        w = list(words)
        w[i % len(w)] = f"tweak{i}"
        rows["conv_id"].append(f"hot{i:04d}")
        rows["turn_idx"].append(0)
        rows["text"].append(" ".join(w))
    for g in range(40):   # cold families of 4 (small buckets)
        cw = [f"g{g}w{k}" for k in range(30)]
        for m in range(4):
            w = list(cw)
            if m:
                w[(g + m) % len(w)] = f"e{g}x{m}"
            rows["conv_id"].append(f"cold{g:03d}m{m}")
            rows["turn_idx"].append(0)
            rows["text"].append(" ".join(w))
    tbl = pa.table({
        "conv_id": pa.array(rows["conv_id"]),
        "turn_idx": pa.array(rows["turn_idx"], type=pa.int32()),
        "text": pa.array(rows["text"]),
    })
    assigned = signatures_with_rep(
        ray.data.from_arrow(tbl), cfg).materialize()
    reps = assigned.filter(expr="is_rep").select_columns(
        ["row_key", "band_hashes", "shingle_hashes", "n_shingles"]
    ).materialize()
    thr = cfg.jaccard_dup_threshold
    # tiny budget forces the reducers to defer the 260-member hot family
    # (mass ~33.7k pairs) while the 4-member cold runs stay inline
    cold_ds, hot_keys, hot_sizes = _driver_pair_verify(
        reps, cfg, thr, defer_hot=True, defer_budget=1000)
    assert hot_keys.size > 0, "planted hot family must be deferred"
    assert max(hot_sizes.values()) >= 200  # reported global run sizes
    merged = _merge_distinct_pairs(
        _hot_scan_pairs(reps, cfg, thr, hot_keys, hot_sizes), cold_ds)
    hybrid = {(r["a_key"], r["b_key"], round(r["jaccard"], 9))
              for r in merged.take_all()}
    driver = {(r["a_key"], r["b_key"], round(r["jaccard"], 9))
              for r in _driver_pair_verify(reps, cfg, thr).take_all()}
    assert hybrid == driver
    assert len(hybrid) > 2000  # the hot family's pairs are all present
    assert any(a.startswith("cold") for a, _, _ in hybrid)  # cold too
