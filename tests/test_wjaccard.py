"""Weighted (multiset) near-dup pairs (stages/wjaccard.py).

The expansion reduction must be exact: set Jaccard over the expanded
(token, occurrence) elements ≡ weighted Jaccard over token counts. We
pin (a) the element hashing against a scalar replay, (b) the full
pipeline against a brute-force weighted-Jaccard oracle on planted
reordered / edited / decoy docs, and (c) the contract boundaries
(pure reorder ⇒ J_w = 1 pair; exact-text copies collapse, never pair).
"""

import itertools
import random
from collections import Counter

import pyarrow as pa
import pytest

from raydedup.config import DedupConfig
from raydedup.stages.wjaccard import (
    _bag_signature_batch,
    bag_near_dup_pairs,
    expanded_elements_ref,
)
from raydedup.textnorm import simple_tokenize

CFG = DedupConfig().with_overrides(stemming=False, remove_stopwords=False)


def _jw(a: str, b: str) -> float:
    ca, cb = Counter(simple_tokenize(a)), Counter(simple_tokenize(b))
    inter = sum(min(ca[t], cb[t]) for t in ca.keys() & cb.keys())
    union = sum(ca.values()) + sum(cb.values()) - inter
    return inter / union if union else 0.0


def _run(rows, cfg=CFG):
    import ray.data

    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    got = set()
    for b in bag_near_dup_pairs(ds, cfg).iter_batches(
            batch_format="pyarrow"):
        got |= set(zip(b["a_key"].to_pylist(), b["b_key"].to_pylist(),
                       [round(j, 9) for j in b["jaccard"].to_pylist()]))
    return got


def _brute(rows):
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], []).append(str(r["doc_id"]))
    reps = [(min(ks), t) for t, ks in by_text.items()]
    out = set()
    for (ka, ta), (kb, tb) in itertools.combinations(reps, 2):
        j = _jw(ta, tb)
        if j >= 0.8:
            a, b = sorted([ka, kb])
            out.add((a, b, round(j, 9)))
    return out


def test_element_hash_batch_matches_scalar_ref():
    texts = ["the cat the cat sat", "", "a a a b", "Cat THE the cat sat",
             "x" * 5, "1 2 3 1 2 1"]
    tbl = pa.table({
        "doc_id": list(range(len(texts))),
        "row_key": [str(i) for i in range(len(texts))],
        "text": texts,
    })
    out = _bag_signature_batch(tbl, CFG, "text")
    for i, t in enumerate(texts):
        exp = sorted(set(expanded_elements_ref(simple_tokenize(t))))
        assert out["shingle_hashes"][i].as_py() == exp


def test_pipeline_matches_brute_weighted_jaccard(ray_session):
    rng = random.Random(11)
    words = [f"w{i}" for i in range(50)]
    rows = []
    for fam in range(8):
        base = [rng.choice(words) for _ in range(60)]
        rows.append({"doc_id": fam * 10, "text": " ".join(base)})
        sh = base[:]
        rng.shuffle(sh)
        rows.append({"doc_id": fam * 10 + 1, "text": " ".join(sh)})
        ed = base[:]
        ed[rng.randrange(60)] = rng.choice(words)
        rows.append({"doc_id": fam * 10 + 2, "text": " ".join(ed)})
    for i in range(30):
        rows.append({"doc_id": 1000 + i,
                     "text": " ".join(rng.choice(words) for _ in range(40))})
    brute = _brute(rows)
    got = _run(rows)
    assert len(brute) >= 16  # every planted reorder + edit pair survives
    assert got == brute


def test_pipeline_matches_brute_under_oph_kernel(ray_session):
    rng = random.Random(12)
    words = [f"t{i}" for i in range(40)]
    rows = []
    for fam in range(6):
        base = [rng.choice(words) for _ in range(50)]
        sh = base[:]
        rng.shuffle(sh)
        rows.append({"doc_id": fam * 2, "text": " ".join(base)})
        rows.append({"doc_id": fam * 2 + 1, "text": " ".join(sh)})
    got = _run(rows, CFG.with_overrides(minhash_kernel="oph"))
    assert got == _brute(rows)


def test_pure_reorder_scores_one_and_exact_copies_collapse(ray_session):
    rows = [
        {"doc_id": 1, "text": "alpha beta gamma delta alpha"},
        {"doc_id": 2, "text": "delta alpha alpha beta gamma"},  # reorder
        {"doc_id": 3, "text": "alpha beta gamma delta alpha"},  # exact copy
        {"doc_id": 4, "text": "zz yy xx ww vv"},
    ]
    got = _run(rows)
    # exact copy of doc 1 collapses into rep '1'; the reorder pairs with
    # the rep at exactly J_w = 1.0; no pair involves key '3'
    assert got == {("1", "2", 1.0)}


def test_count_sensitivity_distinguishes_multiplicity(ray_session):
    # same SUPPORT set, very different counts → weighted J low, no pair
    rows = [
        {"doc_id": 1, "text": " ".join(["a"] * 30 + ["b"])},
        {"doc_id": 2, "text": " ".join(["b"] * 30 + ["a"])},
    ]
    assert _run(rows) == set()
    assert _jw(rows[0]["text"], rows[1]["text"]) < 0.1


def test_empty_and_null_texts_never_pair(ray_session):
    rows = [{"doc_id": 1, "text": ""}, {"doc_id": 2, "text": None},
            {"doc_id": 3, "text": "   "}, {"doc_id": 4, "text": "a b c"}]
    assert _run(rows) == set()


class TestBagContainment:
    """bag_element_sets + set_containment_self_join = exact weighted
    (multiset) containment."""

    def _run(self, rows, t=0.9, min_inner=1):
        import ray.data

        from raydedup.stages.setjoin import set_containment_self_join
        from raydedup.stages.wjaccard import bag_element_sets

        ds = ray.data.from_arrow(pa.Table.from_pylist(
            [{"doc_id": str(r["doc_id"]), "text": r["text"]}
             for r in rows]))
        sets = bag_element_sets(ds, CFG)
        out = set()
        for r in set_containment_self_join(
                ds, t, CFG, min_inner=min_inner,
                sets_ds=sets).take_all():
            out.add((r["inner_id"], r["outer_id"], r["common"],
                     r["n_inner"], r["n_outer"],
                     round(r["containment"], 9)))
        return out

    def _brute(self, rows, t, min_inner):
        out = set()
        cs = {str(r["doc_id"]): Counter(simple_tokenize(r["text"] or ""))
              for r in rows}
        for a, ca in cs.items():
            na = sum(ca.values())
            if na < min_inner or na == 0:
                continue
            for b, cb in cs.items():
                if a == b:
                    continue
                m = sum(min(ca[x], cb[x]) for x in ca)
                if m / na >= t:
                    out.add((a, b, m, na, sum(cb.values()),
                             round(m / na, 9)))
        return out

    def test_multiplicity_blocks_containment(self, ray_session):
        # support-set containment holds, multiset containment must NOT:
        # 30 'a's are not contained in a doc with one 'a'
        rows = [{"doc_id": 1, "text": " ".join(["a"] * 30)},
                {"doc_id": 2, "text": "a b c d e f g h i j"}]
        got = self._run(rows, t=0.9, min_inner=1)
        assert not any(a == "1" for a, *_ in got)

    def test_matches_brute(self, ray_session):
        import random

        rng = random.Random(51)
        words = [f"w{i}" for i in range(40)]
        rows = []
        for i in range(15):
            rows.append({"doc_id": i,
                         "text": " ".join(rng.choice(words)
                                          for _ in range(25))})
        # planted: doc 100's bag verbatim inside doc 101 plus extra
        inner = " ".join(rng.choice(words) for _ in range(12))
        rows.append({"doc_id": 100, "text": inner})
        rows.append({"doc_id": 101,
                     "text": inner + " xqz yqz zqz " + inner})
        got = self._run(rows, t=0.9, min_inner=5)
        exp = self._brute(rows, 0.9, 5)
        assert ("100", "101") in {(a, b) for a, b, *_ in exp}
        assert got == exp


class TestICWS:
    def test_estimator_unbiased_and_invariant(self):
        import numpy as np

        from raydedup.functions.icws import icws_estimate, icws_samples

        rng = np.random.default_rng(5)
        toks = rng.integers(1, 2 ** 63, size=40, dtype=np.uint64)
        wa = rng.integers(1, 50, size=40).astype(np.int64)
        wb = wa.copy()
        wb[:10] = rng.integers(1, 50, size=10)
        jw = np.minimum(wa, wb).sum() / np.maximum(wa, wb).sum()
        K = 4096
        offs = np.array([0, 40], dtype=np.int64)
        sa = icws_samples(toks, wa, offs, K)[0]
        sb = icws_samples(toks, wb, offs, K)[0]
        est = icws_estimate(sa, sb)
        sd = float(np.sqrt(jw * (1 - jw) / K))
        assert abs(est - jw) < 4 * sd
        # identical bags collide on every sample; disjoint on none
        assert icws_estimate(sa, icws_samples(toks, wa, offs, K)[0]) == 1.0
        toks2 = rng.integers(1, 2 ** 63, size=40, dtype=np.uint64)
        assert icws_estimate(sa, icws_samples(toks2, wa, offs, K)[0]) < 0.01
        # J_w(w, 7w) = 1/7 — the count-sensitivity a set sketch loses
        est7 = icws_estimate(sa, icws_samples(toks, wa * 7, offs, K)[0])
        assert abs(est7 - 1 / 7) < 4 * np.sqrt((1 / 7) * (6 / 7) / K)

    def test_batching_invariance_and_empty_docs(self):
        import numpy as np

        from raydedup.functions.icws import icws_samples

        rng = np.random.default_rng(11)
        toks_a = rng.integers(1, 2 ** 63, size=17, dtype=np.uint64)
        toks_b = rng.integers(1, 2 ** 63, size=9, dtype=np.uint64)
        wa = rng.integers(1, 30, size=17).astype(np.int64)
        wb = rng.integers(1, 30, size=9).astype(np.int64)
        # batch = [doc_a, EMPTY, doc_b]; must equal per-doc calls, and
        # the empty doc must collide only with other empties
        both = icws_samples(np.concatenate([toks_a, toks_b]),
                            np.concatenate([wa, wb]),
                            np.array([0, 17, 17, 26], dtype=np.int64), 64)
        one_a = icws_samples(toks_a, wa, np.array([0, 17]), 64)[0]
        one_b = icws_samples(toks_b, wb, np.array([0, 9]), 64)[0]
        empty = icws_samples(np.empty(0, np.uint64), np.empty(0, np.int64),
                             np.array([0, 0]), 64)[0]
        assert (both[0] == one_a).all()
        assert (both[1] == empty).all()
        assert (both[2] == one_b).all()
        assert not (empty == one_a).any()

    def test_icws_pairs_equal_expand_pairs(self, ray_session):
        import pyarrow as pa

        import ray.data
        from raydedup.config import DEFAULT_CONFIG
        from raydedup.stages.wjaccard import bag_near_dup_pairs

        # reordered + count-doubled + edited copies: the planted bag
        # structure; both kernels must emit the identical EXACT pair set
        base = ("alpha beta beta gamma delta delta delta epsilon "
                "zeta eta theta iota kappa " * 3)
        words = base.split()
        rows = []
        for i in range(30):
            rows.append((3 * i, " ".join(words)))
            rows.append((3 * i + 1, " ".join(reversed(words))))
            rows.append((3 * i + 2,
                         " ".join(words[:-2] + [f"unique{i}", f"only{i}"])))
            words = words[1:] + [f"w{i}"]
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }))
        cfg = DEFAULT_CONFIG.with_overrides(jaccard_dup_threshold=0.8)
        a = bag_near_dup_pairs(ds, cfg, key_cols=["doc_id"]).take_all()
        b = bag_near_dup_pairs(ds, cfg, key_cols=["doc_id"],
                               bag_kernel="icws").take_all()
        ka = sorted((r["a_key"], r["b_key"], round(r["jaccard"], 9))
                    for r in a)
        kb = sorted((r["a_key"], r["b_key"], round(r["jaccard"], 9))
                    for r in b)
        assert ka == kb
        assert ka  # the planted reorders produced pairs


def test_icws_weighted_verify_paths_agree(ray_session):
    """The weighted Σmin/Σmax verify exists on BOTH routes — the driver
    ref-shuffle's _batch_weighted store kernel (the auto-switch default
    at this size) and the co-partitioned BucketVerify weighted tiled
    kernel — and they must emit the identical exact pair set for the
    same (distinct hash, count) signature table."""
    import pyarrow as pa

    import ray.data
    from raydedup.config import DEFAULT_CONFIG
    from raydedup.stages.exact import add_row_key, exact_dedup
    from raydedup.stages.lsh import lsh_verified_pairs
    from raydedup.stages.wjaccard import _bag_signature_batch

    base = ("red green green blue blue blue cyan magenta yellow "
            "black white gray pink " * 4)
    words = base.split()
    rows = []
    for i in range(25):
        rows.append((2 * i, " ".join(words)))
        rows.append((2 * i + 1, " ".join(reversed(words[:-1]))))
        words = words[2:] + [f"v{i}", f"u{i}"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))
    cfg = DEFAULT_CONFIG.with_overrides(jaccard_dup_threshold=0.7)
    keyed = add_row_key(ds.select_columns(["doc_id", "text"]), ["doc_id"])
    sigs = keyed.map_batches(
        lambda b: _bag_signature_batch(b, cfg, "text", bag_kernel="icws"),
        batch_format="pyarrow")
    reps = exact_dedup(sigs).filter(expr="is_rep").select_columns(
        ["row_key", "band_hashes", "shingle_hashes", "n_shingles",
         "shingle_weights"]).materialize()
    out = {}
    for name, co in (("driver", False), ("copart", True)):
        pairs = lsh_verified_pairs(reps, cfg, copartition_verify=co)
        out[name] = sorted((r["a_key"], r["b_key"], round(r["jaccard"], 9))
                           for r in pairs.take_all())
    assert out["driver"] == out["copart"]
    assert out["driver"]  # the planted reorders produced pairs
