"""Two-corpus (R-S) exact set-similarity join (setjoin.set_similarity_join).

Pinned against a brute-force cross-pair shingle-Jaccard oracle: cross
pairs only (never within-corpus), exact recall on planted cross-corpus
near-dups, size asymmetry allowed on the index side, empty sides.
"""

import itertools
import random

import pyarrow as pa
import pytest

from raydedup.config import DedupConfig
from raydedup.stages.setjoin import set_similarity_join
from raydedup.textnorm import simple_tokenize, word_shingles

CFG = DedupConfig().with_overrides(stemming=False, remove_stopwords=False)


def _shset(text):
    toks = simple_tokenize(text or "")
    return frozenset(word_shingles(toks, 3)) if toks else frozenset()


def _brute(rows_a, rows_b, t):
    out = set()
    for ra, rb in itertools.product(rows_a, rows_b):
        sa, sb = _shset(ra["text"]), _shset(rb["text"])
        if not sa or not sb:
            continue
        c = len(sa & sb)
        u = len(sa) + len(sb) - c
        if u and c / u >= t:
            out.add((str(ra["doc_id"]), str(rb["doc_id"]),
                     round(c / u, 9)))
    return out


def _run(rows_a, rows_b, t):
    import ray.data

    def mk(rows):
        return ray.data.from_arrow(pa.Table.from_pylist(
            [{"doc_id": str(r["doc_id"]), "text": r["text"]}
             for r in rows]))

    got = set()
    ds = set_similarity_join(mk(rows_a), mk(rows_b), t, CFG)
    for b in ds.iter_batches(batch_format="pyarrow"):
        got |= set(zip(b["a_id"].to_pylist(), b["b_id"].to_pylist(),
                       [round(j, 9) for j in b["jaccard"].to_pylist()]))
    return got


def _corpora(seed=21):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(70)]
    rows_a, rows_b = [], []
    for fam in range(6):
        base = [rng.choice(words) for _ in range(50)]
        rows_a.append({"doc_id": f"a{fam}", "text": " ".join(base)})
        ed = base[:]
        ed[rng.randrange(50)] = rng.choice(words)
        rows_b.append({"doc_id": f"b{fam}", "text": " ".join(ed)})
        # a WITHIN-corpus near-dup on the b side: must never be emitted
        rows_b.append({"doc_id": f"c{fam}", "text": " ".join(ed)})
    for i in range(20):
        rows_b.append({"doc_id": f"n{i}",
                       "text": " ".join(rng.choice(words)
                                        for _ in range(40))})
    return rows_a, rows_b


def test_matches_brute_cross_oracle(ray_session):
    rows_a, rows_b = _corpora()
    brute = _brute(rows_a, rows_b, 0.5)
    got = _run(rows_a, rows_b, 0.5)
    assert len(brute) >= 12  # planted edit + its exact twin, per family
    assert got == brute


def test_within_corpus_pairs_never_emitted(ray_session):
    rows_a, rows_b = _corpora(seed=22)
    got = _run(rows_a, rows_b, 0.5)
    a_ids = {str(r["doc_id"]) for r in rows_a}
    b_ids = {str(r["doc_id"]) for r in rows_b}
    for a, b, _ in got:
        assert a in a_ids and b in b_ids


def test_empty_sides(ray_session):
    rows_a, rows_b = _corpora(seed=23)
    assert _run([], rows_b, 0.5) == set()
    assert _run(rows_a, [{"doc_id": "x", "text": ""}], 0.5) == set()


class TestIdfWeightedRescore:
    """idf_weighted_rescore: rarity-aware pair re-scoring."""

    def _run(self, pairs, docs):
        import ray.data

        from raydedup.pipelines.neardup import signatures_with_rep
        from raydedup.stages.setjoin import idf_weighted_rescore

        ds = ray.data.from_arrow(pa.Table.from_pylist(
            [{"doc_id": k, "text": t} for k, t in docs.items()]))
        assigned = signatures_with_rep(ds, CFG, key_cols=["doc_id"])
        reps = assigned.filter(expr="is_rep").select_columns(
            ["row_key", "shingle_hashes"])
        p = ray.data.from_arrow(pa.table({
            "a_key": pa.array([a for a, _ in pairs], pa.string()),
            "b_key": pa.array([b for _, b in pairs], pa.string()),
        }))
        out = {}
        for r in idf_weighted_rescore(p, reps).take_all():
            out[(r["a_key"], r["b_key"])] = r["idf_jaccard"]
        return out

    def _brute(self, pairs, docs):
        import math

        sets = {k: _shset(t) for k, t in docs.items()}
        n = len(docs)  # all texts distinct in these fixtures
        df = {}
        for s in sets.values():
            for sh in s:
                df[sh] = df.get(sh, 0) + 1
        idf = {sh: math.log(n / d) for sh, d in df.items()}
        out = {}
        for a, b in pairs:
            inter = sum(idf[sh] for sh in sets[a] & sets[b])
            union = sum(idf[sh] for sh in sets[a] | sets[b])
            out[(a, b)] = inter / union if union > 0 else 0.0
        return out

    def test_matches_brute_idf_sums(self, ray_session):
        import random

        rng = random.Random(41)
        words = [f"w{i}" for i in range(60)]
        docs = {}
        for i in range(20):
            docs[str(i)] = " ".join(rng.choice(words) for _ in range(30))
        pairs = [("0", "1"), ("2", "7"), ("10", "19")]
        got = self._run(pairs, docs)
        exp = self._brute(pairs, docs)
        assert set(got) == set(exp)
        for k in exp:
            assert got[k] == pytest.approx(exp[k], abs=1e-9)

    def test_boilerplate_glue_scores_below_distinctive(self, ray_session):
        # pairs sharing only the CORPUS-WIDE boilerplate prefix score far
        # below pairs sharing a distinctive (rare) body
        boiler = "standard header boilerplate line " * 3
        docs = {"b1": boiler + "unique alpha beta gamma delta content one",
                "b2": boiler + "other zeta eta theta iota content two",
                "d1": "rare distinctive payload epsilon kappa lambda mu",
                "d2": "rare distinctive payload epsilon kappa lambda nu"}
        got = self._run([("b1", "b2"), ("d1", "d2")], docs)
        assert got[("d1", "d2")] > got[("b1", "b2")]

    def test_empty_pairs(self, ray_session):
        assert self._run([], {"1": "x y z"}) == {}
