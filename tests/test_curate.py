"""curate_docs (pipelines/curate.py) composition invariants vs the
already-tested building blocks: survivors = tiered-semantic keeps of
the rule-filtered corpus; scores = unigram_logppl of that corpus."""

import numpy as np
import pytest

import ray.data

from raydedup.config import DEFAULT_CONFIG
from raydedup.pipelines.curate import curate_docs, doc_token_stats
from raydedup.pipelines.tiered import tiered_dedup_semantic
from raydedup.stages.textstats import unigram_logppl

CFG = DEFAULT_CONFIG.with_overrides(stemming=False, remove_stopwords=False)
VOCAB = [f"w{i}" for i in range(40)]


def _corpus(rng, n=50):
    rows = []
    for i in range(n):
        k = int(rng.integers(3, 60))
        words = [VOCAB[int(rng.integers(0, len(VOCAB)))] for _ in range(k)]
        if i % 9 == 0:  # repetition-rule violators
            words = [words[0]] * max(k // 2, 3) + words
        rows.append({"doc_id": i, "text": " ".join(words)})
    for j, i in enumerate(range(0, n, 7)):  # exact dups
        rows.append({"doc_id": n + j, "text": rows[i]["text"]})
    embs = []
    for r in rows:
        v = [0.0] * 8
        v[r["doc_id"] % 5] = 1.0
        embs.append({"vec_id": r["doc_id"], "embedding": v})
    return rows, embs


def test_curate_composes_its_stages(ray_session):
    rng = np.random.default_rng(43)
    rows, embs = _corpus(rng)
    docs = ray.data.from_items(rows)
    emb = ray.data.from_items(embs)
    out = {r["doc_id"]: r for r in curate_docs(
        docs, emb, len_lo=10, len_hi=50, rep_mult=4,
        threshold=0.5, sem_threshold=0.8, cfg=CFG).take_all()}

    stats = {r["doc_id"]: r for r in doc_token_stats(docs).take_all()}
    passing = {i for i, s in stats.items()
               if 10 <= s["n_words"] <= 50
               and s["max_tf"] * 4 <= s["n_words"]}
    assert passing, "fixture must exercise the rules"
    assert len(passing) < len(rows), "rules must reject something"

    qrows = [r for r in rows if r["doc_id"] in passing]
    tiers = {r["doc_id"]: r["tier"] for r in tiered_dedup_semantic(
        ray.data.from_items(qrows), emb, 0.5, 0.8, CFG).take_all()}
    keeps = {i for i, t in tiers.items() if t == "keep"}
    assert set(out) == keeps
    assert keeps < passing, "dedup must remove something"

    ppl = {r["doc_id"]: (r["n_tokens"], r["logppl"])
           for r in unigram_logppl(ray.data.from_items(qrows)).take_all()}
    for i, r in out.items():
        assert r["n_words"] == stats[i]["n_words"] == ppl[i][0]
        assert r["max_tf"] == stats[i]["max_tf"]
        assert r["logppl"] == pytest.approx(ppl[i][1], abs=1e-9)


def test_curate_empty_when_rules_reject_all(ray_session):
    rows = [{"doc_id": i, "text": "a b c"} for i in range(5)]
    emb = ray.data.from_items(
        [{"vec_id": i, "embedding": [1.0, 0.0]} for i in range(5)])
    out = curate_docs(ray.data.from_items(rows), emb,
                      len_lo=100, len_hi=200, cfg=CFG)
    assert out.count() == 0
    assert set(out.schema().names) == {
        "doc_id", "n_words", "max_tf", "logppl"}
