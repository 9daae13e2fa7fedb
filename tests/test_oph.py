"""One-permutation-hashing signature kernel (functions/minhash.py OPH
section; config.minhash_kernel = "oph").

The OPH sketch must (a) agree bit-for-bit with the scalar reference
replay, (b) behave as a minwise Jaccard estimator after densification,
and (c) plug into the LSH candidate→exact-verify pipeline producing the
same verified pair set as the k-perm kernel on planted near-dups (both
kernels feed the identical exact verification, so precision is exact by
construction; this pins candidate RECALL).
"""

import random

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DedupConfig
from raydedup.functions.minhash import (
    _EMPTY,
    oph_signature_ref,
    oph_signatures_from_flat,
)


def _flat(docs):
    flat = np.array([h for d in docs for h in d], dtype=np.uint64)
    offs = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=offs[1:])
    return flat, offs


def test_oph_batch_matches_scalar_reference_fuzz():
    rng = random.Random(99)
    for _ in range(100):
        k = rng.choice([4, 8, 16, 64])
        docs = [
            [rng.randrange(0, 1 << 64) for _ in range(rng.randrange(0, 50))]
            for _ in range(rng.randrange(0, 7))
        ]
        flat, offs = _flat(docs)
        got = oph_signatures_from_flat(flat, offs, k)
        for i, d in enumerate(docs):
            assert got[i].tolist() == oph_signature_ref(d, k)


def test_oph_empty_doc_gets_sentinel_row():
    got = oph_signatures_from_flat(*_flat([[], [1, 2, 3], []]), 8)
    assert (got[0] == _EMPTY).all() and (got[2] == _EMPTY).all()
    assert not (got[1] == _EMPTY).all()


def test_oph_densification_fills_every_bin():
    # one shingle → one filled bin, k-1 borrowed; all bins must be
    # non-sentinel and deterministic across calls
    a = oph_signatures_from_flat(*_flat([[42]]), 16)
    b = oph_signatures_from_flat(*_flat([[42]]), 16)
    assert (a == b).all()
    assert not (a == _EMPTY).any()


def test_oph_identical_sets_identical_signatures():
    d = [random.Random(3).randrange(0, 1 << 64) for _ in range(30)]
    got = oph_signatures_from_flat(*_flat([d, list(reversed(d)), d * 2]), 64)
    assert (got[0] == got[1]).all() and (got[0] == got[2]).all()


def test_oph_jaccard_estimator_accuracy():
    # two sets with exact overlap j: expected match fraction ≈ j.
    rng = random.Random(17)
    k = 64
    pool = [rng.randrange(0, 1 << 64) for _ in range(3000)]
    for n_common, n_only in [(900, 100), (500, 500), (100, 900)]:
        common = pool[:n_common]
        a = common + pool[n_common: n_common + n_only]
        b = common + pool[n_common + n_only: n_common + 2 * n_only]
        j = n_common / (n_common + 2 * n_only)
        sigs = oph_signatures_from_flat(*_flat([a, b]), k)
        est = float((sigs[0] == sigs[1]).mean())
        assert abs(est - j) < 0.18, (j, est)


def test_oph_lsh_pipeline_matches_kperm_on_planted_dups(ray_session):
    import ray.data

    from raydedup.pipelines.neardup import near_dup_pairs, signatures_with_rep

    rng = random.Random(5)
    words = [f"tok{i}" for i in range(400)]
    rows = []
    for fam in range(12):
        base = " ".join(rng.choice(words) for _ in range(80))
        rows.append({"doc_id": fam * 10, "text": base})
        toks = base.split()
        # ~95% shingle overlap copy
        toks[rng.randrange(len(toks))] = rng.choice(words)
        rows.append({"doc_id": fam * 10 + 1, "text": " ".join(toks)})
    for i in range(40):
        rows.append({"doc_id": 1000 + i,
                     "text": " ".join(rng.choice(words) for _ in range(60))})

    def pairs(cfg):
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        assigned = signatures_with_rep(ds, cfg, key_cols=["doc_id"])
        out = set()
        for b in near_dup_pairs(assigned.materialize(), cfg).iter_batches(
                batch_format="pyarrow"):
            out |= set(zip(b["a_key"].to_pylist(), b["b_key"].to_pylist(),
                           [round(j, 9) for j in b["jaccard"].to_pylist()]))
        return out

    base_cfg = DedupConfig().with_overrides(
        stemming=False, remove_stopwords=False)
    kp = pairs(base_cfg)
    op = pairs(base_cfg.with_overrides(minhash_kernel="oph"))
    assert len(kp) >= 12  # every planted family found by the default
    assert op == kp


def test_bad_kernel_name_rejected():
    with pytest.raises(ValueError):
        DedupConfig(minhash_kernel="nope")
