"""Tests for stages/incremental.py — persisted-index incremental dedup."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from raydedup.config import DEFAULT_CONFIG  # noqa: F401 (job-config test)
from raydedup.stages.incremental import (
    _blob_views,
    _lists_to_blob,
    build_dedup_index,
    dedup_against_index,
)

CFG = DEFAULT_CONFIG.with_overrides(stemming=False, remove_stopwords=False)

OLD = pa.table({
    "doc_id": [1, 2, 3, 4, 5],
    "text": [
        "the quick brown fox jumps over the lazy dog near the river today",
        "the quick brown fox jumps over the lazy dog near the river today",
        "completely different content about machine learning and arrow",
        "a short one",
        "",
    ],
})
NEW = pa.table({
    "doc_id": [10, 11, 12, 13],
    "text": [
        # exact dup of old 1/2 -> rep "1"
        "the quick brown fox jumps over the lazy dog near the river today",
        # near dup of old 1 (one word changed)
        "the quick brown fox jumps over the lazy dog near the river tonight",
        # novel
        "totally novel text that matches nothing in the stored index here",
        # empty: exact match to old 5
        "",
    ],
})


def _result(index_dir, new=NEW, cfg=CFG):
    res = dedup_against_index(
        ray.data.from_arrow(new), str(index_dir), cfg, key_cols=["doc_id"])
    rows = {r["key"]: r for r in res.to_pandas().to_dict("records")}
    return rows


def test_statuses_and_matches(tmp_path):
    man = build_dedup_index(
        ray.data.from_arrow(OLD), str(tmp_path), CFG, key_cols=["doc_id"])
    # 5 old rows, one exact-dup pair collapses -> 4 stored reps
    assert man["n_reps"] == 4
    rows = _result(tmp_path)
    assert rows["10"]["status"] == "exact"
    assert rows["10"]["match_key"] == "1"  # min key of the sha group
    assert rows["11"]["status"] == "near"
    assert rows["11"]["match_key"] == "1"
    assert 0.8 <= rows["11"]["jaccard"] <= 1.0
    assert rows["12"]["status"] == "new"
    assert rows["12"]["match_key"] is None
    assert rows["13"]["status"] == "exact"
    assert rows["13"]["match_key"] == "5"
    # exact rows carry no jaccard
    assert rows["10"]["jaccard"] is None or np.isnan(rows["10"]["jaccard"])


def test_near_matches_brute_force(tmp_path):
    """Every new-vs-rep pair at jaccard >= thr (brute force over the
    fixture) must surface: exact-status keys aside, near match = the
    brute-force argmax."""
    from raydedup.textnorm import full_tokenize

    def shingles(t):
        toks = full_tokenize(t, stemming=False, remove_stopwords=False)
        if not toks:
            return set()
        if len(toks) <= 3:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    build_dedup_index(
        ray.data.from_arrow(OLD), str(tmp_path), CFG, key_cols=["doc_id"])
    reps = {}  # min key per old text
    for k, t in zip(OLD["doc_id"].to_pylist(), OLD["text"].to_pylist()):
        reps.setdefault(t, str(k))
    old_texts = {v: k for k, v in reps.items()}
    rows = _result(tmp_path)
    for k, t in zip(NEW["doc_id"].to_pylist(), NEW["text"].to_pylist()):
        if rows[str(k)]["status"] == "exact":
            continue
        ns = shingles(t)
        best = None
        for okey, ot in old_texts.items():
            os_ = shingles(ot)
            if not ns or not os_:
                continue
            j = len(ns & os_) / len(ns | os_)
            if j >= CFG.jaccard_dup_threshold:
                cand = (-j, okey)
                best = min(best, cand) if best else cand
        row = rows[str(k)]
        if best is None:
            assert row["status"] == "new"
        else:
            assert row["status"] == "near"
            assert row["match_key"] == best[1]
            assert row["jaccard"] == pytest.approx(-best[0], abs=1e-12)


def test_compose_backends_identical(tmp_path):
    """compose_max=0 forces the distributed join composition; output
    must equal the broadcast-paint default row for row."""
    build_dedup_index(
        ray.data.from_arrow(OLD), str(tmp_path), CFG, key_cols=["doc_id"])
    a = dedup_against_index(
        ray.data.from_arrow(NEW), str(tmp_path), CFG, key_cols=["doc_id"])
    b = dedup_against_index(
        ray.data.from_arrow(NEW), str(tmp_path), CFG, key_cols=["doc_id"],
        compose_max=0)
    pa_ = a.to_pandas().sort_values("key").reset_index(drop=True)
    pb_ = b.to_pandas().sort_values("key").reset_index(drop=True)
    assert pa_.equals(pb_)


def test_blob_roundtrip():
    rng = np.random.RandomState(7)
    lists = [sorted(set(rng.randint(0, 2**63, size=n).tolist()))
             for n in (0, 1, 5, 100, 3)]
    arr = pa.array(lists, type=pa.list_(pa.uint64()))
    blob = _lists_to_blob(arr)
    flat, offs = _blob_views(pa.chunked_array([blob]))
    for i, l in enumerate(lists):
        got = flat[offs[i]: offs[i + 1]].tolist()
        assert got == l


def test_config_mismatch_raises(tmp_path):
    build_dedup_index(
        ray.data.from_arrow(OLD), str(tmp_path), CFG, key_cols=["doc_id"])
    other = CFG.with_overrides(lsh_bands=8, lsh_rows=8)
    with pytest.raises(ValueError, match="different signature config"):
        dedup_against_index(
            ray.data.from_arrow(NEW), str(tmp_path), other,
            key_cols=["doc_id"])


def test_empty_new_shard(tmp_path):
    build_dedup_index(
        ray.data.from_arrow(OLD), str(tmp_path), CFG, key_cols=["doc_id"])
    res = dedup_against_index(
        ray.data.from_arrow(NEW.slice(0, 0)), str(tmp_path), CFG,
        key_cols=["doc_id"])
    assert res.count() == 0
    assert res.schema().names == ["key", "status", "match_key", "jaccard"]


_LONG = ("w%02d " * 30).strip()
_LONG_A = _LONG % tuple(range(30))                     # w00 .. w29
_LONG_B = (_LONG % tuple(range(30))).replace("w29", "zz")  # near: j≈0.81


def test_extend_and_rolling(tmp_path):
    from raydedup.stages.incremental import extend_dedup_index

    old = pa.table({"doc_id": [1], "text": [_LONG_A]})
    s1 = pa.table({"doc_id": [10, 11, 12], "text": [
        _LONG_A,                                       # exact -> not indexed
        "fresh shard one content nothing like anything stored before",
        "fresh shard one content nothing like anything stored before",
    ]})
    s2 = pa.table({"doc_id": [20, 21], "text": [
        "fresh shard one content nothing like anything stored before",
        _LONG_B,
    ]})
    m0 = build_dedup_index(
        ray.data.from_arrow(old), str(tmp_path), CFG, key_cols=["doc_id"])
    assert m0["n_reps"] == 1 and m0["generations"] == ["sigs"]
    r1 = dedup_against_index(
        ray.data.from_arrow(s1), str(tmp_path), CFG,
        key_cols=["doc_id"]).materialize()
    m1 = extend_dedup_index(
        ray.data.from_arrow(s1), str(tmp_path), r1, CFG,
        key_cols=["doc_id"])
    # 10 was exact (excluded); 11/12 collapse to one within-shard rep
    assert m1["n_reps"] == 2
    assert m1["generations"] == ["sigs", "sigs-001"]
    rows = _result(tmp_path, new=s2)
    # 20 exact-matches shard 1's stored rep (min key 11), caught
    # without ever re-reading shard 1's text
    assert rows["20"]["status"] == "exact"
    assert rows["20"]["match_key"] == "11"
    # 21 near-matches the original old doc across generations
    assert rows["21"]["status"] == "near"
    assert rows["21"]["match_key"] == "1"
    assert rows["21"]["jaccard"] >= 0.8


def test_extend_shard_idempotent(tmp_path):
    from raydedup.stages.incremental import extend_dedup_index

    build_dedup_index(
        ray.data.from_arrow(OLD), str(tmp_path), CFG, key_cols=["doc_id"])
    s1 = pa.table({"doc_id": [30], "text": ["a fresh never seen doc"]})
    r1 = dedup_against_index(
        ray.data.from_arrow(s1), str(tmp_path), CFG,
        key_cols=["doc_id"]).materialize()
    m1 = extend_dedup_index(
        ray.data.from_arrow(s1), str(tmp_path), r1, CFG,
        key_cols=["doc_id"], shard_id="s1")
    m2 = extend_dedup_index(
        ray.data.from_arrow(s1), str(tmp_path), r1, CFG,
        key_cols=["doc_id"], shard_id="s1")
    assert m2 == m1  # replayed shard: manifest unchanged, no new gen
    assert m1["shards"] == ["s1"]
    assert m1["n_reps"] == 5  # 4 old reps + 1


def test_ingest_shards_job(tmp_path):
    """End-to-end resumable ingestion loop (in-process main(): Ray is
    the session fixture's)."""
    import importlib
    import json as _json

    import pyarrow.parquet as pq_

    ingest = importlib.import_module("jobs.ingest_shards")
    shards = tmp_path / "shards"
    shards.mkdir()
    pq_.write_table(
        pa.table({"doc_id": [1, 2],
                  "text": [_LONG_A, _LONG_A]}),
        str(shards / "s000.parquet"))
    pq_.write_table(
        pa.table({"doc_id": [10, 11],
                  "text": [_LONG_A, "second shard novel content"]}),
        str(shards / "s001.parquet"))
    args = ["--shards", str(shards), "--index", str(tmp_path / "idx"),
            "--labels-out", str(tmp_path / "labels")]
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert ingest.main(args) == 0
    c1 = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert c1["shards"]["s000"] == {"exact": 0, "near": 0, "new": 2}
    assert c1["shards"]["s001"] == {"exact": 1, "near": 0, "new": 1}
    assert c1["n_reps"] == 2 and c1["skipped"] == 0
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        assert ingest.main(args) == 0
    c2 = _json.loads(buf2.getvalue().strip().splitlines()[-1])
    assert c2["skipped"] == 2
    assert c2["shards"] == c1["shards"]
    assert c2["n_reps"] == c1["n_reps"]
    assert c2["generations"] == c1["generations"]


def test_ingest_auto_compact_policy(tmp_path):
    """Service-shaped auto-compaction (VERDICT r4 'Next #3'): across a
    12-shard rolling stream with NO hand-chosen cadence, the
    measured-state policy (compact when the non-base generations' rows
    reach the base's) must (a) fire on its own at the geometric cadence,
    (b) keep the generation count probed by any shard within the
    2 + log2(shards) bound — which is what bounds probe cost to a small
    constant factor over a single-generation index (the rows probed are
    IDENTICAL either way; only per-generation overhead varies), and
    (c) preserve idempotent replay."""
    import importlib
    import io
    import json as _json
    import math
    from contextlib import redirect_stdout

    import pyarrow.parquet as pq_

    ingest = importlib.import_module("jobs.ingest_shards")
    shards = tmp_path / "shards"
    shards.mkdir()
    n_shards = 12
    for s in range(n_shards):
        # every shard: 3 novel docs + 1 exact dup of shard 0's first doc
        texts = [f"shard {s} doc {d} " + " ".join(
            f"tok{s}x{d}x{k}" for k in range(12)) for d in range(3)]
        texts.append("shard 0 doc 0 " + " ".join(
            f"tok0x0x{k}" for k in range(12)))
        pq_.write_table(
            pa.table({"doc_id": [s * 10 + d for d in range(4)],
                      "text": texts}),
            str(shards / f"s{s:03d}.parquet"))
    args = ["--shards", str(shards), "--index", str(tmp_path / "idx"),
            "--labels-out", str(tmp_path / "labels"), "--auto-compact"]
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert ingest.main(args) == 0
    c1 = _json.loads(buf.getvalue().strip().splitlines()[-1])
    # policy fired by itself, at the geometric (not per-shard) cadence
    assert 2 <= c1["auto_compactions"] <= 6, c1["auto_compactions"]
    bound = 2 + math.ceil(math.log2(n_shards))
    assert c1["max_generations_probed"] <= bound, c1
    for ev in c1["probe_evidence"].values():
        assert ev["generations_probed"] <= bound, c1["probe_evidence"]
    # index contents unaffected by compaction: every DISTINCT novel text
    # indexed exactly once (3 per shard; shard 0's in-shard exact dup is
    # labeled 'new' as a row but collapses to its rep before storing)
    assert c1["n_reps"] == 3 * n_shards
    assert c1["shards"]["s000"]["new"] == 4
    assert all(v["exact"] >= 1 for k, v in c1["shards"].items()
               if k != "s000")
    # idempotent replay: everything skipped, nothing re-compacted
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        assert ingest.main(args) == 0
    c2 = _json.loads(buf2.getvalue().strip().splitlines()[-1])
    assert c2["skipped"] == n_shards
    assert c2["shards"] == c1["shards"]
    assert c2["n_reps"] == c1["n_reps"]
    assert c2["auto_compactions"] == 0


def test_extend_replay_clears_partial_write(tmp_path):
    """A previous extend attempt that wrote generation files but died
    before publishing the manifest must be fully replaced on replay —
    Ray's write_parquet appends, so without the clear the generation
    would double-count (or trip on a truncated orphan)."""
    import pyarrow.parquet as pq_

    from raydedup.stages.incremental import extend_dedup_index

    build_dedup_index(
        ray.data.from_arrow(OLD), str(tmp_path), CFG, key_cols=["doc_id"])
    s1 = pa.table({"doc_id": [40], "text": ["replay clears partials"]})
    r1 = dedup_against_index(
        ray.data.from_arrow(s1), str(tmp_path), CFG,
        key_cols=["doc_id"]).materialize()
    # simulate the orphaned half-write: gen dir exists with stray rows
    # (wrong schema, even) but the manifest never learned about it
    gen = tmp_path / "sigs-001"
    gen.mkdir()
    pq_.write_table(pa.table({"row_key": ["zz", "zz2"]}),
                    str(gen / "orphan.parquet"))
    m1 = extend_dedup_index(
        ray.data.from_arrow(s1), str(tmp_path), r1, CFG,
        key_cols=["doc_id"], shard_id="s1")
    assert m1["n_reps"] == 5  # 4 old reps + exactly ONE new, no orphans
    files = [f for f in (gen).iterdir() if f.suffix == ".parquet"]
    total = sum(pq_.read_metadata(str(f)).num_rows for f in files)
    assert total == 1


def test_ingest_resumes_after_crash_window(tmp_path):
    """Kill between 'labels published' and 'index extended': the next
    run must skip the probe but still replay that shard's extend."""
    import importlib
    import io
    import json as _json
    from contextlib import redirect_stdout

    import pyarrow.parquet as pq_

    ingest = importlib.import_module("jobs.ingest_shards")
    shards = tmp_path / "shards"
    shards.mkdir()
    pq_.write_table(
        pa.table({"doc_id": [1], "text": ["crash window shard one"]}),
        str(shards / "s000.parquet"))
    idx = tmp_path / "idx"
    lbl = tmp_path / "labels"
    # simulate the crash: bootstrap the index, publish s000's labels,
    # but do NOT extend (no shard id in the manifest)
    empty = pa.table({"doc_id": pa.array([], pa.string()),
                      "text": pa.array([], pa.string())})
    # the job runs DEFAULT_CONFIG — build/probe with the same config
    # (the manifest guard rejects anything else, by design)
    build_dedup_index(ray.data.from_arrow(empty), str(idx),
                      DEFAULT_CONFIG, key_cols=["doc_id"])
    labels = dedup_against_index(
        ray.data.from_arrow(pq_.read_table(str(shards / "s000.parquet"))),
        str(idx), DEFAULT_CONFIG, key_cols=["doc_id"]).materialize()
    (lbl).mkdir()
    labels.write_parquet(str(lbl / "s000"))
    # resume: probe skipped, extend replayed
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert ingest.main(["--shards", str(shards), "--index", str(idx),
                            "--labels-out", str(lbl)]) == 0
    c = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert c["skipped"] == 1
    assert c["n_reps"] == 1  # the missed extend happened on resume
    import json as _j
    man = _j.load(open(idx / "meta.json"))
    assert man["shards"] == ["s000"]


def test_empty_index_all_new(tmp_path):
    build_dedup_index(
        ray.data.from_arrow(OLD.slice(0, 0)), str(tmp_path), CFG,
        key_cols=["doc_id"])
    rows = _result(tmp_path)
    assert len(rows) == 4
    assert all(r["status"] == "new" for r in rows.values())


def test_corpus_diff_statuses():
    import pyarrow as pa
    import ray.data

    from raydedup.stages.incremental import corpus_diff

    old = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a", "b", "c", "dup"]),
    }))
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([2, 3, 4, 5], pa.int64()),
        "text": pa.array(["b", "c CHANGED", "dup", "e"]),
    }))
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new).take_all()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "unchanged", 5: "added"}


def test_compact_index(tmp_path):
    import os

    from raydedup.stages.incremental import (compact_dedup_index,
                                             extend_dedup_index)

    old = pa.table({"doc_id": [1], "text": [_LONG_A]})
    s1 = pa.table({"doc_id": [10], "text": [
        "fresh shard one content nothing like anything stored before"]})
    s2 = pa.table({"doc_id": [20], "text": [_LONG_B]})
    build_dedup_index(ray.data.from_arrow(old), str(tmp_path), CFG,
                      key_cols=["doc_id"])
    for shard in (s1, s2):
        ds = ray.data.from_arrow(shard)
        labels = dedup_against_index(ds, str(tmp_path), CFG,
                                     key_cols=["doc_id"]).materialize()
        extend_dedup_index(ds, str(tmp_path), labels, CFG,
                           key_cols=["doc_id"])
    def _norm(rows):
        import math
        return {k: {f: (None if isinstance(v, float) and math.isnan(v)
                        else v) for f, v in r.items()}
                for k, r in rows.items()}

    before = _norm(_result(tmp_path))
    # plant an orphan dir from a "crashed" extend
    orphan = tmp_path / "sigs-009"
    orphan.mkdir()
    (orphan / "junk.txt").write_text("leftover")

    m = compact_dedup_index(str(tmp_path), CFG)
    assert m["generations"] == ["sigs-003"]
    # old rep + s1's novel rep (s2 was a 'near' -> not indexed by policy)
    assert m["n_reps"] == 2
    dirs = sorted(d for d in os.listdir(tmp_path)
                  if (tmp_path / d).is_dir())
    assert dirs == ["sigs-003"]  # old gens + orphan swept
    # probe results identical post-compaction
    assert _norm(_result(tmp_path)) == before
    # idempotent replay (single generation -> no-op)
    m2 = compact_dedup_index(str(tmp_path), CFG)
    assert m2["generations"] == ["sigs-003"] and m2["n_reps"] == 2


def test_compact_refuses_non_disjoint(tmp_path):
    import pytest as _pytest

    from raydedup.stages.incremental import (_SIGS_SUBDIR,
                                             compact_dedup_index)
    import shutil as _shutil

    build_dedup_index(ray.data.from_arrow(
        pa.table({"doc_id": [1], "text": [_LONG_A]})), str(tmp_path), CFG,
        key_cols=["doc_id"])
    # forge a second generation duplicating the first's rows
    src = tmp_path / _SIGS_SUBDIR
    dst = tmp_path / "sigs-001"
    _shutil.copytree(src, dst)
    import json as _json
    meta = _json.loads((tmp_path / "meta.json").read_text())
    meta["generations"].append("sigs-001")
    (tmp_path / "meta.json").write_text(_json.dumps(meta))
    with _pytest.raises(RuntimeError, match="not text-disjoint"):
        compact_dedup_index(str(tmp_path), CFG)


def test_compact_then_extend_no_name_collision(tmp_path):
    """After compaction the surviving generation keeps its name; later
    extends must pick FREE slots, never clobber it."""
    from raydedup.stages.incremental import (compact_dedup_index,
                                             extend_dedup_index)

    build_dedup_index(ray.data.from_arrow(
        pa.table({"doc_id": [1], "text": [_LONG_A]})), str(tmp_path), CFG,
        key_cols=["doc_id"])
    texts = [f"novel shard {i} body " + " ".join(
        f"tok{i}x{j}" for j in range(12)) for i in range(5)]

    def ingest(i):
        ds = ray.data.from_arrow(pa.table(
            {"doc_id": [100 + i], "text": [texts[i]]}))
        labels = dedup_against_index(ds, str(tmp_path), CFG,
                                     key_cols=["doc_id"]).materialize()
        return extend_dedup_index(ds, str(tmp_path), labels, CFG,
                                  key_cols=["doc_id"])

    ingest(0)
    ingest(1)
    m = compact_dedup_index(str(tmp_path), CFG)
    assert m["generations"] == ["sigs-003"] and m["n_reps"] == 3
    # three more extends: slot counter would hit 'sigs-003' at the third
    for i in (2, 3, 4):
        m = ingest(i)
    assert len(m["generations"]) == 4
    assert len(set(m["generations"])) == 4
    assert m["n_reps"] == 6
    # every indexed text still probes back as exact
    probe = pa.table({"doc_id": [900], "text": [texts[0]]})
    assert _result(tmp_path, new=probe)["900"]["status"] == "exact"
    m2 = compact_dedup_index(str(tmp_path), CFG)
    assert m2["n_reps"] == 6
    assert _result(tmp_path, new=probe)["900"]["status"] == "exact"


def test_ingest_shards_job_compact_every(tmp_path):
    import importlib
    import io
    import json as _json
    from contextlib import redirect_stdout

    import pyarrow.parquet as pq_

    ingest = importlib.import_module("jobs.ingest_shards")
    shards = tmp_path / "shards"
    shards.mkdir()
    for i in range(3):
        pq_.write_table(
            pa.table({"doc_id": [100 + i],
                      "text": [f"compactable novel shard {i} " + " ".join(
                          f"w{i}q{j}" for j in range(12))]}),
            str(shards / f"s{i:03d}.parquet"))
    args = ["--shards", str(shards), "--index", str(tmp_path / "idx"),
            "--labels-out", str(tmp_path / "labels"),
            "--compact-every", "2"]
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert ingest.main(args) == 0
    c = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert c["generations"] == 1  # final compaction collapsed the index
    assert c["n_reps"] == 3
    # resubmit: everything skipped, nothing re-indexed, still compact
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        assert ingest.main(args) == 0
    c2 = _json.loads(buf2.getvalue().strip().splitlines()[-1])
    assert c2["skipped"] == 3 and c2["n_reps"] == 3
    assert c2["generations"] == 1


def test_probe_hot_bucket_route_matches_join_route(tmp_path, monkeypatch,
                                                   ray_session):
    """The hot-bucket R-S ScanCount route must label EXACTLY like the
    plain candidate-join route. Corpus: boilerplate template docs (hot
    candidate buckets, sub-threshold matches) PLUS shard docs that are
    genuine near-copies of stored docs (>= threshold) — so the hot
    groups contain both true and false candidates, and exact/near/new
    all appear."""
    import collections

    from raydedup.stages import incremental as inc
    from raydedup.stages.incremental import (build_dedup_index,
                                             dedup_against_index)

    tmpl = " ".join(f"tmplw{k}" for k in range(20))

    def boiler(i):
        return tmpl + " " + " ".join(f"n{i}x{j}" for j in range(12))

    idx_rows = [(str(i), boiler(i)) for i in range(120)]
    idx_tbl = pa.table({
        "doc_id": pa.array([r[0] for r in idx_rows]),
        "text": pa.array([r[1] for r in idx_rows]),
    })
    build_dedup_index(ray.data.from_arrow(idx_tbl), str(tmp_path / "idx"),
                      DEFAULT_CONFIG, key_cols=["doc_id"])

    shard_rows = []
    for i in range(40):
        if i % 4 == 0:      # exact copy of a stored doc
            shard_rows.append((str(1000 + i), boiler(i)))
        elif i % 4 == 1:    # near-copy: one noise word changed
            t = boiler(i).split()
            t[-1] = f"edit{i}"
            shard_rows.append((str(1000 + i), " ".join(t)))
        else:               # template + fresh noise → sub-threshold
            shard_rows.append((str(1000 + i), boiler(10000 + i)))
    shard = pa.table({
        "doc_id": pa.array([r[0] for r in shard_rows]),
        "text": pa.array([r[1] for r in shard_rows]),
    })

    def labels_with(product_threshold):
        monkeypatch.setattr(inc, "_PROBE_HOT_PRODUCT", product_threshold)
        out = dedup_against_index(
            ray.data.from_arrow(shard), str(tmp_path / "idx"),
            DEFAULT_CONFIG, key_cols=["doc_id"]).take_all()
        return sorted((r["key"], r["status"], r["match_key"],
                       None if r["jaccard"] is None
                       else round(r["jaccard"], 9)) for r in out)

    hot_route = labels_with(50)           # every shared bucket is "hot"
    join_route = labels_with(10**15)      # pure candidate-join path
    assert hot_route == join_route
    statuses = collections.Counter(s for _, s, _, _ in hot_route)
    assert statuses["exact"] == 10
    assert statuses["near"] == 10
    assert statuses["new"] == 20
