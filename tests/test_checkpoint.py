"""Checkpoint / lineage / resume semantics."""

import json
import os
import tempfile

import pyarrow as pa
import pytest

import ray.data

from raydedup.config import DEFAULT_CONFIG
from raydedup.state.checkpoint import CheckpointedRun, config_hash, shard_of_key


def _ds(n=10, offset=0):
    return ray.data.from_arrow(
        pa.table({"x": list(range(offset, offset + n))})
    )


def test_stage_checkpoint_and_skip():
    with tempfile.TemporaryDirectory() as d:
        run = CheckpointedRun(d, DEFAULT_CONFIG)
        calls = {"n": 0}

        def fn():
            calls["n"] += 1
            return _ds(10)

        out1 = run.stage("sigs", fn)
        assert out1.count() == 10
        assert calls["n"] == 1
        # resume: fn must NOT run again
        out2 = run.stage("sigs", fn)
        assert out2.count() == 10
        assert calls["n"] == 1
        m = run.manifest("sigs")
        assert m["complete"] and m["num_rows"] == 10
        assert m["config_hash"] == config_hash(DEFAULT_CONFIG)


def test_config_change_invalidates_checkpoint():
    with tempfile.TemporaryDirectory() as d:
        run = CheckpointedRun(d, DEFAULT_CONFIG)
        run.stage("s", lambda: _ds(5))
        cfg2 = DEFAULT_CONFIG.with_overrides(jaccard_dup_threshold=0.9)
        run2 = CheckpointedRun(d, cfg2)
        calls = {"n": 0}

        def fn():
            calls["n"] += 1
            return _ds(7)

        out = run2.stage("s", fn)
        assert calls["n"] == 1 and out.count() == 7


def test_sharded_resume_after_failure():
    with tempfile.TemporaryDirectory() as d:
        run = CheckpointedRun(d, DEFAULT_CONFIG)
        attempts = {"shard1": 0}

        def make(sid):
            if sid == 1:
                attempts["shard1"] += 1
                if attempts["shard1"] == 1:
                    raise RuntimeError("simulated mid-run kill")
            return _ds(5, offset=sid * 100)

        with pytest.raises(RuntimeError):
            run.sharded_stage("sigs", [0, 1], make)
        # shard 0 completed; shard 1 did not
        assert run.is_complete("sigs/shard=00000")
        assert not run.is_complete("sigs/shard=00001")

        # resume: shard 0 skipped (fn not called for it), shard 1 re-runs
        calls = []

        def make2(sid):
            calls.append(sid)
            return _ds(5, offset=sid * 100)

        out = run.sharded_stage("sigs", [0, 1], make2)
        assert calls == [1]
        assert sorted(r["x"] for r in out.take_all()) == sorted(
            list(range(0, 5)) + list(range(100, 105))
        )


def test_byte_identical_after_resume():
    """north_rule: kill + resume yields byte-identical output."""
    with tempfile.TemporaryDirectory() as d1, tempfile.TemporaryDirectory() as d2:
        r1 = CheckpointedRun(d1, DEFAULT_CONFIG)
        r1.sharded_stage("s", [0, 1, 2], lambda sid: _ds(4, offset=sid * 10))

        r2 = CheckpointedRun(d2, DEFAULT_CONFIG)
        with pytest.raises(RuntimeError):
            def failing(sid):
                if sid == 2:
                    raise RuntimeError("kill")
                return _ds(4, offset=sid * 10)
            r2.sharded_stage("s", [0, 1, 2], failing)
        out2 = r2.sharded_stage("s", [0, 1, 2],
                                lambda sid: _ds(4, offset=sid * 10))
        rows1 = sorted(
            r["x"] for r in r1.sharded_stage(
                "s", [0, 1, 2], lambda sid: _ds(4, offset=sid * 10)
            ).take_all()
        )
        rows2 = sorted(r["x"] for r in out2.take_all())
        assert rows1 == rows2


def test_shard_of_key_stable():
    assert shard_of_key("conv-1:3", 16) == shard_of_key("conv-1:3", 16)
    assert 0 <= shard_of_key("anything", 8) < 8


def test_manifest_counters_recorded():
    with tempfile.TemporaryDirectory() as d:
        run = CheckpointedRun(d, DEFAULT_CONFIG)
        run.stage("pairs", lambda: _ds(3), inputs="sigs",
                  counters={"buckets": 12, "capped": 0})
        m = run.manifest("pairs")
        assert m["counters"] == {"buckets": 12, "capped": 0}
        assert m["inputs"] == "sigs"


def test_submit_dedup_job_runs_and_resumes(ray_session, tmp_path):
    """End-to-end drive of the `ray job submit` entrypoint
    (jobs/submit_dedup.py): first run computes and checkpoints all
    three stages; a re-submission with the same --run-dir must SKIP
    every stage (checkpoint files untouched) and still produce
    value-identical cluster/pair outputs in a fresh --output dir."""
    import glob
    import os

    import pyarrow.parquet as pq

    from jobs import submit_dedup
    from raydedup.sources.transcripts import generate_transcripts

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    pq.write_table(generate_transcripts(n_convs=40, seed=3),
                   in_dir / "part-0.parquet")
    run_dir = str(tmp_path / "ckpt")

    def run(out_name):
        out = str(tmp_path / out_name)
        rc = submit_dedup.main(["--input", str(in_dir), "--output", out,
                                "--run-dir", run_dir])
        assert rc == 0
        rows = []
        for f in sorted(glob.glob(os.path.join(out, "clusters", "*.parquet"))):
            rows += pq.read_table(f).to_pylist()
        pairs = []
        for f in sorted(glob.glob(os.path.join(out, "pairs", "*.parquet"))):
            pairs += pq.read_table(f).to_pylist()
        key = lambda r: sorted(r.items())  # noqa: E731
        return sorted(rows, key=key), sorted(pairs, key=key)

    c1, p1 = run("out1")
    assert c1 and p1
    # checkpoint data published for all three stages
    stamps = {}
    for st in ("signatures", "pairs", "clusters"):
        files = glob.glob(os.path.join(run_dir, st, "data", "*.parquet"))
        assert files, st
        stamps[st] = {f: os.path.getmtime(f) for f in files}

    c2, p2 = run("out2")
    assert (c2, p2) == (c1, p1)  # resumed run is value-identical
    for st, mt in stamps.items():  # and recomputed NOTHING
        assert {f: os.path.getmtime(f)
                for f in glob.glob(
                    os.path.join(run_dir, st, "data", "*.parquet"))} == mt
