"""Kill-mid-run resume e2e (VERDICT r4 'Next #5', SURVEY §5 test plan
item 4): SIGKILL the headline DAG while the LSH pair stage is running,
then resume from the stage manifests and require BYTE-IDENTICAL output
to an uninterrupted run.

Mechanics: a fresh subprocess drives the same checkpointed three-stage
flow as ``jobs/submit_dedup.py --run-dir`` (signatures → pairs →
clusters through ``CheckpointedRun.stage``) over the 640-conversation
sf0.001 expansion. The parent polls the run dir; the moment the
signatures manifest publishes (so the pairs/LSH stage is in flight) it
SIGKILLs the process — hard kill, no cleanup handlers. Assertions:

- the kill really landed mid-DAG: the pairs stage has no complete
  manifest (at most an orphaned ``pairs.tmp``);
- the resume run SKIPS signatures (its manifest file is bit-identical
  and untouched on disk) and completes pairs + clusters;
- pairs and cluster assignments equal an uninterrupted fresh run's,
  exactly.

Subprocesses own their Ray session (``address="local"``), keeping the
pytest session's shared Ray untouched.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pytest

_RUNNER = """
import json, os, sys
os.environ.pop("RAY_ADDRESS", None)
run_dir, out_dir = sys.argv[1], sys.argv[2]
import ray

ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False

from raydedup.config import DEFAULT_CONFIG
from raydedup.pipelines.neardup import (cluster_assignments,
                                        near_dup_pairs,
                                        signatures_with_rep)
from raydedup.sources.transcripts import expand_documents_to_transcripts
from raydedup.state.checkpoint import CheckpointedRun

cfg = DEFAULT_CONFIG
ts = expand_documents_to_transcripts(
    "/root/testdata/sf0.001", 640).materialize()
run = CheckpointedRun(run_dir, cfg)
sigs = run.stage("signatures", lambda: signatures_with_rep(ts, cfg))
pairs = run.stage("pairs", lambda: near_dup_pairs(sigs, cfg))
clusters = run.stage("clusters",
                     lambda: cluster_assignments(sigs, pairs, cfg))
pairs.write_parquet(f"{out_dir}/pairs")
clusters.write_parquet(f"{out_dir}/clusters")
print("DONE:" + json.dumps({"pairs": pairs.count(),
                            "clusters": clusters.count()}))
ray.shutdown()
"""


def _spawn(run_dir, out_dir):
    return subprocess.Popen(
        [sys.executable, "-c", _RUNNER, str(run_dir), str(out_dir)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


@pytest.mark.timeout(1500)
def test_sigkill_during_lsh_then_resume_byte_identical(tmp_path):
    run_dir = tmp_path / "ckpt"
    out_victim = tmp_path / "out_victim"
    sig_manifest = run_dir / "signatures" / "manifest.json"

    # run 1: kill the instant the signatures manifest publishes —
    # the pairs/LSH stage is then the work in flight
    victim = _spawn(run_dir, out_victim)
    deadline = time.time() + 420
    while time.time() < deadline:
        if sig_manifest.exists():
            break
        if victim.poll() is not None:
            raise AssertionError(
                "victim exited before signatures completed: "
                + victim.stderr.read()[-2000:])
        time.sleep(0.05)
    else:
        raise AssertionError("signatures never completed")
    os.kill(victim.pid, signal.SIGKILL)
    victim.wait(timeout=60)
    assert victim.returncode == -signal.SIGKILL
    # mid-DAG state: signatures complete, pairs NOT complete
    assert not (run_dir / "pairs" / "manifest.json").exists(), (
        "kill landed too late — pairs already published; widen the "
        "expansion if this ever flakes")
    sig_bytes = sig_manifest.read_bytes()
    sig_mtime = sig_manifest.stat().st_mtime_ns

    # run 2: resume from the manifests in the same run dir
    resumed = _spawn(run_dir, tmp_path / "out_resumed")
    out, err = resumed.communicate(timeout=540)
    assert resumed.returncode == 0, err[-3000:]
    stats = json.loads([ln for ln in out.splitlines()
                        if ln.startswith("DONE:")][-1][5:])
    assert stats["pairs"] > 0 and stats["clusters"] > 0
    # signatures were SKIPPED, not recomputed: manifest untouched
    assert sig_manifest.read_bytes() == sig_bytes
    assert sig_manifest.stat().st_mtime_ns == sig_mtime

    # run 3: uninterrupted reference in a fresh run dir
    fresh = _spawn(tmp_path / "ckpt_fresh", tmp_path / "out_fresh")
    out, err = fresh.communicate(timeout=540)
    assert fresh.returncode == 0, err[-3000:]

    for sub, keys in (("pairs", ["a_key", "b_key"]),
                      ("clusters", ["row_key"])):
        frames = {}
        for name in ("out_resumed", "out_fresh"):
            df = pd.read_parquet(tmp_path / name / sub)
            frames[name] = df.sort_values(keys).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            frames["out_resumed"], frames["out_fresh"], check_exact=True)
