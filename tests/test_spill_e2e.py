"""Object-store-spill e2e: the closest a single sandbox gets to proving
the 100-TB streaming posture (VERDICT r3 'Next #9').

The headline DAG runs twice in FRESH subprocesses over the identical
320k-turn expansion: once with the object store clamped far below the
working set (forcing Ray to spill blocks to disk mid-pipeline) and once
unclamped. The clamped run must (a) actually spill — asserted from the
session dir's on-disk spill artifacts — and (b) produce BYTE-IDENTICAL pairs and cluster
assignments: spilling is a transport detail, never a semantics change.
Subprocesses keep the pytest session's shared Ray instance untouched.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pandas as pd
import pytest

_RUNNER = """
import json, sys
import ray

clamp = int(sys.argv[1])
out_dir = sys.argv[2]
kw = dict(address="local", num_cpus=4, include_dashboard=False,
          logging_level="ERROR")
if clamp:
    kw["object_store_memory"] = clamp
ray.init(**kw)
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False

from raydedup.config import DEFAULT_CONFIG
from raydedup.pipelines.neardup import near_dup_pipeline
from raydedup.sources.transcripts import expand_documents_to_transcripts

ts = expand_documents_to_transcripts(
    "/root/testdata/sf0.001", 640).materialize()
clusters, pairs = near_dup_pipeline(ts, DEFAULT_CONFIG)
pairs.write_parquet(f"{out_dir}/pairs")
clusters.write_parquet(f"{out_dir}/clusters")

# spill evidence: Ray's filesystem spill backend writes objects under
# <session_dir>/ray_spilled_objects* (the sandbox has no grpc, so the
# memory_summary API is unavailable — the on-disk artifacts are the
# ground truth anyway)
import glob, os
sess = ray._private.worker._global_node.get_session_dir_path()
spill_files = [f for pat in ("ray_spilled_objects*/*",)
               for f in glob.glob(os.path.join(sess, pat))]
spill_bytes = sum(os.path.getsize(f) for f in spill_files
                  if os.path.isfile(f))
print(json.dumps({"spilled": bool(spill_files),
                  "spill_bytes": spill_bytes}))
ray.shutdown()
"""


@pytest.mark.timeout(600)
def test_headline_spill_byte_identical(tmp_path):
    outs = {}
    for name, clamp in (("clamped", 200 * 1024 * 1024), ("free", 0)):
        out = tmp_path / name
        out.mkdir()
        proc = subprocess.run(
            [sys.executable, "-c", _RUNNER, str(clamp), str(out)],
            capture_output=True, text=True, timeout=540,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        stats = json.loads(proc.stdout.strip().splitlines()[-1])
        outs[name] = {"dir": out, "spilled": stats["spilled"]}

    # the clamped run must have exercised the spill path: a 320k-turn
    # expansion materializes ~100 MB of text + signatures against a
    # 200 MB store shared with every shuffle intermediate
    assert outs["clamped"]["spilled"], "clamp did not force spilling"

    for sub, keys in (("pairs", ["a_key", "b_key"]),
                      ("clusters", ["row_key"])):
        frames = {}
        for name in outs:
            df = pd.read_parquet(outs[name]["dir"] / sub)
            frames[name] = df.sort_values(keys).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            frames["clamped"], frames["free"], check_exact=True)
