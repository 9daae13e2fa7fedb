"""Simulated multi-node e2e: the 100-TB posture claim demonstrated, not
argued (VERDICT r4 'Next #1').

``ray.cluster_utils.Cluster`` stands up FOUR local "nodes" — one head +
three workers, each with its own raylet and 300 MB object store — and
the headline near-dup DAG plus an incremental index build + probe run
across them. A second subprocess runs the identical jobs single-node.
Assertions:

- the multi-node run actually distributes: ≥ 2 nodes hold materialized
  pipeline blocks (block residency == producing task's node, so the
  driver ref-shuffle's reducers/verify tasks necessarily pulled bundles
  across object stores);
- pairs, cluster assignments, and incremental probe statuses are
  BYTE-IDENTICAL between the 4-node and single-node runs — topology is
  a transport detail, never a semantics change.

Each run is a fresh subprocess (its own Ray instance), keeping the
pytest session's shared local Ray untouched; per-node block-byte
distribution is printed for the BASELINE.md record.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pandas as pd
import pytest

_RUNNER = """
import json, os, sys
os.environ.pop("RAY_ADDRESS", None)
mode, out_dir = sys.argv[1], sys.argv[2]
import ray

STORE = 300 * 1024 * 1024
if mode == "multi":
    from ray.cluster_utils import Cluster
    cluster = Cluster(initialize_head=True, head_node_args={
        "num_cpus": 2, "object_store_memory": STORE})
    for _ in range(3):
        cluster.add_node(num_cpus=2, object_store_memory=STORE)
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
else:
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False

from raydedup.config import DEFAULT_CONFIG
from raydedup.pipelines.neardup import near_dup_pipeline
from raydedup.sources.transcripts import expand_documents_to_transcripts
from raydedup.stages.incremental import (build_dedup_index,
                                         dedup_against_index)


def node_bytes(ds):
    refs = ds.to_arrow_refs()
    locs = ray.experimental.get_object_locations(refs)
    per = {}
    for info in locs.values():
        for nid in info.get("node_ids") or ["?"]:
            per[nid[:8]] = per.get(nid[:8], 0) + (info.get(
                "object_size") or 0)
    return per


ts = expand_documents_to_transcripts(
    "/root/testdata/sf0.001", 640).materialize()
clusters, pairs = near_dup_pipeline(ts, DEFAULT_CONFIG)
pairs = pairs.materialize()
clusters = clusters.materialize()
pairs.write_parquet(f"{out_dir}/pairs")
clusters.write_parquet(f"{out_dir}/clusters")

# incremental leg: index the even turns, probe with the odd turns


def side(batch, want):
    import pyarrow as pa
    import pyarrow.compute as pc
    par = pc.equal(pc.bit_wise_and(
        pc.cast(batch["turn_idx"], pa.int64()), 1), want)
    return batch.filter(par)


cfg = DEFAULT_CONFIG
old = ts.map_batches(lambda b: side(b, 0), batch_format="pyarrow")
new = ts.map_batches(lambda b: side(b, 1), batch_format="pyarrow")
build_dedup_index(old, f"{out_dir}/index", cfg,
                  key_cols=["conv_id", "turn_idx"])
probe = dedup_against_index(new, f"{out_dir}/index", cfg,
                            key_cols=["conv_id", "turn_idx"]).materialize()
probe.write_parquet(f"{out_dir}/probe")

evidence = {
    "alive_nodes": len([n for n in ray.nodes() if n["Alive"]]),
    "input_block_nodes": node_bytes(ts),
    "pairs_block_nodes": node_bytes(pairs),
    "probe_block_nodes": node_bytes(probe),
    "n_pairs": pairs.count(),
    "n_probe": probe.count(),
}
print("EVIDENCE:" + json.dumps(evidence))
ray.shutdown()
if mode == "multi":
    cluster.shutdown()
"""


@pytest.mark.timeout(1200)
def test_multinode_matches_single_node(tmp_path):
    runs = {}
    for mode in ("multi", "single"):
        out = tmp_path / mode
        out.mkdir()
        proc = subprocess.run(
            [sys.executable, "-c", _RUNNER, mode, str(out)],
            capture_output=True, text=True, timeout=560,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        ev_line = [ln for ln in proc.stdout.splitlines()
                   if ln.startswith("EVIDENCE:")][-1]
        runs[mode] = {"dir": out, "ev": json.loads(ev_line[9:])}

    ev = runs["multi"]["ev"]
    assert ev["alive_nodes"] == 4, ev
    # ≥ 2 object stores hold pipeline blocks → cross-node transfer was
    # exercised by every downstream consumer of those blocks
    spread = {n for k in ("input_block_nodes", "pairs_block_nodes")
              for n in ev[k]}
    assert len(spread) >= 2, ev
    print("multi-node evidence:", json.dumps(ev))

    for sub, keys in (("pairs", ["a_key", "b_key"]),
                      ("clusters", ["row_key"]),
                      ("probe", ["key"])):
        frames = {}
        for mode in runs:
            df = pd.read_parquet(runs[mode]["dir"] / sub)
            frames[mode] = df.sort_values(keys).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            frames["multi"], frames["single"], check_exact=True)
