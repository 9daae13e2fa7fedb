"""Per-stage / per-partition checkpointing with lineage manifests.

The reference's resume story is "the working directory IS the checkpoint"
(otmt/collectionmodel.py:111-117,143-234 — re-opening a directory skips
all completed downloads). The engine's equivalent for a batch DAG
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics"):

- every stage writes Parquet under ``run_dir/<stage>/`` via an ATOMIC
  tmp-dir + rename, with a ``manifest.json`` recording the stage name,
  the frozen config hash, row count, input description and counters;
- a completed manifest with a matching config hash short-circuits the
  stage to ``read_parquet`` of its output (skip-completed semantics);
- embarrassingly parallel stages can additionally shard by a
  deterministic partition id (``shard_of_key``) and checkpoint per shard,
  so a killed run resumes at shard granularity. Wide stages (LSH groupby,
  clustering) checkpoint their whole output — their shuffles cannot be
  partially replayed anyway.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict

import ray.data

from raydedup.config import DedupConfig


def config_hash(cfg: DedupConfig) -> str:
    blob = json.dumps(asdict(cfg), sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def shard_of_key(key: str, n_shards: int) -> int:
    """Deterministic partition id for per-shard checkpointing."""
    return int.from_bytes(hashlib.blake2b(key.encode(), digest_size=4).digest(),
                          "big") % n_shards


class CheckpointedRun:
    """A run directory of resumable stages."""

    def __init__(self, run_dir: str, cfg: DedupConfig):
        self.run_dir = run_dir
        self.cfg = cfg
        self.cfg_hash = config_hash(cfg)
        os.makedirs(run_dir, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.run_dir, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "manifest.json")

    def is_complete(self, stage: str) -> bool:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            m = json.load(f)
        return m.get("complete") and m.get("config_hash") == self.cfg_hash

    def manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def stage(self, stage: str, fn, inputs: str = "",
              counters: dict | None = None):
        """Run ``fn() -> Dataset`` with skip-if-complete semantics; returns
        a Dataset reading the checkpointed Parquet either way."""
        out_dir = self._stage_dir(stage)
        if self.is_complete(stage):
            return ray.data.read_parquet(os.path.join(out_dir, "data"))
        tmp_dir = out_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        t0 = time.time()
        ds = fn()
        data_dir = os.path.join(tmp_dir, "data")
        ds.write_parquet(data_dir)
        num_rows = ray.data.read_parquet(data_dir).count()
        manifest = {
            "stage": stage,
            "config_hash": self.cfg_hash,
            "inputs": inputs,
            "num_rows": num_rows,
            "wall_sec": round(time.time() - t0, 3),
            "counters": counters or {},
            "complete": True,
        }
        with open(os.path.join(tmp_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        os.rename(tmp_dir, out_dir)  # atomic publish
        return ray.data.read_parquet(os.path.join(out_dir, "data"))

    def sharded_stage(self, stage: str, shard_ids: list[int], fn_for_shard,
                      inputs: str = ""):
        """Per-partition checkpointing: ``fn_for_shard(shard_id) ->
        Dataset``; completed shards are skipped on resume; returns the
        union Dataset over all shard outputs with per-shard lineage rows
        in each shard manifest."""
        outs = []
        for sid in shard_ids:
            sub = f"{stage}/shard={sid:05d}"
            if self.is_complete(sub):
                outs.append(
                    ray.data.read_parquet(
                        os.path.join(self._stage_dir(sub), "data"))
                )
                continue
            outs.append(
                self.stage(sub, lambda sid=sid: fn_for_shard(sid),
                           inputs=f"{inputs} shard={sid}")
            )
        result = outs[0]
        for o in outs[1:]:
            result = result.union(o)
        return result
