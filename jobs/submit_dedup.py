"""Cluster job entrypoint for the flagship dedup DAG — the ``ray job
submit`` surface the north rule names:

    ray job submit --working-dir . -- \
        python jobs/submit_dedup.py \
            --input  /mnt/shared/transcripts/   \
            --output /mnt/shared/dedup_out/     \
            --run-dir /mnt/shared/dedup_ckpt/

Run the SAME command against the N-node and the 4N-node cluster to
measure scaling efficiency; the job connects to whatever cluster the
Ray Jobs API started it on (``address="auto"``; falls back to a local
session so the script is also runnable standalone in this sandbox).

Contracts this script keeps:
- resumable: every stage checkpoints under --run-dir via
  CheckpointedRun (per-partition lineage + counters); re-submitting
  with the same --run-dir skips finished stages.
- partitioned output: clusters and pairs land as directories of
  parquet shards (never one giant file), so a re-run can skip or
  overwrite per-directory.
- the driver prints one JSON line of counters (rows in, pairs,
  clusters, wall seconds) for the submitting harness to scrape.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable both from the repo root and as a ray-job working_dir payload
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="submit_dedup")
    p.add_argument("--input", required=True,
                   help="dir of transcript parquet shards (conv_id, "
                        "turn_idx, role, text, tool, ts) or an sf dir "
                        "holding documents.parquet")
    p.add_argument("--output", required=True,
                   help="output dir; writes clusters/ and pairs/ "
                        "parquet subdirs")
    p.add_argument("--run-dir", default=None,
                   help="checkpoint dir (shared storage on a cluster); "
                        "re-submitting with the same dir resumes")
    p.add_argument("--jaccard-threshold", type=float, default=None)
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        try:
            ray.init(address="auto", logging_level="ERROR")
        except ConnectionError:
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.pipelines.neardup import near_dup_pipeline
    from raydedup.sources.transcripts import (
        read_transcripts,
        transcripts_from_documents,
    )
    from raydedup.state.checkpoint import CheckpointedRun

    cfg = DEFAULT_CONFIG
    if args.jaccard_threshold is not None:
        from dataclasses import replace
        cfg = replace(cfg, jaccard_threshold=args.jaccard_threshold)

    t0 = time.time()
    if os.path.exists(os.path.join(args.input, "documents.parquet")):
        ts = transcripts_from_documents(args.input)
    else:
        ts = read_transcripts(args.input)
    if args.run_dir:
        from raydedup.pipelines.neardup import (
            cluster_assignments,
            near_dup_pairs,
            signatures_with_rep,
        )

        run = CheckpointedRun(args.run_dir, cfg)
        sigs = run.stage("signatures",
                         lambda: signatures_with_rep(ts, cfg))
        pairs = run.stage("pairs", lambda: near_dup_pairs(sigs, cfg))
        clusters = run.stage(
            "clusters", lambda: cluster_assignments(sigs, pairs, cfg))
    else:
        clusters, pairs = near_dup_pipeline(ts, cfg)
    # overwrite, not the default append: re-submitting with the same
    # --output must not accumulate a second copy of every shard
    clusters.write_parquet(os.path.join(args.output, "clusters"),
                           mode="overwrite")
    pairs.write_parquet(os.path.join(args.output, "pairs"),
                        mode="overwrite")
    wall = time.time() - t0

    out_c = ray.data.read_parquet(os.path.join(args.output, "clusters"))
    out_p = ray.data.read_parquet(os.path.join(args.output, "pairs"))
    print(json.dumps({
        "rows_in": ts.count(),
        "pairs": out_p.count(),
        "cluster_rows": out_c.count(),
        "wall_sec": round(wall, 3),
    }))
    if owns_session:  # never tear down a caller-owned session (tests)
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
