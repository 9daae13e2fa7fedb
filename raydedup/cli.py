"""Config-driven pipeline runner (the engine's ``detect_off_topic`` /
storytelling CLI, SURVEY §7.3 step 10).

    python -m raydedup.cli neardup --input /root/testdata/sf0.001 \
        --run-dir /tmp/run1 [--resume]
    python -m raydedup.cli offtopic --input ... --measures jaccard,cosine
    python -m raydedup.cli story --input ... --run-dir /tmp/run2

Owns the Ray session (scripts own sessions; library code never calls
ray.init — driver contract). Stages checkpoint under --run-dir via
CheckpointedRun; re-running with the same dir and config resumes.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_threshold_overrides(arg: str | None) -> dict:
    """``-tm measure=threshold,...`` override parser — parity with the
    reference CLI surface (otmt/argument_processing.py:34-66)."""
    if not arg:
        return {}
    out = {}
    for part in arg.split(","):
        name, _, value = part.partition("=")
        out[name.strip()] = float(value)
    return out


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="raydedup")
    p.add_argument("command", choices=["neardup", "offtopic", "story"])
    p.add_argument("--input", required=True,
                   help="sf dir (documents.parquet) or a transcript parquet path")
    p.add_argument("--run-dir", default="/tmp/raydedup_run")
    p.add_argument("--num-cpus", type=int, default=32)
    p.add_argument("--measures", default=None,
                   help="comma list for offtopic (default: all)")
    p.add_argument("-tm", "--threshold-overrides", default=None,
                   help="measure=threshold[,measure=threshold...]")
    p.add_argument("--jaccard-threshold", type=float, default=None)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.sources.transcripts import (
        read_transcripts,
        transcripts_from_documents,
    )
    from raydedup.state.checkpoint import CheckpointedRun

    cfg = DEFAULT_CONFIG
    overrides = _parse_threshold_overrides(args.threshold_overrides)
    if overrides:
        thresholds = dict(cfg.thresholds)
        for k, v in overrides.items():
            direction, _ = thresholds[k]
            thresholds[k] = (direction, v)
        cfg = cfg.with_overrides(thresholds=thresholds)
    if args.jaccard_threshold is not None:
        cfg = cfg.with_overrides(jaccard_dup_threshold=args.jaccard_threshold)

    import os

    if os.path.isdir(args.input):
        ds = transcripts_from_documents(args.input)
    else:
        ds = read_transcripts(args.input)

    run = CheckpointedRun(args.run_dir, cfg)
    summary: dict = {"run_dir": args.run_dir}

    if args.command == "neardup":
        from raydedup.pipelines.neardup import (
            cluster_assignments,
            near_dup_pairs,
            signatures_with_rep,
        )

        sigs = run.stage("signatures",
                         lambda: signatures_with_rep(ds, cfg),
                         inputs=args.input)
        pairs = run.stage("pairs", lambda: near_dup_pairs(sigs, cfg),
                          inputs="signatures")
        clusters = run.stage(
            "clusters", lambda: cluster_assignments(sigs, pairs, cfg),
            inputs="signatures+pairs",
        )
        summary.update(
            rows=sigs.count(), pairs=pairs.count(), clusters=clusters.count()
        )
    elif args.command == "offtopic":
        from raydedup.pipelines.offtopic import detect_off_topic

        measures = args.measures.split(",") if args.measures else None
        out = run.stage(
            "offtopic", lambda: detect_off_topic(ds, measures, cfg),
            inputs=args.input,
        )
        summary.update(rows=out.count())
    else:  # story
        from raydedup.pipelines.storytelling import storytelling_chain

        slices, clusters, survivors, story = storytelling_chain(ds, cfg)
        summary.update(
            slices=run.stage("slices", lambda: slices).count(),
            clusters=run.stage("story_clusters", lambda: clusters).count(),
            survivors=run.stage("survivors", lambda: survivors).count(),
            story=run.stage("story", lambda: story).count(),
        )

    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
