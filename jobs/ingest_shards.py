"""Continuous-ingestion job: dedup arriving parquet shards against a
persisted signature index, extending the index as each shard lands —
the ``ray job submit`` surface of ``stages/incremental.py``:

    ray job submit --working-dir . -- \
        python jobs/ingest_shards.py \
            --shards /mnt/shared/incoming/       \
            --index  /mnt/shared/dedup_index/    \
            --labels-out /mnt/shared/labels/

Each ``*.parquet`` file under --shards is one shard, processed in
sorted-name order (the arrival order a crawl pipeline encodes in file
names). Per shard: probe the index (``exact`` / ``near`` / ``new``
labels written to ``--labels-out/<shard>/``), then append the shard's
``new``-labeled survivors to the index as a fresh generation.

Resumability — re-submitting the SAME command resumes exactly:
- a shard whose labels directory is already published (atomic rename)
  is not re-probed;
- the index extension is idempotent per shard (``shard_id`` recorded
  in the index manifest), so a run killed between "labels published"
  and "index extended" replays that shard's extend and nothing else.

The index is bootstrapped EMPTY if --index has no manifest, so the
first shard simply comes back all-'new' and seeds generation 1 — one
uniform code path, no special first-shard handling. Prints one JSON
line of counters per run for the submitting harness to scrape.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

# runnable both from the repo root and as a ray-job working_dir payload
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ingest_shards")
    p.add_argument("--shards", required=True,
                   help="dir of *.parquet shard files, ingested in "
                        "sorted-name order")
    p.add_argument("--index", required=True,
                   help="persisted dedup index dir (bootstrapped empty "
                        "if it has no manifest)")
    p.add_argument("--labels-out", required=True,
                   help="per-shard label parquet dirs land here")
    p.add_argument("--key-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--index-near", action="store_true",
                   help="also index 'near'-labeled survivors "
                        "(default: only 'new')")
    p.add_argument("--compact-every", type=int, default=0, metavar="N",
                   help="compact the index back to one generation after "
                        "every N ingested shards, and once at the end "
                        "(0 = never; compaction is crash-safe and "
                        "idempotent, see compact_dedup_index)")
    p.add_argument("--auto-compact", action="store_true",
                   help="service-shaped compaction policy driven by "
                        "MEASURED index state instead of a hand-chosen "
                        "cadence: after each extend, compact when the "
                        "non-base generations' combined row count "
                        "reaches the base generation's (geometric / "
                        "LSM-style — total compaction work stays "
                        "O(total rows x log shards) and the generation "
                        "count stays <= 2 + log2(shards), bounding "
                        "per-generation probe overhead to a small "
                        "constant factor), or unconditionally past "
                        "8 generations (skewed-shard safety bound)")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        try:
            ray.init(address="auto", logging_level="ERROR")
        except ConnectionError:
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.stages.incremental import (
        _META_FILE,
        _count_rows,
        build_dedup_index,
        compact_dedup_index,
        dedup_against_index,
        extend_dedup_index,
    )

    cfg = DEFAULT_CONFIG
    statuses = ("new", "near") if args.index_near else ("new",)

    t0 = time.time()
    if not os.path.exists(os.path.join(args.index, _META_FILE)):
        empty = pa.table({args.key_col: pa.array([], pa.string()),
                          args.text_col: pa.array([], pa.string())})
        build_dedup_index(ray.data.from_arrow(empty), args.index, cfg,
                          key_cols=[args.key_col],
                          text_col=args.text_col)

    shard_files = sorted(
        f for f in os.listdir(args.shards) if f.endswith(".parquet"))
    os.makedirs(args.labels_out, exist_ok=True)
    counters: dict = {"shards": {}, "skipped": 0,
                      "auto_compactions": 0, "max_generations_probed": 0}
    manifest = None
    for fname in shard_files:
        shard_id = fname[: -len(".parquet")]
        out_dir = os.path.join(args.labels_out, shard_id)
        shard = ray.data.read_parquet(
            os.path.join(args.shards, fname),
            columns=[args.key_col, args.text_col])
        with open(os.path.join(args.index, _META_FILE)) as fh:
            n_gens_probed = len(json.load(fh)["generations"])
        counters["max_generations_probed"] = max(
            counters["max_generations_probed"], n_gens_probed)
        t_probe = time.time()
        if os.path.exists(out_dir):
            # labels already published — reuse them so the (idempotent)
            # extend below can still replay after a mid-shard crash
            labels = ray.data.read_parquet(out_dir)
            counters["skipped"] += 1
        else:
            labels = dedup_against_index(
                shard, args.index, cfg, key_cols=[args.key_col],
                text_col=args.text_col).materialize()
            # atomic publish: a killed run never leaves half a shard
            tmp = out_dir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            labels.write_parquet(tmp)
            os.makedirs(tmp, exist_ok=True)
            os.replace(tmp, out_dir)
            labels = ray.data.read_parquet(out_dir)
        probe_sec = round(time.time() - t_probe, 3)
        manifest = extend_dedup_index(
            shard, args.index, labels, cfg, key_cols=[args.key_col],
            text_col=args.text_col, statuses=statuses,
            shard_id=shard_id)
        by = {"exact": 0, "near": 0, "new": 0}
        for b in labels.select_columns(["status"]).iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"):
            for s in by:
                by[s] += int(pc.sum(pc.cast(pc.equal(
                    b["status"], pa.scalar(s)), pa.int64())).as_py() or 0)
        counters["shards"][shard_id] = by
        # timing/state evidence lives OUTSIDE the per-shard label counts
        # (those must replay byte-identical on a resumed run)
        counters.setdefault("probe_evidence", {})[shard_id] = {
            "probe_sec": probe_sec, "generations_probed": n_gens_probed}
        if (args.compact_every
                and len(counters["shards"]) % args.compact_every == 0):
            manifest = compact_dedup_index(args.index, cfg)
        elif args.auto_compact and len(manifest["generations"]) > 1:
            # measured-state policy (no hand-chosen cadence): per-gen
            # row counts come from parquet footers only
            rows = [_count_rows(os.path.join(args.index, g))
                    for g in manifest["generations"]]
            base = max(rows)
            tail = sum(rows) - base
            if (tail > 0 and tail >= base) or len(rows) > 8:
                manifest = compact_dedup_index(args.index, cfg)
                counters["auto_compactions"] += 1

    if args.compact_every and manifest:
        manifest = compact_dedup_index(args.index, cfg)
    counters["n_reps"] = manifest["n_reps"] if manifest else 0
    counters["generations"] = (len(manifest["generations"])
                               if manifest else 0)
    counters["wall_sec"] = round(time.time() - t0, 3)
    print(json.dumps(counters))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
