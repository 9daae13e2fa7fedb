"""Off-topic detection pipeline — the reference's primary CLI
``detect_off_topic`` (bin/detect_off_topic, SURVEY §3.1) as one Dataset DAG.

Reference 4-phase lifecycle → engine stages:
  1. Acquire  → read_parquet / transcripts_from_documents
  2. Measure  → anchor_measures (prep map_batches + per-conv map_groups)
               + classify_offtopic thresholds
  3. Extra calculations → simhash / content length / language columns
     (computed in the same prep pass — no full re-scans like the
     reference's phase 3, otmt/metadata_calcluations.py)
  4. Output  → write_parquet / write_csv / topic list files
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from raydedup.config import DedupConfig, DEFAULT_CONFIG
from raydedup.stages.exact import add_row_key
from raydedup.stages.measures import ALL_MEASURES, anchor_measures
from raydedup.stages.threshold import classify_offtopic


def detect_off_topic(ds, measures: list[str] | None = None,
                     cfg: DedupConfig = DEFAULT_CONFIG,
                     key_cols: list[str] | None = None):
    """transcripts → per-row measure scores + statuses + overall_status."""
    measures = measures or ALL_MEASURES
    key_cols = key_cols or ["conv_id", "turn_idx"]
    keyed = add_row_key(ds, key_cols)
    scored = anchor_measures(keyed, measures, cfg)
    return classify_offtopic(scored, measures, cfg)


def topic_lists(classified_ds):
    """(off_topic_ds, on_topic_ds) single-key outputs ≡ the reference's
    off-topic / on-topic URI list files (bin/detect_off_topic:275-293)."""
    off = classified_ds.filter(expr="overall_status == 'off-topic'")
    on = classified_ds.filter(expr="overall_status == 'on-topic'")
    return off.select_columns(["row_key"]), on.select_columns(["row_key"])


def save_as_goldstandard(classified_ds, path: str):
    """TSV-ish gold standard table (id, date, URI, label) ≡
    save_as_goldstandard (otmt/measuremodel.py:606-672): label 1 =
    on-topic, 0 = off-topic. Written as CSV for parity of shape."""

    def project(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        label = pc.if_else(
            pc.equal(batch["overall_status"], pa.scalar("on-topic")),
            pa.scalar("1"), pa.scalar("0"),
        )
        return pa.table(
            {
                "id": pa.array(range(n), type=pa.int64()),
                "date": pc.cast(batch["turn_idx"], pa.string()),
                "URI": batch["row_key"],
                "label": label,
            }
        )

    classified_ds.map_batches(project, batch_format="pyarrow").write_csv(path)
